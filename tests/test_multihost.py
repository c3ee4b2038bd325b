"""Multi-host FASTQ sharding + ordered SAM gather (SURVEY 2.5): N host
processes, each loading its own index replica and mapping a read-range
shard, must gather to byte-identical output at any host count."""

import gzip
import os
import shutil
import subprocess
import sys

import pytest

from tests.conftest import CACHE, GOLDEN, golden_path


def _read_golden(name: str) -> str:
    with gzip.open(os.path.join(GOLDEN, name + ".gz"), "rt") as f:
        return f.read()


def _index_path(trex1_index) -> str:
    # the session-cached serialized index (conftest builds it)
    p = os.path.join(CACHE, "tRex1.idx")
    assert os.path.exists(p)
    return p


@pytest.mark.parametrize("prefix,paired,hosts", [
    ("small", False, 3),
    ("small_pe", True, 2),
])
def test_multihost_byte_identical(tmp_path, trex1_index, prefix, paired,
                                  hosts):
    from abismal_tpu.parallel.multihost import run_map_multihost

    fq1 = golden_path(prefix + "_1.fq")
    fq2 = golden_path(prefix + "_2.fq") if paired else None
    tail = (f"tests/{prefix}_1.fq tests/{prefix}_2.fq" if paired
            else f"tests/{prefix}_1.fq")
    cl = (f"map -s tests/{prefix}.mstats -o tests/{prefix}.sam "
          f"-i tests/tRex1.idx {tail}")
    out = tmp_path / "out.sam"
    stats = run_map_multihost(
        _index_path(trex1_index), fq1, fq2, str(out), cl, n_hosts=hosts,
        threads_per_host=2, pbat=False)
    assert out.read_text() == _read_golden(prefix + ".sam")
    assert stats.total_reads if not paired else \
        stats.read_pair_stats.total_reads


@pytest.mark.parametrize("prefix,paired", [
    ("small", False),
    ("small_pe", True),
])
def test_multihost_tpu_engine_byte_identical(tmp_path, trex1_index, prefix,
                                             paired):
    """--hosts N --engine tpu: every shard process drives the device
    stage-1+2 engine (its own chip on multi-accelerator machines) and the
    gathered output stays byte-identical (VERDICT r4 ask #7)."""
    from abismal_tpu.parallel.multihost import run_map_multihost

    fq1 = golden_path(prefix + "_1.fq")
    fq2 = golden_path(prefix + "_2.fq") if paired else None
    tail = (f"tests/{prefix}_1.fq tests/{prefix}_2.fq" if paired
            else f"tests/{prefix}_1.fq")
    cl = (f"map -s tests/{prefix}.mstats -o tests/{prefix}.sam "
          f"-i tests/tRex1.idx {tail}")
    out = tmp_path / "out.sam"
    run_map_multihost(
        _index_path(trex1_index), fq1, fq2, str(out), cl, n_hosts=2,
        threads_per_host=1, pbat=False, engine="tpu")
    assert out.read_text() == _read_golden(prefix + ".sam")


def test_count_reads_no_trailing_newline(tmp_path):
    """A FASTQ whose final line lacks '\\n' still counts its last read
    (the native parser accepts such files; ADVICE r2)."""
    from abismal_tpu.parallel.multihost import count_reads

    rec = b"@r%d\nACGTACGT\n+\nBBBBBBBB\n"
    p = tmp_path / "t.fq"
    p.write_bytes(b"".join(rec % i for i in range(3)))
    assert count_reads(str(p)) == 3
    p.write_bytes(b"".join(rec % i for i in range(3))[:-1])  # strip last \n
    assert count_reads(str(p)) == 3


def test_multihost_bam_payload(tmp_path, trex1_index):
    """`map --hosts N -B`: concatenated BGZF shards must decompress to the
    same BAM payload as a single-host -B run (block boundaries differ; the
    decoded records cannot)."""
    import gzip as _gz

    from abismal_tpu.io.bam import read_bam_records
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.pipeline import make_native_engine_factory
    from abismal_tpu.parallel.multihost import run_map_multihost

    fq1 = golden_path("small_1.fq")
    cl = "map -B -o tests/small.bam -i tests/tRex1.idx tests/small_1.fq"
    one = tmp_path / "one.bam"
    run_map(trex1_index, fq1, None, str(one), None, cl,
            engine_factory=make_native_engine_factory(n_threads=2),
            threads=2, bam=True)
    multi = tmp_path / "multi.bam"
    run_map_multihost(_index_path(trex1_index), fq1, None, str(multi), cl,
                      n_hosts=3, threads_per_host=2, bam=True)
    # BGZF members are gzip members; multi-member decompression yields the
    # full payload (the per-shard EOF markers are empty members)
    pay1 = _gz.decompress(one.read_bytes())
    pay2 = _gz.decompress(multi.read_bytes())
    assert pay1 == pay2
    assert list(read_bam_records(str(multi))) == \
        list(read_bam_records(str(one)))


def test_shard_cli_gather(tmp_path, trex1_index):
    """Real-cluster mode: `map --shard I:N` per host, concatenate in rank
    order -- equals the golden output."""
    fq1 = golden_path("small_1.fq")
    idx = _index_path(trex1_index)
    parts = []
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH="/root/repo:" + os.environ.get("PYTHONPATH", ""))
    for i in range(3):
        p = tmp_path / f"shard{i}.sam"
        subprocess.run(
            [sys.executable, "-m", "abismal_tpu.cli", "map",
             "--shard", f"{i}:3", "-t", "2", "-o", str(p), "-i", idx, fq1],
            check=True, env=env, capture_output=True)
        parts.append(p)
    gathered = b"".join(p.read_bytes() for p in parts).decode()
    golden = _read_golden("small.sam")
    # the @PG CL: line records each shard's argv; compare modulo it
    strip = lambda s: "\n".join(l for l in s.splitlines()
                                if not l.startswith("@PG"))
    assert strip(gathered) == strip(golden)
