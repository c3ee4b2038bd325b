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
