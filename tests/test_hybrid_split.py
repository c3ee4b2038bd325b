"""Hybrid-split mapping: native + device engines on disjoint read-range
shards, concurrently, gathered in rank order -- output must be
byte-identical to a single-engine run (and to the upstream golden)."""

import gzip
import os

import pytest

from tests.conftest import GOLDEN, golden_path


def _read_golden(name: str) -> str:
    with gzip.open(os.path.join(GOLDEN, name + ".gz"), "rt") as f:
        return f.read()


def test_readloader_skip_count(tmp_path):
    from abismal_tpu.io.fastq import ReadLoader

    fq = tmp_path / "r.fq"
    recs = "".join(f"@r{i}\nACGTACGTACGTACGTACGTACGTACGTACGT\n+\nIIII\n"
                   for i in range(25))
    fq.write_text(recs)
    full = ReadLoader(str(fq), batch_size=7)
    names = [n for batch in iter(full.load_batch, []) for n, _ in batch]
    shard = ReadLoader(str(fq), batch_size=7, skip=9, count=11)
    got = []
    while shard:
        got.extend(n for n, _ in shard.load_batch())
    assert got == names[9:20]
    # skip beyond EOF -> empty loader, no error
    past = ReadLoader(str(fq), batch_size=7, skip=30, count=5)
    assert not past or past.load_batch() == []


def test_hybrid_split_se_parity(tmp_path, trex1_index):
    from abismal_tpu.map.hybrid_split import run_map_hybrid_split

    fq = golden_path("small_1.fq")
    cl = ("map -s tests/small.mstats -o tests/small.sam -i tests/tRex1.idx "
          "tests/small_1.fq")
    sam = tmp_path / "hs.sam"
    run_map_hybrid_split(trex1_index, fq, None, str(sam), cl,
                         device_share=0.37, threads=2, lmax=128)
    assert sam.read_text() == _read_golden("small.sam")


def test_hybrid_split_se_stats(tmp_path, trex1_index):
    """Merged statistics must equal the single-engine run's."""
    from abismal_tpu.map.engine import _write_stats
    from abismal_tpu.map.hybrid_split import run_map_hybrid_split

    fq = golden_path("small_1.fq")
    cl = ("map -s tests/small.mstats -o tests/small.sam -i tests/tRex1.idx "
          "tests/small_1.fq")
    sam = tmp_path / "hs.sam"
    stats = run_map_hybrid_split(trex1_index, fq, None, str(sam), cl,
                                 device_share=0.2, threads=2, lmax=128)
    mst = tmp_path / "hs.mstats"
    _write_stats(stats, str(mst), False, False, False)
    assert mst.read_text() == _read_golden("small.mstats")


def test_hybrid_split_bam(tmp_path, trex1_index):
    """BAM via hybrid split: rank-0 shard carries the header; the gathered
    stream's records must equal the single-engine BAM's records."""
    from abismal_tpu.io.bam import read_bam_records
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.hybrid_split import run_map_hybrid_split
    from abismal_tpu.map.pipeline import make_native_engine_factory

    fq = golden_path("small_1.fq")
    cl = ("map -s tests/small.mstats -o tests/small.sam -i tests/tRex1.idx "
          "tests/small_1.fq")
    ref_bam = tmp_path / "ref.bam"
    run_map(trex1_index, fq, None, str(ref_bam), None, cl,
            engine_factory=make_native_engine_factory(n_threads=2),
            threads=2, bam=True)
    hs_bam = tmp_path / "hs.bam"
    run_map_hybrid_split(trex1_index, fq, None, str(hs_bam), cl,
                         device_share=0.3, threads=2, lmax=128, bam=True)
    assert list(read_bam_records(str(hs_bam))) == \
        list(read_bam_records(str(ref_bam)))


def test_hybrid_split_server_parity(tmp_path, trex1_index):
    """The pristine-worker-process variant (NativeShardServer) must also
    be byte-identical, across repeated requests to one server."""
    import os as _os

    from tests.conftest import CACHE
    from abismal_tpu.map.hybrid_split import (
        NativeShardServer,
        run_map_hybrid_split,
    )

    fq = golden_path("small_1.fq")
    cl = ("map -s tests/small.mstats -o tests/small.sam -i tests/tRex1.idx "
          "tests/small_1.fq")
    srv = NativeShardServer(_os.path.join(CACHE, "tRex1.idx"), threads=2)
    try:
        for share in (0.25, 0.5):
            sam = tmp_path / f"srv{share}.sam"
            run_map_hybrid_split(trex1_index, fq, None, str(sam), cl,
                                 device_share=share, threads=2, lmax=128,
                                 native_server=srv)
            assert sam.read_text() == _read_golden("small.sam")
    finally:
        srv.close()


def test_hybrid_split_pe_parity(tmp_path, trex1_index):
    from abismal_tpu.map.hybrid_split import run_map_hybrid_split

    fq1 = golden_path("small_pe_1.fq")
    fq2 = golden_path("small_pe_2.fq")
    cl = ("map -s tests/small_pe.mstats -o tests/small_pe.sam "
          "-i tests/tRex1.idx tests/small_pe_1.fq tests/small_pe_2.fq")
    sam = tmp_path / "hs_pe.sam"
    run_map_hybrid_split(trex1_index, fq1, fq2, str(sam), cl,
                         device_share=0.31, threads=2, lmax=128)
    assert sam.read_text() == _read_golden("small_pe.sam")
