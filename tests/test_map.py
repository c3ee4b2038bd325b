"""Mapping parity: SAM + mstats byte-identical to the reference on the
500-read golden sets (all four protocols).  Full 10k parity is covered by
tests marked `slow`."""

import gzip
import os

import pytest

from tests.conftest import GOLDEN, golden_path


def _read_golden(name: str) -> str:
    with gzip.open(os.path.join(GOLDEN, name + ".gz"), "rt") as f:
        return f.read()


CASES = [
    ("small", False, False),
    ("small_pe", True, False),
    ("small_pbat_pe", True, True),
    ("small_rpbat_pe", True, True),  # upstream maps RPBAT reads with -P
]


@pytest.mark.parametrize("prefix,paired,pbat", CASES)
def test_map_parity_small(tmp_path, trex1_index, prefix, paired, pbat):
    from abismal_tpu.map.engine import run_map

    flag = "-P " if pbat else ""
    if paired:
        fq1 = golden_path(prefix + "_1.fq")
        fq2 = golden_path(prefix + "_2.fq")
        cl = (f"map {flag}-s tests/{prefix}.mstats -o tests/{prefix}.sam "
              f"-i tests/tRex1.idx tests/{prefix}_1.fq tests/{prefix}_2.fq")
    else:
        fq1 = golden_path(prefix + "_1.fq")
        fq2 = None
        cl = (f"map {flag}-s tests/{prefix}.mstats -o tests/{prefix}.sam "
              f"-i tests/tRex1.idx tests/{prefix}_1.fq")
    sam = tmp_path / "out.sam"
    mstats = tmp_path / "out.mstats"
    run_map(trex1_index, fq1, fq2, str(sam), str(mstats), cl, pbat=pbat)
    assert sam.read_text() == _read_golden(prefix + ".sam")
    assert mstats.read_text() == _read_golden(prefix + ".mstats")


@pytest.mark.parametrize("prefix,paired,pbat", CASES)
@pytest.mark.parametrize("threads", [1, 3])
def test_native_engine_parity_small(tmp_path, trex1_index, prefix, paired,
                                    pbat, threads):
    """The C++ batched engine (native seeding + decide/align/format) must be
    byte-identical to the goldens at any thread count."""
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.pipeline import make_native_engine_factory

    flag = "-P " if pbat else ""
    fq1 = golden_path(prefix + "_1.fq")
    fq2 = golden_path(prefix + "_2.fq") if paired else None
    tail = (f"tests/{prefix}_1.fq tests/{prefix}_2.fq" if paired
            else f"tests/{prefix}_1.fq")
    cl = (f"map {flag}-s tests/{prefix}.mstats -o tests/{prefix}.sam "
          f"-i tests/tRex1.idx {tail}")
    sam = tmp_path / "out.sam"
    mstats = tmp_path / "out.mstats"
    run_map(trex1_index, fq1, fq2, str(sam), str(mstats), cl, pbat=pbat,
            engine_factory=make_native_engine_factory(n_threads=threads))
    assert sam.read_text() == _read_golden(prefix + ".sam")
    assert mstats.read_text() == _read_golden(prefix + ".mstats")


@pytest.mark.slow
@pytest.mark.parametrize(
    "prefix,paired,pbat",
    [("reads", False, False), ("reads_pe", True, False),
     ("reads_pbat_pe", True, True), ("reads_rpbat_pe", True, True)],
)
def test_native_engine_parity_full(tmp_path, trex1_index, prefix, paired,
                                   pbat):
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.pipeline import make_native_engine_factory

    flag = "-P " if pbat else ""
    fq1 = golden_path(prefix + "_1.fq")
    fq2 = golden_path(prefix + "_2.fq") if paired else None
    tail = (f"tests/{prefix}_1.fq tests/{prefix}_2.fq" if paired
            else f"tests/{prefix}_1.fq")
    cl = (f"map {flag}-s tests/{prefix}.mstats -o tests/{prefix}.sam "
          f"-i tests/tRex1.idx {tail}")
    sam = tmp_path / "out.sam"
    mstats = tmp_path / "out.mstats"
    run_map(trex1_index, fq1, fq2, str(sam), str(mstats), cl, pbat=pbat,
            engine_factory=make_native_engine_factory(n_threads=4))
    assert sam.read_text() == _read_golden(prefix + ".sam")
    assert mstats.read_text() == _read_golden(prefix + ".mstats")


@pytest.mark.slow
@pytest.mark.parametrize(
    "prefix,paired,pbat",
    [("reads", False, False), ("reads_pe", True, False),
     ("reads_pbat_pe", True, True), ("reads_rpbat_pe", True, True)],
)
def test_map_parity_full(tmp_path, trex1_index, prefix, paired, pbat):
    from abismal_tpu.map.engine import run_map

    flag = "-P " if pbat else ""
    fq1 = golden_path(prefix + "_1.fq")
    fq2 = golden_path(prefix + "_2.fq") if paired else None
    tail = (f"tests/{prefix}_1.fq tests/{prefix}_2.fq" if paired
            else f"tests/{prefix}_1.fq")
    cl = (f"map {flag}-s tests/{prefix}.mstats -o tests/{prefix}.sam "
          f"-i tests/tRex1.idx {tail}")
    sam = tmp_path / "out.sam"
    mstats = tmp_path / "out.mstats"
    run_map(trex1_index, fq1, fq2, str(sam), str(mstats), cl, pbat=pbat)
    assert sam.read_text() == _read_golden(prefix + ".sam")
    assert mstats.read_text() == _read_golden(prefix + ".mstats")


def test_parallel_runner_parity(tmp_path, trex1_index):
    """-t N output must be byte-identical to the sequential engine."""
    from abismal_tpu.map.engine import run_map

    fq = golden_path("small_1.fq")
    cl = ("map -s tests/small.mstats -o tests/small.sam -i tests/tRex1.idx "
          "tests/small_1.fq")
    sam = tmp_path / "t.sam"
    mst = tmp_path / "t.mstats"
    run_map(trex1_index, fq, None, str(sam), str(mst), cl, threads=3)
    assert sam.read_text() == _read_golden("small.sam")
    assert mst.read_text() == _read_golden("small.mstats")


def test_parallel_runner_pe_ignores_a_rich(tmp_path, trex1_index):
    """-A is ignored for paired-end (abismal.cpp:2477-2480); the parallel
    runner must produce the same bytes as the sequential engine."""
    from abismal_tpu.map.engine import run_map

    fq1 = golden_path("small_pe_1.fq")
    fq2 = golden_path("small_pe_2.fq")
    # NB: the golden's @PG CL string (no -A) is kept; only the engine flag
    # is exercised, which must not affect paired-end output
    cl = ("map -s tests/small_pe.mstats -o tests/small_pe.sam "
          "-i tests/tRex1.idx tests/small_pe_1.fq tests/small_pe_2.fq")
    sam = tmp_path / "t.sam"
    mst = tmp_path / "t.mstats"
    run_map(trex1_index, fq1, fq2, str(sam), str(mst), cl, a_rich=True,
            threads=3)
    assert sam.read_text() == _read_golden("small_pe.sam")
    assert mst.read_text() == _read_golden("small_pe.mstats")


def test_hybrid_runner_receives_engine_factory(trex1_index, monkeypatch):
    """run_map must forward the configured --lmax/unit_batch factory into
    the hybrid runner instead of letting it rebuild defaults."""
    import abismal_tpu.map.runner as runner_mod
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.pipeline import make_tpu_engine_factory

    seen = {}

    def fake_hybrid(index, f1, f2, out, cl, n, engine_factory=None, **kw):
        seen["factory"] = engine_factory
        from abismal_tpu.map.stats import SEStats

        return SEStats()

    monkeypatch.setattr(runner_mod, "run_map_hybrid", fake_hybrid)
    factory = make_tpu_engine_factory(lmax=256, unit_batch=64)
    run_map(trex1_index, golden_path("small_1.fq"), None, "/dev/null",
            None, "map", engine_factory=factory, threads=2)
    assert seen["factory"] is factory


def test_bam_output_roundtrip(tmp_path, trex1_index):
    """-B output parses back to the same records as the SAM golden."""
    from abismal_tpu.io.bam import read_bam_records
    from abismal_tpu.map.engine import run_map

    fq = golden_path("small_1.fq")
    cl = ("map -s tests/small.mstats -o tests/small.sam -i tests/tRex1.idx "
          "tests/small_1.fq")
    bam = tmp_path / "t.bam"
    run_map(trex1_index, fq, None, str(bam), None, cl, bam=True)
    hdr, refs, recs = read_bam_records(str(bam))
    gold = [ln.split("\t") for ln in _read_golden("small.sam").splitlines()
            if not ln.startswith("@")]
    assert len(recs) == len(gold)
    for r, g in zip(recs, gold):
        qname, flag, refid, pos0, mapq, cigar, nrefid, npos, tlen, seq, _ = r
        assert qname == g[0] and flag == int(g[1])
        assert refs[refid][0] == g[2] and pos0 + 1 == int(g[3])
        assert cigar == g[5] and seq == g[9]


def test_json_stats_format():
    """-j output must match nlohmann's (alphabetical keys, compact);
    validated byte-for-byte against the reference binary."""
    from abismal_tpu.map.stats import SEStats, PEStats, stats_to_json

    s = SEStats()
    s.total_reads = 120
    s.reads_mapped_unique = 100
    s.reads_mapped_ambiguous = 5
    s.reads_skipped = 1
    s.edit_distance = 321
    s.total_bases = 11804
    assert stats_to_json(s) == (
        '{"edit_distance":321,"reads_mapped_ambiguous":5,'
        '"reads_mapped_unique":100,"reads_skipped":1,"total_bases":11804,'
        '"total_reads":120}')
    p = PEStats()
    p.read_pair_stats.total_reads = 2
    j = stats_to_json(p)
    assert j.startswith('{"end1_stats":')
    assert '"read_pair_stats":' in j


def test_gzipped_fastq_input(tmp_path, trex1_index):
    """Gzipped FASTQ through the native streaming loop (zlib reader)."""
    import os
    import shutil

    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.pipeline import make_native_engine_factory

    from tests.conftest import GOLDEN

    fq_gz = tmp_path / "small_1.fq.gz"
    shutil.copy(os.path.join(GOLDEN, "small_1.fq.gz"), fq_gz)
    sam = tmp_path / "out.sam"
    run_map(trex1_index, str(fq_gz), None, str(sam), None, "map gz",
            engine_factory=make_native_engine_factory(n_threads=2),
            threads=2)
    body = lambda s: "\n".join(l for l in s.splitlines()
                               if not l.startswith("@PG"))
    assert body(sam.read_text()) == body(_read_golden("small.sam"))


def test_native_bam_payload_matches_python_writer(tmp_path, trex1_index):
    """The native streaming BAM writer's decompressed payload must equal
    the Python BamWriter's byte for byte (same record layout and aux-type
    narrowing; only BGZF block boundaries may differ)."""
    import gzip
    import io
    import os
    import shutil

    from tests.conftest import GOLDEN

    from abismal_tpu.io.bam import BamWriter
    from abismal_tpu.io.fastq import ReadLoader
    from abismal_tpu.io.sam import make_sam_header
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.native_engine import NativeMappingEngine
    from abismal_tpu.map.pipeline import make_native_engine_factory
    from abismal_tpu.map.stats import SEStats

    fq = str(tmp_path / "small_1.fq")
    with gzip.open(os.path.join(GOLDEN, "small_1.fq.gz"), "rb") as f:
        open(fq, "wb").write(f.read())

    bam_n = tmp_path / "native.bam"
    run_map(trex1_index, fq, None, str(bam_n), None, "map bam",
            engine_factory=make_native_engine_factory(n_threads=2),
            threads=2, bam=True)

    eng = NativeMappingEngine(trex1_index, n_threads=2)
    bam_p = tmp_path / "python.bam"
    w = BamWriter(str(bam_p))
    w.write(make_sam_header(trex1_index.cl, "map bam"))
    st = SEStats()
    rl = ReadLoader(fq)
    while rl:
        b = rl.load_batch()
        if b:
            out = io.StringIO()
            eng.map_se_reads(b, False, False, st, out)
            w.write(out.getvalue())
    w.close()

    assert gzip.decompress(bam_n.read_bytes()) == \
        gzip.decompress(bam_p.read_bytes())
