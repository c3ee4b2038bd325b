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
