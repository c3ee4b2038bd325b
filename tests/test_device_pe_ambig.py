"""Device PE mating sweep under -a (allow-ambig): the sweep stays live on
the accelerator path (VERDICT r4 ask #5) and output is byte-identical to
the native engine, which is itself md5-validated against the upstream
binary for the -a flag matrix (tests/test_flags.py).

Under -a, ambiguous pairs ARE reported, so the winner's identity matters
for every pair.  The only divergence the reference's mid-sweep sure-ambig
early exit (abismal.cpp:1722-1831) can introduce is a max-score tie with
differing diff-sums; the device flags those orientations (mate slot 9)
for the host's exact injected-score replay.  These tests assert both the
byte equality and that the device sweep actually decided pairs
(n_device_mated > 0)."""

import pytest

from tests.conftest import golden_path


@pytest.mark.parametrize("prefix,random_pbat", [
    ("small_pe", False),
    ("small_rpbat_pe", True),
])
def test_device_pe_sweep_allow_ambig(tmp_path, trex1_index, prefix,
                                     random_pbat):
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.pipeline import (
        make_native_engine_factory,
        make_tpu_native_engine_factory,
    )

    fq1 = golden_path(prefix + "_1.fq")
    fq2 = golden_path(prefix + "_2.fq")
    cl = f"map -a -i tests/tRex1.idx tests/{prefix}"

    nat_sam = tmp_path / "nat.sam"
    nat_mst = tmp_path / "nat.mstats"
    run_map(trex1_index, fq1, fq2, str(nat_sam), str(nat_mst), cl,
            allow_ambig=True, random_pbat=random_pbat,
            engine_factory=make_native_engine_factory(n_threads=2))

    dev_sam = tmp_path / "dev.sam"
    dev_mst = tmp_path / "dev.mstats"
    fac = make_tpu_native_engine_factory(unit_batch=128, n_threads=2)
    run_map(trex1_index, fq1, fq2, str(dev_sam), str(dev_mst), cl,
            allow_ambig=True, random_pbat=random_pbat, engine_factory=fac)

    assert dev_sam.read_text() == nat_sam.read_text()
    assert dev_mst.read_text() == nat_mst.read_text()
    eng = fac(trex1_index, True, 0.1, 32, 3000)
    assert eng.n_device_mated > 0, \
        "the device mating sweep must decide pairs under -a"
