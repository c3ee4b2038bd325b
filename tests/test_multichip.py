"""End-to-end multi-chip mapping: unit batches sharded over an 8-device CPU
mesh (index replicated per device) must produce byte-identical SAM/mstats to
the golden single-device output.  This is the SURVEY 2.5 data-parallel
design: reads sharded, index replicated, device event counts psum'd, host
gather in global read order."""

import gzip
import os

import pytest

from tests.conftest import GOLDEN, golden_path


def _read_golden(name: str) -> str:
    with gzip.open(os.path.join(GOLDEN, name + ".gz"), "rt") as f:
        return f.read()


@pytest.mark.parametrize("prefix,paired", [
    ("small", False),
    ("small_pe", True),
])
def test_mesh_mapping_byte_identical(tmp_path, trex1_index, prefix, paired):
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU mesh")
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.map.pipeline import make_tpu_native_engine_factory

    fq1 = golden_path(prefix + "_1.fq")
    fq2 = golden_path(prefix + "_2.fq") if paired else None
    tail = (f"tests/{prefix}_1.fq tests/{prefix}_2.fq" if paired
            else f"tests/{prefix}_1.fq")
    cl = (f"map -s tests/{prefix}.mstats -o tests/{prefix}.sam "
          f"-i tests/tRex1.idx {tail}")
    sam = tmp_path / "out.sam"
    mstats = tmp_path / "out.mstats"
    run_map(trex1_index, fq1, fq2, str(sam), str(mstats), cl,
            engine_factory=make_tpu_native_engine_factory(
                unit_batch=128, n_threads=2, mesh_devices=8))
    assert sam.read_text() == _read_golden(prefix + ".sam")
    assert mstats.read_text() == _read_golden(prefix + ".mstats")
