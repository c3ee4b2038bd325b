"""Differential flag coverage: -a, -j, -c, map -R (SE and PE), sim -loc,
sim --require-valid / --show-matches, idx -A and mapping against a
target-masked index.  Every pinned md5 below was validated byte-for-byte
against the upstream reference binary (tools/reference_oracle) on
2026-08-17; the SAM hashes include the @PG line, so the command-line
strings here are fixed."""

import dataclasses
import hashlib
import os

import pytest

from tests.conftest import DATA, golden_path


def _md5(p):
    return hashlib.md5(open(p, "rb").read()).hexdigest()


@pytest.fixture(scope="module")
def native_factory():
    from abismal_tpu.map.pipeline import make_native_engine_factory

    return make_native_engine_factory(n_threads=2)


def test_map_allow_ambig(tmp_path, trex1_index, native_factory):
    from abismal_tpu.map.engine import run_map

    sam, mst = tmp_path / "a.sam", tmp_path / "a.mstats"
    run_map(trex1_index, golden_path("small_1.fq"), None, str(sam),
            str(mst), "map -a", allow_ambig=True,
            engine_factory=native_factory)
    assert _md5(sam) == "1db65688418f0291bbc660068d861d68"
    assert _md5(mst) == "202fe58e549307bdb0a344e0fe1222bf"


def test_map_json_stats(tmp_path, trex1_index, native_factory):
    from abismal_tpu.map.engine import run_map

    sam, mst = tmp_path / "j.sam", tmp_path / "j.mstats"
    run_map(trex1_index, golden_path("small_1.fq"), None, str(sam),
            str(mst), "map -j", stats_json=True,
            engine_factory=native_factory)
    assert _md5(mst) == "f3047b44aa5dcd721f84ba77a1ec6ce3"


def test_map_max_candidates(tmp_path, trex1_index, native_factory):
    from abismal_tpu.map.engine import run_map

    i50 = dataclasses.replace(trex1_index, max_candidates=50)
    sam, mst = tmp_path / "c.sam", tmp_path / "c.mstats"
    run_map(i50, golden_path("small_1.fq"), None, str(sam), str(mst),
            "map -c 50", engine_factory=native_factory)
    assert _md5(sam) == "c9dc6a3094ccd51e38bf3a78513ba5dd"
    assert _md5(mst) == "4ae3239c49d5c1bc62e5890ef2af745d"


def test_map_random_pbat_se(tmp_path, trex1_index, native_factory):
    from abismal_tpu.map.engine import run_map

    sam, mst = tmp_path / "r.sam", tmp_path / "r.mstats"
    run_map(trex1_index, golden_path("small_rpbat_pe_1.fq"), None, str(sam),
            str(mst), "map -R se", random_pbat=True,
            engine_factory=native_factory)
    assert _md5(sam) == "7ffd2486743fd4baa1a935373e3fb619"
    assert _md5(mst) == "b7e6e9b012e5f955b571258959a1a51e"


def test_map_random_pbat_pe(tmp_path, trex1_index, native_factory):
    from abismal_tpu.map.engine import run_map

    sam, mst = tmp_path / "r2.sam", tmp_path / "r2.mstats"
    run_map(trex1_index, golden_path("small_rpbat_pe_1.fq"),
            golden_path("small_rpbat_pe_2.fq"), str(sam), str(mst),
            "map -R pe", random_pbat=True, engine_factory=native_factory)
    assert _md5(sam) == "40ebd789738483dfc98d497197606ac2"
    assert _md5(mst) == "eee5bb879be4604833d5dab7a62eda4b"


def test_sim_locations(tmp_path, trex1_fa):
    from abismal_tpu.sim.simreads import SimConfig, simulate_reads

    simulate_reads(trex1_fa, SimConfig(
        output_prefix=str(tmp_path / "s"), n_reads=200, mutation_rate=0.02,
        bs_conv=0.95, seed=9, locations_file=str(tmp_path / "s.loc")))
    assert _md5(tmp_path / "s.loc") == "116cee490ba1b3f5954d1c79786434bc"
    assert _md5(tmp_path / "s_1.fq") == "e6a4c887f6161a37ae2e09a1fa2ecce1"


def test_sim_require_valid(tmp_path, trex1_fa):
    """The reference's resampling loop re-draws while the fragment is
    all-ACGT (simreads.cpp:276-291); RNG consumption differs, so output
    changes -- validated against the upstream binary."""
    from abismal_tpu.sim.simreads import SimConfig, simulate_reads

    simulate_reads(trex1_fa, SimConfig(
        output_prefix=str(tmp_path / "v"), n_reads=60, mutation_rate=0.02,
        bs_conv=0.95, seed=3, require_valid=True,
        locations_file=str(tmp_path / "v.loc")))
    assert _md5(tmp_path / "v_1.fq") == "04858800cf14390d0a6d3bd49270da38"
    assert _md5(tmp_path / "v.loc") == "ad5d1b8e6e2ffb6cfb0dd2f76d529fdc"


def test_sim_show_matches_toggle(tmp_path, trex1_fa):
    """--show-matches toggles the default ON state off ('='->'M' merge in
    loc cigars), matching the reference's bool-option semantics."""
    from abismal_tpu.sim.simreads import SimConfig, simulate_reads

    simulate_reads(trex1_fa, SimConfig(
        output_prefix=str(tmp_path / "m"), n_reads=60, mutation_rate=0.02,
        bs_conv=0.95, seed=3, show_cigar_matches=False,
        locations_file=str(tmp_path / "m.loc")))
    assert _md5(tmp_path / "m.loc") == "80ee295ecd88a9bb12ddd6d93dbcbd5b"


def test_idx_targets_and_map(tmp_path, trex1_fa, native_factory):
    """idx -A masks everything outside the target regions (closed-interval
    quirk included); the serialized index and mapping against it match the
    upstream binary byte-for-byte."""
    from abismal_tpu.index.build import create_index_targets
    from abismal_tpu.index.serialize import write_index
    from abismal_tpu.map.engine import run_map

    ia = create_index_targets(os.path.join(DATA, "targets.bed"), trex1_fa,
                              n_threads=4)
    idx_file = tmp_path / "A.idx"
    write_index(ia, str(idx_file))
    assert _md5(idx_file) == "0696bc93c7cd91c943f1c9badd5268ea"

    sam, mst = tmp_path / "B.sam", tmp_path / "B.mstats"
    run_map(ia, golden_path("small_1.fq"), None, str(sam), str(mst),
            "map targets", engine_factory=native_factory)
    assert _md5(sam) == "c630d79d727fa1c3d6e97983c847d2e1"
    assert _md5(mst) == "8f8cf52123b509a2b3b8c2ed1d586fd7"
