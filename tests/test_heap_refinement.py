"""Sure-ambig heap-fill refinement (round 5): reads whose second distinct
exact match is discovered before the 49th non-exact insert abort seeding
in the reference before the heap can fill (check_hits' per-candidate
sure_ambig test, abismal.cpp:1133), so the device decides them without
host fallback.  A tandem-repeat genome makes such reads common; output
must stay byte-identical to the native engine while fallback drops."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def repeat_index(tmp_path_factory):
    from abismal_tpu.index.build import create_index

    rng = np.random.default_rng(77)
    d = tmp_path_factory.mktemp("repidx")
    fa = d / "rep.fa"
    unit = "".join(rng.choice(list("ACGT"), size=131))
    seq = ("".join(rng.choice(list("ACGT"), size=60_000))
           + unit * 500  # 65.5 kb tandem block: many exact hits per read
           + "".join(rng.choice(list("ACGT"), size=60_000)))
    with open(fa, "w") as f:
        f.write(">chrR\n")
        for i in range(0, len(seq), 80):
            f.write(seq[i : i + 80] + "\n")
    return str(fa), create_index(str(fa))


def test_sure_ambig_exact_reads_decided_on_device(tmp_path, repeat_index):
    import io

    from abismal_tpu.map.native_engine import NativeMappingEngine
    from abismal_tpu.map.pipeline import TpuNativeEngine
    from abismal_tpu.map.stats import SEStats
    from abismal_tpu.io.fastq import ReadLoader
    from abismal_tpu.sim.simreads import SimConfig, simulate_reads

    fa, index = repeat_index
    # unmutated reads sampled across the genome: repeat-block reads have
    # dozens of exact matches (sure-ambig almost immediately) AND far
    # more than 49 near-exact candidates (heap_would_fill)
    simulate_reads(fa, SimConfig(
        output_prefix=str(tmp_path / "r"), n_reads=400, mutation_rate=0.0,
        bs_conv=0.98, seed=5, single_end=True))
    batch = ReadLoader(str(tmp_path / "r_1.fq")).load_batch()

    dev = TpuNativeEngine(index, unit_batch=1024, n_threads=2)
    out_dev = io.StringIO()
    st_dev = SEStats()
    dev.map_se_reads(batch, False, False, st_dev, out_dev)

    host = NativeMappingEngine(index, n_threads=2)
    out_host = io.StringIO()
    st_host = SEStats()
    host.map_se_reads(batch, False, False, st_host, out_host)

    assert out_dev.getvalue() == out_host.getvalue()
    assert st_dev.__dict__ == st_host.__dict__
    # the refinement must keep the fallback fraction well below the
    # repeat-read fraction: with ~1/3 of reads from the tandem block,
    # pre-refinement fallback was ~all of them
    frac = dev.n_fallback / max(1, dev.n_units)
    assert frac < 0.15, f"fallback {frac:.3f}: refinement not engaging"
    assert st_dev.reads_mapped_ambiguous > 50, "workload lost its ambigs"
