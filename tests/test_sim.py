"""Simulator parity: FASTQ outputs must be byte-identical to `abismal sim`
for all four protocols (seed 1, upstream golden md5s)."""

import pytest

from tests.conftest import golden_path, md5_file


@pytest.mark.parametrize(
    "prefix,kwargs",
    [
        ("reads", dict(single_end=True)),
        ("reads_pe", dict()),
        ("reads_pbat_pe", dict(pbat=True)),
        ("reads_rpbat_pe", dict(random_pbat=True)),
    ],
)
def test_sim_parity(tmp_path, trex1_fa, prefix, kwargs):
    from abismal_tpu.sim.simreads import SimConfig, simulate_reads

    cfg = SimConfig(
        output_prefix=str(tmp_path / prefix),
        n_reads=10000, mutation_rate=0.01, bs_conv=0.98, seed=1, **kwargs,
    )
    simulate_reads(trex1_fa, cfg)
    single = kwargs.get("single_end", False)
    suffixes = ["_1.fq"] if single else ["_1.fq", "_2.fq"]
    for s in suffixes:
        assert md5_file(str(tmp_path / (prefix + s))) == md5_file(
            golden_path(prefix + s)
        )
