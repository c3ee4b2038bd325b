"""Regression: a 2.5 Mb synthetic genome with interior N runs and a large
tandem-repeat region (big buckets -> exercises seed extension and the
exclude-interval counting quirk).  The pinned md5s were validated
byte-for-byte against the upstream binary's output on 2026-08-17."""

import hashlib
import os

import numpy as np
import pytest

from tests.conftest import CACHE

IDX_MD5 = "d43b6ac980db6761e09d2226620194f5"
FQ1_MD5 = "ac0dbbd9594a3cd51f0d22e6457aa35f"
SAM_BODY_MD5 = "6ea72f4e63fe5a957cdd0d215302e725"
MSTATS_MD5 = "096e73cc29a5559f027a14053ae51f02"


def _build_genome(path):
    rng = np.random.default_rng(7)
    n = 2_500_000
    seq = rng.choice(list("ACGT"), size=n)
    for _ in range(8):
        s = int(rng.integers(0, n - 5000))
        ln = int(rng.integers(10, 3000))
        seq[s : s + ln] = "N"
    rep = list("ACGTACGTTTAGGC" * 2000)
    s = int(rng.integers(0, n - len(rep)))
    seq[s : s + len(rep)] = rep
    with open(path, "w") as f:
        f.write(">chr1\n")
        joined = "".join(seq)
        for i in range(0, n, 80):
            f.write(joined[i : i + 80] + "\n")


def _md5(path):
    return hashlib.md5(open(path, "rb").read()).hexdigest()


@pytest.mark.slow
def test_midsize_genome_index_and_map(tmp_path):
    from abismal_tpu.index.build import create_index
    from abismal_tpu.index.serialize import write_index
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.sim.simreads import SimConfig, simulate_reads

    fa = tmp_path / "mid.fa"
    _build_genome(str(fa))
    idx = create_index(str(fa))
    idx_file = tmp_path / "mid.idx"
    write_index(idx, str(idx_file))
    assert _md5(str(idx_file)) == IDX_MD5

    simulate_reads(str(fa), SimConfig(
        output_prefix=str(tmp_path / "midr"), n_reads=400,
        mutation_rate=0.02, bs_conv=0.97, seed=5))
    assert _md5(str(tmp_path / "midr_1.fq")) == FQ1_MD5

    sam = tmp_path / "m.sam"
    mst = tmp_path / "m.mstats"
    run_map(idx, str(tmp_path / "midr_1.fq"), str(tmp_path / "midr_2.fq"),
            str(sam), str(mst), "cl")
    body = "\n".join(
        ln for ln in sam.read_text().splitlines() if not ln.startswith("@"))
    assert hashlib.md5(body.encode()).hexdigest() == SAM_BODY_MD5
    assert _md5(str(mst)) == MSTATS_MD5
