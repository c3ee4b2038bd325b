"""Regression: mixed-case genome with IUPAC ambiguity codes.  IUPAC nibbles
carry multiple bits, so the bisulfite-aware popcount 'distance' can go
NEGATIVE; the reference's size_t cast then selects the full alignment band
(AbismalAlign.hpp:332-334).  Pinned md5s were validated byte-for-byte
against the upstream binary on 2026-08-17."""

import hashlib

import numpy as np
import pytest

IDX_MD5 = "fd50f44d8ea4ae6f9dec23121e624b64"
SAM_BODY_MD5 = "fedf1e01d194c0e305156931b2dd3310"
MSTATS_MD5 = "146899941bbc5d24b68a571729fa07c3"


def _build_genome(path):
    rng = np.random.default_rng(123)
    n = 300000
    seq = rng.choice(list("ACGT"), size=n)
    low = rng.random(n) < 0.3
    seq = np.where(low, np.char.lower(seq.astype("U1")), seq)
    iup = rng.integers(0, n, 200)
    seq[iup] = rng.choice(list("RYSWKMBDHVN"), size=200)
    for s, ln in [(5000, 400), (100000, 2000)]:
        seq[s : s + ln] = "N"
    with open(path, "w") as f:
        f.write(">chrA test desc\n")
        s1 = "".join(seq[:250000])
        for i in range(0, len(s1), 70):
            f.write(s1[i : i + 70] + "\n")
        f.write(">chrB\n")
        s2 = "".join(seq[250000:])
        for i in range(0, len(s2), 70):
            f.write(s2[i : i + 70] + "\n")


def _md5(path):
    return hashlib.md5(open(path, "rb").read()).hexdigest()


@pytest.mark.slow
def test_iupac_genome_index_and_map(tmp_path):
    from abismal_tpu.index.build import create_index
    from abismal_tpu.index.serialize import write_index
    from abismal_tpu.map.engine import run_map
    from abismal_tpu.sim.simreads import SimConfig, simulate_reads

    fa = tmp_path / "g1.fa"
    _build_genome(str(fa))
    idx = create_index(str(fa))
    idx_file = tmp_path / "g1.idx"
    write_index(idx, str(idx_file))
    assert _md5(str(idx_file)) == IDX_MD5

    simulate_reads(str(fa), SimConfig(
        output_prefix=str(tmp_path / "gi"), n_reads=150,
        mutation_rate=0.02, bs_conv=0.96, seed=12))
    sam = tmp_path / "g.sam"
    mst = tmp_path / "g.mstats"
    run_map(idx, str(tmp_path / "gi_1.fq"), str(tmp_path / "gi_2.fq"),
            str(sam), str(mst), "cl")
    body = "\n".join(
        ln for ln in sam.read_text().splitlines() if not ln.startswith("@"))
    assert hashlib.md5(body.encode()).hexdigest() == SAM_BODY_MD5
    assert _md5(str(mst)) == MSTATS_MD5
