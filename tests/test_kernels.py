"""Pallas banded-alignment kernel vs the host aligner (interpret mode; the
compiled path is exercised on real hardware by bench/integration runs)."""

import numpy as np
import pytest


@pytest.mark.slow
def test_banded_score_kernel_matches_aligner(trex1_index):
    from abismal_tpu.kernels.banded_align import score_jobs
    from abismal_tpu.map.align import BandedAligner
    from abismal_tpu.map.seeds import SeedIndexView, prep_read

    view = SeedIndexView(trex1_index)
    aln = BandedAligner(view.nib)
    aln.reset(128)

    rng = np.random.default_rng(5)
    nib_to_char = np.frombuffer(b"ZACMGRSVTWYHKDBN", dtype=np.uint8)
    jobs = []
    expected = []
    for _ in range(16):
        p = int(rng.integers(40000, 900000))
        length = int(rng.integers(80, 120))
        s = bytearray(
            nib_to_char[view.nib[p : p + length]].tobytes().replace(b"Z", b"A")
        )
        for _ in range(int(rng.integers(0, 8))):
            s[int(rng.integers(0, length))] = ord(rng.choice(list("ACGT")))
        q = prep_read(bytes(s), bool(rng.integers(0, 2)))
        diffs = int(rng.integers(1, 30))
        max_diffs = int(rng.integers(5, 15))
        jobs.append((q, diffs, max_diffs, p))
        expected.append(aln.align(diffs, max_diffs, q, p, False))

    got = score_jobs(view.nib, jobs, interpret=True)
    assert got == expected


def test_native_aligner_matches_numpy_oracle(trex1_index):
    """The native C++ aligner must agree with the pure-NumPy reference
    implementation, including traceback cigars."""
    from abismal_tpu.map.align import BandedAligner
    from abismal_tpu.map.seeds import SeedIndexView, prep_read

    view = SeedIndexView(trex1_index)
    nat = BandedAligner(view.nib, use_native=True)
    ora = BandedAligner(view.nib, use_native=False)
    nat.reset(128)
    ora.reset(128)

    rng = np.random.default_rng(6)
    nib_to_char = np.frombuffer(b"ZACMGRSVTWYHKDBN", dtype=np.uint8)
    for _ in range(40):
        p = int(rng.integers(40000, 900000))
        length = int(rng.integers(60, 128))
        s = bytearray(
            nib_to_char[view.nib[p : p + length]].tobytes().replace(b"Z", b"A")
        )
        for _ in range(int(rng.integers(0, 10))):
            s[int(rng.integers(0, length))] = ord(rng.choice(list("ACGT")))
        q = prep_read(bytes(s), bool(rng.integers(0, 2)))
        diffs = int(rng.integers(1, 30))
        max_diffs = int(rng.integers(5, 15))
        s_nat = nat.align(diffs, max_diffs, q, p, True)
        s_ora = ora.align(diffs, max_diffs, q, p, True)
        assert s_nat == s_ora
        c_nat = nat.build_cigar_len_and_pos(diffs, max_diffs, p)
        c_ora = ora.build_cigar_len_and_pos(diffs, max_diffs, p)
        assert c_nat == c_ora


def test_popcount_compare_kernel_matches_oracle():
    """The Pallas compare kernel (interpret mode) vs a direct NumPy
    evaluation of full_compare's word form (abismal.cpp:1105-1122)."""
    import jax

    from abismal_tpu.kernels.popcount_compare import build_popcount_compare

    rng = np.random.default_rng(11)
    for g, aw, nw in ((96, 64, 16), (1024, 64, 16), (513, 96, 64)):
        A = rng.integers(0, 1 << 32, size=(g, aw), dtype=np.uint32)
        pk = rng.integers(0, 1 << 32, size=(g, nw), dtype=np.uint32)
        ow = rng.integers(0, 32, size=g).astype(np.int32)
        sh = (rng.integers(0, 8, size=g).astype(np.uint32)) * np.uint32(4)
        nwv = rng.integers(0, nw + 1, size=g).astype(np.int32)

        run = build_popcount_compare(aw, nw, interpret=True)
        got = np.asarray(jax.jit(run)(A, pk, ow, sh, nwv))

        want = np.zeros(g, np.int64)
        for i in range(g):
            row = np.roll(A[i], -int(ow[i]))
            row[aw - int(ow[i]):] = 0
            for j in range(int(nwv[i])):
                win = np.uint32(
                    (int(row[j]) >> int(sh[i]))
                    | ((int(row[j + 1]) << (31 - int(sh[i]))) << 1)
                    & 0xFFFFFFFF)
                want[i] += 8 - bin(int(pk[i, j]) & int(win)).count("1")
        np.testing.assert_array_equal(got.astype(np.int64), want)
