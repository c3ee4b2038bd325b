"""On-device traceback (kernels/banded_align.py build_banded_tracer +
pipeline.build_tb_block) must reproduce the reference's
build_cigar_len_and_pos byte-for-byte: same cigar ops, aligned length and
final position, including the equal-score arrow-overwrite order and the
row-major-first argmax (AbismalAlign.hpp:266-307,388-440)."""

import numpy as np
import pytest

from abismal_tpu.constants import CIGAR_SHIFT, CIGAR_SOFT


def _random_jobs(rng, genome, n):
    """Jobs = (q, bw, qsz, pos) with substitutions and indels so cigars
    carry M/I/D runs and both soft clips."""
    jobs = []
    G = genome.shape[0]
    for _ in range(n):
        qsz = int(rng.integers(60, 121))
        pos = int(rng.integers(200, G - 400))
        q = genome[pos : pos + qsz].copy()
        # substitutions
        for _k in range(int(rng.integers(0, 8))):
            i = int(rng.integers(0, qsz))
            q[i] = 1 << int(rng.integers(0, 4))
        # an insertion and/or deletion
        ql = list(q)
        if rng.random() < 0.5:
            i = int(rng.integers(10, qsz - 10))
            ql.insert(i, 1 << int(rng.integers(0, 4)))
        if rng.random() < 0.5:
            i = int(rng.integers(10, len(ql) - 10))
            del ql[i]
        q = np.array(ql[:qsz], dtype=np.uint8)
        qsz = q.shape[0]
        bw = int(rng.choice([5, 9, 15, 21, 31, 41, 61]))
        jobs.append((q, bw, qsz, pos))
    return jobs


def _assemble(ops_row, meta_row, qsz):
    n_ops, sb, st, npos = (int(x) for x in meta_row)
    assert n_ops >= 0
    cigar = []
    if st > 0:
        cigar.append((st << CIGAR_SHIFT) | CIGAR_SOFT)
    cigar.extend(int(x) for x in ops_row[:n_ops][::-1])
    if sb > 0:
        cigar.append((sb << CIGAR_SHIFT) | CIGAR_SOFT)
    return cigar, qsz - sb - st, npos & 0xFFFFFFFF


def test_device_traceback_matches_oracle():
    from abismal_tpu.kernels.banded_align import QOFF, win_start
    from abismal_tpu.map.align import BandedAligner
    from abismal_tpu.map.pipeline import TB_NOPS, build_tb_block

    rng = np.random.default_rng(42)
    G = 6000
    genome = (1 << rng.integers(0, 4, G)).astype(np.uint8)
    jobs = _random_jobs(rng, genome, 96)

    lmax = 128
    ww = lmax + QOFF
    J2 = 128
    q2 = np.zeros((J2, lmax), np.uint8)
    win2 = np.zeros((J2, ww), np.uint8)
    wbw = np.ones(J2, np.int32)
    wqsz = np.zeros(J2, np.int32)
    wpos = np.zeros(J2, np.uint32)
    do_tb = np.zeros(J2, bool)
    for i, (q, bw, qsz, pos) in enumerate(jobs):
        q2[i, :qsz] = q
        g0 = win_start(pos, bw)
        win2[i] = genome[g0 : g0 + ww]
        wbw[i], wqsz[i], wpos[i], do_tb[i] = bw, qsz, pos, True

    tb = build_tb_block(lmax, interpret=True)
    ops, meta = (np.asarray(a) for a in
                 tb(q2, win2, wbw, wqsz, wpos, do_tb))

    aln = BandedAligner(genome, use_native=False)
    aln.reset(lmax)
    n_checked = 0
    for i, (q, bw, qsz, pos) in enumerate(jobs):
        # drive the oracle with diffs that reproduce this bw exactly
        diffs = (bw - 1) // 2
        scr = aln.align(diffs, diffs, q, pos, True)
        want = aln.build_cigar_len_and_pos(diffs, diffs, pos)
        if scr == 0:
            assert int(meta[i, 0]) == -1 or not do_tb[i]
            continue
        got = _assemble(ops[i], meta[i], qsz)
        assert got[0] == want[0], (i, got, want)
        assert got[1] == want[1]
        assert got[2] == want[2] % (1 << 32)
        n_checked += 1
    assert n_checked > 80  # the fixture must exercise real tracebacks


def test_device_traceback_overflow_flags():
    """A pathological alternating query must overflow TB_NOPS and come
    back n_ops = -1 (host-traceback fallback), never a truncated cigar."""
    from abismal_tpu.kernels.banded_align import QOFF, win_start
    from abismal_tpu.map.pipeline import TB_NOPS, build_tb_block

    rng = np.random.default_rng(3)
    G = 4000
    genome = (1 << rng.integers(0, 4, G)).astype(np.uint8)
    lmax = 128
    ww = lmax + QOFF
    J2 = 128
    q2 = np.zeros((J2, lmax), np.uint8)
    win2 = np.zeros((J2, ww), np.uint8)
    wbw = np.ones(J2, np.int32)
    wqsz = np.zeros(J2, np.int32)
    wpos = np.zeros(J2, np.uint32)
    do_tb = np.zeros(J2, bool)
    pos, qsz, bw = 1000, 120, 61
    q = genome[pos : pos + qsz].copy()
    # a substitution every 3 bases makes ~2*qsz/3 runs >> TB_NOPS
    for i in range(0, qsz, 3):
        q[i] = genome[pos + i] ^ 0xF or 1
        q[i] = np.uint8(1 << int(rng.integers(0, 4)))
    q2[0, :qsz] = q
    g0 = win_start(pos, bw)
    win2[0] = genome[g0 : g0 + ww]
    wbw[0], wqsz[0], wpos[0], do_tb[0] = bw, qsz, pos, True

    tb = build_tb_block(lmax, interpret=True)
    ops, meta = (np.asarray(a) for a in
                 tb(q2, win2, wbw, wqsz, wpos, do_tb))
    # either it legitimately fits (score floor broke the aln into a short
    # local island) or it must flag -1; recompute the oracle to decide
    from abismal_tpu.map.align import BandedAligner

    aln = BandedAligner(genome, use_native=False)
    aln.reset(lmax)
    diffs = (bw - 1) // 2
    scr = aln.align(diffs, diffs, q, pos, True)
    want = aln.build_cigar_len_and_pos(diffs, diffs, pos)
    n_runs = len([o for o in want[0] if (o & 0xF) != CIGAR_SOFT])
    if n_runs > TB_NOPS:
        assert int(meta[0, 0]) == -1
    else:
        got = _assemble(ops[0], meta[0], qsz)
        assert got[0] == want[0]
