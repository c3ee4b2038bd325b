"""Pallas TPU kernel: batched banded local-alignment scoring.

Computes the reference's AbismalAlign score (src/AbismalAlign.hpp:320-386)
for a batch of (query, genome-window, bandwidth) jobs entirely on the VPU:
int-exact scores, zero floor, per-job band narrowing, and the in-row
insertion chain realized as a log-depth max-prefix scan over lanes.

Band columns live on the 128-lane axis (band width <= 61); jobs tile the
sublane axis.  The diagonal move's query indexing is made lane-uniform by
pre-shifting each job's query by its bandwidth (qi = i + c - b becomes a
row-indexed slice of the shifted query), so the kernel needs no per-lane
gathers.  Out-of-band table cells read as 0, exactly like the reference's
zero-initialized flat table, and the deletion move skips the last band
column (from_above covers [left, right-1); AbismalAlign.hpp:369-377).

The score pass batches over every candidate of a read batch; traceback for
the single winner per read stays on the host (native C++).
"""

from __future__ import annotations

import functools

import numpy as np

ALN_MATCH = 2
ALN_MISMATCH = -3
ALN_INDEL = -4
BW_MAX = 61
LANES = 128
NEG = -(1 << 14)


def _kernel_body(jnp, jax, pl, pltpu, q_ref, win_ref, bw_ref, qsz_ref,
                 out_ref, lp: int, jb: int):
    lanes = jnp.arange(LANES, dtype=jnp.int32)[None, :]
    bw = bw_ref[:, 0][:, None]  # (jb, 1)
    qsz = qsz_ref[:, 0][:, None]
    t_shift = qsz + bw
    n_rows = lp + BW_MAX

    def row_step(i, carry):
        # qbuf is the query pre-rolled so lane c holds q_shift[:, i + c];
        # wbuf lane 0 holds win[:, i - 1] (Mosaic has no unaligned dynamic
        # lane slices, so the buffers ride in registers and roll one lane
        # per row)
        prev, best, qbuf, wbuf = carry
        left = jnp.maximum(bw - i, 0)
        right = jnp.minimum(bw, t_shift - i)
        valid = (lanes >= left) & (lanes < right) & (i < t_shift)

        qrow = qbuf[:, :LANES]
        ref_base = wbuf[:, 0:1]
        sub = jnp.where((qrow & ref_base) != 0, ALN_MATCH, ALN_MISMATCH)
        v = jnp.maximum(0, prev + sub)

        # deletion (from above): prev[c + 1] + indel, only c in [left,
        # right-1)
        above = jnp.concatenate(
            [prev[:, 1:], jnp.zeros((jb, 1), jnp.int32)], axis=1)
        v = jnp.where(lanes < right - 1,
                      jnp.maximum(v, above + ALN_INDEL), v)

        # insertion chain (from left), within [left, right): log-depth
        # max-prefix scan of v[k] - indel*(c - k)
        m = jnp.where(valid, v - ALN_INDEL * lanes, NEG)
        shift = 1
        while shift < LANES:
            rolled = jnp.concatenate(
                [jnp.full((jb, shift), NEG, jnp.int32), m[:, :-shift]],
                axis=1)
            m = jnp.maximum(m, rolled)
            shift *= 2
        v = m + ALN_INDEL * lanes

        stored = jnp.where(valid, v, 0)
        best = jnp.maximum(best, jnp.max(stored, axis=1))
        qbuf = pltpu.roll(qbuf, shift=qbuf.shape[1] - 1, axis=1)
        wbuf = pltpu.roll(wbuf, shift=wbuf.shape[1] - 1, axis=1)
        return stored, best, qbuf, wbuf

    prev0 = jnp.zeros((jb, LANES), jnp.int32)
    best0 = jnp.zeros((jb,), dtype=jnp.int32)
    q0 = q_ref[:].astype(jnp.int32)
    qbuf0 = pltpu.roll(q0, shift=q0.shape[1] - 1, axis=1)
    wbuf0 = win_ref[:].astype(jnp.int32)
    _, best, _, _ = jax.lax.fori_loop(
        1, n_rows, row_step, (prev0, best0, qbuf0, wbuf0))
    out_ref[:, 0] = best


def build_banded_scorer(lp: int = 128, jb: int = 16, interpret: bool = False):
    """Returns a jitted f(q_shift, win, bw, qsz) -> scores (J, 1) i32.

    q_shift: (J, lp + BW_MAX + LANES) u8 -- query nibbles of job j placed
        at [bw_j, bw_j + q_sz); zeros elsewhere.
    win: (J, lp + BW_MAX + 2) u8 -- genome nibbles from t_beg_j.
    bw: (J, 1) i32 band widths; qsz: (J, 1) i32 query lengths.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    qw = lp + BW_MAX + LANES
    ww = lp + BW_MAX + 2
    body = functools.partial(_kernel_body, jnp, jax, pl, pltpu,
                             lp=lp, jb=jb)

    def scorer(q_shift, win, bw, qsz):
        j = q_shift.shape[0]
        grid = (j // jb,)
        return pl.pallas_call(
            body,
            grid=grid,
            in_specs=[
                pl.BlockSpec((jb, qw), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((jb, ww), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((jb, 1), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((jb, 1), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((jb, 1), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((j, 1), jnp.int32),
            interpret=interpret,
        )(q_shift, win, bw, qsz)

    return jax.jit(scorer)


def prepare_jobs(genome_nib: np.ndarray, jobs, lp: int = 128, jb: int = 16):
    """Host-side packing: jobs = [(query_nibbles, diffs, max_diffs, t_pos)].
    Returns (q_shift, win, bw, qsz, n_jobs_padded)."""
    n = len(jobs)
    j_pad = ((n + jb - 1) // jb) * jb if n else jb
    q_shift = np.zeros((j_pad, lp + BW_MAX + LANES), dtype=np.uint8)
    win = np.zeros((j_pad, lp + BW_MAX + 2), dtype=np.uint8)
    bw = np.ones((j_pad, 1), dtype=np.int32)
    qsz = np.zeros((j_pad, 1), dtype=np.int32)
    for i, (q, diffs, max_diffs, t_pos) in enumerate(jobs):
        b = 2 * min(diffs, max_diffs) + 1
        b = BW_MAX if b < 0 else min(BW_MAX, b)
        t_beg = t_pos - (b - 1) // 2
        length = q.shape[0]
        q_shift[i, b : b + length] = q
        w = genome_nib[t_beg : t_beg + length + BW_MAX + 2]
        win[i, : w.shape[0]] = w
        bw[i, 0] = b
        qsz[i, 0] = length
    return q_shift, win, bw, qsz, j_pad


def score_jobs(genome_nib: np.ndarray, jobs, lp: int = 128,
               interpret: bool = False):
    """Convenience wrapper: returns int scores per job.  Jobs with diffs ==
    0 must be short-circuited by the caller, as in the reference."""
    if not jobs:
        return []
    q_shift, win, bw, qsz, _ = prepare_jobs(genome_nib, jobs, lp)
    scorer = build_banded_scorer(lp, interpret=interpret)
    out = np.asarray(scorer(q_shift, win, bw, qsz))
    return [int(out[i, 0]) for i in range(len(jobs))]


def build_device_align(lp: int = 128, jb: int = 16, interpret: bool = False):
    """Device-resident batched scoring for the mapping hot path: takes the
    packed genome + the stage-1 unit matrix already in HBM plus compact job
    descriptors (unit row, genome pos, band width, query length), builds the
    shifted query rows and genome windows with on-device gathers, and runs
    the Pallas banded scorer.  Upload cost is ~20 B/job; download 4 B/job.

    Returns a jitted f(genome32, pnib, unit_id, pos, bw, qsz) -> (J,) i32.
    pnib is the stage-1 nibble-packed unit matrix (two query nibbles per
    byte); jobs must be padded to a multiple of jb with qsz=0, bw=1 and an
    in-genome pos (the 32767-N padding guarantees index safety)."""
    import jax
    import jax.numpy as jnp

    scorer = build_banded_scorer(lp, jb, interpret=interpret)
    qw = lp + BW_MAX + LANES
    ww = lp + BW_MAX + 2

    def prog(genome32, pnib, unit_id, pos, bw, qsz):
        j = unit_id.shape[0]
        rows = pnib[unit_id]
        q = jnp.stack([rows & np.uint8(0xF), rows >> np.uint8(4)],
                      axis=2).reshape(j, -1)
        col = jnp.arange(qw, dtype=jnp.int32)[None, :]
        src = col - bw[:, None]
        valid = (src >= 0) & (src < qsz[:, None])
        srcc = jnp.clip(src, 0, q.shape[1] - 1)
        q_shift = jnp.where(valid, jnp.take_along_axis(q, srcc, axis=1),
                            np.uint8(0))
        t_beg = pos - ((bw - 1) // 2).astype(jnp.uint32)
        gpos = t_beg[:, None] + jnp.arange(ww, dtype=jnp.uint32)[None, :]
        word = genome32[(gpos >> np.uint32(3)).astype(jnp.int32)]
        win = ((word >> ((gpos & np.uint32(7)) * np.uint32(4)))
               & np.uint32(0xF)).astype(jnp.uint8)
        out = scorer(q_shift, win, bw[:, None], qsz[:, None])
        return out[:, 0]

    return jax.jit(prog)
