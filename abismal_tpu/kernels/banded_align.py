"""Pallas TPU kernel: batched banded local-alignment scoring.

Computes the reference's AbismalAlign score (src/AbismalAlign.hpp:320-386)
for a batch of (query, genome-window, bandwidth) jobs entirely on the VPU:
int-exact scores, zero floor, per-job band narrowing, and the in-row
insertion chain realized as a log-depth max-prefix scan over lanes.

Layout (v3, transposed + bandwidth-free query): band columns live on the
SUBLANE axis (band width <= 61 < BAND=64 sublanes); jobs tile the 128-lane
axis.  Rows are reparametrized as r = i - b (i the reference's table row,
b the per-job band width), which makes the diagonal move's query index
qi = r + c independent of b: the query sits at ONE fixed offset
(QOFF = BW_MAX - 1) for every job, so callers never shift queries per
job, and the kernel reads each row's query window with a sublane-axis
dynamic slice (natively supported by Mosaic) -- no per-lane gathers, no
register rolls.  The per-job genome window absorbs the band placement
instead: win[rr] = genome[pos + (b-1)/2 - QOFF + rr], a start offset
folded into the window gather's index arithmetic for free.  The in-row
insertion chain is a 6-step log-depth max-prefix scan over sublanes.
Out-of-band table cells read as 0, exactly like the reference's
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
BAND = 64  # sublane tile holding one band row (>= BW_MAX)
QOFF = BW_MAX - 1  # fixed query offset in the transposed query panel
LANES = 128
NEG = -(1 << 14)


def _kernel_body(jnp, jax, pl, pltpu, qt_ref, wint_ref, bw_ref, qsz_ref,
                 out_ref, lp: int, jb: int):
    # transposed: band column c on sublanes (BAND=64), jobs on lanes (jb);
    # rows rr = (i - b) + QOFF walk uniformly for every job (see module
    # docstring).  Reference row i = rr - QOFF + b, so the reference's
    # left = max(b - i, 0) = max(QOFF - rr, 0) is per-job CONSTANT-free,
    # and rows before a narrow band's first live row mask out naturally
    # (left >= b >= right there).
    cols = jax.lax.broadcasted_iota(jnp.int32, (BAND, jb), 0)
    bw = bw_ref[0:1, :]  # (1, jb)
    qsz = qsz_ref[0:1, :]
    n_rows = lp + QOFF

    def row_step(rr, carry):
        prev, best = carry
        left = jnp.maximum(QOFF - rr, 0)
        right = jnp.minimum(bw, qsz + (QOFF - rr))
        valid = (cols >= left) & (cols < right)

        # diagonal: q[r + c] vs win[rr] (AbismalAlign.hpp:345-357); the
        # query panel holds q at offset QOFF, so q[r + c] = qt[rr + c]
        qrow = qt_ref[pl.ds(rr, BAND), :]
        ref_base = wint_ref[pl.ds(rr, 1), :]
        sub = jnp.where((qrow & ref_base) != 0, ALN_MATCH, ALN_MISMATCH)
        v = jnp.maximum(0, prev + sub)

        # deletion (from above): prev[c + 1] + indel, only c in [left,
        # right-1)
        above = jnp.concatenate(
            [prev[1:, :], jnp.zeros((1, jb), jnp.int32)], axis=0)
        v = jnp.where(cols < right - 1,
                      jnp.maximum(v, above + ALN_INDEL), v)

        # insertion chain (from left), within [left, right): log-depth
        # max-prefix scan over sublanes of v[k] - indel*(c - k)
        m = jnp.where(valid, v - ALN_INDEL * cols, NEG)
        shift = 1
        while shift < BAND:
            rolled = jnp.concatenate(
                [jnp.full((shift, jb), NEG, jnp.int32), m[:-shift, :]],
                axis=0)
            m = jnp.maximum(m, rolled)
            shift *= 2
        v = m + ALN_INDEL * cols

        stored = jnp.where(valid, v, 0)
        best = jnp.maximum(best, stored)
        return stored, best

    prev0 = jnp.zeros((BAND, jb), jnp.int32)
    _, best = jax.lax.fori_loop(
        0, n_rows, row_step, (prev0, prev0))
    out_ref[0, :] = jnp.max(best, axis=0)


def _tracer_body(jnp, jax, pl, pltpu, qt_ref, wint_ref, bw_ref, qsz_ref,
                 panel_ref, best_ref, brr_ref, bc_ref, lp: int, jb: int):
    """Traceback variant of _kernel_body: same recurrence and boundary
    semantics, but every cell's ARROW (the reference's equal-score
    overwrite order M < D < I; AbismalAlign.hpp:266-307, mirrored by the
    native run_tb/_engine.cpp) and a positive-score bit are packed into a
    4-bit nibble and stored to a per-job panel -- 8 consecutive band ROWS
    per i32 word (word w holds rows 8w..8w+7 of a band column) -- plus the
    row-major-first argmax cell (strict '>' keeps the first maximum in
    (row asc, col asc) order, as build_traceback's scan does).

    Nibble: bits 0-1 arrow2 (M=0, I=1, D=2, none=3), bit 2 = score > 0.
    Arrow capture from final values (see the native run_tb_zmm proof):
      M iff prev[j] + sub >= 0
      D iff del >= after-diag value, applied only for c < right-1
      I iff final[j] == final[j-1] + indel (fixpoint == the scalar
          left-to-right running values)
    Out-of-band lanes store nibble 0 (arrow2 would be meaningless there;
    the walk never reads them: entered cells are in-band, and a zero
    positive-bit stops the walk exactly like the reference's table test).
    """
    cols = jax.lax.broadcasted_iota(jnp.int32, (BAND, jb), 0)
    bw = bw_ref[0:1, :]
    qsz = qsz_ref[0:1, :]
    n_rows = lp + QOFF
    n_words = (n_rows + 7) // 8

    zero = jnp.zeros((BAND, jb), jnp.int32)
    for w in range(n_words):
        panel_ref[pl.ds(w * BAND, BAND), :] = zero

    def row_step(rr, carry):
        prev, best, brr, bc = carry
        left = jnp.maximum(QOFF - rr, 0)
        right = jnp.minimum(bw, qsz + (QOFF - rr))
        valid = (cols >= left) & (cols < right)

        qrow = qt_ref[pl.ds(rr, BAND), :]
        ref_base = wint_ref[pl.ds(rr, 1), :]
        sub = jnp.where((qrow & ref_base) != 0, ALN_MATCH, ALN_MISMATCH)
        subscore = prev + sub
        c1 = jnp.maximum(0, subscore)

        above = jnp.concatenate(
            [prev[1:, :], jnp.zeros((1, jb), jnp.int32)], axis=0)
        delv = above + ALN_INDEL
        app_d = cols < right - 1
        c2 = jnp.where(app_d, jnp.maximum(c1, delv), c1)

        m = jnp.where(valid, c2 - ALN_INDEL * cols, NEG)
        shift = 1
        while shift < BAND:
            rolled = jnp.concatenate(
                [jnp.full((shift, jb), NEG, jnp.int32), m[:-shift, :]],
                axis=0)
            m = jnp.maximum(m, rolled)
            shift *= 2
        v = m + ALN_INDEL * cols
        stored = jnp.where(valid, v, 0)

        # arrows (overwrite-on-equal order: M, then D, then I)
        vleft = jnp.concatenate(
            [jnp.zeros((1, jb), jnp.int32), stored[:-1, :]], axis=0)
        is_m = subscore >= 0
        is_d = app_d & (delv >= c1)
        is_i = stored == vleft + ALN_INDEL
        arrow2 = jnp.where(is_m, 0, 3)
        arrow2 = jnp.where(is_d, 2, arrow2)
        arrow2 = jnp.where(is_i, 1, arrow2)
        nib = jnp.where(valid,
                        arrow2 | jnp.where(stored > 0, 4, 0), 0)
        w = rr >> 3
        sh = (rr & 7) * 4
        old = panel_ref[pl.ds(w * BAND, BAND), :]
        panel_ref[pl.ds(w * BAND, BAND), :] = old | (nib << sh)

        # row-major-first argmax (strict '>' keeps the earliest row; min
        # col among the row's maxima keeps the earliest col)
        rmax = jnp.max(stored, axis=0, keepdims=True)
        cstar = jnp.min(jnp.where(stored == rmax, cols, BAND),
                        axis=0, keepdims=True)
        upd = rmax > best
        best = jnp.where(upd, rmax, best)
        brr = jnp.where(upd, rr, brr)
        bc = jnp.where(upd, cstar, bc)
        return stored, best, brr, bc

    prev0 = jnp.zeros((BAND, jb), jnp.int32)
    z1 = jnp.zeros((1, jb), jnp.int32)
    _, best, brr, bc = jax.lax.fori_loop(
        0, n_rows, row_step, (prev0, z1, z1, z1))
    best_ref[0, :] = best[0, :]
    brr_ref[0, :] = brr[0, :]
    bc_ref[0, :] = bc[0, :]


def build_banded_tracer(lp: int = 128, jb: int = 128,
                        interpret: bool = False):
    """Returns a jitted f(q, win, bw, qsz) -> (panel, best, brr, bc):
    panel (n_words*BAND, J) i32 packed traceback nibbles (see
    _tracer_body), best/brr/bc (J,) i32 -- the row-major-first argmax
    score and its (reparametrized row rr, band col) cell.  Input layout
    identical to build_banded_scorer."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows = lp + QOFF
    n_words = (n_rows + 7) // 8
    qt_rows = ((n_rows - 1 + BAND) + 7) & ~7
    wt_rows = (n_rows + 7) & ~7
    body = functools.partial(_tracer_body, jnp, jax, pl, pltpu,
                             lp=lp, jb=jb)

    def tracer(q, win, bw, qsz):
        j = q.shape[0]
        grid = (j // jb,)
        nq = min(qt_rows - QOFF, q.shape[1])
        qt = jnp.zeros((qt_rows, j), jnp.int32).at[QOFF : QOFF + nq].set(
            q.T[:nq].astype(jnp.int32))
        wt = jnp.zeros((wt_rows, j), jnp.int32).at[
            : min(wt_rows, win.shape[1])].set(
            win.T[:wt_rows].astype(jnp.int32))
        panel, best, brr, bc = pl.pallas_call(
            body,
            grid=grid,
            in_specs=[
                pl.BlockSpec((qt_rows, jb), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((wt_rows, jb), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, jb), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, jb), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((n_words * BAND, jb), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, jb), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, jb), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, jb), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_words * BAND, j), jnp.int32),
                jax.ShapeDtypeStruct((1, j), jnp.int32),
                jax.ShapeDtypeStruct((1, j), jnp.int32),
                jax.ShapeDtypeStruct((1, j), jnp.int32),
            ],
            interpret=interpret,
        )(qt, wt, bw.reshape(1, j), qsz.reshape(1, j))
        return panel, best[0], brr[0], bc[0]

    return jax.jit(tracer)


def win_start(pos, bw):
    """Genome nibble index of a job's window row 0: the band placement
    t_beg = pos - (bw-1)/2 plus the row reparametrization's ti shift
    (module docstring) collapse to pos + (bw-1)/2 - QOFF."""
    return pos + (bw - 1) // 2 - QOFF


def build_banded_scorer(lp: int = 128, jb: int = 128,
                        interpret: bool = False):
    """Returns a jitted f(q, win, bw, qsz) -> scores (J, 1) i32.

    q: (J, >= lp) u8 -- query nibbles of job j at column 0 (NOT shifted
        per job; the v3 row reparametrization makes the query placement
        bandwidth-free).
    win: (J, >= lp + QOFF) u8 -- genome nibbles from win_start(pos, bw).
    bw: (J, 1) i32 band widths; qsz: (J, 1) i32 query lengths.

    J must be a multiple of jb.  Internally the inputs are transposed to
    (positions, jobs) i32 so the kernel's per-row query window is a
    sublane-axis dynamic slice (see module docstring)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_rows = lp + QOFF
    qt_rows = ((n_rows - 1 + BAND) + 7) & ~7  # max ds start + BAND
    wt_rows = (n_rows + 7) & ~7
    body = functools.partial(_kernel_body, jnp, jax, pl, pltpu,
                             lp=lp, jb=jb)

    def scorer(q, win, bw, qsz):
        j = q.shape[0]
        grid = (j // jb,)
        nq = min(qt_rows - QOFF, q.shape[1])
        qt = jnp.zeros((qt_rows, j), jnp.int32).at[QOFF : QOFF + nq].set(
            q.T[:nq].astype(jnp.int32))
        wt = jnp.zeros((wt_rows, j), jnp.int32).at[
            : min(wt_rows, win.shape[1])].set(
            win.T[:wt_rows].astype(jnp.int32))
        out = pl.pallas_call(
            body,
            grid=grid,
            in_specs=[
                pl.BlockSpec((qt_rows, jb), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((wt_rows, jb), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, jb), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, jb), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, jb), lambda g: (0, g),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, j), jnp.int32),
            interpret=interpret,
        )(qt, wt, bw.reshape(1, j), qsz.reshape(1, j))
        return out.T

    return jax.jit(scorer)


def prepare_jobs(genome_nib: np.ndarray, jobs, lp: int = 128, jb: int = 128):
    """Host-side packing: jobs = [(query_nibbles, diffs, max_diffs, t_pos)].
    Returns (q, win, bw, qsz, n_jobs_padded) in the v3 layout (query at
    column 0, window from win_start(pos, bw))."""
    n = len(jobs)
    j_pad = ((n + jb - 1) // jb) * jb if n else jb
    ww = lp + QOFF
    q_rows = np.zeros((j_pad, lp), dtype=np.uint8)
    win = np.zeros((j_pad, ww), dtype=np.uint8)
    bw = np.ones((j_pad, 1), dtype=np.int32)
    qsz = np.zeros((j_pad, 1), dtype=np.int32)
    for i, (q, diffs, max_diffs, t_pos) in enumerate(jobs):
        b = 2 * min(diffs, max_diffs) + 1
        b = BW_MAX if b < 0 else min(BW_MAX, b)
        length = q.shape[0]
        q_rows[i, :length] = q
        g0 = win_start(t_pos, b)
        w = genome_nib[max(g0, 0) : g0 + ww]
        win[i, max(g0, 0) - g0 : (max(g0, 0) - g0) + w.shape[0]] = w
        bw[i, 0] = b
        qsz[i, 0] = length
    return q_rows, win, bw, qsz, j_pad


def score_jobs(genome_nib: np.ndarray, jobs, lp: int = 128,
               interpret: bool = False):
    """Convenience wrapper: returns int scores per job.  Jobs with diffs ==
    0 must be short-circuited by the caller, as in the reference."""
    if not jobs:
        return []
    q_rows, win, bw, qsz, _ = prepare_jobs(genome_nib, jobs, lp)
    scorer = build_banded_scorer(lp, interpret=interpret)
    out = np.asarray(scorer(q_rows, win, bw, qsz))
    return [int(out[i, 0]) for i in range(len(jobs))]


def build_device_align(lp: int = 128, jb: int = 128, interpret: bool = False):
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
    ww = lp + QOFF

    def prog(genome32, pnib, unit_id, pos, bw, qsz):
        j = unit_id.shape[0]
        rows = pnib[unit_id]
        q = jnp.stack([rows & np.uint8(0xF), rows >> np.uint8(4)],
                      axis=2).reshape(j, -1)
        g0 = (pos + ((bw - 1) // 2).astype(jnp.uint32)
              - np.uint32(QOFF))  # win_start
        gpos = g0[:, None] + jnp.arange(ww, dtype=jnp.uint32)[None, :]
        word = genome32[(gpos >> np.uint32(3)).astype(jnp.int32)]
        win = ((word >> ((gpos & np.uint32(7)) * np.uint32(4)))
               & np.uint32(0xF)).astype(jnp.uint8)
        out = scorer(q, win, bw[:, None], qsz[:, None])
        return out[:, 0]

    return jax.jit(prog)
