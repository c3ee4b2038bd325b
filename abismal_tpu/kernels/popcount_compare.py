"""Pallas TPU kernel: bisulfite-aware popcount Hamming compare.

Computes, for every candidate of the global stage-1 list, the reference's
full_compare distance (src/abismal.cpp:1105-1122): the genome window at the
candidate position is aligned to the packed read words and the match count
popcounted per 32-bit word,

    d = sum_j wmask[j] * (8 - popcnt32(read_word[j] & window_word[j])).

The surrounding XLA pipeline materializes one overlapped genome row
(AW u32) per candidate with a single aligned-row gather (gathers are
issue-rate-bound on TPU; one row-gather beats ~20 element-gathers).  This
kernel then does the word-alignment log-roll, the nibble shift and the
popcount reduction in ONE streaming pass over that row -- VMEM-resident,
~(4*AW + 4*NW + 64) bytes of HBM traffic per candidate -- where the
unfused XLA lowering materialized every log-roll step to HBM (~10x the
traffic; measured 28 us/unit at a 128 Mb index, the top cost of the fused
stage-1+2 program).

Layout: candidates on sublanes (BC per block), genome-row words on lanes
(AW <= 128).  All alignment arithmetic is per-sublane, so every op is a
natural-layout VPU op; no transposes, no gathers in-kernel.
"""

from __future__ import annotations

import functools

import numpy as np

BC = 512  # candidates per grid block (sublanes)


def _body(jnp, jax, meta_ref, a_ref, pk_ref, out_ref, nw_words: int):
    A = a_ref[:]  # (BC, AW) u32
    m = meta_ref[:]  # (BC, 1): ow | sh << 6 | nw << 11
    ow = m & 63  # word offset in [0, 64)
    sh = ((m >> 6) & 31).astype(jnp.uint32)  # nibble shift * 4, < 32
    nw = m >> 11  # valid read words
    for s in (32, 16, 8, 4, 2, 1):
        rolled = jnp.concatenate(
            [A[:, s:], jnp.zeros((A.shape[0], s), A.dtype)], axis=1)
        A = jnp.where((ow & s) != 0, rolled, A)
    lo = A[:, :nw_words]
    hi = A[:, 1 : nw_words + 1]
    # window_word = (lo >> sh) | ((hi << (31 - sh)) << 1): the two-step
    # left shift realizes a 32-bit funnel shift that is well-defined when
    # sh == 0 (abismal.cpp:1110-1116 uses the same form on u64)
    w = (lo >> sh) | ((hi << (np.uint32(31) - sh)) << np.uint32(1))
    m = jax.lax.population_count(pk_ref[:] & w).astype(jnp.int32)
    widx = jax.lax.broadcasted_iota(jnp.int32, m.shape, 1)
    d = jnp.sum(jnp.where(widx < nw, 8 - m, 0), axis=1, keepdims=True)
    out_ref[:] = d


def build_popcount_compare(aw: int, nw_words: int, interpret: bool = False):
    """Returns f(A, pk, ow, sh, nw) -> d (G,) i32 (trace inside jit).

    A:  (G, aw) u32 -- per-candidate overlapped genome row (the XLA gather
        output; aw = 128).
    pk: (G, nw_words) u32 -- packed read words of the candidate's unit.
    ow: (G,) i32 word offset within the row; sh: (G,) u32 nibble shift * 4;
    nw: (G,) i32 valid word count.  G is padded to a BC multiple inside."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    body = functools.partial(_body, jnp, jax, nw_words=nw_words)

    def run(A, pk, ow, sh, nw):
        g = A.shape[0]
        gp = ((g + BC - 1) // BC) * BC
        # one packed scalar column: ow | sh << 6 | nw << 11 (an 8-column
        # stack cost 4 ms/exec in relayouts at gflat = 655k)
        meta = (ow.astype(jnp.int32)
                | (jax.lax.bitcast_convert_type(sh, jnp.int32) << 6)
                | (nw.astype(jnp.int32) << 11))[:, None]
        if gp != g:
            A = jnp.concatenate(
                [A, jnp.zeros((gp - g, aw), A.dtype)], axis=0)
            pk = jnp.concatenate(
                [pk, jnp.zeros((gp - g, nw_words), pk.dtype)], axis=0)
            meta = jnp.concatenate(
                [meta, jnp.zeros((gp - g, 1), jnp.int32)], axis=0)
        out = pl.pallas_call(
            body,
            grid=(gp // BC,),
            in_specs=[
                pl.BlockSpec((BC, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, aw), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BC, nw_words), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BC, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((gp, 1), jnp.int32),
            interpret=interpret,
        )(meta, A, pk)
        return out[:g, 0]

    return run
