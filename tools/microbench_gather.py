"""Microbenchmarks for the stage12 hot issue-bound ops on the attached
chip: scatter/gather variants (sorted-indices hints, widths) and the
serial depth of the extension bisection.  Informs which restructurings
are worth wiring into the production program (DESIGN.md 5d cost model).

Usage: python tools/microbench_gather.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, reps=20):
    out = fn(*args)
    import numpy as np

    np.asarray(out)  # compile + settle
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / reps


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    print(f"backend={jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)

    B, n_cells = 2048, 336
    gflat = 524_288
    NC = B * n_cells

    # --- cell-mark scatter: sorted vs unsorted hint ---
    starts = np.sort(rng.integers(0, gflat, size=NC)).astype(np.int32)
    nz = rng.random(NC) < 0.35
    mark = np.where(nz, starts, gflat).astype(np.int32)
    gid = np.arange(NC, dtype=np.int32)
    markd = jax.device_put(mark)
    gidd = jax.device_put(gid)

    @jax.jit
    def scat_plain(m, g):
        return jnp.zeros(gflat + 1, jnp.int32).at[m].max(g)

    @jax.jit
    def scat_sorted(m, g):
        return jnp.zeros(gflat + 1, jnp.int32).at[m].max(
            g, indices_are_sorted=True)

    t1 = timeit(scat_plain, markd, gidd)
    t2 = timeit(scat_sorted, markd, gidd)
    print(f"cellmark scatter 688k: plain {t1*1e3:.2f} ms  "
          f"sorted-hint {t2*1e3:.2f} ms", flush=True)

    # --- 4-col row scatter (slotsA shape): plain vs sorted ---
    NTOT = 1024 * 50 + 1024 * 8
    dest = np.sort(rng.integers(0, NTOT, size=gflat)).astype(np.int32)
    destu = rng.permutation(dest).astype(np.int32)
    vals = rng.integers(0, 1 << 30, size=(gflat, 4), dtype=np.int32)
    dd, dud, vd = map(jax.device_put, (dest, destu, vals))

    @jax.jit
    def rs_plain(d, v):
        return jnp.full((NTOT + 1, 4), 0x7FFFFFFF, jnp.int32).at[d].min(v)

    @jax.jit
    def rs_sorted(d, v):
        return jnp.full((NTOT + 1, 4), 0x7FFFFFFF, jnp.int32).at[d].min(
            v, indices_are_sorted=True)

    print(f"row scatter 524k x4: plain {timeit(rs_plain, dud, vd)*1e3:.2f}"
          f" ms  sorted(data+hint) {timeit(rs_sorted, dd, vd)*1e3:.2f} ms",
          flush=True)

    # --- megarow-style row gather: sorted vs unsorted indices ---
    E = 21
    tbl = rng.integers(0, 1 << 30, size=(NC, E), dtype=np.int32)
    idx_sorted = np.sort(rng.integers(0, NC, size=gflat)).astype(np.int32)
    idx_rand = rng.permutation(idx_sorted).astype(np.int32)
    td = jax.device_put(tbl)
    isd, ird = jax.device_put(idx_sorted), jax.device_put(idx_rand)

    @jax.jit
    def g_plain(t, i):
        return jnp.sum(t[i], axis=0)

    @jax.jit
    def g_hint(t, i):
        return jnp.sum(jnp.take(t, i, axis=0, indices_are_sorted=True),
                       axis=0)

    print(f"row gather 524k x{E}: rand {timeit(g_plain, td, ird)*1e3:.2f} "
          f"ms  sorted {timeit(g_plain, td, isd)*1e3:.2f} ms  "
          f"sorted+hint {timeit(g_hint, td, isd)*1e3:.2f} ms", flush=True)

    # --- element gather 524k (index_all-style), wide table ---
    NI = 1 << 28
    big = rng.integers(0, 1 << 30, size=NI, dtype=np.int32)
    ei = rng.integers(0, NI, size=gflat).astype(np.int32)
    bd, eid = jax.device_put(big), jax.device_put(ei)

    @jax.jit
    def eg(t, i):
        return jnp.sum(t[i])

    print(f"elem gather 524k from 1 GB: {timeit(eg, bd, eid)*1e3:.2f} ms",
          flush=True)

    # --- genome row gather widths: 128 vs 84 words ---
    GR = 1 << 21
    g2 = rng.integers(0, 1 << 30, size=(GR, 128), dtype=np.uint32)
    gi = rng.integers(0, GR, size=gflat).astype(np.int32)
    g2d, gid2 = jax.device_put(g2), jax.device_put(gi)

    @jax.jit
    def gw_full(t, i):
        return jnp.sum(t[i], axis=0)

    @jax.jit
    def gw_clip(t, i):
        return jnp.sum(t[i][:, :84], axis=0)

    @jax.jit
    def gw_preclip(t, i):
        return jnp.sum(jnp.take(t[:, :84], i, axis=0), axis=0)

    print(f"genome row gather 524k: 128w {timeit(gw_full, g2d, gid2)*1e3:.2f}"
          f" ms  post-clip84 {timeit(gw_clip, g2d, gid2)*1e3:.2f} ms  "
          f"pre-clip84 {timeit(gw_preclip, g2d, gid2)*1e3:.2f} ms",
          flush=True)

    # --- bisection serial depth: 2-way x30 vs 8-way x10 probes ---
    P = 1024
    lo = rng.integers(0, NI - 4096, size=P).astype(np.int32)
    hi = (lo + rng.integers(2, 4096, size=P)).astype(np.int32)
    lod, hid = jax.device_put(lo), jax.device_put(hi)

    @jax.jit
    def bis2(t, a, b):
        def body(_, st):
            a, b = st
            mid = (a + b) >> 1
            v = t[mid]
            go = v < 0
            return jnp.where((a < b) & go, mid + 1, a), jnp.where(
                (a < b) & ~go, mid, b)

        a, b = jax.lax.fori_loop(0, 30, body, (a, b))
        return jnp.sum(a)

    @jax.jit
    def bis8(t, a, b):
        def body(_, st):
            a, b = st
            w = jnp.maximum(b - a, 1)
            probes = a[:, None] + (w[:, None] * jnp.arange(
                1, 8, dtype=jnp.int32)[None, :]) // 8
            v = t[probes.reshape(-1)].reshape(P, 7)
            go = v < 0
            na = jnp.max(jnp.where(go, probes + 1, a[:, None]), axis=1)
            nb = jnp.min(jnp.where(go, b[:, None], probes), axis=1)
            return jnp.maximum(na, a), jnp.minimum(nb, b)

        a, b = jax.lax.fori_loop(0, 10, body, (a, b))
        return jnp.sum(a)

    print(f"bisect P=2048-lane: 2-way x30 {timeit(bis2, bd, lod, hid)*1e3:.2f}"
          f" ms  8-way x10 {timeit(bis8, bd, lod, hid)*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
