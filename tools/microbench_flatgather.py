"""Microbenchmark: 64-word genome-window fetch variants on the real chip.

(a) 2-D overlapped-row table gather (current genome2o design)
(b) lax.gather slices from the FLAT packed genome, 32-word-aligned starts
(c) lax.gather slices from the FLAT packed genome, arbitrary starts
    (removes the in-kernel alignment roll entirely)

Usage: python tools/microbench_flatgather.py [n_rows] [table_mb]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 655360
    mb = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    nwords = mb * 1024 * 1024 // 4
    from abismal_tpu.map.pipeline import overlap_rows_u32

    rng = np.random.default_rng(0)
    flat_np = rng.integers(0, 1 << 32, size=nwords, dtype=np.uint32)
    flat = jax.device_put(flat_np)
    rows2d = jax.device_put(overlap_rows_u32(flat_np))
    w = rng.integers(0, nwords - 128, size=n).astype(np.int32)
    row = jax.device_put((w >> 5).astype(np.int32))
    wal = jax.device_put(((w >> 5) << 5).astype(np.int32))
    warb = jax.device_put(w)

    from jax.lax import GatherDimensionNumbers, gather

    dn = GatherDimensionNumbers(offset_dims=(1,), collapsed_slice_dims=(),
                                start_index_map=(0,))

    def f_2d(idx):
        return rows2d[idx].sum(dtype=jnp.uint32)

    def f_flat(st):
        return gather(flat, st[:, None], dn, (64,),
                      mode=jax.lax.GatherScatterMode.CLIP).sum(
            dtype=jnp.uint32)

    for name, fn, arg in (("2d-row", jax.jit(f_2d), row),
                          ("flat-aligned", jax.jit(f_flat), wal),
                          ("flat-arbitrary", jax.jit(f_flat), warb)):
        np.asarray(fn(arg))  # compile
        t0 = time.perf_counter()
        for _ in range(20):
            r = fn(arg)
        np.asarray(r)
        dt = (time.perf_counter() - t0) / 20
        print(f"{name:15s} {dt*1e3:8.2f} ms  ({dt/n*1e9:6.2f} ns/row)",
              flush=True)


if __name__ == "__main__":
    main()
