"""Microbenchmark: HBM gather formulations on the attached chip.

Times, for N random window starts into a table of `words` u32:
  a) element-gather  tab[w[:,None] + arange(S)]
  b) sliced gather   vmap(dynamic_slice, (S,))
  c) row gather      tab2d[w]  (pre-reshaped contiguous rows, alignment S)
plus single-element gathers tab[w] as the floor.

Usage: python tools/microbench_gather.py [n] [slice_words] [table_mb]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 17
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 19
    mb = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    words = mb * (1 << 20) // 4
    tab = jax.device_put(np.arange(words, dtype=np.uint32))
    w = jax.device_put(
        np.random.default_rng(0).integers(0, words - 64, n).astype(np.int32))
    print(f"n={n} slice={S} table={mb}MB backend={jax.default_backend()}",
          flush=True)

    def timeit(name, fn, *args, reps=20):
        out = fn(*args)
        np.asarray(out).ravel()[0]  # compile+sync
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out).ravel()[0]
        dt = (time.perf_counter() - t0) / reps
        print(f"  {name:24s} {dt*1e3:8.2f} ms  "
              f"({dt*1e9/n:6.1f} ns/row, {n*S*4/dt/1e9:6.1f} GB/s)",
              flush=True)

    el = jax.jit(lambda t, w: jnp.sum(
        t[w[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]],
        dtype=jnp.uint32))
    timeit("element-gather", el, tab, w)

    sl = jax.jit(lambda t, w: jnp.sum(
        jax.vmap(lambda wi: jax.lax.dynamic_slice(t, (wi,), (S,)))(w),
        dtype=jnp.uint32))
    timeit("vmap-dynamic-slice", sl, tab, w)

    one = jax.jit(lambda t, w: jnp.sum(t[w], dtype=jnp.uint32))
    timeit("single-element", one, tab, w)

    # contiguous aligned rows for comparison (different semantics)
    S2 = 1 << (S - 1).bit_length()
    tab2 = tab[: (words // S2) * S2].reshape(-1, S2)
    w2 = w % tab2.shape[0]
    row = jax.jit(lambda t, w: jnp.sum(t[w], dtype=jnp.uint32))
    timeit(f"aligned-row[{S2}]", row, tab2, w2)


if __name__ == "__main__" and "--ilp" not in sys.argv:
    main()


def ilp():
    """Do independent gathers in one jit overlap? 4x single-gather vs 1."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import time

    words = 64 * (1 << 20) // 4
    tab = jax.device_put(np.arange(words, dtype=np.uint32))
    rng = np.random.default_rng(0)
    ws = [jax.device_put(rng.integers(0, words - 64, 1 << 17).astype(np.int32))
          for _ in range(4)]

    def timeit(name, fn, *args, reps=20):
        np.asarray(fn(*args)).ravel()[0]
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out).ravel()[0]
        print(f"  {name:24s} {(time.perf_counter()-t0)/reps*1e3:8.2f} ms",
              flush=True)

    one = jax.jit(lambda t, w: jnp.sum(t[w], dtype=jnp.uint32))
    four = jax.jit(lambda t, a, b, c, d: jnp.sum(t[a], dtype=jnp.uint32)
                   + jnp.sum(t[b], dtype=jnp.uint32)
                   + jnp.sum(t[c], dtype=jnp.uint32)
                   + jnp.sum(t[d], dtype=jnp.uint32))
    timeit("1x 131k gather", one, tab, ws[0])
    timeit("4x 131k gathers", four, tab, *ws)


if __name__ == "__main__" and "--ilp" in sys.argv:
    ilp()
