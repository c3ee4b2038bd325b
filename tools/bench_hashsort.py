"""Piece-wise timing of the index build's final stage ("hashing and
sorting buckets") at GB scale.  First run computes and caches the stage
inputs (nibbles/keep/itl/excludes) under /tmp/abismal_scale; later runs
load the cache and time each piece of the capture+count+place+sort path.

Usage: python tools/bench_hashsort.py [genome.fa]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from abismal_tpu.constants import KEY_WEIGHT, MAX_N_COUNT, WINDOW_SIZE
from abismal_tpu.index.build import (
    N_BUCKETS_THREE,
    N_BUCKETS_TWO,
    get_block_bounds,
)
from abismal_tpu.io.genome import load_genome
from abismal_tpu.native import get_lib
from abismal_tpu.utils.dna import ENCODE_GENOME

CACHE = "/tmp/abismal_scale/stage_cache.npz"


def tic(label, t0=[None]):
    now = time.monotonic()
    if t0[0] is not None:
        print(f"  {now - t0[0]:7.2f}s  {t0[1]}", flush=True)
    t0[0] = now
    t0.append(label) if len(t0) == 1 else None
    if len(t0) > 1:
        t0[1] = label
    else:
        t0.append(label)


def main():
    fa = sys.argv[1] if len(sys.argv) > 1 else \
        "/tmp/abismal_scale/scale_1000000000.fa"
    n_threads = os.cpu_count() or 1
    lib = get_lib()

    if not os.path.exists(CACHE):
        genome, _ = load_genome(fa)
        n = genome.shape[0]
        cap = 65536
        while True:
            exc_s = np.empty(cap, dtype=np.int64)
            exc_e = np.empty(cap, dtype=np.int64)
            n_exc = int(lib.index_clean_genome(
                genome.ctypes.data, n, MAX_N_COUNT, exc_s.ctypes.data,
                exc_e.ctypes.data, cap))
            if n_exc <= cap:
                break
            cap = n_exc
        exc_s, exc_e = exc_s[:n_exc].copy(), exc_e[:n_exc].copy()
        nibbles = np.empty(n, dtype=np.uint8)
        gw = np.empty((n + 15) // 16, dtype=np.uint64)
        lib.encode_pack_genome(
            genome.ctypes.data, n,
            np.ascontiguousarray(ENCODE_GENOME).ctypes.data,
            nibbles.ctypes.data, gw.ctypes.data, n_threads)
        del genome, gw
        lim2 = n - KEY_WEIGHT + 1
        cnt2 = np.empty(N_BUCKETS_TWO + 1, dtype=np.uint32)
        cnt3t = np.empty(N_BUCKETS_THREE + 1, dtype=np.uint32)
        cnt3a = np.empty(N_BUCKETS_THREE + 1, dtype=np.uint32)
        lib.index_count_hashes(
            nibbles.ctypes.data, n, exc_s.ctypes.data, exc_e.ctypes.data,
            n_exc, None, None, cnt2.ctypes.data, cnt3t.ctypes.data,
            cnt3a.ctypes.data)
        itl = np.zeros(n, dtype=np.uint8)
        blocks = get_block_bounds(0, 1_000_000, lim2,
                                  list(zip(exc_s.tolist(), exc_e.tolist())))
        bstarts = np.asarray([b[0] for b in blocks], dtype=np.int64)
        bends = np.asarray([b[1] for b in blocks], dtype=np.int64)
        lib.index_select_two_letter(
            nibbles.ctypes.data, cnt2.ctypes.data, cnt3t.ctypes.data,
            cnt3a.ctypes.data, bstarts.ctypes.data, bends.ctypes.data,
            len(blocks), itl.ctypes.data, n_threads)
        keep = np.zeros(n, dtype=np.uint8)
        lib.compress_dp_blocks_mt(
            nibbles.ctypes.data, cnt2.ctypes.data, cnt3t.ctypes.data,
            cnt3a.ctypes.data, itl.ctypes.data, bstarts.ctypes.data,
            bends.ctypes.data, len(blocks), WINDOW_SIZE, keep.ctypes.data,
            n_threads)
        np.savez(CACHE, nibbles=nibbles, keep=keep, itl=itl, exc_s=exc_s,
                 exc_e=exc_e, n=n)
        print("cache written", flush=True)

    z = np.load(CACHE)
    nibbles = np.ascontiguousarray(z["nibbles"])
    keep = np.ascontiguousarray(z["keep"])
    itl = np.ascontiguousarray(z["itl"])
    exc_s = np.ascontiguousarray(z["exc_s"])
    exc_e = np.ascontiguousarray(z["exc_e"])
    n = int(z["n"])
    n_exc = exc_s.shape[0]
    lim2 = n - KEY_WEIGHT + 1
    print(f"inputs loaded: n={n}", flush=True)

    # --- interleaved A/B: old path (masked recount scans + scan-based
    # fill + sort) vs new path (fused capture + place + sort), same
    # inputs, best + median over reps ---
    if os.environ.get("ABISMAL_HASHSORT_AB"):
        import statistics

        reps = int(os.environ.get("ABISMAL_HASHSORT_AB"))
        cnt2 = np.empty(N_BUCKETS_TWO + 1, dtype=np.uint32)
        cnt3t = np.empty(N_BUCKETS_THREE + 1, dtype=np.uint32)
        cnt3a = np.empty(N_BUCKETS_THREE + 1, dtype=np.uint32)
        n23 = np.zeros(2, dtype=np.int64)
        lib.index_count_kept(keep.ctypes.data, itl.ctypes.data, lim2,
                             n23.ctypes.data, n23[1:].ctypes.data, n_threads)
        bound2, bound3 = int(n23[0]), int(n23[1])
        k2c = np.empty(bound2, dtype=np.uint32)
        p2c = np.empty(bound2, dtype=np.uint32)
        k3tc = np.empty(bound3, dtype=np.uint32)
        k3ac = np.empty(bound3, dtype=np.uint32)
        p3c = np.empty(bound3, dtype=np.uint32)
        res = {"old": [], "new": []}
        outs = {}
        for _ in range(reps):
            for tag in ("old", "new"):
                t0 = time.monotonic()
                if tag == "old":
                    lib.index_count_hashes(
                        nibbles.ctypes.data, n, exc_s.ctypes.data,
                        exc_e.ctypes.data, n_exc, keep.ctypes.data,
                        itl.ctypes.data, cnt2.ctypes.data, cnt3t.ctypes.data,
                        cnt3a.ctypes.data)
                else:
                    lib.index_capture_kept(
                        nibbles.ctypes.data, n, exc_s.ctypes.data,
                        exc_e.ctypes.data, n_exc, keep.ctypes.data,
                        itl.ctypes.data, k2c.ctypes.data, p2c.ctypes.data,
                        k3tc.ctypes.data, k3ac.ctypes.data, p3c.ctypes.data,
                        cnt2.ctypes.data, cnt3t.ctypes.data,
                        cnt3a.ctypes.data, n23.ctypes.data,
                        n23[1:].ctypes.data, n_threads)
                counter = np.zeros(N_BUCKETS_TWO + 1, dtype=np.uint32)
                np.cumsum(cnt2[:N_BUCKETS_TWO], dtype=np.uint32,
                          out=counter[1:])
                counter_t = np.zeros(N_BUCKETS_THREE + 1, dtype=np.uint32)
                np.cumsum(cnt3t[:N_BUCKETS_THREE], dtype=np.uint32,
                          out=counter_t[1:])
                counter_a = np.zeros(N_BUCKETS_THREE + 1, dtype=np.uint32)
                np.cumsum(cnt3a[:N_BUCKETS_THREE], dtype=np.uint32,
                          out=counter_a[1:])
                index = np.empty(int(counter[-1]), dtype=np.uint32)
                index_t = np.empty(int(counter_t[-1]), dtype=np.uint32)
                index_a = np.empty(int(counter_a[-1]), dtype=np.uint32)
                if tag == "old":
                    lib.index_fill_and_sort(
                        nibbles.ctypes.data, n, exc_s.ctypes.data,
                        exc_e.ctypes.data, n_exc, keep.ctypes.data,
                        itl.ctypes.data, counter.ctypes.data,
                        counter_t.ctypes.data, counter_a.ctypes.data,
                        index.ctypes.data, index_t.ctypes.data,
                        index_a.ctypes.data, n_threads)
                else:
                    n2, n3 = int(n23[0]), int(n23[1])
                    lib.index_place_and_sort(
                        nibbles.ctypes.data, k2c.ctypes.data,
                        p2c.ctypes.data, n2, k3tc.ctypes.data,
                        k3ac.ctypes.data, p3c.ctypes.data, n3,
                        counter.ctypes.data, counter_t.ctypes.data,
                        counter_a.ctypes.data, index.ctypes.data,
                        index_t.ctypes.data, index_a.ctypes.data, n_threads)
                res[tag].append(time.monotonic() - t0)
                outs[tag] = (index, index_t, index_a)
        for tag in ("old", "new"):
            print(f"{tag}: best {min(res[tag]):.2f}s  "
                  f"median {statistics.median(res[tag]):.2f}s  "
                  f"(reps: {' '.join(f'{x:.2f}' for x in res[tag])})",
                  flush=True)
        same = all(np.array_equal(outs["old"][i], outs["new"][i])
                   for i in range(3))
        print("OUTPUT PARITY:", "OK" if same else "MISMATCH", flush=True)
        return

    tic("bounds (native)")
    n23 = np.zeros(2, dtype=np.int64)
    lib.index_count_kept(keep.ctypes.data, itl.ctypes.data, lim2,
                         n23.ctypes.data, n23[1:].ctypes.data, n_threads)
    bound2, bound3 = int(n23[0]), int(n23[1])
    tic("alloc compact")
    k2c = np.empty(bound2, dtype=np.uint32)
    p2c = np.empty(bound2, dtype=np.uint32)
    k3tc = np.empty(bound3, dtype=np.uint32)
    k3ac = np.empty(bound3, dtype=np.uint32)
    p3c = np.empty(bound3, dtype=np.uint32)
    cnt2 = np.empty(N_BUCKETS_TWO + 1, dtype=np.uint32)
    cnt3t = np.empty(N_BUCKETS_THREE + 1, dtype=np.uint32)
    cnt3a = np.empty(N_BUCKETS_THREE + 1, dtype=np.uint32)
    tic("capture scan + counts")
    lib.index_capture_kept(
        nibbles.ctypes.data, n, exc_s.ctypes.data, exc_e.ctypes.data,
        n_exc, keep.ctypes.data, itl.ctypes.data, k2c.ctypes.data,
        p2c.ctypes.data, k3tc.ctypes.data, k3ac.ctypes.data, p3c.ctypes.data,
        cnt2.ctypes.data, cnt3t.ctypes.data, cnt3a.ctypes.data,
        n23.ctypes.data, n23[1:].ctypes.data, n_threads)
    n2, n3 = int(n23[0]), int(n23[1])
    tic("cumsum")
    counter = np.zeros(N_BUCKETS_TWO + 1, dtype=np.uint32)
    np.cumsum(cnt2[:N_BUCKETS_TWO], dtype=np.uint32, out=counter[1:])
    counter_t = np.zeros(N_BUCKETS_THREE + 1, dtype=np.uint32)
    np.cumsum(cnt3t[:N_BUCKETS_THREE], dtype=np.uint32, out=counter_t[1:])
    counter_a = np.zeros(N_BUCKETS_THREE + 1, dtype=np.uint32)
    np.cumsum(cnt3a[:N_BUCKETS_THREE], dtype=np.uint32, out=counter_a[1:])
    tic("alloc index")
    index = np.empty(n2, dtype=np.uint32)
    index_t = np.empty(n3, dtype=np.uint32)
    index_a = np.empty(n3, dtype=np.uint32)
    tic("place+sort")
    lib.index_place_and_sort(
        nibbles.ctypes.data, k2c.ctypes.data, p2c.ctypes.data, n2,
        k3tc.ctypes.data, k3ac.ctypes.data, p3c.ctypes.data, n3,
        counter.ctypes.data, counter_t.ctypes.data, counter_a.ctypes.data,
        index.ctypes.data, index_t.ctypes.data, index_a.ctypes.data,
        n_threads)
    tic("done")
    print(f"n2={n2} n3={n3}", flush=True)


if __name__ == "__main__":
    main()
