"""A/B timing of the index bucket-sort stage (index_fill_and_sort) on a
large genome, loading two content-hashed builds of _native.so side by side
(the loader keys artifacts by source hash, so old builds stay on disk).

Runs the build stages once up to the sort inputs, then times fill+sort per
library and checks the output index arrays are byte-identical.

Usage: python tools/bench_sort.py <genome.fa> <old.so> <new.so> [reps]
"""

import ctypes
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


def bind(path):
    lib = ctypes.CDLL(path)
    lib.index_fill_and_sort.restype = None
    lib.index_fill_and_sort.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int,
    ]
    return lib


def main():
    fa, old_so, new_so = sys.argv[1:4]
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    n_threads = os.cpu_count() or 1

    lib = get_lib()
    genome, _ = load_genome(fa)
    n = genome.shape[0]
    print(f"genome {n/1e9:.2f} Gb padded", flush=True)

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
    exc_s = exc_s[:n_exc].copy()
    exc_e = exc_e[:n_exc].copy()

    nibbles = np.empty(n, dtype=np.uint8)
    genome_words = np.empty((n + 15) // 16, dtype=np.uint64)
    lib.encode_pack_genome(
        genome.ctypes.data, n, np.ascontiguousarray(ENCODE_GENOME).ctypes.data,
        nibbles.ctypes.data, genome_words.ctypes.data, n_threads)
    del genome, genome_words

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

    lib.index_count_hashes(
        nibbles.ctypes.data, n, exc_s.ctypes.data, exc_e.ctypes.data,
        n_exc, keep.ctypes.data, itl.ctypes.data, cnt2.ctypes.data,
        cnt3t.ctypes.data, cnt3a.ctypes.data)
    counter = np.zeros(N_BUCKETS_TWO + 1, dtype=np.uint32)
    np.cumsum(cnt2[:N_BUCKETS_TWO], dtype=np.uint32, out=counter[1:])
    counter_t = np.zeros(N_BUCKETS_THREE + 1, dtype=np.uint32)
    np.cumsum(cnt3t[:N_BUCKETS_THREE], dtype=np.uint32, out=counter_t[1:])
    counter_a = np.zeros(N_BUCKETS_THREE + 1, dtype=np.uint32)
    np.cumsum(cnt3a[:N_BUCKETS_THREE], dtype=np.uint32, out=counter_a[1:])
    print(f"positions: 2L={int(counter[-1])} 3L={int(counter_t[-1])}",
          flush=True)

    outs = {}
    for tag, path in (("old", old_so), ("new", new_so)):
        l2 = bind(path)
        index = np.empty(int(counter[-1]), dtype=np.uint32)
        index_t = np.empty(int(counter_t[-1]), dtype=np.uint32)
        index_a = np.empty(int(counter_a[-1]), dtype=np.uint32)
        best = 1e18
        for _ in range(reps):
            t0 = time.monotonic()
            l2.index_fill_and_sort(
                nibbles.ctypes.data, n, exc_s.ctypes.data, exc_e.ctypes.data,
                n_exc, keep.ctypes.data, itl.ctypes.data,
                counter.ctypes.data, counter_t.ctypes.data,
                counter_a.ctypes.data, index.ctypes.data, index_t.ctypes.data,
                index_a.ctypes.data, n_threads)
            best = min(best, time.monotonic() - t0)
        outs[tag] = (index, index_t, index_a)
        print(f"{tag}: fill+sort {best:.2f}s ({path})", flush=True)

    same = all(np.array_equal(outs["old"][i], outs["new"][i])
               for i in range(3))
    print("OUTPUT PARITY:", "OK" if same else "MISMATCH", flush=True)


if __name__ == "__main__":
    main()
