"""TPU device pipeline for candidate generation and filtering.

Design (TPU-first, not a translation of the reference's per-read loops):
reads are batched into fixed-shape "units" (one per read x strand x
encoding); a single jitted device program computes, for every unit and every
seed offset, the rolling hash keys, the index bucket, the binary-search seed
extension over the suffix-sorted bucket, and the bisulfite-aware popcount
Hamming distance of every surviving candidate -- then compacts accepted
events (diffs <= 0.4*len, the largest cutoff the sequential engine can ever
apply) into a dense per-unit event list via prefix-sum scatter.

The host *replays* the reference's tiny sequential state machine (candidate
heap, adaptive cutoff, sure-ambig aborts; abismal.cpp:1269-1375) over the
compacted events, which is exact: the device only drops candidates the
sequential engine provably ignores (diffs above the largest possible
cutoff).  Units whose candidate slots or event buffer overflow fall back to
the host oracle path, preserving bit-exactness unconditionally.

The genome is 4-bit packed into uint32 words (8 bases/word); all tables
live in HBM and are gathered under jit.  Multi-chip operation shards units
across a mesh with the index replicated (see parallel/mesh.py).
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    KEY_WEIGHT,
    KEY_WEIGHT_THREE,
    MIN_FOLD_SIZE,
    WINDOW_SIZE,
)

SLOT = 128  # max candidates checked per (offset, table); > max_candidates
CAP = 768  # event buffer per unit
HASH3_MOD = 43046721  # 3^16

_jax = None
_jnp = None


def _jm():
    global _jax, _jnp
    if _jax is None:
        import os

        import jax
        import jax.numpy as jnp

        cache_dir = os.environ.get(
            "ABISMAL_TPU_JAX_CACHE", "/tmp/abismal_tpu_jax_cache")
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
        except Exception:
            pass
        _jax = jax
        _jnp = jnp
    return _jax, _jnp


_stage1_memo = {}


def pack_genome_u32(genome_words_u64: np.ndarray, guard: int = 64):
    """Split the u64-packed genome into u32 words (8 bases each), little
    nibble order preserved, plus zero guard words for gather safety."""
    lo = (genome_words_u64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    hi = (genome_words_u64 >> np.uint64(32)).astype(np.uint32)
    out = np.empty(genome_words_u64.shape[0] * 2 + guard, dtype=np.uint32)
    out[0 : 2 * genome_words_u64.shape[0] : 2] = lo
    out[1 : 2 * genome_words_u64.shape[0] : 2] = hi
    out[2 * genome_words_u64.shape[0]:] = 0
    return out


class DeviceIndex:
    """Device-resident index tables (replicated per chip by default)."""

    def __init__(self, index, device_put=None):
        jax, _ = _jm()
        put = device_put or jax.device_put
        self.genome32 = put(pack_genome_u32(index.genome_words))
        self.counter2 = put(index.counter.astype(np.int32))
        # three-letter tables stacked [c_to_t | g_to_a]
        self.counter3 = put(np.concatenate(
            [index.counter_t, index.counter_a]).astype(np.int32))
        self.index2 = put(np.ascontiguousarray(
            index.index.astype(np.int32)
            if index.index.shape[0] else np.zeros(1, np.int32)))
        idx3 = np.concatenate([index.index_t, index.index_a]).astype(np.int32)
        self.index3 = put(idx3 if idx3.shape[0] else np.zeros(2, np.int32))
        self.n_index3 = int(index.index_t.shape[0])
        self.max_candidates = int(index.max_candidates)

    def tables(self):
        return (self.genome32, self.counter2, self.counter3, self.index2,
                self.index3)


def build_stage1(lmax: int, max_candidates: int, n_index3: int):
    """Builds the jitted stage-1 function for a given padded read length.
    Memoized per parameter tuple so engines share one compilation."""
    memo_key = (lmax, max_candidates, n_index3)
    if memo_key in _stage1_memo:
        return _stage1_memo[memo_key]
    jax, jnp = _jm()
    o_spec = max(WINDOW_SIZE, lmax >> 1)
    o_sens = lmax - KEY_WEIGHT + 1
    n_words = 2 * ((lmax + 15) // 16)  # u32 words incl. the 0xF tail block

    def nib_at(genome32, pos):
        word = genome32[(pos >> np.uint32(3)).astype(jnp.int32)]
        return (word >> ((pos & np.uint32(7)) * np.uint32(4))) & np.uint32(0xF)

    def stage1(genome32, counter2, counter3, index2, index3, preads, packed,
               wmask, lens, is_ga, thr):
        """preads: (B, lmax+32) u8 zero-padded; packed: (B, n_words) u32
        (0xF tail padding inside the read's word block, zeros beyond);
        wmask: (B, n_words) i32 validity of each word; lens: (B,) i32;
        is_ga: (B,) bool three-letter conversion; thr: (B,) i32 emission
        threshold floor(0.4*len).

        Returns (ev_pos, ev_diffs, ev_rank) as (B, CAP) arrays in discovery
        order, ev_count (B,), overflow (B,) bool."""
        B = preads.shape[0]
        ip = preads.astype(jnp.int32)

        # rolling hashes for every offset (AbismalIndex.hpp:271-305)
        bits = ((ip & 5) == 0).astype(jnp.uint32)
        k2_all = jnp.zeros((B, o_sens), dtype=jnp.uint32)
        for j in range(KEY_WEIGHT):
            k2_all = (k2_all << 1) | bits[:, j : j + o_sens]
        tct = ((((ip & 4) != 0) << 1) | ((ip & 1) != 0)).astype(jnp.uint32)
        tga = ((((ip & 8) != 0) << 1) | ((ip & 2) != 0)).astype(jnp.uint32)
        k3t = jnp.zeros((B, o_sens), dtype=jnp.uint32)
        k3a = jnp.zeros((B, o_sens), dtype=jnp.uint32)
        for j in range(KEY_WEIGHT_THREE):
            k3t = k3t * 3 + tct[:, j : j + o_sens]
            k3a = k3a * 3 + tga[:, j : j + o_sens]
        k3_all = jnp.where(is_ga[:, None], k3a % HASH3_MOD, k3t % HASH3_MOD)

        # flat per-lane read symbol arrays for the extension searches
        stride = preads.shape[1]
        lane_base = jnp.arange(B, dtype=jnp.int32) * stride
        flat_bits = bits.reshape(-1)
        flat_sym = jnp.where(
            is_ga[:, None], (ip & 10), (ip & 5)
        ).astype(jnp.uint32).reshape(-1)

        specific_len = jnp.minimum(lens - WINDOW_SIZE, lens >> 1)
        specific_lim = jnp.where(
            lens > 0, jnp.maximum(WINDOW_SIZE, lens >> 1), 0)
        sens_lim = lens - KEY_WEIGHT + 1
        idx3_base = is_ga.astype(jnp.int32) * n_index3
        c3_base = is_ga.astype(jnp.int32) * (counter3.shape[0] // 2)
        sym_mask3 = jnp.where(is_ga, np.uint32(10), np.uint32(5))
        v1_3 = jnp.where(is_ga, 2, 1).astype(jnp.uint32)
        v2_3 = jnp.where(is_ga, 8, 4).astype(jnp.uint32)

        slots = jnp.arange(SLOT, dtype=jnp.int32)[None, :]

        def extend_two(offs_i, read_lim, lo, hi):
            """find_candidates (abismal.cpp:1163-1194), all lanes."""

            p_cap = stride - 1 - 0  # symbol reads must stay inside padding

            def cond(state):
                p, lo, hi, plo, phi = state
                return jnp.any((p != read_lim) & (offs_i + p < p_cap)
                               & ((hi - lo) > max_candidates))

            def body(state):
                p, lo, hi, plo, phi = state
                act = ((p != read_lim) & (offs_i + p < p_cap)
                       & ((hi - lo) > max_candidates))
                plo = jnp.where(act, lo, plo)
                phi = jnp.where(act, hi, phi)
                pp = p.astype(jnp.uint32)

                def ibody(_, ab):
                    a, b = ab
                    mid = (a + b) >> 1
                    nib = nib_at(genome32,
                                 index2[mid].astype(jnp.uint32) + pp)
                    gbit = ((nib & 5) == 0).astype(jnp.uint32)
                    cont = a < b
                    a = jnp.where(cont & (gbit < 1), mid + 1, a)
                    b = jnp.where(cont & (gbit >= 1), mid, b)
                    return a, b

                first1, _ = jax.lax.fori_loop(0, 31, ibody, (lo, hi))
                rbit = flat_bits[lane_base + offs_i + p]
                lo = jnp.where(act, jnp.where(rbit == 1, first1, lo), lo)
                hi = jnp.where(act, jnp.where(rbit == 1, hi, first1), hi)
                p = jnp.where(act, p + 1, p)
                return p, lo, hi, plo, phi

            p0 = jnp.full_like(lo, KEY_WEIGHT)
            p, lo, hi, plo, phi = jax.lax.while_loop(
                cond, body, (p0, lo, hi, lo, hi))
            empty = lo == hi
            return (jnp.where(empty, p - 1, p), jnp.where(empty, plo, lo),
                    jnp.where(empty, phi, hi))

        def extend_three(offs_i, read_lim, lo, hi):
            """find_candidates_three (abismal.cpp:1214-1259).  lo/hi are
            local to the lane's table; index3 lookups add idx3_base."""

            p_cap = stride - 1

            def cond(state):
                p, lo, hi, plo, phi = state
                return jnp.any((p != read_lim) & (offs_i + p < p_cap)
                               & ((hi - lo) > max_candidates))

            def body(state):
                p, lo, hi, plo, phi = state
                act = ((p != read_lim) & (offs_i + p < p_cap)
                       & ((hi - lo) > max_candidates))
                plo = jnp.where(act, lo, plo)
                phi = jnp.where(act, hi, phi)
                pp = p.astype(jnp.uint32)

                def lb(val):
                    def ibody(_, ab):
                        a, b = ab
                        mid = (a + b) >> 1
                        nib = nib_at(
                            genome32,
                            index3[idx3_base + mid].astype(jnp.uint32) + pp,
                        )
                        less = (nib & sym_mask3) < val
                        cont = a < b
                        a = jnp.where(cont & less, mid + 1, a)
                        b = jnp.where(cont & ~less, mid, b)
                        return a, b

                    a, _ = jax.lax.fori_loop(0, 31, ibody, (lo, hi))
                    return a

                first1 = lb(v1_3)
                first2 = lb(v2_3)
                num = flat_sym[lane_base + offs_i + p]
                nhi = jnp.where(num == 0, first1,
                                jnp.where(num == v1_3, first2, hi))
                nlo = jnp.where(num == 0, lo,
                                jnp.where(num == v1_3, first1, first2))
                lo = jnp.where(act, nlo, lo)
                hi = jnp.where(act, nhi, hi)
                p = jnp.where(act, p + 1, p)
                return p, lo, hi, plo, phi

            p0 = jnp.full_like(lo, KEY_WEIGHT_THREE)
            p, lo, hi, plo, phi = jax.lax.while_loop(
                cond, body, (p0, lo, hi, lo, hi))
            empty = lo == hi
            return (jnp.where(empty, p - 1, p), jnp.where(empty, plo, lo),
                    jnp.where(empty, phi, hi))

        def compare(pos, valid):
            """Popcount Hamming distance (abismal.cpp:1105-1122)."""
            pos = jnp.where(valid, pos, 0)
            w = (pos >> np.uint32(3)).astype(jnp.int32)
            sh = ((pos & np.uint32(7)) * np.uint32(4))
            d = jnp.zeros(pos.shape, dtype=jnp.int32)
            for j in range(n_words):
                g1 = genome32[w + j]
                g2 = genome32[w + j + 1]
                window = (g1 >> sh) | ((g2 << (np.uint32(31) - sh)) << 1)
                m = jax.lax.population_count(packed[:, j : j + 1] & window)
                d = d + wmask[:, j : j + 1] * (8 - m.astype(jnp.int32))
            return d

        def gather_check(index_arr, lo, hi, base, i, check):
            cand = lo[:, None] + slots
            valid = (cand < hi[:, None]) & check[:, None]
            cand = jnp.where(valid, cand + base[:, None], 0)
            pos = index_arr[cand].astype(jnp.uint32) - i.astype(jnp.uint32)
            diffs = compare(pos, valid)
            accept = valid & (diffs <= thr[:, None])
            return pos, diffs, accept

        def append(carry, pos, diffs, accept, rank_base):
            ev_pos, ev_diffs, ev_rank, count, overflow = carry
            acc = accept.astype(jnp.int32)
            prefix = jnp.cumsum(acc, axis=1) - acc
            dest = count[:, None] + prefix
            ok = accept & (dest < CAP)
            overflow = overflow | jnp.any(accept & (dest >= CAP), axis=1)
            dest_c = jnp.where(ok, dest, CAP)  # CAP is a trash column
            bidx = jnp.broadcast_to(
                jnp.arange(B, dtype=jnp.int32)[:, None], dest_c.shape)
            ev_pos = ev_pos.at[bidx, dest_c].set(pos)
            ev_diffs = ev_diffs.at[bidx, dest_c].set(diffs)
            ev_rank = ev_rank.at[bidx, dest_c].set(rank_base[:, None] + slots)
            count = count + jnp.sum(acc, axis=1)
            return ev_pos, ev_diffs, ev_rank, count, overflow

        zero_base = jnp.zeros((B,), dtype=jnp.int32)

        def spec_step(i, carry):
            active = i < specific_lim
            read_lim = lens - i
            k2 = jnp.where(active, k2_all[:, i], 0).astype(jnp.int32)
            s2 = jnp.where(active, counter2[k2], 0)
            e2 = jnp.where(active, counter2[k2 + 1], 0)
            l2, s2x, e2x = extend_two(i, read_lim, s2, e2)
            d2 = e2x - s2x
            check2 = active & ((d2 <= max_candidates) | (l2 >= specific_len))

            k3 = jnp.where(active, k3_all[:, i], 0).astype(jnp.int32) + c3_base
            s3 = jnp.where(active, counter3[k3], 0)
            e3 = jnp.where(active, counter3[k3 + 1], 0)
            l3, s3x, e3x = extend_three(i, read_lim, s3, e3)
            d3 = e3x - s3x
            check3 = active & ((d3 <= max_candidates) | (l3 >= specific_len))

            pos2, diffs2, acc2 = gather_check(index2, s2x, e2x, zero_base, i,
                                              check2)
            carry = append(carry, pos2, diffs2, acc2,
                           jnp.full((B,), (i * 2 + 0) * SLOT, jnp.int32))
            pos3, diffs3, acc3 = gather_check(index3, s3x, e3x, idx3_base, i,
                                              check3)
            carry = append(carry, pos3, diffs3, acc3,
                           jnp.full((B,), (i * 2 + 1) * SLOT, jnp.int32))
            ev_pos, ev_diffs, ev_rank, count, overflow = carry
            overflow = overflow | (check2 & (d2 > SLOT)) | (check3 &
                                                            (d3 > SLOT))
            return ev_pos, ev_diffs, ev_rank, count, overflow

        def sens_step(i, carry):
            active = i < sens_lim
            k2 = jnp.where(active, k2_all[:, i], 0).astype(jnp.int32)
            s2, e2 = counter2[k2], counter2[k2 + 1]
            d2 = e2 - s2
            k3 = jnp.where(active, k3_all[:, i], 0).astype(jnp.int32) + c3_base
            s3, e3 = counter3[k3], counter3[k3 + 1]
            d3 = e3 - s3
            check2 = active & (d2 != 0) & (d2 <= max_candidates) & (
                (d3 == 0) | (d2 <= MIN_FOLD_SIZE * d3))
            check3 = active & (d3 != 0) & (d3 <= max_candidates)

            rb = (o_spec + i) * 2 * SLOT
            pos2, diffs2, acc2 = gather_check(index2, s2, e2, zero_base, i,
                                              check2)
            carry = append(carry, pos2, diffs2, acc2,
                           jnp.full((B,), rb, jnp.int32))
            pos3, diffs3, acc3 = gather_check(index3, s3, e3, idx3_base, i,
                                              check3)
            carry = append(carry, pos3, diffs3, acc3,
                           jnp.full((B,), rb + SLOT, jnp.int32))
            return carry

        ev_pos = jnp.zeros((B, CAP + 1), dtype=jnp.uint32)
        ev_diffs = jnp.zeros((B, CAP + 1), dtype=jnp.int32)
        ev_rank = jnp.zeros((B, CAP + 1), dtype=jnp.int32)
        count = jnp.zeros((B,), dtype=jnp.int32)
        overflow = jnp.zeros((B,), dtype=bool)
        carry = (ev_pos, ev_diffs, ev_rank, count, overflow)
        carry = jax.lax.fori_loop(0, o_spec, spec_step, carry)
        carry = jax.lax.fori_loop(0, o_sens, sens_step, carry)
        ev_pos, ev_diffs, ev_rank, count, overflow = carry
        # short reads (< 49 bp) can drive the reference's extension past the
        # read end (UB upstream); route them to the host path
        overflow = overflow | ((lens > 0) & (lens < 49))
        return (ev_pos[:, :CAP], ev_diffs[:, :CAP], ev_rank[:, :CAP],
                jnp.minimum(count, CAP), overflow)

    result = (jax.jit(stage1), o_spec)
    _stage1_memo[memo_key] = result
    return result


def replay_events(res, sc: int, ev_pos, ev_diffs, ev_rank, count: int,
                  o_spec: int) -> None:
    """Replays process_seeds' sequential candidate-set updates
    (abismal.cpp:1269-1375) over device-computed events.  Events arrive in
    discovery order; rank encodes (phase, offset, table, slot)."""
    boundary = o_spec * 2 * SLOT
    res.set_specific()
    i = 0
    while i < count and ev_rank[i] < boundary:
        if res.sure_ambig:
            break
        d = int(ev_diffs[i])
        if d <= res.cutoff:
            res.update(True, d, sc, int(ev_pos[i]))
        i += 1
    # skip remaining specific events after a sure-ambig abort
    while i < count and ev_rank[i] < boundary:
        i += 1
    if not res.should_do_sensitive():
        return
    res.set_sensitive()
    while i < count:
        if res.sure_ambig:
            break
        d = int(ev_diffs[i])
        if d <= res.cutoff:
            res.update(True, d, sc, int(ev_pos[i]))
        i += 1


from .engine import MappingEngine, strand_code  # noqa: E402
from .seeds import get_conv_is_ga, prep_read, process_seeds  # noqa: E402


class TpuMappingEngine(MappingEngine):
    """Mapping engine whose candidate generation runs on the accelerator.

    Extends the exact host engine: before each batch, all read/strand/
    encoding units are pushed through the jitted stage-1 program; the
    sequential decision logic replays device events, falling back to the
    host oracle for units flagged overflow.  Output is identical to the
    exact engine (and hence to the reference)."""

    def __init__(self, index, allow_ambig=False, valid_frac=0.1,
                 pe_min_dist=32, pe_max_dist=3000, lmax: int = 128,
                 unit_batch: int = 512, device_put=None):
        MappingEngine.__init__(self, index, allow_ambig, valid_frac,
                               pe_min_dist, pe_max_dist)
        self.lmax = lmax
        self.unit_batch = unit_batch
        self.dev = DeviceIndex(index, device_put)
        self.stage1, self.o_spec = build_stage1(
            lmax, self.dev.max_candidates, self.dev.n_index3
        )
        self._cache = {}
        self.n_fallback = 0
        self.n_units = 0

    # --- batch preparation -------------------------------------------------
    def _run_units(self, units):
        """units: list of (key, pread_nibbles, is_ga).  Fills self._cache
        with either event tuples or None (host fallback)."""
        self._cache = {}
        if not units:
            return
        jax, _ = _jm()
        B = self.unit_batch
        for start in range(0, len(units), B):
            chunk = units[start : start + B]
            reads = [u[1] for u in chunk]
            if any(r.shape[0] > self.lmax for r in reads):
                # route oversized reads to the host path; process the rest
                keep = [u for u in chunk if u[1].shape[0] <= self.lmax]
                for u in chunk:
                    if u[1].shape[0] > self.lmax:
                        self._cache[u[0]] = None
                chunk = keep
                reads = [u[1] for u in chunk]
                if not chunk:
                    continue
            preads, packed, wmask, lens = prepare_units(reads, self.lmax)
            pad = B - len(chunk)
            if pad:
                preads = np.pad(preads, ((0, pad), (0, 0)))
                packed = np.pad(packed, ((0, pad), (0, 0)))
                wmask = np.pad(wmask, ((0, pad), (0, 0)))
                lens = np.pad(lens, (0, pad))
            is_ga = np.zeros(B, dtype=bool)
            for i, u in enumerate(chunk):
                is_ga[i] = u[2]
            thr = ((2 * lens.astype(np.int64)) // 5).astype(np.int32)
            ev_pos, ev_diffs, ev_rank, count, overflow = [
                np.asarray(x) for x in self.stage1(
                    *self.dev.tables(), preads, packed, wmask, lens, is_ga,
                    thr)
            ]
            for i, u in enumerate(chunk):
                self.n_units += 1
                if overflow[i]:
                    self.n_fallback += 1
                    self._cache[u[0]] = None
                else:
                    c = int(count[i])
                    self._cache[u[0]] = (
                        ev_pos[i, :c], ev_diffs[i, :c], ev_rank[i, :c], c
                    )

    def _prepare_batch_se(self, reads, a_rich_mode, random_pbat):
        from ..utils.dna import revcomp_str

        units = []
        for ri, (_, read) in enumerate(reads):
            if not read:
                continue
            if not random_pbat:
                conv = a_rich_mode
                units.append((
                    (ri, "f", conv), prep_read(read, conv),
                    get_conv_is_ga(strand_code("+", conv))))
                rc = revcomp_str(read.decode()).encode()
                units.append((
                    (ri, "r", not conv), prep_read(rc, not conv),
                    get_conv_is_ga(strand_code("-", conv))))
            else:
                rc = revcomp_str(read.decode()).encode()
                units.append(((ri, "f", False), prep_read(read, False),
                              get_conv_is_ga(strand_code("+", False))))
                units.append(((ri, "f", True), prep_read(read, True),
                              get_conv_is_ga(strand_code("+", True))))
                units.append(((ri, "r", False), prep_read(rc, False),
                              get_conv_is_ga(strand_code("-", True))))
                units.append(((ri, "r", True), prep_read(rc, True),
                              get_conv_is_ga(strand_code("-", False))))
        self._run_units(units)

    def _prepare_batch_pe(self, reads1, reads2, a_rich_mode, random_pbat):
        from ..utils.dna import revcomp_str

        units = []

        def add(ri, end, orient, enc, read_bytes, sc):
            if not read_bytes:
                return
            seq = read_bytes
            if orient == "r":
                seq = revcomp_str(read_bytes.decode()).encode()
            units.append(((ri, end, orient, enc), prep_read(seq, enc),
                          get_conv_is_ga(sc)))

        convs = ([a_rich_mode] if not random_pbat else [False, True])
        for ri, ((_, r1), (_, r2)) in enumerate(zip(reads1, reads2)):
            for conv in convs:
                add(ri, 1, "f", conv, r1, strand_code("+", conv))
                add(ri, 2, "r", conv, r2, strand_code("-", not conv))
                add(ri, 2, "f", not conv, r2, strand_code("+", not conv))
                add(ri, 1, "r", not conv, r1, strand_code("-", conv))
        self._run_units(units)

    def _seeds(self, pread, packed, sc, res, key=None):
        ev = self._cache.get(key, None) if key is not None else None
        if ev is None:
            process_seeds(self.view, pread, packed, sc, res)
            return
        ev_pos, ev_diffs, ev_rank, c = ev
        replay_events(res, sc, ev_pos, ev_diffs, ev_rank, c, self.o_spec)


def make_tpu_engine_factory(lmax: int = 128, unit_batch: int = 512):
    def factory(index, allow_ambig, valid_frac, pe_min_dist, pe_max_dist):
        return TpuMappingEngine(index, allow_ambig, valid_frac, pe_min_dist,
                                pe_max_dist, lmax=lmax, unit_batch=unit_batch)

    return factory


def prepare_units(unit_reads, lmax: int):
    """Host-side packing of encoded unit reads (list of uint8 nibble arrays)
    into the fixed-shape stage-1 inputs."""
    n_words = 2 * ((lmax + 15) // 16)
    B = len(unit_reads)
    preads = np.zeros((B, lmax + 32), dtype=np.uint8)
    packed = np.zeros((B, n_words), dtype=np.uint32)
    wmask = np.zeros((B, n_words), dtype=np.int32)
    lens = np.zeros(B, dtype=np.int32)
    for i, pr in enumerate(unit_reads):
        n = pr.shape[0]
        lens[i] = n
        preads[i, :n] = pr
        if n:
            nw64 = (n + 15) // 16
            padded = np.full(nw64 * 16, 0xF, dtype=np.uint32)
            padded[:n] = pr
            padded = padded.reshape(-1, 8)
            shifts = (4 * np.arange(8, dtype=np.uint32)).reshape(1, 8)
            words = np.bitwise_or.reduce(padded << shifts, axis=1)
            packed[i, : 2 * nw64] = words
            wmask[i, : 2 * nw64] = 1
    return preads, packed, wmask, lens
