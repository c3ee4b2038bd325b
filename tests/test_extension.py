"""Adversarial stress test for the device seed extension (the pooled
LCP-window reformulation in map/pipeline.py): a synthetic genome engineered
to produce oversized hash buckets with controlled narrowing behavior.

Bucket engineering: a short-period (10 bp) tandem repeat concentrates all
kept positions of a region onto ONE hash key (the window-20 seed DP aligns
its picks to the repeat period), so a region of N copies yields a bucket of
~N/2 positions.  The blocks below then shape the suffix LCP distribution
seen from a read sampled inside the block:
  - block1 (240 copies -> bucket ~120): count stays in
    (max_candidates, CELLCAP] to the read end -> extension stops at
    read_lim with an exactly-sized >100 range that IS Hamming-checked
    (the window-clip exactness case);
  - block2 (6000 copies -> bucket ~3000): count > CELLCAP -> per-cell
    overflow -> unit fallback flag;
  - block3 (600 segments of 60 bp repeat + unique random tail): all
    segments share the repeat, suffixes diverge at each segment's tail ->
    extension genuinely narrows below max_candidates mid-read;
  - block4 (240 copies) reads with a mutation at depth >= specific_len:
    the narrowed range goes EMPTY in one step -> the reference's
    rollback-to-previous-depth result, whose (100, 128] range is then
    Hamming-checked.

Correctness = device stage-1 event streams replay to exactly the host
oracle's candidate-set state (process_seeds, the byte-parity-validated
implementation of abismal.cpp:1269-1375), for T-rich and A-rich units.
"""

import numpy as np
import pytest

from abismal_tpu.constants import KEY_WEIGHT


def _rand_unit(rng):
    # a 10-mer whose 2-letter classes are not a shorter repeat
    while True:
        u = "".join(rng.choice(list("ACGT"), size=10))
        bits = ["01"[c in "CT"] for c in u]
        if bits[:5] != bits[5:]:
            return u


def _mk_genome(path):
    rng = np.random.default_rng(42)
    u1, u2, u3, u4 = (_rand_unit(rng) for _ in range(4))
    parts = [rng.choice(list("ACGT"), size=30_000)]
    marks = {}

    marks["b1"] = sum(len(p) if not isinstance(p, str) else len(p)
                      for p in parts)
    parts.append(np.array(list(u1 * 240)))
    parts.append(rng.choice(list("ACGT"), size=10_000))

    marks["b2"] = sum(len(p) for p in parts)
    parts.append(np.array(list(u2 * 6000)))
    parts.append(rng.choice(list("ACGT"), size=10_000))

    marks["b3"] = sum(len(p) for p in parts)
    seg_starts = []
    for _ in range(600):
        seg_starts.append(sum(len(p) for p in parts))
        parts.append(np.array(list(u3 * 6)))
        parts.append(rng.choice(list("ACGT"), size=60))
    marks["b3_segs"] = seg_starts
    parts.append(rng.choice(list("ACGT"), size=10_000))

    marks["b4"] = sum(len(p) for p in parts)
    parts.append(np.array(list(u4 * 240)))
    parts.append(rng.choice(list("ACGT"), size=30_000))

    seq = "".join("".join(p) for p in parts)
    with open(path, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(seq), 80):
            f.write(seq[i : i + 80] + "\n")
    return seq, marks


@pytest.fixture(scope="module")
def ext_index(tmp_path_factory):
    from abismal_tpu.index.build import create_index

    d = tmp_path_factory.mktemp("extg")
    fa = str(d / "ext.fa")
    seq, marks = _mk_genome(fa)
    return create_index(fa), seq, marks


def _mut(s, pos):
    r = list(s)
    r[pos] = {"A": "C", "C": "A", "G": "C", "T": "G"}[r[pos]]
    return "".join(r)


def _reads_for(seq, marks, rng):
    reads = []
    # block1: read-end stop with 100 < count <= 128 (several phases)
    for j in range(0, 20, 3):
        reads.append(seq[marks["b1"] + 200 + j :][:100])
    # block2: count > CELLCAP -> unit overflow
    for j in range(0, 10, 3):
        reads.append(seq[marks["b2"] + 300 + j :][:100])
    # block3: genuine mid-read narrowing below max_candidates
    for si in (5, 150, 350, 550):
        p = marks["b3_segs"][si]
        reads.append(seq[p : p + 100])
        reads.append(_mut(seq[p : p + 100], 90))
    # block4: rollback at depths past specific_len (checked range), and
    # shallow-mutation rollback (unchecked range; still replayed)
    base4 = seq[marks["b4"] + 400 :][:100]
    reads.append(base4)
    for dmut in (76, 80, 85, 90, 99, 30, 45):
        reads.append(_mut(base4, dmut))
    # background
    for _ in range(4):
        p = int(rng.integers(1000, 28_000))
        reads.append(seq[p : p + 100])
    return [r.encode() for r in reads]


@pytest.mark.parametrize("a_rich", [False, True])
def test_extension_events_match_oracle(ext_index, a_rich, monkeypatch):
    # the repeat genome needs a far bigger pooled candidate budget than the
    # density heuristic picks, or every unit hits the pooled-budget overflow
    monkeypatch.setenv("ABISMAL_TPU_CAND_PER_UNIT", "4096")
    monkeypatch.setenv("ABISMAL_TPU_GCAP_PER_UNIT", "4096")
    from abismal_tpu.map import pipeline as P

    P._stage1_memo.clear()
    from abismal_tpu.map.candidates import SECandidates
    from abismal_tpu.map.engine import strand_code
    from abismal_tpu.map.pipeline import (
        DeviceIndex, build_stage1, o_spec_for, prepare_units, replay_events,
    )
    from abismal_tpu.map.seeds import (
        SeedIndexView, get_conv_is_ga, pack_read, prep_read, process_seeds,
    )

    index, seq, marks = ext_index
    view = SeedIndexView(index)
    dev = DeviceIndex(index)
    stage1, o_spec = build_stage1(128, dev.max_candidates, dev.n_index2,
                                  dev.n_index3, ext_iters=dev.ext_iters)

    rng = np.random.default_rng(1)
    reads = _reads_for(seq, marks, rng)
    B = 32
    reads = (reads + reads)[:B]

    sc = strand_code("+", a_rich)
    units = [prep_read(r, a_rich) for r in reads]
    pnib, lens = prepare_units(units, 128)
    is_ga = np.array([get_conv_is_ga(sc)] * len(units))

    # coverage guard: the engineered genome must actually create
    # extension-active cells (specific-phase buckets > max_candidates)
    n_active = _count_active_cells(index, view, units, is_ga, o_spec)
    assert n_active >= 20, f"only {n_active} extension-active cells"

    thr = ((2 * lens.astype(np.int64)) // 5).astype(np.int32)
    ev, cf = stage1(*dev.tables(), pnib, lens, is_ga, thr)
    ev, cf = np.asarray(ev), np.asarray(cf)
    gpos, gmeta = ev[0], ev[1]
    count = cf & 0x3FFFFFFF
    overflow = (cf >> 30) != 0
    prefix = np.concatenate(([0], np.cumsum(count)))
    diffs_all = (gmeta >> 22).astype(np.int32) - 512
    rank_all = (gmeta & 0x3FFFFF).astype(np.int32)

    assert overflow.any(), "expected some unit overflow (cnt > CELLCAP)"
    ncheck = 0
    for i, r in enumerate(reads):
        if overflow[i]:
            continue
        pread = prep_read(r, a_rich)
        res_a = SECandidates()
        res_a.reset(len(r))
        process_seeds(view, pread, pack_read(pread), sc, res_a)
        res_b = SECandidates()
        res_b.reset(len(r))
        s, e = int(prefix[i]), int(prefix[i + 1])
        replay_events(res_b, sc, gpos[s:e], diffs_all[s:e], rank_all[s:e],
                      e - s, o_spec)
        assert res_a.best == res_b.best, f"read {i}"
        assert res_a.sz == res_b.sz, f"read {i}"
        assert sorted(map(tuple, res_a.v[: res_a.sz])) == sorted(
            map(tuple, res_b.v[: res_b.sz])), f"read {i}"
        ncheck += 1
    assert ncheck >= B // 2


def _count_active_cells(index, view, units, is_ga, o_spec):
    """Extension-active (unit, offset, table) cells, from the counters."""
    import numpy as np

    from abismal_tpu.constants import KEY_WEIGHT, KEY_WEIGHT_THREE, WINDOW_SIZE

    c2 = index.counter.astype(np.int64)
    ct = index.counter_t.astype(np.int64)
    ca = index.counter_a.astype(np.int64)
    mc = index.max_candidates
    total = 0
    for u, ga in zip(units, is_ga):
        n = u.shape[0]
        lim = max(WINDOW_SIZE, n >> 1)
        nib = u.astype(np.int64)
        bits = ((nib & 5) == 0).astype(np.int64)
        for off in range(min(lim, o_spec)):
            if off + KEY_WEIGHT > n:
                break
            k2 = int("".join(str(b) for b in bits[off : off + KEY_WEIGHT]), 2)
            if c2[k2 + 1] - c2[k2] > mc:
                total += 1
            if off + KEY_WEIGHT_THREE <= n:
                k3 = 0
                for j in range(KEY_WEIGHT_THREE):
                    x = nib[off + j]
                    if ga:
                        v = 0 if (x & 10) == 0 else (1 if (x & 10) == 2
                                                     else 2)
                    else:
                        v = 0 if (x & 5) == 0 else (1 if (x & 5) == 1 else 2)
                    k3 = k3 * 3 + v
                cc = ca if ga else ct
                if cc[k3 + 1] - cc[k3] > mc:
                    total += 1
    return total


def test_extension_pool_overflow_flags_units(ext_index, monkeypatch):
    """A tiny EXT_POOL must flag (not corrupt) units whose active lanes
    do not fit."""
    from abismal_tpu.map import pipeline as P

    monkeypatch.setenv("ABISMAL_TPU_EXT_POOL", "4")
    P._stage1_memo.clear()
    from abismal_tpu.map.engine import strand_code
    from abismal_tpu.map.pipeline import (
        DeviceIndex, build_stage1, prepare_units,
    )
    from abismal_tpu.map.seeds import get_conv_is_ga, prep_read

    index, seq, marks = ext_index
    dev = DeviceIndex(index)
    stage1, o_spec = build_stage1(128, dev.max_candidates, dev.n_index2,
                                  dev.n_index3, ext_iters=dev.ext_iters)
    rng = np.random.default_rng(1)
    reads = _reads_for(seq, marks, rng)[:32]
    sc = strand_code("+", False)
    units = [prep_read(r, False) for r in reads]
    pnib, lens = prepare_units(units, 128)
    is_ga = np.array([get_conv_is_ga(sc)] * len(units))
    thr = ((2 * lens.astype(np.int64)) // 5).astype(np.int32)
    _, cf = stage1(*dev.tables(), pnib, lens, is_ga, thr)
    overflow = (np.asarray(cf) >> 30) != 0
    assert overflow.sum() >= 8  # repeat-heavy units spill the 4-slot pool
    P._stage1_memo.clear()
