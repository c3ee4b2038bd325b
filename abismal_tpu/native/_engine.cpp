// Native batched mapping engine for abismal-tpu: the per-read decide/align/
// format stage of the mapper, plus a full native seeding path used when no
// device events are available (host fallback units, or pure-native engine).
//
// This is a C++ port of the repo's own golden-validated Python engine
// (abismal_tpu/map/{engine,candidates,seeds,align}.py), which in turn
// re-implements the reference semantics: candidate heaps with libstdc++
// heap-order behavior (abismal.cpp:334-449,775-863), the two-phase seeding
// policy (abismal.cpp:1269-1375), the banded aligner (AbismalAlign.hpp:
// 320-440), the PE mating sweep with its stale-score quirk
// (abismal.cpp:1722-1831), and htslib-compatible SAM record formatting
// (abismal.cpp:481-545,648-773).  Batches are processed by a thread pool;
// output is concatenated in read order so results are byte-deterministic at
// any thread count (better than the reference, whose -t>1 output order is
// nondeterministic).
//
// Exposed to Python via ctypes (see native/__init__.py).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// constants (mirrors abismal_tpu/constants.py)
// ---------------------------------------------------------------------------
const int KEY_WEIGHT = 25;
const int KEY_WEIGHT_THREE = 16;
const int WINDOW_SIZE = 20;
const uint32_t HASH_MASK = (1u << 25) - 1;
const uint32_t HASH3_MOD = 43046721u;  // 3^16
const int MIN_READ_LENGTH = 44;
const int SE_MAX = 50;
const int PE_MAX_SMALL = 32;
const int PE_MAX_LARGE = 32768;
const double INVALID_HIT_FRAC = 0.4;
const int GOOD_FRAC_DENOM = 10;
const int MIN_FOLD_SIZE = 10;
const int SAME_POS_TOL = 3;
const int32_t MAX_DIFFS = 32767;

const int16_t ALN_MATCH = 2;
const int16_t ALN_MISMATCH = -3;
const int16_t ALN_INDEL = -4;
const int BANDWIDTH = 61;

const uint32_t CIG_M = 0, CIG_I = 1, CIG_D = 2, CIG_S = 4;
// 2-bit consume flags per op (1 = query, 2 = ref)
const uint8_t CIGAR_TYPE[10] = {3, 1, 2, 2, 1, 0, 0, 3, 3, 0};
const char CIGAR_OPS[11] = "MIDNSHP=XB";

const uint32_t F_PAIRED = 0x1, F_PAIR_MAPPED = 0x2, F_RC = 0x10,
               F_MATE_RC = 0x20, F_TFIRST = 0x40, F_TLAST = 0x80,
               F_SECONDARY = 0x100, F_A_RICH = 0x1000;

// nibble helper tables (utils/dna.py)
struct Tables {
  uint8_t enc_t[256];   // T-rich read encoding
  uint8_t enc_a[256];   // A-rich read encoding
  uint8_t rc[256];      // ASCII reverse complement
  uint8_t bit[16];      // two-letter bit of a nibble
  uint8_t srt_ct[16];   // nt & 5
  uint8_t srt_ga[16];   // nt & 10
  uint8_t three_ct[16];
  uint8_t three_ga[16];
  Tables() {
    std::memset(enc_t, 0, 256);
    std::memset(enc_a, 0, 256);
    auto set2 = [](uint8_t *t, char c, uint8_t v) {
      t[(int)c] = v;
      t[(int)(c - 'A' + 'a')] = v;
    };
    set2(enc_t, 'A', 1); set2(enc_t, 'C', 2); set2(enc_t, 'G', 4);
    set2(enc_t, 'T', 10);
    set2(enc_a, 'A', 5); set2(enc_a, 'C', 2); set2(enc_a, 'G', 4);
    set2(enc_a, 'T', 8);
    std::memset(rc, 'N', 256);
    rc[(int)'A'] = 'T'; rc[(int)'T'] = 'A';
    rc[(int)'C'] = 'G'; rc[(int)'G'] = 'C';
    for (int n = 0; n < 16; ++n) {
      bit[n] = ((n & 5) == 0) ? 1 : 0;
      srt_ct[n] = n & 5;
      srt_ga[n] = n & 10;
      three_ct[n] = (((n & 4) != 0) << 1) | ((n & 1) != 0);
      three_ga[n] = (((n & 8) != 0) << 1) | ((n & 2) != 0);
    }
  }
};
const Tables T;

// ---------------------------------------------------------------------------
// candidate elements + libstdc++ heap algorithms (candidates.py)
// ---------------------------------------------------------------------------
struct Elem {
  int32_t d;
  uint32_t f;
  uint32_t p;
};

inline bool elem_empty(const Elem &e) { return e.p == 0; }
inline bool elem_ambig(const Elem &e) { return (e.f & F_SECONDARY) != 0; }
inline void set_ambig(Elem &e) { e.f |= F_SECONDARY; }

// bits/stl_heap.h behavior, comparator: diffs <
static void sift_up(Elem *v, int64_t hole, int64_t top, Elem value) {
  int64_t parent = (hole - 1) / 2;
  while (hole > top && v[parent].d < value.d) {
    v[hole] = v[parent];
    hole = parent;
    parent = (hole - 1) / 2;
  }
  v[hole] = value;
}

static void push_heap(Elem *v, int64_t n) { sift_up(v, n - 1, 0, v[n - 1]); }

static void adjust_heap(Elem *v, int64_t hole, int64_t length, Elem value) {
  const int64_t top = hole;
  int64_t second = hole;
  while (second < (length - 1) / 2) {
    second = 2 * (second + 1);
    if (v[second].d < v[second - 1].d)
      --second;
    v[hole] = v[second];
    hole = second;
  }
  if ((length & 1) == 0 && second == (length - 2) / 2) {
    second = 2 * (second + 1);
    v[hole] = v[second - 1];
    hole = second - 1;
  }
  sift_up(v, hole, top, value);
}

static void pop_heap(Elem *v, int64_t n) {
  if (n > 1) {
    Elem value = v[n - 1];
    v[n - 1] = v[0];
    adjust_heap(v, 0, n - 1, value);
  }
}

// SE candidate set: fixed 50-slot max-heap + exact-match tracking
// (abismal.cpp:334-449)
struct SECand {
  Elem v[SE_MAX];
  int sz = 1;
  Elem best{MAX_DIFFS, 0, 0};
  int32_t cutoff = 0;
  int32_t good_cutoff = 0;
  bool sure_ambig = false;

  SECand() {
    for (int i = 0; i < SE_MAX; ++i)
      v[i] = Elem{MAX_DIFFS, 0, 0};
  }
  void reset(int readlen) {
    // element flags are NOT reset (se_element::reset, abismal.cpp:286-296)
    best.d = (int32_t)(INVALID_HIT_FRAC * readlen);
    best.p = 0;
    v[0].d = (int32_t)(INVALID_HIT_FRAC * readlen);
    v[0].p = 0;
    cutoff = v[0].d;
    good_cutoff = readlen / GOOD_FRAC_DENOM;
    sure_ambig = false;
    sz = 1;
  }
  void reset_plain() {
    best.d = MAX_DIFFS;
    best.p = 0;
    v[0].d = MAX_DIFFS;
    v[0].p = 0;
    cutoff = v[0].d;
    sure_ambig = false;
    sz = 1;
  }
  bool full() const { return sz == SE_MAX; }
  bool has_exact() const { return !elem_empty(best); }
  bool should_do_sensitive() const {
    return !full() || cutoff > good_cutoff;
  }
  void set_specific() { cutoff = good_cutoff; }
  void set_sensitive() { cutoff = v[0].d; }
  void update(bool specific, int32_t d, uint32_t s, uint32_t p) {
    if (d == 0) {
      // update_exact_match (abismal.cpp:347-355)
      if (elem_empty(best))
        best = Elem{0, s, p};
      else if (best.p != p || best.f != s)
        set_ambig(best);
    }
    else {
      if (full()) {
        pop_heap(v, sz);
        v[sz - 1] = Elem{d, s, p};
      }
      else {
        v[sz] = Elem{d, s, p};
        ++sz;
      }
      push_heap(v, sz);
    }
    sure_ambig = elem_ambig(best) && best.d == 0;
    cutoff = specific ? std::min(cutoff, v[0].d) : v[0].d;
  }
  // sort by (pos, flags) stable + dedup (abismal.cpp:429-439)
  int prepare_for_alignments(Elem *out) {
    std::stable_sort(v, v + sz, [](const Elem &a, const Elem &b) {
      return a.p < b.p || (a.p == b.p && a.f < b.f);
    });
    int n = 0;
    for (int i = 0; i < sz; ++i)
      if (n == 0 || out[n - 1].p != v[i].p || out[n - 1].f != v[i].f)
        out[n++] = v[i];
    sz = n;
    return n;
  }
};

// PE candidate set: heap with capacity growing 32 -> 32768
// (abismal.cpp:775-863)
struct PECand {
  std::vector<Elem> v;
  int sz = 1;
  int capacity = PE_MAX_SMALL;
  int32_t cutoff = 0;
  int32_t good_cutoff = 0;
  bool sure_ambig = false;

  PECand() : v(PE_MAX_LARGE, Elem{MAX_DIFFS, 0, 0}) {}
  void reset(int readlen) {
    v[0].d = (int32_t)(INVALID_HIT_FRAC * readlen);
    v[0].p = 0;
    sure_ambig = false;
    cutoff = v[0].d;
    good_cutoff = readlen / GOOD_FRAC_DENOM;
    sz = 1;
    capacity = PE_MAX_SMALL;
  }
  bool full() const { return sz == capacity; }
  bool should_align() const {
    return sz != PE_MAX_LARGE || cutoff != 0;
  }
  bool should_do_sensitive() const {
    return capacity == PE_MAX_SMALL || cutoff > good_cutoff;
  }
  void set_specific() { cutoff = good_cutoff; }
  void set_sensitive() { cutoff = v[0].d; }
  void update(bool specific, int32_t d, uint32_t s, uint32_t p) {
    if (full()) {
      if (specific && capacity != PE_MAX_LARGE && d <= good_cutoff)
        ++capacity;
      else {
        pop_heap(v.data(), sz);
        --sz;
      }
    }
    v[sz] = Elem{d, s, p};
    ++sz;
    push_heap(v.data(), sz);
    cutoff = specific ? std::min(cutoff, v[0].d) : v[0].d;
    sure_ambig = full() && cutoff == 0;
  }
  // sort by pos stable + dedup by (pos, flags) (abismal.cpp:844-852)
  void prepare_for_mating() {
    std::stable_sort(v.begin(), v.begin() + sz,
                     [](const Elem &a, const Elem &b) { return a.p < b.p; });
    int n = 0;
    for (int i = 0; i < sz; ++i)
      if (n == 0 || v[n - 1].p != v[i].p || v[n - 1].f != v[i].f)
        v[n++] = v[i];
    sz = n;
  }
};

// ---------------------------------------------------------------------------
// banded aligner (align.py / AbismalAlign.hpp:320-440)
// ---------------------------------------------------------------------------
struct Cigar {
  uint32_t ops[512];
  int n = 0;
  void clear() { n = 0; }
  void set_default(int len) {
    ops[0] = (uint32_t)len << 4;
    n = 1;
  }
};

inline int64_t cigar_rseq_ops(const Cigar &c) {
  int64_t r = 0;
  for (int i = 0; i < c.n; ++i)
    if (CIGAR_TYPE[c.ops[i] & 0xF] & 2)
      r += c.ops[i] >> 4;
  return r;
}

inline int64_t cigar_qseq_ops_of(const Cigar &c, uint32_t op) {
  int64_t r = 0;
  for (int i = 0; i < c.n; ++i)
    if ((c.ops[i] & 0xF) == op)
      r += c.ops[i] >> 4;
  return r;
}

// closed-form mismatch recovery (AbismalAlign.hpp:73-89); C++ int division
// truncates toward zero
inline int32_t edit_distance(int32_t scr, int64_t length, const Cigar &c) {
  if (scr == 0)
    return (int32_t)length;
  const int64_t ins = cigar_qseq_ops_of(c, CIG_I);
  const int64_t del = cigar_qseq_ops_of(c, CIG_D);
  const int64_t a = scr - (int64_t)ALN_INDEL * (ins + del);
  const int64_t num = (int64_t)ALN_MATCH * (length - ins) - a;
  const int64_t den = ALN_MATCH - ALN_MISMATCH;
  return (int32_t)(num / den + ins + del);
}

inline int band_width(int32_t diffs, int32_t max_diffs) {
  // IUPAC genome codes can make Hamming distances negative; the reference
  // casts to size_t before min() so the full band wins
  // (AbismalAlign.hpp:332-334)
  const int64_t b = 2 * (int64_t)std::min(diffs, max_diffs) + 1;
  return b < 0 ? BANDWIDTH : (int)std::min<int64_t>(BANDWIDTH, b);
}

struct Aligner {
  const uint8_t *gnib;
  std::vector<int16_t> table;
  std::vector<int8_t> tb;
  int q_sz = 0;
  bool have_tb = false;
  Cigar tb_cigar;
  int64_t tb_len = 0;
  int64_t tb_pos = 0;

  explicit Aligner(const uint8_t *genome_nib) : gnib(genome_nib) {}

  void reset(int max_read_len) {
    const size_t n = (size_t)(max_read_len + BANDWIDTH) * BANDWIDTH;
    if (table.size() < n) {
      table.resize(n);
      tb.resize(n);
    }
  }

  int16_t run(const uint8_t *q, int64_t qs, int64_t t_pos, int64_t bw,
              bool do_tb) {
    const int64_t t_shift = qs + bw;
    const int64_t n_cells = t_shift * bw;
    std::memset(table.data(), 0, n_cells * sizeof(int16_t));
    if (do_tb)
      std::memset(tb.data(), -1, n_cells);
    const int64_t t_beg = t_pos - ((bw - 1) / 2);
    const uint8_t *t_itr = gnib + t_beg;
    for (int64_t i = 1; i < t_shift; ++i) {
      const int64_t left = (i < bw) ? bw - i : 0;
      const int64_t right = std::min<int64_t>(bw, t_shift - i);
      int16_t *cur = table.data() + i * bw;
      const int16_t *prev = cur - bw;
      int8_t *trow = do_tb ? tb.data() + i * bw : nullptr;
      const uint8_t ref_base = t_itr[i - 1];
      const int64_t q0 = i - bw;
      for (int64_t j = left; j < right; ++j) {
        const int16_t sub =
          (q[q0 + j] & ref_base) ? ALN_MATCH : ALN_MISMATCH;
        const int16_t score = (int16_t)(prev[j] + sub);
        if (score > cur[j])
          cur[j] = score;
        if (do_tb && cur[j] == score)
          trow[j] = (int8_t)CIG_M;
      }
      for (int64_t j = left; j + 1 < right; ++j) {
        const int16_t score = (int16_t)(prev[j + 1] + ALN_INDEL);
        if (score > cur[j])
          cur[j] = score;
        if (do_tb && cur[j] == score)
          trow[j] = (int8_t)CIG_D;
      }
      for (int64_t j = left + 1; j < right; ++j) {
        const int16_t score = (int16_t)(cur[j - 1] + ALN_INDEL);
        if (score > cur[j])
          cur[j] = score;
        if (do_tb && cur[j] == score)
          trow[j] = (int8_t)CIG_I;
      }
    }
    int16_t bestv = 0;
    for (int64_t k = 0; k < n_cells; ++k)
      if (table[k] > bestv)
        bestv = table[k];
    return bestv;
  }

  // align.py BandedAligner.align: score (and optional traceback capture)
  int32_t align(int32_t diffs, int32_t max_diffs, const uint8_t *q,
                int64_t qs, int64_t t_pos, bool do_tb) {
    q_sz = (int)qs;
    if (diffs == 0) {
      have_tb = false;
      return (int32_t)(ALN_MATCH * qs);
    }
    const int bw = band_width(diffs, max_diffs);
    const int16_t r = run(q, qs, t_pos, bw, do_tb);
    if (do_tb) {
      build_traceback(qs, t_pos, bw, r);
      have_tb = true;
    }
    return r;
  }

  // AbismalAlign.hpp:388-440
  void build_traceback(int64_t qs, int64_t t_pos, int64_t bw, int16_t r) {
    const int64_t t_shift = qs + bw;
    const int64_t n_cells = t_shift * bw;
    int64_t best_cell = 0;
    int16_t bestv = -1;
    for (int64_t k = 0; k < n_cells; ++k)
      if (table[k] > bestv) {
        bestv = table[k];
        best_cell = k;
      }
    if (r == 0) {
      tb_cigar.set_default((int)qs);
      tb_len = qs;
      tb_pos = t_pos;
      return;
    }
    int64_t row = best_cell / bw;
    int64_t col = best_cell % bw;
    const int64_t soft_bottom = (qs + bw - 1) - (row + col);

    uint32_t tmp[512];
    int n_ops = 0;
    int8_t prev_arrow = tb[row * bw + col];
    bool is_del = prev_arrow == (int8_t)CIG_D;
    bool is_ins = prev_arrow == (int8_t)CIG_I;
    row -= is_ins ? 0 : 1;
    col -= is_ins ? 1 : 0;
    col += is_del ? 1 : 0;
    uint32_t n = 1;
    while (table[row * bw + col] > 0) {
      const int8_t arrow = tb[row * bw + col];
      is_del = arrow == (int8_t)CIG_D;
      is_ins = arrow == (int8_t)CIG_I;
      row -= is_ins ? 0 : 1;
      col -= is_ins ? 1 : 0;
      col += is_del ? 1 : 0;
      if (arrow != prev_arrow) {
        tmp[n_ops++] = (n << 4) | (uint32_t)prev_arrow;
        n = 0;
      }
      ++n;
      prev_arrow = arrow;
    }
    tmp[n_ops++] = (n << 4) | (uint32_t)prev_arrow;
    const int64_t soft_top = (row + col) - (bw - 1);
    if (soft_top > 0)
      tmp[n_ops++] = ((uint32_t)soft_top << 4) | CIG_S;
    std::reverse(tmp, tmp + n_ops);
    if (soft_bottom > 0)
      tmp[n_ops++] = ((uint32_t)soft_bottom << 4) | CIG_S;
    std::memcpy(tb_cigar.ops, tmp, n_ops * sizeof(uint32_t));
    tb_cigar.n = n_ops;
    tb_len = qs - soft_bottom - soft_top;
    tb_pos = (t_pos - ((bw - 1) / 2)) + row;
  }

  // align.py build_cigar_len_and_pos wrapper semantics
  void cigar_len_pos(int32_t diffs, Cigar &out, int64_t &len, int64_t &pos,
                     int64_t t_pos) {
    if (diffs == 0 || !have_tb) {
      out.set_default(q_sz);
      len = q_sz;
      pos = t_pos;
      return;
    }
    out = tb_cigar;
    len = tb_len;
    pos = tb_pos;
  }
};

}  // namespace
