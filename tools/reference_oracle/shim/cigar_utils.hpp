/* Minimal stand-in for smithlab_cpp/cigar_utils.hpp with the functions used
 * by abismal's simreads.cpp.  CIGARs are strings like "12=1M3I".  */
#ifndef SHIM_CIGAR_UTILS_HPP
#define SHIM_CIGAR_UTILS_HPP

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <string>
#include <vector>

inline bool
cigar_op_consumes_query(const char op) {
  return op == 'M' || op == 'I' || op == 'S' || op == '=' || op == 'X';
}

inline bool
cigar_op_consumes_ref(const char op) {
  return op == 'M' || op == 'D' || op == 'N' || op == '=' || op == 'X';
}

inline std::vector<std::pair<std::uint32_t, char>>
parse_cigar_string(const std::string &cigar) {
  std::vector<std::pair<std::uint32_t, char>> ops;
  std::uint32_t n = 0;
  for (const char c : cigar) {
    if (std::isdigit(static_cast<unsigned char>(c)))
      n = n * 10 + static_cast<std::uint32_t>(c - '0');
    else {
      ops.emplace_back(n, c);
      n = 0;
    }
  }
  return ops;
}

inline std::string
unparse_cigar_ops(const std::vector<std::pair<std::uint32_t, char>> &ops) {
  std::string r;
  for (const auto &x : ops) {
    r += std::to_string(x.first);
    r += x.second;
  }
  return r;
}

inline std::uint32_t
cigar_rseq_ops(const std::string &cigar) {
  std::uint32_t r = 0;
  for (const auto &x : parse_cigar_string(cigar))
    if (cigar_op_consumes_ref(x.second))
      r += x.first;
  return r;
}

inline std::uint32_t
cigar_qseq_ops(const std::string &cigar) {
  std::uint32_t r = 0;
  for (const auto &x : parse_cigar_string(cigar))
    if (cigar_op_consumes_query(x.second))
      r += x.first;
  return r;
}

/* keep the prefix of the cigar consuming exactly n_ops query bases */
inline void
truncate_cigar_q(std::string &cigar, const std::uint32_t n_ops) {
  const auto ops = parse_cigar_string(cigar);
  std::vector<std::pair<std::uint32_t, char>> out;
  std::uint32_t q = 0;
  for (const auto &x : ops) {
    if (q >= n_ops)
      break;
    if (cigar_op_consumes_query(x.second)) {
      const std::uint32_t take = std::min(x.first, n_ops - q);
      q += take;
      if (take > 0)
        out.emplace_back(take, x.second);
      if (q >= n_ops)
        break;
    }
    else
      out.emplace_back(x.first, x.second);
  }
  cigar = unparse_cigar_ops(out);
}

inline void
reverse_cigar(std::string &cigar) {
  auto ops = parse_cigar_string(cigar);
  std::reverse(ops.begin(), ops.end());
  cigar = unparse_cigar_ops(ops);
}

/* iterator form operating on the characters of the cigar string in place:
 * reverse the sequence of (count, op) units within [first, last) */
inline void
reverse_cigar(std::string::iterator first, std::string::iterator last) {
  std::string s(first, last);
  reverse_cigar(s);
  std::copy(s.begin(), s.end(), first);
}

inline void
merge_equal_neighbor_cigar_ops(std::string &cigar) {
  const auto ops = parse_cigar_string(cigar);
  std::vector<std::pair<std::uint32_t, char>> out;
  for (const auto &x : ops) {
    if (!out.empty() && out.back().second == x.second)
      out.back().first += x.first;
    else
      out.push_back(x);
  }
  cigar = unparse_cigar_ops(out);
}

/* compress a per-base op string (e.g. "===M=II") to "3=1M1=2I", writing the
 * result into `out` (which the caller may have pre-sized) */
template <class It>
inline void
compress_cigar(It first, It last, std::string &out) {
  std::string r;
  It i = first;
  while (i != last) {
    It j = i;
    std::uint32_t n = 0;
    while (j != last && *j == *i) {
      ++j;
      ++n;
    }
    r += std::to_string(n);
    r += *i;
    i = j;
  }
  out = r;
}

#endif
