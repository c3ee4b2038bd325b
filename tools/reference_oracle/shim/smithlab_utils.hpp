/* Minimal stand-in for smithlab_cpp/smithlab_utils.hpp providing only the
 * symbols the abismal sources use.  Written from scratch for a local test
 * build of the reference; not part of the new framework. */
#ifndef SHIM_SMITHLAB_UTILS_HPP
#define SHIM_SMITHLAB_UTILS_HPP

#include <algorithm>
#include <string>

inline bool
valid_base(char c) {
  c = std::toupper(static_cast<unsigned char>(c));
  return c == 'A' || c == 'C' || c == 'G' || c == 'T';
}

inline char
complement_base(const char c) {
  switch (c) {
  case 'A': return 'T';
  case 'C': return 'G';
  case 'G': return 'C';
  case 'T': return 'A';
  case 'a': return 't';
  case 'c': return 'g';
  case 'g': return 'c';
  case 't': return 'a';
  default: return 'N';
  }
}

inline void
revcomp_inplace(std::string &s) {
  std::transform(s.begin(), s.end(), s.begin(), complement_base);
  std::reverse(s.begin(), s.end());
}

inline std::string
revcomp(const std::string &s) {
  std::string t(s);
  revcomp_inplace(t);
  return t;
}

#endif
