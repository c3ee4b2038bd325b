/* Minimal stand-in for smithlab_cpp/sam_record.hpp: only the samflags
 * namespace is needed by simreads.cpp. */
#ifndef SHIM_SAM_RECORD_HPP
#define SHIM_SAM_RECORD_HPP

#include <cstdint>

#ifndef SHIM_SAMFLAGS_DEFINED
#define SHIM_SAMFLAGS_DEFINED
namespace samflags {
static constexpr std::uint16_t read_paired = 0x1;
static constexpr std::uint16_t read_pair_mapped = 0x2;
static constexpr std::uint16_t read_unmapped = 0x4;
static constexpr std::uint16_t mate_unmapped = 0x8;
static constexpr std::uint16_t read_rc = 0x10;
static constexpr std::uint16_t mate_rc = 0x20;
static constexpr std::uint16_t template_first = 0x40;
static constexpr std::uint16_t template_last = 0x80;
static constexpr std::uint16_t secondary_aln = 0x100;
static constexpr std::uint16_t below_quality = 0x200;
static constexpr std::uint16_t pcr_duplicate = 0x400;
static constexpr std::uint16_t supplementary_aln = 0x800;

constexpr bool
check(const std::uint16_t to_check, const std::uint16_t &f) {
  return to_check & f;
}
constexpr void
set(std::uint16_t &to_set, const std::uint16_t f) {
  to_set |= f;
}
constexpr void
unset(std::uint16_t &to_unset, const std::uint16_t f) {
  to_unset &= ~f;
}
}  // namespace samflags
#endif

#include "smithlab_utils.hpp"

#endif
