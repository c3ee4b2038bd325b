/* Minimal bamxx stand-in: gz-capable line reader plus SAM-text writer. */
#ifndef SHIM_BAMXX_HPP
#define SHIM_BAMXX_HPP

#include "htslib/sam.h"

#include <zlib.h>

#include <cstdio>
#include <string>

namespace bamxx {

struct bgzf_file {
  bgzf_file(const std::string &fn, const char *mode) {
    f = gzopen(fn.c_str(), mode);
    ok = (f != nullptr);
  }
  ~bgzf_file() {
    if (f)
      gzclose(f);
  }
  bgzf_file(const bgzf_file &) = delete;
  bgzf_file &
  operator=(const bgzf_file &) = delete;

  operator bool() const { return ok; }

  std::size_t
  tellg() const {
    return f ? static_cast<std::size_t>(gzoffset(f)) : 0;
  }

  gzFile f{nullptr};
  bool ok{false};
};

inline bgzf_file &
getline(bgzf_file &in, std::string &line) {
  line.clear();
  if (!in.ok)
    return in;
  int c;
  bool any = false;
  while ((c = gzgetc(in.f)) != -1) {
    any = true;
    if (c == '\n')
      break;
    line.push_back(static_cast<char>(c));
  }
  if (!any)
    in.ok = false;
  return in;
}

struct bam_rec {
  bam1_t *b{nullptr};
};

struct bam_header {
  sam_hdr_t *h{nullptr};
  ~bam_header() {
    if (h)
      sam_hdr_destroy(h);
  }
};

struct bam_out {
  bam_out(const std::string &fn, const bool /*bam_fmt*/) {
    f = std::fopen(fn.c_str(), "w");
  }
  ~bam_out() {
    if (f)
      std::fclose(f);
  }
  bam_out(const bam_out &) = delete;
  bam_out &
  operator=(const bam_out &) = delete;

  operator bool() const { return f != nullptr; }

  bool
  write(const bam_header &hdr) {
    return std::fwrite(hdr.h->text.data(), 1, hdr.h->text.size(), f) ==
           hdr.h->text.size();
  }

  bool
  write(const bam_header &hdr, const bam_rec &r) {
    const bam1_t *b = r.b;
    std::string line;
    line.reserve(256);
    line += b->qname;
    line += '\t';
    line += std::to_string(b->flag);
    line += '\t';
    if (b->tid >= 0 &&
        b->tid < static_cast<std::int32_t>(hdr.h->target_names.size()))
      line += hdr.h->target_names[b->tid];
    else
      line += '*';
    line += '\t';
    line += std::to_string(b->pos + 1);
    line += '\t';
    line += std::to_string(static_cast<int>(b->mapq));
    line += '\t';
    if (b->cigar.empty())
      line += '*';
    else
      for (const auto c : b->cigar) {
        line += std::to_string(bam_cigar_oplen(c));
        line += BAM_CIGAR_STR[bam_cigar_op(c)];
      }
    line += '\t';
    if (b->mtid < 0)
      line += '*';
    else if (b->mtid == b->tid)
      line += '=';
    else if (b->mtid < static_cast<std::int32_t>(hdr.h->target_names.size()))
      line += hdr.h->target_names[b->mtid];
    else
      line += '*';
    line += '\t';
    line += std::to_string(b->mpos + 1);
    line += '\t';
    line += std::to_string(b->isize);
    line += '\t';
    line += b->seq.empty() ? "*" : b->seq;
    line += '\t';
    line += b->qual.empty() ? "*" : b->qual;
    for (const auto &a : b->aux) {
      line += '\t';
      line += a.tag[0];
      line += a.tag[1];
      line += ':';
      if (a.type == 'i') {
        line += "i:";
        line += std::to_string(a.ival);
      }
      else {
        line += a.type;
        line += ':';
        line += a.aval;
      }
    }
    line += '\n';
    return std::fwrite(line.data(), 1, line.size(), f) == line.size();
  }

  std::FILE *f{nullptr};
};

}  // namespace bamxx

#endif
