/* Minimal htslib/sam.h stand-in: just enough for abismal's SAM-text output
 * path.  Records are kept in a simple struct; formatting happens in the
 * bamxx shim. */
#ifndef SHIM_HTSLIB_SAM_H
#define SHIM_HTSLIB_SAM_H

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

typedef std::int64_t hts_pos_t;

#define BAM_FPAIRED 1
#define BAM_FPROPER_PAIR 2
#define BAM_FUNMAP 4
#define BAM_FMUNMAP 8
#define BAM_FREVERSE 16
#define BAM_FMREVERSE 32
#define BAM_FREAD1 64
#define BAM_FREAD2 128
#define BAM_FSECONDARY 256
#define BAM_FQCFAIL 512
#define BAM_FDUP 1024
#define BAM_FSUPPLEMENTARY 2048

#define BAM_CIGAR_SHIFT 4
#define BAM_CIGAR_STR "MIDNSHP=XB"

static inline std::uint32_t
bam_cigar_op(const std::uint32_t c) {
  return c & 0xf;
}
static inline std::uint32_t
bam_cigar_oplen(const std::uint32_t c) {
  return c >> BAM_CIGAR_SHIFT;
}
static inline int
bam_cigar_type(const std::uint32_t op) {
  // 2-bit consume flags per op (1 = query, 2 = ref) for "MIDNSHP=XB"
  static const int tbl[16] = {3, 1, 2, 2, 1, 0, 0, 3, 3, 0, 0, 0, 0, 0, 0, 0};
  return tbl[op & 0xf];
}

struct shim_aux_entry {
  char tag[2];
  char type;          // 'i' for integer, 'A' for char
  std::int64_t ival;
  char aval;
};

struct bam1_t {
  std::string qname;
  std::uint16_t flag{};
  std::int32_t tid{-1};
  hts_pos_t pos{-1};
  std::uint8_t mapq{};
  std::vector<std::uint32_t> cigar;
  std::int32_t mtid{-1};
  hts_pos_t mpos{-1};
  hts_pos_t isize{};
  std::string seq;   // nt16-normalized characters
  std::string qual;  // empty => '*'
  std::vector<shim_aux_entry> aux;
};

static inline bam1_t *
bam_init1() {
  return new bam1_t();
}

static inline void
bam_destroy1(bam1_t *b) {
  delete b;
}

static inline char
shim_nt16_normalize(const char c) {
  static const char *dec = "=ACMGRSVTWYHKDBN";
  static int enc[256];
  static bool init = false;
  if (!init) {
    for (int i = 0; i < 256; ++i)
      enc[i] = 15;
    const char *s = "=ACMGRSVTWYHKDBN";
    for (int i = 0; i < 16; ++i) {
      enc[static_cast<unsigned char>(s[i])] = i;
      enc[static_cast<unsigned char>(std::tolower(s[i]))] = i;
    }
    init = true;
  }
  return dec[enc[static_cast<unsigned char>(c)]];
}

static inline int
bam_set1(bam1_t *b, const std::size_t l_qname, const char *qname,
         const std::uint16_t flag, const std::int32_t tid, const hts_pos_t pos,
         const std::uint8_t mapq, const std::size_t n_cigar,
         const std::uint32_t *cigar, const std::int32_t mtid,
         const hts_pos_t mpos, const hts_pos_t isize, const std::size_t l_seq,
         const char *seq, const char *qual, const std::size_t /*l_aux*/) {
  b->qname.assign(qname, l_qname);
  b->flag = flag;
  b->tid = tid;
  b->pos = pos;
  b->mapq = mapq;
  b->cigar.assign(cigar, cigar + n_cigar);
  b->mtid = mtid;
  b->mpos = mpos;
  b->isize = isize;
  b->seq.resize(l_seq);
  for (std::size_t i = 0; i < l_seq; ++i)
    b->seq[i] = shim_nt16_normalize(seq[i]);
  if (qual)
    b->qual.assign(qual, l_seq);
  else
    b->qual.clear();
  b->aux.clear();
  return 0;
}

static inline int
bam_aux_update_int(bam1_t *b, const char tag[2], const std::int64_t val) {
  for (auto &a : b->aux)
    if (a.tag[0] == tag[0] && a.tag[1] == tag[1]) {
      a.ival = val;
      return 0;
    }
  shim_aux_entry e{};
  e.tag[0] = tag[0];
  e.tag[1] = tag[1];
  e.type = 'i';
  e.ival = val;
  b->aux.push_back(e);
  return 0;
}

static inline int
bam_aux_append(bam1_t *b, const char tag[2], const char type,
               const int /*len*/, const std::uint8_t *data) {
  shim_aux_entry e{};
  e.tag[0] = tag[0];
  e.tag[1] = tag[1];
  e.type = type;
  e.aval = static_cast<char>(data[0]);
  b->aux.push_back(e);
  return 0;
}

struct sam_hdr_t {
  std::string text;
  std::vector<std::string> target_names;  // parsed from @SQ SN:
};

static inline sam_hdr_t *
sam_hdr_init() {
  return new sam_hdr_t();
}

static inline void
sam_hdr_destroy(sam_hdr_t *h) {
  delete h;
}

static inline int
sam_hdr_add_lines(sam_hdr_t *h, const char *lines, const std::size_t len) {
  std::string text(lines, len == 0 ? std::strlen(lines) : len);
  h->text += text;
  // parse @SQ SN: names in order
  std::size_t p = 0;
  while (p < h->text.size()) {
    std::size_t e = h->text.find('\n', p);
    if (e == std::string::npos)
      e = h->text.size();
    const std::string line = h->text.substr(p, e - p);
    p = e + 1;
  }
  h->target_names.clear();
  p = 0;
  while (p < h->text.size()) {
    std::size_t e = h->text.find('\n', p);
    if (e == std::string::npos)
      e = h->text.size();
    const std::string line = h->text.substr(p, e - p);
    if (line.rfind("@SQ", 0) == 0) {
      const std::size_t sn = line.find("SN:");
      if (sn != std::string::npos) {
        std::size_t t = line.find('\t', sn);
        if (t == std::string::npos)
          t = line.size();
        h->target_names.push_back(line.substr(sn + 3, t - (sn + 3)));
      }
    }
    p = e + 1;
  }
  return 0;
}

#endif
