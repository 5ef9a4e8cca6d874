// velocity_asr_tpu native MP3 (MPEG-1/2/2.5 Layer III) decoder.
//
// From-scratch implementation of the ISO/IEC 11172-3 / 13818-3 Layer III
// decode algorithm (clause 2.4.3 + Annexes A/B): header + side-info
// parsing, bit reservoir, scalefactor decode (both MPEG-1 scfsi sharing
// and the MPEG-2 LSF partition scheme), Huffman decode of the big-value /
// count1 / rzero regions, requantization, MS + intensity stereo,
// short-block reordering, alias reduction, (I)MDCT with the four window
// types, and the polyphase synthesis filterbank.
//
// The standard's constant tables (Huffman codes B.7, scalefactor bands
// B.8, synthesis window B.3) come from native/mp3_tables.h, recovered
// from the system libmpg123 by tools/extract_mp3_tables.py; everything
// algorithmic here is written from the spec's decode description. Parity
// with the reference's torchaudio mp3 path (reference
// velocity_asr/audio.py:39-56) is covered by tests/test_mp3.py, which
// LAME-encodes fixtures and compares PCM bit-closely against libmpg123.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include "mp3_tables.h"

namespace {

constexpr int VA_OK = 0;
constexpr int VA_EFORMAT = -2;
constexpr int VA_ECORRUPT = -3;
constexpr int VA_EUNSUPPORTED = -4;

// ------------------------------------------------------------ bit reader

class Bits {
 public:
  Bits(const uint8_t* data, size_t size) : d_(data), n_(size * 8) {}
  // Absolute bit position (for part2_3_length accounting).
  size_t pos() const { return p_; }
  void seek(size_t bitpos) { p_ = bitpos; }
  bool ok() const { return p_ <= n_; }
  uint32_t get(int k) {
    // Fast path: a 32-bit window holds any read of k <= 25 bits
    // (bit offset <= 7) when 4 bytes are loadable.
    if (k <= 25 && (p_ >> 3) + 4 <= (n_ >> 3)) {
      size_t b = p_ >> 3;
      uint32_t w = (uint32_t(d_[b]) << 24) | (uint32_t(d_[b + 1]) << 16) |
                   (uint32_t(d_[b + 2]) << 8) | uint32_t(d_[b + 3]);
      uint32_t v = k ? (w << (p_ & 7)) >> (32 - k) : 0;
      p_ += k;
      return v;
    }
    uint32_t v = 0;
    while (k-- > 0) {
      if (p_ >= n_) {
        p_++;  // mark overrun; ok() turns false
        continue;
      }
      v = (v << 1) | ((d_[p_ >> 3] >> (7 - (p_ & 7))) & 1);
      p_++;
    }
    return v;
  }
  uint32_t get1() {
    if (p_ >= n_) {
      p_++;
      return 0;
    }
    uint32_t v = (d_[p_ >> 3] >> (7 - (p_ & 7))) & 1;
    p_++;
    return v;
  }
  // 16-bit lookahead (zero-padded past the end) + explicit consume, for
  // register-walk Huffman decode.
  uint32_t peek16() const {
    size_t b = p_ >> 3;
    size_t nbytes = n_ >> 3;
    uint32_t w = 0;
    if (b + 3 <= nbytes) {
      w = (uint32_t(d_[b]) << 16) | (uint32_t(d_[b + 1]) << 8) |
          uint32_t(d_[b + 2]);
    } else {
      for (int i = 0; i < 3; ++i)
        w = (w << 8) | (b + i < nbytes ? d_[b + i] : 0);
    }
    return (w >> (8 - (p_ & 7))) & 0xFFFF;
  }
  void skip(int k) { p_ += k; }

 private:
  const uint8_t* d_;
  size_t n_;
  size_t p_ = 0;
};

// ------------------------------------------------------- huffman tables

// Binary trie built once per table from the canonical (code, len) lists.
struct HuffTree {
  // node*2 + bit indexes `next`; value < 0 encodes leaf as -(entry+1),
  // value 0 means unassigned, value > 0 is the child node index.
  std::vector<int32_t> next;
  const mp3tab::HuffEntry* entries;

  void build(const mp3tab::HuffTable& t) {
    entries = t.e;
    next.assign(2, 0);
    for (int i = 0; i < t.n; ++i) {
      uint32_t code = t.e[i].code;
      int len = t.e[i].len;
      int node = 0;
      for (int b = len - 1; b >= 0; --b) {
        int bit = (code >> b) & 1;
        size_t at = node * 2 + bit;
        if (b == 0) {
          next[at] = -(i + 1);
        } else {
          if (next[at] == 0) {
            int32_t child = static_cast<int32_t>(next.size() / 2);
            next.push_back(0);
            next.push_back(0);
            next[at] = child;  // index after push_back: no stale refs
          }
          node = next[at];
        }
      }
    }
  }

  // Returns entry index or -1 on invalid code / exhausted stream.
  // Walks the trie from a 16-bit lookahead register (codes are <= 19
  // bits, so at most one refill) instead of one get1() call per bit.
  int decode(Bits* br) const {
    uint32_t w = br->peek16();
    int used = 0;
    int node = 0;
    for (int guard = 0; guard < 24; ++guard) {
      if (used == 16) {
        br->skip(16);
        if (!br->ok()) return -1;
        w = br->peek16();
        used = 0;
      }
      int bit = (w >> (15 - used)) & 1;
      ++used;
      int32_t slot = next[node * 2 + bit];
      if (slot < 0) {
        br->skip(used);
        return br->ok() ? -slot - 1 : -1;
      }
      if (slot == 0) return -1;
      node = slot;
    }
    return -1;
  }
};

const HuffTree* huff_trees() {
  static HuffTree trees[34];
  static bool built = [] {
    for (int i = 0; i < 32; ++i)
      if (mp3tab::kTables[i].n) trees[i].build(mp3tab::kTables[i]);
    trees[32].build(mp3tab::kCount1[0]);
    trees[33].build(mp3tab::kCount1[1]);
    return true;
  }();
  (void)built;
  return trees;
}

// ------------------------------------------------------- constant tables

// Layer III bitrates in kbit/s (ISO 11172-3 Table B.2 / 13818-3).
const int kBitrateV1[16] = {0,  32,  40,  48,  56,  64,  80,  96,
                            112, 128, 160, 192, 224, 256, 320, -1};
const int kBitrateV2[16] = {0,  8,  16, 24, 32,  40,  48,  56,
                            64, 80, 96, 112, 128, 144, 160, -1};
const int kSampleRate[3][3] = {
    {44100, 48000, 32000},  // MPEG-1
    {22050, 24000, 16000},  // MPEG-2
    {11025, 12000, 8000},   // MPEG-2.5
};

// Scalefactor bit allocation, MPEG-1 (Table B.6: scalefac_compress).
const int kSlen1[16] = {0, 0, 0, 0, 3, 1, 1, 1, 2, 2, 2, 3, 3, 3, 4, 4};
const int kSlen2[16] = {0, 1, 2, 3, 0, 1, 2, 3, 1, 2, 3, 1, 2, 3, 2, 3};

// Preemphasis per long scalefactor band (Table B.6 pretab).
const int kPretab[22] = {0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                         1, 1, 1, 1, 2, 2, 3, 3, 3, 2, 0};

// LSF scalefactor partition sizes (ISO 13818-3 2.4.3.2), indexed by
// [block derived from scalefac_compress][0 long / 1 short / 2 mixed][4].
const uint8_t kLsfSfbBlock[6][3][4] = {
    {{6, 5, 5, 5}, {9, 9, 9, 9}, {6, 9, 9, 9}},
    {{6, 5, 7, 3}, {9, 9, 12, 6}, {6, 9, 12, 6}},
    {{11, 10, 0, 0}, {18, 18, 0, 0}, {15, 18, 0, 0}},
    {{7, 7, 7, 0}, {12, 12, 12, 0}, {6, 15, 12, 0}},
    {{6, 6, 6, 3}, {12, 9, 9, 6}, {6, 12, 9, 6}},
    {{8, 8, 5, 0}, {15, 12, 9, 0}, {6, 18, 9, 0}},
};

// Alias-reduction butterflies from the spec's ci coefficients.
struct AliasTabs {
  double cs[8], ca[8];
  AliasTabs() {
    const double ci[8] = {-0.6,    -0.535,  -0.33,   -0.185,
                          -0.095,  -0.041,  -0.0142, -0.0037};
    for (int i = 0; i < 8; ++i) {
      double sq = std::sqrt(1.0 + ci[i] * ci[i]);
      cs[i] = 1.0 / sq;
      ca[i] = ci[i] / sq;
    }
  }
};

// IMDCT basis + block windows + synthesis DCT matrix, computed from the
// spec formulas at first use.
struct CosTabs {
  double imdct12[12][6];
  double win[4][36];     // block types 0..3 (type 2 slot holds the
                         // 12-point short window in win[2][0..11])
  // Lee fast-DCT butterfly coefficients: halfsec[l][k] =
  // 1/(2 cos((2k+1)pi/(2N))) at recursion level l (N = 32 >> l).
  double halfsec[5][16];
  // 36-point IMDCT via the DCT-IV factorization on a 9-point FFT
  // (same derivation as the Vorbis decoder's IMDCT; verified exact
  // against the direct cosine sum): pre/post twiddles and the 9th
  // roots of unity.
  double pre9_re[9], pre9_im[9];    // e^{-i pi (m+0.25)/18}
  double post9_re[9], post9_im[9];  // e^{-i pi s/18}
  double w9_re[9], w9_im[9];        // e^{-2 pi i j/9}
  double pow2_q[128];    // 2^(-q/4) for requant gains, q = 0..127
  AliasTabs alias;

  CosTabs() {
    for (int i = 0; i < 12; ++i)
      for (int k = 0; k < 6; ++k)
        imdct12[i][k] = std::cos(M_PI / 24.0 * (2 * i + 1 + 6) * (2 * k + 1));
    for (int i = 0; i < 36; ++i) win[0][i] = std::sin(M_PI / 36 * (i + 0.5));
    for (int i = 0; i < 36; ++i) {
      if (i < 18)
        win[1][i] = std::sin(M_PI / 36 * (i + 0.5));
      else if (i < 24)
        win[1][i] = 1.0;
      else if (i < 30)
        win[1][i] = std::sin(M_PI / 12 * (i - 18 + 0.5));
      else
        win[1][i] = 0.0;
      win[3][35 - i] = win[1][i];
    }
    for (int i = 0; i < 12; ++i) win[2][i] = std::sin(M_PI / 12 * (i + 0.5));
    for (int l = 0, N = 32; N >= 2; ++l, N >>= 1)
      for (int k = 0; k < N / 2; ++k)
        halfsec[l][k] = 1.0 / (2.0 * std::cos((2 * k + 1) * M_PI / (2 * N)));
    for (int m = 0; m < 9; ++m) {
      pre9_re[m] = std::cos(M_PI * (m + 0.25) / 18.0);
      pre9_im[m] = -std::sin(M_PI * (m + 0.25) / 18.0);
      post9_re[m] = std::cos(M_PI * m / 18.0);
      post9_im[m] = -std::sin(M_PI * m / 18.0);
      w9_re[m] = std::cos(2.0 * M_PI * m / 9.0);
      w9_im[m] = -std::sin(2.0 * M_PI * m / 9.0);
    }
    for (int q = 0; q < 128; ++q) pow2_q[q] = std::pow(2.0, -q / 4.0);
  }
};

const CosTabs& tabs() {
  static CosTabs t;
  return t;
}

double pow43(int v) {
  static const std::vector<double> lut = [] {
    std::vector<double> t(256);
    for (int i = 0; i < 256; ++i) t[i] = std::pow(i, 4.0 / 3.0);
    return t;
  }();
  return v < 256 ? lut[v] : std::pow(v, 4.0 / 3.0);
}

// ------------------------------------------------------------ structures

struct FrameHeader {
  int version;      // 0 = MPEG-1, 1 = MPEG-2, 2 = MPEG-2.5
  int sr_index;     // 0..2 within version
  int sample_rate;
  int bitrate;      // kbit/s
  int channels;     // 1 | 2
  int mode;         // 0 stereo 1 joint 2 dual 3 mono
  int mode_ext;
  bool crc;
  int padding;
  int frame_bytes;  // total including the 4 header bytes
  int sfb_table;    // row into kSfbLong / kSfbShort
};

struct Granule {
  int part2_3_length;
  int big_values;
  int global_gain;
  int scalefac_compress;
  bool window_switching;
  int block_type;
  bool mixed_block;
  int table_select[3];
  int subblock_gain[3];
  int region0_count;
  int region1_count;
  bool preflag;
  int scalefac_scale;
  int count1table_select;
};

struct Scalefacs {
  int l[23];     // long bands
  int s[13][3];  // short bands x window
};

// Per-channel persistent filterbank state.
struct ChannelState {
  double overlap[32][18] = {{0}};
  // Synthesis ring buffer with the first 32 slots mirrored past the end
  // so windowing reads of (base + j), j < 32, never need a modulo.
  double v[1024 + 32] = {0};
  int v_pos = 0;  // rotating write offset, multiples of 64

  void set_v(int idx, double val) {
    v[idx] = val;
    if (idx < 32) v[1024 + idx] = val;
  }
};

// --------------------------------------------------------- header parse

// Returns true and fills h if the 4 bytes at p form a valid Layer III
// frame header.
bool ParseHeader(const uint8_t* p, FrameHeader* h) {
  if (p[0] != 0xFF || (p[1] & 0xE0) != 0xE0) return false;
  int version_bits = (p[1] >> 3) & 3;  // 0:2.5 1:resv 2:MPEG2 3:MPEG1
  int layer_bits = (p[1] >> 1) & 3;    // 1 = Layer III
  if (version_bits == 1 || layer_bits != 1) return false;
  h->version = version_bits == 3 ? 0 : (version_bits == 2 ? 1 : 2);
  h->crc = ((p[1] & 1) == 0);
  int bitrate_index = p[2] >> 4;
  h->sr_index = (p[2] >> 2) & 3;
  if (bitrate_index == 0 || bitrate_index == 15 || h->sr_index == 3)
    return false;  // free-format unsupported
  h->bitrate = (h->version == 0 ? kBitrateV1 : kBitrateV2)[bitrate_index];
  h->sample_rate = kSampleRate[h->version][h->sr_index];
  h->padding = (p[2] >> 1) & 1;
  h->mode = p[3] >> 6;
  h->mode_ext = (p[3] >> 4) & 3;
  h->channels = h->mode == 3 ? 1 : 2;
  // 1152 samples/frame (MPEG-1) = 144 bytes-per-kbit; LSF halves it.
  int coef = h->version == 0 ? 144000 : 72000;
  h->frame_bytes = coef * h->bitrate / h->sample_rate + h->padding;
  h->sfb_table = h->version * 3 + h->sr_index;
  return h->frame_bytes > 4;
}

// ------------------------------------------------------------ side info

bool ReadSideInfo(Bits* br, const FrameHeader& h, int* main_data_begin,
                  int scfsi[2][4], Granule gr[2][2]) {
  int ngr = h.version == 0 ? 2 : 1;
  *main_data_begin = br->get(h.version == 0 ? 9 : 8);
  br->get(h.version == 0 ? (h.channels == 1 ? 5 : 3)
                         : (h.channels == 1 ? 1 : 2));  // private_bits
  if (h.version == 0) {
    for (int ch = 0; ch < h.channels; ++ch)
      for (int b = 0; b < 4; ++b) scfsi[ch][b] = br->get1();
  } else {
    memset(scfsi, 0, sizeof(int) * 8);
  }
  for (int g = 0; g < ngr; ++g) {
    for (int ch = 0; ch < h.channels; ++ch) {
      Granule* q = &gr[g][ch];
      q->part2_3_length = br->get(12);
      q->big_values = br->get(9);
      q->global_gain = br->get(8);
      q->scalefac_compress = br->get(h.version == 0 ? 4 : 9);
      q->window_switching = br->get1();
      if (q->window_switching) {
        q->block_type = br->get(2);
        q->mixed_block = br->get1();
        q->table_select[0] = br->get(5);
        q->table_select[1] = br->get(5);
        q->table_select[2] = 0;
        for (int w = 0; w < 3; ++w) q->subblock_gain[w] = br->get(3);
        if (q->block_type == 0) return false;  // forbidden
        // Implied region split (spec 2.4.2.7): region0 ends at the
        // boundary covering 36 lines; region1 runs to the end.
        q->region0_count = (q->block_type == 2 && !q->mixed_block) ? 8 : 7;
        q->region1_count = 20 - q->region0_count;
      } else {
        q->block_type = 0;
        q->mixed_block = false;
        for (int r = 0; r < 3; ++r) q->table_select[r] = br->get(5);
        for (int w = 0; w < 3; ++w) q->subblock_gain[w] = 0;
        q->region0_count = br->get(4);
        q->region1_count = br->get(3);
      }
      if (h.version == 0) {
        q->preflag = br->get1();
      } else {
        q->preflag = false;  // LSF: derived from scalefac_compress
      }
      q->scalefac_scale = br->get1();
      q->count1table_select = br->get1();
      if (q->big_values > 288) return false;
    }
  }
  return br->ok();
}

// --------------------------------------------------------- scalefactors

// MPEG-1 scalefactor read with scfsi sharing (spec 2.4.2.7/2.4.3.4).
void ReadScalefacsV1(Bits* br, const Granule& q, const int scfsi[4],
                     int granule, Scalefacs* sf) {
  int slen1 = kSlen1[q.scalefac_compress];
  int slen2 = kSlen2[q.scalefac_compress];
  if (q.window_switching && q.block_type == 2) {
    if (q.mixed_block) {
      for (int b = 0; b < 8; ++b) sf->l[b] = br->get(slen1);
      for (int b = 3; b < 6; ++b)
        for (int w = 0; w < 3; ++w) sf->s[b][w] = br->get(slen1);
    } else {
      for (int b = 0; b < 6; ++b)
        for (int w = 0; w < 3; ++w) sf->s[b][w] = br->get(slen1);
    }
    for (int b = 6; b < 12; ++b)
      for (int w = 0; w < 3; ++w) sf->s[b][w] = br->get(slen2);
    for (int w = 0; w < 3; ++w) sf->s[12][w] = 0;
  } else {
    // scfsi groups: bands 0-5, 6-10, 11-15, 16-20.
    static const int kGroup[5] = {0, 6, 11, 16, 21};
    for (int g = 0; g < 4; ++g) {
      int slen = g < 2 ? slen1 : slen2;
      if (granule == 1 && scfsi[g]) continue;  // keep granule-0 values
      for (int b = kGroup[g]; b < kGroup[g + 1]; ++b)
        sf->l[b] = br->get(slen);
    }
    sf->l[21] = sf->l[22] = 0;
  }
}

// MPEG-2/2.5 LSF scalefactor read (ISO 13818-3 2.4.3.2). `intensity`
// marks the right channel of an intensity-coded joint-stereo frame.
void ReadScalefacsLsf(Bits* br, Granule* q, bool intensity, Scalefacs* sf,
                      int* intensity_illegal) {
  int sc = q->scalefac_compress;
  int slen[4], block;
  if (!intensity) {
    if (sc < 400) {
      slen[0] = (sc >> 4) / 5;
      slen[1] = (sc >> 4) % 5;
      slen[2] = (sc & 15) >> 2;
      slen[3] = sc & 3;
      block = 0;
    } else if (sc < 500) {
      sc -= 400;
      slen[0] = (sc >> 2) / 5;
      slen[1] = (sc >> 2) % 5;
      slen[2] = sc & 3;
      slen[3] = 0;
      block = 1;
    } else {
      sc -= 500;
      slen[0] = sc / 3;
      slen[1] = sc % 3;
      slen[2] = slen[3] = 0;
      block = 2;
      q->preflag = true;
    }
  } else {
    int isc = sc >> 1;
    if (isc < 180) {
      slen[0] = isc / 36;
      slen[1] = (isc % 36) / 6;
      slen[2] = isc % 6;
      slen[3] = 0;
      block = 3;
    } else if (isc < 244) {
      isc -= 180;
      slen[0] = (isc % 64) >> 4;
      slen[1] = (isc % 16) >> 2;
      slen[2] = isc % 4;
      slen[3] = 0;
      block = 4;
    } else {
      isc -= 244;
      slen[0] = isc / 3;
      slen[1] = isc % 3;
      slen[2] = slen[3] = 0;
      block = 5;
    }
  }
  int cls = q->block_type == 2 ? (q->mixed_block ? 2 : 1) : 0;
  const uint8_t* nr = kLsfSfbBlock[block][cls];
  int vals[40];
  int n = 0;
  for (int part = 0; part < 4; ++part)
    for (int i = 0; i < nr[part]; ++i) {
      vals[n] = br->get(slen[part]);
      // In intensity mode, the all-ones value marks "illegal position".
      if (intensity && intensity_illegal && vals[n] == (1 << slen[part]) - 1)
        vals[n] = *intensity_illegal;  // sentinel (stays distinguishable)
      n++;
    }
  while (n < 40) vals[n++] = 0;
  n = 0;
  if (q->block_type == 2) {
    if (q->mixed_block)
      for (int b = 0; b < 6; ++b) sf->l[b] = vals[n++];
    int first = q->mixed_block ? 3 : 0;
    for (int b = first; b < 13; ++b)
      for (int w = 0; w < 3; ++w) sf->s[b][w] = b < 12 ? vals[n++] : 0;
  } else {
    for (int b = 0; b < 21; ++b) sf->l[b] = vals[n++];
    sf->l[21] = sf->l[22] = 0;
  }
}

// Part-2 (scalefactor) bit counts so huffman decoding knows its budget is
// measured implicitly via bit positions; nothing to compute here.

// ------------------------------------------------------ huffman regions

// Decodes the spectral values of one granule/channel into is[576].
// `part2_start` is the absolute bit position where part2 (scalefactors)
// began; huffman data ends at part2_start + part2_3_length.
bool ReadHuffman(Bits* br, const FrameHeader& h, const Granule& q,
                 size_t part2_start, int is[576]) {
  memset(is, 0, 576 * sizeof(int));
  size_t end = part2_start + q.part2_3_length;
  const uint16_t* sfb_l = mp3tab::kSfbLong[h.sfb_table];

  int region1, region2;
  if (q.window_switching) {
    // Implicit region split: 36 lines for MPEG-1 and all short blocks;
    // LSF start/stop (long) blocks use 54 (their sfbLong[8] boundary).
    region1 = (h.version != 0 && q.block_type != 2) ? 54 : 36;
    region2 = 576;
  } else {
    region1 = sfb_l[q.region0_count + 1 < 23 ? q.region0_count + 1 : 22];
    int r2idx = q.region0_count + 1 + q.region1_count + 1;
    region2 = sfb_l[r2idx < 23 ? r2idx : 22];
  }

  const HuffTree* trees = huff_trees();
  int pos = 0;
  int bv = q.big_values * 2;
  if (bv > 576) return false;
  while (pos < bv) {
    int region = pos < region1 ? 0 : (pos < region2 ? 1 : 2);
    int tbl = q.table_select[region];
    if (mp3tab::kTables[tbl].n == 0) {
      // Table 0 (or 4/14): all zeros, no bits.
      is[pos++] = 0;
      is[pos++] = 0;
      continue;
    }
    int e = trees[tbl].decode(br);
    if (e < 0 || br->pos() > end) return false;
    int x = mp3tab::kTables[tbl].e[e].x;
    int y = mp3tab::kTables[tbl].e[e].y;
    int linbits = mp3tab::kTables[tbl].linbits;
    if (x == 15 && linbits) x += br->get(linbits);
    if (x) x = br->get1() ? -x : x;
    if (y == 15 && linbits) y += br->get(linbits);
    if (y) y = br->get1() ? -y : y;
    is[pos++] = x;
    is[pos++] = y;
  }

  // count1 region: quadruples until the bit budget runs out.
  const HuffTree& c1 = trees[32 + q.count1table_select];
  while (br->pos() < end && pos <= 572) {
    int e = c1.decode(br);
    if (e < 0) return false;
    int quad = mp3tab::kCount1[q.count1table_select].e[e].x;  // packed v..y
    int v[4] = {(quad >> 3) & 1, (quad >> 2) & 1, (quad >> 1) & 1, quad & 1};
    for (int i = 0; i < 4; ++i) {
      int s = v[i];
      if (s) s = br->get1() ? -1 : 1;
      is[pos++] = s;
    }
    if (br->pos() > end) {
      // Overrun: the last quadruple was stuffing — drop it.
      pos -= 4;
      for (int i = 0; i < 4; ++i) is[pos + i] = 0;
      break;
    }
  }
  br->seek(end);
  return true;
}

// -------------------------------------------------------- requantization

void Requantize(const FrameHeader& h, const Granule& q, const Scalefacs& sf,
                const int is[576], double xr[576]) {
  const CosTabs& t = tabs();
  const uint16_t* sfb_l = mp3tab::kSfbLong[h.sfb_table];
  const uint16_t* sfb_s = mp3tab::kSfbShort[h.sfb_table];
  double scale_mult = q.scalefac_scale ? 1.0 : 0.5;

  auto gain = [&](int extra_q) {
    // 2^(0.25 * (global_gain - 210)) with band/window adjustments folded
    // into extra quarter-steps (gain = 2^(-qq/4)).
    int qq = 210 - q.global_gain + extra_q;
    if (qq >= 0 && qq < 128) return t.pow2_q[qq];
    return std::pow(2.0, -qq / 4.0);
  };

  if (q.block_type == 2) {
    int long_end = q.mixed_block ? 36 : 0;
    // Long (mixed) prefix uses long bands 0..7.
    int band = 0;
    for (int i = 0; i < long_end; ++i) {
      while (i >= sfb_l[band + 1]) band++;
      int sc = sf.l[band] + (q.preflag ? kPretab[band] : 0);
      double g = gain(static_cast<int>(4 * scale_mult * sc));
      double v = pow43(std::abs(is[i])) * g;
      xr[i] = is[i] < 0 ? -v : v;
    }
    // Short bands: samples arrive interleaved per band as
    // [band b: win0 x width, win1 x width, win2 x width]. kSfbShort
    // boundaries are cumulative over all three windows, so the
    // per-window width is a third of the band span.
    int sband = q.mixed_block ? 3 : 0;
    int i = long_end;
    for (int b = sband; b < 13 && i < 576; ++b) {
      int width = (sfb_s[b + 1] - sfb_s[b]) / 3;
      for (int w = 0; w < 3; ++w) {
        int sc = b < 12 ? sf.s[b][w] : 0;
        double g = gain(static_cast<int>(8 * q.subblock_gain[w] +
                                         4 * scale_mult * sc));
        for (int k = 0; k < width && i < 576; ++k, ++i) {
          double v = pow43(std::abs(is[i])) * g;
          xr[i] = is[i] < 0 ? -v : v;
        }
      }
    }
    for (; i < 576; ++i) xr[i] = 0;
  } else {
    int band = 0;
    for (int i = 0; i < 576; ++i) {
      while (band < 22 && i >= sfb_l[band + 1]) band++;
      int sc = sf.l[band] + (q.preflag ? kPretab[band] : 0);
      double g = gain(static_cast<int>(4 * scale_mult * sc));
      double v = pow43(std::abs(is[i])) * g;
      xr[i] = is[i] < 0 ? -v : v;
    }
  }
}

// --------------------------------------------------------------- stereo

// Finds the start of the right channel's zero tail (in spectral lines).
int RightZeroStart(const double xr[576]) {
  for (int i = 575; i >= 0; --i)
    if (xr[i] != 0.0) return i + 1;
  return 0;
}

void StereoProcess(const FrameHeader& h, const Granule& qr,
                   const Scalefacs& sfr, double xl[576], double xr[576]) {
  bool ms = h.mode == 1 && (h.mode_ext & 2);
  bool intensity = h.mode == 1 && (h.mode_ext & 1);
  const double inv_sqrt2 = 0.7071067811865476;

  int izero = intensity ? RightZeroStart(xr) : 576;

  if (ms) {
    for (int i = 0; i < izero; ++i) {
      double m = xl[i], s = xr[i];
      xl[i] = (m + s) * inv_sqrt2;
      xr[i] = (m - s) * inv_sqrt2;
    }
  }

  if (!intensity) return;

  // Intensity stereo over the right channel's zero region: the left
  // channel carries the summed signal; is_pos (the right channel's
  // scalefactors) codes the panning angle (MPEG-1: tan(is_pos*pi/12)).
  const uint16_t* sfb_l = mp3tab::kSfbLong[h.sfb_table];
  const uint16_t* sfb_s = mp3tab::kSfbShort[h.sfb_table];

  auto apply = [&](int start, int width, int is_pos, int illegal) {
    if (is_pos == illegal) {
      // Spec 2.4.3.4.9.3: illegal position -> no intensity processing;
      // if ms_stereo is also set the band is decoded as M/S instead
      // (the region above izero was skipped by the MS pass above).
      if (ms) {
        for (int i = start; i < start + width && i < 576; ++i) {
          double m = xl[i], s = xr[i];
          xl[i] = (m + s) * inv_sqrt2;
          xr[i] = (m - s) * inv_sqrt2;
        }
      }
      return;
    }
    double l_fac, r_fac;
    if (h.version == 0) {
      double ratio = std::tan(is_pos * M_PI / 12.0);
      l_fac = ratio / (1.0 + ratio);
      r_fac = 1.0 / (1.0 + ratio);
    } else {
      // LSF: k0/k1 from io^((is_pos+1)/2) (13818-3 2.4.3.2).
      double io = (qr.scalefac_compress & 1) ? 0.7071067811865476
                                             : 0.8408964152537145;
      if (is_pos == 0) {
        l_fac = r_fac = 1.0;
      } else if (is_pos & 1) {
        l_fac = std::pow(io, (is_pos + 1) / 2);
        r_fac = 1.0;
      } else {
        l_fac = 1.0;
        r_fac = std::pow(io, is_pos / 2);
      }
    }
    for (int i = start; i < start + width && i < 576; ++i) {
      double v = xl[i];
      xl[i] = v * l_fac;
      xr[i] = v * r_fac;
    }
  };

  if (qr.block_type == 2) {
    // Short blocks: per band/window in decoded (pre-reorder) order.
    // Conservative: apply from the first band fully above izero.
    for (int b = 0; b < 12; ++b) {
      int width = (sfb_s[b + 1] - sfb_s[b]) / 3;
      for (int w = 0; w < 3; ++w) {
        int start = sfb_s[b] + w * width;
        if (start >= izero)
          apply(start, width, sfr.s[b][w], h.version == 0 ? 7 : -1);
      }
    }
  } else {
    for (int b = 0; b < 22; ++b) {
      int start = sfb_l[b];
      if (start >= izero)
        apply(start, sfb_l[b + 1] - start, sfr.l[b],
              h.version == 0 ? 7 : -1);
    }
  }
}

// ----------------------------------------------- reorder + alias + imdct

// Short-block spectral reorder: decoded band-interleaved order ->
// subband chunks of 18 with the three windows interleaved per point
// (j = point*3 + window), which is the order Imdct() consumes.
void ReorderShort(const FrameHeader& h, const Granule& q, double xr[576]) {
  if (q.block_type != 2) return;
  const uint16_t* sfb_s = mp3tab::kSfbShort[h.sfb_table];
  double tmp[576];
  memcpy(tmp, xr, sizeof(tmp));
  int start_band = q.mixed_block ? 3 : 0;
  for (int b = start_band; b < 13; ++b) {
    int s = sfb_s[b];  // cumulative over all three windows
    int width = (sfb_s[b + 1] - sfb_s[b]) / 3;
    for (int w = 0; w < 3; ++w)
      for (int k = 0; k < width; ++k) {
        int src = s + w * width + k;
        int dst = s + k * 3 + w;
        if (src < 576 && dst < 576) xr[dst] = tmp[src];
      }
  }
}

void AliasReduce(const Granule& q, double xr[576]) {
  if (q.block_type == 2 && !q.mixed_block) return;
  const CosTabs& t = tabs();
  int nb = (q.block_type == 2 && q.mixed_block) ? 1 : 31;
  for (int sb = 0; sb < nb; ++sb)
    for (int i = 0; i < 8; ++i) {
      int a = sb * 18 + 17 - i;
      int b = sb * 18 + 18 + i;
      double va = xr[a], vb = xr[b];
      xr[a] = va * t.alias.cs[i] - vb * t.alias.ca[i];
      xr[b] = vb * t.alias.cs[i] + va * t.alias.ca[i];
    }
}

// 36-point (long) or 3x12-point (short) IMDCT of one subband with
// windowing and overlap-add into the channel state. `sb` is the subband
// index; on return out[0..17] holds the time samples for this granule.
// 36-point IMDCT: y[i] = sum_{k<18} x[k] cos(pi/72 (2i+19)(2k+1)) — the
// standard IMDCT at n=36 — computed through the DCT-IV on a 9-point FFT
// (pre-twiddle, radix-3 FFT, post-twiddle, symmetry extension); ~4x
// fewer multiplies than the direct 36x18 sum, exact to ~2e-14.
void Imdct36Fast(const double in[18], double out[36], const CosTabs& t) {
  // Pre-twiddle: v[m] = (in[2m] + i in[17-2m]) * e^{-i pi (m+0.25)/18}.
  double vr[9], vi[9];
  for (int m = 0; m < 9; ++m) {
    double a = in[2 * m], b = in[17 - 2 * m];
    vr[m] = a * t.pre9_re[m] - b * t.pre9_im[m];
    vi[m] = a * t.pre9_im[m] + b * t.pre9_re[m];
  }
  // 9-point FFT (kernel e^{-2pi i sm/9}) as 3x3: three strided 3-point
  // DFTs, then a twiddled 3-point combine.
  constexpr double kSin60 = 0.86602540378443864676;
  double gr[3][3], gi[3][3];  // G_r[k], r = input residue, k in [0,3)
  for (int r = 0; r < 3; ++r) {
    double ar = vr[r], ai = vi[r];
    double br = vr[r + 3], bi = vi[r + 3];
    double cr = vr[r + 6], ci = vi[r + 6];
    double tr = br + cr, ti = bi + ci;
    gr[r][0] = ar + tr;
    gi[r][0] = ai + ti;
    double mr = ar - 0.5 * tr, mi = ai - 0.5 * ti;
    double sr = kSin60 * (bi - ci), si = kSin60 * (cr - br);
    gr[r][1] = mr + sr;
    gi[r][1] = mi + si;
    gr[r][2] = mr - sr;
    gi[r][2] = mi - si;
  }
  double Cv[18];
  for (int k = 0; k < 9; ++k) {
    int k3 = k % 3;
    int e1 = k;                // w9^{k}
    int e2 = (2 * k) % 9;      // w9^{2k}
    double xr = gr[0][k3] + gr[1][k3] * t.w9_re[e1] - gi[1][k3] * t.w9_im[e1] +
                gr[2][k3] * t.w9_re[e2] - gi[2][k3] * t.w9_im[e2];
    double xi = gi[0][k3] + gr[1][k3] * t.w9_im[e1] + gi[1][k3] * t.w9_re[e1] +
                gr[2][k3] * t.w9_im[e2] + gi[2][k3] * t.w9_re[e2];
    // Post-twiddle into the DCT-IV of the 18 inputs.
    double r = xr * t.post9_re[k] - xi * t.post9_im[k];
    double i = xr * t.post9_im[k] + xi * t.post9_re[k];
    Cv[2 * k] = r;
    Cv[17 - 2 * k] = -i;
  }
  // IMDCT symmetry extension (M = 18, half = 9).
  for (int j = 0; j < 9; ++j) out[j] = Cv[9 + j];
  for (int j = 0; j < 18; ++j) out[9 + j] = -Cv[17 - j];
  for (int j = 0; j < 9; ++j) out[27 + j] = -Cv[j];
}

void Imdct(const Granule& q, int sb, const double xr18[18], double prev[18],
           double out[18]) {
  const CosTabs& t = tabs();
  int bt = q.block_type;
  if (q.mixed_block && sb < 2) bt = 0;
  double x[36] = {0};
  if (bt == 2) {
    for (int w = 0; w < 3; ++w) {
      double y[12];
      for (int i = 0; i < 12; ++i) {
        double acc = 0;
        for (int k = 0; k < 6; ++k) acc += xr18[w + 3 * k] * t.imdct12[i][k];
        y[i] = acc * t.win[2][i];
      }
      for (int i = 0; i < 12; ++i) x[6 + 6 * w + i] += y[i];
    }
  } else {
    double raw[36];
    Imdct36Fast(xr18, raw, t);
    for (int i = 0; i < 36; ++i) x[i] = raw[i] * t.win[bt][i];
  }
  for (int i = 0; i < 18; ++i) {
    out[i] = x[i] + prev[i];
    prev[i] = x[18 + i];
  }
}

// ---------------------------------------------------- synthesis filter

// Unnormalized DCT-II via Lee's even/odd recursion:
//   out[t] = sum_k in[k] cos(t(2k+1)pi/(2N)),  t in [0,N)
// ~N log N multiplies instead of the N^2 direct sum; the matrixing stage
// below recovers all 64 V values from one 32-point transform through the
// cosine symmetries D[64-t] = -D[t], D[64+t] = -D[t] (verified exact
// against the direct matrix).
void Dct2Lee(const double* in, double* out, int N, int level,
             const CosTabs& t) {
  if (N == 1) {
    out[0] = in[0];
    return;
  }
  int h = N / 2;
  double e[16], o[16], E[16], O[16];
  for (int k = 0; k < h; ++k) {
    e[k] = in[k] + in[N - 1 - k];
    o[k] = (in[k] - in[N - 1 - k]) * t.halfsec[level][k];
  }
  Dct2Lee(e, E, h, level + 1, t);
  Dct2Lee(o, O, h, level + 1, t);
  for (int u = 0; u < h; ++u) out[2 * u] = E[u];
  for (int u = 0; u + 1 < h; ++u) out[2 * u + 1] = O[u] + O[u + 1];
  out[N - 1] = O[h - 1];
}

// Spec A.2 polyphase synthesis: one granule-row of 32 subband samples in,
// 32 PCM samples out.
void Synthesize(ChannelState* st, const double sb[32], float* pcm) {
  const CosTabs& t = tabs();
  st->v_pos = (st->v_pos + 1024 - 64) & 1023;
  double* v = st->v;
  int vp = st->v_pos;
  // Matrixing V[i] = sum_k sb[k] cos((16+i)(2k+1)pi/64) from the DCT-II
  // D[t] = sum_k sb[k] cos(t(2k+1)pi/64): V[0..15] = D[16..31],
  // V[16] = D[32] = 0, V[17..47] = -D[47-i..], V[48..63] = -D[0..15].
  double D[32];
  Dct2Lee(sb, D, 32, 0, t);
  st->set_v((vp + 16) & 1023, 0.0);
  for (int i = 0; i < 16; ++i) st->set_v((vp + i) & 1023, D[16 + i]);
  for (int i = 17; i < 48; ++i) st->set_v((vp + i) & 1023, -D[48 - i]);
  for (int i = 48; i < 64; ++i) st->set_v((vp + i) & 1023, -D[i - 48]);
  // U[j + 32 i] with the spec's alternating 128-block selection. The
  // mirrored tail makes each 32-tap run contiguous, so the inner loop
  // is a plain FMA sweep the compiler can vectorize.
  double acc[32] = {0};
  for (int i = 0; i < 16; ++i) {
    int half = i >> 1;
    int base = (vp + half * 128 + ((i & 1) ? 96 : 0)) & 1023;
    const double* p = v + base;
    const double* w = &mp3tab::kSynthWindow[32 * i];
    for (int j = 0; j < 32; ++j) acc[j] += p[j] * w[j];
  }
  for (int j = 0; j < 32; ++j) pcm[j] = static_cast<float>(acc[j]);
}

// ------------------------------------------------------------- decoder

struct Mp3Decoder {
  FrameHeader h;
  std::vector<uint8_t> reservoir;
  ChannelState state[2];
  std::vector<float> pcm;
  int channels = 0;
  int sample_rate = 0;
  bool skip_next_output = false;  // Xing/Info tag frame

  // Decodes the granules of one frame whose main data starts at byte
  // offset `start` into the reservoir.
  bool DecodeFrame(const FrameHeader& fh, int main_data_begin,
                   const int scfsi[2][4], Granule gr[2][2], size_t start) {
    if (main_data_begin > static_cast<int>(start)) return false;
    Bits br(reservoir.data(), reservoir.size());
    br.seek((start - main_data_begin) * 8);

    int ngr = fh.version == 0 ? 2 : 1;
    double xr[2][576];
    Scalefacs sf[2];
    for (int g = 0; g < ngr; ++g) {
      for (int ch = 0; ch < fh.channels; ++ch) {
        size_t part2_start = br.pos();
        Granule* q = &gr[g][ch];
        if (fh.version == 0) {
          ReadScalefacsV1(&br, *q, scfsi[ch], g, &sf[ch]);
        } else {
          bool intensity = (fh.mode == 1) && (fh.mode_ext & 1) && ch == 1;
          int sentinel = -1;
          ReadScalefacsLsf(&br, q, intensity, &sf[ch], &sentinel);
        }
        int is[576];
        if (!ReadHuffman(&br, fh, *q, part2_start, is)) {
#ifdef MP3_TRACE
          fprintf(stderr,
                  "  huffman fail g%d ch%d bt=%d bv=%d p23=%d tsel=%d,%d,%d "
                  "part2_used=%zu\n",
                  g, ch, q->block_type, q->big_values, q->part2_3_length,
                  q->table_select[0], q->table_select[1], q->table_select[2],
                  br.pos() - part2_start);
#endif
          return false;
        }
        Requantize(fh, *q, sf[ch], is, xr[ch]);
      }
      if (fh.channels == 2)
        StereoProcess(fh, gr[g][1], sf[1], xr[0], xr[1]);
      for (int ch = 0; ch < fh.channels; ++ch) {
        Granule* q = &gr[g][ch];
        ReorderShort(fh, *q, xr[ch]);
        AliasReduce(*q, xr[ch]);
        double ts[576];
        for (int sb = 0; sb < 32; ++sb) {
          double out[18];
          Imdct(*q, sb, &xr[ch][sb * 18], state[ch].overlap[sb], out);
          // Frequency inversion for odd subbands.
          for (int i = 0; i < 18; ++i)
            ts[sb * 18 + i] = (sb & 1) && (i & 1) ? -out[i] : out[i];
        }
        // 18 granule rows of 32 subband samples each.
        float chunk[18][32];
        for (int row = 0; row < 18; ++row) {
          double sbrow[32];
          for (int sb = 0; sb < 32; ++sb) sbrow[sb] = ts[sb * 18 + row];
          Synthesize(&state[ch], sbrow, chunk[row]);
        }
        if (!skip_next_output) {
          size_t base = pcm.size();
          if (ch == 0) {
            pcm.resize(base + 18 * 32 * fh.channels, 0.0f);
            for (int row = 0; row < 18; ++row)
              for (int j = 0; j < 32; ++j)
                pcm[base + (row * 32 + j) * fh.channels] = chunk[row][j];
          } else {
            size_t gbase = pcm.size() - 18 * 32 * 2;
            for (int row = 0; row < 18; ++row)
              for (int j = 0; j < 32; ++j)
                pcm[gbase + (row * 32 + j) * 2 + 1] = chunk[row][j];
          }
        }
      }
    }
    return true;
  }

  int Run(const uint8_t* data, size_t size) {
    size_t pos = 0;
    // ID3v2 container at the start.
    if (size >= 10 && memcmp(data, "ID3", 3) == 0) {
      size_t tag = ((data[6] & 0x7F) << 21) | ((data[7] & 0x7F) << 14) |
                   ((data[8] & 0x7F) << 7) | (data[9] & 0x7F);
      pos = 10 + tag;
    }
    if (size >= 128 && memcmp(data + size - 128, "TAG", 3) == 0)
      size -= 128;  // ID3v1 trailer

    int frames = 0;
    while (pos + 4 <= size) {
      FrameHeader fh;
      if (!ParseHeader(data + pos, &fh)) {
        pos++;
        continue;
      }
      if (pos + fh.frame_bytes > size) break;
      if (frames == 0) {
        channels = fh.channels;
        sample_rate = fh.sample_rate;
      } else if (fh.channels != channels || fh.sample_rate != sample_rate) {
        break;  // stream parameter change: stop at the boundary
      }

      size_t body = pos + 4 + (fh.crc ? 2 : 0);
      int side_bytes = fh.version == 0 ? (fh.channels == 1 ? 17 : 32)
                                       : (fh.channels == 1 ? 9 : 17);
      if (body + side_bytes > pos + fh.frame_bytes) break;

      Bits sbr(data + body, side_bytes);
      int main_data_begin;
      int scfsi[2][4];
      Granule gr[2][2];
      bool side_ok = ReadSideInfo(&sbr, fh, &main_data_begin, scfsi, gr);

      size_t md_off = body + side_bytes;
      size_t md_len = pos + fh.frame_bytes - md_off;
      size_t start = reservoir.size();

      // Xing/Info/VBRI metadata frame: append its data but emit no PCM.
      skip_next_output = false;
      if (frames == 0 && md_len >= 4) {
        for (size_t k = md_off; k + 4 <= md_off + md_len; ++k) {
          if (memcmp(data + k, "Xing", 4) == 0 ||
              memcmp(data + k, "Info", 4) == 0 ||
              memcmp(data + k, "VBRI", 4) == 0) {
            skip_next_output = true;
            break;
          }
        }
      }

      reservoir.insert(reservoir.end(), data + md_off,
                       data + md_off + md_len);
      size_t pcm_base = pcm.size();
      bool decoded = side_ok && DecodeFrame(fh, main_data_begin, scfsi, gr, start);
      if (!decoded && !skip_next_output) {
        // Keep output timing: an undecodable frame (corrupt data or bit
        // reservoir not yet primed) becomes one frame of silence, the
        // same policy libmpg123 follows.
        pcm.resize(pcm_base, 0.0f);
        pcm.resize(pcm_base + (fh.version == 0 ? 1152 : 576) * fh.channels,
                   0.0f);
      }
#ifdef MP3_TRACE
      fprintf(stderr,
              "frame %d pos %zu bytes %d mdb %d md_len %zu side_ok %d "
              "decoded %d skip %d\n",
              frames, pos, fh.frame_bytes, main_data_begin, md_len, side_ok,
              decoded, (int)skip_next_output);
#else
      (void)decoded;
#endif
      frames++;
      pos += fh.frame_bytes;
    }
    return frames > 0 ? VA_OK : VA_EFORMAT;
  }
};

}  // namespace

// Entry point used by audio_decoder.cc's format dispatch.
int DecodeMp3(const uint8_t* data, size_t size, std::vector<float>* out,
              int64_t* out_frames, int32_t* out_channels,
              int32_t* out_rate) {
  Mp3Decoder dec;
  int rc = dec.Run(data, size);
  if (rc != VA_OK) return rc;
  if (dec.channels == 0 || dec.pcm.empty()) return VA_ECORRUPT;
  *out = std::move(dec.pcm);
  *out_frames = static_cast<int64_t>(out->size() / dec.channels);
  *out_channels = dec.channels;
  *out_rate = dec.sample_rate;
  return VA_OK;
}
