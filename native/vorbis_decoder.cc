// velocity_asr_tpu native Ogg Vorbis decoder.
//
// From-scratch implementation of the Vorbis I specification's decode
// algorithm (Xiph.Org "Vorbis I specification", sections 3-10): Ogg page
// framing + packet assembly (RFC 3533), header decode, codebook parsing
// with the spec's first-fit canonical codeword assignment, floor type 1
// curve synthesis, residue types 0/1/2, square-polar channel coupling,
// IMDCT (computed via a complex FFT), and the lapped Vorbis window
// overlap-add with long/short block transitions.
//
// The one literal constant table the spec defines (section 10.1,
// floor1_inverse_dB_table) comes from native/vorbis_tables.h, recovered
// from the system libvorbis by tools/extract_vorbis_tables.py; everything
// algorithmic here is written from the spec's decode description. Parity
// with the reference's torchaudio ogg path (reference
// velocity_asr/audio.py:39-56) is covered by tests/test_vorbis.py, which
// encodes fixtures with the system libvorbisenc and compares PCM
// bit-closely against libvorbisfile.
//
// Scope: Vorbis I audio in a single-logical-stream Ogg container (what
// every `.ogg` speech/music file in the wild is). Floor type 0 setup is
// parsed but decode is rejected as unsupported: no encoder has emitted
// floor 0 since the format froze (libvorbis uses floor 1 exclusively),
// so there is no way to produce a test vector for it here.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#include "vorbis_tables.h"

namespace {

constexpr int VA_OK = 0;
constexpr int VA_EFORMAT = -2;
constexpr int VA_ECORRUPT = -3;
constexpr int VA_EUNSUPPORTED = -4;

// ----------------------------------------------------------- bit reader
//
// Vorbis bitpacking (spec section 2): LSB-first within each byte. Reads
// past the end of the packet set `eop` and return 0 — an end-of-packet
// condition mid-decode is defined stream behavior, not corruption.

class VBits {
 public:
  VBits(const uint8_t* data, size_t size) : d_(data), nbits_(size * 8) {}

  uint32_t read(int n) {
    uint32_t v = 0;
    for (int i = 0; i < n; ++i) v |= uint32_t(read1()) << i;
    return v;
  }

  int read1() {
    if (p_ >= nbits_) {
      eop_ = true;
      return 0;
    }
    int b = (d_[p_ >> 3] >> (p_ & 7)) & 1;
    ++p_;
    return b;
  }

  bool eop() const { return eop_; }
  size_t remaining() const { return p_ < nbits_ ? nbits_ - p_ : 0; }

 private:
  const uint8_t* d_;
  size_t nbits_;
  size_t p_ = 0;
  bool eop_ = false;
};

// ilog per spec section 9.2.1: position of the highest set bit; ilog(0)=0.
int ilog(uint32_t v) {
  int r = 0;
  while (v) {
    ++r;
    v >>= 1;
  }
  return r;
}

// float32_unpack per spec section 9.2.2.
float Float32Unpack(uint32_t x) {
  double mant = x & 0x1fffff;
  int exp = (x & 0x7fe00000) >> 21;
  if (x & 0x80000000u) mant = -mant;
  return static_cast<float>(ldexp(mant, exp - 788));
}

// lookup1_values per spec section 9.2.3: greatest r with r^dims <= entries.
uint32_t Lookup1Values(uint32_t entries, uint32_t dims) {
  if (dims == 0) return 0;  // malformed codebook; rejected by the caller
  uint32_t r = 0;
  while (true) {
    uint64_t acc = 1;
    bool over = false;
    for (uint32_t i = 0; i < dims; ++i) {
      acc *= (r + 1);
      if (acc > entries) {
        over = true;
        break;
      }
    }
    if (over) return r;
    ++r;
  }
}

// ------------------------------------------------------------- codebook

struct Codebook {
  uint32_t dims = 0;
  uint32_t entries = 0;
  // Huffman tree: nodes as pairs of child indices; negative = leaf entry
  // encoded as -(entry+1); 0 = unassigned branch (invalid codeword).
  std::vector<int32_t> tree;  // 2 ints per node
  bool single_entry = false;
  int single_entry_value = 0;
  int single_entry_len = 0;
  int lookup_type = 0;
  std::vector<float> vectors;  // entries * dims, for lookup_type 1/2

  // Decode one scalar (entry number) from the bitstream. Returns -1 on
  // end-of-packet or invalid codeword.
  int DecodeScalar(VBits* b) const {
    if (single_entry) {
      for (int i = 0; i < single_entry_len; ++i) b->read1();
      if (b->eop()) return -1;
      return single_entry_value;
    }
    if (tree.empty()) return -1;  // all-unused codebook: nothing decodable
    int node = 0;
    while (true) {
      int bit = b->read1();
      if (b->eop()) return -1;
      int32_t next = tree[node * 2 + bit];
      if (next < 0) return -next - 1;
      if (next == 0) return -1;  // hole in an underspecified tree
      node = next;
    }
  }

  const float* DecodeVector(VBits* b) const {
    int entry = DecodeScalar(b);
    if (entry < 0) return nullptr;
    return vectors.data() + size_t(entry) * dims;
  }
};

// Canonical first-fit codeword assignment (spec section 3.2.1). Codewords
// are MSB-first: the first bit read walks the root branch.
bool AssignCodewords(const std::vector<int>& lens, Codebook* cb) {
  int used = 0, last_used = -1;
  for (size_t i = 0; i < lens.size(); ++i)
    if (lens[i] > 0) {
      ++used;
      last_used = int(i);
    }
  if (used == 0) return true;  // unused codebook (valid if never decoded)
  if (used == 1) {
    cb->single_entry = true;
    cb->single_entry_value = last_used;
    cb->single_entry_len = lens[last_used];
    return true;
  }
  uint32_t available[33] = {0};
  bool has[33] = {false};
  cb->tree.assign(2, 0);
  bool first = true;
  for (size_t e = 0; e < lens.size(); ++e) {
    int len = lens[e];
    if (len <= 0) continue;
    uint32_t res;  // left-aligned 32-bit codeword start
    if (first) {
      res = 0;
      for (int j = 1; j <= len; ++j) {
        available[j] = 1u << (32 - j);
        has[j] = true;
      }
      first = false;
    } else {
      int z = len;
      while (z > 0 && !has[z]) --z;
      if (z == 0) return false;  // overspecified
      res = available[z];
      has[z] = false;
      for (int y = z + 1; y <= len; ++y) {
        available[y] = res + (1u << (32 - y));
        has[y] = true;
      }
    }
    // Insert into the decode tree, MSB of the len-bit codeword first.
    uint32_t code = res >> (32 - len);
    int node = 0;
    for (int bit = len - 1; bit >= 0; --bit) {
      int b = (code >> bit) & 1;
      if (bit == 0) {
        if (cb->tree[node * 2 + b] != 0) return false;
        cb->tree[node * 2 + b] = -int32_t(e) - 1;
      } else {
        int32_t next = cb->tree[node * 2 + b];
        if (next < 0) return false;
        if (next == 0) {
          next = int32_t(cb->tree.size() / 2);
          cb->tree[node * 2 + b] = next;
          cb->tree.push_back(0);
          cb->tree.push_back(0);
        }
        node = next;
      }
    }
  }
  return true;
}

bool ParseCodebook(VBits* b, Codebook* cb) {
  if (b->read(24) != 0x564342) return false;  // sync pattern "BCV"
  cb->dims = b->read(16);
  cb->entries = b->read(24);
  // Every entry consumes at least one bit below; a 24-bit entry count
  // larger than the packet is a crafted header, not a decodable book.
  if (uint64_t(cb->entries) > b->remaining()) return false;
  std::vector<int> lens(cb->entries, 0);
  int ordered = b->read1();
  if (!ordered) {
    int sparse = b->read1();
    for (uint32_t i = 0; i < cb->entries; ++i) {
      if (sparse) {
        if (b->read1())
          lens[i] = int(b->read(5)) + 1;
        else
          lens[i] = 0;  // unused entry
      } else {
        lens[i] = int(b->read(5)) + 1;
      }
    }
  } else {
    uint32_t cur_entry = 0;
    int cur_len = int(b->read(5)) + 1;
    while (cur_entry < cb->entries) {
      uint32_t num = b->read(ilog(cb->entries - cur_entry));
      if (cur_entry + num > cb->entries) return false;
      for (uint32_t i = 0; i < num; ++i) lens[cur_entry + i] = cur_len;
      cur_entry += num;
      ++cur_len;
      if (cur_len > 32) return false;
    }
  }
  if (b->eop()) return false;
  if (!AssignCodewords(lens, cb)) return false;

  cb->lookup_type = int(b->read(4));
  if (cb->lookup_type == 0) return !b->eop();
  if (cb->lookup_type > 2) return false;
  float min_v = Float32Unpack(b->read(32));
  float delta = Float32Unpack(b->read(32));
  int value_bits = int(b->read(4)) + 1;
  int sequence_p = b->read1();
  // Size guards BEFORE any allocation: a crafted header must not be able
  // to trigger a huge resize/read loop (entries*dims in 64-bit to avoid
  // uint32 wrap).
  if (cb->dims == 0) return false;
  if (uint64_t(cb->entries) * cb->dims > (64u << 20)) return false;
  uint64_t lookup_values64 = (cb->lookup_type == 1)
                                 ? Lookup1Values(cb->entries, cb->dims)
                                 : uint64_t(cb->entries) * cb->dims;
  if (lookup_values64 == 0 || lookup_values64 > (64u << 20)) return false;
  if (lookup_values64 * uint64_t(value_bits) > b->remaining()) return false;
  uint32_t lookup_values = uint32_t(lookup_values64);
  std::vector<uint32_t> mults(lookup_values);
  for (uint32_t i = 0; i < lookup_values; ++i) mults[i] = b->read(value_bits);
  if (b->eop()) return false;

  // Expand the full VQ vector table (spec section 3.3).
  cb->vectors.assign(size_t(cb->entries) * cb->dims, 0.0f);
  for (uint32_t e = 0; e < cb->entries; ++e) {
    float last = 0.0f;
    if (cb->lookup_type == 1) {
      uint32_t index_divisor = 1;
      for (uint32_t d = 0; d < cb->dims; ++d) {
        uint32_t off = (e / index_divisor) % lookup_values;
        float v = mults[off] * delta + min_v + last;
        if (sequence_p) last = v;
        cb->vectors[size_t(e) * cb->dims + d] = v;
        index_divisor *= lookup_values;
      }
    } else {
      for (uint32_t d = 0; d < cb->dims; ++d) {
        float v = mults[size_t(e) * cb->dims + d] * delta + min_v + last;
        if (sequence_p) last = v;
        cb->vectors[size_t(e) * cb->dims + d] = v;
      }
    }
  }
  return true;
}

// --------------------------------------------------------------- floors

struct Floor1 {
  int partitions = 0;
  std::vector<int> partition_class;       // [partitions]
  std::vector<int> class_dims;            // [classes]
  std::vector<int> class_subclasses;      // [classes]
  std::vector<int> class_masterbooks;     // [classes]
  std::vector<std::vector<int>> subclass_books;  // [classes][1<<sub]
  int multiplier = 0;
  std::vector<int> x_list;                // [values]
  std::vector<int> sort_order;            // indices sorted by x
  std::vector<int> lo_neighbor, hi_neighbor;  // per point, spec 9.2.4/5
};

struct FloorConfig {
  int type = 1;
  Floor1 f1;
};

bool ParseFloor1(VBits* b, Floor1* f, int n_codebooks) {
  f->partitions = int(b->read(5));
  f->partition_class.resize(f->partitions);
  int max_class = -1;
  for (int i = 0; i < f->partitions; ++i) {
    f->partition_class[i] = int(b->read(4));
    if (f->partition_class[i] > max_class) max_class = f->partition_class[i];
  }
  int n_classes = max_class + 1;
  f->class_dims.resize(n_classes);
  f->class_subclasses.resize(n_classes);
  f->class_masterbooks.assign(n_classes, -1);
  f->subclass_books.resize(n_classes);
  for (int c = 0; c < n_classes; ++c) {
    f->class_dims[c] = int(b->read(3)) + 1;
    f->class_subclasses[c] = int(b->read(2));
    if (f->class_subclasses[c]) {
      f->class_masterbooks[c] = int(b->read(8));
      if (f->class_masterbooks[c] >= n_codebooks) return false;
    }
    int n_sub = 1 << f->class_subclasses[c];
    f->subclass_books[c].resize(n_sub);
    for (int s = 0; s < n_sub; ++s) {
      f->subclass_books[c][s] = int(b->read(8)) - 1;  // -1 = no book
      if (f->subclass_books[c][s] >= n_codebooks) return false;
    }
  }
  f->multiplier = int(b->read(2)) + 1;
  int rangebits = int(b->read(4));
  f->x_list.clear();
  f->x_list.push_back(0);
  f->x_list.push_back(1 << rangebits);
  for (int p = 0; p < f->partitions; ++p) {
    int c = f->partition_class[p];
    for (int j = 0; j < f->class_dims[c]; ++j)
      f->x_list.push_back(int(b->read(rangebits)));
  }
  if (b->eop() || f->x_list.size() > 65) return false;
  // X values must be unique (spec 7.2.3).
  for (size_t i = 0; i < f->x_list.size(); ++i)
    for (size_t j = i + 1; j < f->x_list.size(); ++j)
      if (f->x_list[i] == f->x_list[j]) return false;

  int n = int(f->x_list.size());
  f->sort_order.resize(n);
  for (int i = 0; i < n; ++i) f->sort_order[i] = i;
  for (int i = 0; i < n; ++i)
    for (int j = i + 1; j < n; ++j)
      if (f->x_list[f->sort_order[j]] < f->x_list[f->sort_order[i]]) {
        int t = f->sort_order[i];
        f->sort_order[i] = f->sort_order[j];
        f->sort_order[j] = t;
      }
  // low_neighbor / high_neighbor (spec 9.2.4, 9.2.5): nearest x below /
  // above x_list[i] among positions < i.
  f->lo_neighbor.assign(n, 0);
  f->hi_neighbor.assign(n, 1);
  for (int i = 2; i < n; ++i) {
    int lo = 0, hi = 1;
    for (int j = 0; j < i; ++j) {
      if (f->x_list[j] < f->x_list[i] && f->x_list[j] > f->x_list[lo]) lo = j;
      if (f->x_list[j] > f->x_list[i] && f->x_list[j] < f->x_list[hi]) hi = j;
    }
    f->lo_neighbor[i] = lo;
    f->hi_neighbor[i] = hi;
  }
  return true;
}

int RenderPoint(int x0, int y0, int x1, int y1, int x) {
  int dy = y1 - y0;
  int adx = x1 - x0;
  int ady = dy < 0 ? -dy : dy;
  int err = ady * (x - x0);
  int off = err / adx;
  return dy < 0 ? y0 - off : y0 + off;
}

// render_line (spec 9.2.7) on the dB-quantized scale, then map through
// the inverse dB table into the linear floor vector.
void RenderLine(int x0, int y0, int x1, int y1, float* floor_vec, int n) {
  int dy = y1 - y0;
  int adx = x1 - x0;
  int ady = dy < 0 ? -dy : dy;
  int base = dy / adx;
  int sy = dy < 0 ? base - 1 : base + 1;
  ady -= (base < 0 ? -base : base) * adx;
  int x = x0, y = y0, err = 0;
  if (x0 < n) floor_vec[x0] = kFloor1InverseDbTable[y0 < 0 ? 0 : (y0 > 255 ? 255 : y0)];
  for (x = x0 + 1; x < x1; ++x) {
    err += ady;
    if (err >= adx) {
      err -= adx;
      y += sy;
    } else {
      y += base;
    }
    if (x < n) floor_vec[x] = kFloor1InverseDbTable[y < 0 ? 0 : (y > 255 ? 255 : y)];
  }
}

// Decode one channel's floor1 into a linear-scale curve of length n2
// (= blocksize/2). Returns false for "channel unused this frame".
bool DecodeFloor1Curve(const Floor1& f, const std::vector<Codebook>& books,
                       VBits* b, int n2, float* out) {
  if (!b->read1() || b->eop()) return false;
  static const int kRanges[4] = {256, 128, 86, 64};
  int range = kRanges[f.multiplier - 1];
  int n_values = int(f.x_list.size());
  std::vector<int> y(n_values, 0);
  int ybits = ilog(uint32_t(range - 1));
  y[0] = int(b->read(ybits));
  y[1] = int(b->read(ybits));
  // End-of-packet anywhere during floor decode marks the channel unused
  // (spec 7.2.3) -- including right here, before any codebook read.
  if (b->eop()) return false;
  int off = 2;
  for (int p = 0; p < f.partitions; ++p) {
    int c = f.partition_class[p];
    int cdim = f.class_dims[c];
    int cbits = f.class_subclasses[c];
    int csub = (1 << cbits) - 1;
    int cval = 0;
    if (cbits > 0) {
      cval = books[f.class_masterbooks[c]].DecodeScalar(b);
      if (cval < 0) return false;  // end of packet: channel unused
    }
    for (int j = 0; j < cdim; ++j) {
      int book = f.subclass_books[c][cval & csub];
      cval >>= cbits;
      if (book >= 0) {
        int v = books[book].DecodeScalar(b);
        if (v < 0) return false;
        y[off + j] = v;
      } else {
        y[off + j] = 0;
      }
    }
    off += cdim;
  }
  if (b->eop()) return false;  // truncated mid-floor: channel unused

  // Amplitude value synthesis (spec 7.2.4 step 2).
  std::vector<int> final_y(n_values, 0);
  std::vector<bool> step2(n_values, false);
  step2[0] = step2[1] = true;
  final_y[0] = y[0];
  final_y[1] = y[1];
  for (int i = 2; i < n_values; ++i) {
    int lo = f.lo_neighbor[i], hi = f.hi_neighbor[i];
    int predicted = RenderPoint(f.x_list[lo], final_y[lo], f.x_list[hi],
                                final_y[hi], f.x_list[i]);
    int val = y[i];
    int highroom = range - predicted;
    int lowroom = predicted;
    int room = 2 * (highroom < lowroom ? highroom : lowroom);
    if (val) {
      step2[lo] = true;
      step2[hi] = true;
      step2[i] = true;
      if (val >= room) {
        final_y[i] = highroom > lowroom ? val - lowroom + predicted
                                        : predicted - (val - highroom) - 1;
      } else {
        final_y[i] = (val & 1) ? predicted - ((val + 1) / 2)
                               : predicted + (val / 2);
      }
    } else {
      step2[i] = false;
      final_y[i] = predicted;
    }
    if (final_y[i] < 0) final_y[i] = 0;
    if (final_y[i] >= range) final_y[i] = range - 1;
  }

  // Curve synthesis (spec 7.2.4 step 3): piecewise render_line between
  // step2-flagged points in sorted-x order, flat extension to n2.
  int i0 = f.sort_order[0];
  int lx = f.x_list[i0];
  int ly = final_y[i0] * f.multiplier;
  for (int s = 1; s < n_values; ++s) {
    int idx = f.sort_order[s];
    if (!step2[idx]) continue;
    int hx = f.x_list[idx];
    int hy = final_y[idx] * f.multiplier;
    if (lx < n2) RenderLine(lx, ly, hx, hy, out, n2);
    lx = hx;
    ly = hy;
  }
  if (lx < n2) {
    float v = kFloor1InverseDbTable[ly < 0 ? 0 : (ly > 255 ? 255 : ly)];
    for (int x = lx; x < n2; ++x) out[x] = v;
  }
  return true;
}

// -------------------------------------------------------------- residue

struct Residue {
  int type = 0;
  uint32_t begin = 0, end = 0;
  uint32_t partition_size = 0;
  int classifications = 0;
  int classbook = 0;
  std::vector<uint8_t> cascade;          // [classifications]
  std::vector<int> books;                // [classifications * 8], -1 = none
};

bool ParseResidue(VBits* b, int type, Residue* r, int n_codebooks) {
  r->type = type;
  r->begin = b->read(24);
  r->end = b->read(24);
  r->partition_size = b->read(24) + 1;
  r->classifications = int(b->read(6)) + 1;
  r->classbook = int(b->read(8));
  if (r->classbook >= n_codebooks) return false;
  r->cascade.resize(r->classifications);
  for (int i = 0; i < r->classifications; ++i) {
    int high = 0;
    int low = int(b->read(3));
    if (b->read1()) high = int(b->read(5));
    r->cascade[i] = uint8_t(low | (high << 3));
  }
  r->books.assign(size_t(r->classifications) * 8, -1);
  for (int i = 0; i < r->classifications; ++i)
    for (int pass = 0; pass < 8; ++pass)
      if (r->cascade[i] & (1 << pass)) {
        int bk = int(b->read(8));
        if (bk >= n_codebooks) return false;
        r->books[size_t(i) * 8 + pass] = bk;
      }
  return !b->eop();
}

// Decode one residue spanning `ch` vectors of length `vec_len` each
// (spec section 8.6). `do_not_decode` has one flag per vector. For
// type 2 the caller passes a single interleaved vector (ch = 1).
void DecodeResidue(const Residue& r, const std::vector<Codebook>& books,
                   VBits* b, int ch, uint32_t vec_len,
                   const std::vector<bool>& do_not_decode, float** v) {
  const Codebook& classbook = books[r.classbook];
  uint32_t actual_size = vec_len;
  uint32_t begin = r.begin < actual_size ? r.begin : actual_size;
  uint32_t end = r.end < actual_size ? r.end : actual_size;
  if (end <= begin) return;
  uint32_t n_to_read = end - begin;
  uint32_t psize = r.partition_size;
  uint32_t partitions_to_read = n_to_read / psize;
  uint32_t classwords = classbook.dims;
  if (classwords == 0 || partitions_to_read == 0) return;

  std::vector<std::vector<int>> classifs(
      ch, std::vector<int>(partitions_to_read + classwords, 0));

  for (int pass = 0; pass < 8; ++pass) {
    uint32_t partition_count = 0;
    while (partition_count < partitions_to_read) {
      if (pass == 0) {
        for (int j = 0; j < ch; ++j) {
          if (do_not_decode[j]) continue;
          int temp = classbook.DecodeScalar(b);
          if (temp < 0) return;  // end of packet: stop, keep accumulation
          for (int i = int(classwords) - 1; i >= 0; --i) {
            classifs[j][partition_count + i] = temp % r.classifications;
            temp /= r.classifications;
          }
        }
      }
      for (uint32_t i = 0; i < classwords && partition_count < partitions_to_read;
           ++i, ++partition_count) {
        for (int j = 0; j < ch; ++j) {
          if (do_not_decode[j]) continue;
          int vqclass = classifs[j][partition_count];
          int book_idx = r.books[size_t(vqclass) * 8 + pass];
          if (book_idx < 0) continue;
          const Codebook& book = books[book_idx];
          if (book.lookup_type == 0 || book.dims == 0) continue;
          uint32_t offset = begin + partition_count * psize;
          if (r.type == 0) {
            uint32_t step = psize / book.dims;
            for (uint32_t k = 0; k < step; ++k) {
              const float* vec = book.DecodeVector(b);
              if (!vec) return;
              for (uint32_t d = 0; d < book.dims; ++d)
                v[j][offset + k + d * step] += vec[d];
            }
          } else {  // types 1 and 2 share the in-order layout
            uint32_t k = 0;
            while (k < psize) {
              const float* vec = book.DecodeVector(b);
              if (!vec) return;
              for (uint32_t d = 0; d < book.dims && k < psize; ++d, ++k)
                v[j][offset + k] += vec[d];
            }
          }
        }
      }
    }
  }
}

// ------------------------------------------------------ mapping & modes

struct Mapping {
  int submaps = 1;
  int coupling_steps = 0;
  std::vector<int> magnitude, angle;  // [coupling_steps]
  std::vector<int> mux;               // [channels]
  std::vector<int> submap_floor, submap_residue;  // [submaps]
};

struct Mode {
  int blockflag = 0;
  int mapping = 0;
};

// ------------------------------------------------------------ ogg layer

uint32_t OggCrc(const uint8_t* data, size_t n) {
  // CRC-32, polynomial 0x04c11db7, MSB-first, init 0, no final xor
  // (RFC 3533 appendix A).
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t r = i << 24;
      for (int j = 0; j < 8; ++j)
        r = (r & 0x80000000u) ? (r << 1) ^ 0x04c11db7u : (r << 1);
      table[i] = r;
    }
    init = true;
  }
  uint32_t crc = 0;
  for (size_t i = 0; i < n; ++i)
    crc = (crc << 8) ^ table[((crc >> 24) ^ data[i]) & 0xff];
  return crc;
}

struct OggPacket {
  std::vector<uint8_t> data;
  int64_t granule = -1;  // granulepos of the page this packet COMPLETES on
  bool last_on_page = false;
};

// Extract the packets of the first logical stream from an Ogg container.
bool OggUnpack(const uint8_t* data, size_t size,
               std::vector<OggPacket>* packets) {
  size_t p = 0;
  int64_t serial = -1;
  std::vector<uint8_t> pending;
  bool continued_ok = false;
  while (p + 27 <= size) {
    if (memcmp(data + p, "OggS", 4) != 0) {
      // Resync: scan forward for the next capture pattern.
      ++p;
      continue;
    }
    if (data[p + 4] != 0) return false;  // version
    uint8_t htype = data[p + 5];
    int64_t granule;
    memcpy(&granule, data + p + 6, 8);
    uint32_t pserial;
    memcpy(&pserial, data + p + 14, 4);
    uint8_t nsegs = data[p + 26];
    if (p + 27 + nsegs > size) break;
    size_t body_len = 0;
    for (int i = 0; i < nsegs; ++i) body_len += data[p + 27 + i];
    size_t page_len = 27 + nsegs + body_len;
    if (p + page_len > size) break;

    // CRC check with the crc field zeroed.
    std::vector<uint8_t> page(data + p, data + p + page_len);
    memset(page.data() + 22, 0, 4);
    uint32_t want;
    memcpy(&want, data + p + 22, 4);
    if (OggCrc(page.data(), page.size()) != want) return false;

    if (serial < 0 && (htype & 2)) serial = pserial;  // first BOS stream
    if (int64_t(pserial) != serial) {
      p += page_len;
      continue;
    }
    if (!(htype & 1)) {
      // Not a continuation page: any dangling partial packet is dropped.
      pending.clear();
      continued_ok = true;
    }
    size_t off = p + 27 + nsegs;
    for (int i = 0; i < nsegs; ++i) {
      uint8_t lace = data[p + 27 + i];
      pending.insert(pending.end(), data + off, data + off + lace);
      off += lace;
      if (lace < 255) {
        if (continued_ok && !pending.empty()) {
          OggPacket pkt;
          pkt.data.swap(pending);
          pkt.last_on_page = (i == nsegs - 1);
          pkt.granule = pkt.last_on_page ? granule : -1;
          packets->push_back(std::move(pkt));
        }
        pending.clear();
        continued_ok = true;
      }
    }
    p += page_len;
  }
  return !packets->empty();
}

// -------------------------------------------------------- IMDCT via FFT

// IMDCT (spec section 4.3.6): y[j] = sum_k X[k] cos(2pi/n (j+0.5+n/4)(k+0.5)),
// j in [0,n), k in [0,n/2). Computed with the standard n/4-point complex
// FFT factorization through the DCT-IV:
//   v[m]  = (X[2m] + i X[M-1-2m]) * e^{-i pi (m+0.25)/M},  M = n/2, m < M/2
//   V     = FFT_{M/2}(v)                       (kernel e^{-2pi i sm/(M/2)})
//   w[s]  = V[s] * e^{-i pi s/M}
//   C[2s] = Re w[s],  C[M-1-2s] = -Im w[s]     (the DCT-IV of X)
// and the IMDCT is the DCT-IV extended by its own symmetries:
//   y[j] = C[j+M/2]        j in [0, M/2)
//   y[j] = -C[3M/2-1-j]    j in [M/2, 3M/2)
//   y[j] = -C[j-3M/2]      j in [3M/2, n)
// (the factorization is exact to ~3e-10 in double; this float32
// implementation measures ~2e-7 relative error vs the direct cosine sum
// at n=8192 -- the float rounding floor, matching libvorbis precision).
struct Imdct {
  int n = 0, M = 0, L = 0;  // M = n/2 coeffs, L = n/4 complex FFT points
  std::vector<float> pre_re, pre_im;    // e^{-i pi (m+0.25)/M}
  std::vector<float> post_re, post_im;  // e^{-i pi s/M}
  std::vector<float> tw_re, tw_im;      // FFT twiddles, packed per stage
  std::vector<int> bitrev;              // bit-reversal permutation of L
  std::vector<float> wre, wim;          // FFT work, length L
  std::vector<float> cbuf;              // DCT-IV result, length M

  void Init(int n_) {
    n = n_;
    M = n / 2;
    L = n / 4;
    pre_re.resize(L);
    pre_im.resize(L);
    post_re.resize(L);
    post_im.resize(L);
    for (int m = 0; m < L; ++m) {
      double a = M_PI * (m + 0.25) / M;
      pre_re[m] = float(cos(a));
      pre_im[m] = float(-sin(a));
      double b = M_PI * m / M;
      post_re[m] = float(cos(b));
      post_im[m] = float(-sin(b));
    }
    bitrev.resize(L);
    int bits = 0;
    while ((1 << bits) < L) ++bits;
    for (int i = 0; i < L; ++i) {
      int r = 0;
      for (int b = 0; b < bits; ++b) r |= ((i >> b) & 1) << (bits - 1 - b);
      bitrev[i] = r;
    }
    // Twiddles w_len^k = e^{-2pi i k/len}, k < len/2, stages len=2..L.
    tw_re.clear();
    tw_im.clear();
    for (int len = 2; len <= L; len <<= 1)
      for (int k = 0; k < len / 2; ++k) {
        double a = -2.0 * M_PI * k / len;
        tw_re.push_back(float(cos(a)));
        tw_im.push_back(float(sin(a)));
      }
    wre.resize(L);
    wim.resize(L);
    cbuf.resize(M);
  }

  void Run(const float* x, float* y) {
    // Pre-twiddle into bit-reversed order.
    for (int m = 0; m < L; ++m) {
      float a = x[2 * m], b = x[M - 1 - 2 * m];
      int r = bitrev[m];
      wre[r] = a * pre_re[m] - b * pre_im[m];
      wim[r] = a * pre_im[m] + b * pre_re[m];
    }
    // Iterative radix-2 FFT, sign -1, precomputed twiddles.
    const float* twr = tw_re.data();
    const float* twi = tw_im.data();
    for (int len = 2; len <= L; len <<= 1) {
      int h = len / 2;
      for (int i = 0; i < L; i += len) {
        for (int k = 0; k < h; ++k) {
          int a = i + k, b = i + k + h;
          float xr = wre[b] * twr[k] - wim[b] * twi[k];
          float xi = wre[b] * twi[k] + wim[b] * twr[k];
          wre[b] = wre[a] - xr;
          wim[b] = wim[a] - xi;
          wre[a] += xr;
          wim[a] += xi;
        }
      }
      twr += h;
      twi += h;
    }
    // Post-twiddle into the DCT-IV, then the IMDCT symmetry extension.
    float* C = cbuf.data();
    for (int s = 0; s < L; ++s) {
      float r = wre[s] * post_re[s] - wim[s] * post_im[s];
      float i = wre[s] * post_im[s] + wim[s] * post_re[s];
      C[2 * s] = r;
      C[M - 1 - 2 * s] = -i;
    }
    int half = M / 2;
    for (int j = 0; j < half; ++j) y[j] = C[half + j];
    for (int j = 0; j < M; ++j) y[half + j] = -C[M - 1 - j];
    for (int j = 0; j < half; ++j) y[half + M + j] = -C[j];
  }
};

// Vorbis window slope (spec 4.3.9): sin(pi/2 * sin^2(pi/2 (i+0.5)/m)).
void FillSlope(int m, std::vector<float>* out) {
  out->resize(m);
  for (int i = 0; i < m; ++i) {
    double s = sin(0.5 * M_PI * (i + 0.5) / m);
    (*out)[i] = float(sin(0.5 * M_PI * s * s));
  }
}

// --------------------------------------------------------- stream state

struct VorbisStream {
  int channels = 0;
  long rate = 0;
  int blocksize[2] = {0, 0};
  std::vector<Codebook> codebooks;
  std::vector<FloorConfig> floors;
  std::vector<Residue> residues;
  std::vector<Mapping> mappings;
  std::vector<Mode> modes;
  int mode_bits = 0;

  Imdct imdct[2];
  std::vector<float> slope[2];  // window slopes for each blocksize

  // Lapping state.
  bool have_prev = false;
  int prev_n = 0;
  std::vector<std::vector<float>> saved;  // per channel, prev right half
};

bool ParseIdentification(const uint8_t* d, size_t n, VorbisStream* s) {
  if (n < 30 || d[0] != 1 || memcmp(d + 1, "vorbis", 6) != 0) return false;
  VBits b(d + 7, n - 7);
  if (b.read(32) != 0) return false;  // vorbis_version
  s->channels = int(b.read(8));
  s->rate = long(b.read(32));
  b.read(32);  // bitrate_maximum
  b.read(32);  // bitrate_nominal
  b.read(32);  // bitrate_minimum
  int bs0 = 1 << b.read(4);
  int bs1 = 1 << b.read(4);
  if (!b.read1()) return false;  // framing flag
  if (s->channels <= 0 || s->rate <= 0) return false;
  if (bs0 < 64 || bs1 > 8192 || bs0 > bs1) return false;
  s->blocksize[0] = bs0;
  s->blocksize[1] = bs1;
  return true;
}

bool ParseSetup(const uint8_t* d, size_t n, VorbisStream* s) {
  if (n < 7 || d[0] != 5 || memcmp(d + 1, "vorbis", 6) != 0) return false;
  VBits b(d + 7, n - 7);

  int n_books = int(b.read(8)) + 1;
  s->codebooks.resize(n_books);
  for (int i = 0; i < n_books; ++i)
    if (!ParseCodebook(&b, &s->codebooks[i])) return false;

  int time_count = int(b.read(6)) + 1;  // placeholder domain (spec 4.2.4)
  for (int i = 0; i < time_count; ++i)
    if (b.read(16) != 0) return false;

  int floor_count = int(b.read(6)) + 1;
  s->floors.resize(floor_count);
  for (int i = 0; i < floor_count; ++i) {
    int type = int(b.read(16));
    s->floors[i].type = type;
    if (type == 1) {
      if (!ParseFloor1(&b, &s->floors[i].f1, n_books)) return false;
    } else if (type == 0) {
      // Parse past the floor0 config (spec 6.2) so the rest of the setup
      // stays aligned; decode of floor0 frames is rejected (see header
      // comment -- no encoder emits floor 0, so it is untestable here).
      b.read(8);   // order
      b.read(16);  // rate
      b.read(16);  // bark_map_size
      b.read(6);   // amplitude_bits
      b.read(8);   // amplitude_offset
      int nb = int(b.read(4)) + 1;
      for (int j = 0; j < nb; ++j)
        if (int(b.read(8)) >= n_books) return false;
    } else {
      return false;
    }
  }

  int residue_count = int(b.read(6)) + 1;
  s->residues.resize(residue_count);
  for (int i = 0; i < residue_count; ++i) {
    int type = int(b.read(16));
    if (type > 2) return false;
    if (!ParseResidue(&b, type, &s->residues[i], n_books)) return false;
  }

  int mapping_count = int(b.read(6)) + 1;
  s->mappings.resize(mapping_count);
  for (int i = 0; i < mapping_count; ++i) {
    Mapping* m = &s->mappings[i];
    if (b.read(16) != 0) return false;  // mapping type
    m->submaps = b.read1() ? int(b.read(4)) + 1 : 1;
    if (b.read1()) {
      m->coupling_steps = int(b.read(8)) + 1;
      m->magnitude.resize(m->coupling_steps);
      m->angle.resize(m->coupling_steps);
      int cbits = ilog(uint32_t(s->channels - 1));
      for (int j = 0; j < m->coupling_steps; ++j) {
        m->magnitude[j] = int(b.read(cbits));
        m->angle[j] = int(b.read(cbits));
        if (m->magnitude[j] >= s->channels || m->angle[j] >= s->channels ||
            m->magnitude[j] == m->angle[j])
          return false;
      }
    }
    if (b.read(2) != 0) return false;  // reserved
    m->mux.assign(s->channels, 0);
    if (m->submaps > 1)
      for (int c = 0; c < s->channels; ++c) {
        m->mux[c] = int(b.read(4));
        if (m->mux[c] >= m->submaps) return false;
      }
    m->submap_floor.resize(m->submaps);
    m->submap_residue.resize(m->submaps);
    for (int j = 0; j < m->submaps; ++j) {
      b.read(8);  // unused time config
      m->submap_floor[j] = int(b.read(8));
      m->submap_residue[j] = int(b.read(8));
      if (m->submap_floor[j] >= floor_count ||
          m->submap_residue[j] >= residue_count)
        return false;
    }
  }

  int mode_count = int(b.read(6)) + 1;
  s->modes.resize(mode_count);
  for (int i = 0; i < mode_count; ++i) {
    s->modes[i].blockflag = b.read1();
    if (b.read(16) != 0) return false;  // window type
    if (b.read(16) != 0) return false;  // transform type
    s->modes[i].mapping = int(b.read(8));
    if (s->modes[i].mapping >= mapping_count) return false;
  }
  if (!b.read1() || b.eop()) return false;  // framing flag
  s->mode_bits = ilog(uint32_t(mode_count - 1));

  s->imdct[0].Init(s->blocksize[0]);
  s->imdct[1].Init(s->blocksize[1]);
  FillSlope(s->blocksize[0] / 2, &s->slope[0]);
  FillSlope(s->blocksize[1] / 2, &s->slope[1]);
  s->saved.assign(s->channels, {});
  return true;
}

// Decode one audio packet; append output samples (interleaved,
// frames-major) to `out`. Returns the number of frames appended.
int DecodePacket(VorbisStream* s, const uint8_t* d, size_t len,
                 std::vector<float>* out) {
  VBits b(d, len);
  if (b.read1() != 0) return 0;  // not an audio packet
  int mode_idx = s->mode_bits ? int(b.read(s->mode_bits)) : 0;
  if (mode_idx >= int(s->modes.size())) return 0;
  const Mode& mode = s->modes[mode_idx];
  const Mapping& map = s->mappings[mode.mapping];
  int bf = mode.blockflag;
  int n = s->blocksize[bf];
  int n2 = n / 2;
  int prev_flag = 1, next_flag = 1;
  if (bf) {
    prev_flag = b.read1();
    next_flag = b.read1();
  }
  if (b.eop()) return 0;

  int C = s->channels;
  // --- floor decode
  std::vector<std::vector<float>> floor_vec(C);
  std::vector<bool> no_residue(C, false);
  for (int c = 0; c < C; ++c) {
    const FloorConfig& fc = s->floors[map.submap_floor[map.mux[c]]];
    if (fc.type != 1) return -1;  // floor0: unsupported (see header)
    floor_vec[c].assign(n2, 0.0f);
    bool used = DecodeFloor1Curve(fc.f1, s->codebooks, &b, n2,
                                  floor_vec[c].data());
    if (!used) {
      std::fill(floor_vec[c].begin(), floor_vec[c].end(), 0.0f);
      no_residue[c] = true;
    }
  }
  // --- nonzero vector propagation across coupling (spec 4.3.3)
  for (int i = 0; i < map.coupling_steps; ++i) {
    int M = map.magnitude[i], A = map.angle[i];
    if (!no_residue[M] || !no_residue[A]) {
      no_residue[M] = false;
      no_residue[A] = false;
    }
  }
  // --- residue decode per submap
  std::vector<std::vector<float>> res(C, std::vector<float>(n2, 0.0f));
  for (int sm = 0; sm < map.submaps; ++sm) {
    const Residue& r = s->residues[map.submap_residue[sm]];
    std::vector<int> chans;
    for (int c = 0; c < C; ++c)
      if (map.mux[c] == sm) chans.push_back(c);
    int ch = int(chans.size());
    if (ch == 0) continue;
    if (r.type == 2) {
      bool any = false;
      for (int c : chans)
        if (!no_residue[c]) any = true;
      if (!any) continue;
      std::vector<float> inter(size_t(n2) * ch, 0.0f);
      float* vp[1] = {inter.data()};
      std::vector<bool> dnd = {false};
      DecodeResidue(r, s->codebooks, &b, 1, uint32_t(n2) * ch, dnd, vp);
      for (int k = 0; k < ch; ++k)
        for (int i = 0; i < n2; ++i)
          res[chans[k]][i] = inter[size_t(i) * ch + k];
    } else {
      std::vector<float*> vp(ch);
      std::vector<bool> dnd(ch);
      for (int k = 0; k < ch; ++k) {
        vp[k] = res[chans[k]].data();
        dnd[k] = no_residue[chans[k]];
      }
      DecodeResidue(r, s->codebooks, &b, ch, uint32_t(n2), dnd, vp.data());
    }
  }
  // --- inverse coupling (spec 4.3.5), last step first
  for (int i = map.coupling_steps - 1; i >= 0; --i) {
    float* M = res[map.magnitude[i]].data();
    float* A = res[map.angle[i]].data();
    for (int j = 0; j < n2; ++j) {
      float m = M[j], a = A[j];
      float nm, na;
      if (m > 0) {
        if (a > 0) {
          nm = m;
          na = m - a;
        } else {
          na = m;
          nm = m + a;
        }
      } else {
        if (a > 0) {
          nm = m;
          na = m + a;
        } else {
          na = m;
          nm = m - a;
        }
      }
      M[j] = nm;
      A[j] = na;
    }
  }

  // --- dot product with the floor, IMDCT, window
  int bs0 = s->blocksize[0];
  std::vector<std::vector<float>> w(C, std::vector<float>(n));
  for (int c = 0; c < C; ++c) {
    for (int i = 0; i < n2; ++i) res[c][i] *= floor_vec[c][i];
    s->imdct[bf].Run(res[c].data(), w[c].data());
    // Window (spec 4.3.9): slope widths shrink to the short blocksize at
    // a long/short boundary; flat 1.0 between the slopes, 0 outside.
    int left_n = (bf && !prev_flag) ? bs0 / 2 : n2;
    int left_start = (bf && !prev_flag) ? n / 4 - bs0 / 4 : 0;
    int right_n = (bf && !next_flag) ? bs0 / 2 : n2;
    int right_start = (bf && !next_flag) ? 3 * n / 4 - bs0 / 4 : n2;
    const std::vector<float>& lsl = (bf && !prev_flag) ? s->slope[0] : s->slope[bf];
    const std::vector<float>& rsl = (bf && !next_flag) ? s->slope[0] : s->slope[bf];
    float* wc = w[c].data();
    for (int i = 0; i < left_start; ++i) wc[i] = 0.0f;
    for (int i = 0; i < left_n; ++i) wc[left_start + i] *= lsl[i];
    for (int i = 0; i < right_n; ++i)
      wc[right_start + i] *= rsl[right_n - 1 - i];
    for (int i = right_start + right_n; i < n; ++i) wc[i] = 0.0f;
  }

  // --- overlap-add with the previous block's right half
  int frames = 0;
  if (s->have_prev) {
    int np = s->prev_n;
    frames = np / 4 + n / 4;
    int shift = np / 4 - n / 4;  // index offset of cur left half vs output
    size_t base = out->size();
    out->resize(base + size_t(frames) * C, 0.0f);
    for (int c = 0; c < C; ++c) {
      const std::vector<float>& sv = s->saved[c];
      const float* wc = w[c].data();
      for (int i = 0; i < frames; ++i) {
        float v = (i < int(sv.size())) ? sv[i] : 0.0f;
        int t = i - shift;
        if (t >= 0 && t < n2) v += wc[t];
        (*out)[base + size_t(i) * C + c] = v;
      }
    }
  }
  for (int c = 0; c < C; ++c)
    s->saved[c].assign(w[c].begin() + n2, w[c].end());
  s->have_prev = true;
  s->prev_n = n;
  return frames;
}

}  // namespace

// Entry point, called from audio_decoder.cc's container dispatch.
int DecodeOggVorbis(const uint8_t* data, size_t size, std::vector<float>* out,
                    int64_t* out_frames, int32_t* out_channels,
                    int32_t* out_rate) {
  std::vector<OggPacket> packets;
  if (!OggUnpack(data, size, &packets)) return VA_EFORMAT;
  if (packets.size() < 4) return VA_ECORRUPT;  // 3 headers + >=1 audio

  VorbisStream s;
  if (!ParseIdentification(packets[0].data.data(), packets[0].data.size(), &s))
    return VA_EFORMAT;
  // packets[1] is the comment header; skipped entirely.
  if (packets[1].data.empty() || packets[1].data[0] != 3) return VA_ECORRUPT;
  if (!ParseSetup(packets[2].data.data(), packets[2].data.size(), &s))
    return VA_ECORRUPT;

  out->clear();
  int64_t total = 0;
  int64_t last_granule = -1;
  for (size_t i = 3; i < packets.size(); ++i) {
    int frames = DecodePacket(&s, packets[i].data.data(),
                              packets[i].data.size(), out);
    if (frames < 0) return VA_EUNSUPPORTED;
    total += frames;
    if (packets[i].granule >= 0) last_granule = packets[i].granule;
  }
  // The final page's granule position is the absolute length of the
  // stream; a shorter value trims the encoder's padding tail (spec A.2).
  if (last_granule >= 0 && last_granule < total) {
    out->resize(size_t(last_granule) * s.channels);
    total = last_granule;
  }
  *out_frames = total;
  *out_channels = s.channels;
  *out_rate = int32_t(s.rate);
  return VA_OK;
}
