// velocity_asr_tpu native audio decoder: WAV (PCM/float) + FLAC.
//
// TPU-native replacement for the reference's torchaudio C++ decode path
// (reference velocity_asr/audio.py:39-56, data.py:275-283). LibriSpeech
// ships as 16-bit mono FLAC, so a self-contained FLAC decoder is the
// load-bearing piece: subset decoding with constant/verbatim/fixed/LPC
// subframes, Rice-coded residual partitions, stereo decorrelation, and
// wasted-bits handling.
//
// C ABI (ctypes-friendly):
//   int va_decode_file(const char* path, float** out, int64_t* frames,
//                      int32_t* channels, int32_t* rate);
//   returns 0 on success; *out is interleaved float32 in [-1, 1],
//   released with va_free().

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------- errors
enum VaError {
  VA_OK = 0,
  VA_EOPEN = 1,
  VA_EFORMAT = 2,
  VA_EUNSUPPORTED = 3,
  VA_ECORRUPT = 4,
};

// ---------------------------------------------------------------- bit reader
class BitReader {
 public:
  BitReader(const uint8_t* data, size_t size) : data_(data), size_(size) {}

  bool ReadBit(uint32_t* bit) {
    if (byte_ >= size_) return false;
    *bit = (data_[byte_] >> (7 - bitpos_)) & 1u;
    if (++bitpos_ == 8) {
      bitpos_ = 0;
      ++byte_;
    }
    return true;
  }

  // n <= 57 supported.
  bool ReadBits(int n, uint64_t* out) {
    uint64_t v = 0;
    while (n > 0) {
      if (byte_ >= size_) return false;
      int avail = 8 - bitpos_;
      int take = n < avail ? n : avail;
      uint32_t cur = data_[byte_];
      uint32_t chunk = (cur >> (avail - take)) & ((1u << take) - 1u);
      v = (v << take) | chunk;
      bitpos_ += take;
      if (bitpos_ == 8) {
        bitpos_ = 0;
        ++byte_;
      }
      n -= take;
    }
    *out = v;
    return true;
  }

  bool ReadSigned(int n, int64_t* out) {
    uint64_t v;
    if (!ReadBits(n, &v)) return false;
    // sign-extend
    if (n > 0 && (v >> (n - 1)) & 1u) v |= ~((1ull << n) - 1ull);
    *out = static_cast<int64_t>(v);
    return true;
  }

  bool ReadUnary(uint32_t* out) {
    uint32_t q = 0;
    uint32_t bit;
    for (;;) {
      if (!ReadBit(&bit)) return false;
      if (bit) break;
      ++q;
      if (q > (1u << 24)) return false;  // corrupt stream guard
    }
    *out = q;
    return true;
  }

  void AlignByte() {
    if (bitpos_ != 0) {
      bitpos_ = 0;
      ++byte_;
    }
  }

  bool SkipBytes(size_t n) {
    AlignByte();
    if (byte_ + n > size_) return false;
    byte_ += n;
    return true;
  }

  size_t BytePos() const { return byte_; }
  bool AtEnd() const { return byte_ >= size_; }

 private:
  const uint8_t* data_;
  size_t size_;
  size_t byte_ = 0;
  int bitpos_ = 0;
};

// ---------------------------------------------------------------- FLAC
struct StreamInfo {
  uint32_t sample_rate = 0;
  uint32_t channels = 0;
  uint32_t bits_per_sample = 0;
  uint64_t total_samples = 0;
};

bool ReadUtf8Coded(BitReader* br, uint64_t* out) {
  uint64_t b0;
  if (!br->ReadBits(8, &b0)) return false;
  int extra;
  uint64_t v;
  if ((b0 & 0x80) == 0) {
    *out = b0;
    return true;
  } else if ((b0 & 0xE0) == 0xC0) {
    extra = 1;
    v = b0 & 0x1F;
  } else if ((b0 & 0xF0) == 0xE0) {
    extra = 2;
    v = b0 & 0x0F;
  } else if ((b0 & 0xF8) == 0xF0) {
    extra = 3;
    v = b0 & 0x07;
  } else if ((b0 & 0xFC) == 0xF8) {
    extra = 4;
    v = b0 & 0x03;
  } else if ((b0 & 0xFE) == 0xFC) {
    extra = 5;
    v = b0 & 0x01;
  } else if (b0 == 0xFE) {
    extra = 6;
    v = 0;
  } else {
    return false;
  }
  for (int i = 0; i < extra; ++i) {
    uint64_t b;
    if (!br->ReadBits(8, &b)) return false;
    if ((b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

// Rice-coded residual into res[predictor_order .. block_size).
bool ReadResidual(BitReader* br, uint32_t block_size, uint32_t order,
                  std::vector<int64_t>* res) {
  uint64_t method;
  if (!br->ReadBits(2, &method)) return false;
  if (method > 1) return false;
  int param_bits = method == 0 ? 4 : 5;
  uint32_t escape = method == 0 ? 0xF : 0x1F;

  uint64_t part_order;
  if (!br->ReadBits(4, &part_order)) return false;
  uint32_t partitions = 1u << part_order;
  if (block_size % partitions != 0) return false;
  uint32_t part_samples = block_size >> part_order;
  if (part_samples == 0) return false;
  // The first partition holds part_samples - order residuals; reject
  // streams where that would underflow (corrupt/fuzzed input).
  if (part_samples < order) return false;

  uint32_t idx = order;
  for (uint32_t p = 0; p < partitions; ++p) {
    uint32_t count = part_samples - (p == 0 ? order : 0);
    uint64_t param;
    if (!br->ReadBits(param_bits, &param)) return false;
    if (param == escape) {
      uint64_t raw_bits;
      if (!br->ReadBits(5, &raw_bits)) return false;
      for (uint32_t i = 0; i < count; ++i) {
        int64_t v = 0;
        if (raw_bits > 0) {
          if (!br->ReadSigned(static_cast<int>(raw_bits), &v)) return false;
        }
        (*res)[idx++] = v;
      }
    } else {
      for (uint32_t i = 0; i < count; ++i) {
        uint32_t q;
        if (!br->ReadUnary(&q)) return false;
        uint64_t r = 0;
        if (param > 0) {
          if (!br->ReadBits(static_cast<int>(param), &r)) return false;
        }
        uint64_t u = (static_cast<uint64_t>(q) << param) | r;
        // zigzag decode
        int64_t v = (u >> 1) ^ -static_cast<int64_t>(u & 1);
        (*res)[idx++] = v;
      }
    }
  }
  return idx == block_size;
}

bool DecodeSubframe(BitReader* br, uint32_t block_size, uint32_t bps,
                    std::vector<int64_t>* out) {
  uint32_t pad;
  if (!br->ReadBit(&pad) || pad != 0) return false;
  uint64_t type;
  if (!br->ReadBits(6, &type)) return false;
  uint32_t wasted = 0;
  uint32_t wflag;
  if (!br->ReadBit(&wflag)) return false;
  if (wflag) {
    uint32_t q;
    if (!br->ReadUnary(&q)) return false;
    wasted = q + 1;
  }
  if (wasted >= bps) return false;
  uint32_t ebps = bps - wasted;

  out->assign(block_size, 0);

  if (type == 0) {  // CONSTANT
    int64_t v;
    if (!br->ReadSigned(static_cast<int>(ebps), &v)) return false;
    for (uint32_t i = 0; i < block_size; ++i) (*out)[i] = v;
  } else if (type == 1) {  // VERBATIM
    for (uint32_t i = 0; i < block_size; ++i) {
      int64_t v;
      if (!br->ReadSigned(static_cast<int>(ebps), &v)) return false;
      (*out)[i] = v;
    }
  } else if (type >= 8 && type <= 12) {  // FIXED, order 0-4
    uint32_t order = static_cast<uint32_t>(type - 8);
    if (order > block_size) return false;
    for (uint32_t i = 0; i < order; ++i) {
      int64_t v;
      if (!br->ReadSigned(static_cast<int>(ebps), &v)) return false;
      (*out)[i] = v;
    }
    if (!ReadResidual(br, block_size, order, out)) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t r = (*out)[i];
      switch (order) {
        case 0:
          (*out)[i] = r;
          break;
        case 1:
          (*out)[i] = r + (*out)[i - 1];
          break;
        case 2:
          (*out)[i] = r + 2 * (*out)[i - 1] - (*out)[i - 2];
          break;
        case 3:
          (*out)[i] =
              r + 3 * (*out)[i - 1] - 3 * (*out)[i - 2] + (*out)[i - 3];
          break;
        case 4:
          (*out)[i] = r + 4 * (*out)[i - 1] - 6 * (*out)[i - 2] +
                      4 * (*out)[i - 3] - (*out)[i - 4];
          break;
      }
    }
  } else if (type >= 32) {  // LPC, order = (type & 31) + 1
    uint32_t order = static_cast<uint32_t>(type & 31) + 1;
    if (order > block_size) return false;
    for (uint32_t i = 0; i < order; ++i) {
      int64_t v;
      if (!br->ReadSigned(static_cast<int>(ebps), &v)) return false;
      (*out)[i] = v;
    }
    uint64_t prec_m1;
    if (!br->ReadBits(4, &prec_m1)) return false;
    if (prec_m1 == 0xF) return false;
    int precision = static_cast<int>(prec_m1) + 1;
    int64_t shift;
    if (!br->ReadSigned(5, &shift)) return false;
    if (shift < 0) return false;
    std::vector<int64_t> coef(order);
    for (uint32_t i = 0; i < order; ++i) {
      if (!br->ReadSigned(precision, &coef[i])) return false;
    }
    if (!ReadResidual(br, block_size, order, out)) return false;
    for (uint32_t i = order; i < block_size; ++i) {
      int64_t acc = 0;
      for (uint32_t j = 0; j < order; ++j) {
        acc += coef[j] * (*out)[i - 1 - j];
      }
      (*out)[i] = (*out)[i] + (acc >> shift);
    }
  } else {
    return false;  // reserved
  }

  if (wasted > 0) {
    for (uint32_t i = 0; i < block_size; ++i) (*out)[i] <<= wasted;
  }
  return true;
}

int DecodeFlac(const uint8_t* data, size_t size, std::vector<float>* out,
               int64_t* out_frames, int32_t* out_channels, int32_t* out_rate) {
  if (size < 4 || memcmp(data, "fLaC", 4) != 0) return VA_EFORMAT;
  BitReader br(data, size);
  br.SkipBytes(4);

  StreamInfo info;
  bool last = false;
  bool have_streaminfo = false;
  while (!last) {
    uint64_t hdr;
    if (!br.ReadBits(32, &hdr)) return VA_ECORRUPT;
    last = (hdr >> 31) & 1;
    uint32_t type = (hdr >> 24) & 0x7F;
    uint32_t len = hdr & 0xFFFFFF;
    if (type == 0) {  // STREAMINFO
      if (len != 34) return VA_ECORRUPT;
      uint64_t v;
      if (!br.ReadBits(16, &v)) return VA_ECORRUPT;  // min blocksize
      if (!br.ReadBits(16, &v)) return VA_ECORRUPT;  // max blocksize
      if (!br.ReadBits(24, &v)) return VA_ECORRUPT;  // min framesize
      if (!br.ReadBits(24, &v)) return VA_ECORRUPT;  // max framesize
      if (!br.ReadBits(20, &v)) return VA_ECORRUPT;
      info.sample_rate = static_cast<uint32_t>(v);
      if (!br.ReadBits(3, &v)) return VA_ECORRUPT;
      info.channels = static_cast<uint32_t>(v) + 1;
      if (!br.ReadBits(5, &v)) return VA_ECORRUPT;
      info.bits_per_sample = static_cast<uint32_t>(v) + 1;
      if (!br.ReadBits(36, &v)) return VA_ECORRUPT;
      info.total_samples = v;
      if (!br.SkipBytes(16)) return VA_ECORRUPT;  // md5
      have_streaminfo = true;
    } else {
      if (!br.SkipBytes(len)) return VA_ECORRUPT;
    }
  }
  if (!have_streaminfo || info.sample_rate == 0 || info.channels == 0)
    return VA_ECORRUPT;
  if (info.channels > 8) return VA_EUNSUPPORTED;

  uint32_t nch = info.channels;
  std::vector<std::vector<int64_t>> ch(nch);
  std::vector<std::vector<int64_t>> frame_ch(nch);
  out->clear();
  if (info.total_samples > 0) out->reserve(info.total_samples * nch);

  double scale = 1.0 / (1ull << (info.bits_per_sample - 1));

  // Frame loop.
  while (!br.AtEnd()) {
    // Frame header: 14-bit sync.
    uint64_t sync;
    if (!br.ReadBits(14, &sync)) break;  // clean EOF
    if (sync != 0x3FFE) return VA_ECORRUPT;
    uint64_t v;
    if (!br.ReadBits(1, &v)) return VA_ECORRUPT;  // reserved
    uint64_t blocking;
    if (!br.ReadBits(1, &blocking)) return VA_ECORRUPT;
    uint64_t bs_code, sr_code, ch_code, ss_code;
    if (!br.ReadBits(4, &bs_code)) return VA_ECORRUPT;
    if (!br.ReadBits(4, &sr_code)) return VA_ECORRUPT;
    if (!br.ReadBits(4, &ch_code)) return VA_ECORRUPT;
    if (!br.ReadBits(3, &ss_code)) return VA_ECORRUPT;
    if (!br.ReadBits(1, &v)) return VA_ECORRUPT;  // reserved

    uint64_t coded_num;
    if (!ReadUtf8Coded(&br, &coded_num)) return VA_ECORRUPT;

    uint32_t block_size;
    switch (bs_code) {
      case 0:
        return VA_ECORRUPT;
      case 1:
        block_size = 192;
        break;
      case 6: {
        uint64_t b;
        if (!br.ReadBits(8, &b)) return VA_ECORRUPT;
        block_size = static_cast<uint32_t>(b) + 1;
        break;
      }
      case 7: {
        uint64_t b;
        if (!br.ReadBits(16, &b)) return VA_ECORRUPT;
        block_size = static_cast<uint32_t>(b) + 1;
        break;
      }
      default:
        if (bs_code >= 2 && bs_code <= 5)
          block_size = 576u << (bs_code - 2);
        else
          block_size = 256u << (bs_code - 8);
        break;
    }

    // Sample rate: usually "use streaminfo" (0); consume extra bytes if coded.
    if (sr_code == 12) {
      uint64_t b;
      if (!br.ReadBits(8, &b)) return VA_ECORRUPT;
    } else if (sr_code == 13 || sr_code == 14) {
      uint64_t b;
      if (!br.ReadBits(16, &b)) return VA_ECORRUPT;
    } else if (sr_code == 15) {
      return VA_ECORRUPT;
    }

    // Bits per sample.
    uint32_t bps;
    switch (ss_code) {
      case 0:
        bps = info.bits_per_sample;
        break;
      case 1:
        bps = 8;
        break;
      case 2:
        bps = 12;
        break;
      case 4:
        bps = 16;
        break;
      case 5:
        bps = 20;
        break;
      case 6:
        bps = 24;
        break;
      case 7:
        bps = 32;
        break;
      default:
        return VA_ECORRUPT;
    }

    if (!br.ReadBits(8, &v)) return VA_ECORRUPT;  // header CRC-8 (unchecked)

    uint32_t frame_channels;
    enum { INDEP, LEFT_SIDE, RIGHT_SIDE, MID_SIDE } assign = INDEP;
    if (ch_code < 8) {
      frame_channels = ch_code + 1;
    } else if (ch_code == 8) {
      frame_channels = 2;
      assign = LEFT_SIDE;
    } else if (ch_code == 9) {
      frame_channels = 2;
      assign = RIGHT_SIDE;
    } else if (ch_code == 10) {
      frame_channels = 2;
      assign = MID_SIDE;
    } else {
      return VA_ECORRUPT;
    }
    if (frame_channels != nch) return VA_ECORRUPT;

    for (uint32_t c = 0; c < nch; ++c) {
      uint32_t sub_bps = bps;
      // Side channels carry one extra bit.
      if ((assign == LEFT_SIDE && c == 1) || (assign == RIGHT_SIDE && c == 0) ||
          (assign == MID_SIDE && c == 1)) {
        sub_bps += 1;
      }
      if (!DecodeSubframe(&br, block_size, sub_bps, &frame_ch[c]))
        return VA_ECORRUPT;
    }

    // Undo stereo decorrelation.
    if (assign == LEFT_SIDE) {
      for (uint32_t i = 0; i < block_size; ++i)
        frame_ch[1][i] = frame_ch[0][i] - frame_ch[1][i];
    } else if (assign == RIGHT_SIDE) {
      for (uint32_t i = 0; i < block_size; ++i)
        frame_ch[0][i] = frame_ch[0][i] + frame_ch[1][i];
    } else if (assign == MID_SIDE) {
      for (uint32_t i = 0; i < block_size; ++i) {
        int64_t side = frame_ch[1][i];
        int64_t mid = (frame_ch[0][i] << 1) | (side & 1);
        frame_ch[0][i] = (mid + side) >> 1;
        frame_ch[1][i] = (mid - side) >> 1;
      }
    }

    br.AlignByte();
    uint64_t crc16;
    if (!br.ReadBits(16, &crc16)) return VA_ECORRUPT;  // unchecked

    // Interleave into output.
    size_t base = out->size();
    out->resize(base + static_cast<size_t>(block_size) * nch);
    for (uint32_t i = 0; i < block_size; ++i) {
      for (uint32_t c = 0; c < nch; ++c) {
        (*out)[base + i * nch + c] =
            static_cast<float>(frame_ch[c][i] * scale);
      }
    }

    if (info.total_samples > 0 &&
        out->size() >= info.total_samples * nch) {
      break;  // some encoders pad the tail
    }
  }

  *out_frames = static_cast<int64_t>(out->size() / nch);
  *out_channels = static_cast<int32_t>(nch);
  *out_rate = static_cast<int32_t>(info.sample_rate);
  return VA_OK;
}

// ---------------------------------------------------------------- WAV
uint32_t rd_u32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) { return p[0] | (p[1] << 8); }

int DecodeWav(const uint8_t* data, size_t size, std::vector<float>* out,
              int64_t* out_frames, int32_t* out_channels, int32_t* out_rate) {
  if (size < 44 || memcmp(data, "RIFF", 4) != 0 || memcmp(data + 8, "WAVE", 4) != 0)
    return VA_EFORMAT;

  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  const uint8_t* pcm = nullptr;
  size_t pcm_size = 0;

  size_t pos = 12;
  while (pos + 8 <= size) {
    const uint8_t* hdr = data + pos;
    uint32_t chunk_size = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    if (pos + 8 + chunk_size > size) chunk_size = static_cast<uint32_t>(size - pos - 8);
    if (memcmp(hdr, "fmt ", 4) == 0 && chunk_size >= 16) {
      fmt = rd_u16(body);
      channels = rd_u16(body + 2);
      rate = rd_u32(body + 4);
      bits = rd_u16(body + 14);
      if (fmt == 0xFFFE && chunk_size >= 40) {
        fmt = rd_u16(body + 24);  // WAVE_FORMAT_EXTENSIBLE subformat tag
      }
    } else if (memcmp(hdr, "data", 4) == 0) {
      pcm = body;
      pcm_size = chunk_size;
    }
    pos += 8 + chunk_size + (chunk_size & 1);
  }
  if (!pcm || channels == 0 || rate == 0) return VA_ECORRUPT;

  size_t bytes_per = bits / 8;
  if (bytes_per == 0) return VA_EUNSUPPORTED;
  size_t n = pcm_size / bytes_per;
  out->resize(n);

  if (fmt == 1 && bits == 16) {
    for (size_t i = 0; i < n; ++i) {
      int16_t v = static_cast<int16_t>(rd_u16(pcm + i * 2));
      (*out)[i] = v / 32768.0f;
    }
  } else if (fmt == 1 && bits == 24) {
    for (size_t i = 0; i < n; ++i) {
      const uint8_t* p = pcm + i * 3;
      int32_t v = p[0] | (p[1] << 8) | (p[2] << 16);
      if (v & 0x800000) v -= 0x1000000;
      (*out)[i] = v / 8388608.0f;
    }
  } else if (fmt == 1 && bits == 32) {
    for (size_t i = 0; i < n; ++i) {
      int32_t v = static_cast<int32_t>(rd_u32(pcm + i * 4));
      (*out)[i] = static_cast<float>(v / 2147483648.0);
    }
  } else if (fmt == 1 && bits == 8) {
    for (size_t i = 0; i < n; ++i) {
      (*out)[i] = (static_cast<int>(pcm[i]) - 128) / 128.0f;
    }
  } else if (fmt == 3 && bits == 32) {
    for (size_t i = 0; i < n; ++i) {
      float f;
      memcpy(&f, pcm + i * 4, 4);
      (*out)[i] = f;
    }
  } else {
    return VA_EUNSUPPORTED;
  }

  *out_frames = static_cast<int64_t>(n / channels);
  *out_channels = channels;
  *out_rate = static_cast<int32_t>(rate);
  return VA_OK;
}

int ReadFile(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return VA_EOPEN;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (sz < 0) {
    fclose(f);
    return VA_EOPEN;
  }
  buf->resize(static_cast<size_t>(sz));
  size_t got = fread(buf->data(), 1, buf->size(), f);
  fclose(f);
  if (got != buf->size()) return VA_EOPEN;
  return VA_OK;
}

// MPEG-1/2/2.5 Layer III frame sync (or a leading ID3v2 container).
bool LooksLikeMp3(const uint8_t* p, size_t n) {
  if (n >= 3 && memcmp(p, "ID3", 3) == 0) return true;
  if (n < 4) return false;
  if (p[0] != 0xFF || (p[1] & 0xE0) != 0xE0) return false;
  int version_bits = (p[1] >> 3) & 3;
  int layer_bits = (p[1] >> 1) & 3;
  int bitrate_index = p[2] >> 4;
  int sr_index = (p[2] >> 2) & 3;
  return version_bits != 1 && layer_bits == 1 && bitrate_index != 0 &&
         bitrate_index != 15 && sr_index != 3;
}

}  // namespace

// Implemented in mp3_decoder.cc.
int DecodeMp3(const uint8_t* data, size_t size, std::vector<float>* out,
              int64_t* out_frames, int32_t* out_channels, int32_t* out_rate);

// Implemented in vorbis_decoder.cc.
int DecodeOggVorbis(const uint8_t* data, size_t size, std::vector<float>* out,
                    int64_t* out_frames, int32_t* out_channels,
                    int32_t* out_rate);

extern "C" {

int va_decode_file(const char* path, float** out_samples, int64_t* out_frames,
                   int32_t* out_channels, int32_t* out_rate) try {
  std::vector<uint8_t> buf;
  int rc = ReadFile(path, &buf);
  if (rc != VA_OK) return rc;
  if (buf.size() < 4) return VA_EFORMAT;

  std::vector<float> samples;
  if (memcmp(buf.data(), "fLaC", 4) == 0) {
    rc = DecodeFlac(buf.data(), buf.size(), &samples, out_frames, out_channels,
                    out_rate);
  } else if (memcmp(buf.data(), "RIFF", 4) == 0) {
    rc = DecodeWav(buf.data(), buf.size(), &samples, out_frames, out_channels,
                   out_rate);
  } else if (memcmp(buf.data(), "OggS", 4) == 0) {
    rc = DecodeOggVorbis(buf.data(), buf.size(), &samples, out_frames,
                         out_channels, out_rate);
  } else if (LooksLikeMp3(buf.data(), buf.size())) {
    rc = DecodeMp3(buf.data(), buf.size(), &samples, out_frames, out_channels,
                   out_rate);
  } else {
    rc = VA_EFORMAT;
  }
  if (rc != VA_OK) return rc;

  float* mem = static_cast<float*>(malloc(samples.size() * sizeof(float)));
  if (!mem) return VA_EOPEN;
  memcpy(mem, samples.data(), samples.size() * sizeof(float));
  *out_samples = mem;
  return VA_OK;
} catch (...) {
  // Exceptions (e.g. std::bad_alloc on a crafted header) must not cross
  // the extern "C" boundary into the ctypes caller.
  return VA_ECORRUPT;
}

void va_free(float* p) { free(p); }

}  // extern "C"
