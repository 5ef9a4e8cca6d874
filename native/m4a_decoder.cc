// m4a/AAC decode via the system libav* stack.
//
// The reference decodes m4a through torchaudio (reference
// velocity_asr/audio.py:39-56), whose backend is exactly these ffmpeg
// libraries. wav/flac/mp3/ogg have from-scratch decoders in this repo
// (audio_decoder.cc, mp3_decoder.cc, vorbis_decoder.cc); AAC-LC has no
// codec in this container to build golden fixtures against, so m4a uses
// the system codec through a thin shim instead — same capability, honest
// provenance. Built as a SEPARATE shared object (libvelocity_m4a.so) so
// the main decoder library keeps zero external dependencies; the
// Makefile gates this target on the libavformat headers being present.
//
// C ABI (mirrors audio_decoder.cc):
//   int  va_m4a_decode_file(path, &samples, &frames, &channels, &rate)
//        samples = interleaved float32, frames*channels, caller frees
//        with va_m4a_free. Returns 0 on success, negative on error.
//   void va_m4a_free(float*)
//   int  va_m4a_encode_file(path, pcm, n, rate) — mono float32 -> AAC-LC
//        in an mp4 container. Test-fixture generator (the suite encodes
//        a known signal, decodes it back, and checks correlation); also
//        lets users produce m4a without the ffmpeg CLI.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
}

namespace {

struct DecodeCtx {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* dec = nullptr;
  SwrContext* swr = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  ~DecodeCtx() {
    if (swr) swr_free(&swr);
    if (dec) avcodec_free_context(&dec);
    if (fmt) avformat_close_input(&fmt);
    if (pkt) av_packet_free(&pkt);
    if (frame) av_frame_free(&frame);
  }
};

// Convert one decoded frame to interleaved float32 and append.
int append_frame(DecodeCtx& c, const AVFrame* f, int channels,
                 std::vector<float>& out) {
  // swr with identical in/out rate & layout acts as a format converter
  // (FLTP -> packed FLT); delay is zero so one convert call drains it.
  std::vector<float> buf(static_cast<size_t>(f->nb_samples) * channels);
  uint8_t* dst = reinterpret_cast<uint8_t*>(buf.data());
  int got = swr_convert(c.swr, &dst, f->nb_samples,
                        const_cast<const uint8_t**>(f->extended_data),
                        f->nb_samples);
  if (got < 0) return -1;
  out.insert(out.end(), buf.begin(),
             buf.begin() + static_cast<size_t>(got) * channels);
  return 0;
}

}  // namespace

extern "C" {

int va_m4a_decode_file(const char* path, float** out_samples,
                       int64_t* out_frames, int32_t* out_channels,
                       int32_t* out_sample_rate) {
  if (!path || !out_samples || !out_frames || !out_channels ||
      !out_sample_rate)
    return -1;
  *out_samples = nullptr;
  *out_frames = 0;
  *out_channels = 0;
  *out_sample_rate = 0;

  DecodeCtx c;
  if (avformat_open_input(&c.fmt, path, nullptr, nullptr) < 0) return -2;
  if (avformat_find_stream_info(c.fmt, nullptr) < 0) return -3;

  const AVCodec* codec = nullptr;
  int sidx = av_find_best_stream(c.fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &codec, 0);
  if (sidx < 0 || !codec) return -4;
  AVStream* st = c.fmt->streams[sidx];

  c.dec = avcodec_alloc_context3(codec);
  if (!c.dec) return -5;
  if (avcodec_parameters_to_context(c.dec, st->codecpar) < 0) return -6;
  // Let the decoder honor mp4 edit lists / skip-samples side data so
  // encoder priming is trimmed (default behavior; flag kept explicit).
  c.dec->flags2 &= ~AV_CODEC_FLAG2_SKIP_MANUAL;
  if (avcodec_open2(c.dec, codec, nullptr) < 0) return -7;

  const int rate = c.dec->sample_rate;
  int channels = c.dec->ch_layout.nb_channels;
  if (rate <= 0 || channels <= 0 || channels > 32) return -8;

  AVChannelLayout layout;
  if (c.dec->ch_layout.order == AV_CHANNEL_ORDER_UNSPEC) {
    av_channel_layout_default(&layout, channels);
  } else {
    layout = c.dec->ch_layout;
  }
  if (swr_alloc_set_opts2(&c.swr, &layout, AV_SAMPLE_FMT_FLT, rate, &layout,
                          c.dec->sample_fmt, rate, 0, nullptr) < 0)
    return -9;
  if (swr_init(c.swr) < 0) return -9;

  c.pkt = av_packet_alloc();
  c.frame = av_frame_alloc();
  if (!c.pkt || !c.frame) return -10;

  std::vector<float> pcm;
  int rc;
  while ((rc = av_read_frame(c.fmt, c.pkt)) >= 0) {
    if (c.pkt->stream_index == sidx) {
      if (avcodec_send_packet(c.dec, c.pkt) == 0) {
        while (avcodec_receive_frame(c.dec, c.frame) == 0) {
          if (append_frame(c, c.frame, channels, pcm) < 0) {
            av_packet_unref(c.pkt);
            return -11;
          }
        }
      }
    }
    av_packet_unref(c.pkt);
  }
  // Flush the decoder.
  avcodec_send_packet(c.dec, nullptr);
  while (avcodec_receive_frame(c.dec, c.frame) == 0) {
    if (append_frame(c, c.frame, channels, pcm) < 0) return -11;
  }

  if (pcm.empty()) return -12;
  const int64_t frames = static_cast<int64_t>(pcm.size()) / channels;
  float* out = static_cast<float*>(malloc(pcm.size() * sizeof(float)));
  if (!out) return -13;
  memcpy(out, pcm.data(), pcm.size() * sizeof(float));
  *out_samples = out;
  *out_frames = frames;
  *out_channels = channels;
  *out_sample_rate = rate;
  return 0;
}

void va_m4a_free(float* p) { free(p); }

int va_m4a_encode_file(const char* path, const float* pcm, int64_t n,
                       int32_t rate) {
  if (!path || !pcm || n <= 0 || rate <= 0) return -1;

  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, "mp4", path) < 0 || !fmt)
    return -2;

  const AVCodec* codec = avcodec_find_encoder(AV_CODEC_ID_AAC);
  int ret = -3;
  AVCodecContext* enc = nullptr;
  AVStream* st = nullptr;
  AVFrame* frame = nullptr;
  AVPacket* pkt = nullptr;
  SwrContext* swr = nullptr;

  do {
    if (!codec) break;
    st = avformat_new_stream(fmt, nullptr);
    enc = avcodec_alloc_context3(codec);
    if (!st || !enc) break;
    enc->sample_rate = rate;
    av_channel_layout_default(&enc->ch_layout, 1);
    enc->sample_fmt = AV_SAMPLE_FMT_FLTP;  // native ffmpeg AAC encoder fmt
    enc->bit_rate = 96000;
    enc->time_base = AVRational{1, rate};
    if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
      enc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    ret = -4;
    if (avcodec_open2(enc, codec, nullptr) < 0) break;
    if (avcodec_parameters_from_context(st->codecpar, enc) < 0) break;
    st->time_base = enc->time_base;
    ret = -5;
    if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
        avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
      break;
    if (avformat_write_header(fmt, nullptr) < 0) break;

    frame = av_frame_alloc();
    pkt = av_packet_alloc();
    ret = -6;
    if (!frame || !pkt) break;
    const int fsz = enc->frame_size > 0 ? enc->frame_size : 1024;
    frame->format = AV_SAMPLE_FMT_FLTP;
    av_channel_layout_default(&frame->ch_layout, 1);
    frame->sample_rate = rate;
    frame->nb_samples = fsz;
    if (av_frame_get_buffer(frame, 0) < 0) break;

    ret = 0;
    int64_t pos = 0, pts = 0;
    bool flushed = false;
    while (!flushed && ret == 0) {
      AVFrame* send = nullptr;
      if (pos < n) {
        const int chunk = static_cast<int>(n - pos < fsz ? n - pos : fsz);
        if (av_frame_make_writable(frame) < 0) {
          ret = -7;
          break;
        }
        float* dst = reinterpret_cast<float*>(frame->data[0]);
        memcpy(dst, pcm + pos, chunk * sizeof(float));
        // Zero-pad the tail of the last frame.
        for (int i = chunk; i < fsz; ++i) dst[i] = 0.0f;
        frame->nb_samples = fsz;
        frame->pts = pts;
        pts += fsz;
        pos += chunk;
        send = frame;
      } else {
        flushed = true;  // nullptr send below flushes the encoder
      }
      if (avcodec_send_frame(enc, send) < 0) {
        ret = -8;
        break;
      }
      int r;
      while ((r = avcodec_receive_packet(enc, pkt)) == 0) {
        av_packet_rescale_ts(pkt, enc->time_base, st->time_base);
        pkt->stream_index = st->index;
        if (av_interleaved_write_frame(fmt, pkt) < 0) {
          ret = -9;
          break;
        }
      }
      if (r != AVERROR(EAGAIN) && r != AVERROR_EOF && ret == 0) ret = -10;
      if (r == AVERROR_EOF) break;
    }
    if (ret == 0 && av_write_trailer(fmt) < 0) ret = -11;
  } while (false);

  if (swr) swr_free(&swr);
  if (frame) av_frame_free(&frame);
  if (pkt) av_packet_free(&pkt);
  if (enc) avcodec_free_context(&enc);
  if (fmt) {
    if (!(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb) avio_closep(&fmt->pb);
    avformat_free_context(fmt);
  }
  return ret;
}

}  // extern "C"
