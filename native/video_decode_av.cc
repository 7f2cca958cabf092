// Universal video decode engine over FFmpeg's libav* (H.264/mp4 and every
// other demuxer/codec the system libavformat/libavcodec 5.1 ship).
//
// The MJPEG-AVI engine (video_decode.cc) covers the synthetic-test format;
// the real datasets are H.264 mp4 (`/root/reference/folder_structure.php:5-18`
// `video.mp4`), which previously fell back to the cv2 Python loop
// (BGR->RGB cvtColor + resize + /255 as separate numpy passes per frame,
// `/root/repo/multimodal_deepfake_detection_tpu/data/video_enhanced.py::_decode_video`).
// This engine fuses decode -> scale -> RGB24 (one sws_scale) -> float32/255
// straight into the caller's batch buffer, entirely GIL-free, with
// libavcodec's internal frame threading.
//
// C ABI (ctypes, data/native_video.py):
//   vdav_probe(path, *w, *h)                  -> estimated frame count or -1
//   vdav_decode_f32(path, max_frames, out_w, out_h, out, threads)
//       out: float32 [max_frames, out_h, out_w, 3]; returns frames written
//       (0..max_frames) or -1 when the file cannot be opened/decoded.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

namespace {

struct AvReader {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* ctx = nullptr;
  int stream = -1;

  bool open(const char* path, int threads) {
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) return false;
    if (avformat_find_stream_info(fmt, nullptr) < 0) return false;
    stream = av_find_best_stream(fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
    if (stream < 0) return false;
    const AVCodec* dec =
        avcodec_find_decoder(fmt->streams[stream]->codecpar->codec_id);
    if (!dec) return false;
    ctx = avcodec_alloc_context3(dec);
    if (!ctx) return false;
    if (avcodec_parameters_to_context(ctx, fmt->streams[stream]->codecpar) < 0)
      return false;
    ctx->thread_count = threads > 0 ? threads : 0;  // 0 = auto
    ctx->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
    return avcodec_open2(ctx, dec, nullptr) >= 0;
  }

  ~AvReader() {
    if (ctx) avcodec_free_context(&ctx);
    if (fmt) avformat_close_input(&fmt);
  }
};

}  // namespace

extern "C" int64_t vdav_probe(const char* path, int32_t* w, int32_t* h) {
  AvReader r;
  if (!r.open(path, 1)) return -1;
  AVStream* s = r.fmt->streams[r.stream];
  if (w) *w = r.ctx->width;
  if (h) *h = r.ctx->height;
  if (s->nb_frames > 0) return s->nb_frames;
  // estimate from duration * fps when the container doesn't store a count
  if (s->duration > 0 && s->avg_frame_rate.num > 0 && s->avg_frame_rate.den > 0) {
    double sec = s->duration * av_q2d(s->time_base);
    return (int64_t)(sec * av_q2d(s->avg_frame_rate) + 0.5);
  }
  return 0;
}

extern "C" int64_t vdav_decode_f32(const char* path, int64_t max_frames,
                                   int32_t out_w, int32_t out_h, float* out,
                                   int32_t threads) {
  if (max_frames <= 0 || out_w <= 0 || out_h <= 0 || !out) return -1;
  AvReader r;
  if (!r.open(path, threads)) return -1;

  SwsContext* sws = nullptr;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frm = av_frame_alloc();
  std::vector<uint8_t> rgb((size_t)out_w * out_h * 3);
  int64_t n = 0;
  const float scale = 1.0f / 255.0f;

  auto emit = [&](AVFrame* f) {
    if (n >= max_frames) return;
    sws = sws_getCachedContext(sws, f->width, f->height, (AVPixelFormat)f->format,
                               out_w, out_h, AV_PIX_FMT_RGB24, SWS_BILINEAR,
                               nullptr, nullptr, nullptr);
    if (!sws) return;
    uint8_t* dst[1] = {rgb.data()};
    int dst_stride[1] = {out_w * 3};
    sws_scale(sws, f->data, f->linesize, 0, f->height, dst, dst_stride);
    float* o = out + (size_t)n * out_w * out_h * 3;
    const size_t count = (size_t)out_w * out_h * 3;
    for (size_t i = 0; i < count; ++i) o[i] = rgb[i] * scale;
    ++n;
  };

  bool ok = true;
  while (n < max_frames && av_read_frame(r.fmt, pkt) >= 0) {
    if (pkt->stream_index == r.stream) {
      if (avcodec_send_packet(r.ctx, pkt) == 0) {
        while (n < max_frames && avcodec_receive_frame(r.ctx, frm) == 0) emit(frm);
      }
    }
    av_packet_unref(pkt);
  }
  if (n < max_frames) {  // drain the decoder
    avcodec_send_packet(r.ctx, nullptr);
    while (n < max_frames && avcodec_receive_frame(r.ctx, frm) == 0) emit(frm);
  }
  (void)ok;

  if (sws) sws_freeContext(sws);
  av_frame_free(&frm);
  av_packet_free(&pkt);
  return n;
}

// Test-only H.264/mp4 author: lets the test suite and the decode benchmark
// generate REAL H.264 content in-image (cv2's bundled ffmpeg has no H.264
// encoder, the system libavcodec links libx264). rgb: uint8 [T, h, w, 3].
// Returns frames written or -1.
extern "C" int64_t vdav_encode_test(const char* path, const uint8_t* rgb,
                                    int64_t T, int32_t w, int32_t h,
                                    const char* codec_name) {
  const AVCodec* enc = avcodec_find_encoder_by_name(
      codec_name && codec_name[0] ? codec_name : "libx264");
  if (!enc) enc = avcodec_find_encoder_by_name("mpeg4");
  if (!enc) return -1;

  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, "mp4", path) < 0) return -1;
  AVStream* st = avformat_new_stream(fmt, nullptr);
  AVCodecContext* ctx = avcodec_alloc_context3(enc);
  ctx->width = w;
  ctx->height = h;
  ctx->time_base = {1, 25};
  ctx->framerate = {25, 1};
  ctx->pix_fmt = AV_PIX_FMT_YUV420P;
  ctx->gop_size = 12;
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER)
    ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  int64_t written = -1;
  SwsContext* sws = nullptr;
  AVFrame* yuv = nullptr;
  AVPacket* pkt = nullptr;
  if (avcodec_open2(ctx, enc, nullptr) < 0) goto done;
  avcodec_parameters_from_context(st->codecpar, ctx);
  st->time_base = ctx->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE) &&
      avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0)
    goto done;
  if (avformat_write_header(fmt, nullptr) < 0) goto done;

  sws = sws_getContext(w, h, AV_PIX_FMT_RGB24, w, h, AV_PIX_FMT_YUV420P,
                       SWS_BILINEAR, nullptr, nullptr, nullptr);
  yuv = av_frame_alloc();
  yuv->format = AV_PIX_FMT_YUV420P;
  yuv->width = w;
  yuv->height = h;
  av_frame_get_buffer(yuv, 0);
  pkt = av_packet_alloc();
  written = 0;
  for (int64_t t = 0; t <= T; ++t) {
    AVFrame* send = nullptr;
    if (t < T) {
      const uint8_t* src[1] = {rgb + (size_t)t * w * h * 3};
      int src_stride[1] = {w * 3};
      av_frame_make_writable(yuv);
      sws_scale(sws, src, src_stride, 0, h, yuv->data, yuv->linesize);
      yuv->pts = t;
      send = yuv;
    }
    if (avcodec_send_frame(ctx, send) < 0) break;  // nullptr = flush
    while (avcodec_receive_packet(ctx, pkt) == 0) {
      av_packet_rescale_ts(pkt, ctx->time_base, st->time_base);
      pkt->stream_index = st->index;
      av_interleaved_write_frame(fmt, pkt);
      ++written;
    }
  }
  av_write_trailer(fmt);

done:
  if (sws) sws_freeContext(sws);
  if (yuv) av_frame_free(&yuv);
  if (pkt) av_packet_free(&pkt);
  avcodec_free_context(&ctx);
  if (fmt && !(fmt->oformat->flags & AVFMT_NOFILE) && fmt->pb) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return written;
}
