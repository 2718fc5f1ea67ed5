// iq_file — native IQ capture/replay runtime for sdr_tpu.
//
// The reference has no IO layer at all (its demo synthesizes bytes in
// the GUI timer, QFDemoWindow.cpp:201-224); a deployable SDR framework
// needs one, and it belongs on the host in native code: the format is
// raw interleaved int16 IQ ("SC16" — the de-facto capture format of
// USRP/rtl-sdr/PlutoSDR toolchains), and the hot loop is int16<->float
// conversion plus disk IO that should never touch the Python
// interpreter per sample.
//
// Two surfaces, both C-ABI for ctypes (no pybind11 in this image):
//   - one-shot write/read with scaling + saturation, and
//   - SdrIqReader: a producer-thread frame loader that prefetches and
//     converts the next frames while the device computes the current
//     one (double-buffered queue, optional wrap-around looping) — the
//     native data-loader role.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

inline int16_t sat16(float v) {
  if (v > 32767.0f) return 32767;
  if (v < -32768.0f) return -32768;
  return static_cast<int16_t>(v >= 0.0f ? v + 0.5f : v - 0.5f);
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// One-shot write / read (interleaved float32 re,im <-> SC16 file)
// ---------------------------------------------------------------------------

// Writes n complex samples (2n floats, interleaved re/im) scaled by
// `scale` with saturation. Returns n on success, -1 on IO failure.
long long sdr_iq_write(const char* path, const float* iq, size_t n,
                       float scale) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  std::vector<int16_t> buf;
  const size_t chunk = 1 << 16;
  for (size_t off = 0; off < 2 * n; off += chunk) {
    const size_t m = (2 * n - off) < chunk ? (2 * n - off) : chunk;
    buf.resize(m);
    for (size_t i = 0; i < m; ++i) buf[i] = sat16(iq[off + i] * scale);
    if (std::fwrite(buf.data(), sizeof(int16_t), m, f) != m) {
      std::fclose(f);
      return -1;
    }
  }
  std::fclose(f);
  return static_cast<long long>(n);
}

// Complex-sample count from the file size (-1 if unreadable).
long long sdr_iq_info(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long sz = std::ftell(f);
  std::fclose(f);
  return sz < 0 ? -1 : sz / (2 * static_cast<long>(sizeof(int16_t)));
}

// Reads n complex samples starting at complex offset `off` into 2n
// floats, multiplied by `inv_scale` (pass 1/scale used at write time).
// Returns samples read (may be short at EOF), -1 on failure.
long long sdr_iq_read(const char* path, size_t off, size_t n, float* out,
                      float inv_scale) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  if (std::fseek(f, static_cast<long>(off * 2 * sizeof(int16_t)),
                 SEEK_SET) != 0) {
    std::fclose(f);
    return -1;
  }
  std::vector<int16_t> buf(2 * n);
  const size_t got = std::fread(buf.data(), sizeof(int16_t), 2 * n, f);
  std::fclose(f);
  for (size_t i = 0; i < got; ++i)
    out[i] = static_cast<float>(buf[i]) * inv_scale;
  return static_cast<long long>(got / 2);
}

// ---------------------------------------------------------------------------
// Threaded prefetching frame reader (the native data loader)
// ---------------------------------------------------------------------------

struct SdrIqReader {
  std::string path;
  size_t frame;       // complex samples per frame
  float inv_scale;
  int loop;           // wrap at EOF instead of stopping
  size_t depth;       // queue depth (frames prefetched ahead)

  std::thread worker;
  std::mutex mu;
  std::condition_variable cv_pop, cv_push;
  std::deque<std::vector<float>> q;
  bool eof = false;
  bool stop = false;

  void run() {
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f) {
      std::lock_guard<std::mutex> g(mu);
      eof = true;
      cv_pop.notify_all();
      return;
    }
    std::vector<int16_t> raw(2 * frame);
    for (;;) {
      size_t got = std::fread(raw.data(), sizeof(int16_t), 2 * frame, f);
      if (got < 2 * frame) {
        if (loop) {
          std::fseek(f, 0, SEEK_SET);
          got += std::fread(raw.data() + got, sizeof(int16_t),
                            2 * frame - got, f);
        }
        if (got < 2 * frame) {  // genuinely exhausted (or empty file)
          std::lock_guard<std::mutex> g(mu);
          eof = true;
          cv_pop.notify_all();
          break;
        }
      }
      std::vector<float> fr(2 * frame);
      for (size_t i = 0; i < 2 * frame; ++i)
        fr[i] = static_cast<float>(raw[i]) * inv_scale;
      std::unique_lock<std::mutex> lk(mu);
      cv_push.wait(lk, [&] { return q.size() < depth || stop; });
      if (stop) break;
      q.push_back(std::move(fr));
      cv_pop.notify_one();
    }
    std::fclose(f);
  }
};

SdrIqReader* sdr_iq_reader_open(const char* path, size_t frame,
                                float inv_scale, int loop, size_t depth) {
  if (frame == 0) return nullptr;
  auto* r = new SdrIqReader();
  r->path = path;
  r->frame = frame;
  r->inv_scale = inv_scale;
  r->loop = loop;
  r->depth = depth < 1 ? 1 : depth;
  r->worker = std::thread([r] { r->run(); });
  return r;
}

// Pops one frame (2*frame floats) into out. Returns 1 on success,
// 0 at end-of-stream (non-loop readers after the file is drained).
int sdr_iq_reader_next(SdrIqReader* r, float* out) {
  std::unique_lock<std::mutex> lk(r->mu);
  r->cv_pop.wait(lk, [&] { return !r->q.empty() || r->eof; });
  if (r->q.empty()) return 0;
  std::vector<float> fr = std::move(r->q.front());
  r->q.pop_front();
  r->cv_push.notify_one();
  lk.unlock();
  std::memcpy(out, fr.data(), fr.size() * sizeof(float));
  return 1;
}

void sdr_iq_reader_close(SdrIqReader* r) {
  {
    std::lock_guard<std::mutex> g(r->mu);
    r->stop = true;
    r->cv_push.notify_all();
  }
  if (r->worker.joinable()) r->worker.join();
  delete r;
}

}  // extern "C"
