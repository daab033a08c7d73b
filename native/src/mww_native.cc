// Native runtime components for microwakeword_tpu.
//
// TPU-native equivalents of the reference's external C/C++ dependencies
// (SURVEY.md §2.2): mmap_ninja's ragged access (reference data.py:25,190),
// libsndfile/soxr audio decode+resample (reference clips.py:136-143), and
// webrtcvad silence trimming (reference audio_utils.py:99-140).  The hot
// device path is JAX/XLA/Pallas; this library covers the host-side runtime
// around it: batched window assembly for evaluation, audio ingest, and
// offline data prep.  Exposed as a C ABI consumed via ctypes
// (microwakeword_tpu/native.py).
//
// Build: `make -C native` -> native/libmwwnative.so

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Ragged window gather
// ---------------------------------------------------------------------------

// Gathers B fixed-length windows from a ragged [total_frames, n_feat] uint16
// store (memory-mapped by the caller) into out [B, length, n_feat] float32,
// scaled by `scale` (0.0390625 for the frontend convention) and zero-padded
// where the clip is shorter than the window.  starts[i] is the first frame
// of window i within clip clip_idx[i] (truncation strategy is resolved by
// the caller); a negative start left-pads with zeros.
void mww_gather_windows(const uint16_t* data, const int64_t* offsets,
                        int64_t n_clips, int n_feat, const int32_t* clip_idx,
                        const int32_t* starts, int64_t batch, int length,
                        float scale, float* out, int n_threads) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  n_threads = static_cast<int>(
      std::min<int64_t>(n_threads, std::max<int64_t>(batch, 1)));

  auto worker = [&](int64_t b0, int64_t b1) {
    for (int64_t b = b0; b < b1; ++b) {
      const int64_t ci = clip_idx[b];
      float* dst = out + b * static_cast<int64_t>(length) * n_feat;
      if (ci < 0 || ci >= n_clips) {
        std::memset(dst, 0, sizeof(float) * length * n_feat);
        continue;
      }
      const int64_t clip_begin = offsets[ci];
      const int64_t clip_len = offsets[ci + 1] - clip_begin;
      const int64_t start = starts[b];
      for (int64_t r = 0; r < length; ++r) {
        const int64_t src_row = start + r;
        float* drow = dst + r * n_feat;
        if (src_row < 0 || src_row >= clip_len) {
          std::memset(drow, 0, sizeof(float) * n_feat);
          continue;
        }
        const uint16_t* srow = data + (clip_begin + src_row) * n_feat;
        for (int f = 0; f < n_feat; ++f) drow[f] = srow[f] * scale;
      }
    }
  };

  if (n_threads == 1) {
    worker(0, batch);
    return;
  }
  std::vector<std::thread> threads;
  const int64_t per = (batch + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t b0 = t * per;
    const int64_t b1 = std::min<int64_t>(b0 + per, batch);
    if (b0 >= b1) break;
    threads.emplace_back(worker, b0, b1);
  }
  for (auto& th : threads) th.join();
}

// ---------------------------------------------------------------------------
// WAV decode (PCM 8/16/24/32-bit and IEEE float32) + mono mix
// ---------------------------------------------------------------------------

namespace {

struct WavInfo {
  int rate = 0;
  int channels = 0;
  int bits = 0;
  int is_float = 0;
  int64_t n_frames = 0;  // per channel
  int64_t data_off = 0;
  int64_t data_bytes = 0;
};

bool read_wav_header(FILE* f, WavInfo* info) {
  char id[4];
  uint32_t sz;
  if (fread(id, 1, 4, f) != 4 || std::memcmp(id, "RIFF", 4) != 0) return false;
  if (fread(&sz, 4, 1, f) != 1) return false;
  if (fread(id, 1, 4, f) != 4 || std::memcmp(id, "WAVE", 4) != 0) return false;
  bool have_fmt = false;
  uint16_t fmt_tag = 0, channels = 0, bits = 0;
  uint32_t rate = 0;
  while (fread(id, 1, 4, f) == 4 && fread(&sz, 4, 1, f) == 1) {
    if (std::memcmp(id, "fmt ", 4) == 0) {
      uint8_t buf[40];
      uint32_t n = sz < sizeof(buf) ? sz : static_cast<uint32_t>(sizeof(buf));
      if (fread(buf, 1, n, f) != n) return false;
      if (sz > n && fseek(f, sz - n, SEEK_CUR) != 0) return false;
      std::memcpy(&fmt_tag, buf + 0, 2);
      std::memcpy(&channels, buf + 2, 2);
      std::memcpy(&rate, buf + 4, 4);
      std::memcpy(&bits, buf + 14, 2);
      if (fmt_tag == 0xFFFE && sz >= 26) {  // WAVE_FORMAT_EXTENSIBLE
        uint16_t sub;
        std::memcpy(&sub, buf + 24, 2);
        fmt_tag = sub;
      }
      have_fmt = true;
    } else if (std::memcmp(id, "data", 4) == 0) {
      info->data_off = ftell(f);
      info->data_bytes = sz;
      if (fseek(f, (sz + 1) & ~1u, SEEK_CUR) != 0) break;  // chunks are padded
    } else {
      if (fseek(f, (sz + 1) & ~1u, SEEK_CUR) != 0) break;
    }
  }
  if (!have_fmt || info->data_off == 0 || channels == 0 || bits == 0)
    return false;
  info->rate = rate;
  info->channels = channels;
  info->bits = bits;
  info->is_float = (fmt_tag == 3) ? 1 : 0;
  if (fmt_tag != 1 && fmt_tag != 3) return false;  // PCM or IEEE float only
  info->n_frames = info->data_bytes / (channels * (bits / 8));
  return true;
}

}  // namespace

int mww_wav_info(const char* path, int* rate, int* channels, int* bits,
                 int64_t* n_frames, int* is_float) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  const bool ok = read_wav_header(f, &info);
  fclose(f);
  if (!ok) return -2;
  *rate = info.rate;
  *channels = info.channels;
  *bits = info.bits;
  *n_frames = info.n_frames;
  *is_float = info.is_float;
  return 0;
}

// Decodes to mono float32 in [-1, 1] (channel mean).  `out` must hold
// n_frames floats (from mww_wav_info).  Returns frames written or <0.
int64_t mww_wav_read_mono_f32(const char* path, float* out,
                              int64_t max_frames) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  WavInfo info;
  if (!read_wav_header(f, &info)) {
    fclose(f);
    return -2;
  }
  if (fseek(f, info.data_off, SEEK_SET) != 0) {
    fclose(f);
    return -3;
  }
  const int ch = info.channels;
  const int bytes = info.bits / 8;
  const int64_t frames = std::min<int64_t>(info.n_frames, max_frames);
  const int64_t kChunkFrames = 65536;
  std::vector<uint8_t> buf(kChunkFrames * ch * bytes);
  int64_t done = 0;
  while (done < frames) {
    const int64_t want = std::min<int64_t>(kChunkFrames, frames - done);
    const size_t got = fread(buf.data(), ch * bytes, want, f);
    if (got == 0) break;
    for (size_t i = 0; i < got; ++i) {
      float acc = 0.f;
      for (int c = 0; c < ch; ++c) {
        const uint8_t* p = buf.data() + (i * ch + c) * bytes;
        float v = 0.f;
        if (info.is_float && info.bits == 32) {
          std::memcpy(&v, p, 4);
        } else if (info.bits == 16) {
          int16_t s;
          std::memcpy(&s, p, 2);
          v = s / 32768.f;
        } else if (info.bits == 32) {
          int32_t s;
          std::memcpy(&s, p, 4);
          v = s / 2147483648.f;
        } else if (info.bits == 24) {
          int32_t s = (p[0] << 8) | (p[1] << 16) |
                      (static_cast<int32_t>(static_cast<int8_t>(p[2])) << 24);
          v = (s >> 8) / 8388608.f;
        } else if (info.bits == 8) {
          v = (p[0] - 128) / 128.f;
        }
        acc += v;
      }
      out[done + i] = acc / ch;
    }
    done += got;
  }
  fclose(f);
  return done;
}

int mww_wav_write_16k_i16(const char* path, const int16_t* samples,
                          int64_t n, int rate) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  const uint32_t data_bytes = static_cast<uint32_t>(n * 2);
  const uint32_t riff = 36 + data_bytes;
  const uint16_t fmt_tag = 1, channels = 1, bits = 16, block = 2;
  const uint32_t byte_rate = rate * 2;
  const uint32_t fmt_size = 16;
  fwrite("RIFF", 1, 4, f);
  fwrite(&riff, 4, 1, f);
  fwrite("WAVE", 1, 4, f);
  fwrite("fmt ", 1, 4, f);
  fwrite(&fmt_size, 4, 1, f);
  fwrite(&fmt_tag, 2, 1, f);
  fwrite(&channels, 2, 1, f);
  fwrite(&rate, 4, 1, f);
  fwrite(&byte_rate, 4, 1, f);
  fwrite(&block, 2, 1, f);
  fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f);
  fwrite(&data_bytes, 4, 1, f);
  fwrite(samples, 2, n, f);
  fclose(f);
  return 0;
}

// ---------------------------------------------------------------------------
// Polyphase resampler (kaiser-windowed sinc, scipy resample_poly-compatible
// defaults: half_len = 10 * max(up, down), beta = 5.0)
// ---------------------------------------------------------------------------

namespace {

double bessel_i0(double x) {
  // Series expansion; converges quickly for the beta range used here.
  double sum = 1.0, term = 1.0;
  const double x2 = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= x2 / (static_cast<double>(k) * k);
    sum += term;
    if (term < 1e-18 * sum) break;
  }
  return sum;
}

}  // namespace

int64_t mww_resample_len(int64_t n_in, int up, int down) {
  return (n_in * up + down - 1) / down;
}

// Polyphase rational resampling in->out by up/down.  Matches
// scipy.signal.resample_poly's filter design (kaiser beta 5.0,
// half_len 10*max(up,down)) so outputs agree to ~1e-6.
void mww_resample_poly(const float* in, int64_t n_in, int up, int down,
                       float* out) {
  if (up == down) {
    std::memcpy(out, in, sizeof(float) * n_in);
    return;
  }
  const int max_rate = std::max(up, down);
  const int half_len = 10 * max_rate;
  const int n_taps = 2 * half_len + 1;
  const double fc = 1.0 / max_rate;  // cutoff in Nyquist units of up-rate
  const double beta = 5.0;
  std::vector<double> h(n_taps);
  const double i0b = bessel_i0(beta);
  double dc = 0.0;
  for (int i = 0; i < n_taps; ++i) {
    const double m = i - half_len;
    const double sinc =
        (m == 0) ? fc : std::sin(M_PI * fc * m) / (M_PI * m);
    const double r = 2.0 * i / (n_taps - 1) - 1.0;
    const double kais = bessel_i0(beta * std::sqrt(std::max(0.0, 1 - r * r))) / i0b;
    h[i] = sinc * kais;
    dc += h[i];
  }
  // firwin(scale=True) unity DC gain, then the polyphase `up` gain.
  for (int i = 0; i < n_taps; ++i) h[i] *= up / dc;
  const int64_t n_out = mww_resample_len(n_in, up, down);
  // y[j] = sum_k h[k] * x_up[j*down - k + half_len], x_up zero-stuffed.
  for (int64_t j = 0; j < n_out; ++j) {
    const int64_t center = j * down;  // position in upsampled stream
    double acc = 0.0;
    // x_up index i_up = center + half_len - k must satisfy i_up % up == 0.
    const int64_t i_up_max = center + half_len;
    // smallest k with (i_up_max - k) % up == 0 and k >= 0:
    int64_t k0 = i_up_max % up;
    for (int64_t k = k0; k < n_taps; k += up) {
      const int64_t i_up = i_up_max - k;
      const int64_t i_in = i_up / up;
      if (i_in < 0 || i_in >= n_in) continue;
      acc += h[k] * in[i_in];
    }
    out[j] = static_cast<float>(acc);
  }
}

// ---------------------------------------------------------------------------
// Energy VAD (adaptive threshold; interface of audio/vad.py remove_silence)
// ---------------------------------------------------------------------------

namespace {

double percentile(std::vector<double> v, double q) {
  if (v.empty()) return 0.0;
  std::sort(v.begin(), v.end());
  const double pos = q / 100.0 * (v.size() - 1);
  const size_t lo = static_cast<size_t>(pos);
  const size_t hi = std::min(lo + 1, v.size() - 1);
  const double frac = pos - lo;
  return v[lo] * (1 - frac) + v[hi] * frac;
}

}  // namespace

// Trims non-voiced frames.  in/out float32; returns samples written.
// Mirrors microwakeword_tpu/audio/vad.py remove_silence (numpy reference).
int64_t mww_remove_silence_f32(const float* in, int64_t n, int step,
                               int64_t min_start, double threshold_ratio,
                               float* out) {
  const int64_t head = std::min<int64_t>(min_start, n);
  std::memcpy(out, in, sizeof(float) * head);
  int64_t written = head;
  if (n <= min_start + step) return written;
  const float* body = in + min_start;
  const int64_t body_n = n - min_start;
  const int64_t n_frames = body_n / step;
  if (n_frames == 0) return written;
  std::vector<double> rms(n_frames);
  for (int64_t i = 0; i < n_frames; ++i) {
    const float* p = body + i * step;
    double mean = 0.0;
    for (int s = 0; s < step; ++s) mean += p[s];
    mean /= step;
    double acc = 0.0;
    for (int s = 0; s < step; ++s) {
      const double d = static_cast<double>(p[s]) - mean;
      acc += d * d;
    }
    rms[i] = std::sqrt(acc / step);
  }
  const double noise_floor = percentile(rms, 10.0);
  // permissive 1.75x floor multiplier; see audio/vad.py remove_silence
  const double thresh =
      std::max(noise_floor * 1.75, threshold_ratio * percentile(rms, 90.0));
  for (int64_t i = 0; i < n_frames; ++i) {
    if (rms[i] > thresh) {
      std::memcpy(out + written, body + i * step, sizeof(float) * step);
      written += step;
    }
  }
  return written;
}

}  // extern "C"
