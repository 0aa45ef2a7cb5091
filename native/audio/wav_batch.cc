// Native audio decode + batch assembly (the reference's SoX-equivalent
// runtime component — SURVEY.md §2 "NATIVE: SoX / audio codecs").
//
// Decodes RIFF/WAVE PCM16 / PCM32 / float32 (first channel of multi-channel
// files) into float32 [-1, 1) with EXACTLY the same arithmetic as the python
// reader (aas_enhancement_tpu/data/wav.py:45-52): int16/32768.0f,
// int32 -> float -> /2147483648.0f, f32 passthrough — so the native and
// python paths are bit-identical and interchangeable.
//
// wav_batch_decode packs B files into a caller-allocated [B, bucket] float32
// batch in parallel (one thread per core up to n_threads), writing per-row
// valid lengths — the host-side hot loop of the training input pipeline
// (data/dataset.py make_batch).
//
// Exposed via ctypes (no pybind11 in this image): plain C ABI, caller owns
// all memory, no exceptions cross the boundary.

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Chunk {
  const uint8_t* body;
  uint32_t size;
};

// Little-endian loads (portable regardless of host alignment rules).
inline uint16_t ld16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0] | (p[1] << 8));
}
inline uint32_t ld32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}

// Decode one file. Returns the number of samples written to out (<= max_n),
// or a negative error: -1 io, -2 not riff/wave, -3 missing chunk,
// -4 unsupported format, -5 sample-rate mismatch.
long decode_one(const char* path, float* out, long max_n, int expected_sr,
                int* sr_out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (fsize < 12) { std::fclose(f); return -2; }
  std::vector<uint8_t> data(static_cast<size_t>(fsize));
  if (std::fread(data.data(), 1, data.size(), f) != data.size()) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  if (std::memcmp(data.data(), "RIFF", 4) != 0 ||
      std::memcmp(data.data() + 8, "WAVE", 4) != 0)
    return -2;

  Chunk fmt{nullptr, 0}, pcm{nullptr, 0};
  size_t pos = 12;
  while (pos + 8 <= data.size()) {
    const uint8_t* hdr = data.data() + pos;
    uint32_t sz = ld32(hdr + 4);
    if (pos + 8 + sz > data.size()) sz = static_cast<uint32_t>(data.size() - pos - 8);
    if (std::memcmp(hdr, "fmt ", 4) == 0) fmt = {hdr + 8, sz};
    else if (std::memcmp(hdr, "data", 4) == 0) pcm = {hdr + 8, sz};
    pos += 8 + sz + (sz & 1);  // chunks are word-aligned
  }
  if (!fmt.body || !pcm.body || fmt.size < 16) return -3;

  uint16_t audio_fmt = ld16(fmt.body);
  uint16_t n_ch = ld16(fmt.body + 2);
  uint32_t sr = ld32(fmt.body + 4);
  uint16_t bits = ld16(fmt.body + 14);
  if (n_ch == 0) return -4;
  if (sr_out) *sr_out = static_cast<int>(sr);
  if (expected_sr > 0 && static_cast<int>(sr) != expected_sr) return -5;

  const uint8_t* p = pcm.body;
  long n;  // mono samples available (first channel)
  if (audio_fmt == 1 && bits == 16) {
    n = static_cast<long>(pcm.size / (2 * n_ch));
    if (n > max_n) n = max_n;
    for (long i = 0; i < n; ++i) {
      int16_t s = static_cast<int16_t>(ld16(p + 2 * static_cast<size_t>(i) * n_ch));
      out[i] = static_cast<float>(s) / 32768.0f;
    }
  } else if (audio_fmt == 1 && bits == 32) {
    n = static_cast<long>(pcm.size / (4 * n_ch));
    if (n > max_n) n = max_n;
    for (long i = 0; i < n; ++i) {
      int32_t s = static_cast<int32_t>(ld32(p + 4 * static_cast<size_t>(i) * n_ch));
      out[i] = static_cast<float>(s) / 2147483648.0f;
    }
  } else if (audio_fmt == 3 && bits == 32) {
    n = static_cast<long>(pcm.size / (4 * n_ch));
    if (n > max_n) n = max_n;
    for (long i = 0; i < n; ++i) {
      uint32_t u = ld32(p + 4 * static_cast<size_t>(i) * n_ch);
      float v;
      std::memcpy(&v, &u, 4);
      out[i] = v;
    }
  } else {
    return -4;
  }
  return n;
}

// int16 variant: PCM16 is a direct (strided) copy — no float round-trip at
// all; PCM32/float32 follow the python chain read_wav -> *32768 -> clip ->
// rint (data/dataset.py _to_int16) so both transports agree bit-for-bit.
long decode_one_i16(const char* path, int16_t* out, long max_n,
                    int expected_sr) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (fsize < 12) { std::fclose(f); return -2; }
  std::vector<uint8_t> data(static_cast<size_t>(fsize));
  if (std::fread(data.data(), 1, data.size(), f) != data.size()) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  if (std::memcmp(data.data(), "RIFF", 4) != 0 ||
      std::memcmp(data.data() + 8, "WAVE", 4) != 0)
    return -2;

  Chunk fmt{nullptr, 0}, pcm{nullptr, 0};
  size_t pos = 12;
  while (pos + 8 <= data.size()) {
    const uint8_t* hdr = data.data() + pos;
    uint32_t sz = ld32(hdr + 4);
    if (pos + 8 + sz > data.size()) sz = static_cast<uint32_t>(data.size() - pos - 8);
    if (std::memcmp(hdr, "fmt ", 4) == 0) fmt = {hdr + 8, sz};
    else if (std::memcmp(hdr, "data", 4) == 0) pcm = {hdr + 8, sz};
    pos += 8 + sz + (sz & 1);
  }
  if (!fmt.body || !pcm.body || fmt.size < 16) return -3;

  uint16_t audio_fmt = ld16(fmt.body);
  uint16_t n_ch = ld16(fmt.body + 2);
  uint32_t sr = ld32(fmt.body + 4);
  uint16_t bits = ld16(fmt.body + 14);
  if (n_ch == 0) return -4;
  if (expected_sr > 0 && static_cast<int>(sr) != expected_sr) return -5;

  const uint8_t* p = pcm.body;
  auto quantize = [](float v) -> int16_t {
    v *= 32768.0f;
    if (v > 32767.0f) v = 32767.0f;
    if (v < -32768.0f) v = -32768.0f;
    return static_cast<int16_t>(std::lrintf(v));
  };
  long n;
  if (audio_fmt == 1 && bits == 16) {
    n = static_cast<long>(pcm.size / (2 * n_ch));
    if (n > max_n) n = max_n;
    if (n_ch == 1) {
      std::memcpy(out, p, static_cast<size_t>(n) * 2);
    } else {
      for (long i = 0; i < n; ++i)
        out[i] = static_cast<int16_t>(ld16(p + 2 * static_cast<size_t>(i) * n_ch));
    }
  } else if (audio_fmt == 1 && bits == 32) {
    n = static_cast<long>(pcm.size / (4 * n_ch));
    if (n > max_n) n = max_n;
    for (long i = 0; i < n; ++i) {
      int32_t s = static_cast<int32_t>(ld32(p + 4 * static_cast<size_t>(i) * n_ch));
      out[i] = quantize(static_cast<float>(s) / 2147483648.0f);
    }
  } else if (audio_fmt == 3 && bits == 32) {
    n = static_cast<long>(pcm.size / (4 * n_ch));
    if (n > max_n) n = max_n;
    for (long i = 0; i < n; ++i) {
      uint32_t u = ld32(p + 4 * static_cast<size_t>(i) * n_ch);
      float v;
      std::memcpy(&v, &u, 4);
      out[i] = quantize(v);
    }
  } else {
    return -4;
  }
  return n;
}

}  // namespace

extern "C" {

// Single-file decode into out[0:max_n]; remaining samples are NOT zeroed.
// Returns valid sample count or negative error (see decode_one).
long wav_decode(const char* path, float* out, long max_n, int expected_sr,
                int* sr_out) {
  return decode_one(path, out, max_n, expected_sr, sr_out);
}

// Parallel batch decode: paths[b] -> out[b * bucket : b * bucket + bucket]
// (zero-padded), lengths[b] = valid samples.  Returns 0 on success or
// -(first_failed_index + 1).  n_threads <= 0 means hardware concurrency.
int wav_batch_decode(const char** paths, int b, long bucket, int expected_sr,
                     float* out, int* lengths, int n_threads) {
  if (b <= 0 || bucket <= 0) return 0;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  int nt = n_threads > 0 ? n_threads : hw;
  if (nt > b) nt = b;

  std::atomic<int> next{0};
  std::atomic<int> failed{0};  // 0 = ok, else index+1 of first failure

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= b || failed.load(std::memory_order_relaxed)) return;
      float* row = out + static_cast<size_t>(i) * bucket;
      std::memset(row, 0, static_cast<size_t>(bucket) * sizeof(float));
      long n = decode_one(paths[i], row, bucket, expected_sr, nullptr);
      if (n < 0) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        return;
      }
      lengths[i] = static_cast<int>(n);
    }
  };

  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(static_cast<size_t>(nt));
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return -failed.load();
}

// int16-output batch decode (see decode_one_i16): PCM16 corpora pack with a
// plain strided copy — the zero-copy transport for DataConfig.feed_dtype=int16.
int wav_batch_decode_i16(const char** paths, int b, long bucket,
                         int expected_sr, int16_t* out, int* lengths,
                         int n_threads) {
  if (b <= 0 || bucket <= 0) return 0;
  int hw = static_cast<int>(std::thread::hardware_concurrency());
  if (hw <= 0) hw = 4;
  int nt = n_threads > 0 ? n_threads : hw;
  if (nt > b) nt = b;

  std::atomic<int> next{0};
  std::atomic<int> failed{0};

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= b || failed.load(std::memory_order_relaxed)) return;
      int16_t* row = out + static_cast<size_t>(i) * bucket;
      std::memset(row, 0, static_cast<size_t>(bucket) * sizeof(int16_t));
      long n = decode_one_i16(paths[i], row, bucket, expected_sr);
      if (n < 0) {
        int expected = 0;
        failed.compare_exchange_strong(expected, i + 1);
        return;
      }
      lengths[i] = static_cast<int>(n);
    }
  };

  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    threads.reserve(static_cast<size_t>(nt));
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
  return -failed.load();
}

}  // extern "C"
