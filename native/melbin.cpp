// melbin: native batch loader for packed TTS training artifacts.
//
// TPU-native replacement for the reference's torch DataLoader worker
// processes (data.py:897-905): a single mmap'd pack file + multithreaded
// fixed-shape batch assembly in C++ (padding, truncation, dtype widening
// done off the Python thread). Exposed to Python via ctypes
// (tortoise_tts_tpu/data/native_loader.py).
//
// File layout (little endian, version 2):
//   magic "MELB" | u32 version | u64 count
//   count x record index:
//     u64 offset | u32 n_codes | u32 n_text | u32 lat_dim | u32 dlat_dim
//     | u64 wav_length | f32 duration | u32 pad
//   data region per record (offset 4-byte aligned):
//     u16 codes[n_codes] | u8 text[n_text] | pad to 4 | f32 lat[lat_dim]
//     | f32 dlat[dlat_dim] | pad to 4
//   The alignment guarantees rec pointers satisfy their natural
//   alignment (v1 packed payloads back-to-back, making u16/f32 loads
//   UB on strict-alignment builds; v1 files are rejected — repack).

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <atomic>
#include <thread>
#include <vector>

namespace {

constexpr uint32_t kMagic = 0x424c454d;  // "MELB"
constexpr uint32_t kVersion = 2;

inline uint64_t align4(uint64_t x) { return (x + 3) & ~uint64_t{3}; }

#pragma pack(push, 1)
struct RecordIndex {
  uint64_t offset;
  uint32_t n_codes;
  uint32_t n_text;
  uint32_t lat_dim;
  uint32_t dlat_dim;
  uint64_t wav_length;
  float duration;
  uint32_t pad;
};

struct Header {
  uint32_t magic;
  uint32_t version;
  uint64_t count;
};
#pragma pack(pop)

struct Dataset {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  const Header* header = nullptr;
  const RecordIndex* index = nullptr;
};

}  // namespace

extern "C" {

void* mb_open(const char* path) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { ::close(fd); return nullptr; }
  void* mem = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (mem == MAP_FAILED) { ::close(fd); return nullptr; }
  auto* ds = new Dataset();
  ds->fd = fd;
  ds->base = static_cast<const uint8_t*>(mem);
  ds->size = st.st_size;
  ds->header = reinterpret_cast<const Header*>(ds->base);
  auto reject = [&]() {
    munmap(mem, st.st_size);
    ::close(fd);
    delete ds;
    return nullptr;
  };
  // header validation: magic, version, count (overflow-safe), and every
  // record's extent inside the mapping — a truncated/corrupt pack must
  // fail here with a Python-level error, not SIGBUS inside mb_batch
  if (ds->size < sizeof(Header) || ds->header->magic != kMagic ||
      ds->header->version != kVersion)
    return reject();
  const uint64_t count = ds->header->count;
  if (count > (ds->size - sizeof(Header)) / sizeof(RecordIndex))
    return reject();
  ds->index = reinterpret_cast<const RecordIndex*>(ds->base + sizeof(Header));
  const uint64_t data_start = sizeof(Header) + count * sizeof(RecordIndex);
  for (uint64_t i = 0; i < count; ++i) {
    const RecordIndex& r = ds->index[i];
    const uint64_t payload =
        align4(uint64_t{r.n_codes} * 2 + r.n_text) +
        (uint64_t{r.lat_dim} + r.dlat_dim) * 4;
    if (r.offset < data_start || (r.offset & 3) != 0 ||
        r.offset > ds->size || payload > ds->size - r.offset)
      return reject();
  }
  return ds;
}

void mb_close(void* handle) {
  auto* ds = static_cast<Dataset*>(handle);
  if (!ds) return;
  munmap(const_cast<uint8_t*>(ds->base), ds->size);
  ::close(ds->fd);
  delete ds;
}

uint64_t mb_count(void* handle) {
  return static_cast<Dataset*>(handle)->header->count;
}

void mb_durations(void* handle, float* out) {
  auto* ds = static_cast<Dataset*>(handle);
  for (uint64_t i = 0; i < ds->header->count; ++i)
    out[i] = ds->index[i].duration;
}

// Assemble one fixed-shape batch. Caller allocates:
//   text      i32 [n, text_bucket]   (stop(0)-padded)
//   text_len  i32 [n]
//   codes     i32 [n, mel_bucket]
//   wav_len   i32 [n]   (clamped to mel_bucket*1024)
//   lat       f32 [n, lat_dim]
//   dlat      f32 [n, dlat_dim]
// Returns 0 on success, -1 on bad index / dim mismatch.
int mb_batch(void* handle, const uint32_t* indices, int n,
             int text_bucket, int mel_bucket, int lat_dim, int dlat_dim,
             int32_t* text, int32_t* text_len, int32_t* codes,
             int32_t* wav_len, float* lat, float* dlat, int num_threads) {
  auto* ds = static_cast<Dataset*>(handle);
  const uint64_t count = ds->header->count;
  std::atomic<int> status{0};

  auto work = [&](int begin, int end) {
    for (int b = begin; b < end; ++b) {
      uint32_t idx = indices[b];
      if (idx >= count) { status.store(-1); return; }
      const RecordIndex& r = ds->index[idx];
      if ((int)r.lat_dim != lat_dim || (int)r.dlat_dim != dlat_dim) {
        status.store(-1);
        return;
      }
      const uint8_t* p = ds->base + r.offset;
      const uint16_t* rec_codes = reinterpret_cast<const uint16_t*>(p);
      const uint8_t* rec_text = p + r.n_codes * sizeof(uint16_t);
      // lat starts at the next 4-byte boundary after text (v2 layout)
      const float* rec_lat = reinterpret_cast<const float*>(
          p + align4(r.n_codes * sizeof(uint16_t) + r.n_text));
      const float* rec_dlat = rec_lat + r.lat_dim;

      int tl = (int)r.n_text < text_bucket ? (int)r.n_text : text_bucket;
      int32_t* trow = text + (size_t)b * text_bucket;
      for (int i = 0; i < tl; ++i) trow[i] = rec_text[i];
      std::memset(trow + tl, 0, sizeof(int32_t) * (text_bucket - tl));
      text_len[b] = tl;

      int cl = (int)r.n_codes < mel_bucket ? (int)r.n_codes : mel_bucket;
      int32_t* crow = codes + (size_t)b * mel_bucket;
      for (int i = 0; i < cl; ++i) crow[i] = rec_codes[i];
      std::memset(crow + cl, 0, sizeof(int32_t) * (mel_bucket - cl));
      int64_t wl = (int64_t)r.wav_length;
      int64_t cap = (int64_t)cl * 1024;
      wav_len[b] = (int32_t)(wl < cap ? wl : cap);

      std::memcpy(lat + (size_t)b * lat_dim, rec_lat,
                  sizeof(float) * lat_dim);
      std::memcpy(dlat + (size_t)b * dlat_dim, rec_dlat,
                  sizeof(float) * dlat_dim);
    }
  };

  int workers = num_threads > 0 ? num_threads : 1;
  if (workers == 1 || n < 4) {
    work(0, n);
  } else {
    std::vector<std::thread> threads;
    int per = (n + workers - 1) / workers;
    for (int w = 0; w < workers; ++w) {
      int begin = w * per;
      int end = begin + per < n ? begin + per : n;
      if (begin >= end) break;
      threads.emplace_back(work, begin, end);
    }
    for (auto& t : threads) t.join();
  }
  return status.load();
}

}  // extern "C"
