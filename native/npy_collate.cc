// Native batched npy loader + pad-collate engine.
//
// The reference's host data path is torch DataLoader workers doing
// numpy-load + tensor-copy + zero-pad in Python (SURVEY.md L1;
// /root/reference/video_dataloader.py:53-67). This C++ engine performs the
// hot host-side work — npy header parse, mmap-free buffered read, uint8->f32
// /255 conversion, zero-padded batch assembly — in native threads that
// release the GIL, so batch prep overlaps Python-side orchestration and the
// device step even on a single-core host.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Format support: NPY v1.0/2.0, C-order, dtypes u1/f4/f8, any rank >= 1;
// the leading axis is the (padded) sequence axis.
//
// Build: native/build.sh -> libnpy_collate.so
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct NpyInfo {
  std::vector<int64_t> shape;
  char dtype;       // 'u' = uint8, 'f' = float32, 'd' = float64
  size_t data_off;  // byte offset of the raw data
};

// Minimal NPY header parser. Returns false on malformed/unsupported files.
bool parse_npy_header(FILE* f, NpyInfo* out) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  const int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char l[2];
    if (fread(l, 1, 2, f) != 2) return false;
    header_len = l[0] | (l[1] << 8);
    out->data_off = 10 + header_len;
  } else {
    unsigned char l[4];
    if (fread(l, 1, 4, f) != 4) return false;
    header_len = l[0] | (l[1] << 8) | (l[2] << 16) | (uint32_t(l[3]) << 24);
    out->data_off = 12 + header_len;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return false;

  // dtype: expect little-endian or byte-order-agnostic
  size_t dpos = header.find("'descr':");
  if (dpos == std::string::npos) return false;
  size_t q1 = header.find('\'', dpos + 8);
  size_t q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "|u1") out->dtype = 'u';
  else if (descr == "<f4") out->dtype = 'f';
  else if (descr == "<f8") out->dtype = 'd';
  else return false;

  if (header.find("'fortran_order': False") == std::string::npos) return false;

  size_t spos = header.find("'shape':");
  if (spos == std::string::npos) return false;
  size_t p1 = header.find('(', spos);
  size_t p2 = header.find(')', p1);
  std::string dims = header.substr(p1 + 1, p2 - p1 - 1);
  out->shape.clear();
  const char* s = dims.c_str();
  while (*s) {
    while (*s == ' ' || *s == ',') s++;
    if (!*s) break;
    out->shape.push_back(strtoll(s, const_cast<char**>(&s), 10));
  }
  return !out->shape.empty();
}

// Load one file into the batch slot: convert to f32 (u8 / 255), truncate to
// max_t leading steps, zero-pad the rest (buffer is pre-zeroed).
// Returns the number of valid leading steps, or -1 on error.
int64_t load_one(const char* path, float* dst, int64_t max_t, int64_t item_elems, float scale_u8) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info;
  if (!parse_npy_header(f, &info)) {
    fclose(f);
    return -1;
  }
  int64_t t = info.shape[0];
  int64_t elems_per_step = 1;
  for (size_t i = 1; i < info.shape.size(); i++) elems_per_step *= info.shape[i];
  if (elems_per_step != item_elems) {
    fclose(f);
    return -1;
  }
  const int64_t keep = t < max_t ? t : max_t;
  const int64_t n = keep * elems_per_step;
  if (fseek(f, (long)info.data_off, SEEK_SET) != 0) {
    fclose(f);
    return -1;
  }
  if (info.dtype == 'u') {
    std::vector<uint8_t> buf(n);
    if (fread(buf.data(), 1, n, f) != size_t(n)) {
      fclose(f);
      return -1;
    }
    for (int64_t i = 0; i < n; i++) dst[i] = buf[i] * scale_u8;
  } else if (info.dtype == 'f') {
    if (fread(dst, 4, n, f) != size_t(n)) {
      fclose(f);
      return -1;
    }
  } else {  // f8
    std::vector<double> buf(n);
    if (fread(buf.data(), 8, n, f) != size_t(n)) {
      fclose(f);
      return -1;
    }
    for (int64_t i = 0; i < n; i++) dst[i] = float(buf[i]);
  }
  fclose(f);
  return keep;
}

}  // namespace

extern "C" {

// Inspect a single npy: fills shape (up to max_rank) and returns rank, or -1.
int64_t npy_shape(const char* path, int64_t* shape_out, int64_t max_rank) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info;
  bool ok = parse_npy_header(f, &info);
  fclose(f);
  if (!ok) return -1;
  int64_t rank = (int64_t)info.shape.size();
  for (int64_t i = 0; i < rank && i < max_rank; i++) shape_out[i] = info.shape[i];
  return rank;
}

// Load `n` npy files into a zero-initialized (n, max_t, item_elems) f32
// buffer using up to `num_threads` native threads. `paths` is a
// NUL-separated concatenation. Writes per-item valid lengths into
// `lengths_out`. Returns 0 on success, else the count of failed items.
int64_t collate_batch_f32(const char* paths, int64_t n, float* batch_out,
                          int64_t* lengths_out, int64_t max_t,
                          int64_t item_elems, int32_t normalize_u8,
                          int64_t num_threads) {
  std::vector<const char*> files(n);
  const char* p = paths;
  for (int64_t i = 0; i < n; i++) {
    files[i] = p;
    p += strlen(p) + 1;
  }
  const float scale = normalize_u8 ? (1.0f / 255.0f) : 1.0f;
  const int64_t stride = max_t * item_elems;
  memset(batch_out, 0, sizeof(float) * n * stride);

  std::vector<int64_t> fails_per_thread(std::max<int64_t>(num_threads, 1), 0);
  auto work = [&](int64_t tid, int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; i++) {
      int64_t t = load_one(files[i], batch_out + i * stride, max_t, item_elems, scale);
      lengths_out[i] = t < 0 ? 0 : t;
      if (t < 0) fails_per_thread[tid]++;
    }
  };
  if (num_threads <= 1 || n <= 1) {
    work(0, 0, n);
  } else {
    int64_t k = std::min<int64_t>(num_threads, n);
    std::vector<std::thread> threads;
    for (int64_t tid = 0; tid < k; tid++) {
      int64_t lo = n * tid / k, hi = n * (tid + 1) / k;
      threads.emplace_back(work, tid, lo, hi);
    }
    for (auto& th : threads) th.join();
  }
  int64_t fails = 0;
  for (int64_t v : fails_per_thread) fails += v;
  return fails;
}

}  // extern "C"
