// Native host-side data runtime for fact_clip_tpu.
//
// The TPU compute path is JAX/XLA; this library is the host side of the
// pipeline: parallel .npy feature loading fused with cast/transpose/zero-pad
// directly into the padded batch buffer the device consumes, plus
// majority-vote label shrinking and run-length encoding.  It replaces the
// single-threaded Python/NumPy loading of the reference
// (/root/reference/fact_clip/utils/dataset.py:12-21, utils/utils.py:74-85)
// so feature IO overlaps TPU compute at production scale.
//
// C ABI only (consumed via ctypes).  Build: `make -C native`.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- npy I/O

struct NpyInfo {
  long rows = 0, cols = 0;
  int word_size = 0;       // 4 (f4) or 8 (f8)
  bool fortran = false;
  long data_offset = 0;
};

bool parse_npy_header(FILE* f, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  unsigned int header_len = 0;
  long pre = 8;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return false;
    header_len = b[0] | (b[1] << 8);
    pre += 2;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    header_len = b[0] | (b[1] << 8) | (b[2] << 16) | ((unsigned)b[3] << 24);
    pre += 4;
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return false;
  info->data_offset = pre + header_len;

  // descr
  size_t d = header.find("'descr'");
  if (d == std::string::npos) return false;
  size_t q1 = header.find('\'', d + 7);
  size_t q2 = header.find('\'', q1 + 1);
  std::string descr = header.substr(q1 + 1, q2 - q1 - 1);
  if (descr == "<f4" || descr == "|f4" || descr == "=f4") info->word_size = 4;
  else if (descr == "<f8" || descr == "|f8" || descr == "=f8") info->word_size = 8;
  else return false;  // only float features supported

  // fortran_order
  size_t fo = header.find("'fortran_order'");
  if (fo == std::string::npos) return false;
  info->fortran = header.find("True", fo) != std::string::npos &&
                  header.find("True", fo) < header.find(',', fo);

  // shape
  size_t sh = header.find("'shape'");
  if (sh == std::string::npos) return false;
  size_t p1 = header.find('(', sh);
  size_t p2 = header.find(')', p1);
  std::string shape = header.substr(p1 + 1, p2 - p1 - 1);
  long dims[2] = {0, 1};
  int nd = 0;
  const char* s = shape.c_str();
  char* end = nullptr;
  while (nd < 2) {
    long v = strtol(s, &end, 10);
    if (end == s) break;
    dims[nd++] = v;
    s = end;
    while (*s == ',' || *s == ' ') ++s;
  }
  if (nd == 0) return false;
  info->rows = dims[0];
  info->cols = nd > 1 ? dims[1] : 1;
  return true;
}

}  // namespace

extern "C" {

// Query the (rows, cols) of a 2D .npy file.  Returns 0 on success.
int fact_npy_dims(const char* path, long* rows, long* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info;
  bool ok = parse_npy_header(f, &info);
  fclose(f);
  if (!ok) return -2;
  *rows = info.rows;
  *cols = info.cols;
  return 0;
}

// Load a 2D float .npy into `out` (T_out x D float32, C order), casting from
// f8 if needed, transposing if `transpose` (file is D x T), subsampling every
// `stride`-th frame (the cfg.sr temporal downsampling), and writing at most
// `t_cap` rows.  Rows beyond the file's length are left untouched.
// Returns the number of rows written, or a negative error code.
long fact_load_features_strided(const char* path, int transpose, long stride,
                                float* out, long t_cap, long d_expected) {
  if (stride <= 0) stride = 1;
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info;
  if (!parse_npy_header(f, &info)) { fclose(f); return -2; }

  long raw_t = transpose ? info.cols : info.rows;
  long file_t = (raw_t + stride - 1) / stride;  // frames after subsampling
  long file_d = transpose ? info.rows : info.cols;
  if (d_expected > 0 && file_d != d_expected) { fclose(f); return -3; }
  long T = file_t < t_cap ? file_t : t_cap;
  long D = file_d;

  long n = info.rows * info.cols;
  std::vector<unsigned char> raw((size_t)n * info.word_size);
  if (fseek(f, info.data_offset, SEEK_SET) != 0 ||
      fread(raw.data(), info.word_size, n, f) != (size_t)n) {
    fclose(f);
    return -4;
  }
  fclose(f);

  // view as float32/float64, honoring C/Fortran order and the transpose flag:
  // element (t, d) of the logical (T, D) array lives at file index:
  //   C-order, no transpose:      t * cols + d          (rows=T, cols=D)
  //   C-order, transpose:         d * cols + t          (rows=D, cols=T)
  //   Fortran flips row/col strides.
  long r_stride, c_stride;
  if (!info.fortran) { r_stride = info.cols; c_stride = 1; }
  else { r_stride = 1; c_stride = info.rows; }

  auto at = [&](long i, long j) -> double {
    long idx = i * r_stride + j * c_stride;
    if (info.word_size == 4) return ((const float*)raw.data())[idx];
    return ((const double*)raw.data())[idx];
  };

  if (!transpose) {
    for (long t = 0; t < T; ++t)
      for (long d = 0; d < D; ++d) out[t * D + d] = (float)at(t * stride, d);
  } else {
    for (long t = 0; t < T; ++t)
      for (long d = 0; d < D; ++d) out[t * D + d] = (float)at(d, t * stride);
  }
  return T;
}

long fact_load_features(const char* path, int transpose, float* out,
                        long t_cap, long d_expected) {
  return fact_load_features_strided(path, transpose, 1, out, t_cap, d_expected);
}

// Majority-vote shrink of an int64 label sequence by clip_len
// (matches utils/segments.py::shrink_frame_label; Counter.most_common ties
// break by first-seen order within the clip).  Returns #output labels.
long fact_shrink_labels(const int64_t* labels, long n, long clip_len, int64_t* out) {
  if (n <= 0 || clip_len <= 0) return 0;
  long num_clip = (n - 1) / clip_len + 1;
  std::vector<int64_t> uniq;
  std::vector<long> cnt;
  for (long c = 0; c < num_clip; ++c) {
    long s = c * clip_len;
    long e = s + clip_len < n ? s + clip_len : n;
    uniq.clear();
    cnt.clear();
    for (long i = s; i < e; ++i) {
      int64_t v = labels[i];
      bool found = false;
      for (size_t u = 0; u < uniq.size(); ++u)
        if (uniq[u] == v) { cnt[u]++; found = true; break; }
      if (!found) { uniq.push_back(v); cnt.push_back(1); }
    }
    size_t best = 0;
    for (size_t u = 1; u < uniq.size(); ++u)
      if (cnt[u] > cnt[best]) best = u;
    out[c] = uniq[best];
  }
  return num_clip;
}

// Run-length encode an int64 label sequence: writes segment (class, start,
// end-inclusive) triples; returns the segment count.
long fact_rle(const int64_t* labels, long n, int64_t* cls, int64_t* start, int64_t* end) {
  if (n <= 0) return 0;
  long k = 0;
  long s = 0;
  for (long i = 1; i <= n; ++i) {
    if (i == n || labels[i] != labels[i - 1]) {
      cls[k] = labels[s];
      start[k] = s;
      end[k] = i - 1;
      ++k;
      s = i;
    }
  }
  return k;
}

// Parallel batch assembly: load B feature files into a zero-initialized
// (B, t_cap, D) float32 buffer using a thread pool.  lengths[i] receives the
// rows written for video i (negative = error code for that video).
// `stride` applies cfg.sr subsampling; `t_caps` (optional, may be null)
// gives a per-video row cap (e.g. the ground-truth label count) in addition
// to the global t_cap.
void fact_assemble_batch(const char** paths, long B, int transpose, long stride,
                         const long* t_caps, float* out,
                         long t_cap, long D, long* lengths, int n_threads) {
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads <= 0) n_threads = 4;
  if (n_threads > B) n_threads = (int)B;

  memset(out, 0, sizeof(float) * (size_t)B * t_cap * D);
  std::atomic<long> next(0);
  auto worker = [&]() {
    while (true) {
      long i = next.fetch_add(1);
      if (i >= B) break;
      long cap = t_cap;
      if (t_caps && t_caps[i] > 0 && t_caps[i] < cap) cap = t_caps[i];
      lengths[i] = fact_load_features_strided(
          paths[i], transpose, stride, out + (size_t)i * t_cap * D, cap, D);
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
