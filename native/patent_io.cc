// patent_io — native data-loader for the patent_tpu input pipeline.
//
// The reference relies on torchvision's C++ decode + a 16-32-worker
// DataLoader for its host-side image path (retrieval.ipynb cell 2,
// src/train.py:4292-4308).  This library is the framework's native
// equivalent: a from-scratch PNG decoder (zlib inflate + scanline
// unfiltering), bilinear resize, CLIP normalization, and a pthread pool
// batch API — exposed through a C ABI consumed via ctypes
// (patent_tpu/input/native.py).  Non-PNG formats and exotic PNGs
// (interlaced, 16-bit) return an error and the Python wrapper falls back to
// PIL, preserving the decode-failure skip policy.
//
// Build: see native/build.sh (g++ -O3 -shared -fPIC, links libz only).

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <condition_variable>
#include <mutex>
#include <queue>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// PNG decoding
// ---------------------------------------------------------------------------

struct Image {
  int width = 0;
  int height = 0;
  int channels = 0;            // after palette/alpha expansion: 1, 3 or 4
  std::vector<uint8_t> data;   // row-major, tightly packed
};

inline uint32_t read_be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = p > a ? p - a : a - p;
  int pb = p > b ? p - b : b - p;
  int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Decode an 8-bit non-interlaced PNG from memory.  Returns 0 on success.
int decode_png(const uint8_t* buf, size_t len, Image* out) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 8 || std::memcmp(buf, kSig, 8) != 0) return -1;  // not a PNG

  size_t pos = 8;
  int width = 0, height = 0, bit_depth = 0, color_type = -1, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;       // RGB triples
  std::vector<uint8_t> trns;          // palette alpha
  bool seen_iend = false;

  while (pos + 8 <= len && !seen_iend) {
    uint32_t chunk_len = read_be32(buf + pos);
    const uint8_t* type = buf + pos + 4;
    const uint8_t* data = buf + pos + 8;
    if (pos + 12 + chunk_len > len) return -2;  // truncated

    if (!std::memcmp(type, "IHDR", 4)) {
      if (chunk_len < 13) return -2;
      width = int(read_be32(data));
      height = int(read_be32(data + 4));
      bit_depth = data[8];
      color_type = data[9];
      interlace = data[12];
      if (width <= 0 || height <= 0) return -2;
      // pixel cap: bounds every size computation below (stride ≤ 2^18,
      // raw_size ≤ ~2^28) so size_t arithmetic can never overflow, and a
      // crafted IHDR can't trigger a multi-GB allocation
      if (width > 65535 || height > 65535 ||
          int64_t(width) * int64_t(height) > (int64_t(1) << 26)) {
        return -6;  // image too large → fallback / skip
      }
      if (bit_depth != 8) return -3;        // unsupported depth → fallback
      if (interlace != 0) return -3;        // Adam7 → fallback
    } else if (!std::memcmp(type, "PLTE", 4)) {
      palette.assign(data, data + chunk_len);
    } else if (!std::memcmp(type, "tRNS", 4)) {
      trns.assign(data, data + chunk_len);
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + chunk_len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      seen_iend = true;
    }
    pos += 12 + chunk_len;
  }
  if (idat.empty() || color_type < 0) return -2;

  int src_channels;
  switch (color_type) {
    case 0: src_channels = 1; break;   // gray
    case 2: src_channels = 3; break;   // RGB
    case 3: src_channels = 1; break;   // palette index
    case 4: src_channels = 2; break;   // gray + alpha
    case 6: src_channels = 4; break;   // RGBA
    default: return -3;
  }

  const size_t stride = size_t(width) * src_channels;
  const size_t raw_size = (stride + 1) * size_t(height);
  std::vector<uint8_t> raw(raw_size);

  uLongf dest_len = raw_size;
  if (uncompress(raw.data(), &dest_len, idat.data(), idat.size()) != Z_OK ||
      dest_len != raw_size) {
    return -4;  // inflate failure
  }

  // unfilter scanlines in place into `img`
  std::vector<uint8_t> img(stride * size_t(height));
  const int bpp = src_channels;  // bytes per pixel at depth 8
  for (int y = 0; y < height; ++y) {
    const uint8_t filter = raw[(stride + 1) * y];
    const uint8_t* src = raw.data() + (stride + 1) * y + 1;
    uint8_t* dst = img.data() + stride * y;
    const uint8_t* up = y > 0 ? img.data() + stride * (y - 1) : nullptr;
    switch (filter) {
      case 0:
        std::memcpy(dst, src, stride);
        break;
      case 1:  // Sub
        for (size_t x = 0; x < stride; ++x)
          dst[x] = uint8_t(src[x] + (x >= size_t(bpp) ? dst[x - bpp] : 0));
        break;
      case 2:  // Up
        for (size_t x = 0; x < stride; ++x)
          dst[x] = uint8_t(src[x] + (up ? up[x] : 0));
        break;
      case 3:  // Average
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
          int b = up ? up[x] : 0;
          dst[x] = uint8_t(src[x] + ((a + b) >> 1));
        }
        break;
      case 4:  // Paeth
        for (size_t x = 0; x < stride; ++x) {
          int a = x >= size_t(bpp) ? dst[x - bpp] : 0;
          int b = up ? up[x] : 0;
          int c = (up && x >= size_t(bpp)) ? up[x - bpp] : 0;
          dst[x] = uint8_t(src[x] + paeth(a, b, c));
        }
        break;
      default:
        return -5;  // invalid filter
    }
  }

  // expand palette / keep channels
  if (color_type == 3) {
    if (palette.size() < 3) return -2;
    out->channels = trns.empty() ? 3 : 4;
    out->data.resize(size_t(width) * height * out->channels);
    for (size_t i = 0; i < size_t(width) * height; ++i) {
      const int idx = img[i];
      if (size_t(idx) * 3 + 2 >= palette.size()) return -2;
      out->data[i * out->channels + 0] = palette[idx * 3 + 0];
      out->data[i * out->channels + 1] = palette[idx * 3 + 1];
      out->data[i * out->channels + 2] = palette[idx * 3 + 2];
      if (out->channels == 4)
        out->data[i * 4 + 3] =
            size_t(idx) < trns.size() ? trns[idx] : 255;
    }
  } else {
    out->channels = src_channels;
    out->data = std::move(img);
  }
  out->width = width;
  out->height = height;
  return 0;
}

// ---------------------------------------------------------------------------
// channel fix (gray→RGB, RGBA→RGB, gray+alpha→RGB) to 3 channels
// (reference semantics: src/models.py:84-89)
// ---------------------------------------------------------------------------

void to_rgb(const Image& in, std::vector<uint8_t>* rgb) {
  const size_t n = size_t(in.width) * in.height;
  rgb->resize(n * 3);
  const uint8_t* s = in.data.data();
  uint8_t* d = rgb->data();
  switch (in.channels) {
    case 1:
      for (size_t i = 0; i < n; ++i) {
        d[i * 3] = d[i * 3 + 1] = d[i * 3 + 2] = s[i];
      }
      break;
    case 2:  // gray + alpha: drop alpha
      for (size_t i = 0; i < n; ++i) {
        d[i * 3] = d[i * 3 + 1] = d[i * 3 + 2] = s[i * 2];
      }
      break;
    case 3:
      std::memcpy(d, s, n * 3);
      break;
    case 4:
      for (size_t i = 0; i < n; ++i) {
        d[i * 3] = s[i * 4];
        d[i * 3 + 1] = s[i * 4 + 1];
        d[i * 3 + 2] = s[i * 4 + 2];
      }
      break;
  }
}

// ---------------------------------------------------------------------------
// antialiased bilinear resize (PIL-convention separable triangle filter:
// support scales with the downscale factor) uint8 RGB → float32
// CLIP-normalized [S, S, 3]
// ---------------------------------------------------------------------------

struct FilterTaps {
  std::vector<int> xmin;       // first source index per output coord
  std::vector<int> count;      // number of taps per output coord
  std::vector<float> weights;  // [out, max_taps] row-major, zero padded
  int max_taps = 0;
};

FilterTaps triangle_taps(int src, int dst) {
  FilterTaps t;
  const double scale = double(src) / dst;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // triangle filter support
  t.max_taps = int(support * 2.0 + 2.0);
  t.xmin.resize(dst);
  t.count.resize(dst);
  t.weights.assign(size_t(dst) * t.max_taps, 0.0f);
  for (int x = 0; x < dst; ++x) {
    const double center = (x + 0.5) * scale;
    int lo = int(center - support + 0.5);
    int hi = int(center + support + 0.5);
    if (lo < 0) lo = 0;
    if (hi > src) hi = src;
    double sum = 0.0;
    for (int k = lo; k < hi; ++k) {
      const double d = (k - center + 0.5) / filterscale;
      const double w = d < 0 ? (d > -1 ? 1 + d : 0) : (d < 1 ? 1 - d : 0);
      t.weights[size_t(x) * t.max_taps + (k - lo)] = float(w);
      sum += w;
    }
    if (sum > 0) {
      for (int k = 0; k < hi - lo; ++k)
        t.weights[size_t(x) * t.max_taps + k] /= float(sum);
    }
    t.xmin[x] = lo;
    t.count[x] = hi - lo;
  }
  return t;
}

void resize_normalize(const uint8_t* rgb, int sh, int sw, int size,
                      const float* mean, const float* inv_std, float* out) {
  const FilterTaps tx = triangle_taps(sw, size);
  const FilterTaps ty = triangle_taps(sh, size);

  // horizontal pass: [sh, sw, 3] → [sh, size, 3]
  std::vector<float> tmp(size_t(sh) * size * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = rgb + size_t(y) * sw * 3;
    float* trow = tmp.data() + size_t(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      const float* w = tx.weights.data() + size_t(x) * tx.max_taps;
      const int lo = tx.xmin[x];
      const int cnt = tx.count[x];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int k = 0; k < cnt; ++k) {
        const uint8_t* p = row + size_t(lo + k) * 3;
        acc0 += w[k] * p[0];
        acc1 += w[k] * p[1];
        acc2 += w[k] * p[2];
      }
      trow[x * 3 + 0] = acc0;
      trow[x * 3 + 1] = acc1;
      trow[x * 3 + 2] = acc2;
    }
  }

  // vertical pass + normalize: [sh, size, 3] → [size, size, 3]
  for (int y = 0; y < size; ++y) {
    const float* w = ty.weights.data() + size_t(y) * ty.max_taps;
    const int lo = ty.xmin[y];
    const int cnt = ty.count[y];
    float* orow = out + size_t(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      float acc0 = 0, acc1 = 0, acc2 = 0;
      for (int k = 0; k < cnt; ++k) {
        const float* p = tmp.data() + (size_t(lo + k) * size + x) * 3;
        acc0 += w[k] * p[0];
        acc1 += w[k] * p[1];
        acc2 += w[k] * p[2];
      }
      orow[x * 3 + 0] = (acc0 / 255.0f - mean[0]) * inv_std[0];
      orow[x * 3 + 1] = (acc1 / 255.0f - mean[1]) * inv_std[1];
      orow[x * 3 + 2] = (acc2 / 255.0f - mean[2]) * inv_std[2];
    }
  }
}

// uint8 variant: resize only, defer normalization to the device (4× less
// host→device transfer for the encode pipeline).
void resize_u8(const uint8_t* rgb, int sh, int sw, int size, uint8_t* out) {
  const FilterTaps tx = triangle_taps(sw, size);
  const FilterTaps ty = triangle_taps(sh, size);
  std::vector<float> tmp(size_t(sh) * size * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = rgb + size_t(y) * sw * 3;
    float* trow = tmp.data() + size_t(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      const float* w = tx.weights.data() + size_t(x) * tx.max_taps;
      const int lo = tx.xmin[x];
      const int cnt = tx.count[x];
      float a0 = 0, a1 = 0, a2 = 0;
      for (int k = 0; k < cnt; ++k) {
        const uint8_t* p = row + size_t(lo + k) * 3;
        a0 += w[k] * p[0];
        a1 += w[k] * p[1];
        a2 += w[k] * p[2];
      }
      trow[x * 3] = a0;
      trow[x * 3 + 1] = a1;
      trow[x * 3 + 2] = a2;
    }
  }
  for (int y = 0; y < size; ++y) {
    const float* w = ty.weights.data() + size_t(y) * ty.max_taps;
    const int lo = ty.xmin[y];
    const int cnt = ty.count[y];
    uint8_t* orow = out + size_t(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      float a0 = 0, a1 = 0, a2 = 0;
      for (int k = 0; k < cnt; ++k) {
        const float* p = tmp.data() + (size_t(lo + k) * size + x) * 3;
        a0 += w[k] * p[0];
        a1 += w[k] * p[1];
        a2 += w[k] * p[2];
      }
      auto clamp = [](float v) {
        return uint8_t(v < 0 ? 0 : (v > 255 ? 255 : v + 0.5f));
      };
      orow[x * 3] = clamp(a0);
      orow[x * 3 + 1] = clamp(a1);
      orow[x * 3 + 2] = clamp(a2);
    }
  }
}

int decode_file_u8(const char* path, int image_size, uint8_t* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -10;
  std::fseek(f, 0, SEEK_END);
  const long flen = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (flen <= 0) { std::fclose(f); return -10; }
  std::vector<uint8_t> buf(static_cast<size_t>(flen), 0);
  const size_t got = std::fread(buf.data(), 1, size_t(flen), f);
  std::fclose(f);
  if (got != size_t(flen)) return -10;
  Image img;
  const int rc = decode_png(buf.data(), buf.size(), &img);
  if (rc != 0) return rc;
  std::vector<uint8_t> rgb;
  to_rgb(img, &rgb);
  resize_u8(rgb.data(), img.height, img.width, image_size, out);
  return 0;
}

int decode_file(const char* path, int image_size, const float* mean,
                const float* inv_std, float* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -10;
  std::fseek(f, 0, SEEK_END);
  const long flen = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (flen <= 0) { std::fclose(f); return -10; }
  std::vector<uint8_t> buf(static_cast<size_t>(flen), 0);
  const size_t got = std::fread(buf.data(), 1, size_t(flen), f);
  std::fclose(f);
  if (got != size_t(flen)) return -10;

  Image img;
  const int rc = decode_png(buf.data(), buf.size(), &img);
  if (rc != 0) return rc;
  std::vector<uint8_t> rgb;
  to_rgb(img, &rgb);
  resize_normalize(rgb.data(), img.height, img.width, image_size, mean,
                   inv_std, out);
  return 0;
}

// Exception-safe wrappers: a std::bad_alloc (or any other exception) must
// never cross the extern "C"/ctypes boundary or escape a worker thread —
// both would std::terminate the host Python process.  -7 = internal error.
int decode_file_safe(const char* path, int image_size, const float* mean,
                     const float* inv_std, float* out) noexcept {
  try {
    return decode_file(path, image_size, mean, inv_std, out);
  } catch (...) {
    return -7;
  }
}

int decode_file_u8_safe(const char* path, int image_size,
                        uint8_t* out) noexcept {
  try {
    return decode_file_u8(path, image_size, out);
  } catch (...) {
    return -7;
  }
}

// ---------------------------------------------------------------------------
// thread-pool batch decode
// ---------------------------------------------------------------------------

struct BatchJob {
  const char* const* paths;
  int n;
  int image_size;
  const float* mean;
  const float* inv_std;
  float* out;          // [n, S, S, 3]
  int32_t* status;     // per-image rc
};

void decode_batch_threaded(const BatchJob& job, int num_threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    const size_t img_elems =
        size_t(job.image_size) * job.image_size * 3;
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= job.n) break;
      job.status[i] = decode_file_safe(job.paths[i], job.image_size,
                                       job.mean, job.inv_std,
                                       job.out + img_elems * i);
    }
  };
  if (num_threads <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

}  // namespace

extern "C" {

// Decode one image file → CLIP-normalized float32 [size, size, 3].
// Returns 0 on success; negative codes on failure (caller falls back).
int patent_io_decode(const char* path, int image_size, const float* mean,
                     const float* inv_std, float* out) {
  return decode_file_safe(path, image_size, mean, inv_std, out);
}

// Decode a batch of files with an internal thread pool.  ``status[i]`` gets
// the per-file return code; the output buffer rows of failed files are
// untouched (caller zero-fills beforehand).
void patent_io_decode_batch(const char* const* paths, int n, int image_size,
                            const float* mean, const float* inv_std,
                            float* out, int32_t* status, int num_threads) {
  BatchJob job{paths, n, image_size, mean, inv_std, out, status};
  decode_batch_threaded(job, num_threads);
}

// uint8 batch decode: resize only, normalization deferred to the device.
void patent_io_decode_batch_u8(const char* const* paths, int n,
                               int image_size, uint8_t* out, int32_t* status,
                               int num_threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    const size_t img_elems = size_t(image_size) * image_size * 3;
    while (true) {
      const int i = next.fetch_add(1);
      if (i >= n) break;
      status[i] = decode_file_u8_safe(paths[i], image_size,
                                      out + img_elems * i);
    }
  };
  if (num_threads <= 1) {
    worker();
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Raw PNG probe (width/height/channels) without full decode; 0 on success.
int patent_io_probe(const char* path, int* width, int* height, int* channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -10;
  uint8_t hdr[33];
  const size_t got = std::fread(hdr, 1, sizeof(hdr), f);
  std::fclose(f);
  if (got < 33) return -2;
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (std::memcmp(hdr, kSig, 8) != 0) return -1;
  if (std::memcmp(hdr + 12, "IHDR", 4) != 0) return -2;
  *width = int(read_be32(hdr + 16));
  *height = int(read_be32(hdr + 20));
  switch (hdr[25]) {
    case 0: *channels = 1; break;
    case 2: *channels = 3; break;
    case 3: *channels = 3; break;
    case 4: *channels = 2; break;
    case 6: *channels = 4; break;
    default: return -3;
  }
  return 0;
}

}  // extern "C"
