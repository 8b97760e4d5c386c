// Native depth preprocessing ops (data-pipeline hot path).
//
// C++ implementation of the scanline depth completion the reference JIT-
// compiles with numba (src/model/ops/depth_map_proc.py:7-52): four
// directional sweeps (down/up per column, right/left per row) carrying
// (previous depth, previous distance); empty pixels take the carried value,
// filled pixels are replaced when a nearer source is carried past them.
//
// Exposed with C linkage for ctypes. Arrays are float32, row-major (H, W);
// canvas and dist are updated in place.
//
// Build: make -C diffusiondepth_tpu/native   (g++ -O3 -shared -fPIC)

#include <cstdint>

namespace {

constexpr float kInf = 1e8f;

inline void sweep_step(float& cell, float& cell_dist, float& prev_depth,
                       float& prev_dist, float step_len) {
  if (cell == 0.0f) {
    cell = prev_depth;
    cell_dist = prev_dist;
  } else {
    if (cell_dist > prev_dist) {
      cell_dist = prev_dist;
      cell = prev_depth;
    }
    prev_depth = cell;
    prev_dist = cell_dist;
  }
  prev_dist += step_len;
}

}  // namespace

extern "C" {

// 4-direction scanline completion, in place. canvas: (h, w) depths with 0 ==
// missing; dist: (h, w) workspace, should start at 0 like the reference.
void simple_depth_completion(float* canvas, float* dist, int64_t h, int64_t w) {
  // column sweeps: down then up (reference :44-46)
  for (int64_t c = 0; c < w; ++c) {
    float prev_depth = 0.0f, prev_dist = kInf;
    for (int64_t r = 0; r < h; ++r) {
      sweep_step(canvas[r * w + c], dist[r * w + c], prev_depth, prev_dist, 1.0f);
    }
    prev_depth = 0.0f;
    prev_dist = kInf;
    for (int64_t r = h - 1; r >= 0; --r) {
      sweep_step(canvas[r * w + c], dist[r * w + c], prev_depth, prev_dist, 1.0f);
    }
  }
  // row sweeps: right then left (reference :47-49)
  for (int64_t r = 0; r < h; ++r) {
    float prev_depth = 0.0f, prev_dist = kInf;
    for (int64_t c = 0; c < w; ++c) {
      sweep_step(canvas[r * w + c], dist[r * w + c], prev_depth, prev_dist, 1.0f);
    }
    prev_depth = 0.0f;
    prev_dist = kInf;
    for (int64_t c = w - 1; c >= 0; --c) {
      sweep_step(canvas[r * w + c], dist[r * w + c], prev_depth, prev_dist, 1.0f);
    }
  }
}

// Batched variant for loader threads: (n, h, w) contiguous.
void simple_depth_completion_batch(float* canvas, float* dist, int64_t n,
                                   int64_t h, int64_t w) {
  for (int64_t i = 0; i < n; ++i) {
    simple_depth_completion(canvas + i * h * w, dist + i * h * w, h, w);
  }
}

}  // extern "C"

// ---------------------------------------------------------------------------
// 16-bit grayscale PNG decode (the KITTI depth-map format: two such files
// per training sample, reference src/data/kittidc.py:71-82). PIL decodes
// these through several Python-object hops; this is a minimal strict decoder
// for exactly the subset KITTI uses - bit depth 16, color type 0 (grayscale),
// no interlace - built on zlib inflate + the five PNG scanline filters.
// Anything else returns an error and the Python caller falls back to PIL.
// ---------------------------------------------------------------------------

#include <cstring>
#include <vector>

#include <zlib.h>

namespace {

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline int paeth(int a, int b, int c) {
  const int p = a + b - c;
  const int pa = p > a ? p - a : a - p;
  const int pb = p > b ? p - b : b - p;
  const int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  return pb <= pc ? b : c;
}

}  // namespace

extern "C" {

// Decode a 16-bit grayscale non-interlaced PNG. buf/n: the whole file;
// out: caller-allocated (h*w) uint16 buffer (dims from the IHDR, which the
// caller parses - 8-byte signature, then IHDR payload at offset 16).
// Returns 0 on success; 1 bad signature/structure, 2 unsupported format,
// 3 zlib failure, 4 size mismatch.
int decode_png_gray16(const uint8_t* buf, int64_t n, uint16_t* out,
                      int64_t out_elems) {
  static const uint8_t kSig[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
  if (n < 33 || std::memcmp(buf, kSig, 8) != 0) return 1;
  // IHDR must be first (spec): length 13, type "IHDR" at offset 8
  if (be32(buf + 8) != 13 || std::memcmp(buf + 12, "IHDR", 4) != 0) return 1;
  const uint32_t w = be32(buf + 16);
  const uint32_t h = be32(buf + 20);
  const uint8_t bitdepth = buf[24], colortype = buf[25];
  const uint8_t compression = buf[26], filter = buf[27], interlace = buf[28];
  if (bitdepth != 16 || colortype != 0 || compression != 0 || filter != 0 ||
      interlace != 0)
    return 2;
  if (int64_t(w) * h != out_elems || w == 0 || h == 0) return 4;

  const size_t stride = size_t(w) * 2;          // bytes of pixel data per row
  const size_t raw_size = h * (stride + 1);     // + 1 filter byte per row
  std::vector<uint8_t> raw(raw_size);

  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  if (inflateInit(&zs) != Z_OK) return 3;
  zs.next_out = raw.data();
  zs.avail_out = uInt(raw_size);

  // walk chunks, feeding every IDAT payload into one inflate stream
  int64_t off = 33;  // first chunk after IHDR (8 sig + 25 IHDR incl. crc)
  int zret = Z_OK;
  while (off + 12 <= n) {
    const uint32_t len = be32(buf + off);
    if (off + 12 + int64_t(len) > n) { inflateEnd(&zs); return 1; }
    const uint8_t* type = buf + off + 4;
    if (std::memcmp(type, "IDAT", 4) == 0) {
      zs.next_in = const_cast<uint8_t*>(buf + off + 8);
      zs.avail_in = len;
      zret = inflate(&zs, Z_NO_FLUSH);
      if (zret != Z_OK && zret != Z_STREAM_END) { inflateEnd(&zs); return 3; }
    } else if (std::memcmp(type, "IEND", 4) == 0) {
      break;
    }
    off += 12 + int64_t(len);
  }
  const bool complete = (zs.total_out == raw_size);
  inflateEnd(&zs);
  if (!complete) return 3;

  // unfilter (bpp = 2 bytes) then emit native-endian uint16 (PNG is BE)
  const int bpp = 2;
  uint8_t* prev = nullptr;  // previous unfiltered row
  for (uint32_t y = 0; y < h; ++y) {
    uint8_t* row = raw.data() + y * (stride + 1);
    const uint8_t ft = row[0];
    uint8_t* cur = row + 1;
    switch (ft) {
      case 0:
        break;
      case 1:  // Sub
        for (size_t i = bpp; i < stride; ++i) cur[i] += cur[i - bpp];
        break;
      case 2:  // Up
        if (prev)
          for (size_t i = 0; i < stride; ++i) cur[i] += prev[i];
        break;
      case 3:  // Average
        for (size_t i = 0; i < stride; ++i) {
          const int a = i >= size_t(bpp) ? cur[i - bpp] : 0;
          const int b = prev ? prev[i] : 0;
          cur[i] = uint8_t(cur[i] + ((a + b) >> 1));
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < stride; ++i) {
          const int a = i >= size_t(bpp) ? cur[i - bpp] : 0;
          const int b = prev ? prev[i] : 0;
          const int c = (prev && i >= size_t(bpp)) ? prev[i - bpp] : 0;
          cur[i] = uint8_t(cur[i] + paeth(a, b, c));
        }
        break;
      default:
        return 1;
    }
    uint16_t* dst = out + size_t(y) * w;
    for (uint32_t x = 0; x < w; ++x)
      dst[x] = uint16_t((uint16_t(cur[2 * x]) << 8) | cur[2 * x + 1]);
    prev = cur;
  }
  return 0;
}

}  // extern "C"
