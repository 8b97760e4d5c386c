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
