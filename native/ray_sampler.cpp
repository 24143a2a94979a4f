// Native ray-batch sampler for codenerf_tpu.
//
// The host-side inner loop of training: draw B i.i.d. (object, view, pixel)
// triples and gather the per-ray pose rows / focal / ground-truth pixel into
// contiguous output buffers ready for jax.device_put. This replaces the
// numpy fancy-indexing path in codenerf_tpu/data/pipeline.py for large
// batches / many-chip feeding (the reference repo has no native code at all;
// its host loop is a python per-image DataLoader, src/trainer.py:57-99).
//
// Design notes:
// - counter-based RNG (splitmix64 of (seed, step, index)): every ray's
//   sample is an independent pure function of its index, so results are
//   deterministic and independent of the thread count/partitioning;
// - bounded integers via the Lemire multiply-shift (no modulo bias worth
//   caring about at these ranges, no divisions in the hot loop);
// - plain std::thread fan-out over contiguous index ranges — gathers are
//   memory-bound, so threads ~linearly scale until DRAM saturates.
//
// C ABI only; consumed through ctypes (no pybind11 in this image).

#include <cstdint>
#include <thread>
#include <vector>

namespace {

inline uint64_t splitmix64(uint64_t x) {
  x += 0x9e3779b97f4a7c15ULL;
  x = (x ^ (x >> 30)) * 0xbf58476d1ce4e5b9ULL;
  x = (x ^ (x >> 27)) * 0x94d049bb133111ebULL;
  return x ^ (x >> 31);
}

inline uint64_t bounded(uint64_t h, uint64_t n) {
  return static_cast<uint64_t>(
      (static_cast<unsigned __int128>(h) * n) >> 64);
}

struct Args {
  const uint8_t* images;  // (N, V, H, W, 3) uint8
  const float* poses;     // (N, V, 4, 4) float32, row-major
  const float* focals;    // (N,)
  int64_t N, V, H, W, B;
  uint64_t seed, step;
  int64_t v0, v1, u0, u1;  // pixel bounds [v0,v1) x [u0,u1)
  int32_t* out_obj;        // (B,)
  float* out_uv;           // (B, 2) u,v
  float* out_c2w;          // (B, 3, 4)
  float* out_focal;        // (B,)
  float* out_rgb;          // (B, 3)
};

void sample_range(const Args& a, int64_t lo, int64_t hi) {
  const float inv255 = 1.0f / 255.0f;
  const int64_t du = a.u1 - a.u0;
  const int64_t dv = a.v1 - a.v0;
  for (int64_t i = lo; i < hi; ++i) {
    const uint64_t base =
        splitmix64(a.seed ^ splitmix64(a.step * 0x2545F4914F6CDD1DULL + i));
    const int64_t obj = static_cast<int64_t>(bounded(splitmix64(base ^ 1), a.N));
    const int64_t view = static_cast<int64_t>(bounded(splitmix64(base ^ 2), a.V));
    const int64_t pu = a.u0 + static_cast<int64_t>(bounded(splitmix64(base ^ 3), du));
    const int64_t pv = a.v0 + static_cast<int64_t>(bounded(splitmix64(base ^ 4), dv));

    a.out_obj[i] = static_cast<int32_t>(obj);
    a.out_uv[2 * i] = static_cast<float>(pu);
    a.out_uv[2 * i + 1] = static_cast<float>(pv);
    a.out_focal[i] = a.focals[obj];

    const float* pose = a.poses + (obj * a.V + view) * 16;
    float* c2w = a.out_c2w + i * 12;
    for (int r = 0; r < 3; ++r)
      for (int c = 0; c < 4; ++c) c2w[r * 4 + c] = pose[r * 4 + c];

    const uint8_t* px =
        a.images + (((obj * a.V + view) * a.H + pv) * a.W + pu) * 3;
    float* rgb = a.out_rgb + i * 3;
    rgb[0] = px[0] * inv255;
    rgb[1] = px[1] * inv255;
    rgb[2] = px[2] * inv255;
  }
}

struct CompactArgs {
  const uint8_t* images;  // (N, V, H, W, 3) uint8
  int64_t N, V, H, W, B;
  uint64_t seed, step;
  int64_t v0, v1, u0, u1;
  int32_t* out_obj;   // (B,)
  int32_t* out_view;  // (B,)
  int16_t* out_uv;    // (B, 2) u,v
  uint8_t* out_rgb;   // (B, 3)
};

// Identical RNG chain to sample_range: both layouts pick the same
// (object, view, pixel) triples for a given (seed, step, index).
void sample_range_compact(const CompactArgs& a, int64_t lo, int64_t hi) {
  const int64_t du = a.u1 - a.u0;
  const int64_t dv = a.v1 - a.v0;
  for (int64_t i = lo; i < hi; ++i) {
    const uint64_t base =
        splitmix64(a.seed ^ splitmix64(a.step * 0x2545F4914F6CDD1DULL + i));
    const int64_t obj = static_cast<int64_t>(bounded(splitmix64(base ^ 1), a.N));
    const int64_t view = static_cast<int64_t>(bounded(splitmix64(base ^ 2), a.V));
    const int64_t pu = a.u0 + static_cast<int64_t>(bounded(splitmix64(base ^ 3), du));
    const int64_t pv = a.v0 + static_cast<int64_t>(bounded(splitmix64(base ^ 4), dv));

    a.out_obj[i] = static_cast<int32_t>(obj);
    a.out_view[i] = static_cast<int32_t>(view);
    a.out_uv[2 * i] = static_cast<int16_t>(pu);
    a.out_uv[2 * i + 1] = static_cast<int16_t>(pv);
    const uint8_t* px =
        a.images + (((obj * a.V + view) * a.H + pv) * a.W + pu) * 3;
    uint8_t* rgb = a.out_rgb + i * 3;
    rgb[0] = px[0];
    rgb[1] = px[1];
    rgb[2] = px[2];
  }
}

}  // namespace

extern "C" {

// Compact index-batch layout (obj i32, view i32, uv i16, rgb u8 — 15 B/ray
// vs the expanded layout's 76): pose/focal stay in device-resident tables
// and are gathered inside the train step. Returns 0 on success.
int cn_sample_batch_compact(const uint8_t* images, int64_t N, int64_t V,
                            int64_t H, int64_t W, int64_t B, uint64_t seed,
                            uint64_t step, int64_t v0, int64_t v1, int64_t u0,
                            int64_t u1, int32_t* out_obj, int32_t* out_view,
                            int16_t* out_uv, uint8_t* out_rgb,
                            int n_threads) {
  if (N <= 0 || V <= 0 || H <= 0 || W <= 0 || B <= 0) return 1;
  if (v0 < 0 || v1 > H || u0 < 0 || u1 > W || v0 >= v1 || u0 >= u1) return 2;
  if (H > 32767 || W > 32767) return 3;  // uv is int16
  CompactArgs a{images, N,  V,  H,  W,       B,        seed,   step,
                v0,     v1, u0, u1, out_obj, out_view, out_uv, out_rgb};
  if (n_threads <= 1 || B < 4096) {
    sample_range_compact(a, 0, B);
    return 0;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (B + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = lo + chunk < B ? lo + chunk : B;
    if (lo >= hi) break;
    threads.emplace_back([&a, lo, hi] { sample_range_compact(a, lo, hi); });
  }
  for (auto& th : threads) th.join();
  return 0;
}

// Returns 0 on success.
int cn_sample_batch(const uint8_t* images, const float* poses,
                    const float* focals, int64_t N, int64_t V, int64_t H,
                    int64_t W, int64_t B, uint64_t seed, uint64_t step,
                    int64_t v0, int64_t v1, int64_t u0, int64_t u1,
                    int32_t* out_obj, float* out_uv, float* out_c2w,
                    float* out_focal, float* out_rgb, int n_threads) {
  if (N <= 0 || V <= 0 || H <= 0 || W <= 0 || B <= 0) return 1;
  if (v0 < 0 || v1 > H || u0 < 0 || u1 > W || v0 >= v1 || u0 >= u1) return 2;
  Args a{images, poses,  focals, N,  V,  H,  W,       B,        seed, step,
         v0,     v1,     u0,     u1, out_obj, out_uv, out_c2w, out_focal,
         out_rgb};
  if (n_threads <= 1 || B < 4096) {
    sample_range(a, 0, B);
    return 0;
  }
  std::vector<std::thread> threads;
  const int64_t chunk = (B + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = lo + chunk < B ? lo + chunk : B;
    if (lo >= hi) break;
    threads.emplace_back([&a, lo, hi] { sample_range(a, lo, hi); });
  }
  for (auto& th : threads) th.join();
  return 0;
}

// All pixels of one (object, view) in row-major order within the given
// bounds — the evaluation layout.
int cn_rays_of_view(const uint8_t* images, const float* poses,
                    const float* focals, int64_t N, int64_t V, int64_t H,
                    int64_t W, int64_t obj, int64_t view, int64_t v0,
                    int64_t v1, int64_t u0, int64_t u1, int32_t* out_obj,
                    float* out_uv, float* out_c2w, float* out_focal,
                    float* out_rgb) {
  if (obj < 0 || obj >= N || view < 0 || view >= V) return 1;
  if (v0 < 0 || v1 > H || u0 < 0 || u1 > W || v0 >= v1 || u0 >= u1) return 2;
  const float inv255 = 1.0f / 255.0f;
  const float* pose = poses + (obj * V + view) * 16;
  const float focal = focals[obj];
  int64_t i = 0;
  for (int64_t pv = v0; pv < v1; ++pv) {
    for (int64_t pu = u0; pu < u1; ++pu, ++i) {
      out_obj[i] = static_cast<int32_t>(obj);
      out_uv[2 * i] = static_cast<float>(pu);
      out_uv[2 * i + 1] = static_cast<float>(pv);
      out_focal[i] = focal;
      float* c2w = out_c2w + i * 12;
      for (int r = 0; r < 3; ++r)
        for (int c = 0; c < 4; ++c) c2w[r * 4 + c] = pose[r * 4 + c];
      const uint8_t* px = images + (((obj * V + view) * H + pv) * W + pu) * 3;
      out_rgb[3 * i] = px[0] * inv255;
      out_rgb[3 * i + 1] = px[1] * inv255;
      out_rgb[3 * i + 2] = px[2] * inv255;
    }
  }
  return 0;
}

}  // extern "C"
