// libwavedata — native data-loader core for wavemamba_tpu.
//
// The reference pipeline does decode -> pad -> crop -> dihedral augment ->
// BGR->RGB -> float tensor in Python per worker process
// (basicsr/data/paired_image_dataset.py:98-131 + transforms.py). Here the
// post-decode hot path (crop + dihedral + channel swap + normalize +
// batch collate) is one fused C++ pass per image: uint8 HWC BGR in,
// float32 HWC RGB batch slot out, parallelized with std::thread across the
// batch. This replaces the reference's torch DataLoader worker processes
// and its CPU prefetcher copies with zero intermediate materialization.
//
// Build: native/build.sh -> libwavedata.so (ctypes-loaded by
// wavemamba_tpu/data/native.py).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Dihedral modes matching wavemamba_tpu.data.transforms.data_augmentation
// (numpy semantics: rot90 is counter-clockwise):
//   0: identity          1: flipud
//   2: rot90             3: flipud(rot90)
//   4: rot180            5: flipud(rot180)
//   6: rot270            7: flipud(rot270)
// For an S x S tile, output(y, x) = input(sy, sx):
inline void mode_map(int mode, int S, int y, int x, int* sy, int* sx) {
  switch (mode) {
    case 0: *sy = y;         *sx = x;         break;
    case 1: *sy = S - 1 - y; *sx = x;         break;
    case 2: *sy = x;         *sx = S - 1 - y; break;  // rot90 ccw
    case 3: *sy = x;         *sx = y;         break;  // flipud(rot90)
    case 4: *sy = S - 1 - y; *sx = S - 1 - x; break;  // rot180
    case 5: *sy = y;         *sx = S - 1 - x; break;
    case 6: *sy = S - 1 - x; *sx = y;         break;  // rot270
    case 7: *sy = S - 1 - x; *sx = S - 1 - y; break;  // flipud(rot270)
    default: *sy = y;        *sx = x;         break;
  }
}

// splitmix64 — deterministic per-item RNG.
inline uint64_t splitmix64(uint64_t* s) {
  uint64_t z = (*s += 0x9E3779B97F4A7C15ull);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
  return z ^ (z >> 31);
}

// One fused crop+augment+swap+normalize: src uint8 HWC (h, w, c) BGR ->
// dst float32 (S, S, c) RGB in [0, 1].
void crop_augment_one(const uint8_t* src, int h, int w, int c, int top,
                      int left, int S, int mode, int bgr2rgb, float* dst) {
  const float inv = 1.0f / 255.0f;
  for (int y = 0; y < S; ++y) {
    for (int x = 0; x < S; ++x) {
      int sy, sx;
      mode_map(mode, S, y, x, &sy, &sx);
      const uint8_t* p = src + ((size_t)(top + sy) * w + (left + sx)) * c;
      float* q = dst + ((size_t)y * S + x) * c;
      if (bgr2rgb && c == 3) {
        q[0] = p[2] * inv;
        q[1] = p[1] * inv;
        q[2] = p[0] * inv;
      } else {
        for (int k = 0; k < c; ++k) q[k] = p[k] * inv;
      }
    }
  }
}

}  // namespace

extern "C" {

// Single pair with explicit crop/mode (deterministic; used by tests and by
// callers that draw their own randomness).
void wd_paired_crop_augment(const uint8_t* gt, const uint8_t* lq, int h,
                            int w, int c, int top, int left, int gt_size,
                            int mode, int bgr2rgb, float* out_gt,
                            float* out_lq) {
  crop_augment_one(gt, h, w, c, top, left, gt_size, mode, bgr2rgb, out_gt);
  crop_augment_one(lq, h, w, c, top, left, gt_size, mode, bgr2rgb, out_lq);
}

// Batched version: n pairs -> float32 batches (n, S, S, c), threaded.
// Random crop origin and (if geometric) dihedral mode 1..7 are drawn from
// splitmix64(seed, item) — deterministic given (seed, i).
void wd_batch_paired_crop_augment(const uint8_t** gts, const uint8_t** lqs,
                                  const int* hs, const int* ws, int n, int c,
                                  int gt_size, uint64_t seed, int geometric,
                                  int bgr2rgb, float* out_gt, float* out_lq,
                                  int n_threads) {
  if (n_threads <= 0) n_threads = 1;
  auto work = [&](int start, int step) {
    for (int i = start; i < n; i += step) {
      uint64_t s = seed + 0x9E3779B97F4A7C15ull * (uint64_t)(i + 1);
      uint64_t r1 = splitmix64(&s), r2 = splitmix64(&s), r3 = splitmix64(&s);
      int max_top = hs[i] - gt_size;
      int max_left = ws[i] - gt_size;
      int top = max_top > 0 ? (int)(r1 % (uint64_t)(max_top + 1)) : 0;
      int left = max_left > 0 ? (int)(r2 % (uint64_t)(max_left + 1)) : 0;
      int mode = geometric ? (int)(1 + r3 % 7) : 0;
      size_t slot = (size_t)i * gt_size * gt_size * c;
      crop_augment_one(gts[i], hs[i], ws[i], c, top, left, gt_size, mode,
                       bgr2rgb, out_gt + slot);
      crop_augment_one(lqs[i], hs[i], ws[i], c, top, left, gt_size, mode,
                       bgr2rgb, out_lq + slot);
    }
  };
  if (n_threads == 1 || n <= 1) {
    work(0, 1);
    return;
  }
  std::vector<std::thread> threads;
  int t = n_threads < n ? n_threads : n;
  threads.reserve(t);
  for (int i = 0; i < t; ++i) threads.emplace_back(work, i, t);
  for (auto& th : threads) th.join();
}

// Full-image convert (val/test path): uint8 HWC BGR -> float32 HWC RGB.
void wd_to_float_rgb(const uint8_t* src, int h, int w, int c, int bgr2rgb,
                     float* dst) {
  const float inv = 1.0f / 255.0f;
  const size_t npix = (size_t)h * w;
  if (bgr2rgb && c == 3) {
    for (size_t i = 0; i < npix; ++i) {
      const uint8_t* p = src + i * 3;
      float* q = dst + i * 3;
      q[0] = p[2] * inv;
      q[1] = p[1] * inv;
      q[2] = p[0] * inv;
    }
  } else {
    const size_t nv = npix * c;
    for (size_t i = 0; i < nv; ++i) dst[i] = src[i] * inv;
  }
}

}  // extern "C"
