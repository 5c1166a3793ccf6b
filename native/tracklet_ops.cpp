// Native host-side tracklet ops for the data pipeline.
//
// The eval dataloader dedups near-duplicate proposal tracklets with an
// O(N^2) pairwise voluminal-IoU sweep (reference dataloaders/vidvrd.py:
// 576-646) — pure-Python per-pair loops over up to ~180 tracklets per
// video. This library implements the same sweep in C++ (loaded via ctypes;
// vrdone_tpu/data/native.py falls back to numpy when the .so is absent).
//
// Build: bash native/build.sh   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>

extern "C" {

// Pairwise containment dedup of same-category tracklets.
//
// boxes:      concatenated per-tracklet per-frame boxes, xyxy float32,
//             tracklet i occupying rows [offsets[i], offsets[i+1])
// durations:  (n, 2) int64 [start, end) frame spans; row count of tracklet
//             i equals end - start
// cat_ids:    (n,) int64
// viou_thr:   containment threshold (0.9 in the reference)
// valid:      (n,) uint8 output; 1 = keep
//
// Semantics identical to the reference loop: for base < ref pairs with the
// same category and overlapping spans, compute inter-volume / vol(ref) and
// / vol(base) with the +1 box-extent convention; drop the contained one.
void viou_dedup(const float* boxes, const int64_t* offsets,
                const int64_t* durations, const int64_t* cat_ids,
                int64_t n, double viou_thr, uint8_t* valid) {
  const double TO_REMOVE = 1.0;
  for (int64_t i = 0; i < n; ++i) valid[i] = 1;

  for (int64_t base = 0; base < n; ++base) {
    if (!valid[base]) continue;
    const int64_t b0 = durations[2 * base], b1 = durations[2 * base + 1];
    for (int64_t ref = base + 1; ref < n; ++ref) {
      if (!valid[ref]) continue;
      if (cat_ids[base] != cat_ids[ref]) continue;
      const int64_t r0 = durations[2 * ref], r1 = durations[2 * ref + 1];
      if (r0 >= b1 || r1 <= b0) continue;

      const int64_t s = std::max(b0, r0), e = std::min(b1, r1);
      const float* bb = boxes + 4 * (offsets[base] + (s - b0));
      const float* rb = boxes + 4 * (offsets[ref] + (s - r0));

      double area_b = 0.0, area_r = 0.0, inter = 0.0;
      for (int64_t t = 0; t < e - s; ++t) {
        const float* a = bb + 4 * t;
        const float* c = rb + 4 * t;
        area_b += (a[2] - a[0] + TO_REMOVE) * (a[3] - a[1] + TO_REMOVE);
        area_r += (c[2] - c[0] + TO_REMOVE) * (c[3] - c[1] + TO_REMOVE);
        const double w = std::max(0.0, (double)std::min(a[2], c[2]) -
                                           std::max(a[0], c[0]) + TO_REMOVE);
        const double h = std::max(0.0, (double)std::min(a[3], c[3]) -
                                           std::max(a[1], c[1]) + TO_REMOVE);
        inter += w * h;
      }
      const double viou_br = inter / area_r;
      const double viou_rb = inter / area_b;
      if (viou_br > viou_thr && b0 <= r0 && b1 >= r1) {
        valid[ref] = 0;
      } else if (viou_rb > viou_thr && r0 <= b0 && r1 >= b1) {
        valid[base] = 0;
        break;
      }
    }
  }
}

// Pack ragged (T_i, C) float32 pair features into a padded (P, T, C) batch
// with a bool mask — the training loader's innermost copy loop.
//
// src:       concatenated features, pair i at rows [row_offsets[i],
//            row_offsets[i+1])
// n_pairs:   number of real pairs (<= pack)
// pack, t, c: output dims
// out:       (pack, t, c) float32, pre-zeroed by the caller or not (we
//            zero-fill the padding ourselves)
// mask:      (pack, t) uint8
void pack_pairs(const float* src, const int64_t* row_offsets,
                int64_t n_pairs, int64_t pack, int64_t t, int64_t c,
                float* out, uint8_t* mask) {
  for (int64_t i = 0; i < pack; ++i) {
    float* dst = out + i * t * c;
    uint8_t* m = mask + i * t;
    int64_t ti = 0;
    if (i < n_pairs) {
      const int64_t lo = row_offsets[i], hi = row_offsets[i + 1];
      ti = std::min(hi - lo, t);
      std::copy(src + lo * c, src + (lo + ti) * c, dst);
    }
    std::fill(dst + ti * c, dst + t * c, 0.0f);
    std::fill(m, m + ti, (uint8_t)1);
    std::fill(m + ti, m + t, (uint8_t)0);
    if (i >= n_pairs && t > 0) m[0] = 1;  // keep one valid frame on padding
  }
}

// Copy-only variant: out/mask are CALLOC-ZEROED by the caller (np.zeros),
// so padding stays on kernel zero pages and the memory traffic is only
// the payload — on a 1-core host the explicit zero-fill above dominated
// the batch time (write bandwidth on 3/4-padding buffers).
//
// srcs: per-pair feature pointers (each contiguous (len_i, c) float32).
void pack_pairs_nz(const float* const* srcs, const int64_t* lens,
                   int64_t n_pairs, int64_t pack, int64_t t, int64_t c,
                   float* out, uint8_t* mask) {
  for (int64_t i = 0; i < n_pairs && i < pack; ++i) {
    const int64_t ti = std::min(lens[i], t);
    std::copy(srcs[i], srcs[i] + ti * c, out + i * t * c);
    std::fill(mask + i * t, mask + i * t + ti, (uint8_t)1);
  }
  for (int64_t i = n_pairs; i < pack; ++i) {
    if (t > 0) mask[i * t] = 1;  // keep one valid frame on padding
  }
}

}  // extern "C"
