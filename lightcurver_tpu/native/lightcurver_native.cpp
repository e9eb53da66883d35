// Native host-side preprocessing kernels for lightcurver_tpu.
//
// The reference pipeline delegates its per-frame host preprocessing to the
// C library `sep` (background mesh estimation + source extraction;
// reference lightcurver/processes/background_estimation.py:25,
// star_extraction.py:23). This translation unit provides the same
// capability natively: a sigma-clipped mesh background model and a
// flood-fill source extractor with second-moment shape measurements.
// Exposed through a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: g++ -O3 -march=native -shared -fPIC -o liblightcurver_native.so
//        lightcurver_native.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

struct BoxStats {
  float mode;
  float rms;
};

// numpy-compatible median (average of the two central values for even n).
double median_of(std::vector<float>& values) {
  size_t n = values.size();
  std::nth_element(values.begin(), values.begin() + n / 2, values.end());
  double med = values[n / 2];
  if (n % 2 == 0) {
    // the other central element is the max of the lower partition
    float lower = *std::max_element(values.begin(), values.begin() + n / 2);
    med = 0.5 * (med + lower);
  }
  return med;
}

void mean_std_of(const std::vector<float>& values, double* mean,
                 double* std) {
  size_t n = values.size();
  double m = 0.0;
  for (float v : values) m += v;
  m /= n;
  double s = 0.0;
  for (float v : values) s += (v - m) * (v - m);
  *mean = m;
  *std = std::sqrt(s / n);
}

// SExtractor-style clipped mode estimate of one mesh box.  Mirrors the
// Python fallback (processes/background_estimation._sigma_clip_box):
// stats are recomputed on the FINAL surviving sample after the clipping
// loop, and an empty box reports NaN (the caller fills with the global
// median, matching the fallback's convention).
BoxStats clipped_mode(std::vector<float>& values) {
  const float kNan = std::numeric_limits<float>::quiet_NaN();
  if (values.empty()) return {kNan, kNan};
  // 3 iterations of 3-sigma clipping about the median
  for (int iter = 0; iter < 3; ++iter) {
    double med = median_of(values);
    double mean, std;
    mean_std_of(values, &mean, &std);
    if (std == 0.0) break;
    std::vector<float> kept;
    kept.reserve(values.size());
    for (float v : values)
      if (std::fabs(v - med) <= 3.0 * std) kept.push_back(v);
    if (kept.size() == values.size() || kept.empty()) break;
    values.swap(kept);
  }
  double med = median_of(values);
  double mean, std;
  mean_std_of(values, &mean, &std);
  double mode = 2.5 * med - 1.5 * mean;
  if (std == 0.0 || std::fabs(med - mean) / (std + 1e-30) > 0.3) mode = med;
  return {static_cast<float>(mode), static_cast<float>(std)};
}

}  // namespace

extern "C" {

// Mesh background: per-box clipped mode + rms over a (gy, gx) grid.
// mask: optional (may be nullptr), nonzero = excluded pixel.
void lc_background_mesh(const float* image, const uint8_t* mask, int ny,
                        int nx, int gy, int gx, float* back_grid,
                        float* rms_grid) {
  std::vector<float> box;
  for (int by = 0; by < gy; ++by) {
    int y0 = static_cast<int>(static_cast<int64_t>(by) * ny / gy);
    int y1 = static_cast<int>(static_cast<int64_t>(by + 1) * ny / gy);
    for (int bx = 0; bx < gx; ++bx) {
      int x0 = static_cast<int>(static_cast<int64_t>(bx) * nx / gx);
      int x1 = static_cast<int>(static_cast<int64_t>(bx + 1) * nx / gx);
      box.clear();
      for (int y = y0; y < y1; ++y)
        for (int x = x0; x < x1; ++x) {
          if (mask && mask[y * nx + x]) continue;
          float v = image[y * nx + x];
          if (std::isfinite(v)) box.push_back(v);
        }
      BoxStats st = clipped_mode(box);
      back_grid[by * gx + bx] = st.mode;
      rms_grid[by * gx + bx] = st.rms;
    }
  }
}

// Source extraction: connected components above threshold * sigma with
// flood fill (8-connectivity), flux-weighted centroids and second
// moments. Output layout per source (8 floats):
//   [x, y, flux, a, b, npix, peak, sum_positive]
// Returns the number of sources found (capped at max_sources).
int lc_extract_sources(const float* image, const float* variance, int ny,
                       int nx, float threshold, int min_area,
                       float* out, int max_sources, int32_t* seg_map) {
  const int64_t npix = static_cast<int64_t>(ny) * nx;
  std::vector<int32_t> seg_local;
  int32_t* seg = seg_map;
  if (!seg) {
    seg_local.assign(npix, 0);
    seg = seg_local.data();
  } else {
    std::memset(seg, 0, npix * sizeof(int32_t));
  }

  std::vector<int64_t> stack;
  int n_sources = 0;
  int label = 0;

  auto above = [&](int64_t idx) {
    float v = image[idx];
    float var = variance[idx];
    return std::isfinite(v) && var > 0.0f &&
           v > threshold * std::sqrt(var);
  };

  for (int64_t start = 0; start < npix; ++start) {
    if (seg[start] != 0 || !above(start)) continue;
    ++label;
    // flood fill this component
    stack.clear();
    stack.push_back(start);
    seg[start] = label;
    std::vector<int64_t> members;
    while (!stack.empty()) {
      int64_t idx = stack.back();
      stack.pop_back();
      members.push_back(idx);
      int y = static_cast<int>(idx / nx), x = static_cast<int>(idx % nx);
      for (int dy = -1; dy <= 1; ++dy)
        for (int dx = -1; dx <= 1; ++dx) {
          if (!dy && !dx) continue;
          int yy = y + dy, xx = x + dx;
          if (yy < 0 || yy >= ny || xx < 0 || xx >= nx) continue;
          int64_t j = static_cast<int64_t>(yy) * nx + xx;
          if (seg[j] == 0 && above(j)) {
            seg[j] = label;
            stack.push_back(j);
          }
        }
    }
    if (static_cast<int>(members.size()) < min_area) {
      for (int64_t idx : members) seg[idx] = -1;  // too small: drop
      continue;
    }
    if (n_sources >= max_sources) break;

    // moments (weights: positive part of the image)
    double wsum = 0, xs = 0, ysum = 0, flux = 0, peak = -1e30;
    for (int64_t idx : members) {
      double v = image[idx];
      flux += v;
      peak = std::max(peak, v);
      double w = std::max(v, 0.0);
      wsum += w;
      xs += w * (idx % nx);
      ysum += w * (idx / nx);
    }
    if (wsum <= 0) continue;
    double xc = xs / wsum, yc = ysum / wsum;
    double x2 = 0, y2 = 0, xy = 0;
    for (int64_t idx : members) {
      double w = std::max(static_cast<double>(image[idx]), 0.0);
      double dx = (idx % nx) - xc, dy = (idx / nx) - yc;
      x2 += w * dx * dx;
      y2 += w * dy * dy;
      xy += w * dx * dy;
    }
    x2 /= wsum; y2 /= wsum; xy /= wsum;
    double t = 0.5 * (x2 + y2);
    double d = std::sqrt(std::max(0.25 * (x2 - y2) * (x2 - y2) + xy * xy,
                                  0.0));
    float* row = out + 8 * n_sources;
    row[0] = static_cast<float>(xc);
    row[1] = static_cast<float>(yc);
    row[2] = static_cast<float>(flux);
    row[3] = static_cast<float>(std::sqrt(std::max(t + d, 1e-12)));
    row[4] = static_cast<float>(std::sqrt(std::max(t - d, 1e-12)));
    row[5] = static_cast<float>(members.size());
    row[6] = static_cast<float>(peak);
    row[7] = static_cast<float>(wsum);
    ++n_sources;
  }
  return n_sources;
}

}  // extern "C"
