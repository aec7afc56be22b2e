// Host-side sweep organizer: raw unordered LiDAR points -> organized
// [rings, width] grid (the MultiScanRegistration ingest path,
// /root/reference/L_SLAM/src/odometry/MultiScanRegistration.cpp:95-200).
//
// This is the framework's native runtime component for data ingest: the
// per-point axis remap / ring binning / azimuth ordering is pure host-side
// marshalling that must keep up with sensor rate x batch on the feed side of
// the device; a Python loop cannot.  OpenMP-parallel over points, exposed
// through a plain C ABI for ctypes.
//
// Build:  make -C native   (produces libsweep_binner.so)

#include <cmath>
#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr float kPi = 3.14159265358979323846f;

inline float fast_atan2(float y, float x) { return std::atan2(y, x); }

}  // namespace

namespace {

// Nearest ring in an ascending elevation-angle table (the Pandar40-style
// vendor table mapper, lidar_type.h:13-72: ring = index of the closest
// channel angle).  Binary search + one neighbor compare.
inline int table_ring(float v_deg, const float* table, int n_rings) {
  int lo = 0, hi = n_rings - 1;
  while (lo < hi) {
    int mid = (lo + hi) / 2;
    if (table[mid] < v_deg)
      lo = mid + 1;
    else
      hi = mid;
  }
  if (lo > 0 &&
      std::fabs(v_deg - table[lo - 1]) <= std::fabs(v_deg - table[lo]))
    return lo - 1;
  return lo;
}

}  // namespace

extern "C" {

// Organize one sweep.
//   pts:        [n, 3] float32 raw device points
//   n:          number of input points
//   axis_remap: nonzero -> LOAM remap (x,y,z) <- (y,z,x)
//   n_rings, width: output grid shape
//   lower_deg, upper_deg: linear ring mapper bounds (vertical angle)
//   min_range, max_range: radial cull
//   out_xyz:    [n_rings * width * 3] float32 (filled with sentinel)
//   out_mask:   [n_rings * width] uint8
//   out_rel:    [n_rings * width] float32 in-sweep time fraction
// Returns the number of points binned.
static int bin_sweep_impl(const float* pts, int n, int axis_remap, int n_rings,
                          int width, float lower_deg, float upper_deg,
                          const float* table, float min_range, float max_range,
                          float sentinel, float* out_xyz, uint8_t* out_mask,
                          float* out_rel) {
  const int cells = n_rings * width;
  for (int i = 0; i < cells; ++i) {
    out_xyz[3 * i + 0] = sentinel;
    out_xyz[3 * i + 1] = sentinel;
    out_xyz[3 * i + 2] = sentinel;
    out_mask[i] = 0;
    out_rel[i] = 0.0f;
  }

  const float ring_factor = (n_rings - 1) / (upper_deg - lower_deg);
  // best (nearest) point per cell wins; track range for the tie-break
  float* best_range = new float[cells];
  for (int i = 0; i < cells; ++i) best_range[i] = 1e30f;

  int binned = 0;
#ifdef _OPENMP
#pragma omp parallel for reduction(+ : binned) schedule(static)
#endif
  for (int i = 0; i < n; ++i) {
    float x = pts[3 * i + 0];
    float y = pts[3 * i + 1];
    float z = pts[3 * i + 2];
    if (!std::isfinite(x) || !std::isfinite(y) || !std::isfinite(z)) continue;
    if (axis_remap) {  // (x,y,z) <- (y,z,x), MultiScanRegistration.cpp:120-123
      float ox = x, oy = y, oz = z;
      x = oy;
      y = oz;
      z = ox;
    }
    const float r = std::sqrt(x * x + y * y + z * z);
    if (r <= min_range || r >= max_range) continue;

    const float horiz = std::sqrt(x * x + z * z);
    const float v_deg = std::atan2(y, horiz) * (180.0f / kPi);
    const int ring = table ? table_ring(v_deg, table, n_rings)
                           : (int)std::lround((v_deg - lower_deg) * ring_factor);
    if (ring < 0 || ring >= n_rings) continue;

    float az = fast_atan2(z, x);
    if (az < 0) az += 2.0f * kPi;
    const float rel = az / (2.0f * kPi);
    int col = (int)(rel * width);
    if (col >= width) col = width - 1;

    const int cell = ring * width + col;
    // nearest-point-wins without locks: benign race resolved by re-check
    if (r < best_range[cell]) {
#ifdef _OPENMP
#pragma omp critical
#endif
      {
        if (r < best_range[cell]) {
          best_range[cell] = r;
          out_xyz[3 * cell + 0] = x;
          out_xyz[3 * cell + 1] = y;
          out_xyz[3 * cell + 2] = z;
          out_mask[cell] = 1;
          out_rel[cell] = rel;
        }
      }
      ++binned;
    }
  }
  delete[] best_range;
  return binned;
}

int bin_sweep(const float* pts, int n, int axis_remap, int n_rings, int width,
              float lower_deg, float upper_deg, float min_range,
              float max_range, float sentinel, float* out_xyz,
              uint8_t* out_mask, float* out_rel) {
  return bin_sweep_impl(pts, n, axis_remap, n_rings, width, lower_deg,
                        upper_deg, /*table=*/nullptr, min_range, max_range,
                        sentinel, out_xyz, out_mask, out_rel);
}

// Table-mapper variant: ring = nearest channel in an ASCENDING elevation
// table of n_rings angles (degrees) — the Pandar40 vendor calibration
// (lidar_type.h:13-72).
int bin_sweep_table(const float* pts, int n, int axis_remap, int n_rings,
                    int width, const float* table_deg, float min_range,
                    float max_range, float sentinel, float* out_xyz,
                    uint8_t* out_mask, float* out_rel) {
  return bin_sweep_impl(pts, n, axis_remap, n_rings, width, 0.0f, 1.0f,
                        table_deg, min_range, max_range, sentinel, out_xyz,
                        out_mask, out_rel);
}

// Batched variant: b sweeps, each n points, outputs stacked grids.
int bin_sweep_batch(const float* pts, int b, int n, int axis_remap,
                    int n_rings, int width, float lower_deg, float upper_deg,
                    float min_range, float max_range, float sentinel,
                    float* out_xyz, uint8_t* out_mask, float* out_rel) {
  const int cells = n_rings * width;
  int total = 0;
#ifdef _OPENMP
#pragma omp parallel for reduction(+ : total) schedule(dynamic)
#endif
  for (int s = 0; s < b; ++s) {
    total += bin_sweep(pts + (size_t)s * n * 3, n, axis_remap, n_rings, width,
                       lower_deg, upper_deg, min_range, max_range, sentinel,
                       out_xyz + (size_t)s * cells * 3,
                       out_mask + (size_t)s * cells,
                       out_rel + (size_t)s * cells);
  }
  return total;
}

int bin_sweep_table_batch(const float* pts, int b, int n, int axis_remap,
                          int n_rings, int width, const float* table_deg,
                          float min_range, float max_range, float sentinel,
                          float* out_xyz, uint8_t* out_mask, float* out_rel) {
  const int cells = n_rings * width;
  int total = 0;
#ifdef _OPENMP
#pragma omp parallel for reduction(+ : total) schedule(dynamic)
#endif
  for (int s = 0; s < b; ++s) {
    total += bin_sweep_table(pts + (size_t)s * n * 3, n, axis_remap, n_rings,
                             width, table_deg, min_range, max_range, sentinel,
                             out_xyz + (size_t)s * cells * 3,
                             out_mask + (size_t)s * cells,
                             out_rel + (size_t)s * cells);
  }
  return total;
}

}  // extern "C"
