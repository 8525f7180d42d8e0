// Native host-side data path for FutureDet-TPU.
//
// The reference runs its data path natively too (numba-compiled kernels and
// C++ extensions inside torch DataLoader workers:
// det3d/ops/point_cloud/point_cloud_ops.py, det3d/datasets/pipelines/
// loading.py). This library provides the equivalent host hot path as plain
// C++ exposed over a C ABI (consumed via ctypes — no pybind11 in this
// environment):
//
//   fd_load_sweeps   multi-threaded .bin decode + homogeneous transform +
//                    remove_close + time-lag column + concat
//   fd_voxelize      hard voxelization (FCFS capping, zyx coords) — exact
//                    semantics of the reference numba kernel
//                    (_points_to_voxel_reverse_kernel)
//   fd_shuffle       Fisher–Yates point shuffle (seeded)
//
// Build: make -C csrc  (g++ -O3 -shared -fPIC)
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <cmath>
#include <random>
#include <thread>
#include <vector>

extern "C" {

// Read one nuScenes .bin (float32 rows of `file_feats`), apply an optional
// 4x4 row-major transform to xyz, drop points with |x|<radius && |y|<radius,
// write rows of `out_feats` (= keep_feats + 1 time-lag column) into `stage`,
// which is resized to the FILE's own point count — NOT the caller's overall
// max_points budget: zero-filling a per-sweep max_points buffer (4M rows x
// 20 sweeps = 1.9 GB of memset) used to dominate the whole sample load.
// Returns number of points written, or -1 on IO error.
static int64_t load_one(const char* path, const double* tm, double time_lag,
                        double close_radius, std::vector<float>& stage,
                        int64_t max_out, int file_feats, int keep_feats) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  fseek(f, 0, SEEK_END);
  long bytes = ftell(f);
  fseek(f, 0, SEEK_SET);
  int64_t n = bytes / (sizeof(float) * file_feats);
  std::vector<float> buf(n * file_feats);
  size_t rd = fread(buf.data(), sizeof(float), n * file_feats, f);
  fclose(f);
  if ((int64_t)rd != n * file_feats) return -1;

  int out_feats = keep_feats + 1;
  if (max_out > n) max_out = n;
  stage.resize(max_out * out_feats);
  float* out = stage.data();
  int64_t w = 0;
  for (int64_t i = 0; i < n && w < max_out; ++i) {
    const float* p = &buf[i * file_feats];
    double x = p[0], y = p[1], z = p[2];
    if (std::fabs(x) < close_radius && std::fabs(y) < close_radius) continue;
    if (tm) {
      double nx = tm[0] * x + tm[1] * y + tm[2] * z + tm[3];
      double ny = tm[4] * x + tm[5] * y + tm[6] * z + tm[7];
      double nz = tm[8] * x + tm[9] * y + tm[10] * z + tm[11];
      x = nx; y = ny; z = nz;
    }
    float* o = &out[w * out_feats];
    o[0] = (float)x; o[1] = (float)y; o[2] = (float)z;
    for (int k = 3; k < keep_feats; ++k) o[k] = p[k];
    o[keep_feats] = (float)time_lag;
    ++w;
  }
  return w;
}

// paths: `n_sweeps` null-separated strings; transforms: (n_sweeps, 16)
// row-major or nullptr rows flagged by has_tm; lags: (n_sweeps,).
// out: (max_points, keep_feats+1). Returns total points written.
int64_t fd_load_sweeps(const char* const* paths, const uint8_t* has_tm,
                       const double* transforms, const double* lags,
                       int64_t n_sweeps, double close_radius,
                       float* out, int64_t max_points,
                       int file_feats, int keep_feats) {
  int out_feats = keep_feats + 1;
  // per-sweep staging buffers written in parallel, then compacted
  std::vector<std::vector<float>> stage(n_sweeps);
  std::vector<int64_t> counts(n_sweeps, 0);
  std::vector<std::thread> workers;
  int n_threads = std::min<int64_t>(n_sweeps,
                                    std::thread::hardware_concurrency());
  std::vector<int64_t> next(1, 0);
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&, t]() {
      for (int64_t i = t; i < n_sweeps; i += n_threads) {
        // keyframe (i==0) keeps close points: ref loading.py applies
        // remove_close only to sweeps
        double radius = (i == 0) ? 0.0 : close_radius;
        const double* tm = has_tm[i] ? &transforms[i * 16] : nullptr;
        int64_t c = load_one(paths[i], tm, lags[i], radius,
                             stage[i], max_points, file_feats,
                             keep_feats);
        counts[i] = c < 0 ? 0 : c;
      }
    });
  }
  for (auto& w : workers) w.join();

  int64_t total = 0;
  for (int64_t i = 0; i < n_sweeps && total < max_points; ++i) {
    int64_t take = std::min(counts[i], max_points - total);
    std::memcpy(&out[total * out_feats], stage[i].data(),
                take * out_feats * sizeof(float));
    total += take;
  }
  return total;
}

// Exact port of the reference numba voxelizer semantics
// (_points_to_voxel_reverse_kernel, point_cloud_ops.py:8-55).
int64_t fd_voxelize(const float* points, int64_t n_points, int n_feats,
                    const double* voxel_size, const double* coors_range,
                    int max_points, int64_t max_voxels,
                    float* voxels,        // (max_voxels, max_points, n_feats)
                    int32_t* coors,       // (max_voxels, 3) zyx
                    int32_t* num_points,  // (max_voxels,)
                    int32_t* coor_to_idx  // (gz*gy*gx,) scratch, -1 filled
                    ) {
  int grid[3];
  for (int j = 0; j < 3; ++j)
    grid[j] = (int)std::llround((coors_range[3 + j] - coors_range[j])
                                 / voxel_size[j]);
  int64_t voxel_num = 0;
  for (int64_t i = 0; i < n_points; ++i) {
    int c[3];
    bool failed = false;
    for (int j = 0; j < 3; ++j) {
      int v = (int)std::floor((points[i * n_feats + j] - coors_range[j])
                              / voxel_size[j]);
      if (v < 0 || v >= grid[j]) { failed = true; break; }
      c[2 - j] = v;
    }
    if (failed) continue;
    int64_t flat = ((int64_t)c[0] * grid[1] + c[1]) * grid[0] + c[2];
    int32_t idx = coor_to_idx[flat];
    if (idx == -1) {
      if (voxel_num >= max_voxels) continue;
      idx = (int32_t)voxel_num++;
      coor_to_idx[flat] = idx;
      coors[idx * 3 + 0] = c[0];
      coors[idx * 3 + 1] = c[1];
      coors[idx * 3 + 2] = c[2];
    }
    int32_t num = num_points[idx];
    if (num < max_points) {
      std::memcpy(&voxels[((int64_t)idx * max_points + num) * n_feats],
                  &points[i * n_feats], n_feats * sizeof(float));
      num_points[idx] = num + 1;
    }
  }
  return voxel_num;
}

// Greedy score-ordered matching of multi-future prediction units against
// ground truth — the hot loop of the joint detection+forecasting evaluator
// (futuredet_tpu/eval/metrics.py::_accumulate; behavioral equivalent of the
// nuscenes-forecast devkit accumulate() consumed by the reference at
// det3d/datasets/nuscenes/nusc_common.py:667). Units arrive pre-sorted by
// descending score; members within a unit likewise (top-K multi-future).
//
// Per unit, members are tried in order; a member proposes the single
// nearest FREE ground truth of its sample at `match_timestep` and fails if
// that distance >= dist_th or (when final_match_th >= 0) the final-timestep
// distance >= final_match_th. First success takes the GT.
//
// Outputs per unit: tp flag, and for TPs the 8 error terms
// (trans, scale, orient, vel, attr, ade, fde, miss) in errs_out[u*8..].
// attr_err follows nuScenes attr_acc: NaN (host cummean skips it) when the
// GT carries no attribute (id < 0), else exact-id mismatch.
void fd_accumulate2(
    const int32_t* unit_offsets,  // (n_units+1,) into the member arrays
    int64_t n_units,
    const int32_t* mem_sample,    // (M,) sample id per member (-1 = no GTs)
    const float* mem_centers,     // (M, T, 2)
    const float* mem_size,        // (M, 3) w,l,h
    const float* mem_yaw,         // (M,)
    const float* mem_vel,         // (M, 2)
    const int32_t* mem_attr,      // (M,) attribute id (-1 = none)
    const int32_t* gt_offsets,    // (S+1,) GT rows grouped by sample id
    const float* gt_centers,      // (G, T, 2)
    const float* gt_size, const float* gt_yaw, const float* gt_vel,
    const int32_t* gt_attr,       // (G,) attribute id (-1 = none)
    int T, float dist_th, float final_match_th, int match_timestep,
    uint8_t association_oracle, float mr_thresh,
    uint8_t* tp_out,              // (n_units,)
    float* errs_out,              // (n_units, 8)
    uint8_t* taken                // (G,) zero-initialized by the caller
    ) {
  const float th2 = dist_th * dist_th;
  for (int64_t u = 0; u < n_units; ++u) {
    tp_out[u] = 0;
    for (int32_t m = unit_offsets[u]; m < unit_offsets[u + 1]; ++m) {
      int32_t s = mem_sample[m];
      if (s < 0) continue;
      int32_t g0 = gt_offsets[s], g1 = gt_offsets[s + 1];
      const float px = mem_centers[((int64_t)m * T + match_timestep) * 2];
      const float py = mem_centers[((int64_t)m * T + match_timestep) * 2 + 1];
      float best = 1e30f;
      int32_t bj = -1;
      for (int32_t j = g0; j < g1; ++j) {
        if (taken[j]) continue;
        float dx = gt_centers[((int64_t)j * T + match_timestep) * 2] - px;
        float dy = gt_centers[((int64_t)j * T + match_timestep) * 2 + 1] - py;
        float d2 = dx * dx + dy * dy;
        if (d2 < best) { best = d2; bj = j; }
      }
      if (bj < 0 || best >= th2) continue;
      // the matched prediction trajectory (oracle mode substitutes the GT's
      // own future, isolating detection quality — ref tools/dist_test.py:93)
      const float* pc = association_oracle
          ? &gt_centers[(int64_t)bj * T * 2]
          : &mem_centers[(int64_t)m * T * 2];
      const float* gc = &gt_centers[(int64_t)bj * T * 2];
      if (final_match_th >= 0.f) {
        float dx = pc[(T - 1) * 2] - gc[(T - 1) * 2];
        float dy = pc[(T - 1) * 2 + 1] - gc[(T - 1) * 2 + 1];
        if (dx * dx + dy * dy >= final_match_th * final_match_th) continue;
      }
      taken[bj] = 1;
      tp_out[u] = 1;
      float* e = &errs_out[u * 8];
      float ade = 0.f, d0 = 0.f, dF = 0.f;
      for (int t = 0; t < T; ++t) {
        float dx = pc[t * 2] - gc[t * 2];
        float dy = pc[t * 2 + 1] - gc[t * 2 + 1];
        float d = std::sqrt(dx * dx + dy * dy);
        ade += d;
        if (t == 0) d0 = d;
        if (t == T - 1) dF = d;
      }
      ade /= T;
      float inter = 1.f, volp = 1.f, volg = 1.f;
      for (int k = 0; k < 3; ++k) {
        inter *= std::min(mem_size[m * 3 + k], gt_size[bj * 3 + k]);
        volp *= mem_size[m * 3 + k];
        volg *= gt_size[bj * 3 + k];
      }
      float uni = volp + volg - inter;
      float dyaw = std::fmod((double)mem_yaw[m] - gt_yaw[bj] + M_PI,
                             2.0 * M_PI);
      if (dyaw < 0) dyaw += 2.0 * M_PI;
      dyaw = std::fabs(dyaw - M_PI);
      float dvx = mem_vel[m * 2] - gt_vel[bj * 2];
      float dvy = mem_vel[m * 2 + 1] - gt_vel[bj * 2 + 1];
      e[0] = d0;                               // trans_err
      e[1] = 1.f - inter / std::max(uni, 1e-9f);  // scale_err
      e[2] = dyaw;                             // orient_err
      e[3] = std::sqrt(dvx * dvx + dvy * dvy); // vel_err
      e[4] = gt_attr[bj] < 0
          ? std::numeric_limits<float>::quiet_NaN()
          : (mem_attr[m] == gt_attr[bj] ? 0.f : 1.f);  // attr_err
      e[5] = ade;                              // avg_disp_err
      e[6] = dF;                               // final_disp_err
      e[7] = dF > mr_thresh ? 1.f : 0.f;       // miss
      break;
    }
  }
}

void fd_shuffle(float* points, int64_t n, int n_feats, uint64_t seed) {
  std::mt19937_64 rng(seed);
  std::vector<float> tmp(n_feats);
  for (int64_t i = n - 1; i > 0; --i) {
    int64_t j = rng() % (i + 1);
    std::memcpy(tmp.data(), &points[i * n_feats], n_feats * sizeof(float));
    std::memcpy(&points[i * n_feats], &points[j * n_feats],
                n_feats * sizeof(float));
    std::memcpy(&points[j * n_feats], tmp.data(), n_feats * sizeof(float));
  }
}

}  // extern "C"
