"""Device voxelizer vs. exact numpy-oracle port of the reference numba kernel."""
import numpy as np

from futuredet_tpu.ops import voxelize as V


def _rand_points(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([
        rng.uniform(-6, 6, (n, 3)),          # xyz
        rng.uniform(0, 1, (n, 2)),           # intensity, time
    ], axis=1).astype(np.float32)
    return pts


PC_RANGE = (-5.0, -5.0, -3.0, 5.0, 5.0, 3.0)
VOXEL_SIZE = (0.5, 0.5, 1.0)
GRID = (20, 20, 6)


def _as_dict(voxels, coords, num_points):
    return {tuple(c): (num, voxels[i, :num]) for i, (c, num) in
            enumerate(zip(coords.tolist(), num_points.tolist()))}


def test_voxelize_matches_numba_oracle():
    pts = _rand_points()
    ref_v, ref_c, ref_n = V.points_to_voxel_np(
        pts, VOXEL_SIZE, PC_RANGE, max_points=5, max_voxels=4000)

    out = V.voxelize(pts, np.ones(len(pts), bool), np.array(PC_RANGE),
                     np.array(VOXEL_SIZE), grid_size=GRID,
                     max_voxels=4000, max_points=5)
    n = int(out.num_voxels)
    ours = _as_dict(np.asarray(out.voxels), np.asarray(out.coords)[:n],
                    np.asarray(out.num_points)[:n])
    ref = _as_dict(ref_v, ref_c, ref_n)

    assert set(ours) == set(ref)
    for k in ref:
        assert ours[k][0] == ref[k][0], k
        np.testing.assert_allclose(ours[k][1], ref[k][1], rtol=1e-6)


def test_voxelize_fcfs_capping():
    # 10 points in the same voxel; cap 3 -> first 3 in input order kept
    pts = np.zeros((10, 4), np.float32)
    pts[:, 0] = 0.1
    pts[:, 3] = np.arange(10)
    out = V.voxelize(pts, np.ones(10, bool), np.array(PC_RANGE),
                     np.array(VOXEL_SIZE), grid_size=GRID,
                     max_voxels=10, max_points=3)
    assert int(out.num_voxels) == 1
    assert int(out.num_points[0]) == 3
    np.testing.assert_array_equal(np.asarray(out.voxels)[0, :, 3], [0, 1, 2])


def test_voxelize_mean_matches_buffer_mean():
    pts = _rand_points(2000, seed=3)
    out = V.voxelize(pts, np.ones(len(pts), bool), np.array(PC_RANGE),
                     np.array(VOXEL_SIZE), grid_size=GRID,
                     max_voxels=4000, max_points=5)
    feats, coords, num_points, num_voxels = V.voxelize_mean(
        pts, np.ones(len(pts), bool), np.array(PC_RANGE),
        np.array(VOXEL_SIZE), grid_size=GRID, max_voxels=4000, max_points=5)
    n = int(num_voxels)
    vox = np.asarray(out.voxels)
    np_mean = vox[:n].sum(1) / np.maximum(np.asarray(out.num_points)[:n], 1)[:, None]
    np.testing.assert_allclose(np.asarray(feats)[:n], np_mean, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(coords)[:n], np.asarray(out.coords)[:n])


def test_voxelize_respects_point_valid_mask():
    pts = _rand_points(100, seed=4)
    valid = np.zeros(100, bool)
    valid[:50] = True
    out_half = V.voxelize(pts, valid, np.array(PC_RANGE), np.array(VOXEL_SIZE),
                          grid_size=GRID, max_voxels=500, max_points=5)
    ref_v, ref_c, ref_n = V.points_to_voxel_np(
        pts[:50], VOXEL_SIZE, PC_RANGE, max_points=5, max_voxels=500)
    assert int(out_half.num_voxels) == len(ref_c)
