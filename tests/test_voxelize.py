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


def test_batched_map_run_bounds_flat_contract():
    """_batched_point_voxel_map must emit run machinery valid in the FLAT
    B*P segment space: segmented_run_sums over the batched map equals the
    per-sample sums stacked (advisor r4 — run_bounds used to stay
    per-sample-shaped while every other leaf was flattened)."""
    import jax
    import jax.numpy as jnp
    from futuredet_tpu.config import ExperimentConfig, VoxelConfig
    from futuredet_tpu.models.detector import _batched_point_voxel_map

    B, P, MV = 3, 400, 64
    rng = np.random.default_rng(7)
    pts = np.concatenate([rng.uniform(-8, 8, (B, P, 2)),
                          rng.uniform(-2.5, 2.5, (B, P, 1)),
                          rng.uniform(0, 1, (B, P, 2))], -1).astype(np.float32)
    valid = rng.random((B, P)) < 0.8
    valid[2, :] = False            # one all-invalid sample (edge case)
    cfg = ExperimentConfig(voxel=VoxelConfig(
        pc_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 3.0),
        voxel_size=(0.5, 0.5, 0.5), max_points_per_voxel=5,
        max_voxels_train=MV, max_voxels_eval=MV, max_points=P))
    m = _batched_point_voxel_map(jnp.asarray(pts), jnp.asarray(valid),
                                 cfg, MV)
    assert m.run_bounds.shape == (B * MV + 1,)
    got = np.asarray(V.segmented_run_sums(
        jnp.where(m.valid[:, None], m.points, 0.0), m.is_first,
        m.run_bounds))
    want = []
    for b in range(B):
        mb = V.point_voxel_map(
            jnp.asarray(pts[b]), jnp.asarray(valid[b]),
            jnp.asarray(cfg.voxel.pc_range), jnp.asarray(cfg.voxel.voxel_size),
            grid_size=cfg.voxel.grid_size, max_voxels=MV, max_points=5)
        want.append(np.asarray(V.segmented_run_sums(
            jnp.where(mb.valid[:, None], mb.points, 0.0), mb.is_first,
            mb.run_bounds)))
    np.testing.assert_allclose(got, np.concatenate(want), rtol=1e-5,
                               atol=1e-5)


def test_segmented_run_sums_fixed_depth_matches_general():
    """max_run fixed-depth Hillis-Steele segmented scan == the general
    associative scan, including runs much longer than max_run (their
    ranks >= max_run are zero-masked, mirroring the voxelizer contract)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    P, F, max_run = 5000, 4, 10
    # random run structure incl. very long runs
    lens = []
    while sum(lens) < P:
        lens.append(int(rng.choice([1, 2, 3, 7, 10, 40, 500])))
    starts = np.cumsum([0] + lens)[:-1]
    starts = starts[starts < P]
    is_first = np.zeros(P, bool)
    is_first[starts] = True
    rank = np.arange(P) - np.maximum.accumulate(np.where(is_first,
                                                         np.arange(P), -1))
    vals = rng.normal(size=(P, F)).astype(np.float32)
    vals[rank >= max_run] = 0.0                      # voxelizer masking
    V = len(starts)
    run_bounds = np.concatenate([starts, [P] * (V + 1)])[:V + 1].astype(
        np.int32)
    from futuredet_tpu.ops.voxelize import segmented_run_sums
    gen = np.asarray(segmented_run_sums(jnp.asarray(vals),
                                        jnp.asarray(is_first),
                                        jnp.asarray(run_bounds)))
    fix = np.asarray(segmented_run_sums(jnp.asarray(vals),
                                        jnp.asarray(is_first),
                                        jnp.asarray(run_bounds),
                                        max_run=max_run))
    np.testing.assert_allclose(fix, gen, rtol=1e-6, atol=1e-6)
