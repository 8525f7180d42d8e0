"""Native C++ host library vs numpy oracles."""
import numpy as np
import pytest

from futuredet_tpu.utils import native as N
from futuredet_tpu.ops.voxelize import points_to_voxel_np

pytestmark = pytest.mark.skipif(not N.available(),
                                reason="native lib failed to build")


def test_native_voxelize_matches_numba_oracle():
    rng = np.random.default_rng(0)
    pts = np.concatenate([rng.uniform(-6, 6, (4000, 3)),
                          rng.uniform(0, 1, (4000, 2))], -1).astype(np.float32)
    vs = (0.5, 0.5, 1.0)
    cr = (-5.0, -5.0, -3.0, 5.0, 5.0, 3.0)
    ref_v, ref_c, ref_n = points_to_voxel_np(pts, vs, cr, max_points=5,
                                             max_voxels=3000)
    got_v, got_c, got_n = N.voxelize_native(pts, vs, cr, max_points=5,
                                            max_voxels=3000)
    np.testing.assert_array_equal(got_c, ref_c)
    np.testing.assert_array_equal(got_n, ref_n)
    np.testing.assert_allclose(got_v, ref_v, rtol=1e-6)


def test_native_load_sweeps(tmp_path):
    rng = np.random.default_rng(1)
    paths, tms, lags = [], [], []
    # keyframe: no transform, lag 0
    key = np.concatenate([rng.uniform(-10, 10, (500, 3)),
                          rng.uniform(0, 1, (500, 2))], -1).astype(np.float32)
    kp = tmp_path / "key.bin"
    key.tofile(kp)
    paths.append(str(kp))
    tms.append(None)
    lags.append(0.0)
    # sweep: +1m x translation, lag 0.05; includes close points to be removed
    sw = np.concatenate([rng.uniform(-10, 10, (300, 3)),
                         rng.uniform(0, 1, (300, 2))], -1).astype(np.float32)
    sw[:10, :2] = 0.1  # close to origin -> removed
    sp = tmp_path / "sweep.bin"
    sw.tofile(sp)
    tm = np.eye(4)
    tm[0, 3] = 1.0
    paths.append(str(sp))
    tms.append(tm)
    lags.append(0.05)

    out = N.load_sweeps_native(paths, tms, lags, max_points=2000)
    assert out is not None
    assert out.shape[1] == 6
    n_key = (out[:, 5] == 0.0).sum()
    n_sweep = (np.abs(out[:, 5] - 0.05) < 1e-9).sum()
    assert n_key == 500
    # close points removed from the sweep only
    close_in_sweep = ((np.abs(sw[:, 0]) < 1) & (np.abs(sw[:, 1]) < 1)).sum()
    assert n_sweep == 300 - close_in_sweep
    # transform applied: sweep x values shifted by +1
    sweep_rows = out[np.abs(out[:, 5] - 0.05) < 1e-9]
    kept = sw[~((np.abs(sw[:, 0]) < 1) & (np.abs(sw[:, 1]) < 1))]
    np.testing.assert_allclose(np.sort(sweep_rows[:, 0]),
                               np.sort(kept[:, 0] + 1.0), atol=1e-5)


def test_native_shuffle_preserves_set():
    pts = np.arange(600, dtype=np.float32).reshape(100, 6)
    orig = pts.copy()
    ok = N.shuffle_native(pts, seed=3)
    assert ok
    assert not np.array_equal(pts, orig)
    np.testing.assert_array_equal(np.sort(pts[:, 0]), np.sort(orig[:, 0]))
