"""Augmentation semantics: synchronized transforms keep points and boxes
consistent across all forecast timesteps."""
import numpy as np

from futuredet_tpu.data import augment as A
from futuredet_tpu.core import boxes as B


def _scene(seed=0, T=7, M=5):
    rng = np.random.default_rng(seed)
    gt = np.zeros((T, M, 12), np.float32)
    gt[..., :2] = rng.uniform(-20, 20, (T, M, 2))
    gt[..., 2] = -1.0
    gt[..., 3:6] = [2, 4.5, 1.6]
    gt[..., 6:8] = rng.uniform(-5, 5, (T, M, 2))
    gt[..., 8:10] = gt[..., 6:8]
    gt[..., 10] = rng.uniform(-np.pi, np.pi, (T, M))
    gt[..., 11] = gt[..., 10]
    pts = np.concatenate([rng.uniform(-20, 20, (1000, 3)),
                          rng.uniform(0, 1, (1000, 2))], -1).astype(np.float32)
    return gt, pts


class _FlipRng:
    """Deterministic rng: first flip fires, second doesn't."""
    def __init__(self, vals):
        self.vals = list(vals)

    def random(self):
        return self.vals.pop(0)


def test_x_flip_mirrors_y_and_velocities():
    gt, pts = _scene()
    out_gt, out_pts, flips = A.random_flip_both(gt, pts, _FlipRng([0.0, 1.0]))
    assert flips == [True, False]
    np.testing.assert_allclose(out_pts[:, 1], -pts[:, 1])
    np.testing.assert_allclose(out_gt[..., 1], -gt[..., 1])
    np.testing.assert_allclose(out_gt[..., 7], -gt[..., 7])   # vy
    np.testing.assert_allclose(out_gt[..., 10], -gt[..., 10] + np.pi)


def test_rotation_consistent_points_and_boxes():
    gt, pts = _scene(1)
    rng = np.random.default_rng(2)
    out_gt, out_pts, angle = A.global_rotation(gt, pts, rng, (-0.5, 0.5))
    c, s = np.cos(angle), np.sin(angle)
    np.testing.assert_allclose(out_pts[:, 0], pts[:, 0] * c - pts[:, 1] * s,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_gt[..., 0], gt[..., 0] * c - gt[..., 1] * s,
                               rtol=1e-5, atol=1e-5)
    # velocity rotates with positions; stored yaw advances by the angle
    np.testing.assert_allclose(out_gt[..., 6], gt[..., 6] * c - gt[..., 7] * s,
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_gt[..., 10], gt[..., 10] + angle,
                               rtol=1e-5)
    # timesteps stay synchronized: displacement vectors rotate rigidly
    d_before = gt[1, :, :2] - gt[0, :, :2]
    d_after = out_gt[1, :, :2] - out_gt[0, :, :2]
    np.testing.assert_allclose(np.linalg.norm(d_after, axis=1),
                               np.linalg.norm(d_before, axis=1), rtol=1e-5)


def test_scaling_scales_everything_linearly():
    gt, pts = _scene(3)
    rng = np.random.default_rng(4)
    out_gt, out_pts, s = A.global_scaling(gt, pts, rng, 0.8, 1.2)
    np.testing.assert_allclose(out_pts[:, :3], pts[:, :3] * s, rtol=1e-6)
    np.testing.assert_allclose(out_gt[..., 3:6], gt[..., 3:6] * s, rtol=1e-6)
    np.testing.assert_allclose(out_gt[..., 6:8], gt[..., 6:8] * s, rtol=1e-6)
    np.testing.assert_allclose(out_gt[..., 10], gt[..., 10])  # yaw unscaled


def test_full_sequence_keeps_points_inside_their_boxes():
    # a point at a box center must stay at that box's center through the
    # whole augmentation pipeline
    gt, _ = _scene(5)
    centers = gt[0, :, :3].copy()
    pts = np.concatenate([centers, np.zeros((len(centers), 2), np.float32)], -1)
    rng = np.random.default_rng(6)
    out_gt, out_pts, meta = A.apply_train_augmentations(
        gt, pts, rng, rot_noise=(-0.7, 0.7), scale_noise=(0.9, 1.1),
        translate_std=0.5)
    np.testing.assert_allclose(out_pts[:, :3], out_gt[0, :, :3],
                               rtol=1e-4, atol=1e-4)
