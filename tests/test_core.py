"""Unit tests for geometry / gaussian / trajectory cores against numpy oracles
that replicate the reference formulas exactly."""
import numpy as np
import jax.numpy as jnp

from futuredet_tpu.core import boxes as B
from futuredet_tpu.core import gaussian as G
from futuredet_tpu.core.trajectory import classify_trajectories, STATIC, LINEAR, NONLINEAR


def ref_gaussian_radius(det_size, min_overlap=0.5):
    # exact port of center_utils.py:17-38
    height, width = det_size
    a1, b1 = 1, height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 + np.sqrt(b1 ** 2 - 4 * a1 * c1)) / 2
    a2, b2 = 4, 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 + np.sqrt(b2 ** 2 - 4 * a2 * c2)) / 2
    a3, b3 = 4 * min_overlap, -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + np.sqrt(b3 ** 2 - 4 * a3 * c3)) / 2
    return min(r1, r2, r3)


def test_limit_period():
    rng = np.random.default_rng(0)
    v = rng.uniform(-10, 10, 100)
    ours = np.asarray(B.limit_period(v, 0.5, 2 * np.pi))
    ref = v - np.floor(v / (2 * np.pi) + 0.5) * (2 * np.pi)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    assert np.all(ours >= -np.pi - 1e-6) and np.all(ours < np.pi + 1e-6)


def test_corners_match_reference_convention():
    centers = np.array([[1.0, 2.0], [0.0, 0.0]])
    dims = np.array([[2.0, 4.0], [1.0, 1.0]])
    angles = np.array([0.3, -1.2])
    ours = np.asarray(B.center_to_corner_box2d(centers, dims, angles))

    # reference corners_nd order with origin 0.5 then rotation_2d
    corners_norm = np.stack(np.unravel_index(np.arange(4), [2, 2]), axis=1).astype(float)
    corners_norm = corners_norm[[0, 1, 3, 2]] - 0.5
    ref = dims.reshape(-1, 1, 2) * corners_norm.reshape(1, 4, 2)
    rot_sin, rot_cos = np.sin(angles), np.cos(angles)
    rot_mat_T = np.stack([[rot_cos, -rot_sin], [rot_sin, rot_cos]])
    ref = np.einsum("aij,jka->aik", ref, rot_mat_T) + centers.reshape(-1, 1, 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_points_in_rbbox():
    box = np.array([[0.0, 0.0, 0.0, 2.0, 4.0, 2.0, np.pi / 2]])
    # box rotated 90deg: w=2 along y, l=4 along x after rotation
    pts = np.array([
        [0.0, 0.0, 0.0],   # center -> in
        [1.5, 0.0, 0.0],   # |local y| = 1.5 < l/2=2 -> in
        [0.0, 1.5, 0.0],   # local x = 1.5 > w/2=1 -> out
        [0.0, 0.0, 1.5],   # above top -> out
    ])
    m = np.asarray(B.points_in_rbbox(pts, box))[:, 0]
    assert m.tolist() == [True, True, False, False]


def test_gaussian_radius_matches_reference():
    rng = np.random.default_rng(1)
    for _ in range(50):
        l, w = rng.uniform(0.5, 40, 2)
        ours = float(G.gaussian_radius(jnp.asarray(l), jnp.asarray(w), 0.1))
        ref = ref_gaussian_radius((l, w), 0.1)
        np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_render_heatmap_matches_loop_oracle():
    rng = np.random.default_rng(2)
    H = W = 64
    M = 20
    cx = rng.integers(2, W - 2, M)
    cy = rng.integers(2, H - 2, M)
    radii = rng.integers(2, 9, M)
    valid = rng.random(M) < 0.8
    cls_ids = rng.integers(0, 2, M)

    ours = np.asarray(G.render_heatmap(
        np.stack([cx, cy], -1).astype(np.int32), radii.astype(np.int32),
        valid, cls_ids.astype(np.int32), num_classes=2, fmap_w=W, fmap_h=H))

    ref = np.zeros((2, H, W), np.float32)
    for i in range(M):
        if not valid[i]:
            continue
        G.draw_gaussian_np(ref[cls_ids[i]], (cx[i], cy[i]), int(radii[i]))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_render_heatmap_edge_clipping():
    # objects at the map border must clip, not wrap
    ct = np.array([[0, 0], [63, 63]], np.int32)
    r = np.array([5, 5], np.int32)
    hm = np.asarray(G.render_heatmap(ct, r, np.array([True, True]),
                                     np.zeros(2, np.int32), 1, 64, 64))
    ref = np.zeros((1, 64, 64), np.float32)
    G.draw_gaussian_np(ref[0], (0, 0), 5)
    G.draw_gaussian_np(ref[0], (63, 63), 5)
    np.testing.assert_allclose(hm, ref, atol=1e-5)


def test_render_heatmap_large_radii():
    # radii up to 45 with edge-clipped large gaussians and dense overlap —
    # the separable max-plus renderer is exact at any radius mix
    rng = np.random.default_rng(5)
    H = W = 180
    M = 300
    cx = rng.integers(-10, W + 10, M)
    cy = rng.integers(-10, H + 10, M)
    radii = rng.integers(2, 46, M)
    valid = (rng.random(M) < 0.85) & (cx >= 0) & (cx < W) & (cy >= 0) & (cy < H)
    cls_ids = rng.integers(0, 3, M)
    ours = np.asarray(G.render_heatmap(
        np.stack([cx, cy], -1).astype(np.int32), radii.astype(np.int32),
        valid, cls_ids.astype(np.int32), num_classes=3, fmap_w=W, fmap_h=H))
    ref = np.zeros((3, H, W), np.float32)
    for i in range(M):
        if valid[i]:
            G.draw_gaussian_np(ref[cls_ids[i]], (cx[i], cy[i]), int(radii[i]))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_trajectory_classification():
    T = 7
    times = np.full(T - 1, 0.5)
    # static: stays put; linear: follows velocity; nonlinear: deviates
    centers = np.zeros((3, T, 2))
    vel = np.zeros((3, 2))
    wlh = np.full((3, 2), 2.0)

    centers[1] = np.linspace([0, 0], [9, 0], T)   # moves 9m
    vel[1] = [3.0, 0.0]                            # 3 m/s * 3s = 9m -> linear
    centers[2] = np.linspace([0, 0], [9, 0], T)
    vel[2] = [0.0, 3.0]                            # wrong direction -> nonlinear

    out = classify_trajectories(centers, vel, wlh, times)
    assert out.tolist() == [STATIC, LINEAR, NONLINEAR]
