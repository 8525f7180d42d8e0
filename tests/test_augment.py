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


# ---------------------------------------------------------------------------
# BEV-map warp: the map must track augmented world geometry (ref get_mask,
# preprocess.py:75-90,212)
# ---------------------------------------------------------------------------

_PC = (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)


def _cell(x, y, H=180, W=180):
    """world (x, y) -> continuous (row, col) on the canvas-oriented map."""
    sx = (_PC[3] - _PC[0]) / W
    return (y - _PC[1]) / sx - 0.5, (x - _PC[0]) / sx - 0.5


def _blob_map(H, W, r, c, rad=2):
    m = np.zeros((H, W), np.float32)
    m[max(r - rad, 0):r + rad + 1, max(c - rad, 0):c + rad + 1] = 1.0
    return m


def _centroid(m):
    rr, cc = np.mgrid[:m.shape[0], :m.shape[1]]
    return (rr * m).sum() / m.sum(), (cc * m).sum() / m.sum()


def _fwd_xy(p, aug):
    """forward aug transform of a world point (flip -> rot -> scale -> trans,
    the apply_train_augmentations order)."""
    x, y = p
    if aug["flips"][0]:
        y = -y
    if aug["flips"][1]:
        x = -x
    c, s = np.cos(aug["rot"]), np.sin(aug["rot"])
    x, y = x * c - y * s, x * s + y * c
    x, y = x * aug["scale"], y * aug["scale"]
    return x + aug["trans"][0], y + aug["trans"][1]


def test_warp_bev_map_identity_is_noop():
    base = _blob_map(180, 180, 90, 40)
    aug = {"flips": [False, False], "rot": 0.0, "scale": 1.0,
           "trans": np.zeros(3)}
    np.testing.assert_allclose(A.warp_bev_map(base, aug, _PC), base,
                               atol=1e-6)


def test_warp_bev_map_blob_tracks_each_transform():
    p = (20.0, -10.0)
    r0, c0 = _cell(*p)
    base = _blob_map(180, 180, int(round(r0)), int(round(c0)))
    zero = np.zeros(3)
    augs = [
        {"flips": [True, False], "rot": 0.0, "scale": 1.0, "trans": zero},
        {"flips": [False, True], "rot": 0.0, "scale": 1.0, "trans": zero},
        {"flips": [False, False], "rot": 0.6, "scale": 1.0, "trans": zero},
        {"flips": [False, False], "rot": 0.0, "scale": 1.08, "trans": zero},
        {"flips": [False, False], "rot": 0.0, "scale": 1.0,
         "trans": np.array([3.0, -2.0, 0.0])},
        {"flips": [True, True], "rot": -0.45, "scale": 0.93,
         "trans": np.array([-1.5, 2.5, 0.0])},
    ]
    for aug in augs:
        out = A.warp_bev_map(base, aug, _PC)
        assert out.sum() > 0, aug
        rr, cc = _centroid(out)
        re, ce = _cell(*_fwd_xy(p, aug))
        assert abs(rr - re) < 1.0 and abs(cc - ce) < 1.0, aug


def test_warp_bev_map_consistent_with_apply_train_augmentations():
    # a map blob under an object must still sit under that object after the
    # points/boxes augmentation + the map warp (the n3dtfm train contract)
    for seed in range(4):
        rng = np.random.default_rng(100 + seed)
        gt = np.zeros((1, 1, 12), np.float32)
        gt[0, 0, :2] = rng.uniform(-25, 25, 2)
        gt[0, 0, 3:6] = [2, 4.5, 1.6]
        pts = np.zeros((10, 5), np.float32)
        r0, c0 = _cell(*gt[0, 0, :2])
        base = _blob_map(180, 180, int(round(r0)), int(round(c0)))
        out_gt, _, aug = A.apply_train_augmentations(
            gt, pts, rng, rot_noise=(-0.7, 0.7), scale_noise=(0.9, 1.1),
            translate_std=1.0)
        out = A.warp_bev_map(base, aug, _PC)
        rr, cc = _centroid(out)
        re, ce = _cell(*out_gt[0, 0, :2])
        assert abs(rr - re) < 1.2 and abs(cc - ce) < 1.2, (seed, aug)


def test_warp_bev_map_channels_and_zero_border():
    base = np.stack([_blob_map(180, 180, 5, 5),
                     _blob_map(180, 180, 174, 174)], -1)
    aug = {"flips": [False, False], "rot": 0.0, "scale": 1.0,
           "trans": np.array([-20.0, -20.0, 0.0])}
    out = A.warp_bev_map(base, aug, _PC)
    assert out.shape == base.shape
    # channel 0's corner blob slid out of range -> zero-filled
    assert out[..., 0].sum() < 1e-6
    assert out[..., 1].sum() > 0


# ---------------------------------------------------------------------------
# per-object noise (noise_per_object_v3_) vs a verbatim loop oracle
# ---------------------------------------------------------------------------

def _oracle_corners2d(boxes5):
    """verbatim loop of ref box2d_to_corner_jit (box_np_ops.py:289-307)."""
    corners_norm = np.zeros((4, 2))
    corners_norm[1, 1] = 1.0
    corners_norm[2] = 1.0
    corners_norm[3, 0] = 1.0
    corners_norm -= 0.5
    out = np.zeros((len(boxes5), 4, 2))
    for i in range(len(boxes5)):
        c, s = np.cos(boxes5[i, 4]), np.sin(boxes5[i, 4])
        rot_t = np.array([[c, -s], [s, c]])
        out[i] = boxes5[i, 2:4] * corners_norm @ rot_t + boxes5[i, :2]
    return out


def _oracle_accept(boxes5, valid, loc_noises, rot_noises, grot_noises=None):
    """verbatim loop of ref noise_per_box / noise_per_box_v2_
    (preprocess.py:219-247, 374-428), numba-free; mutates loc/rot like the
    reference in the grot mode."""
    N, M = rot_noises.shape
    box_corners = _oracle_corners2d(boxes5)
    success = -np.ones((N,), np.int64)
    for i in range(N):
        if not valid[i]:
            continue
        for j in range(M):
            if grot_noises is None:
                cur = box_corners[i].copy()
                cur -= boxes5[i, :2]
                c, s = np.cos(rot_noises[i, j]), np.sin(rot_noises[i, j])
                cur = cur @ np.array([[c, -s], [s, c]])
                cur += boxes5[i, :2] + loc_noises[i, j, :2]
            else:
                radius = np.sqrt(boxes5[i, 0] ** 2 + boxes5[i, 1] ** 2)
                grot = np.arctan2(boxes5[i, 0], boxes5[i, 1])
                dst_grot = grot + grot_noises[i, j]
                dst_pos = np.array([radius * np.sin(dst_grot),
                                    radius * np.cos(dst_grot)])
                rot2 = boxes5[i, 4] + (dst_grot - grot)
                c, s = np.cos(rot2), np.sin(rot2)
                corners_norm = np.array(
                    [[-.5, -.5], [-.5, .5], [.5, .5], [.5, -.5]])
                cur = boxes5[i, 2:4] * corners_norm @ np.array(
                    [[c, -s], [s, c]]) + dst_pos
                cur -= dst_pos
                c2, s2 = np.cos(rot_noises[i, j]), np.sin(rot_noises[i, j])
                cur = cur @ np.array([[c2, -s2], [s2, c2]])
                cur += dst_pos + loc_noises[i, j, :2]
            coll = B.box_collision_test(cur.reshape(1, 4, 2), box_corners)
            coll[0, i] = False
            if not coll.any():
                success[i] = j
                box_corners[i] = cur
                if grot_noises is not None:
                    loc_noises[i, j, :2] += dst_pos - boxes5[i, :2]
                    rot_noises[i, j] += dst_grot - grot
                break
    return success, box_corners


def _noise_scene(seed, n=14):
    rng = np.random.default_rng(seed)
    boxes = np.zeros((n, 7))
    boxes[:, :2] = rng.uniform(-20, 20, (n, 2))
    boxes[:, 2] = rng.uniform(-1, 1, n)
    boxes[:, 3:5] = rng.uniform(1.5, 4.0, (n, 2))
    boxes[:, 5] = rng.uniform(1.0, 2.0, n)
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes, rng


def test_noise_accept_matches_loop_oracle():
    for seed in range(6):
        boxes, rng = _noise_scene(seed)
        n = len(boxes)
        valid = rng.random(n) > 0.2
        loc = rng.normal(scale=1.0, size=(n, 8, 3))
        rot = rng.uniform(-0.8, 0.8, (n, 8))
        got = A._accept_noise(boxes[:, [0, 1, 3, 4, 6]], valid,
                              loc.copy(), rot.copy())
        want, _ = _oracle_accept(boxes[:, [0, 1, 3, 4, 6]], valid,
                                 loc.copy(), rot.copy())
        np.testing.assert_array_equal(got, want)


def test_noise_accept_grot_matches_loop_oracle():
    for seed in range(6):
        boxes, rng = _noise_scene(seed + 50)
        n = len(boxes)
        valid = np.ones(n, bool)
        loc = np.zeros((n, 8, 3))
        rot = np.zeros((n, 8))
        grot = rng.uniform(-0.6, 0.6, (n, 8))
        la, ra = loc.copy(), rot.copy()
        lb, rb = loc.copy(), rot.copy()
        got = A._accept_noise(boxes[:, [0, 1, 3, 4, 6]], valid, la, ra, grot)
        want, _ = _oracle_accept(boxes[:, [0, 1, 3, 4, 6]], valid, lb, rb,
                                 grot)
        np.testing.assert_array_equal(got, want)
        # the grot mode folds the radial displacement into the accepted
        # noise entries (ref :424-426) — mutation must match too
        np.testing.assert_allclose(la, lb, atol=1e-12)
        np.testing.assert_allclose(ra, rb, atol=1e-12)


def test_noise_per_object_moves_points_with_first_box():
    boxes, _ = _noise_scene(3, n=6)
    boxes[:, :2] = np.array([[0, 0], [0.5, 0], [30, 30], [-25, 10],
                             [15, -20], [-12, -18]])  # boxes 0/1 overlap
    pts = np.concatenate(
        [boxes[:, :3], np.zeros((len(boxes), 2))], -1)  # one point per center
    out, opts, success = A.noise_per_object(
        boxes, pts, rotation_perturb=(-0.5, 0.5), center_noise_std=0.7,
        num_try=32, rng=np.random.default_rng(11))
    # center points follow their box (point at overlapping centers follows
    # the FIRST containing box, ref points_transform_:443-448 break)
    moved = success >= 0
    # point 0 sits in box 0 (first containing) -> moves with box 0
    np.testing.assert_allclose(opts[0, :3], out[0, :3], atol=1e-9)
    # every non-overlapping center follows its own box
    for k in range(2, len(boxes)):
        np.testing.assert_allclose(opts[k, :3], out[k, :3], atol=1e-9)
    assert moved.any()  # sanity: something moved


def test_noise_per_object_zero_noise_is_identity():
    boxes, _ = _noise_scene(4, n=5)
    pts = np.concatenate([boxes[:, :3], np.zeros((5, 2))], -1)
    out, opts, success = A.noise_per_object(
        boxes, pts, rotation_perturb=0.0, center_noise_std=0.0,
        num_try=4, rng=np.random.default_rng(0))
    np.testing.assert_allclose(out, boxes, atol=1e-9)
    np.testing.assert_allclose(opts, pts, atol=1e-9)
