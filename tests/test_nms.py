"""Rotated IoU + NMS vs numpy Sutherland–Hodgman oracle."""
import numpy as np
import jax.numpy as jnp

from futuredet_tpu.ops import nms as N
from futuredet_tpu.ops.rotated_iou import pairwise_iou_bev
import pytest


def rand_boxes5(n, seed=0, span=20.0):
    rng = np.random.default_rng(seed)
    return np.stack([
        rng.uniform(-span, span, n), rng.uniform(-span, span, n),
        rng.uniform(1.0, 6.0, n), rng.uniform(1.0, 3.0, n),
        rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)


def test_pairwise_iou_matches_polygon_oracle():
    a = rand_boxes5(24, 0, span=6.0)
    b = rand_boxes5(16, 1, span=6.0)
    ours = np.asarray(pairwise_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    for i in range(len(a)):
        for j in range(len(b)):
            ref = N.iou_bev_np(a[i].astype(np.float64), b[j].astype(np.float64))
            assert abs(ours[i, j] - ref) < 2e-3, (i, j, ours[i, j], ref)


@pytest.mark.slow
def test_iou_identity_and_disjoint():
    a = np.array([[0, 0, 4, 2, 0.3]], np.float32)
    b = np.array([[0, 0, 4, 2, 0.3], [100, 100, 4, 2, 0.0]], np.float32)
    iou = np.asarray(pairwise_iou_bev(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(iou[0, 1], 0.0, atol=1e-6)


def test_iou_axis_aligned_analytic():
    # two unit squares overlapping by half
    a = np.array([[0, 0, 2, 2, 0.0]], np.float32)
    b = np.array([[1, 0, 2, 2, 0.0]], np.float32)
    iou = float(pairwise_iou_bev(jnp.asarray(a), jnp.asarray(b))[0, 0])
    assert abs(iou - 2.0 / 6.0) < 1e-4


def test_rotate_nms_matches_oracle():
    rng = np.random.default_rng(3)
    n = 60
    b5 = rand_boxes5(n, 4, span=10.0)
    boxes7 = np.zeros((n, 7), np.float32)
    boxes7[:, 0] = b5[:, 0]
    boxes7[:, 1] = b5[:, 1]
    boxes7[:, 3] = b5[:, 3]   # w
    boxes7[:, 4] = b5[:, 2]   # l
    boxes7[:, 6] = b5[:, 4]
    scores = rng.uniform(0, 1, n).astype(np.float32)

    sel, count = N.rotate_nms(jnp.asarray(boxes7), jnp.asarray(scores),
                              jnp.ones(n, bool), iou_threshold=0.2,
                              pre_max=64, post_max=83)
    got = np.asarray(sel)[:int(count)]
    ref = N.rotate_nms_np(boxes7.astype(np.float64), scores, 0.2,
                          pre_max=64, post_max=83)
    np.testing.assert_array_equal(got, ref)


def test_rotate_nms_respects_valid_mask_and_padding():
    boxes = np.zeros((10, 7), np.float32)
    boxes[:, 3:6] = 1.0
    boxes[:, 0] = np.arange(10) * 100.0  # far apart -> no suppression
    scores = np.linspace(1, 0.1, 10).astype(np.float32)
    valid = np.ones(10, bool)
    valid[5:] = False
    sel, count = N.rotate_nms(jnp.asarray(boxes), jnp.asarray(scores),
                              jnp.asarray(valid), iou_threshold=0.2,
                              pre_max=10, post_max=83)
    assert int(count) == 5
    assert sorted(np.asarray(sel)[:5].tolist()) == [0, 1, 2, 3, 4]
    assert np.all(np.asarray(sel)[5:] == -1)


def test_circle_nms_basic():
    centers = np.array([[0, 0], [0.5, 0], [10, 10]], np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    sel, count = N.circle_nms(jnp.asarray(centers), jnp.asarray(scores),
                              jnp.ones(3, bool), min_radius=1.0, post_max=83)
    assert int(count) == 2
    assert np.asarray(sel)[:2].tolist() == [0, 2]


@pytest.mark.slow
def test_rotate_nms_long_suppression_chain():
    """Adversarial case for the Jacobi fixpoint: a row of boxes where each
    overlaps only its neighbors, scores strictly decreasing — greedy keeps
    every other box, and the alternation chain is as deep as the row. The
    iteration must still reproduce sequential greedy exactly."""
    import numpy as np
    import jax.numpy as jnp
    from futuredet_tpu.ops.nms import rotate_nms, rotate_nms_np

    n = 64
    boxes = np.zeros((n, 7), np.float32)
    boxes[:, 0] = np.arange(n) * 1.2      # centers 1.2 m apart
    boxes[:, 3] = 2.0                     # w
    boxes[:, 4] = 2.0                     # l
    boxes[:, 5] = 1.5
    scores = np.linspace(1.0, 0.1, n).astype(np.float32)
    valid = np.ones(n, bool)

    sel, cnt = rotate_nms(jnp.asarray(boxes), jnp.asarray(scores),
                          jnp.asarray(valid), iou_threshold=0.1,
                          pre_max=n, post_max=n)
    got = np.asarray(sel)
    got = got[got >= 0]
    ref = rotate_nms_np(boxes, scores, 0.1, pre_max=n, post_max=n)
    np.testing.assert_array_equal(got, ref)
    assert int(cnt) == len(ref) == 32   # every other box survives
