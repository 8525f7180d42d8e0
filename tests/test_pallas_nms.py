"""Pallas fused NMS (interpret mode on CPU) vs the XLA and numpy oracles."""
import numpy as np
import jax.numpy as jnp

from futuredet_tpu.ops import nms as N
from futuredet_tpu.ops.pallas_nms import rotate_nms_pallas
import pytest


def rand_boxes7(n, seed=0, span=12.0):
    rng = np.random.default_rng(seed)
    b = np.zeros((n, 7), np.float32)
    b[:, 0] = rng.uniform(-span, span, n)
    b[:, 1] = rng.uniform(-span, span, n)
    b[:, 3] = rng.uniform(1.0, 3.0, n)   # w
    b[:, 4] = rng.uniform(1.0, 6.0, n)   # l
    b[:, 5] = rng.uniform(1.0, 2.0, n)
    b[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return b


def test_pallas_nms_matches_oracle():
    n = 60
    boxes = rand_boxes7(n, 1)
    scores = np.random.default_rng(2).uniform(0, 1, n).astype(np.float32)
    sel, count = rotate_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.ones(n, bool),
        iou_threshold=0.2, pre_max=64, post_max=83, interpret=True)
    got = np.asarray(sel)[:int(count)]
    ref = N.rotate_nms_np(boxes.astype(np.float64), scores, 0.2,
                          pre_max=64, post_max=83)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.slow
def test_pallas_nms_matches_xla_version():
    n = 150
    boxes = rand_boxes7(n, 5)
    scores = np.random.default_rng(6).uniform(0, 1, n).astype(np.float32)
    valid = np.random.default_rng(7).random(n) < 0.8
    sel_p, cnt_p = rotate_nms_pallas(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        iou_threshold=0.3, pre_max=128, post_max=50, interpret=True)
    sel_x, cnt_x = N.rotate_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid),
        iou_threshold=0.3, pre_max=128, post_max=50)
    assert int(cnt_p) == int(cnt_x)
    np.testing.assert_array_equal(np.asarray(sel_p), np.asarray(sel_x))
