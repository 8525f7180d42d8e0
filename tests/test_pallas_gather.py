"""Pallas windowed-gather submanifold conv vs the plain gather path.

Runs in interpret mode on CPU; the kernel math (one-hot row select on the
MXU) must match the loop-gather path exactly in fp32.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from futuredet_tpu.ops import sparse_conv as SC
from futuredet_tpu.ops.pallas_gather import (subm_conv_auto,
                                             subm_conv_window,
                                             window_overflow)


def _scene(seed, dims=(8, 24, 24), n=700, V=1024, C=8):
    rng = np.random.default_rng(seed)
    lin = rng.choice(dims[0] * dims[1] * dims[2], n, replace=False)
    coords = np.zeros((V, 3), np.int32)
    coords[:n, 0] = lin // (dims[1] * dims[2])
    coords[:n, 1] = (lin // dims[2]) % dims[1]
    coords[:n, 2] = lin % dims[2]
    valid = np.zeros(V, bool)
    valid[:n] = True
    feats = np.zeros((V, C), np.float32)
    feats[:n] = rng.normal(size=(n, C))
    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    order = np.argsort(np.where(
        valid, (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2]
        + coords[:, 2], np.prod(dims)))
    return grid, jnp.asarray(feats[order]), dims


@pytest.mark.parametrize("W,B", [(256, 128), (128, 64)])
def test_window_matches_loop_submanifold(W, B):
    grid, feats, dims = _scene(0)
    rng = np.random.default_rng(1)
    w = jnp.asarray((rng.normal(size=(27, 8, 6)) * 0.1).astype(np.float32))
    table = SC.neighbor_table(grid, dims)
    ref = SC.subm_conv_apply(feats, table, w, algo="loop")
    out = subm_conv_window(feats, table, w, W=W, B=B,
                           compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_window_matches_loop_strided():
    grid, feats, dims = _scene(2)
    rng = np.random.default_rng(3)
    w = jnp.asarray((rng.normal(size=(27, 8, 12)) * 0.1).astype(np.float32))
    out_dims = tuple((d + 1) // 2 for d in dims)
    ngrid = SC.downsample_coords(grid, out_dims, 512)
    dtable = SC.strided_gather_table(grid, ngrid, dims)
    ref = SC.subm_conv_apply(feats, dtable, w, algo="loop")
    out = subm_conv_window(feats, dtable, w, W=256, B=128,
                           compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_overflow_predicate_and_fallback():
    grid, feats, dims = _scene(4)
    rng = np.random.default_rng(5)
    w = jnp.asarray((rng.normal(size=(27, 8, 6)) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(6,)).astype(np.float32))
    table = SC.neighbor_table(grid, dims)
    ref = SC.subm_conv_apply(feats, table, w, b, algo="loop")

    # tiny window forces overflow somewhere -> predicate trips and the
    # auto wrapper must still be exact via the fallback branch
    assert bool(window_overflow(table, feats.shape[0], W=8, B=64))
    out = subm_conv_auto(feats, table, w, b, W=8, B=64,
                         compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)

    # ample window: no overflow, kernel branch, still exact
    assert not bool(window_overflow(table, feats.shape[0], W=512, B=128))
    out2 = subm_conv_auto(feats, table, w, b, W=512, B=128,
                          compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_window_bf16_close():
    grid, feats, dims = _scene(6)
    rng = np.random.default_rng(7)
    w = jnp.asarray((rng.normal(size=(27, 8, 6)) * 0.1).astype(np.float32))
    table = SC.neighbor_table(grid, dims)
    ref = SC.subm_conv_apply(feats, table, w, algo="loop")
    out = subm_conv_window(feats, table, w, W=256, B=128,
                           compute_dtype=jnp.bfloat16, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)


def test_detector_window_algo_exact_b1():
    import dataclasses
    from tests.test_models import rand_points, tiny_cfg
    from futuredet_tpu.models.detector import build_detector

    cfg = tiny_cfg(1, False, False, detector="voxelnet")
    model = build_detector(cfg)
    pts, pv = rand_points(B=1, P=1024)
    variables = model.init(jax.random.PRNGKey(0), pts, pv, train=False)
    ref = model.apply(variables, pts, pv, train=False)

    cfgw = cfg.replace(model=dataclasses.replace(
        cfg.model, middle_gather_algo="window"))
    out = build_detector(cfgw).apply(variables, pts, pv, train=False)
    for a, b in zip(jax.tree_util.tree_leaves(out),
                    jax.tree_util.tree_leaves(ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)


def test_window_algo_trains_via_downgrade():
    """Training with gather_algo='window' must auto-downgrade to the
    differentiable loop path (pallas_call has no AD rule)."""
    import dataclasses
    from tests.test_models import rand_points, rand_targets, tiny_cfg
    from futuredet_tpu.models.detector import build_detector
    from futuredet_tpu.models.losses import center_head_loss

    cfg = tiny_cfg(1, False, False, detector="voxelnet")
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, middle_gather_algo="window"))
    model = build_detector(cfg)
    pts, pv = rand_points(B=1, P=1024)
    targets = rand_targets(cfg, B=1)
    variables = model.init(jax.random.PRNGKey(0), pts, pv, train=True)

    def lf(p):
        preds, _ = model.apply({"params": p,
                                "batch_stats": variables["batch_stats"]},
                               pts, pv, train=True, mutable=["batch_stats"])
        return center_head_loss(cfg.model.head, preds, targets)["loss"]

    loss, grads = jax.value_and_grad(lf)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(jnp.abs(g)))
                for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0


def test_window_default_geometry():
    """Production parameters (W=1024, B=512) on a mid-size site set."""
    grid, feats, dims = _scene(8, dims=(12, 40, 40), n=3000, V=4096, C=8)
    rng = np.random.default_rng(9)
    w = jnp.asarray((rng.normal(size=(27, 8, 8)) * 0.1).astype(np.float32))
    table = SC.neighbor_table(grid, dims)
    ref = SC.subm_conv_apply(feats, table, w, algo="loop")
    out = subm_conv_window(feats, table, w,  # defaults W=1024, B=512
                           compute_dtype=jnp.float32, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    assert not bool(window_overflow(table, feats.shape[0]))
