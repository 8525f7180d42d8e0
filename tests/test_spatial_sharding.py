"""Spatial (BEV-row) sharding over a (data, space) mesh — GSPMD path.

The spatially-sharded train step must produce the same math as the
data-parallel shard_map step: XLA inserts halo exchanges for the convs and
global reductions for grads/BN, so results agree up to fp reassociation.
"""
import numpy as np
import jax
import jax.numpy as jnp

from futuredet_tpu.parallel.mesh import (canvas_sharding, make_mesh,
                                         make_mesh_2d)
from futuredet_tpu.train.step import (init_state, make_eval_forward,
                                      make_train_step)
from tests.test_models import rand_points, rand_targets, tiny_cfg


def _batch(cfg, B):
    pts, valid = rand_points(B=B, P=cfg.voxel.max_points)
    return {"points": pts, "points_valid": valid,
            "targets": rand_targets(cfg, B=B)}


def _loss_trace(step_fn, state, batch, n=3):
    out = []
    for _ in range(n):
        state, metrics = step_fn(state, batch)
        out.append(float(metrics["loss"]))
    return state, out


def test_spatial_step_matches_data_parallel():
    cfg = tiny_cfg(1, False, False)
    batch = _batch(cfg, 2)
    seed_batch = jax.tree.map(lambda x: x[:1], batch)

    s0 = init_state(cfg, jax.random.PRNGKey(0), seed_batch, total_steps=20)
    ref_fn = make_train_step(cfg, make_mesh(2), total_steps=20)
    s_ref, ref_losses = _loss_trace(ref_fn, s0, batch)

    s1 = init_state(cfg, jax.random.PRNGKey(0), seed_batch, total_steps=20)
    sp_fn = make_train_step(cfg, make_mesh_2d(2, 4), total_steps=20)
    s_sp, sp_losses = _loss_trace(sp_fn, s1, batch)

    # different reduction orders (GSPMD all-reduce vs shard_map pmean)
    # legitimately diverge at fp32 as steps accumulate
    np.testing.assert_allclose(sp_losses, ref_losses, rtol=1e-3, atol=1e-4)
    # Adam normalizes gradients, so for near-zero params a tiny fp
    # difference flips an update's direction: compare absolutely
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=2e-3),
        s_sp.params, s_ref.params)


def test_spatial_step_inserts_halo_exchange():
    cfg = tiny_cfg(1, False, False)
    batch = _batch(cfg, 2)
    mesh = make_mesh_2d(2, 4)
    state = init_state(cfg, jax.random.PRNGKey(0),
                       jax.tree.map(lambda x: x[:1], batch), total_steps=20)
    fn = make_train_step(cfg, mesh, total_steps=20)
    txt = fn.lower(state, batch).compile().as_text()
    assert "collective-permute" in txt  # conv halo exchanges over `space`


def test_spatial_eval_forward_matches_single():
    cfg = tiny_cfg(1, False, False)
    batch = _batch(cfg, 2)
    state = init_state(cfg, jax.random.PRNGKey(0),
                       jax.tree.map(lambda x: x[:1], batch), total_steps=20)

    ref_fwd = make_eval_forward(cfg)
    sp_fwd = make_eval_forward(cfg, make_mesh_2d(2, 4))
    ref = ref_fwd(state.params, state.batch_stats, batch)
    out = sp_fwd(state.params, state.batch_stats, batch)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        out, ref)


def test_spatial_voxelnet_with_dense_tail():
    cfg = tiny_cfg(1, False, False, detector="voxelnet")
    import dataclasses
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, middle_dense_from_stage=2))
    batch = _batch(cfg, 2)
    state = init_state(cfg, jax.random.PRNGKey(0),
                       jax.tree.map(lambda x: x[:1], batch), total_steps=10)
    fn = make_train_step(cfg, make_mesh_2d(2, 2), total_steps=10)
    state, metrics = fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_data_axis_size():
    from futuredet_tpu.parallel.mesh import data_axis_size

    assert data_axis_size(4, 2, n_devices=8) == 4    # gcd(4, 8//2)
    assert data_axis_size(6, 2, n_devices=8) == 2    # gcd(6, 4)
    assert data_axis_size(1, 4, n_devices=8) == 1
    assert data_axis_size(8, 1, n_devices=8) == 8
    import pytest
    with pytest.raises(ValueError):
        data_axis_size(2, 16, n_devices=8)
