"""Data-parallel train step on the 8-device CPU mesh: loss decreases,
replicas stay in sync, schedule follows the reference one-cycle curve."""
import numpy as np
import jax
import jax.numpy as jnp

from futuredet_tpu.parallel.mesh import make_mesh
from futuredet_tpu.train.schedule import one_cycle_lr, one_cycle_momentum
from futuredet_tpu.train.step import init_state, make_train_step
from tests.test_models import rand_points, rand_targets, tiny_cfg


def _batch(cfg, B):
    pts, valid = rand_points(B=B, P=cfg.voxel.max_points)
    return {"points": pts, "points_valid": valid,
            "targets": rand_targets(cfg, B=B)}


def test_one_cycle_matches_reference_formula():
    # exact port check against learning_schedules_fastai.py:70-97
    import math

    def ref_cos(start, end, pct):
        return end + (start - end) / 2 * (math.cos(math.pi * pct) + 1)

    total, lr_max, div, pct = 1000, 1e-3, 10.0, 0.4
    a1 = int(total * pct)
    for step in [0, 100, 399, 400, 401, 700, 999]:
        got = float(one_cycle_lr(jnp.asarray(step), total_steps=total,
                                 lr_max=lr_max, div_factor=div, pct_start=pct))
        if step < a1:
            want = ref_cos(lr_max / div, lr_max, step / a1)
        else:
            want = ref_cos(lr_max, (lr_max / div) / 1e4,
                           (step - a1) / (total - a1))
        assert abs(got - want) < 1e-9, step

    m0 = float(one_cycle_momentum(jnp.asarray(0), total_steps=total,
                                  moms=(0.95, 0.85), pct_start=pct))
    m1 = float(one_cycle_momentum(jnp.asarray(a1), total_steps=total,
                                  moms=(0.95, 0.85), pct_start=pct))
    assert abs(m0 - 0.95) < 1e-6 and abs(m1 - 0.85) < 1e-6


def test_train_step_8dev_loss_decreases():
    cfg = tiny_cfg(1, False, False)
    mesh = make_mesh(8)
    B = 8
    batch = _batch(cfg, B)
    state = init_state(cfg, jax.random.PRNGKey(0),
                       jax.tree.map(lambda x: x[:1], batch), total_steps=50)
    step_fn = make_train_step(cfg, mesh, total_steps=50)

    losses = []
    for _ in range(8):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8


def test_train_step_dense_forecast_mode():
    cfg = tiny_cfg(7, True, True)
    mesh = make_mesh(4)
    batch = _batch(cfg, 4)
    state = init_state(cfg, jax.random.PRNGKey(0),
                       jax.tree.map(lambda x: x[:1], batch), total_steps=20)
    step_fn = make_train_step(cfg, mesh, total_steps=20)
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert metrics["hm_loss"].shape == (7,)


def test_train_step_voxelnet_sparse_2dev():
    cfg = tiny_cfg(1, False, False, detector="voxelnet")
    mesh = make_mesh(2)
    batch = _batch(cfg, 2)
    state = init_state(cfg, jax.random.PRNGKey(0),
                       jax.tree.map(lambda x: x[:1], batch), total_steps=10)
    step_fn = make_train_step(cfg, mesh, total_steps=10)
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_init_state_and_cli_batch_with_bev_map():
    """n3dtfm-style configs (bev_map branch): init_state must thread the
    bev_map through model.init, and make_batch must emit the canvas."""
    import dataclasses

    from futuredet_tpu.data.synthetic import make_batch

    cfg = tiny_cfg(7, True, True)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, head=dataclasses.replace(cfg.model.head, bev_map=True)))
    batch = make_batch(cfg, 2, seed=0, n_objects=3, n_clutter=200,
                       max_objs=16)
    batch.pop("gt")
    assert "bev_map" in batch
    # the synthetic map is a real drivable-area raster, not zeros
    assert float(np.asarray(batch["bev_map"]).sum()) > 0
    state = init_state(cfg, jax.random.PRNGKey(0),
                       jax.tree.map(lambda x: x[:1], batch), total_steps=5)
    step_fn = make_train_step(cfg, make_mesh(1), total_steps=5)
    state, metrics = step_fn(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert any("bev_conv" in k for k in state.params["head"])


def test_two_stage_optimizer_actually_freezes():
    """TWO_STAGE schedule: after optimizer steps, ONLY vel/rot branch
    params may change (ref apis/train.py:353-356). Regression for the
    optax.masked misuse that let raw gradients through as updates on the
    'frozen' backbone."""
    import dataclasses

    import jax.tree_util as jtu
    from futuredet_tpu.data.synthetic import make_batch

    cfg = tiny_cfg(1, False, False)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, head=dataclasses.replace(cfg.model.head, two_stage=True)))
    batch = make_batch(cfg, 1, seed=0, n_objects=4, n_clutter=300,
                       max_objs=16)
    batch.pop("gt")
    state = init_state(cfg, jax.random.PRNGKey(0), batch, total_steps=4)
    p0 = jax.device_get(state.params)
    step = make_train_step(cfg, make_mesh(1), total_steps=4)
    for _ in range(4):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    p1 = jax.device_get(state.params)
    changed = [jtu.keystr(p) for (p, a), (_, b) in zip(
        jtu.tree_flatten_with_path(p0)[0], jtu.tree_flatten_with_path(p1)[0])
        if np.abs(a - b).max() > 0]
    assert changed, "vel/rot must train"
    bad = [n for n in changed if not ("vel" in n or "rot" in n)]
    assert not bad, bad[:5]


def test_in_step_device_targets_match_host_targets():
    """targets_raw (default pipeline layout, rasterized inside the jitted
    step) and host-prebuilt "targets" produce the SAME loss and updates."""
    from futuredet_tpu.data.synthetic import make_batch

    cfg = tiny_cfg(3, False, False)
    bh = make_batch(cfg, 2, seed=3, n_objects=4, n_clutter=300, max_objs=16)
    bd = make_batch(cfg, 2, seed=3, n_objects=4, n_clutter=300, max_objs=16,
                    device_targets=True)
    bh.pop("gt")
    bd.pop("gt")
    state0 = init_state(cfg, jax.random.PRNGKey(0),
                        jax.tree.map(lambda x: x[:1], bh), total_steps=5)
    step_fn = make_train_step(cfg, make_mesh(1), total_steps=5)
    sh, mh = step_fn(state0, bh)
    # state is donated — rebuild identically for the second run
    state0 = init_state(cfg, jax.random.PRNGKey(0),
                        jax.tree.map(lambda x: x[:1], bh), total_steps=5)
    sd, md = step_fn(state0, bd)
    np.testing.assert_allclose(float(mh["loss"]), float(md["loss"]),
                               rtol=1e-6)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-6), sh.params, sd.params)
