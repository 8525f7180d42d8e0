"""Model stack smoke tests: shapes, loss finiteness, gradients, mode parity."""
import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from futuredet_tpu.config import (AssignerConfig, ExperimentConfig, HeadConfig,
                                  ModelConfig, NMSConfig, RPNConfig, TestConfig,
                                  VoxelConfig, get_config)
from futuredet_tpu.models.detector import build_detector
from futuredet_tpu.models.losses import center_head_loss


def tiny_cfg(timesteps=1, dense=False, forecast_feature=False,
             detector="pointpillars"):
    voxel = VoxelConfig(pc_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 3.0),
                        voxel_size=(0.5, 0.5, 6.0) if detector == "pointpillars"
                        else (0.5, 0.5, 0.5),
                        max_points_per_voxel=8, max_voxels_train=512,
                        max_voxels_eval=512, max_points=1024)
    rpn = RPNConfig(layer_nums=(1, 1), ds_strides=(1, 2), ds_filters=(32, 64),
                    us_strides=(1, 2), us_filters=(64, 64), in_channels=64)
    head = HeadConfig(tasks=(("car",),), in_channels=128, share_conv_channel=32,
                      timesteps=timesteps, dense=dense,
                      forecast_feature=forecast_feature)
    # RPN downsample factor = prod(ds_strides)/us_strides[-1] = 1 (ref rpn.py:118-122)
    osf = 1 if detector == "pointpillars" else 8
    return ExperimentConfig(
        name="tiny", timesteps=timesteps,
        model=ModelConfig(detector=detector, rpn=rpn, head=head,
                          reader="pillar_feature_net"
                          if detector == "pointpillars" else "mean_vfe",
                          middle_channels=(8, 16, 16, 32),
                          middle_vmax=(512, 256, 128, 64)),
        voxel=voxel,
        test=TestConfig(post_center_limit_range=(-10., -10., -10., 10., 10., 10.),
                        nms=NMSConfig(pre_max_size=128, post_max_size=32)),
        assigner=AssignerConfig(out_size_factor=osf, max_objs=16,
                                sampler_type="trajectory" if dense
                                else "standard"))


def rand_points(B=2, P=1024, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.concatenate([rng.uniform(-8, 8, (B, P, 2)),
                          rng.uniform(-2.5, 2.5, (B, P, 1)),
                          rng.uniform(0, 1, (B, P, 2))], -1).astype(np.float32)
    valid = rng.random((B, P)) < 0.9
    return jnp.asarray(pts), jnp.asarray(valid)


def rand_targets(cfg, B=2, seed=1):
    rng = np.random.default_rng(seed)
    T = cfg.timesteps
    W, H = cfg.feature_map_size
    M = cfg.assigner.max_objs
    C = 1
    n_real = 5
    mask = np.zeros((B, T, M), bool)
    mask[:, :, :n_real] = True
    ind = rng.integers(0, H * W, (B, T, M))
    hm = np.zeros((B, T, H, W, C), np.float32)
    anno = rng.normal(0, 1, (B, T, M, 14)).astype(np.float32)
    return {"hm": jnp.asarray(hm), "ind": jnp.asarray(ind),
            "mask": jnp.asarray(mask), "cat": jnp.zeros((B, T, M), jnp.int32),
            "anno_box": jnp.asarray(anno)}


@pytest.mark.parametrize("timesteps,dense,ff,n_heads", [
    (1, False, False, 1),     # forecast_n0
    (7, False, False, 1),     # forecast_n3 (vel widened x7)
    (7, True, True, 7),       # forecast_n3dtf
])
def test_pillars_forward_shapes(timesteps, dense, ff, n_heads):
    cfg = tiny_cfg(timesteps, dense, ff)
    model = build_detector(cfg)
    pts, valid = rand_points()
    params = model.init(jax.random.PRNGKey(0), pts, valid, train=False)
    preds = model.apply(params, pts, valid, train=False)
    assert len(preds) == n_heads
    W, H = cfg.feature_map_size
    for pd in preds:
        assert pd["hm"].shape == (2, H, W, 1)
        assert pd["reg"].shape == (2, H, W, 2)
        assert pd["dim"].shape == (2, H, W, 3)
        vel_ch = 2 if dense else 2 * timesteps
        assert pd["vel"].shape == (2, H, W, vel_ch)
    # hm bias init: sigmoid(-2.19) ~ 0.1
    p = jax.nn.sigmoid(np.asarray(preds[0]["hm"])).mean()
    assert 0.02 < p < 0.3


@pytest.mark.parametrize("timesteps,dense,ff", [
    (1, False, False), (7, True, True)])
def test_loss_finite_and_grads(timesteps, dense, ff):
    cfg = tiny_cfg(timesteps, dense, ff)
    model = build_detector(cfg)
    pts, valid = rand_points()
    variables = model.init(jax.random.PRNGKey(0), pts, valid, train=True)
    targets = rand_targets(cfg)

    def loss_fn(params):
        preds, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            pts, valid, train=True, mutable=["batch_stats"])
        return center_head_loss(cfg.model.head, preds, targets)["loss"]

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g ** 2) for g in leaves)))
    assert np.isfinite(gnorm) and gnorm > 0


def test_voxelnet_forward():
    cfg = tiny_cfg(1, False, False, detector="voxelnet")
    model = build_detector(cfg)
    pts, valid = rand_points()
    params = model.init(jax.random.PRNGKey(0), pts, valid, train=False)
    preds = model.apply(params, pts, valid, train=False)
    W, H = cfg.feature_map_size
    assert preds[0]["hm"].shape == (2, H, W, 1)


def test_voxelnet_bf16_packed_serving_close_to_fp32():
    """Serving mode (middle_sparse_dtype='bf16_packed': conv_x3_packed at the
    Cin=64 sparse stages) must track the fp32 reference-parity forward to
    bf16-truncation accuracy end-to-end — guards the disclosed numerics
    contract of the bench's voxelnet_serving number."""
    cfg = tiny_cfg(1, False, False, detector="voxelnet")
    # a Cin=64 stage so the packed win-regime (128 < 3*Cin <= 256) engages
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, middle_channels=(8, 16, 64, 64),
        middle_vmax=(512, 256, 128, 64)))
    pts, valid = rand_points(B=1)
    model = build_detector(cfg)
    params = model.init(jax.random.PRNGKey(0), pts, valid, train=False)
    ref = model.apply(params, pts, valid, train=False)

    scfg = cfg.replace(model=dataclasses.replace(
        cfg.model, middle_sparse_dtype="bf16_packed"))
    smodel = build_detector(scfg)
    got = smodel.apply(params, pts, valid, train=False)

    for r, g in zip(ref, got):
        for k in r:
            a, b = np.asarray(r[k]), np.asarray(g[k])
            scale = max(1.0, float(np.abs(a).max()))
            np.testing.assert_allclose(b, a, atol=0.05 * scale,
                                       err_msg=f"pred '{k}' diverged")


def test_focal_loss_perfect_prediction_near_zero():
    from futuredet_tpu.models.losses import fast_focal_loss
    B, H, W, C, M = 1, 8, 8, 1, 4
    hm = np.zeros((B, H, W, C), np.float32)
    hm[0, 4, 4, 0] = 1.0
    ind = np.zeros((B, M), np.int64); ind[0, 0] = 4 * W + 4
    mask = np.zeros((B, M), bool); mask[0, 0] = True
    cat = np.zeros((B, M), np.int64)
    pred = jnp.clip(jnp.asarray(hm), 1e-4, 1 - 1e-4)
    l = float(fast_focal_loss(pred, jnp.asarray(hm), jnp.asarray(ind),
                              jnp.asarray(mask), jnp.asarray(cat)))
    assert l < 1e-2

    # wrong prediction must be large
    bad = jnp.clip(jnp.asarray(1.0 - hm), 1e-4, 1 - 1e-4)
    l_bad = float(fast_focal_loss(bad, jnp.asarray(hm), jnp.asarray(ind),
                                  jnp.asarray(mask), jnp.asarray(cat)))
    assert l_bad > 100 * max(l, 1e-6)


def test_reg_loss_matches_manual():
    from futuredet_tpu.models.losses import reg_loss
    rng = np.random.default_rng(0)
    B, H, W, D, M = 2, 4, 4, 3, 5
    out = rng.normal(size=(B, H, W, D)).astype(np.float32)
    ind = rng.integers(0, H * W, (B, M))
    mask = rng.random((B, M)) < 0.6
    target = rng.normal(size=(B, M, D)).astype(np.float32)

    got = np.asarray(reg_loss(jnp.asarray(out), jnp.asarray(mask),
                              jnp.asarray(ind), jnp.asarray(target)))
    flat = out.reshape(B, H * W, D)
    pred = np.take_along_axis(flat, ind[..., None], axis=1)
    m = mask.astype(np.float32)[..., None]
    want = (np.abs(pred * m - target * m) / (m.sum() + 1e-4)).sum((0, 1))
    np.testing.assert_allclose(got, want, rtol=1e-5)
