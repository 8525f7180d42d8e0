"""Decode path: peaks planted in heatmaps must come back as boxes at the right
world coordinates, per timestep, after NMS."""
import numpy as np
import jax.numpy as jnp

from futuredet_tpu.eval.decode import decode_and_nms, expand_pseudo_tasks
from tests.test_models import tiny_cfg
import pytest


def _blank_preds(cfg, B=1):
    W, H = cfg.feature_map_size
    T = cfg.timesteps
    n_heads = len(cfg.model.head.num_classes)
    preds = []
    for _ in range(n_heads):
        vel_ch = 2 if cfg.model.head.dense else 2 * T
        preds.append({
            "hm": jnp.full((B, H, W, 1), -10.0),
            "reg": jnp.zeros((B, H, W, 2)),
            "height": jnp.zeros((B, H, W, 1)),
            "dim": jnp.zeros((B, H, W, 3)),
            "rot": jnp.zeros((B, H, W, 2)),
            "vel": jnp.zeros((B, H, W, vel_ch)),
        })
    return preds


def _world(cfg, cx, cy):
    osf = cfg.assigner.out_size_factor
    vx, vy = cfg.voxel.voxel_size[:2]
    return (cx * osf * vx + cfg.voxel.pc_range[0],
            cy * osf * vy + cfg.voxel.pc_range[1])


def test_decode_standard_n0_replicates_7_timesteps():
    cfg = tiny_cfg(1, False, False)
    preds = _blank_preds(cfg)
    preds[0]["hm"] = preds[0]["hm"].at[0, 10, 20, 0].set(10.0)   # y=10, x=20
    preds[0]["vel"] = preds[0]["vel"].at[0, 10, 20, :].set(jnp.array([3.0, -1.0]))
    det = decode_and_nms(cfg, preds)
    v = np.asarray(det.valid)[0]
    assert v.sum() == 7  # replicated into 7 pseudo-timesteps (target_timesteps)
    b = np.asarray(det.boxes)[0][v]
    l = np.asarray(det.labels)[0][v]
    assert sorted(l.tolist()) == list(range(7))
    wx, wy = _world(cfg, 20, 10)
    np.testing.assert_allclose(b[:, 0], wx, atol=1e-4)
    np.testing.assert_allclose(b[:, 1], wy, atol=1e-4)
    np.testing.assert_allclose(b[:, 6], 3.0, atol=1e-4)
    np.testing.assert_allclose(b[:, 7], -1.0, atol=1e-4)


def test_decode_n3_slices_vel_per_timestep():
    cfg = tiny_cfg(7, False, False)
    preds = _blank_preds(cfg)
    preds[0]["hm"] = preds[0]["hm"].at[0, 5, 5, 0].set(10.0)
    for i in range(7):
        preds[0]["vel"] = preds[0]["vel"].at[0, 5, 5, 2 * i].set(float(i))
    det = decode_and_nms(cfg, preds)
    v = np.asarray(det.valid)[0]
    b = np.asarray(det.boxes)[0][v]
    l = np.asarray(det.labels)[0][v]
    for i in range(7):
        np.testing.assert_allclose(b[l == i][:, 6], float(i), atol=1e-5)


def test_decode_dense_one_head_per_timestep():
    cfg = tiny_cfg(7, True, True)
    preds = _blank_preds(cfg)
    # plant each timestep's object at a shifted cell (object moving +x)
    for t in range(7):
        preds[t]["hm"] = preds[t]["hm"].at[0, 8, 8 + t, 0].set(10.0)
    det = decode_and_nms(cfg, preds)
    v = np.asarray(det.valid)[0]
    assert v.sum() == 7
    b = np.asarray(det.boxes)[0][v]
    l = np.asarray(det.labels)[0][v]
    xs = [float(b[l == t][0, 0]) for t in range(7)]
    assert all(xs[i + 1] > xs[i] for i in range(6))  # moves +x over timesteps


def test_decode_nms_suppresses_duplicates():
    cfg = tiny_cfg(1, False, False)
    preds = _blank_preds(cfg)
    # two adjacent peaks with large boxes -> NMS keeps the stronger
    preds[0]["hm"] = preds[0]["hm"].at[0, 10, 10, 0].set(10.0)
    preds[0]["hm"] = preds[0]["hm"].at[0, 10, 11, 0].set(5.0)
    preds[0]["dim"] = preds[0]["dim"].at[:].set(jnp.log(4.0))  # 4m cubes
    det = decode_and_nms(cfg, preds)
    v = np.asarray(det.valid)[0]
    lbl = np.asarray(det.labels)[0][v]
    # per timestep only ONE survivor
    for t in range(7):
        assert (lbl == t).sum() == 1


@pytest.mark.slow
def test_decode_range_mask():
    cfg = tiny_cfg(1, False, False)
    cfg = cfg.replace(test=cfg.test.__class__(
        post_center_limit_range=(-1.0, -1.0, -10.0, 1.0, 1.0, 10.0)))
    preds = _blank_preds(cfg)
    preds[0]["hm"] = preds[0]["hm"].at[0, 2, 2, 0].set(10.0)  # far corner cell
    det = decode_and_nms(cfg, preds)
    assert np.asarray(det.valid).sum() == 0


def test_decode_circular_nms_option():
    import dataclasses
    cfg = tiny_cfg(1, False, False)
    cfg = cfg.replace(test=dataclasses.replace(cfg.test, circular_nms=True,
                                               min_radius=(1.0,)))
    preds = _blank_preds(cfg)
    # two peaks 0.5m apart (cells are 0.5m here) -> circle NMS keeps one
    preds[0]["hm"] = preds[0]["hm"].at[0, 10, 10, 0].set(10.0)
    preds[0]["hm"] = preds[0]["hm"].at[0, 10, 11, 0].set(5.0)
    det = decode_and_nms(cfg, preds)
    v = np.asarray(det.valid)[0]
    lbl = np.asarray(det.labels)[0][v]
    for t in range(7):
        assert (lbl == t).sum() == 1
