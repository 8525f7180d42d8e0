"""Target assignment vs the exact AssignLabel loop oracle + end-to-end train
smoke on synthetic scenes (loss decreases, detections localize objects)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from futuredet_tpu.data import targets as TG
from futuredet_tpu.data.synthetic import make_batch, make_scene
from tests.test_models import tiny_cfg


def test_assign_targets_matches_loop_oracle():
    cfg = tiny_cfg(7, True, True)
    scene = make_scene(cfg, n_objects=6, n_clutter=100, seed=3, max_objs=16)
    got = jax.tree.map(np.asarray, dict(TG.assign_targets(
        cfg, scene.gt_boxes, scene.gt_classes, scene.gt_valid, num_classes=1)))
    want = TG.assign_targets_np(cfg, scene.gt_boxes, scene.gt_classes,
                                scene.gt_valid, num_classes=1)
    np.testing.assert_array_equal(got["mask"], want["mask"])
    np.testing.assert_array_equal(got["ind"], want["ind"])
    np.testing.assert_array_equal(got["cat"], want["cat"])
    np.testing.assert_allclose(got["anno_box"], want["anno_box"],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(got["hm"], want["hm"], atol=2e-4)


def test_trajectory_and_forecast_families():
    cfg = tiny_cfg(7, True, True)
    scene = make_scene(cfg, n_objects=5, n_clutter=100, seed=4, max_objs=16)
    out = TG.build_targets(cfg, scene.gt_boxes, scene.gt_classes,
                           scene.gt_valid, scene.traj_classes)
    W, H = cfg.feature_map_size
    assert out["hm_trajectory"].shape == (7, H, W, 3)
    assert out["hm_forecast"].shape == (7, H, W, 7)
    # trajectory classes route to the right channel
    hmt = np.asarray(out["hm_trajectory"])
    for k in range(5):
        cls = int(scene.traj_classes[k]) - 1
        assert hmt[0, :, :, cls].max() > 0.99
    # forecast family: channel t contains timestep t's boxes
    hmf = np.asarray(out["hm_forecast"])
    for t in range(7):
        assert hmf[0, :, :, t].max() > 0.99


@pytest.mark.slow
def test_synthetic_train_decreases_loss_and_localizes():
    from futuredet_tpu.eval.decode import decode_and_nms
    from futuredet_tpu.parallel.mesh import make_mesh
    from futuredet_tpu.train.step import init_state, make_train_step, \
        make_eval_forward

    cfg = tiny_cfg(1, False, False)
    batch = make_batch(cfg, 2, seed=0, n_objects=6, n_clutter=2000,
                       max_objs=16)
    gt = batch.pop("gt")
    mesh = make_mesh(2)
    state = init_state(cfg, jax.random.PRNGKey(0),
                       jax.tree.map(lambda x: x[:1], batch), total_steps=40)
    step_fn = make_train_step(cfg, mesh, total_steps=40)

    losses = []
    for i in range(40):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    # decode: the highest-score detection should sit near some gt center
    fwd = make_eval_forward(cfg)
    preds = fwd(state.params, state.batch_stats, batch)
    det = decode_and_nms(cfg, preds)
    s = np.asarray(det.scores[0])
    b = np.asarray(det.boxes[0])
    v = np.asarray(det.valid[0])
    assert v.any(), "no detections above threshold after training"
    best = b[np.argmax(np.where(v, s, -1))]
    centers = gt["boxes"][0][0][gt["valid"][0][0]][:, :2]
    dmin = np.min(np.linalg.norm(centers - best[:2], axis=1))
    assert dmin < 2.0, f"best detection {best[:2]} far from any gt ({dmin:.2f} m)"
