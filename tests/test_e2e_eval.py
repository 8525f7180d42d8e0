"""Full-loop integration: train the tiny forecast model on synthetic scenes,
run the jitted decode, link trajectories, and compute joint metrics."""
import numpy as np
import jax

from futuredet_tpu.eval.decode import decode_and_nms
from futuredet_tpu.eval.evaluator import evaluate_detections
from futuredet_tpu.data.synthetic import make_batch
from futuredet_tpu.parallel.mesh import make_mesh
from futuredet_tpu.train.step import init_state, make_eval_forward, \
    make_train_step
from tests.test_models import tiny_cfg


def test_train_then_eval_produces_sane_metrics():
    cfg = tiny_cfg(1, False, False)
    batch = make_batch(cfg, 2, seed=0, n_objects=6, n_clutter=2000,
                       max_objs=16)
    gt = batch.pop("gt")
    mesh = make_mesh(2)
    state = init_state(cfg, jax.random.PRNGKey(0),
                       jax.tree.map(lambda x: x[:1], batch), total_steps=50)
    step_fn = make_train_step(cfg, mesh, total_steps=50)
    for _ in range(50):
        state, metrics = step_fn(state, batch)

    fwd = make_eval_forward(cfg)
    preds = fwd(state.params, state.batch_stats, batch)
    det = decode_and_nms(cfg, preds)

    tokens = ["sample0", "sample1"]
    # n0 model + constant-velocity linking (the reference's velocity_constant)
    res = evaluate_detections(cfg, det, gt, tokens,
                              forecast_mode="velocity_constant")
    ap = res.mean_dist_aps["car"]
    assert 0.0 < ap <= 1.0
    # detection AP at 4m should be decent after 80 steps on 2 fixed scenes
    assert ap > 0.08, f"mAP {ap}"
    # metric dict is complete
    s = res.summary()
    for k in ("mean_dist_aps", "mean_dist_faps", "mean_dist_aaps",
              "mean_dist_faps_mr", "label_tp_errors"):
        assert k in s
    for m in ("trans_err", "scale_err", "orient_err", "vel_err",
              "avg_disp_err", "final_disp_err", "miss_rate"):
        assert m in s["label_tp_errors"]["car"]


def test_eval_oracle_on_gt_as_predictions():
    """Feeding the GT back as 'detections' must produce near-perfect mAP —
    validates the whole linking+metric path independent of the model."""
    from futuredet_tpu.eval.decode import Detections
    import jax.numpy as jnp

    cfg = tiny_cfg(7, True, True)
    batch = make_batch(cfg, 2, seed=5, n_objects=5, n_clutter=100, max_objs=16)
    gt = batch.pop("gt")
    T = 7
    post = cfg.test.nms.post_max_size
    B = 2
    N = T * post
    boxes = np.zeros((B, N, 9), np.float32)
    scores = np.zeros((B, N), np.float32)
    labels = np.zeros((B, N), np.int32)
    valid = np.zeros((B, N), bool)
    for b in range(B):
        i = 0
        for t in range(T):
            for k in range(16):
                if not gt["valid"][b][t, k]:
                    continue
                g = gt["boxes"][b][t, k]
                boxes[b, i] = [g[0], g[1], g[2], g[3], g[4], g[5],
                               g[6], g[7], g[10]]
                scores[b, i] = 0.9
                labels[b, i] = t
                valid[b, i] = True
                i += 1
    det = Detections(boxes=jnp.asarray(boxes), scores=jnp.asarray(scores),
                     labels=jnp.asarray(labels), valid=jnp.asarray(valid))
    res = evaluate_detections(cfg, det, gt, ["s0", "s1"],
                              forecast_mode="velocity_dense")
    assert res.mean_dist_aps["car"] > 0.9, res.mean_dist_aps
    assert res.mean_dist_faps["car"] > 0.9, res.mean_dist_faps
    assert res.label_tp_errors["car"]["avg_disp_err"] < 0.5

    # cohort analysis runs and covers the three cohorts
    res_c = evaluate_detections(cfg, det, gt, ["s0", "s1"],
                                forecast_mode="velocity_dense",
                                cohort_analysis=True)
    assert set(res_c.mean_dist_aps) == {"static_car", "linear_car",
                                        "nonlinear_car"}


def test_eval_forward_with_bev_map_config():
    """n3dtfm-style eval: the bev_map must flow through init_state and the
    eval forward (regression: both CLIs once dropped it)."""
    import dataclasses

    from futuredet_tpu.data.synthetic import make_batch
    from futuredet_tpu.eval.decode import decode_and_nms
    from futuredet_tpu.train.step import (init_state, make_eval_forward,
                                          make_train_step)
    from futuredet_tpu.parallel.mesh import make_mesh
    from tests.test_models import tiny_cfg

    cfg = tiny_cfg(7, True, True)
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, head=dataclasses.replace(cfg.model.head, bev_map=True)))
    batch = make_batch(cfg, 1, seed=0, n_objects=3, n_clutter=200,
                       max_objs=16)
    batch.pop("gt")
    assert "bev_map" in batch
    state = init_state(cfg, jax.random.PRNGKey(0), batch, total_steps=2)
    fwd = make_eval_forward(cfg)
    det = decode_and_nms(cfg, fwd(state.params, state.batch_stats, batch))
    assert np.isfinite(np.asarray(det.boxes)).all()
