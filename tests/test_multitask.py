"""Multi-task class groups (classic CenterPoint: one SepHead per group).

ref center_head.py:321-323 builds `num_classes = [len(t) for t in tasks]`;
targets/loss/decode treat the leading family axis as the task index when
timesteps == 1 and len(tasks) > 1.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from futuredet_tpu.config import (AssignerConfig, DataConfig, HeadConfig,
                                  ModelConfig, NMSConfig, RPNConfig,
                                  TestConfig, VoxelConfig, ExperimentConfig)
from futuredet_tpu.data import targets as TG
from futuredet_tpu.eval.decode import decode_and_nms
from futuredet_tpu.models.detector import build_detector
from futuredet_tpu.models.losses import center_head_loss

TASKS = (("car",), ("truck", "bus"), ("pedestrian",))
NAMES = ("car", "truck", "bus", "pedestrian")


def mt_cfg():
    voxel = VoxelConfig(pc_range=(-8.0, -8.0, -3.0, 8.0, 8.0, 3.0),
                        voxel_size=(0.5, 0.5, 6.0), max_points_per_voxel=8,
                        max_voxels_train=512, max_voxels_eval=512,
                        max_points=1024)
    rpn = RPNConfig(layer_nums=(1, 1), ds_strides=(1, 2), ds_filters=(32, 64),
                    us_strides=(1, 2), us_filters=(64, 64), in_channels=64)
    head = HeadConfig(tasks=TASKS, in_channels=128, share_conv_channel=32,
                      timesteps=1)
    return ExperimentConfig(
        name="tiny_mt", timesteps=1,
        model=ModelConfig(detector="pointpillars",
                          reader="pillar_feature_net", rpn=rpn, head=head),
        voxel=voxel,
        data=DataConfig(class_names=NAMES),
        test=TestConfig(post_center_limit_range=(-10.,) * 3 + (10.,) * 3,
                        nms=NMSConfig(pre_max_size=128, post_max_size=16)),
        assigner=AssignerConfig(out_size_factor=1, max_objs=16))


def _gt(seed=0, M=16):
    rng = np.random.default_rng(seed)
    n = 10
    boxes = np.zeros((1, M, 12), np.float32)
    boxes[0, :n, :2] = rng.uniform(-7, 7, (n, 2))
    boxes[0, :n, 2] = rng.uniform(-1, 1, n)
    boxes[0, :n, 3:6] = rng.uniform(1, 3, (n, 3))
    boxes[0, :n, 6:8] = rng.uniform(-2, 2, (n, 2))
    boxes[0, :n, 10] = rng.uniform(-np.pi, np.pi, n)
    classes = np.zeros((1, M), np.int64)
    classes[0, :n] = rng.integers(1, len(NAMES) + 1, n)
    valid = np.zeros((1, M), bool)
    valid[0, :n] = True
    return boxes, classes, valid


def test_multitask_targets_match_per_task_oracle():
    cfg = mt_cfg()
    boxes, classes, valid = _gt()
    out = TG.build_targets(cfg, jnp.asarray(boxes), jnp.asarray(classes),
                           jnp.asarray(valid))
    assert out["hm"].shape[0] == len(TASKS)
    cmax = max(len(t) for t in TASKS)
    assert out["hm"].shape[-1] == cmax

    for ti, task in enumerate(TASKS):
        # remap to within-task classes and run the single-task numpy oracle
        tcls = np.zeros_like(classes)
        tval = np.zeros_like(valid)
        for j, nme in enumerate(task):
            gid = NAMES.index(nme) + 1
            sel = classes == gid
            tcls[sel] = j + 1
            tval |= sel & valid
        ref = TG.assign_targets_np(cfg, boxes, tcls, tval,
                                   num_classes=len(task))
        np.testing.assert_allclose(np.asarray(out["hm"][ti, :, :, :len(task)]),
                                   ref["hm"][0], atol=1e-5)
        np.testing.assert_array_equal(np.asarray(out["mask"][ti]),
                                      ref["mask"][0])
        np.testing.assert_array_equal(np.asarray(out["cat"][ti]),
                                      ref["cat"][0])
        np.testing.assert_allclose(np.asarray(out["anno_box"][ti]),
                                   ref["anno_box"][0], atol=1e-5)


def test_multitask_forward_loss_and_decode():
    cfg = mt_cfg()
    rng = np.random.default_rng(0)
    B = 2
    pts = np.concatenate([rng.uniform(-8, 8, (B, 1024, 2)),
                          rng.uniform(-2.5, 2.5, (B, 1024, 1)),
                          rng.uniform(0, 1, (B, 1024, 2))], -1).astype(np.float32)
    pts = jnp.asarray(pts)
    pv = jnp.ones((B, 1024), bool)

    model = build_detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), pts, pv, train=False)
    preds = model.apply(variables, pts, pv, train=False)
    assert len(preds) == len(TASKS)
    assert preds[0]["hm"].shape[-1] == 1 and preds[1]["hm"].shape[-1] == 2

    boxes, classes, valid = _gt()
    tgt1 = TG.build_targets(cfg, jnp.asarray(boxes), jnp.asarray(classes),
                            jnp.asarray(valid))
    targets = jax.tree.map(lambda x: jnp.stack([x, x]), tgt1)
    losses = center_head_loss(cfg.model.head, preds, targets)
    assert np.isfinite(float(losses["loss"]))
    assert losses["hm_loss"].shape == (len(TASKS),)

    det = decode_and_nms(cfg, preds)
    labs = np.asarray(det.labels)
    assert labs.min() >= 0 and labs.max() < len(NAMES)
    # each task contributes a contiguous slot block with its own class range
    post = cfg.test.nms.post_max_size
    offs = [0, 1, 3]
    for ti, task in enumerate(TASKS):
        blk = labs[:, ti * post:(ti + 1) * post]
        assert blk.min() >= offs[ti] and blk.max() < offs[ti] + len(task)


def test_multitask_train_step_learns():
    import optax

    cfg = mt_cfg()
    rng = np.random.default_rng(1)
    B = 2
    pts = np.concatenate([rng.uniform(-8, 8, (B, 1024, 2)),
                          rng.uniform(-2.5, 2.5, (B, 1024, 1)),
                          rng.uniform(0, 1, (B, 1024, 2))], -1).astype(np.float32)
    pts, pv = jnp.asarray(pts), jnp.ones((B, 1024), bool)
    boxes, classes, valid = _gt(2)
    tgt1 = TG.build_targets(cfg, jnp.asarray(boxes), jnp.asarray(classes),
                            jnp.asarray(valid))
    targets = jax.tree.map(lambda x: jnp.stack([x, x]), tgt1)

    model = build_detector(cfg)
    variables = model.init(jax.random.PRNGKey(0), pts, pv, train=True)
    params, bs = variables["params"], variables["batch_stats"]
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, bs, opt):
        def lf(p):
            preds, mut = model.apply({"params": p, "batch_stats": bs},
                                     pts, pv, train=True,
                                     mutable=["batch_stats"])
            return center_head_loss(cfg.model.head, preds,
                                    targets)["loss"], mut["batch_stats"]
        (loss, nbs), g = jax.value_and_grad(lf, has_aux=True)(params)
        up, nopt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), nbs, nopt, loss

    losses = []
    for _ in range(6):
        params, bs, opt, loss = step(params, bs, opt)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_multitask_forecast_eval_guard():
    import pytest
    from futuredet_tpu.eval.decode import Detections
    from futuredet_tpu.eval.evaluator import detections_to_predictions

    cfg = mt_cfg()
    det = Detections(boxes=np.zeros((1, 4, 9), np.float32),
                     scores=np.zeros((1, 4), np.float32),
                     labels=np.zeros((1, 4), np.int32),
                     valid=np.zeros((1, 4), bool))
    # the guard must NAME the working alternative entry point
    with pytest.raises(NotImplementedError,
                       match="evaluate_detections_multitask"):
        detections_to_predictions(cfg, det, ["s0"])


def test_multitask_circle_nms_per_task_radius():
    import dataclasses
    from futuredet_tpu.config import NMSConfig, TestConfig
    from futuredet_tpu.eval.decode import decode_and_nms

    # two tasks, radically different circle-NMS radii: big radius suppresses
    # the second of two nearby peaks, tiny radius keeps both
    cfg = mt_cfg()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            head=dataclasses.replace(cfg.model.head,
                                     tasks=(("car",), ("pedestrian",)))),
        test=TestConfig(post_center_limit_range=(-100.,) * 3 + (100.,) * 3,
                        score_threshold=0.05, circular_nms=True,
                        min_radius=(1000.0, 0.01),
                        nms=NMSConfig(pre_max_size=64, post_max_size=8)))
    H, W = cfg.feature_map_size[1], cfg.feature_map_size[0]

    def mk_pred():
        hm = np.full((1, H, W, 1), -10.0, np.float32)
        hm[0, 4, 4, 0] = 4.0
        hm[0, 4, 8, 0] = 3.0     # ~1.6 m away at 0.4 m cells
        return {"hm": jnp.asarray(hm),
                "reg": jnp.zeros((1, H, W, 2)),
                "height": jnp.zeros((1, H, W, 1)),
                "dim": jnp.zeros((1, H, W, 3)),
                "rot": jnp.concatenate([jnp.zeros((1, H, W, 1)),
                                        jnp.ones((1, H, W, 1))], -1),
                "vel": jnp.zeros((1, H, W, 2))}

    det = decode_and_nms(cfg, [mk_pred(), mk_pred()])
    post = cfg.test.nms.post_max_size
    n_task0 = int(np.asarray(det.valid)[0, :post].sum())
    n_task1 = int(np.asarray(det.valid)[0, post:].sum())
    assert n_task0 == 1, n_task0   # radius 1000 suppressed the 2nd peak
    assert n_task1 == 2, n_task1   # radius 0.01 kept both


def test_multitask_detection_eval_perfect_predictions():
    """Exact echo of multi-class GT as detections -> per-class mAP == 1."""
    from futuredet_tpu.eval.decode import Detections
    from futuredet_tpu.eval.evaluator import (gt_records_multiclass,
                                              multitask_detection_records)
    from futuredet_tpu.eval.metrics import evaluate_forecasts

    cfg = mt_cfg()
    rng = np.random.default_rng(0)
    B, M = 3, 12
    boxes = np.zeros((B, 1, M, 12), np.float32)
    classes = np.zeros((B, 1, M), np.int64)
    valid = np.zeros((B, 1, M), bool)
    for b in range(B):
        n = 8
        boxes[b, 0, :n, :2] = rng.uniform(-7, 7, (n, 2))
        boxes[b, 0, :n, 3:6] = rng.uniform(1, 3, (n, 3))
        boxes[b, 0, :n, 10] = rng.uniform(-np.pi, np.pi, n)
        classes[b, 0, :n] = rng.integers(1, len(NAMES) + 1, n)
        valid[b, 0, :n] = True

    # detections = the GT echoed back, labels = global class - 1
    N = M
    dboxes = np.zeros((B, N, 9), np.float32)
    dboxes[:, :, :2] = boxes[:, 0, :, :2]
    dboxes[:, :, 2] = boxes[:, 0, :, 2]
    dboxes[:, :, 3:6] = boxes[:, 0, :, 3:6]
    dboxes[:, :, 6:8] = boxes[:, 0, :, 6:8]
    dboxes[:, :, 8] = boxes[:, 0, :, 10]   # stored-convention yaw
    det = Detections(
        boxes=dboxes,
        scores=rng.uniform(0.5, 1.0, (B, N)).astype(np.float32),
        labels=np.maximum(classes[:, 0] - 1, 0).astype(np.int32),
        valid=valid[:, 0])

    tokens = [f"s{b}" for b in range(B)]
    preds = multitask_detection_records(cfg, det, tokens)
    for p in preds:
        p.yaw = float(-p.yaw - np.pi / 2)
    gts = gt_records_multiclass(boxes, valid, classes, tokens, NAMES)
    res = evaluate_forecasts(preds, gts, list(NAMES))

    present = {g.classname for g in gts}
    for cls in present:
        assert res.mean_dist_aps[cls] > 0.97, (cls, res.mean_dist_aps[cls])
        e = res.label_tp_errors[cls]
        assert e["trans_err"] < 1e-3 and e["orient_err"] < 1e-3, e


def test_multitask_learns_to_classify_e2e():
    """Train the multi-task head on fixed multi-class synthetic scenes, then
    check the per-class detection eval finds the right classes."""
    from futuredet_tpu.data.synthetic import make_batch
    from futuredet_tpu.eval.decode import decode_and_nms
    from futuredet_tpu.eval.evaluator import (gt_records_multiclass,
                                              multitask_detection_records)
    from futuredet_tpu.eval.metrics import evaluate_forecasts
    from futuredet_tpu.parallel.mesh import make_mesh
    from futuredet_tpu.train.step import init_state, make_train_step

    cfg = mt_cfg()
    cfg = cfg.replace(
        model=dataclasses.replace(
            cfg.model,
            head=dataclasses.replace(cfg.model.head,
                                     tasks=(("car",), ("pedestrian",)))),
        data=dataclasses.replace(cfg.data,
                                 class_names=("car", "pedestrian")))
    batch = make_batch(cfg, 2, seed=3, n_objects=6, n_clutter=500,
                       max_objs=16)
    gt = batch.pop("gt")
    tokens = ["a", "b"]

    state = init_state(cfg, jax.random.PRNGKey(0),
                       jax.tree.map(lambda x: x[:1], batch), total_steps=60)
    step_fn = make_train_step(cfg, make_mesh(1), total_steps=60)
    for _ in range(60):
        state, metrics = step_fn(state, batch)
    assert float(metrics["loss"]) < 4.0, float(metrics["loss"])

    from futuredet_tpu.train.step import make_eval_forward
    fwd = make_eval_forward(cfg)
    det = jax.device_get(decode_and_nms(
        cfg, fwd(state.params, state.batch_stats, batch)))
    preds = multitask_detection_records(cfg, det, tokens)
    for p in preds:
        p.yaw = float(-p.yaw - np.pi / 2)
    gts = gt_records_multiclass(np.asarray(gt["boxes"]),
                                np.asarray(gt["valid"]),
                                np.asarray(gt["classes"]), tokens,
                                cfg.data.class_names)
    res = evaluate_forecasts(preds, gts, list(cfg.data.class_names))
    present = {g.classname for g in gts}
    # after 60 steps on 2 fixed scenes, every present class is detected
    for cls in present:
        assert res.mean_dist_aps[cls] > 0.2, (cls, res.mean_dist_aps)
