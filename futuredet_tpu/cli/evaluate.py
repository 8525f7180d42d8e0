"""Evaluation CLI — mirrors the reference surface.

ref `/root/reference/evaluate.py` flags (README.md:174-185): --forecast_mode,
--rerank, --tp_pct, --cohort_analysis, --K, --static_only, --nogroup,
--extractBox. Produces the metric CSV columns of evaluate.py:22-54.

  python -m futuredet_tpu.cli.evaluate --model forecast_n0 --synthetic 8 \
      --forecast_mode velocity_constant --cohort_analysis
"""
from __future__ import annotations

import argparse
import json
import logging
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a FutureDet-TPU model")
    p.add_argument("--model", default="forecast_n0")
    p.add_argument("--experiment", default="FutureDetection")
    p.add_argument("--dataset", default="nusc")
    p.add_argument("--architecture", default="centerpoint")
    p.add_argument("--info_path", default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--modelCheckPoint", default="latest")
    p.add_argument("--forecast_mode", default="velocity_forward")
    p.add_argument("--rerank", default="last",
                   choices=["first", "last", "add", "mult"])
    p.add_argument("--tp_pct", type=float, default=0.6)
    p.add_argument("--K", type=int, default=1)
    p.add_argument("--cohort_analysis", action="store_true")
    p.add_argument("--static_only", action="store_true")
    p.add_argument("--nogroup", action="store_true")
    p.add_argument("--association_oracle", action="store_true")
    p.add_argument("--jitter", action="store_true")
    p.add_argument("--C", type=float, default=1.0)
    p.add_argument("--postprocess", action="store_true",
                   help="snap trajectories to train-set prototypes "
                        "({classname}_trajectory.pkl from cli.tools)")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--space", type=int, default=1,
                   help="spatial mesh axis: shard BEV rows over this many "
                        "devices during inference (GSPMD halo exchanges)")
    p.add_argument("--extractBox", action="store_true",
                   help="save the decoded detections to a pkl after "
                        "inference (ref tools/dist_test.py:156,252)")
    p.add_argument("--eval_only", action="store_true",
                   help="skip inference and evaluate a saved detections pkl")
    p.add_argument("--predictions_path", default=None,
                   help="pkl path for --extractBox / --eval_only")
    p.add_argument("--speed_test", action="store_true",
                   help="report mean per-sample inference latency over the "
                        "middle third of the eval set "
                        "(ref tools/dist_test.py:204-240)")
    p.add_argument("--feed_dtype", default="int16",
                   choices=["int16", "fp16", "fp32"],
                   help="host->device point wire format (data/feed.py): "
                        "int16 fixed-point halves the transfer bytes with "
                        "<=4 mm coordinate error; fp32 = exact feed")
    p.add_argument("--tta", default="none", choices=["none", "map", "box"],
                   help="double-flip test-time augmentation: 'map' averages "
                        "unflipped head maps (reference formulation), 'box' "
                        "ensembles per-flip detections")
    p.add_argument("--out", default=None, help="metrics json path")
    p.add_argument("--coordinator_address", default=None,
                   help="multi-host bring-up: coordinator host:port "
                        "(replaces torch.distributed NCCL env:// init)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tiny", action="store_true",
                   help="shrunken geometry for smoke tests")
    return p.parse_args(argv)


def main(argv=None):
    import jax
    import numpy as np

    from ..config import get_config
    from ..eval.decode import decode_and_nms
    from ..train.checkpoints import CheckpointManager
    from ..train.step import init_state, make_eval_forward

    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s", force=True)
    from ..parallel.collectives import gather_eval_batch, initialize_multihost
    n_proc = initialize_multihost(args.coordinator_address,
                                  args.num_processes, args.process_id)
    if n_proc > 1:
        logging.info("multi-host eval: process %d/%d",
                     jax.process_index(), n_proc)
    cfg = get_config(args.model)
    if args.tiny:
        from ..config import tiny_variant
        cfg = tiny_variant(cfg)
    classname = cfg.data.class_names[0]

    if args.eval_only:
        # re-scoring a saved detections pkl needs no dataset, model, or
        # checkpoint (ref: dist_test's no-extractBox path skips the model)
        eval_batches = []
    elif args.synthetic:
        from ..data.synthetic import make_batch
        # physical lidar-statistics clutter (see cli/train.py): keeps the
        # sparse generative capacities clip-free on synthetic eval
        eval_batches = [make_batch(cfg, args.batch_size, seed=args.seed + i,
                                   clutter_mode="lidar")
                        for i in range(max(args.synthetic // args.batch_size, 1))]
        for i, b in enumerate(eval_batches):
            b["tokens"] = [f"syn{i}_{j}" for j in range(args.batch_size)]
        # strided per-process shard (mirrors batches_from_dataset's sharding)
        eval_batches = eval_batches[jax.process_index()::n_proc]
    else:
        if not args.info_path or not os.path.exists(args.info_path):
            raise SystemExit(
                "no dataset: pass --info_path <infos pkl> or --synthetic N")
        from ..data.pipeline import NuScenesForecastDataset, \
            batches_from_dataset
        ds = NuScenesForecastDataset(cfg, args.info_path, train=False,
                                     class_balanced=False)
        eval_batches = list(batches_from_dataset(
            ds, cfg, args.batch_size, shuffle=False, loop=False,
            num_shards=n_proc, shard_id=jax.process_index()))

    if not args.eval_only:
        first = {k: v for k, v in eval_batches[0].items()
                 if k in ("points", "points_valid", "targets", "bev_map")}
        state = init_state(cfg, jax.random.PRNGKey(0),
                           jax.tree.map(lambda x: x[:1], first),
                           total_steps=1)
        ckpt_dir = args.checkpoint_dir or os.path.abspath(
            f"models/{args.experiment}/{args.dataset}_{args.architecture}_"
            f"{args.model}_detection")
        if os.path.isdir(ckpt_dir):
            try:
                mgr = CheckpointManager(ckpt_dir)
                # ref evaluate.py:92,149: --modelCheckPoint latest|epoch_N
                # (here also a bare step index)
                step = mgr.resolve(args.modelCheckPoint)
                state = mgr.restore(jax.device_get(state), step=step)
                logging.info("restored checkpoint step %d (%s)",
                             int(state.step), args.modelCheckPoint)
            except FileNotFoundError as e:
                if args.modelCheckPoint not in (None, "latest"):
                    raise SystemExit(f"--modelCheckPoint: {e}")
                logging.warning("no checkpoint in %s — evaluating random "
                                "init", ckpt_dir)

    prototypes = None
    if args.postprocess:
        import pickle
        proto_path = f"{classname}_trajectory.pkl"
        if os.path.exists(proto_path):
            with open(proto_path, "rb") as f:
                prototypes = pickle.load(f)
        else:
            logging.warning("%s not found — run cli.tools trajectory first",
                            proto_path)

    # forward + decode + NMS fused into ONE jitted program (single async
    # dispatch per batch); host-side linking of batch i overlaps the device
    # computing batch i+1 via a depth-2 in-flight queue (JAX async dispatch)
    from collections import deque

    from ..eval.evaluator import (detections_to_predictions,
                                  gt_records_from_arrays,
                                  gt_records_multiclass,
                                  multitask_detection_records)
    from ..eval.metrics import evaluate_forecasts

    if not args.eval_only:
        mesh = None
        if args.space > 1:
            from ..parallel.mesh import data_axis_size, make_mesh_2d
            # data axis must divide the batch (P("data") shards batch dim)
            mesh = make_mesh_2d(data_axis_size(args.batch_size, args.space),
                                args.space)
        from ..data.feed import unpack_batch
        fwd = make_eval_forward(cfg, mesh)
        # the compact wire feed (--feed_dtype) is decoded INSIDE the jitted
        # program, before any consumer (fuses into the voxelizer's first
        # elementwise pass)
        if cfg.model.two_stage_refine:
            # RoI-refined detections come straight out of the forward
            # (ref two_stage.py post_process :120-155)
            if args.tta != "none":
                raise SystemExit("--tta is not supported for two-stage "
                                 "configs")
            from ..models.two_stage import refined_detections
            infer = jax.jit(lambda p, s, b: (
                lambda out: refined_detections(out[1], out[2]))(
                    fwd(p, s, unpack_batch(b))))
        elif args.tta != "none":
            from ..eval.tta import infer_double_flip, infer_double_flip_map
            tta_fn = (infer_double_flip_map if args.tta == "map"
                      else infer_double_flip)
            infer = jax.jit(lambda p, s, b: (
                lambda ub: tta_fn(
                    cfg, lambda pts, pv: fwd(p, s, {"points": pts,
                                                    "points_valid": pv}),
                    ub["points"], ub["points_valid"]))(unpack_batch(b)))
        else:
            infer = jax.jit(
                lambda p, s, b: decode_and_nms(cfg,
                                               fwd(p, s, unpack_batch(b))))

    # multi-task class-group configs are detection-only: labels are global
    # class ids, there is no forecast linking (classic CenterPoint eval)
    h = cfg.model.head
    multitask = h.standard and len(h.tasks) > 1
    eval_classes = (list(cfg.data.class_names) if multitask
                    else [classname])

    if not args.eval_only and eval_batches \
            and cfg.model.detector == "voxelnet" \
            and cfg.model.middle == "sparse" \
            and not cfg.model.two_stage_refine:
        # capacity honesty check on the first batch: the sparse middle
        # encoder counts sites clipped by the static stage capacities
        # (reference spconv never drops — a nonzero count means this eval
        # is not running reference semantics). One extra forward, once.
        from ..models.detector import (build_detector,
                                       forward_with_drop_counters)
        b0 = eval_batches[0]
        _, drops = forward_with_drop_counters(
            build_detector(cfg), {"params": state.params,
                                  "batch_stats": state.batch_stats},
            jax.numpy.asarray(np.asarray(b0["points"])),
            jax.numpy.asarray(np.asarray(b0["points_valid"])), train=False)
        if drops is not None and int(np.asarray(drops).sum()) > 0:
            logging.warning(
                "sparse capacity clipping on the first batch: per-stage "
                "dropped sites %s — results diverge from reference spconv "
                "semantics; raise middle_vmax / middle_growth",
                np.asarray(drops).tolist())
        else:
            logging.info("sparse capacity check: zero dropped sites on "
                         "the first batch")

    preds, gts = [], []
    saved = []
    pred_path = args.predictions_path or f"prediction_{args.model}.pkl"

    def consume(item):
        det_dev, gt, tokens = item
        if n_proc > 1:
            # cross-host gather (replaces the reference's pickle-padded
            # dist.all_gather of detection dicts, torchie/trainer/utils.py:
            # 100-155): every host ends up with the full batch's records
            det, gt, tokens = gather_eval_batch(det_dev, gt, tokens)
        else:
            det = jax.device_get(det_dev)
        if args.extractBox:
            saved.append((det, gt, tokens))
        if multitask:
            p = multitask_detection_records(cfg, det, tokens)
            g = gt_records_multiclass(np.asarray(gt["boxes"]),
                                      np.asarray(gt["valid"]),
                                      np.asarray(gt["classes"]), tokens,
                                      cfg.data.class_names)
        else:
            p = detections_to_predictions(
                cfg, det, tokens, forecast_mode=args.forecast_mode,
                classname=classname, rerank=args.rerank,
                nogroup=args.nogroup, jitter=args.jitter, jitter_K=args.K,
                jitter_C=args.C, prototypes=prototypes,
                sample_times=gt.get("times"))
            g = gt_records_from_arrays(gt["boxes"], gt["valid"],
                                       gt.get("traj"), tokens, classname,
                                       attrs=gt.get("attr"))
        for x in p:
            x.yaw = float(-x.yaw - np.pi / 2)
        preds.extend(p)
        gts.extend(g)

    if args.eval_only:
        # re-evaluate previously extracted detections (ref evaluate.py's
        # eval_only path: dist_test skips the model entirely)
        import pickle
        with open(pred_path, "rb") as f:
            for item in pickle.load(f):
                consume(item)
    else:
        import time as _time

        n_b = len(eval_batches)
        # never probe batch 0 (JIT compile) — degenerate tiny sets skip
        lo_t = max(n_b // 3, 1)
        hi_t = max(2 * n_b // 3, lo_t + 1)
        lat = []
        inflight = deque()

        from ..data.feed import pack_points

        def dev_slice(b):
            out = {k: v for k, v in b.items()
                   if k in ("points", "points_valid", "bev_map")}
            # compact wire format: int16 fixed-point halves the
            # tunnel-bound H2D point bytes (data/feed.py)
            out["points"] = pack_points(np.asarray(out["points"]),
                                        args.feed_dtype)
            return jax.device_put(out)

        # double-buffered host->device feed: issue batch i+1's async
        # device_put while batch i computes, so the (multi-MB points)
        # transfer overlaps inference instead of serializing with it
        dev_q = deque([dev_slice(eval_batches[0])] if eval_batches else [])
        for bi, b in enumerate(eval_batches):
            probe = args.speed_test and lo_t <= bi < hi_t and n_b >= 3
            if probe:
                # drain pending work so the probe times ONLY this batch
                while inflight:
                    consume(inflight.popleft())
            batch = dev_q.popleft()
            if not probe and bi + 1 < n_b:
                dev_q.append(dev_slice(eval_batches[bi + 1]))
            t0 = _time.perf_counter()
            det_dev = infer(state.params, state.batch_stats, batch)
            if probe:
                # synchronous latency probe over the middle third
                # (ref dist_test.py:204-240); device_get forces completion.
                # The probed batch's own H2D transfer was prefetched on the
                # previous iteration, so this measures DEVICE latency
                # (compute + decode + D2H) — and the next batch's prefetch
                # is deferred until after the probe so nothing contends
                # with it over the tunnel.
                det_dev = jax.device_get(det_dev)
                lat.append((_time.perf_counter() - t0)
                           / batch["points"].shape[0])
                if bi + 1 < n_b:
                    dev_q.append(dev_slice(eval_batches[bi + 1]))
            inflight.append((det_dev, b["gt"], b["tokens"]))
            while len(inflight) >= 2:
                consume(inflight.popleft())
        while inflight:
            consume(inflight.popleft())
        if args.speed_test and lat:
            logging.info("speed test: %.1f ms/sample over %d middle-third "
                         "batches (%.1f samples/s)",
                         1e3 * float(np.mean(lat)), len(lat),
                         1.0 / float(np.mean(lat)))
        if args.extractBox and jax.process_index() == 0:
            import pickle
            with open(pred_path, "wb") as f:
                pickle.dump(saved, f)
            logging.info("detections saved to %s", pred_path)
    results = evaluate_forecasts(
        preds, gts, eval_classes, tp_pct=args.tp_pct,
        cohort_analysis=args.cohort_analysis, topk=args.K,
        static_only=args.static_only,
        association_oracle=args.association_oracle)

    summary = results.summary()
    out_path = args.out or f"metrics_{args.model}_{args.forecast_mode}.json"
    if jax.process_index() != 0:
        # every host holds the gathered records and computes identical
        # metrics; only process 0 writes files (ref: rank-0 evaluation,
        # tools/dist_test.py:242-252)
        return summary
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)

    # reference CSV layout (ref evaluate.py:34-53,203-209)
    try:
        import pandas as pd
        rows = {"CLASS": [], "mAP": [], "mAR": [], "mFAP": [], "mFAR": [],
                "mAAP": [], "mAAR": [], "ATE": [], "ASE": [], "AOE": [],
                "AVE": [], "AAE": [], "ADE": [], "FDE": [], "MR": [],
                "mFAP_MR": []}
        key_map = {"ATE": "trans_err", "ASE": "scale_err", "AOE": "orient_err",
                   "AVE": "vel_err", "AAE": "attr_err", "ADE": "avg_disp_err",
                   "FDE": "final_disp_err", "MR": "miss_rate"}
        for cls in summary["mean_dist_aps"]:
            rows["CLASS"].append(cls)
            rows["mAP"].append(summary["mean_dist_aps"][cls])
            rows["mAR"].append(summary["mean_dist_ars"][cls])
            rows["mFAP"].append(summary["mean_dist_faps"][cls])
            rows["mFAR"].append(summary["mean_dist_fars"][cls])
            rows["mAAP"].append(summary["mean_dist_aaps"][cls])
            rows["mAAR"].append(summary["mean_dist_aars"][cls])
            rows["mFAP_MR"].append(summary["mean_dist_faps_mr"][cls])
            for col, key in key_map.items():
                rows[col].append(summary["label_tp_errors"][cls][key])
        csv_path = out_path.rsplit(".", 1)[0] + ".csv"
        pd.DataFrame.from_dict(rows).to_csv(csv_path, index=False)
        logging.info("metrics CSV written to %s", csv_path)
    except ImportError:
        pass
    for cls, v in summary["mean_dist_aps"].items():
        logging.info("%s: mAP %.4f mFAP %.4f mAAP %.4f ADE %.3f FDE %.3f MR %.3f",
                     cls, v, summary["mean_dist_faps"][cls],
                     summary["mean_dist_aaps"][cls],
                     summary["label_tp_errors"][cls]["avg_disp_err"],
                     summary["label_tp_errors"][cls]["final_disp_err"],
                     summary["label_tp_errors"][cls]["miss_rate"])
    logging.info("metrics written to %s", out_path)
    return summary


if __name__ == "__main__":
    main()
