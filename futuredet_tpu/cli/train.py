"""Training CLI — mirrors the reference launcher surface.

ref `/root/reference/train.py` + `tools/train.py`: model names resolve to
configs; work dirs are `models/{experiment}/{config_name}`. Data comes from
nuScenes infos when --info_path exists, else from the synthetic scene
generator (--synthetic N). No torch.distributed launcher: the data-parallel
mesh is in-process (SURVEY.md §2.2).

  python -m futuredet_tpu.cli.train --model forecast_n0 --synthetic 64 \
      --epochs 2 --batch_size 2
"""
from __future__ import annotations

import argparse
import itertools
import logging
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train a FutureDet-TPU model")
    p.add_argument("--model", default="forecast_n0",
                   help="config name (forecast_n0/n3/n3dtf[m], pedestrian_*, pp_*)")
    p.add_argument("--experiment", default="FutureDetection")
    p.add_argument("--dataset", default="nusc")
    p.add_argument("--architecture", default="centerpoint")
    p.add_argument("--info_path", default=None, help="nuScenes infos pkl")
    p.add_argument("--db_info_path", default=None,
                   help="GT-AUG dbinfos pkl (default: dbinfos_train_"
                        "{nsweeps}sweeps_withvelo.pkl next to --info_path)")
    p.add_argument("--no_gt_aug", action="store_true",
                   help="disable GT-AUG paste sampling even when dbinfos "
                        "exist (ref db_sampler, configs n3dtf:110-141)")
    p.add_argument("--synthetic", type=int, default=0,
                   help="train on N synthetic scenes instead of real data")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--checkpoint_interval", type=int, default=None,
                   help="epochs between checkpoint saves (default: every "
                        "epoch, matching the reference CheckpointHook "
                        "interval=1)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--work_dir", default=None)
    p.add_argument("--resume_from", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--val_synthetic", type=int, default=0,
                   help="run a per-epoch validation eval on N synthetic "
                        "samples (ref Trainer.val workflow)")
    p.add_argument("--autoscale_lr", action="store_true",
                   help="scale lr_max linearly by the data-mesh size "
                        "(ref tools/train.py:94-95)")
    p.add_argument("--space", type=int, default=1,
                   help="spatial mesh axis size: shard BEV rows over this "
                        "many devices (GSPMD halo exchanges)")
    p.add_argument("--first_stage_checkpoint", default=None,
                   help="two-stage configs: work dir of a trained "
                        "single-stage checkpoint to graft under the "
                        "first_stage scope (ref TwoStageDetector builds its "
                        "first stage from a checkpoint, two_stage.py:21-27)")
    p.add_argument("--coordinator_address", default=None,
                   help="multi-host bring-up: coordinator host:port "
                        "(replaces torch.distributed.launch + NCCL env:// "
                        "init, ref tools/train.py:84-92)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--tiny", action="store_true",
                   help="shrunken geometry for smoke tests")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--profile", default=None,
                   help="capture a jax.profiler trace to this log dir")
    p.add_argument("--tensorboard", action="store_true",
                   help="log scalars to {work_dir}/tb (ref torchie "
                        "TensorboardLoggerHook)")
    return p.parse_args(argv)


def main(argv=None):
    from ..config import get_config
    from ..train.trainer import train

    args = parse_args(argv)
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(levelname)s %(message)s", force=True)
    from ..parallel.collectives import initialize_multihost
    n_proc = initialize_multihost(args.coordinator_address,
                                  args.num_processes, args.process_id)
    if n_proc > 1:
        import jax as _jax
        logging.info("multi-host training: process %d/%d, %d local / %d "
                     "global devices", _jax.process_index(), n_proc,
                     _jax.local_device_count(), _jax.device_count())
    cfg = get_config(args.model)
    if args.tiny:
        from ..config import tiny_variant
        cfg = tiny_variant(cfg)
    if args.epochs or args.checkpoint_interval:
        cfg = cfg.replace(train=cfg.train.__class__(
            total_epochs=args.epochs or cfg.train.total_epochs,
            optim=cfg.train.optim, seed=args.seed,
            log_interval=cfg.train.log_interval,
            checkpoint_interval_epochs=args.checkpoint_interval
            or cfg.train.checkpoint_interval_epochs))

    if args.autoscale_lr:
        import dataclasses as _dc
        import jax as _jax
        n_data = max(_jax.device_count() // max(args.space, 1), 1)
        cfg = cfg.replace(train=_dc.replace(
            cfg.train, optim=_dc.replace(
                cfg.train.optim, lr_max=cfg.train.optim.lr_max * n_data)))

    work_dir = args.work_dir or os.path.abspath(
        f"models/{args.experiment}/{args.dataset}_{args.architecture}_"
        f"{args.model}_detection")
    batch_size = args.batch_size or cfg.train.batch_size_per_device

    if args.synthetic:
        from ..data.synthetic import make_batch
        n_batches = max(args.synthetic // batch_size, 1)
        cached = []
        for i in range(n_batches):
            # lidar-statistics clutter (multi-hit adjacency): uniform
            # speckle is a non-physical worst case for the generative
            # sparse capacities and clips at train caps (the capacity
            # warning below fires); physical scenes train clip-free
            b = make_batch(cfg, batch_size, seed=args.seed + i,
                           device_targets=True, clutter_mode="lidar")
            b.pop("gt")
            cached.append(b)
        batches = itertools.cycle(cached)
        steps_per_epoch = n_batches
    else:
        if not args.info_path or not os.path.exists(args.info_path):
            raise SystemExit(
                "no dataset: pass --info_path <infos pkl> or --synthetic N")
        from ..data.pipeline import NuScenesForecastDataset, \
            batches_from_dataset
        import jax as _jax

        # GT-AUG paste sampler (ref Preprocess builds it whenever the config
        # carries a db_sampler dict, preprocess.py:103-106; groups from
        # cfg.data.sample_groups mirror configs n3dtf:110-123)
        db_sampler = None
        if not args.no_gt_aug:
            from ..data.gt_database import build_db_sampler
            db_sampler = build_db_sampler(cfg, args.info_path,
                                          db_info_path=args.db_info_path,
                                          seed=args.seed)
            if db_sampler is not None:
                logging.info("GT-AUG enabled (groups %s)",
                             dict(cfg.data.sample_groups))
            else:
                logging.warning("GT-AUG disabled: no dbinfos next to %s",
                                args.info_path)

        ds = NuScenesForecastDataset(cfg, args.info_path, train=True,
                                     seed=args.seed, db_sampler=db_sampler)
        # multi-host: each process reads its own dataset shard (replaces
        # the reference's DistributedGroupSampler, loader/sampler.py)
        batches = ({k: v for k, v in b.items() if k not in ("gt", "tokens")}
                   for b in batches_from_dataset(
                       ds, cfg, batch_size, seed=args.seed,
                       num_shards=_jax.process_count(),
                       shard_id=_jax.process_index()))
        steps_per_epoch = max(
            len(ds) // (batch_size * _jax.process_count()), 1)

    val_fn = None
    if args.val_synthetic:
        # per-epoch validation (ref Trainer.val + workflow [('train',1),
        # ('val',1)]): device inference + linking + joint metrics on a
        # fixed synthetic val split
        import jax as _jax
        from ..data.synthetic import make_batch
        from ..eval.decode import decode_and_nms
        from ..eval.evaluator import evaluate_detections
        from ..train.step import make_eval_forward

        vb = make_batch(cfg, max(args.val_synthetic, 1), seed=10_000,
                        clutter_mode="lidar")
        vgt = vb.pop("gt")
        # the jitted forward only reads these keys — don't ship targets
        vin = {k: v for k, v in vb.items()
               if k in ("points", "points_valid", "bev_map")}
        vfwd = make_eval_forward(cfg)
        h = cfg.model.head
        multitask = h.standard and len(h.tasks) > 1
        vtokens = [f"v{i}" for i in range(vin["points"].shape[0])]

        def val_fn(state):
            import numpy as _np
            out = vfwd(state.params, state.batch_stats, vin)
            if cfg.model.two_stage_refine:
                from ..models.two_stage import refined_detections
                det = _jax.device_get(refined_detections(out[1], out[2]))
            else:
                det = _jax.device_get(decode_and_nms(cfg, out))
            if multitask:
                # class-labeled detection metrics (no forecast linking)
                from ..eval.evaluator import evaluate_detections_multitask
                res = evaluate_detections_multitask(cfg, det, vgt, vtokens)
            else:
                res = evaluate_detections(
                    cfg, det, vgt, vtokens,
                    forecast_mode="velocity_constant"
                    if h.standard else "velocity_dense",
                    classname=cfg.data.class_names[0])
            return {"mAP": round(float(_np.mean(
                        list(res.mean_dist_aps.values()))), 4),
                    "mFAP": round(float(_np.mean(
                        list(res.mean_dist_faps.values()))), 4)}

    init_transform = None
    if args.first_stage_checkpoint:
        if not cfg.model.two_stage_refine:
            raise SystemExit("--first_stage_checkpoint requires a "
                             "*_two_stage config")

        def init_transform(state):
            import jax as _jax
            from ..data.synthetic import make_batch as _mb
            from ..models.two_stage import adopt_first_stage
            from ..train.checkpoints import CheckpointManager
            from ..train.step import init_state as _init
            single = get_config(args.model.removesuffix("_two_stage"))
            if args.tiny:
                from ..config import tiny_variant as _tv
                single = _tv(single)
            b = _mb(single, 1, seed=0)
            st = _init(single, _jax.random.PRNGKey(0),
                       {k: v for k, v in b.items()
                        if k in ("points", "points_valid", "bev_map",
                                 "targets")}, total_steps=1)
            st = CheckpointManager(args.first_stage_checkpoint).restore(
                _jax.device_get(st))
            logging.info("grafted first-stage checkpoint step %d from %s",
                         int(st.step), args.first_stage_checkpoint)
            return state._replace(
                params=adopt_first_stage(state.params, st.params),
                batch_stats=adopt_first_stage(state.batch_stats,
                                              st.batch_stats))

    hooks = []
    if args.tensorboard:
        from ..train.trainer import TensorBoardHook
        hooks.append(TensorBoardHook(
            os.path.join(work_dir, "tb"),
            interval=cfg.train.log_interval))
    if args.profile:
        from ..utils.profiling import trace
        with trace(args.profile):
            state = train(cfg, batches, steps_per_epoch=steps_per_epoch,
                          work_dir=work_dir, n_space=args.space,
                          val_fn=val_fn, resume=args.resume_from,
                          hooks=hooks, init_transform=init_transform)
    else:
        state = train(cfg, batches, steps_per_epoch=steps_per_epoch,
                      work_dir=work_dir, n_space=args.space,
                      val_fn=val_fn, resume=args.resume_from, hooks=hooks,
                      init_transform=init_transform)
    logging.info("training done at step %d; checkpoints in %s",
                 int(state.step), work_dir)
    return state


if __name__ == "__main__":
    main()
