"""The jitted data-parallel train/eval step.

Replaces the reference trainer's hot loop (ref
`det3d/torchie/trainer/trainer.py:406-463` + `DistOptimizerHook`
`det3d/core/utils/dist_utils.py:44-57`): one `shard_map`-wrapped function over
the `data` mesh axis doing forward, loss, backward, gradient `pmean`, clip and
AdamW update — all fused by XLA, gradients riding ICI collectives. SyncBN
(the reference's APEX conversion) falls out of passing `axis_name="data"` to
the BatchNorms.

Optimizer parity (ref configs n3dtf:231-238 + solver/fastai_optim.py): AdamW
with true (fixed) weight decay 0.01, one-cycle lr/momentum, grad-clip 35.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ExperimentConfig
from ..models.detector import build_detector
from ..models.losses import center_head_loss
from ..parallel.mesh import DATA_AXIS, SPACE_AXIS, canvas_sharding
from .schedule import one_cycle_lr, one_cycle_momentum


class TrainState(NamedTuple):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def _get_targets(cfg: ExperimentConfig, batch):
    """Pre-built targets if the batch carries them, else rasterize ON-DEVICE
    from the raw GT arrays (batch["targets_raw"], the default pipeline
    layout) — the assignment runs inside the jitted step, fused with the
    forward/backward, instead of as per-sample host dispatches."""
    if "targets" in batch:
        return batch["targets"]
    from ..data.targets import build_targets_batch
    return build_targets_batch(cfg, batch["targets_raw"])


def make_optimizer(cfg: ExperimentConfig, total_steps: int, params=None):
    o = cfg.train.optim
    lr = functools.partial(one_cycle_lr, total_steps=total_steps,
                           lr_max=o.lr_max, div_factor=o.div_factor,
                           pct_start=o.pct_start)
    b1 = functools.partial(one_cycle_momentum, total_steps=total_steps,
                           moms=o.moms, pct_start=o.pct_start)
    tx = optax.chain(
        optax.clip_by_global_norm(o.grad_clip_norm),
        optax.inject_hyperparams(
            lambda learning_rate, b1: optax.adamw(
                learning_rate, b1=b1, weight_decay=o.weight_decay)
        )(learning_rate=lr, b1=b1),
    )
    if cfg.model.head.two_stage and params is not None:
        # TWO_STAGE fine-tuning: freeze everything but vel/rot branches
        # (ref apis/train.py:353-356). NOTE optax.masked would pass the
        # un-masked params' RAW gradients through as updates (lr-1 SGD on
        # the "frozen" backbone!) — multi_transform + set_to_zero actually
        # freezes them.
        from ..models.two_stage import two_stage_trainable_mask
        labels = jax.tree.map(
            lambda m: "train" if m else "freeze",
            two_stage_trainable_mask(params))
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


def init_state(cfg: ExperimentConfig, rng, batch, total_steps: int,
               axis_name: Optional[str] = None) -> TrainState:
    model = build_detector(cfg, axis_name=None)  # init never crosses devices
    variables = jax.jit(
        functools.partial(model.init, train=True)
    )(rng, batch["points"], batch["points_valid"],
      bev_map=batch.get("bev_map"))
    tx = make_optimizer(cfg, total_steps, variables["params"])
    opt_state = tx.init(variables["params"])
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"],
                      batch_stats=variables["batch_stats"],
                      opt_state=opt_state)


def make_train_step(cfg: ExperimentConfig, mesh: Mesh, total_steps: int):
    """Returns a jitted step fn: (state, batch) -> (state, metrics).

    batch pytree leaves lead with the global batch dim, sharded over `data`;
    state is replicated. The body runs under shard_map so BatchNorm and
    gradient reductions use explicit `data`-axis collectives.

    Single-device meshes skip shard_map entirely (collectives are identities
    and the shard_map wrapper costs ~170x on the tunneled TPU backend).

    Meshes with a `space` axis take the GSPMD path instead: the step is
    written with global semantics (no explicit collectives), the batch is
    sharded over `data`, the BEV canvas over (`data`, `space`), and XLA's
    SPMD partitioner inserts the gradient all-reduces, global BN-stat
    reductions, and conv halo exchanges.
    """
    if SPACE_AXIS in mesh.axis_names and mesh.shape[SPACE_AXIS] > 1:
        return _make_train_step_gspmd(cfg, mesh, total_steps)
    single = mesh.devices.size == 1
    model = build_detector(cfg, axis_name=None if single else DATA_AXIS)
    tx = None  # built lazily with params for the two_stage freeze mask

    def local_step(state: TrainState, batch):
        def loss_fn(params):
            targets = _get_targets(cfg, batch)
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"], batch["points_valid"],
                bev_map=batch.get("bev_map"), train=True,
                mutable=["batch_stats"])
            if cfg.model.two_stage_refine:
                # ref combine_loss (two_stage.py:40-46): one-stage loss +
                # RoI loss on decoded proposals
                from ..models.two_stage import two_stage_loss
                preds, det, roi = out
                losses = center_head_loss(cfg.model.head, preds, targets)
                rl = two_stage_loss(
                    roi["logits"], roi["resid"], det.boxes,
                    targets["gt_boxes"], targets["gt_valid"], det.valid)
                losses = dict(losses, roi_cls_loss=rl["roi_cls_loss"],
                              roi_reg_loss=rl["roi_reg_loss"],
                              loss=losses["loss"] + rl["loss"])
            else:
                losses = center_head_loss(cfg.model.head, out, targets)
            return losses["loss"], (losses, mut["batch_stats"])

        tx = make_optimizer(cfg, total_steps, state.params)
        (loss, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        if not single:
            grads = jax.lax.pmean(grads, DATA_AXIS)
            loss = jax.lax.pmean(loss, DATA_AXIS)
        # batch_stats were already pmean'ed inside BN (axis_name), but the
        # running-average update happens per-shard on identical values, so a
        # plain carry-through is consistent across devices.
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss,
                   "hm_loss": losses["hm_loss"] if single
                   else jax.lax.pmean(losses["hm_loss"], DATA_AXIS),
                   "loc_loss": losses["loc_loss"] if single
                   else jax.lax.pmean(losses["loc_loss"], DATA_AXIS),
                   "grad_norm": optax.global_norm(grads)}
        for k in ("roi_cls_loss", "roi_reg_loss"):
            if k in losses:
                metrics[k] = losses[k] if single \
                    else jax.lax.pmean(losses[k], DATA_AXIS)
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_bs, opt_state=new_opt), metrics

    if single:
        return jax.jit(local_step, donate_argnums=(0,))

    state_spec = P()   # replicated
    batch_spec = P(DATA_AXIS)

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(state_spec, batch_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False)

    return jax.jit(sharded, donate_argnums=(0,))


def _make_train_step_gspmd(cfg: ExperimentConfig, mesh: Mesh,
                           total_steps: int):
    """Spatially-sharded train step: jit + sharding constraints, XLA SPMD
    does the rest (batch over `data`, BEV rows over `space`, halo exchanges
    for the convs, all-reduced grads and BN stats)."""
    from jax.sharding import NamedSharding

    model = build_detector(cfg, axis_name=None,
                           canvas_sharding=canvas_sharding(mesh))

    def step(state: TrainState, batch):
        def loss_fn(params):
            targets = _get_targets(cfg, batch)
            out, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["points"], batch["points_valid"],
                bev_map=batch.get("bev_map"), train=True,
                mutable=["batch_stats"])
            preds = out[0] if cfg.model.two_stage_refine else out
            # per-sample loss normalization, then batch mean: identical
            # objective to the shard_map dp path / the reference's DDP with
            # bs=1 per GPU (loss mask counts never cross samples)
            loss_targets = {k: v for k, v in targets.items()
                            if k not in ("gt_boxes", "gt_valid")} \
                if cfg.model.two_stage_refine else targets
            losses = jax.vmap(
                lambda pr, tg: center_head_loss(
                    cfg.model.head,
                    jax.tree.map(lambda x: x[None], pr),
                    jax.tree.map(lambda x: x[None], tg)))(
                preds, loss_targets)
            losses = jax.tree.map(lambda x: jnp.mean(x, axis=0), losses)
            if cfg.model.two_stage_refine:
                from ..models.two_stage import two_stage_loss
                _, det, roi = out
                rl = two_stage_loss(
                    roi["logits"], roi["resid"], det.boxes,
                    targets["gt_boxes"], targets["gt_valid"], det.valid)
                losses = dict(losses, roi_cls_loss=rl["roi_cls_loss"],
                              roi_reg_loss=rl["roi_reg_loss"],
                              loss=losses["loss"] + rl["loss"])
            return losses["loss"], (losses, mut["batch_stats"])

        tx = make_optimizer(cfg, total_steps, state.params)
        (loss, (losses, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, "hm_loss": losses["hm_loss"],
                   "loc_loss": losses["loc_loss"],
                   "grad_norm": optax.global_norm(grads)}
        for k in ("roi_cls_loss", "roi_reg_loss"):
            if k in losses:
                metrics[k] = losses[k]
        return TrainState(step=state.step + 1, params=new_params,
                          batch_stats=new_bs, opt_state=new_opt), metrics

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(step, donate_argnums=(0,),
                   in_shardings=(repl, data),
                   out_shardings=(repl, repl))


def make_eval_forward(cfg: ExperimentConfig, mesh: Optional[Mesh] = None):
    """Jitted inference forward: (state, batch) -> head prediction dicts.

    With a space-axis mesh the BEV tower runs spatially sharded (GSPMD) and
    the head outputs come back replicated."""
    spatial = (mesh is not None and SPACE_AXIS in mesh.axis_names
               and mesh.shape[SPACE_AXIS] > 1)
    model = build_detector(
        cfg, axis_name=None,
        canvas_sharding=canvas_sharding(mesh) if spatial else None)

    def fwd(params, batch_stats, batch):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           batch["points"], batch["points_valid"],
                           bev_map=batch.get("bev_map"), train=False)

    if spatial:
        from jax.sharding import NamedSharding
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(DATA_AXIS))
        return jax.jit(fwd, in_shardings=(repl, repl, data),
                       out_shardings=repl)
    return jax.jit(fwd)
