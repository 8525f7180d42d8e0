"""FLOPs / cost accounting.

Replaces the reference's hand-rolled per-module FLOPs counter
(`det3d/utils/flops_counter.py`, 446 LoC) with XLA's own cost model: the
compiled executable reports exact flops/bytes for the whole fused program —
including the voxelizer and decode, which the reference counter cannot see.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax


def cost_analysis(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compile fn(*args) and return XLA's cost analysis (flops, bytes...)."""
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):  # older jax returns one dict per computation
        costs = costs[0]
    return dict(costs or {})


def model_flops(cfg, batch_size: int = 1) -> Dict[str, float]:
    """Forward-pass cost of a config's detector on synthetic-shaped inputs."""
    import jax.numpy as jnp
    import numpy as np

    from ..models.detector import build_detector

    model = build_detector(cfg)
    P = cfg.voxel.max_points
    pts = jnp.zeros((batch_size, P, 5), jnp.float32)
    valid = jnp.ones((batch_size, P), bool)
    variables = model.init(jax.random.PRNGKey(0), pts, valid, train=False)
    out = cost_analysis(
        lambda v, p, m: model.apply(v, p, m, train=False), variables, pts,
        valid)
    return {"flops": out.get("flops", 0.0),
            "bytes_accessed": out.get("bytes accessed", 0.0)}
