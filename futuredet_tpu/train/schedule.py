"""One-cycle LR + momentum schedule (optax-compatible, jittable).

Behavioral port of `OneCycle` in
`/root/reference/det3d/solver/learning_schedules_fastai.py:70-97`:
  phase 1 (pct_start): cosine anneal  lr_max/div -> lr_max,  mom0 -> mom1
  phase 2:             cosine anneal  lr_max -> (lr_max/div)/1e4, mom1 -> mom0
"""
from __future__ import annotations

import jax.numpy as jnp


def annealing_cos(start, end, pct):
    cos_out = jnp.cos(jnp.pi * pct) + 1.0
    return end + (start - end) / 2.0 * cos_out


def one_cycle_lr(step, *, total_steps: int, lr_max: float, div_factor: float,
                 pct_start: float):
    a1 = int(total_steps * pct_start)
    low = lr_max / div_factor
    p1 = jnp.clip(step / max(a1, 1), 0.0, None)
    p2 = (step - a1) / max(total_steps - a1, 1)
    lr_warm = annealing_cos(low, lr_max, p1)
    lr_anneal = annealing_cos(lr_max, low / 1e4, p2)
    return jnp.where(step < a1, lr_warm, lr_anneal)


def one_cycle_momentum(step, *, total_steps: int, moms, pct_start: float):
    a1 = int(total_steps * pct_start)
    p1 = jnp.clip(step / max(a1, 1), 0.0, None)
    p2 = (step - a1) / max(total_steps - a1, 1)
    m_warm = annealing_cos(moms[0], moms[1], p1)
    m_anneal = annealing_cos(moms[1], moms[0], p2)
    return jnp.where(step < a1, m_warm, m_anneal)
