"""Cumulative cost of the REAL VoxelNet detector forward at each cut point,
via capture_intermediates + XLA DCE: jit a function returning only the
captured intermediate at cut X, so everything downstream is dead-coded.
This avoids the replication drift that made profile_e2e_parts' "rpn+head
~8.8 ms" disagree with the composed-tail probe's 1.89 ms.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_detector_cuts.py
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _tree_sum(x):
    import jax
    import jax.numpy as jnp
    return sum(jnp.sum(v.astype(jnp.float32))
               for v in jax.tree_util.tree_leaves(x)
               if hasattr(v, "astype"))


def main():
    import jax
    import jax.numpy as jnp

    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.config import get_config
    from futuredet_tpu.eval.decode import decode_and_nms
    from futuredet_tpu.models.detector import build_detector

    cfg = get_config(os.environ.get("BENCH_MODEL", "forecast_n3dtf"))
    cfg = cfg.replace(voxel=dataclasses.replace(
        cfg.voxel, max_points=150000, max_voxels_eval=30000))
    P = cfg.voxel.max_points
    rng = np.random.default_rng(0)
    lo, hi = cfg.voxel.pc_range[0], cfg.voxel.pc_range[3]
    pts = np.concatenate([
        rng.uniform(lo, hi, (1, P, 2)), rng.uniform(-4, 2, (1, P, 1)),
        rng.uniform(0, 1, (1, P, 2))], -1).astype(np.float32)
    pts_j = jnp.asarray(pts)
    valid_j = jnp.ones((1, P), bool)

    model = build_detector(cfg)
    variables = jax.jit(
        lambda r: model.init(r, pts_j, valid_j, train=False))(
        jax.random.PRNGKey(0))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    cuts = ["middle", "z_crush", "neck", "head"]

    def upto(cut):
        def fn(p):
            _, inter = model.apply(
                variables, p, valid_j, train=False,
                capture_intermediates=lambda mdl, _m: mdl.name == cut,
                mutable=["intermediates"])
            return _tree_sum(inter)
        return fn

    prev = 0.0
    for cut in cuts:
        t = chain_ms(upto(cut), pts_j, iters=50)
        print(f"fwd up to {cut:8s}: {t:6.2f} ms  (+{t - prev:5.2f})",
              flush=True)
        prev = t

    t_full = chain_ms(
        lambda p: _tree_sum(model.apply(variables, p, valid_j, train=False)),
        pts_j, iters=50)
    print(f"full fwd          : {t_full:6.2f} ms  (+{t_full - prev:5.2f})",
          flush=True)

    t_dec = chain_ms(
        lambda p: decode_and_nms(
            cfg, model.apply(variables, p, valid_j, train=False)).scores,
        pts_j, iters=50)
    print(f"fwd + decode+NMS  : {t_dec:6.2f} ms  (+{t_dec - t_full:5.2f})",
          flush=True)


if __name__ == "__main__":
    main()
