"""Per-stage cumulative cost of the REAL sparse middle encoder via
capture_intermediates + XLA DCE (same method as probe_detector_cuts.py,
finer cuts): jit a function returning only the named submodule's output so
everything downstream dead-codes away.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_middle_cuts.py
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
    from futuredet_tpu.models.detector import build_detector

    cfg = get_config(os.environ.get("BENCH_MODEL", "forecast_n3dtf"))
    cfg = cfg.replace(voxel=dataclasses.replace(
        cfg.voxel, max_points=150000, max_voxels_eval=30000))
    P = cfg.voxel.max_points
    rng = np.random.default_rng(0)
    # MIDDLE_SCENE=uniform|blob|lidar (default lidar = the realistic
    # bench scene; blob = the round-5 capacity-safe uniform scene)
    scene = os.environ.get("MIDDLE_SCENE", "lidar")
    import bench
    if scene == "uniform":
        pts, valid = bench._uniform_points(cfg, 1, rng)
    elif scene == "blob":
        pts, valid = bench._uniform_blob_points(cfg, 1, rng)
    else:
        pts, valid = bench._realistic_points(cfg, 1)
    pts_j = jnp.asarray(pts)
    valid_j = jnp.asarray(valid)

    model = build_detector(cfg)
    variables = jax.jit(
        lambda r: model.init(r, pts_j, valid_j, train=False))(
        jax.random.PRNGKey(0))
    variables = {"params": variables["params"],
                 "batch_stats": variables.get("batch_stats", {})}

    # cut after each middle-encoder submodule (module NAME match);
    # MIDDLE_CUTS=res0_1,down1 selects a subset (each cut is a separate
    # ~40 s XLA compile — split across invocations, the persistent cache
    # makes re-runs instant)
    cuts = ["reader", "conv_input", "res0_1",
            "down1", "res1_1", "down2", "res2_1", "down3", "res3_1",
            "middle"]
    if os.environ.get("MIDDLE_CUTS"):
        cuts = os.environ["MIDDLE_CUTS"].split(",")

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
        print(f"fwd up to {cut:10s}: {t:6.2f} ms  (+{t - prev:5.2f})",
              flush=True)
        prev = t


if __name__ == "__main__":
    main()
