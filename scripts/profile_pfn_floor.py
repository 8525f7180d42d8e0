"""Isolate the PFN pad-floor cost: time the PillarFeatureNet forward at
bench geometry with pad_floor_cap on vs off, same inputs, same process."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.config import get_config
    from futuredet_tpu.models.readers import PillarFeatureNetDirect

    cfg = get_config("pp_forecast_n3dtf")
    P = 150000
    rng = np.random.default_rng(0)
    lo, hi = cfg.voxel.pc_range[0], cfg.voxel.pc_range[3]
    pts = np.concatenate([
        rng.uniform(lo, hi, (1, P, 2)), rng.uniform(-4, 2, (1, P, 1)),
        rng.uniform(0, 1, (1, P, 2))], -1).astype(np.float32)
    pts_j = jnp.asarray(pts)
    valid = jnp.ones((1, P), bool)
    gx, gy, _ = cfg.voxel.grid_size

    for cap in (0, cfg.voxel.max_points_per_voxel):
        pfn = PillarFeatureNetDirect(
            num_filters=tuple(cfg.model.pillar_filters),
            voxel_size=tuple(cfg.voxel.voxel_size[:2]),
            pc_range=tuple(cfg.voxel.pc_range),
            grid_hw=(gy, gx), pad_floor_cap=cap)
        vs = jax.jit(lambda r: pfn.init(r, pts_j, valid, train=False))(
            jax.random.PRNGKey(0))
        ms = chain_ms(
            lambda x: pfn.apply(vs, x, valid, train=False), pts_j, iters=100)
        print(f"pad_floor_cap={cap}: {ms:.3f} ms")


if __name__ == "__main__":
    main()
