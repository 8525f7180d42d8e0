"""Stage breakdown of the voxelnet (forecast_n3dtf) inference path on TPU.

Usage (real TPU, from repo root):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_e2e.py

Times four nested prefixes with on-device chaining (see profile_middle.py
for why: block_until_ready does not sync on the tunneled backend):
  vox            = voxelize_mean
  vox+mid        = + sparse middle encoder (standalone init, same geometry)
  forward        = full model.apply (adds z_crush + RPN + 7 heads)
  e2e            = + decode_and_nms
and prints the per-stage deltas. Geometry matches bench.py
(max_points=150000, max_voxels_eval=30000).
"""
from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _time_chain(fn, iters=50):
    """Shared harness (scripts/_timing.py); iters=50 leaves ~0.8 ms of the
    tunnel's fixed per-call cost per iteration — fine at these stage
    sizes."""
    from _timing import chain_tok_ms

    return chain_tok_ms(fn, iters=iters)


def main():
    import jax
    import jax.numpy as jnp

    from _timing import enable_compilation_cache
    enable_compilation_cache()

    from futuredet_tpu.config import get_config
    from futuredet_tpu.eval.decode import decode_and_nms
    from futuredet_tpu.models.detector import build_detector
    from futuredet_tpu.models.middle import SparseMiddleEncoder
    from futuredet_tpu.ops.voxelize import voxelize_mean

    model_name = os.environ.get("BENCH_MODEL", "forecast_n3dtf")
    cfg = get_config(model_name)
    cfg = cfg.replace(voxel=dataclasses.replace(
        cfg.voxel, max_points=150000, max_voxels_eval=30000))
    mupd = {}
    if os.environ.get("BENCH_GATHER"):
        mupd["middle_gather_algo"] = os.environ["BENCH_GATHER"]
    if os.environ.get("BENCH_DENSE_FROM"):
        mupd["middle_dense_from_stage"] = int(os.environ["BENCH_DENSE_FROM"])
    if os.environ.get("BENCH_DENSE_DTYPE"):
        mupd["middle_dense_dtype"] = os.environ["BENCH_DENSE_DTYPE"]
    if mupd:
        cfg = cfg.replace(model=dataclasses.replace(cfg.model, **mupd))
    model = build_detector(cfg)

    rng = np.random.default_rng(0)
    P = cfg.voxel.max_points
    lo, hi = cfg.voxel.pc_range[0], cfg.voxel.pc_range[3]
    pts = np.concatenate([
        rng.uniform(lo, hi, (1, P, 2)), rng.uniform(-4, 2, (1, P, 1)),
        rng.uniform(0, 1, (1, P, 2))], -1).astype(np.float32)
    pts = jnp.asarray(pts)
    valid = jnp.asarray(np.ones((1, P), bool))

    variables = jax.jit(lambda r: model.init(r, pts, valid, train=False))(
        jax.random.PRNGKey(0))

    gx, gy, gz = cfg.voxel.grid_size
    max_v = cfg.voxel.max_voxels_eval
    pc_range = jnp.asarray(cfg.voxel.pc_range)
    vsize = jnp.asarray(cfg.voxel.voxel_size)

    def vox(p):
        return voxelize_mean(p, valid[0], pc_range, vsize,
                             grid_size=cfg.voxel.grid_size, max_voxels=max_v,
                             max_points=cfg.voxel.max_points_per_voxel)

    t_vox = _time_chain(
        lambda tok: jnp.sum(vox(pts[0] + tok)[0]) * 1e-12)
    print(f"voxelize            {t_vox:8.1f} ms")

    if cfg.model.detector != "pointpillars" and cfg.model.middle == "sparse":
        feats, coords, num_points, _ = jax.jit(vox)(pts[0])
        vvalid = coords[:, 0] >= 0
        enc = SparseMiddleEncoder(
            channels=cfg.model.middle_channels,
            # mirror the detector's capacity clamp
            vmax=tuple(min(v, max_v) for v in cfg.model.middle_vmax),
            grid_zyx=(gz + 1, gy, gx),
            dense_from_stage=cfg.model.middle_dense_from_stage,
            dense_dtype=(jnp.bfloat16
                         if cfg.model.middle_dense_dtype == "bfloat16"
                         else None),
            gather_algo=cfg.model.middle_gather_algo)
        evars = jax.jit(enc.init)(jax.random.PRNGKey(0), feats, coords,
                                  vvalid)
        t_mid = _time_chain(
            lambda tok: jnp.sum(enc.apply(evars, feats + tok, coords,
                                          vvalid)) * 1e-12)
        print(f"middle encoder      {t_mid:8.1f} ms")
    else:
        t_mid = 0.0

    def fwd(tok):
        preds = model.apply(variables, pts + tok, valid, train=False)
        return sum(jnp.sum(p["hm"]) for p in preds) * 1e-12

    t_fwd = _time_chain(fwd)
    print(f"forward (v+m+rpn+h) {t_fwd:8.1f} ms   "
          f"[rpn+heads ~= {t_fwd - t_vox - t_mid:.1f}]")

    def e2e(tok):
        preds = model.apply(variables, pts + tok, valid, train=False)
        det = decode_and_nms(cfg, preds)
        return jnp.sum(det.scores) * 1e-12

    t_e2e = _time_chain(e2e)
    print(f"e2e (+decode/nms)   {t_e2e:8.1f} ms   "
          f"[decode+nms ~= {t_e2e - t_fwd:.1f}]")


if __name__ == "__main__":
    main()
