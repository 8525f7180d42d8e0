"""Decompose the voxelnet e2e budget: voxelize | middle encoder | RPN+heads
| decode+NMS, each timed as its own on-device chain at bench geometry."""
import dataclasses, os, sys
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

def _detector_caps(model_cfg, max_v):
    from futuredet_tpu.models.detector import middle_stage_caps
    return list(middle_stage_caps(model_cfg, max_v))

def main():
    import jax, jax.numpy as jnp
    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.config import get_config
    from futuredet_tpu.eval.decode import decode_and_nms
    from futuredet_tpu.models.detector import build_detector
    from futuredet_tpu.models.middle import SparseMiddleEncoder
    from futuredet_tpu.ops.voxelize import voxelize_mean

    cfg = get_config("forecast_n3dtf")
    cfg = cfg.replace(voxel=dataclasses.replace(
        cfg.voxel, max_points=150000, max_voxels_eval=30000))
    if os.environ.get("BENCH_GATHER"):
        cfg = cfg.replace(model=dataclasses.replace(
            cfg.model, middle_gather_algo=os.environ["BENCH_GATHER"],
            middle_xpack_max_cin=int(os.environ.get("BENCH_XPACK_CIN", "32"))))
    P = cfg.voxel.max_points
    rng = np.random.default_rng(0)
    lo, hi = cfg.voxel.pc_range[0], cfg.voxel.pc_range[3]
    pts = np.concatenate([
        rng.uniform(lo, hi, (1, P, 2)), rng.uniform(-4, 2, (1, P, 1)),
        rng.uniform(0, 1, (1, P, 2))], -1).astype(np.float32)
    pts_j = jnp.asarray(pts); valid_j = jnp.ones((1, P), bool)
    gx, gy, gz = cfg.voxel.grid_size
    max_v = cfg.voxel.max_voxels_eval

    def vox(p):
        f, c, n, _ = voxelize_mean(
            p[0], valid_j[0], jnp.asarray(cfg.voxel.pc_range),
            jnp.asarray(cfg.voxel.voxel_size), grid_size=cfg.voxel.grid_size,
            max_voxels=max_v, max_points=cfg.voxel.max_points_per_voxel)
        return f + c[:, :1].astype(jnp.float32)
    t_vox = chain_ms(lambda p: vox(p), pts_j, iters=50)
    print(f"voxelize {t_vox:6.2f}", flush=True)

    f, c, n, _ = jax.jit(lambda p, v: voxelize_mean(
        p, v, jnp.asarray(cfg.voxel.pc_range),
        jnp.asarray(cfg.voxel.voxel_size), grid_size=cfg.voxel.grid_size,
        max_voxels=max_v,
        max_points=cfg.voxel.max_points_per_voxel))(pts_j[0], valid_j[0])
    vvalid = c[:, 0] >= 0
    enc = SparseMiddleEncoder(
        channels=cfg.model.middle_channels,
        # mirror the detector's generative-downsample cap rule
        # (detector.py: min(budget, 8*prev), prev0 = voxelizer cap)
        vmax=tuple(_detector_caps(cfg.model, max_v)),
        grid_zyx=(gz + 1, gy, gx),
        gather_algo=cfg.model.middle_gather_algo,
        xpack_max_cin=cfg.model.middle_xpack_max_cin)
    vars_enc = jax.jit(lambda r, x: enc.init(r, x, c, vvalid, False))(
        jax.random.PRNGKey(0), f)
    def mid(x):
        bev, zmask = enc.apply(vars_enc, x, c, vvalid, False)
        return bev + zmask.any(-1, keepdims=True)
    t_mid = chain_ms(mid, f, iters=50)
    print(f"middle   {t_mid:6.2f}", flush=True)

    model = build_detector(cfg)
    variables = jax.jit(lambda r: model.init(r, pts_j, valid_j,
                                             train=False))(
        jax.random.PRNGKey(0))
    # consume EVERY head output: returning only hm lets XLA dead-code
    # eliminate the other five branch towers per task (an earlier version
    # did exactly that and under-measured heads by ~2x)
    t_fwd = chain_ms(
        lambda p: sum(jnp.sum(v) for pd in model.apply(
            variables, p, valid_j, train=False) for v in pd.values()),
        pts_j, iters=50)
    print(f"fwd      {t_fwd:6.2f}", flush=True)

    def full(p):
        det = decode_and_nms(cfg, model.apply(variables, p, valid_j,
                                              train=False))
        return det.scores
    t_full = chain_ms(full, pts_j, iters=50)
    print(f"voxelize {t_vox:6.2f}  middle {t_mid:6.2f}  "
          f"fwd(total) {t_fwd:6.2f}  +decodeNMS {t_full:6.2f}  "
          f"=> rpn+head ~{t_fwd - t_vox - t_mid:5.2f}  "
          f"decode ~{t_full - t_fwd:5.2f}", flush=True)

if __name__ == "__main__":
    main()
