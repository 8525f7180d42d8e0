"""Batched serving throughput + achieved-TFLOP/s / GB/s table (VERDICT r3 #4).

For each config x batch size: per-sample latency via the bench chain
(uniform scene), plus XLA cost-analysis flops/bytes of one forward+decode,
giving achieved TFLOP/s and HBM GB/s against the calibrated peaks
(123 TF/s bf16, ~313 GB/s stream — scripts/calibrate.py).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_batch_mfu.py
  MFU_MODELS=forecast_n3dtf MFU_BATCHES=1,2 python scripts/profile_batch_mfu.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_REALISTIC", "0")

PEAK_TFLOPS_BF16 = 123.0
PEAK_GBS = 313.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from futuredet_tpu.eval.decode import decode_and_nms
    from futuredet_tpu.models.detector import build_detector
    from futuredet_tpu.utils.flops import cost_analysis

    bench._enable_compilation_cache()
    models = os.environ.get(
        "MFU_MODELS", "pp_forecast_n3dtf,forecast_n3dtf").split(",")
    batches = [int(b) for b in os.environ.get(
        "MFU_BATCHES", "1,2,4,8").split(",")]
    iters = int(os.environ.get("BENCH_ITERS", "100"))

    print(f"{'model':>20s} {'B':>2s} {'ms/sample':>9s} {'sweeps/s':>8s} "
          f"{'TFLOP/s':>7s} {'%peak':>5s} {'GB/s':>6s} {'%bw':>4s}",
          flush=True)
    for name in models:
        for B in batches:
            res = bench.measure_model(name, iters, B)
            sweeps = res["uniform"]
            ms = B / (sweeps / bench.NSWEEPS) * 1e3 / B  # per-sample ms

            cfg = bench._bench_config(name)
            model = build_detector(cfg)
            rng = np.random.default_rng(0)
            # same scene family measure_model times (sparse configs use the
            # capacity-safe blobbed uniform scene since round 5)
            sparse = (cfg.model.detector == "voxelnet"
                      and cfg.model.middle == "sparse")
            upts, uvalid = (bench._uniform_blob_points if sparse
                            else bench._uniform_points)(cfg, B, rng)
            pts, valid = jnp.asarray(upts), jnp.asarray(uvalid)
            variables = jax.jit(
                lambda r: model.init(r, pts, valid, train=False))(
                jax.random.PRNGKey(0))
            costs = cost_analysis(
                lambda v, p, m: decode_and_nms(
                    cfg, model.apply(v, p, m, train=False)).scores,
                variables, pts, valid)
            flops = costs.get("flops", 0.0) / B
            bytes_ = costs.get("bytes accessed", 0.0) / B
            tfs = flops / (ms * 1e-3) / 1e12
            gbs = bytes_ / (ms * 1e-3) / 1e9
            print(f"{name:>20s} {B:2d} {ms:9.2f} {sweeps:8.1f} "
                  f"{tfs:7.2f} {100 * tfs / PEAK_TFLOPS_BF16:4.1f}% "
                  f"{gbs:6.1f} {100 * gbs / PEAK_GBS:3.0f}%", flush=True)


if __name__ == "__main__":
    main()
