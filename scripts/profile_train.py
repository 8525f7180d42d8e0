"""Training-step throughput on the real TPU (single chip, B=1).

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train.py
    BENCH_MODEL=forecast_n3dtf ... python scripts/profile_train.py

Chains `iters` full train steps on device (state carried through the
loop, so each step's gradients feed the next step's params — nothing
folds away) and reports ms/step and train sweeps/s (20 sweeps/sample).
"""
from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from _timing import enable_compilation_cache
    enable_compilation_cache()

    from futuredet_tpu.config import get_config
    from futuredet_tpu.data.synthetic import make_batch
    from futuredet_tpu.parallel.mesh import make_mesh
    from futuredet_tpu.train.step import init_state, make_train_step

    model_name = os.environ.get("BENCH_MODEL", "pp_forecast_n3dtf")
    iters = int(os.environ.get("BENCH_ITERS", "50"))
    B = int(os.environ.get("BENCH_BATCH", "1"))
    cfg = get_config(model_name)

    mesh = make_mesh(1)
    batch = make_batch(cfg, B, seed=0)
    batch = jax.tree.map(jnp.asarray, batch)
    state = init_state(cfg, jax.random.PRNGKey(0), batch, total_steps=1000)
    step = make_train_step(cfg, mesh, total_steps=1000)

    @jax.jit
    def chain(state, batch):
        def body(i, carry):
            st, acc = carry
            st, metrics = step(st, batch)
            return (st, acc + metrics["loss"])
        return jax.lax.fori_loop(0, iters, body, (state, jnp.float32(0)))

    st, loss = chain(state, batch)                     # compile
    _ = jax.device_get(loss)
    t0 = time.perf_counter()
    st, loss = chain(state, batch)
    _ = jax.device_get(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f"{model_name} B={B}: {dt * 1e3:.1f} ms/step = "
          f"{B / dt * 20:.0f} train sweeps/s "
          f"(loss {float(jax.device_get(loss)) / iters:.3f})")


if __name__ == "__main__":
    main()
