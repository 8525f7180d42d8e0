"""Row-gather cost vs row width and dtype at sparse-conv operand shapes.

conv_x3's slab gathers are the middle-encoder floor (~2 ns/row at 384 B,
probe_s1_anatomy). A y-packed scheme would cut rows/site from 9 to 5 but
needs 9C-wide probe rows (1152 B fp32 at s1) — only a win if wide rows
stay near the per-row floor. Measure the actual curve.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_row_cost.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()

    rng = np.random.default_rng(0)
    V = 48000
    R = 432000  # 9 probes x 48k sites (one s1 subm conv)
    idx = jnp.asarray(rng.integers(0, V, (R,)).astype(np.int32))

    for dtype, b in ((np.float32, 4), (np.float16, 2)):
        for W in (32, 48, 64, 96, 128, 192, 288, 384):
            wb = W * b
            op = jnp.asarray(rng.normal(0, 1, (V, W)).astype(dtype))
            t = chain_ms(lambda f: f[idx], op, iters=100)
            ns = t * 1e6 / R
            gbs = R * wb / (t * 1e-3) / 1e9
            print(f"dtype={np.dtype(dtype).name} W={W:4d} ({wb:5d} B)"
                  f"  {t:6.2f} ms  {ns:5.2f} ns/row  {gbs:6.1f} GB/s",
                  flush=True)


if __name__ == "__main__":
    main()
