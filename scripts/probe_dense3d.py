"""Raw dense 3D conv throughput at the middle-encoder stage geometries.

Decides the honest-capacity strategy question: dense stages cost the same
regardless of active-site count (and never drop sites), so if conv3d at
stage-s geometry runs in a few ms, a dense tail beats honest-capacity
sparse stages whose cost scales with the generative occupancy
(realistic 30k-voxel scenes: 108k/78k/26k sites at stages 1/2/3,
scripts/occupancy.py).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_dense3d.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices())
    d = jax.devices()[0]
    print("device_kind:", d.device_kind, "platform:", d.platform)

    def time_conv(shape_zyx, cin, cout, stride, dtype, iters=30):
        Z, Y, X = shape_zyx
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, Z, Y, X, cin)).astype(np.float32), dtype=dtype)
        w = jnp.asarray(np.random.default_rng(1).normal(
            size=(3, 3, 3, cin, cout)).astype(np.float32) * 0.05,
            dtype=dtype)

        def conv(x, w):
            return jax.lax.conv_general_dilated(
                x, w, window_strides=(stride,) * 3,
                padding=[(1, 1)] * 3,
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32).astype(dtype)

        # on-device chaining: data-dependent fori_loop + one device_get
        # (block_until_ready does not sync on the tunneled backend)
        @jax.jit
        def chain(x, w):
            def body(_, acc):
                y = conv(x + acc[0, 0, 0, 0, 0].astype(dtype) * 0, w)
                return acc + y[:, :1, :1, :1, :1].astype(jnp.float32)
            acc = jnp.zeros((1, 1, 1, 1, 1), jnp.float32)
            return jax.lax.fori_loop(0, iters, body, acc)

        r = chain(x, w)
        jax.device_get(r)            # warm
        t0 = time.perf_counter()
        jax.device_get(chain(x, w))
        dt = (time.perf_counter() - t0) / iters
        oz = (Z + 2 - 3) // stride + 1 if stride > 1 else Z
        oy = (Y + 2 - 3) // stride + 1 if stride > 1 else Y
        ox = (X + 2 - 3) // stride + 1 if stride > 1 else X
        fl = 2 * 27 * cin * cout * oz * oy * ox
        print(f"  ({Z},{Y},{X}) c{cin}->{cout} s{stride} {dtype.__name__}: "
              f"{dt*1e3:7.2f} ms  {fl/dt/1e12:6.1f} TF/s")
        return dt

    for dtype in (jnp.bfloat16,):
        print(f"-- {dtype.__name__}")
        # stage-1 down over the full-res (41,1440,1440)x16 canvas is
        # infeasible: XLA's conv lowering materializes a 22 GB layout copy
        # (> 16 GB HBM) — dense_from_stage=1 is dead on arrival on v5e.
        time_conv((21, 720, 720), 32, 32, 1, dtype, iters=10)
        # stage 2: down -> (11,360,360)x64, res at 64
        time_conv((21, 720, 720), 32, 64, 2, dtype, iters=10)
        time_conv((11, 360, 360), 64, 64, 1, dtype, iters=20)
        # stage 3: down -> (6,180,180)x128, res at 128
        time_conv((11, 360, 360), 64, 128, 2, dtype, iters=20)
        time_conv((6, 180, 180), 128, 128, 1, dtype, iters=30)


if __name__ == "__main__":
    main()
