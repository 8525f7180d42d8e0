"""Decompose the voxelnet BEV tower: z_crush | RPN | CenterHead stack.

profile_e2e_parts attributes ~9.6 ms to "rpn+head" at the honest caps —
2-3x the round-2 head-fusion numbers. This isolates each tower on its real
input shapes to find the regression (or the mis-attribution: that figure is
a DIFFERENCE of separately chained measurements).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_rpn_heads.py
"""
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
    from futuredet_tpu.models.backbone2d import RPN
    from futuredet_tpu.models.center_head import CenterHead
    from futuredet_tpu.models.layers import ConvBNReLU

    cfg = get_config("forecast_n3dtf")
    c = cfg.model
    rng = np.random.default_rng(0)
    Y = X = 180
    Zc = 5 * 128          # z-crush input: middle output Z4 * C

    canvas = jnp.asarray(rng.normal(0, 1, (1, Y, X, Zc)).astype(np.float32))

    zc = ConvBNReLU(c.rpn.in_channels, 1, 1, use_bias=False,
                    compute_dtype=c.compute_dtype)
    vz = jax.jit(lambda r, x: zc.init(r, x, False))(jax.random.PRNGKey(0),
                                                    canvas)
    t = chain_ms(lambda x: zc.apply(vz, x, False), canvas, iters=100)
    print(f"z_crush ({Zc}->{c.rpn.in_channels} 1x1): {t:6.2f} ms", flush=True)

    x_rpn = jnp.asarray(rng.normal(
        0, 1, (1, Y, X, c.rpn.in_channels)).astype(np.float32))
    rpn = RPN(layer_nums=c.rpn.layer_nums, ds_strides=c.rpn.ds_strides,
              ds_filters=c.rpn.ds_filters, us_strides=c.rpn.us_strides,
              us_filters=c.rpn.us_filters, compute_dtype=c.compute_dtype)
    vr = jax.jit(lambda r, x: rpn.init(r, x, False))(jax.random.PRNGKey(0),
                                                     x_rpn)
    t = chain_ms(lambda x: rpn.apply(vr, x, False), x_rpn, iters=100)
    print(f"RPN (layers {c.rpn.layer_nums} filters {c.rpn.ds_filters}): "
          f"{t:6.2f} ms", flush=True)

    neck_c = sum(c.rpn.us_filters)
    x_head = jnp.asarray(rng.normal(0, 1, (1, Y, X, neck_c)).astype(
        np.float32))
    head = CenterHead(cfg=c.head, compute_dtype=c.compute_dtype)
    vh = jax.jit(lambda r, x: head.init(r, x, train=False))(
        jax.random.PRNGKey(0), x_head)

    def all_heads(x):
        preds = head.apply(vh, x, train=False)
        return sum(jnp.sum(v) for pd in preds for v in pd.values())

    t = chain_ms(all_heads, x_head, iters=100)
    print(f"CenterHead ({len(c.head.tasks)} tasks, all branches consumed): "
          f"{t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
