"""One-chain cost of the composed voxelnet BEV tail at real shapes:
middle-output canvas -> z_crush -> zmask tile -> RPN -> CenterHead, plus
decode_and_nms — vs the sum of isolated parts (probe_rpn_heads). Finds
whether profile_e2e_parts' ~8.8 ms "rpn+head" difference is real composed
cost or middle-side glue (scatter_dense etc).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_bev_tail.py
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
    from futuredet_tpu.eval.decode import decode_and_nms
    from futuredet_tpu.models.backbone2d import RPN
    from futuredet_tpu.models.center_head import CenterHead
    from futuredet_tpu.models.layers import ConvBNReLU
    import flax.linen as nn

    cfg = get_config("forecast_n3dtf")
    c = cfg.model
    rng = np.random.default_rng(0)
    Y = X = 180
    Dz = 5
    Zc = Dz * 128

    class Tail(nn.Module):
        @nn.compact
        def __call__(self, x, zmask, train: bool = False):
            x = ConvBNReLU(c.rpn.in_channels, 1, 1, use_bias=False,
                           compute_dtype=c.compute_dtype,
                           name="z_crush")(x, train)
            if x.shape[-1] % Dz == 0:
                x = x * jnp.tile(zmask.astype(x.dtype),
                                 (1, 1, 1, x.shape[-1] // Dz))
            else:
                x = x * zmask.any(-1, keepdims=True).astype(x.dtype)
            x = RPN(layer_nums=c.rpn.layer_nums,
                    ds_strides=c.rpn.ds_strides,
                    ds_filters=c.rpn.ds_filters,
                    us_strides=c.rpn.us_strides,
                    us_filters=c.rpn.us_filters,
                    compute_dtype=c.compute_dtype, name="neck")(x, train)
            return CenterHead(cfg=c.head, compute_dtype=c.compute_dtype,
                              name="head")(x, train=train)

    canvas = jnp.asarray(rng.normal(0, 1, (1, Y, X, Zc)).astype(np.float32))
    zmask = jnp.asarray(rng.random((1, Y, X, Dz)) < 0.2)

    tail = Tail()
    v = jax.jit(lambda r, x: tail.init(r, x, zmask, False))(
        jax.random.PRNGKey(0), canvas)

    t = chain_ms(lambda x: tail.apply(v, x, zmask, False)[0]["hm"],
                 canvas, iters=100)
    print(f"tail (zcrush+mask+RPN+head):      {t:6.2f} ms", flush=True)

    t = chain_ms(lambda x: decode_and_nms(
        cfg, tail.apply(v, x, zmask, False)).scores, canvas, iters=100)
    print(f"tail + decode_and_nms:            {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
