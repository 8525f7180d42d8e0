"""Full-conv comparison: current conv_x3/stacked vs int32-bitcast-packed
variants (gather bf16 channel PAIRS as int32 lanes, unpack after the
gather, route, matmul bf16 -> fp32).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_packed_conv.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.ops import sparse_conv as sc

    rng = np.random.default_rng(0)

    for V, Cin in ((48000, 32), (31500, 64), (21000, 128)):
        N = V
        Cout = Cin
        feats = jnp.asarray(rng.normal(0, 1, (V, Cin)).astype(np.float32))
        valid = jnp.ones((V,), bool)
        w = jnp.asarray(rng.normal(0, 0.1, (27, Cin, Cout)).astype(
            np.float32))
        anchors = np.sort(rng.integers(0, V - 2, (9, N))).astype(np.int32)
        codes = rng.integers(0, 3, (9, N, 3)).astype(np.int32)
        ptab = jnp.asarray(
            anchors
            | (codes[..., 0] << sc._XP_IDX_BITS)
            | (codes[..., 1] << (sc._XP_IDX_BITS + 2))
            | (codes[..., 2] << (sc._XP_IDX_BITS + 4)))
        tab27 = jax.jit(lambda p: sc.unpack_xpack_tables(p, V))(ptab)

        def conv_x3_packed(f):
            fv = jnp.where(valid[:, None], f, 0.0).astype(jnp.bfloat16)
            ext = jnp.concatenate(
                [fv, jnp.zeros((3, Cin), jnp.bfloat16)], 0)
            wide = jnp.concatenate(
                [ext[0:V + 1], ext[1:V + 2], ext[2:V + 3]], 1)
            widep = lax.bitcast_convert_type(
                wide.reshape(V + 1, 3 * Cin // 2, 2), jnp.int32)
            blocks = []
            for g in range(9):
                t = ptab[g]
                a = t & sc._XP_IDX_MASK
                slab = lax.bitcast_convert_type(
                    widep[a], jnp.bfloat16).reshape(N, 3, Cin)
                for shift in (sc._XP_IDX_BITS, sc._XP_IDX_BITS + 2,
                              sc._XP_IDX_BITS + 4):
                    code = (t >> shift) & 3
                    sel = (code[:, None] == jnp.arange(3, dtype=jnp.int32)
                           ).astype(jnp.bfloat16)
                    blocks.append(jnp.einsum("nl,nlc->nc", sel, slab))
            gcat = jnp.concatenate(blocks, 1)
            return jnp.dot(gcat, w.reshape(27 * Cin, -1).astype(
                jnp.bfloat16), preferred_element_type=jnp.float32)

        def stacked_packed(f):
            fv = f.astype(jnp.bfloat16)
            padded = jnp.concatenate(
                [fv, jnp.zeros((1, Cin), jnp.bfloat16)], 0)
            pp = lax.bitcast_convert_type(
                padded.reshape(V + 1, Cin // 2, 2), jnp.int32)
            g = lax.bitcast_convert_type(pp[tab27], jnp.bfloat16)
            g = jnp.moveaxis(g.reshape(27, N, Cin), 0, 1).reshape(
                N, 27 * Cin)
            return jnp.dot(g, w.reshape(27 * Cin, -1).astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)

        print(f"== V={V} Cin={Cin} ==", flush=True)
        t = chain_ms(lambda f: sc.conv_x3(f, ptab, valid, w), feats,
                     iters=100)
        print(f"  conv_x3 fp32 (current):  {t:6.2f} ms", flush=True)
        t = chain_ms(conv_x3_packed, feats, iters=100)
        print(f"  conv_x3 PACKED bf16:     {t:6.2f} ms", flush=True)
        t = chain_ms(lambda f: sc._gather_conv(f, tab27, w, None,
                                               jnp.float32, "stacked"),
                     feats, iters=100)
        print(f"  stacked fp32:            {t:6.2f} ms", flush=True)
        t = chain_ms(stacked_packed, feats, iters=100)
        print(f"  stacked PACKED bf16:     {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
