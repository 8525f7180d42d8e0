"""Relayout-free packed conv_x3: gather int32 bf16-PAIR slabs (halved lane
count), route x-codes with an int32 one-hot einsum (0/1 multiply is exact on
packed pairs), then shift-unpack to fp32 via pure integer ops — bf16 arrays
are NEVER materialized, so the bf16-retiling relayout that killed
probe_packed_conv.py never happens. Weights are row-permuted to match the
[even channels | odd channels] unpack order.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_shift_unpack.py
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

    def pack_pairs(f):
        # fp32 (V, C) -> int32 (V, C/2): lane j = bf16(c=2j) | bf16(c=2j+1)
        # (truncating round; hi half = even channel)
        b = lax.bitcast_convert_type(f, jnp.uint32)
        hi = b[:, 0::2] & jnp.uint32(0xFFFF0000)
        lo = b[:, 1::2] >> jnp.uint32(16)
        return lax.bitcast_convert_type(hi | lo, jnp.int32)

    def unpack_fp32(p):
        # int32 (..., L) -> fp32 (..., 2L) as [even chans | odd chans]
        b = lax.bitcast_convert_type(p, jnp.uint32)
        hi = lax.bitcast_convert_type(b & jnp.uint32(0xFFFF0000),
                                      jnp.float32)
        lo = lax.bitcast_convert_type(b << jnp.uint32(16), jnp.float32)
        return jnp.concatenate([hi, lo], -1)

    for V, Cin in ((54000, 32), (31500, 64), (21000, 128)):
        N = V
        Cout = Cin
        H = Cin // 2
        feats = jnp.asarray(rng.normal(0, 1, (V, Cin)).astype(np.float32))
        valid = jnp.ones((V,), bool)
        w = jnp.asarray(rng.normal(0, 0.1, (27, Cin, Cout)).astype(
            np.float32))
        # [all even chans group-major | all odd chans group-major]
        w_perm = jnp.concatenate([w[:, 0::2, :].reshape(-1, Cout),
                                  w[:, 1::2, :].reshape(-1, Cout)], 0)
        anchors = np.sort(rng.integers(0, V - 2, (9, N))).astype(np.int32)
        codes = rng.integers(0, 3, (9, N, 3)).astype(np.int32)
        ptab = jnp.asarray(
            anchors
            | (codes[..., 0] << sc._XP_IDX_BITS)
            | (codes[..., 1] << (sc._XP_IDX_BITS + 2))
            | (codes[..., 2] << (sc._XP_IDX_BITS + 4)))

        def packed_gcat(fp):                     # fp: (V, H) int32
            ext = jnp.concatenate([fp, jnp.zeros((3, H), jnp.int32)], 0)
            wide = jnp.concatenate(
                [ext[0:V + 1], ext[1:V + 2], ext[2:V + 3]], 1)
            blocks = []
            for g in range(9):
                t = ptab[g]
                a = t & sc._XP_IDX_MASK
                slab = wide[a].reshape(N, 3, H)           # int32 gather
                for shift in (sc._XP_IDX_BITS, sc._XP_IDX_BITS + 2,
                              sc._XP_IDX_BITS + 4):
                    code = (t >> shift) & 3
                    sel = (code[:, None]
                           == jnp.arange(3, dtype=jnp.int32)).astype(
                        jnp.int32)
                    blocks.append(jnp.einsum("nl,nlc->nc", sel, slab))
            return jnp.concatenate(blocks, 1)             # (N, 27H) int32

        def conv_packed_from_fp32(f):
            fv = jnp.where(valid[:, None], f, 0.0)
            gcat = unpack_fp32(packed_gcat(pack_pairs(fv)))
            return jnp.dot(gcat, w_perm,
                           preferred_element_type=jnp.float32)

        def conv_packed_resident(fp):
            # storage stays packed between convs: pack the OUTPUT too
            out = jnp.dot(unpack_fp32(packed_gcat(fp)), w_perm,
                          preferred_element_type=jnp.float32)
            return pack_pairs(out)

        fpacked = jax.jit(pack_pairs)(feats)

        print(f"== V={V} Cin={Cin} ==", flush=True)
        t = chain_ms(lambda f: sc.conv_x3(f, ptab, valid, w), feats,
                     iters=100)
        print(f"  conv_x3 fp32 (current):        {t:6.2f} ms", flush=True)
        t = chain_ms(conv_packed_from_fp32, feats, iters=100)
        print(f"  packed shift-unpack from fp32: {t:6.2f} ms", flush=True)
        t = chain_ms(conv_packed_resident, fpacked, iters=100)
        print(f"  packed-resident (pack out):    {t:6.2f} ms", flush=True)

        # numerics sanity: packed == conv_x3 on bf16-truncated inputs
        got = conv_packed_from_fp32(feats)
        tr = lax.bitcast_convert_type(
            lax.bitcast_convert_type(feats, jnp.uint32)
            & jnp.uint32(0xFFFF0000), jnp.float32)
        ref_tr = sc.conv_x3(tr, ptab, valid, w)
        err = float(jnp.max(jnp.abs(got - ref_tr)))
        print(f"  max |packed - conv_x3(trunc)|: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
