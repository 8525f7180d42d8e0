"""Decompose one s1-scale conv_x3 at honest growth caps.

s1 (V=N=48000, Cin=Cout=32 subm) costs ~3.6 ms/conv and there are 4 subm
convs + the strided entry — the single biggest e2e line item. This probe
splits the conv into: wide-operand build | 9 slab gathers | lane-routing
einsums | the MXU matmul, and measures a CANDIDATE scheme that pre-routes
x-taps into a (3V, 3C) overlapping-slab operand so the gather output IS the
tap block (no per-site routing einsums at all).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_s1_anatomy.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from _timing import chain_ms, chain_ms_args, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.ops import sparse_conv as sc

    rng = np.random.default_rng(0)
    V = N = 48000
    Cin = Cout = 32

    feats = jnp.asarray(rng.normal(0, 1, (V, Cin)).astype(np.float32))
    valid = jnp.ones((V,), bool)
    w = jnp.asarray(rng.normal(0, 0.1, (27, Cin, Cout)).astype(np.float32))

    # fabricate packed tables with realistic structure: anchors sorted-ish
    # random rows, codes mostly identity (present triples)
    anchors = np.sort(rng.integers(0, V - 2, (9, N))).astype(np.int32)
    codes = rng.integers(0, 3, (9, N, 3)).astype(np.int32)
    ptab = jnp.asarray(
        anchors
        | (codes[..., 0] << sc._XP_IDX_BITS)
        | (codes[..., 1] << (sc._XP_IDX_BITS + 2))
        | (codes[..., 2] << (sc._XP_IDX_BITS + 4)))

    # ---- current path, whole and parts ----
    t = chain_ms(lambda f: sc.conv_x3(f, ptab, valid, w), feats, iters=100)
    print(f"conv_x3 full (V={V}, C={Cin}):        {t:6.2f} ms", flush=True)

    def wide_only(f):
        fv = jnp.where(valid[:, None], f, 0.0)
        ext = jnp.concatenate([fv, jnp.zeros((3, Cin), fv.dtype)], 0)
        return jnp.concatenate([ext[0:V + 1], ext[1:V + 2], ext[2:V + 3]], 1)
    t = chain_ms(wide_only, feats, iters=100)
    print(f"  wide build only:                   {t:6.2f} ms", flush=True)

    def gathers_only(f):
        wide = wide_only(f)
        acc = 0.0
        for g in range(9):
            a = ptab[g] & sc._XP_IDX_MASK
            acc = acc + wide[a]
        return acc
    t = chain_ms(gathers_only, feats, iters=100)
    print(f"  wide + 9 slab gathers (no route):  {t:6.2f} ms", flush=True)

    t = chain_ms(lambda f: sc._xpack_gcat(f, ptab, valid), feats, iters=100)
    print(f"  wide + gathers + routing (gcat):   {t:6.2f} ms", flush=True)

    gcat = jax.jit(lambda f: sc._xpack_gcat(f, ptab, valid))(feats)
    t = chain_ms_args(
        lambda g, ww: jnp.dot(g, ww.reshape(27 * Cin, -1),
                              preferred_element_type=jnp.float32),
        (gcat, w), iters=100)
    print(f"  matmul alone (N,864)@(864,{Cout}):    {t:6.2f} ms", flush=True)

    # ---- candidate: pre-routed overlapping slabs ----
    # operand slab3[3u + s] = taps (c_u - 2 + s .. c_u + s); a single row
    # gather at 3*j + s yields the exact 3 x-taps, no routing. Build cost
    # is streaming shifts; here we fabricate it (same bytes) to measure the
    # gather+matmul side at true shapes.
    j3 = jnp.asarray((3 * anchors + rng.integers(0, 3, (9, N))
                      ).astype(np.int32))

    def slab3_build(f):
        fv = jnp.where(valid[:, None], f, 0.0)
        ext = jnp.concatenate([jnp.zeros((2, Cin), fv.dtype), fv,
                               jnp.zeros((2, Cin), fv.dtype)], 0)
        # 5 tap columns then 3 overlapping 3C windows per site
        w5 = jnp.concatenate([ext[i:i + V] for i in range(5)], 1)  # (V, 5C)
        rows = [w5[:, s * Cin:(s + 3) * Cin] for s in range(3)]    # 3x(V,3C)
        return jnp.stack(rows, 1).reshape(3 * V, 3 * Cin)
    t = chain_ms(slab3_build, feats, iters=100)
    print(f"  slab3 operand build (3V,3C):       {t:6.2f} ms", flush=True)

    def cand_full(f):
        s3 = slab3_build(f)
        blocks = [s3[j3[g]] for g in range(9)]
        gc = jnp.concatenate(blocks, 1)
        return jnp.dot(gc, w.reshape(27 * Cin, -1),
                       preferred_element_type=jnp.float32)
    t = chain_ms(cand_full, feats, iters=100)
    print(f"  CANDIDATE slab3 conv full:         {t:6.2f} ms", flush=True)

    def cand_accum(f):
        s3 = slab3_build(f)
        acc = None
        for g in range(9):
            o = jnp.dot(s3[j3[g]], w[3 * g:3 * g + 3].reshape(3 * Cin, -1),
                        preferred_element_type=jnp.float32)
            acc = o if acc is None else acc + o
        return acc
    t = chain_ms(cand_accum, feats, iters=100)
    print(f"  CANDIDATE slab3, 9 accum matmuls:  {t:6.2f} ms", flush=True)

    # bf16 slab3 variant: halve gather bytes, matmul in bf16
    def cand_bf16(f):
        s3 = slab3_build(f).astype(jnp.bfloat16)
        blocks = [s3[j3[g]] for g in range(9)]
        gc = jnp.concatenate(blocks, 1)
        return jnp.dot(gc, w.reshape(27 * Cin, -1).astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    t = chain_ms(cand_bf16, feats, iters=100)
    print(f"  CANDIDATE slab3 bf16 gathers:      {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
