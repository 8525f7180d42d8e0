"""Wide-stage (Cin>=64) subm conv strategy sweep at honest caps.

probe_honest (growth-rule caps) shows stage 2's stacked conv is the new
biggest line (2.58 ms x5 = 12.9 of the ~46 ms middle); the xpack cutoff at
Cin<=32 dates from before the routing einsums became ~free (probe_s1_anatomy:
routing adds 0.02 ms at s1). Re-measure conv_x3 vs stacked at s2/s3
geometry, fp32 and bf16 payloads.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_wide_xpack.py
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
    from futuredet_tpu.ops import sparse_conv as sc

    rng = np.random.default_rng(0)
    for V, Cin in ((48000, 32), (31500, 64), (21000, 128)):
        N = V
        Cout = Cin
        feats = jnp.asarray(rng.normal(0, 1, (V, Cin)).astype(np.float32))
        valid = jnp.ones((V,), bool)
        w = jnp.asarray(rng.normal(0, 0.1, (27, Cin, Cout)).astype(np.float32))
        anchors = np.sort(rng.integers(0, V - 2, (9, N))).astype(np.int32)
        codes = rng.integers(0, 3, (9, N, 3)).astype(np.int32)
        ptab = jnp.asarray(
            anchors
            | (codes[..., 0] << sc._XP_IDX_BITS)
            | (codes[..., 1] << (sc._XP_IDX_BITS + 2))
            | (codes[..., 2] << (sc._XP_IDX_BITS + 4)))
        tab27 = jax.jit(lambda p: sc.unpack_xpack_tables(p, V))(ptab)

        print(f"== V={V} Cin={Cin} ==", flush=True)
        t = chain_ms(lambda f: sc._gather_conv(f, tab27, w, None,
                                               jnp.float32, "stacked"),
                     feats, iters=100)
        print(f"  stacked fp32:        {t:6.2f} ms", flush=True)
        t = chain_ms(lambda f: sc._gather_conv(
            f.astype(jnp.bfloat16), tab27, w, None, None, "stacked"),
            feats, iters=100)
        print(f"  stacked bf16:        {t:6.2f} ms", flush=True)
        t = chain_ms(lambda f: sc._gather_conv(f, tab27, w, None,
                                               jnp.float32, "loop"),
                     feats, iters=100)
        print(f"  loop fp32:           {t:6.2f} ms", flush=True)
        t = chain_ms(lambda f: sc.conv_x3(f, ptab, valid, w), feats,
                     iters=100)
        print(f"  conv_x3 fp32:        {t:6.2f} ms", flush=True)
        t = chain_ms(lambda f: sc.conv_x3(f.astype(jnp.bfloat16), ptab,
                                          valid, w), feats, iters=100)
        print(f"  conv_x3 bf16:        {t:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
