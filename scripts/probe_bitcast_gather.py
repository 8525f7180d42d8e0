"""bf16-as-int32 bitcast gathers: halve the LANE count of every sparse-conv
row fetch.

probe_row_cost shows gather cost is ~2.7 ns/row up to 128 LANES and ~5 ns
at 192+ lanes, independent of dtype — XLA gathers fp16 per-VALUE, so plain
bf16 payloads gain nothing. Bitcasting channel PAIRS into int32 halves the
lanes: s2 subm xpack rows (3x64 = 192 lanes, 2 issues) become 96 int32
lanes (1 issue); s3 xpack (384 lanes) becomes 192. Validates exactness
(bit-identical values through bitcast round-trip) and times conv-shaped
gathers at s1/s2/s3 geometry.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_bitcast_gather.py
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

    rng = np.random.default_rng(0)

    def pack(x):
        N, W = x.shape
        return lax.bitcast_convert_type(
            x.reshape(N, W // 2, 2), jnp.int32)

    def unpack(x, dtype):
        N, Wh = x.shape
        return lax.bitcast_convert_type(x, dtype).reshape(N, Wh * 2)

    # exactness
    x = jnp.asarray(rng.normal(0, 1, (64, 8)).astype(np.float32)).astype(
        jnp.bfloat16)
    rt = unpack(pack(x), jnp.bfloat16)
    assert bool(jnp.all(rt == x)), "bitcast round trip"
    print("round-trip exact", flush=True)

    # conv-shaped gathers: (R rows of W bf16 lanes) direct vs bitcast
    for tag, V, R, W in (("s1 subm 3C=96", 48000, 432000, 96),
                         ("s2 subm 3C=192", 31500, 283500, 192),
                         ("s3 xpack 3C=384", 21000, 189000, 384),
                         ("s3 stacked C=128", 21000, 567000, 128)):
        idx = jnp.asarray(rng.integers(0, V, (R,)).astype(np.int32))
        op = jnp.asarray(rng.normal(0, 1, (V, W)).astype(np.float32))
        t32 = chain_ms(lambda f: f[idx], op, iters=50)
        opb = jax.jit(lambda f: f.astype(jnp.bfloat16))(op)
        tb = chain_ms(lambda f: f[idx], opb, iters=50)
        # bitcast INSIDE the timed fn (the cast/relayout cost must count)
        tbc = chain_ms(lambda f: pack(f.astype(jnp.bfloat16))[idx],
                       op, iters=50)
        # operand already bf16 (as it would be between sparse stages)
        tbc2 = chain_ms(lambda f: pack(f)[idx], opb, iters=50)
        print(f"{tag:18s} R={R}: fp32 {t32:5.2f}  bf16 {tb:5.2f}  "
              f"fp32->pack {tbc:5.2f}  bf16->pack {tbc2:5.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
