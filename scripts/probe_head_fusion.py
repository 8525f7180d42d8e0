"""Probe: fuse the CenterHead branch towers.

Hypothesis: the 7-task SepHead stack (~99 small convs at 180x180, N=64)
is dispatch/utilization bound; fusing each task's 6 branch ConvBNs into one
64->384 conv and the 6 finals into one block-diagonal 384->11 conv (both
mathematically identical) removes most of the overhead.

Variants:
  base    : 7 x [2 chain convs + 6x(conv64 + bn + relu) + 6x(final conv)]
  fusedA  : 7 x [2 chain convs + 1x(conv384 + bn + relu) + 1x(blockdiag final)]
  fusedB  : chain sequential, then branch+final stacked across tasks (vmap)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()

    H = W = 180
    T = 7
    HC = 64
    OUTS = [1, 2, 1, 3, 2, 2]  # hm, reg, height, dim, rot, vel
    OC = sum(OUTS)
    rng = np.random.default_rng(0)

    def conv(x, w, b=None):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y if b is None else y + b

    def mk(*shape):
        return jnp.asarray(rng.normal(0, .05, shape).astype(np.float32))

    shared = mk(1, H, W, HC)
    # per-task params
    chain_w = [(mk(3, 3, HC if t == 0 else 2 * HC, HC), mk(3, 3, HC, HC))
               for t in range(T)]
    br_w = [[mk(3, 3, HC, HC) for _ in OUTS] for _ in range(T)]
    br_s = [[mk(HC) for _ in OUTS] for _ in range(T)]   # BN scale (folded)
    br_b = [[mk(HC) for _ in OUTS] for _ in range(T)]
    fin_w = [[mk(3, 3, HC, o) for o in OUTS] for _ in range(T)]

    # fused params (built once outside the timed fn)
    br_w_f = [jnp.concatenate(br_w[t], -1) for t in range(T)]      # (3,3,64,384)
    br_s_f = [jnp.concatenate(br_s[t], -1) for t in range(T)]
    br_b_f = [jnp.concatenate(br_b[t], -1) for t in range(T)]
    def blockdiag(fws):
        w = np.zeros((3, 3, HC * len(OUTS), OC), np.float32)
        ci = co = 0
        for fw, o in zip(fws, OUTS):
            w[:, :, ci:ci + HC, co:co + o] = np.asarray(fw)
            ci += HC
            co += o
        return jnp.asarray(w)
    fin_w_f = [blockdiag(fin_w[t]) for t in range(T)]

    def base(x):
        outs = []
        feats = None
        for t in range(T):
            inp = x if t == 0 else jnp.concatenate([x, feats], -1)
            f = jax.nn.relu(conv(inp, chain_w[t][0]))
            feats = jax.nn.relu(conv(f, chain_w[t][1]))
            for k in range(len(OUTS)):
                h = jax.nn.relu(conv(feats, br_w[t][k]) * br_s[t][k]
                                + br_b[t][k])
                outs.append(conv(h, fin_w[t][k]))
        return sum(jnp.sum(o) for o in outs)

    def fusedA(x):
        outs = []
        feats = None
        for t in range(T):
            inp = x if t == 0 else jnp.concatenate([x, feats], -1)
            f = jax.nn.relu(conv(inp, chain_w[t][0]))
            feats = jax.nn.relu(conv(f, chain_w[t][1]))
            h = jax.nn.relu(conv(feats, br_w_f[t]) * br_s_f[t] + br_b_f[t])
            outs.append(conv(h, fin_w_f[t]))
        return sum(jnp.sum(o) for o in outs)

    brw_st = jnp.stack(br_w_f)     # (T,3,3,64,384)
    brs_st = jnp.stack(br_s_f)
    brb_st = jnp.stack(br_b_f)
    finw_st = jnp.stack(fin_w_f)

    def fusedB(x):
        feats_all = []
        feats = None
        for t in range(T):
            inp = x if t == 0 else jnp.concatenate([x, feats], -1)
            f = jax.nn.relu(conv(inp, chain_w[t][0]))
            feats = jax.nn.relu(conv(f, chain_w[t][1]))
            feats_all.append(feats)
        fs = jnp.concatenate(feats_all, 0)           # (T,H,W,64)
        h = jax.vmap(lambda a, w, s, b: jax.nn.relu(conv(a[None], w)[0]
                                                    * s + b))(
            fs, brw_st, brs_st, brb_st)
        out = jax.vmap(lambda a, w: conv(a[None], w)[0])(h, finw_st)
        return jnp.sum(out)

    for name, fn in [("base", base), ("fusedA", fusedA), ("fusedB", fusedB)]:
        t = chain_ms(fn, shared, iters=100)
        print(f"{name:8s} {t:6.2f} ms", flush=True)
        # numerical identity check (base vs fused)
    a = jax.jit(base)(shared)
    b = jax.jit(fusedA)(shared)
    c = jax.jit(fusedB)(shared)
    print("sum base/fusedA/fusedB:", a, b, c, flush=True)


if __name__ == "__main__":
    main()
