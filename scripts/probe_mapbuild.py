"""Cheaper overlapped-map builds + probes: measure per stage geometry
  (a) current _dense_rows_ov (3V-scatter into jnp.full)
  (b) main-only SORTED scatter + halo column fix (lane concat rewrite)
  (c) (a) with indices_are_sorted on a single fused sorted scatter
  (d) uint16 map build + int32-bitcast probe (halved operand)
vs the probe cost on each (9xN subm-style probe batch).

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_mapbuild.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

L = 128
S = 126


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()

    stages = [  # (dims, V, Nq) roughly bench geometry
        ((42, 1440, 1440), 30000, 84000),
        ((21, 720, 720), 54000, 85500),
        ((11, 360, 360), 31500, 52500),
        ((6, 180, 180), 21000, 21000),
    ]
    rng = np.random.default_rng(0)
    for dims, V, Nq in stages:
        total = dims[0] * dims[1] * dims[2]
        n = min(V - 64, int(total * 0.9))
        ids = np.sort(rng.choice(total, n, replace=False)).astype(np.int32)
        ids = np.concatenate([ids, np.full(V - n, total, np.int32)])
        valid = np.arange(V) < n
        ids_j = jnp.asarray(ids)
        valid_j = jnp.asarray(valid)
        rows = total // S + 3

        def build_cur(idsx):
            dense = jnp.full((rows * L,), V, jnp.int32)
            r0 = idsx // S
            trash = rows * L - 1
            p_main = jnp.where(valid_j, r0 * L + idsx - S * r0 + 1, trash)
            p_next = jnp.where(valid_j & (idsx % S == S - 1),
                               (r0 + 1) * L, trash)
            p_prev = jnp.where(valid_j & (idsx % S == 0) & (r0 > 0),
                               (r0 - 1) * L + L - 1, trash)
            ar = jnp.arange(V, dtype=jnp.int32)
            dense = dense.at[jnp.concatenate([p_main, p_next, p_prev])].set(
                jnp.concatenate([ar, ar, ar]))
            return dense.reshape(rows, L)

        def build_colfix(idsx):
            dense = jnp.full((rows * L,), V, jnp.int32)
            r0 = idsx // S
            trash = rows * L - 1
            p_main = jnp.where(valid_j, r0 * L + idsx - S * r0 + 1, trash)
            ar = jnp.arange(V, dtype=jnp.int32)
            dense = dense.at[p_main].set(ar, indices_are_sorted=True)
            d = dense.reshape(rows, L)
            # lane 0 of row r == lane 126 of row r-1; lane 127 == lane 1 of r+1
            col0 = jnp.concatenate([d[:1, 0], d[:-1, 126]])[:, None]
            col127 = jnp.concatenate([d[1:, 1], d[-1:, 127]])[:, None]
            return jnp.concatenate([col0, d[:, 1:127], col127], 1)

        def build_u16(idsx):
            dense = jnp.full((rows * L,), min(V, 65535), jnp.uint16)
            r0 = idsx // S
            trash = rows * L - 1
            p_main = jnp.where(valid_j, r0 * L + idsx - S * r0 + 1, trash)
            ar = jnp.arange(V, dtype=jnp.uint16)
            dense = dense.at[p_main].set(ar, indices_are_sorted=True)
            d = dense.reshape(rows, L)
            col0 = jnp.concatenate([d[:1, 0], d[:-1, 126]])[:, None]
            col127 = jnp.concatenate([d[1:, 1], d[-1:, 127]])[:, None]
            return jnp.concatenate([col0, d[:, 1:127], col127], 1)

        t_cur = chain_ms(lambda z: build_cur(ids_j + z.astype(jnp.int32))
                         [:4, 0].astype(jnp.float32), jnp.zeros(()), iters=50)
        t_fix = chain_ms(lambda z: build_colfix(ids_j + z.astype(jnp.int32))
                         [:4, 0].astype(jnp.float32), jnp.zeros(()), iters=50)
        t_u16 = chain_ms(lambda z: build_u16(ids_j + z.astype(jnp.int32))
                         [:4, 0].astype(jnp.float32), jnp.zeros(()), iters=50)

        # probe batch: 9 x Nq queries, sorted-ish (ids + group offsets)
        offs = np.array([(dz * dims[1] + dy) * dims[2]
                         for dz in (-1, 0, 1) for dy in (-1, 0, 1)],
                        np.int32)
        base = np.sort(rng.choice(total - 2 * abs(offs).max() - 2,
                                  Nq).astype(np.int32)) + abs(offs).max() + 1
        q9 = jnp.asarray(base[None, :] + offs[:, None])

        dmap = jax.jit(build_cur)(ids_j)
        dmap16 = jax.jit(build_u16)(ids_j)

        def probe3_i32(dm, q):
            r = q // S
            g = dm[r]
            lane = (q - S * r + 1)[..., None]
            ar = jnp.arange(L, dtype=jnp.int32)
            out = 0
            for d in (-1, 0, 1):
                out += jnp.sum(jnp.where(lane + d == ar, g, 0), -1)
            return out

        def probe3_u16(dm16, q):
            # int32-bitcast rows: 64 int32 lanes hold 128 u16 cells
            m32 = lax.bitcast_convert_type(
                dm16.reshape(rows, 64, 2), jnp.uint32).astype(jnp.int32)
            r = q // S
            g = m32[r]                                    # (..., 64)
            lane = q - S * r + 1
            out = 0
            ar = jnp.arange(64, dtype=jnp.int32)
            for d in (-1, 0, 1):
                ln = lane + d
                w = jnp.sum(jnp.where((ln // 2)[..., None] == ar, g, 0), -1)
                lo = w & 0xFFFF
                hi = (w >> 16) & 0xFFFF
                out += jnp.where(ln % 2 == 0, lo, hi)
            return out

        import time as _time

        def chain2(fn, dm, q, iters=50):
            @jax.jit
            def chain(dm, q):
                def body(i, carry):
                    tok, acc = carry
                    out = fn(dm, q + tok)
                    s = jnp.float32(jnp.sum(out))
                    return (s.astype(jnp.int32) % 2, acc + s)
                return jax.lax.fori_loop(
                    0, iters, body, (jnp.int32(0), jnp.float32(0)))[1]
            _ = jax.device_get(chain(dm, q))
            t0 = _time.perf_counter()
            _ = jax.device_get(chain(dm, q))
            return (_time.perf_counter() - t0) / iters * 1e3

        t_p32 = chain2(probe3_i32, dmap, q9)
        t_p16 = chain2(probe3_u16, dmap16, q9)
        print(f"dims={dims} V={V} Nq={Nq}: build cur {t_cur:5.2f} | "
              f"colfix {t_fix:5.2f} | u16 {t_u16:5.2f} || "
              f"probe3x9 i32 {t_p32:5.2f} | u16 {t_p16:5.2f}", flush=True)


if __name__ == "__main__":
    main()
