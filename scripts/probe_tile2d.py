"""2D-halo tiled cell map: build + probe cost vs the 1D x-overlapped map.

Layout under test: one 128-lane row = one (8, 16) tile of (y, x) cells —
6x14 interior + 1-cell halo ring — so a single row fetch at (z+dz, y, x)
carries ALL nine (dy, dx) in {-1,0,1}^2 neighbor cells: 3 probe rows per
query site (one per dz) instead of the current 9 (one per (dz, dy) group,
x-triples via the 1D halo lanes).

Measures at the four bench stage geometries:
  * build: interior-only scatter + 8 halo shift-fills  vs  _dense_rows_ov
  * probe: 3-row tile fetch + 27 lane selects          vs  9x _probe3

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_tile2d.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np

TY, TX = 6, 14           # tile interior; storage (TY+2, TX+2) = 128 lanes


def main():
    import jax
    import jax.numpy as jnp
    from _timing import chain_ms, enable_compilation_cache
    from futuredet_tpu.ops.sparse_conv import (SparseGrid, _dense_rows_ov,
                                               _probe3, _OFFS9)

    enable_compilation_cache()

    def tile_index(z, y, x, dims):
        Z, Y, X = dims
        ty_n = -(-Y // TY)
        tx_n = -(-X // TX)
        t = (z * ty_n + y // TY) * tx_n + x // TX
        lane = (y % TY + 1) * (TX + 2) + (x % TX + 1)
        return t, lane, ty_n, tx_n

    def build_tile2d(grid: SparseGrid, dims):
        Z, Y, X = dims
        ty_n = -(-Y // TY)
        tx_n = -(-X // TX)
        T = Z * ty_n * tx_n + 2          # +2 trash tiles (never probed)
        V = grid.ids.shape[0]
        z, y, x = grid.coords[:, 0], grid.coords[:, 1], grid.coords[:, 2]
        t, lane, _, _ = tile_index(z, y, x, dims)
        pos = jnp.where(grid.valid, t * 128 + lane, T * 128 - 1)
        m = jnp.full((T * 128,), V, jnp.int32).at[pos].set(
            jnp.arange(V, dtype=jnp.int32)).reshape(T, 8, TX + 2)
        # halo fills: the 1-ring of tile (tz, ty, tx) mirrors interior cells
        # of the 8 neighbor tiles — each fill is a tile-axis shift + slice
        # copy in the (T, 8, 16) view (tile t - dty*tx_n - dtx neighbors)
        def sh(arr, dt):
            if dt == 0:
                return arr
            pad = jnp.full((abs(dt), 8, TX + 2), V, jnp.int32)
            return (jnp.concatenate([arr[dt:], pad], 0) if dt > 0
                    else jnp.concatenate([pad, arr[:dt]], 0))
        # y halo rows: row 0 <- neighbor (ty-1) interior row TY;
        # row TY+1 <- neighbor (ty+1) interior row 1
        m = m.at[:, 0, :].set(sh(m, -tx_n)[:, TY, :])
        m = m.at[:, TY + 1, :].set(sh(m, tx_n)[:, 1, :])
        # x halo cols (after y rows, so corners ride along)
        m = m.at[:, :, 0].set(sh(m, -1)[:, :, TX])
        m = m.at[:, :, TX + 1].set(sh(m, 1)[:, :, 1])
        return m.reshape(T, 128)

    def probe_tile2d_27(tmap, qc, qvalid, dims, V):
        """qc (N, 3) center coords; returns (27, N) neighbor site indices
        (V where absent) — 3 row fetches per query + 27 lane selects."""
        Z, Y, X = dims
        z, y, x = qc[:, 0], qc[:, 1], qc[:, 2]
        outs = []
        ar = jnp.arange(128, dtype=jnp.int32)
        for dz in (-1, 0, 1):
            zq = z + dz
            okz = qvalid & (zq >= 0) & (zq < Z)
            t, lane, _, _ = tile_index(jnp.clip(zq, 0, Z - 1), y, x, dims)
            t = jnp.where(okz, t, tmap.shape[0] - 1)      # trash tile
            g = tmap[t]                                    # (N, 128)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    ok = (okz & (y + dy >= 0) & (y + dy < Y)
                          & (x + dx >= 0) & (x + dx < X))
                    tgt = lane + dy * (TX + 2) + dx
                    oh = tgt[:, None] == ar
                    outs.append(jnp.where(
                        ok, jnp.sum(jnp.where(oh, g, 0), -1), V))
        return jnp.stack(outs)

    def probe_ov_27(ovmap, qc, qvalid, dims, V):
        """Current strategy: 9 group probes, x-triples via _probe3, with
        the x-boundary wrap masking _xpack_tables applies."""
        total = dims[0] * dims[1] * dims[2]
        X = dims[2]
        offs = np.array(_OFFS9, np.int32)
        c = qc[None, :, :] + offs[:, None, :]
        inb = jnp.all((c[..., :2] >= 0)
                      & (c[..., :2] < jnp.asarray(dims[:2], jnp.int32)), -1)
        q = (c[..., 0] * dims[1] + c[..., 1]) * dims[2] + c[..., 2]
        q = jnp.where(inb & qvalid[None, :], q, total + 1)
        i_m1, i_0, i_p1 = _probe3(ovmap, q)
        i_m1 = jnp.where((qc[:, 2] > 0)[None, :], i_m1, V)
        i_p1 = jnp.where((qc[:, 2] < X - 1)[None, :], i_p1, V)
        return jnp.stack([i_m1, i_0, i_p1], 1).reshape(-1, qc.shape[0])

    stages = [  # (dims, V, Nq) — bench caps, subm+strided query counts
        ((42, 1440, 1440), 30000, 84000),
        ((21, 720, 720), 54000, 85500),
        ((11, 360, 360), 31500, 52500),
        ((6, 180, 180), 21000, 21000),
    ]
    rng = np.random.default_rng(0)
    for dims, V, Nq in stages:
        Z, Y, X = dims
        total = Z * Y * X
        n_real = int(V * 0.9)
        ids = np.sort(rng.choice(total, size=n_real, replace=False))
        coords = np.stack([ids // (Y * X), (ids // X) % Y, ids % X], 1)
        coords = np.concatenate(
            [coords, np.zeros((V - n_real, 3), np.int64)]).astype(np.int32)
        valid = np.arange(V) < n_real
        sent = total
        gids = np.where(valid, (coords[:, 0] * Y + coords[:, 1]) * X
                        + coords[:, 2], sent).astype(np.int32)
        grid = SparseGrid(coords=jnp.asarray(coords), ids=jnp.asarray(gids),
                          valid=jnp.asarray(valid))
        # queries: random real site centers (mimics subm+strided probes)
        qsel = rng.integers(0, n_real, Nq)
        qc = jnp.asarray(coords[qsel])
        qv = jnp.ones((Nq,), bool)

        ov = jax.jit(lambda g: _dense_rows_ov(g, dims))
        t2 = jax.jit(lambda g: build_tile2d(g, dims))
        t_build_ov = chain_ms(
            lambda s: ov(grid._replace(ids=grid.ids + s * 0))[:1, :1]
            .astype(jnp.float32), jnp.float32(0))
        t_build_t2 = chain_ms(
            lambda s: t2(grid._replace(ids=grid.ids + s * 0))[:1, :1]
            .astype(jnp.float32), jnp.float32(0))

        ovmap = ov(grid)
        tmap = t2(grid)
        p_ov = jax.jit(lambda m, q: probe_ov_27(m, q, qv, dims, V))
        p_t2 = jax.jit(lambda m, q: probe_tile2d_27(m, q, qv, dims, V))
        # correctness first
        a = np.asarray(p_ov(ovmap, qc))
        b = np.asarray(p_t2(tmap, qc))
        # p_ov rows are (group-major 9 x 3 dx) == p_t2's (dz,dy,dx) order
        ok = (a == b).all()
        t_p_ov = chain_ms(lambda s: p_ov(
            ovmap, (qc + s.astype(jnp.int32) * 0)).sum(1, keepdims=True)[:1]
            .astype(jnp.float32), jnp.float32(0))
        t_p_t2 = chain_ms(lambda s: p_t2(
            tmap, (qc + s.astype(jnp.int32) * 0)).sum(1, keepdims=True)[:1]
            .astype(jnp.float32), jnp.float32(0))
        mb = tmap.size * 4 / 1e6
        print(f"dims={dims} V={V} Nq={Nq} t2map={mb:.0f}MB exact={ok}: "
              f"build ov {t_build_ov:5.2f} | t2 {t_build_t2:5.2f} || "
              f"probe27 ov {t_p_ov:5.2f} | t2 {t_p_t2:5.2f}")


if __name__ == "__main__":
    main()
