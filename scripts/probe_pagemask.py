"""Probe: page/bitmask neighbor tables vs the dense overlapped-row map.

The s0 table build (grid 1440x1440x41 = 85M cells) pays for a 345 MB dense
cell->site map: init write + 3V-row scatter + 9V row-gathers from a huge
operand (~17 ns each). Two-level alternative: pages of 32 cells, each page
an (int32 base_site_idx, uint32 occupancy_mask) pair in a (P, 2) array
(21 MB at s0). A probe gathers the 8 B page rows covering the x-triple and
computes site indices with population_count: sites are sorted by linear id,
so site_idx(cell) = base(page) + popcount(mask & below(cell)).

Validates exact equality with subm_xpack_tables and times both at every
stage geometry of forecast_n3dtf bench capacity.
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
    from futuredet_tpu.ops import sparse_conv as SC

    PAGE = 32

    def build_pages(grid, dims):
        """(P, 2) int32 rows: [base_site_idx, occupancy_mask]."""
        Z, Y, X = dims
        total = Z * Y * X
        P = total // PAGE + 2
        V = grid.ids.shape[0]
        ids = grid.ids
        pg = jnp.where(grid.valid, ids // PAGE, P - 1)       # trash last
        bit = jnp.where(grid.valid,
                        (jnp.uint32(1) << (ids % PAGE).astype(jnp.uint32)),
                        jnp.uint32(0))
        masks = jnp.zeros((P,), jnp.uint32).at[pg].add(bit)
        first = jnp.concatenate([jnp.ones((1,), bool), pg[1:] != pg[:-1]])
        base_pg = jnp.where(first & grid.valid, pg, P - 1)
        bases = jnp.zeros((P,), jnp.int32).at[base_pg].set(
            jnp.arange(V, dtype=jnp.int32), mode="drop")
        return jnp.stack([bases, masks.astype(jnp.int32)], axis=1)  # (P,2)

    def probe_triple(pages, q, V, total):
        """site indices of cells (q-1, q, q+1); V where absent. q int32 any
        shape; out-of-range cells must be pre-sentineled to >= total."""
        P = pages.shape[0]
        out = []
        qm = jnp.clip(q - 1, 0, (P - 1) * PAGE)
        qp = jnp.clip(q + 1, 0, (P - 1) * PAGE)
        rowA = pages[jnp.minimum(qm // PAGE, P - 1)]          # (..., 2)
        rowB = pages[jnp.minimum(qp // PAGE, P - 1)]
        for d, row_sel in ((-1, 0), (0, None), (1, 1)):
            m = q + d
            pg = m // PAGE
            use_a = pg == jnp.minimum(qm // PAGE, P - 1)
            row = jnp.where(use_a[..., None], rowA, rowB)
            base, mask = row[..., 0], row[..., 1].astype(jnp.uint32)
            lane = (m % PAGE).astype(jnp.uint32)
            present = ((mask >> lane) & 1).astype(bool)
            below = mask & ((jnp.uint32(1) << lane) - 1)
            idx = base + jax.lax.population_count(below).astype(jnp.int32)
            inrange = (m >= 0) & (m < total)
            out.append(jnp.where(present & inrange, idx, V))
        return out

    def xpack_pages(grid, dims, pages=None):
        """subm_xpack_tables built from the page/bitmask structure."""
        if pages is None:
            pages = build_pages(grid, dims)
        offs = np.array(SC._OFFS9, np.int32)
        c = grid.coords[None, :, :] + offs[:, None, :]
        inb = jnp.all((c[..., :2] >= 0)
                      & (c[..., :2] < jnp.asarray(dims[:2], jnp.int32)), -1)
        q = (c[..., 0] * dims[1] + c[..., 1]) * dims[2] + c[..., 2]
        total = dims[0] * dims[1] * dims[2]
        V = grid.ids.shape[0]
        q = jnp.where(inb & grid.valid[None, :], q, total + PAGE)
        i_m1, i_0, i_p1 = probe_triple(pages, q, V, total)
        X = dims[2]
        qx = grid.coords[:, 2]
        i_m1 = jnp.where((qx > 0)[None, :], i_m1, V)
        i_p1 = jnp.where((qx < X - 1)[None, :], i_p1, V)
        anchor = jnp.minimum(jnp.minimum(i_m1, i_0), i_p1)
        packed = anchor
        for s, idx in zip((SC._XP_IDX_BITS, SC._XP_IDX_BITS + 2,
                           SC._XP_IDX_BITS + 4), (i_m1, i_0, i_p1)):
            code = jnp.where(idx < V, idx - anchor, 3)
            packed = packed | (code.astype(jnp.int32) << s)
        return packed

    stages = [
        ("s0", 30000, (42, 1440, 1440)),
        ("s1", 30000, (22, 720, 720)),
        ("s2", 30000, (12, 360, 360)),
        ("s3", 16000, (7, 180, 180)),
    ]
    rng = np.random.default_rng(0)
    for name, V, dims in stages:
        Z, Y, X = dims
        total = Z * Y * X
        n = int(V * 0.9)
        ids = rng.choice(total, size=n, replace=False).astype(np.int64)
        coords = np.stack([ids // (Y * X), (ids // X) % Y, ids % X],
                          1).astype(np.int32)
        coords = np.concatenate(
            [coords, np.zeros((V - n, 3), np.int32)], 0)
        valid = np.arange(V) < n
        grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)

        ref = jax.jit(lambda g: SC.subm_xpack_tables(g, dims))(grid)
        new = jax.jit(lambda g: xpack_pages(g, dims))(grid)
        eq = bool(jnp.all(ref == new))

        t_ref = chain_ms(
            lambda z: SC.subm_xpack_tables(
                grid._replace(ids=grid.ids + z.astype(jnp.int32)), dims),
            jnp.zeros(()), iters=50)
        t_new = chain_ms(
            lambda z: xpack_pages(
                grid._replace(ids=grid.ids + z.astype(jnp.int32)), dims),
            jnp.zeros(()), iters=50)
        print(f"{name}  V={V:6d} grid={Z}x{Y}x{X}: exact={eq}  "
              f"dense-ov {t_ref:6.2f} ms  pagemask {t_new:6.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
