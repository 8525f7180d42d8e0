"""Submanifold / strided sparse 3D convolution — gather-scatter, static shapes.

TPU-native replacement for the spconv library consumed by the reference
middle encoder (`/root/reference/det3d/models/backbones/scn.py:2-3`,
SubMConv3d / SparseConv3d). No rulebook state machine, no dynamic shapes:

  * active sites live in fixed-capacity buffers: coords (V, 3) zyx sorted by
    linear id, features (V, C), validity mask
  * neighbor lookup through a dense cell->site index grid (one scatter +
    direct gathers; ~100x faster than searchsorted on TPU, whose binary
    search lowers to a serial gather chain) — one (K, V) table per topology
  * conv = for each of the K kernel offsets: gather -> (V, Cin) x (Cin, Cout)
    matmul -> accumulate. The matmuls batch onto the MXU; the gathers are
    HBM-bandwidth bound, which is the same regime spconv's CUDA kernels
    occupy.
  * strided conv ("generative" downsample): output sites = dedupe(coords//2),
    a sort + run-boundary compaction (same machinery as the voxelizer)

Submanifold convs (stride 1) share one neighbor table per stage — mirroring
spconv's indice_key caching (ref scn.py:20,99) at trace time for free.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class SparseGrid(NamedTuple):
    """Active-site set. `dims` is passed separately to every op (keeping it
    out of the pytree so grids cross jit boundaries without the static shape
    turning into a traced leaf).

    INVARIANT (load-bearing): `ids` ascend, with every invalid site holding
    the sentinel (= prod(dims)) at the tail. The dense-map builders
    (`_dense_index_rows`, `_dense_rows_ov`) scatter with
    `indices_are_sorted=True` and the xpack tables assume cell-triple
    members are contiguous array rows — an unsorted grid produces silently
    wrong maps ON TPU (no error). Build grids via `make_grid`, or only from
    sources that emit ascending-id order (`voxelize_mean` slots,
    `downsample_coords` outputs). `check_sorted` asserts the invariant in
    tests."""
    coords: jax.Array    # (V, 3) int32 zyx, sorted by linear id; -1 padded
    ids: jax.Array       # (V,) int32 linear ids; sentinel (=prod(dims)) padded
    valid: jax.Array     # (V,) bool


def check_sorted(grid: SparseGrid, dims) -> jax.Array:
    """True iff the SparseGrid invariant holds (ids ascend; invalids carry
    the sentinel at the tail). Test/debug helper — not called on hot paths."""
    sentinel = dims[0] * dims[1] * dims[2]
    ids = jnp.where(grid.valid, grid.ids, sentinel)
    return jnp.all(ids[1:] >= ids[:-1]) & jnp.all(
        jnp.where(grid.valid, grid.ids < sentinel, grid.ids == sentinel))


def linear_ids(coords, dims):
    z, y, x = coords[:, 0], coords[:, 1], coords[:, 2]
    return (z * dims[1] + y) * dims[2] + x


def make_grid(coords, valid, dims: Tuple[int, int, int]) -> SparseGrid:
    """coords (V,3) zyx (any order) -> sorted SparseGrid."""
    sentinel = dims[0] * dims[1] * dims[2]
    ids = jnp.where(valid, linear_ids(coords, dims), sentinel)
    order = jnp.argsort(ids)
    ids = ids[order]
    return SparseGrid(coords=coords[order], ids=ids, valid=ids < sentinel)


def _offsets(kernel: int = 3):
    r = kernel // 2
    out = []
    for dz in range(-r, r + 1):
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                out.append((dz, dy, dx))
    return out


_PROBE_LANES = 128


def _dense_index_rows(grid: SparseGrid, dims) -> jax.Array:
    """Dense cell -> site-index map, shaped (R, 128) int32 (V where empty).

    A scatter + direct lookups beats binary search by ~100x on TPU
    (searchsorted lowers to a serial gather chain per query). The map is
    row-shaped because PROBING it with single-int32 gathers is issue-rate
    bound (~17 ns/probe measured on v5e) while 512 B ROW gathers issue
    ~5x faster: `_probe` fetches the 128-lane row containing each cell and
    lane-selects on the VPU — 1.7x faster table builds end to end.

    Row count leaves >= `lanes` slack past cell `total` so the probe
    sentinel (cell == total, always V) can never collide with the scatter
    trash slot (last element) used for invalid sites.

    (int16 rows were tried for the 340 MB stage-0 map and measured
    SLOWER e2e — sub-word lane selects cost more than the halved gather
    traffic saves.)
    """
    V = grid.ids.shape[0]
    Z, Y, X = dims
    total = Z * Y * X
    L = _PROBE_LANES
    rows = -(-(total + 1) // L) + 1
    dense = jnp.full((rows * L,), V, jnp.int32)
    idx = jnp.where(grid.valid, grid.ids, rows * L - 1)
    # grid.ids ascend (sentinel padding at the end), so the scatter is sorted
    dense = dense.at[idx].set(jnp.arange(V, dtype=jnp.int32),
                              indices_are_sorted=True)
    return dense.reshape(rows, L)


def _probe(dense_rows: jax.Array, q: jax.Array) -> jax.Array:
    """Look up cells q (any shape, int32; pass `total` for a guaranteed-V
    sentinel) in a `_dense_index_rows` map."""
    L = dense_rows.shape[1]
    g = dense_rows[q // L]
    oh = (q % L)[..., None] == jnp.arange(L, dtype=jnp.int32)
    # exactly one lane survives per probe, so the sum is a select (and
    # cannot overflow int16 maps)
    return jnp.sum(jnp.where(oh, g, 0), axis=-1).astype(jnp.int32)


def neighbor_table(grid: SparseGrid, dims, kernel: int = 3,
                   dense_rows: jax.Array | None = None) -> jax.Array:
    """(K, V) gather indices into the site array; V (trash) where absent.

    Pass `dense_rows` (a `_dense_index_rows(grid, dims)` map) to share one
    map between this and `strided_gather_table` on the same grid."""
    V = grid.ids.shape[0]
    total = dims[0] * dims[1] * dims[2]
    dense = _dense_index_rows(grid, dims) if dense_rows is None \
        else dense_rows
    offs = np.array(_offsets(kernel), np.int32)            # (K, 3)
    c = grid.coords[None, :, :] + offs[:, None, :]         # (K, V, 3)
    inb = jnp.all((c >= 0) & (c < jnp.asarray(dims, jnp.int32)), axis=-1)
    q = (c[..., 0] * dims[1] + c[..., 1]) * dims[2] + c[..., 2]
    q = jnp.where(inb & grid.valid[None, :], q, total)
    return _probe(dense, q)                                # (K, V)


_OFFS9 = [(dz, dy, 0) for dz in (-1, 0, 1) for dy in (-1, 0, 1)]

# overlapped dense-map layout: rows of 128 lanes covering 126 cells each,
# with one halo lane on each side, so the row containing cell q also holds
# cells q-1 and q+1 — one probe fetch yields the whole x-triple
_OV_STRIDE = _PROBE_LANES - 2


# maps at or under this many cells build via the sorted main-lane scatter +
# halo-column rewrite (the full-array lane concat costs ~2 copies of the
# map, cheap for small maps, while dropping 2V of the 3V scatter issues:
# measured 1.63 -> 0.90 ms at stage-1 geometry, scripts/probe_mapbuild.py);
# larger maps (stage 0, ~345 MB) keep the 3V fused scatter — there the
# column rewrite's full-map copy costs more than the halo scatters
_COLFIX_MAX_CELLS = 32 * 1024 * 1024


def _dense_rows_ov(grid: SparseGrid, dims) -> jax.Array:
    """Overlapped cell -> site-index map, (R, 128) int32 (V where empty).

    Row r covers cells [126r - 1, 126r + 126] at lanes [0, 127]; cells on a
    126-boundary are written to two rows (halo lanes)."""
    V = grid.ids.shape[0]
    S, L = _OV_STRIDE, _PROBE_LANES
    total = dims[0] * dims[1] * dims[2]
    rows = total // S + 3
    dense = jnp.full((rows * L,), V, jnp.int32)
    ids = grid.ids
    r0 = ids // S
    trash = rows * L - 1
    p_main = jnp.where(grid.valid, r0 * L + ids - S * r0 + 1, trash)
    ar = jnp.arange(V, dtype=jnp.int32)
    if total <= _COLFIX_MAX_CELLS:
        # grid.ids ascend (sentinel-padded), so p_main ascends too — the
        # sorted single scatter + halo-column rewrite beats the 3V scatter
        d = dense.at[p_main].set(ar, indices_are_sorted=True).reshape(
            rows, L)
        # lane 0 of row r mirrors lane 126 of row r-1 (cell Sr - 1);
        # lane 127 of row r mirrors lane 1 of row r+1 (cell Sr + S)
        col0 = jnp.concatenate([d[:1, 0], d[:-1, S]])[:, None]
        colL = jnp.concatenate([d[1:, 1], d[-1:, L - 1]])[:, None]
        return jnp.concatenate([col0, d[:, 1:L - 1], colL], 1)
    # id == S*(r0+1) - 1 also sits at lane 0 of row r0+1
    p_next = jnp.where(grid.valid & (ids % S == S - 1),
                       (r0 + 1) * L, trash)
    # id == S*r0 also sits at lane 127 of row r0-1 (when r0 > 0)
    p_prev = jnp.where(grid.valid & (ids % S == 0) & (r0 > 0),
                       (r0 - 1) * L + L - 1, trash)
    # one fused scatter (three sequential .at[].set updates made XLA
    # materialize intermediate copies of the multi-hundred-MB map)
    dense = dense.at[jnp.concatenate([p_main, p_next, p_prev])].set(
        jnp.concatenate([ar, ar, ar]))
    return dense.reshape(rows, L)


def _probe_ov(dense_ov: jax.Array, q: jax.Array) -> jax.Array:
    """Single-cell lookup in an OVERLAPPED (`_dense_rows_ov`) map — the
    `_probe` equivalent for the packed-table layout (pass a cell >= total
    for a guaranteed-V sentinel)."""
    L = _PROBE_LANES
    S = _OV_STRIDE
    r = q // S
    g = dense_ov[r]
    oh = (q - S * r + 1)[..., None] == jnp.arange(L, dtype=jnp.int32)
    return jnp.sum(jnp.where(oh, g, 0), axis=-1).astype(jnp.int32)


def _probe3(dense_ov: jax.Array, q: jax.Array):
    """Look up cells (q-1, q, q+1) with ONE row fetch per query. q any
    shape int32 (pass a cell >= total for a guaranteed all-V sentinel)."""
    L = _PROBE_LANES
    S = _OV_STRIDE
    r = q // S
    g = dense_ov[r]                                        # (..., 128)
    lane = (q - S * r + 1)[..., None]
    ar = jnp.arange(L, dtype=jnp.int32)
    out = []
    for d in (-1, 0, 1):
        oh = lane + d == ar
        out.append(jnp.sum(jnp.where(oh, g, 0), axis=-1).astype(jnp.int32))
    return tuple(out)


# ---------------------------------------------------------------------------
# popcount-bitmap cell maps: 8 int32 lanes per 126-cell row instead of 128
# ---------------------------------------------------------------------------
# Same overlapped-row coverage as `_dense_rows_ov` (row r covers cells
# [126r - 1, 126r + 126] at lanes [0, 127]), but a row stores only
#   lane 0    : cum  = #sites with cell id < 126*r
#   lanes 1-4 : 128-bit presence bitmap (bit l of the 4 uint32 words ==
#               cell 126r - 1 + l is an active site)
#   lanes 5-7 : zero padding (8-lane rows gather at the same per-row cost)
# Site index recovery: sites are sorted by cell id, so the sites covered by
# a row are CONSECUTIVE array rows; index(cell at lane l) =
#   (cum - bit(lane 0)) + popcount(bits below l).
# The s0 map shrinks 345 MB -> ~22 MB, probes leave the large-operand
# gather-penalty regime (~6-10 ns/row -> ~3), and the build fill is 16x
# smaller. Semantics (V where absent, sentinel handling) match `_probe3`
# exactly — asserted bit-for-bit by tests/test_sparse_conv.py.

def _bitmap_rows_ov(grid: SparseGrid, dims) -> jax.Array:
    """Popcount-bitmap overlapped cell map, (R, 8) int32."""
    V = grid.ids.shape[0]
    S, L = _OV_STRIDE, _PROBE_LANES
    total = dims[0] * dims[1] * dims[2]
    rows = total // S + 3
    ids = grid.ids
    r0 = ids // S
    lane = ids - S * r0 + 1                                # [1, 126]
    trash = rows * 4
    words = jnp.zeros((rows * 4 + 1,), jnp.uint32)

    def entries(rr, ll, ok):
        w = jnp.where(ok, rr * 4 + (ll >> 5), trash)
        v = jnp.where(ok, jnp.left_shift(jnp.uint32(1),
                                         (ll & 31).astype(jnp.uint32)),
                      jnp.uint32(0))
        return w, v

    w_m, v_m = entries(r0, lane, grid.valid)
    # cell 126r also sits at lane 127 of row r-1; cell 126r - 1 at lane 0
    # of row r+1 (mirrors _dense_rows_ov's halo columns)
    w_n, v_n = entries(r0 - 1, jnp.full_like(lane, L - 1),
                       grid.valid & (lane == 1) & (r0 > 0))
    w_p, v_p = entries(r0 + 1, jnp.zeros_like(lane),
                       grid.valid & (lane == S))
    words = words.at[jnp.concatenate([w_m, w_n, w_p])].add(
        jnp.concatenate([v_m, v_n, v_p]))
    words = words[:-1].reshape(rows, 4)
    pc = lax.population_count(words)
    # unique (main, lanes 1..126) count per row = total bits - halo bits
    halo0 = (words[:, 0] & 1).astype(jnp.int32)
    halo127 = (words[:, 3] >> 31).astype(jnp.int32)
    unique = jnp.sum(pc, 1).astype(jnp.int32) - halo0 - halo127
    cum = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                           jnp.cumsum(unique)[:-1]])
    return jnp.concatenate(
        [cum[:, None],
         lax.bitcast_convert_type(words, jnp.int32).reshape(rows, 4),
         jnp.zeros((rows, 3), jnp.int32)], 1)


def _bm_lookup(row_words, row_pc, base, l, V):
    """Index of the site at lane l (int32, any shape) of gathered bitmap
    rows; V where absent. row_words (..., 4) uint32; row_pc (..., 4);
    base (...,) int32."""
    w = l >> 5
    b = (l & 31).astype(jnp.uint32)
    ar4 = jnp.arange(4, dtype=jnp.int32)
    word = jnp.sum(jnp.where(w[..., None] == ar4, row_words, 0), -1)
    present = ((word >> b) & 1).astype(bool)
    below = lax.population_count(
        word & (jnp.left_shift(jnp.uint32(1), b) - 1)).astype(jnp.int32)
    full = jnp.sum(jnp.where(w[..., None] > ar4,
                             row_pc.astype(jnp.int32), 0), -1)
    return jnp.where(present, base + full + below, V).astype(jnp.int32)


def _probe3_bm(bm: jax.Array, q: jax.Array, V: int):
    """`_probe3` on a `_bitmap_rows_ov` map (needs V explicitly — the
    bitmap stores ranks, not indices)."""
    S = _OV_STRIDE
    r = q // S
    row = bm[r]                                            # (..., 8)
    words = lax.bitcast_convert_type(row[..., 1:5], jnp.uint32)
    pc = lax.population_count(words)
    base = row[..., 0] - (words[..., 0] & 1).astype(jnp.int32)
    lane = q - S * r + 1                                   # [1, 126]
    return tuple(_bm_lookup(words, pc, base, lane + d, V)
                 for d in (-1, 0, 1))


def _probe_bm(bm: jax.Array, q: jax.Array, V: int):
    """Single-cell `_probe_ov` equivalent on a bitmap map."""
    S = _OV_STRIDE
    r = q // S
    row = bm[r]
    words = lax.bitcast_convert_type(row[..., 1:5], jnp.uint32)
    pc = lax.population_count(words)
    base = row[..., 0] - (words[..., 0] & 1).astype(jnp.int32)
    return _bm_lookup(words, pc, base, q - S * r + 1, V)


def _is_bitmap_map(m: jax.Array) -> bool:
    return m.ndim == 2 and m.shape[1] == 8


_XP_IDX_BITS = 20                 # site index (< 2^20; caps are <= 160k)
_XP_IDX_MASK = (1 << _XP_IDX_BITS) - 1


def _xpack_tables(query_cells, query_x, query_valid, dims, dense_ov, V):
    """(9, N) packed x-triple tables.

    query_cells (9, N): linear cell ids of each (dz, dy, 0) kernel-offset
    group center; query_x (N,): the x coordinate of the triple's middle
    cell (to invalidate wrap-around companions at x boundaries).

    Packed value = anchor | code_m1 << 20 | code_0 << 22 | code_p1 << 24,
    where anchor = array index of the first present member of the cell
    triple (V when none) and code_t in {0,1,2} is that member's lane in the
    3-row slab [anchor, anchor+1, anchor+2] (3 = absent). Present members
    of a cell triple are always CONTIGUOUS array rows: sites are sorted by
    cell id and the only cell between q-1 and q+1 is q itself."""
    total = dims[0] * dims[1] * dims[2]
    # sentinel total+1: _probe3 touches cells q-1..q+1, and total-1 is a
    # real cell — total+1 keeps the whole probed triple out of range
    q = jnp.where(query_valid, query_cells, total + 1)
    if _is_bitmap_map(dense_ov):
        i_m1, i_0, i_p1 = _probe3_bm(dense_ov, q, V)
    else:
        i_m1, i_0, i_p1 = _probe3(dense_ov, q)
    X = dims[2]
    i_m1 = jnp.where((query_x > 0)[None, :], i_m1, V)
    i_p1 = jnp.where((query_x < X - 1)[None, :], i_p1, V)
    anchor = jnp.minimum(jnp.minimum(i_m1, i_0), i_p1)
    code = []
    for idx in (i_m1, i_0, i_p1):
        c = jnp.where(idx < V, idx - anchor, 3)
        code.append(c.astype(jnp.int32))
    return (anchor
            | (code[0] << _XP_IDX_BITS)
            | (code[1] << (_XP_IDX_BITS + 2))
            | (code[2] << (_XP_IDX_BITS + 4)))


def subm_xpack_tables(grid: SparseGrid, dims,
                      dense_ov: jax.Array | None = None) -> jax.Array:
    """Packed x-triple tables for a submanifold conv: 9 probes instead of
    27 (the overlapped map's halo lanes carry the dx = +-1 cells)."""
    if dense_ov is None:
        dense_ov = _dense_rows_ov(grid, dims)
    offs = np.array(_OFFS9, np.int32)
    c = grid.coords[None, :, :] + offs[:, None, :]         # (9, V, 3)
    inb = jnp.all((c[..., :2] >= 0)
                  & (c[..., :2] < jnp.asarray(dims[:2], jnp.int32)), -1)
    q = (c[..., 0] * dims[1] + c[..., 1]) * dims[2] + c[..., 2]
    V = grid.ids.shape[0]
    return _xpack_tables(q, grid.coords[:, 2], inb & grid.valid[None, :],
                         dims, dense_ov, V)


def strided_xpack_tables(in_grid: SparseGrid, out_grid: SparseGrid, dims,
                         dense_ov: jax.Array | None = None,
                         pads: Tuple[int, int, int] = (1, 1, 1)) -> jax.Array:
    """Packed x-triple tables for the kernel-3 stride-2 conv with per-axis
    padding `pads`: middle cell of each triple = 2*out_coords +
    (dz + 1 - pz, dy + 1 - py, 1 - px). `dims` = INPUT grid dims."""
    if dense_ov is None:
        dense_ov = _dense_rows_ov(in_grid, dims)
    offs = np.array(_OFFS9, np.int32)
    shift = np.array([1 - pads[0], 1 - pads[1], 1 - pads[2]], np.int32)
    c = 2 * out_grid.coords[None, :, :] + offs[:, None, :] + shift
    inb = jnp.all((c[..., :2] >= 0)
                  & (c[..., :2] < jnp.asarray(dims[:2], jnp.int32)), -1)
    inb &= (c[..., 2] >= 0) & (c[..., 2] < dims[2])
    q = (c[..., 0] * dims[1] + c[..., 1]) * dims[2] + c[..., 2]
    V = in_grid.ids.shape[0]
    return _xpack_tables(q, 2 * out_grid.coords[:, 2] + shift[2],
                         inb & out_grid.valid[None, :], dims, dense_ov, V)


def unpack_xpack_tables(ptab: jax.Array, V: int) -> jax.Array:
    """Reconstruct a plain (27, N) gather table from packed x-triple tables
    — lets wide stages keep the (cheaper) 9-probe table build while running
    the stacked conv (whose gather wins at Cin >= 64 on v5e)."""
    a = ptab & _XP_IDX_MASK
    rows = []
    for shift in (_XP_IDX_BITS, _XP_IDX_BITS + 2, _XP_IDX_BITS + 4):
        code = (ptab >> shift) & 3
        rows.append(jnp.where(code < 3, a + code, V))       # (9, N)
    # k = 3g + dx_index: interleave group-major
    return jnp.stack(rows, 1).reshape(27, ptab.shape[1])


def _xpack_gcat(features, ptab, valid):
    """The x-packed gathered block (N, 27*Cin): for each kernel-offset
    group ONE (3*Cin)-wide row is fetched from the pre-widened operand
    wide[u] = [f[u], f[u+1], f[u+2]] (built by streaming shifts), then
    2-bit lane codes route the slab lanes to their dx taps.

    Routing formulation (probe_route3.py, v5e): the 27 per-tap
    "nl,nlc->nc" one-hot einsums below ARE the fast form — XLA fuses the
    three taps of a group into one slab traversal. The "obvious"
    single-read batched form ("ntl,nlc->ntc", one einsum per group) is
    2-3x SLOWER (1.61 -> 4.52 ms per Cin=32 conv at V=54k: batched tiny
    3x3 matmuls defeat the elementwise fusion). Do not re-explore."""
    V, Cin = features.shape
    N = ptab.shape[1]
    fv = jnp.where(valid[:, None], features, 0.0)
    ext = jnp.concatenate([fv, jnp.zeros((3, Cin), fv.dtype)], 0)
    wide = jnp.concatenate([ext[0:V + 1], ext[1:V + 2], ext[2:V + 3]], 1)
    blocks = []
    for g in range(9):
        t = ptab[g]
        a = t & _XP_IDX_MASK
        slab = wide[a].reshape(N, 3, Cin)
        for shift in (_XP_IDX_BITS, _XP_IDX_BITS + 2, _XP_IDX_BITS + 4):
            code = (t >> shift) & 3
            sel = (code[:, None] == jnp.arange(3, dtype=jnp.int32)
                   ).astype(fv.dtype)                      # (N, 3)
            # one-hot einsum routing (measured FASTER than jnp.where lane
            # selects at Cin >= 32 on v5e: 1.0 vs 2.9 ms at s1)
            blocks.append(jnp.einsum("nl,nlc->nc", sel, slab))
    return jnp.concatenate(blocks, 1)                      # (N, 27*Cin)


def conv_x3(features, ptab, valid, weights, bias=None):
    """x-packed gather conv — identical contraction to 'stacked' with 3x
    fewer, 3x wider gathers.

    features (V, Cin) input sites; ptab (9, N) packed tables
    (`subm_xpack_tables` / `strided_xpack_tables`); valid (V,) input-site
    mask. Measured on v5e at V=30k: 1.9-2.3x faster than stacked at
    Cin 16/32, 1.3-1.5x at 64/128 (and 8.7 -> 3.7 ms at V=120k train
    geometry). Training wraps it in the x-packed custom VJPs below."""
    K = weights.shape[0]
    Cin = features.shape[1]
    gcat = _xpack_gcat(features, ptab, valid)
    # match the gathered block's dtype (bf16 features must hit the MXU as
    # bf16xbf16 -> fp32, not get upcast back to fp32)
    w = weights.astype(gcat.dtype) if gcat.dtype != weights.dtype \
        else weights
    out = jnp.dot(gcat, w.reshape(K * Cin, -1),
                  preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


def pack_bf16_pairs(f: jax.Array) -> jax.Array:
    """fp32 (..., C) -> int32 (..., C//2): lane j packs bf16(channel 2j) in
    the high half-word and bf16(channel 2j+1) in the low (TRUNCATING
    round). Pure integer lane ops — bf16 arrays are never materialized, so
    the bf16-retiling relayout that killed the plain packed-gather variant
    (scripts/probe_packed_conv.py, ROADMAP round-4 dead ends) never
    happens."""
    b = lax.bitcast_convert_type(f, jnp.uint32)
    hi = b[..., 0::2] & jnp.uint32(0xFFFF0000)
    lo = b[..., 1::2] >> jnp.uint32(16)
    return lax.bitcast_convert_type(hi | lo, jnp.int32)


def unpack_pairs_fp32(p: jax.Array) -> jax.Array:
    """int32 (..., L) -> fp32 (..., 2L) ordered [even channels | odd
    channels] (each exactly the bf16-truncated original value)."""
    b = lax.bitcast_convert_type(p, jnp.uint32)
    hi = lax.bitcast_convert_type(b & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = lax.bitcast_convert_type(b << jnp.uint32(16), jnp.float32)
    return jnp.concatenate([hi, lo], -1)


def conv_x3_packed(features, ptab, valid, weights, bias=None):
    """Serving-mode conv_x3 on bf16-PAIR packed gathers: the slab rows are
    gathered as int32 bf16-pairs (HALF the lane count — XLA row gathers
    cost ~2.7 ns per <=128-LANE row, so 3*Cin in (128, 256] drops from 2
    issues to 1), the x-code routing runs as an int32 one-hot einsum (0/1
    multiply is exact on packed pairs), and the block is shift-unpacked to
    fp32 only once before the matmul (weights row-permuted to the
    [even | odd] unpack order). Numerics: == conv_x3 on bf16-truncated
    inputs (tests/test_sparse_conv.py). Measured v5e V=31.5k Cin=64:
    1.81 -> 1.36 ms (scripts/probe_shift_unpack.py); LOSES at Cin=32
    (rows already 1-issue) and vs stacked at Cin=128 — gate on
    128 < 3*Cin <= 256. Eval-only (integer bitcasts have no VJP)."""
    K, Cin, Cout = weights.shape
    assert Cin % 2 == 0, "packed pairs need even Cin"
    H = Cin // 2
    V = features.shape[0]
    N = ptab.shape[1]
    fp = pack_bf16_pairs(jnp.where(valid[:, None], features, 0.0))
    ext = jnp.concatenate([fp, jnp.zeros((3, H), jnp.int32)], 0)
    wide = jnp.concatenate([ext[0:V + 1], ext[1:V + 2], ext[2:V + 3]], 1)
    blocks = []
    for g in range(9):
        t = ptab[g]
        a = t & _XP_IDX_MASK
        slab = wide[a].reshape(N, 3, H)                  # int32 pairs
        for shift in (_XP_IDX_BITS, _XP_IDX_BITS + 2, _XP_IDX_BITS + 4):
            code = (t >> shift) & 3
            sel = (code[:, None] == jnp.arange(3, dtype=jnp.int32)
                   ).astype(jnp.int32)
            blocks.append(jnp.einsum("nl,nlc->nc", sel, slab))
    gcat = unpack_pairs_fp32(jnp.concatenate(blocks, 1))  # (N, K*Cin)
    w = weights.astype(jnp.float32)
    w_perm = jnp.concatenate([w[:, 0::2, :].reshape(-1, Cout),
                              w[:, 1::2, :].reshape(-1, Cout)], 0)
    out = jnp.dot(gcat, w_perm, preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias
    return out


def flip_xpack_tables(ptab: jax.Array) -> jax.Array:
    """Packed tables of the NEGATED kernel offsets: group g -> 8-g and the
    code_m1/code_p1 bit fields swap (x mirror); anchors are unchanged (the
    triple's member set is the same). For SUBMANIFOLD tables this aligns
    tap k with offset-(26-k), making the conv transpose another conv_x3:
    dx = conv_x3(gy, flip(ptab), valid, W.transpose(0, 2, 1))."""
    anchor = ptab & _XP_IDX_MASK
    c_m1 = (ptab >> _XP_IDX_BITS) & 3
    c_0 = (ptab >> (_XP_IDX_BITS + 2)) & 3
    c_p1 = (ptab >> (_XP_IDX_BITS + 4)) & 3
    return (anchor | (c_p1 << _XP_IDX_BITS) | (c_0 << (_XP_IDX_BITS + 2))
            | (c_m1 << (_XP_IDX_BITS + 4)))[::-1]


def _xpack_conv_sym_vjp(features, ptab, valid, weights, bias):
    """conv_x3 with the gather-transpose custom VJP for SUBMANIFOLD packed
    tables: backward = one flipped conv_x3 (dx) + one slab-gather matmul
    (dw = gcat^T @ gy) — both at x-packed speed instead of 27-row stacked
    gathers. Tables/valid are formal args with float0 cotangents (closures
    leak BatchTracers under the detector's nn.vmap)."""
    has_bias = bias is not None

    @jax.custom_vjp
    def f(x, pt, vld, w, b):
        return conv_x3(x, pt, vld, w, b if has_bias else None)

    def f_fwd(x, pt, vld, w, b):
        return f(x, pt, vld, w, b), (x, pt, vld, w)

    def f_bwd(res, gy):
        x, pt, vld, w = res
        K, Cin, Cout = w.shape
        dx = conv_x3(gy, flip_xpack_tables(pt), vld, w.transpose(0, 2, 1))
        dx = jnp.where(vld[:, None], dx, 0.0)
        gcat = _xpack_gcat(x, pt, vld)                     # (N, K*Cin)
        dw = jnp.dot(gcat.T, gy,
                     preferred_element_type=jnp.float32).reshape(
            K, Cin, Cout)
        db = jnp.sum(gy, 0) if has_bias else jnp.zeros((0,), gy.dtype)
        return (dx.astype(x.dtype), np.zeros(pt.shape, jax.dtypes.float0),
                np.zeros(vld.shape, jax.dtypes.float0),
                dw.astype(w.dtype), db)

    f.defvjp(f_fwd, f_bwd)
    return f(features, ptab, valid, weights,
             bias if has_bias else jnp.zeros((0,), features.dtype))


def _xpack_strided_vjp(features, ptab, valid, inv_table, weights, bias):
    """conv_x3 on STRIDED packed tables with a custom VJP: dx is a stacked
    gather over the precomputed inverse table (`strided_inverse_table` —
    strided tables are not offset-symmetric), dw reuses the slab-gathered
    block (gcat^T @ gy)."""
    has_bias = bias is not None

    @jax.custom_vjp
    def f(x, pt, vld, itab, w, b):
        return conv_x3(x, pt, vld, w, b if has_bias else None)

    def f_fwd(x, pt, vld, itab, w, b):
        return f(x, pt, vld, itab, w, b), (x, pt, vld, itab, w)

    def f_bwd(res, gy):
        x, pt, vld, itab, w = res
        K, Cin, Cout = w.shape
        dx = _gather_conv(gy, itab, w.transpose(0, 2, 1), None, None,
                          "stacked")
        gcat = _xpack_gcat(x, pt, vld)
        dw = jnp.dot(gcat.T, gy,
                     preferred_element_type=jnp.float32).reshape(
            K, Cin, Cout)
        db = jnp.sum(gy, 0) if has_bias else jnp.zeros((0,), gy.dtype)
        return (dx.astype(x.dtype), np.zeros(pt.shape, jax.dtypes.float0),
                np.zeros(vld.shape, jax.dtypes.float0),
                np.zeros(itab.shape, jax.dtypes.float0),
                dw.astype(w.dtype), db)

    f.defvjp(f_fwd, f_bwd)
    return f(features, ptab, valid, inv_table, weights,
             bias if has_bias else jnp.zeros((0,), features.dtype))


def _gather_conv(features, table, weights, bias, compute_dtype, algo):
    """The raw gather->matmul contraction (loop / stacked)."""
    V, Cin = features.shape
    K = table.shape[0]
    cd = compute_dtype or features.dtype
    padded = jnp.concatenate(
        [features.astype(cd), jnp.zeros((1, Cin), cd)], 0)
    w = weights.astype(cd)
    if algo == "stacked":
        N = table.shape[1]             # output sites (N < V for strided)
        g = padded[table]                                  # (K, N, Cin)
        g = jnp.moveaxis(g, 0, 1).reshape(N, K * Cin)
        out = jnp.dot(g, w.reshape(K * Cin, -1),
                      preferred_element_type=jnp.float32)
    else:
        out = None
        for k in range(K):
            g = padded[table[k]]                           # (V, Cin)
            acc = jnp.dot(g, w[k], preferred_element_type=jnp.float32)
            out = acc if out is None else out + acc
    if bias is not None:
        out = out + bias
    return out


def _subm_conv_sym_vjp(features, table, weights, bias, compute_dtype, algo):
    """Gather-conv with a custom VJP for SYMMETRIC (submanifold) tables.

    Autodiff of the gather emits 27xV scatter-adds for dX, which are ~7x
    the forward cost on TPU (measured 29.6 vs 3.5 ms at stage-1 train
    geometry). For a submanifold table the transpose is itself a gather:
    u = table[k][v]  <=>  v = table[K-1-k][u] (offset -o sits at row
    K-1-k of the row-major offset enumeration), so

        dX = gather_conv(dY, table, flip_k(W)^T)
        dW[k] = gather(X, table[k])^T @ dY
        db = sum(dY)

    — backward becomes two gather-passes instead of scatter-adds.

    `table` is a formal argument (float0 cotangent), NOT a closure: a
    closed-over table leaks a BatchTracer when the conv runs under the
    detector's nn.vmap.
    """
    has_bias = bias is not None

    @jax.custom_vjp
    def f(x, tab, w, b):
        return _gather_conv(x, tab, w, b if has_bias else None,
                            compute_dtype, algo)

    def f_fwd(x, tab, w, b):
        return f(x, tab, w, b), (x, tab, w)

    def f_bwd(res, gy):
        x, tab, w = res
        K, Cin, Cout = w.shape
        wT = jnp.flip(w, 0).transpose(0, 2, 1)          # (K, Cout, Cin)
        dx = _gather_conv(gy, tab, wT, None, compute_dtype, algo)
        padded = jnp.concatenate(
            [x, jnp.zeros((1, Cin), x.dtype)], 0)
        g = padded[tab]                                  # (K, V, Cin)
        # keep the weight-grad contraction in the same precision regime as
        # the forward (_gather_conv casts to compute_dtype when set)
        gc = g.astype(compute_dtype) if compute_dtype is not None else g
        gyc = gy.astype(compute_dtype) if compute_dtype is not None else gy
        dw = jnp.einsum("kvc,vo->kco", gc, gyc,
                        preferred_element_type=jnp.float32)
        db = jnp.sum(gy, 0) if has_bias else jnp.zeros((0,), gy.dtype)
        return (dx.astype(x.dtype), np.zeros(tab.shape, jax.dtypes.float0),
                dw.astype(w.dtype), db)

    f.defvjp(f_fwd, f_bwd)
    return f(features, table, weights,
             bias if has_bias else jnp.zeros((0,), features.dtype))


def strided_inverse_table(in_grid: SparseGrid, out_dims,
                          dense_rows_out: jax.Array,
                          kernel: int = 3, ov: bool = False,
                          pads: Tuple[int, int, int] = (1, 1, 1)) -> jax.Array:
    """(K, V_in) indices into OUTPUT sites: row k holds the output site o
    (V_out where none) with `strided_gather_table`'s tab[k][o] == u, i.e.
    2*o_coords + offs[k] + (1 - pads) == in_coords[u]. Each input site feeds
    at most one output per offset (oc = (c - off - 1 + pad) / 2 when the
    parity matches), so the transpose of a strided conv is again a gather —
    used by its custom VJP.
    `dense_rows_out` = `_dense_index_rows(out_grid, out_dims)`, or the
    `_dense_rows_ov` overlapped map with `ov=True` (the packed-table
    layout, so training can reuse the 9-probe builds' maps). Bitmap maps
    are not supported here (train-only path; the encoder builds ov maps
    under train)."""
    total = out_dims[0] * out_dims[1] * out_dims[2]
    offs = np.array(_offsets(kernel), np.int32)              # (K, 3)
    shift = np.array([1 - pads[0], 1 - pads[1], 1 - pads[2]], np.int32)
    num = in_grid.coords[None, :, :] - offs[:, None, :] - shift  # (K, V, 3)
    even = jnp.all(num % 2 == 0, axis=-1)
    oc = num // 2
    inb = jnp.all((oc >= 0) & (oc < jnp.asarray(out_dims, jnp.int32)),
                  axis=-1)
    q = (oc[..., 0] * out_dims[1] + oc[..., 1]) * out_dims[2] + oc[..., 2]
    q = jnp.where(even & inb & in_grid.valid[None, :], q, total)
    assert not _is_bitmap_map(dense_rows_out), \
        "inverse tables require an ov/plain map (train path builds those)"
    return _probe_ov(dense_rows_out, q) if ov else _probe(dense_rows_out, q)


def _strided_conv_vjp(features, table, inv_table, weights, bias,
                      compute_dtype, algo):
    """Gather-conv with a custom VJP for STRIDED tables, using the
    precomputed inverse table (see `strided_inverse_table`):

        dX = gather_conv(dY, inv_table, W^T)     (no offset flip)
        dW[k] = gather(X, table[k])^T @ dY

    Tables are formal arguments (float0 cotangents) — see
    `_subm_conv_sym_vjp` for why closures leak under vmap.
    """
    has_bias = bias is not None

    @jax.custom_vjp
    def f(x, tab, itab, w, b):
        return _gather_conv(x, tab, w, b if has_bias else None,
                            compute_dtype, algo)

    def f_fwd(x, tab, itab, w, b):
        return f(x, tab, itab, w, b), (x, tab, itab, w)

    def f_bwd(res, gy):
        x, tab, itab, w = res
        K, Cin, Cout = w.shape
        dx = _gather_conv(gy, itab, w.transpose(0, 2, 1), None,
                          compute_dtype, algo)
        padded = jnp.concatenate([x, jnp.zeros((1, Cin), x.dtype)], 0)
        g = padded[tab]                                  # (K, N, Cin)
        # match the forward's compute_dtype regime (see _subm_conv_sym_vjp)
        gc = g.astype(compute_dtype) if compute_dtype is not None else g
        gyc = gy.astype(compute_dtype) if compute_dtype is not None else gy
        dw = jnp.einsum("kvc,vo->kco", gc, gyc,
                        preferred_element_type=jnp.float32)
        db = jnp.sum(gy, 0) if has_bias else jnp.zeros((0,), gy.dtype)
        return (dx.astype(x.dtype), np.zeros(tab.shape, jax.dtypes.float0),
                np.zeros(itab.shape, jax.dtypes.float0),
                dw.astype(w.dtype), db)

    f.defvjp(f_fwd, f_bwd)
    return f(features, table, inv_table, weights,
             bias if has_bias else jnp.zeros((0,), features.dtype))


def subm_conv_apply(features, table, weights, bias=None,
                    compute_dtype=None, algo: str = "loop",
                    symmetric: bool = False,
                    inverse_table=None, packed_pairs: bool = False):
    """Submanifold conv: features (V, Cin), table (K, V), weights (K, Cin, Cout).

    Output defined on the SAME active sites (submanifold semantics,
    ref spconv SubMConv3d). compute_dtype=bf16 was measured SLOWER on v5e
    (241 -> 328 ms full encoder: sub-word gathers cost more than the halved
    traffic saves), so fp32 is the default; the knob remains for future
    hardware.

    algo:
      "loop"    — K separate gather -> (V,Cin)x(Cin,Cout) matmuls. Small-K
                  contraction (e.g. 16) underutilizes the 128-deep MXU but
                  streams the accumulator.
      "stacked" — one (K,V,Cin) gather transposed to (V, K*Cin), then a
                  single K*Cin-deep matmul: full MXU utilization at the cost
                  of materializing the gathered block.
      "hybrid"  — Pallas windowed row-select for narrow inputs (Cin <= 16,
                  where the packed one-hot matmuls beat XLA's serialized
                  row gathers on v5e: 8.6 vs 10.9 ms at stage-0 geometry),
                  "stacked" for wide ones (window FLOPs scale with Cin and
                  lose past Cin=32).

    symmetric: set True when `table` is a SUBMANIFOLD neighbor table (from
    `neighbor_table` — NOT a strided table): enables the gather-transpose
    custom VJP (see `_subm_conv_sym_vjp`), making backward ~2x forward
    instead of ~7x. For strided tables pass `inverse_table`
    (`strided_inverse_table`) instead for the same effect. Both apply only
    to the differentiable loop/stacked paths.
    """
    if algo == "xpack":
        # x-packed path: `table` is (packed_tables, input_valid) from
        # subm_xpack_tables / strided_xpack_tables (see conv_x3). Under
        # training the custom VJPs keep backward at x-packed speed too.
        ptab, valid_in = table
        if packed_pairs:
            # bf16-pair serving mode (eval-only: no VJP) — see
            # conv_x3_packed for the win regime / numerics contract
            return conv_x3_packed(features, ptab, valid_in, weights, bias)
        if symmetric:
            return _xpack_conv_sym_vjp(features, ptab, valid_in, weights,
                                       bias)
        if inverse_table is not None:
            return _xpack_strided_vjp(features, ptab, valid_in,
                                      inverse_table, weights, bias)
        return conv_x3(features, ptab, valid_in, weights, bias)
    if isinstance(table, tuple):
        # packed tables handed to a non-xpack algo (wide stages keep the
        # 9-probe table build but run the stacked conv) — reconstruct the
        # plain 27-row table
        ptab, valid_in = table
        table = unpack_xpack_tables(ptab, valid_in.shape[0])
    if symmetric and algo in ("loop", "stacked"):
        return _subm_conv_sym_vjp(features, table, weights, bias,
                                  compute_dtype, algo)
    if inverse_table is not None and algo in ("loop", "stacked"):
        return _strided_conv_vjp(features, table, inverse_table, weights,
                                 bias, compute_dtype, algo)
    if algo == "hybrid":
        # real-TPU only: off-TPU the window kernel would run in interpret
        # mode (slow python loop per grid step, and jaxlib 0.9.0's CPU
        # backend has crashed under many interpret-mode compilations in
        # one process) — stacked is the portable equivalent
        Cin = features.shape[-1]
        if (Cin <= 16 and 128 % Cin == 0
                and jax.default_backend() == "tpu"):
            from .pallas_gather import subm_conv_auto
            return subm_conv_auto(
                features, table, weights, bias, W=2048, B=1024,
                compute_dtype=jnp.float32, interpret=False)
        algo = "stacked"
    if algo in ("window", "window_bf16"):
        # Pallas windowed-gather path (MXU row-select; see pallas_gather).
        # Exact in "window" (fp32 select); "window_bf16" quantizes the
        # gathered rows to bf16. Single-sample (unbatched) calls only —
        # under vmap the overflow cond degenerates to select-both.
        from .pallas_gather import subm_conv_auto
        return subm_conv_auto(
            features, table, weights, bias,
            compute_dtype=jnp.bfloat16 if algo == "window_bf16"
            else jnp.float32,
            interpret=jax.default_backend() != "tpu")

    return _gather_conv(features, table, weights, bias, compute_dtype, algo)


def downsample_coords(grid: SparseGrid, out_dims: Tuple[int, int, int],
                      max_out: int,
                      pads: Tuple[int, int, int] = (1, 1, 1),
                      with_dropped: bool = False):
    """Output sites of a kernel-3 stride-2 sparse conv with per-axis padding
    `pads` — spconv's GENERATIVE rule: every output position that receives at
    least one active input under the conv footprint is active. Matches the
    reference's SparseConv3d site semantics exactly (scn.py:109-146; note
    conv4 uses z padding 0, giving the 41->21->11->5 depth chain).

    Per axis, input p reaches q = (p + pad - k) / 2 for k in {0, 1, 2} of
    matching parity: always hi = (p + pad) // 2, plus hi - 1 when p + pad is
    even — so each active input yields up to 8 candidate output sites.
    Candidates are deduped by a sort + run-boundary compaction (TPU scatters
    are issue-bound; the sort+gather is cheaper) and coords are decoded from
    the ids. Overflow past `max_out` drops the largest linear ids — the
    reference spconv NEVER drops (it allocates per-scene), so callers should
    pass `with_dropped=True` to receive `(grid, n_dropped)` and surface the
    count (the middle encoder sows it; a nonzero value means this forward
    has left reference semantics)."""
    sentinel = out_dims[0] * out_dims[1] * out_dims[2]
    p = grid.coords + jnp.asarray(pads, jnp.int32)
    hi = p // 2                                    # (V, 3)
    has2 = (p % 2) == 0          # second candidate hi-1 exists per axis
    odz = jnp.asarray(out_dims, jnp.int32)
    cands = []
    for bz in (0, 1):
        for by in (0, 1):
            for bx in (0, 1):
                sel = np.array([bz, by, bx], np.int32)
                q = hi - sel
                ok = grid.valid & jnp.all((q >= 0) & (q < odz), -1)
                ok &= jnp.all((sel == 0) | has2, -1)
                cands.append(jnp.where(ok, linear_ids(q, out_dims),
                                       sentinel))
    sids = jnp.sort(jnp.concatenate(cands))
    n_all = sids.shape[0]                          # 8V
    is_first = (sids < sentinel) & jnp.concatenate(
        [jnp.ones((1,), bool), sids[1:] != sids[:-1]])
    pad_n = max(max_out - n_all, 0) + 1      # static; covers n_all < max_out
    fp = jnp.sort(jnp.concatenate(
        [jnp.where(is_first, jnp.arange(n_all, dtype=jnp.int32), n_all),
         jnp.full((pad_n,), n_all, jnp.int32)]))[:max_out]
    got = fp < n_all
    out_ids = jnp.where(got, sids[jnp.minimum(fp, n_all - 1)], sentinel
                        ).astype(jnp.int32)
    oz = out_ids // (out_dims[1] * out_dims[2])
    oy = (out_ids // out_dims[2]) % out_dims[1]
    ox = out_ids % out_dims[2]
    out_coords = jnp.where(got[:, None],
                           jnp.stack([oz, oy, ox], -1).astype(jnp.int32), -1)
    out = SparseGrid(coords=out_coords, ids=out_ids, valid=got)
    if with_dropped:
        n_unique = jnp.sum(is_first.astype(jnp.int32))
        n_kept = jnp.sum(got.astype(jnp.int32))
        return out, n_unique - n_kept
    return out


def strided_gather_table(in_grid: SparseGrid, out_grid: SparseGrid, dims,
                         kernel: int = 3,
                         dense_rows: jax.Array | None = None,
                         pads: Tuple[int, int, int] = (1, 1, 1)) -> jax.Array:
    """(K, V_out) indices into input sites for a kernel-3 stride-2 conv with
    per-axis padding `pads`: input position for output o and offset index k
    is 2*o + k - pad. `dims` = INPUT grid dims. `dense_rows`: share the
    input grid's cell map (see `neighbor_table`)."""
    total = dims[0] * dims[1] * dims[2]
    dense = _dense_index_rows(in_grid, dims) if dense_rows is None \
        else dense_rows
    offs = np.array(_offsets(kernel), np.int32)            # (K, 3)
    shift = np.array([1 - pads[0], 1 - pads[1], 1 - pads[2]], np.int32)
    c = 2 * out_grid.coords[None, :, :] + offs[:, None, :] + shift
    inb = jnp.all((c >= 0) & (c < jnp.asarray(dims, jnp.int32)), axis=-1)
    q = (c[..., 0] * dims[1] + c[..., 1]) * dims[2] + c[..., 2]
    q = jnp.where(inb & out_grid.valid[None, :], q, total)
    return _probe(dense, q)


def scatter_dense(features, grid: SparseGrid, dims):
    """(V, C) active features -> dense (Z, Y, X, C)."""
    Z, Y, X = dims
    idx = jnp.where(grid.valid, grid.ids, Z * Y * X)
    canvas = jnp.zeros((Z * Y * X + 1, features.shape[-1]), features.dtype)
    # grid.ids ascend with sentinel padding at the end -> sorted scatter
    canvas = canvas.at[idx].set(
        jnp.where(grid.valid[:, None], features, 0.0),
        indices_are_sorted=True)
    return canvas[:-1].reshape(Z, Y, X, features.shape[-1])
