"""Sparse conv primitives vs dense 3D conv oracle."""
import numpy as np
import jax
import jax.numpy as jnp

from futuredet_tpu.ops import sparse_conv as SC
import pytest


def _rand_sparse(seed, dims=(8, 10, 12), n=60, V=128, C=4):
    rng = np.random.default_rng(seed)
    # unique coords
    lin = rng.choice(dims[0] * dims[1] * dims[2], n, replace=False)
    z = lin // (dims[1] * dims[2])
    y = (lin // dims[2]) % dims[1]
    x = lin % dims[2]
    coords = np.zeros((V, 3), np.int32)
    coords[:n] = np.stack([z, y, x], -1)
    valid = np.zeros(V, bool)
    valid[:n] = True
    feats = np.zeros((V, C), np.float32)
    feats[:n] = rng.normal(size=(n, C))
    return coords, valid, feats


def _dense_from_sparse(coords, valid, feats, dims):
    d = np.zeros(dims + (feats.shape[-1],), np.float32)
    for c, v, f in zip(coords, valid, feats):
        if v:
            d[c[0], c[1], c[2]] = f
    return d


def test_subm_conv_matches_dense_conv_on_active_sites():
    dims = (8, 10, 12)
    coords, valid, feats = _rand_sparse(0, dims)
    rng = np.random.default_rng(1)
    Cout = 5
    W = rng.normal(size=(27, 4, Cout)).astype(np.float32) * 0.1

    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    # features must follow the grid's sort order
    order = np.argsort(np.where(valid,
                                (coords[:, 0] * dims[1] + coords[:, 1])
                                * dims[2] + coords[:, 2], np.prod(dims)))
    sfeats = feats[order]
    table = SC.neighbor_table(grid, dims)
    out = np.asarray(SC.subm_conv_apply(jnp.asarray(sfeats), table,
                                        jnp.asarray(W), compute_dtype=None))
    out_bf16 = np.asarray(SC.subm_conv_apply(jnp.asarray(sfeats), table,
                                             jnp.asarray(W)))
    np.testing.assert_allclose(out_bf16, out, rtol=2e-2, atol=2e-2)

    # dense oracle: full 3x3x3 conv, then evaluated AT the active sites only
    dense = _dense_from_sparse(coords, valid, feats, dims)
    ref = np.zeros(dims + (Cout,), np.float32)
    k = 0
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                shifted = np.zeros_like(dense)
                zs = slice(max(dz, 0), dims[0] + min(dz, 0))
                zd = slice(max(-dz, 0), dims[0] + min(-dz, 0))
                ys = slice(max(dy, 0), dims[1] + min(dy, 0))
                yd = slice(max(-dy, 0), dims[1] + min(-dy, 0))
                xs = slice(max(dx, 0), dims[2] + min(dx, 0))
                xd = slice(max(-dx, 0), dims[2] + min(-dx, 0))
                shifted[zd, yd, xd] = dense[zs, ys, xs]
                ref += shifted @ W[k]
                k += 1

    g_coords = np.asarray(grid.coords)
    g_valid = np.asarray(grid.valid)
    for i in range(len(g_valid)):
        if not g_valid[i]:
            continue
        z, y, x = g_coords[i]
        np.testing.assert_allclose(out[i], ref[z, y, x], rtol=1e-4, atol=1e-5)


def _footprint_sites_oracle(coords, valid, dims, out_dims, pads):
    """spconv generative rule, densely: output site q is active iff any
    active input lies under its kernel-3 stride-2 window (input position
    2q + k - pad, k in 0..2 per axis)."""
    dense = np.zeros(dims, bool)
    for c, v in zip(coords, valid):
        if v:
            dense[tuple(c)] = True
    got, covered = set(), set()
    for qz in range(out_dims[0]):
        for qy in range(out_dims[1]):
            for qx in range(out_dims[2]):
                for kz in range(3):
                    for ky in range(3):
                        for kx in range(3):
                            p = (2 * qz + kz - pads[0],
                                 2 * qy + ky - pads[1],
                                 2 * qx + kx - pads[2])
                            if all(0 <= pi < di
                                   for pi, di in zip(p, dims)) \
                                    and dense[p]:
                                got.add((qz, qy, qx))
                                covered.add(p)
    return got, covered


@pytest.mark.slow
def test_downsample_footprint_rule_and_strided_table_hits():
    """downsample_coords implements spconv's generative output-site rule
    (ref SparseConv3d, scn.py:109-146), incl. the z-pad-0 variant of
    conv4."""
    dims = (8, 8, 8)
    coords = np.array([[0, 0, 0], [0, 0, 1], [1, 1, 1], [2, 2, 2], [7, 7, 7],
                       [3, 6, 2], [4, 4, 4]], np.int32)
    V = 16
    c = np.zeros((V, 3), np.int32)
    c[:7] = coords
    valid = np.zeros(V, bool)
    valid[:7] = True
    grid = SC.make_grid(jnp.asarray(c), jnp.asarray(valid), dims)

    for pads in ((1, 1, 1), (0, 1, 1)):
        out_dims = tuple((d + 2 * p - 3) // 2 + 1 for d, p in zip(dims, pads))
        ng = SC.downsample_coords(grid, out_dims, 64, pads)
        got = {tuple(x) for x, v in zip(np.asarray(ng.coords).tolist(),
                                        np.asarray(ng.valid).tolist()) if v}
        want, covered = _footprint_sites_oracle(c, valid, dims, out_dims,
                                                pads)
        assert got == want, pads

        tbl = np.asarray(SC.strided_gather_table(grid, ng, dims, pads=pads))
        # every conv-covered input voxel must be reachable from some
        # (offset, out) pair (with z pad 0 the last z rows are never read,
        # exactly like a dense stride-2 conv)
        hit_inputs = set(tbl[tbl < V].tolist())
        g_coords = np.asarray(grid.coords)
        covered_idx = {i for i in range(V)
                       if np.asarray(grid.valid)[i]
                       and tuple(g_coords[i]) in covered}
        assert covered_idx <= hit_inputs, pads


@pytest.mark.slow
def test_voxelnet_sparse_forward_and_grads():
    from futuredet_tpu.models.detector import build_detector
    from tests.test_models import tiny_cfg, rand_points

    cfg = tiny_cfg(1, False, False, detector="voxelnet")
    model = build_detector(cfg)
    pts, valid = rand_points(B=2, P=cfg.voxel.max_points)
    variables = model.init(jax.random.PRNGKey(0), pts, valid, train=False)
    preds = model.apply(variables, pts, valid, train=False)
    W, H = cfg.feature_map_size
    assert preds[0]["hm"].shape == (2, H, W, 1)
    assert np.isfinite(np.asarray(preds[0]["hm"])).all()


def test_stacked_algo_matches_loop():
    dims = (8, 10, 12)
    coords, valid, feats = _rand_sparse(3, dims)
    rng = np.random.default_rng(4)
    W = rng.normal(size=(27, 4, 6)).astype(np.float32) * 0.1
    b = rng.normal(size=(6,)).astype(np.float32)

    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    order = np.argsort(np.where(valid,
                                (coords[:, 0] * dims[1] + coords[:, 1])
                                * dims[2] + coords[:, 2], np.prod(dims)))
    sfeats = jnp.asarray(feats[order])
    table = SC.neighbor_table(grid, dims)
    loop = SC.subm_conv_apply(sfeats, table, jnp.asarray(W), jnp.asarray(b),
                              algo="loop")
    stacked = SC.subm_conv_apply(sfeats, table, jnp.asarray(W),
                                 jnp.asarray(b), algo="stacked")
    np.testing.assert_allclose(np.asarray(stacked), np.asarray(loop),
                               rtol=1e-5, atol=1e-5)


def test_xpack_algo_matches_stacked_exactly():
    """x-packed conv (9 probes + adjacency-derived dx taps) must be
    BITWISE identical to stacked: the gathered (V, 27*Cin) block is the
    same matrix, contracted by the same matmul."""
    for seed in range(6):
        dims = (6, 9, 11)
        coords, valid, feats = _rand_sparse(seed, dims)
        rng = np.random.default_rng(100 + seed)
        Cin = feats.shape[-1]
        W = rng.normal(size=(27, Cin, 6)).astype(np.float32) * 0.1
        b = rng.normal(size=(6,)).astype(np.float32)

        grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
        order = np.argsort(np.where(valid,
                                    (coords[:, 0] * dims[1] + coords[:, 1])
                                    * dims[2] + coords[:, 2],
                                    np.prod(dims)))
        sfeats = jnp.asarray(np.where(valid[order][:, None],
                                      feats[order], 0.0))
        table = SC.neighbor_table(grid, dims)
        stacked = SC.subm_conv_apply(sfeats, table, jnp.asarray(W),
                                     jnp.asarray(b), algo="stacked")
        ptab = SC.subm_xpack_tables(grid, dims)
        xp = SC.subm_conv_apply(
            sfeats, (ptab, grid.valid), jnp.asarray(W), jnp.asarray(b),
            algo="xpack")
        v = np.asarray(grid.valid)
        np.testing.assert_array_equal(np.asarray(xp)[v],
                                      np.asarray(stacked)[v],
                                      err_msg=f"seed {seed}")


def test_xpack_strided_matches_stacked_exactly():
    for seed in range(4):
        dims = (6, 10, 12)
        coords, valid, feats = _rand_sparse(20 + seed, dims)
        rng = np.random.default_rng(200 + seed)
        Cin = feats.shape[-1]
        W = rng.normal(size=(27, Cin, 5)).astype(np.float32) * 0.1

        grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
        order = np.argsort(np.where(valid,
                                    (coords[:, 0] * dims[1] + coords[:, 1])
                                    * dims[2] + coords[:, 2],
                                    np.prod(dims)))
        sfeats = jnp.asarray(np.where(valid[order][:, None],
                                      feats[order], 0.0))
        out_dims = tuple((d + 1) // 2 for d in dims)
        ngrid = SC.downsample_coords(grid, out_dims, 64)
        dtable = SC.strided_gather_table(grid, ngrid, dims)
        stacked = SC.subm_conv_apply(sfeats, dtable, jnp.asarray(W),
                                     algo="stacked")
        ptab = SC.strided_xpack_tables(grid, ngrid, dims)
        xp = SC.subm_conv_apply(sfeats, (ptab, grid.valid), jnp.asarray(W),
                                algo="xpack")
        nv = np.asarray(ngrid.valid)
        np.testing.assert_array_equal(np.asarray(xp)[nv],
                                      np.asarray(stacked)[nv],
                                      err_msg=f"seed {seed}")


def test_unpack_xpack_tables_reconstructs_plain_tables():
    """Packed 9-probe tables unpack to exactly the 27-row neighbor /
    strided tables (wide stages run stacked convs on the unpacked form)."""
    for seed in range(3):
        dims = (5, 9, 11)
        coords, valid, _ = _rand_sparse(40 + seed, dims)
        grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
        V = grid.ids.shape[0]
        np.testing.assert_array_equal(
            np.asarray(SC.unpack_xpack_tables(
                SC.subm_xpack_tables(grid, dims), V)),
            np.asarray(SC.neighbor_table(grid, dims)))
        out_dims = tuple((d + 1) // 2 for d in dims)
        ngrid = SC.downsample_coords(grid, out_dims, 64)
        np.testing.assert_array_equal(
            np.asarray(SC.unpack_xpack_tables(
                SC.strided_xpack_tables(grid, ngrid, dims), V)),
            np.asarray(SC.strided_gather_table(grid, ngrid, dims)))


@pytest.mark.slow
def test_xpack_x_boundary_no_wraparound():
    """x=0 / x=X-1 companions must not leak across y rows even though
    their linear ids are consecutive; full occupancy exercises every
    boundary pair."""
    dims = (2, 3, 4)
    zz, yy, xx = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    coords = np.stack([zz, yy, xx], -1).reshape(-1, 3).astype(np.int32)
    V = len(coords)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(V, 4)).astype(np.float32)
    W = rng.normal(size=(27, 4, 4)).astype(np.float32) * 0.1
    grid = SC.make_grid(jnp.asarray(coords), jnp.ones((V,), bool), dims)
    sfeats = jnp.asarray(feats)   # already id-ordered by construction
    table = SC.neighbor_table(grid, dims)
    stacked = SC.subm_conv_apply(sfeats, table, jnp.asarray(W),
                                 algo="stacked")
    ptab = SC.subm_xpack_tables(grid, dims)
    xp = SC.subm_conv_apply(sfeats, (ptab, grid.valid), jnp.asarray(W),
                            algo="xpack")
    np.testing.assert_array_equal(np.asarray(xp), np.asarray(stacked))


def test_stacked_algo_matches_loop_strided():
    dims = (8, 10, 12)
    coords, valid, feats = _rand_sparse(5, dims)
    rng = np.random.default_rng(6)
    W = rng.normal(size=(27, 4, 8)).astype(np.float32) * 0.1

    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    order = np.argsort(np.where(valid,
                                (coords[:, 0] * dims[1] + coords[:, 1])
                                * dims[2] + coords[:, 2], np.prod(dims)))
    sfeats = jnp.asarray(feats[order])
    out_dims = tuple((d + 1) // 2 for d in dims)
    ngrid = SC.downsample_coords(grid, out_dims, 64)
    dtable = SC.strided_gather_table(grid, ngrid, dims)
    loop = SC.subm_conv_apply(sfeats, dtable, jnp.asarray(W), algo="loop")
    stacked = SC.subm_conv_apply(sfeats, dtable, jnp.asarray(W),
                                 algo="stacked")
    np.testing.assert_allclose(np.asarray(stacked), np.asarray(loop),
                               rtol=1e-5, atol=1e-5)


def test_hybrid_algo_matches_loop():
    """hybrid = Pallas window for narrow Cin on real TPU, stacked
    otherwise (always stacked on CPU where this test runs; the window
    path's exactness is covered by test_pallas_gather in interpret
    mode) — must reproduce the loop gather exactly either way."""
    dims = (8, 10, 12)
    for cin, seed in [(4, 7), (6, 8)]:
        coords, valid, _ = _rand_sparse(seed, dims)
        rng = np.random.default_rng(seed)
        feats = rng.normal(size=(coords.shape[0], cin)).astype(np.float32)
        W = rng.normal(size=(27, cin, 6)).astype(np.float32) * 0.1
        b = rng.normal(size=(6,)).astype(np.float32)

        grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
        order = np.argsort(np.where(valid,
                                    (coords[:, 0] * dims[1] + coords[:, 1])
                                    * dims[2] + coords[:, 2], np.prod(dims)))
        sfeats = jnp.asarray(feats[order])
        table = SC.neighbor_table(grid, dims)
        loop = SC.subm_conv_apply(sfeats, table, jnp.asarray(W),
                                  jnp.asarray(b), algo="loop")
        hyb = SC.subm_conv_apply(sfeats, table, jnp.asarray(W),
                                 jnp.asarray(b), algo="hybrid")
        np.testing.assert_allclose(np.asarray(hyb), np.asarray(loop),
                                   rtol=1e-5, atol=1e-5)


def test_shared_dense_map_tables_match():
    """neighbor_table / strided_gather_table with an explicitly shared
    `_dense_index_rows` map must equal their self-built variants (the
    middle encoder shares one map per stage)."""
    dims = (8, 10, 12)
    coords, valid, _ = _rand_sparse(3, dims)
    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    dmap = SC._dense_index_rows(grid, dims)

    t0 = SC.neighbor_table(grid, dims)
    t1 = SC.neighbor_table(grid, dims, dense_rows=dmap)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))

    out_dims = tuple(max((d + 1) // 2, 1) for d in dims)
    ngrid = SC.downsample_coords(grid, out_dims, 64)
    s0 = SC.strided_gather_table(grid, ngrid, dims)
    s1 = SC.strided_gather_table(grid, ngrid, dims, dense_rows=dmap)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))


@pytest.mark.slow
def test_symmetric_custom_vjp_matches_autodiff():
    """The gather-transpose VJP (symmetric submanifold tables) must match
    plain autodiff gradients for features, weights and bias."""
    dims = (8, 10, 12)
    coords, valid, feats = _rand_sparse(11, dims)
    rng = np.random.default_rng(12)
    Cin, Cout = feats.shape[1], 6
    W = rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1
    b = rng.normal(size=(Cout,)).astype(np.float32)
    gy_seed = rng.normal(size=(feats.shape[0], Cout)).astype(np.float32)

    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    order = np.argsort(np.where(valid,
                                (coords[:, 0] * dims[1] + coords[:, 1])
                                * dims[2] + coords[:, 2], np.prod(dims)))
    x = jnp.asarray(feats[order])
    table = SC.neighbor_table(grid, dims)
    gy = jnp.asarray(gy_seed)

    for algo in ("loop", "stacked"):
        def loss(x, w, bb, symmetric):
            out = SC.subm_conv_apply(x, table, w, bb, algo=algo,
                                     symmetric=symmetric)
            return jnp.sum(out * gy)

        for use_bias in (True, False):
            bb = jnp.asarray(b) if use_bias else None
            args = (x, jnp.asarray(W)) + ((bb,) if use_bias else ())

            def l_sym(*a):
                return loss(a[0], a[1], a[2] if use_bias else None, True)

            def l_ref(*a):
                return loss(a[0], a[1], a[2] if use_bias else None, False)

            g_sym = jax.grad(l_sym, argnums=tuple(range(len(args))))(*args)
            g_ref = jax.grad(l_ref, argnums=tuple(range(len(args))))(*args)
            for gs, gr in zip(g_sym, g_ref):
                np.testing.assert_allclose(np.asarray(gs), np.asarray(gr),
                                           rtol=1e-4, atol=1e-4)
            np.testing.assert_allclose(
                float(l_sym(*args)), float(l_ref(*args)), rtol=1e-5)


@pytest.mark.slow
def test_strided_inverse_vjp_matches_autodiff():
    """The strided-conv custom VJP (inverse-table gather transpose) must
    match plain autodiff gradients."""
    dims = (8, 10, 12)
    coords, valid, feats = _rand_sparse(21, dims)
    rng = np.random.default_rng(22)
    Cin, Cout = feats.shape[1], 6
    W = rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1

    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    order = np.argsort(np.where(valid,
                                (coords[:, 0] * dims[1] + coords[:, 1])
                                * dims[2] + coords[:, 2], np.prod(dims)))
    x = jnp.asarray(feats[order])
    out_dims = tuple(max((d + 1) // 2, 1) for d in dims)
    ngrid = SC.downsample_coords(grid, out_dims, 64)
    dtab = SC.strided_gather_table(grid, ngrid, dims)
    ndense = SC._dense_index_rows(ngrid, out_dims)
    inv = SC.strided_inverse_table(grid, out_dims, ndense)
    gy = jnp.asarray(rng.normal(size=(64, Cout)).astype(np.float32))

    for algo in ("loop", "stacked"):
        def loss(x, w, use_inv):
            out = SC.subm_conv_apply(
                x, dtab, w, algo=algo,
                inverse_table=inv if use_inv else None)
            return jnp.sum(out * gy)

        gs = jax.grad(lambda x, w: loss(x, w, True), argnums=(0, 1))(
            x, jnp.asarray(W))
        gr = jax.grad(lambda x, w: loss(x, w, False), argnums=(0, 1))(
            x, jnp.asarray(W))
        for a, b in zip(gs, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)


def test_strided_inverse_table_ov_matches_plain():
    """The ov-map variant of strided_inverse_table (used when training
    keeps the packed 9-probe table layout) equals the plain-map build."""
    dims = (8, 10, 12)
    coords, valid, _ = _rand_sparse(31, dims)
    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    out_dims = tuple(max((d + 1) // 2, 1) for d in dims)
    ngrid = SC.downsample_coords(grid, out_dims, 64)
    plain = SC.strided_inverse_table(
        grid, out_dims, SC._dense_index_rows(ngrid, out_dims))
    ov = SC.strided_inverse_table(
        grid, out_dims, SC._dense_rows_ov(ngrid, out_dims), ov=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(ov))


@pytest.mark.slow
def test_encoder_train_grads_same_across_table_layouts():
    """Training with gather_algo='xpack' (packed 9-probe table layout,
    stacked convs on unpacked tables) must produce the same loss and
    gradients as gather_algo='stacked' (plain 27-probe layout)."""
    from futuredet_tpu.models.middle import SparseMiddleEncoder

    dims = (8, 16, 16)
    coords, valid, feats = _rand_sparse(41, dims, n=60, V=96, C=5)
    kw = dict(channels=(8, 8, 16, 16), vmax=(96, 64, 48, 32),
              grid_zyx=dims)
    enc_p = SparseMiddleEncoder(**kw, gather_algo="xpack")
    enc_s = SparseMiddleEncoder(**kw, gather_algo="stacked")
    cj, vj, fj = (jnp.asarray(a) for a in (coords, valid, feats))
    vars_p = enc_p.init(jax.random.PRNGKey(0), fj, cj, vj, True)
    vars_s = enc_s.init(jax.random.PRNGKey(0), fj, cj, vj, True)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        vars_p, vars_s)

    def loss(params, enc, variables):
        (out, _zm), _ = enc.apply({**variables, "params": params}, fj, cj,
                                  vj, True, mutable=["batch_stats"])
        return jnp.sum(jnp.square(out))

    lp, gp = jax.value_and_grad(lambda p: loss(p, enc_p, vars_p))(
        vars_p["params"])
    ls, gs = jax.value_and_grad(lambda p: loss(p, enc_s, vars_s))(
        vars_s["params"])
    np.testing.assert_allclose(float(lp), float(ls), rtol=1e-5)
    for (p, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gp),
                              jax.tree_util.tree_leaves_with_path(gs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=str(p))


@pytest.mark.slow
def test_encoder_assume_sorted_matches_on_voxelizer_output():
    """voxelize_mean's slot order must satisfy the assume_sorted contract
    (ascending z-major linear id, padding at the end), and the encoder must
    produce identical output with the argsorts skipped."""
    from futuredet_tpu.models.middle import SparseMiddleEncoder
    from futuredet_tpu.ops.voxelize import voxelize_mean

    rng = np.random.default_rng(7)
    P, F = 2000, 5
    pts = np.concatenate([
        rng.uniform(-7.9, 7.9, (P, 2)), rng.uniform(-2.9, 2.9, (P, 1)),
        rng.uniform(0, 1, (P, 2))], -1).astype(np.float32)
    pc_range = jnp.asarray([-8.0, -8.0, -3.0, 8.0, 8.0, 3.0])
    vsz = jnp.asarray([1.0, 1.0, 0.5])
    grid_size = (16, 16, 12)
    feats, coords, _, _ = voxelize_mean(
        jnp.asarray(pts), jnp.ones((P,), bool), pc_range, vsz,
        grid_size=grid_size, max_voxels=256, max_points=8)
    vvalid = coords[:, 0] >= 0
    dims = (13, 16, 16)   # (gz+1, gy, gx)

    # the contract itself: valid ids ascending, padding at the end
    ids = np.asarray((coords[:, 0] * dims[1] + coords[:, 1]) * dims[2]
                     + coords[:, 2])
    v = np.asarray(vvalid)
    if (~v).any():
        assert not v[np.argmax(~v):].any(), "padding must be a suffix"
    assert np.all(np.diff(ids[v]) > 0), "valid ids must be ascending"

    kw = dict(channels=(8, 8, 16, 16), vmax=(256, 128, 64, 64),
              grid_zyx=dims, gather_algo="xpack")
    enc_a = SparseMiddleEncoder(**kw, assume_sorted=True)
    enc_b = SparseMiddleEncoder(**kw, assume_sorted=False)
    variables = enc_a.init(jax.random.PRNGKey(0), feats, coords, vvalid,
                           False)
    out_a, zm_a = enc_a.apply(variables, feats, coords, vvalid, False)
    out_b, zm_b = enc_b.apply(variables, feats, coords, vvalid, False)
    np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_array_equal(np.asarray(zm_a), np.asarray(zm_b))


def test_xpack_sym_vjp_matches_autodiff():
    """The x-packed submanifold custom VJP (flipped conv_x3 dx, slab-block
    dw) must match plain autodiff of the stacked contraction."""
    dims = (8, 10, 12)
    coords, valid, feats = _rand_sparse(51, dims, C=4)
    rng = np.random.default_rng(52)
    Cin, Cout = 4, 6
    W = rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1
    b = rng.normal(size=(Cout,)).astype(np.float32)

    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    ptab = SC.subm_xpack_tables(grid, dims)
    tab27 = SC.unpack_xpack_tables(ptab, grid.ids.shape[0])
    order = np.argsort(np.where(valid,
                                (coords[:, 0] * dims[1] + coords[:, 1])
                                * dims[2] + coords[:, 2], np.prod(dims)))
    x = jnp.asarray(feats[order])
    gy = jnp.asarray(rng.normal(
        size=(grid.ids.shape[0], Cout)).astype(np.float32))
    gy = jnp.where(grid.valid[:, None], gy, 0.0)

    def loss_x3(x, w, bb):
        out = SC.subm_conv_apply(x, (ptab, grid.valid), w, bb, algo="xpack",
                                 symmetric=True)
        return jnp.sum(out * gy)

    def loss_ref(x, w, bb):
        out = SC._gather_conv(x, tab27, w, bb, None, "stacked")
        return jnp.sum(out * gy)

    gs = jax.grad(loss_x3, argnums=(0, 1, 2))(x, jnp.asarray(W),
                                              jnp.asarray(b))
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, jnp.asarray(W),
                                               jnp.asarray(b))
    for a, r in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_xpack_strided_vjp_matches_autodiff():
    """The x-packed strided custom VJP (inverse-table dx, slab-block dw)
    must match autodiff of the stacked strided contraction."""
    dims = (8, 10, 12)
    coords, valid, feats = _rand_sparse(61, dims, C=4)
    rng = np.random.default_rng(62)
    Cin, Cout = 4, 6
    W = rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1

    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    out_dims = tuple(max((d + 1) // 2, 1) for d in dims)
    ngrid = SC.downsample_coords(grid, out_dims, 64)
    ptab = SC.strided_xpack_tables(grid, ngrid, dims)
    dtab = SC.strided_gather_table(grid, ngrid, dims)
    inv = SC.strided_inverse_table(
        grid, out_dims, SC._dense_rows_ov(ngrid, out_dims), ov=True)
    order = np.argsort(np.where(valid,
                                (coords[:, 0] * dims[1] + coords[:, 1])
                                * dims[2] + coords[:, 2], np.prod(dims)))
    x = jnp.asarray(feats[order])
    gy = jnp.asarray(rng.normal(size=(64, Cout)).astype(np.float32))
    gy = jnp.where(ngrid.valid[:, None], gy, 0.0)

    def loss_x3(x, w):
        out = SC.subm_conv_apply(x, (ptab, grid.valid), w, algo="xpack",
                                 inverse_table=inv)
        return jnp.sum(out * gy)

    def loss_ref(x, w):
        out = SC._gather_conv(x, dtab, w, None, None, "stacked")
        return jnp.sum(out * gy)

    gs = jax.grad(loss_x3, argnums=(0, 1))(x, jnp.asarray(W))
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, jnp.asarray(W))
    for a, r in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5)


def test_conv_x3_packed_matches_truncated_conv_x3():
    """conv_x3_packed (bf16-PAIR packed gathers + int32 one-hot routing +
    shift unpack + permuted-weight matmul) must equal conv_x3 run on
    bf16-TRUNCATED inputs up to fp32 summation order (the packed matmul
    accumulates the permuted [even|odd] row order) — the serving mode's
    numerics contract is 'truncate inputs to bf16 at this stage, nothing
    else'."""
    from jax import lax

    dims = (8, 10, 12)
    rng = np.random.default_rng(71)
    for Cin in (4, 8, 64):
        coords, valid, feats = _rand_sparse(72 + Cin, dims, C=Cin)
        Cout = Cin
        W = rng.normal(size=(27, Cin, Cout)).astype(np.float32) * 0.1
        grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
        ptab = SC.subm_xpack_tables(grid, dims)
        order = np.argsort(np.where(
            valid, (coords[:, 0] * dims[1] + coords[:, 1]) * dims[2]
            + coords[:, 2], np.prod(dims)))
        x = jnp.asarray(feats[order])
        b = jnp.asarray(rng.normal(size=(Cout,)).astype(np.float32))

        got = SC.conv_x3_packed(x, ptab, grid.valid, jnp.asarray(W), b)
        trunc = lax.bitcast_convert_type(
            lax.bitcast_convert_type(
                jnp.where(grid.valid[:, None], x, 0.0), jnp.uint32)
            & jnp.uint32(0xFFFF0000), jnp.float32)
        want = SC.conv_x3(trunc, ptab, grid.valid, jnp.asarray(W), b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_pack_unpack_pairs_roundtrip():
    rng = np.random.default_rng(5)
    f = jnp.asarray(rng.normal(size=(17, 6)).astype(np.float32))
    up = SC.unpack_pairs_fp32(SC.pack_bf16_pairs(f))
    # [even chans | odd chans], each bf16-truncated
    from jax import lax
    trunc = lax.bitcast_convert_type(
        lax.bitcast_convert_type(f, jnp.uint32) & jnp.uint32(0xFFFF0000),
        jnp.float32)
    np.testing.assert_array_equal(np.asarray(up[:, :3]),
                                  np.asarray(trunc[:, 0::2]))
    np.testing.assert_array_equal(np.asarray(up[:, 3:]),
                                  np.asarray(trunc[:, 1::2]))


def test_encoder_packed_pairs_mode_close_to_fp32():
    """SparseMiddleEncoder(packed_pairs=True) must run (eval) and stay
    close to the fp32 encoder: only the Cin=64 stages' conv inputs are
    bf16-truncated (< 0.4% relative), everything else identical."""
    from futuredet_tpu.models.middle import SparseMiddleEncoder

    dims = (9, 16, 16)
    coords, valid, feats = _rand_sparse(80, dims, n=90, V=128, C=5)
    args = (jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid))

    kw = dict(channels=(16, 32, 64, 64), vmax=(128, 128, 96, 64),
              grid_zyx=dims, gather_algo="xpack", xpack_max_cin=64)
    enc = SparseMiddleEncoder(**kw)
    variables = enc.init(jax.random.PRNGKey(0), *args)
    ref_bev, ref_mask = enc.apply(variables, *args)

    enc_p = SparseMiddleEncoder(**kw, packed_pairs=True)
    got_bev, got_mask = enc_p.apply(variables, *args)

    np.testing.assert_array_equal(np.asarray(got_mask),
                                  np.asarray(ref_mask))
    scale = max(float(jnp.max(jnp.abs(ref_bev))), 1e-3)
    err = float(jnp.max(jnp.abs(got_bev - ref_bev))) / scale
    assert err < 4e-3, err
    # and the mode must not be a silent no-op: SOME difference expected
    assert float(jnp.max(jnp.abs(got_bev - ref_bev))) > 0.0


def test_dense_rows_ov_build_strategies_agree(monkeypatch):
    """_dense_rows_ov has two build paths split on _COLFIX_MAX_CELLS (the
    sorted-scatter + halo-column rewrite vs the fused 3V scatter, used only
    for the >32M-cell stage-0 map on TPU). Force each on the same grid and
    assert identical maps — a future edit to either branch must not let
    them diverge silently (advisor r4)."""
    dims = (8, 10, 12)
    coords, valid, feats = _rand_sparse(3, dims=dims)
    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    colfix = np.asarray(SC._dense_rows_ov(grid, dims))
    monkeypatch.setattr(SC, "_COLFIX_MAX_CELLS", 0)
    fused = np.asarray(SC._dense_rows_ov(grid, dims))
    np.testing.assert_array_equal(colfix, fused)
    # and probes through both layouts agree on every active cell
    q = jnp.asarray(
        np.asarray(SC.linear_ids(jnp.asarray(coords), dims))[valid],
        jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(SC._probe_ov(jnp.asarray(colfix), q)),
        np.asarray(SC._probe_ov(jnp.asarray(fused), q)))


def test_check_sorted_flags_unsorted_grids():
    """The SparseGrid sorted-ids invariant (load-bearing for the
    indices_are_sorted scatters + xpack contiguity) — `check_sorted` holds
    for make_grid output and flags a shuffled grid."""
    dims = (8, 10, 12)
    coords, valid, feats = _rand_sparse(5, dims=dims)
    grid = SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)
    assert bool(SC.check_sorted(grid, dims))
    perm = np.random.default_rng(0).permutation(grid.ids.shape[0])
    bad = SC.SparseGrid(coords=grid.coords[perm], ids=grid.ids[perm],
                        valid=grid.valid[perm])
    assert not bool(SC.check_sorted(bad, dims))


def _random_grid(seed, dims, n, V):
    rng = np.random.default_rng(seed)
    total = dims[0] * dims[1] * dims[2]
    lin = rng.choice(total, n, replace=False)
    coords = np.full((V, 3), -1, np.int32)
    coords[:n, 0] = lin // (dims[1] * dims[2])
    coords[:n, 1] = (lin // dims[2]) % dims[1]
    coords[:n, 2] = lin % dims[2]
    valid = np.zeros(V, bool)
    valid[:n] = True
    return SC.make_grid(jnp.asarray(coords), jnp.asarray(valid), dims)


def test_bitmap_map_probes_match_ov_map():
    """The popcount-bitmap cell map must return bit-identical site
    indices to the full ov map — single probes (_probe_bm vs _probe_ov)
    and the xpack triple probes, over every cell id incl. 126-row
    boundaries and the sentinel."""
    dims = (4, 7, 300)                      # x spans multiple 126-rows
    V = 512
    for seed in range(3):
        grid = _random_grid(seed, dims, 300, V)
        ov = SC._dense_rows_ov(grid, dims)
        bm = SC._bitmap_rows_ov(grid, dims)
        assert bm.shape[1] == 8
        total = dims[0] * dims[1] * dims[2]
        q = jnp.arange(total + 2, dtype=jnp.int32)   # every cell + sentinel
        np.testing.assert_array_equal(
            np.asarray(SC._probe_bm(bm, q, V)),
            np.asarray(SC._probe_ov(ov, q)))
        for a, b in zip(SC._probe3_bm(bm, q[1:], V), SC._probe3(ov, q[1:])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bitmap_map_xpack_tables_match():
    """subm + strided xpack tables built over the bitmap map equal the
    ov-map-built ones bit for bit."""
    dims = (6, 10, 260)
    V = 512
    grid = _random_grid(7, dims, 350, V)
    ov = SC._dense_rows_ov(grid, dims)
    bm = SC._bitmap_rows_ov(grid, dims)
    np.testing.assert_array_equal(
        np.asarray(SC.subm_xpack_tables(grid, dims, dense_ov=bm)),
        np.asarray(SC.subm_xpack_tables(grid, dims, dense_ov=ov)))
    out_dims = tuple((d + 2 - 3) // 2 + 1 for d in dims)
    ngrid = SC.downsample_coords(grid, out_dims, 512)
    np.testing.assert_array_equal(
        np.asarray(SC.strided_xpack_tables(grid, ngrid, dims, dense_ov=bm)),
        np.asarray(SC.strided_xpack_tables(grid, ngrid, dims, dense_ov=ov)))


def test_encoder_bitmap_map_matches_ov():
    """SparseMiddleEncoder output identical under map_format bitmap/ov."""
    from futuredet_tpu.models.middle import SparseMiddleEncoder
    import jax

    dims = (9, 12, 140)
    V = 256
    rng = np.random.default_rng(1)
    grid = _random_grid(11, dims, 200, V)
    feats = jnp.asarray(rng.normal(size=(V, 4)).astype(np.float32))
    kw = dict(channels=(4, 8, 8, 8), vmax=(256, 256, 128, 64),
              grid_zyx=dims, gather_algo="xpack", assume_sorted=True)
    outs = {}
    for fmt in ("ov", "bitmap", "bitmap0"):
        enc = SparseMiddleEncoder(**kw, map_format=fmt)
        vs = enc.init(jax.random.PRNGKey(0), feats, grid.coords, grid.valid,
                      False)
        y, zm = enc.apply(vs, feats, grid.coords, grid.valid, False)
        outs[fmt] = (np.asarray(y), np.asarray(zm))
    for fmt in ("bitmap", "bitmap0"):
        np.testing.assert_array_equal(outs["ov"][0], outs[fmt][0])
        np.testing.assert_array_equal(outs["ov"][1], outs[fmt][1])
