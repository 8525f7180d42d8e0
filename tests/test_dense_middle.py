"""Hybrid dense-stage middle encoder == fully sparse path.

The dense tail (`SparseMiddleEncoder.dense_from_stage`) must compute the
same submanifold sums as the gather-scatter path: inactive cells are exact
zeros and outputs are re-masked after every conv, so the only difference is
fp reassociation inside the conv contraction.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from futuredet_tpu.models.middle import SparseMiddleEncoder

DIMS = (6, 16, 16)
CH = (4, 8, 8, 16)
VMAX = (256, 256, 128, 64)   # ample: no overflow drops (footprint rule)


def _scene(seed, n=90, V=256):
    rng = np.random.default_rng(seed)
    lin = rng.choice(DIMS[0] * DIMS[1] * DIMS[2], n, replace=False)
    coords = np.zeros((V, 3), np.int32)
    coords[:n, 0] = lin // (DIMS[1] * DIMS[2])
    coords[:n, 1] = (lin // DIMS[2]) % DIMS[1]
    coords[:n, 2] = lin % DIMS[2]
    valid = np.zeros(V, bool)
    valid[:n] = True
    feats = np.zeros((V, 5), np.float32)
    feats[:n] = rng.normal(size=(n, 5)).astype(np.float32)
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid)


def _make(dense_from):
    return SparseMiddleEncoder(channels=CH, vmax=VMAX, grid_zyx=DIMS,
                               dense_from_stage=dense_from)


@pytest.mark.parametrize("dense_from", [0, 1, 2, 3])
def test_dense_tail_matches_sparse(dense_from):
    feats, coords, valid = _scene(0)
    sparse = _make(None)
    variables = sparse.init(jax.random.PRNGKey(0), feats, coords, valid)
    ref, zm_ref = sparse.apply(variables, feats, coords, valid)

    hybrid = _make(dense_from)
    # identical param tree: dense modules reuse the sparse names/shapes
    out, zm = hybrid.apply(variables, feats, coords, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(zm), np.asarray(zm_ref))


def test_dense_param_tree_identical():
    feats, coords, valid = _scene(1)
    v_sparse = _make(None).init(jax.random.PRNGKey(0), feats, coords, valid)
    v_dense = _make(1).init(jax.random.PRNGKey(0), feats, coords, valid)
    ps = jax.tree_util.tree_map(lambda a: a.shape, v_sparse)
    pd = jax.tree_util.tree_map(lambda a: a.shape, v_dense)
    assert ps == pd


def test_dense_train_mode_bn_stats_match():
    feats, coords, valid = _scene(2)
    sparse = _make(None)
    variables = sparse.init(jax.random.PRNGKey(0), feats, coords, valid)

    (ref, _), mut_ref = sparse.apply(variables, feats, coords, valid, True,
                                     mutable=["batch_stats"])
    (out, _), mut = _make(2).apply(variables, feats, coords, valid, True,
                                   mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=5e-4, atol=5e-4),
        mut["batch_stats"], mut_ref["batch_stats"])


def test_dense_bf16_close_to_fp32():
    feats, coords, valid = _scene(3)
    sparse = _make(None)
    variables = sparse.init(jax.random.PRNGKey(0), feats, coords, valid)
    ref, _ = sparse.apply(variables, feats, coords, valid)
    hybrid = SparseMiddleEncoder(channels=CH, vmax=VMAX, grid_zyx=DIMS,
                                 dense_from_stage=1,
                                 dense_dtype=jnp.bfloat16)
    out, _ = hybrid.apply(variables, feats, coords, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-2, atol=5e-2)
