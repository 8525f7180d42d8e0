"""Fused SepHead branch towers == per-branch towers.

The fused path (one wide ConvBN + one block-diagonal final conv per input
group, `models/center_head.py:SepHead._fused_towers`) must be numerically
identical to the reference tower structure (`_branch_tower`, the behavioral
port of ref center_head.py:81-174) with the SAME parameter tree: the
fusion is a pure execution-layout change for TPU dispatch efficiency.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from futuredet_tpu.models.center_head import SepHead

HEADS = (("reg", (2, 2)), ("height", (1, 2)), ("dim", (3, 2)),
         ("rot", (2, 2)), ("vel", (2, 2)), ("hm", (1, 2)))


def _pair(**kw):
    base = dict(heads=HEADS, head_conv=32, final_kernel=3, init_bias=-2.19,
                in_channels=32)
    base.update(kw)
    return (SepHead(**base, fuse_branches=True),
            SepHead(**base, fuse_branches=False))


def _x(c=32):
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(0, 1, (2, 16, 16, c)).astype(np.float32))


def _leaves(tree):
    return jax.tree_util.tree_leaves_with_path(tree)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(forecast_feature=True),
    dict(two_stage=True),
], ids=["plain", "forecast_feature", "two_stage"])
def test_fused_matches_unfused(kw):
    m_f, m_u = _pair(**kw)
    x = _x()
    v_f = m_f.init(jax.random.PRNGKey(0), x, False)
    v_u = m_u.init(jax.random.PRNGKey(0), x, False)

    # identical parameter trees AND identical init values (param RNG folds
    # by path, and the holder modules reuse the nn.Conv/nn.BatchNorm names)
    pf, pu = _leaves(v_f), _leaves(v_u)
    assert [p for p, _ in pf] == [p for p, _ in pu]
    for (p, a), (_, b) in zip(pf, pu):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), str(p))

    # eval forward: equal up to conv-algorithm float associativity
    o_f = m_f.apply(v_f, x, False)
    o_u = m_u.apply(v_f, x, False)
    assert set(o_f) == set(o_u)
    for k in o_f:
        np.testing.assert_allclose(np.asarray(o_f[k]), np.asarray(o_u[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)

    # train forward: outputs and batch-stats updates agree
    t_f, s_f = m_f.apply(v_f, x, True, mutable=["batch_stats"])
    t_u, s_u = m_u.apply(v_f, x, True, mutable=["batch_stats"])
    for k in t_f:
        np.testing.assert_allclose(np.asarray(t_f[k]), np.asarray(t_u[k]),
                                   rtol=1e-4, atol=1e-5, err_msg=k)
    for (p, a), (_, b) in zip(_leaves(s_f), _leaves(s_u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-6, err_msg=str(p))


def test_fused_bf16_close():
    m_f, m_u = _pair()
    m_fb = SepHead(heads=HEADS, head_conv=32, final_kernel=3,
                   init_bias=-2.19, in_channels=32,
                   compute_dtype="bfloat16", fuse_branches=True)
    m_ub = SepHead(heads=HEADS, head_conv=32, final_kernel=3,
                   init_bias=-2.19, in_channels=32,
                   compute_dtype="bfloat16", fuse_branches=False)
    x = _x()
    v = m_fb.init(jax.random.PRNGKey(0), x, False)
    o_f = m_fb.apply(v, x, False)
    o_u = m_ub.apply(v, x, False)
    for k in o_f:
        np.testing.assert_allclose(np.asarray(o_f[k]), np.asarray(o_u[k]),
                                   rtol=0.1, atol=0.05, err_msg=k)


@pytest.mark.slow
def test_grads_match():
    m_f, m_u = _pair(forecast_feature=True)
    x = _x()
    v = m_f.init(jax.random.PRNGKey(0), x, False)

    def loss(params, mod):
        out, _ = mod.apply({**v, "params": params}, x, True,
                           mutable=["batch_stats"])
        # smooth loss: |.| would flip subgradients wherever the two
        # implementations' forwards differ by float-associativity noise
        return sum(jnp.sum(jnp.square(o)) for o in out.values())

    g_f = jax.grad(lambda p: loss(p, m_f))(v["params"])
    g_u = jax.grad(lambda p: loss(p, m_u))(v["params"])
    # structural check: wrong weight slicing/blocking would give O(1)
    # relative errors; float-associativity noise flips relu gates at
    # near-zero pre-activations, which perturbs summed grads by
    # O(one element), hence the loose normalized tolerance
    for (p, a), (_, b) in zip(_leaves(g_f), _leaves(g_u)):
        scale = max(1.0, float(np.abs(np.asarray(b)).max()))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=1e-3, err_msg=str(p))
