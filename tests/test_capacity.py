"""Sparse middle-encoder capacity semantics — fast-tier guards.

Round-3 regression class: the detector's growth-ratio stage capacities
(`models/detector.py`) silently re-capped explicitly sized `middle_vmax`
configs, and `downsample_coords` silently dropped the overflow sites —
while the reference spconv NEVER drops active sites
(`/root/reference/det3d/models/backbones/scn.py:109-146` allocates
per-scene). These tests pin the two structural fixes:

  * `middle_growth=None` honors the configured `middle_vmax` exactly;
  * every clipped site is COUNTED (sowed as intermediates
    "dropped_sites") so overflow is detectable, never silent.

They run in the fast tier on the exact geometry class that broke (isolated
random points -> ~3-8x generative stage-1 growth), so any future
capacity-rule change that re-breaks the torch-oracle parity chain fails
here in seconds instead of only in the slow tier.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from futuredet_tpu.config import VoxelConfig, get_config, tiny_variant
from futuredet_tpu.models.detector import (build_detector,
                                           forward_with_drop_counters,
                                           middle_stage_caps)


def _high_growth_cfg(middle_vmax=(512, 4096, 704, 80), middle_growth=None):
    """Tiny-xy / full-z voxelnet geometry (same class as the slow torch
    oracle in test_checkpoint_convert._foldable_voxelnet_cfg): 40 z bins,
    32x32 xy, isolated points -> generative growth far above the
    lidar-statistics bounds."""
    cfg = tiny_variant(get_config("forecast_n3dtf"))
    voxel = VoxelConfig(
        pc_range=(-8.0, -8.0, -5.0, 8.0, 8.0, 3.0),
        voxel_size=(0.5, 0.5, 0.2),          # grid (32, 32, 40) -> D0 = 41
        max_points_per_voxel=8, max_voxels_train=512, max_voxels_eval=512,
        max_points=1024)
    model = dataclasses.replace(cfg.model, middle_vmax=middle_vmax,
                                middle_growth=middle_growth)
    return cfg.replace(model=model, voxel=voxel)


def _isolated_points(cfg, P=400, seed=7):
    rng = np.random.default_rng(seed)
    pts = np.zeros((P, 5), np.float32)
    pts[:, 0] = rng.uniform(cfg.voxel.pc_range[0] + 0.2,
                            cfg.voxel.pc_range[3] - 0.2, P)
    pts[:, 1] = rng.uniform(cfg.voxel.pc_range[1] + 0.2,
                            cfg.voxel.pc_range[4] - 0.2, P)
    pts[:, 2] = rng.uniform(cfg.voxel.pc_range[2] + 0.2,
                            cfg.voxel.pc_range[5] - 0.2, P)
    pts[:, 3:] = rng.uniform(0, 1, (P, 2))
    return pts


def test_stage_caps_growth_none_honors_vmax():
    """middle_growth=None => the configured middle_vmax IS the capacity, at
    every stage, for any voxelizer budget (the round-3 regression re-capped
    an explicitly sized oracle config to 1.6x the budget)."""
    cfg = _high_growth_cfg()
    assert middle_stage_caps(cfg.model, 512) == (512, 4096, 704, 80)
    # stage 0 still tracks the voxelizer budget (there can't be more
    # sites than voxels)
    assert middle_stage_caps(cfg.model, 256) == (256, 4096, 704, 80)


def test_stage_caps_growth_rule_formula():
    cfg = _high_growth_cfg(middle_vmax=(120000, 96000, 63000, 42000),
                           middle_growth=(1.6, 1.05, 0.70))
    import math
    for max_v in (30000, 120000):
        caps = middle_stage_caps(cfg.model, max_v)
        assert caps[0] == min(120000, max_v)
        for s, (v, g) in enumerate(zip((96000, 63000, 42000),
                                       (1.6, 1.05, 0.70)), start=1):
            assert caps[s] == min(v, int(math.ceil(g * max_v)))


def test_tiny_variant_is_capacity_safe_by_construction():
    """Shipped test configs pin middle_growth=None so any future capacity
    rule change cannot silently re-cap them (VERDICT r3 weak #5)."""
    for name in ("forecast_n3dtf", "forecast_n0"):
        cfg = tiny_variant(get_config(name))
        assert cfg.model.middle_growth is None
        assert middle_stage_caps(cfg.model, 512) == (512, 256, 128, 64)


@pytest.mark.slow
def test_sparse_matches_uncapped_dense_on_high_growth_scene():
    """The capped sparse path must equal the capacity-free dense form on a
    scene whose generative growth exceeds the lidar bounds — exactly the
    check the round-3 growth-rule commit broke. Also asserts the drop
    counters read zero (no silent clipping)."""
    cfg = _high_growth_cfg()
    model = build_detector(cfg)
    pts = _isolated_points(cfg)
    x = jnp.asarray(pts[None])
    v = jnp.ones((1, pts.shape[0]), bool)
    variables = model.init(jax.random.PRNGKey(0), x, v, train=False)

    preds, drops = forward_with_drop_counters(model, variables, x, v,
                                              train=False)
    assert drops is not None and int(drops.sum()) == 0, drops

    dense_cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, middle_dense_from_stage=0))
    dense_model = build_detector(dense_cfg)
    dense_preds = dense_model.apply(variables, x, v, train=False)

    assert len(preds) == len(dense_preds)
    for ti, (a, b) in enumerate(zip(preds, dense_preds)):
        for k in b:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), rtol=2e-4, atol=2e-4,
                err_msg=f"task {ti} head {k}")


def _tiny_clip_cfg(middle_vmax, middle_growth):
    """tiny_variant voxelnet with a small voxelizer budget: isolated points
    generate ~5x stage-1 generative growth, so undersized (or growth-rule)
    stage caps must clip — cheap fast-tier compile (forecast_n0: one head,
    same detector capacity chain as the 7-head configs)."""
    cfg = tiny_variant(get_config("forecast_n0"))
    voxel = dataclasses.replace(cfg.voxel, max_voxels_train=160,
                                max_voxels_eval=160, max_points=256)
    model = dataclasses.replace(cfg.model, middle_vmax=middle_vmax,
                                middle_growth=middle_growth)
    return cfg.replace(model=model, voxel=voxel)


def _run_drop_counters(cfg, P=150, seed=3):
    model = build_detector(cfg)
    pts = _isolated_points(cfg, P=P, seed=seed)
    x = jnp.asarray(pts[None])
    v = jnp.ones((1, P), bool)
    variables = model.init(jax.random.PRNGKey(0), x, v, train=False)
    _, drops = forward_with_drop_counters(model, variables, x, v,
                                          train=False)
    return drops


def test_encoder_counts_clipped_sites():
    """SparseMiddleEncoder must COUNT clipped sites (sow "dropped_sites"),
    never hide them: undersized stage-1 capacity -> nonzero counter; ample
    capacity -> zero. Encoder-level (cheap compile) — the detector-level
    plumbing is covered by the slow-tier tests below."""
    from futuredet_tpu.models.middle import SparseMiddleEncoder

    dims = (6, 16, 16)
    V = 256
    rng = np.random.default_rng(0)
    n = 120
    lin = rng.choice(dims[0] * dims[1] * dims[2], n, replace=False)
    lin.sort()
    coords = np.zeros((V, 3), np.int32)
    coords[:n, 0] = lin // (dims[1] * dims[2])
    coords[:n, 1] = (lin // dims[2]) % dims[1]
    coords[:n, 2] = lin % dims[2]
    valid = np.zeros(V, bool)
    valid[:n] = True
    feats = np.zeros((V, 5), np.float32)
    feats[:n] = rng.normal(size=(n, 5)).astype(np.float32)
    args = (jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(valid))

    # stage-1 cap 64 << the ~150 generative sites of 120 isolated voxels
    # (counted); stages 2-3 ample (must read zero) — one compile covers
    # both the counted-clip and the zero-when-ample directions
    enc = SparseMiddleEncoder(channels=(4, 8, 8, 16),
                              vmax=(256, 64, 256, 128), grid_zyx=dims)
    variables = enc.init(jax.random.PRNGKey(0), *args)
    _, mut = enc.apply(variables, *args, mutable=["intermediates"])
    (d,) = mut["intermediates"]["dropped_sites"]
    drops = np.asarray(d)
    assert drops[0] > 0, drops
    assert drops[1] == 0 and drops[2] == 0, drops


def test_scene_families_zero_drops():
    """The shipped growth bounds must cover EVERY physical scene family at
    bench scale (the growth envelope, VERDICT r3 #5): lidar / dense-urban /
    sparse-highway / heavy-GT-AUG-paste scenes produce zero clipped sites
    under middle_stage_caps. Ops-level (no model compile) so it stays in
    the fast tier; the multi-seed sweep lives in scripts/occupancy.py."""
    import dataclasses

    from futuredet_tpu.data.synthetic import SCENE_FAMILIES, \
        make_family_scene
    from futuredet_tpu.ops.sparse_conv import downsample_coords, make_grid
    from futuredet_tpu.ops.voxelize import voxelize_mean

    cfg = get_config("forecast_n3dtf")
    cfg = cfg.replace(voxel=dataclasses.replace(
        cfg.voxel, max_points=150000, max_voxels_eval=30000))
    gx, gy, gz = cfg.voxel.grid_size
    max_v = cfg.voxel.max_voxels_eval
    caps = middle_stage_caps(cfg.model, max_v)

    for family in SCENE_FAMILIES:
        sc = make_family_scene(cfg, family, cfg.voxel.max_points, seed=7)
        _, coords, _, _ = voxelize_mean(
            jnp.asarray(sc.points), jnp.asarray(sc.points_valid),
            jnp.asarray(cfg.voxel.pc_range),
            jnp.asarray(cfg.voxel.voxel_size),
            grid_size=cfg.voxel.grid_size, max_voxels=max_v,
            max_points=cfg.voxel.max_points_per_voxel)
        grid = make_grid(coords, coords[:, 0] >= 0, (gz + 1, gy, gx))
        dims = (gz + 1, gy, gx)
        for s in range(1, 4):
            pads = (0, 1, 1) if s == 3 else (1, 1, 1)
            od = tuple((d + 2 * p - 3) // 2 + 1
                       for d, p in zip(dims, pads))
            grid, dropped = downsample_coords(grid, od, caps[s], pads,
                                              with_dropped=True)
            dims = od
            assert int(dropped) == 0, (family, s, int(dropped), caps)


@pytest.mark.slow
def test_drop_counters_detect_explicit_clipping():
    """Deliberately undersized stage-1 capacity: the forward must COUNT the
    clipped sites (nonzero counter), never hide them."""
    drops = _run_drop_counters(
        _tiny_clip_cfg(middle_vmax=(512, 200, 128, 64), middle_growth=None))
    assert drops is not None and int(drops[0]) > 0, drops


@pytest.mark.slow
def test_growth_rule_clipping_is_counted():
    """With the lidar-statistics growth rule ON, an out-of-distribution
    scene (isolated points, ~5x stage-1 growth vs the 1.6x bound) clips —
    and the counters must say so. This is the runtime detection the
    round-3 regression lacked (growth cap = ceil(1.6 * 160) = 256 sites,
    while ~150 isolated voxels generate ~700 stage-1 sites)."""
    drops = _run_drop_counters(
        _tiny_clip_cfg(middle_vmax=(512, 4096, 704, 80),
                       middle_growth=(1.6, 1.05, 0.70)))
    assert drops is not None and int(drops[0]) > 0, drops


@pytest.mark.slow
def test_drop_counters_batched_path():
    """The nn.vmap'd (B>1) middle encoder must surface per-sample counters
    too (summed by the extractor)."""
    cfg = _high_growth_cfg(middle_vmax=(512, 256, 704, 80))
    model = build_detector(cfg)
    p0 = _isolated_points(cfg, seed=1)
    p1 = _isolated_points(cfg, seed=2)
    x = jnp.asarray(np.stack([p0, p1]))
    v = jnp.ones((2, p0.shape[0]), bool)
    variables = model.init(jax.random.PRNGKey(0), x, v, train=False)
    _, drops = forward_with_drop_counters(model, variables, x, v,
                                          train=False)
    assert drops is not None and int(drops[0]) > 0, drops


@pytest.mark.slow
def test_pillars_path_has_no_counters():
    cfg = tiny_variant(get_config("pp_forecast_n3dtf"))
    model = build_detector(cfg)
    pts = np.zeros((1, 64, 5), np.float32)
    x = jnp.asarray(pts)
    v = jnp.ones((1, 64), bool)
    variables = model.init(jax.random.PRNGKey(0), x, v, train=False)
    _, drops = forward_with_drop_counters(model, variables, x, v,
                                          train=False)
    assert drops is None


def test_blob_uniform_bench_scene_zero_drops():
    """The round-5 capacity-safe blobbed-uniform bench scene must stay
    inside the shipped growth bounds at bench scale (bench.py asserts
    nothing — it only reports; this guard catches blob-geometry
    regressions before a bench run does)."""
    import dataclasses

    import bench
    from futuredet_tpu.ops.sparse_conv import downsample_coords, make_grid
    from futuredet_tpu.ops.voxelize import voxelize_mean

    cfg = get_config("forecast_n3dtf")
    cfg = cfg.replace(voxel=dataclasses.replace(
        cfg.voxel, max_points=150000, max_voxels_eval=30000))
    gx, gy, gz = cfg.voxel.grid_size
    max_v = cfg.voxel.max_voxels_eval
    caps = middle_stage_caps(cfg.model, max_v)
    pts, valid = bench._uniform_blob_points(cfg, 1,
                                            np.random.default_rng(0))
    _, coords, _, _ = voxelize_mean(
        jnp.asarray(pts[0]), jnp.asarray(valid[0]),
        jnp.asarray(cfg.voxel.pc_range), jnp.asarray(cfg.voxel.voxel_size),
        grid_size=cfg.voxel.grid_size, max_voxels=max_v,
        max_points=cfg.voxel.max_points_per_voxel)
    grid = make_grid(coords, coords[:, 0] >= 0, (gz + 1, gy, gx))
    dims = (gz + 1, gy, gx)
    for s in range(1, 4):
        pads = (0, 1, 1) if s == 3 else (1, 1, 1)
        od = tuple((d + 2 * p - 3) // 2 + 1 for d, p in zip(dims, pads))
        grid, dropped = downsample_coords(grid, od, caps[s], pads,
                                          with_dropped=True)
        dims = od
        assert int(dropped) == 0, (s, int(dropped), caps)


@pytest.mark.slow
def test_scene_families_zero_drops_at_train_scale():
    """The vmax CEILINGS bind below the growth rule at the 120k train
    budget — they too must cover every physical scene family (round-5
    find: heavy-GT-AUG stage-1 needed 106.1k sites and the old 96000
    ceiling clipped 10.1k; training silently left reference semantics)."""
    import dataclasses

    from futuredet_tpu.data.synthetic import SCENE_FAMILIES, \
        make_family_scene
    from futuredet_tpu.ops.sparse_conv import downsample_coords, make_grid
    from futuredet_tpu.ops.voxelize import voxelize_mean

    cfg = get_config("forecast_n3dtf")      # train defaults: 300k/120k
    gx, gy, gz = cfg.voxel.grid_size
    max_v = cfg.voxel.max_voxels_train
    caps = middle_stage_caps(cfg.model, max_v)
    for family in SCENE_FAMILIES:
        sc = make_family_scene(cfg, family, cfg.voxel.max_points, seed=7)
        _, coords, _, _ = voxelize_mean(
            jnp.asarray(sc.points), jnp.asarray(sc.points_valid),
            jnp.asarray(cfg.voxel.pc_range),
            jnp.asarray(cfg.voxel.voxel_size),
            grid_size=cfg.voxel.grid_size, max_voxels=max_v,
            max_points=cfg.voxel.max_points_per_voxel)
        grid = make_grid(coords, coords[:, 0] >= 0, (gz + 1, gy, gx))
        dims = (gz + 1, gy, gx)
        for s in range(1, 4):
            pads = (0, 1, 1) if s == 3 else (1, 1, 1)
            od = tuple((d + 2 * p - 3) // 2 + 1
                       for d, p in zip(dims, pads))
            grid, dropped = downsample_coords(grid, od, caps[s], pads,
                                              with_dropped=True)
            dims = od
            assert int(dropped) == 0, (family, s, int(dropped), caps)
