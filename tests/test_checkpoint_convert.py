"""Reference-checkpoint converter: layout-orientation oracles vs torch,
full-coverage fabricated state dicts, and an end-to-end forward-parity test
against a pure-torch functional re-execution of the reference pp pipeline
(PillarFeatureNet pillar_encoder.py:59-153 -> RPN rpn.py:120-190 ->
CenterHead center_head.py:336-390) driven ONLY by the state dict.

The real-checkpoint parity test runs when FUTUREDET_REF_CKPT points at a
reference `.pth`; it skips cleanly otherwise (VERDICT r1 #4).
"""
import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
F = torch.nn.functional


# ---------------------------------------------------------------------------
# fabricated reference state dicts
# ---------------------------------------------------------------------------

def _inverse_shape(our_shape, kind):
    if kind == "linear":
        i, o = our_shape
        return (o, i)
    if kind == "conv":
        kh, kw, i, o = our_shape
        return (o, i, kh, kw)
    if kind == "deconv":
        kh, kw, i, o = our_shape
        return (i, o, kh, kw)
    if kind == "subm":
        k, i, o = our_shape
        assert k == 27
        return (3, 3, 3, i, o)
    return tuple(our_shape)


def fabricate_state_dict(cfg, variables, rng):
    """Random reference-layout arrays for every mapped key."""
    from futuredet_tpu.utils.convert_checkpoint import _key_map

    def leaf(tree, path):
        for k in path:
            tree = tree[k]
        return np.asarray(tree)

    sd = {}
    params_e, stats_e = _key_map(cfg)
    for tree_name, entries in (("params", params_e), ("batch_stats", stats_e)):
        for path, ref_key, kind in entries:
            shape = _inverse_shape(leaf(variables[tree_name], path).shape,
                                   kind)
            arr = rng.normal(0, 0.5, shape).astype(np.float32)
            if ref_key.endswith("running_var"):
                arr = np.abs(arr) + 0.5
            sd[ref_key] = arr
    if cfg.model.detector == "voxelnet" and cfg.model.middle == "sparse":
        # extra_conv is folded into z_crush, not key-mapped (scn.py:140-146)
        co = cfg.model.middle_channels[-1]
        sd["backbone.extra_conv.0.weight"] = \
            rng.normal(0, 0.5, (3, 1, 1, co, co)).astype(np.float32)
        sd["backbone.extra_conv.1.weight"] = \
            rng.normal(0, 0.5, (co,)).astype(np.float32)
        sd["backbone.extra_conv.1.bias"] = \
            rng.normal(0, 0.5, (co,)).astype(np.float32)
        sd["backbone.extra_conv.1.running_mean"] = \
            rng.normal(0, 0.5, (co,)).astype(np.float32)
        sd["backbone.extra_conv.1.running_var"] = \
            (np.abs(rng.normal(0, 0.5, (co,))) + 0.5).astype(np.float32)
    return sd


def _build_and_convert(name, cfg=None):
    from futuredet_tpu.config import get_config, tiny_variant
    from futuredet_tpu.models.detector import build_detector
    from futuredet_tpu.utils.convert_checkpoint import \
        convert_reference_checkpoint

    if cfg is None:
        cfg = tiny_variant(get_config(name))
    model = build_detector(cfg)
    P = 64
    pts = np.zeros((1, P, 5), np.float32)
    variables = jax.device_get(model.init(
        jax.random.PRNGKey(0), jnp.asarray(pts),
        jnp.ones((1, P), bool), train=False))
    sd = fabricate_state_dict(cfg, variables,
                              np.random.default_rng(0))
    conv = convert_reference_checkpoint(sd, cfg, variables)
    return cfg, model, variables, sd, conv


def _foldable_voxelnet_cfg():
    """Tiny-xy / FULL-z forecast_n3dtf geometry: the reference z chain is
    architectural (41 -> 21 -> 11 -> 5 -> extra_conv -> 2, scn.py:98-146),
    so the oracle config keeps the 40-bin z grid and shrinks only xy.
    middle_vmax chosen so no stage can overflow (stage s sites <= min(
    8 * prev, out-grid cells)); middle_growth=None pins that sizing —
    the lidar-statistics growth rule must never re-cap an explicitly
    sized oracle config (round-3 regression: the growth caps silently
    dropped ~2/3 of this geometry's stage-1 sites)."""
    import dataclasses

    from futuredet_tpu.config import VoxelConfig, get_config, tiny_variant

    cfg = tiny_variant(get_config("forecast_n3dtf"))
    voxel = VoxelConfig(
        pc_range=(-8.0, -8.0, -5.0, 8.0, 8.0, 3.0),
        voxel_size=(0.5, 0.5, 0.2),          # grid (32, 32, 40) -> D0 = 41
        max_points_per_voxel=8, max_voxels_train=512, max_voxels_eval=512,
        max_points=1024)
    model = dataclasses.replace(cfg.model,
                                middle_vmax=(512, 4096, 704, 80),
                                middle_growth=None)
    return cfg.replace(model=model, voxel=voxel)


@pytest.mark.slow
def test_fabricated_coverage_pp():
    cfg, model, variables, sd, conv = _build_and_convert("pp_forecast_n3dtf")
    rep = conv.pop("__convert_report__")
    assert not rep["missing_ref_keys"]
    assert not rep["unused_ref_keys"], rep["unused_ref_keys"][:5]
    # every reader/neck/head leaf overwritten
    kept = 0
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(variables["params"]),
            jax.tree_util.tree_leaves_with_path(conv["params"])):
        if np.allclose(a, b):
            kept += 1
    assert kept == 0, f"{kept} param leaves not overwritten"


@pytest.mark.slow
def test_fabricated_coverage_voxelnet():
    cfg, model, variables, sd, conv = _build_and_convert("forecast_n3dtf")
    rep = conv.pop("__convert_report__")
    assert not rep["missing_ref_keys"]
    assert not rep["unused_ref_keys"], rep["unused_ref_keys"][:5]
    # extra_conv folds into z_crush when the z-stack depth lines up; tiny
    # geometry may not — the report records it either way
    assert "extra_conv_folded" in rep


def test_fabricated_coverage_full_n3dtf_tree():
    """FAST-TIER smoke over the FULL forecast_n3dtf module tree (real
    channel chain 16/32/64/128, full (5,5) RPN, 7 chained SepHeads): the
    converter's key table must cover the entire real key space even when
    the env-gated real-checkpoint test skips (VERDICT r4 #8). The key
    space depends only on the module tree, not grid size — so shrink the
    xy grid (keep the architectural 40-bin z chain) to keep init cheap."""
    import dataclasses

    from futuredet_tpu.config import VoxelConfig, get_config

    cfg = get_config("forecast_n3dtf")
    voxel = VoxelConfig(
        pc_range=(-16.0, -16.0, -5.0, 16.0, 16.0, 3.0),
        voxel_size=(0.5, 0.5, 0.2),          # grid (64, 64, 40) -> D0 = 41
        max_points_per_voxel=8, max_voxels_train=512, max_voxels_eval=512,
        max_points=1024)
    cfg = cfg.replace(
        voxel=voxel,
        model=dataclasses.replace(cfg.model,
                                  middle_vmax=(512, 4096, 2048, 512),
                                  middle_growth=None),
        test=dataclasses.replace(
            cfg.test, nms=dataclasses.replace(cfg.test.nms,
                                              pre_max_size=128,
                                              post_max_size=32)))
    cfg2, model, variables, sd, conv = _build_and_convert(
        "forecast_n3dtf", cfg=cfg)
    rep = conv.pop("__convert_report__")
    assert not rep["missing_ref_keys"], rep["missing_ref_keys"][:10]
    assert not rep["unused_ref_keys"], rep["unused_ref_keys"][:5]
    # the real z chain (41 -> ... -> extra_conv) must fold into z_crush
    assert rep["extra_conv_folded"], rep
    # converted weights drive a finite forward
    pts = np.zeros((1, 64, 5), np.float32)
    pts[0, :, 0] = np.linspace(-10, 10, 64)
    pts[0, :, 1] = np.linspace(-10, 10, 64)
    preds = model.apply(
        {"params": conv["params"], "batch_stats": conv["batch_stats"]},
        jnp.asarray(pts), jnp.ones((1, 64), bool), train=False)
    for p in preds:
        assert np.isfinite(np.asarray(p["hm"])).all()


# ---------------------------------------------------------------------------
# pure-torch functional re-execution of the reference pp forward
# ---------------------------------------------------------------------------

def _bn_eval(x, sd, p, dims=1):
    w = torch.from_numpy(sd[p + ".weight"])
    b = torch.from_numpy(sd[p + ".bias"])
    m = torch.from_numpy(sd[p + ".running_mean"])
    v = torch.from_numpy(sd[p + ".running_var"])
    shape = [1, -1] + [1] * dims if dims else [1, -1]
    return (x - m.view(shape)) / torch.sqrt(v.view(shape) + 1e-3) \
        * w.view(shape) + b.view(shape)


def torch_pfn_forward(sd, cfg, pts_np):
    """ref PillarFeatureNet + PointPillarsScatter (pillar_encoder.py) from a
    state dict: returns the BEV canvas (1, C, H, W)."""
    vx, vy = cfg.voxel.voxel_size[:2]
    x0, y0 = cfg.voxel.pc_range[0], cfg.voxel.pc_range[1]
    gx, gy, _ = cfg.voxel.grid_size
    cap = cfg.voxel.max_points_per_voxel

    ix = np.floor((pts_np[:, 0] - x0) / vx).astype(int)
    iy = np.floor((pts_np[:, 1] - y0) / vy).astype(int)
    ok = (ix >= 0) & (ix < gx) & (iy >= 0) & (iy < gy) \
        & (pts_np[:, 2] >= cfg.voxel.pc_range[2]) \
        & (pts_np[:, 2] <= cfg.voxel.pc_range[5])
    pillars = {}
    for i in np.nonzero(ok)[0]:
        pillars.setdefault((iy[i], ix[i]), []).append(pts_np[i])
    keys = sorted(pillars)
    V = len(keys)
    feats = np.zeros((V, cap, pts_np.shape[1]), np.float32)
    nump = np.zeros((V,), np.int64)
    coors = np.zeros((V, 4), np.int64)  # (batch, z, y, x)
    for vi, k in enumerate(keys):
        rows = pillars[k][:cap]          # FCFS truncation (ref voxelizer)
        feats[vi, :len(rows)] = rows
        nump[vi] = len(rows)
        coors[vi, 2], coors[vi, 3] = k
    f = torch.from_numpy(feats)
    n = torch.from_numpy(nump)
    coors = torch.from_numpy(coors)
    # decoration (ref :120-140)
    mean = f[:, :, :3].sum(1, keepdim=True) / n.view(-1, 1, 1).float()
    f_cluster = f[:, :, :3] - mean
    f_center = torch.zeros_like(f[:, :, :2])
    f_center[:, :, 0] = f[:, :, 0] - (
        coors[:, 3].float().unsqueeze(1) * vx + (vx / 2 + x0))
    f_center[:, :, 1] = f[:, :, 1] - (
        coors[:, 2].float().unsqueeze(1) * vy + (vy / 2 + y0))
    x = torch.cat([f, f_cluster, f_center], -1)
    mask = (torch.arange(cap).view(1, -1, 1) < n.view(-1, 1, 1)).float()
    x = x * mask
    nf = cfg.model.pillar_filters
    for i in range(len(nf)):
        last = i == len(nf) - 1
        units = nf[i] if last else nf[i] // 2
        w = torch.from_numpy(sd[f"reader.pfn_layers.{i}.linear.weight"])
        x = x @ w.T
        x = _bn_eval(x.permute(0, 2, 1), sd,
                     f"reader.pfn_layers.{i}.norm").permute(0, 2, 1)
        x = F.relu(x)
        x_max = x.max(dim=1, keepdim=True)[0]
        if not last:
            x = torch.cat([x, x_max.repeat(1, cap, 1)], dim=2)
    pooled = x_max[:, 0]                       # (V, C)
    canvas = torch.zeros((pooled.shape[1], gy * gx))
    idx = coors[:, 2] * gx + coors[:, 3]
    canvas[:, idx] = pooled.T
    return canvas.view(1, -1, gy, gx)


def torch_rpn_forward(sd, cfg, x):
    r = cfg.model.rpn
    up_start = len(r.layer_nums) - len(r.us_strides)
    ups = []
    for i, n in enumerate(r.layer_nums):
        x = F.conv2d(x, torch.from_numpy(sd[f"neck.blocks.{i}.1.weight"]),
                     stride=r.ds_strides[i], padding=1)
        x = F.relu(_bn_eval(x, sd, f"neck.blocks.{i}.2", dims=2))
        for j in range(n):
            x = F.conv2d(
                x, torch.from_numpy(sd[f"neck.blocks.{i}.{4 + 3 * j}.weight"]),
                padding=1)
            x = F.relu(_bn_eval(x, sd, f"neck.blocks.{i}.{5 + 3 * j}",
                                dims=2))
        k = i - up_start
        if k >= 0:
            s = r.us_strides[k]
            w = torch.from_numpy(sd[f"neck.deblocks.{k}.0.weight"])
            if s > 1:
                u = F.conv_transpose2d(x, w, stride=int(s))
            else:
                st = int(round(1 / s))
                u = F.conv2d(x, w, stride=st)
            ups.append(F.relu(_bn_eval(u, sd, f"neck.deblocks.{k}.1",
                                       dims=2)))
    return torch.cat(ups, dim=1)


def torch_head_forward(sd, cfg, x):
    h = cfg.model.head
    x = F.conv2d(x, torch.from_numpy(sd["bbox_head.shared_conv.0.weight"]),
                 torch.from_numpy(sd["bbox_head.shared_conv.0.bias"]),
                 padding=1)
    x = F.relu(_bn_eval(x, sd, "bbox_head.shared_conv.1", dims=2))
    rets = []
    for ti in range(len(h.num_classes)):
        t = f"bbox_head.tasks.{ti}"
        inp = x if ti == 0 or not h.forecast_feature else \
            torch.cat([x, rets[ti - 1]["feats"]], dim=1)
        ret = {}
        z = inp
        if h.forecast_feature:
            for rc, rb in ((0, 1), (3, 4)):
                z = F.conv2d(z,
                             torch.from_numpy(
                                 sd[f"{t}.forecast_conv.{rc}.weight"]),
                             torch.from_numpy(
                                 sd[f"{t}.forecast_conv.{rc}.bias"]),
                             padding=1)
                z = F.relu(_bn_eval(z, sd, f"{t}.forecast_conv.{rb}",
                                    dims=2))
            ret["feats"] = z
        branches = list(h.common_heads) + [("hm", (h.num_classes[ti],
                                                   h.num_hm_conv))]
        for name, (_ch, nconv) in branches:
            y = z
            for j in range(nconv - 1):
                y = F.conv2d(y,
                             torch.from_numpy(sd[f"{t}.{name}.{3*j}.weight"]),
                             torch.from_numpy(sd[f"{t}.{name}.{3*j}.bias"]),
                             padding=1)
                y = F.relu(_bn_eval(y, sd, f"{t}.{name}.{3*j+1}", dims=2))
            fi = 3 * (nconv - 1)
            y = F.conv2d(y, torch.from_numpy(sd[f"{t}.{name}.{fi}.weight"]),
                         torch.from_numpy(sd[f"{t}.{name}.{fi}.bias"]),
                         padding=1)
            ret[name] = y
        rets.append(ret)
    return rets


# ---------------------------------------------------------------------------
# pure-torch functional re-execution of the reference sparse VoxelNet middle
# encoder (SpMiddleResNetFHD, scn.py:84-177) via masked dense conv3d
# ---------------------------------------------------------------------------

def _spconv_w(sd, key):
    """spconv weight (kd, kh, kw, ci, co) -> torch conv3d (co, ci, kd, kh, kw)."""
    return torch.from_numpy(sd[key]).permute(4, 3, 0, 1, 2).contiguous()


def torch_scn_forward(sd, cfg, pts_np):
    """ref mean-VFE (voxel_encoder.py:9-24) + SpMiddleResNetFHD
    (scn.py:84-177) from a state dict, emulated densely:

      * SubMConv3d  == dense conv3d (pad 1) re-masked to the input sites
      * SparseConv3d == dense strided conv3d; new active mask = any input
        under the conv footprint (spconv's generative rule)
      * BN1d eps 1e-3 applied as the eval-mode affine, then re-masked
        (spconv applies it to active features only; inactive stay 0)
      * extra_conv (3,1,1) stride (2,1,1) pad 0, then .dense() +
        view(N, C*D, H, W) (scn.py:140-175)

    Returns the (1, C*D, H, W) tensor the ref RPN consumes."""
    vx, vy, vz = cfg.voxel.voxel_size
    x0, y0, z0 = cfg.voxel.pc_range[:3]
    gx, gy, gz = cfg.voxel.grid_size
    D, H, Wd = gz + 1, gy, gx        # sparse_shape +[1,0,0] quirk (scn :152)

    # hard voxelization + mean VFE
    iz = np.floor((pts_np[:, 2] - z0) / vz).astype(int)
    iy = np.floor((pts_np[:, 1] - y0) / vy).astype(int)
    ix = np.floor((pts_np[:, 0] - x0) / vx).astype(int)
    ok = ((ix >= 0) & (ix < gx) & (iy >= 0) & (iy < gy)
          & (iz >= 0) & (iz < gz))
    cap = cfg.voxel.max_points_per_voxel
    vox = {}
    for i in np.nonzero(ok)[0]:
        vox.setdefault((iz[i], iy[i], ix[i]), []).append(pts_np[i])
    C = pts_np.shape[1]
    x = torch.zeros((1, C, D, H, Wd))
    m = torch.zeros((1, 1, D, H, Wd))
    for (z, y, xx), rows in vox.items():
        x[0, :, z, y, xx] = torch.from_numpy(
            np.mean(np.stack(rows[:cap]), 0))
        m[0, 0, z, y, xx] = 1.0

    def bn3(t, prefix):
        return _bn_eval(t, sd, prefix, dims=3)

    def subm(t, prefix):
        y = F.conv3d(t, _spconv_w(sd, f"{prefix}.weight"), padding=1)
        if f"{prefix}.bias" in sd:
            y = y + torch.from_numpy(sd[f"{prefix}.bias"]).view(1, -1, 1, 1, 1)
        return y

    def block(t, p):
        idn = t
        y = F.relu(bn3(subm(t, f"{p}.conv1"), f"{p}.bn1")) * m
        y = bn3(subm(y, f"{p}.conv2"), f"{p}.bn2") * m
        return F.relu(y + idn) * m

    def strided(t, mk, p_conv, p_bn, pad):
        w = _spconv_w(sd, f"{p_conv}.weight")
        y = F.conv3d(t, w, stride=(2, 2, 2), padding=pad)
        ones = torch.ones((1, 1, 3, 3, 3))
        mk2 = (F.conv3d(mk, ones, stride=(2, 2, 2), padding=pad) > 0).float()
        return F.relu(bn3(y, p_bn)) * mk2, mk2

    # conv_input (SubM 3x3x3 bias=False) + BN + ReLU (scn :98-102)
    x = F.relu(bn3(subm(x, "backbone.conv_input.0"),
                   "backbone.conv_input.1")) * m
    # conv1: two SparseBasicBlocks (scn :104-107)
    for j in range(2):
        x = block(x, f"backbone.conv1.{j}")
    # conv2..conv4: strided + 2 blocks; conv4 z-pad 0 (scn :109-137)
    for s in (2, 3, 4):
        pad = (0, 1, 1) if s == 4 else (1, 1, 1)
        x, m = strided(x, m, f"backbone.conv{s}.0", f"backbone.conv{s}.1",
                       pad)
        for j in range(2):
            x = block(x, f"backbone.conv{s}.{3 + j}")
    # extra_conv (3,1,1)/(2,1,1) pad 0 (scn :140-146)
    w = _spconv_w(sd, "backbone.extra_conv.0.weight")
    y = F.conv3d(x, w, stride=(2, 1, 1))
    ones = torch.ones((1, 1, 3, 1, 1))
    m2 = (F.conv3d(m, ones, stride=(2, 1, 1)) > 0).float()
    x = F.relu(bn3(y, "backbone.extra_conv.1")) * m2
    # .dense() + view(N, C*D, H, W) — C-major channel flatten (scn :165-168)
    N, Cc, Dd, Hh, Ww = x.shape
    return x.reshape(N, Cc * Dd, Hh, Ww)


@pytest.mark.slow
def test_forward_parity_voxelnet_torch_oracle():
    """Converted fabricated weights through the SPARSE VoxelNet graph: our
    jitted forward (voxelize_mean -> SparseMiddleEncoder -> folded z_crush
    -> RPN -> chained CenterHead) must match the torch masked-dense
    re-execution of the reference graph on a tiny-xy / full-z grid."""
    cfg = _foldable_voxelnet_cfg()
    cfg, model, variables, sd, conv = _build_and_convert("forecast_n3dtf",
                                                         cfg=cfg)
    rep = conv.pop("__convert_report__")
    assert rep["extra_conv_folded"], "z geometry must fold for parity"
    assert not rep["missing_ref_keys"]

    rng = np.random.default_rng(7)
    P = 400
    pts = np.zeros((P, 5), np.float32)
    pts[:, 0] = rng.uniform(cfg.voxel.pc_range[0] + 0.2,
                            cfg.voxel.pc_range[3] - 0.2, P)
    pts[:, 1] = rng.uniform(cfg.voxel.pc_range[1] + 0.2,
                            cfg.voxel.pc_range[4] - 0.2, P)
    pts[:, 2] = rng.uniform(cfg.voxel.pc_range[2] + 0.2,
                            cfg.voxel.pc_range[5] - 0.2, P)
    pts[:, 3:] = rng.uniform(0, 1, (P, 2))

    preds = model.apply(
        {"params": conv["params"], "batch_stats": conv["batch_stats"]},
        jnp.asarray(pts[None]), jnp.ones((1, P), bool), train=False)

    feat = torch_scn_forward(sd, cfg, pts)
    feat = torch_rpn_forward(sd, cfg, feat)
    rets = torch_head_forward(sd, cfg, feat)

    assert len(preds) == len(rets)
    for ti, (ours, ref) in enumerate(zip(preds, rets)):
        for k, v in ref.items():
            got = np.asarray(ours[k])[0]                  # (H, W, C)
            want = v[0].numpy().transpose(1, 2, 0)
            scale = max(np.abs(want).max(), 1.0)
            np.testing.assert_allclose(
                got / scale, want / scale, atol=1e-4,
                err_msg=f"task {ti} head {k}")


@pytest.mark.slow
def test_forward_parity_pp_torch_oracle():
    """Converted fabricated weights: our jitted pp forward must match the
    torch re-execution of the reference graph to fp32 tolerance."""
    cfg, model, variables, sd, conv = _build_and_convert("pp_forecast_n3dtf")
    conv.pop("__convert_report__")

    # points: < cap per pillar so the reference's FCFS truncation is a no-op
    rng = np.random.default_rng(42)
    P = 256
    pts = np.zeros((P, 5), np.float32)
    pts[:, 0] = rng.uniform(cfg.voxel.pc_range[0] + 0.2,
                            cfg.voxel.pc_range[3] - 0.2, P)
    pts[:, 1] = rng.uniform(cfg.voxel.pc_range[1] + 0.2,
                            cfg.voxel.pc_range[4] - 0.2, P)
    pts[:, 2] = rng.uniform(-2, 1, P)
    pts[:, 3:] = rng.uniform(0, 1, (P, 2))

    preds = model.apply(
        {"params": conv["params"], "batch_stats": conv["batch_stats"]},
        jnp.asarray(pts[None]), jnp.ones((1, P), bool), train=False)

    canvas = torch_pfn_forward(sd, cfg, pts)
    feat = torch_rpn_forward(sd, cfg, canvas)
    rets = torch_head_forward(sd, cfg, feat)

    assert len(preds) == len(rets)
    for ti, (ours, ref) in enumerate(zip(preds, rets)):
        for k, v in ref.items():
            got = np.asarray(ours[k])[0]                  # (H, W, C)
            want = v[0].numpy().transpose(1, 2, 0)
            # fp32 reduction-order noise compounds through the chained heads
            # with O(1e4) random-weight activations, and near-zero outputs
            # of cancelling large terms make elementwise rtol meaningless —
            # compare normwise against the tensor's own magnitude
            scale = max(np.abs(want).max(), 1.0)
            np.testing.assert_allclose(
                got / scale, want / scale, atol=5e-5,
                err_msg=f"task {ti} head {k}")


def real_ckpt_fixed_scene(P=2000):
    """The canonical fixed point cloud for real-checkpoint parity: 2000
    points, seed 0, uniform xy in [-50, 50], z in [-3, 1], feats in [0, 1].
    The reference-side recipe (docs/PARITY.md, "Real-checkpoint detection
    artifact") feeds these SAME points through the reference repo's
    inference to produce the FUTUREDET_REF_DETECTIONS npz."""
    rng = np.random.default_rng(0)
    return np.concatenate([
        rng.uniform(-50, 50, (1, P, 2)), rng.uniform(-3, 1, (1, P, 1)),
        rng.uniform(0, 1, (1, P, 2))], -1).astype(np.float32)


def test_real_reference_checkpoint_parity():
    """Runs when FUTUREDET_REF_CKPT names a reference .pth: converts it onto
    the full-size config named by FUTUREDET_REF_MODEL (default
    forecast_n3dtf), decodes + NMSes the fixed scene, and — when
    FUTUREDET_REF_DETECTIONS names an npz recorded from the reference
    repo's inference on the same scene (recipe in docs/PARITY.md) —
    asserts the surviving detections match box-for-box. Without the
    artifact it still verifies full key coverage + finite decoded output
    and writes our detections next to the checkpoint for diffing."""
    path = os.environ.get("FUTUREDET_REF_CKPT")
    if not path or not os.path.exists(path):
        pytest.skip("FUTUREDET_REF_CKPT not set — no reference checkpoint "
                    "available in this environment")
    from futuredet_tpu.config import get_config
    from futuredet_tpu.eval.decode import decode_and_nms
    from futuredet_tpu.models.detector import build_detector
    from futuredet_tpu.utils.convert_checkpoint import (
        convert_reference_checkpoint, load_reference_state_dict)

    name = os.environ.get("FUTUREDET_REF_MODEL", "forecast_n3dtf")
    import dataclasses
    cfg = get_config(name)
    # box-level parity demands fp32 reference numerics: disable the
    # bf16-pair packed-gather serving default for the comparison forward
    cfg = cfg.replace(model=dataclasses.replace(
        cfg.model, middle_sparse_dtype=None))
    sd = load_reference_state_dict(path)
    model = build_detector(cfg)
    pts = real_ckpt_fixed_scene()
    variables = jax.device_get(model.init(
        jax.random.PRNGKey(0), jnp.asarray(pts),
        jnp.ones(pts.shape[:2], bool), train=False))
    conv = convert_reference_checkpoint(sd, cfg, variables)
    rep = conv.pop("__convert_report__")
    assert not rep["missing_ref_keys"], rep["missing_ref_keys"][:10]
    preds = model.apply(
        {"params": conv["params"], "batch_stats": conv["batch_stats"]},
        jnp.asarray(pts), jnp.ones(pts.shape[:2], bool), train=False)
    det = jax.device_get(decode_and_nms(cfg, preds))
    keep = np.asarray(det.valid[0])
    boxes = np.asarray(det.boxes[0])[keep]
    scores = np.asarray(det.scores[0])[keep]
    labels = np.asarray(det.labels[0])[keep]
    assert np.all(np.isfinite(boxes)) and np.all(np.isfinite(scores))

    art = os.environ.get("FUTUREDET_REF_DETECTIONS")
    if not art or not os.path.exists(art):
        out = os.path.splitext(path)[0] + ".futuredet_tpu_detections.npz"
        np.savez(out, boxes=boxes, scores=scores, labels=labels)
        pytest.skip(
            f"converted forward + decode finite ({keep.sum()} detections, "
            f"dumped to {out}); set FUTUREDET_REF_DETECTIONS to a "
            "reference-run artifact (docs/PARITY.md) to assert box-level "
            "parity")
    ref = np.load(art)
    assert_detections_match(boxes, scores, labels,
                            ref["boxes"], ref["scores"], ref["labels"])


def assert_detections_match(boxes, scores, labels, rboxes, rscores, rlabels,
                            score_floor=0.1, center_tol=0.1,
                            score_tol=1e-2):
    """Greedy same-label center matching between two detection sets; every
    confident reference detection must have a counterpart with matching
    box geometry and score. Exercised on fabricated pairs by
    test_detection_match_harness; consumed by the real-checkpoint test."""
    want = rscores >= score_floor
    rboxes, rscores, rlabels = rboxes[want], rscores[want], rlabels[want]
    used = np.zeros(len(boxes), bool)
    for rb, rs, rl in zip(rboxes, rscores, rlabels):
        d = np.linalg.norm(boxes[:, :2] - rb[:2], axis=1)
        d = np.where((labels == rl) & ~used, d, np.inf)
        j = int(np.argmin(d))
        assert d[j] <= center_tol, (
            f"reference detection at {rb[:3]} (label {rl}, score {rs:.3f}) "
            f"has no match within {center_tol} m (closest {d[j]:.3f})")
        used[j] = True
        assert abs(scores[j] - rs) <= score_tol, (scores[j], rs)
        np.testing.assert_allclose(boxes[j][:6], rb[:6], atol=0.05)
        # yaw modulo pi-symmetry of near-square boxes: compare sin/cos
        np.testing.assert_allclose(
            [np.sin(boxes[j][8]), np.cos(boxes[j][8])],
            [np.sin(rb[8]), np.cos(rb[8])], atol=0.05)


def test_detection_match_harness():
    """The matcher itself: accepts permuted + jittered copies, rejects a
    moved box, a score drift, and a missing detection."""
    rng = np.random.default_rng(3)
    n = 12
    rboxes = np.concatenate([
        rng.uniform(-40, 40, (n, 2)), rng.uniform(-2, 0, (n, 1)),
        rng.uniform(1, 4, (n, 3)), rng.uniform(-5, 5, (n, 2)),
        rng.uniform(-np.pi, np.pi, (n, 1))], 1)
    rscores = rng.uniform(0.2, 0.9, n)
    rlabels = rng.integers(0, 3, n)
    perm = rng.permutation(n)
    boxes = rboxes[perm] + rng.normal(0, 0.005, (n, 9))
    scores, labels = rscores[perm], rlabels[perm]
    assert_detections_match(boxes, scores, labels, rboxes, rscores, rlabels)
    moved = boxes.copy()
    moved[0, :2] += 1.0
    with pytest.raises(AssertionError):
        assert_detections_match(moved, scores, labels,
                                rboxes, rscores, rlabels)
    with pytest.raises(AssertionError):
        assert_detections_match(boxes, scores + 0.05, labels,
                                rboxes, rscores, rlabels)
    with pytest.raises(AssertionError):
        assert_detections_match(boxes[1:], scores[1:], labels[1:],
                                rboxes, rscores, rlabels)
