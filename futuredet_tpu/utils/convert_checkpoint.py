"""Reference-checkpoint import: map a FutureDet `.pth` state dict onto the
flax param/batch_stats trees.

The reference detector's module tree (state-dict key structure derived from
`/root/reference/det3d/models/`):

  reader.pfn_layers.{i}.linear.weight / .norm.*          (pillar_encoder.py:95-105)
  backbone.conv_input.{0,1}.* , conv{1..4}.*, extra_conv.* (scn.py:98-146)
  neck.blocks.{i}.{seq}.* , neck.deblocks.{k}.{0,1}.*     (rpn.py:120-190)
  bbox_head.shared_conv.{0,1}.* , bbox_head.bev_conv.*    (center_head.py:336-349)
  bbox_head.tasks.{i}.forecast_conv.{0,1,3,4}.*           (center_head.py:119-124)
  bbox_head.tasks.{i}.{branch}.{j}.*                      (center_head.py:129-152)

Layout conversions:
  torch Linear  (out, in)            -> flax Dense kernel (in, out)
  torch Conv2d  (out, in, kh, kw)    -> flax Conv kernel (kh, kw, in, out)
  torch ConvT2d (in, out, kh, kw)    -> flax ConvTranspose kernel
                                        (kh, kw, in, out)  [k == stride: the
                                        non-overlapping taps must ALSO be
                                        spatially flipped — verified against
                                        torch in tests/test_checkpoint_convert.py]
  spconv weight (kd, kh, kw, in, out)-> SparseConv kernel (27, in, out) with
                                        K = (kd*3+kh)*3+kw (ops/sparse_conv
                                        _offsets enumerates (dz,dy,dx)
                                        row-major, matching correlation taps)
  BN weight/bias -> scale/bias (params); running_mean/var -> mean/var
  (batch_stats). MaskedBatchNorm uses the same names.

Use:
    sd = load_reference_state_dict("epoch_20.pth")
    variables = convert_reference_checkpoint(sd, cfg, variables)
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from ..config import ExperimentConfig


def load_reference_state_dict(path: str) -> Dict[str, np.ndarray]:
    """torch.load a reference checkpoint -> {key: np.ndarray} (host)."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("module.")  # DDP wrapper (ref apis/train.py:311)
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


# ---------------------------------------------------------------------------
# layout converters
# ---------------------------------------------------------------------------

def _linear(w):          # (out, in) -> (in, out)
    return np.ascontiguousarray(w.T)


def _conv2d(w):          # (out, in, kh, kw) -> (kh, kw, in, out)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _deconv2d(w):        # (in, out, kh, kw) -> (kh, kw, in, out), flipped
    # flax ConvTranspose correlates with the kernel as-is while torch's
    # transposed conv scatters it; for the k==stride blocks this is a
    # spatial flip of the taps (verified numerically in tests)
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _subm3d(w):          # (kd, kh, kw, in, out) -> (K, in, out)
    kd, kh, kw, ci, co = w.shape
    return np.ascontiguousarray(w.reshape(kd * kh * kw, ci, co))


# ---------------------------------------------------------------------------
# key-map builders: list of (ours_path, ref_key, kind)
#   ours_path: tuple of str into variables["params"] / ["batch_stats"]
#   kind: "linear" | "conv" | "deconv" | "subm" | "copy"
# ---------------------------------------------------------------------------

def _bn(ours_prefix: Tuple[str, ...], ref_prefix: str, bn_name: str = None):
    """BN param + stat entries. flax auto-names nn.BatchNorm 'BatchNorm_0'
    inside ConvBNReLU/DeconvBNReLU; MaskedBatchNorm instances pass their
    own name via bn_name=None -> the prefix IS the bn module."""
    p = ours_prefix if bn_name is None else ours_prefix + (bn_name,)
    return ([(p + ("scale",), f"{ref_prefix}.weight", "copy"),
             (p + ("bias",), f"{ref_prefix}.bias", "copy")],
            [(p + ("mean",), f"{ref_prefix}.running_mean", "copy"),
             (p + ("var",), f"{ref_prefix}.running_var", "copy")])


def _conv_bn_relu(ours: Tuple[str, ...], ref_conv: str, ref_bn: str,
                  bias: bool):
    params = [(ours + ("Conv_0", "kernel"), f"{ref_conv}.weight", "conv")]
    if bias:
        params.append((ours + ("Conv_0", "bias"), f"{ref_conv}.bias", "copy"))
    bp, bs = _bn(ours, ref_bn, "BatchNorm_0")
    return params + bp, bs


def _key_map(cfg: ExperimentConfig):
    """Returns (param_entries, stat_entries) for the full detector."""
    params: List = []
    stats: List = []

    def add(p, s):
        params.extend(p)
        stats.extend(s)

    m = cfg.model

    # ---- reader ---------------------------------------------------------
    if m.reader == "pillar_feature_net":
        # ref PillarFeatureNet (pillar_encoder.py:59-105). Our PFN names the
        # Dense/MaskedBatchNorm pairs Dense_{i}/MaskedBatchNorm_{i}.
        for i in range(len(m.pillar_filters)):
            params.append((("reader", f"Dense_{i}", "kernel"),
                           f"reader.pfn_layers.{i}.linear.weight", "linear"))
            bp, bs = _bn(("reader", f"MaskedBatchNorm_{i}"),
                         f"reader.pfn_layers.{i}.norm")
            add(bp, bs)
    # mean_vfe (VoxelFeatureExtractorV3) has no parameters

    # ---- backbone -------------------------------------------------------
    if m.detector == "voxelnet" and m.middle == "sparse":
        # ref SpMiddleResNetFHD (scn.py:98-146) -> our SparseMiddleEncoder
        params.append((("middle", "conv_input", "kernel"),
                       "backbone.conv_input.0.weight", "subm"))
        bp, bs = _bn(("middle", "bn_input"), "backbone.conv_input.1")
        add(bp, bs)

        def res_block(ours_name: str, ref_prefix: str):
            for cn, bn in (("conv1", "bn1"), ("conv2", "bn2")):
                params.append((("middle", ours_name, cn, "kernel"),
                               f"{ref_prefix}.{cn}.weight", "subm"))
                params.append((("middle", ours_name, cn, "bias"),
                               f"{ref_prefix}.{cn}.bias", "copy"))
                p2, s2 = _bn(("middle", ours_name, bn),
                             f"{ref_prefix}.{bn}")
                add(p2, s2)

        # stage 0: conv1 = two SparseBasicBlocks
        for j in range(2):
            res_block(f"res0_{j}", f"backbone.conv1.{j}")
        # stages 1..3: conv{s+1} = [SparseConv3d, BN, ReLU, block, block]
        for s in range(1, 4):
            params.append((("middle", f"down{s}", "kernel"),
                           f"backbone.conv{s + 1}.0.weight", "subm"))
            p2, s2 = _bn(("middle", f"bn_down{s}"), f"backbone.conv{s + 1}.1")
            add(p2, s2)
            for j in range(2):
                res_block(f"res{s}_{j}", f"backbone.conv{s + 1}.{3 + j}")
        # NOTE ref extra_conv ((3,1,1) stride-(2,1,1) z-crush, scn.py:140-146)
        # composes into our z_crush 1x1 projection — handled separately in
        # convert_reference_checkpoint via _compose_extra_conv.

    # ---- neck (RPN, rpn.py:120-190) ------------------------------------
    up_start = len(m.rpn.layer_nums) - len(m.rpn.us_strides)
    for i, n in enumerate(m.rpn.layer_nums):
        p2, s2 = _conv_bn_relu((  # stem: Sequential[pad, conv(1), bn(2), relu]
            "neck", f"block{i}_in"), f"neck.blocks.{i}.1",
            f"neck.blocks.{i}.2", bias=False)
        add(p2, s2)
        for j in range(n):
            p2, s2 = _conv_bn_relu(
                ("neck", f"block{i}_conv{j}"), f"neck.blocks.{i}.{4 + 3 * j}",
                f"neck.blocks.{i}.{5 + 3 * j}", bias=False)
            add(p2, s2)
        k = i - up_start
        if k >= 0:
            s_up = m.rpn.us_strides[k]
            if s_up > 1:
                params.append((("neck", f"deblock{k}", "ConvTranspose_0",
                                "kernel"),
                               f"neck.deblocks.{k}.0.weight", "deconv"))
                p2, s2 = _bn(("neck", f"deblock{k}"),
                             f"neck.deblocks.{k}.1", "BatchNorm_0")
                add(p2, s2)
            else:
                p2, s2 = _conv_bn_relu(
                    ("neck", f"deblock{k}"), f"neck.deblocks.{k}.0",
                    f"neck.deblocks.{k}.1", bias=False)
                add(p2, s2)

    # ---- head (CenterHead, center_head.py:336-372) ----------------------
    h = m.head
    p2, s2 = _conv_bn_relu(("head", "shared_conv"), "bbox_head.shared_conv.0",
                           "bbox_head.shared_conv.1", bias=True)
    add(p2, s2)
    if h.bev_map:
        for i in range(3):
            p2, s2 = _conv_bn_relu(
                ("head", f"bev_conv{i}"), f"bbox_head.bev_conv.{3 * i}",
                f"bbox_head.bev_conv.{3 * i + 1}", bias=True)
            add(p2, s2)

    # per-task SepHeads
    n_tasks = len(h.num_classes)
    for ti in range(n_tasks):
        ours_t = ("head", f"task{ti}")
        ref_t = f"bbox_head.tasks.{ti}"
        if h.forecast_feature:
            # forecast_conv Sequential [conv(0), bn(1), relu, conv(3), bn(4)]
            for ci, (rc, rb) in enumerate(((0, 1), (3, 4))):
                p2, s2 = _conv_bn_relu(
                    ours_t + (f"forecast_conv{ci}",),
                    f"{ref_t}.forecast_conv.{rc}",
                    f"{ref_t}.forecast_conv.{rb}", bias=True)
                add(p2, s2)
        if h.two_stage:
            pairs = [("two_stage_forecast_conv", "forecast_conv")]
            if any(name == "rvel" for name, _ in h.common_heads):
                pairs.append(("two_stage_reverse_conv", "reverse_conv"))
            for ours_name, ref_name in pairs:
                p2, s2 = _conv_bn_relu(
                    ours_t + (ours_name,), f"{ref_t}.{ref_name}.0",
                    f"{ref_t}.{ref_name}.1", bias=True)
                add(p2, s2)

        branches = list(h.common_heads) + [("hm", (0, h.num_hm_conv))]
        for name, (_ch, num_conv) in branches:
            # SepHead branch Sequential with bn=True: per inner conv
            # [conv(3j), bn(3j+1), relu], final conv at 3*(num_conv-1)
            for j in range(num_conv - 1):
                params.append((ours_t + (f"{name}_conv{j}", "kernel"),
                               f"{ref_t}.{name}.{3 * j}.weight", "conv"))
                params.append((ours_t + (f"{name}_conv{j}", "bias"),
                               f"{ref_t}.{name}.{3 * j}.bias", "copy"))
                p2, s2 = _bn(ours_t + (f"{name}_bn{j}",),
                             f"{ref_t}.{name}.{3 * j + 1}")
                add(p2, s2)
            fi = 3 * (num_conv - 1)
            params.append((ours_t + (f"{name}_final", "kernel"),
                           f"{ref_t}.{name}.{fi}.weight", "conv"))
            params.append((ours_t + (f"{name}_final", "bias"),
                           f"{ref_t}.{name}.{fi}.bias", "copy"))

    return params, stats


_KIND = {"linear": _linear, "conv": _conv2d, "deconv": _deconv2d,
         "subm": _subm3d, "copy": lambda w: np.asarray(w)}


def _set_path(tree, path, value):
    node = tree
    for k in path[:-1]:
        if k not in node:
            raise KeyError(f"missing module {'/'.join(path)} in target tree")
        node = node[k]
    if path[-1] not in node:
        raise KeyError(f"missing leaf {'/'.join(path)} in target tree")
    old = node[path[-1]]
    if tuple(np.shape(old)) != tuple(value.shape):
        raise ValueError(f"shape mismatch at {'/'.join(path)}: "
                         f"{np.shape(old)} vs {value.shape}")
    node[path[-1]] = value.astype(np.asarray(old).dtype)


def _compose_extra_conv(sd: Dict[str, np.ndarray], variables: dict) -> bool:
    """Fold ref `backbone.extra_conv` ((3,1,1) stride-(2,1,1) conv + BN +
    ReLU over the z axis, scn.py:140-146) into our z_crush 1x1 projection.

    Our middle encoder emits the stage-3 z-stack flattened into channels
    (Z*128); ref applies a z-conv D=5->2 then flattens (2*128=256). Any
    linear map of the z-stack is expressible as a 1x1 conv on the flattened
    layout — but our z_crush ALSO carries its own BN+ReLU and a different
    output basis, so an exact fold additionally requires our Z to equal the
    ref D (alignment of the sparse downsampling arithmetic). We fold when
    shapes line up and report otherwise."""
    w = sd.get("backbone.extra_conv.0.weight")
    if w is None:
        return False
    params = variables["params"]
    if "middle" not in params or "z_crush" not in params:
        return False
    zk = np.asarray(params["z_crush"]["Conv_0"]["kernel"])  # (1,1,Z*128,256)
    cin_total = zk.shape[2]
    kd, kh, kw, ci, co = w.shape              # (3,1,1,128,128)
    D = cin_total // ci
    need = 2 * co                              # ref flattens D_out=2 x 128
    if zk.shape[3] != need or cin_total % ci != 0:
        return False
    # the ref z-conv arithmetic ((D - 3) // 2 + 1) must actually produce the
    # 2-deep output the RPN weights expect — D in {5, 6} (full-size grids
    # give exactly 5: 41 -> 21 -> 11 -> 5, scn.py:109-146)
    if D not in (5, 6):
        return False
    # ref extra_conv: kernel (3,1,1), stride (2,1,1), NO z padding: output
    # depth d reads z in {2d, 2d+1, 2d+2} (D=5 -> 2, scn.py:140-146).
    # Channel layouts: our middle flattens the z-stack z-major (z*C + c,
    # middle.py:298); ref .dense() flattens C-major (c*D + d, scn.py:165-168)
    # and the converted RPN weights expect the ref layout.
    new = np.zeros((1, 1, cin_total, need), np.float32)
    for d_out in range(2):
        for kdi in range(kd):
            z = 2 * d_out + kdi
            if z >= D:
                continue
            # rows: our z-major block; cols: ref c-major (stride 2, off d)
            new[0, 0, z * ci:(z + 1) * ci, d_out::2] += w[kdi, 0, 0]
    params["z_crush"]["Conv_0"]["kernel"] = new
    # the z_crush conv bias stays zero (ref extra_conv conv has bias=False);
    # ref BN is over the 128 sparse channels -> repeat per flattened (c, d)
    zc_p = params["z_crush"]["BatchNorm_0"]
    zc_s = variables["batch_stats"]["z_crush"]["BatchNorm_0"]
    zc_p["scale"] = np.repeat(sd["backbone.extra_conv.1.weight"], 2)
    zc_p["bias"] = np.repeat(sd["backbone.extra_conv.1.bias"], 2)
    zc_s["mean"] = np.repeat(sd["backbone.extra_conv.1.running_mean"], 2)
    zc_s["var"] = np.repeat(sd["backbone.extra_conv.1.running_var"], 2)
    if "bias" in params["z_crush"]["Conv_0"]:
        params["z_crush"]["Conv_0"]["bias"] = np.zeros((need,), np.float32)
    return True


def convert_reference_checkpoint(sd: Dict[str, np.ndarray],
                                 cfg: ExperimentConfig,
                                 variables: dict,
                                 strict: bool = True) -> dict:
    """Fill a flax variables dict {'params':..., 'batch_stats':...} (host
    numpy trees, e.g. jax.device_get of model.init output) with converted
    reference weights. Returns the filled tree; raises on unmapped leaves
    when strict."""
    import jax

    variables = jax.tree.map(np.asarray, variables)
    # deep-copy into plain nested dicts we can mutate
    def to_dict(t):
        if isinstance(t, dict):
            return {k: to_dict(v) for k, v in t.items()}
        return np.array(t)
    variables = {k: to_dict(v) for k, v in variables.items()}

    param_entries, stat_entries = _key_map(cfg)
    missing_ref, filled = [], set()
    for tree_name, entries in (("params", param_entries),
                               ("batch_stats", stat_entries)):
        for path, ref_key, kind in entries:
            if ref_key not in sd:
                missing_ref.append(ref_key)
                continue
            _set_path(variables[tree_name], path, _KIND[kind](sd[ref_key]))
            filled.add((tree_name,) + tuple(path))

    if missing_ref and strict:
        raise KeyError(f"{len(missing_ref)} reference keys absent from the "
                       f"state dict, e.g. {missing_ref[:5]}")

    unused = [k for k in sd
              if k not in {e[1] for e in param_entries + stat_entries}
              and "num_batches_tracked" not in k
              and not k.startswith("backbone.extra_conv")
              and not k.startswith("global_step")]
    report = {"filled": len(filled), "missing_ref_keys": missing_ref,
              "unused_ref_keys": unused,
              "extra_conv_folded": _compose_extra_conv(sd, variables)}
    variables["__convert_report__"] = report
    return variables
