"""CenterHead — the heart of FutureDet (behavioral port of
`/root/reference/det3d/models/bbox_heads/center_head.py`).

Structure (ref :232-390):
  shared_conv (3x3+BN+ReLU) -> per-task SepHead. In `dense` mode there is one
  SepHead per future timestep; with `forecast_feature` head i>0 consumes
  concat(shared features, head i-1's forecast features) (ref :361-368,383-388).

All maps are NHWC. Heads are built statically from the frozen HeadConfig, so
the whole module jits once per config.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import HeadConfig
from .layers import BN_EPS, BN_MOMENTUM, ConvBNReLU


def _final_conv_bias(init_bias):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, init_bias, dtype)
    return init


class SepHead(nn.Module):
    """Per-task head: one small conv stack per regression target (ref :81-174)."""
    heads: Tuple[Tuple[str, Tuple[int, int]], ...]
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    forecast_feature: bool = False
    two_stage: bool = False
    wide_head: bool = False
    in_channels: int = 64
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        out: Dict[str, jax.Array] = {}
        head_conv = self.in_channels if self.wide_head else self.head_conv
        head_names = [h for h, _ in self.heads]

        if self.forecast_feature:
            # two 3x3 conv+BN+ReLU producing chained features (ref :119-124)
            x = ConvBNReLU(self.head_conv, 3, 1, axis_name=self.axis_name,
                           compute_dtype=self.compute_dtype,
                           name="forecast_conv0")(x, train)
            x = ConvBNReLU(self.head_conv, 3, 1, axis_name=self.axis_name,
                           compute_dtype=self.compute_dtype,
                           name="forecast_conv1")(x, train)
            out["feats"] = x

        # two-stage fine-tuning: vel/rot (and rvel/rrot) branches read a
        # shared adaptation conv (ref :102-117,163-170)
        shared_fwd = shared_rev = None
        if self.two_stage and "vel" in head_names and "rot" in head_names:
            shared_fwd = ConvBNReLU(self.head_conv, 3, 1,
                                    axis_name=self.axis_name,
                                    name="two_stage_forecast_conv")(x, train)
        if self.two_stage and "rvel" in head_names and "rrot" in head_names:
            shared_rev = ConvBNReLU(self.head_conv, 3, 1,
                                    axis_name=self.axis_name,
                                    name="two_stage_reverse_conv")(x, train)

        for head, (classes, num_conv) in self.heads:
            h = x
            if shared_fwd is not None and head in ("vel", "rot"):
                h = shared_fwd
            elif shared_rev is not None and head in ("rvel", "rrot"):
                h = shared_rev
            for i in range(num_conv - 1):
                h = nn.Conv(head_conv, (self.final_kernel, self.final_kernel),
                            padding="SAME", dtype=dt,
                            name=f"{head}_conv{i}")(h)
                h = nn.BatchNorm(use_running_average=not train,
                                 momentum=BN_MOMENTUM, epsilon=BN_EPS,
                                 axis_name=self.axis_name, dtype=dt,
                                 name=f"{head}_bn{i}")(h)
                h = nn.relu(h)
            bias_init = (_final_conv_bias(self.init_bias) if head == "hm"
                         else nn.initializers.zeros)
            h = nn.Conv(classes, (self.final_kernel, self.final_kernel),
                        padding="SAME", bias_init=bias_init, dtype=dt,
                        name=f"{head}_final")(h)
            out[head] = h.astype(jnp.float32)
        return out


class FeatureAdaption(nn.Module):
    """DCN v1 feature adaption (ref center_head.py:40-79): a 1x1 conv
    (zero-init) predicts per-tap offsets for a 3x3 deformable conv."""
    out_channels: int
    deformable_groups: int = 4

    @nn.compact
    def __call__(self, x):
        from ..ops.deform import deform_conv2d
        G, K = self.deformable_groups, 9
        offsets = nn.Conv(G * 2 * K, (1, 1),
                          kernel_init=nn.initializers.zeros,
                          name="conv_offset")(x)
        w = self.param("adapt_kernel", nn.initializers.he_uniform(),
                       (K, x.shape[-1], self.out_channels))
        return nn.relu(deform_conv2d(x, offsets, w,
                                     deformable_groups=G))


class DCNSepHead(nn.Module):
    """SepHead variant with deformable feature adaption: separate DCN
    branches for classification and regression (ref center_head.py:176-228).
    """
    heads: Tuple[Tuple[str, Tuple[int, int]], ...]  # excludes hm
    num_cls: int
    head_conv: int = 64
    final_kernel: int = 3
    init_bias: float = -2.19
    in_channels: int = 64
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        center_feat = FeatureAdaption(x.shape[-1],
                                      name="feature_adapt_cls")(x)
        reg_feat = FeatureAdaption(x.shape[-1],
                                   name="feature_adapt_reg")(x)
        # heatmap branch (ref :206-214)
        h = nn.Conv(self.head_conv, (3, 3), padding="SAME",
                    name="cls_conv")(center_feat)
        h = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, axis_name=self.axis_name,
                         name="cls_bn")(h)
        h = nn.relu(h)
        hm = nn.Conv(self.num_cls, (3, 3), padding="SAME",
                     bias_init=_final_conv_bias(self.init_bias),
                     name="cls_final")(h)
        out = SepHead(heads=self.heads, head_conv=self.head_conv,
                      final_kernel=self.final_kernel,
                      init_bias=self.init_bias,
                      in_channels=self.in_channels,
                      axis_name=self.axis_name,
                      name="task_head")(reg_feat, train)
        out["hm"] = hm
        return out


class CenterHead(nn.Module):
    cfg: HeadConfig
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    def _task_heads(self) -> List[Tuple[Tuple[str, Tuple[int, int]], ...]]:
        """Per-task branch specs incl. the standard-mode vel widening
        (ref :351-359: vel/rvel channels x timesteps unless dense/classify/wide)."""
        c = self.cfg
        specs = []
        for num_cls in c.num_classes:
            heads = []
            for name, (ch, nconv) in c.common_heads:
                if (not c.dense and not c.classify and not c.wide_head
                        and name in ("vel", "rvel")):
                    ch = ch * c.timesteps
                heads.append((name, (ch, nconv)))
            heads.append(("hm", (num_cls, c.num_hm_conv)))
            specs.append(tuple(heads))
        return specs

    @nn.compact
    def __call__(self, x, bev_map=None, train: bool = False):
        c = self.cfg
        share = c.effective_share_channel
        x = ConvBNReLU(share, 3, 1, axis_name=self.axis_name,
                       compute_dtype=self.compute_dtype,
                       name="shared_conv")(x, train)

        if c.bev_map:
            b = bev_map
            for i, ch in enumerate((16, 32, share)):
                b = ConvBNReLU(ch, 3, 1, axis_name=self.axis_name,
                               name=f"bev_conv{i}")(b, train)
            x = x + b

        rets: List[Dict[str, jax.Array]] = []
        for i, heads in enumerate(self._task_heads()):
            if i != 0 and c.forecast_feature:
                inp = jnp.concatenate([x, rets[i - 1]["feats"]], axis=-1)
                in_ch = 2 * share
            else:
                inp = x
                in_ch = share
            if c.dcn_head:
                # DCN path excludes hm from the branch dict — the cls_head
                # predicts it from the adapted features (ref :357-372)
                rets.append(DCNSepHead(
                    heads=tuple(h for h in heads if h[0] != "hm"),
                    num_cls=c.num_classes[i], head_conv=share,
                    final_kernel=3, init_bias=c.init_bias, in_channels=in_ch,
                    axis_name=self.axis_name, name=f"task{i}")(inp, train))
                continue
            rets.append(SepHead(
                heads=heads, head_conv=share, final_kernel=3,
                init_bias=c.init_bias, forecast_feature=c.forecast_feature,
                two_stage=c.two_stage, wide_head=c.wide_head,
                in_channels=in_ch, axis_name=self.axis_name,
                compute_dtype=self.compute_dtype,
                name=f"task{i}")(inp, train))
        return rets
