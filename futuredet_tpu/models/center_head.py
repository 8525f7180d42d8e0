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


class _ConvParams(nn.Module):
    """Parameter holder shaped/named exactly like an `nn.Conv` instance so
    several branch convs can be fused into one wide conv at apply time
    without changing the checkpoint tree."""
    features: int
    in_features: int
    kernel: int = 3
    bias_init: nn.initializers.Initializer = nn.initializers.zeros

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.kernel, self.in_features,
                        self.features))
        b = self.param("bias", self.bias_init, (self.features,))
        return k, b


class _BNParams(nn.Module):
    """Parameter/stats holder shaped/named exactly like `nn.BatchNorm`.

    The caller computes batch statistics over the fused (concatenated)
    activations and passes this branch's slice in; the holder owns the
    per-branch running stats so the checkpoint tree is unchanged.
    """
    features: int

    @nn.compact
    def __call__(self, mu, var, train: bool):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))
        if train and not self.is_initializing():
            ra_mean.value = (BN_MOMENTUM * ra_mean.value
                             + (1.0 - BN_MOMENTUM) * mu)
            ra_var.value = (BN_MOMENTUM * ra_var.value
                            + (1.0 - BN_MOMENTUM) * var)
        return scale, bias, ra_mean.value, ra_var.value


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
    # test hook: False forces the per-branch towers (same params, same math)
    fuse_branches: bool = True

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

        # The per-branch towers (one ConvBNReLU + one final conv each) are
        # dispatch/MXU-utilization bound on TPU: 12 N=64 convs per task at
        # 180x180. Branches sharing an input are mathematically ONE wide
        # conv (BN is per-channel) followed by ONE block-diagonal final
        # conv; fusing halves the head wall-time
        # (scripts/probe_head_fusion.py: 4.96 -> 2.95 ms for the 7-task
        # stack). Parameters stay per-branch so the checkpoint tree — and
        # the reference .pth converter mapping — is unchanged.
        def src_of(head):
            if shared_fwd is not None and head in ("vel", "rot"):
                return "fwd"
            if shared_rev is not None and head in ("rvel", "rrot"):
                return "rev"
            return "x"

        groups: Dict[Tuple[str, int], list] = {}
        for head, (classes, num_conv) in self.heads:
            groups.setdefault((src_of(head), num_conv), []).append(
                (head, classes))

        srcs = {"x": x, "fwd": shared_fwd, "rev": shared_rev}
        tmp: Dict[str, jax.Array] = {}
        for (src, num_conv), branches in groups.items():
            if num_conv == 2 and len(branches) >= 2 and self.fuse_branches:
                tmp.update(self._fused_towers(branches, head_conv,
                                              srcs[src], dt, train))
            else:
                for head, classes in branches:
                    tmp[head] = self._branch_tower(
                        head, classes, num_conv, head_conv, srcs[src], dt,
                        train)
        for head, _ in self.heads:
            out[head] = tmp[head].astype(jnp.float32)
        return out

    def _branch_tower(self, head, classes, num_conv, head_conv, h, dt,
                      train):
        """Unfused tower (kept for num_conv != 2 / singleton groups)."""
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
        return nn.Conv(classes, (self.final_kernel, self.final_kernel),
                       padding="SAME", bias_init=bias_init, dtype=dt,
                       name=f"{head}_final")(h)

    def _fused_towers(self, branches, head_conv, h, dt, train):
        """All branches of one input as one wide ConvBNReLU + one
        block-diagonal final conv — numerically identical to the per-branch
        towers (BN statistics are per-channel; the final's kernel is zero
        outside each branch's own 64-channel block)."""
        fk = self.final_kernel
        p = (fk - 1) // 2
        cin = h.shape[-1]

        ks, bs = [], []
        for head, _ in branches:
            k, b = _ConvParams(head_conv, cin, fk,
                               name=f"{head}_conv0")()
            ks.append(k)
            bs.append(b)
        wcat = jnp.concatenate(ks, axis=-1)
        bcat = jnp.concatenate(bs, axis=-1)
        if dt is not None:
            h, wcat, bcat = h.astype(dt), wcat.astype(dt), bcat.astype(dt)
        y = jax.lax.conv_general_dilated(
            h, wcat, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bcat

        # batch stats over the concatenation == each branch's own BN.
        # Stats in fp32 (flax _compute_stats promotes), normalize in dt.
        mu = var = None
        if train:
            yf = y.astype(jnp.float32)
            mu = jnp.mean(yf, axis=(0, 1, 2))
            mean2 = jnp.mean(jnp.square(yf), axis=(0, 1, 2))
            if self.axis_name is not None:
                mu, mean2 = jax.lax.pmean((mu, mean2), self.axis_name)
            var = mean2 - jnp.square(mu)
        scales, biases, rms, rvs = [], [], [], []
        for gi, (head, _) in enumerate(branches):
            sl = slice(gi * head_conv, (gi + 1) * head_conv)
            s, bb, rm, rv = _BNParams(head_conv, name=f"{head}_bn0")(
                None if mu is None else mu[sl],
                None if var is None else var[sl], train)
            scales.append(s)
            biases.append(bb)
            rms.append(rm)
            rvs.append(rv)
        m = mu if train else jnp.concatenate(rms)
        v = var if train else jnp.concatenate(rvs)
        sc = jnp.concatenate(scales)
        bi = jnp.concatenate(biases)
        if dt is not None:
            m, v, sc, bi = (t.astype(dt) for t in (m, v, sc, bi))
        a = nn.relu((y - m) * (jax.lax.rsqrt(v + BN_EPS) * sc) + bi)

        fks, fbs, outs = [], [], []
        for head, classes in branches:
            bias_init = (_final_conv_bias(self.init_bias) if head == "hm"
                         else nn.initializers.zeros)
            k, b = _ConvParams(classes, head_conv, fk, bias_init=bias_init,
                               name=f"{head}_final")()
            fks.append(k)
            fbs.append(b)
            outs.append(classes)
        oc = sum(outs)
        wbd = jnp.zeros((fk, fk, len(branches) * head_conv, oc),
                        fks[0].dtype)
        co = 0
        for gi, (k, o) in enumerate(zip(fks, outs)):
            wbd = wbd.at[:, :, gi * head_conv:(gi + 1) * head_conv,
                         co:co + o].set(k)
            co += o
        bbd = jnp.concatenate(fbs)
        if dt is not None:
            wbd, bbd = wbd.astype(dt), bbd.astype(dt)
        z = jax.lax.conv_general_dilated(
            a, wbd, (1, 1), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bbd
        res = {}
        co = 0
        for (head, _), o in zip(branches, outs):
            res[head] = z[..., co:co + o]
            co += o
        return res


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
