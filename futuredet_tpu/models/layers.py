"""Shared NN building blocks (flax.linen, NHWC).

Norm semantics match the reference's `build_norm_layer(dict(type="BN",
eps=1e-3, momentum=0.01))` (torch momentum 0.01 == flax momentum 0.99).
Cross-device BatchNorm sync (the reference's APEX syncBN,
`det3d/torchie/apis/train.py:294-295`) is native here: pass
`axis_name="data"` and flax BatchNorm pmeans batch statistics over the mesh.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

BN_EPS = 1e-3
BN_MOMENTUM = 0.99  # == torch momentum 0.01


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    use_bias: bool = True
    axis_name: Optional[str] = None
    # computation dtype for the conv contraction (params stay fp32);
    # bfloat16 halves the MXU time of the dense BEV towers — the TPU-native
    # serving mode. None = fp32 (reference-parity numerics).
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        # explicit symmetric padding (k-1)//2: identical to SAME at stride 1
        # and torch-aligned at stride 2 (torch ZeroPad2d(1)+conv3x3s2 starts
        # its first window at -1; XLA SAME would start it at 0) — required
        # for numerical parity with converted reference checkpoints
        p = (self.kernel - 1) // 2
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((p, p), (p, p)), dtype=dt,
                    use_bias=self.use_bias)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, axis_name=self.axis_name,
                         dtype=dt)(x)
        return nn.relu(x)


class DeconvBNReLU(nn.Module):
    features: int
    stride: int
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = jnp.bfloat16 if self.compute_dtype == "bfloat16" else None
        x = nn.ConvTranspose(self.features, (self.stride, self.stride),
                             strides=(self.stride, self.stride), dtype=dt,
                             use_bias=False)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, axis_name=self.axis_name,
                         dtype=dt)(x)
        return nn.relu(x)
