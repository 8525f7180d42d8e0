"""RPN — the multi-scale BEV conv neck.

Behavioral port of `det3d/models/necks/rpn.py:23-159`: per scale a strided
conv block of `layer_nums[i]`+1 convs, each scale upsampled back by a
transpose conv ("deblock"), outputs concatenated along channels. NHWC,
BatchNorm(eps 1e-3) with optional cross-device sync via axis_name.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from .layers import ConvBNReLU, DeconvBNReLU


class RPN(nn.Module):
    layer_nums: Tuple[int, ...] = (5, 5)
    ds_strides: Tuple[int, ...] = (1, 2)
    ds_filters: Tuple[int, ...] = (128, 256)
    us_strides: Tuple[float, ...] = (1, 2)
    us_filters: Tuple[int, ...] = (256, 256)
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        upsample_start = len(self.layer_nums) - len(self.us_strides)
        ups = []
        for i, n in enumerate(self.layer_nums):
            x = ConvBNReLU(self.ds_filters[i], 3, self.ds_strides[i],
                           use_bias=False, axis_name=self.axis_name,
                           compute_dtype=self.compute_dtype,
                           name=f"block{i}_in")(x, train)
            for j in range(n):
                x = ConvBNReLU(self.ds_filters[i], 3, 1, use_bias=False,
                               axis_name=self.axis_name,
                               compute_dtype=self.compute_dtype,
                               name=f"block{i}_conv{j}")(x, train)
            k = i - upsample_start
            if k >= 0:
                s = self.us_strides[k]
                if s > 1:
                    up = DeconvBNReLU(self.us_filters[k], int(s),
                                      axis_name=self.axis_name,
                                      compute_dtype=self.compute_dtype,
                                      name=f"deblock{k}")(x, train)
                else:
                    stride = int(round(1 / s))
                    up = ConvBNReLU(self.us_filters[k], stride, stride,
                                    use_bias=False, axis_name=self.axis_name,
                                    compute_dtype=self.compute_dtype,
                                    name=f"deblock{k}")(x, train)
                ups.append(up)
        if ups:
            x = jnp.concatenate(ups, axis=-1)
        return x.astype(jnp.float32)
