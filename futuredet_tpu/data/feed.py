"""Compact host->device point feeds for the eval/serving path.

The val pipeline is tunnel-transfer bound on the test rig (~6 MB of fp32
points per 300k-point sample vs ~13 ms of device compute — README val
row; ref comparison point: the reference moves the same fp32 tensors to
GPU per batch, det3d/torchie/trainer/trainer.py:35-79 example_to_device).
Halving the wire bytes is worth more than any device-side optimization
there.

`int16` feed (default): fixed-point per-channel quantization —
  * xyz scaled by 256   -> ulp 3.9 mm, range +-128 m (covers every config's
    pc_range; quantization error is ~10x below the 0.075 m voxel pitch and
    far below lidar range noise)
  * all other channels (intensity, time-lag, painted feats) scaled by 64
    -> ulp 0.016, range +-512 (covers raw nuScenes intensity 0..255)
10 bytes/point instead of 20. `fp16` (5 bits exponent) is also offered but
its 11-bit mantissa gives ~3 cm ulp at |x| in [32, 64) — the int16 fixed
point is both smaller-error and the same wire size, so it is the default.

Pack on host (numpy), unpack INSIDE the jitted forward (one cheap
elementwise cast that fuses into the voxelizer's coord computation).
"""
from __future__ import annotations

import numpy as np

_XYZ_SCALE = 256.0
_AUX_SCALE = 64.0


def _scales(num_features: int) -> np.ndarray:
    s = np.full((num_features,), _AUX_SCALE, np.float32)
    s[:3] = _XYZ_SCALE
    return s


def pack_points(points: np.ndarray, feed_dtype: str) -> np.ndarray:
    """Host-side wire encoding of a (..., F) fp32 point array."""
    if feed_dtype == "fp32":
        return np.asarray(points, np.float32)
    if feed_dtype == "fp16":
        return np.asarray(points, np.float16)
    if feed_dtype == "int16":
        s = _scales(points.shape[-1])
        return np.clip(np.round(points * s), -32768, 32767).astype(np.int16)
    raise ValueError(f"unknown feed_dtype: {feed_dtype}")


def unpack_points(arr):
    """Device-side decode (traceable; identity for fp32)."""
    import jax.numpy as jnp

    if arr.dtype == jnp.float32:
        return arr
    if arr.dtype == jnp.float16:
        return arr.astype(jnp.float32)
    if arr.dtype == jnp.int16:
        s = jnp.asarray(1.0 / _scales(arr.shape[-1]))
        return arr.astype(jnp.float32) * s
    raise ValueError(f"unknown feed dtype: {arr.dtype}")


def unpack_batch(batch):
    """Decode the packed leaves of an eval feed dict (points only)."""
    out = dict(batch)
    if "points" in out:
        out["points"] = unpack_points(out["points"])
    return out
