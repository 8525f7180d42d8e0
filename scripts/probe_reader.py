"""Decompose the voxelnet reader (voxelize_mean, 150k pts -> 30k voxels):
sort, gather, run-boundary machinery, segment mean — each as a chain.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_reader.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from _timing import chain_ms, enable_compilation_cache
    enable_compilation_cache()
    from futuredet_tpu.ops.voxelize import point_voxel_map, voxelize_mean

    P, V = 150000, 30000
    pc_range = jnp.asarray([-54.0, -54.0, -5.0, 54.0, 54.0, 3.0])
    vs = jnp.asarray([0.075, 0.075, 0.2])
    grid = (1440, 1440, 40)
    rng = np.random.default_rng(0)
    pts = np.concatenate([
        rng.uniform(-54, 54, (P, 2)), rng.uniform(-4, 2, (P, 1)),
        rng.uniform(0, 1, (P, 2))], -1).astype(np.float32)
    pts_j = jnp.asarray(pts)
    valid_j = jnp.ones((P,), bool)

    t_full = chain_ms(
        lambda p: voxelize_mean(p, valid_j, pc_range, vs, grid_size=grid,
                                max_voxels=V, max_points=20)[0],
        pts_j, iters=100)
    print(f"voxelize_mean {t_full:6.2f}", flush=True)
    t_map = chain_ms(
        lambda p: point_voxel_map(p, valid_j, pc_range, vs, grid_size=grid,
                                  max_voxels=V, max_points=20).points,
        pts_j, iters=100)
    print(f"point_voxel_map {t_map:6.2f}", flush=True)

    # pieces
    vid = ((pts[:, 0] + 54) / 0.075).astype(np.int64) * 1440 \
        + ((pts[:, 1] + 54) / 0.075).astype(np.int64)
    vid_j = jnp.asarray(np.clip(vid, 0, 2 ** 30).astype(np.int32))

    t_argsort = chain_ms(
        lambda v: jnp.argsort(v.astype(jnp.int32), stable=True).astype(
            jnp.float32), vid_j.astype(jnp.float32), iters=100)
    t_sortall = chain_ms(
        lambda v: jax.lax.sort((v.astype(jnp.int32),)
                               + tuple(pts_j[:, i] for i in range(5)),
                               num_keys=1)[1],
        vid_j.astype(jnp.float32), iters=100)
    order = jnp.argsort(vid_j, stable=True)
    t_gather = chain_ms(lambda o: pts_j[o.astype(jnp.int32)],
                        order.astype(jnp.float32), iters=100)
    print(f"argsort {t_argsort:5.2f} | sort+5payload {t_sortall:5.2f} | "
          f"gather150k {t_gather:5.2f}", flush=True)

    slot = jnp.asarray(rng.integers(0, V, P).astype(np.int32))
    slot_sorted = jnp.sort(slot).astype(jnp.float32)
    t_seg = chain_ms(
        lambda s: jax.ops.segment_sum(pts_j, s.astype(jnp.int32),
                                      num_segments=V + 1),
        slot_sorted, iters=100)
    t_seg_sorted = chain_ms(
        lambda s: jax.ops.segment_sum(pts_j, s.astype(jnp.int32),
                                      num_segments=V + 1,
                                      indices_are_sorted=True),
        slot_sorted, iters=100)
    # cumsum + boundary gather alternative
    first = jnp.asarray(np.sort(rng.choice(P, V, replace=False)).astype(np.int32))

    def cumsum_bounds(s):
        c = jnp.cumsum(pts_j.astype(jnp.float32), 0)
        ext = jnp.concatenate([jnp.zeros((1, 5), jnp.float32), c], 0)
        ends = jnp.concatenate([first[1:], jnp.asarray([P], jnp.int32)])
        return ext[ends] - ext[first] + s[0].astype(jnp.float32)
    t_cumsum = chain_ms(cumsum_bounds, slot_sorted, iters=100)

    print(f"segsum {t_seg:5.2f} | segsum(sorted) {t_seg_sorted:5.2f} | "
          f"cumsum+bounds {t_cumsum:5.2f}", flush=True)


if __name__ == "__main__":
    main()
