"""Host input-pipeline throughput at realistic nuScenes scale (VERDICT r2 #8).

The reference's classic dataloader bottleneck is the per-sample python loop:
20-sweep aggregation (20 file reads + transforms) + GT-AUG `sample_all`
(collision test + db point reads) + global noise aug + target packing
(SURVEY §3.1). This measures OUR equivalent — `NuScenesForecastDataset.sample`
+ `batches_from_dataset` (+ `prefetch`) — on fabricated infos with real
nuScenes shapes:

  - 20 sweeps x ~34k points each (LIDAR_TOP density), distinct .bin per sweep
  - ~40 GT objects/sample, 7 forecast timesteps
  - trajectory-conditioned GT-AUG db with the config's sample_groups
  - global rot/scale/translate noise + point shuffle + 150k pack

Verifies the host side feeds the TPU train step (flagship ~8.7 samples/s at
B=1, README training table) with margin, and records the measured rate.

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_host_pipeline.py

(The host pipeline's own device puts are forced to CPU below — JAX_PLATFORMS
is ignored under the axon sitecustomize, and letting build_targets + the
batch arrays ride the TPU tunnel would measure tunnel RTT, not host cost.)
"""
from __future__ import annotations

import dataclasses
import os
import pickle
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SAMPLES = 16
N_SWEEPS = 19          # + keyframe = 20 clouds aggregated
PTS_PER_SWEEP = 34000  # nuScenes LIDAR_TOP ~34k pts/sweep
N_OBJS = 40
TIMESTEPS = 7
DB_PER_POOL = 400      # entries per (trajectory, class) pool
DB_PTS = 150           # points per db object


def _fabricate(root: str, rng: np.random.Generator):
    """Write realistic-scale infos + sweep bins + a GT-AUG database."""
    infos = []
    for i in range(N_SAMPLES):
        sweeps = []
        for s in range(N_SWEEPS):
            p = os.path.join(root, f"sweep_{i}_{s}.bin")
            pts = np.concatenate([
                rng.uniform(-54, 54, (PTS_PER_SWEEP, 2)),
                rng.uniform(-4, 2, (PTS_PER_SWEEP, 1)),
                rng.uniform(0, 255, (PTS_PER_SWEEP, 1)),
                np.zeros((PTS_PER_SWEEP, 1))], -1).astype(np.float32)
            pts.tofile(p)
            tm = np.eye(4, dtype=np.float64)
            tm[:2, 3] = rng.normal(0, 2, 2)  # ego motion
            sweeps.append({"lidar_path": p, "transform_matrix": tm,
                           "time_lag": 0.05 * (s + 1)})
        key = os.path.join(root, f"key_{i}.bin")
        kp = np.concatenate([
            rng.uniform(-54, 54, (PTS_PER_SWEEP, 2)),
            rng.uniform(-4, 2, (PTS_PER_SWEEP, 1)),
            rng.uniform(0, 255, (PTS_PER_SWEEP, 1)),
            np.zeros((PTS_PER_SWEEP, 1))], -1).astype(np.float32)
        kp.tofile(key)
        boxes = np.zeros((TIMESTEPS, N_OBJS, 12), np.float32)
        boxes[..., :2] = rng.uniform(-50, 50, (1, N_OBJS, 2))
        boxes[..., 2] = -1.0
        boxes[..., 3:6] = rng.uniform(1.5, 4.5, (1, N_OBJS, 3))
        boxes[..., 10] = rng.uniform(-np.pi, np.pi, (1, N_OBJS))
        names = np.array([["car"] * N_OBJS] * TIMESTEPS).T  # (N, T)
        infos.append({
            "lidar_path": key, "token": f"tok{i}", "sweeps": sweeps,
            "gt_boxes": boxes.transpose(1, 0, 2), "gt_names": names,
            "gt_trajectory": np.array([["linear"] * TIMESTEPS] * N_OBJS),
            "sample_times": np.arange(TIMESTEPS, dtype=np.float32) * 0.5,
        })
    info_path = os.path.join(root, "infos_train.pkl")
    with open(info_path, "wb") as f:
        pickle.dump(infos, f)

    # GT-AUG database: trajectory-conditioned pools
    db = {"car": []}
    for traj in ("static", "linear", "nonlinear"):
        for j in range(DB_PER_POOL):
            rel = f"db_{traj}_{j}.bin"
            p = rng.normal(0, 0.8, (DB_PTS, 5)).astype(np.float32)
            p.tofile(os.path.join(root, rel))
            b = np.zeros((TIMESTEPS, 12), np.float32)
            b[:, :2] = rng.uniform(-50, 50, 2)
            b[:, 2] = -1.0
            b[:, 3:6] = [1.9, 4.6, 1.7]
            b[:, 10] = rng.uniform(-np.pi, np.pi)
            db["car"].append({
                "path": rel, "name": [b"car".decode()] * TIMESTEPS,
                "box3d_lidar": b, "num_points_in_gt": DB_PTS,
                "trajectory": [traj] * TIMESTEPS})
    db_path = os.path.join(root, "dbinfos_train_20sweeps_withvelo.pkl")
    with open(db_path, "wb") as f:
        pickle.dump(db, f)
    return info_path, db_path


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from futuredet_tpu.config import get_config
    from futuredet_tpu.data.gt_database import DataBaseSampler
    from futuredet_tpu.data.pipeline import (NuScenesForecastDataset,
                                             batches_from_dataset)
    from futuredet_tpu.data.prefetch import prefetch

    cfg = get_config("forecast_n3dtf")
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, nsweeps=20, class_names=("car",)))

    root = tempfile.mkdtemp(prefix="fd_hostpipe_")
    try:
        rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        info_path, db_path = _fabricate(root, rng)
        print(f"fabricate: {time.perf_counter() - t0:.1f}s "
              f"({N_SAMPLES} samples x {N_SWEEPS + 1} sweeps x "
              f"{PTS_PER_SWEEP} pts)", flush=True)

        sampler = DataBaseSampler(
            db_path, root,
            sample_groups=dict(cfg.data.sample_groups) or {"car": 15},
            sampler_type=cfg.data.sampler_type, seed=0)
        ds = NuScenesForecastDataset(cfg, info_path, train=True,
                                     class_balanced=False, seed=0,
                                     db_sampler=sampler)

        # (a) raw per-sample cost, single thread (file IO + sweeps + GT-AUG
        # + noise aug + pack) — the reference's per-worker cost
        for i in range(2):
            ds.sample(i)  # warm page cache
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < 10.0:
            ds.sample(n % len(ds))
            n += 1
        dt = time.perf_counter() - t0
        print(f"ds.sample (1 thread):      {n / dt:6.1f} samples/s "
              f"({dt / n * 1e3:.0f} ms/sample)", flush=True)

        # (b) full batch assembly + device put (default layout: raw GT under
        # targets_raw — rasterization happens on-device inside the train
        # step, so the host only stacks and ships small arrays)
        for B in (1, 4):
            it = batches_from_dataset(ds, cfg, batch_size=B, shuffle=True,
                                      seed=0, loop=True)
            next(it)  # warm (compiles build_targets)
            t0 = time.perf_counter()
            n = 0
            while time.perf_counter() - t0 < 10.0:
                next(it)
                n += 1
            dt = time.perf_counter() - t0
            print(f"batches B={B}:              {n * B / dt:6.1f} samples/s",
                  flush=True)

        # (c) with the background prefetcher (consumer sees queue pops) —
        # simulate a 115 ms train step consuming batches
        it = prefetch(batches_from_dataset(ds, cfg, batch_size=1,
                                           shuffle=True, seed=1, loop=True),
                      depth=4)
        next(it)
        t0 = time.perf_counter()
        n = 0
        while time.perf_counter() - t0 < 10.0:
            next(it)
            time.sleep(0.115)  # the flagship B=1 train step
            n += 1
        dt = time.perf_counter() - t0
        print(f"prefetch + 115ms step:     {n / dt:6.1f} steps/s "
              f"(train-step-bound target 8.7)", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
