"""Dataset pipeline: fabricated nuScenes-format infos + .bin files."""
import pickle

import numpy as np

from futuredet_tpu.data import pipeline as PL
from tests.test_models import tiny_cfg


def _write_bin(path, pts):
    pts.astype(np.float32).tofile(path)


def _mk_infos(tmp_path, n_samples=3, n_sweeps=2, timesteps=7):
    rng = np.random.default_rng(0)
    infos = []
    for i in range(n_samples):
        key_pts = np.concatenate([rng.uniform(-7, 7, (500, 3)),
                                  rng.uniform(0, 1, (500, 2))], -1)
        key_path = tmp_path / f"key{i}.bin"
        _write_bin(key_path, key_pts)
        sweeps = []
        for s in range(n_sweeps):
            sp = tmp_path / f"sweep{i}_{s}.bin"
            _write_bin(sp, np.concatenate([rng.uniform(-7, 7, (200, 3)),
                                           rng.uniform(0, 1, (200, 2))], -1))
            tm = np.eye(4)
            tm[:3, 3] = [0.1 * (s + 1), 0, 0]
            sweeps.append({"lidar_path": str(sp), "transform_matrix": tm,
                           "time_lag": 0.05 * (s + 1)})
        n_obj = 4
        boxes = np.zeros((n_obj, timesteps, 12), np.float32)
        boxes[:, :, :2] = rng.uniform(-6, 6, (n_obj, 1, 2))
        boxes[:, :, 3:6] = [2.0, 4.5, 1.6]
        names = np.full((n_obj, timesteps), "car")
        names[0] = "truck"   # filtered out
        traj = np.full((n_obj, timesteps), "linear")
        infos.append({
            "lidar_path": str(key_path), "token": f"tok{i}",
            "sweeps": sweeps, "gt_boxes": boxes, "gt_names": names,
            "gt_trajectory": traj,
        })
    p = tmp_path / "infos.pkl"
    with open(p, "wb") as f:
        pickle.dump(infos, f)
    return str(p)


def test_dataset_reads_infos_and_packs(tmp_path):
    cfg = tiny_cfg(7, True, True)
    info_path = _mk_infos(tmp_path)
    ds = PL.NuScenesForecastDataset(
        cfg.replace(data=cfg.data.__class__(nsweeps=3, class_names=("car",))),
        info_path, train=True, class_balanced=False)
    assert len(ds) == 3
    s = ds.sample(0)
    P = cfg.voxel.max_points
    assert s["points"].shape == (P, 6)          # 5 feats + time lag
    assert s["points_valid"].sum() > 0
    assert s["gt_boxes"].shape == (7, 16, 12)
    # truck filtered, 3 cars packed
    assert s["gt_valid"][0].sum() == 3
    assert (s["gt_classes"][0][:3] == 1).all()
    assert (s["traj_classes"][:3] == 2).all()   # linear id


def test_sweep_aggregation_applies_transform_and_time(tmp_path):
    cfg = tiny_cfg(1, False, False)
    info_path = _mk_infos(tmp_path, n_samples=1, n_sweeps=2)
    with open(info_path, "rb") as f:
        info = pickle.load(f)[0]
    pts = PL.aggregate_sweeps(info, nsweeps=3)
    assert pts.shape[1] == 6
    # keyframe points have zero time-lag, sweeps have positive
    lags = np.unique(np.round(pts[:, 5], 3))
    assert 0.0 in lags and len(lags) == 3


def test_batches_from_dataset_shapes(tmp_path):
    cfg = tiny_cfg(1, False, False)
    cfg = cfg.replace(data=cfg.data.__class__(nsweeps=2, class_names=("car",)))
    info_path = _mk_infos(tmp_path, timesteps=7)
    ds = PL.NuScenesForecastDataset(cfg, info_path, train=False,
                                    class_balanced=False)
    b = next(PL.batches_from_dataset(ds, cfg, 2, shuffle=False, loop=False))
    assert b["points"].shape[0] == 2
    assert b["targets"]["hm"].shape[0] == 2
    assert len(b["tokens"]) == 2


def test_painted_points_reader(tmp_path):
    import os
    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "painted_LIDAR_TOP", exist_ok=True)
    os.makedirs(tmp_path / "LIDAR_TOP", exist_ok=True)
    raw = tmp_path / "LIDAR_TOP" / "pc0.bin"
    np.zeros((10, 5), np.float32).tofile(raw)
    painted = rng.normal(size=(10, 15)).astype(np.float32)
    np.save(tmp_path / "painted_LIDAR_TOP" / "pc0.bin.npy", painted)
    out = PL.read_painted(str(raw))
    assert out.shape == (10, 14)
    # ring index (col 4) dropped
    np.testing.assert_allclose(out[:, 3], painted[:, 3])
    np.testing.assert_allclose(out[:, 4], painted[:, 5])
