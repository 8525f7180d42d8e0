"""Dataset pipeline: fabricated nuScenes-format infos + .bin files."""
import pickle

import numpy as np
import pytest

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
            "gt_attributes": np.array([f"attr{j}" for j in range(n_obj)],
                                      object),
            "sample_times": np.full((timesteps - 1,), 0.45, np.float32),
        })
    p = tmp_path / "infos.pkl"
    with open(p, "wb") as f:
        pickle.dump(infos, f)
    return str(p)


def test_cbgs_resampling_duplication_ratios():
    """CBGS oracle (ref nuscenes.py:556-597): each class pool contributes
    int(len(pool) * ratio) = int(dup / num_classes) resampled infos, drawn
    with replacement from that pool, regardless of class imbalance."""
    import dataclasses
    cfg = tiny_cfg(1, False, False)
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, class_names=("car", "pedestrian")))

    def info(names):
        return {"gt_names": np.array([[n] for n in names], object),
                "id": object()}

    infos = ([info(["car"])] * 30 + [info(["pedestrian"])] * 10
             + [info(["car", "pedestrian"])] * 4)
    # pools: car 34, ped 14 -> dup 48; per-class quota = int(len * ratio)
    # with ratio = (1/C) / (len/dup), evaluated in float exactly like the
    # reference (34 * 48/(2*34) = 23.999... -> 23)
    pools = {"car": 34, "pedestrian": 14}
    dup = sum(pools.values())
    quota = {k: int(v * ((1.0 / len(pools)) / (v / dup)))
             for k, v in pools.items()}
    ds = PL.NuScenesForecastDataset.__new__(PL.NuScenesForecastDataset)
    ds.cfg = cfg
    ds.rng = np.random.default_rng(0)
    out = ds._resample(infos)
    assert len(out) == sum(quota.values())
    # membership: at least the quota of each class present (duplicates ok)
    n_car = sum(1 for i in out
                if "car" in np.asarray(i["gt_names"])[:, 0])
    n_ped = sum(1 for i in out
                if "pedestrian" in np.asarray(i["gt_names"])[:, 0])
    assert n_car >= quota["car"] and n_ped >= quota["pedestrian"]
    # with-replacement draw: duplicates of single infos are expected for the
    # minority class (quota 24 > pool 14)
    ped_ids = [id(i) for i in out
               if "pedestrian" in np.asarray(i["gt_names"])[:, 0]]
    assert len(set(ped_ids)) < len(ped_ids)


def test_pack_gt_range_filter_any_corner():
    """Boxes whose center is outside the range but a corner reaches in are
    kept (ref filter_gt_box_outside_range any-corner semantics); boxes fully
    outside are dropped."""
    cfg = tiny_cfg(1, False, False)   # pc_range ±8
    boxes = np.zeros((3, 1, 12), np.float32)
    boxes[:, :, 3:6] = [4.0, 2.0, 1.5]  # w=4 -> x half-extent 2 at rot 0
    boxes[0, 0, :2] = (0.0, 0.0)      # inside
    boxes[1, 0, :2] = (9.5, 0.0)      # center out, corner at 9.5-2=7.5 in
    boxes[2, 0, :2] = (12.0, 0.0)     # fully outside (corner at 10)
    names = np.full((3, 1), "car")
    traj = np.full((3, 1), "static")
    _, _, valid, _, idx = PL.pack_gt(cfg, boxes, names, traj,
                                     cfg.data.class_names)
    assert list(idx) == [0, 1]
    assert valid[0].sum() == 2


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
    # attributes align through the class filter (object 0 'truck' dropped)
    assert s["gt_attr"][:3].tolist() == ["attr1", "attr2", "attr3"]
    assert (s["gt_attr"][3:] == "").all()
    # per-sample keyframe gaps surfaced for the evaluator (ref get_time)
    np.testing.assert_allclose(s["times"], 0.45, atol=1e-6)
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
    # default layout: raw GT for in-step on-device rasterization
    assert b["targets_raw"]["gt_boxes"].shape[0] == 2
    assert b["targets_raw"]["gt_boxes"].shape[-1] == 12
    assert len(b["tokens"]) == 2
    # host-side pre-rasterized layout still available
    bh = next(PL.batches_from_dataset(ds, cfg, 2, shuffle=False, loop=False,
                                      device_targets=False))
    assert bh["targets"]["hm"].shape[0] == 2
    # the two layouts produce identical targets
    import jax
    from futuredet_tpu.data.targets import build_targets_batch
    tg = build_targets_batch(cfg, b["targets_raw"])
    for k in bh["targets"]:
        np.testing.assert_allclose(np.asarray(tg[k]),
                                   np.asarray(bh["targets"][k]), atol=1e-6)


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


# ---------------------------------------------------------------------------
# GT-AUG end-to-end: db creation -> build_db_sampler (the CLI path) ->
# train sample contains pasted objects with per-timestep velocity columns
# (ref Preprocess :147-182 + sample_ops.py:101-253)
# ---------------------------------------------------------------------------

def _mk_infos_gtaug(tmp_path, n_samples=3, timesteps=7):
    """3 objects/sample on a 9-spot grid (no cross-sample collisions), 50
    in-box points each, distinct per-timestep velocity columns."""
    grid = [(-5.0, -5.0), (-5.0, 0.0), (-5.0, 5.0), (0.0, -5.0), (0.0, 5.0),
            (5.0, -5.0), (5.0, 0.0), (5.0, 5.0), (2.5, 2.5)]
    rng = np.random.default_rng(1)
    infos = []
    for i in range(n_samples):
        boxes = np.zeros((3, timesteps, 12), np.float32)
        centers = np.array([grid[i * 3 + j] for j in range(3)], np.float32)
        boxes[:, :, :2] = centers[:, None]
        boxes[:, :, 3:6] = [2.0, 4.5, 1.6]
        for t in range(timesteps):
            boxes[:, t, 6] = 1.0 + 0.5 * t      # vx, distinct per timestep
            boxes[:, t, 8] = 2.0 + 0.25 * t     # reverse vx
        pts = []
        for c in centers:
            p = np.zeros((50, 5), np.float32)
            p[:, :2] = c + rng.uniform(-0.5, 0.5, (50, 2))
            p[:, 2] = rng.uniform(-0.5, 0.5, 50)
            pts.append(p)
        clutter = np.zeros((200, 5), np.float32)
        clutter[:, :3] = rng.uniform(-7, 7, (200, 3))
        pts.append(clutter)
        key = tmp_path / f"gtaug_key{i}.bin"
        np.concatenate(pts).astype(np.float32).tofile(key)
        infos.append({
            "lidar_path": str(key), "token": f"gtaug{i}", "sweeps": [],
            "gt_boxes": boxes, "gt_names": np.full((3, timesteps), "car"),
            "gt_trajectory": np.full((3, timesteps), "linear"),
        })
    p = tmp_path / "infos_gtaug.pkl"
    with open(p, "wb") as f:
        pickle.dump(infos, f)
    return str(p)


@pytest.mark.slow
def test_gt_aug_pastes_objects_with_timestep_velocities(tmp_path):
    from futuredet_tpu.data.gt_database import (build_db_sampler,
                                                create_groundtruth_database)

    cfg = tiny_cfg(7, True, True)
    # neutralize rotation/scale/translate so pasted velocity columns survive
    # exactly (random flips only change signs)
    cfg = cfg.replace(data=cfg.data.__class__(
        nsweeps=2, class_names=("car",), sampler_type="trajectory",
        sample_groups=(("static_car", 2), ("linear_car", 4),
                       ("nonlinear_car", 6)),
        global_rot_noise=(0.0, 0.0), global_scale_noise=(1.0, 1.0),
        global_translate_std=0.0))
    info_path = _mk_infos_gtaug(tmp_path)

    raw = PL.NuScenesForecastDataset(cfg, info_path, train=False,
                                     class_balanced=False)
    create_groundtruth_database(cfg, raw, str(tmp_path))

    sampler = build_db_sampler(cfg, info_path)     # the train-CLI default
    assert sampler is not None
    assert set(sampler.pools) == {"linear_car"}    # only linear objects exist

    ds = PL.NuScenesForecastDataset(cfg, info_path, train=True,
                                    class_balanced=False, db_sampler=sampler,
                                    seed=3)
    pasted_seen = 0
    for idx in range(len(ds)):
        s = ds.sample(idx)
        n = int(s["gt_valid"][0].sum())
        for j in range(3, n):                      # pasted objects
            pasted_seen += 1
            b = s["gt_boxes"][:, j]                # (T, 12)
            # per-timestep velocity columns preserved (|.|: random flips)
            np.testing.assert_allclose(
                np.abs(b[:, 6]), 1.0 + 0.5 * np.arange(7), atol=1e-5)
            np.testing.assert_allclose(
                np.abs(b[:, 8]), 2.0 + 0.25 * np.arange(7), atol=1e-5)
            # position frozen at t0 across timesteps (ref quirk,
            # preprocess.py:169-174)
            np.testing.assert_allclose(
                b[:, :6], np.broadcast_to(b[0, :6], (7, 6)), atol=1e-5)
            assert s["traj_classes"][j] == 2       # linear
            # pasted points landed near the pasted box center
            pv = s["points"][s["points_valid"]]
            d = np.linalg.norm(pv[:, :2] - b[0, :2], axis=1)
            assert (d < 3.0).sum() >= 30
    assert pasted_seen >= 3


@pytest.mark.slow
def test_train_cli_enables_gt_aug_by_default(tmp_path, monkeypatch):
    """`train --info_path` with dbinfos alongside builds the sampler with
    the config's reference groups (VERDICT round-1 item #1)."""
    from futuredet_tpu.cli.train import main as train_main
    from futuredet_tpu.data import pipeline as pl_mod
    from futuredet_tpu.data.gt_database import create_groundtruth_database

    monkeypatch.chdir(tmp_path)
    cfg = tiny_cfg(7, True, True)
    cfg = cfg.replace(data=cfg.data.__class__(nsweeps=2, class_names=("car",),
                                              sampler_type="trajectory"))
    info_path = _mk_infos_gtaug(tmp_path)
    raw = pl_mod.NuScenesForecastDataset(cfg, info_path, train=False,
                                         class_balanced=False)
    create_groundtruth_database(cfg, raw, str(tmp_path))
    # rename to the 20-sweep default the forecast_n3dtf config looks for
    import os
    os.rename(tmp_path / "dbinfos_train_2sweeps_withvelo.pkl",
              tmp_path / "dbinfos_train_20sweeps_withvelo.pkl")

    captured = {}
    orig = pl_mod.NuScenesForecastDataset

    class Spy(orig):
        def __init__(self, *a, **kw):
            captured["db_sampler"] = kw.get("db_sampler")
            super().__init__(*a, **kw)

    monkeypatch.setattr(pl_mod, "NuScenesForecastDataset", Spy)
    train_main(["--model", "forecast_n3dtf", "--tiny",
                "--info_path", info_path, "--batch_size", "1",
                "--epochs", "1"])
    assert captured["db_sampler"] is not None
    assert captured["db_sampler"].sample_groups == {
        "static_car": 2, "linear_car": 4, "nonlinear_car": 6}
