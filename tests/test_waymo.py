"""Waymo decoded-frame stack: infos with sweep chains, multi-sweep dataset,
prediction dump (ref det3d/datasets/waymo/waymo_common.py + waymo.py +
pipelines/loading.py:62-170)."""
import os
import pickle

import numpy as np
import pytest

from futuredet_tpu.data import waymo as W


def _rot_z(yaw):
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def _make_decoded_dataset(root, n_seq=2, n_frames=4, split="train"):
    """Synthetic decoded-frame layout: each vehicle drives +x at 10 m/s,
    one frame per 0.1 s, with a small per-frame yaw. One object 5 m ahead
    of the vehicle in every frame."""
    os.makedirs(os.path.join(root, split, "lidar"), exist_ok=True)
    os.makedirs(os.path.join(root, split, "annos"), exist_ok=True)
    rng = np.random.default_rng(0)
    for s in range(n_seq):
        for f in range(n_frames):
            name = f"seq_{s}_frame_{f}.pkl"
            t_us = 1_000_000 * (100 + 10 * s) + 100_000 * f
            yaw = 0.05 * f
            pose = np.eye(4)
            pose[:3, :3] = _rot_z(yaw)
            pose[:3, 3] = [10.0 * 0.1 * f, 2.0 * s, 0.0]
            pts = rng.uniform(-10, 10, (50, 3)).astype(np.float32)
            frame = {"lidars": {
                "points_xyz": pts,
                "points_feature":
                    rng.uniform(0, 4, (50, 2)).astype(np.float32)}}
            with open(os.path.join(root, split, "lidar", name), "wb") as fh:
                pickle.dump(frame, fh)
            objects = [
                {"label": 1, "name": f"obj_{s}", "num_points": 30,
                 # raw Waymo box [x,y,z,l,w,h,vx,vy,heading]
                 "box": np.array([5.0, 0.0, 1.0, 4.5, 2.0, 1.6,
                                  10.0, 0.0, 0.3], np.float32)},
                {"label": 2, "name": f"ped_{s}", "num_points": 0,  # filtered
                 "box": np.array([2.0, 3.0, 1.0, 0.8, 0.8, 1.7,
                                  0.0, 0.0, 0.0], np.float32)},
            ]
            anno = {"frame_name": f"ctx_{s}_loc_{t_us}",
                    "scene_name": f"context_{s}",
                    "veh_to_global": pose.reshape(-1),
                    "objects": objects}
            with open(os.path.join(root, split, "annos", name), "wb") as fh:
                pickle.dump(anno, fh)


def test_sort_frame_orders_by_seq_then_frame():
    frames = ["seq_1_frame_0.pkl", "seq_0_frame_2.pkl", "seq_0_frame_0.pkl"]
    assert W.sort_frame(frames) == [
        "seq_0_frame_0.pkl", "seq_0_frame_2.pkl", "seq_1_frame_0.pkl"]


def test_convert_box_roundtrip():
    raw = np.array([[1.0, 2.0, 0.5, 4.5, 2.0, 1.6, 3.0, -1.0, 0.7]])
    kitti = W.convert_box_to_kitti(raw)
    # swap l/w, rot = -pi/2 - heading (ref waymo_common.py:265-270)
    np.testing.assert_allclose(kitti[0, 3:6], [2.0, 4.5, 1.6])
    np.testing.assert_allclose(kitti[0, -1], -np.pi / 2 - 0.7)
    # detection-side back-conversion inverts it
    back = W.convert_detection_to_waymo(kitti)
    np.testing.assert_allclose(back[0, 3:6], [4.5, 2.0, 1.6], atol=1e-6)
    np.testing.assert_allclose(back[0, -1], 0.7, atol=1e-6)


def test_create_waymo_infos_sweeps_and_gt(tmp_path):
    _make_decoded_dataset(str(tmp_path))
    out = W.create_waymo_infos(str(tmp_path), split="train", nsweeps=3)
    assert os.path.basename(out) == "infos_train_03sweeps_filter_zero_gt.pkl"
    with open(out, "rb") as f:
        infos = pickle.load(f)
    assert len(infos) == 8
    by_token = {i["token"]: i for i in infos}

    # frame 0 has no history: padded with the ref frame (transform None)
    # then the repeated last sweep (ref :218-228)
    i0 = by_token["seq_0_frame_0.pkl"]
    assert len(i0["sweeps"]) == 2
    assert i0["sweeps"][0]["transform_matrix"] is None
    assert i0["sweeps"][1] is i0["sweeps"][0]

    # frame 3 chains frames 2 and 1 with correct lags
    i3 = by_token["seq_0_frame_3.pkl"]
    lags = [s["time_lag"] for s in i3["sweeps"]]
    np.testing.assert_allclose(lags, [0.1, 0.2], atol=1e-9)

    # transform oracle: the sweep-frame origin maps to the ref frame at
    # ref_from_global @ (sweep position) — vehicle moved 1 m in x between
    # frames, ref frame yawed 0.15
    tm = np.asarray(i3["sweeps"][0]["transform_matrix"])
    origin_ref = tm[:3, 3]
    expect = _rot_z(0.15).T @ (np.array([2.0, 0, 0]) - np.array([3.0, 0, 0]))
    np.testing.assert_allclose(origin_ref, expect, atol=1e-9)

    # GT: zero-point pedestrian filtered, box converted
    assert list(i3["gt_names"]) == ["VEHICLE"]
    np.testing.assert_allclose(i3["gt_boxes"][0, 3:6], [2.0, 4.5, 1.6])


def test_waymo_dataset_multisweep(tmp_path):
    from tests.test_models import tiny_cfg
    _make_decoded_dataset(str(tmp_path))
    path = W.create_waymo_infos(str(tmp_path), split="train", nsweeps=3)

    cfg = tiny_cfg(1, False, False)
    cfg = cfg.replace(data=cfg.data.__class__(
        nsweeps=3, class_names=("VEHICLE",)))
    ds = W.WaymoDataset(cfg, path, train=False)
    assert len(ds) == 8
    s = ds.sample(3)
    pv = s["points"][s["points_valid"]]
    # 3 sweeps x 50 points
    assert len(pv) == 150
    assert pv.shape[1] == 6
    # time-lag column: 50 points each at 0, 0.1, 0.2
    times = np.sort(np.unique(np.round(pv[:, 5], 6)))
    np.testing.assert_allclose(times, [0.0, 0.1, 0.2])
    # intensity stays tanh-normalized after sweep transform
    assert np.all(np.abs(pv[:, 3]) <= 1.0)
    # GT packed into the 12-col layout with rot at column 10
    assert s["gt_valid"][0].sum() == 1
    b = s["gt_boxes"][0, 0]
    np.testing.assert_allclose(b[3:6], [2.0, 4.5, 1.6])
    np.testing.assert_allclose(b[10], -np.pi / 2 - 0.3, atol=1e-6)
    np.testing.assert_allclose(b[6:8], [10.0, 0.0])

    # load_interval (ref waymo.py:55)
    ds2 = W.WaymoDataset(cfg, path, load_interval=2)
    assert len(ds2) == 4


def test_create_pd_detection_fallback_pkl(tmp_path):
    pytest.importorskip("numpy")
    _make_decoded_dataset(str(tmp_path), n_seq=1, n_frames=1)
    path = W.create_waymo_infos(str(tmp_path), split="train", nsweeps=1)
    with open(path, "rb") as f:
        infos = pickle.load(f)
    det = {"seq_0_frame_0.pkl": {
        "box3d_lidar": np.array([[1.0, 2.0, 0.5, 2.0, 4.5, 1.6,
                                  3.0, 0.0, -np.pi / 2 - 0.7]]),
        "scores": np.array([0.9]),
        "label_preds": np.array([0])}}
    out = W.create_pd_detection(det, infos, str(tmp_path))
    with open(out, "rb") as f:
        records = pickle.load(f)
    assert len(records) == 1
    r = records[0]
    assert r["context_name"] == "context_0"
    assert r["type"] == 1  # VEHICLE
    # back in raw Waymo convention: l/w unswapped, heading recovered
    np.testing.assert_allclose(r["box"][3:6], [4.5, 2.0, 1.6], atol=1e-6)
    np.testing.assert_allclose(r["box"][-1], 0.7, atol=1e-6)


def test_cli_waymo_data_prep(tmp_path):
    from futuredet_tpu.cli.create_data import main
    _make_decoded_dataset(str(tmp_path), n_seq=1, n_frames=2)
    paths = main(["waymo_data_prep", "--root_path", str(tmp_path),
                  "--split", "train", "--nsweeps", "2"])
    assert os.path.exists(paths[0])


def test_decode_tfrecords_gated():
    with pytest.raises(ImportError):
        W.decode_tfrecords("x")
