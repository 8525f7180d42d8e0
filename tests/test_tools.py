"""CLI tools: trajectory prototypes, statistics, compare, waymo reader."""
import pickle

import numpy as np

from futuredet_tpu.cli import tools as T


def _infos(tmp_path, n=4, T_=7):
    rng = np.random.default_rng(0)
    infos = []
    for i in range(n):
        boxes = np.zeros((3, T_, 12), np.float32)
        boxes[:, :, 0] = rng.uniform(-10, 10, (3, 1))
        boxes[1, :, 0] += np.arange(T_) * 2  # mover
        boxes[:, :, 3:6] = [2, 4.5, 1.6]
        boxes[1, :, 6] = 4.0
        infos.append({
            "gt_boxes": boxes,
            "gt_names": np.full((3, T_), "car"),
            "gt_trajectory": np.array([["static"] * T_, ["linear"] * T_,
                                       ["nonlinear"] * T_]),
        })
    p = tmp_path / "infos.pkl"
    with open(p, "wb") as f:
        pickle.dump(infos, f)
    return str(p)


def test_trajectory_prototypes(tmp_path):
    path = _infos(tmp_path)
    out = str(tmp_path / "car_trajectory.pkl")
    protos = T.main(["trajectory", "--info_path", path, "--out", out])
    assert len(protos) == 12  # 3 objects x 4 samples
    vel, rot = protos[0][0]
    assert len(rot) == 4 and len(vel) == 2
    assert len(protos[0]) == 7  # (vel,rot) + 6 future offsets


def test_statistics(tmp_path):
    path = _infos(tmp_path)
    counts = T.main(["statistics", "--info_path", path])
    assert counts == {"static": 4, "linear": 4, "nonlinear": 4}


def test_waymo_reader(tmp_path):
    from futuredet_tpu.data.waymo import WaymoDataset
    from tests.test_models import tiny_cfg

    rng = np.random.default_rng(0)
    frame = {"lidars": {
        "points_xyz": rng.uniform(-7, 7, (300, 3)).astype(np.float32),
        "points_feature": rng.uniform(0, 5, (300, 2)).astype(np.float32)}}
    fp = tmp_path / "frame0.pkl"
    with open(fp, "wb") as f:
        pickle.dump(frame, f)
    boxes = np.zeros((2, 12), np.float32)
    boxes[:, 3:6] = [2, 4, 1.6]
    infos = [{"path": str(fp), "token": "w0", "gt_boxes": boxes,
              "gt_names": np.array(["car", "car"])}]
    ip = tmp_path / "winfos.pkl"
    with open(ip, "wb") as f:
        pickle.dump(infos, f)

    cfg = tiny_cfg(1, False, False)
    ds = WaymoDataset(cfg, str(ip))
    s = ds.sample(0)
    assert s["points"].shape[1] == 6
    assert s["gt_valid"][0].sum() == 2
    # intensity tanh-normalized into [-1, 1]
    pv = s["points"][s["points_valid"]]
    assert np.all(np.abs(pv[:, 3]) <= 1.0)


def test_serialize_submission(tmp_path):
    import json
    from futuredet_tpu.eval.linking import Trajectory
    from futuredet_tpu.eval.serialize import serialize_trajectory, \
        write_submission

    boxes = np.zeros((7, 9), np.float32)
    boxes[:, 0] = np.arange(7) * 2.0
    boxes[:, 3:6] = [2, 4.5, 1.6]
    boxes[:, 6] = 4.0
    tr = Trajectory(boxes=boxes, scores=np.full(7, 0.9, np.float32),
                    forecast_id=3)
    tokens = [f"t{i}" for i in range(7)]
    ann = serialize_trajectory(tr, tokens, "car", forecast_score=0.8)
    assert ann["attribute_name"] == "vehicle.moving"  # speed 4 > 0.2
    assert len(ann["forecast_boxes"]) == 7
    assert ann["forecast_boxes"][3]["sample_token"] == "t3"
    assert ann["forecast_id"] == 3
    out = tmp_path / "sub.json"
    write_submission(str(out), {"t0": [ann]})
    doc = json.loads(out.read_text())
    assert doc["meta"]["use_lidar"] is True
    assert doc["results"]["t0"][0]["forecast_score"] == 0.8


def test_flops_counter():
    from futuredet_tpu.utils.flops import model_flops
    from tests.test_models import tiny_cfg
    out = model_flops(tiny_cfg(1, False, False))
    assert out["flops"] > 1e6
    assert out["bytes_accessed"] > 0


def test_export_roundtrip(tmp_path):
    from futuredet_tpu.cli.tools import main

    out = str(tmp_path / "m.stablehlo")
    path = main(["export", "--model", "forecast_n0", "--tiny",
                 "--out", out, "--check"])
    import os
    assert path == out and os.path.getsize(out) > 10000


def test_trajectory_prototypes_snap_chain(tmp_path, monkeypatch):
    """cli.tools trajectory -> snap_to_prototypes: matched horizon snaps a
    curved future onto the nearest train prototype; mismatched horizon
    raises a clear error instead of a broadcast crash."""
    import sys

    import pytest

    sys.path.insert(0, "tests")
    from test_infos import _mk_mini_nusc
    from futuredet_tpu.data.infos import create_nuscenes_infos
    from futuredet_tpu.cli.tools import main as tools_main
    from futuredet_tpu.eval.linking import Trajectory, snap_to_prototypes

    version = _mk_mini_nusc(tmp_path)
    paths = create_nuscenes_infos(str(tmp_path), version, nsweeps=3,
                                  timesteps=7)
    monkeypatch.chdir(tmp_path)
    protos = tools_main(["trajectory", "--info_path", str(paths[0]),
                         "--classname", "car"])
    assert len(protos) > 0 and len(protos[0]) - 1 == 6

    T = 7
    boxes = np.zeros((T, 9), np.float32)
    t = np.arange(T)
    boxes[:, 0] = 2.0 * t
    boxes[:, 1] = 0.5 * t ** 2
    boxes[:, 3:6] = 2.0
    boxes[:, 6] = 4.0
    tr = Trajectory(boxes=boxes, scores=np.ones(T, np.float32))
    out = snap_to_prototypes([tr], protos)[0]
    assert not np.allclose(boxes[1:, :2], out.boxes[1:, :2])

    short = Trajectory(boxes=boxes[:3], scores=np.ones(3, np.float32))
    with pytest.raises(ValueError, match="different horizon"):
        snap_to_prototypes([short], protos)


def test_visualize_scene_video(tmp_path):
    """--video stitches one mp4 per scene from the per-sample pngs
    (ref visualize.py:212-232: mp4v, 2 fps, frame-per-sample)."""
    import cv2

    rng = np.random.default_rng(0)
    data = {}
    for i, (tok, sc) in enumerate([("s0", "sceneA"), ("s1", "sceneA"),
                                   ("s2", "sceneB")]):
        data[tok] = {
            "scene_token": sc,
            "gt": [rng.uniform(-40, 40, (7, 2))],
            "pred": [rng.uniform(-40, 40, (7, 2))],
        }
    p = tmp_path / "preds.pkl"
    with open(p, "wb") as f:
        pickle.dump(data, f)
    rendered = T.main(["visualize", "--predictions", str(p),
                       "--out_dir", str(tmp_path), "--video"])
    assert rendered == ["s0", "s1", "s2"]
    for sc, n_frames in [("sceneA", 2), ("sceneB", 1)]:
        path = tmp_path / f"{sc}.mp4"
        assert path.exists(), sc
        cap = cv2.VideoCapture(str(path))
        assert cap.isOpened()
        got = 0
        while cap.read()[0]:
            got += 1
        cap.release()
        assert got == n_frames, sc


def test_visualize_scene_map_grouping(tmp_path):
    """Explicit --scene_map pickle wins over per-sample scene_token keys."""
    import cv2

    data = {t: {"gt": [np.zeros((2, 2))], "pred": []} for t in ("a", "b")}
    p = tmp_path / "preds.pkl"
    with open(p, "wb") as f:
        pickle.dump(data, f)
    sm = tmp_path / "scenes.pkl"
    with open(sm, "wb") as f:
        pickle.dump({"sc1": ["b", "a", "missing_token"]}, f)
    T.main(["visualize", "--predictions", str(p), "--out_dir", str(tmp_path),
            "--video", "--scene_map", str(sm)])
    cap = cv2.VideoCapture(str(tmp_path / "sc1.mp4"))
    got = 0
    while cap.read()[0]:
        got += 1
    cap.release()
    assert got == 2
