"""Waymo dataset support (secondary, mirroring the reference's partial
support — `det3d/datasets/waymo/`, README.md:190 marks it unsupported).

The reference reads pre-decoded pickle objects per frame
(`waymo_decoder.py` output: {"lidars": {"points_xyz", "points_feature"}}).
This reader consumes the same format; forecasting requires per-timestep
annotations which Waymo infos don't carry in the reference either, so the
dataset is detection-only (timesteps broadcast from t=0, like the
reference's single-frame Waymo path).
"""
from __future__ import annotations

import pickle
from typing import Dict

import numpy as np

from ..config import ExperimentConfig
from .pipeline import pack_gt, pack_points


def read_waymo_frame(path: str) -> np.ndarray:
    """ref loading.py:62-71: tanh-normalized intensity, xyz + feature concat."""
    with open(path, "rb") as f:
        obj = pickle.load(f)
    xyz = obj["lidars"]["points_xyz"]
    feat = obj["lidars"]["points_feature"]
    feat = np.asarray(feat, np.float32).copy()
    feat[:, 0] = np.tanh(feat[:, 0])
    return np.concatenate([xyz, feat], axis=-1).astype(np.float32)


class WaymoDataset:
    def __init__(self, cfg: ExperimentConfig, info_path: str,
                 train: bool = True, seed: int = 0):
        self.cfg = cfg
        self.train = train
        self.rng = np.random.default_rng(seed)
        with open(info_path, "rb") as f:
            self.infos = pickle.load(f)

    def __len__(self):
        return len(self.infos)

    def sample(self, idx: int) -> Dict[str, np.ndarray]:
        cfg = self.cfg
        info = self.infos[idx]
        pts = read_waymo_frame(info["path"])
        pts = np.hstack([pts[:, :5],
                         np.zeros((len(pts), 1), np.float32)])  # time lag
        gt_boxes, gt_cls, gt_valid, gt_traj, _ = pack_gt(
            cfg, info.get("gt_boxes", []), info.get("gt_names", []),
            np.full((len(info.get("gt_boxes", [])), 1), "static"),
            cfg.data.class_names)
        points, pvalid = pack_points(pts, cfg.voxel.max_points, self.rng)
        return {"points": points, "points_valid": pvalid,
                "gt_boxes": gt_boxes, "gt_classes": gt_cls,
                "gt_valid": gt_valid, "traj_classes": gt_traj,
                "token": info.get("token", str(idx))}
