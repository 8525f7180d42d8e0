"""Minimal devkit-free nuScenes table access.

The reference depends on the external nuScenes devkit (+ the
nuscenes-forecast fork). Neither is vendored here; instead we read the raw
dataset JSON tables (`{version}/sample.json`, `sample_data.json`,
`sample_annotation.json`, `calibrated_sensor.json`, `ego_pose.json`,
`scene.json`) and implement the handful of geometric helpers the pipeline
needs (quaternion rotation, transform matrices, finite-difference box
velocity — matching devkit `NuScenes.box_velocity` semantics).
"""
from __future__ import annotations

import json
import os
from functools import cached_property
from typing import Dict, List

import numpy as np

TABLES = ("scene", "sample", "sample_data", "sample_annotation",
          "calibrated_sensor", "ego_pose", "category", "instance")


def quat_to_rot(q) -> np.ndarray:
    """(w, x, y, z) -> 3x3 rotation matrix."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def quat_yaw(q) -> float:
    """Heading of the box x-axis projected to the ground plane (devkit
    `quaternion_yaw`, ref nusc_common.py:587+)."""
    rot = quat_to_rot(q)
    v = rot @ np.array([1.0, 0.0, 0.0])
    return float(np.arctan2(v[1], v[0]))


def quat_inverse(q):
    w, x, y, z = q
    n = w * w + x * x + y * y + z * z
    return np.array([w, -x, -y, -z]) / n


def transform_matrix(translation, rotation_q, inverse=False) -> np.ndarray:
    """4x4 homogeneous transform (devkit geometry_utils.transform_matrix)."""
    tm = np.eye(4)
    rot = quat_to_rot(rotation_q)
    if inverse:
        tm[:3, :3] = rot.T
        tm[:3, 3] = -(rot.T @ np.asarray(translation))
    else:
        tm[:3, :3] = rot
        tm[:3, 3] = translation
    return tm


class NuScenesTables:
    def __init__(self, dataroot: str, version: str = "v1.0-trainval"):
        self.dataroot = dataroot
        self.version = version
        self._t: Dict[str, list] = {}
        self._idx: Dict[str, dict] = {}
        for name in TABLES:
            path = os.path.join(dataroot, version, f"{name}.json")
            if os.path.exists(path):
                with open(path) as f:
                    self._t[name] = json.load(f)
            else:
                self._t[name] = []
            self._idx[name] = {r["token"]: r for r in self._t[name]}

    def table(self, name: str) -> list:
        return self._t[name]

    def get(self, name: str, token: str) -> dict:
        return self._idx[name][token]

    @cached_property
    def sample_tokens_by_scene(self) -> Dict[str, List[str]]:
        """Ordered sample tokens per scene (walking the `next` chain)."""
        out = {}
        for scene in self._t["scene"]:
            toks = []
            tok = scene["first_sample_token"]
            while tok:
                toks.append(tok)
                tok = self.get("sample", tok)["next"]
            out[scene["token"]] = toks
        return out

    def box_velocity(self, ann_token: str, max_time_diff: float = 1.5
                     ) -> np.ndarray:
        """Finite-difference global-frame velocity (devkit semantics: central
        difference over prev/next annotations; nan if unavailable)."""
        ann = self.get("sample_annotation", ann_token)
        has_prev = ann["prev"] != ""
        has_next = ann["next"] != ""
        if not has_prev and not has_next:
            return np.array([np.nan, np.nan, np.nan])
        first = self.get("sample_annotation", ann["prev"]) if has_prev else ann
        last = self.get("sample_annotation", ann["next"]) if has_next else ann
        pos_first = np.asarray(first["translation"])
        pos_last = np.asarray(last["translation"])
        t_first = 1e-6 * self.get("sample", first["sample_token"])["timestamp"]
        t_last = 1e-6 * self.get("sample", last["sample_token"])["timestamp"]
        dt = t_last - t_first
        if dt > max_time_diff or dt <= 0:
            return np.array([np.nan, np.nan, np.nan])
        return (pos_last - pos_first) / dt

    def lidar_path(self, sample_data_token: str) -> str:
        sd = self.get("sample_data", sample_data_token)
        return os.path.join(self.dataroot, sd["filename"])

    def ann_category(self, ann: dict) -> str:
        """Raw sample_annotation has no category_name — resolve through the
        instance table (the devkit does this at load time)."""
        if "category_name" in ann:
            return ann["category_name"]
        inst = self.get("instance", ann["instance_token"])
        return self.get("category", inst["category_token"])["name"]


# canonical category -> detection-name mapping (ref nusc_common.py
# general_to_detection)
GENERAL_TO_DETECTION = {
    "vehicle.car": "car",
    "vehicle.truck": "truck",
    "vehicle.bus.bendy": "bus",
    "vehicle.bus.rigid": "bus",
    "vehicle.construction": "construction_vehicle",
    "vehicle.trailer": "trailer",
    "vehicle.motorcycle": "motorcycle",
    "vehicle.bicycle": "bicycle",
    "human.pedestrian.adult": "pedestrian",
    "human.pedestrian.child": "pedestrian",
    "human.pedestrian.construction_worker": "pedestrian",
    "human.pedestrian.police_officer": "pedestrian",
    "movable_object.barrier": "barrier",
    "movable_object.trafficcone": "traffic_cone",
}


def detection_name(category: str) -> str:
    return GENERAL_TO_DETECTION.get(category, "ignore")
