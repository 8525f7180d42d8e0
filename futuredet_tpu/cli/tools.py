"""Experiment tools — ports of the reference repo-root scripts.

  trajectory  — dump train-set trajectory prototypes per class
                (ref `/root/reference/trajectory.py:43-65`; consumed by the
                --postprocess snap-to-prototype path, nuscenes.py:341-382)
  statistics  — count static/linear/nonlinear GT trajectories
                (ref `/root/reference/statistics.py`)
  compare     — diff two checkpoints' parameters (ref `compare.py:5-19`)
  visualize   — render GT vs predicted forecasts to a BEV png per sample,
                optionally stitched into one mp4 per scene via --video
                (ref `/root/reference/visualize.py`, matplotlib-lite + cv2)
  export      — serialize the jitted inference forward (StableHLO via
                jax.export) for AOT serving; no reference equivalent (torch
                has no deployment artifact in the repo)

  python -m futuredet_tpu.cli.tools trajectory --info_path infos.pkl
"""
from __future__ import annotations

import argparse
import logging
import pickle

import numpy as np


def cmd_trajectory(args):
    """Per-class trajectory prototypes: (velocity, rotation) + future offsets
    relative to the start box (ref trajectory.py:43-65 layout)."""
    with open(args.info_path, "rb") as f:
        infos = pickle.load(f)
    protos = []
    for info in infos:
        boxes = np.asarray(info.get("gt_boxes", np.zeros((0, 1, 12))))
        names = np.asarray(info.get("gt_names", []))
        if boxes.ndim != 3 or len(boxes) == 0:
            continue
        first = names[:, 0] if names.ndim > 1 else names
        for i in np.where(first == args.classname)[0]:
            tr = boxes[i]
            vel = tr[0, 6:8]
            yaw = -tr[0, 10] - np.pi / 2
            rot = [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]
            offsets = [tr[t, :3] - tr[0, :3] for t in range(1, tr.shape[0])]
            protos.append([(vel, rot)] + offsets)
    out = args.out or f"{args.classname}_trajectory.pkl"
    with open(out, "wb") as f:
        pickle.dump(protos, f)
    logging.info("wrote %d %s trajectory prototypes to %s",
                 len(protos), args.classname, out)
    return protos


def cmd_statistics(args):
    """ref statistics.py: cohort counts over the info set."""
    with open(args.info_path, "rb") as f:
        infos = pickle.load(f)
    counts = {"static": 0, "linear": 0, "nonlinear": 0}
    for info in infos:
        traj = np.asarray(info.get("gt_trajectory", []))
        if traj.size == 0:
            continue
        first = traj[:, 0] if traj.ndim > 1 else traj
        for t in first:
            if str(t) in counts:
                counts[str(t)] += 1
    total = max(sum(counts.values()), 1)
    for k, v in counts.items():
        logging.info("%s: %d (%.1f%%)", k, v, 100.0 * v / total)
    return counts


def cmd_compare(args):
    """ref compare.py: which parameters differ between two checkpoints."""
    import jax
    import orbax.checkpoint as ocp

    def load(d):
        mgr = ocp.CheckpointManager(d)
        step = mgr.latest_step()
        return mgr.restore(step)["state"]["params"], step

    a, sa = load(args.checkpoint_a)
    b, sb = load(args.checkpoint_b)
    logging.info("comparing step %s vs step %s", sa, sb)
    fa = jax.tree_util.tree_leaves_with_path(a)
    fb = {tuple(str(p) for p in path): leaf
          for path, leaf in jax.tree_util.tree_leaves_with_path(b)}
    changed, same = [], []
    for path, leaf in fa:
        key = tuple(str(p) for p in path)
        other = fb.get(key)
        name = "/".join(key)
        if other is None or leaf.shape != other.shape:
            changed.append(name)
        elif np.allclose(leaf, other):
            same.append(name)
        else:
            changed.append(name)
    logging.info("%d changed, %d identical", len(changed), len(same))
    for n in changed[:50]:
        logging.info("changed: %s", n)
    return changed, same


def cmd_visualize(args):
    """BEV png per sample: GT tracklets (green) vs predicted trajectories
    (red), matplotlib. With --video, the per-sample frames are additionally
    stitched into one mp4 per scene at 2 fps (ref visualize.py:212-232,
    cv2.VideoWriter mp4v). Scene grouping comes from, in order: a
    `{scene_token: [sample_token, ...]}` pickle passed via --scene_map, a
    "scene_token" key on each sample dict, else a single "all" video in
    pickle order."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    with open(args.predictions, "rb") as f:
        data = pickle.load(f)
    rendered = []
    for token, sample in list(data.items())[:args.max_samples]:
        fig, ax = plt.subplots(figsize=(8, 8))
        for tr in sample.get("gt", []):
            tr = np.asarray(tr)
            ax.plot(tr[:, 0], tr[:, 1], "g.-", lw=1)
        for tr in sample.get("pred", []):
            tr = np.asarray(tr)
            ax.plot(tr[:, 0], tr[:, 1], "r.-", lw=1, alpha=0.6)
        ax.set_xlim(-55, 55)
        ax.set_ylim(-55, 55)
        ax.set_title(token)
        out = f"{args.out_dir}/{token}.png"
        fig.savefig(out, dpi=100)
        plt.close(fig)
        rendered.append(token)
    logging.info("wrote %d visualizations to %s", len(rendered), args.out_dir)
    if getattr(args, "video", False) and rendered:
        scenes = _group_by_scene(data, rendered, args.scene_map)
        for scene_token, tokens in scenes.items():
            _write_scene_video(args.out_dir, scene_token, tokens)
    return rendered


def _group_by_scene(data, rendered, scene_map_path):
    """Ordered sample tokens per scene, restricted to the rendered frames."""
    rendered_set = set(rendered)
    if scene_map_path:
        with open(scene_map_path, "rb") as f:
            scene_map = pickle.load(f)
        return {sc: [t for t in toks if t in rendered_set]
                for sc, toks in scene_map.items()
                if any(t in rendered_set for t in toks)}
    scenes = {}
    for token in rendered:
        sc = data[token].get("scene_token", "all") if isinstance(
            data[token], dict) else "all"
        scenes.setdefault(sc, []).append(token)
    return scenes


def _write_scene_video(out_dir, scene_token, tokens, fps=2.0):
    """One mp4 per scene from the per-sample pngs (ref visualize.py:212-232:
    mp4v fourcc, 2 fps, frame size from the rendered image)."""
    import cv2

    frames = [cv2.imread(f"{out_dir}/{t}.png") for t in tokens]
    frames = [f for f in frames if f is not None]
    if not frames:
        return
    h, w = frames[0].shape[:2]
    path = f"{out_dir}/{scene_token}.mp4"
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             fps, (w, h))
    for f in frames:
        if f.shape[:2] != (h, w):
            f = cv2.resize(f, (w, h))
        writer.write(f)
    writer.release()
    logging.info("wrote %d-frame scene video %s", len(frames), path)


def cmd_export(args):
    """Export the model's jitted forward+decode as a serialized StableHLO
    artifact (jax.export). The artifact embeds the lowering platform — run
    the export on the deployment target (TPU for serving)."""
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    from ..config import get_config, tiny_variant
    from ..eval.decode import decode_and_nms
    from ..models.detector import build_detector

    cfg = get_config(args.model)
    if args.tiny:
        cfg = tiny_variant(cfg)
    model = build_detector(cfg)
    P = cfg.voxel.max_points
    pts = jnp.zeros((args.batch_size, P, 5), jnp.float32)
    pv = jnp.zeros((args.batch_size, P), bool)
    variables = jax.jit(lambda r: model.init(r, pts, pv, train=False))(
        jax.random.PRNGKey(0))

    def fwd(variables, pts, pv):
        det = decode_and_nms(cfg, model.apply(variables, pts, pv,
                                              train=False))
        return det.boxes, det.scores, det.labels, det.valid

    exp = jexport.export(jax.jit(fwd))(variables, pts, pv)
    blob = exp.serialize()
    out = args.out or f"{args.model}.stablehlo"
    with open(out, "wb") as f:
        f.write(blob)
    logging.info("exported %s (%d bytes, platform %s) to %s",
                 args.model, len(blob), exp.platforms, out)
    if args.check:
        rt = jexport.deserialize(blob)
        outs = rt.call(variables, pts, pv)
        logging.info("roundtrip check ok: boxes %s", outs[0].shape)
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description="FutureDet-TPU tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("trajectory")
    t.add_argument("--info_path", required=True)
    t.add_argument("--classname", default="car")
    t.add_argument("--out", default=None)

    s = sub.add_parser("statistics")
    s.add_argument("--info_path", required=True)

    c = sub.add_parser("compare")
    c.add_argument("checkpoint_a")
    c.add_argument("checkpoint_b")

    v = sub.add_parser("visualize")
    v.add_argument("--predictions", required=True)
    v.add_argument("--out_dir", default=".")
    v.add_argument("--max_samples", type=int, default=20)
    v.add_argument("--video", action="store_true",
                   help="also stitch one mp4 per scene (2 fps, ref "
                        "visualize.py:212-232)")
    v.add_argument("--scene_map", default=None,
                   help="pickle of {scene_token: [sample_token, ...]} for "
                        "scene grouping (e.g. from "
                        "NuScenesTables.sample_tokens_by_scene)")

    e = sub.add_parser("export")
    e.add_argument("--model", default="pp_forecast_n3dtf")
    e.add_argument("--batch_size", type=int, default=1)
    e.add_argument("--out", default=None)
    e.add_argument("--tiny", action="store_true")
    e.add_argument("--check", action="store_true",
                   help="deserialize and run the artifact once")

    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)
    return {"trajectory": cmd_trajectory, "statistics": cmd_statistics,
            "compare": cmd_compare, "visualize": cmd_visualize,
            "export": cmd_export}[args.cmd](args)


if __name__ == "__main__":
    main()
