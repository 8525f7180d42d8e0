"""Data preparation CLI — mirrors `tools/create_data.py` (ref :15-28).

  python -m futuredet_tpu.cli.create_data nuscenes_data_prep \
      --root_path /data/nuScenes --version v1.0-trainval --nsweeps 20
"""
from __future__ import annotations

import argparse
import logging


def main(argv=None):
    p = argparse.ArgumentParser(description="FutureDet-TPU data prep")
    p.add_argument("command", choices=["nuscenes_data_prep",
                                       "waymo_data_prep"])
    p.add_argument("--root_path", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--split", default="train",
                   help="waymo_data_prep: train/val/test")
    p.add_argument("--nsweeps", type=int, default=20)
    p.add_argument("--timesteps", type=int, default=7)
    p.add_argument("--filter_zero", type=lambda s: s != "False", default=True)
    p.add_argument("--gt_database", action="store_true",
                   help="also build the GT-AUG database")
    p.add_argument("--model", default="forecast_n3dtf",
                   help="config used for gt database packing")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO, force=True)

    if args.command == "waymo_data_prep":
        # ref tools/create_data.py:30-31
        from ..data.waymo import create_waymo_infos
        path = create_waymo_infos(args.root_path, split=args.split,
                                  nsweeps=args.nsweeps)
        logging.info("waymo infos written: %s", path)
        return [path]

    from ..data.infos import create_nuscenes_infos
    paths = create_nuscenes_infos(args.root_path, args.version, args.nsweeps,
                                  args.timesteps, args.filter_zero)
    logging.info("infos written: %s", paths)

    if args.gt_database:
        from ..config import get_config
        from ..data.gt_database import create_groundtruth_database
        from ..data.pipeline import NuScenesForecastDataset
        cfg = get_config(args.model)
        cfg = cfg.replace(data=cfg.data.__class__(
            nsweeps=args.nsweeps, class_names=cfg.data.class_names))
        ds = NuScenesForecastDataset(cfg, paths[0], train=False,
                                     class_balanced=False)
        db = create_groundtruth_database(cfg, ds, args.root_path)
        logging.info("gt database written: %s", db)
    return paths


if __name__ == "__main__":
    main()
