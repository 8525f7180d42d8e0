"""Forward + decode smoke across the ENTIRE registered config matrix
(tiny geometry): every reference model name plus the multitask presets
builds, initializes (incl. the bev_map branch), runs, and decodes."""
import numpy as np
import jax
import pytest

from futuredet_tpu.config import CONFIG_NAMES, get_config, tiny_variant
from futuredet_tpu.data.synthetic import make_batch
from futuredet_tpu.eval.decode import decode_and_nms
from futuredet_tpu.models.detector import build_detector


@pytest.mark.slow
@pytest.mark.parametrize("name", CONFIG_NAMES)
def test_config_forward_decode(name):
    cfg = tiny_variant(get_config(name))
    batch = make_batch(cfg, 1, seed=0, n_objects=3, n_clutter=200,
                       max_objs=16)
    model = build_detector(cfg)
    kw = {"bev_map": batch["bev_map"]} if "bev_map" in batch else {}
    variables = model.init(jax.random.PRNGKey(0), batch["points"],
                           batch["points_valid"], **kw)
    out = model.apply(variables, batch["points"], batch["points_valid"],
                      **kw)
    if cfg.model.two_stage_refine:
        # TwoStageDetector returns (first-stage preds, proposals, roi)
        preds, proposals, roi = out
        assert np.isfinite(np.asarray(roi["boxes"])).all()
        assert np.isfinite(np.asarray(roi["scores"])).all()
    else:
        preds = out
    assert len(preds) == len(cfg.model.head.num_classes)
    det = decode_and_nms(cfg, preds)
    assert np.isfinite(np.asarray(det.boxes)).all()


# ---------------------------------------------------------------------------
# Config-constant parity vs a table extracted from the reference configs
# (/root/reference/configs/centerpoint/*.py). Every named config's
# loss/sampler constants must match the reference file it mirrors.
# ---------------------------------------------------------------------------

_VEL02 = (1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 0.2, 0.2, 1.0, 1.0)
_ONES = (1.0,) * 10
_CAR_TRAJ = (("static_car", 2), ("linear_car", 4), ("nonlinear_car", 6))
_PED_TRAJ = (("static_pedestrian", 2), ("linear_pedestrian", 2),
             ("nonlinear_pedestrian", 4))

# name -> (code_weights ref :59, sample_groups ref :110-123, timesteps,
#          sampler_type)
_REF_CONSTANTS = {
    "forecast_n0": (_VEL02, (("car", 2),), 1, "standard"),
    "forecast_n3": (_VEL02, (("car", 2),), 7, "standard"),
    "forecast_n3dtf": (_ONES, _CAR_TRAJ, 7, "trajectory"),
    "forecast_n3dtfm": (_ONES, _CAR_TRAJ, 7, "trajectory"),
    "pedestrian_forecast_n0": (_VEL02, (("pedestrian", 2),), 1, "standard"),
    "pedestrian_forecast_n3": (_VEL02, (("pedestrian", 2),), 7, "standard"),
    "pedestrian_forecast_n3dtf": (_ONES, _PED_TRAJ, 7, "trajectory"),
    "pedestrian_forecast_n3dtfm": (_ONES, _PED_TRAJ, 7, "trajectory"),
    "pp_forecast_n3dtf": (_ONES, _CAR_TRAJ, 7, "trajectory"),
    "pp_pedestrian_forecast_n3dtf": (_ONES, _PED_TRAJ, 7, "trajectory"),
}


@pytest.mark.parametrize("name", sorted(_REF_CONSTANTS))
def test_config_constants_match_reference(name):
    cw, groups, timesteps, sampler_type = _REF_CONSTANTS[name]
    cfg = get_config(name)
    assert cfg.model.head.code_weights == cw
    assert cfg.data.sample_groups == groups
    assert cfg.timesteps == timesteps
    assert cfg.model.head.timesteps == timesteps
    assert cfg.data.sampler_type == sampler_type
    assert cfg.assigner.sampler_type == sampler_type
    assert cfg.data.nsweeps == 20              # ref n3dtf:107
    assert cfg.data.gt_aug_min_points == 5     # ref n3dtf:132-136
    assert cfg.model.head.weight == 0.25       # ref :58
    # voxel geometry (ref :160-166 / pp :160-166)
    if name.startswith("pp_"):
        assert cfg.voxel.voxel_size == (0.2, 0.2, 8.0)
        assert cfg.voxel.pc_range == (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
        assert cfg.voxel.max_points_per_voxel == 20
        assert (cfg.voxel.max_voxels_train, cfg.voxel.max_voxels_eval) == \
            (30000, 60000)
    else:
        assert cfg.voxel.voxel_size == (0.075, 0.075, 0.2)
        assert cfg.voxel.pc_range == (-54.0, -54.0, -5.0, 54.0, 54.0, 3.0)
        assert cfg.voxel.max_points_per_voxel == 10
        assert (cfg.voxel.max_voxels_train, cfg.voxel.max_voxels_eval) == \
            (120000, 160000)
    # forecast code weights zero all but velocity (ref center_head.py:280-288)
    cwf = cfg.model.head.code_weights_forecast
    assert cwf[6:8] == cw[6:8] and sum(cwf) == cwf[6] + cwf[7]
