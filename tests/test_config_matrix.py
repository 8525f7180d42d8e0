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


@pytest.mark.parametrize("name", CONFIG_NAMES)
def test_config_forward_decode(name):
    cfg = tiny_variant(get_config(name))
    batch = make_batch(cfg, 1, seed=0, n_objects=3, n_clutter=200,
                       max_objs=16)
    model = build_detector(cfg)
    kw = {"bev_map": batch["bev_map"]} if "bev_map" in batch else {}
    variables = model.init(jax.random.PRNGKey(0), batch["points"],
                           batch["points_valid"], **kw)
    preds = model.apply(variables, batch["points"], batch["points_valid"],
                        **kw)
    assert len(preds) == len(cfg.model.head.num_classes)
    det = decode_and_nms(cfg, preds)
    assert np.isfinite(np.asarray(det.boxes)).all()
