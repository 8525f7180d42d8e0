"""Frozen end-to-end golden fixture for the joint detection+forecasting
metric engine.

tests/fixtures/metrics_golden.{npz,json} pin the FULL `metrics_summary`
output (mAP/mFAP/mAAP/mFAP_MR/AR variants + ATE/ASE/AOE/AVE/AAE/ADE/FDE/MR,
per class and per cohort, topK>1, static_only, association_oracle) of a
fixed multi-class multi-cohort scenario — any semantic drift in
`_make_units` grouping, `_accumulate`, cohort assignment, or the
class-range filter fails these assertions exactly. The reference consumes
these numbers at `/root/reference/evaluate.py:22-54,184-201`; the fixture
is the documented expected devkit-parity behavior (the devkit itself is
unavailable here — see eval/metrics.py).

Regenerate ONLY on an intentional, reviewed semantic change:
    python tests/fixtures/make_metrics_golden.py
"""
import json
import os

import numpy as np
import pytest

from futuredet_tpu.eval.metrics import (GTRecord, PredRecord,
                                        evaluate_forecasts)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")

SETTINGS = {
    "plain": dict(tp_pct=0.6, cohort_analysis=False, topk=1),
    "cohort": dict(tp_pct=0.6, cohort_analysis=True, topk=1),
    "cohort_top5": dict(tp_pct=0.6, cohort_analysis=True, topk=5),
    "static_only": dict(tp_pct=0.6, cohort_analysis=False, topk=1,
                        static_only=True),
    "oracle_top5": dict(tp_pct=0.6, cohort_analysis=False, topk=5,
                        association_oracle=True),
}


def _load_records():
    z = np.load(os.path.join(FIX, "metrics_golden.npz"))
    preds = [PredRecord(
        sample=str(z["pred_sample"][i]), centers=z["pred_centers"][i],
        size=z["pred_size"][i], yaw=float(z["pred_yaw"][i]),
        vel=z["pred_vel"][i], det_score=float(z["pred_det_score"][i]),
        forecast_score=float(z["pred_forecast_score"][i]),
        forecast_id=int(z["pred_forecast_id"][i]),
        classname=str(z["pred_classname"][i]), attr=str(z["pred_attr"][i]))
        for i in range(len(z["pred_sample"]))]
    gts = [GTRecord(
        sample=str(z["gt_sample"][i]), centers=z["gt_centers"][i],
        size=z["gt_size"][i], yaw=float(z["gt_yaw"][i]), vel=z["gt_vel"][i],
        classname=str(z["gt_classname"][i]), cohort=str(z["gt_cohort"][i]),
        attr=str(z["gt_attr"][i]))
        for i in range(len(z["gt_sample"]))]
    return preds, gts


def _assert_tree(got, want, path=""):
    assert set(got) == set(want), f"{path}: keys {set(got) ^ set(want)}"
    for k in want:
        g, w = got[k], want[k]
        if isinstance(w, dict):
            _assert_tree(g, w, f"{path}/{k}")
        else:
            # atol 2e-6: the C++ matcher accumulates fp32 distances while
            # the numpy fallback uses fp64 (measured worst path-vs-path
            # delta 8.5e-7); any SEMANTIC drift moves whole match sets and
            # shifts values by orders of magnitude more
            np.testing.assert_allclose(
                g, w, rtol=0, atol=2e-6,
                err_msg=f"{path}/{k}: golden metric drifted")


@pytest.mark.parametrize("setting", sorted(SETTINGS))
def test_metrics_summary_matches_golden(setting):
    with open(os.path.join(FIX, "metrics_golden.json")) as f:
        expected = json.load(f)
    preds, gts = _load_records()
    res = evaluate_forecasts(preds, gts, ["car", "pedestrian"],
                             horizon_seconds=3.0, **SETTINGS[setting])
    _assert_tree(res.summary(), expected[setting], setting)


def test_golden_values_are_discriminative():
    """The frozen scenario must exercise the semantics it pins: topK
    recovers lower-scored good futures, cohorts differ, the out-of-range
    records are filtered (perfect-score AP despite them), TP errors are
    non-trivial."""
    with open(os.path.join(FIX, "metrics_golden.json")) as f:
        e = json.load(f)
    assert e["cohort_top5"]["mean_dist_faps"]["static_car"] \
        > e["cohort"]["mean_dist_faps"]["static_car"] + 0.1
    assert e["plain"]["mean_dist_aps"]["car"] > 0.9       # range filter works
    assert 0 < e["plain"]["label_tp_errors"]["car"]["attr_err"] < 1
    assert 0 < e["plain"]["label_tp_errors"]["car"]["miss_rate"] < 1
    assert e["oracle_top5"]["mean_dist_faps"]["car"] \
        >= e["plain"]["mean_dist_faps"]["car"]
    cs = e["cohort"]["mean_dist_aps"]
    assert len(set(round(v, 6) for v in cs.values())) > 3
