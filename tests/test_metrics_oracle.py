"""Independent oracles for the metric engine's AP / TP-error math.

`_calc_ap` / `_calc_tp_errors` reconstruct the nuScenes eval formulas
(calc_ap / calc_tp / cummean; consumed by the reference via eval_main,
/root/reference/det3d/datasets/nuscenes/nusc_common.py:667-688). These tests
pin hand-computed closed-form values for the edge cases the devkit is known
to exercise: recall below min_recall, empty TP tails, tp_pct below the
min-recall window, NaN attribute skipping, and the class-range filter.

The `acc` dicts are constructed by hand (no matching involved) so the tests
are oracles of the FORMULAS, independent of `_accumulate`.
"""
import numpy as np
import pytest

from futuredet_tpu.eval import metrics as M
from futuredet_tpu.eval.evaluator import pred_attribute


def _acc(tp_seq, npos, errs=None, conf=None):
    tp_seq = np.asarray(tp_seq, float)
    base = {k: np.array([] if errs is None else errs.get(k, [0.0] * int(
        tp_seq.sum())), float)
        for k in ("trans_err", "scale_err", "orient_err", "vel_err",
                  "attr_err", "avg_disp_err", "final_disp_err", "miss")}
    return {"tp": np.cumsum(tp_seq), "fp": np.cumsum(1.0 - tp_seq),
            "conf": np.asarray(conf if conf is not None
                               else np.linspace(1, 0.5, len(tp_seq))),
            "errs": base, "npos": npos}


# ---------------------------------------------------------------------------
# _calc_ap
# ---------------------------------------------------------------------------

def test_ap_perfect_detector_is_one():
    # 10 TPs over npos=10: precision 1 at every recall -> AP = 1 exactly
    ap, ar = M._calc_ap(_acc([1] * 10, 10))
    assert ap == pytest.approx(1.0)
    assert ar == pytest.approx(1.0)


def test_ap_all_false_positives_is_zero():
    ap, ar = M._calc_ap(_acc([0] * 10, 10))
    assert ap == 0.0
    assert ar == 0.0


def test_ap_recall_below_min_recall_is_zero():
    # a single TP of npos=10 reaches recall 0.1 == min_recall; the AP
    # integral starts strictly ABOVE min_recall (index 11 of 101), where
    # interpolated precision is already 0 (right fill)
    ap, _ = M._calc_ap(_acc([1], 10))
    assert ap == 0.0


def test_ap_one_sample_past_min_recall():
    # 11 TPs of npos=100: recall reaches 0.11; exactly one of the 90
    # integration samples (r=0.11) has precision 1
    # AP = ((1 - 0.1)/0.9) / 90 = 1/90
    ap, _ = M._calc_ap(_acc([1] * 11, 100))
    assert ap == pytest.approx(1.0 / 90.0)


def test_ap_min_precision_clip():
    # precision held at 0.1 == min_precision everywhere -> clipped to 0
    # 10 TPs interleaved with 90 FPs (TP first in each block of 10):
    # at every recall point precision <= 1/(position) and ends at 0.1
    seq = ([1] + [0] * 9) * 10
    ap, _ = M._calc_ap(_acc(seq, 10))
    # final precision = 10/100 = 0.1 -> (p - 0.1) clips to ~0 at the tail;
    # early recalls still contribute
    assert 0.0 < ap < 0.2


def test_ap_empty_acc():
    assert M._calc_ap(None) == (0.0, 0.0)
    assert M._calc_ap(_acc([], 0) | {"npos": 0, "tp": np.array([]),
                                     "fp": np.array([])}) == (0.0, 0.0)


def test_ap_matches_published_formula_random():
    # cross-check against a direct transcription of the published
    # nuScenes calc_ap (written here from the formula, not our impl)
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(5, 60))
        npos = int(rng.integers(5, 40))
        seq = (rng.random(n) < 0.5).astype(float)
        acc = _acc(seq, npos)
        rec = acc["tp"] / npos
        prec = acc["tp"] / (acc["tp"] + acc["fp"])
        rec_i = np.linspace(0, 1, 101)
        p = np.interp(rec_i, rec, prec, right=0)[11:]
        p -= 0.1
        p[p < 0] = 0
        want = float(np.mean(p)) / 0.9
        got, _ = M._calc_ap(acc)
        assert got == pytest.approx(want, abs=1e-12)


# ---------------------------------------------------------------------------
# _calc_tp_errors
# ---------------------------------------------------------------------------

def test_tp_errors_constant_error_passthrough():
    # constant per-TP error c: every cumulative mean equals c, so the
    # recall-window average is c for any tp_pct
    errs = {k: [0.25] * 8 for k in ("trans_err", "scale_err", "orient_err",
                                    "vel_err", "attr_err", "avg_disp_err",
                                    "final_disp_err", "miss")}
    out = M._calc_tp_errors(_acc([1] * 8, 10, errs=errs), tp_pct=0.6)
    for k in ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err",
              "avg_disp_err", "final_disp_err", "miss_rate"):
        assert out[k] == pytest.approx(0.25)


def test_tp_errors_tp_pct_below_min_recall_uses_final_cummean():
    # max_rec = min(rec[-1], tp_pct) = 0.05 -> window [11, 6) is empty ->
    # falls back to the FINAL cumulative mean = mean of all TP errors
    errs = {"trans_err": [1.0, 2.0, 3.0]}
    out = M._calc_tp_errors(_acc([1, 1, 1], 60, errs=errs), tp_pct=0.05)
    assert out["trans_err"] == pytest.approx(2.0)


def test_tp_errors_no_tps_all_one():
    out = M._calc_tp_errors(_acc([0, 0], 5), tp_pct=0.6)
    assert all(v == 1.0 for v in out.values())
    assert M._calc_tp_errors(None, 0.6) == out


def test_tp_errors_all_nan_attr_is_one():
    # no GT carried attributes: every attr_err is NaN -> AAE = 1.0
    # (nuScenes cummean returns ones for all-NaN)
    errs = {"attr_err": [np.nan, np.nan, np.nan]}
    out = M._calc_tp_errors(_acc([1, 1, 1], 5, errs=errs), tp_pct=1.0)
    assert out["attr_err"] == 1.0


def test_cummean_skips_nan():
    np.testing.assert_allclose(M._cummean(np.array([0.0, np.nan, 1.0])),
                               [0.0, 0.0, 0.5])
    np.testing.assert_allclose(M._cummean(np.array([np.nan, 4.0])),
                               [0.0, 4.0])
    np.testing.assert_allclose(M._cummean(np.array([np.nan] * 3)),
                               [1.0, 1.0, 1.0])


# ---------------------------------------------------------------------------
# attribute assignment + AAE end-to-end
# ---------------------------------------------------------------------------

def test_pred_attribute_reference_heuristic():
    # ref nuscenes.py:760-784 + cls_attr_dist fallback
    assert pred_attribute("car", 1.0) == "vehicle.moving"
    assert pred_attribute("car", 0.1) == "vehicle.parked"
    assert pred_attribute("pedestrian", 1.0) == "pedestrian.moving"
    assert pred_attribute("pedestrian", 0.1) == "pedestrian.standing"
    assert pred_attribute("bus", 0.0) == "vehicle.stopped"
    assert pred_attribute("bicycle", 1.0) == "cycle.with_rider"
    assert pred_attribute("barrier", 1.0) == ""


T = 7


def _pred(sample, x, det, attr):
    c = np.tile([[x, 0.0]], (T, 1)).astype(float)
    return M.PredRecord(sample, c, np.array([2.0, 4.5, 1.6]), 0.0,
                        np.zeros(2), det, det, -1, "car", attr=attr)


def _gt(sample, x, attr):
    c = np.tile([[x, 0.0]], (T, 1)).astype(float)
    return M.GTRecord(sample, c, np.array([2.0, 4.5, 1.6]), 0.0,
                      np.zeros(2), "car", attr=attr)


@pytest.mark.parametrize("use_native", [False, True])
def test_aae_counts_mismatches_and_skips_missing(monkeypatch, use_native):
    from futuredet_tpu.utils import native
    if use_native and not native.available():
        pytest.skip("native lib unavailable")
    monkeypatch.setattr(M, "_USE_NATIVE", use_native)
    # 4 perfect matches: attrs [match, mismatch, missing-GT, match]
    gts = [_gt("s0", 0.0, "vehicle.moving"),
           _gt("s1", 0.0, "vehicle.moving"),
           _gt("s2", 0.0, ""),
           _gt("s3", 0.0, "vehicle.parked")]
    preds = [_pred("s0", 0.0, 0.9, "vehicle.moving"),
             _pred("s1", 0.0, 0.8, "vehicle.parked"),
             _pred("s2", 0.0, 0.7, "vehicle.moving"),
             _pred("s3", 0.0, 0.6, "vehicle.parked")]
    r = M.evaluate_forecasts(preds, gts, ["car"], tp_pct=1.0)
    # cummean over attr errs [0, 1, nan, 0] -> [0, .5, .5, 1/3]; recalls
    # [.25,.5,.75,1]; window mean over r in (0.10, 1.00]
    ei = np.interp(np.linspace(0, 1, 101), [0.25, 0.5, 0.75, 1.0],
                   [0.0, 0.5, 0.5, 1 / 3])
    want = float(np.mean(ei[11:101]))
    assert r.label_tp_errors["car"]["attr_err"] == pytest.approx(want,
                                                                 abs=1e-6)


# ---------------------------------------------------------------------------
# class-range filter (devkit filter_eval_boxes)
# ---------------------------------------------------------------------------

def test_class_range_filter_drops_far_boxes():
    # car range 50 m: GT at 49 m is evaluable, GT at 51 m is not
    gts = [_gt("s0", 49.0, ""), _gt("s0", 51.0, "")]
    preds = [_pred("s0", 49.0, 0.9, ""), _pred("s0", 51.0, 0.8, "")]
    r = M.evaluate_forecasts(preds, gts, ["car"])
    assert r.mean_dist_aps["car"] == pytest.approx(1.0)

    # a pedestrian at 45 m is outside ITS 40 m range
    gp = M.GTRecord("s0", np.tile([[45.0, 0.0]], (T, 1)),
                    np.array([0.6, 0.6, 1.7]), 0.0, np.zeros(2), "pedestrian")
    r2 = M.evaluate_forecasts(preds + [], gts + [gp], ["car", "pedestrian"])
    # no pedestrian GT survives -> AP contributions all zero
    assert r2.mean_dist_aps["pedestrian"] == 0.0


def test_class_range_filter_can_be_disabled():
    gts = [_gt("s0", 51.0, "")]
    preds = [_pred("s0", 51.0, 0.9, "")]
    r = M.evaluate_forecasts(preds, gts, ["car"], class_ranges={})
    assert r.mean_dist_aps["car"] == pytest.approx(1.0)
