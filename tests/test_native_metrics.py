"""C++ greedy matcher (fd_accumulate) == pure-numpy metric engine."""
import numpy as np
import pytest

from futuredet_tpu.eval import metrics as M
from futuredet_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable")


def _random_world(seed, n_samples=6, n_gt=12, n_pred=30, T=7):
    rng = np.random.default_rng(seed)
    gts, preds = [], []
    for s in range(n_samples):
        tok = f"s{s}"
        for _ in range(n_gt):
            start = rng.uniform(-40, 40, 2)
            vel = rng.uniform(-5, 5, 2)
            centers = start[None] + np.arange(T)[:, None] * 0.5 * vel[None]
            if rng.random() < 0.3:
                centers = centers + rng.normal(0, 2.0, (T, 2)).cumsum(0)
            gts.append(M.GTRecord(
                tok, centers, rng.uniform(0.5, 3, 3), rng.uniform(-3, 3),
                vel, "car",
                cohort=("static", "linear", "nonlinear")[rng.integers(3)],
                attr=("", "vehicle.moving", "vehicle.parked",
                      "vehicle.stopped")[rng.integers(4)]))
        for k in range(n_pred):
            if rng.random() < 0.7:
                # noisy copy of a GT trajectory (true-positive candidates)
                g = gts[len(gts) - n_gt + int(rng.integers(n_gt))]
                centers = g.centers + rng.normal(0, 0.8, (T, 2))
                vel = g.vel + rng.normal(0, 0.5, 2)
                size = g.size * rng.uniform(0.8, 1.2, 3)
                yaw = g.yaw + rng.normal(0, 0.3)
            else:
                start = rng.uniform(-40, 40, 2)
                vel = rng.uniform(-5, 5, 2)
                centers = (start[None]
                           + np.arange(T)[:, None] * 0.5 * vel[None]
                           + rng.normal(0, 0.7, (T, 2)))
                size = rng.uniform(0.5, 3, 3)
                yaw = rng.uniform(-3, 3)
            preds.append(M.PredRecord(
                tok, centers, size, float(yaw),
                vel, float(rng.random()), float(rng.random()),
                int(rng.integers(-1, 6)), "car",
                attr=("vehicle.moving", "vehicle.parked")[rng.integers(2)]))
    return preds, gts


@pytest.mark.parametrize("seed,topk,oracle", [(0, 1, False), (1, 3, False),
                                              (2, 1, True)])
def test_native_matches_numpy(monkeypatch, seed, topk, oracle):
    preds, gts = _random_world(seed)

    monkeypatch.setattr(M, "_USE_NATIVE", False)
    ref = M.evaluate_forecasts(preds, gts, ["car"], topk=topk,
                               cohort_analysis=True,
                               association_oracle=oracle)
    monkeypatch.setattr(M, "_USE_NATIVE", True)
    out = M.evaluate_forecasts(preds, gts, ["car"], topk=topk,
                               cohort_analysis=True,
                               association_oracle=oracle)

    for name in ("mean_dist_aps", "mean_dist_ars", "mean_dist_faps",
                 "mean_dist_fars", "mean_dist_aaps", "mean_dist_aars",
                 "mean_dist_faps_mr"):
        a, b = getattr(ref, name), getattr(out, name)
        assert a.keys() == b.keys()
        for k in a:
            assert a[k] == pytest.approx(b[k], abs=1e-5), (name, k)
    for cls in ref.label_tp_errors:
        for k, v in ref.label_tp_errors[cls].items():
            assert v == pytest.approx(out.label_tp_errors[cls][k],
                                      abs=1e-4), (cls, k)


def test_native_accumulate_direct(monkeypatch):
    preds, gts = _random_world(7, n_samples=3, n_gt=8, n_pred=20)
    units, key = M._make_units(preds, True, 2)
    gt_index = M._gt_index(gts)
    nat = M._flatten_for_native(units, gts, gt_index)

    monkeypatch.setattr(M, "_USE_NATIVE", True)
    a = M._accumulate(preds, gts, 2.0, use_forecast_score=True,
                      final_match_th=2.0, topk=2, units=units, key=key,
                      gt_index=gt_index, native_data=nat)
    monkeypatch.setattr(M, "_USE_NATIVE", False)
    b = M._accumulate(preds, gts, 2.0, use_forecast_score=True,
                      final_match_th=2.0, topk=2, units=units, key=key,
                      gt_index=gt_index)
    np.testing.assert_array_equal(a["tp"], b["tp"])
    np.testing.assert_array_equal(a["fp"], b["fp"])
    np.testing.assert_allclose(a["conf"], b["conf"], atol=1e-7)
    for k in a["errs"]:
        np.testing.assert_allclose(a["errs"][k], b["errs"][k], atol=1e-4,
                                   err_msg=k)
