"""Linking + metrics: constructed scenarios with analytically known outcomes."""
import numpy as np

from futuredet_tpu.eval import linking as L
from futuredet_tpu.eval.metrics import (EvalResult, GTRecord, PredRecord,
                                        evaluate_forecasts)

T = 7
TIMES = [0.5] * (T - 1)


def _box(x, y, vx=0.0, vy=0.0):
    return np.array([x, y, -1.0, 2.0, 4.5, 1.6, vx, vy, 0.0], np.float32)


def _per_t_from_tracks(tracks):
    """tracks: list of (T, 9) arrays -> per-timestep ([boxes], [scores])."""
    out = []
    for t in range(T):
        bt = np.stack([tr[t] for tr in tracks])
        out.append((bt, np.full(len(tracks), 0.9, np.float32)))
    return out


def test_tracker_links_moving_object():
    # one object moving at 4 m/s in +x, detected at every future timestep
    track = np.stack([_box(4 * 0.5 * t, 0.0, 4.0, 0.0) for t in range(T)])
    per_t = _per_t_from_tracks([track])
    trajs = L.tracker("car", TIMES, per_t)
    # forward chain + constant-velocity + backcast chain >= 3 trajectories
    assert len(trajs) >= 3
    fwd = trajs[0]
    np.testing.assert_allclose(fwd.boxes[:, 0], track[:, 0], atol=1e-5)


def test_tracker_rejects_implausible_jumps():
    # future detections 50 m away -> forward chain void, but constant-velocity
    # fallback still emitted
    tracks = [np.stack([_box(0, 0, 0, 0)] + [_box(50 + t, 50) for t in range(T - 1)])]
    per_t = _per_t_from_tracks(tracks)
    trajs = L.tracker("car", TIMES, per_t)
    kinds = [np.allclose(tr.boxes[0][:2], [0, 0]) for tr in trajs]
    assert any(kinds)
    # no forward chain should link 0,0 -> 50,50 (dist > 2 m reject)
    for tr in trajs:
        if np.allclose(tr.boxes[0][:2], [0, 0]):
            assert not np.allclose(tr.boxes[1][:2], [51, 50])


def test_multi_future_groups_by_start():
    t1 = L.Trajectory(boxes=np.stack([_box(0, 0)] * T), scores=np.ones(T))
    t2 = L.Trajectory(boxes=np.stack([_box(0.1, 0)] * T), scores=np.ones(T))
    t3 = L.Trajectory(boxes=np.stack([_box(30, 30)] * T), scores=np.ones(T))
    out = L.multi_future([t1, t2, t3])
    assert out[0].forecast_id == out[1].forecast_id
    assert out[2].forecast_id != out[0].forecast_id


def _mk_gt(sample, xs, cohort="linear"):
    centers = np.stack([[x, 0.0] for x in xs])
    return GTRecord(sample=sample, centers=centers,
                    size=np.array([2.0, 4.5, 1.6]), yaw=0.0,
                    vel=np.array([4.0, 0.0]), classname="car", cohort=cohort)


def _mk_pred(sample, xs, det=0.9, fc=0.9, fid=-1):
    centers = np.stack([[x, 0.0] for x in xs])
    return PredRecord(sample=sample, centers=centers,
                      size=np.array([2.0, 4.5, 1.6]), yaw=0.0,
                      vel=np.array([4.0, 0.0]), det_score=det,
                      forecast_score=fc, forecast_id=fid, classname="car")


def test_perfect_predictions_give_ap_one():
    xs = [2 * t for t in range(T)]
    gts = [_mk_gt(f"s{i}", xs) for i in range(10)]
    preds = [_mk_pred(f"s{i}", xs) for i in range(10)]
    r = evaluate_forecasts(preds, gts, ["car"])
    assert r.mean_dist_aps["car"] > 0.99
    assert r.mean_dist_faps["car"] > 0.99
    assert r.mean_dist_aaps["car"] > 0.99
    assert r.label_tp_errors["car"]["avg_disp_err"] < 1e-6
    assert r.label_tp_errors["car"]["final_disp_err"] < 1e-6
    assert r.label_tp_errors["car"]["miss_rate"] == 0.0


def test_wrong_future_kills_fap_not_ap():
    gt_xs = [2 * t for t in range(T)]
    bad_xs = [2 * t if t == 0 else 2 * t + 30 for t in range(T)]  # right now, wrong future
    gts = [_mk_gt(f"s{i}", gt_xs) for i in range(10)]
    preds = [_mk_pred(f"s{i}", bad_xs) for i in range(10)]
    r = evaluate_forecasts(preds, gts, ["car"])
    assert r.mean_dist_aps["car"] > 0.99          # detection AP unaffected
    assert r.mean_dist_faps["car"] < 0.01          # forecasting AP destroyed
    assert r.label_tp_errors["car"]["miss_rate"] == 1.0


def test_false_positives_reduce_ap():
    gt_xs = [0.0] * T
    gts = [_mk_gt(f"s{i}", gt_xs) for i in range(10)]
    preds = [_mk_pred(f"s{i}", gt_xs, det=0.9) for i in range(10)]
    # add 10 high-scoring FPs far from the GT but inside the 50 m car
    # eval range (beyond it the class-range filter would drop them)
    preds += [_mk_pred(f"s{i}", [30.0] * T, det=0.95) for i in range(10)]
    r = evaluate_forecasts(preds, gts, ["car"])
    assert 0.2 < r.mean_dist_aps["car"] < 0.9
    # ... and confirm the range filter DOES drop out-of-range FPs
    far = preds[:10] + [_mk_pred(f"s{i}", [100.0] * T, det=0.95)
                        for i in range(10)]
    r2 = evaluate_forecasts(far, gts, ["car"])
    assert r2.mean_dist_aps["car"] > 0.95


def test_topk_multi_future_rescues_fap():
    gt_xs = [2 * t for t in range(T)]
    gts = [_mk_gt(f"s{i}", gt_xs) for i in range(10)]
    preds = []
    for i in range(10):
        # two futures sharing a start (same forecast_id): one wrong, one right;
        # the wrong one scores higher
        preds.append(_mk_pred(f"s{i}", [2 * t + (30 if t else 0) for t in range(T)],
                              fc=0.9, fid=7))
        preds.append(_mk_pred(f"s{i}", gt_xs, fc=0.8, fid=7))
    r1 = evaluate_forecasts(preds, gts, ["car"], topk=1)
    r5 = evaluate_forecasts(preds, gts, ["car"], topk=5)
    assert r5.mean_dist_faps["car"] > 0.99
    assert r1.mean_dist_faps["car"] < r5.mean_dist_faps["car"]


def test_cohort_analysis_splits_classes():
    xs_static = [0.0] * T
    xs_lin = [2 * t for t in range(T)]
    gts = ([_mk_gt(f"s{i}", xs_static, cohort="static") for i in range(5)]
           + [_mk_gt(f"t{i}", xs_lin, cohort="linear") for i in range(5)])
    preds = ([_mk_pred(f"s{i}", xs_static) for i in range(5)]
             + [_mk_pred(f"t{i}", xs_lin) for i in range(5)])
    r = evaluate_forecasts(preds, gts, ["car"], cohort_analysis=True)
    assert set(r.mean_dist_aps) == {"static_car", "linear_car", "nonlinear_car"}
    assert r.mean_dist_aps["static_car"] > 0.99
    assert r.mean_dist_aps["linear_car"] > 0.99


def test_association_oracle_rescues_bad_futures():
    gt_xs = [2 * t for t in range(T)]
    bad_xs = [2 * t if t == 0 else 2 * t + 30 for t in range(T)]
    gts = [_mk_gt(f"s{i}", gt_xs) for i in range(10)]
    preds = [_mk_pred(f"s{i}", bad_xs) for i in range(10)]
    r = evaluate_forecasts(preds, gts, ["car"])
    r_o = evaluate_forecasts(preds, gts, ["car"], association_oracle=True)
    assert r.mean_dist_faps["car"] < 0.01
    assert r_o.mean_dist_faps["car"] > 0.99


def test_jitter_trajectories():
    from futuredet_tpu.eval.linking import Trajectory, jitter_trajectories
    boxes = np.stack([_box(2 * t, 0, 4, 0) for t in range(T)])
    tr = Trajectory(boxes=boxes, scores=np.full(T, 0.9), forecast_id=1)
    out = jitter_trajectories([tr], TIMES, K=5, C=0.5)
    assert len(out) == 5
    # jittered futures share the start box but diverge later
    for j in out[1:]:
        np.testing.assert_allclose(j.boxes[0][:2], boxes[0][:2])
        assert j.forecast_id == 1


def test_snap_to_prototypes():
    from futuredet_tpu.eval.linking import Trajectory, snap_to_prototypes
    # prototype: moves +x 1m per step
    protos = [[(np.array([2.0, 0.0]), [1.0, 0, 0, 0])]
              + [np.array([float(t), 0.0, 0.0]) for t in range(1, T)]]
    boxes = np.stack([_box(0, 0, 2.0, 0.0)] * T)  # static prediction
    tr = Trajectory(boxes=boxes, scores=np.full(T, 0.9))
    out = snap_to_prototypes([tr], protos)
    np.testing.assert_allclose(out[0].boxes[1:, 0], np.arange(1, T),
                               atol=1e-6)
