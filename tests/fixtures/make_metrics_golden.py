"""Generate the frozen end-to-end metric-engine fixture.

Fabricates a deterministic multi-class (car + pedestrian), multi-cohort
(static/linear/nonlinear) scenario — good/degraded/false-positive
predictions, multi-future forecast_id groups, attributes, out-of-range
records — runs `eval.metrics.evaluate_forecasts` under every headline
setting, and freezes inputs (metrics_golden.npz) + the full expected
`metrics_summary` outputs (metrics_golden.json).

The JSON doubles as the documented expected devkit-parity behavior of the
metric engine (the nuscenes-forecast devkit itself is not available in this
environment — see eval/metrics.py module docstring). Any semantic drift in
_make_units / _accumulate / cohort assignment / the class-range filter
fails tests/test_metrics_golden.py exactly.

Regenerate (ONLY after an intentional, reviewed semantic change):
    python tests/fixtures/make_metrics_golden.py
"""
import json
import os

import numpy as np

T = 7
HORIZON = 3.0
OUT = os.path.dirname(os.path.abspath(__file__))


def build_scenario():
    rng = np.random.default_rng(20260818)
    preds, gts = [], []
    gid = 0

    def traj(start, vel, turn=0.0):
        pos = np.array(start, float)
        v = np.array(vel, float)
        out = [pos.copy()]
        for _ in range(T - 1):
            pos = pos + v * (HORIZON / (T - 1))
            c, s = np.cos(turn), np.sin(turn)
            v = np.array([v[0] * c - v[1] * s, v[0] * s + v[1] * c])
            out.append(pos.copy())
        return np.stack(out)

    classes = [("car", (1.9, 4.6, 1.7), 42.0,
                ["vehicle.moving", "vehicle.parked", ""]),
               ("pedestrian", (0.7, 0.7, 1.8), 32.0,
                ["pedestrian.moving", "pedestrian.standing", ""])]
    cohorts = [("static", 0.0, 0.0), ("linear", 6.0, 0.0),
               ("nonlinear", 6.0, 0.35)]

    for s in range(3):
        sample = f"sample_{s}"
        for cls, size, rmax, attrs in classes:
            for ci, (cohort, speed, turn) in enumerate(cohorts):
                for j in range(2):
                    ang = rng.uniform(-np.pi, np.pi)
                    r = rng.uniform(5.0, rmax)
                    start = [r * np.cos(ang), r * np.sin(ang)]
                    yaw = rng.uniform(-np.pi, np.pi)
                    vel = speed * np.array([np.cos(yaw), np.sin(yaw)])
                    centers = traj(start, vel, turn)
                    gts.append(dict(sample=sample, centers=centers,
                                    size=np.array(size), yaw=yaw, vel=vel,
                                    classname=cls, cohort=cohort,
                                    attr=attrs[j % len(attrs)]))
                    # a good prediction (TP at every timestep) and a
                    # drifting-tail second future in the SAME group; on
                    # half the groups the DRIFTING member outscores the
                    # good one, so K=1 misses the good future but topK
                    # recovers it (multi-future semantics coverage)
                    n = rng.normal(0, 0.25, centers.shape)
                    good_hi = (j + ci) % 2 == 0
                    s_hi = float(rng.uniform(0.65, 0.9))
                    s_lo = float(rng.uniform(0.3, 0.55))
                    preds.append(dict(
                        sample=sample, centers=centers + n,
                        size=np.array(size) * rng.uniform(0.9, 1.1),
                        yaw=yaw + rng.normal(0, 0.1),
                        vel=vel + rng.normal(0, 0.4, 2),
                        det_score=float(rng.uniform(0.7, 0.95)),
                        forecast_score=s_hi if good_hi else s_lo,
                        forecast_id=gid, classname=cls,
                        attr=attrs[j % len(attrs)]))
                    drift = np.linspace(0, rng.uniform(2.5, 5.0), T)
                    bad_tail = centers.copy()
                    bad_tail[:, 0] += drift
                    preds.append(dict(
                        sample=sample, centers=bad_tail + n,
                        size=np.array(size), yaw=yaw,
                        vel=vel + rng.normal(0, 0.4, 2),
                        det_score=float(rng.uniform(0.5, 0.7)),
                        forecast_score=s_lo if good_hi else s_hi,
                        forecast_id=gid, classname=cls,
                        attr=attrs[(j + 1) % len(attrs)]))
                    gid += 1
                    if j == 0 and ci == 1:
                        # a duplicate detection of the same GT (own group)
                        preds.append(dict(
                            sample=sample, centers=centers + 0.8,
                            size=np.array(size), yaw=yaw + 0.4, vel=vel,
                            det_score=float(rng.uniform(0.3, 0.5)),
                            forecast_score=float(rng.uniform(0.2, 0.4)),
                            forecast_id=gid, classname=cls, attr=""))
                        gid += 1
            # one false positive per class per sample
            ang = rng.uniform(-np.pi, np.pi)
            start = [0.8 * rmax * np.cos(ang), 0.8 * rmax * np.sin(ang)]
            preds.append(dict(
                sample=sample, centers=traj(start, [2.0, 1.0]),
                size=np.array(size), yaw=0.3, vel=np.array([2.0, 1.0]),
                det_score=float(rng.uniform(0.2, 0.6)),
                forecast_score=float(rng.uniform(0.1, 0.5)),
                forecast_id=gid, classname=cls, attr=""))
            gid += 1
        # out-of-range records (must be filtered by the class-range filter)
        gts.append(dict(sample=sample, centers=traj([55.0, 10.0], [0, 0]),
                        size=np.array((1.9, 4.6, 1.7)), yaw=0.0,
                        vel=np.zeros(2), classname="car", cohort="static",
                        attr=""))
        preds.append(dict(sample=sample, centers=traj([56.0, 11.0], [0, 0]),
                          size=np.array((1.9, 4.6, 1.7)), yaw=0.0,
                          vel=np.zeros(2), det_score=0.9, forecast_score=0.9,
                          forecast_id=gid, classname="car", attr=""))
        gid += 1
    return preds, gts


def pack(records, keys):
    out = {}
    for k in keys:
        vals = [r[k] for r in records]
        if isinstance(vals[0], str):
            out[k] = np.asarray(vals, dtype="U32")
        else:
            out[k] = np.asarray(vals)
    return out


def main():
    import sys
    sys.path.insert(0, os.path.join(OUT, "..", ".."))
    from futuredet_tpu.eval.metrics import (GTRecord, PredRecord,
                                            evaluate_forecasts)

    preds_d, gts_d = build_scenario()
    preds = [PredRecord(**p) for p in preds_d]
    gts = [GTRecord(**g) for g in gts_d]

    settings = {
        "plain": dict(tp_pct=0.6, cohort_analysis=False, topk=1),
        "cohort": dict(tp_pct=0.6, cohort_analysis=True, topk=1),
        "cohort_top5": dict(tp_pct=0.6, cohort_analysis=True, topk=5),
        "static_only": dict(tp_pct=0.6, cohort_analysis=False, topk=1,
                            static_only=True),
        "oracle_top5": dict(tp_pct=0.6, cohort_analysis=False, topk=5,
                            association_oracle=True),
    }
    expected = {}
    for name, kw in settings.items():
        res = evaluate_forecasts(preds, gts, ["car", "pedestrian"],
                                 horizon_seconds=HORIZON, **kw)
        expected[name] = res.summary()

    np.savez_compressed(
        os.path.join(OUT, "metrics_golden.npz"),
        **{f"pred_{k}": v for k, v in pack(
            preds_d, ["sample", "centers", "size", "yaw", "vel", "det_score",
                      "forecast_score", "forecast_id", "classname",
                      "attr"]).items()},
        **{f"gt_{k}": v for k, v in pack(
            gts_d, ["sample", "centers", "size", "yaw", "vel", "classname",
                    "cohort", "attr"]).items()})
    with open(os.path.join(OUT, "metrics_golden.json"), "w") as f:
        json.dump(expected, f, indent=1, sort_keys=True)
    print(f"wrote {len(preds)} preds / {len(gts)} gts; settings: "
          f"{list(expected)}")
    print(json.dumps({k: expected['plain']['mean_dist_aps'][k]
                      for k in expected['plain']['mean_dist_aps']},
                     indent=1))


if __name__ == "__main__":
    main()
