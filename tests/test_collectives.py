"""Multi-host collectives: eval-batch gather encode/decode + a real
2-process jax.distributed CPU run.

Replaces the reference's pickle-padded `dist.all_gather` of detection dicts
(`det3d/torchie/trainer/utils.py:100-155`) with fixed-shape array gathers
(SURVEY.md §2.2).
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def test_token_roundtrip():
    from futuredet_tpu.parallel.collectives import (decode_tokens,
                                                    encode_tokens)
    toks = ["", "abc", "x" * 64, "f" * 99, "0123456789abcdef" * 2]
    enc = encode_tokens(toks)
    assert enc.shape == (5, 64) and enc.dtype == np.uint8
    dec = decode_tokens(enc)
    assert dec == ["", "abc", "x" * 64, "f" * 64, "0123456789abcdef" * 2]


def test_gather_eval_batch_identity_single_process():
    from futuredet_tpu.eval.decode import Detections
    from futuredet_tpu.parallel.collectives import gather_eval_batch

    rng = np.random.default_rng(0)
    B, N, T, M = 2, 16, 7, 4
    det = Detections(
        boxes=rng.normal(size=(B, N, 9)).astype(np.float32),
        scores=rng.random((B, N)).astype(np.float32),
        labels=rng.integers(0, T, (B, N)).astype(np.int32),
        valid=rng.random((B, N)) < 0.5)
    gt = {"boxes": rng.normal(size=(B, T, M, 12)).astype(np.float32),
          "valid": rng.random((B, T, M)) < 0.7,
          "classes": np.ones((B, T, M), np.int32),
          "traj": rng.integers(1, 4, (B, M)).astype(np.int32),
          "attr": [np.array(["", "vehicle.moving", "vehicle.parked",
                             "pedestrian.moving"], object)] * B,
          "times": [np.arange(1, T + 1, dtype=np.float32) * 0.5, None]}
    tokens = ["sample_a", "sample_b"]

    gdet, ggt, gtok = gather_eval_batch(det, gt, tokens)
    assert gtok == tokens
    np.testing.assert_array_equal(gdet.boxes, det.boxes)
    np.testing.assert_array_equal(gdet.valid, det.valid)
    np.testing.assert_array_equal(ggt["boxes"], gt["boxes"])
    np.testing.assert_array_equal(ggt["valid"], gt["valid"])
    np.testing.assert_array_equal(ggt["traj"], gt["traj"])
    assert list(ggt["attr"][0]) == list(gt["attr"][0])
    np.testing.assert_allclose(ggt["times"][0], gt["times"][0])
    # None times nan-pad to empty on decode
    assert len(ggt["times"][1]) == 0


def test_gather_eval_batch_no_attr_no_times():
    from futuredet_tpu.parallel.collectives import gather_eval_batch
    B, T, M = 1, 2, 3
    gt = {"boxes": np.zeros((B, T, M, 12), np.float32),
          "valid": np.ones((B, T, M), bool),
          "classes": np.ones((B, T, M), np.int32),
          "traj": None, "attr": None, "times": None}
    det = {"x": np.arange(4.0)}
    gdet, ggt, gtok = gather_eval_batch(det, gt, ["t0"])
    assert "traj" not in ggt and "attr" not in ggt and "times" not in ggt
    np.testing.assert_array_equal(gdet["x"], det["x"])


_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
import numpy as np
from futuredet_tpu.parallel.collectives import gather_eval_batch
B = 1
det = {"scores": np.full((B, 4), float(pid), np.float32)}
gt = {"boxes": np.full((B, 2, 3, 12), float(pid), np.float32),
      "valid": np.ones((B, 2, 3), bool),
      "classes": np.ones((B, 2, 3), np.int32),
      "traj": np.ones((B, 3), np.int32),
      "attr": [np.array(["vehicle.moving"] * 3, object)] * B,
      "times": [np.array([0.5], np.float32)] * B}
gdet, ggt, gtok = gather_eval_batch(det, gt, [f"proc{pid}"])
assert gtok == ["proc0", "proc1"], gtok
np.testing.assert_allclose(gdet["scores"][:, 0], [0.0, 1.0])
np.testing.assert_allclose(ggt["boxes"][:, 0, 0, 0], [0.0, 1.0])
assert ggt["attr"][1][0] == "vehicle.moving"
print("gather2proc ok", pid)
"""


_TRAIN_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
try:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
except Exception:
    pass
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
jax.distributed.initialize(coordinator_address="127.0.0.1:" + port,
                           num_processes=nproc, process_id=pid)
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from futuredet_tpu.config import get_config, tiny_variant
from futuredet_tpu.data.synthetic import make_batch
from futuredet_tpu.parallel.mesh import make_mesh
from futuredet_tpu.train.step import init_state, make_train_step

cfg = tiny_variant(get_config("pp_forecast_n0"))
batch = make_batch(cfg, 2, seed=0, device_targets=True)
batch.pop("gt", None)
mesh = make_mesh(2)
state = init_state(cfg, jax.random.PRNGKey(0),
                   jax.tree.map(lambda x: np.asarray(x)[:1], batch),
                   total_steps=4)
step = make_train_step(cfg, mesh, 4)
dsh = NamedSharding(mesh, P("data"))
rsh = NamedSharding(mesh, P())
gbatch = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(
        dsh, np.asarray(x)[pid:pid + 1]), batch)
gstate = jax.tree.map(
    lambda x: jax.make_array_from_process_local_data(rsh, np.asarray(x)),
    state)
_, metrics = step(gstate, gbatch)
vals = {k: float(np.asarray(jax.device_get(v))) for k, v in metrics.items()}
print("train2proc", pid, " ".join(f"{k}={vals[k]:.6f}"
                                  for k in sorted(vals)))
"""


@pytest.mark.slow
def test_two_process_cpu_train_step():
    """Real 2-process jax.distributed dp TRAIN step: grads/losses pmean'd
    over gloo must match the single-process 2-device shard_map result
    (ref DDP / manual coalesced allreduce, det3d/core/utils/dist_utils.py:
    8-57). VERDICT r3 #7."""
    # single-process 2-device reference (conftest provides 8 CPU devices)
    import jax
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from futuredet_tpu.config import get_config, tiny_variant
    from futuredet_tpu.data.synthetic import make_batch
    from futuredet_tpu.parallel.mesh import make_mesh
    from futuredet_tpu.train.step import init_state, make_train_step

    cfg = tiny_variant(get_config("pp_forecast_n0"))
    batch = make_batch(cfg, 2, seed=0, device_targets=True)
    batch.pop("gt", None)
    mesh = make_mesh(2)
    state = init_state(cfg, jax.random.PRNGKey(0),
                       jax.tree.map(lambda x: np.asarray(x)[:1], batch),
                       total_steps=4)
    step = make_train_step(cfg, mesh, 4)
    _, ref_metrics = step(state, batch)
    ref = {k: float(np.asarray(jax.device_get(v)))
           for k, v in ref_metrics.items()}

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_CPU_COLLECTIVES_IMPLEMENTATION="gloo")
    env.pop("XLA_FLAGS", None)  # single local device per process
    procs = [subprocess.Popen(
        [sys.executable, "-c", _TRAIN_WORKER, str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("2-process jax.distributed timed out on this host")
    if any(p.returncode != 0 for p in procs):
        joined = "\n".join(outs)
        if "gloo" in joined.lower() or "collectives" in joined.lower() \
                or "UNIMPLEMENTED" in joined:
            pytest.skip("CPU cross-process collectives unavailable: "
                        + joined[-500:])
        raise AssertionError(joined)
    for o in outs:
        line = [ln for ln in o.splitlines() if ln.startswith("train2proc")]
        assert line, o
        got = dict(kv.split("=") for kv in line[0].split()[2:])
        for k, want in ref.items():
            assert abs(float(got[k]) - want) <= 1e-4 + 1e-3 * abs(want), (
                k, got[k], want)


@pytest.mark.slow
def test_two_process_cpu_gather():
    """Real 2-process jax.distributed bring-up over localhost + cross-host
    eval gather (ref: the NCCL env:// init at tools/train.py:90)."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               JAX_CPU_COLLECTIVES_IMPLEMENTATION="gloo")
    env.pop("XLA_FLAGS", None)  # single local device per process
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env) for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=120)
            outs.append(out.decode())
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("2-process jax.distributed timed out on this host")
    if any(p.returncode != 0 for p in procs):
        joined = "\n".join(outs)
        if "gloo" in joined.lower() or "collectives" in joined.lower() \
                or "UNIMPLEMENTED" in joined:
            pytest.skip("CPU cross-process collectives unavailable: "
                        + joined[-500:])
        raise AssertionError(joined)
    assert all("gather2proc ok" in o for o in outs)
