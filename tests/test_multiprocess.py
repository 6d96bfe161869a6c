"""Cross-PROCESS mesh correctness (VERDICT r3 item 7).

All other multi-device evidence in this repo is single-process (one
interpreter owning 8 virtual CPU devices). A real v5e pod slice adds a second
failure surface: several OS processes, each owning only its local chips,
wired into one global mesh by ``jax.distributed`` — collectives (the psum
behind metric/gradient reduction) must cross the process boundary, and each
process feeds only its local shard (``make_array_from_process_local_data``).

This launches ``tests/distributed_worker.py`` as 2 separate processes with 4
virtual CPU devices each, runs the REAL train step + sharded eval step over
the 2x4 global mesh, and asserts (a) both processes agree on every replicated
result and (b) those results match a single-process run over the identical
global batch and mesh size.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env() -> dict:
    env = dict(os.environ)
    # the worker picks its OWN local device count; the parent harness's
    # 8-device XLA_FLAGS split and platform pin must not leak in
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _launch(num_processes: int, local_devices: int, timeout: int = 600):
    coord = f"127.0.0.1:{_free_port()}"
    env = _child_env()
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--coordinator", coord,
             "--num-processes", str(num_processes),
             "--process-id", str(pid),
             "--local-devices", str(local_devices)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for pid in range(num_processes)
    ]
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker rc={p.returncode}\n{stderr[-3000:]}"
        line = [l for l in stdout.strip().splitlines() if l.startswith("{")]
        assert line, f"no JSON from worker: {stdout!r}\n{stderr[-2000:]}"
        outs.append(json.loads(line[-1]))
    return outs


def test_two_process_mesh_matches_single_process():
    two = _launch(num_processes=2, local_devices=4)
    assert [o["process_id"] for o in sorted(two, key=lambda o: o["process_id"])] == [0, 1]
    # replicated outputs must be IDENTICAL across processes: the loss and the
    # globally psum'd confusion stats each process fetched locally
    assert two[0]["n_global_devices"] == 8
    assert two[0]["loss"] == pytest.approx(two[1]["loss"], rel=0, abs=0)
    assert two[0]["lin_stats_sum"] == two[1]["lin_stats_sum"]
    assert two[0]["lin_stats_sha"] == two[1]["lin_stats_sha"]
    assert all(o["clu_finite"] for o in two)
    # the confusion matrix counts every valid labelled pixel exactly once
    assert two[0]["lin_stats_sum"] == two[0]["valid_labels"]

    # same global batch + mesh size in ONE process: cross-process collectives
    # must be a pure topology change, not a numerics change
    (single,) = _launch(num_processes=1, local_devices=8)
    assert single["n_global_devices"] == 8
    assert single["lin_stats_sum"] == two[0]["lin_stats_sum"]
    assert single["lin_stats_sha"] == two[0]["lin_stats_sha"]
    assert single["loss"] == pytest.approx(two[0]["loss"], rel=2e-5)
