"""Multi-process `jax.distributed` execution of the multi-host runtime.

The reference's distributed path actually runs N processes (torchrun,
`train_am_vocoder_joint.py:203`); this test runs ours the same way: two
OS processes on localhost, each with 2 forced CPU devices, joined by
`jax.distributed.initialize` into one 4-device runtime. The worker
(tests/multihost_worker.py) executes initialize_multihost + shard_datalist
+ global_batch (`jax.make_array_from_process_local_data`,
parallel/multihost.py:85-90) + one jitted GAN train step; the test asserts
its metrics and updated params match the identical single-process run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "multihost_worker.py")
TIMEOUT_S = 900


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env() -> dict:
    """Worker env: no inherited JAX/XLA platform pins (the worker sets its
    own), no accidental TPU attachment for subprocesses."""
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH"):
        env.pop(k, None)
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _parse_metrics(stdout: str) -> dict:
    for line in stdout.splitlines():
        if line.startswith("METRICS "):
            return json.loads(line[len("METRICS "):])
    raise AssertionError(f"no METRICS line in worker output:\n{stdout}")


def _run_single() -> dict:
    proc = subprocess.run(
        [sys.executable, WORKER, "--num-processes", "1",
         "--local-devices", "4"],
        capture_output=True, text=True, timeout=TIMEOUT_S, env=_clean_env(),
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    return _parse_metrics(proc.stdout)


def _run_two_process() -> dict:
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, "--num-processes", "2",
             "--process-id", str(i), "--coordinator", coord,
             "--local-devices", "2"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=_clean_env(),
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=TIMEOUT_S)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, err[-4000:]
    return _parse_metrics(outs[0][1])


def test_two_process_train_step_matches_single_process():
    single = _run_single()
    multi = _run_two_process()
    assert set(single) == set(multi)
    for k in single:
        np.testing.assert_allclose(
            single[k], multi[k], rtol=2e-3, atol=2e-4, err_msg=k
        )
