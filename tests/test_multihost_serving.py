"""Multi-process `jax.distributed` SERVING smoke (VERDICT r4 ask #5).

docs/MULTIHOST.md's serving story is "one server per host behind a load
balancer — each host holds a full replica; requests never cross hosts".
This test executes that story for real with the actual CLI: two OS
processes on localhost each run `tools/serve.py --multihost`, joined by
`jax.distributed.initialize` (COORDINATOR_ADDRESS env) into one runtime,
each answering `POST /v1/audio/speech` over HTTP on its own port. The
responses are byte-compared to an identical single-process server.

Counterpart evidence to tests/test_multihost.py (training path);
BASELINE.json configs[4] "pod-slice serving at N>=2 hosts".
"""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import pytest

SERVE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools", "serve.py",
)
TIMEOUT_S = 900

REQUEST = {
    "input": "hello world",
    "voice": "0",
    "prompt": "happy",
    "response_format": "wav",
    "speed": 1.0,
}


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env(extra=None) -> dict:
    env = dict(os.environ)
    for k in ("JAX_PLATFORMS", "XLA_FLAGS", "PYTHONPATH",
              "COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        env.pop(k, None)
    if extra:
        env.update(extra)
    return env


def _serve_cmd(port: int, multihost: bool) -> list:
    cmd = [
        sys.executable, SERVE,
        "--smoke-tiny", "--platform", "cpu",
        "--host", "127.0.0.1", "--port", str(port),
        "--no-warmup", "--no-background-warmup", "--no-batching",
    ]
    if multihost:
        cmd.append("--multihost")
    return cmd


def _post_speech(port: int, timeout: float = 600.0) -> bytes:
    # generous timeout: the first request on a fresh bucket pays a cold XLA
    # CPU compile, which on a loaded 2-core host can take minutes
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/audio/speech",
        data=json.dumps(REQUEST).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        assert resp.status == 200
        return resp.read()


def _wait_ready(port: int, proc: subprocess.Popen, deadline: float):
    """Wait until the TCP port accepts connections."""
    while time.time() < deadline:
        if proc.poll() is not None:
            raise AssertionError(
                f"server on port {port} exited rc={proc.returncode}"
            )
        try:
            with socket.create_connection(("127.0.0.1", port), timeout=1):
                return
        except OSError:
            time.sleep(0.5)
    raise AssertionError(f"server on port {port} never became ready")


def _kill(procs):
    for p in procs:
        if p.poll() is None:
            p.kill()
    for p in procs:
        try:
            p.wait(timeout=30)
        except subprocess.TimeoutExpired:
            pass


def test_two_process_multihost_serving_matches_single_process(tmp_path):
    deadline = time.time() + TIMEOUT_S

    # --- single-process reference server -------------------------------
    p0 = _free_port()
    single = subprocess.Popen(
        _serve_cmd(p0, multihost=False),
        stdout=open(tmp_path / "single.log", "w"),
        stderr=subprocess.STDOUT, env=_clean_env(),
    )
    try:
        _wait_ready(p0, single, deadline)
        want = _post_speech(p0)
    finally:
        _kill([single])
    assert want[:4] == b"RIFF" and len(want) > 1000

    # --- two multihost server processes --------------------------------
    coord = f"127.0.0.1:{_free_port()}"
    ports = [_free_port(), _free_port()]
    procs = []
    logs = []
    try:
        for i, port in enumerate(ports):
            log = open(tmp_path / f"mh{i}.log", "w")
            logs.append(tmp_path / f"mh{i}.log")
            procs.append(subprocess.Popen(
                _serve_cmd(port, multihost=True),
                stdout=log, stderr=subprocess.STDOUT,
                env=_clean_env({
                    "COORDINATOR_ADDRESS": coord,
                    "NUM_PROCESSES": "2",
                    "PROCESS_ID": str(i),
                }),
            ))
        for port, proc in zip(ports, procs):
            _wait_ready(port, proc, deadline)
        # both hosts answer the identical request with identical bytes —
        # full replicas, no cross-host traffic
        got = [_post_speech(port) for port in ports]
    finally:
        _kill(procs)

    for i, g in enumerate(got):
        assert g == want, (
            f"multihost server {i} response differs from single-process "
            f"({len(g)} vs {len(want)} bytes); logs: {logs}"
        )
