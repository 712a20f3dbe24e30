"""Two-process multi-host test: a subprocess pair on localhost joins via
jax.distributed.initialize (gloo CPU collectives), forms the (dp=2,
tp=2) pod mesh over 4 global devices, and runs dp-sharded tensor-
parallel decode steps whose logits checksum must match a single-process
run of the same model — the DCN data path exercised without a cluster
(SURVEY.md §4's "fake backends" answer at the process level)."""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _clean_env():
    env = dict(os.environ)
    # the conftest's single-process test settings must not leak into the
    # subprocesses (the worker configures platform/devices itself)
    for k in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_NUM_CPU_DEVICES"):
        env.pop(k, None)
    return env


def _run(args, timeout=600):
    return subprocess.run([sys.executable, WORKER, *args],
                          capture_output=True, text=True, timeout=timeout,
                          env=_clean_env(), cwd=REPO)


def _checksum(out: str) -> float:
    m = re.search(r"CHECKSUM (-?[\d.]+)", out)
    assert m, out
    return float(m.group(1))


@pytest.mark.slow
def test_two_process_dp_decode_matches_single():
    port = _free_port()
    common = ["--nprocs", "2", "--port", str(port), "--cpu-devices", "2",
              "--steps", "4", "--batch", "4"]
    procs = [subprocess.Popen(
        [sys.executable, WORKER, "--role", "worker", "--pid", str(i),
         *common], stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=_clean_env(), cwd=REPO) for i in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    single = _run(["--role", "single", "--steps", "4", "--batch", "4"])
    assert single.returncode == 0, single.stderr[-2000:]
    want = _checksum(single.stdout)

    for rc, out, err in outs:
        assert rc == 0, err[-2000:]
        assert "MULTIHOST OK" in out
        got = _checksum(out)
        # bf16 activations + psum/readuce ordering across the process
        # boundary: loose tolerance on a ~1e3-magnitude sum
        assert abs(got - want) <= max(0.05 * abs(want), 2.0), (got, want)
    # both processes computed the SAME replicated checksum
    assert _checksum(outs[0][1]) == pytest.approx(
        _checksum(outs[1][1]), abs=1e-3)
