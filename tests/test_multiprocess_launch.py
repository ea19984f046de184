"""Multi-process distributed launch test (SURVEY.md L5).

Spawns 2 OS processes, each with 4 virtual CPU devices, that rendezvous
through `initialize_multihost` (jax.distributed coordinator) and run
data-parallel EFTS train steps over the resulting 8-device global mesh —
the TPU-native counterpart of the reference's working multi-process path
(`/root/reference/nntts/distributed/launch.py:69-124` spawning
`nntts-train --local_rank=r` + NCCL `init_process_group`,
`nntts/bin/train.py:53-68`). Asserts both processes observe the identical
(replicated) loss and that only process 0 writes the checkpoint.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_launch_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_dp_training(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    outdir = str(tmp_path / "ckpt")

    env = dict(os.environ)
    # NEVER set PYTHONPATH here (it breaks the machine's TPU-relay
    # sitecustomize); the worker sys.path-inserts the repo root itself.
    env.pop("PYTHONPATH", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    # don't let the parent test session's TPU/axon tunnel leak in
    env.pop("JAX_PLATFORM_NAME", None)

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(pid), outdir],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "DONE" in out, f"proc {pid} did not finish:\n{out}"

    # identical replicated loss on both processes, both steps
    losses = []
    for out in outs:
        vals = {}
        for line in out.splitlines():
            if line.startswith("LOSS "):
                _, i, v = line.split()
                vals[int(i)] = float(v)
        assert set(vals) == {0, 1}, out
        losses.append(vals)
    for i in range(2):
        assert np.isfinite(losses[0][i])
        assert losses[0][i] == losses[1][i], (i, losses)
    # training moved the loss
    assert losses[0][1] != losses[0][0]

    # process 0 (and only process 0) saved a checkpoint
    ckpt_lines = [
        line for out in outs for line in out.splitlines() if line.startswith("CKPT ")
    ]
    assert len(ckpt_lines) == 1, ckpt_lines
    path = ckpt_lines[0].split(" ", 1)[1]
    assert os.path.isdir(path), path


SERVE_WORKER = os.path.join(REPO, "tests", "_mp_serve_worker.py")


def test_two_process_dp_serving():
    """Serving x distributed: `TTSEngine(mesh=...)` over a 2-process
    8-device global mesh produces waveforms identical to the
    single-process engine (round-2 VERDICT item 9). Outputs are
    globally sharded, so the engine's host fetch goes through
    `pipeline._to_host` -> `process_allgather`."""
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # never set (TPU-relay sitecustomize)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORM_NAME", None)

    procs = [
        subprocess.Popen(
            [sys.executable, SERVE_WORKER, coordinator, "2", str(pid)],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "SERVE_OK" in out, f"proc {pid} did not finish:\n{out}"
    # both processes observed identical waveform lengths
    lens = [
        line.split("lens=")[1]
        for out in outs
        for line in out.splitlines()
        if "SERVE_OK" in line
    ]
    assert len(lens) == 2 and lens[0] == lens[1], lens
