"""End-to-end multi-host data-parallel training (``cli.train --multihost``).

Forms a real two-process ``jax.distributed`` cluster (4 virtual CPU devices
per process -> a global 8-device data mesh with Gloo collectives between
the processes) and trains one CV fold of the tiny config on the synthetic
dataset.  Every global batch is sharded across both processes, so the
gradient all-reduce and sync-BN moments genuinely cross the process
boundary.  Process 0 must own all file artifacts (checkpoint, logs,
config snapshot); process 1 must write none.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

from tests.synthetic import build_synthetic_dataset, tiny_experiment_config

REPO_ROOT = Path(__file__).resolve().parent.parent


def free_port() -> int:
    with socket.socket() as sock:
        sock.bind(("localhost", 0))
        return sock.getsockname()[1]


def run_cluster(env, port):
    """Launch the two train processes against a shared coordinator port."""
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "sensorium_tpu.cli.train",
                "-e", "tiny_mh", "-f", "2", "--seed", "0",
                "--multihost", f"localhost:{port},2,{pid}",
            ],
            env=env,
            cwd=REPO_ROOT,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    return procs, [p.communicate(timeout=1500)[0] for p in procs]


@pytest.mark.baseline
@pytest.mark.slow
def test_multihost_two_process_training(tmp_path):
    data_dir = tmp_path / "data"
    (data_dir / "sensorium_all_2023").mkdir(parents=True)
    build_synthetic_dataset(data_dir / "sensorium_all_2023")

    config = tiny_experiment_config()
    config["num_epochs"] = [1, 1]
    config["train_epoch_size"] = 20
    configs_dir = tmp_path / "configs"
    configs_dir.mkdir(parents=True)
    (configs_dir / "tiny_mh.py").write_text(f"config = {config!r}\n")

    env = dict(os.environ)
    env.update(
        PYTHONPATH=str(REPO_ROOT),
        SENSORIUM_DATA_DIR=str(data_dir),
        SENSORIUM_CONFIGS_DIR=str(configs_dir),
        SENSORIUM_FOLD_ASSIGNMENT="trial",
        SENSORIUM_JAX_PLATFORM="cpu",
        SENSORIUM_CPU_DEVICES="4",
        SENSORIUM_NATIVE="0",
        SENSORIUM_JAX_CACHE="0",
    )
    # The coordinator port is picked-then-released, so another process can
    # steal it in the window; retry with a fresh port on bind failure.
    for attempt in range(3):
        procs, outputs = run_cluster(env, free_port())
        if not any("Failed to bind" in out or "address already in use" in out.lower()
                   for out in outputs):
            break
    for pid, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, f"process {pid} failed:\n{out}"
        assert "Multihost: process" in out
        assert "8 global devices" in out

    fold_dir = data_dir / "experiments" / "tiny_mh" / "fold_2"
    assert list(fold_dir.glob("model-*.ckpt")), "process 0 wrote no checkpoint"
    assert (fold_dir / "log.txt").exists()
    assert (fold_dir / "log.csv").exists()
    # Both processes report the same validation metric (replicated state).
    val_lines = [
        [line for line in out.splitlines() if "val_corr" in line] for out in outputs
    ]
    assert val_lines[0] and val_lines[1]
