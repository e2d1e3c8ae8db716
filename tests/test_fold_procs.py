"""End-to-end test of parallel fold training (``cli.train --fold-procs``).

Drives the real CLI as subprocesses against a synthetic on-disk dataset:
the parent orchestrates two concurrent single-fold children (the
capability the reference lacks — it trains its 7 folds sequentially,
``/root/reference/scripts/train.py:178-189``), and each child must leave
behind the same artifacts sequential training produces: a best-checkpoint
``model-*.ckpt``, ``log.txt`` / ``log.csv``, and a ``train_proc.log``.

Children run on the CPU backend (``SENSORIUM_JAX_PLATFORM=cpu``) with
trial-index fold assignment (``SENSORIUM_FOLD_ASSIGNMENT=trial``) so the
synthetic videos spread over all folds deterministically.
"""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

import pytest

from tests.synthetic import build_synthetic_dataset, tiny_experiment_config

REPO_ROOT = Path(__file__).resolve().parent.parent


def write_config_file(configs_dir: Path, name: str) -> None:
    config = tiny_experiment_config()
    config["num_epochs"] = [1, 1]
    config["train_epoch_size"] = 20
    configs_dir.mkdir(parents=True, exist_ok=True)
    (configs_dir / f"{name}.py").write_text(f"config = {config!r}\n")


@pytest.mark.baseline
@pytest.mark.slow
def test_train_cli_debug_nans_and_trace(tmp_path):
    """Sequential CLI run with the sanitizer + profiler flags wired."""
    data_dir = tmp_path / "data"
    (data_dir / "sensorium_all_2023").mkdir(parents=True)
    build_synthetic_dataset(data_dir / "sensorium_all_2023")
    configs_dir = tmp_path / "configs"
    write_config_file(configs_dir, "tiny_dbg")
    trace_dir = tmp_path / "trace"

    env = dict(os.environ)
    env.update(
        PYTHONPATH=str(REPO_ROOT),
        SENSORIUM_DATA_DIR=str(data_dir),
        SENSORIUM_CONFIGS_DIR=str(configs_dir),
        SENSORIUM_FOLD_ASSIGNMENT="trial",
        SENSORIUM_JAX_PLATFORM="cpu",
        SENSORIUM_NATIVE="0",
        SENSORIUM_JAX_CACHE="0",
    )
    proc = subprocess.run(
        [
            sys.executable, "-m", "sensorium_tpu.cli.train",
            "-e", "tiny_dbg", "-f", "3", "--no-mesh", "--seed", "0",
            "--debug-nans", "--trace", str(trace_dir),
        ],
        env=env,
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    fold_dir = data_dir / "experiments" / "tiny_dbg" / "fold_3"
    assert list(fold_dir.glob("model-*.ckpt"))
    assert any(trace_dir.rglob("*"))  # profiler wrote trace artifacts


@pytest.mark.baseline
@pytest.mark.slow
def test_fold_procs_parallel_training(tmp_path):
    data_dir = tmp_path / "data"
    (data_dir / "sensorium_all_2023").mkdir(parents=True)
    build_synthetic_dataset(data_dir / "sensorium_all_2023")
    configs_dir = tmp_path / "configs"
    write_config_file(configs_dir, "tiny_fp")

    env = dict(os.environ)
    env.update(
        PYTHONPATH=str(REPO_ROOT),
        SENSORIUM_DATA_DIR=str(data_dir),
        SENSORIUM_CONFIGS_DIR=str(configs_dir),
        SENSORIUM_FOLD_ASSIGNMENT="trial",
        SENSORIUM_JAX_PLATFORM="cpu",
        SENSORIUM_NATIVE="0",
        SENSORIUM_JAX_CACHE="0",
    )
    proc = subprocess.run(
        [
            sys.executable, "-m", "sensorium_tpu.cli.train",
            "-e", "tiny_fp", "-f", "1,2", "--fold-procs", "2", "--seed", "0",
        ],
        env=env,
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "[fold-procs] started fold_1" in proc.stdout
    assert "[fold-procs] started fold_2" in proc.stdout

    experiment_dir = data_dir / "experiments" / "tiny_fp"
    for fold in ("fold_1", "fold_2"):
        fold_dir = experiment_dir / fold
        checkpoints = list(fold_dir.glob("model-*.ckpt"))
        proc_log = fold_dir / "train_proc.log"
        assert checkpoints, (
            f"no checkpoint in {fold_dir}; train_proc.log:\n"
            + (proc_log.read_text() if proc_log.exists() else "<missing>")
        )
        assert (fold_dir / "log.txt").exists()
        assert (fold_dir / "log.csv").exists()
        assert proc_log.exists()


def test_chip_pinning_env():
    from sensorium_tpu.cli.train import chip_pinning_env

    env = chip_pinning_env(3)
    assert env["TPU_VISIBLE_DEVICES"] == "3"
    assert env["TPU_VISIBLE_CHIPS"] == "3"
    assert env["TPU_PROCESS_BOUNDS"] == "1,1,1"
    assert env["TPU_CHIPS_PER_PROCESS_BOUNDS"] == "1,1,1"
    assert env["TPU_CHIPS_PER_HOST_BOUNDS"] == "1,1,1"
    # Older libtpu generations need an explicit single-process address
    # table; ports are slot-distinct so concurrent children never collide.
    assert env["TPU_PROCESS_ADDRESSES"] == "localhost:8479"
    assert env["TPU_PROCESS_PORT"] == "8479"
    assert env["CLOUD_TPU_TASK_ID"] == "0"
    assert chip_pinning_env(0)["TPU_PROCESS_PORT"] != env["TPU_PROCESS_PORT"]


@pytest.mark.baseline
@pytest.mark.slow
def test_fold_procs_sigterm_preemption(tmp_path):
    """SIGTERM to the orchestrating parent forwards to the fold children
    (each saves resume state) and exits 75 (EX_TEMPFAIL)."""
    import signal
    import time

    data_dir = tmp_path / "data"
    (data_dir / "sensorium_all_2023").mkdir(parents=True)
    build_synthetic_dataset(data_dir / "sensorium_all_2023")
    configs_dir = tmp_path / "configs"
    # Long-enough run that the signal lands mid-training.
    config = tiny_experiment_config()
    config["num_epochs"] = [2, 20]
    config["train_epoch_size"] = 40
    configs_dir.mkdir(parents=True, exist_ok=True)
    (configs_dir / "tiny_pe.py").write_text(f"config = {config!r}\n")

    env = dict(os.environ)
    env.update(
        PYTHONPATH=str(REPO_ROOT),
        SENSORIUM_DATA_DIR=str(data_dir),
        SENSORIUM_CONFIGS_DIR=str(configs_dir),
        SENSORIUM_FOLD_ASSIGNMENT="trial",
        SENSORIUM_JAX_PLATFORM="cpu",
        SENSORIUM_NATIVE="0",
        SENSORIUM_JAX_CACHE="0",
    )
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "sensorium_tpu.cli.train",
            "-e", "tiny_pe", "-f", "1,2", "--fold-procs", "2", "--seed", "0",
        ],
        env=env,
        cwd=REPO_ROOT,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    # Wait until the child fold has completed an epoch (its logging file
    # handler flushes per record — the stdout tee is block-buffered), then
    # preempt the parent.
    deadline = time.monotonic() + 300
    fold_log = data_dir / "experiments" / "tiny_pe" / "fold_1" / "log.txt"
    while time.monotonic() < deadline:
        if fold_log.exists() and "epoch" in fold_log.read_text():
            break
        if proc.poll() is not None:
            break
        time.sleep(0.5)
    assert proc.poll() is None, f"orchestrator exited early:\n{proc.communicate()[0]}"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=180)

    assert proc.returncode == 75, f"rc={proc.returncode}\n{out}"
    assert "caught signal" in out
    # The child saved its resume state on the forwarded SIGTERM.
    assert (data_dir / "experiments" / "tiny_pe" / "fold_1" / "train_state.ckpt").exists(), out


def test_resolve_fold_procs(monkeypatch):
    from sensorium_tpu.cli.train import resolve_fold_procs

    assert resolve_fold_procs(3) == 3
    assert resolve_fold_procs("5") == 5
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert resolve_fold_procs("auto") >= 1  # probe subprocess
