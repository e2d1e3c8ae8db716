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


def make_fold_checkpoints(experiments_dir: Path, experiment: str) -> None:
    """One tiny (untrained, distinctly seeded) checkpoint per CV fold —
    enough for the predict CLI; no training needed."""
    from sensorium_tpu import constants
    from sensorium_tpu.engine.model import MouseModel

    config = tiny_experiment_config()
    for i, fold_split in enumerate(constants.folds_splits):
        model = MouseModel(config["argus_params"])
        model.build_state(seed=i, learning_rate=0.0)
        fold_dir = experiments_dir / experiment / fold_split
        fold_dir.mkdir(parents=True, exist_ok=True)
        model.save(fold_dir / "model-001-0.100000.ckpt")


def run_predict(env, extra_args):
    proc = subprocess.run(
        [sys.executable, "-m", "sensorium_tpu.cli.predict",
         "-e", "tiny_pred", "-s", "live_test_main", *extra_args],
        env=env, cwd=REPO_ROOT, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=1500,
    )
    return proc


def tree_bytes(root: Path) -> dict[str, bytes]:
    return {
        str(p.relative_to(root)): p.read_bytes()
        for p in sorted(root.rglob("*"))
        if p.is_file()
    }


@pytest.mark.baseline
@pytest.mark.slow
def test_multihost_two_process_predict_matches_single(tmp_path):
    """Fan-out inference (docs/SCALING.md "Inference at scale"): a
    two-process ``jax.distributed`` predict — each process takes its slice
    of every mouse's trial list, process 0 writes the submission after a
    cluster barrier — must produce byte-identical ``.npy`` predictions and
    submission parquet to the single-process run
    (reference flow being scaled: /root/reference/scripts/predict.py:38-50)."""
    data_dir = tmp_path / "data"
    (data_dir / "sensorium_all_2023").mkdir(parents=True)
    # 3 live_test_main trials per new mouse: with 2 processes the shards
    # are [0, 2] and [1] — both non-empty, unequal sizes.
    build_synthetic_dataset(data_dir / "sensorium_all_2023", test_trials=3)

    import sensorium_tpu.constants as constants_mod

    original = constants_mod.experiments_dir
    try:
        constants_mod.experiments_dir = data_dir / "experiments"
        make_fold_checkpoints(data_dir / "experiments", "tiny_pred")
    finally:
        constants_mod.experiments_dir = original

    env = dict(os.environ)
    env.update(
        PYTHONPATH=str(REPO_ROOT),
        SENSORIUM_DATA_DIR=str(data_dir),
        SENSORIUM_JAX_PLATFORM="cpu",
        SENSORIUM_CPU_DEVICES="4",
        SENSORIUM_NATIVE="0",
        SENSORIUM_JAX_CACHE="0",
    )

    single = run_predict(env, [])
    assert single.returncode == 0, f"single-process predict failed:\n{single.stdout}"
    single_tree = tree_bytes(data_dir / "predictions")
    assert any(p.endswith(".npy") for p in single_tree), single_tree.keys()
    assert any("parquet" in p for p in single_tree), single_tree.keys()
    import shutil

    shutil.rmtree(data_dir / "predictions")

    for attempt in range(3):
        port = free_port()
        procs = [
            subprocess.Popen(
                [sys.executable, "-m", "sensorium_tpu.cli.predict",
                 "-e", "tiny_pred", "-s", "live_test_main",
                 "--multihost", f"localhost:{port},2,{pid}"],
                env=env, cwd=REPO_ROOT, stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT, text=True,
            )
            for pid in (0, 1)
        ]
        outputs = [p.communicate(timeout=1500)[0] for p in procs]
        if not any("Failed to bind" in out or "address already in use" in out.lower()
                   for out in outputs):
            break
    for pid, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, f"process {pid} failed:\n{out}"
        assert "Multihost: process" in out

    multi_tree = tree_bytes(data_dir / "predictions")
    assert sorted(multi_tree) == sorted(single_tree), (
        sorted(multi_tree), sorted(single_tree),
    )
    mismatched = [p for p in single_tree if multi_tree[p] != single_tree[p]]
    assert not mismatched, f"artifacts differ across topologies: {mismatched}"
