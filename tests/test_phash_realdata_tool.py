"""Keep ``tools/validate_phash_realdata.py`` ready to run.

The real 148 GB competition dataset is absent in this environment, so the
real-data pHash validation (VERDICT r2 "What's missing #2") cannot execute
for real here.  These tests pin the tool's two contracts so it works the
day a dataset is mounted: (a) absent data -> SKIPPED, exit 0; (b) on a
dataset in the real on-disk layout it validates bit-identity vs the
vendored imagehash oracle and the ``get_folds_tiers`` labels, exit 0.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
TOOL = REPO_ROOT / "tools" / "validate_phash_realdata.py"
MOUSE = "dynamic29515-10-12-Video-9b4f6a1a067fe51e15306b9628efea20"


def run_tool(*argv: str, env_extra: dict | None = None):
    env = dict(os.environ, SENSORIUM_JAX_PLATFORM="cpu")
    env.pop("SENSORIUM_FOLD_ASSIGNMENT", None)
    env.update(env_extra or {})
    return subprocess.run(
        [sys.executable, str(TOOL), *argv],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO_ROOT,
        timeout=300,
    )


def test_skips_cleanly_when_dataset_absent(tmp_path):
    result = run_tool("--data-dir", str(tmp_path / "nope"))
    assert result.returncode == 0, result.stderr
    summary = json.loads(result.stdout.strip().splitlines()[-1])
    assert summary["status"] == "skipped"


def test_validates_a_real_layout_dataset(tmp_path):
    # Minimal real on-disk layout for one mouse: 3 labeled trials, one
    # duplicated stimulus video (trials 0 and 2) that must share a fold.
    rng = np.random.default_rng(7)
    mouse_dir = tmp_path / MOUSE
    (mouse_dir / "meta" / "trials").mkdir(parents=True)
    (mouse_dir / "data" / "videos").mkdir(parents=True)
    np.save(mouse_dir / "meta" / "trials" / "tiers.npy", np.array(["train", "train", "train", "none"]))
    dup = rng.uniform(0, 255, size=(36, 64, 40)).astype(np.float32)
    other = rng.uniform(0, 255, size=(36, 64, 40)).astype(np.float32)
    np.save(mouse_dir / "data" / "videos" / "0.npy", dup)
    np.save(mouse_dir / "data" / "videos" / "1.npy", other)
    np.save(mouse_dir / "data" / "videos" / "2.npy", dup.copy())

    result = run_tool("--data-dir", str(tmp_path), "--mice", MOUSE)
    assert result.returncode == 0, result.stdout + result.stderr
    summary = json.loads(result.stdout.strip().splitlines()[-1])
    assert summary["status"] == "ok"
    assert summary["trials"] == 3
    assert summary["oracle_mismatches"] == 0
    assert summary["fold_mismatches"] == 0
    # The duplicated video forms one group of size 2 — same hash, same fold.
    assert "2: 1" in result.stdout
