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


def make_mouse(tmp_path, *, with_test_tier: bool = False) -> None:
    # Minimal real on-disk layout for one (new) mouse: 3 labeled trials,
    # one duplicated stimulus video (trials 0 and 2) that must share a
    # fold; optionally a 4th live_test trial (labeled but NOT foldable for
    # new mice, /root/reference/src/data.py:20-30).
    rng = np.random.default_rng(7)
    mouse_dir = tmp_path / MOUSE
    (mouse_dir / "meta" / "trials").mkdir(parents=True)
    (mouse_dir / "data" / "videos").mkdir(parents=True)
    tiers = ["train", "train", "train", "none"]
    if with_test_tier:
        tiers.append("live_test_main")
    np.save(mouse_dir / "meta" / "trials" / "tiers.npy", np.array(tiers))
    dup = rng.uniform(0, 255, size=(36, 64, 40)).astype(np.float32)
    other = rng.uniform(0, 255, size=(36, 64, 40)).astype(np.float32)
    np.save(mouse_dir / "data" / "videos" / "0.npy", dup)
    np.save(mouse_dir / "data" / "videos" / "1.npy", other)
    np.save(mouse_dir / "data" / "videos" / "2.npy", dup.copy())
    if with_test_tier:
        test_video = rng.uniform(0, 255, size=(36, 64, 40)).astype(np.float32)
        np.save(mouse_dir / "data" / "videos" / "4.npy", test_video)


def test_validates_a_real_layout_dataset(tmp_path):
    make_mouse(tmp_path)
    result = run_tool("--data-dir", str(tmp_path), "--mice", MOUSE)
    assert result.returncode == 0, result.stdout + result.stderr
    summary = json.loads(result.stdout.strip().splitlines()[-1])
    assert summary["status"] == "ok"
    assert summary["trials"] == 3
    assert summary["oracle_mismatches"] == 0
    assert summary["fold_mismatches"] == 0
    # The duplicated video forms one group of size 2 — same hash, same fold.
    assert "2: 1" in result.stdout


def test_partial_dataset_validates_present_subset(tmp_path):
    # Default mouse list with only one mouse on disk: the present mouse is
    # validated (not silently SKIPPED) and the absent ones are reported.
    make_mouse(tmp_path)
    result = run_tool("--data-dir", str(tmp_path))
    assert result.returncode == 0, result.stdout + result.stderr
    summary = json.loads(result.stdout.strip().splitlines()[-1])
    assert summary["status"] == "ok"
    assert summary["mice_checked"] == 1
    assert len(summary["mice_missing"]) == 9
    assert summary["trials"] == 3
    assert "WARNING" in result.stdout


def test_explicit_missing_mouse_is_an_error(tmp_path):
    # A typo'd --mice id must not read as a pass (or a skip).
    make_mouse(tmp_path)
    result = run_tool("--data-dir", str(tmp_path), "--mice", MOUSE, "typo-mouse")
    assert result.returncode == 2, result.stdout + result.stderr
    summary = json.loads(result.stdout.strip().splitlines()[-1])
    assert summary["status"] == "bad_mice"


def test_unfolded_test_tier_is_hashed_but_not_fold_checked(tmp_path):
    # New-mouse live_test trials are labeled (hashed, oracle-checked) but
    # carry no fold; they must not enter the fold histogram nor count as a
    # fold mismatch.
    make_mouse(tmp_path, with_test_tier=True)
    result = run_tool("--data-dir", str(tmp_path), "--mice", MOUSE)
    assert result.returncode == 0, result.stdout + result.stderr
    summary = json.loads(result.stdout.strip().splitlines()[-1])
    assert summary["status"] == "ok"
    assert summary["trials"] == 4  # oracle leg covers the test trial ...
    assert sum(summary["fold_hist"].values()) == 3  # ... the fold checks don't


def test_spot_check_mode_and_flag_validation(tmp_path):
    make_mouse(tmp_path)
    result = run_tool("--data-dir", str(tmp_path), "--mice", MOUSE, "--max-trials", "2")
    assert result.returncode == 0, result.stdout + result.stderr
    summary = json.loads(result.stdout.strip().splitlines()[-1])
    assert summary["status"] == "ok"
    assert summary["mode"] == "spot"
    assert summary["trials"] == 2

    bad = run_tool("--skip-oracle", "--max-trials", "2")
    assert bad.returncode == 2
