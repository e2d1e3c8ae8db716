#!/usr/bin/env python
"""Validate pHash fold assignment against the REAL competition dataset.

The pHash implementation (``sensorium_tpu/data/phash.py``) is pinned
bit-identical to a vendored ``imagehash.phash`` v4.3.1 oracle on synthetic
natural-statistics frames (``tests/test_phash_golden.py``), but the actual
148 GB competition videos are not present in the build environment.  This
tool is the missing real-data leg, kept ready to run the day a dataset is
mountable (VERDICT r2 "What's missing #2"):

    SENSORIUM_DATA_DIR=/path/to/data python tools/validate_phash_realdata.py

Full mode (default) checks, for every mouse present on disk:

1. bit-identity of ``compute_video_phashes`` (our implementation: PIL
   Lanczos resize, scipy DCT-II, median threshold, MSB-first packing,
   5-frame XOR) against the same 5-frame XOR built on the vendored
   ``imagehash.phash`` oracle, per labeled trial (reference behavior:
   ``/root/reference/src/phash.py:19-26`` + ``src/data.py:24-28``);
2. ``get_folds_tiers`` labels == ``fold_{phash % num_folds}`` for every
   FOLDABLE trial — train/oracle tiers for new mice, every non-'none'
   tier for old mice, mirroring ``src/data.py:20-30`` — so a trial left
   unfolded counts as a mismatch rather than being skipped;
3. the fold histogram and duplicate-video group sizes over foldable
   trials (trials sharing a stimulus MUST share a fold — the property
   the whole construction exists for).

Our hashes are computed ONCE: ``get_folds_tiers`` and the tool share the
``compute_video_phashes`` per-(mouse, root) cache, so the only second
read of each video is the independent vendored-oracle leg (elided by
``--skip-oracle``).

``--max-trials N`` switches to a spot-check mode: bit-identity only, on
the first N labeled trials per mouse, without triggering the full-dataset
hash that the fold cross-check requires.

Mouse selection: an explicit ``--mice`` id that is absent on disk is an
error (exit 2) — a typo must not read as a pass.  With the default mouse
list, mice absent on disk are reported in ``mice_missing`` and the
present subset is validated; only a fully absent dataset is a SKIP.

Exit codes: 0 = validated (or dataset entirely absent -> SKIPPED, still 0
so CI can carry the tool unconditionally), 1 = any mismatch, 2 = bad
invocation.  Prints one JSON summary line last, matching the repo's
bench/driver convention.
"""

from __future__ import annotations

import argparse
import collections
import json
import sys
import time
from pathlib import Path

import numpy as np

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))


def parse_args(argv: list[str] | None = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument(
        "--data-dir",
        default=None,
        help="directory containing the <mouse>/{data,meta} dirs; default: "
        "constants.sensorium_dir (honors SENSORIUM_DATA_DIR)",
    )
    parser.add_argument("--mice", nargs="*", default=None, help="subset of mouse ids (default: all 10)")
    parser.add_argument("--num-folds", type=int, default=7)
    parser.add_argument(
        "--max-trials",
        type=int,
        default=0,
        help="spot-check mode: oracle bit-identity on the first N labeled trials "
        "per mouse only (0 = full validation incl. fold cross-check)",
    )
    parser.add_argument(
        "--skip-oracle",
        action="store_true",
        help="skip the per-trial vendored-imagehash recomputation (folds/groups checks only)",
    )
    args = parser.parse_args(argv)
    if args.skip_oracle and args.max_trials:
        parser.error("--skip-oracle leaves nothing for the --max-trials spot-check to verify")
    return args


def main() -> int:
    args = parse_args()

    from sensorium_tpu import constants
    from sensorium_tpu.data.mouse_data import compute_video_phashes, get_folds_tiers
    from sensorium_tpu.data.phash import video_phash
    from sensorium_tpu.utils import get_length_without_nan

    root = Path(args.data_dir).resolve() if args.data_dir else constants.sensorium_dir
    # --data-dir points at the directory that CONTAINS the mouse dirs
    # (any name, not necessarily .../sensorium_all_2023); get_folds_tiers
    # resolves paths through constants.sensorium_dir at call time.
    constants.sensorium_dir = root
    mice = args.mice or list(constants.mice)
    missing = [m for m in mice if not (root / m / "meta" / "trials" / "tiers.npy").exists()]
    if args.mice and missing:
        print(f"ERROR: requested mice not present under {root}: {', '.join(missing)}")
        print(json.dumps({"tool": "validate_phash_realdata", "status": "bad_mice", "root": str(root)}))
        return 2
    present = [m for m in mice if m not in missing]
    if not present:
        print(f"SKIPPED: dataset not present under {root} (missing: {', '.join(missing[:3])}...)")
        print(json.dumps({"tool": "validate_phash_realdata", "status": "skipped", "root": str(root)}))
        return 0
    if missing:
        print(f"WARNING: {len(missing)} mice absent, validating the {len(present)} present: missing={missing}")

    # The oracle lives next to its bit-identity tests; reuse it rather than
    # vendoring imagehash a second time.
    if not args.skip_oracle:
        from tests.test_phash_golden import vendored_frame_phash

    def oracle_video_phash(video: np.ndarray) -> int:
        # Reference loop: XOR of 5 evenly sampled frames
        # (/root/reference/src/phash.py:19-26), oracle per frame.
        length = get_length_without_nan(video[0, 0])
        step = length // 5
        oracle = 0
        for frame_index in range(step // 2, length, step)[:5]:
            oracle ^= vendored_frame_phash(video[..., frame_index])
        return oracle

    t0 = time.time()
    total = 0
    oracle_mismatches: list[tuple[str, int]] = []
    fold_mismatches: list[tuple[str, int]] = []
    fold_hist: collections.Counter = collections.Counter()
    group_sizes: collections.Counter = collections.Counter()
    for mouse in present:
        tiers = np.load(str(root / mouse / "meta" / "trials" / "tiers.npy"))
        labeled = [t for t, tier in enumerate(tiers) if tier != "none"]

        if args.max_trials:  # spot-check: bit-identity only, bounded I/O
            for trial_id in labeled[: args.max_trials]:
                video = np.asarray(
                    np.load(str(root / mouse / "data" / "videos" / f"{trial_id}.npy"), mmap_mode="r")
                )
                if video_phash(video) != oracle_video_phash(video):
                    oracle_mismatches.append((mouse, trial_id))
                total += 1
            continue

        folded = get_folds_tiers(mouse, args.num_folds)
        ours = compute_video_phashes(mouse)  # cache hit: already hashed above
        # Foldable set per the reference (/root/reference/src/data.py:20-30):
        # new mice fold only responded tiers; old mice fold every labeled one.
        if mouse in constants.new_mice:
            foldable = {t for t in labeled if tiers[t] in ("train", "oracle")}
        else:
            foldable = set(labeled)
        mouse_hashes: list[int] = []
        for trial_id in labeled:
            if not args.skip_oracle:
                video = np.asarray(
                    np.load(str(root / mouse / "data" / "videos" / f"{trial_id}.npy"), mmap_mode="r")
                )
                if int(ours[trial_id]) != oracle_video_phash(video):
                    oracle_mismatches.append((mouse, trial_id))
            if trial_id in foldable:
                # No startswith() guard: a foldable trial whose label is not
                # exactly fold_{hash % k} — including one left unfolded — is
                # a mismatch.
                if str(folded[trial_id]) != f"fold_{int(ours[trial_id]) % args.num_folds}":
                    fold_mismatches.append((mouse, trial_id))
                fold_hist[int(ours[trial_id]) % args.num_folds] += 1
                mouse_hashes.append(int(ours[trial_id]))
            total += 1
        for size in collections.Counter(mouse_hashes).values():
            group_sizes[size] += 1

    elapsed = time.time() - t0
    ok = not oracle_mismatches and not fold_mismatches
    print(f"trials checked: {total} in {elapsed:.1f}s across {len(present)} mice")
    print(f"fold histogram (hash % {args.num_folds}, foldable trials): {dict(sorted(fold_hist.items()))}")
    print(f"duplicate-video group sizes (size -> count): {dict(sorted(group_sizes.items()))}")
    if oracle_mismatches:
        print(f"ORACLE MISMATCHES ({len(oracle_mismatches)}): {oracle_mismatches[:10]}")
    if fold_mismatches:
        print(f"FOLD-LABEL MISMATCHES ({len(fold_mismatches)}): {fold_mismatches[:10]}")
    print(
        json.dumps(
            {
                "tool": "validate_phash_realdata",
                "status": "ok" if ok else "mismatch",
                "mode": "spot" if args.max_trials else "full",
                "trials": total,
                "mice_checked": len(present),
                "mice_missing": missing,
                "oracle_mismatches": len(oracle_mismatches),
                "fold_mismatches": len(fold_mismatches),
                "fold_hist": {str(k): v for k, v in sorted(fold_hist.items())},
                "seconds": round(elapsed, 1),
            }
        )
    )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
