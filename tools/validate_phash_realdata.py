#!/usr/bin/env python
"""Validate pHash fold assignment against the REAL competition dataset.

The pHash implementation (``sensorium_tpu/data/phash.py``) is pinned
bit-identical to a vendored ``imagehash.phash`` v4.3.1 oracle on synthetic
natural-statistics frames (``tests/test_phash_golden.py``), but the actual
148 GB competition videos are not present in the build environment.  This
tool is the missing real-data leg, kept ready to run the day a dataset is
mountable (VERDICT r2 "What's missing #2"):

    SENSORIUM_DATA_DIR=/path/to/data python tools/validate_phash_realdata.py

For every labeled trial of every mouse it

1. computes ``video_phash`` (our implementation: PIL Lanczos resize,
   scipy DCT-II, median threshold, MSB-first packing, 5-frame XOR) and the
   same 5-frame XOR built on the vendored ``imagehash.phash`` oracle, and
   asserts bit-identity per trial (reference behavior:
   ``/root/reference/src/phash.py:19-26`` + ``src/data.py:24-28``);
2. cross-checks ``get_folds_tiers`` fold labels == ``phash % num_folds``;
3. reports the fold histogram and duplicate-video group sizes (trials
   sharing a stimulus MUST share a fold — the property the whole
   construction exists for).

Exit codes: 0 = validated (or dataset absent -> SKIPPED, still 0 so CI can
carry the tool unconditionally), 1 = any mismatch.  Prints one JSON summary
line last, matching the repo's bench/driver convention.
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


def parse_args() -> argparse.Namespace:
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
        help="cap labeled trials per mouse (0 = all); use for a quick spot-check pass",
    )
    parser.add_argument(
        "--skip-oracle",
        action="store_true",
        help="skip the per-trial vendored-imagehash recomputation (folds/groups checks only)",
    )
    return parser.parse_args()


def main() -> int:
    args = parse_args()

    from sensorium_tpu import constants
    from sensorium_tpu.data.mouse_data import get_folds_tiers
    from sensorium_tpu.data.phash import video_phash
    from sensorium_tpu.utils import get_length_without_nan

    root = Path(args.data_dir).resolve() if args.data_dir else constants.sensorium_dir
    # --data-dir points at the directory that CONTAINS the mouse dirs
    # (any name, not necessarily .../sensorium_all_2023); get_folds_tiers
    # resolves paths through constants.sensorium_dir at call time.
    constants.sensorium_dir = root
    mice = args.mice or constants.mice
    missing = [m for m in mice if not (root / m / "meta" / "trials" / "tiers.npy").exists()]
    if missing:
        print(f"SKIPPED: dataset not present under {root} (missing: {', '.join(missing[:3])}...)")
        print(json.dumps({"tool": "validate_phash_realdata", "status": "skipped", "root": str(root)}))
        return 0

    # The oracle lives next to its bit-identity tests; reuse it rather than
    # vendoring imagehash a second time.
    if not args.skip_oracle:
        from tests.test_phash_golden import vendored_frame_phash

    t0 = time.time()
    total = 0
    oracle_mismatches: list[tuple[str, int]] = []
    fold_mismatches: list[tuple[str, int]] = []
    fold_hist: collections.Counter = collections.Counter()
    group_sizes: collections.Counter = collections.Counter()
    for mouse in mice:
        tiers = np.load(str(root / mouse / "meta" / "trials" / "tiers.npy"))
        folded = get_folds_tiers(mouse, args.num_folds)
        labeled = [t for t, tier in enumerate(tiers) if tier != "none"]
        if args.max_trials:
            labeled = labeled[: args.max_trials]
        mouse_hashes: list[int] = []
        for trial_id in labeled:
            video = np.asarray(
                np.load(str(root / mouse / "data" / "videos" / f"{trial_id}.npy"), mmap_mode="r")
            )
            ours = video_phash(video)
            if not args.skip_oracle:
                # Reference loop: XOR of 5 evenly sampled frames
                # (/root/reference/src/phash.py:19-26), oracle per frame.
                length = get_length_without_nan(video[0, 0])
                step = length // 5
                oracle = 0
                for frame_index in range(step // 2, length, step)[:5]:
                    oracle ^= vendored_frame_phash(video[..., frame_index])
                if ours != oracle:
                    oracle_mismatches.append((mouse, trial_id))
            expected = f"fold_{ours % args.num_folds}"
            if folded[trial_id] != expected and str(folded[trial_id]).startswith("fold_"):
                fold_mismatches.append((mouse, trial_id))
            fold_hist[ours % args.num_folds] += 1
            mouse_hashes.append(ours)
            total += 1
        for size in collections.Counter(mouse_hashes).values():
            group_sizes[size] += 1

    elapsed = time.time() - t0
    ok = not oracle_mismatches and not fold_mismatches
    print(f"trials checked: {total} in {elapsed:.1f}s across {len(mice)} mice")
    print(f"fold histogram (hash % {args.num_folds}): {dict(sorted(fold_hist.items()))}")
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
                "trials": total,
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
