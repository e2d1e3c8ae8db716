"""Trial catalog construction for each mouse.

Builds, from the on-disk dataset layout
(``<sensorium_dir>/<mouse>/{data,meta}/...``), the list of trials belonging
to a set of splits, together with per-trial file paths and NaN-trimmed
lengths.  Fold splits are derived from video perceptual hashes so duplicate
stimulus videos share a fold (group k-fold).  Capability parity with
``/root/reference/src/data.py``.

Differences from the reference:
* fold tiers are cached per process (the reference re-hashes every video on
  every call);
* all metadata loads go through ``np.load(..., mmap_mode="r")`` where the
  full array is not needed.
"""

from __future__ import annotations

import functools

import numpy as np

from sensorium_tpu import constants
from sensorium_tpu.data.phash import video_phash
from sensorium_tpu.utils import get_length_without_nan


def mouse_dir(mouse: str):
    return constants.sensorium_dir / mouse


def compute_video_phashes(mouse: str) -> np.ndarray:
    """Per-trial uint64 pHash (0 for trials with tier 'none').

    Cached per (mouse, dataset root): hashing is one full read + DCT of
    every labeled video, so callers that need both the fold tiers and the
    raw hashes (e.g. ``tools/validate_phash_realdata.py``) must not pay
    for it twice.  The returned array is read-only to keep the cache
    immutable.
    """
    return _video_phashes_cached(mouse, str(constants.sensorium_dir))


@functools.lru_cache(maxsize=None)
def _video_phashes_cached(mouse: str, root: str) -> np.ndarray:
    tiers = np.load(str(mouse_dir(mouse) / "meta" / "trials" / "tiers.npy"))
    phashes = np.zeros(tiers.shape[0], dtype=np.uint64)
    for trial_id, tier in enumerate(tiers):
        if tier == "none":
            continue
        video = np.load(str(mouse_dir(mouse) / "data" / "videos" / f"{trial_id}.npy"), mmap_mode="r")
        phashes[trial_id] = video_phash(np.asarray(video))
    phashes.flags.writeable = False
    return phashes


def get_folds_tiers(mouse: str, num_folds: int) -> np.ndarray:
    """Tier array with labeled trials re-assigned to 'fold_{phash % num_folds}'.

    For "new" mice only the train/oracle tiers carry responses, so only
    those are folded.  For "old" mice the test-split responses were
    back-filled by the downloader, so every non-'none' tier is folded.

    ``SENSORIUM_FOLD_ASSIGNMENT=trial`` switches the group key from the
    video pHash to the trial index (``fold_{trial_id % num_folds}``) — a
    debug/smoke mode that gives balanced folds on synthetic datasets whose
    videos do not hash uniformly.  The default ('phash') is the reference
    assignment (``/root/reference/src/data.py:20-30``).

    Cached per (mouse, num_folds, assignment mode, dataset root) — the
    mode and root are part of the key so repointing ``SENSORIUM_DATA_DIR``
    / ``constants.sensorium_dir`` or flipping the assignment env mid-
    process cannot silently serve stale fold membership.
    """
    import os

    return _folds_tiers_cached(
        mouse,
        num_folds,
        os.environ.get("SENSORIUM_FOLD_ASSIGNMENT", "phash"),
        str(constants.sensorium_dir),
    )


@functools.lru_cache(maxsize=None)
def _folds_tiers_cached(
    mouse: str, num_folds: int, assignment: str, root: str
) -> np.ndarray:
    # Widen the string dtype: assigning "fold_{k}" into a narrow (<U5)
    # array would silently truncate the fold names.
    tiers = np.load(str(mouse_dir(mouse) / "meta" / "trials" / "tiers.npy")).astype("U32")
    if assignment == "trial":
        phashes = np.arange(tiers.shape[0], dtype=np.uint64)
    else:
        phashes = compute_video_phashes(mouse)
    if mouse in constants.new_mice:
        labeled = (tiers == "train") | (tiers == "oracle")
    else:
        labeled = tiers != "none"
    for trial_id in np.argwhere(labeled).ravel():
        tiers[trial_id] = f"fold_{int(phashes[trial_id]) % num_folds}"
    # Read-only like the phash cache: a caller mutating the returned array
    # would poison fold assignment for the rest of the process.
    tiers.flags.writeable = False
    return tiers


# Back-compat: callers (tests, bench) clear the fold cache through the
# public name; the phash cache feeds it, so both clear together.
def _clear_fold_caches() -> None:
    _folds_tiers_cached.cache_clear()
    _video_phashes_cached.cache_clear()


get_folds_tiers.cache_clear = _clear_fold_caches


def get_mouse_data(mouse: str, splits: list[str]) -> dict:
    """Catalog of trials for ``mouse`` restricted to ``splits``.

    Returns a dict with neuron metadata and a ``trials`` list; each trial
    carries its id, usable length, and paths to the video / behavior /
    pupil-center (and responses, when the split is labeled) arrays.
    """
    if mouse not in constants.mice:
        # ValueError, not assert (-O-proof): an unknown mouse id must fail
        # here with its name, not as a downstream path error.
        raise ValueError(f"unknown mouse {mouse!r}; expected one of constants.mice")
    tiers = get_folds_tiers(mouse, constants.num_folds)
    mdir = mouse_dir(mouse)
    neuron_ids = np.load(str(mdir / "meta" / "neurons" / "unit_ids.npy"))
    cell_motor_coords = np.load(str(mdir / "meta" / "neurons" / "cell_motor_coordinates.npy"))

    catalog = {
        "mouse": mouse,
        "splits": splits,
        "neuron_ids": neuron_ids,
        "num_neurons": int(neuron_ids.shape[0]),
        "cell_motor_coordinates": cell_motor_coords,
        "trials": [],
    }

    for split in splits:
        if split in constants.folds_splits:
            labeled = True
        elif split in constants.unlabeled_splits:
            labeled = False
        else:
            raise ValueError(f"Unknown data split '{split}'")

        for trial_id in np.argwhere(tiers == split).ravel().tolist():
            behavior_path = str(mdir / "data" / "behavior" / f"{trial_id}.npy")
            trial = {
                "trial_id": trial_id,
                "video_path": str(mdir / "data" / "videos" / f"{trial_id}.npy"),
                "behavior_path": behavior_path,
                "pupil_center_path": str(mdir / "data" / "pupil_center" / f"{trial_id}.npy"),
                "length": get_length_without_nan(
                    np.asarray(np.load(behavior_path, mmap_mode="r")[0])
                ),
            }
            if labeled:
                response_path = str(mdir / "data" / "responses" / f"{trial_id}.npy")
                trial["response_path"] = response_path
                trial["length"] = get_length_without_nan(
                    np.asarray(np.load(response_path, mmap_mode="r")[0])
                )
            catalog["trials"].append(trial)

    return catalog
