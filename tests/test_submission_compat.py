"""Submission bit-compatibility against the reference's write path.

Runs the same saved predictions through (a) ``sensorium_tpu.infer.
submission.make_submission`` and (b) a test-local transcription of the
reference's exact pandas/parquet code path
(``/root/reference/src/submission.py:51-73`` + the ``ResponseNormalizer``
math from ``src/responses.py:11-22``), then compares the two parquet files
field-by-field, schema-by-schema, and byte-for-byte.  The transcription
shares no code with the framework — it reads the raw ``.npy`` inputs
itself — so a bug in either the normalizer, the cut, the naming, or the
DataFrame/compression settings shows up as a mismatch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from sensorium_tpu import constants
from sensorium_tpu.data import mouse_data as mouse_data_mod
from sensorium_tpu.infer.submission import make_submission, submission_split_name

from tests.synthetic import SYNTH_TRIAL_LENGTH, build_synthetic_dataset

EXPERIMENT = "compat_exp"
SPLIT = "live_test_main"


@pytest.fixture(scope="module")
def compat_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("submission_compat")
    data_root = root / "sensorium_all_2023"
    build_synthetic_dataset(data_root)

    originals = {
        "sensorium_dir": constants.sensorium_dir,
        "predictions_dir": constants.predictions_dir,
    }
    constants.sensorium_dir = data_root
    constants.predictions_dir = root / "predictions"

    original_phashes = mouse_data_mod.compute_video_phashes
    mouse_data_mod.compute_video_phashes = lambda mouse: np.arange(9, dtype=np.uint64)
    mouse_data_mod.get_folds_tiers.cache_clear()

    # Saved per-trial predictions for every new mouse's split trials.
    rng = np.random.default_rng(11)
    for mouse in constants.new_mice:
        tiers = np.load(str(data_root / mouse / "meta" / "trials" / "tiers.npy"))
        num_neurons = np.load(
            str(data_root / mouse / "meta" / "neurons" / "unit_ids.npy")
        ).shape[0]
        mouse_dir = constants.predictions_dir / EXPERIMENT / SPLIT / mouse
        mouse_dir.mkdir(parents=True)
        for trial_id in np.argwhere(tiers == SPLIT).ravel().tolist():
            prediction = rng.gamma(1.5, 1.0, (num_neurons, SYNTH_TRIAL_LENGTH))
            np.save(str(mouse_dir / f"{trial_id}.npy"), prediction.astype(np.float32))

    yield root, data_root

    for name, value in originals.items():
        setattr(constants, name, value)
    mouse_data_mod.compute_video_phashes = original_phashes
    mouse_data_mod.get_folds_tiers.cache_clear()


def reference_style_submission(data_root, prediction_dir, out_dir) -> str:
    """Transcription of the reference writer, for verification only.

    Normalizer: src/responses.py:11-22.  Cut + DataFrame + parquet:
    src/submission.py:51-73.  Reads raw files directly — no framework code.
    """
    data = []
    for mouse in constants.new_mice:
        std = np.load(
            str(data_root / mouse / "meta" / "statistics" / "responses" / "all" / "std.npy")
        )
        threshold = 0.01 * np.nanmean(std)
        idx = std > threshold
        response_precision = np.ones_like(std) / threshold
        response_precision[idx] = 1 / std[idx]

        neuron_ids = np.load(
            str(data_root / mouse / "meta" / "neurons" / "unit_ids.npy")
        ).tolist()
        tiers = np.load(str(data_root / mouse / "meta" / "trials" / "tiers.npy"))
        for trial_id in np.argwhere(tiers == SPLIT).ravel().tolist():
            prediction = np.load(str(prediction_dir / mouse / f"{trial_id}.npy"))
            prediction = prediction * response_precision[..., : prediction.shape[-1]]
            prediction = prediction[..., : constants.submission_limit_length]
            prediction = prediction[..., constants.submission_skip_first :]
            prediction = prediction[..., : -constants.submission_skip_last]
            data.append((mouse, trial_id, prediction.tolist(), neuron_ids))
    submission_df = pd.DataFrame.from_records(
        data, columns=["mouse", "trial_indices", "prediction", "neuron_ids"]
    )
    split = SPLIT.replace("_test_", "_").replace("bonus", "test_bonus_ood")
    path = out_dir / f"predictions_{split}.parquet.brotli"
    submission_df.to_parquet(path, compression="brotli", engine="pyarrow", index=False)
    return path


class TestSubmissionBitCompat:
    def test_parquet_matches_reference_writer(self, compat_env):
        root, data_root = compat_env
        prediction_dir = constants.predictions_dir / EXPERIMENT / SPLIT

        make_submission(EXPERIMENT, SPLIT)
        ours_path = (
            prediction_dir / f"predictions_{submission_split_name(SPLIT)}.parquet.brotli"
        )
        assert ours_path.name == "predictions_live_main.parquet.brotli"

        ref_dir = root / "reference_out"
        ref_dir.mkdir()
        ref_path = reference_style_submission(data_root, prediction_dir, ref_dir)

        # Field-by-field equality (values and dtypes, incl. the nested
        # prediction lists) via exact arrow-table comparison.
        import pyarrow.parquet as pq

        ours_table = pq.read_table(ours_path)
        ref_table = pq.read_table(ref_path)
        assert ours_table.schema.equals(ref_table.schema)
        assert ours_table.equals(ref_table)

        # Same arrow schema and compression codec.
        ours_meta = pq.ParquetFile(ours_path)
        ref_meta = pq.ParquetFile(ref_path)
        assert ours_meta.schema_arrow.equals(ref_meta.schema_arrow)
        our_codec = ours_meta.metadata.row_group(0).column(0).compression
        ref_codec = ref_meta.metadata.row_group(0).column(0).compression
        assert our_codec == ref_codec == "BROTLI"

        # Written in the same environment, the files are byte-identical.
        assert ours_path.read_bytes() == ref_path.read_bytes()

    def test_split_name_mangling(self):
        assert submission_split_name("live_test_main") == "live_main"
        assert submission_split_name("live_test_bonus") == "live_test_bonus_ood"
        assert submission_split_name("final_test_main") == "final_main"
        assert submission_split_name("final_test_bonus") == "final_test_bonus_ood"
