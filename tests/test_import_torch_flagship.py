"""Production-shape checkpoint-import proof.

Builds a full-size reference-style argus ``.pth`` (182M params, the real
``true_batch_001`` config, ``{model_name, params, nn_state_dict}`` per
/root/reference/src/ema.py:61-73), converts it with the import CLI, and
asserts the Predictor's whole-trial output matches the reference's own
sliding-window inference (predictors.py:23-55) of the SAME weights —
captured in ``tests/golden/import_proof_flagship.npz`` by
``generate_golden.py --import-proof``.  This demonstrates the published-
weights serving story (reference README.md:329) end-to-end at production
shape, not on a toy.
"""

from __future__ import annotations

import importlib.util
import json
from pathlib import Path

import numpy as np
import pytest

GOLDEN_PATH = Path(__file__).parent / "golden" / "import_proof_flagship.npz"

pytestmark = [
    pytest.mark.slow,  # ~35-45 min: the production-shape import proof
    pytest.mark.skipif(
        not GOLDEN_PATH.exists(), reason="import-proof golden fixture not generated"
    ),
]

from tests.test_model_parity_flagship import MODEL_KWARGS  # noqa: E402


def _procedural():
    spec = importlib.util.spec_from_file_location(
        "procedural_weights", Path(__file__).parent / "golden" / "procedural_weights.py"
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def make_flagship_pth(golden, path: Path) -> None:
    """Reference-style checkpoint: real config, procedural weights."""
    import torch

    nn_kwargs = dict(MODEL_KWARGS)
    for key in ("dtype", "readout_pad_multiple"):  # torch configs carry neither
        nn_kwargs.pop(key)
    nn_kwargs["drop_rate"] = 0.4  # production values; inert at inference
    nn_kwargs["drop_path_rate"] = 0.1
    argus_params = {
        "nn_module": ("dwiseneuro", nn_kwargs),
        "loss": ("mice_poisson", {"log_input": False, "full": False, "eps": 1e-8}),
        "optimizer": ("AdamW", {"lr": 2.4e-3, "weight_decay": 0.05}),
        "device": "cuda:0",
        "frame_stack": {"size": 16, "step": 2, "position": "last"},
        "inputs_processor": ("stack_inputs", {"size": (64, 64), "pad_fill_value": 0.0}),
        "responses_processor": ("identity", {}),
        "amp": True,
        "iter_size": 1,
    }
    meta = json.loads(str(golden["meta_json"]))
    state = _procedural().fill_state(meta)
    nn_state_dict = {key: torch.from_numpy(value) for key, value in state.items()}
    torch.save(
        {"model_name": "MouseModel", "params": argus_params, "nn_state_dict": nn_state_dict},
        path,
    )


def test_flagship_import_then_predict_trial_matches_reference(tmp_path):
    from sensorium_tpu.cli.import_torch import convert_checkpoint
    from sensorium_tpu.infer.predictor import Predictor

    golden = np.load(GOLDEN_PATH)
    pth = tmp_path / "model-017-0.290500.pth"
    make_flagship_pth(golden, pth)
    ckpt = tmp_path / "model-017-0.290500.ckpt"
    # float32: parity comparison (and the CPU test backend) need fp32 math.
    returned = convert_checkpoint(pth, ckpt, dtype="float32")
    assert returned["nn_module"][1]["expansion_ratio"] == 7
    pth.unlink()  # free the 700 MB before the forward pass

    predictor = Predictor(ckpt, chunk_size=16)
    prediction = predictor.predict_trial(
        golden["video"],
        golden["behavior"],
        golden["pupil_center"],
        mouse_index=int(golden["mouse_index"]),
    )
    expected = golden["prediction"]
    assert prediction.shape == expected.shape  # (7908, 40)
    scale = float(np.max(np.abs(expected)))
    np.testing.assert_allclose(prediction, expected, rtol=2e-3, atol=2e-4 * scale)
