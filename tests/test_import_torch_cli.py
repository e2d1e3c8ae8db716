"""End-to-end test of the torch-checkpoint import CLI.

Builds a reference-style argus ``.pth`` (``{model_name, params,
nn_state_dict}``, /root/reference/src/ema.py:61-73) from the golden torch
state dict, converts it with ``sensorium_tpu.cli.import_torch``, and
checks the converted checkpoint drives the Predictor with outputs
identical to applying the directly-converted weights.
"""

from __future__ import annotations

import jax
import numpy as np
import pytest
import torch

from sensorium_tpu.cli.import_torch import convert_checkpoint
from sensorium_tpu.engine.model import load_model

from tests.test_model_parity import (
    GOLDEN_PATH,
    MODEL_KWARGS,
    READOUT_OUTPUTS,
    torch_state_dict,
)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN_PATH)


def make_reference_pth(golden, path):
    nn_kwargs = dict(MODEL_KWARGS)
    nn_kwargs.pop("dtype")  # reference checkpoints carry no dtype key
    argus_params = {
        "nn_module": ("dwiseneuro", nn_kwargs),
        "loss": ("mice_poisson", {"log_input": False, "full": False, "eps": 1e-8}),
        "optimizer": ("AdamW", {"lr": 1e-3, "weight_decay": 0.05}),
        "device": "cuda:0",
        "frame_stack": {"size": 4, "step": 2, "position": "last"},
        "inputs_processor": ("stack_inputs", {"size": (16, 16), "pad_fill_value": 0.0}),
        "responses_processor": ("identity", {}),
        "amp": True,
        "iter_size": 1,
    }
    nn_state_dict = {
        key: torch.from_numpy(np.asarray(value))
        for key, value in torch_state_dict(golden, "sd0").items()
    }
    torch.save(
        {"model_name": "MouseModel", "params": argus_params, "nn_state_dict": nn_state_dict},
        path,
    )


def test_import_and_predict(golden, tmp_path):
    pth = tmp_path / "model-011-0.123456.pth"
    make_reference_pth(golden, pth)
    ckpt = tmp_path / "model-011-0.123456.ckpt"
    # float32 override: the CPU test backend cannot execute bf16 dots.
    returned_params = convert_checkpoint(pth, ckpt, dtype="float32")
    assert returned_params["nn_module"][0] == "dwiseneuro"
    assert ckpt.exists()

    model = load_model(ckpt)
    rng = np.random.default_rng(0)
    inputs = rng.uniform(0, 255, (2, 5, 4, 16, 16)).astype(np.float32)
    out = np.asarray(model.predict(inputs, mouse_index=0))
    assert out.shape == (2, READOUT_OUTPUTS[0], 4)
    assert np.isfinite(out).all() and (out >= 0).all()

    # Identical to applying the golden weights directly (same dtype).
    from sensorium_tpu.compat import convert_torch_state_dict
    from sensorium_tpu.models.dwiseneuro import DwiseNeuro

    params, stats = convert_torch_state_dict(
        torch_state_dict(golden, "sd0"),
        readout_outputs=list(READOUT_OUTPUTS),
        num_core_blocks=2,
        num_cortex_layers=2,
        groups=2,
        padded_group_size=8,
    )
    direct = DwiseNeuro(**MODEL_KWARGS).apply(
        {"params": params, "batch_stats": stats},
        jax.numpy.asarray(inputs),
        mouse_index=0,
        train=False,
    )
    np.testing.assert_allclose(out, np.asarray(direct), rtol=1e-5, atol=1e-6)


def test_predictor_runs_on_converted_checkpoint(golden, tmp_path):
    from sensorium_tpu.infer.predictor import Predictor

    pth = tmp_path / "model-001-0.000001.pth"
    make_reference_pth(golden, pth)
    ckpt = tmp_path / "model-001-0.000001.ckpt"
    convert_checkpoint(pth, ckpt, dtype="float32")

    predictor = Predictor(ckpt, chunk_size=8)
    rng = np.random.default_rng(1)
    length = 20
    prediction = predictor.predict_trial(
        rng.uniform(0, 255, (12, 16, length)).astype(np.float32),
        rng.uniform(0, 5, (2, length)).astype(np.float32),
        rng.uniform(50, 200, (2, length)).astype(np.float32),
        mouse_index=1,
    )
    assert prediction.shape == (READOUT_OUTPUTS[1], length)
    assert np.isfinite(prediction).all()


def test_to_torch_state_dict_roundtrip(golden):
    """The inverse converter (``compat.to_torch_state_dict``) must restore
    the ORIGINAL reference state dict bitwise: torch -> flax -> torch is
    the identity on every tensor (inv_freq is recomputed from the same
    closed form, so it gets float tolerance; num_batches_tracked is
    re-zeroed — the reference never reads it).  This is the two-way
    checkpoint-compatibility contract: a TPU-trained model exports back
    into the reference PyTorch stack (used by the seed-variance failure
    analysis, SEED_VARIANCE_r05.json)."""
    from sensorium_tpu.compat import convert_torch_state_dict, to_torch_state_dict

    original = {
        key: np.asarray(value) for key, value in torch_state_dict(golden, "sd0").items()
    }
    params, stats = convert_torch_state_dict(
        {k: torch.from_numpy(v) for k, v in original.items()},
        readout_outputs=list(READOUT_OUTPUTS),
        num_core_blocks=2,
        num_cortex_layers=2,
        groups=2,
        padded_group_size=8,
    )
    restored = to_torch_state_dict(
        params, stats,
        readout_outputs=list(READOUT_OUTPUTS),
        num_core_blocks=2,
        num_cortex_layers=2,
        groups=2,
    )
    def functional(keys):
        # The golden dict omits num_batches_tracked (never read by the
        # reference's momentum-based BN); the exporter emits zeros for it.
        return {k for k in keys if "num_batches_tracked" not in k}

    assert functional(restored) == functional(original), (
        functional(restored) ^ functional(original)
    )
    for key, value in original.items():
        if "num_batches_tracked" in key:
            continue
        if "inv_freq" in key:
            np.testing.assert_allclose(restored[key], value, rtol=1e-6)
        else:
            np.testing.assert_array_equal(
                np.asarray(restored[key]).reshape(value.shape), value, err_msg=key
            )

    # And the restored dict loads strict into the reference module.
    import importlib.util
    from pathlib import Path

    ref_path = Path("/root/reference/src/models/dwiseneuro.py")
    if ref_path.exists():
        spec = importlib.util.spec_from_file_location("ref_dw_rt", ref_path)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        nn_kwargs = {
            k: v for k, v in MODEL_KWARGS.items()
            if k not in ("dtype", "readout_pad_multiple")
        }
        ref_model = module.DwiseNeuro(**nn_kwargs)
        ref_model.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v))) for k, v in restored.items()}
        )
