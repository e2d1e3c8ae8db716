"""Production-scale golden parity: the full ``true_batch_001`` DwiseNeuro
(9 blocks, expansion 7, groups 2, cortex 4096, 10 ragged readouts
7440-8285) against activations captured from the PyTorch reference
(/root/reference/src/models/dwiseneuro.py:346-405 at the hyperparameters of
configs/true_batch_001.py:21-39).

The fixture (tests/golden/dwiseneuro_flagship.npz) stores the input, the
torch state-dict key/shape table, the eval/train/single-mouse outputs and
the post-forward BN running stats; the ~182M weights themselves are
regenerated procedurally on both sides (tests/golden/procedural_weights.py)
so the fixture stays small.  This pins exactly the paths that only break at
production scale: padded-readout slice semantics at real neuron counts
(reference dwiseneuro.py:277-285), the stride pattern, PE at real dims, and
BN statistics at flagship shapes.
"""

import importlib.util
import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sensorium_tpu.compat import convert_torch_state_dict
from sensorium_tpu.models.dwiseneuro import DwiseNeuro

GOLDEN_PATH = Path(__file__).parent / "golden" / "dwiseneuro_flagship.npz"

READOUT_OUTPUTS = (7863, 7908, 8202, 7939, 8122, 7440, 7928, 8285, 7671, 7495)
MODEL_KWARGS = dict(
    readout_outputs=READOUT_OUTPUTS,
    in_channels=5,
    core_features=(64, 64, 64, 64, 128, 128, 128, 256, 256),
    spatial_strides=(2, 1, 1, 1, 2, 1, 1, 2, 1),
    spatial_kernel=3,
    temporal_kernel=5,
    expansion_ratio=7,
    se_reduce_ratio=32,
    cortex_features=(1024, 2048, 4096),
    groups=2,
    softplus_beta=0.07,
    drop_rate=0.0,
    drop_path_rate=0.0,
    dtype=jnp.float32,
    readout_pad_multiple=128,
)

pytestmark = [
    pytest.mark.slow,  # flagship-shape compiles: minutes each
    pytest.mark.skipif(
        not GOLDEN_PATH.exists(), reason="flagship golden fixture not generated"
    ),
]


def _procedural():
    spec = importlib.util.spec_from_file_location(
        "procedural_weights", Path(__file__).parent / "golden" / "procedural_weights.py"
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN_PATH)


@pytest.fixture(scope="module")
def state_dict(golden):
    meta = json.loads(str(golden["meta_json"]))
    return _procedural().fill_state(meta)


@pytest.fixture(scope="module")
def model():
    return DwiseNeuro(**MODEL_KWARGS)


def _convert(model, sd):
    return convert_torch_state_dict(
        sd,
        readout_outputs=list(READOUT_OUTPUTS),
        num_core_blocks=9,
        num_cortex_layers=3,
        groups=2,
        padded_group_size=model.padded_group_size,
    )


@pytest.fixture(scope="module")
def variables(state_dict, model):
    params, stats = _convert(model, state_dict)
    return {"params": params, "batch_stats": stats}


def _assert_close(got, expected, what):
    got = np.asarray(got)
    scale = float(np.max(np.abs(expected))) or 1.0
    np.testing.assert_allclose(
        got, expected, rtol=2e-3, atol=2e-4 * scale, err_msg=what
    )


def test_padded_readout_stack_shape(model):
    # ceil(8285 / 2 / 128) * 128 = 4224 — the (10, 2, 2048, 4224) readout.
    assert model.padded_group_size == 4224


def test_eval_forward_matches_torch(golden, model, variables):
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        variables, golden["input"]
    )
    assert out.shape == (10, 2, max(READOUT_OUTPUTS), 16)
    for mouse, num in enumerate(READOUT_OUTPUTS):
        expected = golden[f"eval_out:{mouse}"]
        _assert_close(out[mouse][:, :num], expected, f"eval mouse {mouse}")
        # pad-to-group slice semantics (dwiseneuro.py:277-285): padded
        # rows beyond the real neuron count are exactly zero.
        assert np.all(np.asarray(out[mouse][:, num:]) == 0.0)


def test_single_mouse_forward_matches_torch(golden, model, variables):
    out = jax.jit(lambda v, x: model.apply(v, x, mouse_index=1, train=False))(
        variables, golden["input"]
    )
    assert out.shape == (2, READOUT_OUTPUTS[1], 16)
    _assert_close(out, golden["eval_mouse1"], "single-mouse eval")


def test_train_forward_and_bn_stat_updates_match_torch(
    golden, model, variables, state_dict
):
    out, mutated = jax.jit(
        lambda v, x: model.apply(v, x, train=True, mutable=["batch_stats"])
    )(variables, golden["input"])
    for mouse, num in enumerate(READOUT_OUTPUTS):
        expected = golden[f"train_out:{mouse}"]
        _assert_close(out[mouse][:, :num], expected, f"train mouse {mouse}")

    sd1 = dict(state_dict)
    for key in golden.files:
        if key.startswith("sd1:"):
            sd1[key.split(":", 1)[1]] = golden[key]
    _, expected_stats = _convert(model, sd1)
    flat_got = jax.tree_util.tree_flatten_with_path(mutated["batch_stats"])[0]
    flat_exp = dict(jax.tree_util.tree_flatten_with_path(expected_stats)[0])
    assert flat_got and len(flat_got) == len(flat_exp)
    for path, value in flat_got:
        np.testing.assert_allclose(
            np.asarray(value),
            flat_exp[path],
            rtol=2e-3,
            atol=1e-4,
            err_msg=str(path),
        )
