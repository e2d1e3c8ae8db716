"""Backward-pass numerical parity against torch autograd.

The forward goldens (``test_model_parity.py``) pin eval/train outputs and
BN-stat updates; this suite pins the *gradients* of the reference training
objective — ``MicePoissonLoss`` through a train-mode forward
(``/root/reference/src/losses.py:5-21`` + ``src/argus_models.py:43-57``,
iter_size=1, no AMP) — against torch autograd at the same weights, covering
the full backward chain: conv transposes, train-mode BN backward (batch
statistics), SE gating, softplus, and the padded-readout slice semantics.

Fixture: ``tests/golden/dwiseneuro_small_grads.npz`` (regenerate with
``python tests/golden/generate_golden.py --gradients``).  Torch grads are
mapped into the flax param layout through the same linear
``convert_torch_state_dict`` transform used for weights (transposes and
zero-fill padding commute with differentiation).
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sensorium_tpu.compat import convert_torch_state_dict
from sensorium_tpu.engine.losses import mice_poisson_loss
from sensorium_tpu.models.dwiseneuro import DwiseNeuro

GOLDEN_PATH = Path(__file__).parent / "golden" / "dwiseneuro_small_grads.npz"

READOUT_OUTPUTS = (11, 7, 10)
MODEL_KWARGS = dict(
    readout_outputs=READOUT_OUTPUTS,
    in_channels=5,
    core_features=(8, 12),
    spatial_strides=(2, 1),
    spatial_kernel=3,
    temporal_kernel=5,
    expansion_ratio=2,
    se_reduce_ratio=4,
    cortex_features=(16, 24),
    groups=2,
    softplus_beta=0.07,
    drop_rate=0.0,
    drop_path_rate=0.0,
    dtype=jnp.float32,
    readout_pad_multiple=8,
)
CONVERT_KWARGS = dict(
    readout_outputs=list(READOUT_OUTPUTS),
    num_core_blocks=2,
    num_cortex_layers=2,
    groups=2,
)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN_PATH)


def split_prefix(golden, prefix: str) -> dict:
    return {
        key.split(":", 1)[1]: golden[key]
        for key in golden.files
        if key.startswith(prefix + ":")
    }


@pytest.fixture(scope="module")
def model():
    return DwiseNeuro(**MODEL_KWARGS)


@pytest.fixture(scope="module")
def loss_and_grads(golden, model):
    params, stats = convert_torch_state_dict(
        split_prefix(golden, "sd0"),
        padded_group_size=model.padded_group_size,
        **CONVERT_KWARGS,
    )
    weights = jnp.asarray(golden["weights"])  # (B, M)
    # Compact-batch target: each sample's own-mouse responses, zero-padded
    # to N_max (the loss's (B, N_max, T) layout — engine/losses.py).
    n_max = max(READOUT_OUTPUTS)
    own_mouse = np.argmax(golden["weights"], axis=1)
    target = np.zeros((golden["weights"].shape[0], n_max, 8), np.float32)
    for b, m in enumerate(own_mouse):
        target[b, : READOUT_OUTPUTS[m]] = golden[f"target:{m}"][b]
    target = jnp.asarray(target)

    def loss_fn(p):
        out, _ = model.apply(
            {"params": p, "batch_stats": stats},
            golden["input"],
            train=True,
            mutable=["batch_stats"],
        )
        return mice_poisson_loss(out, target, weights)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return float(loss), grads


def test_loss_value_matches_torch(golden, loss_and_grads):
    loss, _ = loss_and_grads
    np.testing.assert_allclose(loss, float(golden["loss"]), rtol=1e-5)


def test_gradients_match_torch_autograd(golden, model, loss_and_grads):
    _, grads = loss_and_grads
    sd0 = split_prefix(golden, "sd0")
    torch_grads = split_prefix(golden, "grad")
    # The converter needs every state-dict key present; buffers
    # (BN running stats, PE inv_freq) have no gradient, so fill them — and
    # nothing else — with zeros.
    full = dict(torch_grads)
    for key, value in sd0.items():
        if key not in full:
            assert "running_" in key or "inv_freq" in key, key
            full[key] = np.zeros_like(value)
    assert set(full) == set(sd0)
    expected, _ = convert_torch_state_dict(
        full, padded_group_size=model.padded_group_size, **CONVERT_KWARGS
    )

    flat_got = jax.tree_util.tree_flatten_with_path(grads)[0]
    flat_exp = dict(jax.tree_util.tree_flatten_with_path(expected)[0])
    assert flat_got and len(flat_got) == len(flat_exp)
    # atol floor: BN *bias* grads whose consumer is another BatchNorm are
    # analytically ~0 (the next BN subtracts the batch mean, erasing a
    # constant shift), so both frameworks produce only fp32 cancellation
    # noise there (~1e-5 over the (B*T*H*W)-element reduce).  Every tensor
    # with real gradient mass matches to relmax <= 2.3e-5.
    for path, value in flat_got:
        np.testing.assert_allclose(
            np.asarray(value),
            flat_exp[path],
            rtol=2e-4,
            atol=5e-5,
            err_msg=str(path),
        )


def test_zero_weight_mouse_gets_exactly_zero_readout_grad(loss_and_grads):
    """Mouse 1 has weight 0 in every sample: the reference skips its cell
    entirely (losses.py:18), so its readout gradient must be exactly 0."""
    _, grads = loss_and_grads
    assert np.all(np.asarray(grads["readout_kernel"][1]) == 0.0)
    assert np.all(np.asarray(grads["readout_bias"][1]) == 0.0)


def test_padded_readout_rows_get_exactly_zero_grad(loss_and_grads):
    """Rows beyond each mouse's neuron count exist only as MXU padding and
    must receive no gradient (pad/slice parity with dwiseneuro.py:277-285)."""
    _, grads = loss_and_grads
    kernel = np.asarray(grads["readout_kernel"])  # (M, G, C/G, P)
    bias = np.asarray(grads["readout_bias"])  # (M, G, P)
    groups = kernel.shape[1]
    for m, n in enumerate(READOUT_OUTPUTS):
        per_group = -(-n // groups)
        assert np.all(kernel[m, :, :, per_group:] == 0.0), m
        assert np.all(bias[m, :, per_group:] == 0.0), m
