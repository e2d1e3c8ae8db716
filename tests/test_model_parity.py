"""Numerical parity of the JAX DwiseNeuro against golden activations
captured from the PyTorch reference implementation (tests/golden)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sensorium_tpu.compat import convert_torch_state_dict
from sensorium_tpu.models.dwiseneuro import DwiseNeuro

GOLDEN_PATH = Path(__file__).parent / "golden" / "dwiseneuro_small.npz"

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


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN_PATH)


def torch_state_dict(golden, prefix: str) -> dict:
    return {
        key.split(":", 1)[1]: golden[key]
        for key in golden.files
        if key.startswith(prefix + ":")
    }


@pytest.fixture(scope="module")
def model():
    return DwiseNeuro(**MODEL_KWARGS)


@pytest.fixture(scope="module")
def variables(golden, model):
    params, stats = convert_torch_state_dict(
        torch_state_dict(golden, "sd0"),
        readout_outputs=list(READOUT_OUTPUTS),
        num_core_blocks=2,
        num_cortex_layers=2,
        groups=2,
        padded_group_size=model.padded_group_size,
    )
    return {"params": params, "batch_stats": stats}


def test_converted_tree_matches_init_structure(model, variables):
    init_vars = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 5, 8, 16, 16), jnp.float32), train=False
    )
    init_shapes = jax.tree.map(lambda a: a.shape, init_vars)
    conv_shapes = jax.tree.map(lambda a: np.asarray(a).shape, variables)
    assert init_shapes == conv_shapes


def test_eval_forward_matches_torch(golden, model, variables):
    out = model.apply(variables, golden["input"], train=False)
    assert out.shape == (3, 2, max(READOUT_OUTPUTS), 8)
    for mouse, num in enumerate(READOUT_OUTPUTS):
        expected = golden[f"eval_out:{mouse}"]
        np.testing.assert_allclose(
            np.asarray(out[mouse][:, :num]), expected, rtol=1e-4, atol=1e-5
        )
        # padded rows are exactly zero
        assert np.all(np.asarray(out[mouse][:, num:]) == 0.0)


def test_single_mouse_forward_matches_torch(golden, model, variables):
    out = model.apply(variables, golden["input"], mouse_index=1, train=False)
    np.testing.assert_allclose(
        np.asarray(out), golden["eval_mouse1"], rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("spec", [0, 1, -1, (1,), (0, 1)])
def test_remat_block_specs_preserve_math(golden, variables, spec):
    """Rematerialization (int first-k or explicit block-index sequence)
    changes the backward schedule, never the numbers."""
    def loss_for(remat_blocks):
        m = DwiseNeuro(**{**MODEL_KWARGS, "remat_blocks": remat_blocks})

        def loss_fn(params):
            out = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                golden["input"],
                train=True,
                mutable=["batch_stats"],
            )[0]
            return jnp.sum(out * out)

        return jax.value_and_grad(loss_fn)(variables["params"])

    base_loss, base_grad = loss_for(0)  # no block rematted
    got_loss, got_grad = loss_for(spec)
    np.testing.assert_allclose(float(got_loss), float(base_loss), rtol=1e-6)
    for path, g in jax.tree_util.tree_flatten_with_path(got_grad)[0]:
        expected = dict(jax.tree_util.tree_flatten_with_path(base_grad)[0])[path]
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(expected), rtol=1e-5, atol=1e-6, err_msg=str(path)
        )


def test_train_forward_and_bn_stat_updates_match_torch(golden, model, variables):
    out, mutated = model.apply(
        variables, golden["input"], train=True, mutable=["batch_stats"]
    )
    for mouse, num in enumerate(READOUT_OUTPUTS):
        expected = golden[f"train_out:{mouse}"]
        np.testing.assert_allclose(
            np.asarray(out[mouse][:, :num]), expected, rtol=1e-4, atol=1e-5
        )

    _, expected_stats = convert_torch_state_dict(
        torch_state_dict(golden, "sd1"),
        readout_outputs=list(READOUT_OUTPUTS),
        num_core_blocks=2,
        num_cortex_layers=2,
        groups=2,
        padded_group_size=model.padded_group_size,
    )
    flat_got = jax.tree_util.tree_flatten_with_path(mutated["batch_stats"])[0]
    flat_exp = dict(jax.tree_util.tree_flatten_with_path(expected_stats)[0])
    assert flat_got and len(flat_got) == len(flat_exp)
    for path, value in flat_got:
        np.testing.assert_allclose(
            np.asarray(value), flat_exp[path], rtol=1e-4, atol=1e-5, err_msg=str(path)
        )


class TestLearnableSoftplus:
    """Opt-in trainable softplus beta (reference README.md:112-133)."""

    def test_matches_torch_snippet(self):
        """Forward AND d/dbeta match the reference's numerically-stable
        LearnableSoftplus implementation (README.md:121-133)."""
        import torch

        from sensorium_tpu.models.dwiseneuro import softplus_learnable

        rng = np.random.default_rng(0)
        x_np = rng.normal(0, 30, (4, 257)).astype(np.float32)
        # Force the |bx| > 20 linear/underflow regime explicitly (beta=0.07
        # needs |x| > 285.7, which N(0, 30) essentially never produces) and
        # the deep-underflow tail past |bx| ~ 88 where log1p(exp) hits 0.
        x_np[0, :4] = (500.0, -500.0, 1500.0, -1500.0)
        beta0 = 0.07

        xt = torch.tensor(x_np)
        bt = torch.tensor(beta0, requires_grad=True)
        xb = xt * bt
        out_t = (torch.clamp(xb, 0) + torch.minimum(xb, -xb).exp().log1p()) / bt
        out_t.sum().backward()

        def f(beta):
            return softplus_learnable(jnp.asarray(x_np), beta)

        out_j = f(jnp.float32(beta0))
        np.testing.assert_allclose(
            np.asarray(out_j), out_t.detach().numpy(), rtol=1e-6, atol=1e-6
        )
        grad_j = jax.grad(lambda b: jnp.sum(f(b)))(jnp.float32(beta0))
        np.testing.assert_allclose(float(grad_j), float(bt.grad), rtol=1e-4)

    def test_init_matches_fixed_beta_model(self):
        """At init the learnable model computes the identical function (beta
        starts at the configured value); shared params init identically
        (flax derives init RNG from the param path, not creation order)."""
        fixed = DwiseNeuro(**MODEL_KWARGS)
        learn = DwiseNeuro(**{**MODEL_KWARGS, "learnable_softplus": True})
        x = np.random.default_rng(1).uniform(0, 255, (2, 5, 4, 16, 16)).astype(np.float32)

        v_fixed = fixed.init(jax.random.PRNGKey(0), x)
        v_learn = learn.init(jax.random.PRNGKey(0), x)
        betas = v_learn["params"]["readout_softplus_beta"]
        assert betas.shape == (len(READOUT_OUTPUTS),)
        np.testing.assert_array_equal(np.asarray(betas), np.float32(0.07))
        assert "readout_softplus_beta" not in v_fixed["params"]

        out_f = fixed.apply(v_fixed, x)
        out_l = learn.apply(v_learn, x)
        np.testing.assert_allclose(
            np.asarray(out_l), np.asarray(out_f), rtol=1e-6, atol=1e-6
        )
        # Single-mouse route too.
        out_f1 = fixed.apply(v_fixed, x, mouse_index=1)
        out_l1 = learn.apply(v_learn, x, mouse_index=1)
        np.testing.assert_allclose(
            np.asarray(out_l1), np.asarray(out_f1), rtol=1e-6, atol=1e-6
        )

    def test_beta_receives_gradient(self):
        learn = DwiseNeuro(**{**MODEL_KWARGS, "learnable_softplus": True})
        x = np.random.default_rng(2).uniform(0, 255, (2, 5, 4, 16, 16)).astype(np.float32)
        variables = learn.init(jax.random.PRNGKey(0), x)

        def loss_fn(params):
            out = learn.apply({**variables, "params": params}, x)
            return jnp.sum(out * out)

        grads = jax.grad(loss_fn)(variables["params"])
        g = np.asarray(grads["readout_softplus_beta"])
        assert g.shape == (len(READOUT_OUTPUTS),)
        assert np.all(np.isfinite(g)) and np.all(g != 0.0)


class TestConstructorDefaults:
    @pytest.mark.skipif(
        not Path("/root/reference").exists(), reason="reference repo not mounted"
    )
    def test_defaults_match_reference_signature(self):
        """DwiseNeuro(readout_outputs=...) with no further arguments must
        build the same architecture as the reference's user-facing
        constructor (/root/reference/src/models/dwiseneuro.py:343-357) —
        a migrating user constructing the model directly gets the 9-block
        reference geometry, not some internal default."""
        import ast

        source = Path("/root/reference/src/models/dwiseneuro.py").read_text()
        tree = ast.parse(source)
        init = next(
            node
            for cls in ast.walk(tree)
            if isinstance(cls, ast.ClassDef) and cls.name == "DwiseNeuro"
            for node in cls.body
            if isinstance(node, ast.FunctionDef) and node.name == "__init__"
        )
        args = init.args.args[1:]  # drop self
        defaults = dict(
            zip(
                [a.arg for a in args[len(args) - len(init.args.defaults):]],
                [ast.literal_eval(d) for d in init.args.defaults],
            )
        )
        ours = DwiseNeuro(readout_outputs=(4,))
        for name, expected in defaults.items():
            actual = getattr(ours, name)
            actual = tuple(actual) if isinstance(actual, (list, tuple)) else actual
            assert actual == expected, f"default {name}: {actual} != reference {expected}"


def test_mismatched_strides_is_a_clear_config_error():
    """Reference assert parity (dwiseneuro.py:304): extra strides must not
    be silently ignored, short ones must not IndexError mid-trace."""
    bad = DwiseNeuro(**{**MODEL_KWARGS, "spatial_strides": (2, 1, 1)})
    x = np.zeros((1, 5, 4, 16, 16), np.float32)
    with pytest.raises(ValueError, match="spatial_strides"):
        bad.init(jax.random.PRNGKey(0), x)
