"""Lowering regression pins for the hot path.

Round 2's biggest perf win was replacing the nearest-index gather /
``jnp.tile`` in the InvertedResidual3d shortcut with strided getitem +
concat (docs/PERF.md, "shortcut lowering fix"; reference behavior at
/root/reference/src/models/dwiseneuro.py:70-145).  Round 3 then "hardened"
the downsample to an explicit ``lax.slice`` so the trace would contain no
``stablehlo.gather`` at all — and that pin itself cost 8% eval throughput
(512-516 clips/s vs 553-557 for the getitem form, re-A/B'd on a v5e
2026-08-20; docs/PERF.md "shortcut lowering, revisited").  The lesson: pin
the MEASURED configuration, not an op-level aesthetic.

What these tests now pin on the *unoptimized* (backend-independent) trace:

- ``stablehlo.scatter`` — never allowed on a forward path.
- ``stablehlo.while`` — only scalar RNG-counter loops (threefry rounds),
  never a tensor-carrying data-movement loop.
- ``stablehlo.gather`` — exactly ONE per strided shortcut site (the
  constant-stride downsample the A/B chose, which XLA:TPU compiles to a
  kCustom fused dynamic-slice).  A refactor that adds any OTHER gather
  (e.g. a dynamic readout select, a nearest-resize on the PE path) still
  fails CI; so does losing the shortcut's measured emission to a slice.
"""

import re

import jax
import jax.numpy as jnp
import pytest

from sensorium_tpu.models.dwiseneuro import DwiseNeuro

MODEL_KWARGS = dict(
    readout_outputs=(11, 7, 10),
    in_channels=5,
    core_features=(8, 12),
    spatial_strides=(2, 1),  # stride 2 + channel growth: the shortcut path
    spatial_kernel=3,
    temporal_kernel=5,
    expansion_ratio=2,
    se_reduce_ratio=4,
    cortex_features=(16, 24),
    groups=2,
    softplus_beta=0.07,
    drop_rate=0.0,
    drop_path_rate=0.1,
    dtype=jnp.float32,
    readout_pad_multiple=8,
)

# One strided block in MODEL_KWARGS -> exactly one shortcut-downsample
# gather per forward.
EXPECTED_GATHERS = sum(s > 1 for s in MODEL_KWARGS["spatial_strides"])

# Any while loop carrying a tensor bigger than this is treated as a
# data-movement loop (a lowered gather/scatter stream), not an RNG round
# counter. Threefry carries scalars and length-<=4 ui32 vectors.
_MAX_WHILE_TENSOR_ELEMS = 128

_TENSOR_RE = re.compile(r"tensor<([0-9x]*)(?:x)?[a-z]")


def _while_carries_big_tensor(line: str) -> bool:
    for dims in _TENSOR_RE.findall(line):
        elems = 1
        for d in filter(None, dims.split("x")):
            elems *= int(d)
        if elems > _MAX_WHILE_TENSOR_ELEMS:
            return True
    return False


@pytest.fixture(scope="module")
def model_and_vars():
    model = DwiseNeuro(**MODEL_KWARGS)
    x = jnp.zeros((2, 5, 4, 16, 16), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        x,
        train=False,
    )
    return model, variables, x


def _assert_clean(text: str, where: str) -> None:
    assert "stablehlo.scatter" not in text, (
        f"stablehlo.scatter emitted in the {where} forward — scatter lowers "
        "to a serialized update stream on TPU and is never allowed on the "
        "hot path (docs/PERF.md shortcut lowering fix)"
    )
    # Count op INVOCATIONS — each gather line also carries a
    # '#stablehlo.gather<...>' dimension_numbers attribute.
    gathers = text.count('"stablehlo.gather"(')
    assert gathers == EXPECTED_GATHERS, (
        f"{gathers} stablehlo.gather ops in the {where} forward, expected "
        f"exactly {EXPECTED_GATHERS} (one constant-stride shortcut "
        "downsample per strided block — the measured-fastest emission; any "
        "OTHER gather is a data-movement regression, and losing the "
        "shortcut's gather to a slice costs 8% eval throughput — "
        "docs/PERF.md 'shortcut lowering, revisited')"
    )
    for line in text.splitlines():
        if "stablehlo.while" in line:
            assert not _while_carries_big_tensor(line), (
                f"stablehlo.while carrying a large tensor emitted in the "
                f"{where} forward — only scalar RNG-counter loops are "
                f"allowed on the hot path:\n{line[:300]}"
            )


def test_eval_forward_lowering_pin(model_and_vars):
    model, variables, x = model_and_vars
    lowered = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    ).lower(variables, x)
    _assert_clean(lowered.as_text(), "eval")


def test_train_forward_lowering_pin(model_and_vars):
    """Train mode adds BN stat updates and DropPath bernoulli draws — same
    data-movement budget."""
    model, variables, x = model_and_vars

    def fwd(v, x, key):
        out, updates = model.apply(
            v, x, train=True, rngs={"dropout": key}, mutable=["batch_stats"]
        )
        return out, updates

    lowered = jax.jit(fwd).lower(variables, x, jax.random.PRNGKey(2))
    _assert_clean(lowered.as_text(), "train")


def test_single_mouse_forward_lowering_pin(model_and_vars):
    """The predict path selects one readout by static index — must stay a
    static slice; its only gather is the shortcut downsample."""
    model, variables, x = model_and_vars
    lowered = jax.jit(
        lambda v, x: model.apply(v, x, train=False, mouse_index=1)
    ).lower(variables, x)
    _assert_clean(lowered.as_text(), "single-mouse")


def test_train_grad_emits_no_scatter(model_and_vars):
    """The BACKWARD of the shortcut gather must transpose to a pad/slice
    update, not a scatter-add stream: jax transposes a constant-stride
    gather through the standard scatter rule, but XLA must never see one
    from this model's grad — pin it at trace level.  (Train throughput is
    measured insensitive to the shortcut form — 115.3-116.7 clips/s across
    all 2026-08-20 A/B variants — because the scatter XLA *would* get is
    simplified; this test documents the actual emission so a jax upgrade
    that changes the transpose rule is caught.)"""
    model, variables, x = model_and_vars

    def loss_fn(params, x, key):
        out, _ = model.apply(
            {**variables, "params": params},
            x, train=True, rngs={"dropout": key}, mutable=["batch_stats"],
        )
        return sum(jnp.sum(o.astype(jnp.float32)) for o in out)

    lowered = jax.jit(jax.grad(loss_fn)).lower(
        variables["params"], x, jax.random.PRNGKey(2)
    )
    text = lowered.as_text()
    n_scatter = text.count('"stablehlo.scatter"(')
    # jax lowers the gather transpose via scatter-add: allow exactly the
    # strided-shortcut count, nothing more (each is constant-index and
    # XLA:TPU folds it back into a pad; see docstring).
    assert n_scatter <= EXPECTED_GATHERS, (
        f"{n_scatter} stablehlo.scatter ops in the train grad, expected at "
        f"most {EXPECTED_GATHERS} (the shortcut-gather transposes)"
    )
