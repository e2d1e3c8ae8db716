"""Lowering regression pins for the hot path.

Round 2's biggest perf win was replacing gather/`jnp.tile` in the
InvertedResidual3d shortcut with strided slices + concat: XLA lowers
gathers/scatters on this path to while-loop / scatter-add streams at
~270 GB/s vs ~570 GB/s for slice/concat on a v5e (docs/PERF.md, "shortcut
lowering fix"; reference behavior at
/root/reference/src/models/dwiseneuro.py:70-145). These tests pin the
StableHLO the model traces to, so a refactor that silently reintroduces a
gather on the forward path fails CI instead of shipping a 3x slowdown.

The assertion is on the *unoptimized* lowering (backend-independent): if no
gather/scatter/while is emitted at trace time, no backend can be handed one.
One carve-out: XLA:CPU lowers threefry2x32 (the drop_path bernoulli PRNG) as
a rolled 5-round `stablehlo.while` over scalar ui32 counters — that is not
data movement, and TPU unrolls it — so whiles are allowed iff every tensor
in their signature is tiny (RNG-counter sized).
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

FORBIDDEN = ("stablehlo.gather", "stablehlo.scatter")

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
    for op in FORBIDDEN:
        assert op not in text, (
            f"{op} emitted in the {where} forward — the hot path must lower "
            "to slices/concats/convs only (docs/PERF.md shortcut lowering fix)"
        )
    for line in text.splitlines():
        if "stablehlo.while" in line:
            assert not _while_carries_big_tensor(line), (
                f"stablehlo.while carrying a large tensor emitted in the "
                f"{where} forward — only scalar RNG-counter loops are "
                f"allowed on the hot path:\n{line[:300]}"
            )


def test_eval_forward_emits_no_gather_scatter_while(model_and_vars):
    model, variables, x = model_and_vars
    lowered = jax.jit(
        lambda v, x: model.apply(v, x, train=False)
    ).lower(variables, x)
    _assert_clean(lowered.as_text(), "eval")


def test_train_forward_emits_no_gather_scatter_while(model_and_vars):
    """Train mode adds BN stat updates and DropPath bernoulli draws — still
    no data-movement ops allowed."""
    model, variables, x = model_and_vars

    def fwd(v, x, key):
        out, updates = model.apply(
            v, x, train=True, rngs={"dropout": key}, mutable=["batch_stats"]
        )
        return out, updates

    lowered = jax.jit(fwd).lower(variables, x, jax.random.PRNGKey(2))
    _assert_clean(lowered.as_text(), "train")


def test_single_mouse_forward_emits_no_gather_scatter_while(model_and_vars):
    """The predict path selects one readout by static index — must stay a
    static slice, never a dynamic gather."""
    model, variables, x = model_and_vars
    lowered = jax.jit(
        lambda v, x: model.apply(v, x, train=False, mouse_index=1)
    ).lower(variables, x)
    _assert_clean(lowered.as_text(), "single-mouse")
