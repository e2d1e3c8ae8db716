"""N-step lockstep training-dynamics parity vs the torch reference engine.

Forward goldens, gradient parity, optimizer parity, schedule closed forms
and EMA math are each pinned elsewhere — this suite pins the *composed
chain*: N lockstep iterations of the full jitted train step
(fwd -> MicePoissonLoss -> bwd -> AdamW(wd=0.05) under the warmup+cosine
plan -> EMA -> BN-stats carry) against the reference engine's own loop —
``MouseModel.train_step`` (/root/reference/src/argus_models.py:43-71,
incl. the ``deep_chunk`` iter_size path), ``ModelEma``
(/root/reference/src/ema.py:47-55), warmup ``LambdaLR`` +
``CosineAnnealingLR`` per /root/reference/scripts/train.py:122-134 — from
identical weights over identical precomputed batches (fp32, no AMP).
Trajectory "c" composes the engine-capability extensions into the same
chain: ``clip_grad_norm`` (torch ``clip_grad_norm_`` placement) and a
registry train-stage scheduler (``CosineAnnealingWarmRestarts``).
Error compounding (BN momentum, weight-decay/schedule coupling,
EMA-of-stats) is exactly what the per-link tests cannot see.

Fixture: ``tests/golden/dwiseneuro_lockstep.npz`` (regenerate with
``python tests/golden/generate_golden.py --lockstep``); the batch stream is
regenerated on both sides from ``tests/golden/lockstep_common.py``.

Observed drift (fp32 XLA vs fp32 torch CPU; full table in docs/PERF.md
"lockstep drift"): per-step |Δloss|/loss grows from ~1e-5 to a ~2e-4
plateau by step 20 — tracking, not diverging.  Parameter drift is
two-population: BN biases whose consumer is another normalization carry
analytically-zero gradients (see test_grad_parity.py), so Adam turns fp32
cancellation noise into a ±lr random walk on BOTH sides — |Δ| up to ~1e-2
≈ Σlr, in directions the next BN provably cancels — while every
real-gradient tensor stays within ~1e-3 abs.  The meaningful equivalence
for the no-op directions is FUNCTIONAL: the final models' eval forwards
agree to ~1.6e-3 rel (EMA: ~3e-5).  Tolerances are ~5x observed worst.
"""

import importlib.util
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sensorium_tpu.compat import convert_torch_state_dict
from sensorium_tpu.engine.losses import mice_poisson_loss
from sensorium_tpu.engine.optimizers import get_optimizer
from sensorium_tpu.engine.schedule import warmup_cosine
from sensorium_tpu.engine.state import TrainState
from sensorium_tpu.engine.steps import make_train_step
from sensorium_tpu.models.dwiseneuro import DwiseNeuro

GOLDEN_PATH = Path(__file__).parent / "golden" / "dwiseneuro_lockstep.npz"


def _load_common():
    spec = importlib.util.spec_from_file_location(
        "lockstep_common", Path(__file__).parent / "golden" / "lockstep_common.py"
    )
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


lc = _load_common()

MODEL_KWARGS = dict(
    readout_outputs=lc.READOUT_OUTPUTS,
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
    readout_outputs=list(lc.READOUT_OUTPUTS),
    num_core_blocks=2,
    num_cortex_layers=2,
    groups=2,
)


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN_PATH)


@pytest.fixture(scope="module")
def model():
    return DwiseNeuro(**MODEL_KWARGS)


def _convert(golden, model, prefix):
    return convert_torch_state_dict(
        {
            key[len(prefix) + 1 :]: golden[key]
            for key in golden.files
            if key.startswith(prefix + ":")
        },
        padded_group_size=model.padded_group_size,
        **CONVERT_KWARGS,
    )


def _trajectory_schedule(spec):
    """The trajectory's LR plan: default warmup+cosine, or the named
    registry scheduler for the train stage (trajectory "c")."""
    if "scheduler" in spec:
        from sensorium_tpu.engine.schedule import build_stage_schedule

        return build_stage_schedule(
            lc.PEAK_LR, lc.MIN_LR, spec["warmup_steps"], spec["cosine_steps"],
            scheduler_spec=spec["scheduler"],
        )
    return warmup_cosine(
        lc.PEAK_LR, lc.MIN_LR, spec["warmup_steps"], spec["cosine_steps"]
    )


def _run_trajectory(golden, model, name: str):
    spec = lc.TRAJECTORIES[name]
    num_steps = spec["warmup_steps"] + spec["cosine_steps"]
    inputs, targets, weights = lc.make_batches(num_steps, seed=31 + ord(name))
    compact = lc.compact_targets(targets, weights)

    params, batch_stats = _convert(golden, model, "sd0")
    schedule = _trajectory_schedule(spec)
    tx = get_optimizer(
        "AdamW", {"lr": lc.PEAK_LR, "weight_decay": lc.WEIGHT_DECAY}, learning_rate=schedule
    )
    if spec.get("grad_clip"):
        import optax

        from sensorium_tpu.engine.optimizers import clip_grad_norm

        tx = optax.chain(clip_grad_norm(spec["grad_clip"]), tx)
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)  # noqa: E731
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema_params=copy(params),
        ema_batch_stats=copy(batch_stats),
        rng=jax.random.PRNGKey(0),
    )
    step_fn = make_train_step(
        model,
        tx,
        mice_poisson_loss,
        ema_decay=lc.EMA_DECAY,
        iter_size=spec["iter_size"],
    )
    losses = []
    for k in range(num_steps):
        state, loss = step_fn(state, inputs[k], compact[k], weights[k])
        losses.append(float(loss))
    return state, np.array(losses)


@pytest.fixture(scope="module", params=["a", "b", "c"])
def trajectory(request, golden, model):
    name = request.param
    state, losses = _run_trajectory(golden, model, name)
    return name, state, losses


def test_applied_lr_plan_matches_torch(golden):
    """The recorded per-iteration LRs (torch scheduler chain) must equal
    the optax schedule at the same update counts — pins the composed
    warmup->cosine handoff, not just each stage's closed form."""
    for name, spec in lc.TRAJECTORIES.items():
        schedule = _trajectory_schedule(spec)
        expected = golden[f"{name}:lrs"]
        got = np.array([float(schedule(k)) for k in range(len(expected))])
        np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-12, err_msg=name)


def test_per_step_losses_track_torch(golden, trajectory):
    name, _, losses = trajectory
    expected = golden[f"{name}:losses"]
    assert losses.shape == expected.shape
    np.testing.assert_allclose(losses, expected, rtol=1e-3, err_msg=name)
    # The drift must also look like tracking, not slow divergence: even the
    # final quarter of the trajectory stays well inside the plateau band.
    rel = np.abs(losses - expected) / expected
    assert rel[-len(rel) // 4 :].max() < 1e-3, rel


def _assert_tree_close(got_tree, expected_tree, rtol, atol, label):
    flat_got = jax.tree_util.tree_flatten_with_path(got_tree)[0]
    flat_exp = dict(jax.tree_util.tree_flatten_with_path(expected_tree)[0])
    assert flat_got and len(flat_got) == len(flat_exp), label
    for path, value in flat_got:
        np.testing.assert_allclose(
            np.asarray(value),
            flat_exp[path],
            rtol=rtol,
            atol=atol,
            err_msg=f"{label}{path}",
        )


_BN_BIAS_ATOL = 3e-2  # noise-walk bound ~ Σ|lr| (see module docstring)


def _split_noise_population(tree):
    """Split params into (real-gradient tensors, BN-bias noise-walk ones).

    The noise population: any ``bias`` leaf of a BN whose output feeds
    another normalization before any nonlinearity consumes the shift —
    stem/pwl/shortcut BNs (grads are analytically zero there; see
    test_grad_parity.py docstring).  Readout/SE/expansion biases carry real
    gradients and stay in the tight population.
    """
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    tight, noise = {}, {}
    for path, value in flat:
        keys = [getattr(k, "key", str(k)) for k in path]
        is_bn_bias = keys[-1] == "bias" and any(
            k in ("bn", "stem_bn", "pwl_bn", "bn_sc") for k in keys[:-1]
        )
        (noise if is_bn_bias else tight)[jax.tree_util.keystr(path)] = np.asarray(value)
    return tight, noise


def test_final_params_match_torch(golden, model, trajectory):
    name, state, _ = trajectory
    expected_params, expected_stats = _convert(golden, model, f"{name}:sdF")
    got_tight, got_noise = _split_noise_population(state.params)
    exp_tight, exp_noise = _split_noise_population(expected_params)
    assert set(got_tight) == set(exp_tight) and set(got_noise) == set(exp_noise)
    for key in got_tight:
        np.testing.assert_allclose(
            got_tight[key], exp_tight[key], rtol=5e-3, atol=5e-3, err_msg=f"{name}{key}"
        )
    for key in got_noise:
        np.testing.assert_allclose(
            got_noise[key], exp_noise[key], atol=_BN_BIAS_ATOL, err_msg=f"{name}{key}"
        )
    # Running statistics inherit the noise-walk shifts of their inputs
    # (and the next BN cancels them the same way).
    _assert_tree_close(
        state.batch_stats, expected_stats, 1e-2, _BN_BIAS_ATOL, f"{name}:batch_stats"
    )


def test_final_ema_matches_torch(golden, model, trajectory):
    """The EMA tree (params AND BN statistics, decay 0.999) after N steps —
    the reference checkpoints exactly this tree (src/ema.py:61-73)."""
    name, state, _ = trajectory
    expected_params, expected_stats = _convert(golden, model, f"{name}:emaF")
    got_tight, got_noise = _split_noise_population(state.ema_params)
    exp_tight, exp_noise = _split_noise_population(expected_params)
    for key in got_tight:
        np.testing.assert_allclose(
            got_tight[key], exp_tight[key], rtol=5e-3, atol=1e-4, err_msg=f"{name}{key}"
        )
    for key in got_noise:
        np.testing.assert_allclose(
            # The EMA sees only (1-decay) of each live-step shift.
            got_noise[key], exp_noise[key], atol=1e-3, err_msg=f"{name}{key}"
        )
    _assert_tree_close(
        state.ema_batch_stats, expected_stats, 1e-2, 1e-3, f"{name}:ema_stats"
    )


def test_final_models_functionally_equivalent(golden, model, trajectory):
    """The decisive check for the noise-walk directions: an eval forward of
    OUR final model vs the reference's final weights (converted) must agree
    tightly — BN-bias shifts the next normalization cancels drop out here,
    so any REAL dynamics divergence would surface."""
    name, state, _ = trajectory
    probe = lc.make_batches(1, seed=99)[0][0]

    for label, got_vars, prefix, atol in [
        ("live", (state.params, state.batch_stats), f"{name}:sdF", 8e-2),
        ("ema", (state.ema_params, state.ema_batch_stats), f"{name}:emaF", 2e-3),
    ]:
        exp_params, exp_stats = _convert(golden, model, prefix)
        out_got = model.apply(
            {"params": got_vars[0], "batch_stats": got_vars[1]}, probe, train=False
        )
        out_exp = model.apply(
            {"params": exp_params, "batch_stats": exp_stats}, probe, train=False
        )
        np.testing.assert_allclose(
            np.asarray(out_got),
            np.asarray(out_exp),
            rtol=1e-2,
            atol=atol,
            err_msg=f"{name}:{label}",
        )
