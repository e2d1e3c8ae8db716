"""End-to-end learning test: the full training system must actually learn.

Every other test checks mechanics (shapes, parity, loss decreasing on one
batch).  This one builds a synthetic dataset whose responses are a
deterministic function of the stimulus — each neuron fires proportionally
to the mean luminance of one video quadrant in the most recent frames —
trains the tiny model through the real CLI ``train_mouse`` flow (loader,
CutMix off, EMA, schedule, checkpointing), and asserts the held-out
correlation metric rises well above chance.  A broken gradient path,
shuffled targets, off-by-one window indexing, or metric bug all fail this.

The recipe runners (``run_jax_stack``/``run_torch_stack``) are module-level
so ``tools/seed_variance.py`` can drive the identical recipe across seeds
for the parity-band study (docs/PERF.md "seed variance").
"""

from __future__ import annotations

import contextlib
import importlib.util
from pathlib import Path

import numpy as np
import pytest

from sensorium_tpu import constants
from sensorium_tpu.data import mouse_data as mouse_data_mod

from tests.synthetic import tiny_experiment_config

TRIAL_LENGTH = 80
VIDEO_SHAPE = (12, 16)
NUM_NEURONS = 8  # 4 quadrants x 2 gains


def build_learnable_dataset(root, seed=0):
    """Responses = per-quadrant mean luminance (plus small noise)."""
    rng = np.random.default_rng(seed)
    height, width = VIDEO_SHAPE
    for mouse in constants.mice:
        mdir = root / mouse
        for sub in ("data/videos", "data/behavior", "data/pupil_center",
                    "data/responses", "meta/trials", "meta/neurons",
                    "meta/statistics/responses/all"):
            (mdir / sub).mkdir(parents=True, exist_ok=True)
        tiers = ["train"] * 7
        np.save(mdir / "meta/trials/tiers.npy", np.array(tiers))
        np.save(mdir / "meta/neurons/unit_ids.npy",
                np.arange(1, NUM_NEURONS + 1, dtype=np.int64))
        np.save(mdir / "meta/neurons/cell_motor_coordinates.npy",
                rng.uniform(0, 100, (NUM_NEURONS, 3)).astype(np.float32))
        np.save(mdir / "meta/statistics/responses/all/std.npy",
                np.ones((NUM_NEURONS, 1), np.float32))
        for trial_id in range(7):
            video = rng.uniform(0, 255, (height, width, TRIAL_LENGTH)).astype(np.float32)
            # Strong per-frame, per-quadrant brightness modulation: each
            # quadrant's luminance fluctuates ~50% frame to frame, so the
            # target carries a high-SNR stimulus-driven signal.
            gain = rng.uniform(0.2, 1.8, (2, 2, TRIAL_LENGTH)).astype(np.float32)
            video[: height // 2, : width // 2] *= gain[0, 0]
            video[: height // 2, width // 2 :] *= gain[0, 1]
            video[height // 2 :, : width // 2] *= gain[1, 0]
            video[height // 2 :, width // 2 :] *= gain[1, 1]
            video = np.clip(video, 0, 255)
            quads = [
                video[: height // 2, : width // 2],
                video[: height // 2, width // 2 :],
                video[height // 2 :, : width // 2],
                video[height // 2 :, width // 2 :],
            ]
            luminance = np.stack([q.mean(axis=(0, 1)) for q in quads])  # (4, T)
            responses = np.concatenate([luminance / 16.0, luminance / 32.0])
            responses = responses + rng.normal(0, 0.05, responses.shape)
            responses = np.maximum(responses, 0.0).astype(np.float32)
            np.save(mdir / f"data/videos/{trial_id}.npy", video)
            np.save(mdir / f"data/behavior/{trial_id}.npy",
                    rng.uniform(0, 5, (2, TRIAL_LENGTH)).astype(np.float32))
            np.save(mdir / f"data/pupil_center/{trial_id}.npy",
                    rng.uniform(50, 200, (2, TRIAL_LENGTH)).astype(np.float32))
            np.save(mdir / f"data/responses/{trial_id}.npy", responses)


@contextlib.contextmanager
def learnable_environment(tmp_path):
    """Point ``constants`` at a fresh quadrant-luminance dataset under
    ``tmp_path`` (and stub video pHashes so fold assignment is trivial)."""
    data_root = tmp_path / "sensorium_all_2023"
    if not data_root.exists():
        build_learnable_dataset(data_root)

    originals = {
        "sensorium_dir": constants.sensorium_dir,
        "experiments_dir": constants.experiments_dir,
        "predictions_dir": constants.predictions_dir,
    }
    constants.sensorium_dir = data_root
    constants.experiments_dir = tmp_path / "experiments"
    constants.predictions_dir = tmp_path / "predictions"

    original_phashes = mouse_data_mod.compute_video_phashes
    mouse_data_mod.compute_video_phashes = lambda mouse: np.arange(7, dtype=np.uint64)
    mouse_data_mod.get_folds_tiers.cache_clear()

    try:
        yield tmp_path
    finally:
        for name, value in originals.items():
            setattr(constants, name, value)
        mouse_data_mod.compute_video_phashes = original_phashes
        mouse_data_mod.get_folds_tiers.cache_clear()


@pytest.fixture(scope="module")
def learnable_env(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("learnable")
    with learnable_environment(tmp_path):
        yield tmp_path


def learning_config() -> dict:
    """The shared recipe: tiny config, CutMix off, 1 warmup + 11 train
    epochs — identical for the JAX engine and the torch reference stack."""
    config = tiny_experiment_config()
    nn_name, nn_kwargs = config["argus_params"]["nn_module"]
    config["argus_params"]["nn_module"] = (
        nn_name,
        dict(nn_kwargs, readout_outputs=[NUM_NEURONS] * constants.num_mice),
    )
    config["argus_params"]["optimizer"] = ("AdamW", {"lr": 3e-3, "weight_decay": 0.01})
    config["num_epochs"] = [1, 11]
    config["train_epoch_size"] = 480
    config["batch_size"] = 16
    config.pop("cutmix")  # clean signal: no mixing
    config["ema_decay"] = 0.7  # fast EMA so val sees the learned weights
    return config


def run_jax_stack(config: dict, seed: int = 0, run_name: str = "learn"):
    """Train the JAX engine through the real CLI flow (must be called
    inside ``learnable_environment``); return (first, final) val_corr."""
    from sensorium_tpu.cli.train import train_mouse

    save_dir = constants.experiments_dir / run_name / "fold_0"
    val_splits = ["fold_0"]
    train_splits = sorted(set(constants.folds_splits) - set(val_splits))
    train_mouse(config, save_dir, train_splits, val_splits, seed=seed)

    log = (save_dir / "log.csv").read_text().strip().splitlines()
    header = log[0].split(",")
    corr_idx = header.index("val_corr")
    first_corr = float(log[1].split(",")[corr_idx])
    final_corr = float(log[-1].split(",")[corr_idx])
    return first_corr, final_corr


@pytest.fixture(scope="module")
def jax_run(learnable_env):
    """Train the JAX engine once for the module; yield (first, final) corr."""
    return run_jax_stack(learning_config(), seed=0)


@pytest.mark.slow
def test_training_learns_held_out_responses(jax_run):
    first_corr, final_corr = jax_run
    # Chance level is ~0 (measured |corr| < 0.01 at init); this recipe
    # measured val_corr 0.13 at the final epoch (monotone from 0.002).
    assert final_corr > 0.08, f"val_corr stayed at {final_corr} (start {first_corr})"
    assert final_corr > first_corr + 0.05


REFERENCE = Path("/root/reference")


def _load_reference_module(name: str, rel_path: str):
    spec = importlib.util.spec_from_file_location(name, REFERENCE / rel_path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _reference_val_corr(model, val_loader, torch):
    """Reference CorrelationMetric semantics (src/metrics.py:34-82): per
    mouse flatten (B, N, T) -> (B*T, N) over masked samples, per-neuron
    corr over the sample axis (ddof 0, eps 1e-8), mean over neurons, then
    mean over mice."""
    per_mouse_pred = [[] for _ in range(constants.num_mice)]
    per_mouse_target = [[] for _ in range(constants.num_mice)]
    model.eval()
    with torch.no_grad():
        for batch in val_loader:
            preds = model(torch.from_numpy(np.asarray(batch.inputs)))
            for m in range(constants.num_mice):
                mask = batch.weights[:, m] != 0.0
                if not mask.any():
                    continue
                p = preds[m].numpy()[mask]  # (b, N, T)
                t = np.asarray(batch.targets)[mask][:, :NUM_NEURONS]
                per_mouse_pred[m].append(p.transpose(0, 2, 1).reshape(-1, p.shape[1]))
                per_mouse_target[m].append(
                    t.transpose(0, 2, 1).reshape(-1, t.shape[1])
                )
    corrs = []
    for m in range(constants.num_mice):
        if not per_mouse_pred[m]:
            continue
        x = np.concatenate(per_mouse_pred[m])
        y = np.concatenate(per_mouse_target[m])
        x = x - x.mean(axis=0)
        y = y - y.mean(axis=0)
        denom = x.std(axis=0) * y.std(axis=0) + 1e-8
        corrs.append(((x * y).mean(axis=0) / denom).mean())
    return float(np.mean(corrs))


def run_torch_stack(
    config: dict,
    seed: int = 0,
    initial_state_dict: dict | None = None,
    data_seed: int | None = None,
    per_epoch: bool = False,
):
    """Train the torch REFERENCE stack (its own DwiseNeuro + init_weights +
    MicePoissonLoss + train_step semantics from argus_models.py:43-71 +
    ModelEma + the warmup LambdaLR/CosineAnnealingLR plan) on the same
    recipe (must be called inside ``learnable_environment``); return the
    held-out EMA val_corr.  Data flows through this repo's loader, whose
    window/processor semantics are bit-parity-pinned elsewhere
    (test_data.py, test_fill_loader.py).

    ``initial_state_dict`` replaces ``init_weights`` with a fixed starting
    point; ``data_seed`` pins the dataset/loader seeds (default ``seed+1``,
    the historical offset — pass ``seed`` to match ``train_mouse``'s
    stream bit-for-bit for the deterministic parity harness);
    ``per_epoch=True`` returns the list of per-epoch EMA val_corr values
    instead of only the final one."""
    import torch
    from copy import deepcopy

    from sensorium_tpu.data.datasets import TrainMiceDataset, ValMiceDataset
    from sensorium_tpu.data.indexes import WindowIndexer
    from sensorium_tpu.data.inputs import get_inputs_processor
    from sensorium_tpu.data.loader import MiceDataLoader
    from sensorium_tpu.data.mouse_data import get_mouse_data
    from sensorium_tpu.data.responses import get_responses_processor
    from sensorium_tpu.utils.misc import get_lr

    argus_params = config["argus_params"]
    nn_kwargs = dict(argus_params["nn_module"][1])
    for jax_only in ("dtype", "readout_pad_multiple"):
        nn_kwargs.pop(jax_only, None)

    ref_model_mod = _load_reference_module("ref_dwiseneuro", "src/models/dwiseneuro.py")
    ref_utils = _load_reference_module("ref_utils", "src/utils.py")
    ref_losses = _load_reference_module("ref_losses", "src/losses.py")

    torch.manual_seed(seed)
    model = ref_model_mod.DwiseNeuro(**nn_kwargs)
    if initial_state_dict is None:
        ref_utils.init_weights(model)
    else:
        model.load_state_dict(initial_state_dict)
    ema = deepcopy(model)
    ema.eval()
    loss_mod = ref_losses.MicePoissonLoss()
    if data_seed is None:
        data_seed = seed + 1

    indexer = WindowIndexer(**argus_params["frame_stack"])
    inputs_processor = get_inputs_processor(*argus_params["inputs_processor"])
    responses_processor = get_responses_processor(*argus_params["responses_processor"])
    val_splits = ["fold_0"]
    train_splits = sorted(set(constants.folds_splits) - set(val_splits))
    train_mice = [get_mouse_data(mouse=m, splits=train_splits) for m in constants.mice]
    val_mice = [get_mouse_data(mouse=m, splits=val_splits) for m in constants.mice]
    train_dataset = TrainMiceDataset(
        train_mice, indexer, inputs_processor, responses_processor,
        mouse_epoch_size=config["train_epoch_size"] // constants.num_mice,
        mixer=None, seed=data_seed,
    )
    train_loader = MiceDataLoader(
        train_dataset, batch_size=config["batch_size"], shuffle=True, seed=data_seed,
        num_threads=2, drop_last=True,
    )
    val_loader = MiceDataLoader(
        ValMiceDataset(val_mice, indexer, inputs_processor, responses_processor),
        batch_size=config["batch_size"], num_threads=2,
    )

    iters_per_epoch = len(train_dataset) // config["batch_size"]
    warmup_epochs, train_epochs = config["num_epochs"]
    min_lr = get_lr(config["min_base_lr"], config["batch_size"])
    ema_decay = config["ema_decay"]

    opt_name, opt_kwargs = argus_params["optimizer"]
    opt = getattr(torch.optim, opt_name)(model.parameters(), **opt_kwargs)
    sched = torch.optim.lr_scheduler.LambdaLR(
        opt, lambda x: x / (warmup_epochs * iters_per_epoch)
    )
    curve = []
    for epoch in range(warmup_epochs + train_epochs):
        if epoch == warmup_epochs:
            sched = torch.optim.lr_scheduler.CosineAnnealingLR(
                opt, T_max=train_epochs * iters_per_epoch, eta_min=min_lr
            )
        train_loader.set_epoch(epoch)
        model.train()
        train_losses = []
        for batch in train_loader:
            opt.zero_grad()
            prediction = model(torch.from_numpy(np.asarray(batch.inputs)))
            # Compact targets hold each sample's own-mouse rows; the loss
            # masks by weights, so sharing the buffer across mice is exact
            # (all mice have NUM_NEURONS neurons here).
            target_list = [
                torch.from_numpy(np.asarray(batch.targets)[:, :NUM_NEURONS])
            ] * constants.num_mice
            weights = torch.from_numpy(np.asarray(batch.weights))
            loss = loss_mod(prediction, (target_list, weights))
            loss.backward()
            opt.step()
            train_losses.append(float(loss.detach()))
            with torch.no_grad():
                for e_v, m_v in zip(
                    ema.state_dict().values(), model.state_dict().values()
                ):
                    e_v.copy_(ema_decay * e_v + (1.0 - ema_decay) * m_v)
            sched.step()
        if per_epoch:
            # Per-epoch record mirroring the engine's log.csv columns so the
            # parity harness can localize a divergence (train step vs
            # eval/EMA vs metric).
            val_losses = []
            with torch.no_grad():
                for batch in val_loader:
                    preds = ema(torch.from_numpy(np.asarray(batch.inputs)))
                    tl = [
                        torch.from_numpy(np.asarray(batch.targets)[:, :NUM_NEURONS])
                    ] * constants.num_mice
                    w = torch.from_numpy(np.asarray(batch.weights))
                    val_losses.append(float(loss_mod(preds, (tl, w))))
            curve.append(
                {
                    "val_corr": _reference_val_corr(ema, val_loader, torch),
                    "train_loss": float(np.mean(train_losses)),
                    "val_loss": float(np.mean(val_losses)),
                }
            )

    if per_epoch:
        return curve
    return _reference_val_corr(ema, val_loader, torch)


@pytest.mark.slow
@pytest.mark.skipif(not REFERENCE.exists(), reason="reference repo not mounted")
def test_torch_reference_stack_learns_the_same(learnable_env, jax_run):
    """End-to-end learning parity: the torch reference stack trained on the
    same quadrant-luminance data for the same epochs must reach a held-out
    val_corr in the same band as the JAX engine — the whole-system proof
    that both stacks learn *the same*, not just learn (VERDICT r2 item 4)."""
    torch_corr = run_torch_stack(learning_config(), seed=0)
    _, jax_corr = jax_run
    print(f"learning parity: torch val_corr={torch_corr:.4f} jax val_corr={jax_corr:.4f}")
    assert torch_corr > 0.08, f"reference stack failed to learn: {torch_corr}"
    # Same band: both systems extract the same signal from the same data.
    # This stochastic pair differs in init + dropout/droppath streams, so
    # its band is seed noise (SEED_VARIANCE artifacts); the DETERMINISTIC
    # parity proofs live in the two tests below, backed by the measured
    # bounds in LEARNING_PARITY_r05.json / docs/PERF.md round-5 analysis.
    assert abs(torch_corr - jax_corr) < 0.06, (torch_corr, jax_corr)


@pytest.mark.slow
@pytest.mark.skipif(not REFERENCE.exists(), reason="reference repo not mounted")
def test_sgd_full_recipe_lockstep_parity(learnable_env):
    """THE deterministic engine-parity proof: shared torch init (imported
    through the real cli/import_torch -> config['init_from'] path),
    identical loader seeds, mixers off, drop rates 0, plain SGD — both
    stacks must track each other through the FULL 12-epoch recipe.
    Measured (LEARNING_PARITY_r05.json sgd_lockstep): final val_corr gap
    1.9e-7, max per-epoch train-loss gap 1.5e-5 over 360 steps — every
    subsystem except the adaptive optimizer pinned end-to-end.  Bands are
    ~1000x the measurement.  (With AdamW the same recipe reaches a stable
    ~0.02 endpoint offset — an fp32-x-adaptive-optimizer endpoint-selection
    effect, NOT an engine difference: forward/grad/optimizer maps are each
    pinned identical; see docs/PERF.md 'the 0.02 question'.)"""
    from tools.learning_parity import deterministic_config, export_shared_init

    config = deterministic_config()
    config["argus_params"] = dict(
        config["argus_params"], optimizer=("SGD", {"lr": 3e-3})
    )
    state_dict, ckpt = export_shared_init(config, learnable_env, seed=0)
    config["init_from"] = str(ckpt)
    _, jax_corr = run_jax_stack(config, seed=0, run_name="sgd_lockstep")
    torch_corr = run_torch_stack(
        config, seed=0, initial_state_dict=state_dict, data_seed=0
    )
    print(f"sgd lockstep: jax={jax_corr:.6f} torch={torch_corr:.6f}")
    assert abs(jax_corr - torch_corr) < 1e-3, (jax_corr, torch_corr)


@pytest.mark.slow
@pytest.mark.skipif(not REFERENCE.exists(), reason="reference repo not mounted")
def test_deterministic_adamw_endpoint_band(learnable_env):
    """Regression tripwire on the deterministic AdamW pair: shared init,
    identical data, no model RNG.  The measured endpoint offset is 0.0203
    (stable to ~1e-4 across 1-ULP init perturbation, AdamW eps, and every
    arithmetic control — LEARNING_PARITY_r05.json); the band is 2x that.
    Also pins the direction: the JAX endpoint must not fall materially
    below the torch endpoint (it measures 0.2014 vs 0.1811 — higher val
    corr AND lower train loss on this recipe)."""
    from tools.learning_parity import deterministic_config, export_shared_init

    config = deterministic_config()
    state_dict, ckpt = export_shared_init(config, learnable_env, seed=0)
    config["init_from"] = str(ckpt)
    _, jax_corr = run_jax_stack(config, seed=0, run_name="det_adamw")
    torch_corr = run_torch_stack(
        config, seed=0, initial_state_dict=state_dict, data_seed=0
    )
    print(f"deterministic adamw: jax={jax_corr:.6f} torch={torch_corr:.6f}")
    assert torch_corr > 0.1, f"torch stack failed to learn: {torch_corr}"
    assert abs(jax_corr - torch_corr) < 0.04, (jax_corr, torch_corr)
    assert jax_corr > torch_corr - 0.01, (jax_corr, torch_corr)
