"""Generate golden parity fixtures from the PyTorch reference implementation.

Run in an environment where the reference repo is available (read-only) at
``/root/reference``.  The produced ``dwiseneuro_small.npz`` captures, for a
small DwiseNeuro configuration:

* the reference-initialized torch state dict (flattened),
* an eval-mode forward (running BN stats),
* a train-mode forward (batch BN stats) and the post-forward state dict
  (to check running-stat updates),
* a single-mouse (index=1) eval forward.

The committed fixture lets the test suite verify bit-level behavioral
parity without needing torch's reference code at test time.
"""

import json
import sys
from pathlib import Path

import numpy as np

REFERENCE = "/root/reference"
OUT = Path(__file__).parent / "dwiseneuro_small.npz"
OUT_FLAGSHIP = Path(__file__).parent / "dwiseneuro_flagship.npz"

# The production true_batch_001 model (configs/true_batch_001.py:21-39 +
# constants.num_neurons), with dropout zeroed so eval/train forwards are
# deterministic — the golden pins shapes/slices/BN, not regularizer RNG.
FLAGSHIP_CFG = dict(
    readout_outputs=(7863, 7908, 8202, 7939, 8122, 7440, 7928, 8285, 7671, 7495),
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
)

SMALL_CFG = dict(
    readout_outputs=(11, 7, 10),
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
)


def flatten_state_dict(sd, prefix):
    return {
        f"{prefix}:{k}": v.detach().cpu().numpy().astype(np.float32)
        for k, v in sd.items()
        if v is not None and v.dtype.is_floating_point
    }


def load_reference_module(name: str, rel_path: str):
    """Load a reference file directly (src/__init__ pulls in unavailable deps)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, f"{REFERENCE}/{rel_path}")
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def main_flagship():
    """Flagship-config golden with procedural weights (small fixture).

    Weights are regenerated from (key, shape) on both sides — see
    ``procedural_weights.py`` — so the fixture stores only the input, the
    key/shape table, the forward outputs, and the post-forward BN stats.
    """
    import torch

    from procedural_weights import fill_state

    sys.path.insert(0, REFERENCE)
    TorchDwiseNeuro = load_reference_module(
        "ref_dwiseneuro", "src/models/dwiseneuro.py"
    ).DwiseNeuro

    torch.manual_seed(0)
    with torch.no_grad():
        model = TorchDwiseNeuro(**FLAGSHIP_CFG)
        meta = {
            k: tuple(v.shape)
            for k, v in model.state_dict().items()
            if v.dtype.is_floating_point
        }
        filled = fill_state(meta)
        sd = model.state_dict()
        for key, value in filled.items():
            sd[key].copy_(torch.from_numpy(value))

        rng = np.random.default_rng(11)
        x = (rng.normal(size=(2, 5, 16, 64, 64)) * 1.5).astype(np.float32)
        xt = torch.from_numpy(x)

        payload = {"input": x, "meta_json": np.array(json.dumps(meta))}

        model.eval()
        outs_eval = model(xt)
        out_mouse1 = model(xt, 1)
        for m, out in enumerate(outs_eval):
            payload[f"eval_out:{m}"] = out.numpy()
        payload["eval_mouse1"] = out_mouse1.numpy()

        model.train()
        outs_train = model(xt)
        for m, out in enumerate(outs_train):
            payload[f"train_out:{m}"] = out.numpy()
        payload.update(
            {
                f"sd1:{k}": v.detach().cpu().numpy().astype(np.float32)
                for k, v in model.state_dict().items()
                if "running_" in k
            }
        )

    np.savez_compressed(OUT_FLAGSHIP, **payload)
    print(f"Wrote {OUT_FLAGSHIP} ({OUT_FLAGSHIP.stat().st_size / 1e6:.2f} MB)")


OUT_IMPORT = Path(__file__).parent / "import_proof_flagship.npz"


def main_import_proof():
    """Golden for the production-shape checkpoint-import proof.

    Runs the reference's own sliding-window inference
    (predictors.py:36-55: stride-1 anchors, StackInputsProcessor,
    IndexesGenerator(16, 2, "last"), "ones" blend) with the flagship torch
    model on one synthetic trial, using the same procedural weights the
    test regenerates into a reference-style ``.pth``.
    """
    import torch

    from procedural_weights import fill_state

    sys.path.insert(0, REFERENCE)
    TorchDwiseNeuro = load_reference_module(
        "ref_dwiseneuro", "src/models/dwiseneuro.py"
    ).DwiseNeuro
    ref_inputs = load_reference_module("ref_inputs", "src/inputs.py")
    ref_indexes = load_reference_module("ref_indexes", "src/indexes.py")

    torch.manual_seed(0)
    with torch.no_grad():
        model = TorchDwiseNeuro(**FLAGSHIP_CFG)
        meta = {
            k: tuple(v.shape)
            for k, v in model.state_dict().items()
            if v.dtype.is_floating_point
        }
        sd = model.state_dict()
        for key, value in fill_state(meta).items():
            sd[key].copy_(torch.from_numpy(value))
        model.eval()

        rng = np.random.default_rng(21)
        length = 40  # 10 stride-1 anchors with the (16, 2, "last") window
        video = rng.uniform(0.0, 255.0, (36, 64, length)).astype(np.float32)
        behavior = rng.uniform(0.0, 8.0, (2, length)).astype(np.float32)
        pupil_center = rng.uniform(50.0, 200.0, (2, length)).astype(np.float32)
        mouse_index = 1

        # The reference predict_trial loop, verbatim semantics
        # (predictors.py:36-55) on the reference's own processor/indexer.
        processor = ref_inputs.StackInputsProcessor(size=(64, 64), pad_fill_value=0.0)
        gen = ref_indexes.IndexesGenerator(16, 2, "last")
        inputs = processor(video, behavior, pupil_center)
        responses = np.zeros(
            (FLAGSHIP_CFG["readout_outputs"][mouse_index], length), np.float32
        )
        blend = np.zeros(length, np.float32)
        for index in range(gen.behind, length - gen.ahead):
            idxs = gen.make_indexes(index)
            pred = model(inputs[:, idxs].unsqueeze(0), mouse_index)[0]
            responses[..., idxs] += pred.numpy()
            blend[idxs] += 1.0
        responses /= np.clip(blend, 1.0, None)

    payload = {
        "video": video,
        "behavior": behavior,
        "pupil_center": pupil_center,
        "prediction": responses,
        "mouse_index": np.array(mouse_index),
        "meta_json": np.array(json.dumps(meta)),
    }
    np.savez_compressed(OUT_IMPORT, **payload)
    print(f"Wrote {OUT_IMPORT} ({OUT_IMPORT.stat().st_size / 1e6:.2f} MB)")


OUT_GRADS = Path(__file__).parent / "dwiseneuro_small_grads.npz"


def main_gradients():
    """Backward-pass golden: torch autograd gradients of the mice Poisson
    loss through a train-mode forward (losses.py:5-21 + argus_models.py:43-57
    semantics, iter_size=1, no AMP).

    Pins the full backward chain — conv transposes, train-mode BN backward
    (batch statistics), SE gating, softplus, padded-readout slice — which
    the forward goldens cannot see.  Weights are the same seed-0
    reference init as ``dwiseneuro_small.npz`` but stored again here so the
    fixture is self-contained.
    """
    import torch

    sys.path.insert(0, REFERENCE)
    TorchDwiseNeuro = load_reference_module(
        "ref_dwiseneuro", "src/models/dwiseneuro.py"
    ).DwiseNeuro
    init_weights = load_reference_module("ref_utils", "src/utils.py").init_weights
    MicePoissonLoss = load_reference_module(
        "ref_losses", "src/losses.py"
    ).MicePoissonLoss

    torch.manual_seed(0)
    model = TorchDwiseNeuro(**SMALL_CFG)
    init_weights(model)
    model.train()

    rng = np.random.default_rng(7)
    x = (rng.normal(size=(2, 5, 8, 16, 16)) * 2.0).astype(np.float32)
    # Non-unit weights exercise the normalization; one nonzero mouse per
    # sample matches the compact-batch layout the TPU loss consumes.
    weights = np.array([[0.7, 0.0, 0.0], [0.0, 0.0, 1.3]], np.float32)
    targets = [
        rng.poisson(1.5, size=(2, n, 8)).astype(np.float32)
        for n in SMALL_CFG["readout_outputs"]
    ]
    # Zero-weight (batch, mouse) cells never contribute; blank them so the
    # fixture cannot accidentally pass through an unmasked-path bug.
    for m, t in enumerate(targets):
        t[weights[:, m] == 0.0] = 0.0

    prediction = model(torch.from_numpy(x))
    loss = MicePoissonLoss()(
        prediction,
        ([torch.from_numpy(t) for t in targets], torch.from_numpy(weights)),
    )
    loss.backward()

    payload = {"input": x, "weights": weights, "loss": np.float32(loss.item())}
    for m, t in enumerate(targets):
        payload[f"target:{m}"] = t
    payload.update(flatten_state_dict(model.state_dict(), "sd0"))
    for name, param in model.named_parameters():
        # A mouse with zero weight in every sample contributes no graph at
        # all in torch (losses.py:18 skips the cell), so its readout grad is
        # None — the TPU loss's weight-multiply gives exactly 0 there.
        grad = (
            param.grad.detach().cpu().numpy().astype(np.float32)
            if param.grad is not None
            else np.zeros(tuple(param.shape), np.float32)
        )
        payload[f"grad:{name}"] = grad

    np.savez_compressed(OUT_GRADS, **payload)
    print(f"Wrote {OUT_GRADS} ({OUT_GRADS.stat().st_size / 1e6:.2f} MB)")


OUT_LOCKSTEP = Path(__file__).parent / "dwiseneuro_lockstep.npz"


def main_lockstep():
    """N-step lockstep training-dynamics golden: the reference's COMPOSED
    engine chain run end-to-end in torch.

    Implements, exactly and in order, the per-iteration semantics of
    ``MouseModel.train_step`` (/root/reference/src/argus_models.py:43-71 —
    zero_grad, ``deep_chunk`` into ``iter_size`` chunks, per-chunk forward
    over all readouts + MicePoissonLoss/iter_size + backward, one optimizer
    step, then EMA), ``ModelEma.update`` over every state-dict value
    (/root/reference/src/ema.py:47-55, decay 0.999), and the LR plan of
    ``scripts/train.py:122-134`` (warmup ``LambdaLR(x/N)`` stepped per
    iteration, then a fresh ``CosineAnnealingLR(T_max, eta_min)``), with
    AdamW weight_decay=0.05 — from a fixed init over a fixed batch stream
    (``lockstep_common.make_batches``).  fp32, no AMP (TPU parity target is
    the bf16-less math).

    Records per-step losses and applied LRs plus the final model and EMA
    state dicts, so the JAX engine can be held to the whole trajectory —
    the error-compounding proof per-link tests cannot give.
    """
    from copy import deepcopy

    import torch

    import lockstep_common as lc

    sys.path.insert(0, REFERENCE)
    TorchDwiseNeuro = load_reference_module(
        "ref_dwiseneuro", "src/models/dwiseneuro.py"
    ).DwiseNeuro
    init_weights = load_reference_module("ref_utils", "src/utils.py").init_weights
    MicePoissonLoss = load_reference_module(
        "ref_losses", "src/losses.py"
    ).MicePoissonLoss

    torch.manual_seed(0)
    model = TorchDwiseNeuro(**SMALL_CFG)
    init_weights(model)
    sd0 = deepcopy(model.state_dict())

    payload = {}
    payload.update(flatten_state_dict(sd0, "sd0"))

    for name, spec in lc.TRAJECTORIES.items():
        num_steps = spec["warmup_steps"] + spec["cosine_steps"]
        iter_size = spec["iter_size"]
        inputs, targets, weights = lc.make_batches(num_steps, seed=31 + ord(name))

        model.load_state_dict(deepcopy(sd0))
        ema = deepcopy(model)
        ema.eval()
        loss_mod = MicePoissonLoss()
        opt = torch.optim.AdamW(
            model.parameters(), lr=lc.PEAK_LR, weight_decay=lc.WEIGHT_DECAY
        )
        # Warmup stage: argus LambdaLR(x / num_iterations) stepped per
        # iteration (lr == 0 at iteration 0).
        sched = torch.optim.lr_scheduler.LambdaLR(
            opt, lambda x: x / spec["warmup_steps"]
        )
        losses, lrs = [], []
        for k in range(num_steps):
            if k == spec["warmup_steps"]:
                # Train stage: fresh scheduler from the peak — the default
                # CosineAnnealingLR, or the trajectory's named torch
                # scheduler (trajectory "c": CosineAnnealingWarmRestarts).
                sched_name, sched_kwargs = spec.get(
                    "scheduler",
                    ("CosineAnnealingLR",
                     {"T_max": spec["cosine_steps"], "eta_min": lc.MIN_LR}),
                )
                sched = getattr(torch.optim.lr_scheduler, sched_name)(
                    opt, **sched_kwargs
                )
            model.train()
            opt.zero_grad()
            loss_value = 0.0
            chunk_in = torch.from_numpy(inputs[k]).chunk(iter_size)
            chunk_tg = [
                [torch.from_numpy(t[k]).chunk(iter_size)[c] for t in targets]
                for c in range(iter_size)
            ]
            chunk_w = torch.from_numpy(weights[k]).chunk(iter_size)
            for c in range(iter_size):
                prediction = model(chunk_in[c])
                loss = loss_mod(prediction, (chunk_tg[c], chunk_w[c])) / iter_size
                loss.backward()
                loss_value += loss.item()
            lrs.append(opt.param_groups[0]["lr"])
            if spec.get("grad_clip"):
                # Engine-capability composition (trajectory "c"): the raw
                # accumulated gradients are clipped by global L2 norm
                # immediately before the step, exactly where a torch recipe
                # calls clip_grad_norm_.
                torch.nn.utils.clip_grad_norm_(
                    model.parameters(), spec["grad_clip"]
                )
            opt.step()
            with torch.no_grad():
                for e_v, m_v in zip(
                    ema.state_dict().values(), model.state_dict().values()
                ):
                    e_v.copy_(lc.EMA_DECAY * e_v + (1.0 - lc.EMA_DECAY) * m_v)
            sched.step()
            losses.append(loss_value)

        payload[f"{name}:losses"] = np.array(losses, np.float64)
        payload[f"{name}:lrs"] = np.array(lrs, np.float64)
        payload.update(flatten_state_dict(model.state_dict(), f"{name}:sdF"))
        payload.update(flatten_state_dict(ema.state_dict(), f"{name}:emaF"))

    np.savez_compressed(OUT_LOCKSTEP, **payload)
    print(f"Wrote {OUT_LOCKSTEP} ({OUT_LOCKSTEP.stat().st_size / 1e6:.2f} MB)")


def main():
    import torch

    sys.path.insert(0, REFERENCE)
    TorchDwiseNeuro = load_reference_module(
        "ref_dwiseneuro", "src/models/dwiseneuro.py"
    ).DwiseNeuro
    init_weights = load_reference_module("ref_utils", "src/utils.py").init_weights

    torch.manual_seed(0)
    model = TorchDwiseNeuro(**SMALL_CFG)
    init_weights(model)

    rng = np.random.default_rng(1)
    x = (rng.normal(size=(2, 5, 8, 16, 16)) * 2.0).astype(np.float32)
    xt = torch.from_numpy(x)

    payload = {"input": x}
    payload.update(flatten_state_dict(model.state_dict(), "sd0"))

    model.eval()
    with torch.no_grad():
        outs_eval = model(xt)
        out_mouse1 = model(xt, 1)
    for m, out in enumerate(outs_eval):
        payload[f"eval_out:{m}"] = out.numpy()
    payload["eval_mouse1"] = out_mouse1.numpy()

    model.train()
    with torch.no_grad():
        outs_train = model(xt)
    for m, out in enumerate(outs_train):
        payload[f"train_out:{m}"] = out.numpy()
    payload.update(flatten_state_dict(model.state_dict(), "sd1"))

    np.savez_compressed(OUT, **payload)
    print(f"Wrote {OUT} ({OUT.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    if "--flagship" in sys.argv:
        main_flagship()
    elif "--import-proof" in sys.argv:
        main_import_proof()
    elif "--gradients" in sys.argv:
        main_gradients()
    elif "--lockstep" in sys.argv:
        main_lockstep()
    else:
        main()
