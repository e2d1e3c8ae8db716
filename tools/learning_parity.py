"""Deterministic full-recipe learning parity: torch reference vs JAX engine.

The 5-seed variance study (SEED_VARIANCE_r04.json) could not distinguish
"no bias" from a 0.03 bias — seed noise (init + sample order + dropout
streams) dominated.  This harness removes every stochastic degree of
freedom so the val_corr gap isolates ENGINE NUMERICS:

* **shared init** — the torch reference model is initialized once
  (``torch.manual_seed`` + ``init_weights``, /root/reference/src/utils.py:46),
  saved as a reference-format ``.pth`` and imported into the JAX stack
  through the real ``cli/import_torch`` -> ``config["init_from"]``
  warm-start path (``compat/torch_weights.py``);
* **identical sample streams** — both stacks iterate this repo's
  ``MiceDataLoader`` with the SAME dataset/loader seeds and the same
  ``set_epoch`` plan, so every batch is bit-identical (the loader is
  deterministic in content and order regardless of thread count);
* **no RNG in the model** — mixers off, ``drop_rate=0``,
  ``drop_path_rate=0``: the only remaining difference between stacks is
  fp32 arithmetic (XLA:CPU vs torch CPU kernels, reduction orders).

Both stacks then run the full 12-epoch (1 warmup + 11 train) synthetic
quadrant-luminance recipe of ``tests/test_learning.py`` — the JAX engine
through the real ``train_mouse`` CLI flow, the torch stack through the
reference-semantics runner — and report per-epoch held-out EMA val_corr.

Usage:
    python tools/learning_parity.py [--json LEARNING_PARITY_r05.json]

Writes per-epoch curves, per-epoch |gap|, and the final gap; the measured
bound replaces the seed-noise band in
``tests/test_learning.py::test_torch_reference_stack_learns_the_same``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

os.environ["SENSORIUM_JAX_PLATFORM"] = "cpu"
# jax.config is the only reliable platform override with the axon TPU
# plugin installed (same as tests/conftest.py; see tools/seed_variance.py).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def deterministic_config() -> dict:
    """The learning recipe with every model-side RNG site disabled."""
    from tests.test_learning import learning_config

    config = learning_config()
    nn_name, nn_kwargs = config["argus_params"]["nn_module"]
    config["argus_params"]["nn_module"] = (
        nn_name,
        dict(nn_kwargs, drop_rate=0.0, drop_path_rate=0.0),
    )
    return config


def export_shared_init(config: dict, out_dir: Path, seed: int = 0):
    """Build + init the torch reference model; return (state_dict, ckpt).

    The state dict is saved as a reference-format ``.pth``
    (``{model_name, params, nn_state_dict}``, /root/reference/src/ema.py:61-73)
    and converted through the real ``cli/import_torch`` path so the JAX
    stack consumes exactly what a reference user's checkpoint would give.
    """
    import torch

    from sensorium_tpu.cli.import_torch import convert_checkpoint
    from tests.test_learning import _load_reference_module

    nn_kwargs = dict(config["argus_params"]["nn_module"][1])
    torch_kwargs = {
        k: v for k, v in nn_kwargs.items() if k not in ("dtype", "readout_pad_multiple")
    }
    ref_model_mod = _load_reference_module("ref_dwiseneuro", "src/models/dwiseneuro.py")
    ref_utils = _load_reference_module("ref_utils", "src/utils.py")

    torch.manual_seed(seed)
    model = ref_model_mod.DwiseNeuro(**torch_kwargs)
    ref_utils.init_weights(model)
    state_dict = model.state_dict()

    pth = out_dir / "shared_init.pth"
    torch.save(
        {
            "model_name": "MouseModel",
            "params": {"nn_module": config["argus_params"]["nn_module"]},
            "nn_state_dict": state_dict,
        },
        pth,
    )
    ckpt = out_dir / "shared_init.ckpt"
    convert_checkpoint(pth, ckpt)
    return state_dict, ckpt


def jax_epoch_curve(run_dir: Path) -> list[dict]:
    """Per-epoch {val_corr, train_loss, val_loss} from the run's log.csv."""
    lines = (run_dir / "log.csv").read_text().strip().splitlines()
    header = lines[0].split(",")
    idx = {k: header.index(k) for k in ("val_corr", "train_loss", "val_loss")}
    return [
        {k: float(line.split(",")[i]) for k, i in idx.items()} for line in lines[1:]
    ]


ULP = 1.2e-7  # one fp32 ULP, relative


def perturb_state_dict(state_dict: dict):
    """Copy with the stem conv weight scaled by (1 + 1 ULP) — the minimal
    fp32-representable perturbation of the starting point."""
    import torch

    out = {k: v.clone() for k, v in state_dict.items()}
    out["core.stem.0.weight"] = out["core.stem.0.weight"] * (1.0 + ULP)
    return out


def run_parity(seed: int = 0, control: bool = True, keep_dir: Path | None = None) -> dict:
    """Run both stacks from the shared init; return the result record.

    ``control=True`` additionally runs BOTH stacks from a 1-ULP-perturbed
    copy of the same init (4 runs total).  The within-stack gap between
    the unperturbed and perturbed runs is the CHAOS FLOOR of this recipe —
    the divergence a 1-ULP rounding difference alone produces through 360
    training steps.  A cross-stack gap at or below that floor means the
    engines are numerically equivalent: any systematic bias is smaller
    than one rounding error's downstream effect.

    Must NOT be called inside an existing ``learnable_environment`` — it
    opens its own.
    """
    import torch

    from sensorium_tpu import constants
    from tests.test_learning import (
        learnable_environment,
        run_jax_stack,
        run_torch_stack,
    )

    config = deterministic_config()
    results: dict = {
        "recipe": (
            "deterministic synthetic quadrant-luminance recipe "
            "(tests/test_learning.py): 1 warmup + 11 train epochs, shared "
            "torch init imported via cli/import_torch -> config['init_from'], "
            "identical MiceDataLoader seeds/order, mixers off, drop_rate=0, "
            "drop_path_rate=0 — the val_corr gap isolates engine numerics "
            "(fp32 XLA:CPU vs fp32 torch CPU)"
        ),
        "seed": seed,
    }
    curves: dict[str, list[float]] = {}
    timings: dict[str, float] = {}
    with tempfile.TemporaryDirectory() as tmp:
        tmp_path = Path(keep_dir) if keep_dir else Path(tmp)
        tmp_path.mkdir(parents=True, exist_ok=True)
        with learnable_environment(tmp_path):
            state_dict, ckpt = export_shared_init(config, tmp_path, seed=seed)
            inits = {"": (state_dict, ckpt)}
            if control:
                perturbed = perturb_state_dict(state_dict)
                pdir = tmp_path / "perturbed"
                pdir.mkdir(exist_ok=True)
                torch.save(
                    {
                        "model_name": "MouseModel",
                        "params": {"nn_module": config["argus_params"]["nn_module"]},
                        "nn_state_dict": perturbed,
                    },
                    pdir / "shared_init.pth",
                )
                from sensorium_tpu.cli.import_torch import convert_checkpoint

                pckpt = pdir / "shared_init.ckpt"
                convert_checkpoint(pdir / "shared_init.pth", pckpt)
                inits["_ulp"] = (perturbed, pckpt)

            for suffix, (sd, ck) in inits.items():
                run_config = dict(config, init_from=str(ck))
                start = time.perf_counter()
                run_jax_stack(run_config, seed=seed, run_name=f"parity{suffix}")
                timings[f"jax{suffix}"] = time.perf_counter() - start
                curves[f"jax{suffix}"] = jax_epoch_curve(
                    constants.experiments_dir / f"parity{suffix}" / "fold_0"
                )
                start = time.perf_counter()
                curves[f"torch{suffix}"] = run_torch_stack(
                    run_config,
                    seed=seed,
                    initial_state_dict=sd,
                    data_seed=seed,  # train_mouse seeds dataset+loader with `seed`
                    per_epoch=True,
                )
                timings[f"torch{suffix}"] = time.perf_counter() - start

            if control:
                # SGD LOCKSTEP: the identical full recipe with plain SGD —
                # removing only the adaptive optimizer.  Both stacks then
                # track each other to ~1e-6 across all 360 steps, proving
                # the ENTIRE remaining chain (data order, forward, backward,
                # loss, LR schedule, EMA, metric) is semantically identical
                # end-to-end; the AdamW-run endpoint offset is therefore an
                # optimizer-x-fp32 endpoint-selection effect, not an engine
                # difference (full analysis: docs/PERF.md round-5 section).
                sgd_config = dict(config, init_from=str(inits[""][1]))
                sgd_config["argus_params"] = dict(
                    config["argus_params"], optimizer=("SGD", {"lr": 3e-3})
                )
                run_jax_stack(sgd_config, seed=seed, run_name="parity_sgd")
                curves["jax_sgd"] = jax_epoch_curve(
                    constants.experiments_dir / "parity_sgd" / "fold_0"
                )
                curves["torch_sgd"] = run_torch_stack(
                    sgd_config,
                    seed=seed,
                    initial_state_dict=inits[""][0],
                    data_seed=seed,
                    per_epoch=True,
                )

                # ARITHMETIC control: the same torch stack, same init, same
                # data, with MKLDNN disabled — identical semantics, a
                # different conv arithmetic (algorithm/rounding).  The gap
                # this alone produces vs the MKLDNN run calibrates how far
                # one engine's attractor moves under an implementation-level
                # arithmetic change; a cross-stack gap of the same order is
                # precision, not semantics.
                torch.backends.mkldnn.enabled = False
                try:
                    start = time.perf_counter()
                    curves["torch_nomkldnn"] = run_torch_stack(
                        dict(config, init_from=str(inits[""][1])),
                        seed=seed,
                        initial_state_dict=inits[""][0],
                        data_seed=seed,
                        per_epoch=True,
                    )
                    timings["torch_nomkldnn"] = time.perf_counter() - start
                finally:
                    torch.backends.mkldnn.enabled = True

    def series(run, key):
        return [rec[key] for rec in curves[run]]

    def gap_curve(a, b, key="val_corr"):
        return [abs(x - y) for x, y in zip(series(a, key), series(b, key))]

    gaps = gap_curve("jax", "torch")
    results.update(
        {
            "jax_val_corr_per_epoch": [round(v, 6) for v in series("jax", "val_corr")],
            "torch_val_corr_per_epoch": [
                round(v, 6) for v in series("torch", "val_corr")
            ],
            "abs_gap_per_epoch": [round(g, 6) for g in gaps],
            "final_gap": round(gaps[-1], 6),
            "max_gap": round(max(gaps), 6),
            "first_epoch_gap": round(gaps[0], 6),
            "jax_final": round(series("jax", "val_corr")[-1], 6),
            "torch_final": round(series("torch", "val_corr")[-1], 6),
            # Divergence localization: if train/val losses TRACK while
            # val_corr does not, the offset lives in the eval/metric path,
            # not the training update.
            "jax_train_loss_per_epoch": [
                round(v, 6) for v in series("jax", "train_loss")
            ],
            "torch_train_loss_per_epoch": [
                round(v, 6) for v in series("torch", "train_loss")
            ],
            "train_loss_abs_gap_per_epoch": [
                round(g, 6) for g in gap_curve("jax", "torch", "train_loss")
            ],
            "jax_val_loss_per_epoch": [round(v, 6) for v in series("jax", "val_loss")],
            "torch_val_loss_per_epoch": [
                round(v, 6) for v in series("torch", "val_loss")
            ],
            "val_loss_abs_gap_per_epoch": [
                round(g, 6) for g in gap_curve("jax", "torch", "val_loss")
            ],
            "seconds": {k: round(v, 1) for k, v in timings.items()},
        }
    )
    if control:
        results["chaos_control"] = {
            "note": (
                "same stack, same data, init perturbed by 1 fp32 ULP on the "
                "stem conv weight — the divergence floor of the recipe itself"
            ),
            "torch_vs_torch_ulp_per_epoch": [
                round(g, 6) for g in gap_curve("torch", "torch_ulp")
            ],
            "jax_vs_jax_ulp_per_epoch": [
                round(g, 6) for g in gap_curve("jax", "jax_ulp")
            ],
            "torch_chaos_final": round(gap_curve("torch", "torch_ulp")[-1], 6),
            "jax_chaos_final": round(gap_curve("jax", "jax_ulp")[-1], 6),
            "cross_stack_gap_at_perturbed_init": round(
                gap_curve("jax_ulp", "torch_ulp")[-1], 6
            ),
            "jax_ulp_final": round(series("jax_ulp", "val_corr")[-1], 6),
            "torch_ulp_final": round(series("torch_ulp", "val_corr")[-1], 6),
        }
        results["sgd_lockstep"] = {
            "note": (
                "same recipe, plain SGD: both stacks lockstep end-to-end — "
                "every subsystem but the adaptive optimizer proven identical"
            ),
            "val_corr_gap_per_epoch": [
                round(g, 8) for g in gap_curve("jax_sgd", "torch_sgd")
            ],
            "final_val_corr_gap": round(gap_curve("jax_sgd", "torch_sgd")[-1], 8),
            "max_train_loss_gap": round(
                max(gap_curve("jax_sgd", "torch_sgd", "train_loss")), 8
            ),
            "jax_final": round(series("jax_sgd", "val_corr")[-1], 6),
            "torch_final": round(series("torch_sgd", "val_corr")[-1], 6),
        }
        results["arithmetic_control"] = {
            "note": (
                "same torch stack/init/data with MKLDNN disabled — identical "
                "semantics, different conv arithmetic; the attractor shift an "
                "implementation-level rounding change alone produces"
            ),
            "torch_vs_torch_nomkldnn_per_epoch": [
                round(g, 6) for g in gap_curve("torch", "torch_nomkldnn")
            ],
            "torch_nomkldnn_final": round(series("torch_nomkldnn", "val_corr")[-1], 6),
            "torch_arith_gap_final": round(
                gap_curve("torch", "torch_nomkldnn")[-1], 6
            ),
            "jax_vs_torch_nomkldnn_final_gap": round(
                gap_curve("jax", "torch_nomkldnn")[-1], 6
            ),
        }
    return results


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--json", default=None, help="also write results to this path")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument(
        "--no-control", action="store_true",
        help="skip the 1-ULP perturbed chaos-control runs (2 runs instead of 4)",
    )
    args = parser.parse_args()

    results = run_parity(seed=args.seed, control=not args.no_control)
    results["date"] = time.strftime("%Y-%m-%d")
    print(json.dumps(results, indent=2))
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
