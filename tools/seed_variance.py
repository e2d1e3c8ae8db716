"""Seed-variance study for the end-to-end learning-parity band.

Runs the synthetic quadrant-luminance learning recipe (the exact one in
``tests/test_learning.py``) across N seeds for BOTH stacks — the JAX engine
through the real ``train_mouse`` CLI flow, and the torch reference stack
(reference DwiseNeuro + init + MicePoissonLoss + EMA + LR plan from
``/root/reference``) — on the SAME fixed dataset, varying only the training
seed (init, sample order, dropout/droppath RNG).

Answers VERDICT r03 weak #5 / task 6: is the measured single-seed gap
(torch 0.131 vs jax 0.134 on 2026-08-19) bias or seed noise?  The result
table belongs in docs/PERF.md ("seed variance") and justifies the
tolerance in ``test_torch_reference_stack_learns_the_same``.

Usage:
    python tools/seed_variance.py [--seeds 0,1,2] [--json out.json]

CPU-only by design (SENSORIUM_JAX_PLATFORM=cpu is forced before any JAX
import): the recipe is tiny and the study's point is statistics, not speed.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time
from pathlib import Path

os.environ["SENSORIUM_JAX_PLATFORM"] = "cpu"
# Env vars are UNRELIABLE for platform selection when a TPU plugin is
# installed (JAX_PLATFORMS=axon is already exported here, so setdefault
# was a no-op and the study silently ran through the TPU tunnel).  The
# reliable way — same as tests/conftest.py — is jax.config.update as the
# first JAX statements in the process, BEFORE any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--seeds", default="0,1,2",
                        help="comma-separated training seeds (dataset stays fixed)")
    parser.add_argument("--json", default=None, help="also write results to this path")
    args = parser.parse_args()
    seeds = [int(s) for s in args.seeds.split(",") if s.strip()]

    from tests.test_learning import (
        learnable_environment,
        learning_config,
        run_jax_stack,
        run_torch_stack,
    )

    results: dict = {"seeds": seeds, "jax": {}, "torch": {}}
    with tempfile.TemporaryDirectory() as tmp:
        with learnable_environment(Path(tmp)):
            config = learning_config()
            for seed in seeds:
                start = time.perf_counter()
                _, jax_corr = run_jax_stack(config, seed=seed, run_name=f"seed{seed}")
                jax_s = time.perf_counter() - start
                start = time.perf_counter()
                torch_corr = run_torch_stack(config, seed=seed)
                torch_s = time.perf_counter() - start
                results["jax"][seed] = round(jax_corr, 4)
                results["torch"][seed] = round(torch_corr, 4)
                print(
                    f"seed {seed}: jax val_corr={jax_corr:.4f} ({jax_s:.0f}s) "
                    f"torch val_corr={torch_corr:.4f} ({torch_s:.0f}s)",
                    flush=True,
                )

    jax_vals = list(results["jax"].values())
    torch_vals = list(results["torch"].values())
    summary = {
        "jax_mean": round(statistics.mean(jax_vals), 4),
        "jax_spread": round(max(jax_vals) - min(jax_vals), 4),
        "torch_mean": round(statistics.mean(torch_vals), 4),
        "torch_spread": round(max(torch_vals) - min(torch_vals), 4),
        "mean_gap": round(
            abs(statistics.mean(jax_vals) - statistics.mean(torch_vals)), 4
        ),
        "max_pairwise_gap": round(
            max(abs(j - t) for j in jax_vals for t in torch_vals), 4
        ),
    }
    if len(seeds) >= 2:
        summary["jax_stdev"] = round(statistics.stdev(jax_vals), 4)
        summary["torch_stdev"] = round(statistics.stdev(torch_vals), 4)
    results["summary"] = summary
    print(json.dumps(results, indent=2))
    if args.json:
        Path(args.json).write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
