"""Flagship-scale sharded-vs-unsharded numeric cross-check (one step).

The driver dryrun (``__graft_entry__.dryrun_multichip``) asserts only
loss-FINITENESS for the flagship — a second 182M-param compile would
double its wall-clock budget — and the sharded-vs-unsharded numeric parity
that runs in the test suite (``tests/test_parallel.py``) uses toy models.
This one-off tool closes the gap (VERDICT r04 "what's missing" #2): it
builds the PRODUCTION ``true_batch_001`` state twice — once sharded over a
``{data, model}`` mesh (batch-DP + tensor-parallel readout/cortex, the
exact ``cli/train.py --mesh`` plan), once on a single device — verifies
the two initial states are IDENTICAL, runs ONE train step on the
bit-identical batch and RNG on both, and reports max relative differences
of the loss and every param / EMA / optimizer-moment / BN-stat leaf.

Default geometry matches the driver dryrun (16x16 canvas / 4-frame clip
so the activation compute fits a 1-core host) — every PARAMETER shape, the
bf16 compute, remat plan, pad-128 stacked readout and the collective set
are production.  ``SENSORIUM_DRYRUN_FULL=1`` runs the full 64x64/16f
geometry.  ``SENSORIUM_DRYRUN_MODEL`` overrides the TP extent (default 4
on 8 devices, like the driver dryrun).

Usage:
    python tools/multichip_numeric.py [--devices 8] [--json MULTICHIP_NUMERIC_r05.json]

Runs in a fresh subprocess with a virtual N-CPU-device backend (the only
reliable way to get a device-count override with the axon TPU plugin
installed); pass ``--in-child`` only via the internal re-exec.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def child_main(n_devices: int, out_json: str | None, dtype: str | None = None) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n_devices)

    import numpy as np

    sys.path.insert(0, str(REPO))
    from importlib.machinery import SourceFileLoader

    from sensorium_tpu.engine.losses import get_loss
    from sensorium_tpu.engine.model import MouseModel
    from sensorium_tpu.engine.steps import make_train_step
    from sensorium_tpu.parallel.mesh import batch_sharding, create_mesh, data_extent
    from sensorium_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    config = SourceFileLoader(
        "true_batch_001", str(REPO / "configs" / "true_batch_001.py")
    ).load_module().config
    params = dict(config["argus_params"])
    if dtype:
        # fp32 control: removes bf16 backward rounding from the comparison,
        # isolating the collectives themselves.
        nn_name, nn_kwargs = params["nn_module"]
        params["nn_module"] = (nn_name, dict(nn_kwargs, dtype=dtype))
    if os.environ.get("SENSORIUM_DRYRUN_FULL", "0") not in ("", "0"):
        image = tuple(params["inputs_processor"][1]["size"])
        frame_stack = int(params["frame_stack"]["size"])
    else:
        image, frame_stack = (16, 16), 4
        params["inputs_processor"] = (
            params["inputs_processor"][0],
            {**params["inputs_processor"][1], "size": image},
        )
        params["frame_stack"] = {**params["frame_stack"], "size": frame_stack}

    num_model = int(os.environ.get("SENSORIUM_DRYRUN_MODEL", "0") or 0) or (
        4 if n_devices % 4 == 0 else (2 if n_devices % 2 == 0 else 1)
    )
    mesh = create_mesh(num_data=n_devices // num_model, num_model=num_model)
    batch = data_extent(mesh)

    readout_outputs = list(params["nn_module"][1]["readout_outputs"])
    num_mice, n_max = len(readout_outputs), max(readout_outputs)
    rng = np.random.default_rng(0)
    inputs = rng.uniform(0, 255, (batch, 5, frame_stack, image[1], image[0])).astype(
        np.float32
    )
    targets = rng.gamma(1.5, 1.0, (batch, n_max, frame_stack)).astype(np.float32)
    weights = np.zeros((batch, num_mice), np.float32)
    weights[np.arange(batch), np.arange(batch) % num_mice] = 1.0
    loss_fn = get_loss(*params["loss"])

    def one_step(mesh_or_none, tag):
        t0 = time.monotonic()
        model = MouseModel(params, mesh=mesh_or_none)
        model.set_ema(0.999)
        state = model.build_state(seed=0, learning_rate=1e-3)
        jax.block_until_ready(state.params)
        print(f"[numeric] {tag}: state built in {time.monotonic() - t0:.1f}s", flush=True)
        init_params = jax.device_get(state.params)
        if mesh_or_none is not None:
            sharding = batch_sharding(mesh_or_none)
            args = tuple(jax.device_put(a, sharding) for a in (inputs, targets, weights))
        else:
            args = (inputs, targets, weights)
        # donate=False: the fetched init tree must stay valid for the
        # initial-state identity check.
        step = make_train_step(
            model.nn_module, model.tx, loss_fn, ema_decay=0.999, donate=False,
            mesh=mesh_or_none,
        )
        t0 = time.monotonic()
        new_state, loss = step(state, *args)
        loss = float(jax.device_get(loss))
        jax.block_until_ready(new_state.params)
        print(
            f"[numeric] {tag}: step done in {time.monotonic() - t0:.1f}s "
            f"loss={loss:.6f}",
            flush=True,
        )
        fetched = {
            "params": jax.device_get(new_state.params),
            "ema_params": jax.device_get(new_state.ema_params),
            "batch_stats": jax.device_get(new_state.batch_stats),
            "opt_state": jax.device_get(
                jax.tree_util.tree_map(lambda x: x, new_state.opt_state)
            ),
        }
        return init_params, loss, fetched

    sharded_init, sharded_loss, sharded = one_step(mesh, f"sharded {dict(mesh.shape)}")
    single_init, single_loss, single = one_step(None, "single-device")

    # 1. Initial states must be IDENTICAL (seeded jit init is
    # sharding-invariant) — otherwise the one-step diff means nothing.
    init_max = 0.0
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(sharded_init),
        jax.tree_util.tree_leaves_with_path(single_init),
    ):
        d = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        init_max = max(init_max, d)
    if init_max != 0.0:
        raise RuntimeError(f"initial states differ (max abs {init_max})")

    # 2. Per-leaf relative diffs after one step, per collection.
    def leaf_diffs(tree_a, tree_b):
        rows = []
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(tree_a),
            jax.tree_util.tree_leaves_with_path(tree_b),
        ):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            if a.size == 0 or not np.issubdtype(a.dtype, np.floating):
                continue
            scale = float(np.max(np.abs(b)))
            max_abs = float(np.max(np.abs(a - b)))
            rows.append(
                {
                    "leaf": jax.tree_util.keystr(path),
                    "max_abs": max_abs,
                    "rel_to_scale": max_abs / scale if scale > 0 else max_abs,
                }
            )
        return rows

    collections = {}
    for name in ("params", "ema_params", "batch_stats", "opt_state"):
        rows = leaf_diffs(sharded[name], single[name])
        rows.sort(key=lambda r: r["max_abs"], reverse=True)
        collections[name] = {
            "num_leaves": len(rows),
            "max_abs": rows[0]["max_abs"] if rows else 0.0,
            "worst_leaves": rows[:5],
        }
    loss_rel = abs(sharded_loss - single_loss) / max(abs(single_loss), 1e-12)

    lr = 1e-3
    result = {
        "mesh": {"data": n_devices // num_model, "model": num_model},
        "geometry": {
            "batch": batch,
            "canvas": list(image),
            "frames": frame_stack,
            "full": os.environ.get("SENSORIUM_DRYRUN_FULL", "0") not in ("", "0"),
        },
        "config": "true_batch_001 (production parameter shapes, "
        f"{params['nn_module'][1].get('dtype', 'bfloat16')} compute, "
        "remat_blocks, pad-128 stacked readout)",
        "initial_state_identical": True,
        "loss": {"sharded": sharded_loss, "single": single_loss, "rel_diff": loss_rel},
        "collections": collections,
        "note": (
            "one production-shape train step from a verified-identical state. "
            "Interpretation: an AdamW FIRST step moves every coordinate by "
            "~±lr (m/(sqrt(v)+eps) ~= sign(g)), so the param/EMA diff bound "
            "is 2*lr, attained exactly on the analytically-zero-gradient BN "
            "bias coordinates whose cancellation-noise sign differs under "
            "the collectives' reduction order (the documented gauge "
            "directions — docs/PERF.md lockstep section); real-gradient "
            "coordinates keep their sign.  opt-state moments are REPORTED "
            "not gated: nu = 1e-3*g^2 amplifies per-element backward "
            "rounding noise of the compute dtype quadratically on "
            "cancellation-dominated elements (compare the bfloat16 vs "
            "float32 artifacts)."
        ),
        "date": time.strftime("%Y-%m-%d"),
    }
    print(json.dumps(result, indent=2))
    if out_json:
        Path(out_json).write_text(json.dumps(result, indent=2) + "\n")

    # Hard gates — generous vs expectation, tight vs "wrong math".
    if loss_rel > 1e-3:
        raise RuntimeError(f"sharded loss diverges: rel_diff={loss_rel}")
    for name, bound in (("params", 2.1 * lr), ("ema_params", 2.1 * lr),
                        ("batch_stats", 0.05)):
        if collections[name]["max_abs"] > bound:
            raise RuntimeError(
                f"sharded step diverges in {name}: "
                f"{collections[name]['worst_leaves'][0]} (bound {bound})"
            )
    print(
        f"multichip_numeric ok: loss_rel={loss_rel:.2e} "
        f"params_max_abs={collections['params']['max_abs']:.2e} "
        f"(2*lr sign-flip bound {2 * lr})"
    )


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--devices", default=8, type=int)
    parser.add_argument("--json", default=None)
    parser.add_argument("--dtype", default=None, choices=["bfloat16", "float32"],
                        help="override the compute dtype (float32 isolates the "
                             "collectives from bf16 backward rounding)")
    parser.add_argument("--in-child", action="store_true", help=argparse.SUPPRESS)
    args = parser.parse_args()

    if args.in_child:
        child_main(args.devices, args.json, dtype=args.dtype)
        return

    # Re-exec with a clean env: the jax.config calls in child_main must be
    # the first JAX statements in the process (see __graft_entry__).
    import subprocess

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    cmd = [
        sys.executable,
        os.path.abspath(__file__),
        "--devices",
        str(args.devices),
        "--in-child",
    ]
    if args.json:
        cmd += ["--json", args.json]
    if args.dtype:
        cmd += ["--dtype", args.dtype]
    proc = subprocess.Popen(
        cmd, env=env, cwd=str(REPO), stdout=None, stderr=None
    )
    sys.exit(proc.wait())


if __name__ == "__main__":
    main()
