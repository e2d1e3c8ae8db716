"""Training CLI — ``python -m sensorium_tpu.cli.train -e EXPERIMENT [-f FOLDS]``.

Flag and flow parity with ``/root/reference/scripts/train.py``: loads the
executable-Python experiment config, snapshots it into the experiment dir,
and trains the 7 CV folds sequentially (each holding one fold out).

TPU-first differences:
* the LR plan (linear warmup + cosine) is one optax schedule built from
  the stage plan, instead of argus LR callbacks;
* ``--mesh data[,model]`` shapes a device mesh for batch-DP (and optional
  TP); default is batch-DP over all local devices;
* ``--resume`` continues a fold from its ``train_state.ckpt`` (optimizer
  moments + RNG + step) — a capability the reference lacks;
* SIGTERM (TPU-VM preemption warning) saves the full train state and exits
  with code 75 (EX_TEMPFAIL); rerun with ``--resume`` to continue;
* ``--fold-procs N [--pin-chips]`` trains up to N independent CV folds
  concurrently, one single-chip subprocess per fold — the reference runs
  its 7 folds back-to-back on one GPU (12 h each);
* the data loader is the threaded mmap prefetcher, not worker processes.
"""

from __future__ import annotations

import argparse
import contextlib
import copy
import json
import shutil
from importlib.machinery import SourceFileLoader
from pathlib import Path

import jax

from sensorium_tpu import constants
from sensorium_tpu.data.datasets import TrainMiceDataset, ValMiceDataset
from sensorium_tpu.data.indexes import WindowIndexer
from sensorium_tpu.data.inputs import get_inputs_processor
from sensorium_tpu.data.loader import MiceDataLoader
from sensorium_tpu.data.mixers import CutMix
from sensorium_tpu.data.mouse_data import get_mouse_data
from sensorium_tpu.data.responses import get_responses_processor
from sensorium_tpu.engine.callbacks import (
    Checkpoint,
    LoggingToCSV,
    LoggingToFile,
    LoggingToJSONL,
    Timer,
)
from sensorium_tpu.engine import checkpoint as ckpt_module
from sensorium_tpu.engine.metrics import CorrelationMetric
from sensorium_tpu.engine.model import MouseModel, load_model
from sensorium_tpu.engine.preemption import PreemptionHandler, TrainingPreempted
from sensorium_tpu.engine.schedule import build_stage_schedule
from sensorium_tpu.parallel.mesh import create_hybrid_mesh, create_mesh
from sensorium_tpu.utils import get_best_model_path, get_lr


def parse_arguments():
    parser = argparse.ArgumentParser()
    parser.add_argument("-e", "--experiment", required=True, type=str)
    parser.add_argument("-f", "--folds", default="all", type=str)
    parser.add_argument("--mesh", default="data", type=str,
                        help="mesh axes: 'data' (batch DP), 'data,model' (DP+TP), "
                             "or 'replica,data[,model]' (multi-slice: DP across "
                             "slices over DCN, DP/TP within each slice on ICI)")
    parser.add_argument("--no-mesh", action="store_true",
                        help="single-device mode (no mesh)")
    parser.add_argument("--resume", action="store_true",
                        help="resume each fold from its train_state.ckpt")
    parser.add_argument("--async-checkpoint", action="store_true",
                        help="write checkpoints in a background thread (the "
                             "next epoch starts while the previous save hits disk)")
    parser.add_argument("--sharded-checkpoint", action="store_true",
                        help="resume state via orbax/tensorstore: every process "
                             "writes its own shards (required for cross-process "
                             "parameter sharding), restore places directly on the mesh")
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--debug-nans", action="store_true",
                        help="numerical sanitizer: raise (with traceback) at "
                             "the first NaN-producing op")
    parser.add_argument("--trace", default=None, type=str, metavar="DIR",
                        help="capture a jax.profiler device trace of the "
                             "first trained fold into DIR (use with a short "
                             "run: traces grow with wall time)")
    parser.add_argument("--fold-procs", default=1,
                        help="train up to N CV folds concurrently, one "
                             "subprocess per fold (the reference trains "
                             "folds sequentially); 'auto' probes the local "
                             "chip count; combine with --pin-chips on a "
                             "multi-chip TPU host")
    parser.add_argument("--pin-chips", action="store_true",
                        help="pin each fold subprocess to one TPU chip "
                             "(subprocess slot i -> chip i)")
    parser.add_argument("--multihost", default=None, type=str, metavar="SPEC",
                        help="multi-host data-parallel training via "
                             "jax.distributed: 'auto' (TPU pod metadata) or "
                             "'COORD_ADDR,NUM_PROCESSES,PROCESS_ID'; run the "
                             "same command on every host")
    return parser.parse_args()


def init_multihost(spec: str) -> None:
    """``jax.distributed.initialize`` from a CLI spec (before backend init).

    Batches stay GLOBAL: the seeded datasets produce identical arrays on
    every host and each process contributes its local device shards
    (``parallel.mesh.shard_batch``).  File artifacts (checkpoints, logs,
    config snapshots) are written by process 0 only.
    """
    from sensorium_tpu.parallel.multihost import init_from_spec

    init_from_spec(spec)


def probe_device_count() -> int:
    """Local accelerator count via the shared killable-subprocess probe
    (``sensorium_tpu.utils.misc.probe_jax_device_count``) — the parent
    must never initialize a backend itself."""
    from sensorium_tpu.utils.misc import probe_jax_device_count

    try:
        return probe_jax_device_count(timeout_s=300.0, strict=True)
    except RuntimeError as exc:
        if "timed out" in str(exc):
            raise RuntimeError(
                f"{exc} Pass an explicit --fold-procs N instead of auto"
            ) from None
        raise


def resolve_fold_procs(value) -> int:
    if value == "auto":
        count = probe_device_count()
        print(f"[fold-procs] auto: {count} local devices")
        return count
    return int(value)


def chip_pinning_env(slot: int) -> dict[str, str]:
    """Env that restricts a child process to TPU chip ``slot``.

    The standard 'multiple JAX processes on one TPU host' recipe: shrink
    the process topology to a single chip and make only that chip visible.
    Variable names cover the libtpu generations in circulation, including
    the older ones that additionally require an explicit single-process
    address table (``TPU_PROCESS_ADDRESSES``/``TPU_PROCESS_PORT``; each
    slot gets a distinct port so concurrent children never collide) and
    the ``TPU_CHIPS_PER_HOST_BOUNDS`` alias.
    """
    port = 8476 + slot
    return {
        "TPU_PROCESS_BOUNDS": "1,1,1",
        "TPU_CHIPS_PER_PROCESS_BOUNDS": "1,1,1",
        "TPU_CHIPS_PER_HOST_BOUNDS": "1,1,1",
        "TPU_VISIBLE_DEVICES": str(slot),
        "TPU_VISIBLE_CHIPS": str(slot),
        "TPU_PROCESS_ADDRESSES": f"localhost:{port}",
        "TPU_PROCESS_PORT": str(port),
        "CLOUD_TPU_TASK_ID": "0",
    }


def run_parallel_folds(args, folds_splits: list[str], experiment_dir: Path) -> None:
    """Train CV folds concurrently, one ``cli.train`` subprocess per fold.

    The folds of a CV experiment are fully independent (the reference runs
    them back-to-back on one GPU, 12 h each — ``scripts/train.py:178-189``);
    on an N-chip host they can run N at a time.  Each child is a plain
    single-device ``cli.train -f <fold>`` invocation whose stdout/stderr is
    teed to ``<fold_dir>/train_proc.log``; with ``--pin-chips`` child slot i
    only sees chip i.  The parent never initializes a JAX backend, so it
    holds no chip.

    Exit code propagation: 75 (EX_TEMPFAIL, preemption) if any child was
    preempted or the parent caught SIGTERM/SIGINT (children are SIGTERMed
    so they save their own resume state), 1 if any child failed, 0
    otherwise.
    """
    import os
    import signal
    import subprocess
    import sys
    import time

    if args.mesh != "data":
        print("[fold-procs] note: --mesh is ignored — each fold runs "
              "single-device by design")

    pending = list(folds_splits)
    running: dict = {}
    exit_codes: dict[str, int] = {}
    free_slots = list(range(max(1, args.fold_procs)))
    repo_root = Path(__file__).resolve().parent.parent.parent

    # Preemption: forward SIGTERM/SIGINT to the children (each saves its
    # own resume state and exits 75) and report 75 ourselves.
    terminated = {"signal": None}

    def on_signal(signum, frame):
        terminated["signal"] = signum
        for proc in list(running):
            proc.terminate()

    previous_handlers = {
        sig: signal.signal(sig, on_signal) for sig in (signal.SIGTERM, signal.SIGINT)
    }

    try:
        while (pending or running) and terminated["signal"] is None:
            while pending and free_slots and terminated["signal"] is None:
                fold = pending.pop(0)
                slot = free_slots.pop(0)
                cmd = [
                    sys.executable, "-m", "sensorium_tpu.cli.train",
                    "-e", args.experiment,
                    "-f", fold.removeprefix("fold_"),
                    "--seed", str(args.seed),
                    "--no-mesh",  # one fold <-> one device by design
                ]
                if args.resume:
                    cmd.append("--resume")
                if args.async_checkpoint:
                    cmd.append("--async-checkpoint")
                if args.sharded_checkpoint:
                    cmd.append("--sharded-checkpoint")
                if args.debug_nans:
                    cmd.append("--debug-nans")
                if args.trace and fold == folds_splits[0]:
                    # Match the documented (and sequential-path) behavior:
                    # trace only the FIRST trained fold, not all children.
                    cmd += ["--trace", str(Path(args.trace) / fold)]
                env = dict(os.environ)
                env["PYTHONPATH"] = os.pathsep.join(
                    [str(repo_root)] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
                )
                if args.pin_chips:
                    env.update(chip_pinning_env(slot))
                fold_dir = experiment_dir / fold
                fold_dir.mkdir(parents=True, exist_ok=True)
                logfile = open(fold_dir / "train_proc.log", "a")
                proc = subprocess.Popen(
                    cmd, env=env, stdout=logfile, stderr=subprocess.STDOUT
                )
                print(f"[fold-procs] started {fold} (pid {proc.pid}, slot {slot})")
                running[proc] = (fold, slot, logfile)

            time.sleep(0.5)
            for proc in [p for p in list(running) if p.poll() is not None]:
                fold, slot, logfile = running.pop(proc)
                logfile.close()
                free_slots.append(slot)
                exit_codes[fold] = proc.returncode
                print(f"[fold-procs] finished {fold} rc={proc.returncode}")
                if proc.returncode not in (0, 75) and args.pin_chips:
                    # Some libtpu generations ignore the TPU_VISIBLE_* pinning
                    # env and every child races for exclusive ownership of all
                    # chips; surface that failure mode instead of a bare rc.
                    try:
                        tail = (experiment_dir / fold / "train_proc.log").read_text()[-2000:]
                    except OSError:
                        tail = ""
                    if ("Unable to initialize backend" in tail
                            or "Device or resource busy" in tail
                            or "already in use" in tail):
                        print(
                            f"[fold-procs] {fold}: child backend init failed — "
                            "this libtpu may not honor the TPU_VISIBLE_DEVICES/"
                            "TPU_PROCESS_BOUNDS pinning env; retry without "
                            "--pin-chips (folds then run one at a time) or "
                            "with --fold-procs 1."
                        )

        # Parent preempted: wait for the signaled children to save their
        # resume state and exit, then reap them.  Re-signal first: a child
        # spawned in the window between Popen() and its `running[...] = `
        # registration never saw the handler's terminate().
        if terminated["signal"] is not None:
            for proc in list(running):
                if proc.poll() is None:
                    proc.terminate()
        for proc in list(running):
            fold, slot, logfile = running.pop(proc)
            try:
                exit_codes[fold] = proc.wait(timeout=120)
            except subprocess.TimeoutExpired:
                proc.kill()
                exit_codes[fold] = proc.wait()
            logfile.close()
    finally:
        for proc, (fold, _, logfile) in running.items():
            proc.terminate()
            logfile.close()
        for sig, handler in previous_handlers.items():
            signal.signal(sig, handler)

    if terminated["signal"] is not None:
        # Report what ACTUALLY happened per child: exit 75 confirms the
        # mid-epoch resume save; anything else (reap-timeout SIGKILL, a
        # child signaled mid-save, a crash) means its resume state may be
        # stale — claiming "children saved" unconditionally would have the
        # operator resume from a stale epoch believing progress was kept.
        saved = sorted(f for f, rc in exit_codes.items() if rc == 75)
        completed = sorted(f for f, rc in exit_codes.items() if rc == 0)
        unconfirmed = sorted(f for f, rc in exit_codes.items() if rc not in (0, 75))
        print(f"[fold-procs] caught signal {terminated['signal']}.")
        if completed:
            print(f"[fold-procs] completed before the signal: {completed}")
        if saved:
            print(f"[fold-procs] resume state saved (exit 75): {saved}")
        if unconfirmed:
            print(
                f"[fold-procs] resume state NOT confirmed for {unconfirmed} "
                "(killed or crashed before finishing the save) — --resume "
                "restarts those folds from their last completed save."
            )
        print("[fold-procs] rerun with --resume.")
        raise SystemExit(75)
    preempted = sorted(f for f, rc in exit_codes.items() if rc == 75)
    failed = sorted(f for f, rc in exit_codes.items() if rc not in (0, 75))
    if preempted:
        print(f"[fold-procs] preempted: {preempted}. Rerun with --resume.")
    if failed:
        print(f"[fold-procs] FAILED: {failed} (see <fold_dir>/train_proc.log)")
        raise SystemExit(1)
    if preempted:
        raise SystemExit(75)


def build_mesh(args):
    valid = ("data", "data,model", "replica,data", "replica,data,model")
    if args.mesh not in valid:
        # A typo must not silently fall back to a different sharding plan.
        raise SystemExit(
            f"--mesh {args.mesh!r}: expected 'data' (batch DP), 'data,model' "
            "(DP + tensor parallelism), or a 'replica,...'-prefixed variant "
            "(multi-slice: DP over DCN between slices, DP/TP on ICI within)"
        )
    if args.no_mesh or len(jax.devices()) == 1:
        return None
    devices = jax.devices()
    if args.mesh.startswith("replica"):
        # num_model parity must hold PER SLICE (the model axis is
        # intra-slice), not just globally: 2 slices x 3 chips is even
        # globally but cannot host a 2-way model axis.
        num_slices = len({getattr(d, "slice_index", 0) for d in devices})
        per_slice = len(devices) // num_slices
        num_model = 2 if "model" in args.mesh and per_slice % 2 == 0 else 1
        return create_hybrid_mesh(num_model=num_model)
    num_model = 2 if "model" in args.mesh and len(devices) % 2 == 0 else 1
    if num_model > 1:
        return create_mesh(num_model=num_model)
    return create_mesh()


def train_mouse(
    config: dict,
    save_dir: Path,
    train_splits: list[str],
    val_splits: list[str],
    mesh=None,
    seed: int = 0,
    resume: bool = False,
    async_checkpoint: bool = False,
    sharded_checkpoint: bool = False,
) -> MouseModel:
    config = copy.deepcopy(config)
    argus_params = config["argus_params"]

    model = MouseModel(argus_params, mesh=mesh)
    if config.get("ema_decay"):
        print("EMA decay:", config["ema_decay"])
        model.set_ema(config["ema_decay"])

    if "distill" in config:
        distill_params = config["distill"]
        teacher_dir = (
            constants.experiments_dir / distill_params["experiment"] / val_splits[0]
        )
        teacher_path = get_best_model_path(teacher_dir)
        if teacher_path is None:
            raise RuntimeError(f"No teacher checkpoint in '{teacher_dir}'")
        teacher = load_model(teacher_path)
        model.set_distill(
            teacher.nn_module,
            {
                "params": teacher.state.params,
                "batch_stats": teacher.state.batch_stats,
            },
            ratio=distill_params["ratio"],
        )
        print(f"Distillation model {teacher_path}, ratio {distill_params['ratio']}")

    indexer = WindowIndexer(**argus_params["frame_stack"])
    inputs_processor = get_inputs_processor(*argus_params["inputs_processor"])
    responses_processor = get_responses_processor(*argus_params["responses_processor"])
    cutmix = CutMix(**config["cutmix"]) if "cutmix" in config else None

    mouse_epoch_size = config["train_epoch_size"] // constants.num_mice
    train_mice_data = [get_mouse_data(mouse=m, splits=train_splits) for m in constants.mice]
    val_mice_data = [get_mouse_data(mouse=m, splits=val_splits) for m in constants.mice]

    train_dataset = TrainMiceDataset(
        train_mice_data, indexer, inputs_processor, responses_processor,
        mouse_epoch_size=mouse_epoch_size, mixer=cutmix, seed=seed,
    )
    val_dataset = ValMiceDataset(
        val_mice_data, indexer, inputs_processor, responses_processor
    )
    print("Train dataset len:", len(train_dataset))
    print("Val dataset len:", len(val_dataset))

    num_threads = config.get("num_dataloader_workers", 8)
    train_loader = MiceDataLoader(
        train_dataset, batch_size=config["batch_size"], shuffle=True,
        seed=seed, num_threads=num_threads, drop_last=True,
    )
    val_loader = MiceDataLoader(
        val_dataset,
        batch_size=config["batch_size"] // argus_params.get("iter_size", 1),
        num_threads=num_threads,
    )

    # One optax schedule for the whole stage plan (warmup ramp + cosine).
    iters_per_epoch = len(train_dataset) // config["batch_size"]
    stage_epochs = dict(zip(config["stages"], config["num_epochs"]))
    warmup_iters = iters_per_epoch * stage_epochs.get("warmup", 0)
    # The cosine (or registry scheduler) span covers EVERY post-warmup
    # epoch, not only a stage literally named "train" — a three-stage
    # plan ['warmup','train','tune'] decays across train+tune.
    post_warmup_epochs = sum(
        epochs for stage, epochs in stage_epochs.items() if stage != "warmup"
    )
    train_iters = iters_per_epoch * post_warmup_epochs
    peak_lr = argus_params["optimizer"][1]["lr"]
    min_lr = get_lr(config["min_base_lr"], config["batch_size"])
    schedule = build_stage_schedule(
        peak_lr, min_lr, warmup_iters, train_iters,
        scheduler_spec=config.get("lr_scheduler"),
    )

    model.build_state(seed=seed, learning_rate=schedule)
    if config.get("init_from"):
        # Warm-start from an inference checkpoint (converted reference
        # weights or a previous run's EMA save); optimizer/schedule stay
        # fresh.  See MouseModel.init_from_checkpoint.
        model.init_from_checkpoint(config["init_from"])
        print("Warm-start init from", config["init_from"])
    # ".orbax" routes resume state through the sharded (orbax) backend:
    # per-process shard writes, mesh-placed restore, no host gather.
    state_name = "train_state.orbax" if sharded_checkpoint else "train_state.ckpt"
    start_epoch = 0
    if resume:
        ckpt_path = save_dir / state_name
        if not ckpt_path.exists():
            # Allow switching formats between runs: fall back to whichever
            # resume state actually exists.
            for candidate in ("train_state.orbax", "train_state.ckpt"):
                if (save_dir / candidate).exists():
                    ckpt_path = save_dir / candidate
                    break
        local_epoch = -2  # sentinel: no checkpoint on this host
        if ckpt_path.exists():
            extra = model.load_train_state(ckpt_path)
            local_epoch = int(extra.get("epoch", -1))
        if jax.process_count() > 1:
            # The resume state is written by process 0 only; if the
            # experiment dir is not on storage shared by every host, the
            # other processes would silently restart from fresh-init
            # params while process 0 resumes — desynchronizing the
            # replicated state. Cross-check before training.
            import numpy as np
            from jax.experimental import multihost_utils

            epochs = np.asarray(
                multihost_utils.process_allgather(np.int64(local_epoch))
            ).ravel()
            if len(set(epochs.tolist())) > 1:
                raise RuntimeError(
                    "--resume sees inconsistent train_state.ckpt across "
                    f"hosts (per-process epochs {epochs.tolist()}, -2 = "
                    "missing); multihost resume requires the experiment "
                    "dir on storage shared by every process"
                )
        if local_epoch >= -1:
            start_epoch = local_epoch + 1
            print(f"Resumed from epoch {start_epoch}")

    save_dir.mkdir(parents=True, exist_ok=True)
    # Multi-process training: file artifacts (logs, checkpoints, preemption
    # state) are process-0's job; other hosts train the same global step.
    is_primary = jax.process_index() == 0
    # One handler spans all stages: a signal latched near a stage boundary
    # must not be lost when a per-stage handler scope ends.
    with PreemptionHandler() as preemption:
        stage_offset = 0  # global epoch index where the current stage starts
        for num_epochs, stage in zip(config["num_epochs"], config["stages"]):
            callbacks = [Timer()]
            if is_primary:
                callbacks += [
                    LoggingToFile(save_dir / "log.txt", append=True),
                    LoggingToCSV(save_dir / "log.csv", append=True),
                    LoggingToJSONL(save_dir / "log.jsonl", append=True),
                ]
            if stage != "warmup":
                if is_primary:
                    callbacks.append(
                        Checkpoint(
                            save_dir,
                            file_format="model-{epoch:03d}-{val_corr:.6f}.ckpt",
                            max_saves=1,
                            background=async_checkpoint,
                            train_state_name=state_name,
                        )
                    )
                elif sharded_checkpoint:
                    # An orbax save is a collective: every process must join
                    # the train-state write (each contributes its own
                    # shards).  The inference checkpoint stays process-0's.
                    callbacks.append(
                        Checkpoint(
                            save_dir,
                            save_model=False,
                            train_state_name=state_name,
                        )
                    )
            # Cumulative, not the warmup-only special case: a third stage
            # must start after ALL previous stages' epochs, or its global
            # epoch numbering collides and --resume skips it wholesale.
            stage_start = stage_offset
            stage_offset += num_epochs
            skip = max(0, start_epoch - stage_start)
            if skip >= num_epochs:
                print(f"Stage '{stage}' already completed, skipping")
                continue
            model.fit(
                train_loader,
                val_loader=val_loader,
                num_epochs=num_epochs - skip,
                callbacks=callbacks,
                metrics=[
                    CorrelationMetric(
                        num_neurons=list(argus_params["nn_module"][1]["readout_outputs"])
                    )
                ],
                stage=stage,
                start_epoch=stage_start + skip,
                preemption=preemption,
                preemption_save_path=(
                    save_dir / state_name
                    if (is_primary or sharded_checkpoint)
                    else None
                ),
            )
    # Join any in-flight background checkpoint write before the fold is
    # declared done (prediction immediately reads the best checkpoint back).
    ckpt_module.flush_pending_saves()
    return model


def main():
    import os

    from sensorium_tpu.utils.cache import enable_compilation_cache

    # Honor a platform override before any backend initialization (env
    # JAX_PLATFORMS alone is unreliable once a TPU plugin is installed).
    platform = os.environ.get("SENSORIUM_JAX_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)
    cpu_devices = os.environ.get("SENSORIUM_CPU_DEVICES")
    if cpu_devices:
        jax.config.update("jax_num_cpu_devices", int(cpu_devices))

    enable_compilation_cache()
    args = parse_arguments()
    print("Experiment:", args.experiment)

    if args.multihost:
        # Exclusivity checked on the RAW flag: resolving 'auto' spawns a
        # backend-holding probe subprocess, pointless on a doomed combo.
        if str(args.fold_procs) != "1":
            raise SystemExit("--multihost and --fold-procs are mutually exclusive")
        if args.no_mesh:
            raise SystemExit("--multihost requires a device mesh")
        if args.mesh != "data":
            print("Tensor parallelism across hosts is unsupported; using a "
                  "data-parallel mesh")
            args.mesh = "data"
        init_multihost(args.multihost)
        args.fold_procs = 1
    else:
        args.fold_procs = resolve_fold_procs(args.fold_procs)
    is_primary = args.multihost is None or jax.process_index() == 0

    config_path = constants.configs_dir / f"{args.experiment}.py"
    if not config_path.exists():
        raise RuntimeError(f"Config '{config_path}' does not exist")
    config = SourceFileLoader(args.experiment, str(config_path)).load_module().config

    experiment_dir = constants.experiments_dir / args.experiment
    experiment_dir.mkdir(parents=True, exist_ok=True)
    if is_primary:
        # Reproducibility snapshot (reference scripts/train.py:167-171): the
        # resolved config (JSON), the raw config source, and the train entry.
        with open(experiment_dir / "config.json", "w") as outfile:
            json.dump(config, outfile, indent=4, default=str)
        shutil.copy(config_path, experiment_dir / config_path.name)
        shutil.copy(Path(__file__).resolve(), experiment_dir / "train.py")

    if args.folds == "all":
        folds_splits = constants.folds_splits
    else:
        folds_splits = [f"fold_{fold}" for fold in args.folds.split(",")]

    if args.fold_procs > 1:
        # The parent must not touch a JAX backend: on TPU a process owns
        # every chip it initializes, which would starve the children.
        run_parallel_folds(args, folds_splits, experiment_dir)
        return

    mesh = build_mesh(args)
    if mesh is not None:
        print("Mesh:", dict(mesh.shape))

    if args.debug_nans:
        from sensorium_tpu.utils.profiling import debug_nans

        debug_nans(True)

    for fold_index, fold_split in enumerate(folds_splits):
        fold_dir = experiment_dir / fold_split
        val_splits = [fold_split]
        train_splits = sorted(set(constants.folds_splits) - set(val_splits))
        print(f"Val fold: {val_splits}, train folds: {train_splits}")
        trace_ctx = contextlib.nullcontext()
        if args.trace and fold_index == 0:
            from sensorium_tpu.utils.profiling import trace

            trace_ctx = trace(args.trace)
        try:
            with trace_ctx:
                train_mouse(
                    config, fold_dir, train_splits, val_splits,
                    mesh=mesh, seed=args.seed, resume=args.resume,
                    async_checkpoint=args.async_checkpoint,
                    sharded_checkpoint=args.sharded_checkpoint,
                )
        except TrainingPreempted as preempted:
            print(f"Preempted: {preempted}. Rerun with --resume to continue.")
            raise SystemExit(75)  # EX_TEMPFAIL


if __name__ == "__main__":
    main()
