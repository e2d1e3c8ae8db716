"""The training engine: an argus-equivalent ``MouseModel``.

The reference delegates its fit/val loop to ``pytorch-argus`` and extends
it in ``src/argus_models.py``; this module provides the same capability
surface — registry-driven construction from the config's ``argus_params``
dict, ``fit``/``val``/``predict``, EMA, distillation, checkpointing — as a
thin host-side driver around jitted pure functions:

* one XLA executable per role (train step, val step, predict) built in
  ``sensorium_tpu.engine.steps``;
* the host loop only streams batches (prefetched, batch-sharded over the
  mesh) and runs callbacks/metrics at epoch boundaries;
* LR scheduling is an optax schedule over the global iteration counter,
  constructed once from the config's stage plan (warmup + cosine).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from sensorium_tpu.engine import checkpoint as ckpt
from sensorium_tpu.engine.callbacks import Callback, EngineState, build_logger
from sensorium_tpu.engine.losses import get_loss
from sensorium_tpu.engine.metrics import CorrelationMetric
from sensorium_tpu.engine.optimizers import clip_grad_norm, get_optimizer
from sensorium_tpu.engine.preemption import PreemptionHandler, TrainingPreempted
from sensorium_tpu.engine.state import TrainState
from sensorium_tpu.engine.steps import make_predict_step, make_train_step, make_val_step
from sensorium_tpu.models.dwiseneuro import neuron_validity_mask
from sensorium_tpu.models.registry import get_nn_module
from sensorium_tpu.parallel import mesh as mesh_lib
from sensorium_tpu.utils.profiling import annotate


class MouseModel:
    """Registry-built model + training state + jitted step functions.

    ``params`` is the argus-style dict from the experiment config
    (reference: configs/true_batch_001.py:20-62): ``nn_module``, ``loss``,
    ``optimizer``, ``frame_stack``, ``inputs_processor``,
    ``responses_processor``, ``iter_size``, ``amp``.
    """

    def __init__(self, params: dict, mesh=None):
        self.params = params
        nn_name, nn_params = params["nn_module"]
        self.nn_module = get_nn_module(nn_name, nn_params)
        loss_name, loss_params = params.get("loss", ("mice_poisson", {}))
        # (M, N_max) real-neuron mask so log_input=True Poisson forms stay
        # exact under the padded batch layout (see losses.get_loss).
        outputs = getattr(self.nn_module, "readout_outputs", None)
        neuron_mask = neuron_validity_mask(outputs) if outputs is not None else None
        self.loss_fn = get_loss(loss_name, loss_params, neuron_mask=neuron_mask)
        self.optimizer_spec = params.get("optimizer", ("AdamW", {"lr": 1e-3}))
        # Optional global-norm gradient clipping (torch clip_grad_norm_
        # semantics); 0/absent = off, matching the reference recipe.
        self.grad_clip = float(params.get("grad_clip", 0.0) or 0.0)
        self.iter_size = int(params.get("iter_size", 1))
        self.mesh = mesh
        # A (data, model) mesh means DP+TP: parameter placement in
        # build_state/load follows parallel.mesh.param_sharding_rules.
        self.tensor_parallel = bool(
            mesh is not None and mesh.shape.get("model", 1) > 1
        )

        self.ema_decay: float = 0.0
        self.distill_ratio: float = 0.0
        self.teacher_module = None
        self.teacher_vars = None

        self.state: TrainState | None = None
        self.tx: optax.GradientTransformation | None = None
        self.schedule = None
        self._train_step = None
        self._val_step = None
        self._predict_steps: dict[Any, Any] = {}
        self._metric_stats_fns: dict[int, Any] = {}
        self.logger = build_logger()

    # ---------------------------------------------------------------- setup

    def example_input(self, batch_size: int = 1) -> np.ndarray:
        frame_stack = self.params.get("frame_stack", {"size": 16})
        size = self.params.get("inputs_processor", ("stack_inputs", {}))[1].get(
            "size", (64, 64)
        )
        in_channels = self.params["nn_module"][1].get("in_channels", 5)
        # inputs_processor size is (width, height) but batch arrays are
        # (..., height, width) — see StackInputsProcessor.
        return np.zeros(
            (batch_size, in_channels, frame_stack["size"], size[1], size[0]), np.float32
        )

    def set_ema(self, decay: float) -> None:
        """Set (or change) the EMA decay; safe before OR after build_state.

        The decay is baked into the jitted train step, so the cached step
        is invalidated; when state already exists, the EMA trees are
        created (a copy of the live values, ModelEma semantics) or dropped
        to match, preserving device placement.
        """
        decay = float(decay)
        if decay == self.ema_decay:
            return
        self.ema_decay = decay
        self._train_step = None
        if self.state is None:
            return
        if decay > 0.0 and self.state.ema_params is None:
            copy_tree = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))
            self.state = self.state.replace(
                ema_params=copy_tree(self.state.params),
                ema_batch_stats=copy_tree(self.state.batch_stats),
            )
        elif decay == 0.0:
            self.state = self.state.replace(ema_params=None, ema_batch_stats=None)

    def set_distill(self, teacher_module, teacher_vars: dict, ratio: float) -> None:
        """Attach a frozen teacher whose predictions fill unlabeled cells."""
        self.teacher_module = teacher_module
        self.teacher_vars = mesh_lib.shard_params(
            self.mesh, teacher_vars, tensor_parallel=self.tensor_parallel
        )
        self.distill_ratio = float(ratio)
        self._train_step = None

    def build_state(self, seed: int = 0, learning_rate=None) -> TrainState:
        """Initialize parameters, optimizer and (optional) EMA trees.

        The whole construction runs as two jitted calls (init+optimizer,
        then the EMA copy) rather than eager op-by-op: flax ``init`` plus
        ``tx.init`` otherwise dispatch thousands of individual device ops —
        minutes over a remote-execution tunnel — and jitting also makes the
        init hit the persistent compilation cache.
        """
        opt_name, opt_params = self.optimizer_spec
        self.schedule = learning_rate if callable(learning_rate) else None
        self.tx = get_optimizer(opt_name, opt_params, learning_rate=learning_rate)
        if self.grad_clip > 0.0:
            self.tx = optax.chain(clip_grad_norm(self.grad_clip), self.tx)

        @jax.jit
        def make(example):
            init_rng, train_rng = jax.random.split(jax.random.PRNGKey(seed))
            variables = self.nn_module.init(
                {"params": init_rng, "dropout": init_rng}, example, train=False
            )
            params = variables["params"]
            batch_stats = variables.get("batch_stats", {})
            return params, batch_stats, self.tx.init(params), train_rng

        params, batch_stats, opt_state, train_rng = make(self.example_input())

        use_ema = self.ema_decay > 0.0
        ema_params = ema_batch_stats = None
        if use_ema:
            # Initialize the EMA to a copy of the live values (ModelEma's
            # deepcopy, /root/reference/src/ema.py) via a separate jit call
            # so the EMA buffers never alias the live params (the donated
            # train step requires distinct buffers).
            copy_tree = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))
            ema_params = copy_tree(params)
            ema_batch_stats = copy_tree(batch_stats)

        self.state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            ema_params=ema_params,
            ema_batch_stats=ema_batch_stats,
            rng=train_rng,
        )
        self.state = mesh_lib.shard_state(self.mesh, self.state, self.tensor_parallel)
        self._train_step = None
        self._val_step = None
        return self.state

    def init_from_checkpoint(self, file_path) -> None:
        """Warm-start: replace the freshly built weights (and EMA copies)
        with those of an inference checkpoint, keeping optimizer state,
        step count and schedule at zero.

        Fine-tune entry the reference lacks (its only checkpoint loads are
        full ``argus.load_model`` for inference/teachers,
        /root/reference/src/predictors.py:25, scripts/train.py:62): any
        converted reference checkpoint (``cli/import_torch``) or previous
        EMA checkpoint becomes the initialization of a new training run via
        ``config["init_from"]``.  Also the backbone of the deterministic
        learning-parity harness (tools/learning_parity.py), which trains
        both stacks from one shared torch init.
        """
        if self.state is None:
            raise RuntimeError("Call build_state() before init_from_checkpoint()")
        payload = ckpt.load_model_checkpoint(file_path)
        nn_state = payload["nn_state"]

        def take(new, old):
            new = jnp.asarray(new)
            if new.shape != old.shape:
                raise ValueError(
                    f"init_from checkpoint leaf shape {new.shape} does not "
                    f"match the built model's {old.shape} — config/checkpoint "
                    "architecture mismatch"
                )
            return new.astype(old.dtype)

        params = jax.tree_util.tree_map(take, nn_state["params"], self.state.params)
        batch_stats = jax.tree_util.tree_map(
            take, nn_state.get("batch_stats", {}), self.state.batch_stats
        )
        replace = dict(params=params, batch_stats=batch_stats)
        if self.state.ema_params is not None:
            # Distinct buffers: the donated train step must never alias
            # the EMA trees with the live ones (same rule as build_state).
            copy_tree = jax.jit(lambda t: jax.tree_util.tree_map(jnp.copy, t))
            replace.update(
                ema_params=copy_tree(params), ema_batch_stats=copy_tree(batch_stats)
            )
        self.state = self.state.replace(**replace)
        self.state = mesh_lib.shard_state(self.mesh, self.state, self.tensor_parallel)

    # ---------------------------------------------------------------- steps

    def _ensure_train_step(self):
        if self._train_step is None:
            if self.tx is None:
                raise RuntimeError("Call build_state() before training")
            self._train_step = make_train_step(
                self.nn_module,
                self.tx,
                self.loss_fn,
                ema_decay=self.ema_decay,
                iter_size=self.iter_size,
                distill_ratio=self.distill_ratio,
                teacher_model=self.teacher_module,
                mesh=self.mesh,
            )
        return self._train_step

    def _ensure_val_step(self):
        if self._val_step is None:
            self._val_step = make_val_step(self.nn_module, self.loss_fn)
        return self._val_step

    def _metric_stats(self, metric):
        """Jitted per-batch sufficient-statistics reducer for a metric.

        Keyed by the underlying ``batch_stats`` function (NOT ``id(metric)``
        — object ids are recycled after garbage collection, which could
        hand a future metric a stale reducer)."""
        key = metric.batch_stats
        if key not in self._metric_stats_fns:
            self._metric_stats_fns[key] = jax.jit(key)
        return self._metric_stats_fns[key]

    def _stage_inputs(self, inputs):
        """Cast inputs to the model's compute dtype BEFORE host->device
        staging.  Bit-identical when the model computes in bf16: its first
        op is ``.astype(self.dtype)`` (models/dwiseneuro.py — the transpose
        then cast), and ml_dtypes' host cast uses the same
        round-to-nearest-even, so this only moves the cast across the
        transfer — halving the dominant staging buffer (a (32,5,16,64,64)
        f32 batch is 42 of the 56 MB staged per step).  fp32 models (golden
        parity, imports) stage untouched; ``SENSORIUM_STAGE_BF16=0``
        disables.

        Already-device-resident inputs (jax.Array) pass through untouched:
        the model casts on device anyway, and a host round-trip here would
        silently re-download the batch (catastrophic through a remote
        tunnel — bench.py --fit's device-resident mode relies on this).
        """
        import os

        if isinstance(inputs, jax.Array):
            return inputs

        def _is_bf16(module):
            d = getattr(module, "dtype", None)
            return d is not None and jnp.dtype(d) == jnp.dtype(jnp.bfloat16)

        if (
            _is_bf16(self.nn_module)
            # The staged inputs also feed the distillation teacher
            # (steps.py make_train_step); a non-bf16 teacher would see
            # pre-quantized inputs, changing its predictions — stage f32.
            and (self.teacher_module is None or _is_bf16(self.teacher_module))
            and os.environ.get("SENSORIUM_STAGE_BF16", "1") != "0"
        ):
            return np.asarray(inputs).astype(jnp.bfloat16)
        return inputs

    def _pad_batch_to_mesh(self, inputs, targets, weights):
        """Zero-weight-pad a ragged EVAL batch up to the data-axis multiple.

        Exact for evaluation by construction: ``MicePoissonLoss``
        normalizes the weight matrix to sum 1 (zero-weight rows contribute
        nothing), the correlation metric masks samples by ``weights != 0``,
        and eval-mode BN uses running statistics, so padded rows never leak
        into any reported number.  NOT used for training steps — there
        batch statistics are computed over every row, so a ragged train
        batch must be dropped (``drop_last=True``), not padded.
        """
        if self.mesh is None:
            return inputs, targets, weights
        num_data = mesh_lib.data_extent(self.mesh)
        remainder = (-inputs.shape[0]) % num_data
        if remainder == 0:
            return inputs, targets, weights

        def pad(a):
            a = np.asarray(a)
            return np.concatenate(
                [a, np.zeros((remainder,) + a.shape[1:], a.dtype)], axis=0
            )

        return pad(inputs), pad(targets), pad(weights)

    def train_step(self, batch) -> float:
        step = self._ensure_train_step()
        if self.mesh is not None:
            num_data = mesh_lib.data_extent(self.mesh)
            if batch.inputs.shape[0] % num_data:
                raise ValueError(
                    f"Train batch of {batch.inputs.shape[0]} does not divide "
                    f"the data axis ({num_data}); use drop_last=True — "
                    "padding would alter BN batch statistics"
                )
        inputs, targets, weights = mesh_lib.shard_batch(
            self.mesh, self._stage_inputs(batch.inputs), batch.targets, batch.weights
        )
        if self.distill_ratio > 0.0:
            self.state, loss = step(self.state, inputs, targets, weights, self.teacher_vars)
        else:
            self.state, loss = step(self.state, inputs, targets, weights)
        return loss

    def val_step(self, batch):
        """Returns (loss, prediction, device_targets, device_weights) — the
        staged batch tensors are handed back so metric statistics can be
        computed on device without a second host->device upload."""
        step = self._ensure_val_step()
        inputs, targets, weights = mesh_lib.shard_batch(
            self.mesh,
            *self._pad_batch_to_mesh(
                self._stage_inputs(batch.inputs), batch.targets, batch.weights
            ),
        )
        loss, prediction = step(
            self.state.eval_params, self.state.eval_batch_stats, inputs, targets, weights
        )
        return loss, prediction, targets, weights

    def predict(self, inputs, mouse_index: int | None = None):
        """Inference forward on the eval (EMA) weights."""
        if mouse_index not in self._predict_steps:
            self._predict_steps[mouse_index] = make_predict_step(
                self.nn_module, mouse_index
            )
        inputs = np.asarray(inputs, np.float32)
        squeeze = inputs.ndim == 4
        if squeeze:
            inputs = inputs[None]
        prediction = self._predict_steps[mouse_index](
            self.state.eval_params, self.state.eval_batch_stats, inputs
        )
        if squeeze:
            # Single-mouse output is (B, N, T); all-mice is (M, B, N_max, T).
            return prediction[0] if mouse_index is not None else prediction[:, 0]
        return prediction

    # ------------------------------------------------------------------ fit

    def fit(
        self,
        train_loader,
        val_loader=None,
        num_epochs: int = 1,
        callbacks: Sequence[Callback] = (),
        metrics: Sequence[CorrelationMetric] = (),
        stage: str = "train",
        start_epoch: int = 0,
        preemption: "PreemptionHandler | None" = None,
        preemption_save_path=None,
    ) -> None:
        """Run the train/val loop.

        With ``preemption`` (a ``PreemptionHandler``) and
        ``preemption_save_path`` set, a latched preemption signal saves the
        full train state mid-epoch and raises ``TrainingPreempted``; resume
        with ``cli/train.py --resume`` (the interrupted epoch restarts).
        """
        if self.state is None:
            raise RuntimeError("Call build_state() before fit()")
        engine_state = EngineState(model=self, stage=stage, logger=self.logger)

        # A ".orbax" preemption save is a COLLECTIVE (every process writes
        # its shards), but SIGTERM latches at each host's own batch
        # boundary — unsynchronized, one process could enter the collective
        # with a different train-state version (corrupt checkpoint) or
        # never enter it (deadlock).  Agree on the trigger with a tiny
        # all-gather at the (loop-aligned) check points instead.
        sync_trigger = (
            preemption is not None
            and preemption_save_path is not None
            and Path(preemption_save_path).suffix == ".orbax"
            and jax.process_count() > 1
        )

        def preemption_triggered() -> bool:
            if preemption is None:
                return False
            if not sync_trigger:
                return preemption.triggered
            from jax.experimental import multihost_utils

            flags = np.asarray(
                multihost_utils.process_allgather(
                    np.int32(1 if preemption.triggered else 0)
                )
            )
            return bool(flags.max())

        def check_preempted(epochs_behind: int = 1):
            """``epochs_behind=1`` mid-epoch (redo it on resume); ``0`` once
            the epoch's callbacks (incl. checkpointing) have completed."""
            if preemption_triggered():
                epoch_done = engine_state.global_epoch - epochs_behind
                if preemption_save_path is not None:
                    self.save_train_state(
                        preemption_save_path, extra={"epoch": epoch_done}
                    )
                self.logger.info(
                    f"Preemption signal: state saved (epoch {epoch_done} complete), exiting"
                )
                raise TrainingPreempted(preemption_save_path)

        try:
            self._fit_epochs(
                engine_state, train_loader, val_loader, num_epochs, callbacks,
                metrics, stage, start_epoch, check_preempted,
            )
        finally:
            # Runs on normal completion, preemption AND errors: callbacks
            # holding process-global resources (LoggingToFile's handler on
            # the shared logger) must release them per-fit.  Each hook is
            # isolated: a raising callback must never replace an in-flight
            # TrainingPreempted (the resume contract) or the real training
            # error, nor starve later callbacks of their cleanup.
            for callback in callbacks:
                try:
                    callback.fit_complete(engine_state)
                except Exception:
                    self.logger.exception(
                        f"fit_complete failed in {type(callback).__name__}; continuing"
                    )

    def _fit_epochs(
        self, engine_state, train_loader, val_loader, num_epochs, callbacks,
        metrics, stage, start_epoch, check_preempted,
    ) -> None:
        for epoch in range(num_epochs):
            engine_state.epoch = epoch
            engine_state.global_epoch = start_epoch + epoch
            engine_state.metrics = {}
            for callback in callbacks:
                callback.epoch_start(engine_state)

            if hasattr(train_loader, "set_epoch"):
                train_loader.set_epoch(engine_state.global_epoch)
            losses = []
            # Named span: epochs show up as blocks in `--trace` profiles.
            with annotate("train_epoch"):
                for batch in train_loader:
                    losses.append(self.train_step(batch))
                    check_preempted()
            # One device_get for the whole list: per-loss fetches would be
            # len(losses) sequential blocking round trips (minutes per
            # epoch boundary through the axon tunnel).
            train_loss = float(np.mean(jax.device_get(losses))) if losses else float("nan")
            engine_state.metrics["train_loss"] = train_loss

            if val_loader is not None:
                for metric in metrics:
                    metric.reset()
                val_losses = []
                with annotate("validation"):
                    for batch in val_loader:
                        loss, prediction, targets_dev, weights_dev = self.val_step(batch)
                        val_losses.append(loss)
                        for metric in metrics:
                            if hasattr(metric, "batch_stats"):
                                # Reduce to per-neuron sufficient statistics
                                # on device; only ~(M, N_max, 5) floats
                                # cross back.
                                counts, sums = self._metric_stats(metric)(
                                    prediction, targets_dev, weights_dev
                                )
                                metric.update_stats(
                                    jax.device_get(counts), jax.device_get(sums)
                                )
                            else:
                                # The prediction may carry mesh-padding rows
                                # beyond the true batch; slice them off
                                # before mixing with the unpadded host
                                # arrays.
                                true_batch = np.asarray(batch.weights).shape[0]
                                metric.update(
                                    jax.device_get(prediction)[:, :true_batch],
                                    batch.targets,
                                    batch.weights,
                                )
                engine_state.metrics["val_loss"] = float(
                    np.mean(jax.device_get(val_losses))
                )
                for metric in metrics:
                    engine_state.metrics.update(metric.epoch_metrics(prefix="val_"))
                check_preempted()  # a signal during validation must not be lost

            lr = self._current_lr()
            if lr is not None:
                engine_state.metrics["lr"] = lr
            self.logger.info(
                f"{stage} epoch {engine_state.global_epoch}: "
                + ", ".join(f"{k}={v:.6g}" for k, v in engine_state.metrics.items())
            )
            for callback in callbacks:
                callback.epoch_complete(engine_state)
            # Epoch fully committed (incl. checkpoint callbacks): a latched
            # signal exits here rather than silently surviving fit() return
            # (the caller's handler scope may end with this stage).
            check_preempted(epochs_behind=0)
            if engine_state.stopped:
                break

    def _current_lr(self):
        """Best-effort readback of the scheduled LR for logging."""
        if self.schedule is None:
            return None
        count = int(jax.device_get(self.state.step))
        return float(self.schedule(count))

    # ----------------------------------------------------------- checkpoint

    def eval_variables(self) -> dict:
        return {
            "params": jax.device_get(self.state.eval_params),
            "batch_stats": jax.device_get(self.state.eval_batch_stats),
        }

    def save(self, file_path, background: bool = False) -> None:
        """Write an inference checkpoint of the EMA weights.

        ``background=True``: serialization + disk write happen off-thread
        (``engine.checkpoint._AsyncWriter``); the EMA weights are fetched to
        host before returning, so continued training cannot corrupt the save.
        """
        ckpt.save_model_checkpoint(
            file_path, self.params, self.eval_variables(), background=background
        )

    def save_train_state(
        self, file_path, extra: dict | None = None, background: bool = False
    ) -> None:
        """Resume checkpoint.  A ``.orbax`` path routes to the sharded
        backend (see ``save_train_state_sharded``); anything else is the
        single-file msgpack format (optionally written in the background)."""
        if Path(file_path).suffix == ".orbax":
            # Orbax coordinates its own multi-process write; the msgpack
            # background writer does not apply.
            self.save_train_state_sharded(file_path, extra=extra)
            return
        ckpt.save_train_state(
            file_path, self.state, self.params, extra=extra, background=background
        )

    def load_train_state(self, file_path) -> dict:
        if self.state is None:
            raise RuntimeError("Call build_state() before load_train_state()")
        if Path(file_path).suffix == ".orbax":
            return self.load_train_state_sharded(file_path)
        self.state, extra = ckpt.load_train_state(file_path, self.state)
        # Restore the mesh placement (from_state_dict returns host leaves).
        self.state = mesh_lib.shard_state(self.mesh, self.state, self.tensor_parallel)
        return extra

    def save_train_state_sharded(self, dir_path, extra: dict | None = None) -> None:
        """Sharded-scale resume checkpoint (orbax): each process writes its
        own shards, nothing gathers to host — required once parameters
        shard across processes (multi-host TP), where the msgpack path's
        ``device_get`` would raise on non-addressable arrays."""
        ckpt.save_train_state_sharded(dir_path, self.state, self.params, extra=extra)

    def load_train_state_sharded(self, dir_path) -> dict:
        if self.state is None:
            raise RuntimeError("Call build_state() before load_train_state_sharded()")
        # Restored arrays carry the template's shardings already — no
        # host roundtrip, no re-placement pass.
        self.state, extra = ckpt.load_train_state_sharded(dir_path, self.state)
        return extra


def load_model(file_path, mesh=None) -> MouseModel:
    """Rebuild a ``MouseModel`` from an inference checkpoint.

    Equivalent of ``argus.load_model`` (used at predictors.py:25 and for
    distillation teachers at train.py:62): the checkpoint's config dict
    reconstructs the module, and the saved EMA weights land in both the
    live and EMA slots so ``predict`` uses them directly.
    """
    payload = ckpt.load_model_checkpoint(file_path)
    model = MouseModel(payload["params"], mesh=mesh)
    nn_state = payload["nn_state"]
    # Commit the restored (host/NumPy) trees to device once: leaving them
    # as np.ndarrays would re-upload ~0.7 GB on EVERY jitted call.
    params = jax.device_put(nn_state["params"])
    batch_stats = jax.device_put(nn_state.get("batch_stats", {}))
    model.state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=None,
        ema_params=None,
        ema_batch_stats=None,
        rng=jax.random.PRNGKey(0),
    )
    model.state = mesh_lib.shard_state(mesh, model.state, model.tensor_parallel)
    return model


