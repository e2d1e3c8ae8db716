"""Training-engine tests: loss/schedule golden parity vs torch, metric math,
EMA semantics, and an end-to-end tiny fit with checkpoint roundtrip."""

import math

import jax
import jax.numpy as jnp
import optax
import numpy as np
import pytest

from sensorium_tpu.data.datasets import MiceBatch
from sensorium_tpu.engine import (
    CorrelationMetric,
    MouseModel,
    TrainState,
    corr,
    load_model,
    mice_poisson_distill_loss,
    mice_poisson_loss,
    warmup_cosine,
)
from sensorium_tpu.engine.callbacks import Checkpoint, EngineState
from sensorium_tpu.engine.ema import ema_update
from sensorium_tpu.utils import get_best_model_path


def reference_mice_poisson(prediction_list, target_list, weights, eps=1e-8):
    """Reference semantics (losses.py:5-21) recomputed with torch."""
    import torch

    poisson = torch.nn.PoissonNLLLoss(log_input=False, full=False, eps=eps, reduction="none")
    weights = torch.as_tensor(weights)
    weights = weights / weights.sum()
    total = torch.zeros(())
    for mouse_index, (pred, target) in enumerate(zip(prediction_list, target_list)):
        mouse_weights = weights[..., mouse_index]
        mask = mouse_weights != 0.0
        if torch.any(mask):
            loss = poisson(torch.as_tensor(pred)[mask], torch.as_tensor(target)[mask])
            loss = loss * mouse_weights[mask].view(-1, 1, 1)
            total = total + loss.sum()
    return float(total)


class TestMicePoissonLoss:
    def test_matches_torch_reference(self):
        rng = np.random.default_rng(0)
        num_mice, batch, neurons, frames = 4, 6, 12, 5
        prediction = rng.uniform(0.01, 3.0, (num_mice, batch, neurons, frames)).astype(
            np.float32
        )
        target = rng.uniform(0.0, 2.0, (batch, neurons, frames)).astype(np.float32)
        mouse_of_sample = rng.integers(0, num_mice, batch)
        weights = np.zeros((batch, num_mice), np.float32)
        weights[np.arange(batch), mouse_of_sample] = 1.0

        # Expand compact targets to the reference's per-mouse list format.
        target_list = [
            np.where(weights[:, m, None, None] > 0, target, 0.0) for m in range(num_mice)
        ]
        expected = reference_mice_poisson(list(prediction), target_list, weights)
        actual = float(mice_poisson_loss(prediction, target, weights))
        assert math.isclose(actual, expected, rel_tol=1e-5)

    def test_padded_neurons_contribute_zero(self):
        prediction = np.zeros((2, 3, 4, 2), np.float32)
        prediction[0, :, :2] = 1.5  # mouse 0 has 2 real neurons, rest padded
        target = np.zeros((3, 4, 2), np.float32)
        target[:, :2] = 1.0
        weights = np.zeros((3, 2), np.float32)
        weights[:, 0] = 1.0
        loss_padded = float(mice_poisson_loss(prediction, target, weights))
        loss_unpadded = float(
            mice_poisson_loss(prediction[:, :, :2], target[:, :2], weights)
        )
        assert math.isclose(loss_padded, loss_unpadded, rel_tol=1e-6)

    def test_distill_loss_mass_fraction(self):
        """Distilled cells must carry exactly `ratio` of the loss mass
        (argus_models.py:35-41 + the loss's weight normalization)."""
        num_mice, batch, neurons, frames = 3, 4, 5, 2
        prediction = np.full((num_mice, batch, neurons, frames), 2.0, np.float32)
        target = np.zeros((batch, neurons, frames), np.float32)
        teacher = np.zeros_like(prediction)
        weights = np.zeros((batch, num_mice), np.float32)
        weights[np.arange(batch), np.arange(batch) % num_mice] = 1.0
        ratio = 0.36
        # With target == teacher == 0, elementwise loss is `pred` everywhere,
        # so the total is pred_sum_per_cell * (active_mass + distill_mass) = cell_loss.
        cell_loss = 2.0 * neurons * frames
        actual = float(
            mice_poisson_distill_loss(prediction, target, weights, teacher, ratio)
        )
        assert math.isclose(actual, cell_loss, rel_tol=1e-5)

    def test_distill_reference_parity(self):
        """Full comparison against the reference's sequential injection."""
        import torch

        rng = np.random.default_rng(7)
        num_mice, batch, neurons, frames = 3, 5, 6, 4
        prediction = rng.uniform(0.05, 2.0, (num_mice, batch, neurons, frames)).astype(
            np.float32
        )
        teacher = rng.uniform(0.05, 2.0, prediction.shape).astype(np.float32)
        target = rng.uniform(0, 1.5, (batch, neurons, frames)).astype(np.float32)
        mouse_of_sample = rng.integers(0, num_mice, batch)
        weights = np.zeros((batch, num_mice), np.float32)
        weights[np.arange(batch), mouse_of_sample] = 1.0
        ratio = 0.36

        # Reference: in-place distill injection then MicePoissonLoss.
        target_list = [
            torch.as_tensor(np.where(weights[:, m, None, None] > 0, target, 0.0))
            for m in range(num_mice)
        ]
        w = torch.as_tensor(weights.copy())
        distill_mask = w == 0.0
        distill_weight = ratio / (1.0 - ratio) * w.sum() / distill_mask.sum()
        for b, m in torch.argwhere(distill_mask):
            target_list[m][b] = torch.as_tensor(teacher[m, b])
            w[b, m] = distill_weight
        expected = reference_mice_poisson(list(prediction), target_list, w.numpy())

        actual = float(
            mice_poisson_distill_loss(prediction, target, weights, teacher, ratio)
        )
        assert math.isclose(actual, expected, rel_tol=1e-5)


class TestSchedule:
    def test_warmup_then_cosine_matches_torch(self):
        import torch

        peak, min_lr = 2.4e-3, 2.4e-5
        warmup_iters, train_iters = 10, 40
        schedule = warmup_cosine(peak, min_lr, warmup_iters, train_iters)

        # Warmup: argus LambdaLR(x / N) — linear from 0.
        for step in range(warmup_iters):
            expected = peak * step / warmup_iters
            assert math.isclose(float(schedule(step)), expected, abs_tol=1e-9)

        # Train: torch CosineAnnealingLR stepped per iteration.
        param = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([param], lr=peak)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=train_iters, eta_min=min_lr
        )
        for step in range(train_iters):
            expected = opt.param_groups[0]["lr"]
            actual = float(schedule(warmup_iters + step))
            assert math.isclose(actual, expected, rel_tol=1e-5, abs_tol=1e-9)
            sched.step()


class TestSchedulerRegistry:
    """Each named scheduler must track torch.optim.lr_scheduler step-for-step.

    torch is stepped once per iteration; ``schedule(count)`` must equal the
    lr torch reports *before* ``scheduler.step()`` at iteration ``count``
    (the value the optimizer actually uses), for every count.
    """

    BASE = 7.5e-4

    def _pin(self, name, params, torch_sched_factory, n_steps=50):
        import torch

        from sensorium_tpu.engine.schedule import get_scheduler

        schedule = get_scheduler(name, self.BASE, params)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=self.BASE)
        sched = torch_sched_factory(opt)
        for step in range(n_steps):
            expected = opt.param_groups[0]["lr"]
            actual = float(schedule(step))
            assert math.isclose(actual, expected, rel_tol=1e-5, abs_tol=1e-10), (
                f"{name} diverged at step {step}: {actual} != {expected}"
            )
            opt.step()
            sched.step()

    def test_step_lr(self):
        import torch

        self._pin(
            "StepLR", {"step_size": 7, "gamma": 0.5},
            lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=7, gamma=0.5),
        )

    def test_multi_step_lr(self):
        import torch

        self._pin(
            "MultiStepLR", {"milestones": [5, 12, 30], "gamma": 0.3},
            lambda o: torch.optim.lr_scheduler.MultiStepLR(
                o, milestones=[5, 12, 30], gamma=0.3
            ),
        )

    def test_exponential_lr(self):
        import torch

        self._pin(
            "ExponentialLR", {"gamma": 0.93},
            lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.93),
        )

    def test_linear_lr(self):
        import torch

        self._pin(
            "LinearLR",
            {"start_factor": 0.25, "end_factor": 1.0, "total_iters": 18},
            lambda o: torch.optim.lr_scheduler.LinearLR(
                o, start_factor=0.25, end_factor=1.0, total_iters=18
            ),
        )

    def test_constant_lr(self):
        import torch

        self._pin(
            "ConstantLR", {"factor": 0.4, "total_iters": 9},
            lambda o: torch.optim.lr_scheduler.ConstantLR(
                o, factor=0.4, total_iters=9
            ),
        )

    def test_polynomial_lr(self):
        import torch

        self._pin(
            "PolynomialLR", {"total_iters": 33, "power": 2.0},
            lambda o: torch.optim.lr_scheduler.PolynomialLR(
                o, total_iters=33, power=2.0
            ),
            n_steps=33,
        )

    def test_cosine_annealing_lr(self):
        import torch

        self._pin(
            "CosineAnnealingLR", {"T_max": 40, "eta_min": 1e-6},
            lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(
                o, T_max=40, eta_min=1e-6
            ),
            n_steps=40,
        )

    def test_cosine_warm_restarts_tmult_1(self):
        import torch

        self._pin(
            "CosineAnnealingWarmRestarts", {"T_0": 8, "eta_min": 1e-6},
            lambda o: torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
                o, T_0=8, eta_min=1e-6
            ),
            n_steps=60,
        )

    def test_cosine_warm_restarts_tmult_2(self):
        """Geometric restarts: boundaries at 5, 15, 35, 75 — the float-log
        cycle index plus boundary correction must hit every restart."""
        import torch

        self._pin(
            "CosineAnnealingWarmRestarts",
            {"T_0": 5, "T_mult": 2, "eta_min": 2e-5},
            lambda o: torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(
                o, T_0=5, T_mult=2, eta_min=2e-5
            ),
            n_steps=80,
        )

    def test_one_cycle_cos(self):
        import torch

        self._pin(
            "OneCycleLR",
            {"max_lr": 3e-3, "total_steps": 48, "pct_start": 0.3},
            lambda o: torch.optim.lr_scheduler.OneCycleLR(
                o, max_lr=3e-3, total_steps=48, pct_start=0.3
            ),
            n_steps=48,
        )

    def test_one_cycle_linear(self):
        import torch

        self._pin(
            "OneCycleLR",
            {
                "max_lr": 2e-3, "total_steps": 36, "pct_start": 0.25,
                "anneal_strategy": "linear", "div_factor": 10.0,
                "final_div_factor": 100.0,
            },
            lambda o: torch.optim.lr_scheduler.OneCycleLR(
                o, max_lr=2e-3, total_steps=36, pct_start=0.25,
                anneal_strategy="linear", div_factor=10.0,
                final_div_factor=100.0,
            ),
            n_steps=36,
        )

    def test_unknown_scheduler_raises(self):
        from sensorium_tpu.engine.schedule import get_scheduler

        with pytest.raises(KeyError, match="Unknown lr scheduler"):
            get_scheduler("Nope", 1e-3, {})

    def test_build_stage_schedule_default_is_reference_plan(self):
        from sensorium_tpu.engine.schedule import build_stage_schedule, warmup_cosine

        built = build_stage_schedule(1e-3, 1e-5, 10, 40)
        ref = warmup_cosine(1e-3, 1e-5, 10, 40)
        for step in (0, 5, 10, 25, 49, 60):
            assert float(built(step)) == float(ref(step))

    def test_build_stage_schedule_named_with_train_iters_placeholder(self):
        import torch

        from sensorium_tpu.engine.schedule import build_stage_schedule

        warmup, train = 6, 30
        built = build_stage_schedule(
            self.BASE, 0.0, warmup, train,
            scheduler_spec=("CosineAnnealingLR", {"T_max": "train_iters"}),
        )
        # Warmup ramp 0 -> peak...
        for step in range(warmup):
            assert math.isclose(
                float(built(step)), self.BASE * step / warmup,
                rel_tol=1e-5, abs_tol=1e-9,
            )
        # ...then torch CosineAnnealingLR with T_max resolved to 30.
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=self.BASE)
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=train)
        for step in range(train):
            expected = opt.param_groups[0]["lr"]
            assert math.isclose(
                float(built(warmup + step)), expected, rel_tol=1e-5, abs_tol=1e-10
            )
            sched.step()

    def test_schedules_are_jittable(self):
        """Every registry entry must trace under jit (the engine folds the
        schedule into the compiled train step)."""
        import jax

        from sensorium_tpu.engine.schedule import _SCHEDULERS, get_scheduler

        cases = {
            "StepLR": {"step_size": 3},
            "MultiStepLR": {"milestones": [2, 5]},
            "ExponentialLR": {"gamma": 0.9},
            "LinearLR": {"total_iters": 4},
            "ConstantLR": {"total_iters": 4},
            "PolynomialLR": {"total_iters": 4},
            "CosineAnnealingLR": {"T_max": 6},
            "CosineAnnealingWarmRestarts": {"T_0": 3, "T_mult": 2},
            "OneCycleLR": {"total_steps": 10},
        }
        assert set(cases) == set(_SCHEDULERS)
        for name, params in cases.items():
            sched = get_scheduler(name, 1e-3, params)
            val = jax.jit(sched)(jnp.asarray(2, jnp.int32))
            assert float(val) > 0.0


class TestCorrelationMetric:
    def test_device_stats_match_host_update(self):
        """The jitted device reducer (batch_corr_stats) must accumulate to
        the same result as the host-array update() path."""
        import jax

        from sensorium_tpu.engine.metrics import batch_corr_stats

        rng = np.random.default_rng(7)
        pred = rng.gamma(1.5, 1.0, (2, 6, 4, 5)).astype(np.float32)
        target = rng.gamma(1.5, 1.0, (6, 4, 5)).astype(np.float32)
        weights = np.zeros((6, 2), np.float32)
        weights[:4, 0] = 1.0
        weights[4:, 1] = 1.0

        host = CorrelationMetric(num_neurons=[3, 4])
        host.update(pred, target, weights)

        device = CorrelationMetric(num_neurons=[3, 4])
        counts, sums = jax.jit(batch_corr_stats)(pred, target, weights)
        device.update_stats(np.asarray(counts), np.asarray(sums))

        assert host.epoch_metrics() == pytest.approx(device.epoch_metrics(), abs=1e-5)

    def test_perfect_correlation(self):
        metric = CorrelationMetric(num_neurons=[3, 4])
        pred = np.random.default_rng(0).uniform(0, 1, (2, 5, 4, 6)).astype(np.float32)
        weights = np.zeros((5, 2), np.float32)
        weights[:3, 0] = 1.0
        weights[3:, 1] = 1.0
        target = np.empty((5, 4, 6), np.float32)
        target[:3] = pred[0, :3]
        target[3:] = pred[1, 3:]
        metric.update(pred, target, weights)
        result = metric.epoch_metrics()
        assert result["val_corr"] == pytest.approx(1.0, abs=1e-4)

    def test_matches_numpy_corrcoef(self):
        rng = np.random.default_rng(3)
        metric = CorrelationMetric(num_neurons=[2])
        pred = rng.normal(1.0, 0.5, (1, 8, 2, 10)).astype(np.float32)
        target = rng.normal(1.0, 0.5, (8, 2, 10)).astype(np.float32)
        weights = np.ones((8, 1), np.float32)
        metric.update(pred, target, weights)
        result = metric.compute()

        flat_pred = np.transpose(pred[0], (0, 2, 1)).reshape(-1, 2)
        flat_target = np.transpose(target, (0, 2, 1)).reshape(-1, 2)
        expected = np.mean(
            [
                np.corrcoef(flat_pred[:, n], flat_target[:, n])[0, 1]
                for n in range(2)
            ]
        )
        assert result[0] == pytest.approx(expected, abs=1e-4)

    def test_corr_function_eps_guard(self):
        constant = np.ones((10, 3))
        varying = np.random.default_rng(0).normal(size=(10, 3))
        values = corr(constant, varying, axis=0)
        assert np.all(np.isfinite(values))

    def test_update_stats_slices_padded_mouse_axis(self):
        """A caller padded in the mouse axis (extra-mice alignment) must be
        sliced symmetrically in counts and sums — not broadcast-error."""
        metric = CorrelationMetric(num_neurons=[3, 4])
        counts = np.array([2.0, 3.0, 99.0])  # padded to 3 mice
        sums = np.ones((3, 4, 5))
        metric.update_stats(counts, sums)
        np.testing.assert_allclose(metric._counts, [2.0, 3.0])
        assert metric._sums.shape == (2, 4, 5)


class TestStockLossRegistry:
    """Stock torch-loss names register alongside mice_poisson
    (argus_models.py:17-20), lifted into the mice-batch weighting."""

    def _batch(self):
        rng = np.random.default_rng(5)
        pred = rng.uniform(0.1, 2.0, (2, 4, 3, 6)).astype(np.float32)
        target = rng.uniform(0.0, 2.0, (4, 3, 6)).astype(np.float32)
        weights = np.zeros((4, 2), np.float32)
        weights[:2, 0] = 1.0
        weights[2:, 1] = 1.0
        return pred, target, weights

    @pytest.mark.parametrize(
        "name,torch_loss_kwargs",
        [
            ("L1Loss", {}),
            ("MSELoss", {}),
            ("SmoothL1Loss", {"beta": 0.5}),
            ("HuberLoss", {"delta": 0.7}),
            ("PoissonNLLLoss", {"eps": 1e-6, "log_input": False}),
            ("PoissonNLLLoss", {"full": True, "log_input": False}),
            ("mice_poisson", {"full": True}),
        ],
    )
    def test_matches_torch_elementwise(self, name, torch_loss_kwargs):
        import torch

        from sensorium_tpu.engine.losses import get_loss

        pred, target, weights = self._batch()
        loss_fn = get_loss(name, dict(torch_loss_kwargs))
        actual = float(loss_fn(pred, target, weights))

        if name == "mice_poisson":
            torch_fn = torch.nn.PoissonNLLLoss(reduction="none", log_input=False,
                                               **torch_loss_kwargs)
        else:
            torch_fn = getattr(torch.nn, name)(reduction="none", **torch_loss_kwargs)
        w = torch.as_tensor(weights / weights.sum())
        total = torch.zeros(())
        for m in range(pred.shape[0]):
            elem = torch_fn(
                torch.as_tensor(pred[m]), torch.as_tensor(target)
            )  # (B, N, T)
            total = total + (elem.sum(dim=(1, 2)) * w[:, m]).sum()
        assert actual == pytest.approx(float(total), rel=1e-5)

    def test_poisson_log_input_true_matches_torch_default(self):
        """The stock name keeps torch's default: ``PoissonNLLLoss()`` means
        log_input=True (loss = exp(pred) - target*pred), NOT the reference
        MicePoissonLoss's log_input=False."""
        import torch

        from sensorium_tpu.engine.losses import get_loss

        pred, target, weights = self._batch()  # preds double as log-rates
        mask = np.ones((pred.shape[0], pred.shape[2]), np.float32)  # no padding
        loss_fn = get_loss("PoissonNLLLoss", {}, neuron_mask=mask)
        actual = float(loss_fn(pred, target, weights))

        torch_fn = torch.nn.PoissonNLLLoss(reduction="none")  # log_input=True
        w = torch.as_tensor(weights / weights.sum())
        total = torch.zeros(())
        for m in range(pred.shape[0]):
            elem = torch_fn(torch.as_tensor(pred[m]), torch.as_tensor(target))
            total = total + (elem.sum(dim=(1, 2)) * w[:, m]).sum()
        assert actual == pytest.approx(float(total), rel=1e-5)

    def test_poisson_log_input_requires_neuron_mask(self):
        from sensorium_tpu.engine.losses import get_loss

        with pytest.raises(ValueError, match="neuron mask"):
            get_loss("PoissonNLLLoss", {})

    def test_poisson_log_input_padded_rows_masked_exactly(self):
        """With log_input=True a padded (pred=0, target=0) element is worth
        exp(0) = 1; the neuron mask must remove exactly that."""
        from sensorium_tpu.engine.losses import get_loss

        pred, target, weights = self._batch()
        # Mouse 0 has only 2 real neurons: zero its padded row everywhere.
        pred = pred.copy()
        target = target.copy()
        pred[0, :, 2, :] = 0.0
        target[weights[:, 0] > 0, 2, :] = 0.0
        mask = np.ones((2, 3), np.float32)
        mask[0, 2] = 0.0

        padded = float(
            get_loss("PoissonNLLLoss", {}, neuron_mask=mask)(pred, target, weights)
        )
        sliced = float(
            get_loss("PoissonNLLLoss", {}, neuron_mask=mask[:, :2])(
                pred[:, :, :2], target[:, :2], weights
            )
        )
        # Mouse 1's third neuron is real; only mouse 0's padded row differs.
        mouse1_row = float(
            get_loss("PoissonNLLLoss", {}, neuron_mask=np.ones((2, 1), np.float32))(
                pred[:, :, 2:3], target[:, 2:3], weights * np.array([[0.0, 1.0]])
            )
        )
        w1_fraction = (weights * np.array([[0.0, 1.0]])).sum() / weights.sum()
        assert padded == pytest.approx(sliced + mouse1_row * w1_fraction, rel=1e-5)

    def test_unknown_loss_raises(self):
        from sensorium_tpu.engine.losses import get_loss

        with pytest.raises(KeyError):
            get_loss("NoSuchLoss", {})


class TestGradClip:
    """``grad_clip`` must reproduce torch.nn.utils.clip_grad_norm_ exactly
    (incl. the +1e-6 in the scale denominator that optax's own clip omits)."""

    def test_transform_matches_torch_above_and_below_threshold(self):
        import torch

        from sensorium_tpu.engine.optimizers import clip_grad_norm, get_optimizer

        max_norm, lr = 0.5, 0.1
        rng = np.random.default_rng(11)
        params0 = {
            "w": rng.normal(size=(6, 3)).astype(np.float32),
            "b": rng.normal(size=(3,)).astype(np.float32),
        }
        # First grad far above the threshold, second far below: both the
        # clipped and the pass-through branch are exercised.
        grads = [
            {"w": rng.normal(size=(6, 3)).astype(np.float32) * 10.0,
             "b": rng.normal(size=(3,)).astype(np.float32) * 10.0},
            {"w": rng.normal(size=(6, 3)).astype(np.float32) * 1e-3,
             "b": rng.normal(size=(3,)).astype(np.float32) * 1e-3},
        ]

        tx = optax.chain(clip_grad_norm(max_norm), get_optimizer("SGD", {"lr": lr}))
        params = jax.tree.map(jnp.asarray, params0)
        state = tx.init(params)
        for g in grads:
            updates, state = tx.update(jax.tree.map(jnp.asarray, g), state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)

        tparams = {
            k: torch.nn.Parameter(torch.as_tensor(v.copy()))
            for k, v in params0.items()
        }
        opt = torch.optim.SGD(tparams.values(), lr=lr)
        for g in grads:
            opt.zero_grad()
            for k in tparams:
                tparams[k].grad = torch.as_tensor(g[k])
            torch.nn.utils.clip_grad_norm_(tparams.values(), max_norm)
            opt.step()

        for k in params0:
            np.testing.assert_allclose(
                np.asarray(params[k]), tparams[k].detach().numpy(), rtol=1e-6
            )

    def test_model_config_key_wires_clipping(self):
        """A ``grad_clip`` config key bounds the SGD update norm at lr*max."""
        params = tiny_params()
        params["optimizer"] = ("SGD", {"lr": 0.1})
        params["grad_clip"] = 0.25
        model = MouseModel(params)
        model.build_state(seed=0, learning_rate=0.1)

        big = jax.tree.map(
            lambda p: jnp.full_like(p, 100.0), model.state.params
        )
        updates, _ = model.tx.update(big, model.state.opt_state, model.state.params)
        update_norm = float(optax.global_norm(updates))
        assert math.isclose(update_norm, 0.1 * 0.25, rel_tol=1e-4)


class TestOptimizerParity:
    """The optax registry must reproduce torch.optim update math step for
    step — bias correction, decoupled vs coupled weight decay, momentum —
    since the reference resolves the same config names against torch
    (argus; configs/true_batch_001.py:45-48)."""

    STEPS = 4

    def _run_pair(self, name, kwargs, torch_cls, torch_kwargs):
        import torch

        from sensorium_tpu.engine.optimizers import get_optimizer

        rng = np.random.default_rng(3)
        params0 = {
            "w": rng.normal(size=(5, 4)).astype(np.float32),
            "b": rng.normal(size=(4,)).astype(np.float32),
        }
        grads = [
            {
                "w": rng.normal(size=(5, 4)).astype(np.float32),
                "b": rng.normal(size=(4,)).astype(np.float32),
            }
            for _ in range(self.STEPS)
        ]

        tx = get_optimizer(name, dict(kwargs))
        params = jax.tree.map(jnp.asarray, params0)
        state = tx.init(params)
        for g in grads:
            updates, state = tx.update(jax.tree.map(jnp.asarray, g), state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)

        tparams = {k: torch.nn.Parameter(torch.as_tensor(v.copy())) for k, v in params0.items()}
        opt = torch_cls(tparams.values(), **torch_kwargs)
        for g in grads:
            opt.zero_grad()
            for k in tparams:
                tparams[k].grad = torch.as_tensor(g[k])
            opt.step()

        for k in params0:
            np.testing.assert_allclose(
                np.asarray(params[k]),
                tparams[k].detach().numpy(),
                rtol=1e-5,
                atol=1e-7,
                err_msg=f"{name}:{k}",
            )

    def test_adamw_matches_torch(self):
        import torch

        self._run_pair(
            "AdamW",
            {"lr": 2.4e-3, "weight_decay": 0.05},
            torch.optim.AdamW,
            {"lr": 2.4e-3, "weight_decay": 0.05},
        )

    def test_adam_with_coupled_l2_matches_torch(self):
        import torch

        self._run_pair(
            "Adam",
            {"lr": 1e-3, "weight_decay": 0.01},
            torch.optim.Adam,
            {"lr": 1e-3, "weight_decay": 0.01},
        )

    def test_sgd_nesterov_momentum_matches_torch(self):
        import torch

        self._run_pair(
            "SGD",
            {"lr": 0.1, "momentum": 0.9, "nesterov": True, "weight_decay": 1e-4},
            torch.optim.SGD,
            {"lr": 0.1, "momentum": 0.9, "nesterov": True, "weight_decay": 1e-4},
        )

    def test_rmsprop_matches_torch(self):
        """torch keeps eps OUTSIDE the sqrt and zero-inits the square
        average — both differ from optax defaults, so this pins the fixups."""
        import torch

        self._run_pair(
            "RMSprop",
            {"lr": 0.01, "alpha": 0.99, "eps": 1e-8, "weight_decay": 1e-4,
             "momentum": 0.9},
            torch.optim.RMSprop,
            {"lr": 0.01, "alpha": 0.99, "eps": 1e-8, "weight_decay": 1e-4,
             "momentum": 0.9},
        )

    def test_rmsprop_centered_matches_torch(self):
        import torch

        self._run_pair(
            "RMSprop",
            {"lr": 0.01, "centered": True},
            torch.optim.RMSprop,
            {"lr": 0.01, "centered": True},
        )

    def test_adagrad_matches_torch(self):
        import torch

        self._run_pair(
            "Adagrad",
            {"lr": 0.05, "weight_decay": 1e-4},
            torch.optim.Adagrad,
            {"lr": 0.05, "weight_decay": 1e-4},
        )

    def test_adamax_matches_torch(self):
        import torch

        self._run_pair(
            "Adamax",
            {"lr": 2e-3, "weight_decay": 1e-4},
            torch.optim.Adamax,
            {"lr": 2e-3, "weight_decay": 1e-4},
        )

    def test_radam_matches_torch(self):
        import torch

        self._run_pair(
            "RAdam",
            {"lr": 2e-3, "weight_decay": 1e-4},
            torch.optim.RAdam,
            {"lr": 2e-3, "weight_decay": 1e-4},
        )

    def test_nadam_matches_torch(self):
        """torch NAdam anneals the momentum coefficient (psi=4e-3) — the
        custom transform reproduces that trajectory (optax.nadam, which
        follows Dozat's paper instead, diverges by ~3e-3 after 4 steps)."""
        import torch

        self._run_pair(
            "NAdam",
            {"lr": 2e-3, "weight_decay": 1e-4},
            torch.optim.NAdam,
            {"lr": 2e-3, "weight_decay": 1e-4},
        )


class TestEma:
    def test_update_math(self):
        ema = {"w": jnp.ones((3,)), "stats": {"mean": jnp.zeros((2,))}}
        new = {"w": jnp.zeros((3,)), "stats": {"mean": jnp.ones((2,))}}
        out = ema_update(ema, new, decay=0.9)
        np.testing.assert_allclose(out["w"], 0.9)
        np.testing.assert_allclose(out["stats"]["mean"], 0.1)


def tiny_params(num_mice=2, iter_size=1):
    return {
        "nn_module": (
            "dwiseneuro",
            {
                "readout_outputs": [5, 7][:num_mice],
                "in_channels": 5,
                "core_features": (8, 8),
                "spatial_strides": (2, 2),
                "spatial_kernel": 3,
                "temporal_kernel": 3,
                "expansion_ratio": 2,
                "se_reduce_ratio": 4,
                "cortex_features": (16, 16),
                "groups": 2,
                "softplus_beta": 0.07,
                "drop_rate": 0.2,
                "drop_path_rate": 0.1,
                "dtype": "float32",
                "readout_pad_multiple": 8,
            },
        ),
        "loss": ("mice_poisson", {"log_input": False, "full": False, "eps": 1e-8}),
        "optimizer": ("AdamW", {"lr": 1e-3, "weight_decay": 0.05}),
        "frame_stack": {"size": 4, "step": 2, "position": "last"},
        "inputs_processor": ("stack_inputs", {"size": (16, 16), "pad_fill_value": 0.0}),
        "responses_processor": ("identity", {}),
        "iter_size": iter_size,
    }


def random_batch(rng, num_mice=2, batch=4, frames=4, size=16, max_neurons=7):
    inputs = rng.uniform(0, 255, (batch, 5, frames, size, size)).astype(np.float32)
    targets = rng.uniform(0, 2, (batch, max_neurons, frames)).astype(np.float32)
    weights = np.zeros((batch, num_mice), np.float32)
    weights[np.arange(batch), rng.integers(0, num_mice, batch)] = 1.0
    return MiceBatch(inputs=inputs, targets=targets, weights=weights)


class FakeLoader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)

    def set_epoch(self, epoch):
        pass


class TestMouseModelFit:
    def test_fit_reduces_loss_and_checkpoints(self, tmp_path):
        model = MouseModel(tiny_params())
        model.set_ema(0.9)
        model.build_state(seed=0, learning_rate=1e-2)

        rng = np.random.default_rng(0)
        batches = [random_batch(rng) for _ in range(4)]
        loader = FakeLoader(batches)
        metric = CorrelationMetric(num_neurons=[5, 7])
        checkpoint = Checkpoint(tmp_path, max_saves=1)

        first_loss = float(model.train_step(batches[0]))
        model.build_state(seed=0, learning_rate=1e-2)  # reset after probe
        model.fit(
            loader,
            val_loader=loader,
            num_epochs=3,
            callbacks=[checkpoint],
            metrics=[metric],
        )
        final_loss = float(model.train_step(batches[0]))
        assert final_loss < first_loss

        best_path = get_best_model_path(tmp_path)
        assert best_path is not None
        # Single best checkpoint kept (max_saves=1) + the resume state.
        assert len(list(tmp_path.glob("model-*.ckpt"))) == 1
        assert (tmp_path / "train_state.ckpt").exists()

        # Roundtrip: the loaded model predicts identically to the EMA weights.
        # (The *best* checkpoint may be from an earlier epoch, so save the
        # final weights explicitly for the comparison.)
        final_path = tmp_path / "final.ckpt"
        model.save(final_path)
        restored = load_model(final_path)
        sample = batches[0].inputs[:1]
        expected = np.asarray(model.predict(sample, mouse_index=1))
        actual = np.asarray(restored.predict(sample, mouse_index=1))
        np.testing.assert_allclose(actual, expected, rtol=2e-5, atol=1e-6)

    def test_predict_squeeze_shapes(self):
        """An unbatched (C, T, H, W) input squeezes the BATCH axis for both
        routes: single-mouse output is (B, N, T) -> (N, T), all-mice output
        is (M, B, N_max, T) -> (M, N_max, T) — squeezing axis 0 there would
        drop the mouse axis instead."""
        model = MouseModel(tiny_params())
        model.build_state(seed=0)
        rng = np.random.default_rng(5)
        batch = random_batch(rng)
        sample = batch.inputs[0]  # (C, T, H, W)

        single = np.asarray(model.predict(sample, mouse_index=1))
        assert single.shape == (7, batch.inputs.shape[2])

        all_mice = np.asarray(model.predict(sample))
        assert all_mice.shape == (2, 7, batch.inputs.shape[2])
        np.testing.assert_allclose(all_mice[1, : single.shape[0]], single, rtol=1e-5, atol=1e-6)

    def test_iter_size_accumulation_close_to_full_batch(self):
        """iter_size=2 halves BN batches but grads should stay close."""
        rng = np.random.default_rng(1)
        batch = random_batch(rng, batch=8)

        losses = {}
        for iter_size in (1, 2):
            model = MouseModel(tiny_params(iter_size=iter_size))
            model.build_state(seed=0, learning_rate=0.0)
            losses[iter_size] = float(model.train_step(batch))
        assert losses[1] == pytest.approx(losses[2], rel=0.05)

    def test_preemption_saves_state_and_raises(self, tmp_path):
        """A latched preemption signal saves mid-fit state for --resume."""
        from sensorium_tpu.engine.preemption import PreemptionHandler, TrainingPreempted

        model = MouseModel(tiny_params())
        model.build_state(seed=0, learning_rate=1e-3)
        rng = np.random.default_rng(3)
        loader = FakeLoader([random_batch(rng) for _ in range(3)])
        save_path = tmp_path / "train_state.ckpt"

        with PreemptionHandler() as handler:
            handler.triggered = True  # simulate SIGTERM delivery
            with pytest.raises(TrainingPreempted):
                model.fit(
                    loader,
                    num_epochs=2,
                    start_epoch=4,
                    preemption=handler,
                    preemption_save_path=save_path,
                )
        assert save_path.exists()

        resumed = MouseModel(tiny_params())
        resumed.build_state(seed=9, learning_rate=1e-3)
        extra = resumed.load_train_state(save_path)
        # Epoch 4 was interrupted -> recorded as "completed through 3".
        assert extra["epoch"] == 3
        assert int(jax.device_get(resumed.state.step)) == 1

    def test_fit_complete_error_never_masks_preemption(self, tmp_path):
        """A raising fit_complete hook must not replace TrainingPreempted
        (the resume/exit-75 contract), and later callbacks still get their
        cleanup (ADVICE r03, engine/model.py fit() finally block)."""
        from sensorium_tpu.engine.callbacks import Callback
        from sensorium_tpu.engine.preemption import PreemptionHandler, TrainingPreempted

        class Exploding(Callback):
            def fit_complete(self, state):
                raise RuntimeError("cleanup boom")

        class Recorder(Callback):
            called = False

            def fit_complete(self, state):
                Recorder.called = True

        model = MouseModel(tiny_params())
        model.build_state(seed=0, learning_rate=1e-3)
        rng = np.random.default_rng(3)
        loader = FakeLoader([random_batch(rng) for _ in range(2)])

        with PreemptionHandler() as handler:
            handler.triggered = True
            with pytest.raises(TrainingPreempted):
                model.fit(
                    loader,
                    num_epochs=1,
                    callbacks=[Exploding(), Recorder()],
                    preemption=handler,
                    preemption_save_path=tmp_path / "state.ckpt",
                )
        assert Recorder.called

    def test_logging_to_file_only_detaches_its_own_handler(self, tmp_path):
        """LoggingToFile.fit_complete removes only the handler IT attached —
        a same-path FileHandler installed via build_logger(log_path) stays
        (build_logger's guarantee; ADVICE r03, callbacks.py)."""
        import logging
        from pathlib import Path

        from sensorium_tpu.engine.callbacks import (
            EngineState,
            LoggingToFile,
            build_logger,
        )

        log_path = tmp_path / "log.txt"
        logger = build_logger(log_path)
        try:
            foreign = [
                h
                for h in logger.handlers
                if isinstance(h, logging.FileHandler)
                and Path(getattr(h, "baseFilename", "")) == log_path.resolve()
            ]
            assert len(foreign) == 1

            cb = LoggingToFile(log_path)
            state = EngineState(model=None, logger=logger)
            cb.epoch_start(state)  # same-path handler exists -> attaches nothing
            cb.fit_complete(state)
            assert foreign[0] in logger.handlers  # the foreign handler survives

            logger.removeHandler(foreign[0])
            foreign[0].close()
            cb.epoch_start(state)  # now attaches its own
            own = cb._handler
            assert own is not None and own in logger.handlers
            cb.fit_complete(state)
            assert own not in logger.handlers
            assert cb._handler is None
        finally:
            for h in list(logger.handlers):
                if isinstance(h, logging.FileHandler):
                    logger.removeHandler(h)
                    h.close()

    def test_train_state_resume_roundtrip(self, tmp_path):
        model = MouseModel(tiny_params())
        model.set_ema(0.9)
        model.build_state(seed=0, learning_rate=1e-3)
        rng = np.random.default_rng(2)
        batch = random_batch(rng)
        model.train_step(batch)
        model.save_train_state(tmp_path / "state.ckpt", extra={"epoch": 5})

        resumed = MouseModel(tiny_params())
        resumed.set_ema(0.9)
        resumed.build_state(seed=123, learning_rate=1e-3)
        extra = resumed.load_train_state(tmp_path / "state.ckpt")
        assert extra["epoch"] == 5
        assert int(jax.device_get(resumed.state.step)) == 1

        next_a = float(model.train_step(batch))
        next_b = float(resumed.train_step(batch))
        assert next_a == pytest.approx(next_b, rel=1e-5)


class TestAsyncCheckpoint:
    """Background checkpoint writes must be bitwise-equal to sync writes,
    safe against the train step's buffer donation, ordered before any read,
    and must surface write errors instead of swallowing them."""

    def test_background_save_bitwise_equals_sync_and_survives_donation(self, tmp_path):
        from sensorium_tpu.engine.checkpoint import flush_pending_saves

        model = MouseModel(tiny_params())
        model.set_ema(0.9)
        model.build_state(seed=0, learning_rate=1e-3)
        rng = np.random.default_rng(7)
        batch = random_batch(rng)
        model.train_step(batch)

        model.save(tmp_path / "sync.ckpt")
        model.save(tmp_path / "async.ckpt", background=True)
        model.save_train_state(tmp_path / "sync_state.ckpt", extra={"epoch": 1})
        model.save_train_state(
            tmp_path / "async_state.ckpt", extra={"epoch": 1}, background=True
        )
        # Donate the state buffers while the background write is (possibly)
        # still serializing: the async payload was host-fetched up front, so
        # this must not corrupt it.
        model.train_step(batch)
        flush_pending_saves()

        assert (tmp_path / "async.ckpt").read_bytes() == (
            tmp_path / "sync.ckpt"
        ).read_bytes()
        assert (tmp_path / "async_state.ckpt").read_bytes() == (
            tmp_path / "sync_state.ckpt"
        ).read_bytes()

    def test_load_joins_pending_write(self, tmp_path):
        """load_model right after a background save must see the full file
        (read paths flush the in-flight write first)."""
        model = MouseModel(tiny_params())
        model.build_state(seed=0, learning_rate=1e-3)
        path = tmp_path / "model-001-0.100000.ckpt"
        model.save(path, background=True)
        restored = load_model(path)  # flushes internally
        rng = np.random.default_rng(8)
        sample = random_batch(rng).inputs[:1]
        np.testing.assert_allclose(
            np.asarray(restored.predict(sample, mouse_index=1)),
            np.asarray(model.predict(sample, mouse_index=1)),
            rtol=2e-5,
            atol=1e-6,
        )

    def test_background_write_error_surfaces_on_flush(self, tmp_path):
        from sensorium_tpu.engine.checkpoint import flush_pending_saves

        model = MouseModel(tiny_params())
        model.build_state(seed=0, learning_rate=1e-3)
        model.save(tmp_path / "no_such_dir" / "x.ckpt", background=True)
        with pytest.raises(FileNotFoundError):
            flush_pending_saves()
        flush_pending_saves()  # error is consumed; writer is reusable

    def test_fit_with_background_checkpoint_callback(self, tmp_path):
        from sensorium_tpu.engine.checkpoint import flush_pending_saves

        model = MouseModel(tiny_params())
        model.set_ema(0.9)
        model.build_state(seed=0, learning_rate=1e-2)
        rng = np.random.default_rng(9)
        loader = FakeLoader([random_batch(rng) for _ in range(3)])
        model.fit(
            loader,
            val_loader=loader,
            num_epochs=2,
            callbacks=[Checkpoint(tmp_path, max_saves=1, background=True)],
            metrics=[CorrelationMetric(num_neurons=[5, 7])],
        )
        flush_pending_saves()
        best = get_best_model_path(tmp_path)
        assert best is not None
        assert (tmp_path / "train_state.ckpt").exists()
        restored = load_model(best)
        sample = loader.batches[0].inputs[:1]
        assert np.isfinite(np.asarray(restored.predict(sample, mouse_index=1))).all()


class TestLoggingToJSONL:
    def test_one_valid_record_per_epoch(self, tmp_path):
        import json

        from sensorium_tpu.engine.callbacks import EngineState, LoggingToJSONL

        path = tmp_path / "log.jsonl"
        callback = LoggingToJSONL(path)
        state = EngineState(model=None, stage="train")
        for epoch, (loss, corr) in enumerate([(1.5, 0.01), (1.2, 0.05)]):
            state.global_epoch = epoch
            state.metrics = {"train_loss": loss, "val_corr": corr}
            callback.epoch_complete(state)

        records = [json.loads(line) for line in path.read_text().splitlines()]
        assert len(records) == 2
        assert records[1]["epoch"] == 1
        assert records[1]["val_corr"] == pytest.approx(0.05)
        assert records[0]["stage"] == "train"
        assert records[0]["time"] > 0

    def test_append_false_truncates(self, tmp_path):
        from sensorium_tpu.engine.callbacks import EngineState, LoggingToJSONL

        path = tmp_path / "log.jsonl"
        path.write_text('{"stale": true}\n')
        callback = LoggingToJSONL(path, append=False)
        state = EngineState(model=None)
        state.metrics = {"train_loss": 1.0}
        callback.epoch_complete(state)
        state.global_epoch = 1
        callback.epoch_complete(state)
        lines = path.read_text().splitlines()
        assert len(lines) == 2 and "stale" not in lines[0]


class TestEarlyStopping:
    def test_auto_direction_and_patience(self):
        from sensorium_tpu.engine.callbacks import EarlyStopping, EngineState

        # argus semantics: patience=2 tolerates ONE non-improving epoch and
        # stops on the second consecutive one (wait >= patience).
        stopper = EarlyStopping(monitor="val_loss", patience=2)  # auto -> min
        assert stopper.better == "min"
        assert EarlyStopping(monitor="val_corr").better == "max"

        state = EngineState(model=None)
        for loss, expect_stopped in [(1.0, False), (0.5, False), (0.6, False),
                                     (0.7, True)]:
            state.metrics = {"val_loss": loss}
            stopper.epoch_complete(state)
            assert state.stopped is expect_stopped, loss
        assert stopper.best == 0.5

    def test_patience_one_stops_on_first_plateau(self):
        """patience=1 must stop on the FIRST non-improving epoch (the
        argus/Keras boundary — wait >= patience, not wait > patience)."""
        from sensorium_tpu.engine.callbacks import EarlyStopping, EngineState

        stopper = EarlyStopping(monitor="val_loss", patience=1)
        state = EngineState(model=None)
        state.metrics = {"val_loss": 1.0}
        stopper.epoch_complete(state)
        assert state.stopped is False
        state.metrics = {"val_loss": 1.0}  # no improvement
        stopper.epoch_complete(state)
        assert state.stopped is True

    def test_fit_loop_stops_at_boundary(self):
        """Through the real fit loop: a never-improving monitored metric
        ends training after 1 + patience epochs."""
        from sensorium_tpu.engine.callbacks import Callback, EarlyStopping

        class ConstantProbe(Callback):
            epochs_run = 0

            def epoch_complete(self, state):
                state.metrics["probe"] = 1.0
                ConstantProbe.epochs_run += 1

        model = MouseModel(tiny_params())
        model.build_state(seed=0, learning_rate=1e-3)
        rng = np.random.default_rng(8)
        loader = FakeLoader([random_batch(rng)])
        model.fit(
            loader,
            num_epochs=6,
            callbacks=[ConstantProbe(), EarlyStopping(monitor="probe", patience=1)],
        )
        assert ConstantProbe.epochs_run == 2  # best at 0, stop at first plateau


class TestResumeEquivalence:
    """train(N) == train(k) -> save -> load -> train(N-k): the property
    that makes ``--resume`` (and preemption exit 75) actually safe.  A
    state *roundtrip* cannot see RNG/step/schedule restoration bugs — only
    continued training can (VERDICT r2 weak-spot 2).  The reference cannot
    resume at all (EMA-weights-only checkpoints, SURVEY.md §5), so this
    pins a capability beyond it."""

    @staticmethod
    def _fresh(seed):
        from sensorium_tpu.engine.schedule import warmup_cosine

        model = MouseModel(tiny_params())
        model.set_ema(0.9)
        # A real warmup+cosine plan makes the optimizer's step counter
        # load-bearing: losing it on resume would change every later LR.
        model.build_state(
            seed=seed, learning_rate=warmup_cosine(1e-3, 1e-5, 2, 4)
        )
        return model

    def _assert_states_equal(self, state_a, state_b):
        flat_a = jax.tree_util.tree_flatten_with_path(jax.device_get(state_a))[0]
        flat_b = dict(jax.tree_util.tree_flatten_with_path(jax.device_get(state_b))[0])
        assert flat_a and len(flat_a) == len(flat_b)
        for path, a in flat_a:
            # Bitwise: same program over identical restored values — the
            # checkpoint serializes exact float bits, so any difference is
            # a restoration bug, not noise.
            np.testing.assert_array_equal(
                a, flat_b[path], err_msg=jax.tree_util.keystr(path)
            )

    def test_step_level_resume_matches_uninterrupted(self, tmp_path):
        rng = np.random.default_rng(5)
        batches = [random_batch(rng) for _ in range(6)]

        continuous = self._fresh(seed=0)
        losses_full = [float(continuous.train_step(b)) for b in batches]

        first = self._fresh(seed=0)
        for b in batches[:3]:
            first.train_step(b)
        first.save_train_state(tmp_path / "mid.ckpt", extra={"epoch": 0})

        # Different init seed: every restored leaf (params, EMA, optimizer
        # moments incl. schedule count, dropout RNG key, step) must come
        # from the checkpoint, not survive from build_state.
        resumed = self._fresh(seed=99)
        resumed.load_train_state(tmp_path / "mid.ckpt")
        losses_tail = [float(resumed.train_step(b)) for b in batches[3:]]

        np.testing.assert_array_equal(losses_tail, losses_full[3:])
        self._assert_states_equal(resumed.state, continuous.state)

    def test_preemption_resume_at_epoch_boundary_matches(self, tmp_path):
        """Through the REAL paths: fit + PreemptionHandler save at an epoch
        boundary, then load + fit for the remaining epochs must equal one
        uninterrupted fit.  (Mid-epoch preemption restarts the interrupted
        epoch by design — the loader has no mid-epoch cursor — so exact
        equivalence is an epoch-boundary property.)"""
        from sensorium_tpu.engine.callbacks import Callback
        from sensorium_tpu.engine.preemption import PreemptionHandler, TrainingPreempted

        rng = np.random.default_rng(6)
        loader = FakeLoader([random_batch(rng) for _ in range(3)])
        save_path = tmp_path / "preempt.ckpt"

        continuous = self._fresh(seed=0)
        continuous.fit(loader, num_epochs=2)

        class PreemptAfterFirstEpoch(Callback):
            def __init__(self, handler):
                self.handler = handler

            def epoch_complete(self, state):
                if state.global_epoch == 0:
                    self.handler.triggered = True

        interrupted = self._fresh(seed=0)
        with PreemptionHandler() as handler:
            with pytest.raises(TrainingPreempted):
                interrupted.fit(
                    loader,
                    num_epochs=2,
                    callbacks=[PreemptAfterFirstEpoch(handler)],
                    preemption=handler,
                    preemption_save_path=save_path,
                )

        resumed = self._fresh(seed=77)
        extra = resumed.load_train_state(save_path)
        assert extra["epoch"] == 0  # epoch 0 fully committed
        resumed.fit(loader, num_epochs=1, start_epoch=1)

        self._assert_states_equal(resumed.state, continuous.state)


class TestDistillation:
    def test_teacher_fills_unlabeled_cells(self):
        student = MouseModel(tiny_params())
        student.build_state(seed=0, learning_rate=1e-3)

        teacher = MouseModel(tiny_params())
        teacher.build_state(seed=1)
        student.set_distill(
            teacher.nn_module,
            {
                "params": teacher.state.params,
                "batch_stats": teacher.state.batch_stats,
            },
            ratio=0.36,
        )
        rng = np.random.default_rng(3)
        batch = random_batch(rng)
        loss = float(student.train_step(batch))
        assert np.isfinite(loss)

        # Without distillation the loss differs (teacher mass added).
        plain = MouseModel(tiny_params())
        plain.build_state(seed=0, learning_rate=1e-3)
        plain_loss = float(plain.train_step(batch))
        assert loss != pytest.approx(plain_loss, rel=1e-6)

    def test_configured_loss_drives_distill_step(self):
        """The reference injects teacher targets and THEN applies whatever
        loss the config names (argus_models.py:50-52); the train step must
        not hardcode the Poisson form when distillation is on."""
        from sensorium_tpu.engine.losses import get_loss, inject_distill_targets

        params = tiny_params()
        params["loss"] = ("MSELoss", {})
        # Deterministic forward so the expectation can be recomputed.
        params["nn_module"][1]["drop_rate"] = 0.0
        params["nn_module"][1]["drop_path_rate"] = 0.0

        student = MouseModel(params)
        student.build_state(seed=0, learning_rate=1e-3)
        teacher = MouseModel(params)
        teacher.build_state(seed=1)
        teacher_vars = {
            "params": teacher.state.params,
            "batch_stats": teacher.state.batch_stats,
        }
        ratio = 0.36
        student.set_distill(teacher.nn_module, teacher_vars, ratio=ratio)

        rng = np.random.default_rng(11)
        batch = random_batch(rng)

        # Recompute the expectation from the same pre-step state.
        step_rng = jax.random.split(student.state.rng)[1]
        prediction, _ = student.nn_module.apply(
            {"params": student.state.params, "batch_stats": student.state.batch_stats},
            batch.inputs,
            train=True,
            rngs={"dropout": step_rng},
            mutable=["batch_stats"],
        )
        teacher_pred = teacher.nn_module.apply(
            {"params": teacher_vars["params"], "batch_stats": teacher_vars["batch_stats"]},
            batch.inputs,
            train=False,
        )
        full_target, full_weights = inject_distill_targets(
            jnp.asarray(batch.targets),
            jnp.asarray(batch.weights),
            teacher_pred.astype(jnp.float32),
            ratio,
        )
        expected = float(
            get_loss("MSELoss", {})(
                prediction.astype(jnp.float32), full_target, full_weights
            )
        )

        actual = float(student.train_step(batch))
        assert actual == pytest.approx(expected, rel=1e-5)


class TestBf16InputStaging:
    """Host-side bf16 staging (engine/model.py ``_stage_inputs``) must be
    bit-identical to the model's own on-device input cast — it only moves
    ``.astype(bfloat16)`` across the host->device transfer."""

    def test_host_cast_matches_device_cast_bitwise(self):
        rng = np.random.default_rng(3)
        x = rng.uniform(0, 255, (2, 5, 4, 16, 16)).astype(np.float32)
        host = np.asarray(x).astype(jnp.bfloat16)
        device = np.asarray(jax.device_get(jnp.asarray(x).astype(jnp.bfloat16)))
        assert host.dtype == device.dtype
        assert np.array_equal(host.view(np.uint16), device.view(np.uint16))

    def test_staged_step_loss_matches_f32_staging(self, monkeypatch):
        rng = np.random.default_rng(4)
        batch = random_batch(rng)
        params = tiny_params()
        nn_kwargs = dict(params["nn_module"][1], dtype="bfloat16")
        params = dict(params, nn_module=("dwiseneuro", nn_kwargs))
        losses = {}
        for flag in ("0", "1"):
            monkeypatch.setenv("SENSORIUM_STAGE_BF16", flag)
            model = MouseModel(params)
            model.build_state(seed=0, learning_rate=1e-3)
            staged = model._stage_inputs(batch.inputs)
            assert staged.dtype == (np.float32 if flag == "0" else jnp.bfloat16)
            losses[flag] = float(model.train_step(batch))
        assert losses["1"] == pytest.approx(losses["0"], rel=1e-6)

    def test_fp32_model_staging_is_identity(self):
        model = MouseModel(tiny_params())
        x = np.ones((1, 5, 4, 16, 16), np.float32)
        assert model._stage_inputs(x) is x

    def test_fp32_teacher_disables_bf16_staging(self):
        """The staged inputs also feed the distill teacher; an fp32 teacher
        must not silently receive bf16-quantized inputs."""
        params = tiny_params()
        nn_kwargs = dict(params["nn_module"][1], dtype="bfloat16")
        params = dict(params, nn_module=("dwiseneuro", nn_kwargs))
        model = MouseModel(params)
        model.build_state(seed=0, learning_rate=1e-3)
        x = np.ones((1, 5, 4, 16, 16), np.float32)
        assert model._stage_inputs(x).dtype == jnp.bfloat16

        teacher = MouseModel(tiny_params())  # fp32 teacher
        tstate = teacher.build_state(seed=1, learning_rate=1e-3)
        model.set_distill(
            teacher.nn_module,
            {"params": tstate.params, "batch_stats": tstate.batch_stats},
            ratio=0.36,
        )
        assert model._stage_inputs(x) is x  # staging reverts to f32


class TestMaskedCellSafety:
    """Zero-weight cells are masked by SELECTION, not multiplication.

    The reference indexes ``input_tensor[mask]`` before the loss runs
    (losses.py:17-20), so unsupervised cells are never evaluated.  Those
    cells receive no gradient and drift over training; a drifted log-rate
    overflowing ``exp`` to inf must poison neither the loss (inf * 0 ->
    NaN) nor the shared-weight gradients (the vjp of ``exp`` at the
    overflowed cell)."""

    def _hot_batch(self, hot_value):
        num_mice, batch, neurons, frames = 2, 3, 4, 2
        prediction = np.full((num_mice, batch, neurons, frames), 0.5, np.float32)
        prediction[1] = hot_value  # mouse-1 columns are unsupervised below
        weights = np.zeros((batch, num_mice), np.float32)
        weights[:, 0] = 1.0
        target = np.ones((batch, neurons, frames), np.float32)
        return prediction, target, weights

    def test_log_input_poisson_is_immune_to_masked_overflow(self):
        from sensorium_tpu.engine.losses import get_loss

        # exp(200) overflows f32 — but only at zero-weight cells.
        pred, target, weights = self._hot_batch(hot_value=200.0)
        neuron_mask = np.ones((2, 4), np.float32)
        loss_fn = get_loss(
            "PoissonNLLLoss", {"log_input": True}, neuron_mask=neuron_mask
        )
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, jnp.asarray(target), jnp.asarray(weights))
        )(jnp.asarray(pred))
        grads = np.asarray(grads)
        assert np.isfinite(float(loss))
        assert np.all(np.isfinite(grads))
        # Reference semantics: masked cells receive exactly zero gradient.
        assert np.all(grads[1] == 0.0)
        assert np.any(grads[0] != 0.0)

    @pytest.mark.parametrize("hot_value", [np.inf, np.nan])
    def test_production_poisson_is_immune_to_masked_nonfinite(self, hot_value):
        """The production loss (log_input=False) must give finite loss and
        grads — and EXACT-0 masked-cell grads — even when an unsupervised
        cell's prediction is inf or NaN.  NaN is the sharp case: without
        input-side selection the vjp multiplies the zero cotangent by a
        NaN partial (0 * NaN = NaN) and poisons every shared-trunk grad."""
        from sensorium_tpu.engine.losses import mice_poisson_loss

        pred, target, weights = self._hot_batch(hot_value=hot_value)
        loss, grads = jax.value_and_grad(
            lambda p: mice_poisson_loss(p, jnp.asarray(target), jnp.asarray(weights))
        )(jnp.asarray(pred))
        grads = np.asarray(grads)
        assert np.isfinite(float(loss))
        assert np.all(np.isfinite(grads))
        assert np.all(grads[1] == 0.0)  # reference semantics: exactly no grad
        assert np.any(grads[0] != 0.0)

    @pytest.mark.parametrize("name", ["L1Loss", "MSELoss", "SmoothL1Loss", "HuberLoss"])
    def test_stock_losses_are_immune_to_masked_inf(self, name):
        from sensorium_tpu.engine.losses import get_loss

        pred, target, weights = self._hot_batch(hot_value=np.inf)
        loss_fn = get_loss(name, {})
        loss, grads = jax.value_and_grad(
            lambda p: loss_fn(p, jnp.asarray(target), jnp.asarray(weights))
        )(jnp.asarray(pred))
        assert np.isfinite(float(loss)), name
        assert np.all(np.isfinite(np.asarray(grads))), name


class _DummyCkptModel:
    def save(self, path, background=False):
        from pathlib import Path

        Path(path).write_bytes(b"model")

    def save_train_state(self, path, extra=None, background=False):
        from pathlib import Path

        Path(path).write_bytes(b"state")


class TestCheckpointBetter:
    def test_rejects_unknown_better(self, tmp_path):
        # "Max"/"maximize" would silently sort ascending and keep the
        # WORST checkpoints; only min/max/auto are meaningful.
        with pytest.raises(ValueError, match="better"):
            Checkpoint(tmp_path, better="maximize")

    def test_auto_min_keeps_lowest_loss(self, tmp_path):
        cb = Checkpoint(
            tmp_path,
            file_format="model-{epoch:03d}-{val_loss:.6f}.ckpt",
            monitor="val_loss",
            better="auto",  # "loss" monitor -> min
            max_saves=1,
        )
        state = EngineState(model=_DummyCkptModel())
        for epoch, score in [(0, 2.0), (1, 1.0), (2, 3.0)]:
            state.global_epoch = epoch
            state.metrics = {"val_loss": score}
            cb.epoch_complete(state)
        kept = list(tmp_path.glob("model-*.ckpt"))
        assert len(kept) == 1
        assert "1.000000" in kept[0].name


class TestCSVHeaderDrift:
    def test_header_union_keeps_columns_aligned(self, tmp_path):
        """A later fit appending rows with a different metric set (a stage
        without val keys, a new metric on resume) must not land values
        under the wrong header columns."""
        import csv as csv_mod

        from sensorium_tpu.engine.callbacks import LoggingToCSV

        path = tmp_path / "log.csv"
        first = LoggingToCSV(path)
        state = EngineState(model=None)
        state.global_epoch = 0
        state.metrics = {"train_loss": 1.0, "val_loss": 2.0}
        first.epoch_complete(state)

        resumed = LoggingToCSV(path, append=True)  # fresh callback instance
        state.global_epoch = 1
        state.metrics = {"train_loss": 0.5, "epoch_time": 3.0}
        resumed.epoch_complete(state)

        with open(path, newline="") as handle:
            rows = list(csv_mod.DictReader(handle))
        assert rows[0]["val_loss"] == "2.0" and rows[0]["epoch_time"] == ""
        assert rows[1]["val_loss"] == "" and rows[1]["epoch_time"] == "3.0"
        assert [r["train_loss"] for r in rows] == ["1.0", "0.5"]


class TestModelApiHardening:
    def test_iter_size_must_divide_batch(self):
        """The reference's deep_chunk allows uneven chunks (11/11/10); the
        static-shape lax.scan cannot — the error must say so, not crash in
        an opaque reshape trace."""
        model = MouseModel(tiny_params(iter_size=3))
        model.build_state(seed=0, learning_rate=1e-3)
        batch = random_batch(np.random.default_rng(0), batch=4)
        with pytest.raises(ValueError, match="iter_size"):
            model.train_step(batch)

    def test_set_ema_after_build_state(self):
        model = MouseModel(tiny_params())
        model.build_state(seed=0, learning_rate=1e-2)
        assert model.state.ema_params is None
        rng = np.random.default_rng(2)
        batch = random_batch(rng)
        model.train_step(batch)  # bakes use_ema=False into a cached step

        model.set_ema(0.9)  # must create EMA trees AND invalidate the step
        assert model.state.ema_params is not None
        before = np.asarray(
            jax.tree_util.tree_leaves(model.state.ema_params)[0]
        ).copy()
        loss = model.train_step(batch)
        assert np.isfinite(float(loss))
        after = np.asarray(jax.tree_util.tree_leaves(model.state.ema_params)[0])
        assert not np.array_equal(before, after)  # EMA actually updated

        model.set_ema(0.0)  # and back off: trees dropped, step rebuilt
        assert model.state.ema_params is None
        assert np.isfinite(float(model.train_step(batch)))

    def test_example_input_matches_processor_layout(self):
        """inputs_processor size is (width, height); batches are
        (..., height, width) — the init canvas must match, or non-square
        configs would trace init on a transposed geometry."""
        params = tiny_params()
        params = dict(
            params,
            inputs_processor=("stack_inputs", {"size": (16, 8), "pad_fill_value": 0.0}),
        )
        model = MouseModel(params)
        assert model.example_input().shape[-2:] == (8, 16)

    def test_second_model_keeps_installed_log_handlers(self, tmp_path):
        """MouseModel construction must not clear the shared logger's
        handlers (a distillation teacher / Predictor built mid-run would
        silently drop log.txt)."""
        import logging

        from sensorium_tpu.engine.callbacks import build_logger

        logger = logging.getLogger("sensorium")
        added = [h for h in logger.handlers]
        try:
            build_logger(tmp_path / "log.txt")
            count = lambda: sum(
                isinstance(h, logging.FileHandler) for h in logger.handlers
            )
            assert count() == 1
            MouseModel(tiny_params())
            assert count() == 1  # constructor preserved the file handler
            build_logger(tmp_path / "log.txt")  # idempotent: no duplicate
            assert count() == 1
        finally:
            for handler in [h for h in logger.handlers if h not in added]:
                logger.removeHandler(handler)
                handler.close()
