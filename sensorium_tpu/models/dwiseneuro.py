"""DwiseNeuro — the Sensorium 2023 winning architecture, rebuilt TPU-first.

Behavioral parity with ``/root/reference/src/models/dwiseneuro.py`` (same
math, same hyperparameters, same BN-everywhere/shortcut/shuffle semantics),
re-architected for XLA/TPU:

* channels-last layout everywhere — channels ride the 128-lane axis, so
  pointwise convs are MXU matmuls and depthwise convs are fused VPU
  shifted-adds (see ``sensorium_tpu.ops.conv``);
* bfloat16 compute / float32 parameters, BN statistics, and predictions
  (replaces torch CUDA AMP + GradScaler — bf16 needs no loss scaling);
* the positional-encoding tables are trace-time constants;
* the 10 per-mouse readouts (the dominant parameter mass, ~17M each) are a
  single stacked parameter ``(M, G, C/G, P)`` evaluated by one einsum, so
  they shard cleanly over a device mesh (tensor/expert parallel) instead of
  being 10 sequential grouped convs;
* all-mice outputs are returned as one zero-padded ``(M, B, N_max, T)``
  array (structure-of-arrays) rather than a ragged list.

Structure (reference lines cited per block):
  stem: pointwise conv in->f0 + BN                    (dwiseneuro.py:306-309)
  9x [add 3-axis sinusoidal PE                        (dwiseneuro.py:147-192)
      InvertedResidual3d: pw-expand -> spatial dw ->
      temporal dw -> SE -> pw-linear, DropPath +
      interpolate/tile shortcut, BN after every conv] (dwiseneuro.py:70-144)
  spatial mean pool                                   (dwiseneuro.py:374,400)
  cortex: 3x grouped-1x1-conv ShuffleLayer            (dwiseneuro.py:195-263)
  per-mouse readout: Dropout1d -> grouped 1x1 conv ->
  slice to N -> Softplus(beta)                        (dwiseneuro.py:266-287)
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from sensorium_tpu.ops.conv import (
    depthwise_conv_spatial,
    depthwise_conv_temporal,
    einsum_f32,
    grouped_pointwise,
    pointwise,
)
from sensorium_tpu.ops.norm import BatchNorm
from sensorium_tpu.ops.pe import position_encoding_3d
from sensorium_tpu.ops.shuffle import channel_shuffle
from sensorium_tpu.ops.stochastic import channel_dropout, drop_path


def kaiming_normal_out(fan_out: int):
    """Conv weight init: normal(0, sqrt(2 / fan_out)), fan_out group-corrected."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * math.sqrt(2.0 / fan_out)

    return init


def softplus_beta(x: jax.Array, beta: float, threshold: float = 20.0) -> jax.Array:
    """softplus(beta * x) / beta with torch's linear region above threshold."""
    bx = beta * x
    return jnp.where(bx > threshold, x, jnp.logaddexp(bx, 0.0) / beta)


def softplus_learnable(x: jax.Array, beta: jax.Array) -> jax.Array:
    """softplus(beta * x) / beta with a TRAINABLE beta.

    Value-identical to the reference's numerically-stable
    ``LearnableSoftplus`` (README.md:121-133),
    ``(clamp(xb, 0) + log1p(exp(min(xb, -xb)))) / beta``, which is exactly
    ``logaddexp(xb, 0) / beta``.  Unlike the fixed form there is no hard
    linear-region threshold: ``log1p(exp(-|xb|))`` only underflows to zero
    near ``|xb| ~ 88`` in f32 (between 20 and 88 the two forms differ by
    up to ``exp(-20)/beta``), so at init this matches the fixed-beta model
    to float tolerance, not bit-exactly.
    """
    return jnp.logaddexp(beta * x, 0.0) / beta


def readout_group_sizes(num_neurons: int, groups: int) -> list[int]:
    """How many of each group's conv outputs survive the slice to N neurons.

    The grouped conv emits ceil(N/G) channels per group; slicing the
    concatenated output to N keeps all of the leading groups and a partial
    tail group (reference: dwiseneuro.py:277-285).
    """
    per_group = math.ceil(num_neurons / groups)
    sizes = []
    remaining = num_neurons
    for _ in range(groups):
        take = min(per_group, max(remaining, 0))
        sizes.append(take)
        remaining -= take
    return sizes


class BatchNormAct(nn.Module):
    features: int
    act: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = BatchNorm(self.features, dtype=self.dtype, name="bn")(x, train)
        if self.act:
            x = nn.silu(x)
        return x


class SqueezeExcite(nn.Module):
    """Global-context channel gating: mean over (T,H,W) -> reduce -> expand."""

    features: int
    reduce_ratio: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        rd = self.features // self.reduce_ratio
        squeezed = jnp.mean(x.astype(jnp.float32), axis=(1, 2, 3)).astype(self.dtype)
        w_reduce = self.param("reduce_kernel", kaiming_normal_out(rd), (self.features, rd))
        b_reduce = self.param("reduce_bias", nn.initializers.zeros, (rd,))
        w_expand = self.param(
            "expand_kernel", kaiming_normal_out(self.features), (rd, self.features)
        )
        b_expand = self.param("expand_bias", nn.initializers.zeros, (self.features,))
        gate = nn.silu(squeezed @ w_reduce.astype(self.dtype) + b_reduce.astype(self.dtype))
        gate = nn.sigmoid(gate @ w_expand.astype(self.dtype) + b_expand.astype(self.dtype))
        return x * gate[:, None, None, None, :]


class InvertedResidual3d(nn.Module):
    """(2+1)D depthwise inverted-residual block with SE and BN shortcuts."""

    in_features: int
    out_features: int
    spatial_kernel: int = 3
    temporal_kernel: int = 3
    spatial_stride: int = 1
    expansion_ratio: int = 3
    se_reduce_ratio: int = 16
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def shortcut(self, x, train: bool):
        """Parameter-free shortcut: nearest spatial downsample + channel tile.

        TPU lowering notes: when the stride divides H and W, the nearest-index
        gather ``idx[i] = i*h // out_h`` is exactly ``i*stride``, so the
        downsample is the basic-indexing form ``x[:, :, ::s, ::s]``.  jnp
        lowers TWO strided axes in one getitem to a constant-iota
        ``stablehlo.gather`` — and that form is the MEASURED-FASTEST
        whole-model emission on a v5e: round 3 "pinned" an explicit
        ``lax.slice`` here (clean ``stablehlo.slice``) and silently lost 8%
        eval throughput (512-516 clips/s across 3 runs vs 553-557 for this
        form; re-A/B'd 2026-08-20, an ``optimization_barrier`` variant also
        516).  Isolated, the two forms time identically (29 vs 31 us) and
        XLA:TPU keeps the gather as a kCustom fused dynamic-slice — the win
        is a whole-model fusion/layout choice, pinned by measurement, not
        mechanism (docs/PERF.md "shortcut lowering, revisited";
        tests/test_lowering.py allows exactly this one gather per strided
        block and still bans scatter/while).
        Likewise the channel tile is a minor-axis concatenate, which keeps
        the (8,128) tiled layout, rather than ``jnp.tile`` (a 6D broadcast
        in (2,128) layout). Both forms are bit-identical to the originals.
        """
        _, _, h, w, c = x.shape
        if self.spatial_stride > 1:
            if h % self.spatial_stride == 0 and w % self.spatial_stride == 0:
                x = x[:, :, :: self.spatial_stride, :: self.spatial_stride]
            else:
                out_h = math.ceil(h / self.spatial_stride)
                out_w = math.ceil(w / self.spatial_stride)
                idx_h = np.arange(out_h) * h // out_h
                idx_w = np.arange(out_w) * w // out_w
                x = x[:, :, idx_h][:, :, :, idx_w]
        if c != self.out_features:
            reps = math.ceil(self.out_features / c)
            x = jnp.concatenate([x] * reps, axis=-1)[..., : self.out_features]
        return BatchNormAct(self.out_features, act=False, dtype=self.dtype, name="bn_sc")(
            x, train
        )

    @nn.compact
    def __call__(self, x, train: bool):
        mid = self.in_features * self.expansion_ratio
        shortcut = self.shortcut(x, train)

        # Pointwise expansion (MXU matmul).
        w_pw = self.param("pw_kernel", kaiming_normal_out(mid), (self.in_features, mid))
        x = pointwise(x, w_pw.astype(self.dtype))
        x = BatchNormAct(mid, dtype=self.dtype, name="pw_bn")(x, train)

        # Spatial depthwise conv (VPU shifted-adds), stride on (H, W).
        w_sp = self.param(
            "spatial_dw_kernel",
            kaiming_normal_out(self.spatial_kernel * self.spatial_kernel),
            (self.spatial_kernel, self.spatial_kernel, mid),
        )
        x = depthwise_conv_spatial(x, w_sp.astype(self.dtype), stride=self.spatial_stride)
        x = BatchNormAct(mid, dtype=self.dtype, name="spatial_bn")(x, train)

        # Temporal depthwise conv.
        w_tm = self.param(
            "temporal_dw_kernel",
            kaiming_normal_out(self.temporal_kernel),
            (self.temporal_kernel, mid),
        )
        x = depthwise_conv_temporal(x, w_tm.astype(self.dtype))
        x = BatchNormAct(mid, dtype=self.dtype, name="temporal_bn")(x, train)

        x = SqueezeExcite(mid, self.se_reduce_ratio, dtype=self.dtype, name="se")(x)

        # Pointwise linear projection (no activation).
        w_pwl = self.param(
            "pwl_kernel", kaiming_normal_out(self.out_features), (mid, self.out_features)
        )
        x = pointwise(x, w_pwl.astype(self.dtype))
        x = BatchNormAct(self.out_features, act=False, dtype=self.dtype, name="pwl_bn")(x, train)

        if train and self.drop_path_rate > 0.0:
            x = drop_path(x, self.drop_path_rate, self.make_rng("dropout"))
        return x + shortcut


class ShuffleLayer(nn.Module):
    """Grouped 1x1 conv over (B, T, C) + BN/SiLU + channel shuffle + shortcut."""

    in_features: int
    out_features: int
    groups: int = 1
    drop_path_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        shortcut = x
        cin_g = self.in_features // self.groups
        cout_g = self.out_features // self.groups
        kernel = self.param(
            "kernel", kaiming_normal_out(cout_g), (self.groups, cin_g, cout_g)
        )
        y = grouped_pointwise(x, kernel.astype(self.dtype))
        y = BatchNormAct(self.out_features, dtype=self.dtype, name="bn")(y, train)
        y = channel_shuffle(y, self.groups)
        if train and self.drop_path_rate > 0.0:
            y = drop_path(y, self.drop_path_rate, self.make_rng("dropout"))

        if self.in_features != self.out_features:
            reps = math.ceil(self.out_features / self.in_features)
            # Minor-axis concatenate, not jnp.tile: bit-identical but keeps
            # the (8,128) layout (same lowering fix as InvertedResidual3d's
            # shortcut above; docs/PERF.md "shortcut lowering fix").
            shortcut = jnp.concatenate([shortcut] * reps, axis=-1)[..., : self.out_features]
        shortcut = BatchNormAct(self.out_features, act=False, dtype=self.dtype, name="bn_sc")(
            shortcut, train
        )
        return y + shortcut


class DwiseNeuro(nn.Module):
    """Core + cortex + stacked per-mouse readouts.

    ``__call__(inputs, mouse_index=None, train=False)``:
      inputs: (B, 5, T, H, W) float32 (reference data layout; transposed to
      channels-last internally).
      mouse_index None -> (num_mice, B, max(readout_outputs), T) padded
      predictions; otherwise (B, readout_outputs[mouse_index], T).
    """

    # Defaults pin the reference's user-facing constructor signature
    # (/root/reference/src/models/dwiseneuro.py:343-357): constructing
    # DwiseNeuro(readout_outputs=...) with no further arguments must give
    # the same 9-block architecture there and here.
    readout_outputs: Sequence[int]
    in_channels: int = 5
    core_features: Sequence[int] = (64, 64, 64, 64, 128, 128, 128, 256, 256)
    spatial_strides: Sequence[int] = (2, 1, 1, 1, 2, 1, 1, 2, 1)
    spatial_kernel: int = 3
    temporal_kernel: int = 5
    expansion_ratio: int = 6
    se_reduce_ratio: int = 32
    cortex_features: Sequence[int] = (1024, 2048, 4096)
    groups: int = 2
    softplus_beta: float = 0.07
    # Trainable per-readout softplus beta, initialized at ``softplus_beta``
    # (the reference author's README.md:112-133 experiment: the trained
    # value converges near the grid-searched optimum).  Off in every
    # shipped config — the reference found it slightly worse — but exposed
    # so a config can flip it on to auto-tune beta.
    learnable_softplus: bool = False
    drop_rate: float = 0.4
    drop_path_rate: float = 0.1
    dtype: jnp.dtype = jnp.bfloat16
    readout_pad_multiple: int = 128
    # Rematerialize core blocks in the backward pass: the inverted
    # residuals' expanded activations (x7 channels at up to 64x64 spatial)
    # dominate training memory; recomputing them trades cheap VPU FLOPs for
    # ~4x less HBM, which is what lets global batch 32 fit a 16 GB chip.
    # ``remat_blocks``: an int k remats the first k blocks (the
    # high-resolution memory hogs); -1 remats all of them; a sequence
    # remats exactly those block indexes (e.g. (0, 7, 8): remat block 0
    # plus the cheap-to-recompute late blocks, store blocks 1-6).  Late
    # blocks run at <=16x16 spatial where storing intermediates is cheap,
    # so skipping their recompute buys wall-clock at little memory cost.
    remat: bool = True
    remat_blocks: int | Sequence[int] = -1

    @property
    def num_mice(self) -> int:
        return len(self.readout_outputs)

    @property
    def max_neurons(self) -> int:
        return max(self.readout_outputs)

    @property
    def padded_group_size(self) -> int:
        """Per-group readout rows, padded up for MXU tile alignment."""
        largest = max(math.ceil(n / self.groups) for n in self.readout_outputs)
        m = self.readout_pad_multiple
        return (largest + m - 1) // m * m

    def core(self, x, train: bool):
        features = tuple(self.core_features)
        strides = tuple(self.spatial_strides)
        num_blocks = len(features)
        # Reference assert (dwiseneuro.py:304): a mismatched strides tuple
        # must be a clear config error, not a silently ignored extra
        # stride or an opaque IndexError inside jit tracing.
        if len(strides) != num_blocks:
            raise ValueError(
                f"spatial_strides has {len(strides)} entries for "
                f"{num_blocks} core blocks (core_features {features})"
            )

        w_stem = self.param(
            "stem_kernel", kaiming_normal_out(features[0]), (self.in_channels, features[0])
        )
        x = pointwise(x, w_stem.astype(self.dtype))
        x = BatchNormAct(features[0], act=False, dtype=self.dtype, name="stem_bn")(x, train)

        # train is a static Python bool -> mark it static for checkpoint.
        # (A save-only-BN-stats checkpoint policy was A/B-measured neutral
        # on v5e — XLA already fuses the stats reduce into the normalize
        # recompute — so plain full-block remat is kept.)
        remat_cls = nn.remat(InvertedResidual3d, static_argnums=(2,))
        if isinstance(self.remat_blocks, int):
            limit = num_blocks if self.remat_blocks < 0 else self.remat_blocks
            remat_set = frozenset(range(limit))
        else:
            remat_set = frozenset(int(i) for i in self.remat_blocks)

        for i in range(num_blocks):
            block_cls = (
                remat_cls if self.remat and i in remat_set else InvertedResidual3d
            )
            out_features = features[i + 1] if i + 1 < num_blocks else features[i]
            pe = position_encoding_3d(features[i], *x.shape[1:4])
            x = x + jnp.asarray(pe, dtype=x.dtype)
            x = block_cls(
                in_features=features[i],
                out_features=out_features,
                spatial_kernel=self.spatial_kernel,
                temporal_kernel=self.temporal_kernel,
                spatial_stride=strides[i],
                expansion_ratio=self.expansion_ratio,
                se_reduce_ratio=self.se_reduce_ratio,
                drop_path_rate=self.drop_path_rate * i / num_blocks,
                dtype=self.dtype,
                name=f"block_{i}",
            )(x, train)
        return x

    def cortex(self, x, train: bool):
        prev = tuple(self.core_features)[-1]
        for i, features in enumerate(self.cortex_features):
            x = ShuffleLayer(
                in_features=prev,
                out_features=features,
                groups=self.groups,
                drop_path_rate=self.drop_path_rate,
                dtype=self.dtype,
                name=f"cortex_{i}",
            )(x, train)
            prev = features
        return x

    def _readout_params(self):
        cortex_out = tuple(self.cortex_features)[-1]
        cin_g = cortex_out // self.groups
        pad = self.padded_group_size
        # Per-mouse init std follows the group-corrected fan_out of the
        # reference conv init: sqrt(2 / ceil(N_i / G)).
        stds = np.array(
            [math.sqrt(2.0 / math.ceil(n / self.groups)) for n in self.readout_outputs],
            dtype=np.float32,
        )

        def kernel_init(key, shape, dtype=jnp.float32):
            return jax.random.normal(key, shape, dtype) * stds[:, None, None, None]

        kernel = self.param(
            "readout_kernel", kernel_init, (self.num_mice, self.groups, cin_g, pad)
        )
        bias = self.param(
            "readout_bias", nn.initializers.zeros, (self.num_mice, self.groups, pad)
        )
        return kernel, bias

    def _assemble_flat(self, grouped: jax.Array, mouse: int) -> jax.Array:
        """(B, T, G, P) group-layout activations -> (B, N_mouse, T) flat order."""
        sizes = readout_group_sizes(self.readout_outputs[mouse], self.groups)
        parts = [grouped[:, :, g, : sizes[g]] for g in range(self.groups)]
        flat = jnp.concatenate(parts, axis=-1)  # (B, T, N)
        return jnp.swapaxes(flat, 1, 2)

    @nn.compact
    def __call__(self, inputs, mouse_index: int | None = None, train: bool = False):
        x = jnp.transpose(inputs, (0, 2, 3, 4, 1)).astype(self.dtype)  # (B,T,H,W,C)
        x = self.core(x, train)
        x = jnp.mean(x.astype(jnp.float32), axis=(2, 3)).astype(self.dtype)  # (B,T,C)
        x = self.cortex(x, train)

        kernel, bias = self._readout_params()
        if self.learnable_softplus:
            # One beta per readout — the reference experiment replaces each
            # Readout's Softplus with its own LearnableSoftplus module.
            betas = self.param(
                "readout_softplus_beta",
                lambda key, shape: jnp.full(shape, self.softplus_beta, jnp.float32),
                (self.num_mice,),
            )
        kernel = kernel.astype(self.dtype)
        cortex_out = x.shape[-1]
        cin_g = cortex_out // self.groups

        def to_groups(flat):
            return flat.reshape(flat.shape[:-1] + (self.groups, cin_g))

        if mouse_index is not None:
            if train and self.drop_rate > 0.0:
                x = channel_dropout(x, self.drop_rate, self.make_rng("dropout"))
            xg = to_groups(x)  # (B,T,G,C/G)
            logits = (
                einsum_f32("btgc,gcp->btgp", xg, kernel[mouse_index])
                + bias[mouse_index]
            )
            if self.learnable_softplus:
                pred = softplus_learnable(logits, betas[mouse_index].astype(logits.dtype))
            else:
                pred = softplus_beta(logits, self.softplus_beta)
            return self._assemble_flat(pred, mouse_index)

        # All-mice path: each readout draws its own dropout mask on the
        # shared cortex output (matching the reference, where every Readout
        # module holds its own Dropout1d).
        if train and self.drop_rate > 0.0:
            xm = jnp.broadcast_to(x, (self.num_mice,) + x.shape)
            xm = channel_dropout(
                xm.reshape((self.num_mice * x.shape[0],) + x.shape[1:]),
                self.drop_rate,
                self.make_rng("dropout"),
            ).reshape((self.num_mice,) + x.shape)
            logits = einsum_f32("mbtgc,mgcp->mbtgp", to_groups(xm), kernel)
        else:
            logits = einsum_f32("btgc,mgcp->mbtgp", to_groups(x), kernel)
        logits = logits + bias[:, None, None]
        if self.learnable_softplus:
            pred = softplus_learnable(
                logits, betas[:, None, None, None, None].astype(logits.dtype)
            )
        else:
            pred = softplus_beta(logits, self.softplus_beta)

        padded = []
        for mouse in range(self.num_mice):
            flat = self._assemble_flat(pred[mouse], mouse)  # (B, N_m, T)
            pad_rows = self.max_neurons - flat.shape[1]
            padded.append(jnp.pad(flat, ((0, 0), (0, pad_rows), (0, 0))))
        return jnp.stack(padded, axis=0)  # (M, B, N_max, T)


def neuron_validity_mask(readout_outputs: Sequence[int]) -> np.ndarray:
    """(M, N_max) float32 mask of real (non-padded) neurons per mouse."""
    max_n = max(readout_outputs)
    mask = np.zeros((len(readout_outputs), max_n), dtype=np.float32)
    for i, n in enumerate(readout_outputs):
        mask[i, :n] = 1.0
    return mask
