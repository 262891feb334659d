"""Conformer building blocks: FFN, convolution module, subsampling, norms.

Behavioral contract (verified by tests):
- FFN: LN -> Dense d->4d -> swish -> dropout -> Dense 4d->d -> dropout
  (reference: model/utils/ffn.py:5-22).
- Conv module: LN -> pointwise 2x expand -> GLU -> depthwise conv (kernel 31,
  same-pad) -> BatchNorm -> swish -> pointwise -> dropout
  (reference: model/utils/convolution.py:7-32). Operates time-major throughout —
  no transpose dance (reference transposes to channels-first, convolution.py:23,31).
- Subsampling: two valid 3x3 stride-2 convs + ReLU; length formula
  ``((n-1)//2 - 1)//2`` (reference: model/utils/convolution.py:34-57).

TPU-first choices: NHWC/NWC layouts native to XLA:TPU; depthwise conv via
``feature_group_count``; BatchNorm is mask-aware (the reference silently folds
garbage padded frames into its statistics) and supports a cross-replica axis
for correct data-parallel sync (the reference uses local per-GPU stats).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from conformer_tpu.models.dropout import Dropout


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) (reference: model/utils/activation.py:4-8)."""
    return x * jax.nn.sigmoid(x)


def glu(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Gated linear unit: split in two along `axis`, gate with sigmoid
    (reference: model/utils/activation.py:10-17)."""
    a, b = jnp.split(x, 2, axis=axis)
    return a * jax.nn.sigmoid(b)


class FeedForwardModule(nn.Module):
    d_model: int
    expansion: int = 4
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    dropout_impl: str = "prng"

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.Dense(self.expansion * self.d_model, dtype=self.dtype,
                     param_dtype=jnp.float32, name="hidden")(x)
        x = swish(x)
        x = Dropout(self.dropout_rate, self.dropout_impl)(x, deterministic)
        x = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                     name="out")(x)
        return Dropout(self.dropout_rate, self.dropout_impl)(x, deterministic)


class MaskedBatchNorm(nn.Module):
    """BatchNorm over (batch, time) with optional validity mask and optional
    cross-replica reduction via `axis_name` (psum over the data mesh axis).

    Normalization uses the biased batch variance; running stats use the
    unbiased estimate with momentum 0.1 (torch BatchNorm1d semantics, so the
    reference's training dynamics are reproduced where the mask covers
    everything).
    """

    features: int
    momentum: float = 0.1
    epsilon: float = 1e-5
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 use_running_average: bool = True) -> jnp.ndarray:
        """x: (B, L, C); mask: (B, L) bool True at valid frames."""
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", nn.initializers.zeros,
                                None, (self.features,), jnp.float32)
        ra_var = self.variable("batch_stats", "var", nn.initializers.ones,
                               None, (self.features,), jnp.float32)

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            if mask is not None:
                m = mask[..., None].astype(jnp.float32)
                count = jnp.sum(m)
                total = jnp.sum(xf * m, axis=(0, 1))
                total_sq = jnp.sum(xf * xf * m, axis=(0, 1))
            else:
                count = jnp.asarray(x.shape[0] * x.shape[1], jnp.float32)
                total = jnp.sum(xf, axis=(0, 1))
                total_sq = jnp.sum(xf * xf, axis=(0, 1))
            if self.axis_name is not None:
                count = jax.lax.psum(count, self.axis_name)
                total = jax.lax.psum(total, self.axis_name)
                total_sq = jax.lax.psum(total_sq, self.axis_name)
            count = jnp.maximum(count, 1.0)
            mean = total / count
            var = jnp.maximum(total_sq / count - mean * mean, 0.0)

            if not self.is_initializing():
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(self.dtype)


class DepthwiseConv1d(nn.Module):
    """Depthwise same-pad conv1d with selectable backend.

    Parameter layout matches flax nn.Conv with feature_group_count=channels
    (kernel (K, 1, C), bias (C,)), so checkpoints are interchangeable between
    the XLA and Pallas implementations.
    """

    channels: int
    kernel_size: int
    impl: str = "xla"              # 'xla' | 'pallas'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.kernel_size, 1, self.channels), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.channels,),
                          jnp.float32)
        if self.impl == "pallas":
            from conformer_tpu.ops.pallas.depthwise_conv import depthwise_conv1d

            return depthwise_conv1d(x, kernel[:, 0, :].astype(self.dtype),
                                    bias.astype(self.dtype), True)
        out = jax.lax.conv_general_dilated(
            x, kernel.astype(self.dtype), window_strides=(1,), padding="SAME",
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=self.channels)
        return out + bias.astype(self.dtype)[None, None, :]


class ConvolutionModule(nn.Module):
    channels: int
    kernel_size: int
    dropout_rate: float = 0.0
    conv_norm: str = "batch"        # 'batch' (reference) or 'group'
    conv_impl: str = "xla"          # depthwise conv backend: 'xla' | 'pallas'
    mask_pad: bool = True           # zero padded frames before the conv
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    dropout_impl: str = "prng"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: (B, L, C); mask: (B, L) True at valid frames."""
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.Dense(2 * self.channels, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pointwise1")(x)
        x = glu(x, axis=-1)
        if not self.mask_pad:
            mask = None  # reference semantics: convolve over pad content
        if mask is not None:
            # Zero padded frames so the depthwise conv cannot leak pad garbage
            # into valid frames (reference convolves over pad content).
            x = jnp.where(mask[..., None], x, 0.0)
        x = DepthwiseConv1d(self.channels, self.kernel_size, self.conv_impl,
                            self.dtype, name="depthwise")(x)
        if self.conv_norm == "batch":
            x = MaskedBatchNorm(self.channels, axis_name=self.bn_axis_name,
                                dtype=self.dtype, name="norm")(
                x, mask=mask, use_running_average=deterministic)
        else:
            x = nn.GroupNorm(num_groups=1, dtype=self.dtype,
                             param_dtype=jnp.float32, name="norm")(x)
        x = swish(x)
        x = nn.Dense(self.channels, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pointwise2")(x)
        return Dropout(self.dropout_rate, self.dropout_impl)(x, deterministic)


class ConvolutionSubsampling(nn.Module):
    """Two valid 3x3 stride-2 convs over (B, T, F, 1) -> (B, T', F'*d)
    features (reference: model/utils/convolution.py:34-57).

    impl='separable' swaps the second conv (channels->channels dense 3x3 —
    measured ~12% of the whole train step at near-peak MFU) for depthwise
    3x3 + pointwise 1x1, the reference's own aspirational-but-unwired
    DepthWiseSeperableConvolution (convolution.py:59-70) made real: ~9x
    fewer FLOPs, same shapes/length formula, different parameters (not
    checkpoint-compatible with the reference)."""

    channels: int
    dtype: jnp.dtype = jnp.float32
    impl: str = "conv2d"             # 'conv2d' (reference) | 'separable'

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, F) log-mels -> (B, T', F' * channels)."""
        x = x[..., None].astype(self.dtype)                  # NHWC, H=time, W=freq
        x = nn.Conv(self.channels, kernel_size=(3, 3), strides=(2, 2),
                    padding="VALID", dtype=self.dtype, param_dtype=jnp.float32,
                    name="conv1")(x)
        x = nn.relu(x)
        if self.impl == "separable":
            x = nn.Conv(self.channels, kernel_size=(3, 3), strides=(2, 2),
                        padding="VALID", feature_group_count=self.channels,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv2_dw")(x)
            x = nn.Conv(self.channels, kernel_size=(1, 1),
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name="conv2_pw")(x)
        else:
            x = nn.Conv(self.channels, kernel_size=(3, 3), strides=(2, 2),
                        padding="VALID", dtype=self.dtype,
                        param_dtype=jnp.float32, name="conv2")(x)
        x = nn.relu(x)
        b, t, f, c = x.shape
        return x.reshape(b, t, f * c)
