"""SpecAugment in pure JAX, jit/vmap-friendly with static shapes.

The reference constructs torchaudio's SpecAugment with 2x time-mask(100),
2x freq-mask(27), p=1, zero-masking (reference: train.py:128-133,
processing/augment.py:8-16) but then never applies it — the collate passes
``augment=False`` unconditionally (reference: dataset.py:94). Here it is real:
the train input pipeline applies it on-device.

Masks are drawn per example: width ~ U{0..mask_param} (additionally capped by
``prob * axis_len``), start ~ U{0..axis_len-width}; masked cells are set to
zero (or the per-example mean when ``zero_masking=False``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from conformer_tpu.config import AugmentConfig


def _axis_masks(rng: jax.Array, b: int, n_masks: int, mask_param: int,
                axis_len: int, prob: float) -> jnp.ndarray:
    """-> (B, axis_len) bool, True where masked. One batched draw — the
    per-example vmap-over-split formulation cost ~3 ms of pure PRNG-chain
    and tiny-op overhead per step."""
    k_width, k_start = jax.random.split(rng)
    cap = jnp.asarray(int(prob * axis_len), dtype=jnp.int32)
    widths = jax.random.randint(k_width, (b, n_masks), 0, mask_param + 1)
    widths = jnp.minimum(widths, cap)
    starts = jax.random.randint(k_start, (b, n_masks), 0,
                                jnp.maximum(axis_len - widths, 1))
    pos = jnp.arange(axis_len)[None, None, :]
    in_mask = ((pos >= starts[..., None])
               & (pos < (starts + widths)[..., None]))     # (B, N, L)
    return jnp.any(in_mask, axis=1)


def spec_augment(rng: jax.Array, mel: jnp.ndarray, cfg: AugmentConfig,
                 lengths: jnp.ndarray | None = None) -> jnp.ndarray:
    """Apply SpecAugment to a (B, T, F) log-mel batch.

    When `lengths` is given, time-mask starts are drawn over the padded axis but
    masking padded frames is harmless (they are ignored downstream).
    """
    if not cfg.enabled:
        return mel
    b, t, f = mel.shape
    k_t, k_f = jax.random.split(rng)
    tmask = _axis_masks(k_t, b, cfg.n_time_masks, cfg.time_mask_param, t,
                        cfg.prob)
    fmask = _axis_masks(k_f, b, cfg.n_freq_masks, cfg.freq_mask_param, f,
                        cfg.prob)
    masked = tmask[:, :, None] | fmask[:, None, :]
    if cfg.zero_masking:
        fill = jnp.zeros((b, 1, 1), mel.dtype)
    else:
        fill = jnp.mean(mel, axis=(1, 2), keepdims=True)
    return jnp.where(masked, fill, mel)
