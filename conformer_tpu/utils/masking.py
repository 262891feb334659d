"""Length/mask utilities.

Centralizes the length arithmetic the reference scatters across files:
- frame length after the mel frontend: ``samples // hop + 1``
  (reference: processing/processor.py:392)
- frame length after 2x conv subsampling: ``((n - 1) // 2 - 1) // 2``
  (reference: model/utils/convolution.py:55)
- boolean padding mask, True at *valid* positions
  (reference: model/utils/masking.py:4-13)
"""

from __future__ import annotations

import jax.numpy as jnp


def mel_frame_length(num_samples: jnp.ndarray | int, hop_length: int) -> jnp.ndarray | int:
    """Frames produced by a centered STFT with win == n_fft and the given hop."""
    return num_samples // hop_length + 1


def subsampled_length(lengths: jnp.ndarray | int) -> jnp.ndarray | int:
    """Frames surviving two stride-2 valid 3x3 convolutions, clamped at 0
    (the raw reference formula goes negative for empty inputs)."""
    raw = ((lengths - 1) // 2 - 1) // 2
    if isinstance(raw, int):
        return max(raw, 0)
    return jnp.maximum(raw, 0)


def padding_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_length) bool mask, True where the position is valid."""
    positions = jnp.arange(max_length, dtype=lengths.dtype)[None, :]
    return lengths[:, None] > positions


def attention_pad_mask(lengths: jnp.ndarray, max_length: int) -> jnp.ndarray:
    """(B,) lengths -> (B, 1, 1, L) bool mask, True at PAD key positions.

    Matches the encoder's inverted-mask convention
    (reference: model/modules/encoder.py:28-30): the attention kernel fills
    masked scores with the dtype minimum before softmax.
    """
    return (~padding_mask(lengths, max_length))[:, None, None, :]
