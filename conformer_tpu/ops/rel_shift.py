"""Relative-shift for Transformer-XL attention scores.

Converts raw position scores ``raw[..., i, k] = q_i · p_k`` (k indexing the
(2L-1)-row relative PE table, row k <-> relative position L-1-k) into aligned
scores ``out[..., i, j] = raw[..., i, j - i + L - 1]`` — i.e. the score of key
j at relative distance ``i - j`` from query i.

Semantics match the reference's pad/reshape trick
(reference: model/utils/attention.py:94-101); implemented here with the same
O(1)-copy reshape (XLA lowers it to a cheap strided view + slice) plus a naive
gather used by the parity tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def rel_shift(pos_score: jnp.ndarray) -> jnp.ndarray:
    """(..., L, 2L-1) -> (..., L, L) shifted scores."""
    *lead, l, m = pos_score.shape
    pad_widths = [(0, 0)] * len(lead) + [(0, 0), (1, 0)]
    padded = jnp.pad(pos_score, pad_widths)                  # (..., L, 2L)
    padded = padded.reshape(*lead, m + 1, l)                 # (..., 2L, L)
    shifted = padded[..., 1:, :].reshape(*lead, l, m)        # drop first row
    return shifted[..., :, : m // 2 + 1]                     # (..., L, L)


def rel_attention_xla(qu, qv, k, v, p, lengths, scale: float) -> jnp.ndarray:
    """Dense rel-shift attention: the XLA baseline / ground-truth path.

    qu/qv/k/v: (B, H, L, dh); p: (H, 2L-1, dh) -> context (B, H, L, dh).
    Math matches the reference score assembly
    (reference: model/utils/attention.py:49-70). Used by the sincos-kernel
    parity tests and tools/bench_sincos.py as the comparison baseline; the
    production dispatch lives in models/attention.py ('xla' impl) and
    ops/pallas/sincos_attention.py ('pallas' impl).
    """
    import jax
    import numpy as np

    content = jnp.einsum("bhld,bhmd->bhlm", qu, k,
                         preferred_element_type=jnp.float32)
    pos_raw = jnp.einsum("bhld,hmd->bhlm", qv, p,
                         preferred_element_type=jnp.float32)
    scores = (content + rel_shift(pos_raw)) * scale
    if lengths is not None:
        l = k.shape[2]
        mask = jnp.arange(l)[None, :] >= lengths[:, None]   # (B, L) pad=True
        scores = jnp.where(mask[:, None, None, :],
                           float(np.finfo(np.float32).min), scores)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhlm,bhmd->bhld", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


def rel_shift_reference(pos_score: jnp.ndarray) -> jnp.ndarray:
    """Naive gather formulation — ground truth for parity tests."""
    *lead, l, m = pos_score.shape
    i = jnp.arange(l)[:, None]
    j = jnp.arange(l)[None, :]
    gather_idx = j - i + (l - 1)                             # (L, L) in [0, 2L-2]
    idx = jnp.broadcast_to(gather_idx, (*lead, l, l))
    return jnp.take_along_axis(pos_score, idx, axis=-1)
