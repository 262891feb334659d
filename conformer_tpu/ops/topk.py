"""Exact top-k along the last axis without a full sort.

``jax.lax.top_k`` lowers to a full variadic bitonic sort of (value, iota)
over the whole axis on TPU. Inside a decode frame loop that is the wrong
tool for small k over the vocab axis: the four per-frame top-8-of-370
calls in the RNN-T beam search were 59% of the frame time at w8/b56 (r4
xplane trace — four (B, W, V) sorts at ~0.07-0.22 ms each).

``topk_lastaxis`` runs k passes of (reduce-max, argmax, mask-one-element)
— pure vector work, no gathers (the selected value is re-reduced, not
gathered) — and matches jax.lax.top_k exactly, including the
lowest-index-first tie order (argmax returns the first maximal index;
masking exactly that element preserves later ties).

No reference counterpart: the reference decodes on host CPU
(reference: processing/lm.py:62-75).
"""

from __future__ import annotations

import jax.numpy as jnp

NEG = -1e30


def topk_lastaxis(x: jnp.ndarray, k: int):
    """Exact (values, indices) of the k largest along the last axis.

    Equivalent to ``jax.lax.top_k(x, k)`` (descending values, ties by
    ascending index) for inputs >= NEG (-1e30) — the decode convention
    for masked lanes. The mask sentinel sits strictly BELOW NEG so a
    masked element never ties a live NEG lane: each pass masks exactly
    one element and argmax's first-index rule reproduces top_k's
    ascending-index tie order, NEG lanes included. Cost: k fused vector
    passes over x instead of a full-axis sort — the win is large for
    small k over a big axis inside a scan body; for k approaching
    x.shape[-1], prefer jax.lax.top_k.
    """
    v = x.shape[-1]
    iota = jnp.arange(v, dtype=jnp.int32)
    cur = x
    vals, idxs = [], []
    for _ in range(k):
        m = jnp.max(cur, axis=-1)
        i = jnp.argmax(cur, axis=-1).astype(jnp.int32)
        vals.append(m)
        idxs.append(i)
        cur = jnp.where(iota == i[..., None], 2.0 * NEG, cur)
    return jnp.stack(vals, -1), jnp.stack(idxs, -1)
