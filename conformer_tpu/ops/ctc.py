"""CTC loss and greedy decoding.

Loss semantics match the reference's fp32 island
(reference: evaluation.py:8-16): log-softmax in float32,
``nn.CTCLoss(blank=pad_id=0, zero_infinity=True, reduction='mean')`` — i.e.
each utterance's negative log-likelihood is divided by its label length, then
averaged over the batch. Built on ``optax.ctc_loss`` (dynamic program runs on
device; no host transfer).

Greedy decode follows the reference collapse rules
(reference: processing/processor.py:301-322): argmax per frame, drop repeats,
drop blank(=pad) — the reference also drops ``<UNK>`` which is handled at the
text layer. The collapse itself is a vectorized device op returning
fixed-shape token buffers + counts (no data-dependent shapes under jit).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from conformer_tpu.utils.masking import padding_mask


def ctc_loss(logits: jnp.ndarray, logit_lengths: jnp.ndarray,
             labels: jnp.ndarray, label_lengths: jnp.ndarray,
             blank_id: int = 0, zero_infinity: bool = True,
             row_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean CTC loss (optax.ctc_loss dynamic program on device).

    logits: (B, T, V) unnormalized; logit_lengths: (B,); labels: (B, N) int;
    label_lengths: (B,). Uses float32 throughout.

    A Pallas alpha/beta kernel was built and removed in round 2: it was exact
    but 20x slower than optax's XLA scan at (B32, T199, N128) — per-frame op
    latency on small (B, 2N+1) tiles is structural in Mosaic today and
    neither frame-chunking, batch-tiling, nor pltpu.roll lane shifts closed
    the gap (finding recorded in docs/PERFORMANCE.md).

    row_mask: optional (B,) bool — rows where False (e.g. the dummy rows that
    pad a remainder batch up to the static batch size) are excluded from the
    batch mean instead of diluting it.
    """
    logits = logits.astype(jnp.float32)
    logit_paddings = 1.0 - padding_mask(
        logit_lengths, logits.shape[1]).astype(jnp.float32)
    label_paddings = 1.0 - padding_mask(
        label_lengths, labels.shape[1]).astype(jnp.float32)
    per_seq = optax.ctc_loss(logits, logit_paddings, labels,
                             label_paddings, blank_id=blank_id)
    if zero_infinity:
        per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)
    # torch reduction='mean': divide by target length, then batch-average.
    per_seq = per_seq / jnp.maximum(label_lengths.astype(jnp.float32), 1.0)
    if row_mask is not None:
        w = row_mask.astype(jnp.float32)
        return jnp.sum(per_seq * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(per_seq)


def greedy_collapse(ids: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                    blank_id: int = 0,
                    unk_id: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collapse framewise argmax ids with the reference's exact rules.

    The reference skips blank/``<UNK>`` frames *without* updating its
    previous-token state (reference: processing/processor.py:307-319), so a
    token repeated across a blank gap is still collapsed — stricter than
    textbook CTC (dedup-then-drop-blank). Reproduced here vectorized: a cummax
    forward-fill computes "last emittable id before t" per frame.

    ids: (B, T) int32. Returns (tokens (B, T) left-packed and blank-padded,
    counts (B,)).
    """
    b, t = ids.shape
    emittable = ids != blank_id
    if unk_id is not None:
        emittable &= ids != unk_id
    if lengths is not None:
        emittable &= padding_mask(lengths, t)

    # last_idx[t] = largest s <= t with emittable[s], else -1 (via cummax).
    pos = jnp.arange(t, dtype=jnp.int32)[None, :]
    last_idx = jax.lax.cummax(jnp.where(emittable, pos, -1), axis=1)
    prev_idx = jnp.concatenate(
        [jnp.full((b, 1), -1, jnp.int32), last_idx[:, :-1]], axis=1)
    prev_id = jnp.where(prev_idx >= 0,
                        jnp.take_along_axis(ids, jnp.maximum(prev_idx, 0), axis=1),
                        -1)
    keep = emittable & (ids != prev_id)

    # Stable-pack kept ids to the front of each row.
    order = jnp.argsort(jnp.where(keep, 0, 1), axis=1, stable=True)
    packed = jnp.take_along_axis(ids, order, axis=1)
    counts = jnp.sum(keep, axis=1)
    packed = jnp.where(padding_mask(counts, t), packed, blank_id)
    return packed, counts


def greedy_decode(logits: jnp.ndarray, lengths: Optional[jnp.ndarray] = None,
                  blank_id: int = 0,
                  unk_id: Optional[int] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, T, V) logits -> (collapsed token buffer (B, T), counts (B,))."""
    ids = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return greedy_collapse(ids, lengths, blank_id, unk_id)


greedy_decode_jit = jax.jit(greedy_decode, static_argnames=("blank_id", "unk_id"))
