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


_LOG_EPS = -1e5


def ctc_per_seq(logits: jnp.ndarray, logit_paddings: jnp.ndarray,
                labels: jnp.ndarray, label_paddings: jnp.ndarray,
                blank_id: int = 0, unroll: int = 8) -> jnp.ndarray:
    """Per-sequence CTC negative log-likelihood, (B,).

    Standard Graves alpha recursion (two interleaved score lattices: blank
    states (B, N+1) and emit states (B, N)) as one ``lax.scan`` over time.
    Same math as ``optax.ctc_loss`` (parity-tested) with one TPU-relevant
    difference: the scan is unrolled ``unroll`` frames per iteration, which
    amortizes the per-iteration loop overhead that dominates these tiny
    (B, N) per-frame updates — and the scan carries no per-step outputs
    (optax stacks full (T, B, N) alpha histories it never uses for the
    loss), so the backward rematerializes instead of reading them back.
    """
    b, t, k = logits.shape
    n = labels.shape[1]
    lp = jax.nn.log_softmax(logits.astype(jnp.float32))
    label_valid = 1.0 - label_paddings
    # rep[b, i] == 1 where labels[b, i] repeats labels[b, i+1].
    rep = jnp.pad((labels[:, :-1] == labels[:, 1:]).astype(jnp.float32),
                  ((0, 0), (0, 1)))

    lp_blank = jnp.transpose(lp[:, :, blank_id])              # (T, B)
    # One-hot contraction (MXU) beats a (B, T, N) gather on TPU.
    one_hot = jax.nn.one_hot(labels, num_classes=k, dtype=jnp.float32)
    lp_emit = jnp.transpose(
        jnp.einsum("btk,bnk->btn", lp, one_hot), (1, 0, 2))   # (T, B, N)

    blank0 = jnp.full((b, n + 1), _LOG_EPS).at[:, 0].set(0.0)
    emit0 = jnp.full((b, n), _LOG_EPS)

    def step(carry, frame):
        s_blank, s_emit = carry
        f_emit, f_blank, pad = frame
        # epsilon transition emit->blank, blocked between repeated labels
        eps_in = jnp.logaddexp(s_blank[:, 1:], s_emit + _LOG_EPS * rep)
        blank_ext = jnp.concatenate([s_blank[:, :1], eps_in], axis=1)
        nxt_emit = jnp.logaddexp(blank_ext[:, :-1] + f_emit,
                                 s_emit + f_emit)
        nxt_blank = blank_ext + f_blank[:, None]
        # blank after an emit of a repeated label
        rep_in = jnp.logaddexp(
            nxt_blank[:, 1:], s_emit + f_blank[:, None] + _LOG_EPS * (1.0 - rep))
        nxt_blank = jnp.concatenate([nxt_blank[:, :1], rep_in], axis=1)
        p = pad[:, None]
        return (p * s_blank + (1.0 - p) * nxt_blank,
                p * s_emit + (1.0 - p) * nxt_emit), None

    frames = (lp_emit, lp_blank, jnp.transpose(logit_paddings))
    (s_blank, s_emit), _ = jax.lax.scan(step, (blank0, emit0), frames,
                                        unroll=min(unroll, max(t, 1)))
    final_blank = jnp.concatenate(
        [s_blank[:, :1], jnp.logaddexp(s_blank[:, 1:], s_emit)], axis=1)
    lens = jnp.sum(label_valid, axis=1).astype(jnp.int32)
    return -jnp.take_along_axis(final_blank, lens[:, None], axis=1)[:, 0]


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
    per_seq = ctc_per_seq(logits, logit_paddings, labels,
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
