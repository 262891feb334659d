"""RNN-T (Transducer) loss and greedy decode, TPU-first.

The reference ships only a dead Transducer stub (an unused ``nn.Transformer``
wrapper, reference: model/modules/transducer.py:4-9 — never imported); this
is a real implementation, exceeding reference capability.

Loss: the Graves 2012 forward recursion over the (T, U+1) lattice,

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t,  u-1] + emit[t, u-1])

as ONE ``lax.scan`` over time. The within-row dependency on u is an affine
recurrence in the log semiring, x_u = logaddexp(a_u, x_{u-1} + c_{u-1}),
whose composition law (c1+c2, logaddexp(a2, a1+c2)) is associative — so each
row resolves in O(log U) depth with ``jax.lax.associative_scan`` instead of a
sequential U-loop. No (T, U) alpha history is stacked; autodiff
rematerializes through the scan.

Memory note: the caller feeds per-lattice-cell log-probs of ONLY the blank
and the next target token ((B, T, U+1) each) — never the full (B, T, U+1, V)
logit lattice reduced here, which is the classic RNN-T memory trap.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -1e30


def _log_affine_combine(e1, e2):
    """Compose affine log-semiring maps x -> logaddexp(a, x + c)."""
    c1, a1 = e1
    c2, a2 = e2
    return c1 + c2, jnp.logaddexp(a2, a1 + c2)


def rnnt_alpha_final(lp_blank: jnp.ndarray, lp_emit: jnp.ndarray,
                     t_lengths: jnp.ndarray, u_lengths: jnp.ndarray
                     ) -> jnp.ndarray:
    """Forward log-probability of each sequence.

    lp_blank: (B, T, U+1) log P(blank | t, u); lp_emit: (B, T, U)
    log P(y_{u+1} | t, u); t_lengths: (B,) valid frames; u_lengths: (B,)
    label lengths. Returns (B,) log P(y | x) = alpha[T-1, U] + blank[T-1, U].
    """
    b, t, u1 = lp_blank.shape
    u = u1 - 1

    # u-position mask: emit[.., j] only valid for j < u_len.
    upos = jnp.arange(u)[None, :]
    emit_valid = upos < u_lengths[:, None]                    # (B, U)

    row0 = jnp.full((b, u1), NEG).at[:, 0].set(0.0)

    def step2(row, frame):
        # row = alpha[t-1, :]; blank of frame t-1 moves time forward, then
        # the in-row label recurrence uses emit of the CURRENT frame t.
        lp_b_prev, lp_e_t, active = frame
        a = row + lp_b_prev                                   # time transition
        c = lp_e_t                                            # (B, U) masked
        cs = jnp.concatenate([jnp.full((b, 1), NEG), c], axis=1)
        comp = jax.lax.associative_scan(_log_affine_combine, (cs, a), axis=1)
        new_row = comp[1]
        new_row = jnp.where(active[:, None], new_row, row)
        return new_row, None

    # Frame 0 row: alpha[0, u] = prefix-sum of emit[0, :u].
    c0 = jnp.where(emit_valid, lp_emit[:, 0], NEG)
    cs0 = jnp.concatenate([jnp.full((b, 1), NEG), c0], axis=1)
    comp0 = jax.lax.associative_scan(
        _log_affine_combine, (cs0, row0), axis=1)
    row = comp0[1]

    if t > 1:
        emit_rows = jnp.where(emit_valid[:, None, :], lp_emit[:, 1:], NEG)
        frames = (jnp.moveaxis(lp_blank[:, :-1], 1, 0),
                  jnp.moveaxis(emit_rows, 1, 0),
                  (jnp.arange(1, t)[:, None] < t_lengths[None, :]))
        row, _ = jax.lax.scan(step2, row, frames)

    # Final: alpha[T_b-1, U_b] + blank[T_b-1, U_b]. The scan stopped
    # updating at t >= T_b, so `row` holds alpha[T_b-1, :].
    last_blank = jnp.take_along_axis(
        lp_blank, (t_lengths - 1)[:, None, None], axis=1)[:, 0]  # (B, U+1)
    final = row + last_blank
    return jnp.take_along_axis(final, u_lengths[:, None], axis=1)[:, 0]


def rnnt_loss_from_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                          t_lengths: jnp.ndarray, u_lengths: jnp.ndarray,
                          blank_id: int = 0,
                          row_mask: Optional[jnp.ndarray] = None
                          ) -> jnp.ndarray:
    """Mean RNN-T negative log-likelihood from the full joint lattice.

    logits: (B, T, U+1, V); labels: (B, U) int32; t_lengths/u_lengths: (B,).
    Convenience wrapper — prefer feeding pre-gathered lp_blank/lp_emit at
    scale (see rnnt_alpha_final) to avoid materializing (B, T, U+1, V) twice.
    """
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp_blank = lp[..., blank_id]                              # (B, T, U+1)
    emit_idx = labels[:, None, :, None]                       # (B,1,U,1)
    lp_emit = jnp.take_along_axis(
        lp[:, :, :-1, :], jnp.broadcast_to(
            emit_idx, (*lp.shape[:2], labels.shape[1], 1)), axis=-1)[..., 0]
    ll = rnnt_alpha_final(lp_blank, lp_emit, t_lengths, u_lengths)
    per_seq = -ll / jnp.maximum(u_lengths.astype(jnp.float32), 1.0)
    if row_mask is not None:
        # Dummy remainder-padding rows (empty transcripts) must not dilute
        # the batch mean — same convention as ops/ctc.py:ctc_loss.
        w = row_mask.astype(jnp.float32)
        return jnp.sum(per_seq * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(per_seq)


def rnnt_greedy_decode(joint_fn, enc: jnp.ndarray, enc_lengths: jnp.ndarray,
                       pred_step_fn, pred_init, max_symbols: int = 4,
                       max_len: Optional[int] = None, blank_id: int = 0
                       ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched time-synchronous greedy decode, jittable (static shapes).

    joint_fn(enc_t (B, D), pred (B, P)) -> (B, V) logits;
    pred_step_fn(state, token (B,)) -> (state, pred (B, P)) advances the
    prediction network by one emitted token; pred_init = (state0, pred0).
    At each frame up to `max_symbols` non-blank symbols may be emitted
    (standard greedy cap). Returns (tokens (B, T*max_symbols), counts (B,)).
    """
    b, t, _ = enc.shape
    u = (max_len or t * max_symbols)

    def frame_step(carry, inputs):
        state, pred, buf, count = carry
        enc_t, ti = inputs
        active0 = ti < enc_lengths

        def sym_step(c, _):
            state, pred, buf, count, alive = c
            logits = joint_fn(enc_t, pred)                    # (B, V)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = alive & (tok != blank_id) & (count < u)
            buf = jnp.where(
                (jnp.arange(u)[None, :] == count[:, None]) & emit[:, None],
                tok[:, None], buf)
            count = count + emit.astype(jnp.int32)
            new_state, new_pred = pred_step_fn(state, jnp.where(emit, tok, 0))

            def sel(n, o):
                m = emit.reshape((-1,) + (1,) * (n.ndim - 1))
                return jnp.where(m, n, o)

            state = jax.tree_util.tree_map(sel, new_state, state)
            pred = sel(new_pred, pred)
            return (state, pred, buf, count, emit), None

        (state, pred, buf, count, _), _ = jax.lax.scan(
            sym_step, (state, pred, buf, count, active0), None,
            length=max_symbols)
        return (state, pred, buf, count), None

    state0, pred0 = pred_init
    buf = jnp.zeros((b, u), jnp.int32)
    count = jnp.zeros((b,), jnp.int32)
    (state, pred, buf, count), _ = jax.lax.scan(
        frame_step, (state0, pred0, buf, count),
        (jnp.moveaxis(enc, 1, 0), jnp.arange(t, dtype=jnp.int32)))
    return buf, count
