"""Pallas TPU kernel: CTC loss forward-backward (alpha/beta recursions).

The last of the north-star kernels: the CTC dynamic program runs per batch
element as an in-kernel ``fori_loop`` over frames with the (1, S) alpha row in
VMEM — only static lane-shifts, element-wise logsumexp, and masked selects
(every op Mosaic lowers today; no reshapes, no gathers).

Decomposition:
- XLA prologue: extended-state label log-probs ``label_lp[b,t,s] =
  log_probs[b,t,ext[b,s]]`` with ext = [blank, l1, blank, l2, ...] (a gather,
  cheap in XLA), plus the skip-allowed mask.
- Pallas forward: alpha recursion, per-frame rows stored to an (T, S) history,
  log-likelihood read out at the per-batch final states via masked max.
- Pallas backward: beta recursion fused with the posterior computation,
  emitting d loss / d label_lp directly.
- XLA epilogue: posterior rows scatter back to vocab columns with one
  ``einsum`` against the one-hot extended labels.

Semantics match ``optax.ctc_loss`` (per-sequence negative log-likelihood,
blank=0 convention handled by the caller's extended labels) and are verified
against it in tests, values and gradients.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

NEG = -1e30


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    safe = jnp.where(m <= NEG / 2, 0.0, m)
    out = safe + jnp.log(jnp.exp(a - safe) + jnp.exp(b - safe)
                         + jnp.exp(c - safe))
    return jnp.where(m <= NEG / 2, NEG, out)


def _shift_right(x, k):
    """(1, S) -> values shifted right by k lanes, NEG-filled."""
    pad = jnp.full((1, k), NEG, x.dtype)
    return jnp.concatenate([pad, x[:, :-k]], axis=1)


def _shift_left(x, k):
    pad = jnp.full((1, k), NEG, x.dtype)
    return jnp.concatenate([x[:, k:], pad], axis=1)


def _fwd_kernel(tlen_ref, final_ref, label_lp_ref, skip_ref, loss_ref,
                alpha_hist_ref, *, t_max: int, s_pad: int):
    """One batch element. label_lp (1, T, S); skip (1, S) {0,1};
    tlen/final scalars via prefetch; outputs loss (1, 1) and alpha history."""
    b = pl.program_id(0)
    t_len = tlen_ref[b]
    s_final = final_ref[b]          # index of last blank state (2*N_b)
    skip = skip_ref[0, 0].reshape(1, s_pad)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)

    init = jnp.where(lane <= 1, 0.0, NEG).astype(jnp.float32)
    alpha0 = init + label_lp_ref[0, 0].reshape(1, s_pad)
    alpha_hist_ref[0, 0] = alpha0[0]

    def body(t, alpha):
        lp = label_lp_ref[0, t].reshape(1, s_pad)
        s1 = _shift_right(alpha, 1)
        s2 = jnp.where(skip > 0, _shift_right(alpha, 2), NEG)
        new = _lse3(alpha, s1, s2) + lp
        new = jnp.where(t < t_len, new, alpha)
        alpha_hist_ref[0, t] = new[0]
        return new

    alpha = jax.lax.fori_loop(1, t_max, body, alpha0)
    # logZ = lse(alpha[s_final], alpha[s_final - 1]) via masked max-trick.
    want = (lane == s_final) | (lane == s_final - 1)
    vals = jnp.where(want, alpha, NEG)
    m = jnp.max(vals)
    safe = jnp.where(m <= NEG / 2, 0.0, m)
    logz = safe + jnp.log(jnp.sum(jnp.exp(jnp.where(want, vals - safe, NEG))))
    logz = jnp.where(m <= NEG / 2, NEG, logz)
    loss_ref[0, 0] = jnp.full((128,), -logz, jnp.float32)


def _bwd_kernel(tlen_ref, final_ref, label_lp_ref, skip_ref, alpha_hist_ref,
                grad_ref, *, t_max: int, s_pad: int):
    """Beta recursion + posterior: grad[t, s] = -gamma_t[s] (d(-logZ)/dlp)."""
    b = pl.program_id(0)
    t_len = tlen_ref[b]
    s_final = final_ref[b]
    skip = skip_ref[0, 0].reshape(1, s_pad)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1)
    skip_next2 = _shift_left(jnp.where(skip > 0, 0.0, NEG), 2)  # skip[s+2] mask

    # beta at the last VALID frame: 0 at the two final states.
    beta_last = jnp.where((lane == s_final) | (lane == s_final - 1), 0.0, NEG)

    # logZ from alpha history at t_len - 1.
    alpha_last = alpha_hist_ref[0, pl.ds(t_len - 1, 1)].reshape(1, s_pad)
    vals = jnp.where((lane == s_final) | (lane == s_final - 1), alpha_last, NEG)
    m = jnp.max(vals)
    safe = jnp.where(m <= NEG / 2, 0.0, m)
    logz = safe + jnp.log(jnp.sum(jnp.exp(jnp.where(
        (lane == s_final) | (lane == s_final - 1), vals - safe, NEG))))
    logz = jnp.where(m <= NEG / 2, NEG, logz)

    def emit(t, beta):
        alpha_t = alpha_hist_ref[0, pl.ds(t, 1)].reshape(1, s_pad)
        gamma = jnp.exp(jnp.clip(alpha_t + beta - logz, NEG, 0.0))
        gamma = jnp.where((t < t_len) & (logz > NEG / 2), gamma, 0.0)
        grad_ref[0, t] = (-gamma)[0]
        return gamma

    # t = t_len-1 .. 0 descending; frames >= t_len get zero grad.
    def body(i, beta):
        t = t_max - 1 - i
        inside = t < t_len
        # For the last valid frame use beta_last; else recurse from beta.
        is_last = t == t_len - 1
        lp_next = label_lp_ref[0, pl.ds(jnp.minimum(t + 1, t_max - 1), 1)
                               ].reshape(1, s_pad)
        contrib = beta + lp_next
        b0 = contrib
        b1 = _shift_left(contrib, 1)
        b2 = jnp.where(skip_next2 > NEG / 2, _shift_left(contrib, 2), NEG)
        beta_new = _lse3(b0, b1, b2)
        beta_t = jnp.where(is_last, beta_last, beta_new)
        beta_t = jnp.where(inside, beta_t, beta)

        @pl.when(inside)
        def _():
            emit(t, beta_t)

        @pl.when(jnp.logical_not(inside))
        def _():
            grad_ref[0, t] = jnp.zeros((s_pad,), jnp.float32)

        return beta_t

    jax.lax.fori_loop(0, t_max, body, beta_last)


# ---------------------------------------------------------------------------
# XLA wrapper with custom VJP.
# ---------------------------------------------------------------------------

def _prep(log_probs, labels, label_lengths, blank_id):
    b, t, v = log_probs.shape
    n = labels.shape[1]
    s = 2 * n + 1
    s_pad = ((s + 127) // 128) * 128
    pos = jnp.arange(s_pad)[None, :]
    is_label = (pos % 2 == 1) & (pos < 2 * label_lengths[:, None])
    label_idx = jnp.clip((pos - 1) // 2, 0, n - 1)
    ext = jnp.where(is_label, jnp.take_along_axis(
        jnp.broadcast_to(labels, (b, n)), label_idx, axis=1), blank_id)
    # valid states: s <= 2*label_len (rest NEG'd via label_lp)
    valid = pos <= 2 * label_lengths[:, None]
    label_lp = jnp.take_along_axis(log_probs, ext[:, None, :].repeat(t, 1),
                                   axis=2)
    label_lp = jnp.where(valid[:, None, :], label_lp, NEG).astype(jnp.float32)
    prev_label = jnp.clip((pos - 3) // 2, 0, n - 1)
    same_as_prev = jnp.take_along_axis(labels, label_idx, 1) == \
        jnp.take_along_axis(labels, prev_label, 1)
    skip = (is_label & (pos >= 3) & ~same_as_prev).astype(jnp.int32)
    final_state = (2 * label_lengths).astype(jnp.int32)
    return label_lp, skip, final_state, s_pad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ctc_loss_pallas(log_probs, logit_lengths, labels, label_lengths,
                    blank_id: int = 0, interpret: bool = False):
    """Per-sequence CTC negative log-likelihood (B,) from log-probs.

    log_probs: (B, T, V) log-softmax outputs (fp32). Equivalent to
    optax.ctc_loss on the same inputs.
    """
    loss, _ = _forward(log_probs, logit_lengths, labels, label_lengths,
                       blank_id, interpret)
    return loss


def _forward(log_probs, logit_lengths, labels, label_lengths, blank_id,
             interpret):
    b, t, v = log_probs.shape
    label_lp, skip, final_state, s_pad = _prep(log_probs, labels,
                                               label_lengths, blank_id)
    tlen = logit_lengths.astype(jnp.int32)
    kern = functools.partial(_fwd_kernel, t_max=t, s_pad=s_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # tlen, final_state
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, s_pad), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, s_pad), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 128), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, t, s_pad), lambda i, *_: (i, 0, 0)),
        ],
    )
    loss, alpha_hist = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b, 1, 128), jnp.float32),
                   jax.ShapeDtypeStruct((b, t, s_pad), jnp.float32)],
        interpret=interpret,
    )(tlen, final_state, label_lp, skip[:, None, :])
    return loss[:, 0, 0], (alpha_hist, label_lp, skip, final_state, s_pad)


def _vjp_fwd(log_probs, logit_lengths, labels, label_lengths, blank_id,
             interpret):
    loss, (alpha_hist, label_lp, skip, final_state, s_pad) = _forward(
        log_probs, logit_lengths, labels, label_lengths, blank_id, interpret)
    res = (alpha_hist, label_lp, skip, final_state, logit_lengths, labels,
           label_lengths, log_probs.shape)
    return loss, res


def _vjp_bwd(blank_id, interpret, res, g):
    (alpha_hist, label_lp, skip, final_state, logit_lengths, labels,
     label_lengths, lp_shape) = res
    b, t, v = lp_shape
    s_pad = label_lp.shape[-1]
    tlen = logit_lengths.astype(jnp.int32)
    kern = functools.partial(_bwd_kernel, t_max=t, s_pad=s_pad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, s_pad), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, 1, s_pad), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, t, s_pad), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, s_pad), lambda i, *_: (i, 0, 0)),
    )
    dlabel_lp = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, s_pad), jnp.float32),
        interpret=interpret,
    )(tlen, final_state, label_lp, skip[:, None, :], alpha_hist)

    # Scatter back to vocab columns: dlog_probs[b,t,v] = sum_s dlp[b,t,s]
    # one_hot(ext[b,s])[v], weighted by upstream g per sequence.
    n = labels.shape[1]
    pos = jnp.arange(s_pad)[None, :]
    is_label = (pos % 2 == 1) & (pos < 2 * label_lengths[:, None])
    label_idx = jnp.clip((pos - 1) // 2, 0, n - 1)
    ext = jnp.where(is_label, jnp.take_along_axis(labels, label_idx, 1),
                    blank_id)
    onehot = jax.nn.one_hot(ext, v, dtype=jnp.float32)      # (B, S, V)
    dlog_probs = jnp.einsum("bts,bsv->btv", dlabel_lp, onehot,
                            preferred_element_type=jnp.float32)
    dlog_probs = dlog_probs * g[:, None, None]
    return dlog_probs, None, None, None


ctc_loss_pallas.defvjp(_vjp_fwd, _vjp_bwd)
