"""Pallas TPU kernel: CTC loss forward-backward (alpha/beta recursions).

The CTC dynamic program runs batch-tiled: each program advances a (BT, S)
alpha block for BT sequences simultaneously through an in-kernel ``fori_loop``
over frames — static lane-shifts, element-wise logsumexp, and masked selects
only (every op Mosaic lowers today; no reshapes, no gathers).

Decomposition:
- XLA prologue: extended-state label log-probs ``label_lp[b,t,s] =
  log_probs[b,t,ext[b,s]]`` with ext = [blank, l1, blank, l2, ...] (a gather,
  cheap in XLA), plus the skip-allowed mask.
- Pallas forward: alpha recursion, per-frame blocks stored to a history,
  per-row log-likelihood read out at the final states via masked reductions.
- Pallas backward: beta recursion fused with the posterior computation,
  emitting d loss / d label_lp directly.
- XLA epilogue: posterior rows scatter back to vocab columns with one
  ``einsum`` against the one-hot extended labels.

Semantics match ``optax.ctc_loss`` (per-sequence negative log-likelihood) and
are verified against it in tests, values and gradients.
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
_BT = 8           # sequences advanced per program


def _lse3(a, b, c):
    m = jnp.maximum(jnp.maximum(a, b), c)
    safe = jnp.where(m <= NEG / 2, 0.0, m)
    out = safe + jnp.log(jnp.exp(a - safe) + jnp.exp(b - safe)
                         + jnp.exp(c - safe))
    return jnp.where(m <= NEG / 2, NEG, out)


def _shift_right(x, k):
    """(BT, S) -> lanes shifted right by k, NEG-filled."""
    pad = jnp.full((x.shape[0], k), NEG, x.dtype)
    return jnp.concatenate([pad, x[:, :-k]], axis=1)


def _shift_left(x, k):
    pad = jnp.full((x.shape[0], k), NEG, x.dtype)
    return jnp.concatenate([x[:, k:], pad], axis=1)


def _row_lse_at_finals(values, lane, s_final_col):
    """Per-row logsumexp over the two final states. values (BT, S)."""
    want = (lane == s_final_col) | (lane == s_final_col - 1)
    vals = jnp.where(want, values, NEG)
    m = jnp.max(vals, axis=1, keepdims=True)
    safe = jnp.where(m <= NEG / 2, 0.0, m)
    s = jnp.sum(jnp.where(want, jnp.exp(vals - safe), 0.0), axis=1,
                keepdims=True)
    out = safe + jnp.log(jnp.maximum(s, 1e-38))
    return jnp.where(m <= NEG / 2, NEG, out)        # (BT, 1)


def _fwd_kernel(tlen_ref, final_ref, label_lp_ref, skip_ref, loss_ref,
                alpha_hist_ref, *, t_max: int, s_pad: int, bt: int):
    """One batch tile. label_lp (BT, T, S); skip (BT, 1, S); outputs
    loss (BT, 128) and alpha history (BT, T, S)."""
    pid = pl.program_id(0)
    # SMEM permits scalar reads only: assemble the per-row vectors explicitly.
    t_len = jnp.stack([tlen_ref[pid * bt + i]
                       for i in range(bt)]).reshape(bt, 1)
    s_final = jnp.stack([final_ref[pid * bt + i]
                         for i in range(bt)]).reshape(bt, 1)
    skip = skip_ref[:, 0, :]                            # (BT, S)
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, s_pad), 1)

    init = jnp.where(lane <= 1, 0.0, NEG).astype(jnp.float32)
    alpha0 = init + label_lp_ref[:, 0, :]
    alpha_hist_ref[:, 0, :] = alpha0

    def body(t, alpha):
        lp = label_lp_ref[:, t, :]
        s1 = _shift_right(alpha, 1)
        s2 = jnp.where(skip > 0, _shift_right(alpha, 2), NEG)
        new = _lse3(alpha, s1, s2) + lp
        new = jnp.where(t < t_len, new, alpha)
        alpha_hist_ref[:, t, :] = new
        return new

    alpha = jax.lax.fori_loop(1, t_max, body, alpha0)
    logz = _row_lse_at_finals(alpha, lane, s_final)     # (BT, 1)
    loss_ref[:, :] = jnp.broadcast_to(-logz, (bt, 128))


def _bwd_kernel(tlen_ref, final_ref, label_lp_ref, skip_ref, alpha_hist_ref,
                grad_ref, *, t_max: int, s_pad: int, bt: int):
    """Beta recursion + posterior: grad[t, s] = -gamma_t[s]."""
    pid = pl.program_id(0)
    t_len = jnp.stack([tlen_ref[pid * bt + i]
                       for i in range(bt)]).reshape(bt, 1)
    s_final = jnp.stack([final_ref[pid * bt + i]
                         for i in range(bt)]).reshape(bt, 1)
    skip = skip_ref[:, 0, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (bt, s_pad), 1)
    skip_next2 = _shift_left(jnp.where(skip > 0, 0.0, NEG), 2)

    final_mask = (lane == s_final) | (lane == s_final - 1)
    beta_last = jnp.where(final_mask, 0.0, NEG)

    # logZ per row from alpha at t_len-1: accumulate over t with a select
    # (avoids per-row dynamic indexing).
    def logz_body(t, acc):
        alpha_t = alpha_hist_ref[:, t, :]
        row_logz = _row_lse_at_finals(alpha_t, lane, s_final)
        return jnp.where(t == t_len - 1, row_logz, acc)

    logz = jax.lax.fori_loop(0, t_max, logz_body, jnp.full((bt, 1), NEG))

    def body(i, beta):
        t = t_max - 1 - i
        inside = t < t_len                               # (BT, 1)
        is_last = t == t_len - 1
        lp_next = label_lp_ref[:, jnp.minimum(t + 1, t_max - 1), :]
        contrib = beta + lp_next
        beta_new = _lse3(contrib, _shift_left(contrib, 1),
                         jnp.where(skip_next2 > NEG / 2,
                                   _shift_left(contrib, 2), NEG))
        beta_t = jnp.where(is_last, beta_last, beta_new)
        beta_t = jnp.where(inside, beta_t, beta)

        alpha_t = alpha_hist_ref[:, t, :]
        gamma = jnp.exp(jnp.clip(alpha_t + beta_t - logz, NEG, 0.0))
        gamma = jnp.where(inside & (logz > NEG / 2), gamma, 0.0)
        grad_ref[:, t, :] = -gamma
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


def _pad_batch(x, bt):
    b = x.shape[0]
    b_pad = ((b + bt - 1) // bt) * bt
    if b_pad == b:
        return x
    return jnp.pad(x, [(0, b_pad - b)] + [(0, 0)] * (x.ndim - 1))


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
    bt = min(_BT, max(b, 1))
    label_lp_p = _pad_batch(label_lp, bt)
    skip_p = _pad_batch(skip, bt)[:, None, :]
    tlen = _pad_batch(logit_lengths.astype(jnp.int32), bt)
    final_p = _pad_batch(final_state, bt)
    b_pad = label_lp_p.shape[0]

    kern = functools.partial(_fwd_kernel, t_max=t, s_pad=s_pad, bt=bt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # tlen, final_state
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, t, s_pad), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, 1, s_pad), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bt, 128), lambda i, *_: (i, 0)),
            pl.BlockSpec((bt, t, s_pad), lambda i, *_: (i, 0, 0)),
        ],
    )
    loss, alpha_hist = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((b_pad, 128), jnp.float32),
                   jax.ShapeDtypeStruct((b_pad, t, s_pad), jnp.float32)],
        interpret=interpret,
    )(tlen, final_p, label_lp_p, skip_p)
    return loss[:b, 0], (alpha_hist, label_lp_p, skip_p, final_p, tlen, s_pad)


def _vjp_fwd(log_probs, logit_lengths, labels, label_lengths, blank_id,
             interpret):
    loss, res_inner = _forward(log_probs, logit_lengths, labels,
                               label_lengths, blank_id, interpret)
    res = res_inner + (labels, label_lengths, log_probs.shape)
    return loss, res


def _vjp_bwd(blank_id, interpret, res, g):
    (alpha_hist, label_lp_p, skip_p, final_p, tlen, s_pad, labels,
     label_lengths, lp_shape) = res
    b, t, v = lp_shape
    b_pad = label_lp_p.shape[0]
    bt = min(_BT, max(b, 1))
    kern = functools.partial(_bwd_kernel, t_max=t, s_pad=s_pad, bt=bt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, t, s_pad), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, 1, s_pad), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((bt, t, s_pad), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((bt, t, s_pad), lambda i, *_: (i, 0, 0)),
    )
    dlabel_lp = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, t, s_pad), jnp.float32),
        interpret=interpret,
    )(tlen, final_p, label_lp_p, skip_p, alpha_hist)[:b]

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
