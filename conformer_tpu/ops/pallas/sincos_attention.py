"""Pallas TPU kernel: fully-fused relative-position attention, shift-free.

The Transformer-XL position score needs ``pos[i, j] = qv_i . p(i - j)`` where
``p(r)`` is the projected sinusoidal embedding of relative position ``r``
(reference: model/utils/attention.py:49-56 materializes a (B, H, L, 2L-1)
tensor and realigns it with a pad/reshape "rel-shift", attention.py:94-101).
The shift cannot currently be lowered inside a Mosaic kernel (round-1
finding; the interim 'pallas_bias' kernel that shifted in XLA measured
neutral and was deleted in round 3 — docs/PERFORMANCE.md negative results),
so this kernel removes the shift entirely via the angle-addition identity:

With e_r[2k] = sin(r w_k), e_r[2k+1] = cos(r w_k) (models/position.py:20-36)
and per-head projection a_i = W_h qv_i (W_h = pos-kernel head slice):

    pos[i, j] = a_i . e_{i-j}
              = alpha_i . cos(j w) + beta_i . sin(j w)       (D/2 terms each)
    alpha_i[k] =  a_i[2k] sin(i w_k) + a_i[2k+1] cos(i w_k)
    beta_i[k]  = -a_i[2k] cos(i w_k) + a_i[2k+1] sin(i w_k)

i.e. two plain MXU matmuls against constant (L, D/2) sin/cos tables — no
gather, no shift, no (B, H, L, L) tensor in HBM. The kernel fuses content
scores, position scores, length masking, fp32 softmax, attention-probability
dropout (in-kernel stateless hash mask; the TPU hardware-PRNG variant
measured neutral and was deleted — docs/PERFORMANCE.md negative results),
and the value contraction; the backward
kernel recomputes the probabilities (flash-style) and emits dqu/dqv/dk/dv and
the position-projection gradient, so training takes the fused path too.

The position-projection *bias* is omitted: it adds the same constant to every
score in a row (all columns share it after the shift), so softmax — and
therefore the output and every gradient — is exactly invariant to it.

Cost: position scores cost 2*L^2*D FLOPs/head instead of 2*L^2*(2*d_head)
(~4x), in exchange for zero score-tensor HBM traffic in fwd AND bwd. On MXU
FLOPs are cheap; HBM bytes are not.
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
except Exception:  # pragma: no cover — non-TPU build
    pltpu = None

NEG_INF = float(np.finfo(np.float32).min)


# ---------------------------------------------------------------------------
# Host-side preparation: tables + projection layout.
# ---------------------------------------------------------------------------

def sincos_tables(length: int, d_model: int, dtype=jnp.float32
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sin, cos) tables of shape (length, d_model//2): sin(i*w_k), cos(i*w_k)
    with the reference inverse frequencies (models/position.py:23-24)."""
    inv_freq = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                      * -(np.log(10000.0) / d_model))
    ang = np.arange(length, dtype=np.float64)[:, None] * inv_freq[None, :]
    return (jnp.asarray(np.sin(ang), dtype), jnp.asarray(np.cos(ang), dtype))


def prep_pos_kernel(pos_kernel: jnp.ndarray, n_heads: int) -> jnp.ndarray:
    """(D, D) pos-projection kernel -> (H, dh, D) per-head operand with the
    embedding axis permuted to [sin coeffs (D/2) | cos coeffs (D/2)].

    wh[h, x, :] is row x of W_h^T where W_h = kernel[:, h*dh:(h+1)*dh], so an
    in-kernel ``qv_tile @ wh[h]`` yields a_i = W_h^T . qv_i already split into
    sin/cos halves. Differentiable (gather + transpose), so the pos-kernel
    gradient flows through this prep automatically.
    """
    d = pos_kernel.shape[0]
    dh = d // n_heads
    wh = pos_kernel.reshape(d, n_heads, dh).transpose(1, 2, 0)  # (H, dh, D)
    perm = np.concatenate([np.arange(0, d, 2), np.arange(1, d, 2)])
    return wh[:, :, perm]


# ---------------------------------------------------------------------------
# Plain-XLA reference (CPU fallback, parity ground truth, same math).
# ---------------------------------------------------------------------------

def sincos_attention_xla(qu, qv, k, v, wh, lengths, scale: float,
                         dropout_rate: float = 0.0, seed=None):
    """Same factorized math as the kernel, in plain jnp (autodiff-able).

    qu/qv/k/v: (B, H, L, dh); wh: (H, dh, D) from prep_pos_kernel;
    lengths: (B,) or None. Output (B, H, L, dh) in v.dtype.
    """
    b, h, l, dh = qu.shape
    d = wh.shape[-1]
    d2 = d // 2
    sin_t, cos_t = sincos_tables(l, d, jnp.float32)

    a = jnp.einsum("bhld,hdk->bhlk", qv.astype(jnp.float32),
                   wh.astype(jnp.float32))                     # (B,H,L,D)
    a_s, a_c = a[..., :d2], a[..., d2:]
    sin_q = sin_t[None, None]
    cos_q = cos_t[None, None]
    alpha = a_s * sin_q + a_c * cos_q
    beta = -a_s * cos_q + a_c * sin_q
    pos = (jnp.einsum("bhlk,mk->bhlm", alpha, cos_t)
           + jnp.einsum("bhlk,mk->bhlm", beta, sin_t))
    content = jnp.einsum("bhld,bhmd->bhlm", qu.astype(jnp.float32),
                         k.astype(jnp.float32))
    scores = (content + pos) * scale
    if lengths is not None:
        col = jnp.arange(l)[None, :] >= lengths[:, None]       # (B, L) pad
        scores = jnp.where(col[:, None, None, :], NEG_INF, scores)
    weights = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0:
        key = jax.random.PRNGKey(seed if seed is not None else 0)
        keep = jax.random.bernoulli(key, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    return jnp.einsum("bhlm,bhmd->bhld", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


# ---------------------------------------------------------------------------
# Kernels.
# ---------------------------------------------------------------------------

def _scores(qu, qv, k, wh, sq_ref, cq_ref, sk_ref, ck_ref, scale, d2):
    """(TQ, L) masked-free scaled scores for one (b, h, q-tile) program.
    wh: (dh, D) per-head projection operand (already read from VMEM)."""
    content = jax.lax.dot_general(
        qu, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (TQ, L)
    a = jax.lax.dot_general(
        qv, wh, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                    # (TQ, D)
    a_s, a_c = a[:, :d2], a[:, d2:]
    sq = sq_ref[...].astype(jnp.float32)                       # (TQ, D/2)
    cq = cq_ref[...].astype(jnp.float32)
    alpha = (a_s * sq + a_c * cq).astype(sk_ref.dtype)
    beta = (-a_s * cq + a_c * sq).astype(sk_ref.dtype)
    pos = jax.lax.dot_general(
        alpha, ck_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    pos = pos + jax.lax.dot_general(
        beta, sk_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    scores = content + pos
    if scale != 1.0:  # scale is folded into qu/qv by the public wrapper;
        scores = scores * scale  # kept for direct callers of the kernels
    return scores, a_s, a_c


def _dropout_keep(seed, bi, hi, qi, shape, rate):
    """Deterministic keep mask from a stateless integer hash of
    (seed, program ids, element coordinates) — murmur3-style finalizer on the
    VPU. The backward kernel regenerates the identical mask from the same
    inputs, so no (B, H, L, L) mask ever exists in HBM; being stateless it
    also runs in interpret mode (the TPU PRNG primitive does not)."""
    u = lambda c: np.uint32(c)
    as_u32 = lambda v: jnp.asarray(v).astype(jnp.uint32)
    h = (as_u32(seed) * u(0x9E3779B9)
         + as_u32(bi) * u(0x85EBCA6B)
         + as_u32(hi) * u(0xC2B2AE35)
         + as_u32(qi) * u(0x27D4EB2F))
    row = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    col = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = h + col + row * u(0x01000193)
    x = x ^ (x >> u(16))
    x = x * u(0x85EBCA6B)
    x = x ^ (x >> u(13))
    x = x * u(0xC2B2AE35)
    x = x ^ (x >> u(16))
    thresh = u(int(rate * 4294967296.0) & 0xFFFFFFFF)
    return x >= thresh  # P(keep) = 1 - rate


def _fwd_kernel(len_ref, seed_ref, qu_ref, qv_ref, k_ref, v_ref, wh_ref,
                sq_ref, cq_ref, sk_ref, ck_ref, out_ref, *,
                scale: float, d2: int, l_valid: int, rate: float,
                probs_bf16: bool = False, packed: bool = False):
    """One (batch-block, q-tile) program; ALL heads — and NB batch rows —
    are processed in an unrolled loop. Grid programs cost ~3us of dispatch
    each: a (B, H, L/TQ) grid of tiny per-head programs was dispatch-bound
    (the matmuls are sub-us), per-program operands (the sin/cos tables) were
    re-fetched per head, and at short L even one-batch-per-program leaves
    the pipeline dispatch-bound (48 programs x ~3us vs ~0.6 GFLOP each).

    ``packed``: qu/qv/k/v/out refs are (NB, rows, HB*dh) with head h in
    lanes [h*dh, (h+1)*dh) — the natural layout of the producing Dense
    matmuls, so XLA feeds the kernel with ZERO head-split transposes (the
    (0,2,1,3) relayouts were ~2.4 ms/step at b56). Head tiles become
    static lane slices instead of middle-axis indexing."""
    bi, hb, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nb = qu_ref.shape[0]               # batch rows in this block
    n_heads = wh_ref.shape[0]          # heads in this block
    dh = wh_ref.shape[1]
    if packed:
        tq = qu_ref.shape[1]
        l = k_ref.shape[1]
        read = lambda ref, bb, h: ref[bb, :, h * dh:(h + 1) * dh]
    else:
        tq = qu_ref.shape[2]
        l = k_ref.shape[2]
        read = lambda ref, bb, h: ref[bb, h]
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, l), 1)
    for bb in range(nb):
        length = jnp.minimum(len_ref[bi * nb + bb], l_valid)
        valid = col < length
        for h in range(n_heads):
            scores, _, _ = _scores(read(qu_ref, bb, h), read(qv_ref, bb, h),
                                   read(k_ref, bb, h),
                                   wh_ref[h], sq_ref, cq_ref, sk_ref, ck_ref,
                                   scale, d2)
            scores = jnp.where(valid, scores, NEG_INF)
            m = jnp.max(scores, axis=-1, keepdims=True)
            # Masked columns hold the (finite) NEG_INF sentinel: exp
            # underflows to exactly 0 there, so no mask multiply is needed.
            # (A fully-masked row -- length 0 -- yields uniform weights
            # instead of zeros; such rows only exist as dataset padding and
            # are excluded from the loss.)
            x = scores - m
            if probs_bf16:
                # Probability arithmetic in bf16 (max-sub still f32): halves
                # the VPU bytes of the exp pass; softmax error ~1e-2
                # relative, same scale as the bf16 IO everywhere else.
                e = jnp.exp(x.astype(jnp.bfloat16))
                s = jnp.sum(e, axis=-1, keepdims=True,
                            dtype=jnp.float32)
            else:
                e = jnp.exp(x)
                s = jnp.sum(e, axis=-1, keepdims=True)
            if rate > 0.0:
                keep = _dropout_keep(seed_ref[0], bi * nb + bb,
                                     hb * n_heads + h, qi, (tq, l), rate)
                e = jnp.where(keep, e * (1.0 / (1.0 - rate)), 0.0)
            out = jax.lax.dot_general(
                e.astype(v_ref.dtype), read(v_ref, bb, h),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # The softmax normalization is linear in the value contraction:
            # divide the (TQ, dh) accumulator instead of the (TQ, L)
            # probability tile — one fewer full-width VPU pass.
            out = out * (1.0 / jnp.maximum(s, 1e-9))
            if packed:
                out_ref[bb, :, h * dh:(h + 1) * dh] = out.astype(out_ref.dtype)
            else:
                out_ref[bb, h] = out.astype(out_ref.dtype)


def _bwd_kernel(len_ref, seed_ref, qu_ref, qv_ref, k_ref, v_ref, wh_ref,
                sq_ref, cq_ref, sk_ref, ck_ref, do_ref,
                dqu_ref, dqv_ref, dk_ref, dv_ref, dwh_ref, *,
                scale: float, d2: int, l_valid: int, rate: float,
                probs_bf16: bool = False, packed: bool = False):
    """Recompute the probability tile (flash-style: no saved score tensors),
    then emit all five gradients; all heads and NB batch rows per program
    (see _fwd_kernel). dk/dv/dwh accumulate across the q-tile grid dimension
    (innermost, so revisits are consecutive).

    The last q-tile may be PARTIAL (L is not padded to a tile multiple):
    its out-of-range rows read unspecified values, so every contraction
    over the q dimension (dv/dk/dwh) masks those rows to zero first;
    row-shaped outputs (dqu/dqv) rely on Pallas masking partial-block
    writes.

    ``packed``: head-in-lanes layout for all (B, ., .) refs — see
    _fwd_kernel."""
    bi, hb, qi = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    nb = qu_ref.shape[0]
    n_heads = wh_ref.shape[0]
    dh = wh_ref.shape[1]
    if packed:
        tq = qu_ref.shape[1]
        l = k_ref.shape[1]
        read = lambda ref, bb, h: ref[bb, :, h * dh:(h + 1) * dh]
    else:
        tq = qu_ref.shape[2]
        l = k_ref.shape[2]
        read = lambda ref, bb, h: ref[bb, h]
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, l), 1)
    partial_tile = l_valid % tq != 0          # static: only then mask rows
    if partial_tile:
        row_ok = (jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)
                  + qi * tq) < l_valid
    sq = sq_ref[...].astype(jnp.float32)
    cq = cq_ref[...].astype(jnp.float32)
    if partial_tile:
        # Unspecified rows of partial q-tile INPUTS must be zeroed (not
        # just ignored): contractions over the q dimension (dv/dk/dwh)
        # would otherwise multiply 0 * NaN. With qu/qv/do/sq/cq zeroed,
        # every garbage row propagates exact zeros through ds/p_drop.
        sq = jnp.where(row_ok, sq, 0.0)
        cq = jnp.where(row_ok, cq, 0.0)

    for bb in range(nb):
      length = jnp.minimum(len_ref[bi * nb + bb], l_valid)
      valid = col < length
      for h in range(n_heads):
        qu = read(qu_ref, bb, h)
        qv = read(qv_ref, bb, h)
        k = read(k_ref, bb, h)
        v = read(v_ref, bb, h)
        wh = wh_ref[h]                                         # (dh, D)
        do = read(do_ref, bb, h).astype(jnp.float32)
        if partial_tile:
            zero = jnp.zeros((), qu.dtype)
            qu = jnp.where(row_ok, qu, zero)
            qv = jnp.where(row_ok, qv, zero)
            do = jnp.where(row_ok, do, 0.0)

        scores, _, _ = _scores(qu, qv, k, wh, sq_ref, cq_ref,
                               sk_ref, ck_ref, scale, d2)
        scores = jnp.where(valid, scores, NEG_INF)
        m = jnp.max(scores, axis=-1, keepdims=True)
        if probs_bf16:
            e = jnp.exp((scores - m).astype(jnp.bfloat16))
            ssum = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
            p = (e * (1.0 / jnp.maximum(ssum, 1e-9)).astype(jnp.bfloat16)
                 ).astype(jnp.float32)
        else:
            e = jnp.exp(scores - m)            # masked cols underflow to 0
            ssum = jnp.sum(e, axis=-1, keepdims=True)
            p = e / jnp.maximum(ssum, 1e-9)                    # (TQ, L)
        if partial_tile:
            # _scores reads the UNmasked sq/cq refs, so garbage rows of a
            # partial tile reach p (and e/ssum) as NaN; zero them before
            # the q-dim contractions (dv/dk/dwh all sum over q rows).
            p = jnp.where(row_ok, p, 0.0)

        dov = jax.lax.dot_general(                             # dO . v_j
            do, v.astype(jnp.float32),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                # (TQ, L)
        if rate > 0.0:
            keep = _dropout_keep(seed_ref[0], bi * nb + bb,
                                 hb * n_heads + h, qi, (tq, l), rate)
            inv = 1.0 / (1.0 - rate)
            dp = jnp.where(keep, dov * inv, 0.0)
        else:
            keep = None
            dp = dov

        p_drop = (jnp.where(keep, p * inv, 0.0) if keep is not None
                  else p)
        # softmax bwd: ds = p*(dp - sum_j p*dp); delta = dO.O = sum p*dp.
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - delta)                                  # (TQ, L) fp32
        if scale != 1.0:  # scale folded into qu/qv by the public wrapper
            ds = ds * scale

        dv_c = jax.lax.dot_general(                            # (L, dh)
            p_drop.astype(do_ref.dtype), do.astype(do_ref.dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds_c = ds.astype(k.dtype)
        dqu = jax.lax.dot_general(                             # (TQ, dh)
            ds_c, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_c = jax.lax.dot_general(                            # (L, dh)
            ds_c, qu, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dalpha = jax.lax.dot_general(                          # (TQ, D/2)
            ds_c, ck_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dbeta = jax.lax.dot_general(
            ds_c, sk_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        da_s = dalpha * sq - dbeta * cq
        da_c = dalpha * cq + dbeta * sq
        da_s_c = da_s.astype(wh.dtype)
        da_c_c = da_c.astype(wh.dtype)
        dqv = jax.lax.dot_general(                             # (TQ, dh)
            da_s_c, wh[:, :d2], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dqv = dqv + jax.lax.dot_general(
            da_c_c, wh[:, d2:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwh_s = jax.lax.dot_general(                           # (dh, D/2)
            qv, da_s_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dwh_c = jax.lax.dot_general(
            qv, da_c_c, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

        if packed:
            sl = slice(h * dh, (h + 1) * dh)
            dqu_ref[bb, :, sl] = dqu.astype(dqu_ref.dtype)
            dqv_ref[bb, :, sl] = dqv.astype(dqv_ref.dtype)
        else:
            dqu_ref[bb, h] = dqu.astype(dqu_ref.dtype)
            dqv_ref[bb, h] = dqv.astype(dqv_ref.dtype)

        @pl.when(qi == 0)
        def _init(bb=bb, h=h, dk_c=dk_c, dv_c=dv_c,
                  dwh_s=dwh_s, dwh_c=dwh_c):
            if packed:
                sl = slice(h * dh, (h + 1) * dh)
                dk_ref[bb, :, sl] = dk_c.astype(dk_ref.dtype)
                dv_ref[bb, :, sl] = dv_c.astype(dv_ref.dtype)
            else:
                dk_ref[bb, h] = dk_c.astype(dk_ref.dtype)
                dv_ref[bb, h] = dv_c.astype(dv_ref.dtype)
            if bb == 0:
                dwh_ref[0, h, :, :d2] = dwh_s.astype(dwh_ref.dtype)
                dwh_ref[0, h, :, d2:] = dwh_c.astype(dwh_ref.dtype)
            else:
                dwh_ref[0, h, :, :d2] += dwh_s.astype(dwh_ref.dtype)
                dwh_ref[0, h, :, d2:] += dwh_c.astype(dwh_ref.dtype)

        @pl.when(qi > 0)
        def _acc(bb=bb, h=h, dk_c=dk_c, dv_c=dv_c,
                 dwh_s=dwh_s, dwh_c=dwh_c):
            if packed:
                sl = slice(h * dh, (h + 1) * dh)
                dk_ref[bb, :, sl] += dk_c.astype(dk_ref.dtype)
                dv_ref[bb, :, sl] += dv_c.astype(dv_ref.dtype)
            else:
                dk_ref[bb, h] += dk_c.astype(dk_ref.dtype)
                dv_ref[bb, h] += dv_c.astype(dv_ref.dtype)
            dwh_ref[0, h, :, :d2] += dwh_s.astype(dwh_ref.dtype)
            dwh_ref[0, h, :, d2:] += dwh_c.astype(dwh_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call plumbing.
# ---------------------------------------------------------------------------

def _prep_lengths(lengths, b, l_orig):
    """No L-padding: q-tiles that run past L are partial blocks — Pallas
    masks their writes, and the backward masks garbage rows before any
    contraction over the q dimension (see _bwd_kernel). Removing the
    explicit jnp.pad/crop killed ~4.6 ms/step of pad+slice copies at the
    8s production point (r3 trace: 4 pads fwd + 5 bwd + crops per layer)."""
    if lengths is None:
        lengths = jnp.full((b,), l_orig, jnp.int32)
    return lengths.astype(jnp.int32)


_VMEM_BUDGET = 12 * 1024 * 1024


def _program_bytes(hb, nb, l, tq, dh, d, itemsize, bwd):
    """Approximate per-program VMEM footprint (x2 for double-buffering)."""
    d2 = d // 2
    tables = (2 * tq * d2 + 2 * l * d2) * itemsize
    per_head_batch = (3 * tq * dh + 2 * l * dh) * itemsize  # qu,qv,do,k,v
    shared = hb * dh * d * itemsize                          # wh
    out_bytes = hb * nb * tq * dh * itemsize
    if bwd:
        # dqu/dqv come out in the input dtype; dk/dv/dwh accumulate in f32.
        out_bytes = ((2 * tq * dh * itemsize + 2 * l * dh * 4) * hb * nb
                     + dh * d * 4 * hb)
    return 2 * (nb * hb * per_head_batch + shared + tables + out_bytes)


def _block_sizes(h, b, l, tq, dh, d, itemsize, bwd, packed=False):
    """(head-block, batch-block) sizes whose per-program buffers fit the
    VMEM budget. All heads per program kills grid dispatch overhead at short
    L (long L needs smaller head blocks); once all heads fit, additionally
    packing batch rows amortizes the ~3us program dispatch at short L where
    per-program work is tiny (measured: B48/L199 fwd+bwd is dispatch-bound
    at nb=1).

    In packed (head-in-lanes) mode the head block is also the lane-block
    size of the D dimension, so hb*dh must be a multiple of the 128-wide
    lane tile; hb=0 signals no valid block fits (caller falls back to the
    per-head layout)."""
    hb = 0 if packed else 1
    for cand in (h, *(2 ** i for i in range(10, -1, -1))):
        if cand > h or h % cand:
            continue
        if packed and (cand * dh) % 128:
            continue
        if _program_bytes(cand, 1, l, tq, dh, d, itemsize, bwd) <= _VMEM_BUDGET:
            hb = cand
            break
    nb = 1
    if hb == h:
        for cand in (16, 8, 4, 2):
            if b % cand:
                continue
            if _program_bytes(hb, cand, l, tq, dh, d, itemsize,
                              bwd) <= _VMEM_BUDGET:
                nb = cand
                break
    return hb, nb


def _common_specs(b, h, hb, nb, l, tq, dh, d, packed=False):
    """Grid (B/NB, H/HB, L/TQ); every spec carries HB heads x NB batch rows
    per program. Packed mode blocks the lane (D) dimension by hb*dh instead
    of carrying a separate head axis."""
    d2 = d // 2
    vm = dict(memory_space=pltpu.VMEM) if pltpu is not None else {}
    if packed:
        q_spec = pl.BlockSpec((nb, tq, hb * dh),
                              lambda bi, hi, qi, *_: (bi, qi, hi), **vm)
        kv_spec = pl.BlockSpec((nb, l, hb * dh),
                               lambda bi, hi, qi, *_: (bi, 0, hi), **vm)
    else:
        q_spec = pl.BlockSpec((nb, hb, tq, dh),
                              lambda bi, hi, qi, *_: (bi, hi, qi, 0), **vm)
        kv_spec = pl.BlockSpec((nb, hb, l, dh),
                               lambda bi, hi, qi, *_: (bi, hi, 0, 0), **vm)
    in_specs = [
        q_spec,
        q_spec,
        kv_spec,
        kv_spec,
        pl.BlockSpec((hb, dh, d), lambda bi, hi, qi, *_: (hi, 0, 0), **vm),
        pl.BlockSpec((tq, d2), lambda bi, hi, qi, *_: (qi, 0), **vm),
        pl.BlockSpec((tq, d2), lambda bi, hi, qi, *_: (qi, 0), **vm),
        pl.BlockSpec((l, d2), lambda bi, hi, qi, *_: (0, 0), **vm),
        pl.BlockSpec((l, d2), lambda bi, hi, qi, *_: (0, 0), **vm),
    ]
    return in_specs, vm, q_spec, kv_spec


def _fwd_call(qu, qv, k, v, wh, lengths, seed, scale, rate, tq, interpret,
              probs_bf16=False, packed=False):
    h, dh = wh.shape[0], wh.shape[1]
    if packed:
        b, l, _ = qu.shape
    else:
        b, h, l, dh = qu.shape
    d = wh.shape[-1]
    tq = min(tq, ((l + 7) // 8) * 8)
    lengths = _prep_lengths(lengths, b, l)
    table_dtype = qu.dtype
    sin_t, cos_t = sincos_tables(l, d, table_dtype)
    seed_arr = jnp.asarray([seed if seed is not None else 0], jnp.int32)

    hb, nb = _block_sizes(h, b, l, tq, dh, d, qu.dtype.itemsize, bwd=False,
                          packed=packed)
    assert hb, "packed path requires a lane-aligned head block (see caller)"
    in_specs, vm, q_spec, _ = _common_specs(b, h, hb, nb, l, tq, dh, d, packed)
    kern = functools.partial(_fwd_kernel, scale=scale, d2=d // 2,
                             l_valid=l, rate=rate,
                             probs_bf16=probs_bf16, packed=packed)
    out_shape = ((b, l, h * dh) if packed else (b, h, l, dh))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // nb, h // hb, pl.cdiv(l, tq)),
        in_specs=in_specs,
        out_specs=q_spec,
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(out_shape, v.dtype),
        interpret=interpret,
    )(lengths, seed_arr, qu, qv, k, v, wh, sin_t, cos_t, sin_t, cos_t)


def _bwd_call(qu, qv, k, v, wh, lengths, seed, scale, rate, tq, interpret, g,
              probs_bf16=False, packed=False):
    h, dh = wh.shape[0], wh.shape[1]
    if packed:
        b, l, _ = qu.shape
    else:
        b, h, l, dh = qu.shape
    d = wh.shape[-1]
    tq = min(tq, ((l + 7) // 8) * 8)
    lengths = _prep_lengths(lengths, b, l)
    table_dtype = qu.dtype
    sin_t, cos_t = sincos_tables(l, d, table_dtype)
    seed_arr = jnp.asarray([seed if seed is not None else 0], jnp.int32)

    hb, nb = _block_sizes(h, b, l, tq, dh, d, qu.dtype.itemsize, bwd=True,
                          packed=packed)
    assert hb, "packed path requires a lane-aligned head block (see caller)"
    in_specs, vm, q_spec, kv_spec = _common_specs(b, h, hb, nb, l, tq, dh, d,
                                                  packed)
    in_specs.append(q_spec)
    kern = functools.partial(_bwd_kernel, scale=scale, d2=d // 2,
                             l_valid=l, rate=rate,
                             probs_bf16=probs_bf16, packed=packed)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b // nb, h // hb, pl.cdiv(l, tq)),
        in_specs=in_specs,
        out_specs=[
            q_spec,
            q_spec,
            kv_spec,
            kv_spec,
            pl.BlockSpec((1, hb, dh, d), lambda bi, hi, qi, *_: (bi, hi, 0, 0), **vm),
        ],
    )
    f32 = jnp.float32
    row_shape = ((b, l, h * dh) if packed else (b, h, l, dh))
    # dqu/dqv are written exactly once per q-tile -> emit in input dtype
    # (no accumulation to protect); dk/dv/dwh accumulate across the q-tile
    # grid dimension in their output refs -> keep f32.
    dqu, dqv, dk, dv, dwh = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(row_shape, qu.dtype),
            jax.ShapeDtypeStruct(row_shape, qu.dtype),
            jax.ShapeDtypeStruct(row_shape, f32),
            jax.ShapeDtypeStruct(row_shape, f32),
            jax.ShapeDtypeStruct((b // nb, h, dh, d), f32),
        ],
        interpret=interpret,
    )(lengths, seed_arr, qu, qv, k, v, wh, sin_t, cos_t, sin_t, cos_t, g)
    to_in = lambda x: x.astype(qu.dtype)
    return (to_in(dqu), to_in(dqv), to_in(dk), to_in(dv),
            jnp.sum(dwh, axis=0).astype(wh.dtype))


# ---------------------------------------------------------------------------
# Public entry point with custom VJP.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _fused(qu, qv, k, v, wh, lengths, seed, scale, rate, tq, interpret,
           probs_bf16=False, packed=False):
    return _fwd_call(qu, qv, k, v, wh, lengths, seed, scale, rate, tq,
                     interpret, probs_bf16, packed)


def _fused_fwd(qu, qv, k, v, wh, lengths, seed, scale, rate, tq, interpret,
               probs_bf16=False, packed=False):
    out = _fwd_call(qu, qv, k, v, wh, lengths, seed, scale, rate, tq,
                    interpret, probs_bf16, packed)
    # seed is traced (changes every train step without recompiling); the
    # identical dropout mask is regenerated in the backward from it.
    return out, (qu, qv, k, v, wh, lengths, seed)


def _fused_bwd(scale, rate, tq, interpret, probs_bf16, packed, res, g):
    qu, qv, k, v, wh, lengths, seed = res
    dqu, dqv, dk, dv, dwh = _bwd_call(qu, qv, k, v, wh, lengths, seed, scale,
                                      rate, tq, interpret, g, probs_bf16,
                                      packed)
    return dqu, dqv, dk, dv, dwh, None, None


_fused.defvjp(_fused_fwd, _fused_bwd)


def _auto_tq(l: int) -> int:
    """One q-tile per (batch, head-block) program when the padded length
    fits 256 — measured 11% faster fwd+bwd than tq=128 at the production
    bucket (L=199, B=48); at longer L the smaller tile pipelines better."""
    l_pad = ((l + 127) // 128) * 128
    return l_pad if l_pad <= 256 else 128


def rel_attention_sincos(qu, qv, k, v, wh, lengths, scale: float,
                         dropout_rate: float = 0.0,
                         seed: Optional[int] = None,
                         tq: Optional[int] = None, interpret: bool = False,
                         probs_bf16: bool = False):
    """Fused shift-free relative attention.

    qu = q + content_bias, qv = q + position_bias: (B, H, L, dh);
    k, v: (B, H, L, dh); wh: (H, dh, D) from prep_pos_kernel;
    lengths: (B,) valid key counts or None; seed: static int for the dropout
    PRNG (ignored when dropout_rate == 0); tq: q-tile rows (None = auto).

    On TPU (or with interpret=True) runs the Pallas kernels with a fused
    backward; elsewhere falls back to the identical-math XLA reference.
    """
    if tq is None:
        tq = _auto_tq(qu.shape[2])
    if interpret or jax.default_backend() in ("tpu", "axon"):
        # Fold the score scale into qu/qv (64-wide rows, fuses into the
        # producing transpose) so the kernels skip a full (TQ, L) multiply
        # in fwd AND bwd. Autodiff through the fold restores the scale in
        # the qu/qv gradients.
        s = jnp.asarray(scale, qu.dtype)
        return _fused(qu * s, qv * s, k, v, wh, lengths, seed, 1.0,
                      dropout_rate, tq, interpret, probs_bf16)
    return sincos_attention_xla(qu, qv, k, v, wh, lengths, scale,
                                dropout_rate, seed)


def rel_attention_sincos_packed(qu, qv, k, v, wh, lengths, scale: float,
                                dropout_rate: float = 0.0,
                                seed: Optional[int] = None,
                                tq: Optional[int] = None,
                                interpret: bool = False,
                                probs_bf16: bool = False):
    """Fused shift-free relative attention, head-in-lanes layout.

    qu/qv/k/v and the output are (B, L, D) with head h occupying lanes
    [h*dh, (h+1)*dh) — the NATIVE layout of the producing/consuming Dense
    matmuls, so the caller needs zero (0,2,1,3) head-split transposes
    (those relayouts measured ~2.4 ms/step at the b56 production point).
    wh: (H, dh, D) from prep_pos_kernel; other args as rel_attention_sincos.

    Falls back to the per-head layout (with explicit transposes) off-TPU or
    when no lane-aligned head block fits the VMEM budget (hb*dh must be a
    multiple of the 128-lane tile).
    """
    b, l, d = qu.shape
    h, dh = wh.shape[0], wh.shape[1]
    if tq is None:
        tq = _auto_tq(l)
    tq_eff = min(tq, ((l + 7) // 8) * 8)
    on_tpu = interpret or jax.default_backend() in ("tpu", "axon")
    if on_tpu:
        hb_ok = all(_block_sizes(h, b, l, tq_eff, dh, d, qu.dtype.itemsize,
                                 bwd=bwd, packed=True)[0]
                    for bwd in (False, True))
        if hb_ok:
            s = jnp.asarray(scale, qu.dtype)
            return _fused(qu * s, qv * s, k, v, wh, lengths, seed, 1.0,
                          dropout_rate, tq, interpret, probs_bf16, True)
    unpack = lambda x: x.reshape(b, l, h, dh).transpose(0, 2, 1, 3)
    out = rel_attention_sincos(unpack(qu), unpack(qv), unpack(k), unpack(v),
                               wh, lengths, scale, dropout_rate, seed, tq,
                               interpret, probs_bf16)
    return out.transpose(0, 2, 1, 3).reshape(b, l, d)


def shardable_axes(mesh, b: int, h: int,
                   data_axis: str = "data", model_axis: str = "model"):
    """Which mesh axes the attention call can shard over: the batch over
    `data_axis` and heads over `model_axis`, subject to divisibility.
    Returns (data_axis | None, model_axis | None); (None, None) means
    shard_map would be pointless."""
    names = getattr(mesh, "axis_names", ())
    shape = dict(getattr(mesh, "shape", {}))
    d_ax = (data_axis if data_axis in names and shape.get(data_axis, 1) > 1
            and b % shape[data_axis] == 0 else None)
    m_ax = (model_axis if model_axis in names and shape.get(model_axis, 1) > 1
            and h % shape[model_axis] == 0 else None)
    return d_ax, m_ax


def rel_attention_sincos_sharded(qu, qv, k, v, wh, lengths, scale: float,
                                 dropout_rate: float = 0.0,
                                 seed=None, tq: Optional[int] = None,
                                 interpret: bool = False, mesh=None,
                                 data_axis: str = "data",
                                 model_axis: str = "model",
                                 packed: bool = False):
    """shard_map wrapper: batch sharded over the data axis, heads over the
    model axis, everything inside each shard the plain fused kernel.

    A pallas_call has no GSPMD partitioning rule, so under plain pjit the
    auto-partitioner cannot shard it; shard_map makes the decomposition
    explicit — and its transpose rule inserts the psum that accumulates the
    pos-projection gradient across data shards. The dropout seed is mixed
    with the shard's axis indices so masks stay independent across shards.
    Falls back to the unsharded call when no axis is shardable.

    ``packed``: qu/qv/k/v are (B, L, D) head-in-lanes (see
    rel_attention_sincos_packed); the model axis then shards the lane
    dimension, which coincides with head sharding because heads are
    contiguous lane chunks.
    """
    from jax.sharding import PartitionSpec as P

    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    b, h = qu.shape[0], wh.shape[0]
    l = qu.shape[1] if packed else qu.shape[2]
    d_ax, m_ax = shardable_axes(mesh, b, h, data_axis, model_axis)
    plain = (rel_attention_sincos_packed if packed
             else rel_attention_sincos)
    if d_ax is None and m_ax is None:
        return plain(qu, qv, k, v, wh, lengths, scale,
                     dropout_rate, seed, tq, interpret)
    if lengths is None:
        lengths = jnp.full((b,), l, jnp.int32)
    seed_arr = jnp.asarray(0 if seed is None else seed, jnp.int32)

    def body(qu, qv, k, v, wh, lengths, seed):
        if d_ax is not None:
            seed = seed + jax.lax.axis_index(d_ax) * np.int32(40503)
        if m_ax is not None:
            seed = seed + jax.lax.axis_index(m_ax) * np.int32(2654435)
        return plain(qu, qv, k, v, wh, lengths, scale,
                     dropout_rate, seed, tq, interpret)

    spec = P(d_ax, None, m_ax) if packed else P(d_ax, m_ax, None, None)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, spec, P(m_ax, None, None),
                  P(d_ax), P()),
        out_specs=spec, check_vma=False,
    )(qu, qv, k, v, wh, lengths, seed_arr)
