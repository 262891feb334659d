"""Pallas TPU kernel: fused relative-position attention (Transformer-XL style).

Fuses content scores, position scores with in-kernel relative shift, length
masking, softmax, and the value contraction into one kernel — the (B, H, L, L)
score/weight tensors never touch HBM (XLA materializes both, reference-style
attention materializes three: model/utils/attention.py:49-70).

The relative shift uses a strided-reslice identity instead of a gather:
for raw[i, m] = qv_i . p[m + off] with C = TQ + L - 1 columns,
    out[i, j] = raw[i, j - i + TQ - 1]
              = flat(raw)[TQ - 1 + i*(C-1) + j]
              = flat(raw)[TQ-1 : TQ-1 + TQ*(C-1)].reshape(TQ, C-1)[i, j]
so a flatten + slice + reshape produces the aligned scores.

Layouts: qu = q + content_bias, qv = q + position_bias (B, H, L, dh);
k, v (B, H, L, dh); p (H, 2L-1, dh) projected per head. Grid (B, H, L/TQ);
K/V are whole rows in VMEM (fine up to L ~ 4k at dh 64).

Backward: custom VJP that recomputes via the XLA reference path — forward-only
consumers (eval, serving, RTF benchmarks) get the fused kernel; training
gradients stay exact.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
    _SMEM = pltpu.SMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = _SMEM = None

NEG_INF = float(np.finfo(np.float32).min)


# ---------------------------------------------------------------------------
# Reference XLA implementation (also the backward path).
# ---------------------------------------------------------------------------

def rel_attention_xla(qu: jnp.ndarray, qv: jnp.ndarray, k: jnp.ndarray,
                      v: jnp.ndarray, p: jnp.ndarray,
                      lengths: Optional[jnp.ndarray], scale: float
                      ) -> jnp.ndarray:
    """qu/qv/k/v: (B, H, L, dh); p: (H, 2L-1, dh) -> context (B, H, L, dh)."""
    from conformer_tpu.ops.rel_shift import rel_shift

    content = jnp.einsum("bhld,bhmd->bhlm", qu, k,
                         preferred_element_type=jnp.float32)
    pos_raw = jnp.einsum("bhld,hmd->bhlm", qv, p,
                         preferred_element_type=jnp.float32)
    scores = (content + rel_shift(pos_raw)) * scale
    if lengths is not None:
        l = k.shape[2]
        mask = jnp.arange(l)[None, :] >= lengths[:, None]   # (B, L) pad=True
        scores = jnp.where(mask[:, None, None, :], NEG_INF, scores)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhlm,bhmd->bhld", weights.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(v.dtype)


# ---------------------------------------------------------------------------
# Pallas kernel.
# ---------------------------------------------------------------------------

def _attn_kernel(len_ref, qu_ref, qv_ref, k_ref, v_ref, p_ref, out_ref, *,
                 tq: int, scale: float, l_valid: int):
    """One (batch, head, q-tile) program. Shapes in VMEM:
    qu/qv (1,1,TQ,dh), k/v (1,1,L,dh), p (1, 2L-1+pad, dh), out (1,1,TQ,dh).

    The in-kernel strided-reslice shift (see module docstring) is exact but
    Mosaic currently cannot relayout the unaligned (TQ, TQ+L-1) flatten, so
    the compiled path uses `_attn_kernel_bias` below; this kernel remains the
    interpret-mode/NumPy-semantics reference.
    """
    qt = pl.program_id(2)
    l = k_ref.shape[2]
    qu = qu_ref[0, 0]                      # (TQ, dh)
    qv = qv_ref[0, 0]
    k = k_ref[0, 0]                        # (L, dh)
    v = v_ref[0, 0]

    content = jax.lax.dot_general(
        qu, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TQ, L)

    # Position scores for this tile: the needed p rows are the contiguous
    # window [start, start + C) with start = L - TQ - qs, C = TQ + L - 1:
    # rawW[i, m] = qv_i . p[start + m], and the relative shift becomes the
    # strided reslice out[i, j] = flat(rawW)[TQ-1 + i*(C-1) + j].
    qs = qt * tq
    start = l - tq - qs
    c = tq + l - 1
    p_win = p_ref[0, pl.ds(start, c), :]             # (C, dh)
    raw = jax.lax.dot_general(
        qv, p_win, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (TQ, C)
    flat = raw.reshape(tq * c)
    pos = flat[tq - 1: tq - 1 + tq * (c - 1)].reshape(tq, c - 1)[:, :l]

    scores = (content + pos) * scale
    length = len_ref[pl.program_id(0)]
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, l), 1)
    valid = col < jnp.minimum(length, l_valid)
    scores = jnp.where(valid, scores, NEG_INF)

    # NEG_INF is finite (float32 min), so this softmax is NaN-free even for
    # fully masked rows (they produce all-zero weights).
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m) * valid.astype(jnp.float32)
    s = jnp.sum(e, axis=-1, keepdims=True)
    weights = e / jnp.maximum(s, 1e-9)
    out = jax.lax.dot_general(
        weights.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _bias_kernel(len_ref, qu_ref, k_ref, v_ref, bias_ref, out_ref, *,
                 tq: int, scale: float, l_valid: int):
    """Compiled-path kernel: content matmul + precomputed position bias +
    mask + softmax + value contraction, fused. bias (1,1,TQ,L) is the
    XLA-shifted position score tile."""
    l = k_ref.shape[2]
    qu = qu_ref[0, 0]
    k = k_ref[0, 0]
    v = v_ref[0, 0]
    content = jax.lax.dot_general(
        qu, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    scores = (content + bias_ref[0, 0]) * scale

    length = len_ref[pl.program_id(0)]
    col = jax.lax.broadcasted_iota(jnp.int32, (tq, l), 1)
    valid = col < jnp.minimum(length, l_valid)
    scores = jnp.where(valid, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m) * valid.astype(jnp.float32)
    s = jnp.sum(e, axis=-1, keepdims=True)
    weights = e / jnp.maximum(s, 1e-9)
    out = jax.lax.dot_general(
        weights.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    out_ref[0, 0] = out.astype(out_ref.dtype)


def _pallas_rel_attention_bias(qu, qv, k, v, p, lengths, scale, tq=128,
                               interpret=False):
    """Compiled TPU path: position scores + shift in XLA, the rest fused."""
    from conformer_tpu.ops.rel_shift import rel_shift

    b, h, l_orig, dh = qu.shape
    pos_bias = rel_shift(jnp.einsum(
        "bhld,hmd->bhlm", qv, p, preferred_element_type=jnp.float32))
    l = ((l_orig + tq - 1) // tq) * tq
    if l != l_orig:
        pad = [(0, 0), (0, 0), (0, l - l_orig), (0, 0)]
        qu, k, v = (jnp.pad(x, pad) for x in (qu, k, v))
        pos_bias = jnp.pad(pos_bias, [(0, 0), (0, 0), (0, l - l_orig),
                                      (0, l - l_orig)])
    if lengths is None:
        lengths = jnp.full((b,), l_orig, jnp.int32)
    lengths = lengths.astype(jnp.int32)

    kern = functools.partial(_bias_kernel, tq=tq, scale=scale, l_valid=l_orig)
    vm = {"memory_space": _VMEM} if _VMEM and not interpret else {}
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, h, l // tq),
        in_specs=[
            pl.BlockSpec((1, 1, tq, dh), lambda bi, hi, qi, *_: (bi, hi, qi, 0), **vm),
            pl.BlockSpec((1, 1, l, dh), lambda bi, hi, qi, *_: (bi, hi, 0, 0), **vm),
            pl.BlockSpec((1, 1, l, dh), lambda bi, hi, qi, *_: (bi, hi, 0, 0), **vm),
            pl.BlockSpec((1, 1, tq, l), lambda bi, hi, qi, *_: (bi, hi, qi, 0), **vm),
        ],
        out_specs=pl.BlockSpec((1, 1, tq, dh),
                               lambda bi, hi, qi, *_: (bi, hi, qi, 0), **vm),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, l, dh), v.dtype),
        interpret=interpret,
    )(lengths, qu, k, v, pos_bias)
    return out[:, :, :l_orig, :]


def _pallas_rel_attention(qu, qv, k, v, p, lengths, scale, tq=128,
                          interpret=False):
    b, h, l_orig, dh = qu.shape
    # Pad L to a multiple of TQ (masked out in-kernel).
    l = ((l_orig + tq - 1) // tq) * tq
    if l != l_orig:
        pad = [(0, 0), (0, 0), (0, l - l_orig), (0, 0)]
        qu, qv, k, v = (jnp.pad(x, pad) for x in (qu, qv, k, v))
        # p must cover window indices for the padded geometry: length 2l-1.
        p = jnp.pad(p, [(0, 0), (l - l_orig, l - l_orig), (0, 0)])
    if lengths is None:
        lengths = jnp.full((b,), l_orig, jnp.int32)
    lengths = lengths.astype(jnp.int32)

    kern = functools.partial(_attn_kernel, tq=tq, scale=scale, l_valid=l_orig)
    vm = {"memory_space": _VMEM} if _VMEM and not interpret else {}
    grid = (b, h, l // tq)
    if pltpu is not None:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, tq, dh), lambda bi, hi, qi, *_: (bi, hi, qi, 0), **vm),
                pl.BlockSpec((1, 1, tq, dh), lambda bi, hi, qi, *_: (bi, hi, qi, 0), **vm),
                pl.BlockSpec((1, 1, l, dh), lambda bi, hi, qi, *_: (bi, hi, 0, 0), **vm),
                pl.BlockSpec((1, 1, l, dh), lambda bi, hi, qi, *_: (bi, hi, 0, 0), **vm),
                pl.BlockSpec((1, 2 * l - 1, dh), lambda bi, hi, qi, *_: (hi, 0, 0), **vm),
            ],
            out_specs=pl.BlockSpec((1, 1, tq, dh),
                                   lambda bi, hi, qi, *_: (bi, hi, qi, 0), **vm),
        )
        out = pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, l, dh), v.dtype),
            interpret=interpret,
        )(lengths, qu, qv, k, v, p)
    else:  # pragma: no cover — non-TPU build without pltpu
        raise RuntimeError("pallas TPU grid spec unavailable")
    return out[:, :, :l_orig, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def rel_attention(qu, qv, k, v, p, lengths, scale: float,
                  impl: str = "xla", interpret: bool = False):
    """Dispatching fused relative-position attention. See rel_attention_xla."""
    return _dispatch(qu, qv, k, v, p, lengths, scale, impl, interpret)


def _dispatch(qu, qv, k, v, p, lengths, scale, impl, interpret):
    if impl == "pallas":
        if interpret:
            return _pallas_rel_attention(qu, qv, k, v, p, lengths, scale,
                                         interpret=True)
        if jax.default_backend() in ("tpu", "axon"):
            return _pallas_rel_attention_bias(qu, qv, k, v, p, lengths, scale)
    return rel_attention_xla(qu, qv, k, v, p, lengths, scale)


def _fwd(qu, qv, k, v, p, lengths, scale, impl, interpret):
    out = _dispatch(qu, qv, k, v, p, lengths, scale, impl, interpret)
    return out, (qu, qv, k, v, p, lengths)


def _bwd(scale, impl, interpret, res, g):
    qu, qv, k, v, p, lengths = res
    _, vjp = jax.vjp(
        lambda qu, qv, k, v, p: rel_attention_xla(qu, qv, k, v, p, lengths,
                                                  scale), qu, qv, k, v, p)
    dqu, dqv, dk, dv, dp = vjp(g)
    return dqu, dqv, dk, dv, dp, None


rel_attention.defvjp(_fwd, _bwd)
