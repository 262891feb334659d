"""Pallas TPU kernel: depthwise 1-D convolution (same padding).

The Conformer conv module's depthwise conv (kernel 31, groups=channels —
reference: model/utils/convolution.py:15) maps badly onto XLA's grouped-conv
path. As a Pallas kernel it is K shifted multiply-accumulates over a VMEM
tile — pure VPU work at HBM-bandwidth speed, fused with bias.

Layout: x (B, L, C) time-major, w (K, C), bias (C,). Grid over the batch;
each program holds one (L, C) slab plus a (L+K-1, C) halo scratch in VMEM.
Sized for L*C*4B + (L+K)*C*4B << 16MB VMEM (L=2400, C=512 -> ~10MB); longer
sequences fall back to XLA (use `depthwise_conv1d` which dispatches).

Backward pass: a depthwise conv with flipped kernel (dx) plus a per-tap
reduction (dw) — expressed with the same kernel via custom_vjp.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:  # pltpu import fails on non-TPU builds; interpret mode still works
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _kernel(x_ref, w_ref, b_ref, out_ref, scratch_ref, *, kernel_size: int,
            pad: int):
    """Halo-scratch formulation: x is copied once into a zero-padded
    (L+K-1, C) scratch; each tap is then a static slice multiply-accumulate
    (no per-tap pad temporaries — those blow the scoped VMEM stack)."""
    l = x_ref.shape[1]
    w = w_ref[:]                       # (K, C)
    b = b_ref[:]                       # (C,)
    scratch_ref[pl.ds(0, pad), :] = jnp.zeros_like(scratch_ref[pl.ds(0, pad), :])
    scratch_ref[pl.ds(pad, l), :] = x_ref[0]
    tail = kernel_size - 1 - pad
    if tail:
        scratch_ref[pl.ds(pad + l, tail), :] = jnp.zeros_like(
            scratch_ref[pl.ds(pad + l, tail), :])
    acc = b[None, :] * jnp.ones((l, 1), b.dtype)
    for k in range(kernel_size):
        acc = acc + scratch_ref[pl.ds(k, l), :] * w[k, :][None, :]
    out_ref[0] = acc.astype(out_ref.dtype)


def _pallas_depthwise(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    batch, l, c = x.shape
    k = w.shape[0]
    pad = (k - 1) // 2
    kern = functools.partial(_kernel, kernel_size=k, pad=pad)
    vm = {"memory_space": _VMEM} if _VMEM and not interpret else {}
    block = pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), **vm)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), **vm)
    if pltpu is not None and not interpret:
        scratch = [pltpu.VMEM((l + k - 1, c), x.dtype)]
    else:
        from jax.experimental.pallas import tpu as _pltpu_i  # interpret path
        scratch = [_pltpu_i.VMEM((l + k - 1, c), x.dtype)]
    return pl.pallas_call(
        kern,
        grid=(batch,),
        in_specs=[block, full((k, c)), full((c,))],
        out_specs=block,
        scratch_shapes=scratch,
        out_shape=jax.ShapeDtypeStruct((batch, l, c), x.dtype),
        interpret=interpret,
    )(x, w, b)


def _dw_kernel(x_ref, g_ref, dw_ref, scratch_ref, *, kernel_size: int,
               pad: int):
    """Weight gradient: dw[k, c] = sum_{b,i} x[b, i+k-pad, c] * g[b, i, c].
    One (L, C) slab per program (grid over batch, sequential), x in a
    zero-padded halo scratch as in the forward; each tap is one fused
    multiply + L-reduction on the VPU, accumulated into the (K, C) output
    block across the batch grid."""
    i = pl.program_id(0)
    l = x_ref.shape[1]
    scratch_ref[pl.ds(0, pad), :] = jnp.zeros_like(
        scratch_ref[pl.ds(0, pad), :])
    scratch_ref[pl.ds(pad, l), :] = x_ref[0]
    tail = kernel_size - 1 - pad
    if tail:
        scratch_ref[pl.ds(pad + l, tail), :] = jnp.zeros_like(
            scratch_ref[pl.ds(pad + l, tail), :])
    g = g_ref[0].astype(jnp.float32)   # (L, C)

    @pl.when(i == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    for k in range(kernel_size):
        tap = jnp.sum(scratch_ref[pl.ds(k, l), :].astype(jnp.float32) * g,
                      axis=0, keepdims=True)          # (1, C)
        dw_ref[k:k + 1, :] += tap.astype(dw_ref.dtype)


def _pallas_dw(x: jnp.ndarray, g: jnp.ndarray, k: int,
               interpret: bool = False) -> jnp.ndarray:
    batch, l, c = x.shape
    pad = (k - 1) // 2
    kern = functools.partial(_dw_kernel, kernel_size=k, pad=pad)
    vm = {"memory_space": _VMEM} if _VMEM and not interpret else {}
    block = pl.BlockSpec((1, l, c), lambda i: (i, 0, 0), **vm)
    from jax.experimental.pallas import tpu as _pltpu
    return pl.pallas_call(
        kern,
        grid=(batch,),
        in_specs=[block, block],
        out_specs=pl.BlockSpec((k, c), lambda i: (0, 0), **vm),
        scratch_shapes=[_pltpu.VMEM((l + k - 1, c), x.dtype)],
        out_shape=jax.ShapeDtypeStruct((k, c), jnp.float32),
        interpret=interpret,
    )(x, g)


def _xla_depthwise(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[-1]
    out = jax.lax.conv_general_dilated(
        x, w[:, None, :],
        window_strides=(1,), padding="SAME",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c)
    return out + b[None, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def depthwise_conv1d(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
                     use_pallas: bool = True,
                     interpret: bool = False) -> jnp.ndarray:
    """Depthwise same-pad conv1d. x (B, L, C), w (K, C), b (C,) -> (B, L, C)."""
    return _forward(x, w, b, use_pallas, interpret)


def _forward(x, w, b, use_pallas, interpret):
    batch, l, c = x.shape
    k = w.shape[0]
    bytes_needed = (2 * l * c + (l + k) * c) * x.dtype.itemsize
    if not interpret and jax.default_backend() not in ("tpu", "axon"):
        use_pallas = False  # compiled Pallas needs a TPU; tests pass interpret
    if use_pallas and bytes_needed <= _VMEM_BUDGET_BYTES:
        return _pallas_depthwise(x, w, b, interpret)
    return _xla_depthwise(x, w, b)


def _fwd(x, w, b, use_pallas, interpret):
    return _forward(x, w, b, use_pallas, interpret), (x, w)


def _bwd(use_pallas, interpret, res, g):
    x, w = res
    batch, l, c = x.shape
    k = w.shape[0]
    # dx: depthwise conv of g with the flipped kernel.
    dx = _forward(g, w[::-1], jnp.zeros((w.shape[1],), w.dtype),
                  use_pallas, interpret)
    # dw[k, c] = sum_{b, i} x[b, i + k - pad, c] * g[b, i, c]
    bytes_needed = (2 * l * c + (l + k) * c) * x.dtype.itemsize
    on_tpu = interpret or jax.default_backend() in ("tpu", "axon")
    if use_pallas and on_tpu and bytes_needed <= _VMEM_BUDGET_BYTES:
        dw = _pallas_dw(x, g, k, interpret).astype(w.dtype)
    else:
        pad = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        taps = [jnp.sum(xp[:, i: i + l, :] * g, axis=(0, 1))
                for i in range(k)]
        dw = jnp.stack(taps, axis=0)
    db = jnp.sum(g, axis=(0, 1))
    return dx, dw, db


depthwise_conv1d.defvjp(_fwd, _bwd)
