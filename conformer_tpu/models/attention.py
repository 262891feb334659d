"""Relative-position multi-head self-attention (Transformer-XL style).

Semantics follow the reference module (reference: model/utils/attention.py:20-101):
shared Q/K/V/pos projections, learned per-head content/position biases (u, v),
score = ((q+u)·kT + rel_shift((q+v)·posT)) / sqrt(d_head), PAD keys masked to
dtype-min before softmax.

TPU-first choices:
- all four projections and both score terms are batched matmuls (MXU);
- softmax and masking are computed in float32 regardless of compute dtype;
- the PE table is broadcast, never tiled per batch;
- attention probability dropout as in the reference (attention.py:67).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from conformer_tpu.models.dropout import Dropout
from conformer_tpu.ops.rel_shift import rel_shift


class _PosParams(nn.Module):
    """Pos-projection parameters with nn.Dense's exact names/shapes/inits, so
    checkpoints are interchangeable between attention impls. The kernel is
    consumed directly by the fused sin/cos kernel; the bias is created for
    structural parity but unused — softmax is exactly invariant to it (it
    shifts every score in a row equally), so its gradient is identically 0,
    matching the reference path's mathematics."""

    d_model: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.d_model, self.d_model), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.d_model,), jnp.float32)
        return kernel, bias


class RelativeMultiHeadAttention(nn.Module):
    d_model: int
    n_heads: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    # 'xla' dense path | 'pallas' fused shift-free sin/cos kernel (fwd+bwd,
    # dropout in-kernel).
    impl: str = "xla"
    score_dtype: jnp.dtype = jnp.float32
    dropout_impl: str = "prng"

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_emb: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 lengths: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: (B, L, D); pos_emb: (2L-1, D); mask: (B, 1, 1, L) True at PAD."""
        b, l, _ = x.shape
        h, dh = self.n_heads, self.d_model // self.n_heads
        dense = lambda name: nn.Dense(self.d_model, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)

        q = dense("query")(x)
        k = dense("key")(x)
        v = dense("value")(x)

        u = self.param("content_bias", nn.initializers.xavier_uniform(), (h, dh),
                       jnp.float32).astype(self.dtype)
        vb = self.param("position_bias", nn.initializers.xavier_uniform(), (h, dh),
                        jnp.float32).astype(self.dtype)
        scale = 1.0 / float(np.sqrt(dh))

        if lengths is None and mask is not None:
            # (B,1,1,L) pad-mask -> lengths (valid prefix convention)
            lengths = jnp.sum(~mask[:, 0, 0, :], axis=-1)

        if self.impl == "pallas":
            # Fully-fused shift-free kernel: scores never touch HBM, fused
            # backward, in-kernel dropout — used for training and inference.
            # Head-in-lanes (packed) operands: q/k/v stay in the Dense
            # output layout (B, L, D) and the per-head biases broadcast as
            # flat (D,) rows, so NO (0,2,1,3) head-split relayouts exist on
            # either side of the kernel (they were ~2.4 ms/step at b56).
            # Under an active mesh (jax.set_mesh) the call is shard_mapped
            # over the data/model axes (pallas has no GSPMD partition rule).
            from conformer_tpu.ops.pallas.sincos_attention import (
                prep_pos_kernel, rel_attention_sincos_sharded)

            import jax

            pos_kernel, _pos_bias = _PosParams(self.d_model, name="pos")()
            wh = prep_pos_kernel(pos_kernel.astype(self.dtype), h)
            rate = 0.0 if deterministic else float(self.dropout_rate)
            seed = None
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
            context = rel_attention_sincos_sharded(
                q + u.reshape(-1), q + vb.reshape(-1), k, v,
                wh, lengths, scale, rate, seed, packed=True)
        else:
            q = q.reshape(b, l, h, dh)
            k = k.reshape(b, l, h, dh)
            v = v.reshape(b, l, h, dh)
            # Position projection has no batch dim: (2L-1, D) -> (2L-1, H, dh)
            p = dense("pos")(pos_emb).reshape(-1, h, dh)
            # (B, H, L, L) content scores + shifted position scores.
            sdt = self.score_dtype
            content = jnp.einsum("blhd,bmhd->bhlm", q + u, k,
                                 preferred_element_type=sdt)
            pos = jnp.einsum("blhd,mhd->bhlm", q + vb, p,
                             preferred_element_type=sdt)
            scores = ((content + rel_shift(pos)) * scale).astype(jnp.float32)

            if mask is not None:
                scores = jnp.where(mask, jnp.finfo(jnp.float32).min, scores)
            weights = nn.softmax(scores, axis=-1)
            weights = Dropout(self.dropout_rate,
                              self.dropout_impl)(weights, deterministic)
            context = jnp.einsum("bhlm,bmhd->blhd", weights.astype(self.dtype),
                                 v, preferred_element_type=jnp.float32)
        context = context.reshape(b, l, self.d_model).astype(self.dtype)
        return dense("out")(context)


class MHSAModule(nn.Module):
    """Pre-LN wrapper (reference: model/utils/attention.py:7-18)."""

    d_model: int
    n_heads: int
    dropout_rate: float = 0.0
    dtype: jnp.dtype = jnp.float32
    impl: str = "xla"
    score_dtype: jnp.dtype = jnp.float32
    dropout_impl: str = "prng"

    @nn.compact
    def __call__(self, x: jnp.ndarray, pos_emb: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None,
                 deterministic: bool = True) -> jnp.ndarray:
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = RelativeMultiHeadAttention(
            self.d_model, self.n_heads, self.dropout_rate, self.dtype,
            self.impl, self.score_dtype, self.dropout_impl,
            name="attention")(x, pos_emb, mask, deterministic=deterministic)
        return Dropout(self.dropout_rate, self.dropout_impl)(x, deterministic)
