"""LSTM decoder head: LSTM -> swish -> BatchNorm -> vocab projection.

Semantics follow the reference decoder (reference: model/modules/decoder.py:7-27)
with two TPU-first changes:

- The reference packs length-sorted sequences into cuDNN's packed-LSTM
  (decoder.py:17). On TPU the LSTM is a ``lax.scan`` over time with the
  input-to-hidden matmul hoisted out of the loop (one big MXU matmul for the
  whole sequence); since the LSTM is unidirectional, outputs at valid steps are
  identical to the packed computation, so no sorting is needed anywhere in the
  pipeline.
- BatchNorm statistics are mask-aware (the reference normalizes over the
  zero-padded frames that ``pad_packed_sequence`` emits, decoder.py:23-25).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from conformer_tpu.models.layers import MaskedBatchNorm, swish


class LSTMLayer(nn.Module):
    hidden_dim: int
    dtype: jnp.dtype = jnp.float32
    unroll: int = 8    # scan unrolling: amortizes per-step dispatch overhead

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, L, D) -> (B, L, H). Gate order [i, f, g, o] (torch convention)."""
        b, l, _ = x.shape
        h4 = 4 * self.hidden_dim
        # Hoisted input projection: one matmul over the full sequence.
        gates_x = nn.Dense(h4, dtype=self.dtype, param_dtype=jnp.float32,
                           name="input_proj")(x)
        w_hh = self.param("recurrent_kernel", nn.initializers.orthogonal(),
                          (self.hidden_dim, h4), jnp.float32).astype(self.dtype)

        def step(carry, gx):
            h, c = carry
            gates = gx + h @ w_hh
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h = jax.nn.sigmoid(o) * jnp.tanh(c)
            return (h, c), h

        init = (jnp.zeros((b, self.hidden_dim), self.dtype),
                jnp.zeros((b, self.hidden_dim), self.dtype))
        _, hs = jax.lax.scan(step, init, jnp.swapaxes(gates_x, 0, 1),
                             unroll=min(self.unroll, max(l, 1)))
        return jnp.swapaxes(hs, 0, 1)


class LSTMDecoder(nn.Module):
    vocab_size: int
    hidden_dim: int = 640
    n_layers: int = 1
    bn_axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 frame_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """(B, L, d_model) -> (B, L, vocab) unnormalized logits."""
        for i in range(self.n_layers):
            x = LSTMLayer(self.hidden_dim, self.dtype, name=f"lstm_{i}")(x)
        x = swish(x)
        x = MaskedBatchNorm(self.hidden_dim, axis_name=self.bn_axis_name,
                            dtype=self.dtype, name="norm")(
            x, mask=frame_mask, use_running_average=self.deterministic)
        return nn.Dense(self.vocab_size, dtype=self.dtype,
                        param_dtype=jnp.float32, name="classifier")(x)
