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
    # time_major=True takes/returns (L, B, ...) and scans without any
    # relayout; the batch-major wrapper pays two swaps of the small
    # in/out tensors instead of the 4H-wide gate tensor (see LSTMDecoder).
    time_major: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, L, D) -> (B, L, H), or (L, B, D) -> (L, B, H) when
        ``time_major``. Gate order [i, f, g, o] (torch convention)."""
        if self.time_major:
            l, b = x.shape[0], x.shape[1]
        else:
            b, l = x.shape[0], x.shape[1]
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
        if self.time_major:
            _, hs = jax.lax.scan(step, init, gates_x,
                                 unroll=min(self.unroll, max(l, 1)))
            return hs
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
        """(B, L, d_model) -> (B, L, vocab) unnormalized logits.

        The whole head runs time-major internally: the scan needs its input
        time-leading, and transposing the (B, L, d_model) input plus the
        (L, B, vocab) logits moves ~3.6x fewer bytes than relayouting the
        (B, L, 4*hidden) gate tensor inside each LSTM layer (the decoder
        transpose was ~2.5 ms/step of the b56 train step in the r3 xplane
        copy trace). Pure layout change — numerics identical.
        """
        x = jnp.swapaxes(x, 0, 1)
        for i in range(self.n_layers):
            x = LSTMLayer(self.hidden_dim, self.dtype, time_major=True,
                          name=f"lstm_{i}")(x)
        x = swish(x)
        x = MaskedBatchNorm(self.hidden_dim, axis_name=self.bn_axis_name,
                            dtype=self.dtype, name="norm")(
            x, mask=None if frame_mask is None else frame_mask.T,
            use_running_average=self.deterministic)
        logits = nn.Dense(self.vocab_size, dtype=self.dtype,
                          param_dtype=jnp.float32, name="classifier")(x)
        return jnp.swapaxes(logits, 0, 1)
