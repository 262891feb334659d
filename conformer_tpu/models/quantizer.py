"""Gumbel-softmax vector quantizer for wav2vec2-style pretraining.

Semantics follow the reference quantizer
(reference: model/modules/quantization.py:7-74): grouped codebooks
(G groups x V codes, codevector_dim/G each), a linear weight projection from
the subsampled feature dim to G*V logits, hard Gumbel-softmax sampling in
training vs argmax one-hot in eval, and a diversity perplexity computed from
the softmax distribution over masked timesteps.

TPU-first: straight-through hard Gumbel via jax.nn.one_hot + stop_gradient
(no scatter), everything batched; the temperature is an input so it can be
annealed by the train loop without recompilation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class GumbelQuantizer(nn.Module):
    input_dim: int
    num_groups: int = 2
    num_vars: int = 320
    codevector_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.codevector_dim % self.num_groups:
            raise ValueError("codevector_dim must divide num_groups")
        self.weight_proj = nn.Dense(self.num_groups * self.num_vars,
                                    dtype=self.dtype, param_dtype=jnp.float32,
                                    name="weight_proj")
        self.codevectors = self.param(
            "codevectors", nn.initializers.uniform(scale=1.0),
            (self.num_groups * self.num_vars,
             self.codevector_dim // self.num_groups), jnp.float32)

    def __call__(self, features: jnp.ndarray,
                 mask_time_indices: Optional[jnp.ndarray] = None,
                 temperature: float | jnp.ndarray = 2.0,
                 train: bool = True,
                 rng: Optional[jax.Array] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """features: (B, T, input_dim) -> (codevectors (B, T, codevector_dim),
        perplexity scalar)."""
        b, t, _ = features.shape
        g, v = self.num_groups, self.num_vars
        logits = self.weight_proj(features).reshape(b, t, g, v).astype(jnp.float32)

        if train:
            if rng is None:
                rng = self.make_rng("gumbel")
            gumbels = jax.random.gumbel(rng, logits.shape, jnp.float32)
            y_soft = jax.nn.softmax((logits + gumbels) / temperature, axis=-1)
            idx = jnp.argmax(y_soft, axis=-1)
            y_hard = jax.nn.one_hot(idx, v, dtype=jnp.float32)
            # straight-through: forward hard, backward soft
            probs = y_hard + y_soft - jax.lax.stop_gradient(y_soft)
            soft_dist = jax.nn.softmax(logits, axis=-1)
        else:
            idx = jnp.argmax(logits, axis=-1)
            probs = jax.nn.one_hot(idx, v, dtype=jnp.float32)
            soft_dist = probs

        # Perplexity over masked steps (reference: quantization.py:29-38).
        if mask_time_indices is not None:
            m = mask_time_indices.astype(jnp.float32)[..., None, None]
            marginal = jnp.sum(soft_dist * m, axis=(0, 1)) / jnp.maximum(
                jnp.sum(m), 1.0)
        else:
            marginal = jnp.mean(soft_dist, axis=(0, 1))
        perplexity = jnp.sum(jnp.exp(
            -jnp.sum(marginal * jnp.log(marginal + 1e-7), axis=-1)))

        # Gather codevectors: (B, T, G, V) @ (G, V, D/G) -> (B, T, G, D/G).
        codebook = self.codevectors.reshape(g, v, -1)
        quantized = jnp.einsum("btgv,gvd->btgd", probs, codebook,
                               preferred_element_type=jnp.float32)
        return quantized.reshape(b, t, self.codevector_dim), perplexity
