"""Dropout with a fused stateless-hash implementation.

``impl='prng'`` is flax ``nn.Dropout``: the PRNG (``rbg`` on TPU) emits a
random-bit buffer that XLA cannot fuse into the consumer, so every mask
round-trips HBM — measured ~4ms/step of the production train step across the
~100 dropout sites (tools/trace_step.py, rng group).

``impl='hash'`` derives the keep mask from a murmur3-style integer hash of
the element coordinates and a seed folded from the module's ``'dropout'``
RNG key. The mask is pure elementwise u32 arithmetic on iotas, which XLA
fuses into the surrounding chain — no random-bit buffer ever exists in HBM.
It is the same construction the fused attention kernel uses in-kernel
(ops/pallas/sincos_attention.py ``_dropout_keep``), applied at the XLA
level. Not bit-compatible with the PRNG path (any fixed dropout pattern is
equally valid — the reference's torch PRNG matches neither).

reference: dropout placement per module — model/utils/ffn.py:5-22,
model/utils/attention.py:22-47, model/utils/convolution.py:7-32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_AXIS_MULTS = (0x85EBCA6B, 0xC2B2AE35, 0x27D4EB2F, 0x01000193,
               0x61C88647, 0x9E3779B9)


def hash_keep(shape, seed_words, rate: float):
    """Boolean keep mask of `shape`: P(keep) = 1 - rate.

    seed_words: 1-D uint32 array (static length) mixed into the hash;
    rate: static python float in (0, 1).
    """
    u = lambda c: jnp.uint32(np.uint32(c))
    h = u(0x9E3779B9)
    for i in range(seed_words.shape[0]):
        h = h * u(0x01000193) + seed_words[i].astype(jnp.uint32)
    x = jnp.full(shape, h, jnp.uint32)
    for axis in range(len(shape)):
        idx = jax.lax.broadcasted_iota(jnp.uint32, shape, axis)
        x = x + idx * u(_AXIS_MULTS[axis % len(_AXIS_MULTS)])
    x = x ^ (x >> u(16))
    x = x * u(0x85EBCA6B)
    x = x ^ (x >> u(13))
    x = x * u(0xC2B2AE35)
    x = x ^ (x >> u(16))
    thresh = u(int(rate * 4294967296.0) & 0xFFFFFFFF)
    return x >= thresh


class Dropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout`` with a selectable backend."""

    rate: float
    impl: str = "prng"  # 'prng' (flax/jax PRNG) | 'hash' (fused, no HBM mask)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if deterministic or self.rate == 0.0:
            return x
        if self.impl != "hash":
            return nn.Dropout(self.rate, deterministic=False)(x)
        key = self.make_rng("dropout")  # folds in the module path: per-site
        seed_words = jnp.ravel(jax.random.key_data(key)).astype(jnp.uint32)
        keep = hash_keep(x.shape, seed_words, self.rate)
        scale = jnp.asarray(1.0 / (1.0 - self.rate), x.dtype)
        return jnp.where(keep, x * scale, jnp.zeros((), x.dtype))
