"""Transformer-XL style relative sinusoidal positional encoding.

Reproduces the reference construction (reference: model/utils/position.py:5-27):
for sequence length L, a (2L-1, d) table whose row ``j`` encodes relative
position ``L-1-j`` — the positive half [L-1 .. 0] (a flipped standard sinusoid)
followed by the negative half [-1 .. -(L-1)] (sinusoid of negated angles).

TPU-first differences: the table is a pure function of (L, d) computed with
static shapes inside jit (XLA constant-folds it); it is broadcast against the
batch instead of materialized per example (reference repeats it B times,
position.py:26).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def relative_positional_encoding(length: int, d_model: int,
                                 dtype=jnp.float32) -> jnp.ndarray:
    """-> (2*length - 1, d_model) relative PE table; row j <-> position L-1-j."""
    inv_freq = np.exp(np.arange(0, d_model, 2, dtype=np.float64)
                      * -(np.log(10000.0) / d_model))
    pos = np.arange(length, dtype=np.float64)[:, None]
    angles = pos * inv_freq[None, :]                     # (L, d/2)

    pe_pos = np.zeros((length, d_model))
    pe_pos[:, 0::2] = np.sin(angles)
    pe_pos[:, 1::2] = np.cos(angles)
    pe_neg = np.zeros((length, d_model))
    pe_neg[:, 0::2] = np.sin(-angles)
    pe_neg[:, 1::2] = np.cos(-angles)

    pe = np.concatenate([pe_pos[::-1], pe_neg[1:]], axis=0)   # (2L-1, d)
    return jnp.asarray(pe, dtype=dtype)
