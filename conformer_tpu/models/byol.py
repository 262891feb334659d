"""BYOL-style self-supervised pretraining of the Conformer encoder.

The reference only ever shipped a BYOL *diagram* (reference: README.md:50 +
assets/byol.png; no code exists). This is a working BYOL-A-style recipe for
speech: two SpecAugment views of the same log-mels go through an online
encoder (+ projector + predictor) and an EMA target encoder (+ projector);
the loss is the symmetric masked-mean cosine regression between predictions
and stopped-gradient targets. Collapse is avoided by the predictor + EMA
asymmetry (no negatives needed).

The online encoder IS ConformerEncoder, so pretrained weights drop straight
into the CTC model (conformer_tpu.train.pretrain.transfer_encoder).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from conformer_tpu.config import ModelConfig, PretrainConfig
from conformer_tpu.models.encoder import ConformerEncoder
from conformer_tpu.utils.masking import padding_mask


class MLPHead(nn.Module):
    hidden: int
    out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="fc1")(x)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype, param_dtype=jnp.float32,
                        name="fc2")(x)


class BYOLNet(nn.Module):
    """Encoder + projector (+ optional predictor) — one tower."""

    cfg: ModelConfig
    pre: PretrainConfig
    with_predictor: bool = False
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, mels: jnp.ndarray, lengths: Optional[jnp.ndarray]
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        enc, out_lengths = ConformerEncoder(
            self.cfg, dtype=self.dtype, deterministic=self.deterministic,
            name="encoder")(mels, lengths)
        proj = MLPHead(self.pre.predictor_hidden, self.pre.proj_dim,
                       self.dtype, name="projector")(enc)
        if self.with_predictor:
            proj = MLPHead(self.pre.predictor_hidden, self.pre.proj_dim,
                           self.dtype, name="predictor")(proj)
        return proj.astype(jnp.float32), out_lengths


def byol_loss(pred: jnp.ndarray, target: jnp.ndarray,
              frame_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """2 - 2*cos per frame, masked mean. target must already be
    stop_gradient'ed."""
    pred = pred / (jnp.linalg.norm(pred, axis=-1, keepdims=True) + 1e-8)
    target = target / (jnp.linalg.norm(target, axis=-1, keepdims=True) + 1e-8)
    per_frame = 2.0 - 2.0 * jnp.sum(pred * target, axis=-1)
    if frame_mask is None:
        return jnp.mean(per_frame)
    m = frame_mask.astype(jnp.float32)
    return jnp.sum(per_frame * m) / jnp.maximum(jnp.sum(m), 1.0)


def ema_update(target_params: Any, online_params: Any, decay: float) -> Any:
    """Polyak averaging of the target tower (projector included, predictor
    excluded by construction — the target tower has no predictor params)."""
    return jax.tree_util.tree_map(
        lambda t, o: decay * t + (1.0 - decay) * o, target_params, online_params)
