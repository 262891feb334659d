"""Top-level Conformer CTC model: encoder -> LSTM decoder -> logits.

API mirrors the reference top module (reference: model/conformer.py:9-27):
``apply(mels, lengths) -> (logits (B, T', vocab), subsampled lengths)``, with
mels time-major ``(B, T, n_mels)`` (the reference is channel-first).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from conformer_tpu.config import ModelConfig
from conformer_tpu.models.decoder import LSTMDecoder
from conformer_tpu.models.encoder import ConformerEncoder
from conformer_tpu.utils.masking import padding_mask


_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}


class Conformer(nn.Module):
    cfg: ModelConfig
    compute_dtype: str = "float32"
    bn_axis_name: Optional[str] = None
    deterministic: bool = True

    @nn.compact
    def __call__(self, mels: jnp.ndarray,
                 lengths: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        dtype = _DTYPES[self.compute_dtype]
        enc, out_lengths = ConformerEncoder(
            self.cfg, bn_axis_name=self.bn_axis_name, dtype=dtype,
            deterministic=self.deterministic, name="encoder")(mels, lengths)
        # decoder_norm_masked=False reproduces the reference's pad-inclusive
        # decoder BatchNorm statistics (reference: model/modules/decoder.py:23-25
        # normalizes over the zero frames pad_packed_sequence emits).
        frame_mask = None
        if out_lengths is not None and self.cfg.decoder_norm_masked:
            frame_mask = padding_mask(out_lengths, enc.shape[1])
        logits = LSTMDecoder(
            self.cfg.vocab_size, self.cfg.lstm_hidden_dim, self.cfg.n_lstm_layers,
            bn_axis_name=self.bn_axis_name, dtype=dtype,
            deterministic=self.deterministic, name="decoder")(enc, frame_mask)
        # Logits in float32: the CTC loss / softmax consumers need full precision
        # (reference keeps an fp32 island for the loss, train.py:232-243).
        return logits.astype(jnp.float32), out_lengths
