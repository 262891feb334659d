"""wav2vec2-style contrastive pretraining of the Conformer encoder.

A *working* version of what the reference attempted and abandoned
(reference: model/wav2vec2.py — unrunnable: imports a nonexistent
``generate_mask`` :9, wrong ConformerBlock kwarg :21, no loss, no entry
point; SURVEY §2.6). Structure keeps the reference's intent:

  subsample -> [target branch: Gumbel-quantize the *unmasked* features]
            -> [context branch: mask spans, learned mask embedding,
                conformer blocks] -> project both to proj_dim
  loss = InfoNCE(context@masked vs quantized target + K in-utterance
         distractors) + diversity penalty on codebook usage.

TPU-first: span masking, negative sampling, and the cosine-logit InfoNCE are
all static-shape batched ops inside one jit; the pretrained encoder's
subsample/blocks parameters transfer directly into the CTC Conformer
(same module names — see conformer_tpu.train.pretrain.transfer_encoder).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from conformer_tpu.config import ModelConfig, PretrainConfig
from conformer_tpu.models.encoder import apply_block_stack
from conformer_tpu.models.layers import ConvolutionSubsampling
from conformer_tpu.models.position import relative_positional_encoding
from conformer_tpu.models.quantizer import GumbelQuantizer
from conformer_tpu.utils.masking import (attention_pad_mask, padding_mask,
                                         subsampled_length)


def sample_mask_spans(rng: jax.Array, batch: int, length: int,
                      mask_prob: float, span: int,
                      valid_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(B, T) bool span mask: Bernoulli(mask_prob) starts dilated to `span`."""
    starts = jax.random.bernoulli(rng, mask_prob, (batch, length))
    # dilate each start over the next `span` frames with a cumulative trick
    idx = jnp.arange(length)
    def dilate(row):
        start_idx = jnp.where(row, idx, -span - 1)
        # frame j is masked if any start in (j-span, j]
        best = jax.lax.cummax(start_idx, axis=0)
        return (idx - best) < span
    mask = jax.vmap(dilate)(starts)
    if valid_mask is not None:
        mask &= valid_mask
    return mask


class Wav2Vec2Pretrain(nn.Module):
    cfg: ModelConfig
    pre: PretrainConfig
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, mels: jnp.ndarray, lengths: Optional[jnp.ndarray],
                 mask_time_indices: jnp.ndarray,
                 gumbel_temperature: float | jnp.ndarray = 2.0
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """mels (B, T, n_mels); mask_time_indices (B, T') from
        sample_mask_spans.

        -> (context_proj (B, T', proj), target_proj (B, T', proj), perplexity).
        """
        cfg, pre = self.cfg, self.pre
        features = ConvolutionSubsampling(cfg.d_model, self.dtype,
                                          impl=getattr(cfg, "subsample_impl",
                                                       "conv2d"),
                                          name="subsample")(mels)
        b, t, feat_dim = features.shape

        # Target branch: quantize the *unmasked* features
        # (reference intent: wav2vec2.py:38).
        quantized, perplexity = GumbelQuantizer(
            input_dim=feat_dim, num_groups=pre.num_groups,
            num_vars=pre.num_vars, codevector_dim=pre.proj_dim,
            dtype=self.dtype, name="quantizer")(
                features, mask_time_indices, gumbel_temperature,
                train=not self.deterministic)
        target = nn.Dense(pre.proj_dim, dtype=self.dtype,
                          param_dtype=jnp.float32,
                          name="target_proj")(quantized)

        # Context branch: project, replace masked frames with a learned
        # embedding, then contextualize with conformer blocks.
        x = nn.Dense(cfg.d_model, dtype=self.dtype, param_dtype=jnp.float32,
                     name="input_proj")(features)
        mask_emb = self.param("mask_embedding",
                              nn.initializers.normal(0.02),
                              (cfg.d_model,), jnp.float32).astype(self.dtype)
        x = jnp.where(mask_time_indices[..., None], mask_emb, x)

        attn_mask = frame_mask = None
        if lengths is not None:
            out_lengths = subsampled_length(lengths)
            frame_mask = padding_mask(out_lengths, t)
            attn_mask = attention_pad_mask(out_lengths, t)
        pos_emb = relative_positional_encoding(t, cfg.d_model, self.dtype)

        # Same stack builder as the supervised encoder: identical param
        # structure (transfer_encoder relies on it) AND identical flag
        # coverage — remat, scan_unroll, fused attention, hash dropout,
        # score dtype. See apply_block_stack's docstring for the bug this
        # replaces.
        x = apply_block_stack(cfg, x, pos_emb, attn_mask, frame_mask,
                              bn_axis_name=None, dtype=self.dtype,
                              deterministic=self.deterministic)

        context = nn.Dense(pre.proj_dim, dtype=self.dtype,
                           param_dtype=jnp.float32, name="context_proj")(x)
        return (context.astype(jnp.float32), target.astype(jnp.float32),
                perplexity)


def contrastive_loss(context: jnp.ndarray, target: jnp.ndarray,
                     mask_time_indices: jnp.ndarray, rng: jax.Array,
                     num_negatives: int = 100,
                     temperature: float = 0.1,
                     negatives_impl: str = "sampled"
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """InfoNCE over masked positions with in-utterance negatives.

    context/target: (B, T, D); mask_time_indices: (B, T) bool.
    -> (mean loss over masked positions, accuracy).

    TPU-first formulation: the naive layout gathers (B, T, K, D) negative
    *vectors* and spawns several same-shape autodiff temporaries (~16G
    resident at batch 32, T=199, K=100, D=256 — it capped the pretrain
    batch size). Instead, normalize once and compute ONE (B, T, T) cosine
    matrix on the MXU, then gather the K sampled *scalar* logits per
    position — identical logits for the same rng (parity-tested in
    tests/test_pretrain.py::test_contrastive_matches_gathered_vectors).
    Static shapes: negatives are sampled for every position; only masked
    positions contribute to the mean.

    ``negatives_impl='all'`` skips the sampling entirely: full-softmax
    InfoNCE over every in-utterance candidate (self = the positive;
    candidates whose quantized target equals the positive's are masked,
    exactly like the sampled path's same-target mask). Gather-free — the
    sampled path's two (B,T,K)-from-(B,T,T) gathers plus the backward
    scatter measured ~31 ms of the ~150 ms step (21%) on chip — and a
    strictly larger negative set (w2v-BERT-style full softmax). `rng` and
    `num_negatives` are ignored.
    """
    b, t, d = context.shape
    k = num_negatives

    if negatives_impl == "all":
        ctx_n = context / (jnp.linalg.norm(context, axis=-1, keepdims=True)
                           + 1e-8)
        tgt_n = target / (jnp.linalg.norm(target, axis=-1, keepdims=True)
                          + 1e-8)
        cos_all = jnp.einsum("btd,bsd->bts", ctx_n, tgt_n)      # (B, T, T)
        tgt_sim = jax.lax.stop_gradient(
            jnp.einsum("btd,bsd->bts", tgt_n, tgt_n))
        eye = jnp.eye(t, dtype=bool)[None]
        # Mask same-quantized-target candidates (they are indistinguishable
        # from the positive) — but never the positive itself.
        same = (tgt_sim > 1.0 - 1e-5) & ~eye
        logits = jnp.where(same, -jnp.inf, cos_all / temperature)
        # -logp[t, t] without a btt->bt diagonal extraction (a strided
        # gather whose gradient is a scatter into (B,T,T)): the positive
        # logit is the direct row dot, and the normalizer is a plain
        # reduction.
        pos = jnp.einsum("btd,btd->bt", ctx_n, tgt_n) / temperature
        losses = jax.nn.logsumexp(logits, axis=-1) - pos
        m = mask_time_indices.astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(m), 1.0)
        loss = jnp.sum(losses * m) / denom
        acc = jnp.sum(
            (jnp.argmax(logits, axis=-1) == jnp.arange(t)[None]) * m) / denom
        return loss, acc
    if negatives_impl != "sampled":
        raise ValueError(f"unknown negatives_impl: {negatives_impl!r}")

    # Sample negative indices != own position.
    neg_rng = jax.random.split(rng, b)

    def sample_neg(r):
        raw = jax.random.randint(r, (t, k), 0, t - 1)
        own = jnp.arange(t)[:, None]
        return raw + (raw >= own)  # skip self

    neg_idx = jax.vmap(sample_neg)(neg_rng)            # (B, T, K)

    ctx_n = context / (jnp.linalg.norm(context, axis=-1, keepdims=True)
                       + 1e-8)
    tgt_n = target / (jnp.linalg.norm(target, axis=-1, keepdims=True) + 1e-8)
    # All-pairs cosine, one matmul: cos_all[b, i, j] = cos(ctx_i, tgt_j).
    cos_all = jnp.einsum("btd,bsd->bts", ctx_n, tgt_n)  # (B, T, T)
    pos = jnp.einsum("btd,btd->bt", ctx_n, tgt_n)
    neg = jnp.take_along_axis(cos_all, neg_idx, axis=2)  # (B, T, K) scalars
    logits = jnp.concatenate([pos[:, :, None], neg], axis=2) / temperature

    # Mask out negatives identical to the positive (same quantized vector
    # -> unit cosine on the target-target similarity; replaces the
    # (B, T, K, D) elementwise vector compare).
    tgt_sim = jax.lax.stop_gradient(jnp.einsum("btd,bsd->bts", tgt_n, tgt_n))
    same_neg = jnp.take_along_axis(tgt_sim, neg_idx, axis=2) > 1.0 - 1e-5
    same = jnp.concatenate([jnp.zeros((b, t, 1), bool), same_neg], axis=2)
    logits = jnp.where(same, -jnp.inf, logits)

    logp = jax.nn.log_softmax(logits, axis=-1)
    losses = -logp[..., 0]
    m = mask_time_indices.astype(jnp.float32)
    loss = jnp.sum(losses * m) / jnp.maximum(jnp.sum(m), 1.0)
    acc = jnp.sum((jnp.argmax(logits, axis=-1) == 0) * m) / jnp.maximum(
        jnp.sum(m), 1.0)
    return loss, acc
