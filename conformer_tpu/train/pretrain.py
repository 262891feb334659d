"""Pretraining steps (wav2vec2 contrastive / BYOL) + encoder weight transfer.

Completes the reference's unfinished self-supervised story: its wav2vec2 model
cannot run and has no loss or entry script (reference: model/wav2vec2.py;
README.md:28,50 advertise pretrain.py/byol.py that do not exist). Both methods
here train the same ConformerEncoder parameter structure the CTC model uses,
so `transfer_encoder` drops pretrained weights straight into supervised
training.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from conformer_tpu.audio.augment import spec_augment
from conformer_tpu.audio.mel import MelFrontend
from conformer_tpu.config import Config
from conformer_tpu.models.byol import BYOLNet, byol_loss, ema_update
from conformer_tpu.models.wav2vec2 import (Wav2Vec2Pretrain, contrastive_loss,
                                           sample_mask_spans)
from conformer_tpu.train.state import TrainState
from conformer_tpu.utils.masking import padding_mask, subsampled_length


def _compute_dtype(cfg: Config) -> jnp.dtype:
    """Pretraining honors optim.compute_dtype like the supervised step does
    (bf16 encoder compute, fp32 params; losses are computed in fp32 — both
    models cast their outputs up before returning)."""
    return jnp.bfloat16 if cfg.optim.compute_dtype == "bfloat16" \
        else jnp.float32


# ---------------------------------------------------------------------------
# wav2vec2
# ---------------------------------------------------------------------------

def make_wav2vec2_step(cfg: Config, tx: optax.GradientTransformation,
                       frontend: Optional[MelFrontend] = None,
                       donate: bool = True) -> Callable:
    """-> jitted step(state, audio, audio_lengths, rng, temperature)
    -> (state, metrics)."""
    frontend = frontend or MelFrontend(cfg.audio)
    pre = cfg.pretrain
    model = Wav2Vec2Pretrain(cfg.model, pre, dtype=_compute_dtype(cfg),
                             deterministic=False)

    def step(state: TrainState, audio, audio_lengths, rng, temperature):
        mels = frontend(audio)
        mel_lengths = frontend.frame_lengths(audio_lengths)
        out_lengths = subsampled_length(mel_lengths)
        t_sub = subsampled_length(mels.shape[1])
        rng = jax.random.fold_in(rng, state.step)
        mask_rng, gumbel_rng, neg_rng, dropout_rng = jax.random.split(rng, 4)

        valid = padding_mask(out_lengths, t_sub)
        mask_idx = sample_mask_spans(mask_rng, mels.shape[0], t_sub,
                                     pre.mask_prob, pre.mask_span, valid)

        def loss_fn(params):
            (context, target, perplexity), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                mels, mel_lengths, mask_idx, temperature,
                mutable=["batch_stats"],
                rngs={"dropout": dropout_rng, "gumbel": gumbel_rng})
            c_loss, acc = contrastive_loss(
                context, target, mask_idx, neg_rng,
                num_negatives=pre.num_negatives,
                temperature=pre.contrastive_temperature,
                negatives_impl=getattr(pre, "negatives_impl", "sampled"))
            gv = pre.num_groups * pre.num_vars
            d_loss = (gv - perplexity) / gv
            loss = c_loss + pre.diversity_weight * d_loss
            return loss, (updates["batch_stats"], c_loss, d_loss, acc,
                          perplexity)

        (loss, (new_stats, c_loss, d_loss, acc, ppl)), grads = \
            jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        return new_state, {"loss": loss, "contrastive": c_loss,
                           "diversity": d_loss, "accuracy": acc,
                           "perplexity": ppl}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def gumbel_temperature_at(cfg: Config, step: int) -> float:
    pre = cfg.pretrain
    return max(pre.min_temperature,
               pre.gumbel_temperature * pre.temperature_decay ** step)


# ---------------------------------------------------------------------------
# BYOL
# ---------------------------------------------------------------------------

@flax.struct.dataclass
class BYOLState:
    step: jnp.ndarray
    params: Any            # online tower (encoder + projector + predictor)
    target_params: Any     # EMA tower (encoder + projector)
    batch_stats: Any
    target_batch_stats: Any
    opt_state: Any


def make_byol_step(cfg: Config, tx: optax.GradientTransformation,
                   frontend: Optional[MelFrontend] = None,
                   donate: bool = True) -> Callable:
    frontend = frontend or MelFrontend(cfg.audio)
    pre = cfg.pretrain
    online = BYOLNet(cfg.model, pre, with_predictor=True,
                     dtype=_compute_dtype(cfg), deterministic=False)
    target = BYOLNet(cfg.model, pre, with_predictor=False,
                     dtype=_compute_dtype(cfg), deterministic=True)

    def step(state: BYOLState, audio, audio_lengths, rng):
        mels = frontend(audio)
        mel_lengths = frontend.frame_lengths(audio_lengths)
        rng = jax.random.fold_in(rng, state.step)
        r1, r2, d1 = jax.random.split(rng, 3)
        view1 = spec_augment(r1, mels, cfg.augment, mel_lengths)
        view2 = spec_augment(r2, mels, cfg.augment, mel_lengths)
        # Both views ride ONE 2B-row pass per tower: the encoder is
        # view-agnostic, so stacking views along batch halves the number of
        # encoder programs (4 -> 2 per step) and runs each at double batch,
        # where the MXU tiles fill better (measured: see docs/PERFORMANCE.md
        # BYOL row). BatchNorm then normalizes over the combined 2B batch —
        # the symmetric choice (both views see identical statistics).
        views = jnp.concatenate([view1, view2], axis=0)
        lengths2 = jnp.concatenate([mel_lengths, mel_lengths], axis=0)
        b = mels.shape[0]

        # Target embeddings of both views (stop-gradient, EMA weights).
        (tgt, out_lengths2), _ = target.apply(
            {"params": state.target_params,
             "batch_stats": state.target_batch_stats}, views, lengths2,
            mutable=[])
        tgt = jax.lax.stop_gradient(tgt)
        tgt1, tgt2 = tgt[:b], tgt[b:]
        frame_mask = padding_mask(out_lengths2[:b], tgt1.shape[1])

        def loss_fn(params):
            (p, _), updates = online.apply(
                {"params": params, "batch_stats": state.batch_stats},
                views, lengths2, mutable=["batch_stats"],
                rngs={"dropout": d1})
            # Cross-view regression: predict each view's target from the
            # OTHER view's online embedding (symmetric BYOL loss).
            loss = 0.5 * (byol_loss(p[:b], tgt2, frame_mask)
                          + byol_loss(p[b:], tgt1, frame_mask))
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        # EMA the shared substructure (encoder + projector).
        new_target = ema_update(
            state.target_params,
            {k: new_params[k] for k in state.target_params},
            pre.ema_decay)
        new_state = BYOLState(
            step=state.step + 1, params=new_params, target_params=new_target,
            batch_stats=new_stats,
            target_batch_stats=state.target_batch_stats,
            opt_state=new_opt)
        return new_state, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def init_byol_state(cfg: Config, rng: jax.Array,
                    tx: optax.GradientTransformation,
                    mel_frames: int = 256) -> BYOLState:
    online = BYOLNet(cfg.model, cfg.pretrain, with_predictor=True,
                     dtype=_compute_dtype(cfg),
                     deterministic=True)
    mels = jnp.zeros((1, mel_frames, cfg.model.n_mel_channels))
    lengths = jnp.full((1,), mel_frames, jnp.int32)
    variables = online.init({"params": rng}, mels, lengths)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # Deep copies: the online and target trees must not alias device buffers
    # (the donated train step would otherwise donate the same buffer twice).
    target_params = jax.tree_util.tree_map(
        jnp.array, {k: params[k] for k in params if k != "predictor"})
    target_stats = jax.tree_util.tree_map(jnp.array, batch_stats)
    return BYOLState(step=jnp.zeros((), jnp.int32), params=params,
                     target_params=target_params, batch_stats=batch_stats,
                     target_batch_stats=target_stats,
                     opt_state=tx.init(params))


def init_wav2vec2_state(cfg: Config, rng: jax.Array,
                        tx: optax.GradientTransformation,
                        mel_frames: int = 256) -> TrainState:
    model = Wav2Vec2Pretrain(cfg.model, cfg.pretrain,
                             dtype=_compute_dtype(cfg), deterministic=True)
    mels = jnp.zeros((1, mel_frames, cfg.model.n_mel_channels))
    lengths = jnp.full((1,), mel_frames, jnp.int32)
    t_sub = subsampled_length(mel_frames)
    mask = jnp.zeros((1, t_sub), bool)
    variables = model.init({"params": rng}, mels, lengths, mask)
    return TrainState.create(variables["params"],
                             variables.get("batch_stats", {}), tx)


# ---------------------------------------------------------------------------
# Weight transfer into the supervised model
# ---------------------------------------------------------------------------

def load_pretrained_params(cfg: Config, directory: str,
                           method: str = "wav2vec2") -> Dict:
    """Restore the param tree of a pretrain checkpoint (online tower for
    BYOL) for `transfer_encoder`. The checkpoint structure is derived
    abstractly from the same config, so nothing is materialized twice."""
    from conformer_tpu.train.checkpoint import CheckpointManager
    from conformer_tpu.train.state import make_optimizer

    tx = make_optimizer(cfg.optim, steps_per_epoch=1)  # structure only
    init = init_byol_state if method == "byol" else init_wav2vec2_state
    abstract = jax.eval_shape(
        lambda rng: init(cfg, rng, tx), jax.random.PRNGKey(0))
    state, _ = CheckpointManager(directory).restore(abstract)
    return state.params


def transfer_encoder(pretrained_params: Dict, ctc_params: Dict,
                     method: str = "wav2vec2") -> Dict:
    """Copy pretrained encoder weights into a supervised param tree.

    wav2vec2 tree: {subsample, input_proj, blocks|block_i, ...} at top level;
    BYOL tree: {encoder: {...}} (whole ConformerEncoder). The supervised
    tree is {encoder: {subsample, input_proj, blocks|block_i, ...}, ...} —
    both the CTC Conformer and the Transducer qualify (the RNN-T shares the
    same ConformerEncoder under the same 'encoder' key; its prediction/
    joint heads stay freshly initialized). Only matching names with
    matching shapes transfer; returns a new tree.
    """
    src = pretrained_params.get("encoder", pretrained_params) \
        if method == "byol" else pretrained_params
    out = flax.core.unfreeze(jax.tree_util.tree_map(lambda x: x, ctc_params))
    enc = out["encoder"]
    copied = []
    for key in list(enc.keys()):
        if key in src:
            src_leaves = jax.tree_util.tree_leaves(src[key])
            dst_leaves = jax.tree_util.tree_leaves(enc[key])
            if len(src_leaves) == len(dst_leaves) and all(
                    a.shape == b.shape for a, b in zip(src_leaves, dst_leaves)):
                enc[key] = src[key]
                copied.append(key)
    if not copied:
        raise ValueError("no encoder weights transferred — structure mismatch")
    return out
