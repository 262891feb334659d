"""Jitted train/eval steps: audio -> mel -> SpecAugment -> model -> CTC.

The whole hot path (reference: train.py:226-243) is ONE XLA program per bucket
shape: featurization, augmentation, forward, loss, backward, and optimizer
update all fuse under jit; the only host<->device traffic is the input batch
and the scalar loss. Gradients across the data axis and BatchNorm statistics
are globally correct under GSPMD without explicit collectives (the reference
needed DDP allreduce + local BN).

Mixed precision: bf16 compute / fp32 params & CTC loss — the TPU-native
analogue of the reference's fp16 AMP + fp32 loss island
(reference: train.py:232-243, evaluation.py:12-16). No GradScaler is needed:
bf16 has fp32's exponent range.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from conformer_tpu.audio.augment import spec_augment
from conformer_tpu.audio.mel import MelFrontend
from conformer_tpu.config import Config
from conformer_tpu.models.conformer import Conformer
from conformer_tpu.ops.ctc import ctc_loss, greedy_decode
from conformer_tpu.train.state import TrainState


def build_models(cfg: Config) -> Tuple[Conformer, Conformer]:
    """(train_model, eval_model) sharing one parameter structure."""
    train_model = Conformer(cfg.model, compute_dtype=cfg.optim.compute_dtype,
                            deterministic=False)
    eval_model = Conformer(cfg.model, compute_dtype=cfg.optim.compute_dtype,
                           deterministic=True)
    return train_model, eval_model


def init_variables(cfg: Config, rng: jax.Array, mel_frames: int = 256):
    """Initialize params/batch_stats with a dummy batch (shape-only)."""
    mels = jnp.zeros((1, mel_frames, cfg.model.n_mel_channels), jnp.float32)
    lengths = jnp.full((1,), mel_frames, jnp.int32)
    if getattr(cfg.model, "arch", "ctc") == "transducer":
        from conformer_tpu.models.transducer import Transducer

        model = Transducer(cfg.model, compute_dtype=cfg.optim.compute_dtype,
                           deterministic=True)
        labels = jnp.zeros((1, 4), jnp.int32)
        return model.init({"params": rng}, mels, lengths, labels)
    model = Conformer(cfg.model, compute_dtype=cfg.optim.compute_dtype,
                      deterministic=True)
    return model.init({"params": rng}, mels, lengths)


def make_train_step(cfg: Config, tx: optax.GradientTransformation,
                    frontend: Optional[MelFrontend] = None,
                    donate: bool = True) -> Callable:
    """-> jitted step(state, audio, audio_lengths, tokens, token_lengths, rng)
    -> (state, metrics dict). Dispatches on cfg.model.arch."""
    if getattr(cfg.model, "arch", "ctc") == "transducer":
        return make_transducer_train_step(cfg, tx, frontend, donate)
    frontend = frontend or MelFrontend(cfg.audio)
    model, _ = build_models(cfg)

    accum = max(cfg.optim.accum_steps, 1)

    def step(state: TrainState, audio, audio_lengths, tokens, token_lengths, rng):
        mels = frontend(audio)
        mel_lengths = frontend.frame_lengths(audio_lengths)
        aug_rng, dropout_rng = jax.random.split(jax.random.fold_in(rng, state.step))
        mels = spec_augment(aug_rng, mels, cfg.augment, mel_lengths)

        def loss_fn(params, batch_stats, mb):
            (logits, out_lengths), updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                mb["mels"], mb["mel_lengths"], mutable=["batch_stats"],
                rngs={"dropout": mb["rng"]})
            # Dummy remainder-padding rows carry empty transcripts
            # (token_length 0); exclude them from the loss mean.
            loss = ctc_loss(logits, out_lengths, mb["tokens"],
                            mb["token_lengths"],
                            row_mask=mb["token_lengths"] > 0)
            return loss, updates["batch_stats"]

        if accum == 1:
            mb = {"mels": mels, "mel_lengths": mel_lengths, "tokens": tokens,
                  "token_lengths": token_lengths, "rng": dropout_rng}
            (loss, new_stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, state.batch_stats, mb)
        else:
            # Micro-batch accumulation: scan over batch splits, averaging
            # gradients; batch stats thread through sequentially.
            def split(x):
                b = x.shape[0]
                return x.reshape(accum, b // accum, *x.shape[1:])

            micro = {"mels": split(mels), "mel_lengths": split(mel_lengths),
                     "tokens": split(tokens),
                     "token_lengths": split(token_lengths),
                     "rng": jax.random.split(dropout_rng, accum)}

            def acc_step(carry, mb):
                grads_acc, loss_acc, batch_stats = carry
                (loss, new_bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params, batch_stats, mb)
                grads_acc = jax.tree_util.tree_map(jnp.add, grads_acc, grads)
                return (grads_acc, loss_acc + loss, new_bs), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (grads, loss_sum, new_stats), _ = jax.lax.scan(
                acc_step, (zero_grads, jnp.zeros(()), state.batch_stats), micro)
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            loss = loss_sum / accum

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
            "audio_seconds": jnp.sum(audio_lengths) / cfg.audio.sample_rate,
        }
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_transducer_train_step(cfg: Config, tx: optax.GradientTransformation,
                               frontend: Optional[MelFrontend] = None,
                               donate: bool = True) -> Callable:
    """RNN-T train step: audio -> mel -> SpecAugment -> Transducer lattice ->
    rnnt loss -> Adam, one fused XLA program (models/transducer.py,
    ops/rnnt.py). Same TrainState/checkpoint machinery as the CTC path.
    The reference has no working counterpart (its Transducer is a dead
    stub, model/modules/transducer.py:4-9)."""
    from conformer_tpu.models.transducer import Transducer
    from conformer_tpu.ops.rnnt import rnnt_loss_from_logits, rnnt_loss_scan

    frontend = frontend or MelFrontend(cfg.audio)
    model = Transducer(cfg.model, compute_dtype=cfg.optim.compute_dtype,
                       deterministic=False)
    loss_impl = getattr(cfg.model, "rnnt_loss_impl", "scan")
    if loss_impl not in ("scan", "lattice"):
        raise ValueError(f"rnnt_loss_impl must be scan|lattice, got {loss_impl!r}")

    def step(state: TrainState, audio, audio_lengths, tokens, token_lengths,
             rng):
        mels = frontend(audio)
        mel_lengths = frontend.frame_lengths(audio_lengths)
        aug_rng, dropout_rng = jax.random.split(
            jax.random.fold_in(rng, state.step))
        mels = spec_augment(aug_rng, mels, cfg.augment, mel_lengths)

        def loss_fn(params, batch_stats):
            variables = {"params": params, "batch_stats": batch_stats}
            if loss_impl == "scan":
                # Lattice-free: additive joint factors + frame scan — the
                # (B,T,U+1,V) lattice never materializes (ops/rnnt.py).
                ((e, p), enc_lengths), updates = model.apply(
                    variables, mels, mel_lengths, tokens,
                    method=Transducer.forward_factors,
                    mutable=["batch_stats"], rngs={"dropout": dropout_rng})
                out = params["joint"]["out"]
                loss = rnnt_loss_scan(e, p, out["kernel"], out["bias"],
                                      tokens, enc_lengths, token_lengths,
                                      row_mask=token_lengths > 0)
            else:
                (lattice, enc_lengths), updates = model.apply(
                    variables, mels, mel_lengths, tokens,
                    mutable=["batch_stats"], rngs={"dropout": dropout_rng})
                loss = rnnt_loss_from_logits(lattice, tokens, enc_lengths,
                                             token_lengths,
                                             row_mask=token_lengths > 0)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_stats, opt_state=new_opt)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads),
                   "audio_seconds": jnp.sum(audio_lengths)
                   / cfg.audio.sample_rate}
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_transducer_eval_step(cfg: Config,
                              frontend: Optional[MelFrontend] = None,
                              decode: str = "greedy",
                              unk_id: Optional[int] = None,
                              lm_kwargs: Optional[dict] = None) -> Callable:
    """RNN-T eval: loss + on-device decode, one jitted program; output keys
    match the CTC eval step's contract (loss/tokens/counts/lengths) so
    Trainer.validate and InferencePipeline work unchanged.

    decode='greedy' runs the frame-synchronous greedy decode;
    decode='beam' runs the device RNN-T beam search (ops/rnnt.py::
    rnnt_beam_search) at cfg.decode.beam_width, with optional token-level
    n-gram LM shallow fusion via `lm_kwargs` (the DeviceNgramTable kwargs,
    see decode/pipeline.py) — the best beam comes back through the same
    tokens/counts keys."""
    from conformer_tpu.models.transducer import Transducer
    from conformer_tpu.ops.rnnt import (rnnt_beam_search_sharded,
                                        rnnt_greedy_decode, rnnt_loss_scan)

    if decode not in ("greedy", "beam"):
        raise ValueError(f"transducer decode must be greedy|beam, got {decode!r}")
    frontend = frontend or MelFrontend(cfg.audio)
    model = Transducer(cfg.model, compute_dtype=cfg.optim.compute_dtype,
                       deterministic=True)

    def step(state: TrainState, audio, audio_lengths, tokens, token_lengths):
        mels = frontend(audio)
        mel_lengths = frontend.frame_lengths(audio_lengths)
        bound = model.bind({"params": state.params,
                            "batch_stats": state.batch_stats})
        enc, enc_lengths = bound.encode(mels, mel_lengths)
        pred = bound.prediction(tokens)
        e, p = bound.joint.factors(enc, pred)
        out = state.params["joint"]["out"]
        loss = rnnt_loss_scan(e, p, out["kernel"], out["bias"], tokens,
                              enc_lengths, token_lengths,
                              row_mask=token_lengths > 0)
        if decode == "beam":
            # Sharded wrapper: under an active mesh the batch shards over
            # 'data' and the LM table over 'model' (psum-combined probes);
            # falls back to the single-device search otherwise.
            prefixes, plens, scores = rnnt_beam_search_sharded(
                bound.joint_logits, enc, enc_lengths, bound.predict_step,
                bound.predict_init(enc.shape[0]),
                beam_width=cfg.decode.beam_width,
                top_k=cfg.decode.rnnt_top_k,
                max_symbols=cfg.decode.rnnt_max_symbols,
                max_len=cfg.data.max_tokens, unk_id=unk_id,
                length_norm=cfg.decode.rnnt_length_norm,
                scan_unroll=cfg.decode.device_scan_unroll,
                **(lm_kwargs or {}))
            return {"loss": loss, "tokens": prefixes[:, 0],
                    "counts": plens[:, 0], "scores": scores[:, 0],
                    "lengths": enc_lengths}
        buf, counts = rnnt_greedy_decode(
            bound.joint_logits, enc, enc_lengths, bound.predict_step,
            bound.predict_init(enc.shape[0]),
            max_symbols=cfg.decode.rnnt_max_symbols,
            max_len=cfg.data.max_tokens)
        return {"loss": loss, "tokens": buf, "counts": counts,
                "lengths": enc_lengths}

    return jax.jit(step)


def make_eval_step(cfg: Config, frontend: Optional[MelFrontend] = None,
                   unk_id: Optional[int] = None) -> Callable:
    """-> jitted step(state, audio, audio_lengths, tokens, token_lengths) ->
    metrics + collapsed greedy tokens (device-side; text assembly on host).
    Dispatches on cfg.model.arch."""
    if getattr(cfg.model, "arch", "ctc") == "transducer":
        return make_transducer_eval_step(cfg, frontend)
    frontend = frontend or MelFrontend(cfg.audio)
    _, model = build_models(cfg)

    def step(state: TrainState, audio, audio_lengths, tokens, token_lengths):
        mels = frontend(audio)
        mel_lengths = frontend.frame_lengths(audio_lengths)
        (logits, out_lengths), _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            mels, mel_lengths, mutable=[])
        loss = ctc_loss(logits, out_lengths, tokens, token_lengths,
                        row_mask=token_lengths > 0)
        packed, counts = greedy_decode(logits, out_lengths, unk_id=unk_id)
        return {"loss": loss, "tokens": packed, "counts": counts,
                "log_probs": jax.nn.log_softmax(logits, axis=-1),
                "lengths": out_lengths}

    return jax.jit(step)


def make_forward(cfg: Config, frontend: Optional[MelFrontend] = None) -> Callable:
    """Plain jittable forward (audio -> logits, lengths) for export/serving."""
    frontend = frontend or MelFrontend(cfg.audio)
    _, model = build_models(cfg)

    def forward(variables, audio, audio_lengths):
        mels = frontend(audio)
        mel_lengths = frontend.frame_lengths(audio_lengths)
        (logits, out_lengths), _ = model.apply(variables, mels, mel_lengths,
                                               mutable=[])
        return logits, out_lengths

    return forward
