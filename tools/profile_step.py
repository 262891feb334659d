"""Component-level timing of the train step on the current backend.

Times (jit-compiled, after warmup): mel frontend, SpecAugment, encoder fwd,
decoder fwd, CTC loss, full fwd, full train step — to direct Pallas kernel
work at the actual bottlenecks.

    python tools/profile_step.py [--batch 16] [--audio-s 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, n=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--audio-s", type=float, default=8.0)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/conformer_tpu_jax_cache")
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_PRNG", "rbg"))
    import jax.numpy as jnp

    from conformer_tpu.audio.augment import spec_augment
    from conformer_tpu.audio.mel import MelFrontend
    from conformer_tpu.config import Config
    from conformer_tpu.models.conformer import Conformer
    from conformer_tpu.models.decoder import LSTMDecoder
    from conformer_tpu.models.encoder import ConformerEncoder
    from conformer_tpu.ops.ctc import ctc_loss
    from conformer_tpu.train.state import TrainState, make_optimizer
    from conformer_tpu.train.steps import init_variables, make_train_step

    cfg = Config()
    cfg = cfg.override(**{
        "model.use_remat": os.environ.get("BENCH_REMAT", "0") == "1",
        "model.attention_impl": os.environ.get("BENCH_ATTN", "xla"),
        "model.attention_score_dtype": os.environ.get("BENCH_SCORE",
                                                      "bfloat16"),
        "model.conv_impl": os.environ.get("BENCH_CONV", "xla")})
    sr = cfg.audio.sample_rate
    num_samples = int(args.audio_s * sr)
    b = args.batch
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (b, num_samples)) * 0.1
    audio_lengths = jnp.full((b,), num_samples, jnp.int32)
    tokens = jax.random.randint(rng, (b, 128), 1, cfg.model.vocab_size)
    token_lengths = jnp.full((b,), 128, jnp.int32)

    frontend = MelFrontend(cfg.audio)
    mel_fn = jax.jit(lambda a: frontend(a))
    t_mel = timeit(mel_fn, audio)
    mels = mel_fn(audio)
    mel_lengths = frontend.frame_lengths(audio_lengths)
    print(f"mel frontend:      {t_mel*1e3:8.2f} ms   {mels.shape}")

    aug_fn = jax.jit(lambda r, m: spec_augment(r, m, cfg.augment))
    t_aug = timeit(aug_fn, rng, mels)
    print(f"spec_augment:      {t_aug*1e3:8.2f} ms")

    dtype = cfg.optim.compute_dtype
    enc = ConformerEncoder(cfg.model, dtype=jnp.bfloat16 if dtype == "bfloat16"
                           else jnp.float32, deterministic=True)
    enc_vars = enc.init(rng, mels, mel_lengths)
    enc_fn = jax.jit(lambda v, m, l: enc.apply(v, m, l, mutable=[])[0][0])
    t_enc = timeit(enc_fn, enc_vars, mels, mel_lengths)
    enc_out = enc_fn(enc_vars, mels, mel_lengths)
    print(f"encoder fwd:       {t_enc*1e3:8.2f} ms   {enc_out.shape}")

    enc_gd = jax.jit(jax.grad(lambda v, m, l: jnp.sum(
        enc.apply(v, m, l, mutable=[])[0][0].astype(jnp.float32))))
    t_encb = timeit(enc_gd, enc_vars, mels, mel_lengths)
    print(f"encoder fwd+bwd:   {t_encb*1e3:8.2f} ms")

    dec = LSTMDecoder(cfg.model.vocab_size, cfg.model.lstm_hidden_dim,
                      cfg.model.n_lstm_layers,
                      dtype=jnp.bfloat16 if dtype == "bfloat16" else jnp.float32,
                      deterministic=True)
    dec_vars = dec.init(rng, enc_out.astype(jnp.float32))
    dec_fn = jax.jit(lambda v, x: dec.apply(v, x, mutable=[])[0])
    t_dec = timeit(dec_fn, dec_vars, enc_out)
    logits = dec_fn(dec_vars, enc_out)
    print(f"decoder fwd:       {t_dec*1e3:8.2f} ms   {logits.shape}")

    dec_gd = jax.jit(jax.grad(lambda v, x: jnp.sum(
        dec.apply(v, x, mutable=[])[0].astype(jnp.float32))))
    t_decb = timeit(dec_gd, dec_vars, enc_out)
    print(f"decoder fwd+bwd:   {t_decb*1e3:8.2f} ms")

    from conformer_tpu.utils.masking import subsampled_length
    out_lengths = subsampled_length(mel_lengths)
    loss_fn = jax.jit(lambda lg: ctc_loss(lg, out_lengths, tokens,
                                          token_lengths))
    t_loss = timeit(loss_fn, logits.astype(jnp.float32))
    print(f"ctc loss:          {t_loss*1e3:8.2f} ms")
    loss_gd = jax.jit(jax.grad(lambda lg: ctc_loss(
        lg, out_lengths, tokens, token_lengths)))
    t_lossb = timeit(loss_gd, logits.astype(jnp.float32))
    print(f"ctc fwd+bwd:       {t_lossb*1e3:8.2f} ms")

    tx = make_optimizer(cfg.optim, steps_per_epoch=1000)
    variables = init_variables(cfg, rng, mel_frames=num_samples // 160 + 1)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    step_fn = make_train_step(cfg, tx, donate=False)
    t_step = timeit(lambda s: step_fn(s, audio, audio_lengths, tokens,
                                      token_lengths, rng)[1]["loss"], state, n=5)
    print(f"full train step:   {t_step*1e3:8.2f} ms")
    print(f"-> {b * args.audio_s / t_step:.0f} audio-s/s")


if __name__ == "__main__":
    main()
