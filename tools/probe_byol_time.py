"""On-chip probe for the suspicious r4 BYOL throughput (8885 audio-s/s at
b32 would be 2.9x the v5e bf16 peak for the program's analytic FLOPs —
tools/probe_byol_flops.py shows no dead-code elimination, so either the
device is not what we assume or the bench timing has a hole for this mode).

Times the BYOL step three ways (loss-only block, whole-state block,
per-step sync) plus each tower standalone, and prints the device kind.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/conformer_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    jax.config.update("jax_default_prng_impl", "rbg")
    dev = jax.devices()[0]
    print(f"device: platform={dev.platform} kind={dev.device_kind}")

    from conformer_tpu.config import Config
    from conformer_tpu.models.byol import BYOLNet
    from conformer_tpu.train.pretrain import (_compute_dtype,
                                              init_byol_state,
                                              make_byol_step)
    from conformer_tpu.train.state import make_optimizer

    batch = int(os.environ.get("BENCH_BATCH", "32"))
    audio_s = 8.0
    n = int(audio_s * 16000)
    mel_frames = n // 160 + 1
    cfg = Config().override(**{
        "model.use_remat": False,
        "model.use_scan_layers": False,
        "model.attention_score_dtype": "bfloat16",
    })
    tx = make_optimizer(cfg.optim, steps_per_epoch=1000)
    rng = jax.random.PRNGKey(0)
    audio = jax.device_put(
        jax.random.normal(rng, (batch, n), np.float32) * 0.1)
    lengths = jax.device_put(np.full((batch,), n, np.int32))

    state = init_byol_state(cfg, rng, tx, mel_frames=mel_frames)
    step_fn = make_byol_step(cfg, tx)
    state = jax.device_put(state)
    for i in range(2):
        state, metrics = step_fn(state, audio, lengths, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics["loss"])
    print(f"warmup loss: {float(metrics['loss']):.4f}")

    steps = 10
    # (a) block on loss only (bench.py behavior)
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step_fn(state, audio, lengths,
                                 jax.random.PRNGKey(2 + i))
    jax.block_until_ready(metrics["loss"])
    dt_loss = (time.perf_counter() - t0) / steps
    # (b) block on the WHOLE new state
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step_fn(state, audio, lengths,
                                 jax.random.PRNGKey(20 + i))
    jax.block_until_ready(state)
    dt_state = (time.perf_counter() - t0) / steps
    # (c) per-step full sync
    t0 = time.perf_counter()
    for i in range(steps):
        state, metrics = step_fn(state, audio, lengths,
                                 jax.random.PRNGKey(40 + i))
        jax.block_until_ready(state)
    dt_sync = (time.perf_counter() - t0) / steps
    print(f"loss-only block: {dt_loss*1e3:.1f} ms/step "
          f"({batch*audio_s/dt_loss:.0f} audio-s/s)")
    print(f"state block:     {dt_state*1e3:.1f} ms/step "
          f"({batch*audio_s/dt_state:.0f} audio-s/s)")
    print(f"per-step sync:   {dt_sync*1e3:.1f} ms/step "
          f"({batch*audio_s/dt_sync:.0f} audio-s/s)")
    print(f"loss after: {float(metrics['loss']):.4f}")

    # Tower timings, standalone.
    online = BYOLNet(cfg.model, cfg.pretrain, with_predictor=True,
                     dtype=_compute_dtype(cfg), deterministic=False)
    target = BYOLNet(cfg.model, cfg.pretrain, with_predictor=False,
                     dtype=_compute_dtype(cfg), deterministic=True)
    mels = jnp.zeros((2 * batch, mel_frames, cfg.model.n_mel_channels),
                     jnp.float32)
    ml = jnp.full((2 * batch,), mel_frames, jnp.int32)

    @jax.jit
    def tgt_fwd(p, bs, mels, ml):
        (out, _), _ = target.apply({"params": p, "batch_stats": bs},
                                   mels, ml, mutable=[])
        return out

    @jax.jit
    def online_grad(p, bs, mels, ml, r):
        def f(p):
            (out, _), _ = online.apply(
                {"params": p, "batch_stats": bs}, mels, ml,
                mutable=["batch_stats"], rngs={"dropout": r})
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jax.grad(f)(p)

    o = tgt_fwd(state.target_params, state.target_batch_stats, mels, ml)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(steps):
        o = tgt_fwd(state.target_params, state.target_batch_stats, mels, ml)
    jax.block_until_ready(o)
    print(f"target fwd (2B rows): {(time.perf_counter()-t0)/steps*1e3:.1f} ms")

    g = online_grad(state.params, state.batch_stats, mels, ml,
                    jax.random.PRNGKey(7))
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(steps):
        g = online_grad(state.params, state.batch_stats, mels, ml,
                        jax.random.PRNGKey(7))
    jax.block_until_ready(g)
    print(f"online fwd+bwd (2B rows): "
          f"{(time.perf_counter()-t0)/steps*1e3:.1f} ms")


if __name__ == "__main__":
    main()
