"""Shared one-process pretrain-sweep harness (tools/sweep_pretrain*.py).

Runs several (batch, remat) configs in a single TPU process so the ~2.5 min
tunnel handshake is paid once. OOMs/compile failures are caught and reported
as JSON error lines; winners are copied into tools/sweep_results.jsonl by
hand. Parameterized by state-init and step-factory callables so the wav2vec2
and BYOL sweeps cannot drift apart.
"""
from __future__ import annotations

import json
import os
import time


def setup_jax():
    """Compilation cache + rbg PRNG, then return the jax module."""
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/conformer_tpu_jax_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    jax.config.update("jax_default_prng_impl", "rbg")
    return jax


def run_sweep(configs, init_state, make_step, step_extras=None,
              audio_s: float = 8.0, steps: int = 20) -> None:
    """For each (batch, remat) in ``configs``: time ``steps`` train steps of
    the objective defined by ``init_state(cfg, rng, tx, mel_frames)`` and
    ``make_step(cfg, tx)``; ``step_extras(cfg)`` supplies trailing step-fn
    args (e.g. the gumbel temperature). One JSON line per config.
    """
    jax = setup_jax()
    import numpy as np

    from conformer_tpu.config import Config
    from conformer_tpu.train.state import make_optimizer

    def run_one(batch_size: int, remat: bool) -> None:
        cfg = Config().override(**{
            "model.use_remat": remat,
            "model.use_scan_layers": True,
            "model.attention_impl": "pallas",
            "model.attention_score_dtype": "bfloat16",
        })
        num_samples = int(audio_s * cfg.audio.sample_rate)
        mel_frames = num_samples // 160 + 1
        tx = make_optimizer(cfg.optim, steps_per_epoch=1000)
        rng = jax.random.PRNGKey(0)
        audio = jax.device_put(
            jax.random.normal(rng, (batch_size, num_samples), np.float32) * 0.1)
        lengths = jax.device_put(np.full((batch_size,), num_samples, np.int32))
        state = jax.device_put(init_state(cfg, rng, tx, mel_frames=mel_frames))
        step_fn = make_step(cfg, tx)
        extras = tuple(step_extras(cfg)) if step_extras else ()
        for _ in range(2):
            state, metrics = step_fn(state, audio, lengths,
                                     jax.random.PRNGKey(1), *extras)
        jax.block_until_ready(metrics["loss"])
        t0 = time.perf_counter()
        for i in range(steps):
            state, metrics = step_fn(state, audio, lengths,
                                     jax.random.PRNGKey(2 + i), *extras)
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0
        tput = batch_size * audio_s * steps / dt
        print(json.dumps({"batch": batch_size, "remat": remat,
                          "throughput": round(tput, 2)}), flush=True)
        del state, audio, lengths

    for batch_size, remat in configs:
        try:
            run_one(batch_size, remat)
        except Exception as e:  # OOM or compile failure: report, continue
            msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
            print(json.dumps({"batch": batch_size, "remat": remat,
                              "error": msg}), flush=True)
