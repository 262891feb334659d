"""One-process BYOL pretrain batch sweep (post bf16/remat/kernel-flag fix).

Same harness as tools/sweep_pretrain.py but for the BYOL objective (two
towers). Appends one JSON line per config to stdout.
"""
from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/conformer_tpu_jax_cache")

import jax
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
except Exception:
    pass
jax.config.update("jax_default_prng_impl", "rbg")

from conformer_tpu.config import Config
from conformer_tpu.train.state import make_optimizer
from conformer_tpu.train.pretrain import init_byol_state, make_byol_step

AUDIO_S = 8.0
STEPS = 20
CONFIGS = [  # (batch, remat)
    (32, True),
    (48, True),
    (64, True),
    (32, False),
]


def run_one(batch_size: int, remat: bool) -> None:
    cfg = Config().override(**{
        "model.use_remat": remat,
        "model.use_scan_layers": True,
        "model.attention_impl": "pallas",
        "model.attention_score_dtype": "bfloat16",
    })
    num_samples = int(AUDIO_S * cfg.audio.sample_rate)
    mel_frames = num_samples // 160 + 1
    tx = make_optimizer(cfg.optim, steps_per_epoch=1000)
    rng = jax.random.PRNGKey(0)
    audio = jax.device_put(
        jax.random.normal(rng, (batch_size, num_samples), np.float32) * 0.1)
    lengths = jax.device_put(np.full((batch_size,), num_samples, np.int32))
    state = init_byol_state(cfg, rng, tx, mel_frames=mel_frames)
    step_fn = make_byol_step(cfg, tx)
    state = jax.device_put(state)
    for _ in range(2):
        state, metrics = step_fn(state, audio, lengths, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step_fn(state, audio, lengths,
                                 jax.random.PRNGKey(2 + i))
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0
    tput = batch_size * AUDIO_S * STEPS / dt
    print(json.dumps({"batch": batch_size, "remat": remat,
                      "throughput": round(tput, 2)}), flush=True)
    del state, audio, lengths


def main() -> None:
    for batch_size, remat in CONFIGS:
        try:
            run_one(batch_size, remat)
        except Exception as e:
            msg = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
            print(json.dumps({"batch": batch_size, "remat": remat,
                              "error": msg}), flush=True)


if __name__ == "__main__":
    main()
