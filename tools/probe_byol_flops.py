"""Probe: XLA cost analysis of the BYOL step vs the wav2vec2 step and a
plain CTC step at identical tiny config — detects dead-code elimination of
a tower (the r4 8885 audio-s/s BYOL measurement was 2.9x chip peak, which
is impossible unless compute vanished)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from conformer_tpu.config import Config
from conformer_tpu.train.pretrain import (init_byol_state,
                                          init_wav2vec2_state,
                                          make_byol_step,
                                          make_wav2vec2_step)
from conformer_tpu.train.state import make_optimizer


def main():
    cfg = Config()
    cfg = cfg.override(**{
        "model.n_blocks": 2, "model.d_model": 64, "model.n_heads": 4,
        "model.lstm_hidden_dim": 32, "model.vocab_size": 40,
        "model.attention_impl": "xla", "model.use_scan_layers": False,
        "model.use_remat": False,
    })
    b, n = 4, 16000
    rng = jax.random.PRNGKey(0)
    audio = jax.random.normal(rng, (b, n), np.float32) * 0.1
    lengths = np.full((b,), n, np.int32)
    mel_frames = n // 160 + 1
    tx = make_optimizer(cfg.optim, steps_per_epoch=100)

    st = init_byol_state(cfg, rng, tx, mel_frames=mel_frames)
    step = make_byol_step(cfg, tx, donate=False)
    lowered = jax.jit(lambda s, a, l, r: step(s, a, l, r)).lower(
        st, audio, lengths, rng)
    byol_flops = lowered.compile().cost_analysis()["flops"]

    st2 = init_wav2vec2_state(cfg, rng, tx, mel_frames=mel_frames)
    step2 = make_wav2vec2_step(cfg, tx, donate=False)
    lowered2 = jax.jit(lambda s, a, l, r: step2(s, a, l, r, 2.0)).lower(
        st2, audio, lengths, rng)
    w2v_flops = lowered2.compile().cost_analysis()["flops"]

    print(f"byol step flops: {byol_flops/1e9:.3f} G")
    print(f"w2v2 step flops: {w2v_flops/1e9:.3f} G")
    print(f"ratio byol/w2v2: {byol_flops / w2v_flops:.3f} "
          "(expect ~1.3-1.6: +1 target fwd at 2B vs quantizer/IN-CE extras)")


if __name__ == "__main__":
    main()
