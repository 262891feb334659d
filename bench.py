"""Benchmark: train-step throughput of the flagship Conformer on one chip.

Measures the BASELINE.json north-star metric — audio-seconds of speech
processed per wall-clock second per chip — for the production model config
(17 blocks, d=512, 8 heads; reference: train.py:324-330) with the full fused
train step (mel frontend + SpecAugment + forward + CTC + backward + Adam) in
bf16 compute / fp32 params.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (SURVEY §6), so ``vs_baseline``
compares against the previous locally recorded value in BENCH_LAST.json
(1.0 on first run).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    # Persistent compilation cache: cold TPU compiles of the full train step
    # take minutes through the remote-compile path; cached reruns are instant.
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/conformer_tpu_jax_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from conformer_tpu.config import Config
    from conformer_tpu.data.dataset import synthetic_batch
    from conformer_tpu.train.state import TrainState, make_optimizer
    from conformer_tpu.train.steps import init_variables, make_train_step

    mode = os.environ.get("BENCH_MODE", "train")
    # Batch 56 is the best measured single-chip operating point (sweep at
    # end of r2: b48 3374 -> b56 3439 -> b64 3404 audio-s/s, remat off,
    # unrolled, hash dropout).
    batch_size = int(os.environ.get("BENCH_BATCH", "56"))
    audio_s = float(os.environ.get("BENCH_AUDIO_S", "8.0"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))

    cfg = Config()  # production model, bf16 compute
    # Best single-chip operating point found by tools/sweep_bench.sh:
    # batch 32, remat off (+38% over the remat-on default, which exists for
    # memory headroom on long buckets / small chips).
    overrides = {
        "model.use_remat": os.environ.get("BENCH_REMAT", "0") == "1",
        # bf16 score IO (fp32 softmax): halves the dominant attention HBM
        # traffic, +8% end-to-end. Model default stays fp32 (conservative).
        "model.attention_score_dtype": os.environ.get("BENCH_SCORE",
                                                      "bfloat16"),
    }
    # Fused shift-free sin/cos attention kernel: +11% end-to-end at 8s audio
    # (scores never round-trip HBM in fwd or bwd; dropout in-kernel).
    overrides["model.attention_impl"] = os.environ.get("BENCH_ATTN", "pallas")
    # Unrolled blocks (+25%): XLA schedules/fuses across block boundaries,
    # which lax.scan forbids. Costs one long cold compile (cached after);
    # the model default stays scan for compile-time ergonomics.
    overrides["model.use_scan_layers"] = os.environ.get("BENCH_SCAN",
                                                        "0") == "1"
    if os.environ.get("BENCH_CONV"):
        overrides["model.conv_impl"] = os.environ["BENCH_CONV"]
    # Partial unroll for the block scan (long buckets where full unroll
    # exceeds the remote-compile budget): cross-block XLA scheduling within
    # k-block chunks, scan param layout unchanged.
    if os.environ.get("BENCH_UNROLL"):
        overrides["model.scan_unroll"] = int(os.environ["BENCH_UNROLL"])
    # 'separable' swaps the second subsampling conv for depthwise+pointwise
    # (~9x fewer FLOPs there); opt-in, not reference-checkpoint-compatible.
    if os.environ.get("BENCH_SUBSAMPLE"):
        overrides["model.subsample_impl"] = os.environ["BENCH_SUBSAMPLE"]
    if os.environ.get("BENCH_NEGATIVES"):
        overrides["pretrain.negatives_impl"] = os.environ["BENCH_NEGATIVES"]
    # 'hash': fused stateless-hash dropout masks (no HBM mask buffers).
    if os.environ.get("BENCH_DROPOUT"):
        overrides["model.dropout_impl"] = os.environ["BENCH_DROPOUT"]
    # 'pallas': fused frame+window+DFT+mel+log frontend kernel.
    if os.environ.get("BENCH_STFT"):
        overrides["audio.stft_impl"] = os.environ["BENCH_STFT"]
    if os.environ.get("BENCH_SCORE"):
        overrides["model.attention_score_dtype"] = os.environ["BENCH_SCORE"]
    # rbg PRNG: threefry dropout-mask generation costs ~20% of the train
    # step on TPU; the hardware RNG implementation is dramatically cheaper.
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_PRNG", "rbg"))
    if mode in ("transducer", "transducer_infer", "transducer_beam",
                "transducer_stream"):
        # RNN-T modes (new capability — the reference's Transducer is a dead
        # stub): same Conformer encoder + prediction/joint heads, lattice-
        # free scan loss (ops/rnnt.py::rnnt_loss_scan) for training.
        # U defaults to 96 tokens (~realistic grapheme count for 8s).
        overrides["model.arch"] = "transducer"
        overrides["data.max_tokens"] = int(os.environ.get("BENCH_TOKENS",
                                                          "96"))
    if overrides:
        cfg = cfg.override(**overrides)
    num_samples = int(audio_s * cfg.audio.sample_rate)

    tx = make_optimizer(cfg.optim, steps_per_epoch=1000)
    if mode in ("pretrain", "pretrain_byol"):
        _bench_pretrain(cfg, tx, batch_size, audio_s, num_samples, steps,
                        method="byol" if mode == "pretrain_byol"
                        else "wav2vec2")
        return
    variables = init_variables(cfg, jax.random.PRNGKey(0),
                               mel_frames=num_samples // 160 + 1)

    if mode == "infer":
        _bench_infer(cfg, variables, batch_size, audio_s, num_samples, steps)
        return
    if mode in ("transducer_infer", "transducer_beam"):
        _bench_transducer_decode(cfg, variables, batch_size, audio_s,
                                 num_samples, steps,
                                 beam=mode == "transducer_beam")
        return
    if mode == "beam":
        _bench_beam(cfg, variables, batch_size, audio_s, num_samples)
        return
    if mode == "beam_device":
        _bench_beam_device(cfg, variables, batch_size, audio_s, num_samples)
        return
    if mode in ("stream", "transducer_stream"):
        _bench_stream(cfg, variables)
        return

    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    state = jax.device_put(state)

    b = synthetic_batch(batch_size, num_samples, cfg.model.vocab_size,
                        max_tokens=cfg.data.max_tokens, seed=0)
    # All-full-length batch => audio seconds processed is exact.
    audio_lengths = np.full((batch_size,), num_samples, np.int32)
    args = jax.device_put((b.audio, audio_lengths, b.tokens, b.token_lengths))

    step_fn = make_train_step(cfg, tx, donate=True)
    rng = jax.random.PRNGKey(1)

    # Warmup / compile.
    for _ in range(2):
        state, metrics = step_fn(state, *args, rng)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        state, metrics = step_fn(state, *args, rng)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    audio_seconds = batch_size * audio_s * steps
    value = audio_seconds / dt
    step_ms = dt / steps * 1e3

    if mode == "transducer":
        # No CTC baseline applies; record the measurement standalone
        # (hardware-anchored via the transducer's own analytic FLOPs).
        record = {
            "metric": "transducer_train_throughput_audio_seconds_per_s_per_chip",
            "value": round(value, 2),
            "unit": "audio-s/s",
            "vs_baseline": 1.0,
            "step_time_ms": round(step_ms, 2),
        }
        tmfu = _mfu(cfg, batch_size, num_samples // 160 + 1, dt / steps,
                    flops_fn=lambda c, bt, mf: transducer_train_flops(
                        c, bt, mf, c.data.max_tokens))
        if tmfu:
            record.update(tmfu)
        print(json.dumps(record))
        return

    mfu = _mfu(cfg, batch_size, num_samples // 160 + 1, dt / steps)

    root = os.path.dirname(os.path.abspath(__file__))
    baseline_path = os.path.join(root, "BENCH_BASELINE.json")
    last_path = os.path.join(root, "BENCH_LAST.json")
    # vs_baseline compares against the FIRST measurement ever recorded for
    # this metric (the unoptimized round-1 starting point) — the reference
    # publishes no numbers to compare against (SURVEY §6).
    vs_baseline = 1.0
    try:
        with open(baseline_path) as f:
            base = json.load(f).get("value", 0.0)
        if base > 0:
            vs_baseline = value / base
    except (OSError, ValueError):
        try:
            with open(baseline_path, "w") as f:
                json.dump({"value": value, "time": time.time()}, f)
        except OSError:
            pass
    try:
        with open(last_path, "w") as f:
            json.dump({"value": value, "time": time.time()}, f)
    except OSError:
        pass

    record = {
        "metric": "train_throughput_audio_seconds_per_s_per_chip",
        "value": round(value, 2),
        "unit": "audio-s/s",
        "vs_baseline": round(vs_baseline, 4),
        "step_time_ms": round(step_ms, 2),
    }
    if mfu is not None:
        record.update(mfu)
    print(json.dumps(record))


def _post_subsample_frames(mel_frames: int) -> int:
    return ((mel_frames - 1) // 2 - 1) // 2


def _mel_fwd_flops(cfg, b: int, mel_frames: int) -> float:
    """Mel frontend: framed DFT as matmul (400 -> 2*201) + mel filterbank."""
    n_fft = cfg.audio.n_fft
    n_mels = cfg.model.n_mel_channels
    return (2.0 * b * mel_frames * n_fft * (n_fft // 2 + 1) * 2
            + 2.0 * b * mel_frames * (n_fft // 2 + 1) * n_mels)


def _subsample_proj_fwd_flops(cfg, b: int, mel_frames: int) -> float:
    """Conv subsampling stack + input projection
    (reference: model/utils/convolution.py:34-57, encoder.py:13)."""
    m = cfg.model
    d, n_mels = m.d_model, m.n_mel_channels
    t1 = (mel_frames - 1) // 2
    l = (t1 - 1) // 2
    f1 = (n_mels - 1) // 2
    f2 = (f1 - 1) // 2
    fwd = 2.0 * b * d * f1 * t1 * 9                    # conv1 (1 -> d, k3)
    if getattr(m, "subsample_impl", "conv2d") == "separable":
        fwd += 2.0 * b * d * f2 * l * (9 + d)          # dw + pw
    else:
        fwd += 2.0 * b * d * f2 * l * 9 * d            # conv2 (d -> d, k3)
    fwd += 2.0 * b * l * (f2 * d) * d                  # input projection
    return fwd


def _blocks_fwd_flops(cfg, b: int, l: int) -> float:
    """N conformer blocks. Position-score FLOPs use the shift-free sin/cos
    formulation actually executed (2 half-width table matmuls ~= 2x the
    content matmul — ops/pallas/sincos_attention.py)."""
    m = cfg.model
    d = m.d_model
    per_block = (
        2 * (2.0 * b * l * d * 4 * d * 2)              # ffn1 + ffn2
        + 4 * (2.0 * b * l * d * d)                    # q/k/v/out projections
        + 2.0 * b * l * d * d                          # pos-table prep (qv @ W)
        + 2.0 * b * l * l * d                          # content scores
        + 2 * (2.0 * b * l * l * d / 2 * 2)            # sin/cos position scores
        + 2.0 * b * l * l * d                          # probs @ V
        + 2.0 * b * l * d * 2 * d                      # conv pointwise1 (GLU)
        + 2.0 * b * l * d * m.kernel_size              # depthwise conv
        + 2.0 * b * l * d * d                          # conv pointwise2
    )
    return m.n_blocks * per_block


def _lstm_head_fwd_flops(cfg, b: int, l: int) -> float:
    """Decoder LSTM + classifier (reference: model/modules/decoder.py)."""
    m = cfg.model
    h = m.lstm_hidden_dim
    return (2.0 * b * l * (m.d_model * 4 * h + h * 4 * h)
            + 2.0 * b * l * h * m.vocab_size)


def model_train_flops(cfg, batch: int, mel_frames: int) -> float:
    """Analytic matmul/conv FLOPs of one fused CTC train step (fwd x 3 for
    fwd+bwd, the standard MFU accounting). Computed analytically rather than
    from XLA cost analysis because the Pallas attention kernel is a custom
    call XLA cannot cost."""
    l = _post_subsample_frames(mel_frames)
    fwd = (_mel_fwd_flops(cfg, batch, mel_frames)
           + _subsample_proj_fwd_flops(cfg, batch, mel_frames)
           + _blocks_fwd_flops(cfg, batch, l)
           + _lstm_head_fwd_flops(cfg, batch, l))
    return 3.0 * fwd


def wav2vec2_train_flops(cfg, batch: int, mel_frames: int) -> float:
    """Analytic FLOPs of one wav2vec2 pretrain step (train/pretrain.py::
    make_wav2vec2_step). Grad path (x3): subsample + quantizer weight-proj
    and codevector assembly + target/input/context projections + blocks +
    the two InfoNCE-path (B,T,T) cosine matmuls. Fwd-only (x1): the mel
    frontend (computed outside the loss) and the stop-gradient target-target
    similarity matrix."""
    b = batch
    pre = cfg.pretrain
    m = cfg.model
    l = _post_subsample_frames(mel_frames)
    f2 = ((m.n_mel_channels - 1) // 2 - 1) // 2
    feat = f2 * m.d_model
    pd, gv = pre.proj_dim, pre.num_groups * pre.num_vars
    grad = _subsample_proj_fwd_flops(cfg, b, mel_frames)  # incl. input_proj
    grad += _blocks_fwd_flops(cfg, b, l)
    grad += 2.0 * b * l * feat * gv                    # quantizer weight-proj
    grad += 2.0 * b * l * pre.num_vars * pd            # codevector assembly
    grad += 2.0 * b * l * pd * pd                      # target_proj
    grad += 2.0 * b * l * m.d_model * pd               # context_proj
    grad += 2.0 * b * l * l * pd                       # InfoNCE cos_all
    grad += 2.0 * b * l * pd                           # positive row-dot
    fwd_only = (_mel_fwd_flops(cfg, b, mel_frames)
                + 2.0 * b * l * l * pd)                # stop-grad tgt_sim
    return 3.0 * grad + fwd_only


def byol_train_flops(cfg, batch: int, mel_frames: int) -> float:
    """Analytic FLOPs of one BYOL pretrain step (train/pretrain.py::
    make_byol_step). Both augmented views ride ONE 2B-row pass per tower:
    online tower (encoder + projector + predictor) is fwd+bwd (x3) at 2B;
    target tower (encoder + projector, stop-gradient EMA weights) is
    fwd-only (x1) at 2B; the mel frontend runs once at B. Per audio-second
    this is ~2x(3) + 2x(1) = 8 encoder passes vs CTC's 3 — the structural
    gap behind BYOL's lower audio-s/s at equal MFU."""
    b = batch
    pre = cfg.pretrain
    m = cfg.model
    l = _post_subsample_frames(mel_frames)
    enc2b = (_subsample_proj_fwd_flops(cfg, 2 * b, mel_frames)
             + _blocks_fwd_flops(cfg, 2 * b, l))
    mlp_proj = 2.0 * (2 * b) * l * (m.d_model * pre.predictor_hidden
                                    + pre.predictor_hidden * pre.proj_dim)
    mlp_pred = 2.0 * (2 * b) * l * (pre.proj_dim * pre.predictor_hidden
                                    + pre.predictor_hidden * pre.proj_dim)
    online = enc2b + mlp_proj + mlp_pred
    target = enc2b + mlp_proj
    return 3.0 * online + target + _mel_fwd_flops(cfg, b, mel_frames)


def transducer_train_flops(cfg, batch: int, mel_frames: int,
                           u_tokens: int) -> float:
    """Analytic FLOPs of one fused RNN-T train step: the CTC step's
    mel+encoder (model_train_flops minus its LSTM-decoder/classifier head)
    plus the prediction LSTM, the joint factor projections, and the
    per-frame (B, U+1, J) -> V joint projection that the lattice-free loss
    scan executes T' times (ops/rnnt.py::rnnt_loss_scan; the remat
    recompute is deliberately NOT counted — standard 3x-fwd MFU
    accounting, matching model_train_flops)."""
    m = cfg.model
    b, d = batch, m.d_model
    l = ((mel_frames - 1) // 2 - 1) // 2     # post-subsample frames
    h = m.lstm_hidden_dim
    head = (2.0 * b * l * (d * 4 * h + h * 4 * h)
            + 2.0 * b * l * h * m.vocab_size)
    u1 = u_tokens + 1
    e, ph, j, v = (m.pred_embed_dim, m.pred_hidden_dim, m.joint_dim,
                   m.vocab_size)
    tr = 2.0 * b * u1 * (e * 4 * ph + ph * 4 * ph)     # pred LSTM layer 1
    tr += 2.0 * b * u1 * (ph * 4 * ph + ph * 4 * ph) * max(
        m.pred_layers - 1, 0)                          # deeper layers
    tr += 2.0 * b * l * d * j                          # enc_proj factor
    tr += 2.0 * b * u1 * ph * j                        # pred_proj factor
    tr += 2.0 * b * l * u1 * j * v                     # per-frame joint out
    return model_train_flops(cfg, batch, mel_frames) + 3.0 * (tr - head)


def _mfu(cfg, batch: int, mel_frames: int, step_time_s: float,
         flops_fn=None):
    """Hardware-anchored utilization: analytic model FLOPs / (step time x
    chip peak). Peak defaults to TPU v5e bf16 (197 TFLOP/s, public spec);
    override with BENCH_PEAK_TFLOPS."""
    try:
        peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
        flops = (flops_fn or model_train_flops)(cfg, batch, mel_frames)
        return {"model_tflops_per_step": round(flops / 1e12, 3),
                "mfu": round(flops / step_time_s / peak, 4)}
    except Exception:
        return None


def _bench_infer(cfg, variables, batch_size, audio_s, num_samples, steps):
    """Decode RTF: audio -> mel -> encoder -> decoder -> greedy tokens, one
    fused program; RTF = wall-clock / audio seconds (lower is better;
    throughput = batch * audio_s / wall)."""
    import json as _json
    import time as _time

    import jax
    import jax.numpy as jnp

    from conformer_tpu.data.dataset import synthetic_batch
    from conformer_tpu.ops.ctc import greedy_decode
    from conformer_tpu.train.steps import make_forward

    forward = make_forward(cfg)

    @jax.jit
    def infer(variables, audio, lengths):
        logits, out_lengths = forward(variables, audio, lengths)
        return greedy_decode(logits, out_lengths)

    b = synthetic_batch(batch_size, num_samples, cfg.model.vocab_size, seed=0)
    audio = jax.device_put(b.audio)
    lengths = jax.device_put(
        jnp.full((batch_size,), num_samples, jnp.int32))

    for _ in range(2):
        out = infer(variables, audio, lengths)
    jax.block_until_ready(out)
    t0 = _time.perf_counter()
    for _ in range(steps):
        out = infer(variables, audio, lengths)
    jax.block_until_ready(out)
    dt = _time.perf_counter() - t0

    total_audio = batch_size * audio_s * steps
    rtf = dt / total_audio
    print(_json.dumps({
        "metric": "greedy_decode_rtf_per_chip",
        "value": round(rtf, 6),
        "unit": "rtf (wall-s per audio-s, batched)",
        "vs_baseline": 1.0,
    }))


def _bench_transducer_decode(cfg, variables, batch_size, audio_s,
                             num_samples, steps, beam: bool):
    """RNN-T decode RTF: audio -> mel -> encoder -> frame-synchronous greedy
    (or device beam search, width BENCH_WIDTH) in one jitted program."""
    import json as _json
    import os as _os
    import time as _time

    import jax
    import jax.numpy as jnp

    from conformer_tpu.audio.mel import MelFrontend
    from conformer_tpu.data.dataset import synthetic_batch
    from conformer_tpu.models.transducer import Transducer
    from conformer_tpu.ops.rnnt import rnnt_beam_search, rnnt_greedy_decode

    width = int(_os.environ.get("BENCH_WIDTH", "8"))
    model = Transducer(cfg.model, compute_dtype=cfg.optim.compute_dtype,
                       deterministic=True)
    frontend = MelFrontend(cfg.audio)

    @jax.jit
    def infer(variables, audio, lengths):
        bound = model.bind(variables)
        mels = frontend(audio)
        enc, enc_lengths = bound.encode(mels, frontend.frame_lengths(lengths))
        if beam:
            return rnnt_beam_search(
                bound.joint_logits, enc, enc_lengths, bound.predict_step,
                bound.predict_init(enc.shape[0]), beam_width=width,
                top_k=cfg.decode.rnnt_top_k,
                max_symbols=cfg.decode.rnnt_max_symbols,
                max_len=cfg.data.max_tokens,
                scan_unroll=int(_os.environ.get("BENCH_SCAN_UNROLL", "1")))
        return rnnt_greedy_decode(
            bound.joint_logits, enc, enc_lengths, bound.predict_step,
            bound.predict_init(enc.shape[0]),
            max_symbols=cfg.decode.rnnt_max_symbols,
            max_len=cfg.data.max_tokens)

    b = synthetic_batch(batch_size, num_samples, cfg.model.vocab_size, seed=0)
    audio = jax.device_put(b.audio)
    lengths = jax.device_put(jnp.full((batch_size,), num_samples, jnp.int32))
    for _ in range(2):
        out = infer(variables, audio, lengths)
    jax.block_until_ready(out)
    t0 = _time.perf_counter()
    for _ in range(steps):
        out = infer(variables, audio, lengths)
    jax.block_until_ready(out)
    dt = _time.perf_counter() - t0
    rtf = dt / (batch_size * audio_s * steps)
    print(_json.dumps({
        "metric": ("transducer_beam_decode_rtf_per_chip" if beam
                   else "transducer_greedy_decode_rtf_per_chip"),
        "value": round(rtf, 6),
        "unit": (f"rtf (device RNN-T beam width {width}, batched)" if beam
                 else "rtf (frame-sync greedy, batched)"),
        "vs_baseline": 1.0,
    }))


def _bench_pretrain(cfg, tx, batch_size, audio_s, num_samples, steps,
                    method="wav2vec2"):
    """Self-supervised pretraining throughput (audio-s/s per chip) for the
    wav2vec2 (InfoNCE + diversity) or BYOL objective — the reference's
    pretraining is unrunnable as shipped (SURVEY §2 #14), so these are
    measured capabilities with no reference number to compare against."""
    import json as _json
    import time as _time

    import jax

    from conformer_tpu.train.pretrain import (gumbel_temperature_at,
                                              init_byol_state,
                                              init_wav2vec2_state,
                                              make_byol_step,
                                              make_wav2vec2_step)

    mel_frames = num_samples // 160 + 1
    rng = jax.random.PRNGKey(0)
    audio = jax.device_put(
        jax.random.normal(rng, (batch_size, num_samples),
                          dtype=np.float32) * 0.1)
    lengths = jax.device_put(
        np.full((batch_size,), num_samples, np.int32))

    if method == "wav2vec2":
        state = init_wav2vec2_state(cfg, rng, tx, mel_frames=mel_frames)
        step_fn = make_wav2vec2_step(cfg, tx)
        temp = gumbel_temperature_at(cfg, 0)

        def run(st, r):
            return step_fn(st, audio, lengths, r, temp)
    else:
        state = init_byol_state(cfg, rng, tx, mel_frames=mel_frames)
        step_fn = make_byol_step(cfg, tx)

        def run(st, r):
            return step_fn(st, audio, lengths, r)

    state = jax.device_put(state)
    for _ in range(2):  # warmup / compile
        state, metrics = run(state, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics["loss"])
    t0 = _time.perf_counter()
    for i in range(steps):
        state, metrics = run(state, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(metrics["loss"])
    dt = _time.perf_counter() - t0
    throughput = batch_size * audio_s * steps / dt
    record = {
        "metric": f"pretrain_{method}_throughput_audio_seconds_per_s_per_chip",
        "value": round(throughput, 2),
        "unit": f"audio-s/s ({method} objective, batch {batch_size})",
        "vs_baseline": 1.0,
        "step_time_ms": round(dt / steps * 1e3, 2),
    }
    flops_fn = wav2vec2_train_flops if method == "wav2vec2" \
        else byol_train_flops
    mfu = _mfu(cfg, batch_size, mel_frames, dt / steps, flops_fn=flops_fn)
    if mfu:
        record.update(mfu)
    print(_json.dumps(record))


def _bench_stream(cfg, variables):
    """Streaming RTF: 60s of audio fed in 100ms blocks through the stateful
    chunked encoder (2s chunks, 6s left context). Latency-oriented: batch 1,
    includes every per-chunk device round trip. BENCH_STREAM_DECODE picks
    the emission mode: greedy (default) | beam | beam_device — beam modes
    build a 5-gram word LM so beam_device measures the full on-device
    chunked beam+LM loop (BeamState carried across chunks)."""
    import json as _json
    import os as _os
    import tempfile
    import time as _time

    from conformer_tpu.decode.streaming import StreamingTranscriber
    from conformer_tpu.text.tokenizer import load_tokenizer

    decode = _os.environ.get("BENCH_STREAM_DECODE", "greedy")
    tok = load_tokenizer("vi")
    cfg = cfg.override(**{"model.vocab_size": tok.vocab_size})
    kw = dict(chunk_s=2.0, left_context_s=6.0, decode=decode)
    if decode in ("beam", "beam_device"):
        from conformer_tpu.config import DecodeConfig
        from conformer_tpu.lm.ngram import build_arpa

        root = tempfile.mkdtemp(prefix="bench_stream_")
        corpus = _os.path.join(root, "corpus.txt")
        rng = np.random.default_rng(0)
        words = ["XIN", "CHÀO", "BẠN", "CẢM", "ƠN", "TẠM", "BIỆT", "LỖI",
                 "KHÔNG", "CÓ", "GÌ", "ĐÂU", "NHÉ", "ANH", "EM", "TÔI"]
        with open(corpus, "w", encoding="utf8") as f:
            for _ in range(2000):
                f.write(" ".join(rng.choice(words, rng.integers(3, 9)))
                        + "\n")
        arpa = _os.path.join(root, "lm.arpa")
        build_arpa(corpus, arpa, 5)
        kw["decode_cfg"] = DecodeConfig(
            beam_width=int(_os.environ.get("BENCH_WIDTH", "32")),
            alpha=2.1, beta=9.2, lm_path=arpa,
            hotwords=("XIN CHÀO",), hotword_weight=9.0,
            device_scan_unroll=int(_os.environ.get("BENCH_SCAN_UNROLL",
                                                   "1")))
    st = StreamingTranscriber(cfg, tok, variables, **kw)
    sr = cfg.audio.sample_rate
    total_s = 60.0
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(total_s * sr)) * 0.1).astype(np.float32)
    block = int(0.1 * sr)
    # Warm BOTH compiled specializations: the fresh-state first window and
    # the carried-state subsequent windows (beam modes trace the BeamState
    # carry as a second program).
    st.feed(audio[: 6 * sr])
    st2 = StreamingTranscriber(cfg, tok, variables, **kw)
    t0 = _time.perf_counter()
    for i in range(0, len(audio), block):
        st2.feed(audio[i: i + block])
    st2.finish()
    dt = _time.perf_counter() - t0
    arch = getattr(cfg.model, "arch", "ctc")
    width = (f" w{kw['decode_cfg'].beam_width}+LM"
             if decode in ("beam", "beam_device") else "")
    print(_json.dumps({
        "metric": ("transducer_streaming_decode_rtf_per_chip"
                   if arch == "transducer"
                   else "streaming_decode_rtf_per_chip"),
        "value": round(dt / total_s, 6),
        "unit": f"rtf (2s chunks + 6s left ctx, batch 1, {decode}{width})",
        "vs_baseline": 1.0,
    }))


def _bench_beam(cfg, variables, batch_size, audio_s, num_samples):
    """Beam+LM decode RTF at the reference operating point: beam 190,
    alpha 2.1, beta 9.2, prune -20, 5-gram LM, hotwords
    (reference: processing/lm.py:10-15). Forward on TPU, prefix beam search
    with shallow fusion on the host (native C++, threaded)."""
    import json as _json
    import os as _os
    import tempfile
    import time as _time

    import jax
    import jax.numpy as jnp

    from conformer_tpu.config import DecodeConfig
    from conformer_tpu.data.dataset import synthetic_batch
    from conformer_tpu.decode.beam_search import BeamSearchDecoder
    from conformer_tpu.lm.ngram import build_arpa
    from conformer_tpu.text.tokenizer import load_tokenizer
    from conformer_tpu.train.steps import make_forward

    tok = load_tokenizer("vi")
    root = tempfile.mkdtemp(prefix="bench_beam_")
    corpus = _os.path.join(root, "corpus.txt")
    rng = np.random.default_rng(0)
    words = ["XIN", "CHÀO", "BẠN", "CẢM", "ƠN", "TẠM", "BIỆT", "LỖI",
             "KHÔNG", "CÓ", "GÌ", "ĐÂU", "NHÉ", "ANH", "EM", "TÔI"]
    with open(corpus, "w", encoding="utf8") as f:
        for _ in range(2000):
            f.write(" ".join(rng.choice(words, rng.integers(3, 9))) + "\n")
    arpa = _os.path.join(root, "lm.arpa")
    build_arpa(corpus, arpa, 5)
    dcfg = DecodeConfig(beam_width=190, alpha=2.1, beta=9.2,
                        beam_prune_logp=-20.0, lm_path=arpa,
                        hotwords=("XIN CHÀO",), hotword_weight=9.0)
    decoder = BeamSearchDecoder(tok, dcfg)
    native = decoder._native is not None

    forward = make_forward(cfg)

    @jax.jit
    def log_probs_fn(variables, audio, lengths):
        logits, out_lengths = forward(variables, audio, lengths)
        return jax.nn.log_softmax(logits, axis=-1), out_lengths

    b = synthetic_batch(batch_size, num_samples, cfg.model.vocab_size, seed=0)
    audio = jax.device_put(b.audio)
    lengths = jax.device_put(jnp.full((batch_size,), num_samples, jnp.int32))
    lp, out_len = log_probs_fn(variables, audio, lengths)  # compile
    jax.block_until_ready(lp)

    t0 = _time.perf_counter()
    lp, out_len = log_probs_fn(variables, audio, lengths)
    lp_h = np.asarray(jax.device_get(lp))
    len_h = np.asarray(jax.device_get(out_len))
    t_fwd = _time.perf_counter() - t0
    t0 = _time.perf_counter()
    texts = decoder.decode_batch(lp_h, len_h)
    t_dec = _time.perf_counter() - t0

    total_audio = batch_size * audio_s
    print(_json.dumps({
        "metric": "beam_lm_decode_rtf_per_chip",
        "value": round((t_fwd + t_dec) / total_audio, 6),
        "unit": ("rtf (fwd+beam190+5gramLM, batched, "
                 f"decode_only_rtf={t_dec / total_audio:.5f}, "
                 f"native={native})"),
        "vs_baseline": 1.0,
    }))


def _bench_beam_device(cfg, variables, batch_size, audio_s, num_samples):
    """FULLY on-device beam+word-LM decode RTF at the reference operating
    point (beam 190, alpha 2.1, beta 9.2, 5-gram word LM): forward +
    log-softmax + prefix beam search + word-level LM fusion in ONE XLA
    program — no host round-trip per utterance (the reference's entire
    decode is sequential host Python, processing/lm.py:62-75). Hotwords
    stay host-only (BENCH_MODE=beam covers them)."""
    import json as _json
    import os as _os
    import tempfile
    import time as _time

    import jax
    import jax.numpy as jnp

    from conformer_tpu.lm.device_table import (DeviceNgramTable,
                                               DeviceWordVocab)
    from conformer_tpu.lm.ngram import build_arpa
    from conformer_tpu.ops.beam_search_device import ctc_beam_search_device
    from conformer_tpu.data.dataset import synthetic_batch
    from conformer_tpu.text.tokenizer import load_tokenizer
    from conformer_tpu.train.steps import make_forward

    tok = load_tokenizer("vi")
    root = tempfile.mkdtemp(prefix="bench_beam_dev_")
    corpus = _os.path.join(root, "corpus.txt")
    rng = np.random.default_rng(0)
    words = ["XIN", "CHÀO", "BẠN", "CẢM", "ƠN", "TẠM", "BIỆT", "LỖI",
             "KHÔNG", "CÓ", "GÌ", "ĐÂU", "NHÉ", "ANH", "EM", "TÔI"]
    with open(corpus, "w", encoding="utf8") as f:
        for _ in range(2000):
            f.write(" ".join(rng.choice(words, rng.integers(3, 9))) + "\n")
    arpa = _os.path.join(root, "lm.arpa")
    build_arpa(corpus, arpa, 5)
    table = DeviceNgramTable.from_arpa(arpa)
    wv = DeviceWordVocab.build(tok.vocab, table.vocab)
    width = int(_os.environ.get("BENCH_WIDTH", "190"))

    forward = make_forward(cfg)

    @jax.jit
    def decode(variables, audio, lengths):
        logits, out_lengths = forward(variables, audio, lengths)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return ctc_beam_search_device(
            lp, out_lengths, beam_width=width, top_k=8,
            blank_id=tok.pad_id, unk_id=tok.unk_id,
            max_len=cfg.data.max_tokens,
            scan_unroll=int(_os.environ.get("BENCH_SCAN_UNROLL", "1")),
            lm_tables=table.device_arrays(),
            word_arrays=wv.device_arrays(),
            lm_alpha=2.1, lm_beta=9.2, delim_id=tok.delim_id,
            lm_bos_id=int(table.bos_id), lm_unk_logp=float(table.unk_logp),
            lm_order=int(table.order))

    b = synthetic_batch(batch_size, num_samples, cfg.model.vocab_size, seed=0)
    audio = jax.device_put(b.audio)
    lengths = jax.device_put(jnp.full((batch_size,), num_samples, jnp.int32))
    out = decode(variables, audio, lengths)  # compile
    jax.block_until_ready(out)

    reps = 3
    t0 = _time.perf_counter()
    for _ in range(reps):
        out = decode(variables, audio, lengths)
    jax.block_until_ready(out)
    dt = (_time.perf_counter() - t0) / reps

    total_audio = batch_size * audio_s
    print(_json.dumps({
        "metric": "beam_device_wordlm_decode_rtf_per_chip",
        "value": round(dt / total_audio, 6),
        "unit": (f"rtf (on-device fwd+beam{width}+5gram word LM, "
                 "one XLA program, batched)"),
        "vs_baseline": 1.0,
    }))


if __name__ == "__main__":
    main()
