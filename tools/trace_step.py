"""Op-level attribution of the train step from a jax.profiler device trace.

Runs the bench operating point (see bench.py) a few steps under
``jax.profiler.trace`` and aggregates XLA-op durations from the captured
xplane, grouped into coarse buckets (attention kernel, matmuls, convs,
elementwise fusions, ...). Component-level wall timing (tools/profile_step.py)
cannot see inside the one fused step program, and per-op microbenches are
inflated by the remote-tunnel launch overhead — this is the honest breakdown.

    python tools/trace_step.py [--batch 48] [--audio-s 8] [--steps 5]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/conformer_tpu_jax_cache")

GROUPS = [
    ("attention kernel", re.compile(r"sincos|_fwd_kernel|_bwd_kernel|custom-call")),
    ("matmul/fusion(dot)", re.compile(r"dot|gemm|matmul|conv(olution)?[._-]")),
    ("depthwise/conv", re.compile(r"conv")),
    ("reduce/norm", re.compile(r"reduce|norm")),
    ("rng", re.compile(r"rng|threefry|bit-?gen")),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast|reshape|slice|concat|pad")),
    ("scatter/gather", re.compile(r"scatter|gather|dynamic")),
    ("loop/control", re.compile(r"while|condition|tuple|call")),
    ("elementwise-fusion", re.compile(r"fusion|add|multiply|select|exp|tanh")),
]


def classify(name: str) -> str:
    low = name.lower()
    for label, pat in GROUPS:
        if pat.search(low):
            return label
    return "other"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--audio-s", type=float, default=8.0)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--mode", default="train",
                    choices=["train", "pretrain", "pretrain_byol",
                             "beam_device", "transducer_beam"],
                    help="which fused step to trace (pretrain = wav2vec2; "
                         "beam_device = fwd + on-device beam190+wordLM)")
    ap.add_argument("--width", type=int, default=190,
                    help="beam width for --mode beam_device")
    ap.add_argument("--arch", default="ctc", choices=["ctc", "transducer"],
                    help="model arch for --mode train (transducer = RNN-T "
                         "fused train step, U=96 tokens)")
    ap.add_argument("--trace-dir", default=None,
                    help="parse an existing trace instead of running")
    args = ap.parse_args()

    trace_dir = args.trace_dir
    if trace_dir is None:
        trace_dir = tempfile.mkdtemp(prefix="conformer_trace_")
        _run_and_trace(args, trace_dir)

    _report(trace_dir, args.top)


def _run_and_trace(args, trace_dir: str) -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    jax.config.update("jax_default_prng_impl",
                      os.environ.get("BENCH_PRNG", "rbg"))

    from conformer_tpu.config import Config
    from conformer_tpu.data.dataset import synthetic_batch
    from conformer_tpu.train.state import TrainState, make_optimizer
    from conformer_tpu.train.steps import init_variables, make_train_step

    cfg = Config().override(**{
        "model.use_remat": os.environ.get("BENCH_REMAT", "0") == "1",
        "model.attention_score_dtype": os.environ.get("BENCH_SCORE",
                                                      "bfloat16"),
        "model.attention_impl": os.environ.get("BENCH_ATTN", "pallas"),
        "model.use_scan_layers": os.environ.get("BENCH_SCAN", "0") == "1",
        **({"model.conv_impl": os.environ["BENCH_CONV"]}
           if os.environ.get("BENCH_CONV") else {}),
    })
    num_samples = int(args.audio_s * cfg.audio.sample_rate)
    tx = make_optimizer(cfg.optim, steps_per_epoch=1000)
    if args.mode in ("pretrain", "pretrain_byol"):
        _run_and_trace_pretrain(args, trace_dir, cfg, tx, num_samples)
        return
    if args.mode == "beam_device":
        _run_and_trace_beam_device(args, trace_dir, cfg, num_samples)
        return
    if args.mode == "transducer_beam":
        _run_and_trace_transducer_beam(args, trace_dir, cfg, num_samples)
        return
    if args.arch != "ctc":
        cfg = cfg.override(**{"model.arch": args.arch,
                              "data.max_tokens": 96})
    variables = init_variables(cfg, jax.random.PRNGKey(0),
                               mel_frames=num_samples // 160 + 1)
    state = TrainState.create(variables["params"],
                              variables.get("batch_stats", {}), tx)
    state = jax.device_put(state)
    b = synthetic_batch(args.batch, num_samples, cfg.model.vocab_size,
                        max_tokens=cfg.data.max_tokens, seed=0)
    audio_lengths = np.full((args.batch,), num_samples, np.int32)
    dev_args = jax.device_put((b.audio, audio_lengths, b.tokens,
                               b.token_lengths))
    step_fn = make_train_step(cfg, tx, donate=True)
    rng = jax.random.PRNGKey(1)

    for _ in range(3):  # compile + settle
        state, metrics = step_fn(state, *dev_args, rng)
    jax.block_until_ready(metrics["loss"])

    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            state, metrics = step_fn(state, *dev_args, rng)
        jax.block_until_ready(metrics["loss"])
    print(f"trace written to {trace_dir}")


def _run_and_trace_pretrain(args, trace_dir: str, cfg, tx,
                            num_samples: int) -> None:
    """Trace one fused wav2vec2/BYOL pretrain step (VERDICT r2 #9: attribute
    the pretrain-vs-CTC throughput gap at the op level)."""
    import jax

    from conformer_tpu.train.pretrain import (gumbel_temperature_at,
                                              init_byol_state,
                                              init_wav2vec2_state,
                                              make_byol_step,
                                              make_wav2vec2_step)

    # Match the recorded pretrain operating point (scan + remat).
    cfg = cfg.override(**{"model.use_scan_layers": True,
                          "model.use_remat": True})
    mel_frames = num_samples // 160 + 1
    rng = jax.random.PRNGKey(0)
    audio = jax.device_put(
        jax.random.normal(rng, (args.batch, num_samples), np.float32) * 0.1)
    lengths = jax.device_put(np.full((args.batch,), num_samples, np.int32))
    if args.mode == "pretrain":
        state = jax.device_put(
            init_wav2vec2_state(cfg, rng, tx, mel_frames=mel_frames))
        step_fn = make_wav2vec2_step(cfg, tx)
        temp = gumbel_temperature_at(cfg, 0)
        run = lambda st, r: step_fn(st, audio, lengths, r, temp)
    else:
        state = jax.device_put(
            init_byol_state(cfg, rng, tx, mel_frames=mel_frames))
        step_fn = make_byol_step(cfg, tx)
        run = lambda st, r: step_fn(st, audio, lengths, r)

    for _ in range(3):
        state, metrics = run(state, jax.random.PRNGKey(1))
    jax.block_until_ready(metrics["loss"])
    with jax.profiler.trace(trace_dir):
        for i in range(args.steps):
            state, metrics = run(state, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(metrics["loss"])
    print(f"trace written to {trace_dir}")


def _run_and_trace_beam_device(args, trace_dir: str, cfg,
                               num_samples: int) -> None:
    """Trace the fully on-device beam+word-LM decode at the reference
    operating point (VERDICT r2 #5b: attribute the w190 device-vs-host RTF
    gap at the op level before designing a pruning lever). Mirrors
    bench.py:_bench_beam_device exactly."""
    import jax
    import jax.numpy as jnp

    from conformer_tpu.lm.device_table import (DeviceNgramTable,
                                               DeviceWordVocab)
    from conformer_tpu.lm.ngram import build_arpa
    from conformer_tpu.ops.beam_search_device import ctc_beam_search_device
    from conformer_tpu.data.dataset import synthetic_batch
    from conformer_tpu.text.tokenizer import load_tokenizer
    from conformer_tpu.train.steps import init_variables, make_forward

    tok = load_tokenizer("vi")
    root = tempfile.mkdtemp(prefix="trace_beam_dev_")
    corpus = os.path.join(root, "corpus.txt")
    rng = np.random.default_rng(0)
    words = ["XIN", "CHÀO", "BẠN", "CẢM", "ƠN", "TẠM", "BIỆT", "LỖI",
             "KHÔNG", "CÓ", "GÌ", "ĐÂU", "NHÉ", "ANH", "EM", "TÔI"]
    with open(corpus, "w", encoding="utf8") as f:
        for _ in range(2000):
            f.write(" ".join(rng.choice(words, rng.integers(3, 9))) + "\n")
    arpa = os.path.join(root, "lm.arpa")
    build_arpa(corpus, arpa, 5)
    table = DeviceNgramTable.from_arpa(arpa)
    wv = DeviceWordVocab.build(tok.vocab, table.vocab)

    variables = init_variables(cfg, jax.random.PRNGKey(0),
                               mel_frames=num_samples // 160 + 1)
    forward = make_forward(cfg)

    @jax.jit
    def decode(variables, audio, lengths):
        logits, out_lengths = forward(variables, audio, lengths)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return ctc_beam_search_device(
            lp, out_lengths, beam_width=args.width, top_k=8,
            blank_id=tok.pad_id, unk_id=tok.unk_id,
            max_len=cfg.data.max_tokens,
            lm_tables=table.device_arrays(),
            word_arrays=wv.device_arrays(),
            lm_alpha=2.1, lm_beta=9.2, delim_id=tok.delim_id,
            lm_bos_id=int(table.bos_id), lm_unk_logp=float(table.unk_logp),
            lm_order=int(table.order))

    b = synthetic_batch(args.batch, num_samples, cfg.model.vocab_size, seed=0)
    audio = jax.device_put(b.audio)
    lengths = jax.device_put(jnp.full((args.batch,), num_samples, jnp.int32))
    out = decode(variables, audio, lengths)
    jax.block_until_ready(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            out = decode(variables, audio, lengths)
        jax.block_until_ready(out)
    print(f"trace written to {trace_dir}")


def _run_and_trace_transducer_beam(args, trace_dir: str, cfg,
                                   num_samples: int) -> None:
    """Trace the on-device RNN-T beam search (mirrors
    bench.py:_bench_transducer_decode with beam=True, width args.width)."""
    import jax
    import jax.numpy as jnp

    from conformer_tpu.audio.mel import MelFrontend
    from conformer_tpu.data.dataset import synthetic_batch
    from conformer_tpu.models.transducer import Transducer
    from conformer_tpu.ops.rnnt import rnnt_beam_search
    from conformer_tpu.train.steps import init_variables

    cfg = cfg.override(**{"model.arch": "transducer",
                          "data.max_tokens": 96})
    width = args.width if args.width != 190 else 8
    model = Transducer(cfg.model, compute_dtype=cfg.optim.compute_dtype,
                       deterministic=True)
    frontend = MelFrontend(cfg.audio)
    variables = init_variables(cfg, jax.random.PRNGKey(0),
                               mel_frames=num_samples // 160 + 1)

    @jax.jit
    def decode(variables, audio, lengths):
        bound = model.bind(variables)
        mels = frontend(audio)
        enc, enc_lengths = bound.encode(mels,
                                        frontend.frame_lengths(lengths))
        return rnnt_beam_search(
            bound.joint_logits, enc, enc_lengths, bound.predict_step,
            bound.predict_init(enc.shape[0]), beam_width=width,
            top_k=cfg.decode.rnnt_top_k,
            max_symbols=cfg.decode.rnnt_max_symbols,
            max_len=cfg.data.max_tokens)

    b = synthetic_batch(args.batch, num_samples, cfg.model.vocab_size,
                        seed=0)
    audio = jax.device_put(b.audio)
    lengths = jax.device_put(
        jnp.full((args.batch,), num_samples, jnp.int32))
    out = decode(variables, audio, lengths)
    jax.block_until_ready(out)
    with jax.profiler.trace(trace_dir):
        for _ in range(args.steps):
            out = decode(variables, audio, lengths)
        jax.block_until_ready(out)
    print(f"trace written to {trace_dir}")


def _report(trace_dir: str, top: int) -> None:
    from jax.profiler import ProfileData

    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.xplane.pb"), recursive=True))
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    data = ProfileData.from_file(paths[-1])

    op_time = collections.Counter()      # ns per op name ("XLA Ops" line)
    op_count = collections.Counter()
    module_total = 0                     # ns on the "XLA Modules" line
    for plane in data.planes:
        name = plane.name or ""
        if "TPU" not in name and "/device:" not in name:
            continue
        for line in plane.lines:
            lname = (line.name or "").strip().lower()
            if lname == "xla modules":
                module_total += sum(int(ev.duration_ns)
                                    for ev in line.events)
            if lname != "xla ops":
                continue
            for ev in line.events:
                dur = int(ev.duration_ns)
                op_time[ev.name] += dur
                op_count[ev.name] += 1
    if not op_time:
        for plane in data.planes:  # debug aid: list available lines
            if "TPU" in (plane.name or ""):
                for line in plane.lines:
                    print(f"  line: {line.name!r} "
                          f"({sum(1 for _ in line.events)} events)")
        raise SystemExit("no 'XLA Ops' events found")

    # Async ops (copy-start/copy-done, slice-start, ...) span their whole
    # in-flight window and overlap compute — bucket them apart so they do
    # not masquerade as busy time.
    def is_async(name: str) -> bool:
        low = name.lower()
        return ("-start" in low or "-done" in low or "async" in low)

    sync_total = sum(ns for n, ns in op_time.items() if not is_async(n))
    async_total = sum(ns for n, ns in op_time.items() if is_async(n))

    groups = collections.Counter()
    for name, ns in op_time.items():
        groups["ASYNC(overlapped) " + classify(name) if is_async(name)
               else classify(name)] += ns

    print(f"\n== totals: XLA Modules {module_total/1e6:.2f} ms | sync ops "
          f"{sync_total/1e6:.2f} ms | async spans {async_total/1e6:.2f} ms ==")
    print("== groups (% of sync op time) ==")
    for label, ns in groups.most_common():
        pct = 100 * ns / sync_total if not label.startswith("ASYNC") else 0.0
        print(f"{ns/1e6:10.2f} ms  {pct:5.1f}%  {label}")

    print(f"\n== top {top} sync ops ==")
    shown = 0
    for name, ns in op_time.most_common():
        if is_async(name):
            continue
        print(f"{ns/1e6:10.3f} ms  x{op_count[name]:<5d} {name[:110]}")
        shown += 1
        if shown >= top:
            break


if __name__ == "__main__":
    main()
