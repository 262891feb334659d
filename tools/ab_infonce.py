"""A/B: wav2vec2 InfoNCE negatives_impl='sampled' (K in-utterance negatives,
the wav2vec2-paper objective) vs 'all' (full-softmax over every in-utterance
candidate, w2v-BERT-style; +32% measured pretrain throughput on chip).

Settles VERDICT r4 weak #5 with downstream evidence instead of fidelity
hand-waving: pretrain both variants at the SAME step budget on a synthetic
tone corpus, transfer each encoder into supervised CTC fine-tuning
(cfg.train.init_encoder_from — the same loop test_pseudo_label.py proves),
and compare fine-tune loss trajectories + held-out greedy WER. Equal-steps
is the conservative budget: on hardware 'all' also finishes the same steps
~32% sooner, so any tie at equal steps understates its advantage.

Run on CPU (minutes):
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/ab_infonce.py

Results are recorded in docs/PERFORMANCE.md ("InfoNCE negatives A/B").
"""

import csv
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
from scipy.io import wavfile

SR = 16000
SENTENCES = ["xin chào các bạn", "cảm ơn rất nhiều", "tạm biệt nhé",
             "không có gì", "hẹn gặp lại", "chúc mừng năm mới",
             "xin lỗi bạn", "rất vui được gặp"]

TINY = [
    "--set", "model.n_blocks=2", "--set", "model.d_model=64",
    "--set", "model.n_heads=2", "--set", "model.kernel_size=7",
    "--set", "model.lstm_hidden_dim=64", "--set", "model.dropout_rate=0.0",
    "--set", "optim.compute_dtype=float32",
    "--set", "data.batch_size=8", "--set", "data.drop_remainder=false",
    "--set", "data.bucket_boundaries_s=[2.0]",
    "--set", "data.max_audio_s=2.0", "--set", "data.max_tokens=48",
    "--set", "train.checkpoint_every_steps=0",
    "--set", "train.log_every_steps=0",
    "--dp", "1",
]


def _write_wav(path, sent_idx, seed, n=SR):
    """Each sentence gets a distinct multi-tone signature + noise; seeds
    differentiate train vs held-out renditions."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    f0 = 180 + 55 * sent_idx
    sig = (0.3 * np.sin(2 * np.pi * f0 * t)
           + 0.2 * np.sin(2 * np.pi * (f0 * 1.5 + 20) * t)
           + 0.05 * rng.standard_normal(n))
    wavfile.write(path, SR, (sig * 20000).astype(np.int16))


def _manifest(root, name, seed_base, repeats):
    rows = []
    for i, s in enumerate(SENTENCES):
        path = os.path.join(root, f"{name}{i}.wav")
        _write_wav(path, i, seed=seed_base + i)
        rows.append({"path": path, "text": s})
    out = os.path.join(root, f"{name}.csv")
    with open(out, "w", newline="", encoding="utf8") as f:
        w = csv.DictWriter(f, fieldnames=["path", "text"])
        w.writeheader()
        for _ in range(repeats):
            w.writerows(rows)
    return out


def run_variant(root, train_csv, eval_csv, impl, pretrain_steps=30,
                ft_epochs=8, seed=0):
    from conformer_tpu.cli import pretrain, train
    from conformer_tpu.config import Config
    from conformer_tpu.decode.pipeline import InferencePipeline
    from conformer_tpu.text.tokenizer import load_tokenizer

    pre_dir = os.path.join(root, f"pre_{impl}_s{seed}")
    ft_dir = os.path.join(root, f"ft_{impl}_s{seed}")
    pretrain.main([
        "--manifest", train_csv, "--method", "wav2vec2",
        "--checkpoint-dir", pre_dir, *TINY,
        "--set", "pretrain.num_vars=32", "--set", "pretrain.proj_dim=32",
        "--set", "pretrain.num_negatives=24",
        "--set", f"pretrain.negatives_impl={impl}",
        "--set", "train.num_epochs=1",
        "--set", f"train.num_steps={pretrain_steps}",
        "--set", f"train.seed={seed}",
    ])
    train.main([
        "--train-manifest", train_csv, "--checkpoint-dir", ft_dir,
        "--init-encoder-from", pre_dir, "--init-method", "wav2vec2",
        *TINY, "--set", "optim.learning_rate=3e-3",
        "--set", f"train.num_epochs={ft_epochs}",
        "--set", f"train.seed={seed}",
    ])
    losses = []
    with open(os.path.join(ft_dir, "metrics.jsonl"), encoding="utf8") as f:
        for line in f:
            rec = json.loads(line)
            if "train/epoch_loss" in rec:
                losses.append(rec["train/epoch_loss"])

    from conformer_tpu.cli.common import parse_value

    tok = load_tokenizer("vi")
    cfg = Config()
    for i in range(0, len(TINY) - 1, 2):
        if TINY[i] == "--set":
            k, v = TINY[i + 1].split("=", 1)
            cfg = cfg.override(**{k: parse_value(v)})
    pipe = InferencePipeline(cfg, tok, checkpoint_dir=ft_dir,
                             decode="greedy")
    metrics, _ = pipe.evaluate(eval_csv)
    return {"impl": impl, "ft_epoch_losses": [round(x, 4) for x in losses],
            "heldout_wer": round(metrics["wer"], 2),
            "heldout_cer": round(metrics["cer"], 2),
            "heldout_loss": round(metrics["loss"], 4)}


def main():
    results = []
    with tempfile.TemporaryDirectory() as root:
        train_csv = _manifest(root, "train", seed_base=0, repeats=8)
        eval_csv = _manifest(root, "eval", seed_base=1000, repeats=1)
        for seed in (0, 1, 2):
            for impl in ("sampled", "all"):
                r = run_variant(root, train_csv, eval_csv, impl, seed=seed)
                r["seed"] = seed
                results.append(r)
                print(json.dumps(r))
    print(json.dumps({"ab": results}, indent=2))


if __name__ == "__main__":
    main()
