"""Semi-supervised round trip, end-to-end through the CLIs (BASELINE config 5;
reference intent: semi/create_label.py:7 + README's semi diagram, never
shipped): pretrain (self-supervised) -> transfer encoder -> supervised CTC
train -> pseudo-label unlabeled audio with cli/pseudo_label.py -> retrain on
the merged manifest. Asserts the CLI produces a valid filtered manifest and
the retrain loss improves."""

import csv
import json
import os

import numpy as np
import pytest
from scipy.io import wavfile

SR = 16000
SENTENCES = ["xin chào", "cảm ơn", "tạm biệt", "không có"]

TINY = [
    "--set", "model.n_blocks=1", "--set", "model.d_model=64",
    "--set", "model.n_heads=2", "--set", "model.kernel_size=7",
    "--set", "model.lstm_hidden_dim=64", "--set", "model.dropout_rate=0.0",
    "--set", "optim.compute_dtype=float32",
    "--set", "data.batch_size=4", "--set", "data.drop_remainder=false",
    "--set", 'data.bucket_boundaries_s=[2.0]', "--set", "data.max_audio_s=2.0",
    "--set", "data.max_tokens=32", "--set", "train.checkpoint_every_steps=0",
    "--set", "train.log_every_steps=0",
    "--dp", "1",  # single device on the 8-virtual-device test mesh
]


def _write_wav(path: str, freq: float, seed: int, n: int = SR) -> None:
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    sig = 0.3 * np.sin(2 * np.pi * freq * t) + 0.01 * rng.standard_normal(n)
    wavfile.write(path, SR, (sig * 32767).astype(np.int16))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """4 labeled + 4 unlabeled utterances (distinct tones/noise)."""
    root = tmp_path_factory.mktemp("semi")
    labeled_rows, unlabeled_rows = [], []
    for i in range(4):
        path = str(root / f"lab{i}.wav")
        _write_wav(path, 200 + 60 * i, seed=i)
        labeled_rows.append({"path": path, "text": SENTENCES[i]})
    for i in range(4):
        path = str(root / f"unl{i}.wav")
        _write_wav(path, 230 + 60 * i, seed=100 + i)
        unlabeled_rows.append({"path": path})

    labeled = str(root / "labeled.csv")
    with open(labeled, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["path", "text"])
        w.writeheader()
        # Repeat rows so one epoch is several overfitting steps.
        for _ in range(10):
            w.writerows(labeled_rows)
    unlabeled = str(root / "unlabeled.csv")
    with open(unlabeled, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["path"])
        w.writeheader()
        w.writerows(unlabeled_rows)
    return {"root": root, "labeled": labeled, "unlabeled": unlabeled,
            "unlabeled_paths": [r["path"] for r in unlabeled_rows]}


@pytest.mark.heavy
def test_semi_supervised_round_trip(corpus):
    from conformer_tpu.cli import pretrain, pseudo_label, train

    root = corpus["root"]
    pre_dir = str(root / "pretrain_ckpt")
    sup_dir = str(root / "ctc_ckpt")
    retrain_dir = str(root / "retrain_ckpt")

    # 1. Self-supervised pretraining on audio only (labels unused).
    pretrain.main([
        "--manifest", corpus["labeled"], "--method", "wav2vec2",
        "--checkpoint-dir", pre_dir, *TINY,
        "--set", "pretrain.num_vars=16", "--set", "pretrain.proj_dim=32",
        "--set", "train.num_epochs=1", "--set", "train.num_steps=3",
    ])
    assert os.path.isdir(pre_dir) and os.listdir(pre_dir)

    # 2. Supervised CTC training, encoder transferred from the pretrain
    #    checkpoint (cfg.train.init_encoder_from path through the Trainer).
    train.main([
        "--train-manifest", corpus["labeled"], "--checkpoint-dir", sup_dir,
        "--init-encoder-from", pre_dir, "--init-method", "wav2vec2",
        *TINY, "--set", "optim.learning_rate=3e-3",
        "--set", "train.num_epochs=6",
    ])

    # 3. Pseudo-label the unlabeled audio with our own trained model
    #    (what the reference's semi/create_label.py never implemented).
    pseudo = str(root / "pseudo.csv")
    pseudo_label.main([
        "--manifest", corpus["unlabeled"], "--checkpoint-dir", sup_dir,
        "--output", pseudo, "--min-confidence", "-5.0", *TINY,
    ])
    with open(pseudo, newline="", encoding="utf8") as f:
        rows = list(csv.DictReader(f))
    assert rows, "pseudo-labeling produced no usable utterances"
    for row in rows:
        assert row["path"] in corpus["unlabeled_paths"]
        assert row["text"].strip()
        assert float(row["confidence"]) >= -5.0

    # The confidence filter must actually filter: an impossible threshold
    # (max log-prob is <= 0) keeps nothing.
    empty = str(root / "pseudo_none.csv")
    pseudo_label.main([
        "--manifest", corpus["unlabeled"], "--checkpoint-dir", sup_dir,
        "--output", empty, "--min-confidence", "1.0", *TINY,
    ])
    with open(empty, newline="", encoding="utf8") as f:
        assert list(csv.DictReader(f)) == []

    # 4. Retrain on labeled + pseudo-labeled and require the loss to improve
    #    across epochs (the loop composes; nothing degenerates).
    merged = str(root / "merged.csv")
    with open(corpus["labeled"], newline="", encoding="utf8") as f:
        merged_rows = [{"path": r["path"], "text": r["text"]}
                       for r in csv.DictReader(f)]
    merged_rows += [{"path": r["path"], "text": r["text"]} for r in rows]
    with open(merged, "w", newline="", encoding="utf8") as f:
        w = csv.DictWriter(f, fieldnames=["path", "text"])
        w.writeheader()
        w.writerows(merged_rows)

    train.main([
        "--train-manifest", merged, "--checkpoint-dir", retrain_dir,
        *TINY, "--set", "optim.learning_rate=3e-3",
        "--set", "train.num_epochs=3",
    ])
    epoch_losses = []
    with open(os.path.join(retrain_dir, "metrics.jsonl"), encoding="utf8") as f:
        for line in f:
            rec = json.loads(line)
            if "train/epoch_loss" in rec:
                epoch_losses.append(rec["train/epoch_loss"])
    assert len(epoch_losses) == 3
    assert all(np.isfinite(epoch_losses))
    assert epoch_losses[-1] < epoch_losses[0], epoch_losses
