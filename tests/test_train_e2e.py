"""End-to-end integration: WAV files + CSV manifest -> Trainer.fit ->
checkpoint resume -> InferencePipeline.evaluate. Exercises the full user
workflow the reference offers via train.py/test.py/infer.py."""

import csv
import os

import numpy as np
import pytest
from scipy.io import wavfile

from conformer_tpu.config import Config
from conformer_tpu.text.tokenizer import load_tokenizer

SR = 16000
SENTENCES = ["xin chào", "cảm ơn", "tạm biệt", "không có"]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("corpus")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        path = str(root / f"utt{i}.wav")
        n = SR + int(rng.integers(0, SR // 2))
        freq = 200 + 50 * (i % 4)
        t = np.arange(n) / SR
        sig = (0.3 * np.sin(2 * np.pi * freq * t)
               + 0.01 * rng.standard_normal(n)).astype(np.float32)
        wavfile.write(path, SR, (sig * 32767).astype(np.int16))
        rows.append({"path": path, "text": SENTENCES[i % 4]})
    manifest = str(root / "manifest.csv")
    with open(manifest, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["path", "text"])
        w.writeheader()
        w.writerows(rows)
    return manifest


def tiny_cfg(tmp, manifest):
    return Config().override(**{
        "model.n_blocks": 2, "model.d_model": 64, "model.n_heads": 2,
        "model.kernel_size": 7, "model.lstm_hidden_dim": 64,
        "model.dropout_rate": 0.0, "optim.compute_dtype": "float32",
        "optim.learning_rate": 3e-3,
        "augment.enabled": True,
        "data.train_manifest": manifest, "data.val_manifest": manifest,
        "data.batch_size": 4, "data.bucket_boundaries_s": [2.0],
        "data.max_audio_s": 2.0, "data.max_tokens": 32,
        "data.drop_remainder": False,
        "train.num_epochs": 2, "train.checkpoint_dir": str(tmp),
        "train.checkpoint_every_steps": 0, "train.log_every_steps": 0,
        "train.val_every_steps": 2,  # exercise mid-epoch validation

    })


class TestEndToEnd:
    def test_train_resume_eval(self, corpus, tmp_path):
        from conformer_tpu.decode.pipeline import InferencePipeline
        from conformer_tpu.train.trainer import Trainer

        tok = load_tokenizer("vi")
        cfg = tiny_cfg(tmp_path / "ckpt", corpus)

        trainer = Trainer(cfg, tok)
        trainer.fit()
        step_after = int(np.asarray(trainer.state.step))
        assert step_after == 4  # 8 utts / batch 4 * 2 epochs

        # Resume must pick up where we left off and continue.
        cfg2 = cfg.override(**{"train.num_epochs": 3})
        trainer2 = Trainer(cfg2, tok)
        assert int(np.asarray(trainer2.state.step)) == step_after
        trainer2.fit()
        assert int(np.asarray(trainer2.state.step)) == 6

        # Inference pipeline restores the checkpoint and evaluates.
        pipe = InferencePipeline(cfg, tok, checkpoint_dir=str(tmp_path / "ckpt"))
        metrics, pairs = pipe.evaluate(corpus)
        assert np.isfinite(metrics["loss"])
        assert 0 <= metrics["wer"]
        assert len(pairs) == 8
        # And file-level transcription runs.
        import pyarrow.csv as pacsv
        paths = [r["path"] for r in
                 __import__("csv").DictReader(open(corpus))][:2]
        texts = pipe.transcribe_files(paths, batch_size=2)
        assert len(texts) == 2


class TestWarmupCompile:
    def test_warmup_compiles_every_bucket(self, corpus, tmp_path):
        from conformer_tpu.train.trainer import Trainer

        tok = load_tokenizer("vi")
        cfg = tiny_cfg(tmp_path / "ckpt_w", corpus).override(**{
            "data.bucket_boundaries_s": [1.0, 2.0], "train.resume": False})
        trainer = Trainer(cfg, tok)
        assert trainer.warmup_compile(background=False) == 2

        # Background mode compiles on a thread; wait_warmup joins it.
        trainer.warmup_compile(background=True)
        trainer.wait_warmup()
        assert trainer._warmup_thread is None


class TestLoader:
    def test_bucketing_static_shapes(self, corpus):
        from conformer_tpu.data.dataset import BucketedLoader, ManifestDataset

        tok = load_tokenizer("vi")
        cfg = Config().override(**{
            "data.batch_size": 4, "data.bucket_boundaries_s": [1.2, 2.0],
            "data.max_audio_s": 2.0, "data.drop_remainder": False,
            "data.max_tokens": 32})
        ds = ManifestDataset(corpus)
        loader = BucketedLoader(ds, tok, cfg.data, training=True)
        shapes = set()
        total = 0
        for batch in loader.epoch(0):
            shapes.add(batch.audio.shape)
            total += batch.audio.shape[0]
            assert batch.audio.shape[1] in (int(1.2 * SR), 2 * SR)
            assert batch.tokens.shape[1] == 32
        assert total >= 8
        assert len(shapes) <= 2

    def test_sharded_loader_partitions(self, corpus):
        from conformer_tpu.data.dataset import BucketedLoader, ManifestDataset

        tok = load_tokenizer("vi")
        cfg = Config().override(**{"data.batch_size": 2,
                                   "data.bucket_boundaries_s": [2.0],
                                   "data.max_audio_s": 2.0,
                                   "data.drop_remainder": False})
        ds = ManifestDataset(corpus)
        seen = set()
        for shard in range(2):
            loader = BucketedLoader(ds, tok, cfg.data, shard_index=shard,
                                    shard_count=2, training=False)
            seen.update(loader.indices.tolist())
        assert seen == set(range(8))


class TestShippedConfigs:
    def test_every_example_config_loads(self):
        # Regression: configs/ once shipped a stale DataConfig.shuffle_buffer
        # key that crashed `--config configs/production_vi.json` after the
        # knob was removed. Every shipped example must load against the
        # current schema.
        import glob
        import os

        from conformer_tpu.config import Config

        root = os.path.join(os.path.dirname(__file__), "..", "configs")
        paths = sorted(glob.glob(os.path.join(root, "*.json")))
        assert len(paths) >= 4
        for p in paths:
            cfg = Config.from_json(p)
            assert cfg.model.d_model > 0, p
