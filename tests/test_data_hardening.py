"""Regression tests for data-pipeline hardening and config-knob wiring:

- producer-thread exceptions propagate to the consumer (no silent epoch
  truncation),
- remainder-batch dummy rows do not bias the CTC loss mean,
- audio longer than the last bucket is skipped in training (no impossible
  alignments) but kept — clipped, full transcript — in eval,
- evaluation loaders never drop remainder batches,
- threaded loading (num_workers) yields the same items as synchronous,
- mel_scale / decoder_norm_masked config knobs are live,
- in-memory WAV decoding scales int16/int32/uint8 identically to read_wav.
"""

import numpy as np
import pytest

from conformer_tpu.config import Config
from conformer_tpu.data.dataset import Batch, BucketedLoader, ManifestDataset
from conformer_tpu.text.tokenizer import load_tokenizer

SR = 16000


class _ArrayDataset:
    """Minimal in-memory stand-in for ManifestDataset."""

    sample_rate = SR

    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        item = self.items[i]
        if isinstance(item, Exception):
            raise item
        return item


def _utts(n, seconds=1.0, text="xin chào"):
    rng = np.random.default_rng(0)
    return [(rng.standard_normal(int(seconds * SR)).astype(np.float32) * 0.1,
             text) for _ in range(n)]


def _data_cfg(**over):
    base = {"data.batch_size": 4, "data.bucket_boundaries_s": [2.0],
            "data.max_audio_s": 2.0, "data.max_tokens": 32,
            "data.drop_remainder": False}
    base.update(over)
    return Config().override(**base).data


class TestProducerExceptions:
    def test_epoch_raises_not_truncates(self):
        tok = load_tokenizer("vi")
        ds = _ArrayDataset(_utts(8))
        cfg = _data_cfg()
        loader = BucketedLoader(ds, tok, cfg, training=True)

        boom = RuntimeError("tokenizer exploded")

        def bad_encode(texts, max_len):
            raise boom

        loader.tok = type("T", (), {"encode_batch": staticmethod(bad_encode)})()
        with pytest.raises(RuntimeError, match="tokenizer exploded"):
            list(loader.epoch(0))

    def test_unreadable_file_still_skipped(self):
        tok = load_tokenizer("vi")
        items = _utts(7) + [OSError("corrupt file")]
        loader = BucketedLoader(_ArrayDataset(items), tok, _data_cfg(),
                                training=False)
        total = sum(int((b.token_lengths > 0).sum()) for b in loader.epoch(0))
        assert total == 7


class TestRemainderRows:
    def test_loss_invariant_to_dummy_padding(self):
        from conformer_tpu.ops.ctc import ctc_loss

        rng = np.random.default_rng(1)
        logits = rng.standard_normal((3, 20, 12)).astype(np.float32)
        lengths = np.array([20, 18, 15], np.int32)
        labels = rng.integers(1, 12, (3, 6)).astype(np.int32)
        label_lengths = np.array([6, 4, 5], np.int32)

        base = float(ctc_loss(logits, lengths, labels, label_lengths,
                              row_mask=label_lengths > 0))
        # Pad with one dummy row (empty transcript, 1-frame audio).
        logits4 = np.concatenate(
            [logits, rng.standard_normal((1, 20, 12)).astype(np.float32)])
        lengths4 = np.concatenate([lengths, [1]]).astype(np.int32)
        labels4 = np.concatenate([labels, np.zeros((1, 6), np.int32)])
        ll4 = np.concatenate([label_lengths, [0]]).astype(np.int32)
        padded = float(ctc_loss(logits4, lengths4, labels4, ll4,
                                row_mask=ll4 > 0))
        assert padded == pytest.approx(base, rel=1e-6)

    def test_remainder_batch_has_empty_dummy_rows(self):
        tok = load_tokenizer("vi")
        loader = BucketedLoader(_ArrayDataset(_utts(3)), tok, _data_cfg(),
                                training=False)
        batches = list(loader.epoch(0))
        assert len(batches) == 1
        b = batches[0]
        assert b.audio.shape[0] == 4
        assert (b.token_lengths > 0).sum() == 3
        assert b.token_lengths[-1] == 0


class TestLongAudio:
    def _mixed(self):
        return _utts(4, seconds=1.0) + _utts(4, seconds=3.0)  # 3s > 2s max

    def test_training_skips_overlong(self):
        tok = load_tokenizer("vi")
        loader = BucketedLoader(_ArrayDataset(self._mixed()), tok,
                                _data_cfg(), training=True)
        rows = sum(int((b.token_lengths > 0).sum()) for b in loader.epoch(0))
        assert rows == 4  # the four 3-second utterances are dropped

    def test_training_clip_mode_keeps_them(self):
        tok = load_tokenizer("vi")
        loader = BucketedLoader(_ArrayDataset(self._mixed()), tok,
                                _data_cfg(**{"data.long_audio": "clip"}),
                                training=True)
        rows = sum(int((b.token_lengths > 0).sum()) for b in loader.epoch(0))
        assert rows == 8

    def test_eval_clips_audio_keeps_transcript(self):
        tok = load_tokenizer("vi")
        loader = BucketedLoader(_ArrayDataset(self._mixed()), tok,
                                _data_cfg(), training=False)
        rows = 0
        for b in loader.epoch(0):
            real = b.token_lengths > 0
            rows += int(real.sum())
            assert (b.audio_lengths[real] <= 2 * SR).all()
            for t in np.asarray(b.texts)[real]:
                assert t  # full transcript retained
        assert rows == 8


class TestEvalNeverDropsRemainder:
    def test_drop_remainder_forced_off_for_eval(self):
        tok = load_tokenizer("vi")
        cfg = _data_cfg(**{"data.drop_remainder": True})
        ds = _ArrayDataset(_utts(3))  # < batch_size: would yield 0 batches
        eval_loader = BucketedLoader(ds, tok, cfg, training=False)
        assert len(list(eval_loader.epoch(0))) == 1
        train_loader = BucketedLoader(ds, tok, cfg, training=True)
        assert len(list(train_loader.epoch(0))) == 0


class TestThreadedLoading:
    def test_num_workers_order_and_content(self):
        tok = load_tokenizer("vi")
        items = [(np.full(SR, i / 100, np.float32), "xin chào")
                 for i in range(10)]
        cfg_seq = _data_cfg(**{"data.num_workers": 0, "data.batch_size": 2})
        cfg_par = _data_cfg(**{"data.num_workers": 4, "data.batch_size": 2})
        seq = list(BucketedLoader(_ArrayDataset(items), tok, cfg_seq,
                                  training=False).epoch(0))
        par = list(BucketedLoader(_ArrayDataset(items), tok, cfg_par,
                                  training=False).epoch(0))
        assert len(seq) == len(par)
        for a, b in zip(seq, par):
            np.testing.assert_array_equal(a.audio, b.audio)
            np.testing.assert_array_equal(a.tokens, b.tokens)

    def test_threaded_skips_broken_rows(self):
        tok = load_tokenizer("vi")
        items = _utts(5) + [OSError("bad"), OSError("worse")] + _utts(2)
        cfg = _data_cfg(**{"data.num_workers": 3})
        loader = BucketedLoader(_ArrayDataset(items), tok, cfg, training=False)
        rows = sum(int((b.token_lengths > 0).sum()) for b in loader.epoch(0))
        assert rows == 7


class TestBucketBatchSizes:
    def test_per_bucket_sizes(self):
        tok = load_tokenizer("vi")
        items = _utts(8, seconds=1.0) + _utts(6, seconds=3.0)
        cfg = _data_cfg(**{"data.bucket_boundaries_s": [2.0, 4.0],
                           "data.max_audio_s": 4.0,
                           "data.bucket_batch_sizes": [4, 2]})
        loader = BucketedLoader(_ArrayDataset(items), tok, cfg,
                                training=True)
        sizes = {}
        for batch in loader.epoch(0):
            sizes.setdefault(batch.audio.shape[1], []).append(
                batch.audio.shape[0])
        # 1s utterances -> 2s bucket at batch 4; 3s -> 4s bucket at batch 2.
        assert sizes[2 * SR] == [4, 4]
        assert sizes[4 * SR] == [2, 2, 2]

    def test_last_entry_repeats_for_implicit_bucket(self):
        tok = load_tokenizer("vi")
        # max_audio_s appends an implicit 6s bucket; the 2-entry size list
        # must stretch to cover it.
        cfg = _data_cfg(**{"data.bucket_boundaries_s": [2.0, 4.0],
                           "data.max_audio_s": 6.0,
                           "data.bucket_batch_sizes": [4, 2]})
        loader = BucketedLoader(_ArrayDataset(_utts(2, seconds=5.0)), tok,
                                cfg, training=True)
        batches = list(loader.epoch(0))
        assert len(batches) == 1 and batches[0].audio.shape == (2, 6 * SR)

    def test_explicit_batch_size_overrides(self):
        tok = load_tokenizer("vi")
        cfg = _data_cfg(**{"data.bucket_batch_sizes": [4]})
        loader = BucketedLoader(_ArrayDataset(_utts(6)), tok, cfg,
                                training=False, batch_size=3)
        batches = list(loader.epoch(0))
        assert [b.audio.shape[0] for b in batches] == [3, 3]

    def test_size_count_mismatch_raises(self):
        tok = load_tokenizer("vi")
        cfg = _data_cfg(**{"data.bucket_boundaries_s": [2.0, 4.0],
                           "data.max_audio_s": 4.0,
                           "data.bucket_batch_sizes": [4, 2, 2, 2]})
        with pytest.raises(ValueError, match="bucket_batch_sizes"):
            BucketedLoader(_ArrayDataset(_utts(2)), tok, cfg, training=True)


class TestConfigKnobs:
    def test_mel_scale_htk_is_live(self):
        from conformer_tpu.audio.mel import mel_filterbank

        slaney = mel_filterbank(201, 80, SR, 0.0, 8000.0, "slaney", "slaney")
        htk = mel_filterbank(201, 80, SR, 0.0, 8000.0, "slaney", "htk")
        assert slaney.shape == htk.shape == (201, 80)
        assert not np.allclose(slaney, htk)
        with pytest.raises(ValueError):
            mel_filterbank(201, 80, SR, 0.0, 8000.0, "slaney", "bogus")

    def test_decoder_norm_masked_is_live(self):
        import jax

        from conformer_tpu.config import ModelConfig
        from conformer_tpu.models.conformer import Conformer

        cfg = ModelConfig.tiny()
        mels = np.random.default_rng(0).standard_normal(
            (2, 64, 80)).astype(np.float32)
        lengths = np.array([64, 30], np.int32)  # padded row matters

        def logits(**over):
            import dataclasses
            c = dataclasses.replace(cfg, **over)
            model = Conformer(c, deterministic=False)
            vs = model.init({"params": jax.random.PRNGKey(0)},
                            mels, lengths)
            (out, _), _ = model.apply(vs, mels, lengths,
                                      mutable=["batch_stats"])
            return np.asarray(out)

        masked = logits(decoder_norm_masked=True)
        unmasked = logits(decoder_norm_masked=False)
        assert not np.allclose(masked, unmasked)


class TestWavBytes:
    def test_bytes_match_read_wav_for_all_pcm_dtypes(self, tmp_path):
        import io as _io

        from scipy.io import wavfile

        from conformer_tpu.audio.io import decode_wav_bytes, read_wav

        rng = np.random.default_rng(2)
        sig = (rng.standard_normal(SR // 4) * 0.3).clip(-1, 1)
        encodings = {
            "int16": (sig * 32767).astype(np.int16),
            "int32": (sig * 2147483647).astype(np.int32),
            "uint8": ((sig * 127) + 128).astype(np.uint8),
            "float32": sig.astype(np.float32),
        }
        for name, data in encodings.items():
            path = str(tmp_path / f"{name}.wav")
            wavfile.write(path, SR, data)
            from_file, sr1 = read_wav(path)
            raw = open(path, "rb").read()
            from_bytes, sr2 = decode_wav_bytes(raw)
            assert sr1 == sr2 == SR
            np.testing.assert_allclose(from_bytes, from_file, atol=1e-6)
            # And the decoded signal is actually in [-1, 1] (the old server
            # fed int32 WAVs through unscaled).
            assert np.abs(from_bytes).max() <= 1.0 + 1e-6
