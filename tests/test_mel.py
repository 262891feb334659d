"""Golden tests for the log-mel frontend.

The expected values come from an independent numpy implementation written
directly from the torchaudio MelSpectrogram definition the reference uses
(reference: processing/processor.py:53-63,155-158): centered reflect-padded
frames, periodic Hann window, one-sided power DFT, slaney-scale/slaney-norm
triangular filterbank, log(clamp(mel, 1e-5)).
"""

import numpy as np
import pytest

from conformer_tpu.audio.mel import (MelFrontend, hann_window, hz_to_mel_slaney,
                                     mel_filterbank, mel_to_hz_slaney)
from conformer_tpu.config import AudioConfig


def naive_logmel(signal: np.ndarray, sr=16000, n_fft=400, hop=160, n_mels=80,
                 fmin=0.0, fmax=8000.0) -> np.ndarray:
    """Straight-line numpy reference, no shared code with the JAX impl."""
    pad = n_fft // 2
    x = np.concatenate([signal[1 : pad + 1][::-1], signal, signal[-pad - 1 : -1][::-1]])
    n_frames = len(signal) // hop + 1
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    spec = np.empty((n_frames, n_fft // 2 + 1))
    for t in range(n_frames):
        frame = x[t * hop : t * hop + n_fft] * win
        fft = np.fft.rfft(frame, n=n_fft)
        spec[t] = np.abs(fft) ** 2

    # Slaney filterbank, independently coded from the definition.
    def hz2mel(f):
        f = np.asarray(f, dtype=np.float64)
        return np.where(f < 1000.0, 3.0 * f / 200.0,
                        15.0 + 27.0 * np.log(np.maximum(f, 1000.0) / 1000.0) / np.log(6.4))

    def mel2hz(m):
        m = np.asarray(m, dtype=np.float64)
        return np.where(m < 15.0, 200.0 * m / 3.0, 1000.0 * 6.4 ** ((m - 15.0) / 27.0))

    mel_pts = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    bin_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    fb = np.zeros((n_fft // 2 + 1, n_mels))
    for m in range(n_mels):
        lo, ctr, hi = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (bin_freqs - lo) / (ctr - lo)
        down = (hi - bin_freqs) / (hi - ctr)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down)) * (2.0 / (hi - lo))

    mel = spec @ fb
    return np.log(np.maximum(mel, 1e-5))


@pytest.fixture(scope="module")
def frontend():
    return MelFrontend(AudioConfig())


def test_mel_scale_roundtrip():
    f = np.array([0.0, 250.0, 999.0, 1000.0, 4000.0, 7999.0])
    np.testing.assert_allclose(mel_to_hz_slaney(hz_to_mel_slaney(f)), f, rtol=1e-10)


def test_filterbank_shape_and_norm():
    fb = mel_filterbank(201, 80, 16000, 0.0, 8000.0)
    assert fb.shape == (201, 80)
    assert (fb >= 0).all()
    # Every filter has support.
    assert (fb.sum(axis=0) > 0).all()


def test_hann_window_periodic():
    w = hann_window(400)
    assert w[0] == 0.0
    # Periodic (torch default): w[k] = 0.5 - 0.5 cos(2 pi k / N)
    np.testing.assert_allclose(w[200], 1.0, atol=1e-6)


def test_logmel_matches_naive_reference(frontend):
    rng = np.random.default_rng(0)
    signal = rng.standard_normal(16000).astype(np.float32) * 0.1
    got = np.asarray(frontend(signal))
    want = naive_logmel(signal)
    assert got.shape == want.shape == (101, 80)
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_matmul_and_rfft_paths_agree():
    rng = np.random.default_rng(1)
    signal = rng.standard_normal(8000).astype(np.float32)
    a = np.asarray(MelFrontend(AudioConfig(stft_impl="matmul"))(signal))
    b = np.asarray(MelFrontend(AudioConfig(stft_impl="rfft"))(signal))
    np.testing.assert_allclose(a, b, atol=2e-3)


def test_batched_and_frame_lengths(frontend):
    rng = np.random.default_rng(2)
    batch = rng.standard_normal((3, 4800)).astype(np.float32)
    out = np.asarray(frontend(batch))
    assert out.shape == (3, 4800 // 160 + 1, 80)
    lengths = np.asarray(frontend.frame_lengths(np.array([4800, 1600, 160])))
    np.testing.assert_array_equal(lengths, [31, 11, 2])


def test_stft_auto_dispatches_by_traced_length(monkeypatch):
    """'auto' (the default) picks the fused Pallas kernel only at long
    traced lengths (>= AUTO_PALLAS_MIN_FRAMES; +4.2% end-to-end at the 24s
    bucket) and the matmul DFT below — and both paths agree numerically."""
    import numpy as np

    from conformer_tpu.config import AudioConfig

    fe = MelFrontend(AudioConfig(stft_impl="auto"))
    calls = []
    orig = MelFrontend._pallas_logmel

    def spy(self, signal):
        calls.append(signal.shape[-1])
        return orig(self, signal)

    monkeypatch.setattr(MelFrontend, "_pallas_logmel", spy)
    short = np.random.default_rng(0).standard_normal(16000).astype(np.float32)
    long = np.random.default_rng(1).standard_normal(
        fe.AUTO_PALLAS_MIN_FRAMES * fe.cfg.hop_length).astype(np.float32)
    out_short = np.asarray(fe(short))
    assert calls == []                      # 801 frames -> matmul path
    out_long = np.asarray(fe(long))
    assert calls == [long.size]             # >= threshold -> pallas path
    ref = np.asarray(MelFrontend(AudioConfig(stft_impl="matmul"))(long))
    np.testing.assert_allclose(out_long, ref, atol=2e-4)
    assert out_short.shape[-2] == 16000 // fe.cfg.hop_length + 1
