"""Log-mel spectrogram frontend in pure JAX.

Numerically reproduces the reference frontend — torchaudio
``MelSpectrogram(sample_rate=16000, n_fft=400, win_length=400, hop_length=160,
f_min=0, f_max=8000, n_mels=80, norm='slaney', mel_scale='slaney')`` followed by
``log(clamp(mel, 1e-5))`` (reference: processing/processor.py:53-63,155-158) —
but is built TPU-first:

- The windowed DFT is expressed as a single real matmul ``frames @ W`` with
  ``W = [window*cos; window*sin]`` so the hot op runs on the MXU
  (``stft_impl='matmul'``). An ``'rfft'`` path using XLA's FFT is kept for
  cross-checking.
- The mel projection is a second matmul; XLA fuses the power/log elementwise
  ops into the matmul epilogues.
- Everything is static-shape and jit-friendly; batching is a plain leading dim.

Output layout is time-major ``(..., n_frames, n_mels)`` (the natural layout for
the encoder); the reference's channel-first ``(B, n_mels, T)`` is just a
transpose away.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.config import AudioConfig

_MEL_BREAK_HZ = 1000.0
_MEL_BREAK = 15.0          # slaney mels at 1 kHz (= 1000 / (200/3))
_MEL_LOGSTEP = float(np.log(6.4) / 27.0)


def hz_to_mel_slaney(freq: np.ndarray) -> np.ndarray:
    """Slaney-scale Hz->mel: linear below 1 kHz, logarithmic above."""
    freq = np.asarray(freq, dtype=np.float64)
    mels = freq / (200.0 / 3.0)
    log_region = freq >= _MEL_BREAK_HZ
    mels = np.where(
        log_region,
        _MEL_BREAK + np.log(np.maximum(freq, _MEL_BREAK_HZ) / _MEL_BREAK_HZ) / _MEL_LOGSTEP,
        mels,
    )
    return mels


def mel_to_hz_slaney(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    freq = mels * (200.0 / 3.0)
    log_region = mels >= _MEL_BREAK
    freq = np.where(log_region, _MEL_BREAK_HZ * np.exp(_MEL_LOGSTEP * (mels - _MEL_BREAK)), freq)
    return freq


def hz_to_mel_htk(freq: np.ndarray) -> np.ndarray:
    """HTK-scale Hz->mel: 2595 log10(1 + f/700)."""
    freq = np.asarray(freq, dtype=np.float64)
    return 2595.0 * np.log10(1.0 + freq / 700.0)


def mel_to_hz_htk(mels: np.ndarray) -> np.ndarray:
    mels = np.asarray(mels, dtype=np.float64)
    return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    fmin: float,
    fmax: float,
    norm: Optional[str] = "slaney",
    mel_scale: str = "slaney",
) -> np.ndarray:
    """(n_freqs, n_mels) triangular mel filterbank.

    Triangles are computed in Hz over the linear FFT bin frequencies with
    mel-spaced center points ('slaney' — the reference parameterization,
    processor.py:53-63 — or 'htk'), with optional slaney area normalization —
    the same construction torchaudio's `melscale_fbanks` performs.
    """
    if mel_scale == "htk":
        hz_to_mel, mel_to_hz = hz_to_mel_htk, mel_to_hz_htk
    elif mel_scale == "slaney":
        hz_to_mel, mel_to_hz = hz_to_mel_slaney, mel_to_hz_slaney
    else:
        raise ValueError(f"unknown mel_scale: {mel_scale!r}")
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    f_pts = mel_to_hz(mel_pts)

    f_diff = np.diff(f_pts)                                  # (n_mels + 1,)
    slopes = f_pts[None, :] - all_freqs[:, None]             # (n_freqs, n_mels + 2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(np.float32)


def hann_window(win_length: int) -> np.ndarray:
    """Periodic Hann window (torch.hann_window default)."""
    n = np.arange(win_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)).astype(np.float32)


def _dft_matrix(n_fft: int, window: np.ndarray) -> np.ndarray:
    """(n_fft, 2*(n_fft//2+1)) real matrix computing the windowed one-sided DFT.

    frames @ W yields [real | -imag] stacked on the last axis; the power
    spectrum is the sum of squares of the two halves, so the sign of the
    imaginary part is irrelevant.
    """
    n_bins = n_fft // 2 + 1
    t = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * t * k / n_fft
    cos = np.cos(ang) * window[:, None]
    sin = np.sin(ang) * window[:, None]
    return np.concatenate([cos, sin], axis=1).astype(np.float32)


def frame_signal(signal: jnp.ndarray, n_fft: int, hop_length: int) -> jnp.ndarray:
    """(..., num_samples) -> (..., n_frames, n_fft) centered frames.

    Reflect-pads n_fft//2 on both sides (torch.stft center=True semantics) then
    extracts overlapping frames with a static gather.
    """
    pad = n_fft // 2
    num_samples = signal.shape[-1]
    n_frames = num_samples // hop_length + 1
    padded = jnp.pad(
        signal,
        [(0, 0)] * (signal.ndim - 1) + [(pad, pad)],
        mode="reflect",
    )
    idx = np.arange(n_frames)[:, None] * hop_length + np.arange(n_fft)[None, :]
    return padded[..., idx]


class MelFrontend:
    """Precomputed-constant log-mel frontend. Instances are cheap pytree-free
    callables safe to close over inside jit."""

    def __init__(self, cfg: AudioConfig | None = None):
        cfg = cfg or AudioConfig()
        if cfg.win_length != cfg.n_fft:
            raise NotImplementedError("win_length != n_fft not supported yet")
        self.cfg = cfg
        self.n_bins = cfg.n_fft // 2 + 1
        window = hann_window(cfg.win_length)
        self._window = jnp.asarray(window)
        self._dft = jnp.asarray(_dft_matrix(cfg.n_fft, window))
        self._fb = jnp.asarray(
            mel_filterbank(self.n_bins, cfg.n_mels, cfg.sample_rate, cfg.fmin,
                           cfg.fmax, cfg.mel_norm, cfg.mel_scale)
        )

    def power_spectrogram(self, signal: jnp.ndarray) -> jnp.ndarray:
        """(..., samples) -> (..., n_frames, n_bins) power spectrogram."""
        frames = frame_signal(signal, self.cfg.n_fft, self.cfg.hop_length)
        if self.cfg.stft_impl != "rfft":
            proj = jnp.einsum(
                "...tn,nk->...tk", frames, self._dft,
                preferred_element_type=jnp.float32,
            )
            re, im = proj[..., : self.n_bins], proj[..., self.n_bins :]
            return re * re + im * im
        else:
            spec = jnp.fft.rfft(frames * self._window, n=self.cfg.n_fft, axis=-1)
            return (spec.real**2 + spec.imag**2).astype(jnp.float32)

    # 'auto' threshold: the fused Pallas kernel is NEUTRAL at the 8s bucket
    # (801 frames; XLA overlaps the frontend), +1.5% at 16s (1601 frames)
    # and +5.3% at 24s (2401 frames), where the XLA frame-extraction gather
    # goes pathological — 9.6 ms/step, 13x its 8s cost for 3x the data (r5
    # 24s-bucket attribution + same-session pairs, docs/PERFORMANCE.md).
    # Frame counts are static at trace time, so the dispatch is per-bucket.
    AUTO_PALLAS_MIN_FRAMES = 1600

    def __call__(self, signal: jnp.ndarray) -> jnp.ndarray:
        """(..., samples) -> (..., n_frames, n_mels) log-mel features."""
        impl = self.cfg.stft_impl
        if impl == "auto":
            n_frames = signal.shape[-1] // self.cfg.hop_length + 1
            impl = ("pallas" if n_frames >= self.AUTO_PALLAS_MIN_FRAMES
                    else "matmul")
        if impl == "pallas":
            return self._pallas_logmel(signal)
        power = self.power_spectrogram(signal)
        mel = jnp.einsum(
            "...tk,km->...tm", power, self._fb, preferred_element_type=jnp.float32
        )
        return jnp.log(jnp.clip(mel, min=self.cfg.log_clamp_min))

    def _pallas_logmel(self, signal: jnp.ndarray) -> jnp.ndarray:
        """Fused frame+window+DFT+mel+log kernel (TPU); XLA fallback elsewhere."""
        import jax

        squeeze = signal.ndim == 1
        if squeeze:
            signal = signal[None]
        if jax.default_backend() not in ("tpu", "axon"):
            power = self.power_spectrogram(signal)
            mel = jnp.einsum("...tk,km->...tm", power, self._fb,
                             preferred_element_type=jnp.float32)
            out = jnp.log(jnp.clip(mel, min=self.cfg.log_clamp_min))
        else:
            from conformer_tpu.ops.pallas.mel_frontend import logmel_pallas

            pad = self.cfg.n_fft // 2
            padded = jnp.pad(signal, ((0, 0), (pad, pad)), mode="reflect")
            n_frames = signal.shape[-1] // self.cfg.hop_length + 1
            out = logmel_pallas(padded, self._dft, self._fb,
                                self.cfg.hop_length, self.cfg.n_fft, n_frames,
                                self.cfg.log_clamp_min)
        return out[0] if squeeze else out

    def frame_lengths(self, sample_lengths: jnp.ndarray) -> jnp.ndarray:
        """Valid frame count per utterance (reference: processing/processor.py:392)."""
        return sample_lengths // self.cfg.hop_length + 1


@functools.lru_cache(maxsize=4)
def default_frontend(**kwargs) -> MelFrontend:
    return MelFrontend(AudioConfig(**kwargs))
