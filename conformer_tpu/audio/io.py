"""Host-side audio I/O.

Replaces the reference's librosa load/resample path
(reference: processing/processor.py:139-153, dataset.py:30) with
stdlib/scipy-based WAV decoding and polyphase resampling. Pure host CPU —
feature extraction itself happens on-device in :mod:`conformer_tpu.audio.mel`.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    from scipy.io import wavfile as _wavfile
    from scipy.signal import resample_poly as _resample_poly
except Exception:  # pragma: no cover - scipy is expected in the image
    _wavfile = None
    _resample_poly = None

_INT_SCALE = {np.dtype(np.int16): 32768.0, np.dtype(np.int32): 2147483648.0,
              np.dtype(np.uint8): 128.0}


def _pcm_to_float(data: np.ndarray) -> np.ndarray:
    """Scale integer PCM (int16/int32/uint8) to float32 in [-1, 1]; float
    data passes through. 2-D data becomes (channels, samples)."""
    if data.dtype in _INT_SCALE:
        signal = data.astype(np.float32) / _INT_SCALE[data.dtype]
        if data.dtype == np.dtype(np.uint8):
            signal = signal - 1.0
    else:
        signal = data.astype(np.float32)
    if signal.ndim == 2:
        signal = signal.T  # (channels, samples)
    return signal


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Load a WAV file -> (float32 mono-or-multichannel signal in [-1, 1], sr).

    Multi-channel data is returned as (channels, samples) to match the
    reference's stereo call-recording handling (reference: dataset.py:29-31).

    scipy's vectorized reader goes first (~7x the native scalar loop,
    tools/bench_audio_io.py); the native C++ decoder (native/audio_io.cpp)
    covers no-scipy environments and encodings scipy rejects (e.g. some
    WAVE_FORMAT_EXTENSIBLE files).
    """
    import os as _os

    from conformer_tpu.audio import native as _native

    if not _os.path.exists(path):
        raise FileNotFoundError(path)
    scipy_err = None
    if _wavfile is not None:
        try:
            sr, data = _wavfile.read(path)
            return _pcm_to_float(data), int(sr)
        except Exception as e:  # parse error: try the native decoder
            scipy_err = e
    if _native.available():
        try:
            return _native.read_wav(path)
        except ValueError:
            pass
    if _wavfile is None and not _native.available():
        raise RuntimeError("scipy is required for WAV decoding")
    raise ValueError(f"unreadable WAV: {path}") from scipy_err


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """Load a FLAC file -> (float32 signal in [-1, 1], sr); (channels,
    samples) when multi-channel. Lossless parity with read_wav: the same PCM
    decodes to the identical float array from either container.

    Uses the native C++ decoder (native/flac.cpp) when available, the
    pure-Python mirror (conformer_tpu.audio.flac) otherwise. Closes the
    reference's librosa FLAC ingestion (reference: processing/
    processor.py:140-145); LibriSpeech ships FLAC.
    """
    from conformer_tpu.audio import native as _native

    if _native.available():
        try:
            return _native.read_flac(path)
        except ValueError:
            pass  # fall through to the pure-Python decoder for diagnostics
    from conformer_tpu.audio import flac as _flac

    return _flac.read_flac(path)


def _sniff_format(magic: bytes, what: str) -> str:
    """First post-ID3 bytes -> 'flac' | 'wav', or a named ValueError for
    recognized-but-unsupported formats. Single source of truth for both
    path (read_audio) and in-memory (decode_audio_bytes) dispatch."""
    if magic[:4] == b"fLaC":
        return "flac"
    if magic[:4] in (b"RIFF", b"RIFX"):
        return "wav"
    for prefix, name in ((b"OggS", "OGG"), (b"\xff\xfb", "MP3"),
                         (b"\xff\xf3", "MP3"), (b"\xff\xf2", "MP3")):
        if magic[: len(prefix)] == prefix:
            raise ValueError(f"{name} is not supported ({what}); "
                             "supported formats: WAV, FLAC")
    raise ValueError(f"unrecognized audio format ({what}); "
                     "supported formats: WAV, FLAC")


def _skip_id3(header: bytes) -> int:
    """-> offset past a leading ID3v2 tag (0 when none)."""
    if header[:3] == b"ID3" and len(header) >= 10:
        size = ((header[6] & 0x7F) << 21) | ((header[7] & 0x7F) << 14) | \
               ((header[8] & 0x7F) << 7) | (header[9] & 0x7F)
        return 10 + size
    return 0


def read_audio(path: str) -> Tuple[np.ndarray, int]:
    """Format-sniffing audio load: WAV (RIFF/RIFX) or FLAC by magic bytes
    -> (float32 signal in [-1, 1], sr). An ID3v2 tag is skipped before
    sniffing (tagged FLAC routes to the FLAC decoder; tagged MP3 still gets
    the named unsupported-format error)."""
    with open(path, "rb") as f:
        magic = f.read(10)
        off = _skip_id3(magic)
        if off:
            f.seek(off)
            magic = f.read(4)
    fmt = _sniff_format(magic, path)
    return read_flac(path) if fmt == "flac" else read_wav(path)


def decode_wav_bytes(raw: bytes) -> Tuple[np.ndarray, int]:
    """Decode an in-memory WAV payload with read_wav's scaling rules
    -> (float32 signal [-1, 1], (channels, samples) if multi-channel, sr)."""
    import io as _io

    if _wavfile is None:
        raise RuntimeError("scipy is required for WAV decoding")
    sr, data = _wavfile.read(_io.BytesIO(raw))
    return _pcm_to_float(data), int(sr)


def decode_audio_bytes(raw: bytes) -> Tuple[np.ndarray, int]:
    """In-memory counterpart of read_audio: same sniffing + named errors
    (serve uploads arrive as raw payloads, not paths)."""
    off = _skip_id3(raw[:10])
    fmt = _sniff_format(raw[off: off + 4], "<uploaded payload>")
    if fmt == "flac":
        from conformer_tpu.audio.flac import decode_flac_bytes

        return decode_flac_bytes(raw)
    return decode_wav_bytes(raw[off:] if off else raw)


def resample(signal: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Polyphase resampling (kaiser-windowed), float32. Native C++ polyphase
    when available, scipy.resample_poly otherwise."""
    if orig_sr == target_sr:
        return signal.astype(np.float32)
    from conformer_tpu.audio import native as _native

    if _native.available():
        return _native.resample(signal, orig_sr, target_sr)
    g = np.gcd(orig_sr, target_sr)
    return _resample_poly(signal, target_sr // g, orig_sr // g, axis=-1).astype(np.float32)


def load_audio(path: str, sample_rate: int = 16000, mono: bool = True,
               channel: Optional[int] = None) -> np.ndarray:
    """Load + resample an audio file to `sample_rate` float32.

    `channel` selects one channel of a multi-channel file; `mono` averages
    channels (librosa semantics) when no channel is selected. Container is
    sniffed by magic bytes (WAV or FLAC — read_audio).
    """
    signal, sr = read_audio(path)
    if signal.ndim == 2:
        if channel is not None:
            signal = signal[channel]
        elif mono:
            signal = signal.mean(axis=0)
    return resample(signal, sr, sample_rate)


def split_segment(signal: np.ndarray, start_s: float, end_s: float,
                  sample_rate: int = 16000) -> np.ndarray:
    """Slice [start_s, end_s) seconds (reference: processing/processor.py:147-148)."""
    return signal[int(start_s * sample_rate): int(end_s * sample_rate)]
