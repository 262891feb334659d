"""ctypes binding for the native audio I/O library (native/audio_io.cpp).

Builds the shared library on first use (g++, cached). `available()` gates the
fast path; conformer_tpu.audio.io transparently falls back to scipy when the
toolchain or library is missing.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LOCK = threading.Lock()
_LIB: "Optional[ctypes.CDLL] | bool" = None   # None=untried, False=unavailable

KAISER_BETA = 5.0        # scipy resample_poly default window ('kaiser', 5.0)
HALF_LEN_MULT = 10       # scipy default half_len = 10 * max(up, down)


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB or None
        srcs = [os.path.join(_NATIVE_DIR, "audio_io.cpp"),
                os.path.join(_NATIVE_DIR, "flac.cpp")]
        so = os.path.join(_NATIVE_DIR, "libaudio_io.so")
        try:
            if not os.path.exists(so) or any(
                    os.path.getmtime(so) < os.path.getmtime(s) for s in srcs):
                subprocess.run(
                    ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", *srcs,
                     "-o", so], check=True, capture_output=True, text=True)
            lib = ctypes.CDLL(so)
        except Exception:
            _LIB = False
            return None
        lib.audio_wav_info.restype = ctypes.c_int
        lib.audio_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long)]
        lib.audio_wav_read.restype = ctypes.c_int
        lib.audio_wav_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        lib.audio_flac_info.restype = ctypes.c_int
        lib.audio_flac_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long)]
        lib.audio_flac_read.restype = ctypes.c_int
        lib.audio_flac_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long]
        lib.audio_resample_out_len.restype = ctypes.c_long
        lib.audio_resample_out_len.argtypes = [ctypes.c_long, ctypes.c_int,
                                               ctypes.c_int]
        lib.audio_resample.restype = ctypes.c_long
        lib.audio_resample.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.c_double, ctypes.c_int]
        _LIB = lib
        return lib


def available() -> bool:
    return _load() is not None


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """-> (float32 signal — (samples,) mono or (channels, samples) — , sr)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    sr = ctypes.c_int()
    channels = ctypes.c_int()
    frames = ctypes.c_long()
    if lib.audio_wav_info(path.encode(), ctypes.byref(sr),
                          ctypes.byref(channels), ctypes.byref(frames)) != 0:
        raise ValueError(f"unreadable WAV: {path}")
    total = frames.value * channels.value
    buf = np.empty((total,), np.float32)
    if lib.audio_wav_read(path.encode(),
                          buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                          total) != 0:
        raise ValueError(f"unreadable WAV: {path}")
    if channels.value > 1:
        return buf.reshape(frames.value, channels.value).T.copy(), sr.value
    return buf, sr.value


def read_flac(path: str) -> Tuple[np.ndarray, int]:
    """-> (float32 signal — (samples,) mono or (channels, samples) — , sr),
    scaled by 2^-(bps-1) to match the WAV path (native/flac.cpp)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    sr = ctypes.c_int()
    channels = ctypes.c_int()
    frames = ctypes.c_long()
    if lib.audio_flac_info(path.encode(), ctypes.byref(sr),
                           ctypes.byref(channels), ctypes.byref(frames)) != 0:
        raise ValueError(f"unreadable FLAC: {path}")
    total = frames.value * channels.value
    buf = np.empty((total,), np.float32)
    if lib.audio_flac_read(path.encode(),
                           buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                           total) != 0:
        raise ValueError(f"unreadable FLAC: {path}")
    if channels.value > 1:
        return buf.reshape(frames.value, channels.value).T.copy(), sr.value
    return buf, sr.value


def resample(signal: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    if orig_sr == target_sr:
        return signal.astype(np.float32)
    g = int(np.gcd(orig_sr, target_sr))
    up, down = target_sr // g, orig_sr // g

    def one(x: np.ndarray) -> np.ndarray:
        x = np.ascontiguousarray(x, np.float32)
        cap = lib.audio_resample_out_len(len(x), up, down)
        out = np.empty((cap,), np.float32)
        n = lib.audio_resample(
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x), up, down,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), cap,
            KAISER_BETA, HALF_LEN_MULT)
        return out[:n]

    if signal.ndim == 2:
        return np.stack([one(ch) for ch in signal])
    return one(signal)
