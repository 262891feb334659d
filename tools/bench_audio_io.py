"""Host audio-ingestion throughput: native C++ vs pure-Python decoders.

The input pipeline's audio load is the host-side hot spot the reference
paid through librosa (SURVEY §3.1); this measures what the in-repo
replacements deliver per worker core so `data.num_workers` can be sized:
decode audio-seconds per wall-second for WAV (native C++ vs scipy) and
FLAC (native C++ vs the pure-Python mirror), on synthesized LibriSpeech-
shaped utterances (16 kHz mono 16-bit, ~10 s).

    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/bench_audio_io.py
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 16000
SECONDS = 10.0
N_FILES = 8
REPEATS = 5


def main():
    from scipy.io import wavfile

    from conformer_tpu.audio import flac as pyflac
    from conformer_tpu.audio import native
    from conformer_tpu.audio.io import read_wav

    rng = np.random.default_rng(0)
    n = int(SR * SECONDS)
    with tempfile.TemporaryDirectory() as tmp:
        wavs, flacs = [], []
        for i in range(N_FILES):
            t = np.arange(n) / SR
            sig = (0.4 * np.sin(2 * np.pi * (200 + 40 * i) * t)
                   + 0.05 * rng.standard_normal(n))
            ints = np.clip(np.round(sig * 32768), -32768, 32767)
            w = os.path.join(tmp, f"u{i}.wav")
            f = os.path.join(tmp, f"u{i}.flac")
            wavfile.write(w, SR, ints.astype(np.int16))
            pyflac.write_flac(f, ints.astype(np.int64), SR)
            wavs.append(w)
            flacs.append(f)

        def bench(label, fn, paths):
            fn(paths[0])  # warm any lazy build
            t0 = time.perf_counter()
            for _ in range(REPEATS):
                for p in paths:
                    fn(p)
            dt = time.perf_counter() - t0
            rate = N_FILES * REPEATS * SECONDS / dt
            print(f"{label:28s} {rate:10.0f} audio-s/s per core")
            return rate

        results = {}
        if native.available():
            results["wav_native"] = bench("WAV native C++", native.read_wav,
                                          wavs)
            results["flac_native"] = bench("FLAC native C++",
                                           native.read_flac, flacs)
        results["wav_scipy"] = bench(
            "WAV scipy", lambda p: wavfile.read(p), wavs)
        results["flac_python"] = bench("FLAC pure-Python",
                                       pyflac.read_flac, flacs)
        results["wav_dispatch"] = bench("WAV via read_wav (dispatch)",
                                        read_wav, wavs)
        if "flac_native" in results:
            print(f"\nnative FLAC speedup over pure-Python: "
                  f"{results['flac_native'] / results['flac_python']:.0f}x")


if __name__ == "__main__":
    main()
