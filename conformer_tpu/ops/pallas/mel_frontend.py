"""Pallas TPU kernel: fused log-mel frontend (frame + window + DFT + mel + log).

One kernel replaces the XLA chain frame-gather -> windowed-DFT matmul ->
power -> mel matmul -> log (conformer_tpu.audio.mel): the framed (T, n_fft)
matrix and the (T, n_bins) power spectrogram stay in VMEM and never reach HBM.

Framing trick: with hop | n_fft relationships like 400 = 2*160 + 80, a
contiguous audio tile reshaped to hop-sized rows yields every frame as a
concatenation of whole rows plus a leading slice of the next row — all static
slices, no gather:

    R = tile.reshape(TF + 2, hop)
    frames = concat([R[i : i+TF] for i in 0..k-1] + [R[k : k+TF, :rem]], axis=1)

Requires win_length == n_fft and reflect padding done by the (cheap) XLA
prologue. The prologue also pre-slices each (batch, tile) pair's contiguous
audio span into a row of a (B*n_tiles, span) matrix (static strided slices,
~1% duplicated samples at the tile seams): per-program blocks are then plain
8-row slabs, satisfying Mosaic's (8, 128) tiling rules at ANY batch size and
keeping per-program VMEM bounded by the tile length instead of the full
utterance length.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
    _VMEM = pltpu.VMEM
except Exception:  # pragma: no cover
    pltpu = None
    _VMEM = None


def _kernel(audio_ref, dft_ref, fb_ref, out_ref, *, tf: int, hop: int,
            n_fft: int, n_bins: int, clamp: float):
    """audio spans (RB, rows, hop) in VMEM -> log-mels (RB, TF, n_mels).
    The hop-rows reshape happens in the XLA prologue: a 1D->2D reshape
    inside the kernel is an unsupported Mosaic shape cast."""
    rb = audio_ref.shape[0]
    whole = n_fft // hop          # whole hop-rows per frame
    rem = n_fft - whole * hop     # leading remainder of the next row
    for r in range(rb):
        tile = audio_ref[r]
        # frames @ DFT decomposed as a sum of per-part matmuls: frame i is
        # [R[i..i+tf) rows | leading rem of the next row], so multiplying
        # each part against the matching DFT row block and summing equals
        # the concatenated-frame product — and Mosaic cannot concatenate
        # slices whose sublane offsets differ ("offset mismatch on
        # non-concat dimension").
        proj = None
        for i in range(whole):
            part = jax.lax.slice(tile, (i, 0), (i + tf, hop))
            dft_rows = jax.lax.slice(dft_ref[:], (i * hop, 0),
                                     ((i + 1) * hop, 2 * n_bins))
            term = jnp.dot(part, dft_rows,
                           preferred_element_type=jnp.float32)
            proj = term if proj is None else proj + term
        if rem:
            part = jax.lax.slice(tile, (whole, 0), (whole + tf, rem))
            dft_rows = jax.lax.slice(dft_ref[:], (whole * hop, 0),
                                     (whole * hop + rem, 2 * n_bins))
            proj = proj + jnp.dot(part, dft_rows,
                                  preferred_element_type=jnp.float32)
        re = proj[:, :n_bins]
        im = proj[:, n_bins:]
        power = re * re + im * im
        mel = jnp.dot(power, fb_ref[:], preferred_element_type=jnp.float32)
        out_ref[r] = jnp.log(jnp.maximum(mel, clamp))


def logmel_pallas(padded_audio: jnp.ndarray, dft: jnp.ndarray,
                  fb: jnp.ndarray, hop: int, n_fft: int, n_frames: int,
                  clamp: float = 1e-5, frames_per_tile: int = 256,
                  rows_per_program: int = 8,
                  interpret: bool = False) -> jnp.ndarray:
    """padded_audio: (B, S_pad) already reflect-padded; -> (B, n_frames, n_mels).

    S_pad must cover (n_tiles*TF - 1)*hop + n_fft; this wrapper zero-pads the
    tail as needed.
    """
    b, s_pad = padded_audio.shape
    n_bins = n_fft // 2 + 1
    n_mels = fb.shape[1]
    tf = min(frames_per_tile, n_frames)
    n_tiles = -(-n_frames // tf)
    padded_frames = n_tiles * tf
    whole = n_fft // hop
    rem = n_fft - whole * hop
    rows_extra = whole + (1 if rem else 0)
    span = (tf + rows_extra) * hop
    need = (padded_frames + rows_extra) * hop
    if s_pad < need:
        padded_audio = jnp.pad(padded_audio, ((0, 0), (0, need - s_pad)))
        s_pad = need

    # (B, S) -> (B*n_tiles, rows, hop): one contiguous span per
    # (batch, tile), pre-reshaped into hop-sized rows for the kernel.
    rows = tf + rows_extra
    spans = jnp.stack([padded_audio[:, t * tf * hop: t * tf * hop + span]
                       for t in range(n_tiles)], axis=1)
    spans = spans.reshape(b * n_tiles, rows, hop)
    n_rows = spans.shape[0]
    rb = max(1, min(rows_per_program, n_rows))
    while n_rows % rb:
        rb -= 1

    kern = functools.partial(_kernel, tf=tf, hop=hop, n_fft=n_fft,
                             n_bins=n_bins, clamp=clamp)
    vm = {"memory_space": _VMEM} if _VMEM and not interpret else {}
    out = pl.pallas_call(
        kern,
        grid=(n_rows // rb,),
        in_specs=[
            pl.BlockSpec((rb, rows, hop), lambda ri: (ri, 0, 0), **vm),
            pl.BlockSpec((n_fft, 2 * n_bins), lambda ri: (0, 0), **vm),
            pl.BlockSpec((n_bins, n_mels), lambda ri: (0, 0), **vm),
        ],
        out_specs=pl.BlockSpec((rb, tf, n_mels), lambda ri: (ri, 0, 0), **vm),
        out_shape=jax.ShapeDtypeStruct((n_rows, tf, n_mels), jnp.float32),
        interpret=interpret,
    )(spans, dft, fb)
    out = out.reshape(b, padded_frames, n_mels)
    return out[:, :n_frames]
