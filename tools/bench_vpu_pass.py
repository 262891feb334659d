"""Measure the cost of ONE elementwise VPU pass over a score-tile-shaped
f32 buffer on the TPU, per op kind (add / mul / exp / exp2 / where /
max-reduce / sum-reduce), by timing a Pallas kernel that applies the op N
times and fitting the slope.

Purpose: a hardware-anchored roofline for the fused attention kernel
(ops/pallas/sincos_attention.py) — its per-program work is K elementwise
passes over the (TQ, L) tile plus four MXU contractions; with a measured
per-pass cost, "the kernel is VPU-bound at ~K passes" becomes a checkable
claim instead of an estimate, and the exp-vs-exp2 slope directly prices
the SINCOS_EXP2 experiment.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/conformer_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except Exception:
    pltpu = None


def _kernel(x_ref, o_ref, *, op: str, n: int):
    x = x_ref[...]
    if op == "add":
        for _ in range(n):
            x = x + 1.000001
    elif op == "mul":
        for _ in range(n):
            x = x * 1.000001
    elif op == "exp":
        for _ in range(n):
            x = jnp.exp(x * 1e-6)          # keep finite
    elif op == "exp2":
        for _ in range(n):
            x = jnp.exp2(x * 1e-6)
    elif op == "exp_raw":
        for _ in range(n):
            x = jnp.exp(x) * 1e-6          # mul kept to stop fusion tricks
    elif op == "where":
        m = x > 0.5
        for _ in range(n):
            x = jnp.where(m, x, x * 0.999999)
    elif op == "max":
        acc = x
        for _ in range(n):
            acc = acc + jnp.max(x + acc[:, :1], axis=-1, keepdims=True)
        x = acc
    elif op == "sum":
        acc = x
        for _ in range(n):
            acc = acc + jnp.sum(x + acc[:, :1], axis=-1, keepdims=True)
        x = acc
    else:
        raise ValueError(op)
    o_ref[...] = x


def run(op: str, n: int, rows: int, cols: int, grid: int, reps: int = 30):
    x = jnp.asarray(
        np.random.default_rng(0).random((grid * rows, cols), np.float32))
    vm = dict(memory_space=pltpu.VMEM) if pltpu is not None else {}
    f = pl.pallas_call(
        functools.partial(_kernel, op=op, n=n),
        grid=(grid,),
        in_specs=[pl.BlockSpec((rows, cols), lambda i: (i, 0), **vm)],
        out_specs=pl.BlockSpec((rows, cols), lambda i: (i, 0), **vm),
        out_shape=jax.ShapeDtypeStruct((grid * rows, cols), jnp.float32),
    )
    f = jax.jit(f)
    o = f(x)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(x)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / reps


def main():
    # Production-shaped tiles: (256, 199) per program like the 8s bucket's
    # attention kernel; 448 programs ~= B56*H8 per layer. Pass counts must
    # be LARGE: at realistic VPU rates a dozen passes hide entirely under
    # the block DMA and launch noise (first version measured negative
    # slopes); 64 vs 320 passes puts several ms of pure compute on the
    # clock so the slope is real.
    rows, cols, grid = 256, 199, 448
    elems = rows * cols * grid
    n_lo, n_hi = 64, 320
    print(f"tile ({rows},{cols}) x {grid} programs = {elems/1e6:.1f} M elems"
          f"  (slope over {n_hi - n_lo} passes)")
    for op in ("add", "mul", "where", "exp", "exp2", "exp_raw", "max", "sum"):
        t_lo = run(op, n_lo, rows, cols, grid, reps=10)
        t_hi = run(op, n_hi, rows, cols, grid, reps=10)
        per_pass = (t_hi - t_lo) / (n_hi - n_lo)
        print(f"{op:8s}: {per_pass*1e6:9.2f} us/pass  "
              f"({elems/per_pass/1e9:7.1f} Gelem/s)  "
              f"[n={n_lo}: {t_lo*1e3:.3f} ms, n={n_hi}: {t_hi*1e3:.3f} ms]")


if __name__ == "__main__":
    main()
