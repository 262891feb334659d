"""Micro-benchmarks: Pallas kernels vs XLA defaults on the current backend.

    python tools/bench_kernels.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, *args, n=30):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    from conformer_tpu.ops.pallas.depthwise_conv import (_xla_depthwise,
                                                         depthwise_conv1d)

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    for (b, l, c, k, dt) in [(16, 199, 512, 31, jnp.float32),
                             (16, 199, 512, 31, jnp.bfloat16),
                             (64, 199, 512, 31, jnp.bfloat16),
                             (16, 1024, 512, 31, jnp.bfloat16)]:
        x = jnp.asarray(rng.standard_normal((b, l, c)), dtype=dt)
        w = jnp.asarray(rng.standard_normal((k, c)), dtype=dt)
        bias = jnp.asarray(rng.standard_normal((c,)), dtype=dt)
        f_xla = jax.jit(lambda x, w, bias: _xla_depthwise(x, w, bias))
        f_pal = jax.jit(lambda x, w, bias: depthwise_conv1d(x, w, bias, True))
        t_x = timeit(f_xla, x, w, bias)
        t_p = timeit(f_pal, x, w, bias)
        print(f"depthwise B{b} L{l} C{c} K{k} {dt.__name__:9s}: "
              f"xla {t_x*1e6:7.1f}us  pallas {t_p*1e6:7.1f}us  "
              f"speedup {t_x/t_p:.2f}x")

        # backward
        g_xla = jax.jit(jax.grad(lambda x, w, bias: jnp.sum(
            _xla_depthwise(x, w, bias).astype(jnp.float32) ** 2),
            argnums=(0, 1)))
        g_pal = jax.jit(jax.grad(lambda x, w, bias: jnp.sum(
            depthwise_conv1d(x, w, bias, True).astype(jnp.float32) ** 2),
            argnums=(0, 1)))
        t_x = timeit(g_xla, x, w, bias)
        t_p = timeit(g_pal, x, w, bias)
        print(f"  grad:                              "
              f"xla {t_x*1e6:7.1f}us  pallas {t_p*1e6:7.1f}us  "
              f"speedup {t_x/t_p:.2f}x")


if __name__ == "__main__":
    main()
