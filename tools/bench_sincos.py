"""TPU microbench: fused sin/cos rel-pos attention vs the XLA dense path.

Production attention shapes (B=32, H=8, dh=64, D=512) across sequence
lengths; measures forward and forward+backward. Run on the real chip:

    python tools/bench_sincos.py [--lengths 199 599 1024]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/conformer_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=30):
    f(*args)  # compile
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", type=int, nargs="+", default=[199, 599, 1024])
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from conformer_tpu.models.position import relative_positional_encoding
    from conformer_tpu.ops.rel_shift import rel_attention_xla
    from conformer_tpu.ops.pallas.sincos_attention import (
        prep_pos_kernel, rel_attention_sincos)

    B, H, dh = args.batch, 8, 64
    D = H * dh
    dt = jnp.dtype(args.dtype)
    scale = 1 / np.sqrt(dh)
    print(f"backend={jax.default_backend()} B={B} H={H} dh={dh} dtype={dt}")

    for L in args.lengths:
        rng = np.random.default_rng(0)
        mk = lambda *s: jnp.asarray(rng.standard_normal(s), dt)
        qu, qv, k, v = (mk(B, H, L, dh) for _ in range(4))
        K = mk(D, D) / np.sqrt(D)
        wh = prep_pos_kernel(K, H)
        pe = relative_positional_encoding(L, D, dt)
        p = (pe @ K).reshape(2 * L - 1, H, dh).transpose(1, 0, 2)
        lengths = jnp.full((B,), L, jnp.int32)
        g = mk(B, H, L, dh)

        probs_bf16 = os.environ.get("BENCH_PROBS", "") == "bf16"
        xla_f = jax.jit(functools.partial(rel_attention_xla, scale=scale))
        pl_f = jax.jit(lambda qu, qv, k, v, wh, ln: rel_attention_sincos(
            qu, qv, k, v, wh, ln, scale, probs_bf16=probs_bf16))

        def xla_loss(qu, qv, k, v, p):
            return jnp.sum(rel_attention_xla(qu, qv, k, v, p, lengths,
                                             scale).astype(jnp.float32) * g)

        def pl_loss(qu, qv, k, v, wh, rate=0.0, seed=None):
            return jnp.sum(rel_attention_sincos(
                qu, qv, k, v, wh, lengths, scale, rate, seed,
                probs_bf16=probs_bf16).astype(jnp.float32) * g)

        def pl_loss_drop(qu, qv, k, v, wh, seed):
            return pl_loss(qu, qv, k, v, wh, rate=0.1, seed=seed)

        xla_g = jax.jit(jax.grad(xla_loss, argnums=(0, 1, 2, 3, 4)))
        pl_g = jax.jit(jax.grad(pl_loss, argnums=(0, 1, 2, 3, 4)))
        pl_g_drop = jax.jit(jax.grad(pl_loss_drop, argnums=(0, 1, 2, 3, 4)))

        try:
            # numeric parity at bf16 tolerances
            o_x = xla_f(qu, qv, k, v, p, lengths)
            o_p = pl_f(qu, qv, k, v, wh, lengths)
            err = float(jnp.max(jnp.abs(o_x.astype(jnp.float32)
                                        - o_p.astype(jnp.float32))))
            t_fx = timeit(xla_f, qu, qv, k, v, p, lengths)
            t_fp = timeit(pl_f, qu, qv, k, v, wh, lengths)
            t_gx = timeit(xla_g, qu, qv, k, v, p)
            t_gp = timeit(pl_g, qu, qv, k, v, wh)
            t_gpd = timeit(pl_g_drop, qu, qv, k, v, wh, jnp.int32(3))
            print(f"L={L:5d} | fwd xla {t_fx:7.3f}ms pallas {t_fp:7.3f}ms "
                  f"({t_fx/t_fp:4.2f}x) | fwd+bwd xla {t_gx:7.3f}ms "
                  f"pallas {t_gp:7.3f}ms ({t_gx/t_gp:4.2f}x) "
                  f"| +dropout {t_gpd:7.3f}ms | max_err {err:.4f}")
        except Exception as e:
            print(f"L={L:5d} | FAILED: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
