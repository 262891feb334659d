"""Price TPU dynamic-gather DESCRIPTORS vs gathered ELEMENTS.

The device beam search is gather-bound (ops/beam_search_device.py): the
xplane trace prices single-element gathers at ~6.6 ns/element, but a
(9120, 17) row gather ran at ~3.2 ns/ROW (~0.2 ns/element) — suggesting
the scalar core pays per gather DESCRIPTOR (one per indexed row/slice),
not per element, with the row copy itself riding the vector path.

If that holds for NARROW rows (width 2-8), packing each LM-table slot's
(key, logp, backoff) into one contiguous row halves the probe descriptor
count outright (today key and value are separate arrays = 2 descriptors
per slot). This bench measures gather time vs (descriptor count, row
width) at the real operating scale to confirm before surgery.

Variants (all from a table of S rows, N query indices, reps-timed):
  flat1   out[N]      <- u32[S]         N descriptors, 1 elem each (today)
  flat2   2x out[N]   <- two u32[S]     2N descriptors (key+value today)
  rowW    out[N, W]   <- u32[S, W]      N descriptors, W elems each
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/conformer_tpu_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def _time(f, *args, reps=30):
    o = f(*args)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(reps):
        o = f(*args)
    jax.block_until_ready(o)
    return (time.perf_counter() - t0) / reps


def main():
    s = 327680                  # real LM table: 5 orders x 65536 slots
    n = 91200                   # real probe count: 48 x 190 x 10
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, s, size=(n,), dtype=np.int64)
                      .astype(np.int32))
    tab1 = jnp.asarray(rng.integers(0, 2**32, size=(s,), dtype=np.uint64)
                       .astype(np.uint32))
    tab1b = tab1 ^ np.uint32(0x9E3779B9)

    # Per-iteration index perturbation stops XLA from hoisting the gather
    # out of the rep loop if it ever gets fused; cheap (one VPU pass).
    @jax.jit
    def flat1(t, ix):
        return t[ix].astype(jnp.uint32).sum()

    @jax.jit
    def flat2(ta, tb, ix):
        return (ta[ix] ^ tb[ix]).sum()

    t = _time(flat1, tab1, idx)
    print(f"flat1  : {t*1e3:8.3f} ms  {t/n*1e9:7.2f} ns/desc "
          f"({n} descriptors, 1 elem)")
    t2 = _time(flat2, tab1, tab1b, idx)
    print(f"flat2  : {t2*1e3:8.3f} ms  {t2/(2*n)*1e9:7.2f} ns/desc "
          f"({2*n} descriptors, 1 elem) [today's key+value scheme]")

    for w in (2, 4, 8, 16):
        tabw = jnp.asarray(
            rng.integers(0, 2**32, size=(s, w), dtype=np.uint64)
            .astype(np.uint32))

        @jax.jit
        def roww(tw, ix):
            return tw[ix].sum()

        tr = _time(roww, tabw, idx)
        print(f"row{w:<4d}: {tr*1e3:8.3f} ms  {tr/n*1e9:7.2f} ns/desc "
              f"({n} descriptors, {w} elems = {n*w} gathered)")

    # Half the descriptors at width 2 vs flat2's 2N — the packed-slot bet.
    tab2 = jnp.asarray(rng.integers(0, 2**32, size=(s, 2), dtype=np.uint64)
                       .astype(np.uint32))

    @jax.jit
    def packed(tw, ix):
        g = tw[ix]                         # (N, 2): key | value
        return (g[:, 0] ^ g[:, 1]).sum()

    tp = _time(packed, tab2, idx)
    print(f"packed2: {tp*1e3:8.3f} ms  vs flat2 {t2*1e3:.3f} ms -> "
          f"{t2/tp:4.2f}x  [the packed-slot win if >1]")

    # ------------------------------------------------------------------
    # IN-LOOP regime: the real decode runs its gathers inside a frame
    # while-loop where each frame's indices depend on the previous
    # frame's gathered data (beam state). Out-of-loop gathers pipeline
    # to ~0.3 ns/desc; the trace prices the SAME shapes in-loop at
    # ~6.6 ns/element (single) and ~3.2 ns/ROW (17-wide) — this section
    # reproduces that regime with a data-dependent fori_loop carry.
    # ------------------------------------------------------------------
    iters = 200
    maskv = np.uint32(s - 1)

    def _loop(idx0, step):
        def body(i, ix):
            dep = step(ix)                       # (N,) u32, data-dependent
            return ((ix.astype(jnp.uint32) + dep + jnp.uint32(i))
                    & maskv).astype(jnp.int32)
        return jax.lax.fori_loop(0, iters, body, idx0).sum()

    def time_loop(name, step, n_desc_per_iter):
        f = jax.jit(lambda ix: _loop(ix, step))
        t = _time(f, idx, reps=5)
        per = t / iters
        print(f"LOOP {name:9s}: {per*1e6:8.2f} us/iter  "
              f"{per/n_desc_per_iter*1e9:7.2f} ns/desc "
              f"({n_desc_per_iter} desc/iter)")
        return per

    t_null = time_loop("null", lambda ix: ix.astype(jnp.uint32), 1)
    time_loop("flat1", lambda ix: tab1[ix], n)
    time_loop("flat2", lambda ix: tab1[ix] ^ tab1b[ix], 2 * n)
    tabs = {}
    for w in (2, 4, 8, 16, 32):
        tabs[w] = jnp.asarray(
            rng.integers(0, 2**32, size=(s, w), dtype=np.uint64)
            .astype(np.uint32))
        time_loop(f"row{w}",
                  (lambda tw: lambda ix: tw[ix][:, 0] ^ tw[ix][:, 1])(
                      tabs[w]), n)
    print(f"LOOP null floor: {t_null*1e6:.2f} us/iter (carry update only)")


if __name__ == "__main__":
    main()
