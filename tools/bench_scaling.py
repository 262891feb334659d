"""Scaling-efficiency harness: DP (and optional TP) throughput across mesh sizes.

Measures the BASELINE.json north-star scaling metric: audio-seconds/s at
1 chip vs N chips, efficiency = throughput_N / (N * throughput_1). On real
multi-chip slices run as-is; on a single-chip or CPU box use --simulate to
validate the harness over virtual devices (numbers then reflect host math,
not ICI).

    python tools/bench_scaling.py [--sizes 1 2 4 8] [--tp 1] [--simulate]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--sizes", type=int, nargs="+", default=None)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--per-device-batch", type=int, default=8)
    p.add_argument("--audio-s", type=float, default=8.0)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--simulate", action="store_true",
                   help="use 8 virtual CPU devices (harness validation only)")
    p.add_argument("--tiny", action="store_true", help="tiny model (CI)")
    args = p.parse_args()

    if args.simulate:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import numpy as np

    from conformer_tpu.config import Config
    from conformer_tpu.data.dataset import synthetic_batch
    from conformer_tpu.parallel.mesh import (make_mesh, make_opt_state_shardings,
                                             make_param_shardings,
                                             shard_batch_tree)
    from conformer_tpu.train.state import TrainState, make_optimizer
    from conformer_tpu.train.steps import init_variables, make_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_devices = len(jax.devices())
    sizes = args.sizes or [s for s in (1, 2, 4, 8, 16, 32) if s <= n_devices]

    if args.simulate or jax.default_backend() == "cpu":
        print(json.dumps({
            "note": "CORRECTNESS-ONLY: virtual CPU devices share host "
                    "cores, so 'scaling_efficiency' here measures host "
                    "contention, NOT ICI. For projected real-slice "
                    "efficiency use tools/comm_model.py "
                    "(docs/DISTRIBUTED.md)."}))

    cfg = Config()
    if args.tiny or args.simulate:
        cfg = cfg.override(**{
            "model.n_blocks": 2, "model.d_model": 128, "model.n_heads": 4,
            "model.kernel_size": 7, "model.lstm_hidden_dim": 128,
            "model.vocab_size": 96, "optim.compute_dtype": "float32"})
    num_samples = int(args.audio_s * cfg.audio.sample_rate)
    tx = make_optimizer(cfg.optim, steps_per_epoch=1000)

    results = {}
    for n in sizes:
        if n % args.tp:
            continue
        mesh = make_mesh(dp=n // args.tp, tp=args.tp,
                         devices=jax.devices()[:n])
        tp_on = args.tp > 1
        variables = init_variables(cfg, jax.random.PRNGKey(0),
                                   mel_frames=num_samples // 160 + 1)
        state = TrainState.create(variables["params"],
                                  variables.get("batch_stats", {}), tx)
        state_sh = TrainState(
            step=NamedSharding(mesh, P()),
            params=make_param_shardings(mesh, state.params, tp_enabled=tp_on),
            batch_stats=jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), state.batch_stats),
            opt_state=make_opt_state_shardings(mesh, state.opt_state,
                                               state.params, tp_enabled=tp_on))
        state = jax.device_put(state, state_sh)

        batch_size = args.per_device_batch * (n // args.tp)
        b = synthetic_batch(batch_size, num_samples, cfg.model.vocab_size,
                            max_tokens=64)
        arrays = (b.audio, np.full((batch_size,), num_samples, np.int32),
                  b.tokens, b.token_lengths)
        arrays = jax.device_put(arrays, shard_batch_tree(mesh, arrays))

        step_fn = make_train_step(cfg, tx, donate=True)
        rng = jax.random.PRNGKey(1)
        for _ in range(2):
            state, metrics = step_fn(state, *arrays, rng)
        jax.block_until_ready(metrics["loss"])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step_fn(state, *arrays, rng)
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0
        thr = batch_size * args.audio_s * args.steps / dt
        results[n] = thr
        base = results[min(results)]
        n0 = min(results)
        eff = thr / (base * n / n0)
        print(json.dumps({"devices": n, "dp": n // args.tp, "tp": args.tp,
                          "audio_s_per_s": round(thr, 1),
                          "scaling_efficiency": round(eff, 4)}))


if __name__ == "__main__":
    main()
