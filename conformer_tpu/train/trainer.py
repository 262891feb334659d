"""Training orchestration: data -> jitted steps -> checkpoints -> validation.

Capability parity with the reference training loop (reference: train.py:83-287):
epoch loop with shuffling, periodic checkpointing (rank-0 semantics handled by
orbax), per-epoch LR decay, validation with CTC loss + greedy WER, metric
logging. TPU-first: one compiled program per bucket shape, donated train state,
global metrics under GSPMD (no explicit allreduce), device-side greedy decode
with host text assembly only at validation.
"""

from __future__ import annotations

import time
from typing import Iterable, Optional

import jax
import numpy as np

from conformer_tpu.config import Config
from conformer_tpu.data.dataset import Batch, BucketedLoader, ManifestDataset
from conformer_tpu.parallel.mesh import (Mesh, make_global_batch,
                                         make_opt_state_shardings,
                                         make_param_shardings, shard_batch_tree)
from conformer_tpu.text.metrics import wer
from conformer_tpu.text.tokenizer import GraphemeTokenizer
from conformer_tpu.train.checkpoint import CheckpointManager
from conformer_tpu.train.logging import MetricsLogger, Throughput
from conformer_tpu.train.state import TrainState, make_optimizer, param_count
from conformer_tpu.train.steps import init_variables, make_eval_step, make_train_step


def _prng_key(cfg, seed: int):
    """Typed PRNG key honoring cfg.train.prng_impl WITHOUT touching the
    process-global jax_default_prng_impl.

    The old jax.config.update("jax_default_prng_impl", ...) in __init__
    changed what every later jax.random.PRNGKey(0) in the PROCESS means —
    constructing one Trainer silently re-seeded unrelated code (an
    order-dependent test failure: a model init after any Trainer got rbg
    weights instead of threefry ones). Typed keys carry the impl in their
    dtype, so the choice stays local to this Trainer's rng lineage.
    cfg.train.prng_impl='rbg' matters on TPU: threefry mask generation
    costs ~20% of a train step; the hardware RNG is dramatically cheaper.
    """
    impl = cfg.train.prng_impl or None
    return jax.random.key(seed, impl=impl)


class Trainer:
    def __init__(self, cfg: Config, tokenizer: GraphemeTokenizer,
                 mesh: Optional[Mesh] = None,
                 logger: Optional[MetricsLogger] = None):
        cfg = cfg.override(**{"model.vocab_size": tokenizer.vocab_size})
        self.cfg = cfg
        self.tok = tokenizer
        self.mesh = mesh
        self.logger = logger or MetricsLogger(cfg.train.checkpoint_dir)

        steps_per_epoch = None
        if cfg.data.train_manifest:
            try:
                n = len(ManifestDataset(cfg.data.train_manifest))
                steps_per_epoch = max(n // cfg.data.batch_size, 1)
            except Exception:
                pass
        self.tx = make_optimizer(cfg.optim, steps_per_epoch=steps_per_epoch)
        self.steps_per_epoch = steps_per_epoch

        variables = init_variables(cfg, _prng_key(cfg, cfg.train.seed))
        params = variables["params"]
        if cfg.train.init_encoder_from:
            # Semi-supervised transfer: encoder weights from a pretrain
            # checkpoint, heads freshly initialized. Skipped on resume below
            # (the supervised checkpoint then wins).
            from conformer_tpu.train.pretrain import (load_pretrained_params,
                                                      transfer_encoder)

            pre = load_pretrained_params(cfg, cfg.train.init_encoder_from,
                                         cfg.train.init_encoder_method)
            params = transfer_encoder(pre, params,
                                      method=cfg.train.init_encoder_method)
            print(f"[trainer] encoder initialized from "
                  f"{cfg.train.init_encoder_from} "
                  f"({cfg.train.init_encoder_method})")
        state = TrainState.create(params,
                                  variables.get("batch_stats", {}), self.tx)
        if mesh is not None:
            tp = mesh.shape.get("model", 1) > 1
            state_sh = TrainState(
                step=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
                params=make_param_shardings(mesh, state.params, tp_enabled=tp),
                batch_stats=jax.tree_util.tree_map(
                    lambda _: jax.sharding.NamedSharding(
                        mesh, jax.sharding.PartitionSpec()), state.batch_stats),
                opt_state=make_opt_state_shardings(
                    mesh, state.opt_state, state.params, tp_enabled=tp,
                    zero=getattr(cfg.parallel, "zero", False)))
            state = jax.device_put(state, state_sh)
        self.state = state
        self.epoch = 0

        self.ckpt = CheckpointManager(cfg.train.checkpoint_dir,
                                      keep=cfg.train.keep_checkpoints)
        if cfg.train.resume and self.ckpt.latest_step() is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                               sharding=getattr(x, "sharding", None)),
                self.state)
            self.state, self.epoch = self.ckpt.restore(abstract)
            print(f"[trainer] resumed from step {int(jax.device_get(self.state.step))}"
                  f" (epoch {self.epoch})")

        # Persistent compilation cache: bucket-shape compiles are minutes
        # cold through the remote-compile path; cached reruns are instant.
        # TPU-like backends only (or an explicit JAX_COMPILATION_CACHE_DIR):
        # on CPU the cache is a hazard, not a win — XLA:CPU AOT entries bake
        # in the *compiling* process's machine/tuning features (observed:
        # axon-tunnel processes cache CPU executables with
        # +prefer-no-gather/+prefer-no-scatter, and a later plain-CPU test
        # process loads them, warns about SIGILL risk, and gets different
        # vectorization => 1e-7 reduction-order flips in near-tied decodes).
        import os
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
        if cache_dir is None and jax.default_backend() != "cpu":
            cache_dir = "/tmp/conformer_tpu_jax_cache"
        if cache_dir:
            try:
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update(
                    "jax_persistent_cache_min_compile_time_secs", 5.0)
            except Exception:
                pass

        self._raw_train_step = make_train_step(cfg, self.tx, donate=True)
        self.train_step = self._with_mesh(self._raw_train_step)
        self.eval_step = self._with_mesh(make_eval_step(
            cfg, unk_id=tokenizer.unk_id))
        self._warmup_thread = None
        print(f"[trainer] params: {param_count(self.state.params)/1e6:.1f}M, "
              f"vocab {tokenizer.vocab_size}")

    # ------------------------------------------------------------------
    def warmup_compile(self, background: bool = False):
        """AOT-compile the train step for every bucket shape (ROADMAP:
        steady-state training is one compiled program per bucket, but each
        bucket's first batch otherwise stalls on a cold compile — slow via
        the remote-compile path). Lowering with abstract ShapeDtypeStructs
        populates the persistent compilation cache, so the real first call
        per bucket re-lowers cheaply and hits the cached executable.

        background=True runs the compiles on a daemon thread (XLA releases
        the GIL) while the first buckets train; call ``wait_warmup`` to join.
        """
        import threading

        cfg = self.cfg
        sr = cfg.audio.sample_rate
        boundaries = [int(b * sr) for b in cfg.data.bucket_boundaries_s]
        max_samples = int(cfg.data.max_audio_s * sr)
        if not boundaries or boundaries[-1] < max_samples:
            boundaries.append(max_samples)
        # Mirror BucketedLoader's per-bucket batch sizes so warmup compiles
        # the ACTUAL shapes training will hit.
        if cfg.data.bucket_batch_sizes:
            sizes = list(cfg.data.bucket_batch_sizes)
            while len(sizes) < len(boundaries):
                sizes.append(sizes[-1])
        else:
            sizes = [cfg.data.batch_size] * len(boundaries)

        state_abs = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.state)
        rng = _prng_key(cfg, cfg.train.seed)
        rng_abs = jax.ShapeDtypeStruct(rng.shape, rng.dtype)
        sds = jax.ShapeDtypeStruct

        def work():
            done = 0
            for n, bs in zip(boundaries, sizes):
                args = (state_abs,
                        sds((bs, n), np.float32), sds((bs,), np.int32),
                        sds((bs, cfg.data.max_tokens), np.int32),
                        sds((bs,), np.int32), rng_abs)
                try:
                    if self.mesh is not None:
                        with jax.set_mesh(self.mesh):
                            self._raw_train_step.lower(*args).compile()
                    else:
                        self._raw_train_step.lower(*args).compile()
                    done += 1
                except Exception as e:  # noqa: BLE001 — warmup must not kill training
                    print(f"[trainer] warmup compile failed for bucket "
                          f"{n / sr:.1f}s: {type(e).__name__}: {e}")
            return done

        if background:
            self._warmup_thread = threading.Thread(target=work, daemon=True)
            self._warmup_thread.start()
            return None
        return work()

    def wait_warmup(self) -> None:
        if self._warmup_thread is not None:
            self._warmup_thread.join()
            self._warmup_thread = None

    # ------------------------------------------------------------------
    def _with_mesh(self, fn):
        """Invoke jitted steps under the active mesh so the fused attention
        kernel (no GSPMD partition rule) traces through its shard_map path
        (ops/pallas/sincos_attention.rel_attention_sincos_sharded)."""
        if self.mesh is None:
            return fn

        def wrapped(*args):
            with jax.set_mesh(self.mesh):
                return fn(*args)

        return wrapped

    def _device_batch(self, batch: Batch):
        arrays = (batch.audio, batch.audio_lengths, batch.tokens,
                  batch.token_lengths)
        if self.mesh is None:
            return jax.device_put(arrays)
        return make_global_batch(self.mesh, arrays)

    def train_epoch(self, loader: Iterable[Batch], epoch: int,
                    rng: jax.Array, val_fn=None) -> float:
        """One epoch. The hot loop never blocks on device values: the step
        counter is tracked host-side and metrics stay device arrays except at
        log points, so async dispatch overlaps host work (data loading,
        checkpoint IO) with TPU compute.

        val_fn(step): optional mid-epoch validation hook, called every
        cfg.train.val_every_steps steps.
        """
        cfg = self.cfg
        meter = Throughput()
        device_losses = []
        step = int(jax.device_get(self.state.step))  # one sync per epoch
        sr = cfg.audio.sample_rate
        prof_dir = None
        if cfg.train.profile_num_steps:
            import os
            prof_dir = os.path.join(cfg.train.checkpoint_dir, "profile")
        for batch in loader:
            args = self._device_batch(batch)
            if prof_dir is not None:
                if step == cfg.train.profile_start_step:
                    jax.profiler.start_trace(prof_dir)
                elif step == cfg.train.profile_start_step + cfg.train.profile_num_steps:
                    jax.profiler.stop_trace()
                    prof_dir = None
                    print(f"[trainer] wrote profiler trace")
            self.state, metrics = self.train_step(self.state, *args, rng)
            step += 1
            device_losses.append(metrics["loss"])
            meter.update(float(batch.audio_lengths.sum()) / sr)
            if cfg.train.log_every_steps and step % cfg.train.log_every_steps == 0:
                loss = float(jax.device_get(metrics["loss"]))
                if not np.isfinite(loss):
                    raise FloatingPointError(
                        f"non-finite loss at step {step}")  # reference: train.py:236
                snap = meter.snapshot()
                self.logger.log(step, {"ctc_loss": loss,
                                       "grad_norm": float(jax.device_get(metrics["grad_norm"])),
                                       **snap}, prefix="train/")
                print(f"[step {step}] loss={loss:.4f} "
                      f"audio_s/s={snap['audio_seconds_per_s']:.1f}")
            if (cfg.train.checkpoint_every_steps
                    and step % cfg.train.checkpoint_every_steps == 0):
                self.ckpt.save(self.state, epoch=epoch)
            if (val_fn is not None and cfg.train.val_every_steps
                    and step % cfg.train.val_every_steps == 0):
                val_fn(step)
            if cfg.train.num_steps and step >= cfg.train.num_steps:
                break
        losses = np.asarray(jax.device_get(device_losses), np.float64)
        if losses.size and not np.isfinite(losses).all():
            bad = int(np.flatnonzero(~np.isfinite(losses))[0])
            raise FloatingPointError(
                f"non-finite loss at step {step - len(losses) + bad + 1}")
        return float(losses.mean()) if losses.size else float("nan")

    def validate(self, loader: Iterable[Batch]) -> dict:
        """CTC loss + greedy WER over a validation set
        (reference: train.py:36-81)."""
        losses, refs, hyps = [], [], []
        for batch in loader:
            args = self._device_batch(batch)
            out = self.eval_step(self.state, *args)
            losses.append(float(jax.device_get(out["loss"])))
            tokens = np.asarray(jax.device_get(out["tokens"]))
            counts = np.asarray(jax.device_get(out["counts"]))
            for i, text in enumerate(batch.texts or []):
                if not text:
                    continue
                hyps.append(self.tok.collapsed_ids_to_text(tokens[i], counts[i]))
                refs.append(self.tok.clean_text(text.upper()))
        metrics = {"loss": float(np.mean(losses)) if losses else float("nan")}
        if refs:
            metrics["wer"] = wer(hyps, refs)
        return metrics

    # ------------------------------------------------------------------
    def fit(self) -> None:
        cfg = self.cfg
        train_ds = ManifestDataset(cfg.data.train_manifest,
                                   cfg.audio.sample_rate,
                                   num_examples=cfg.data.num_examples)
        train_loader = BucketedLoader(
            train_ds, self.tok, cfg.data,
            shard_index=jax.process_index(), shard_count=jax.process_count(),
            training=True)
        val_loader = None
        if cfg.data.val_manifest:
            val_ds = ManifestDataset(cfg.data.val_manifest, cfg.audio.sample_rate)
            val_loader = BucketedLoader(
                val_ds, self.tok, cfg.data,
                shard_index=jax.process_index(), shard_count=jax.process_count(),
                training=False)

        early = None
        if cfg.train.early_stop_patience > 0:
            from conformer_tpu.train.logging import EarlyStopping

            early = EarlyStopping(patience=cfg.train.early_stop_patience,
                                  mode="min")

        val_fn = None
        if val_loader is not None and cfg.train.val_every_steps:
            def val_fn(step, _loader=val_loader):
                val = self.validate(_loader.epoch(0))
                print(f"[step {step}] val: {val}")
                self.logger.log(step, val, prefix="val/")

        if cfg.train.warmup_compile in ("sync", "background"):
            self.warmup_compile(
                background=cfg.train.warmup_compile == "background")

        rng = _prng_key(cfg, cfg.train.seed + jax.process_index())
        for epoch in range(self.epoch, cfg.train.num_epochs):
            t0 = time.perf_counter()
            mean_loss = self.train_epoch(train_loader.epoch(epoch), epoch, rng,
                                         val_fn=val_fn)
            step = int(jax.device_get(self.state.step))
            print(f"[epoch {epoch}] mean_loss={mean_loss:.4f} "
                  f"({time.perf_counter()-t0:.1f}s)")
            self.logger.log(step, {"epoch_loss": mean_loss, "epoch": epoch},
                            prefix="train/")
            stop = False
            if val_loader is not None:
                val = self.validate(val_loader.epoch(epoch))
                print(f"[epoch {epoch}] val: {val}")
                self.logger.log(step, val, prefix="val/")
                if early is not None:
                    metric = val.get(cfg.train.early_stop_metric, val["loss"])
                    if early.update(float(metric)):
                        print(f"[trainer] early stop at epoch {epoch} "
                              f"(best {cfg.train.early_stop_metric}="
                              f"{early.best:.4f})")
                        stop = True
            self.ckpt.save(self.state, epoch=epoch + 1)
            if stop or (cfg.train.num_steps and step >= cfg.train.num_steps):
                break
        self.ckpt.wait()
