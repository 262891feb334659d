"""Distributed tests on the simulated 8-device CPU mesh (SURVEY §4):
DP-sharded steps must match single-device numerics; TP sharding must not
change results; the full dryrun path must execute."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from conformer_tpu.config import Config
from conformer_tpu.data.dataset import synthetic_batch
from conformer_tpu.parallel.mesh import (make_mesh, make_opt_state_shardings,
                                         make_param_shardings, shard_batch_tree)
from conformer_tpu.train.state import TrainState, make_optimizer
from conformer_tpu.train.steps import init_variables, make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 simulated devices")


def tiny_cfg(**over):
    cfg = Config().override(**{
        "model.vocab_size": 40, "model.n_blocks": 2, "model.d_model": 64,
        "model.n_heads": 2, "model.kernel_size": 7, "model.lstm_hidden_dim": 64,
        "model.dropout_rate": 0.0, "optim.compute_dtype": "float32",
        "augment.enabled": False,
    })
    return cfg.override(**over) if over else cfg


def build_state(cfg, tx):
    variables = init_variables(cfg, jax.random.PRNGKey(0), mel_frames=64)
    return TrainState.create(variables["params"],
                             variables.get("batch_stats", {}), tx)


def batch_args(cfg, batch_size=8):
    b = synthetic_batch(batch_size, 160 * 63, cfg.model.vocab_size,
                        max_tokens=16, seed=7)
    return (b.audio, b.audio_lengths, b.tokens, b.token_lengths)


def run_step(cfg, mesh=None, tp=False, steps=2, mesh_context=False,
             zero=False):
    tx = make_optimizer(cfg.optim, steps_per_epoch=10)
    state = build_state(cfg, tx)
    args = batch_args(cfg)
    step_fn = make_train_step(cfg, tx, donate=False)
    if mesh is not None:
        param_sh = make_param_shardings(mesh, state.params, tp_enabled=tp)
        state_sh = TrainState(
            step=NamedSharding(mesh, P()), params=param_sh,
            batch_stats=jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), state.batch_stats),
            opt_state=make_opt_state_shardings(mesh, state.opt_state,
                                               state.params, tp_enabled=tp,
                                               zero=zero))
        state = jax.device_put(state, state_sh)
        args = jax.device_put(args, shard_batch_tree(mesh, args))
    losses = []
    for i in range(steps):
        if mesh is not None and mesh_context:
            with jax.set_mesh(mesh):
                state, metrics = step_fn(state, *args, jax.random.PRNGKey(5))
        else:
            state, metrics = step_fn(state, *args, jax.random.PRNGKey(5))
        losses.append(float(metrics["loss"]))
    return losses, state


class TestDataParallel:
    def test_dp_matches_single_device(self):
        cfg = tiny_cfg()
        losses_1, state_1 = run_step(cfg, mesh=None)
        mesh = make_mesh(dp=8, tp=1)
        losses_8, state_8 = run_step(cfg, mesh=mesh)
        np.testing.assert_allclose(losses_1, losses_8, rtol=2e-4)
        # Parameters after 2 steps must agree too (gradient psum correctness).
        p1 = jax.tree_util.tree_leaves(state_1.params)[0]
        p8 = jax.tree_util.tree_leaves(state_8.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p8), atol=1e-5)

    def test_tp_matches_single_device(self):
        cfg = tiny_cfg()
        losses_1, _ = run_step(cfg, mesh=None)
        mesh = make_mesh(dp=4, tp=2)
        losses_tp, _ = run_step(cfg, mesh=mesh, tp=True)
        np.testing.assert_allclose(losses_1, losses_tp, rtol=2e-4)

    def test_sp_matches_single_device(self):
        # Sequence parallelism (model.seq_shard): block activations pinned
        # to P('data','model',None) under the mesh context must not change
        # numerics — GSPMD only re-lays-out the same math.
        cfg = tiny_cfg()
        losses_1, state_1 = run_step(cfg, mesh=None)
        cfg_sp = tiny_cfg(**{"model.seq_shard": True})
        mesh = make_mesh(dp=4, tp=2)  # tp must divide n_heads for TP params
        losses_sp, state_sp = run_step(cfg_sp, mesh=mesh, tp=True,
                                       mesh_context=True)
        np.testing.assert_allclose(losses_1, losses_sp, rtol=2e-4)
        p1 = jax.tree_util.tree_leaves(state_1.params)[0]
        ps = jax.tree_util.tree_leaves(state_sp.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(ps), atol=1e-5)

    def test_sp_is_noop_without_mesh(self):
        # The constraint must be inert on a single device (no mesh context):
        # same program, same numbers.
        cfg = tiny_cfg()
        cfg_sp = tiny_cfg(**{"model.seq_shard": True})
        losses, _ = run_step(cfg, mesh=None)
        losses_sp, _ = run_step(cfg_sp, mesh=None)
        np.testing.assert_allclose(losses, losses_sp, rtol=1e-6)

    def test_zero_matches_single_device(self):
        # ZeRO-1 (Adam moments sharded over 'data') must be a pure memory
        # layout change: identical losses AND identical parameters, with the
        # moments actually living sharded.
        cfg = tiny_cfg()
        losses_1, state_1 = run_step(cfg, mesh=None)
        mesh = make_mesh(dp=8, tp=1)
        losses_z, state_z = run_step(cfg, mesh=mesh, zero=True)
        np.testing.assert_allclose(losses_1, losses_z, rtol=2e-4)
        p1 = jax.tree_util.tree_leaves(state_1.params)[0]
        pz = jax.tree_util.tree_leaves(state_z.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(pz), atol=1e-5)
        sharded = [l for l in jax.tree_util.tree_leaves(state_z.opt_state)
                   if getattr(l, "ndim", 0) >= 1
                   and "data" in str(getattr(l, "sharding", ""))]
        assert sharded, "no optimizer-state leaf is data-sharded under zero"

    def test_param_shardings_cover_big_matmuls(self):
        cfg = tiny_cfg()
        mesh = make_mesh(dp=4, tp=2)
        variables = init_variables(cfg, jax.random.PRNGKey(0), mel_frames=64)
        sh = make_param_shardings(mesh, variables["params"], tp_enabled=True)
        flat = jax.tree_util.tree_leaves_with_path(sh)
        specs = {"/".join(str(getattr(k, "key", k)) for k in path): s.spec
                 for path, s in flat}
        ffn_specs = [s for p, s in specs.items() if "hidden/kernel" in p]
        assert ffn_specs and all(s != P() for s in ffn_specs), \
            "FFN hidden kernels must be TP-sharded"
        cls = [s for p, s in specs.items() if "classifier/kernel" in p]
        assert cls and cls[0] != P()


class TestTransducerParallel:
    def _cfg(self):
        return tiny_cfg(**{
            "model.arch": "transducer", "model.pred_embed_dim": 32,
            "model.pred_hidden_dim": 32, "model.joint_dim": 32})

    def test_transducer_dp_tp_matches_single_device(self):
        # The shared encoder keeps its TP partition rules (same `encoder/`
        # param paths); the prediction/joint heads replicate. The RNN-T scan
        # loss must be sharding-invariant like the CTC path.
        cfg = self._cfg()
        losses_1, state_1 = run_step(cfg, mesh=None)
        mesh = make_mesh(dp=4, tp=2)
        losses_m, state_m = run_step(cfg, mesh=mesh, tp=True)
        np.testing.assert_allclose(losses_1, losses_m, rtol=2e-4)
        p1 = jax.tree_util.tree_leaves(state_1.params)[0]
        pm = jax.tree_util.tree_leaves(state_m.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(pm), atol=1e-5)


class TestPretrainParallel:
    """The self-supervised families must be sharding-invariant too
    (the supervised DP/TP proofs above say nothing about the InfoNCE /
    BYOL objectives or the quantizer)."""

    def _pretrain_cfg(self, **over):
        return tiny_cfg(**{
            "pretrain.num_vars": 16, "pretrain.proj_dim": 32,
            "pretrain.num_negatives": 8, "pretrain.predictor_hidden": 32,
            **over})

    def _audio_args(self, cfg, batch_size=8):
        b = synthetic_batch(batch_size, 160 * 63, cfg.model.vocab_size,
                            max_tokens=16, seed=7)
        return (b.audio, b.audio_lengths)

    def _run_w2v2(self, cfg, mesh=None, tp=False, steps=2):
        from conformer_tpu.train.pretrain import (gumbel_temperature_at,
                                                  init_wav2vec2_state,
                                                  make_wav2vec2_step)
        tx = make_optimizer(cfg.optim, steps_per_epoch=10)
        state = init_wav2vec2_state(cfg, jax.random.PRNGKey(0), tx,
                                    mel_frames=64)
        args = self._audio_args(cfg)
        step_fn = make_wav2vec2_step(cfg, tx, donate=False)
        if mesh is not None:
            state_sh = TrainState(
                step=NamedSharding(mesh, P()),
                params=make_param_shardings(mesh, state.params, tp_enabled=tp),
                batch_stats=jax.tree_util.tree_map(
                    lambda _: NamedSharding(mesh, P()), state.batch_stats),
                opt_state=make_opt_state_shardings(mesh, state.opt_state,
                                                   state.params, tp_enabled=tp))
            state = jax.device_put(state, state_sh)
            args = jax.device_put(args, shard_batch_tree(mesh, args))
        losses = []
        for i in range(steps):
            state, metrics = step_fn(state, *args, jax.random.PRNGKey(5),
                                     gumbel_temperature_at(cfg, i))
            losses.append(float(metrics["loss"]))
        return losses, state

    def _run_byol(self, cfg, mesh=None, tp=False, steps=2):
        from conformer_tpu.train.pretrain import (BYOLState, init_byol_state,
                                                  make_byol_step)
        tx = make_optimizer(cfg.optim, steps_per_epoch=10)
        state = init_byol_state(cfg, jax.random.PRNGKey(0), tx, mel_frames=64)
        args = self._audio_args(cfg)
        step_fn = make_byol_step(cfg, tx, donate=False)
        if mesh is not None:
            repl = lambda tree: jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P()), tree)
            state_sh = BYOLState(
                step=NamedSharding(mesh, P()),
                params=make_param_shardings(mesh, state.params, tp_enabled=tp),
                target_params=make_param_shardings(mesh, state.target_params,
                                                   tp_enabled=tp),
                batch_stats=repl(state.batch_stats),
                target_batch_stats=repl(state.target_batch_stats),
                opt_state=make_opt_state_shardings(mesh, state.opt_state,
                                                   state.params, tp_enabled=tp))
            state = jax.device_put(state, state_sh)
            args = jax.device_put(args, shard_batch_tree(mesh, args))
        losses = []
        for i in range(steps):
            state, metrics = step_fn(state, *args, jax.random.PRNGKey(5))
            losses.append(float(metrics["loss"]))
        return losses, state

    def test_wav2vec2_dp_tp_matches_single_device(self):
        cfg = self._pretrain_cfg()
        losses_1, state_1 = self._run_w2v2(cfg, mesh=None)
        mesh = make_mesh(dp=4, tp=2)
        losses_m, state_m = self._run_w2v2(cfg, mesh=mesh, tp=True)
        np.testing.assert_allclose(losses_1, losses_m, rtol=2e-4)
        p1 = jax.tree_util.tree_leaves(state_1.params)[0]
        pm = jax.tree_util.tree_leaves(state_m.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(pm), atol=1e-5)

    def test_byol_dp_tp_matches_single_device(self):
        cfg = self._pretrain_cfg()
        losses_1, state_1 = self._run_byol(cfg, mesh=None)
        mesh = make_mesh(dp=4, tp=2)
        losses_m, state_m = self._run_byol(cfg, mesh=mesh, tp=True)
        np.testing.assert_allclose(losses_1, losses_m, rtol=2e-4)
        # EMA target tower must agree too (it feeds every future loss).
        t1 = jax.tree_util.tree_leaves(state_1.target_params)[0]
        tm = jax.tree_util.tree_leaves(state_m.target_params)[0]
        np.testing.assert_allclose(np.asarray(t1), np.asarray(tm), atol=1e-5)


class TestBatchNormGlobal:
    def test_bn_stats_are_global_under_dp(self):
        # Under GSPMD, BatchNorm batch statistics reduce over the GLOBAL
        # batch — sharding must not change them.
        cfg = tiny_cfg()
        _, state_1 = run_step(cfg, mesh=None, steps=1)
        mesh = make_mesh(dp=8, tp=1)
        _, state_8 = run_step(cfg, mesh=mesh, steps=1)
        bs1 = jax.tree_util.tree_leaves(state_1.batch_stats)
        bs8 = jax.tree_util.tree_leaves(state_8.batch_stats)
        for a, b in zip(bs1, bs8):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestDryRun:
    def test_graft_dryrun(self):
        import __graft_entry__
        __graft_entry__.dryrun_multichip(8)


class TestGradAccumulation:
    def test_accum_matches_full_batch(self):
        # accum_steps=2 on a batch of 8 must match accum_steps=1 numerics
        # (augment/dropout disabled; per-micro-batch CTC means differ from the
        # full-batch mean only through batch-stat threading, so compare after
        # a single step with batch norm in group mode for exactness).
        cfg = tiny_cfg(**{"model.conv_norm": "group"})
        cfg2 = cfg.override(**{"optim.accum_steps": 2})
        losses_1, state_1 = run_step(cfg, mesh=None, steps=1)
        losses_2, state_2 = run_step(cfg2, mesh=None, steps=1)
        np.testing.assert_allclose(losses_1, losses_2, rtol=5e-4)
        p1 = jax.tree_util.tree_leaves(state_1.params)[0]
        p2 = jax.tree_util.tree_leaves(state_2.params)[0]
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)


class TestShardedAttention:
    def test_module_matches_unsharded_under_mesh(self):
        """The pallas attention dispatch shard_maps over the active mesh
        (data axis on batch, model axis on heads); outputs must match the
        meshless call exactly (CPU fallback math inside each shard)."""
        import jax
        import jax.numpy as jnp

        from conformer_tpu.models.attention import MHSAModule
        from conformer_tpu.models.position import relative_positional_encoding
        from conformer_tpu.parallel.mesh import make_mesh

        B, L, D, H = 8, 40, 64, 4
        x = jax.random.normal(jax.random.PRNGKey(0), (B, L, D))
        pe = relative_positional_encoding(L, D)
        lengths = jnp.asarray([40, 30, 40, 25, 40, 40, 18, 40])
        mask = (jnp.arange(L)[None, None, None, :]
                >= lengths[:, None, None, None])

        m = MHSAModule(D, H, impl="pallas")
        v = m.init(jax.random.PRNGKey(1), x, pe, mask)
        want = m.apply(v, x, pe, mask)

        mesh = make_mesh(dp=4, tp=2, devices=jax.devices()[:8])
        with jax.set_mesh(mesh):
            got = jax.jit(lambda v, x: m.apply(v, x, pe, mask))(v, x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_trainer_keeps_pallas_on_mesh(self, tmp_path):
        from conformer_tpu.config import Config
        from conformer_tpu.parallel.mesh import make_mesh
        from conformer_tpu.text.tokenizer import load_tokenizer
        from conformer_tpu.train.trainer import Trainer
        import jax

        cfg = Config().override(**{
            "model.n_blocks": 2, "model.d_model": 64, "model.n_heads": 2,
            "model.kernel_size": 7, "model.lstm_hidden_dim": 64,
            "model.use_remat": False, "optim.compute_dtype": "float32",
            "train.checkpoint_dir": str(tmp_path), "train.resume": False})
        tok = load_tokenizer("vi")
        mesh = make_mesh(dp=2, tp=2, devices=jax.devices()[:4])
        trainer = Trainer(cfg, tok, mesh=mesh)
        assert trainer.cfg.model.attention_impl == "pallas"
        # One sharded train step through the shard_mapped attention path.
        from conformer_tpu.data.dataset import synthetic_batch
        batch = synthetic_batch(4, 16000, tok.vocab_size, max_tokens=16)
        args = trainer._device_batch(batch)
        state, metrics = trainer.train_step(
            trainer.state, *args, jax.random.PRNGKey(0))
        assert np.isfinite(float(jax.device_get(metrics["loss"])))
