"""Transducer (RNN-T): loss parity vs a naive DP, training, greedy decode.

The reference's Transducer is a dead stub (model/modules/transducer.py:4-9);
these tests cover the working implementation (ops/rnnt.py,
models/transducer.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from conformer_tpu.config import ModelConfig
from conformer_tpu.models.transducer import Transducer
from conformer_tpu.ops.rnnt import (rnnt_alpha_final, rnnt_greedy_decode,
                                    rnnt_loss_from_logits)


def naive_rnnt_ll(lpb, lpe, t_len, u_len):
    """O(T*U) python forward DP for one sequence."""
    t, u1 = lpb.shape
    a = np.full((t, u1), -np.inf)
    a[0, 0] = 0.0
    for ti in range(t):
        for ui in range(u1):
            if ti == 0 and ui == 0:
                continue
            vals = []
            if ti > 0:
                vals.append(a[ti - 1, ui] + lpb[ti - 1, ui])
            if 0 < ui <= u_len:
                vals.append(a[ti, ui - 1] + lpe[ti, ui - 1])
            a[ti, ui] = np.logaddexp.reduce(vals) if vals else -np.inf
    return a[t_len - 1, u_len] + lpb[t_len - 1, u_len]


class TestRnntLoss:
    def test_alpha_matches_naive_dp(self):
        rng = np.random.default_rng(0)
        b, t, u = 3, 11, 6
        lpb = np.log(rng.uniform(0.05, 1.0, (b, t, u + 1))).astype(np.float32)
        lpe = np.log(rng.uniform(0.05, 1.0, (b, t, u))).astype(np.float32)
        t_len = np.array([11, 7, 4])
        u_len = np.array([6, 3, 0])
        got = np.asarray(rnnt_alpha_final(
            jnp.asarray(lpb), jnp.asarray(lpe),
            jnp.asarray(t_len), jnp.asarray(u_len)))
        for i in range(b):
            want = naive_rnnt_ll(lpb[i], lpe[i], t_len[i], u_len[i])
            np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-5)

    def test_loss_from_logits_grad_is_prob_residual(self):
        # For RNN-T, d(-ll)/d logits = softmax(logits) - occupancy; check
        # the gradient is finite and sums to ~0 over the vocab at valid
        # lattice cells (softmax residual property).
        rng = np.random.default_rng(1)
        b, t, u, v = 2, 6, 3, 7
        logits = jnp.asarray(rng.standard_normal((b, t, u + 1, v))
                             .astype(np.float32))
        labels = jnp.asarray(rng.integers(1, v, (b, u)).astype(np.int32))
        t_len = jnp.asarray([6, 4])
        u_len = jnp.asarray([3, 2])
        g = jax.grad(lambda lo: rnnt_loss_from_logits(
            lo, labels, t_len, u_len))(logits)
        g = np.asarray(g)
        assert np.isfinite(g).all()
        # vocab-sum of the gradient vanishes wherever occupancy mass exists
        np.testing.assert_allclose(g.sum(-1)[0, : 6], 0.0, atol=1e-5)

    def test_padding_invariance(self):
        # Extra padded frames/labels beyond the lengths must not change the
        # loss.
        rng = np.random.default_rng(2)
        b, t, u, v = 1, 5, 3, 6
        logits = rng.standard_normal((b, t, u + 1, v)).astype(np.float32)
        labels = rng.integers(1, v, (b, u)).astype(np.int32)
        t_len = jnp.asarray([4])
        u_len = jnp.asarray([2])
        base = float(rnnt_loss_from_logits(jnp.asarray(logits),
                                           jnp.asarray(labels), t_len, u_len))
        logits2 = np.concatenate(
            [logits, rng.standard_normal((b, 2, u + 1, v)).astype(np.float32)],
            axis=1)
        pad2 = float(rnnt_loss_from_logits(jnp.asarray(logits2),
                                           jnp.asarray(labels), t_len, u_len))
        np.testing.assert_allclose(base, pad2, rtol=1e-6)


class TestTransducerModel:
    def _setup(self):
        cfg = ModelConfig.tiny(vocab_size=12)
        cfg = type(cfg)(**{**cfg.__dict__, "pred_embed_dim": 32,
                           "pred_hidden_dim": 32, "joint_dim": 32})
        model = Transducer(cfg, deterministic=True)
        b, t, u = 2, 61, 5
        rng = np.random.default_rng(3)
        mels = jnp.asarray(rng.standard_normal((b, t, cfg.n_mel_channels))
                           .astype(np.float32))
        mel_lengths = jnp.asarray([61, 45])
        labels = jnp.asarray(rng.integers(1, 12, (b, u)).astype(np.int32))
        u_len = jnp.asarray([5, 3])
        return cfg, model, mels, mel_lengths, labels, u_len

    def test_lattice_shapes(self):
        cfg, model, mels, mel_lengths, labels, u_len = self._setup()
        v = model.init(jax.random.PRNGKey(0), mels, mel_lengths, labels)
        (logits, enc_len), _ = model.apply(v, mels, mel_lengths, labels,
                                           mutable=[])
        assert logits.shape == (2, 14, 6, 12)   # T'=((61-1)//2-1)//2=14
        loss = rnnt_loss_from_logits(logits, labels, enc_len, u_len)
        assert np.isfinite(float(loss))

    def test_overfit_and_greedy_decode(self):
        # A tiny transducer must overfit one batch and greedy-decode the
        # exact training labels back (the end-to-end proof that lattice,
        # loss, prediction state and joint all line up).
        cfg, model, mels, mel_lengths, labels, u_len = self._setup()
        variables = model.init(jax.random.PRNGKey(0), mels, mel_lengths,
                               labels)
        params = variables["params"]
        rest = {k: v for k, v in variables.items() if k != "params"}
        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def train_step(params, opt):
            def loss_fn(p):
                (logits, enc_len), _ = model.apply(
                    {**rest, "params": p}, mels, mel_lengths, labels,
                    mutable=[])
                return rnnt_loss_from_logits(logits, labels, enc_len, u_len)

            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        losses = []
        for _ in range(150):
            params, opt, loss = train_step(params, opt)
            losses.append(float(loss))
        assert losses[-1] < 0.15, losses[-1]

        # Greedy decode with the trained params.
        bound = model.bind({**rest, "params": params})
        enc, enc_len = bound.encode(mels, mel_lengths)
        state0, pred0 = bound.predict_init(enc.shape[0])
        buf, counts = rnnt_greedy_decode(
            bound.joint_logits, enc, enc_len,
            bound.predict_step, (state0, pred0), max_symbols=3,
            max_len=8)
        for i in range(2):
            got = list(np.asarray(buf[i][: int(counts[i])]))
            want = list(np.asarray(labels[i][: int(u_len[i])]))
            assert got == want, (i, got, want)


class TestTransducerTrainStep:
    def test_fused_step_runs_and_decreases(self):
        from conformer_tpu.config import Config
        from conformer_tpu.train.state import TrainState, make_optimizer
        from conformer_tpu.train.steps import make_transducer_train_step

        cfg = Config()
        cfg = cfg.override(**{
            "model.n_blocks": 2, "model.d_model": 64, "model.n_heads": 2,
            "model.kernel_size": 7, "model.vocab_size": 12,
            "model.pred_embed_dim": 32, "model.pred_hidden_dim": 32,
            "model.joint_dim": 32, "model.use_scan_layers": False,
            "model.use_remat": False, "model.dropout_rate": 0.0,
            "optim.compute_dtype": "float32", "optim.learning_rate": 3e-3,
            "augment.enabled": False})
        from conformer_tpu.models.transducer import Transducer

        rng = np.random.default_rng(0)
        b, samples, u = 2, 8000, 4
        audio = jnp.asarray(rng.standard_normal((b, samples))
                            .astype(np.float32) * 0.1)
        audio_lengths = jnp.asarray([samples, 6000], jnp.int32)
        tokens = jnp.asarray(rng.integers(1, 12, (b, u)).astype(np.int32))
        token_lengths = jnp.asarray([4, 2], jnp.int32)

        model = Transducer(cfg.model, compute_dtype="float32",
                           deterministic=False)
        from conformer_tpu.audio.mel import MelFrontend
        fe = MelFrontend(cfg.audio)
        mels = fe(audio)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "dropout": jax.random.PRNGKey(1)},
                               mels, fe.frame_lengths(audio_lengths), tokens)
        tx = make_optimizer(cfg.optim, steps_per_epoch=100)
        state = TrainState.create(variables["params"],
                                  variables.get("batch_stats", {}), tx)
        step = make_transducer_train_step(cfg, tx, donate=False)
        key = jax.random.PRNGKey(2)
        losses = []
        for _ in range(12):
            state, metrics = step(state, audio, audio_lengths, tokens,
                                  token_lengths, key)
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestRowMask:
    def test_dummy_rows_excluded_from_mean(self):
        rng = np.random.default_rng(9)
        b, t, u, v = 3, 5, 3, 6
        logits = jnp.asarray(rng.standard_normal((b, t, u + 1, v))
                             .astype(np.float32))
        labels = jnp.asarray(rng.integers(1, v, (b, u)).astype(np.int32))
        t_len = jnp.asarray([5, 4, 1])
        u_len = jnp.asarray([3, 2, 0])   # row 2 is a dummy padding row
        mask = u_len > 0
        masked = float(rnnt_loss_from_logits(logits, labels, t_len, u_len,
                                             row_mask=mask))
        only_real = float(rnnt_loss_from_logits(
            logits[:2], labels[:2], t_len[:2], u_len[:2]))
        np.testing.assert_allclose(masked, only_real, rtol=1e-6)
