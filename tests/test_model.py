"""Model tests: shape trace parity, masking invariance, scan/loop equivalence,
LSTM packed-equivalence, and a tiny overfit-one-batch integration test
(SURVEY §3.4 shape trace; §4 recommended strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from conformer_tpu.config import ModelConfig
from conformer_tpu.models.conformer import Conformer
from conformer_tpu.models.decoder import LSTMLayer
from conformer_tpu.ops.ctc import ctc_loss, greedy_decode
from conformer_tpu.utils.masking import subsampled_length


def init_and_apply(model, rng, mels, lengths, train=False):
    variables = model.init(rng, mels, lengths)
    if train:
        return variables, None
    out, _ = model.apply(variables, mels, lengths, mutable=[])
    return variables, out


class TestShapes:
    def test_forward_shape_trace(self):
        # SURVEY §3.4: mel (B, T, 80) -> logits (B, T', V), T' = ((T-1)//2-1)//2.
        cfg = ModelConfig.tiny(vocab_size=50)
        model = Conformer(cfg, deterministic=True)
        b, t = 2, 101
        mels = jnp.zeros((b, t, cfg.n_mel_channels))
        lengths = jnp.array([101, 55])
        variables = model.init(jax.random.PRNGKey(0), mels, lengths)
        (logits, out_lengths), _ = model.apply(variables, mels, lengths, mutable=[])
        t_sub = ((t - 1) // 2 - 1) // 2
        assert logits.shape == (b, t_sub, 50)
        np.testing.assert_array_equal(np.asarray(out_lengths),
                                      [subsampled_length(101), subsampled_length(55)])
        assert logits.dtype == jnp.float32

    def test_padding_invariance(self):
        # A shorter utterance padded further must produce identical logits at
        # its valid frames (mask correctness end-to-end).
        cfg = ModelConfig.tiny(vocab_size=20)
        model = Conformer(cfg, deterministic=True)
        rng = jax.random.PRNGKey(1)
        t_real = 61
        mels_real = jax.random.normal(rng, (1, t_real, cfg.n_mel_channels))
        lengths = jnp.array([t_real])

        variables = model.init(jax.random.PRNGKey(0), mels_real, lengths)
        (lo_short, len_short), _ = model.apply(variables, mels_real, lengths, mutable=[])
        # Zero-pad to a longer buffer.
        mels_padded = jnp.pad(mels_real, ((0, 0), (0, 40), (0, 0)))
        (lo_long, len_long), _ = model.apply(variables, mels_padded, lengths, mutable=[])
        n = int(len_short[0])
        assert int(len_long[0]) == n
        np.testing.assert_allclose(np.asarray(lo_short)[0, :n],
                                   np.asarray(lo_long)[0, :n], atol=2e-4)


class TestSeparableSubsampling:
    def test_separable_shapes_lengths_and_grads(self):
        # subsample_impl='separable' (the reference's dead-code
        # DepthWiseSeperableConvolution made real, convolution.py:59-70) must
        # keep the exact output shapes and length formula of the conv2d stack
        # while swapping parameters; gradients must flow through both convs.
        cfg = ModelConfig.tiny(vocab_size=20)
        cfg_sep = type(cfg)(**{**cfg.__dict__, "subsample_impl": "separable"})
        b, t = 2, 101
        mels = jax.random.normal(jax.random.PRNGKey(3), (b, t, cfg.n_mel_channels))
        lengths = jnp.array([101, 55])

        m = Conformer(cfg_sep, deterministic=True)
        v = m.init(jax.random.PRNGKey(0), mels, lengths)
        (logits, out_lengths), _ = m.apply(v, mels, lengths, mutable=[])
        t_sub = ((t - 1) // 2 - 1) // 2
        assert logits.shape == (b, t_sub, 20)
        np.testing.assert_array_equal(np.asarray(out_lengths),
                                      [subsampled_length(101), subsampled_length(55)])

        sub = v["params"]["encoder"]["subsample"]
        assert set(sub) == {"conv1", "conv2_dw", "conv2_pw"}
        d = cfg.d_model
        assert sub["conv2_dw"]["kernel"].shape == (3, 3, 1, d)
        assert sub["conv2_pw"]["kernel"].shape == (1, 1, d, d)

        def loss(params):
            (lo, _), _ = m.apply({**v, "params": params}, mels, lengths,
                                 mutable=[])
            return jnp.sum(lo ** 2)

        g = jax.grad(loss)(v["params"])
        gsub = g["encoder"]["subsample"]
        for name in ("conv1", "conv2_dw", "conv2_pw"):
            assert float(jnp.abs(gsub[name]["kernel"]).max()) > 0.0


class TestScanEquivalence:
    def test_scan_and_loop_paths_match(self):
        cfg_loop = ModelConfig.tiny(vocab_size=20)
        cfg_scan = ModelConfig.tiny(vocab_size=20)
        cfg_scan = type(cfg_scan)(**{**cfg_scan.__dict__, "use_scan_layers": True,
                                     "use_remat": True})
        mels = jax.random.normal(jax.random.PRNGKey(2), (2, 61, cfg_loop.n_mel_channels))
        lengths = jnp.array([61, 40])

        m_loop = Conformer(cfg_loop, deterministic=True)
        v_loop = m_loop.init(jax.random.PRNGKey(0), mels, lengths)
        (out_loop, _), _ = m_loop.apply(v_loop, mels, lengths, mutable=[])

        m_scan = Conformer(cfg_scan, deterministic=True)
        v_scan = m_scan.init(jax.random.PRNGKey(0), mels, lengths)
        # Copy loop params into the scan layout (stacked along axis 0).
        flat_loop = jax.tree_util.tree_flatten_with_path(v_loop)
        v_scan2 = _restack_params(v_loop, v_scan, cfg_loop.n_blocks)
        (out_scan, _), _ = m_scan.apply(v_scan2, mels, lengths, mutable=[])
        np.testing.assert_allclose(np.asarray(out_loop), np.asarray(out_scan),
                                   atol=2e-4)

    def test_partial_unroll_matches_loop(self):
        # scan_unroll=2 with an odd block count (3): same stacked param
        # layout as scan_unroll=1, same numbers as the unrolled loop.
        base = ModelConfig.tiny(vocab_size=20)
        cfg_loop = type(base)(**{**base.__dict__, "n_blocks": 3})
        cfg_scan = type(base)(**{**base.__dict__, "n_blocks": 3,
                                 "use_scan_layers": True, "use_remat": True,
                                 "scan_unroll": 2})
        mels = jax.random.normal(jax.random.PRNGKey(4),
                                 (2, 61, base.n_mel_channels))
        lengths = jnp.array([61, 40])

        m_loop = Conformer(cfg_loop, deterministic=True)
        v_loop = m_loop.init(jax.random.PRNGKey(0), mels, lengths)
        (out_loop, _), _ = m_loop.apply(v_loop, mels, lengths, mutable=[])

        m_scan = Conformer(cfg_scan, deterministic=True)
        v_scan = m_scan.init(jax.random.PRNGKey(0), mels, lengths)
        # Param layout is identical to the unroll=1 scan (stacked axis 0).
        assert v_scan["params"]["encoder"]["blocks"]["block"]["ffn1"][
            "hidden"]["kernel"].shape[0] == 3
        v_scan2 = _restack_params(v_loop, v_scan, 3)
        (out_scan, _), _ = m_scan.apply(v_scan2, mels, lengths, mutable=[])
        np.testing.assert_allclose(np.asarray(out_loop), np.asarray(out_scan),
                                   atol=2e-4)


def _restack_params(v_loop, v_scan, n_blocks):
    """Stack per-block params from the loop layout into the scan layout."""
    import flax
    out = flax.core.unfreeze(jax.tree_util.tree_map(lambda x: x, v_scan))

    def get_block(col, i):
        return v_loop[col]["encoder"][f"block_{i}"]

    for col in v_scan:
        if "encoder" not in v_scan[col] or "blocks" not in v_scan[col]["encoder"]:
            continue
        scan_blocks = v_scan[col]["encoder"]["blocks"]["block"]
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0),
            *[get_block(col, i) for i in range(n_blocks)])
        out[col]["encoder"]["blocks"]["block"] = stacked
        # Non-block entries (subsample, input_proj, decoder) are shared — copy
        # from the loop variables.
        for k, v in v_loop[col].items():
            if k == "encoder":
                for ek, ev in v.items():
                    if not ek.startswith("block_"):
                        out[col]["encoder"][ek] = ev
            else:
                out[col][k] = v
    return flax.core.freeze(out) if isinstance(v_scan, flax.core.FrozenDict) else out


class TestHashDropout:
    def test_mask_statistics_and_determinism(self):
        from conformer_tpu.models.dropout import hash_keep
        seed = jnp.asarray([123, 456], jnp.uint32)
        keep = hash_keep((128, 1024), seed, 0.3)
        frac = float(jnp.mean(keep.astype(jnp.float32)))
        assert abs(frac - 0.7) < 0.01          # keep prob = 1 - rate
        keep2 = hash_keep((128, 1024), seed, 0.3)
        assert bool(jnp.all(keep == keep2))    # deterministic
        keep3 = hash_keep((128, 1024), jnp.asarray([7, 8], jnp.uint32), 0.3)
        assert bool(jnp.any(keep != keep3))    # seed-dependent
        # Rows must not repeat each other (axis mixing).
        rows = np.asarray(keep[:4]).astype(np.int8)
        assert not (rows[0] == rows[1]).all()

    def test_dropout_module_hash_impl(self):
        from conformer_tpu.models.dropout import Dropout
        x = jnp.ones((4, 64, 32), jnp.float32)
        m = Dropout(0.25, impl="hash")
        y = m.apply({}, x, False, rngs={"dropout": jax.random.PRNGKey(0)})
        vals = np.unique(np.round(np.asarray(y), 4))
        assert set(vals).issubset({0.0, np.float32(1 / 0.75).round(4)})
        frac0 = float(np.mean(np.asarray(y) == 0.0))
        assert abs(frac0 - 0.25) < 0.03
        # deterministic=True is the identity regardless of impl.
        y_det = m.apply({}, x, True, rngs={"dropout": jax.random.PRNGKey(0)})
        np.testing.assert_array_equal(np.asarray(y_det), np.asarray(x))

    def test_model_trains_with_hash_dropout(self):
        base = ModelConfig.tiny(vocab_size=20)
        cfg = type(base)(**{**base.__dict__, "dropout_rate": 0.1,
                            "dropout_impl": "hash"})
        model = Conformer(cfg, deterministic=False)
        mels = jax.random.normal(jax.random.PRNGKey(0), (2, 61, cfg.n_mel_channels))
        lengths = jnp.array([61, 40])
        v = model.init({"params": jax.random.PRNGKey(0),
                        "dropout": jax.random.PRNGKey(1)}, mels, lengths)

        def loss(params):
            (lo, _), _ = model.apply(
                {**v, "params": params}, mels, lengths,
                mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(2)})
            return jnp.sum(lo.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(v["params"])
        gn = float(optax.global_norm(g))
        assert np.isfinite(gn) and gn > 0


class TestLSTM:
    def test_unidirectional_masked_equivalence(self):
        # Packed-LSTM equivalence (reference: model/modules/decoder.py:17):
        # outputs at valid steps are independent of padded future frames.
        layer = LSTMLayer(hidden_dim=16)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 10, 8))
        variables = layer.init(jax.random.PRNGKey(0), x)
        full = layer.apply(variables, x)
        trunc = layer.apply(variables, x[:, :6])
        np.testing.assert_allclose(np.asarray(full)[:, :6], np.asarray(trunc),
                                   atol=1e-5)


class TestOverfit:
    def test_overfit_one_batch(self):
        # Tiny-model single-batch overfit: loss must drop sharply and greedy
        # decode must recover the target (integration of model + loss + decode).
        cfg = ModelConfig.tiny(vocab_size=12)
        model = Conformer(cfg, deterministic=False)
        eval_model = Conformer(cfg, deterministic=True)

        rng = jax.random.PRNGKey(0)
        b, t = 2, 101
        mels = jax.random.normal(rng, (b, t, cfg.n_mel_channels))
        lengths = jnp.array([t, t])
        labels = jnp.array([[1, 2, 3, 4, 0, 0], [5, 6, 7, 8, 9, 10]])
        label_lengths = jnp.array([4, 6])

        variables = model.init({"params": rng, "dropout": rng}, mels, lengths)
        params, batch_stats = variables["params"], variables.get("batch_stats", {})
        tx = optax.adam(3e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt_state, rng):
            def loss_fn(p):
                (logits, out_lens), updates = model.apply(
                    {"params": p, "batch_stats": batch_stats}, mels, lengths,
                    mutable=["batch_stats"], rngs={"dropout": rng})
                loss = ctc_loss(logits, out_lens, labels, label_lengths)
                return loss, updates["batch_stats"]
            (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state)
            return optax.apply_updates(params, updates), new_bs, opt_state, loss

        losses = []
        for i in range(150):
            rng, sub = jax.random.split(rng)
            params, batch_stats, opt_state, loss = step(params, batch_stats,
                                                        opt_state, sub)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.2, f"no overfit: {losses[0]} -> {losses[-1]}"

        (logits, out_lens), _ = eval_model.apply(
            {"params": params, "batch_stats": batch_stats}, mels, lengths, mutable=[])
        packed, counts = greedy_decode(logits, out_lens)
        got = [list(np.asarray(packed)[i, : int(counts[i])]) for i in range(b)]
        assert got[0] == [1, 2, 3, 4]
        assert got[1] == [5, 6, 7, 8, 9, 10]


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
