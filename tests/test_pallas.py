"""Pallas kernel parity tests (interpret mode on CPU; compiled path exercised
on TPU by tools/bench_kernels.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.ops.pallas.depthwise_conv import (_xla_depthwise,
                                                     depthwise_conv1d)


class TestDepthwiseConv:
    @pytest.mark.parametrize("shape,k", [((2, 64, 32), 7), ((1, 100, 16), 31),
                                         ((3, 50, 8), 3)])
    def test_forward_parity(self, shape, k):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((k, shape[2])).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((shape[2],)).astype(np.float32))
        want = _xla_depthwise(x, w, b)
        got = depthwise_conv1d(x, w, b, True, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5)

    def test_gradient_parity(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((2, 40, 16)).astype(np.float32))
        w = jnp.asarray(rng.standard_normal((7, 16)).astype(np.float32))
        b = jnp.asarray(rng.standard_normal((16,)).astype(np.float32))

        def loss_pallas(x, w, b):
            return jnp.sum(jnp.sin(depthwise_conv1d(x, w, b, True, True)))

        def loss_xla(x, w, b):
            return jnp.sum(jnp.sin(_xla_depthwise(x, w, b)))

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, w, b)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(x, w, b)
        for a, want in zip(gp, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(want),
                                       atol=1e-4)

    def test_model_with_pallas_conv_matches_xla_conv(self):
        # Same params, both impls -> same logits (pallas falls back to XLA on
        # CPU unless interpreting, so force interpret through the dispatch).
        from conformer_tpu.ops.pallas import depthwise_conv as dc
        from conformer_tpu.config import ModelConfig
        from conformer_tpu.models.conformer import Conformer

        cfg_x = ModelConfig.tiny(vocab_size=20)
        cfg_p = ModelConfig(**{**cfg_x.__dict__, "conv_impl": "pallas"})
        mels = jax.random.normal(jax.random.PRNGKey(0), (1, 61, 80))
        lengths = jnp.array([61])
        m_x = Conformer(cfg_x, deterministic=True)
        v = m_x.init(jax.random.PRNGKey(1), mels, lengths)
        (want, _), _ = m_x.apply(v, mels, lengths, mutable=[])

        # Route the pallas impl through interpret mode for CPU execution.
        import unittest.mock as mock
        orig = dc._forward
        dc_interp = lambda x, w, b, up, ip: orig(x, w, b, up, True)
        m_p = Conformer(cfg_p, deterministic=True)
        with mock.patch.object(dc, "_forward", side_effect=dc_interp):
            (got, _), _ = m_p.apply(v, mels, lengths, mutable=[])
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4)
