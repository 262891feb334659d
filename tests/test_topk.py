"""topk_lastaxis == jax.lax.top_k on the decode input domain (ops/topk.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.ops.topk import NEG, topk_lastaxis


@pytest.mark.parametrize("shape,k", [((370,), 8), ((6, 370), 8),
                                     ((3, 5, 37), 4), ((2, 16), 16)])
def test_matches_lax_topk_random(shape, k):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(shape).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(x, k)
    v, i = jax.jit(topk_lastaxis, static_argnums=1)(x, k)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_ties_take_ascending_indices():
    x = jnp.asarray(np.array([[1.0, 3.0, 3.0, 0.5, 3.0, 2.0]], np.float32))
    v_ref, i_ref = jax.lax.top_k(x, 4)
    v, i = topk_lastaxis(x, 4)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))


def test_neg_masked_lanes_match():
    # The decode convention: dead lanes hold exactly NEG. With more dead
    # lanes than live ones, top_k fills with NEG values at ascending
    # indices — the iterative form must reproduce that order too.
    x = jnp.full((2, 10), NEG, jnp.float32)
    x = x.at[0, 7].set(-1.0).at[1, 3].set(-2.0).at[1, 9].set(-1.5)
    v_ref, i_ref = jax.lax.top_k(x, 5)
    v, i = topk_lastaxis(x, 5)
    np.testing.assert_array_equal(np.asarray(v), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
