"""Tests for core ops: rel-shift, masking/length formulas, CTC loss, greedy collapse."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.ops.ctc import ctc_loss, greedy_collapse
from conformer_tpu.ops.rel_shift import rel_shift, rel_shift_reference
from conformer_tpu.utils.masking import (attention_pad_mask, mel_frame_length,
                                         padding_mask, subsampled_length)


class TestRelShift:
    def test_matches_naive_gather(self):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((2, 3, 7, 13)).astype(np.float32))
        np.testing.assert_allclose(rel_shift(x), rel_shift_reference(x), rtol=1e-6)

    def test_semantics_distance_alignment(self):
        # raw[i, k] scores relative-PE row k; row k <-> relative position L-1-k.
        # After the shift out[i, j] must score relative distance i - j.
        l = 5
        # Make raw[i, k] = k so we can read off which k landed at (i, j).
        raw = jnp.broadcast_to(jnp.arange(2 * l - 1, dtype=jnp.float32), (1, 1, l, 2 * l - 1))
        out = np.asarray(rel_shift(raw))[0, 0]
        for i in range(l):
            for j in range(l):
                assert out[i, j] == j - i + l - 1  # PE row index
                # therefore relative position = (l-1) - (j-i+l-1) = i - j


class TestMasking:
    def test_length_formulas(self):
        assert mel_frame_length(16000, 160) == 101
        assert subsampled_length(101) == 24
        # Parity with the reference composition for a sweep of lengths
        # (clamped at 0 — the raw reference formula goes negative below 7
        # frames, reference: model/utils/convolution.py:55).
        for n in range(7, 4000, 131):
            t = n // 160 + 1
            assert subsampled_length(t) == max(0, ((t - 1) // 2 - 1) // 2)
        assert subsampled_length(0) == 0

    def test_padding_mask(self):
        m = np.asarray(padding_mask(jnp.array([3, 0, 5]), 5))
        np.testing.assert_array_equal(m.sum(axis=1), [3, 0, 5])
        assert m[0, 2] and not m[0, 3]

    def test_attention_mask_true_at_pad(self):
        m = np.asarray(attention_pad_mask(jnp.array([2]), 4))
        assert m.shape == (1, 1, 1, 4)
        np.testing.assert_array_equal(m[0, 0, 0], [False, False, True, True])


class TestGreedyCollapse:
    def test_basic_collapse(self):
        ids = jnp.array([[1, 1, 0, 2, 2, 3, 0, 0]])
        packed, counts = greedy_collapse(ids)
        assert counts[0] == 3
        np.testing.assert_array_equal(np.asarray(packed)[0, :3], [1, 2, 3])

    def test_repeat_across_blank_collapsed(self):
        # Reference quirk (processor.py:307-319): blank does NOT reset the
        # repeat state, so A _ A collapses to a single A.
        ids = jnp.array([[1, 0, 1, 0, 2]])
        packed, counts = greedy_collapse(ids)
        assert counts[0] == 2
        np.testing.assert_array_equal(np.asarray(packed)[0, :2], [1, 2])

    def test_unk_skipped_without_reset(self):
        ids = jnp.array([[1, 9, 1, 2]])
        _, counts = greedy_collapse(ids, unk_id=9)
        assert counts[0] == 2  # 1, 2 (unk skipped, repeat collapsed across it)

    def test_respects_lengths(self):
        ids = jnp.array([[1, 2, 3, 4]])
        _, counts = greedy_collapse(ids, lengths=jnp.array([2]))
        assert counts[0] == 2

    def test_matches_host_reference(self):
        rng = np.random.default_rng(3)
        ids = rng.integers(0, 5, size=(8, 50)).astype(np.int32)
        packed, counts = greedy_collapse(jnp.asarray(ids), unk_id=4)
        for b in range(8):
            expect, prev = [], None
            for t in ids[b]:
                if t in (0, 4):
                    continue
                if prev != t:
                    prev = int(t)
                    expect.append(int(t))
            got = list(np.asarray(packed)[b, : int(counts[b])])
            assert got == expect


class TestCTCLoss:
    def test_matches_manual_forward(self):
        # Single sequence, trivially checkable: T=1, label length 1.
        logits = jnp.array([[[0.1, 0.9, -0.2]]])  # (1, 1, 3)
        labels = jnp.array([[1]])
        loss = ctc_loss(logits, jnp.array([1]), labels, jnp.array([1]))
        want = -jax.nn.log_softmax(logits[0, 0])[1]
        np.testing.assert_allclose(loss, want, rtol=1e-6)

    def test_mean_reduction_divides_by_label_length(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.standard_normal((2, 6, 5)).astype(np.float32))
        labels = jnp.array([[1, 2, 0], [1, 2, 3]])
        lens = jnp.array([6, 6])
        lab_lens = jnp.array([2, 3])
        import optax
        per = optax.ctc_loss(logits,
                             1.0 - np.asarray(padding_mask(lens, 6), np.float32),
                             labels,
                             1.0 - np.asarray(padding_mask(lab_lens, 3), np.float32))
        want = np.mean(np.asarray(per) / np.array([2.0, 3.0]))
        got = ctc_loss(logits, lens, labels, lab_lens)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_per_seq_matches_optax_values_and_grads(self):
        # The in-repo unrolled alpha recursion (ops/ctc.py:ctc_per_seq) must
        # match optax.ctc_loss exactly — values and logit gradients — on
        # random batches with repeated labels and frame/label padding.
        import optax

        from conformer_tpu.ops.ctc import ctc_per_seq
        rng = np.random.default_rng(7)
        b, t, k, n = 4, 23, 11, 7
        logits = jnp.asarray(rng.standard_normal((b, t, k)).astype(np.float32))
        labels = jnp.asarray(
            rng.integers(1, k, size=(b, n)).astype(np.int32))
        labels = labels.at[0, 1].set(labels[0, 0])   # force a repeat
        frame_lens = jnp.asarray([23, 17, 23, 9])
        lab_lens = jnp.asarray([7, 5, 1, 3])
        lp = 1.0 - np.asarray(padding_mask(frame_lens, t), np.float32)
        lbp = 1.0 - np.asarray(padding_mask(lab_lens, n), np.float32)

        for unroll in (1, 8):
            got = ctc_per_seq(logits, lp, labels, lbp, unroll=unroll)
            want = optax.ctc_loss(logits, lp, labels, lbp)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)

        g_got = jax.grad(lambda x: jnp.sum(ctc_per_seq(x, lp, labels, lbp)))(
            logits)
        g_want = jax.grad(
            lambda x: jnp.sum(optax.ctc_loss(x, lp, labels, lbp)))(logits)
        np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                                   rtol=1e-4, atol=1e-5)

    def test_impossible_alignment_zeroed(self):
        # Label longer than frames -> infinite loss -> zeroed (zero_infinity).
        logits = jnp.zeros((1, 2, 4))
        labels = jnp.array([[1, 2, 3]])
        loss = ctc_loss(logits, jnp.array([2]), labels, jnp.array([3]))
        assert np.isfinite(np.asarray(loss))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
