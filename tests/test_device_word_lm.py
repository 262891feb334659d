"""Word-level LM fusion in the DEVICE beam search.

The host decoder (decode/beam_search.py) is the behavioral spec: it completes
words by string lookup at delimiter emissions and scores them against a
word-level ARPA. The device search replaces the string machinery with rolling
character hashes + an HBM-resident hashed word vocabulary
(lm/device_table.py:DeviceWordVocab) and must agree with the host exactly
(modulo 2x32-bit hash collisions).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from conformer_tpu.config import DecodeConfig
from conformer_tpu.decode.beam_search import BeamSearchDecoder
from conformer_tpu.lm.device_table import (DeviceNgramTable, DeviceWordVocab,
                                           _poly_hash_np, _POLY1, _POLY2,
                                           lookup_word_ids)
from conformer_tpu.lm.ngram import build_arpa
from conformer_tpu.ops.beam_search_device import ctc_beam_search_device
from conformer_tpu.text.tokenizer import load_tokenizer


@pytest.fixture(scope="module")
def tok():
    return load_tokenizer("vi")


@pytest.fixture(scope="module")
def word_arpa(tmp_path_factory):
    root = tmp_path_factory.mktemp("wordlm")
    corpus = root / "corpus.txt"
    lines = ["XIN CHÀO", "XIN CHÀO BẠN", "CẢM ƠN BẠN", "TẠM BIỆT",
             "XIN LỖI", "CHÀO BẠN"] * 5
    corpus.write_text("\n".join(lines), encoding="utf8")
    path = str(root / "lm.arpa")
    build_arpa(str(corpus), path, order=3)
    return path


@pytest.fixture(scope="module")
def fused(tok, word_arpa):
    table = DeviceNgramTable.from_arpa(word_arpa)
    wv = DeviceWordVocab.build(tok.vocab, table.vocab)
    return table, wv


def word_kwargs(tok, table, wv, alpha=0.8, beta=1.5):
    return dict(lm_tables=table.device_arrays(),
                word_arrays=wv.device_arrays(),
                lm_alpha=alpha, lm_beta=beta, delim_id=tok.delim_id,
                lm_bos_id=int(table.bos_id),
                lm_unk_logp=float(table.unk_logp),
                lm_order=int(table.order))


def peaked_frames(tok, text, noise=-9.0):
    ids = tok.encode(text)
    seq = []
    for t in ids:
        seq.extend([t, t, tok.pad_id])
    lp = np.full((len(seq), tok.vocab_size), noise, np.float32)
    for i, t in enumerate(seq):
        lp[i, t] = -0.05
    return (lp - np.log(np.exp(lp).sum(1, keepdims=True))).astype(np.float32)


def device_text(tok, prefixes, plens, i=0, rank=0):
    ids = np.asarray(prefixes)[i, rank, :int(np.asarray(plens)[i, rank])]
    return tok.spec_decode(tok.collapsed_ids_to_text(ids, len(ids))).strip()


class TestRollingHash:
    def test_token_fold_matches_string_hash(self, tok):
        wv = DeviceWordVocab.build(tok.vocab, {"CHÀO": 0})
        rng = np.random.default_rng(0)
        for _ in range(20):
            n = int(rng.integers(1, 6))
            toks = rng.integers(0, tok.vocab_size, n)
            word = "".join(tok.vocab[int(c)] for c in toks)
            h1 = jnp.zeros((), jnp.uint32)
            h2 = jnp.zeros((), jnp.uint32)
            for c in toks:
                c = int(c)
                h1 = h1 * wv.tok_a1[c] + wv.tok_b1[c]
                h2 = h2 * wv.tok_a2[c] + wv.tok_b2[c]
            assert int(h1) == int(_poly_hash_np(word, _POLY1)), word
            assert int(h2) == int(_poly_hash_np(word, _POLY2)), word

    def test_all_lm_words_found(self, tok, fused):
        table, wv = fused
        words = [(w, i) for w, i in table.vocab.items()
                 if w not in ("<s>", "</s>", "<unk>")]
        h1 = jnp.asarray([_poly_hash_np(w, _POLY1) for w, _ in words])
        h2 = jnp.asarray([_poly_hash_np(w, _POLY2) for w, _ in words])
        got = np.asarray(lookup_word_ids(wv.device_arrays(), h1, h2))
        assert list(got) == [i for _, i in words]

    def test_unknown_word_misses(self, fused):
        _, wv = fused
        h1 = jnp.asarray([_poly_hash_np("ZZZQ", _POLY1)])
        h2 = jnp.asarray([_poly_hash_np("ZZZQ", _POLY2)])
        got = np.asarray(lookup_word_ids(wv.device_arrays(), h1, h2))
        assert got[0] == -1

    def test_big_vocab_round_trips(self, tok):
        # Enough distinct words that buckets carry several entries each
        # (single-hash bucketized layout, lm/device_table.py:
        # _build_pair_table); every word must still round-trip, and
        # unknown words must miss.
        rng = np.random.default_rng(7)
        letters = list("ABCDEGHIKLMNOPQRSTUVXY")
        spellings = {"".join(rng.choice(letters, 8)) for _ in range(4000)}
        words = {w: i for i, w in enumerate(sorted(spellings))}
        wv = DeviceWordVocab.build(tok.vocab, words)
        items = sorted(words.items())
        h1 = jnp.asarray([_poly_hash_np(w, _POLY1) for w, _ in items])
        h2 = jnp.asarray([_poly_hash_np(w, _POLY2) for w, _ in items])
        got = np.asarray(lookup_word_ids(wv.device_arrays(), h1, h2))
        assert list(got) == [i for _, i in items]
        m1 = jnp.asarray([_poly_hash_np("ZZZZZZZZZ", _POLY1)])
        m2 = jnp.asarray([_poly_hash_np("ZZZZZZZZZ", _POLY2)])
        assert np.asarray(lookup_word_ids(wv.device_arrays(),
                                          m1, m2))[0] == -1


class TestAgainstHostDecoder:
    """Permissive operating point (no pruning, full candidate set, wide
    beams) so both searches are effectively exhaustive, then texts AND
    fused scores must agree with the host spec decode_py."""

    def _host(self, tok, word_arpa, alpha, beta, width=64):
        cfg = DecodeConfig(lm_path=word_arpa, alpha=alpha, beta=beta,
                           beam_width=width, beam_prune_logp=-1e9,
                           token_min_logp=-1e9, hotwords=())
        return BeamSearchDecoder(tok, cfg, native=False)

    @pytest.mark.parametrize("text", ["xin chào", "cảm ơn bạn",
                                      "xin chào bạn"])
    def test_peaked_paths_match(self, tok, word_arpa, fused, text):
        table, wv = fused
        alpha, beta = 0.8, 1.5
        lp = peaked_frames(tok, text)
        host = self._host(tok, word_arpa, alpha, beta)
        host_beams = host.step_py(host.start_state(), lp)
        host_text = host.finalize_py(host_beams)

        out = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=64, top_k=tok.vocab_size - 1,
            unk_id=tok.unk_id, **word_kwargs(tok, table, wv, alpha, beta))
        assert device_text(tok, out[0], out[1]) == host_text

        # Host best total (acoustic + fused LM + trailing partial) must
        # match the device's folded score.
        best = max(
            (b.total() + (host._word_bonus(b, b.partial)[0] if b.partial
                          else 0.0)) for b in host_beams)
        assert float(out[2][0, 0]) == pytest.approx(best, abs=2e-3)

    def test_ambiguous_acoustics_match(self, tok, word_arpa, fused):
        # Noisy frames: several competing prefixes with live LM state
        # (completed words, partials, OOVs) must still match the host.
        table, wv = fused
        alpha, beta = 1.2, 2.0
        rng = np.random.default_rng(7)
        lp = peaked_frames(tok, "xin chào", noise=-6.0)
        lp = lp + rng.standard_normal(lp.shape).astype(np.float32) * 1.2
        lp = lp - np.log(np.exp(lp).sum(1, keepdims=True))

        host = self._host(tok, word_arpa, alpha, beta, width=96)
        host_beams = host.step_py(host.start_state(), lp)
        host_text = host.finalize_py(host_beams)
        out = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=96, top_k=tok.vocab_size - 1,
            unk_id=tok.unk_id, **word_kwargs(tok, table, wv, alpha, beta))
        assert device_text(tok, out[0], out[1]) == host_text

    def test_oov_words_penalized_like_host(self, tok, word_arpa, fused):
        # "ZZZ" is not in the LM: both searches must apply the same unk
        # backoff penalty and produce the same ranking.
        table, wv = fused
        alpha, beta = 1.0, 0.0
        lp = peaked_frames(tok, "pq rs")  # both words OOV
        host = self._host(tok, word_arpa, alpha, beta)
        host_beams = host.step_py(host.start_state(), lp)
        host_text = host.finalize_py(host_beams)
        out = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=64, top_k=tok.vocab_size - 1,
            unk_id=tok.unk_id, **word_kwargs(tok, table, wv, alpha, beta))
        assert device_text(tok, out[0], out[1]) == host_text
        best = max(
            (b.total() + (host._word_bonus(b, b.partial)[0] if b.partial
                          else 0.0)) for b in host_beams)
        assert float(out[2][0, 0]) == pytest.approx(best, abs=2e-3)


class TestFusionBehavior:
    def test_word_lm_rescues_ambiguous_word(self, tok, fused):
        # Acoustics slightly prefer "TRÀO"; the word LM has only "CHÀO".
        table, wv = fused
        lp = peaked_frames(tok, "xin chào")
        ch, tr = tok.token_id("CH"), tok.token_id("TR")
        for t in range(lp.shape[0]):
            if np.argmax(lp[t]) == ch:
                lp[t, tr] = lp[t, ch] + 0.3
                lp[t] -= np.log(np.exp(lp[t]).sum())

        no_lm = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=16, top_k=8, unk_id=tok.unk_id)
        with_lm = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=16, top_k=8, unk_id=tok.unk_id,
            **word_kwargs(tok, table, wv, alpha=2.1, beta=0.0))
        assert device_text(tok, no_lm[0], no_lm[1]) == "XIN TRÀO"
        assert device_text(tok, with_lm[0], with_lm[1]) == "XIN CHÀO"

    def test_trailing_partial_scored(self, tok, fused):
        # Utterance ending mid-word: the final ranking must include the
        # partial word's LM score (finalize semantics). "XIN CHÀ|O" cut
        # before the delimiter still completes through the partial bonus.
        table, wv = fused
        lp = peaked_frames(tok, "xin chào")
        # Drop the trailing delimiter frames if any; text has no trailing
        # delim anyway — beams end with partial "CHÀO".
        out = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=16, top_k=8, unk_id=tok.unk_id,
            **word_kwargs(tok, table, wv, alpha=1.0, beta=5.0))
        assert device_text(tok, out[0], out[1]) == "XIN CHÀO"
        assert np.isfinite(float(out[2][0, 0]))

    def test_jittable(self, tok, fused):
        import functools

        import jax

        table, wv = fused
        f = jax.jit(functools.partial(
            ctc_beam_search_device, beam_width=8, top_k=4, unk_id=tok.unk_id,
            **word_kwargs(tok, table, wv)))
        out = f(jnp.asarray(peaked_frames(tok, "xin chào")[None]))
        assert np.isfinite(float(out[2][0, 0]))


class TestDeviceHotwords:
    def _hot_kwargs(self, tok, table, wv, hotwords, weight=9.0,
                    alpha=0.8, beta=1.5):
        from conformer_tpu.lm.device_table import DeviceHotwords

        hot = DeviceHotwords.build(hotwords)
        return dict(word_kwargs(tok, table, wv, alpha, beta),
                    hot_arrays=hot.device_arrays(),
                    hot_weight=weight)

    def _host(self, tok, word_arpa, hotwords, weight=9.0,
              alpha=0.8, beta=1.5, width=64):
        cfg = DecodeConfig(lm_path=word_arpa, alpha=alpha, beta=beta,
                           beam_width=width, beam_prune_logp=-1e9,
                           token_min_logp=-1e9, hotwords=tuple(hotwords),
                           hotword_weight=weight)
        return BeamSearchDecoder(tok, cfg, native=False)

    @pytest.mark.parametrize("hotwords", [
        ("CHÀO",),                      # single word
        ("XIN CHÀO",),                  # two-word phrase
        ("XIN CHÀO BẠN", "TẠM BIỆT"),   # three-word + unrelated
        ("ZZRX",),                      # hotword not in the LM (OOV)
    ])
    def test_matches_host_with_hotwords(self, tok, word_arpa, fused,
                                        hotwords):
        table, wv = fused
        lp = peaked_frames(tok, "xin chào bạn")
        host = self._host(tok, word_arpa, hotwords)
        host_beams = host.step_py(host.start_state(), lp)
        host_text = host.finalize_py(host_beams)
        out = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=64, top_k=tok.vocab_size - 1,
            unk_id=tok.unk_id,
            **self._hot_kwargs(tok, table, wv, hotwords))
        assert device_text(tok, out[0], out[1]) == host_text
        best = max(
            (b.total() + (host._word_bonus(b, b.partial)[0] if b.partial
                          else 0.0)) for b in host_beams)
        assert float(out[2][0, 0]) == pytest.approx(best, abs=2e-3)

    def test_hotword_rescues_ambiguous_word(self, tok, fused):
        # LM off (alpha 0): only the hotword bonus distinguishes the
        # acoustically preferred "TRÀO" from the hotword "CHÀO".
        table, wv = fused
        lp = peaked_frames(tok, "xin chào")
        ch, tr = tok.token_id("CH"), tok.token_id("TR")
        for t in range(lp.shape[0]):
            if np.argmax(lp[t]) == ch:
                lp[t, tr] = lp[t, ch] + 0.3
                lp[t] -= np.log(np.exp(lp[t]).sum())
        kw = self._hot_kwargs(tok, table, wv, ("XIN CHÀO",), weight=5.0,
                              alpha=0.0, beta=0.0)
        out = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=16, top_k=8,
            unk_id=tok.unk_id, **kw)
        assert device_text(tok, out[0], out[1]) == "XIN CHÀO"
        no_hot = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=16, top_k=8,
            unk_id=tok.unk_id)
        assert device_text(tok, no_hot[0], no_hot[1]) == "XIN TRÀO"

    def test_phrase_requires_full_match(self, tok, word_arpa, fused):
        # "CẢM ƠN BẠN" contains no suffix equal to "XIN CHÀO"; scores with
        # and without the hotword table must be identical.
        table, wv = fused
        lp = peaked_frames(tok, "cảm ơn bạn")
        base = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=16, top_k=8, unk_id=tok.unk_id,
            **word_kwargs(tok, table, wv))
        hot = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=16, top_k=8, unk_id=tok.unk_id,
            **self._hot_kwargs(tok, table, wv, ("XIN CHÀO",)))
        np.testing.assert_allclose(np.asarray(hot[2]), np.asarray(base[2]),
                                   atol=1e-5)


class TestStreamingStateCarry:
    """Prefix beam search is frame-sequential: feeding chunks through a
    carried BeamState must equal offline decode of the concatenation
    EXACTLY — including word-LM contexts, partial-word hashes and hotword
    rings (the host BeamStream invariant, decode/beam_search.py)."""

    def test_two_chunks_equal_offline(self, tok, fused):
        from conformer_tpu.lm.device_table import DeviceHotwords

        table, wv = fused
        hot = DeviceHotwords.build(("XIN CHÀO",))
        kw = dict(word_kwargs(tok, table, wv, alpha=1.1, beta=2.0),
                  hot_arrays=hot.device_arrays(),
                  hot_weight=3.0,
                  beam_width=16, top_k=8, unk_id=tok.unk_id, max_len=48)
        rng = np.random.default_rng(3)
        lp = peaked_frames(tok, "xin chào bạn", noise=-6.0)
        lp = lp + rng.standard_normal(lp.shape).astype(np.float32) * 0.8
        lp = lp - np.log(np.exp(lp).sum(1, keepdims=True))

        offline = ctc_beam_search_device(jnp.asarray(lp[None]), **kw)

        cut = lp.shape[0] // 2
        _, _, _, state = ctc_beam_search_device(
            jnp.asarray(lp[None, :cut]), return_state=True, **kw)
        chunked = ctc_beam_search_device(
            jnp.asarray(lp[None, cut:]), init_state=state, **kw)

        np.testing.assert_array_equal(np.asarray(chunked[1]),
                                      np.asarray(offline[1]))
        np.testing.assert_allclose(np.asarray(chunked[2]),
                                   np.asarray(offline[2]), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(chunked[0]),
                                      np.asarray(offline[0]))

    def test_start_frames_skip_context(self, tok, fused):
        # Prepending junk context frames masked by start_frames must not
        # change the result.
        table, wv = fused
        kw = dict(word_kwargs(tok, table, wv), beam_width=8, top_k=8,
                  unk_id=tok.unk_id, max_len=48)
        lp = peaked_frames(tok, "xin chào")
        rng = np.random.default_rng(9)
        junk = rng.standard_normal((5, lp.shape[1])).astype(np.float32)
        junk = junk - np.log(np.exp(junk).sum(1, keepdims=True))
        padded = np.concatenate([junk, lp], 0)

        plain = ctc_beam_search_device(jnp.asarray(lp[None]), **kw)
        skipped = ctc_beam_search_device(
            jnp.asarray(padded[None]),
            start_frames=jnp.asarray([5], jnp.int32), **kw)
        np.testing.assert_array_equal(np.asarray(skipped[1]),
                                      np.asarray(plain[1]))
        np.testing.assert_allclose(np.asarray(skipped[2]),
                                   np.asarray(plain[2]), atol=1e-5)


class TestShardedWordFusion:
    def test_sharded_matches_unsharded(self, tok, fused):
        import jax
        from jax.sharding import Mesh

        from conformer_tpu.ops.beam_search_device import (
            ctc_beam_search_device_sharded)

        table, wv = fused
        n_slots = table.device_arrays()[0].shape[1]
        if n_slots % 2 != 0:
            pytest.skip("odd slot count")
        lp = np.stack([peaked_frames(tok, "xin chào")[:18],
                       peaked_frames(tok, "cảm ơn")[:18],
                       peaked_frames(tok, "tạm biệt")[:18],
                       peaked_frames(tok, "chào bạn")[:18]])
        lengths = jnp.asarray([18, 15, 18, 12], jnp.int32)
        kw = dict(beam_width=8, top_k=6, unk_id=tok.unk_id,
                  **word_kwargs(tok, table, wv))
        want = ctc_beam_search_device(jnp.asarray(lp), lengths, **kw)
        mesh = Mesh(np.array(jax.devices()).reshape(4, 2),
                    ("data", "model"))
        got = ctc_beam_search_device_sharded(jnp.asarray(lp), lengths,
                                             mesh=mesh, **kw)
        np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
        np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
