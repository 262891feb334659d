"""Tokenizer semantics tests: vocab assembly, segmentation rules, round-trips,
and greedy-decode text assembly (reference: processing/processor.py:76-345)."""

import numpy as np
import pytest

from conformer_tpu.text.metrics import cer, edit_distance, wer
from conformer_tpu.text.tokenizer import load_tokenizer


@pytest.fixture(scope="module")
def vi():
    return load_tokenizer("vi")


@pytest.fixture(scope="module")
def en():
    return load_tokenizer("en")


class TestVocab:
    def test_sizes_match_reference(self, vi, en):
        # reference: processing/processor.py:114 applied to tokenizer/vi.json
        # and tokenizer/english.json.
        assert vi.vocab_size == 370
        assert en.vocab_size == 160

    def test_special_ids(self, vi):
        assert vi.pad_id == 0                      # blank == pad == 0
        assert vi.vocab[-1] == "<UNK>"
        assert vi.vocab[-2] == "|"

    def test_unknown_token_maps_to_unk(self, vi):
        assert vi.token_id("ZZZZZ") == vi.unk_id


class TestSegmentation:
    def test_mix_prefix_rules(self, vi):
        # QU/GI handling (reference: processing/processor.py:166-185).
        assert vi.word2graphemes("QU") == ["Q", "U"]
        assert vi.word2graphemes("GI") == ["G", "I"]
        g = vi.word2graphemes("QUỐC")
        assert g[0] == "QU"
        # GI followed by consonant keeps only G.
        g = vi.word2graphemes("GIM")
        assert g[0] == "G"

    def test_spec_replace(self, vi):
        # OÀ -> ÒA substitution (reference: processing/processor.py:218-226).
        assert vi.spec_replace("TOÀN") == "TÒAN"
        g = vi.word2graphemes("TOÀN")
        assert "ÒA" in g

    def test_spec_decode_inverts_replace(self, vi):
        # spec_decode re-inserts the original digraph before a following
        # non-space char (reference: processing/processor.py:228-231).
        assert vi.spec_decode("TÒAN") == "TOÀN"
        # Trailing (word-final) digraph is NOT reverted — (\S) needs a follower.
        assert vi.spec_decode("HÒA") == "HÒA"

    def test_clean_text(self, vi):
        assert vi.clean_text("xin, chào!? ") == "xin chào"

    def test_single_char_unknown(self, vi):
        assert vi.slide_graphemes("@") == [vi.unk_token]

    def test_longest_match_priority(self, vi):
        # NGH is a pattern and must win over N+G+H.
        assert vi.slide_graphemes("NGHE", n_grams=3) == ["NGH", "E"]


class TestRoundTrip:
    SENTENCES = [
        "xin chào thế giới",
        "tôi là người việt nam",
        "quả quýt",
        "nghe nhạc",
    ]

    @pytest.mark.parametrize("s", SENTENCES)
    def test_encode_decode_roundtrip(self, vi, s):
        ids = vi.encode(s)
        assert all(i != vi.unk_id for i in ids), f"UNK leaked for {s!r}"
        text = vi.spec_decode(vi.decode_ids(ids))
        assert text == s.upper()

    def test_encode_batch_padding(self, vi):
        ids, lengths = vi.encode_batch(["xin chào", "a"])
        assert ids.shape[0] == 2
        assert ids[1, lengths[1]:].tolist() == [vi.pad_id] * (ids.shape[1] - lengths[1])


class TestGreedyDecode:
    def test_ctc_frames_to_text(self, vi):
        ids = vi.encode("xin chào")
        # Duplicate every frame and sprinkle blanks: decode must recover.
        frames = []
        for t in ids:
            frames += [t, t, vi.pad_id]
        got = vi.greedy_decode(np.array(frames))
        assert got == "XIN CHÀO"

    def test_device_collapse_agrees_with_host(self, vi):
        import jax.numpy as jnp
        from conformer_tpu.ops.ctc import greedy_collapse
        rng = np.random.default_rng(0)
        ids = rng.integers(0, vi.vocab_size, size=(4, 60)).astype(np.int32)
        packed, counts = greedy_collapse(jnp.asarray(ids), unk_id=vi.unk_id)
        for b in range(4):
            host = vi.greedy_decode(ids[b])
            dev = vi.collapsed_ids_to_text(np.asarray(packed)[b], int(counts[b]))
            assert host == dev


class TestMetrics:
    def test_edit_distance(self):
        assert edit_distance("kitten", "sitting") == 3
        assert edit_distance([], ["a"]) == 1

    def test_wer_cer(self):
        assert wer("a b c", "a b c") == 0.0
        assert wer("a x c", "a b c") == pytest.approx(1 / 3)
        assert cer("abc", "adc") == pytest.approx(1 / 3)
        assert wer(["a b", "c"], ["a b", "d"]) == pytest.approx(1 / 3)
