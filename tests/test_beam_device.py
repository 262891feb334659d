"""Device CTC beam search tests: brute-force agreement, host-beam agreement,
batching/length handling."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.ops.beam_search_device import ctc_beam_search_device


def brute_force(lp, blank=0):
    t, v = lp.shape
    from collections import defaultdict

    scores = defaultdict(lambda: -np.inf)

    def collapse(path):
        out, prev = [], None
        for s in path:
            if s != prev and s != blank:
                out.append(s)
            prev = s
        return tuple(out)

    for path in itertools.product(range(v), repeat=t):
        p = sum(lp[i, s] for i, s in enumerate(path))
        key = collapse(path)
        scores[key] = np.logaddexp(scores[key], p)
    return sorted(scores.items(), key=lambda kv: -kv[1])


def rand_logprobs(rng, t, v, scale=2.0):
    logits = rng.standard_normal((t, v)) * scale
    return logits - np.log(np.exp(logits).sum(1, keepdims=True))


class TestAgainstBruteForce:
    def test_top1_and_score(self):
        rng = np.random.default_rng(0)
        for _ in range(5):
            lp = rand_logprobs(rng, 5, 4)
            want = brute_force(lp)
            prefixes, plens, scores = ctc_beam_search_device(
                jnp.asarray(lp[None]), beam_width=64, top_k=3)
            got_prefix = tuple(int(x) for x in
                               np.asarray(prefixes)[0, 0, :int(plens[0, 0])])
            assert got_prefix == want[0][0]
            # With beam 64 >> #prefixes, scores should be near-exact.
            assert abs(float(scores[0, 0]) - want[0][1]) < 5e-3

    def test_max_len_caps_emissions(self):
        # Peaked alternating logits force an emission every frame; with a
        # tiny max_len the buffer-full guard must stop extensions at the
        # cap and the backpointer-rebuilt buffer must stay in bounds (the
        # rebuild scatters emissions at init_plen + cumulative count — any
        # off-by-one would spill past the cap or wrap).
        t, v, cap = 9, 4, 3
        lp = np.full((t, v), -20.0, np.float32)
        for i in range(t):
            lp[i, 1 + (i % 2)] = 0.0                       # tokens 1,2,1,2,...
        prefixes, plens, scores = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=8, top_k=3, max_len=cap)
        plens = np.asarray(plens)
        prefixes = np.asarray(prefixes)
        assert prefixes.shape[-1] == cap
        assert int(plens[0, 0]) == cap
        assert tuple(prefixes[0, 0]) == (1, 2, 1)
        assert (plens <= cap).all()

    def test_wide_beam_recovers_topk_ranking(self):
        rng = np.random.default_rng(3)
        lp = rand_logprobs(rng, 4, 4)
        want = brute_force(lp)
        prefixes, plens, scores = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=128, top_k=3)
        for i in range(3):
            got = tuple(int(x) for x in
                        np.asarray(prefixes)[0, i, :int(plens[0, i])])
            assert got == want[i][0], f"rank {i}"


class TestBatchingAndLengths:
    def test_lengths_mask_trailing_frames(self):
        rng = np.random.default_rng(1)
        lp_short = rand_logprobs(rng, 4, 5)
        pad = np.tile(rand_logprobs(rng, 1, 5), (3, 1))
        lp_padded = np.concatenate([lp_short, pad], axis=0)
        a = ctc_beam_search_device(jnp.asarray(lp_short[None]), beam_width=8)
        b = ctc_beam_search_device(jnp.asarray(lp_padded[None]),
                                   lengths=jnp.array([4]), beam_width=8)
        na, nb = int(a[1][0, 0]), int(b[1][0, 0])
        assert na == nb
        np.testing.assert_array_equal(np.asarray(a[0])[0, 0, :na],
                                      np.asarray(b[0])[0, 0, :nb])
        np.testing.assert_allclose(float(a[2][0, 0]), float(b[2][0, 0]),
                                   atol=1e-4)

    def test_batch_independence(self):
        rng = np.random.default_rng(2)
        lps = np.stack([rand_logprobs(rng, 6, 6) for _ in range(3)])
        batched = ctc_beam_search_device(jnp.asarray(lps), beam_width=8)
        for i in range(3):
            single = ctc_beam_search_device(jnp.asarray(lps[i][None]),
                                            beam_width=8)
            np.testing.assert_allclose(float(batched[2][i, 0]),
                                       float(single[2][0, 0]), atol=1e-4)

    def test_greedyish_peaked_input(self):
        # Strongly peaked frames: beam must reproduce the collapsed argmax.
        from conformer_tpu.ops.ctc import greedy_collapse
        rng = np.random.default_rng(4)
        ids = np.array([1, 1, 0, 2, 3, 3, 0, 4])
        lp = np.full((len(ids), 6), -15.0)
        lp[np.arange(len(ids)), ids] = -0.01
        prefixes, plens, _ = ctc_beam_search_device(jnp.asarray(lp[None]),
                                                    beam_width=4)
        got = list(np.asarray(prefixes)[0, 0, :int(plens[0, 0])])
        packed, counts = greedy_collapse(jnp.asarray(ids[None]))
        want = list(np.asarray(packed)[0, :int(counts[0])])
        # Note: device beam uses textbook CTC collapse (blank resets repeats);
        # greedy_collapse mimics the reference's sticky-prev rule. For this
        # input both agree.
        assert got == want

    def test_unk_never_emitted(self):
        rng = np.random.default_rng(5)
        lp = rand_logprobs(rng, 10, 5)
        lp[:, 4] = 0.0  # make unk dominant
        lp = lp - np.log(np.exp(lp).sum(1, keepdims=True))
        prefixes, plens, _ = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=4, unk_id=4)
        toks = np.asarray(prefixes)[0, 0, :int(plens[0, 0])]
        assert not (toks == 4).any()


class TestAgainstHostBeam:
    def test_text_agreement_no_lm(self):
        from conformer_tpu.config import DecodeConfig
        from conformer_tpu.decode.beam_search import BeamSearchDecoder
        from conformer_tpu.text.tokenizer import load_tokenizer

        tok = load_tokenizer("vi")
        dec = BeamSearchDecoder(tok, DecodeConfig(beam_width=16,
                                                  token_min_logp=-12.0))
        rng = np.random.default_rng(6)
        ids = tok.encode("xin chào bạn")
        frames = []
        for t in ids:
            frames += [t, t, tok.pad_id]
        lp = np.full((len(frames), tok.vocab_size), -14.0, np.float32)
        for i, t in enumerate(frames):
            lp[i, t] = -0.05
        lp = lp - np.log(np.exp(lp).sum(1, keepdims=True))

        host_text = dec.decode(lp)
        prefixes, plens, _ = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=16, top_k=8, unk_id=tok.unk_id)
        dev_text = tok.collapsed_ids_to_text(
            np.asarray(prefixes)[0, 0], int(plens[0, 0]))
        dev_text = tok.spec_decode(dev_text)
        assert dev_text == host_text == "XIN CHÀO BẠN"


class TestScanUnrollInvariance:
    def test_unroll_matches_unroll1(self):
        # scan_unroll only changes how lax.scan lays out the frame loop;
        # results must be bit-compatible with the default.
        rng = np.random.default_rng(11)
        lp = rng.standard_normal((2, 11, 6)) * 1.5
        lp = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
        lengths = jnp.asarray([11, 7])
        base = ctc_beam_search_device(jnp.asarray(lp), lengths,
                                      beam_width=8, top_k=4)
        for unroll in (2, 3, 16):
            got = ctc_beam_search_device(jnp.asarray(lp), lengths,
                                         beam_width=8, top_k=4,
                                         scan_unroll=unroll)
            np.testing.assert_array_equal(np.asarray(got[0]),
                                          np.asarray(base[0]))
            np.testing.assert_array_equal(np.asarray(got[1]),
                                          np.asarray(base[1]))
            np.testing.assert_allclose(np.asarray(got[2]),
                                       np.asarray(base[2]),
                                       rtol=1e-5, atol=1e-5)


def host_prefix_beam(lp, width=16, blank=0):
    """Independent textbook CTC prefix beam search (dict-based) for fuzzing."""
    import math

    def lse(a, b):
        if a == -math.inf:
            return b
        if b == -math.inf:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    beams = {(): (0.0, -math.inf)}  # prefix -> (p_b, p_nb)
    for frame in lp:
        new = {}

        def add(prefix, pb, pnb):
            opb, opnb = new.get(prefix, (-math.inf, -math.inf))
            new[prefix] = (lse(opb, pb), lse(opnb, pnb))

        for prefix, (pb, pnb) in beams.items():
            total = lse(pb, pnb)
            add(prefix, total + frame[blank], -math.inf)
            for c in range(len(frame)):
                if c == blank:
                    continue
                if prefix and prefix[-1] == c:
                    add(prefix, -math.inf, pnb + frame[c])
                    add(prefix + (c,), -math.inf, pb + frame[c])
                else:
                    add(prefix + (c,), -math.inf, total + frame[c])
        beams = dict(sorted(new.items(),
                            key=lambda kv: -lse(*kv[1]))[:width])
    return sorted(((k, lse(*v)) for k, v in beams.items()),
                  key=lambda kv: -kv[1])


class TestFuzzAgainstHostReference:
    def test_random_logits_agreement(self):
        rng = np.random.default_rng(7)
        for trial in range(4):
            t, v = 12, 6
            lp = rand_logits = rng.standard_normal((t, v)) * 1.5
            lp = lp - np.log(np.exp(lp).sum(1, keepdims=True))
            want = host_prefix_beam(lp, width=16)
            prefixes, plens, scores = ctc_beam_search_device(
                jnp.asarray(lp[None]), beam_width=16, top_k=v - 1)
            got = tuple(int(x) for x in
                        np.asarray(prefixes)[0, 0, :int(plens[0, 0])])
            assert got == want[0][0], f"trial {trial}"
            assert abs(float(scores[0, 0]) - want[0][1]) < 5e-3, f"trial {trial}"


class TestDeviceLMFusion:
    """On-device LM fusion: a token-level n-gram LM queried from HBM-resident
    hashed tables must tip ambiguous acoustics toward corpus sequences —
    mirroring the host decoder's LM-rescue test (tests/test_lm_beam.py)."""

    @pytest.fixture(scope="class")
    def token_lm(self, tmp_path_factory):
        from conformer_tpu.lm.device_table import DeviceNgramTable
        from conformer_tpu.lm.ngram import build_arpa
        from conformer_tpu.text.tokenizer import load_tokenizer

        tok = load_tokenizer("vi")
        root = tmp_path_factory.mktemp("devbeamlm")
        corpus = root / "tokens.txt"
        lines = []
        for text in ["xin chào", "xin chào bạn", "cảm ơn bạn",
                     "tạm biệt", "xin lỗi", "chào bạn"] * 5:
            ids = tok.encode(tok.clean_text(text.upper()))
            lines.append(" ".join(tok.vocab[i] for i in ids))
        corpus.write_text("\n".join(lines), encoding="utf8")
        arpa = str(root / "lm_tokens.arpa")
        build_arpa(str(corpus), arpa, order=4)
        table = DeviceNgramTable.from_arpa(arpa)
        tok2lm = np.array([table.vocab.get(s, -1) for s in tok.vocab],
                          np.int32)
        return tok, table, tok2lm

    def _lm_kwargs(self, table, tok2lm, tok, alpha=0.8, beta=0.0):
        return dict(lm_tables=table.device_arrays(),
                    tok2lm=jnp.asarray(tok2lm), lm_alpha=alpha, lm_beta=beta,
                    delim_id=tok.delim_id, lm_bos_id=int(table.bos_id),
                    lm_unk_logp=float(table.unk_logp),
                    lm_order=int(table.order))

    def _frames(self, tok, text):
        ids = tok.encode(text)
        seq = []
        for t_ in ids:
            seq.extend([t_, t_, tok.pad_id])
        lp = np.full((len(seq), tok.vocab_size), -8.0, np.float32)
        for i, t_ in enumerate(seq):
            lp[i, t_] = -0.05
        return lp - np.log(np.exp(lp).sum(1, keepdims=True))

    def _decode_text(self, tok, prefixes, plens):
        ids = [int(x) for x in np.asarray(prefixes)[0, 0,
                                                    :int(plens[0, 0])]]
        return "".join(" " if i == tok.delim_id else tok.vocab[i]
                       for i in ids)

    def test_lm_rescues_ambiguous_path(self, token_lm):
        tok, table, tok2lm = token_lm
        lp = self._frames(tok, "xin chào")
        ch, tr = tok.token_id("CH"), tok.token_id("TR")
        for t_ in range(lp.shape[0]):
            if np.argmax(lp[t_]) == ch:
                lp[t_, tr] = lp[t_, ch] + 0.3
                lp[t_] -= np.log(np.exp(lp[t_]).sum())

        no_lm = ctc_beam_search_device(jnp.asarray(lp[None]), beam_width=16,
                                       top_k=8, unk_id=tok.unk_id)
        with_lm = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=16, top_k=8, unk_id=tok.unk_id,
            **self._lm_kwargs(table, tok2lm, tok))
        assert self._decode_text(tok, no_lm[0], no_lm[1]) == "XIN TRÀO"
        assert self._decode_text(tok, with_lm[0], with_lm[1]) == "XIN CHÀO"

    def test_clean_path_unchanged_by_lm(self, token_lm):
        tok, table, tok2lm = token_lm
        lp = self._frames(tok, "cảm ơn bạn")
        with_lm = ctc_beam_search_device(
            jnp.asarray(lp[None]), beam_width=8, top_k=4, unk_id=tok.unk_id,
            **self._lm_kwargs(table, tok2lm, tok))
        assert self._decode_text(tok, with_lm[0], with_lm[1]) == "CẢM ƠN BẠN"

    def test_jittable_with_lm(self, token_lm):
        tok, table, tok2lm = token_lm
        import functools

        f = jax.jit(functools.partial(
            ctc_beam_search_device, beam_width=8, top_k=4,
            unk_id=tok.unk_id, **self._lm_kwargs(table, tok2lm, tok)))
        lp = self._frames(tok, "xin chào")
        prefixes, plens, scores = f(jnp.asarray(lp[None]))
        assert np.isfinite(np.asarray(scores)[0, 0])


class TestBeamBackendAuto:
    """decode='beam_auto' policy (decode/pipeline.py:resolve_beam_backend):
    device beam whenever an accelerator is present (2.9x faster than the
    host C++ beam at the reference op point since the r4 single-probe LM
    tables), under an active mesh, or multi-chip; host C++ beam only for
    CPU-only deployments (these tests run under the CPU conftest)."""

    def test_single_cpu_device_picks_host(self):
        from conformer_tpu.decode.pipeline import resolve_beam_backend
        assert jax.default_backend() == "cpu"
        assert resolve_beam_backend(n_devices=1) == "beam"

    def test_accelerator_picks_device(self, monkeypatch):
        from conformer_tpu.decode.pipeline import resolve_beam_backend
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert resolve_beam_backend(n_devices=1) == "beam_device"

    def test_multi_chip_picks_device(self):
        from conformer_tpu.decode.pipeline import resolve_beam_backend
        assert resolve_beam_backend(n_devices=8) == "beam_device"

    def test_active_mesh_picks_device(self):
        from conformer_tpu.decode.pipeline import resolve_beam_backend
        from conformer_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(dp=4, tp=2)
        with jax.set_mesh(mesh):
            assert resolve_beam_backend(n_devices=1) == "beam_device"
