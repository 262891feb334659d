"""Streaming decode: single-chunk output is identical to offline greedy
decode; chunked processing is invariant to how the audio is block-fed."""

import numpy as np
import pytest

from conformer_tpu.config import Config
from conformer_tpu.text.tokenizer import load_tokenizer

SR = 16000


@pytest.fixture(scope="module")
def setup():
    import jax

    from conformer_tpu.train.steps import init_variables

    tok = load_tokenizer("vi")
    cfg = Config().override(**{
        "model.n_blocks": 2, "model.d_model": 64, "model.n_heads": 2,
        "model.kernel_size": 7, "model.lstm_hidden_dim": 64,
        "model.dropout_rate": 0.0, "model.use_remat": False,
        "model.use_scan_layers": False, "model.vocab_size": tok.vocab_size,
        "optim.compute_dtype": "float32"})
    variables = init_variables(cfg, jax.random.PRNGKey(0))
    return cfg, tok, variables


def _audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    return (0.4 * np.sin(2 * np.pi * 300 * t)
            + 0.1 * rng.standard_normal(len(t))).astype(np.float32)


def _offline_text(cfg, tok, variables, audio):
    import jax

    from conformer_tpu.ops.ctc import greedy_decode
    from conformer_tpu.train.steps import make_forward

    forward = make_forward(cfg)
    logits, out_len = jax.jit(forward)(
        variables, audio[None], np.asarray([len(audio)], np.int32))
    packed, counts = greedy_decode(logits, out_len, unk_id=tok.unk_id)
    return tok.collapsed_ids_to_text(np.asarray(packed)[0],
                                     int(np.asarray(counts)[0]))


@pytest.fixture(scope="module")
def setup_transducer():
    import jax

    from conformer_tpu.train.steps import init_variables

    tok = load_tokenizer("vi")
    cfg = Config().override(**{
        "model.arch": "transducer",
        "model.n_blocks": 2, "model.d_model": 64, "model.n_heads": 2,
        "model.kernel_size": 7, "model.pred_embed_dim": 32,
        "model.pred_hidden_dim": 32, "model.joint_dim": 32,
        "model.dropout_rate": 0.0, "model.use_remat": False,
        "model.use_scan_layers": False, "model.vocab_size": tok.vocab_size,
        "optim.compute_dtype": "float32"})
    variables = init_variables(cfg, jax.random.PRNGKey(0))
    return cfg, tok, variables


def _offline_transducer_text(cfg, tok, variables, audio, pad_to=0):
    import jax
    import jax.numpy as jnp

    from conformer_tpu.audio.mel import MelFrontend
    from conformer_tpu.models.transducer import Transducer
    from conformer_tpu.ops.rnnt import rnnt_greedy_decode

    model = Transducer(cfg.model, compute_dtype=cfg.optim.compute_dtype,
                       deterministic=True)
    fe = MelFrontend(cfg.audio)

    @jax.jit
    def run(variables, audio, length):
        bound = model.bind(variables)
        mels = fe(audio)
        enc, enc_len = bound.encode(mels, fe.frame_lengths(length))
        # max_len matches the streaming per-window cap (chunk_s=2.0 at
        # stride 640 -> 50 frames * 4 symbols) so a random-init model that
        # emits near-max tokens truncates identically in both paths.
        return rnnt_greedy_decode(
            bound.joint_logits, enc, enc_len, bound.predict_step,
            bound.predict_init(1), max_symbols=4, max_len=200)

    padded = np.zeros((1, max(len(audio), pad_to)), np.float32)
    padded[0, : len(audio)] = audio
    buf, count = run(variables, jnp.asarray(padded),
                     np.asarray([len(audio)], np.int32))
    return tok.collapsed_ids_to_text(np.asarray(buf)[0],
                                     int(np.asarray(count)[0]))


class TestBeamAutoDispatch:
    """resolve_beam_backend(streaming=...) encodes the measured tradeoffs
    (docs/PERFORMANCE.md): offline -> device beam whenever an accelerator or
    mesh is present; streaming -> host beam at batch 1 EXCEPT under an
    active mesh, where chunk logits must stay on-chip."""

    def test_streaming_cpu_no_mesh_prefers_host_beam(self):
        from conformer_tpu.decode.pipeline import resolve_beam_backend

        assert resolve_beam_backend(streaming=True) == "beam"
        # Offline on 8 virtual devices -> device beam.
        assert resolve_beam_backend() == "beam_device"

    def test_streaming_accelerator_no_mesh_still_host_beam(self, monkeypatch):
        import jax

        from conformer_tpu.decode import pipeline

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert pipeline.resolve_beam_backend(streaming=True) == "beam"
        assert pipeline.resolve_beam_backend(n_devices=1) == "beam_device"

    def test_streaming_mesh_forces_device_beam(self):
        import jax

        from conformer_tpu.decode.pipeline import resolve_beam_backend
        from conformer_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=4, tp=2)
        with jax.set_mesh(mesh):
            assert resolve_beam_backend(streaming=True) == "beam_device"
        assert resolve_beam_backend(mesh=mesh, streaming=True) == "beam_device"

    def test_transcriber_accepts_beam_auto(self, setup):
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup
        st = StreamingTranscriber(cfg, tok, variables, decode="beam_auto")
        assert st.decode == "beam"  # CPU, no mesh: host beam wins at batch 1

    def test_transcriber_rejects_unknown(self, setup):
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup
        with pytest.raises(ValueError, match="beam_auto"):
            StreamingTranscriber(cfg, tok, variables, decode="nonsense")


class TestStreaming:
    def test_single_chunk_matches_offline(self, setup):
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup
        audio = _audio(1.5)
        want = _offline_text(cfg, tok, variables, audio)

        st = StreamingTranscriber(cfg, tok, variables, chunk_s=2.0,
                                  left_context_s=4.0)
        st.feed(audio)
        st.finish()
        assert st.text == want

    def test_block_size_invariance(self, setup):
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup
        audio = _audio(3.3, seed=1)

        def run(block):
            st = StreamingTranscriber(cfg, tok, variables, chunk_s=1.0,
                                      left_context_s=2.0)
            for i in range(0, len(audio), block):
                st.feed(audio[i: i + block])
            st.finish()
            return st.text

        texts = {run(b) for b in (1000, 7777, len(audio))}
        assert len(texts) == 1  # feeding granularity must not matter

    def test_pipelined_emission_matches_synchronous(self, setup):
        # Double-buffering (pipeline_chunks=True, the default) defers
        # emission by one chunk but must produce identical text, and the
        # feed()-returned pieces plus finish() must cover the transcript.
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup
        audio = _audio(4.2, seed=3)

        def run(pipeline):
            st = StreamingTranscriber(cfg, tok, variables, chunk_s=1.0,
                                      left_context_s=2.0,
                                      pipeline_chunks=pipeline)
            emitted = ""
            for i in range(0, len(audio), 4000):
                emitted += st.feed(audio[i: i + 4000])
            emitted += st.finish()
            return emitted, st.text

        em_sync, text_sync = run(False)
        em_pipe, text_pipe = run(True)
        assert text_pipe == text_sync
        assert em_pipe == em_sync  # same total emission, later arrival

    def test_reset_reuses_programs_for_a_fresh_utterance(self, setup):
        # reset() must clear all carried state without rebuilding the jitted
        # programs: decoding the same audio before and after a reset (with a
        # different utterance in between) gives identical text.
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup
        a = _audio(3.1, seed=5)
        b = _audio(2.2, seed=6)
        st = StreamingTranscriber(cfg, tok, variables, chunk_s=1.0,
                                  left_context_s=2.0)
        st.feed(a)
        st.finish()
        first = st.text
        st.reset()
        st.feed(b)
        st.finish()
        assert st.text  # decoded something else in between
        st.reset()
        st.feed(a)
        st.finish()
        assert st.text == first

    def test_reset_clears_beam_state(self, setup):
        # Same contract for the stateful beam modes: the carried BeamState /
        # host beam list must not leak across reset().
        from conformer_tpu.config import DecodeConfig
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup
        a = _audio(3.1, seed=5)
        b = _audio(2.2, seed=6)
        for mode in ("beam", "beam_device"):
            st = StreamingTranscriber(cfg, tok, variables, chunk_s=1.0,
                                      left_context_s=2.0, decode=mode,
                                      decode_cfg=DecodeConfig(beam_width=4))
            st.feed(a)
            st.finish()
            first = st.text
            st.reset()
            st.feed(b)
            st.finish()
            st.reset()
            st.feed(a)
            st.finish()
            assert st.text == first, mode

    def test_beam_mode_single_chunk_matches_offline_beam(self, setup):
        import jax

        from conformer_tpu.config import DecodeConfig
        from conformer_tpu.decode.beam_search import BeamSearchDecoder
        from conformer_tpu.decode.streaming import StreamingTranscriber
        from conformer_tpu.train.steps import make_forward

        cfg, tok, variables = setup
        audio = _audio(1.5, seed=3)
        dcfg = DecodeConfig(beam_width=8)

        forward = make_forward(cfg)
        logits, out_len = jax.jit(forward)(
            variables, audio[None], np.asarray([len(audio)], np.int32))
        lp = np.asarray(jax.nn.log_softmax(
            logits.astype(np.float32), axis=-1))[0]
        want = BeamSearchDecoder(tok, dcfg).decode(
            lp, int(np.asarray(out_len)[0]))

        st = StreamingTranscriber(cfg, tok, variables, chunk_s=2.0,
                                  left_context_s=4.0, decode="beam",
                                  decode_cfg=dcfg)
        assert st.feed(audio) == ""  # beam hypotheses are revisable
        assert st.finish() == want
        assert st.text == want

    def test_beam_mode_block_invariance(self, setup):
        from conformer_tpu.config import DecodeConfig
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup
        audio = _audio(3.3, seed=4)

        def run(block):
            st = StreamingTranscriber(cfg, tok, variables, chunk_s=1.0,
                                      left_context_s=2.0, decode="beam",
                                      decode_cfg=DecodeConfig(beam_width=8))
            for i in range(0, len(audio), block):
                st.feed(audio[i: i + block])
            return st.finish()

        texts = {run(b) for b in (1000, 7777, len(audio))}
        assert len(texts) == 1

    @pytest.fixture(scope="class")
    def word_arpa(self, tmp_path_factory):
        from conformer_tpu.lm.ngram import build_arpa

        root = tmp_path_factory.mktemp("streamlm")
        corpus = root / "c.txt"
        corpus.write_text("\n".join(
            ["XIN CHÀO", "CẢM ƠN BẠN", "TẠM BIỆT"] * 5), encoding="utf8")
        path = str(root / "lm.arpa")
        build_arpa(str(corpus), path, order=3)
        return path

    def test_beam_device_single_chunk_matches_offline(self, setup,
                                                      word_arpa):
        # Fully on-device streaming beam with word-LM fusion + hotwords:
        # a single-chunk utterance must reproduce the offline device beam
        # (identical compute path + state carry through zero extra chunks).
        import jax

        from conformer_tpu.config import DecodeConfig
        from conformer_tpu.decode.pipeline import _device_lm_kwargs
        from conformer_tpu.decode.streaming import StreamingTranscriber
        from conformer_tpu.ops.beam_search_device import (
            ctc_beam_search_device)
        from conformer_tpu.train.steps import make_forward

        cfg, tok, variables = setup
        audio = _audio(1.5, seed=5)
        dcfg = DecodeConfig(beam_width=8, lm_path=word_arpa, alpha=0.8,
                            beta=1.0, hotwords=("XIN CHÀO",),
                            hotword_weight=3.0)
        import dataclasses

        lm_kwargs = _device_lm_kwargs(dataclasses.replace(cfg, decode=dcfg),
                                      tok, word_fallback=True)

        # Offline reference runs on the same padded window shape the
        # streaming path compiles (6s = ctx 4s + chunk 2s): a random-init
        # model has near-tied logits, and XLA's shape-dependent fusion can
        # flip a beam order at the 1e-7 level otherwise (same guard as the
        # transducer sibling test below).
        padded = np.zeros((1, 6 * SR), np.float32)
        padded[0, : len(audio)] = audio
        forward = make_forward(cfg)
        logits, out_len = jax.jit(forward)(
            variables, padded, np.asarray([len(audio)], np.int32))
        lp = jax.nn.log_softmax(logits.astype(np.float32), axis=-1)
        prefixes, plens, _ = ctc_beam_search_device(
            lp, out_len, beam_width=8, top_k=8, unk_id=tok.unk_id,
            max_len=cfg.data.max_tokens, **lm_kwargs)
        want = tok.spec_decode(tok.collapsed_ids_to_text(
            np.asarray(prefixes)[0, 0], int(np.asarray(plens)[0, 0]))).strip()

        st = StreamingTranscriber(cfg, tok, variables, chunk_s=2.0,
                                  left_context_s=4.0, decode="beam_device",
                                  decode_cfg=dcfg)
        assert st.feed(audio) == ""  # beam hypotheses are revisable
        assert st.finish() == want
        assert st.text == want

    def test_beam_device_block_invariance(self, setup, word_arpa):
        from conformer_tpu.config import DecodeConfig
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup
        audio = _audio(3.3, seed=6)
        dcfg = DecodeConfig(beam_width=8, lm_path=word_arpa, alpha=0.8,
                            beta=1.0)

        def run(block):
            st = StreamingTranscriber(cfg, tok, variables, chunk_s=1.0,
                                      left_context_s=2.0,
                                      decode="beam_device", decode_cfg=dcfg)
            for i in range(0, len(audio), block):
                st.feed(audio[i: i + block])
            return st.finish()

        texts = {run(b) for b in (1000, 7777, len(audio))}
        assert len(texts) == 1

    def test_transducer_single_chunk_matches_offline(self, setup_transducer):
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup_transducer
        audio = _audio(1.5, seed=5)
        # Offline reference runs on the same padded window shape the
        # streaming path compiles (6s = ctx 4s + chunk 2s): a random-init
        # model has near-tied logits, and XLA's shape-dependent fusion can
        # flip an argmax at the 1e-7 level otherwise (padding invariance of
        # the encoder itself is covered by tests/test_model.py).
        want = _offline_transducer_text(cfg, tok, variables, audio,
                                        pad_to=6 * SR)

        st = StreamingTranscriber(cfg, tok, variables, chunk_s=2.0,
                                  left_context_s=4.0)
        st.feed(audio)
        st.finish()
        assert st.text == want

    def test_transducer_block_invariance_and_state_carry(self,
                                                         setup_transducer):
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup_transducer
        audio = _audio(3.3, seed=6)

        def run(block):
            st = StreamingTranscriber(cfg, tok, variables, chunk_s=1.0,
                                      left_context_s=2.0)
            for i in range(0, len(audio), block):
                st.feed(audio[i: i + block])
            st.finish()
            return st.text

        texts = {run(b) for b in (1000, 7777, len(audio))}
        assert len(texts) == 1

    def test_transducer_beam_single_chunk_matches_offline(
            self, setup_transducer):
        import jax
        import jax.numpy as jnp

        from conformer_tpu.audio.mel import MelFrontend
        from conformer_tpu.config import DecodeConfig
        from conformer_tpu.decode.streaming import StreamingTranscriber
        from conformer_tpu.models.transducer import Transducer
        from conformer_tpu.ops.rnnt import rnnt_beam_search

        cfg, tok, variables = setup_transducer
        audio = _audio(1.5, seed=7)
        dcfg = DecodeConfig(beam_width=4)

        # Offline beam on the same padded window shape (6s = ctx 4 + chunk 2).
        model = Transducer(cfg.model, compute_dtype=cfg.optim.compute_dtype,
                           deterministic=True)
        fe = MelFrontend(cfg.audio)

        @jax.jit
        def offline(variables, audio_, length):
            bound = model.bind(variables)
            enc, enc_len = bound.encode(fe(audio_),
                                        fe.frame_lengths(length))
            return rnnt_beam_search(
                bound.joint_logits, enc, enc_len, bound.predict_step,
                bound.predict_init(1), beam_width=4, top_k=8,
                max_symbols=4, max_len=cfg.data.max_tokens,
                unk_id=tok.unk_id)

        padded = np.zeros((1, 6 * SR), np.float32)
        padded[0, : len(audio)] = audio
        prefixes, plens, _ = offline(variables, jnp.asarray(padded),
                                     np.asarray([len(audio)], np.int32))
        want = tok.collapsed_ids_to_text(np.asarray(prefixes)[0, 0],
                                         int(np.asarray(plens)[0, 0]))

        st = StreamingTranscriber(cfg, tok, variables, chunk_s=2.0,
                                  left_context_s=4.0, decode="beam",
                                  decode_cfg=dcfg)
        assert st.feed(audio) == ""  # beam hypotheses are revisable
        assert st.finish() == want
        assert st.text == want

    def test_transducer_reset_clears_carry_and_beams(self, setup_transducer):
        # RNN-T reset: the prediction-network carry (greedy) and the full
        # beam tuple (beam) must both return to the fresh state.
        from conformer_tpu.config import DecodeConfig
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup_transducer
        a = _audio(3.1, seed=7)
        b = _audio(2.2, seed=8)
        for mode in ("greedy", "beam"):
            st = StreamingTranscriber(cfg, tok, variables, chunk_s=1.0,
                                      left_context_s=2.0, decode=mode,
                                      decode_cfg=DecodeConfig(beam_width=4))
            st.feed(a)
            st.finish()
            first = st.text
            st.reset()
            st.feed(b)
            st.finish()
            st.reset()
            st.feed(a)
            st.finish()
            assert st.text == first, mode

    def test_transducer_beam_block_invariance(self, setup_transducer):
        from conformer_tpu.config import DecodeConfig
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup_transducer
        audio = _audio(3.3, seed=8)

        def run(block):
            st = StreamingTranscriber(cfg, tok, variables, chunk_s=1.0,
                                      left_context_s=2.0, decode="beam",
                                      decode_cfg=DecodeConfig(beam_width=4))
            for i in range(0, len(audio), block):
                st.feed(audio[i: i + block])
            return st.finish()

        texts = {run(b) for b in (1000, 7777, len(audio))}
        assert len(texts) == 1

    def test_incremental_emission_accumulates(self, setup):
        from conformer_tpu.decode.streaming import StreamingTranscriber

        cfg, tok, variables = setup
        audio = _audio(2.6, seed=2)
        st = StreamingTranscriber(cfg, tok, variables, chunk_s=1.0,
                                  left_context_s=2.0)
        emitted = st.feed(audio) + st.finish()
        # Raw emitted pieces assemble into the final text.
        raw = "".join(st._pieces).replace(tok.delim_token, " ")
        assert tok.spec_decode(raw).strip() == st.text
        assert emitted == "".join(st._pieces)
