"""Export tests: StableHLO round-trip equals the live model; early stopping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conformer_tpu.config import Config
from conformer_tpu.train.logging import EarlyStopping


def tiny_cfg():
    return Config().override(**{
        "model.vocab_size": 40, "model.n_blocks": 2, "model.d_model": 64,
        "model.n_heads": 2, "model.kernel_size": 7, "model.lstm_hidden_dim": 64,
        "model.dropout_rate": 0.0, "optim.compute_dtype": "float32"})


class TestExport:
    def test_roundtrip_matches_live_model(self, tmp_path):
        from conformer_tpu.export import ExportedModel, export_model
        from conformer_tpu.train.steps import init_variables, make_forward

        cfg = tiny_cfg()
        variables = init_variables(cfg, jax.random.PRNGKey(0))
        out = str(tmp_path / "exported")
        files = export_model(cfg, variables, out, batch_size=2,
                             audio_seconds=(1.0, 2.0))
        assert len(files) == 2

        model = ExportedModel(out)
        audio = np.random.default_rng(0).standard_normal(
            (2, 12000)).astype(np.float32) * 0.05
        lengths = np.array([12000, 8000], np.int32)
        logits, out_lengths = model(audio, lengths)

        forward = make_forward(cfg)
        padded = np.pad(audio, ((0, 0), (0, 16000 - 12000)))
        want_logits, want_lengths = forward(variables, jnp.asarray(padded),
                                            jnp.asarray(lengths))
        np.testing.assert_array_equal(np.asarray(out_lengths),
                                      np.asarray(want_lengths))
        np.testing.assert_allclose(np.asarray(logits), np.asarray(want_logits),
                                   atol=1e-4)

    def test_transducer_roundtrip_bakes_greedy_decode(self, tmp_path):
        # Transducer artifacts are the COMPLETE pipeline: audio -> token
        # ids + counts (greedy decode inside the exported function).
        import json

        from conformer_tpu.export import ExportedModel, export_model
        from conformer_tpu.train.steps import (init_variables,
                                               make_transducer_eval_step)
        from conformer_tpu.train.state import TrainState, make_optimizer

        cfg = tiny_cfg().override(**{
            "model.arch": "transducer", "model.pred_embed_dim": 32,
            "model.pred_hidden_dim": 32, "model.joint_dim": 32,
            "data.max_tokens": 16})
        variables = init_variables(cfg, jax.random.PRNGKey(0))
        out = str(tmp_path / "exported_t")
        export_model(cfg, variables, out, batch_size=2, audio_seconds=(1.0,))
        with open(f"{out}/meta.json") as f:
            assert json.load(f)["outputs"] == "tokens_counts"

        model = ExportedModel(out)
        audio = np.random.default_rng(1).standard_normal(
            (2, 16000)).astype(np.float32) * 0.05
        lengths = np.array([16000, 12000], np.int32)
        tokens, counts = model(audio, lengths)

        # Live-model reference via the eval step (same greedy decode).
        tx = make_optimizer(cfg.optim, steps_per_epoch=10)
        state = TrainState.create(variables["params"],
                                  variables.get("batch_stats", {}), tx)
        step = make_transducer_eval_step(cfg)
        want = step(state, jnp.asarray(audio), jnp.asarray(lengths),
                    jnp.zeros((2, 1), jnp.int32), jnp.zeros((2,), jnp.int32))
        np.testing.assert_array_equal(np.asarray(counts),
                                      np.asarray(want["counts"]))
        got_t, want_t = np.asarray(tokens), np.asarray(want["tokens"])
        for i in range(2):
            n = int(np.asarray(counts)[i])
            np.testing.assert_array_equal(got_t[i, :n], want_t[i, :n])

    def test_beam_export_bakes_lm_fused_decode(self, tmp_path):
        # decode='beam' bundles are the COMPLETE LM-fused transcriber:
        # audio -> (token ids, counts) with the hashed word-LM tables and
        # hotword fingerprints baked into the StableHLO as constants.
        import json

        from conformer_tpu.decode.pipeline import _device_lm_kwargs
        from conformer_tpu.export import ExportedModel, export_model
        from conformer_tpu.lm.ngram import build_arpa
        from conformer_tpu.ops.beam_search_device import (
            ctc_beam_search_device)
        from conformer_tpu.text.tokenizer import load_tokenizer
        from conformer_tpu.train.steps import init_variables, make_forward

        tok = load_tokenizer("vi")
        corpus = tmp_path / "c.txt"
        corpus.write_text("\n".join(["XIN CHÀO", "CẢM ƠN BẠN"] * 5),
                          encoding="utf8")
        arpa = str(tmp_path / "lm.arpa")
        build_arpa(str(corpus), arpa, order=2)

        cfg = tiny_cfg().override(**{
            "model.vocab_size": tok.vocab_size, "data.max_tokens": 24,
            "decode.lm_path": arpa, "decode.beam_width": 8,
            "decode.alpha": 0.8, "decode.beta": 1.0,
            "decode.hotwords": ["XIN CHÀO"], "decode.hotword_weight": 3.0})
        variables = init_variables(cfg, jax.random.PRNGKey(0))
        out = str(tmp_path / "exported_beam")
        export_model(cfg, variables, out, batch_size=2, audio_seconds=(1.0,),
                     decode="beam", tokenizer=tok)
        with open(f"{out}/meta.json") as f:
            meta = json.load(f)
        assert meta["outputs"] == "tokens_counts"
        assert meta["decode"] == "beam"

        model = ExportedModel(out)
        audio = np.random.default_rng(2).standard_normal(
            (2, 16000)).astype(np.float32) * 0.05
        lengths = np.array([16000, 12000], np.int32)
        tokens, counts = model(audio, lengths)

        forward = make_forward(cfg)
        logits, out_len = forward(variables, jnp.asarray(audio),
                                  jnp.asarray(lengths))
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lm_kwargs = _device_lm_kwargs(cfg, tok, word_fallback=True)
        prefixes, plens, _ = ctc_beam_search_device(
            lp, out_len, beam_width=8, top_k=8, blank_id=tok.pad_id,
            unk_id=tok.unk_id, max_len=24, **lm_kwargs)
        np.testing.assert_array_equal(np.asarray(counts),
                                      np.asarray(plens[:, 0]))
        got, want = np.asarray(tokens), np.asarray(prefixes[:, 0])
        for i in range(2):
            n = int(np.asarray(counts)[i])
            np.testing.assert_array_equal(got[i, :n], want[i, :n])

    def test_too_long_audio_rejected(self, tmp_path):
        from conformer_tpu.export import ExportedModel, export_model
        from conformer_tpu.train.steps import init_variables

        cfg = tiny_cfg()
        variables = init_variables(cfg, jax.random.PRNGKey(0))
        out = str(tmp_path / "exported")
        export_model(cfg, variables, out, batch_size=1, audio_seconds=(1.0,))
        model = ExportedModel(out)
        with pytest.raises(ValueError, match="longer than largest"):
            model(np.zeros((1, 32000), np.float32), np.array([32000]))


class TestEarlyStopping:
    def test_min_mode(self):
        es = EarlyStopping(patience=2, mode="min")
        assert not es.update(1.0)
        assert not es.update(0.9)
        assert not es.update(0.95)   # bad 1
        assert es.update(0.92)        # bad 2 -> stop
        assert es.best == 0.9

    def test_improvement_resets(self):
        es = EarlyStopping(patience=2, mode="min")
        es.update(1.0)
        es.update(1.1)
        assert not es.update(0.5)
        assert es.bad_count == 0
