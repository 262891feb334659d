"""Config.override: dotted paths, JSON round trip, and shape validation."""

import pytest

from conformer_tpu.config import Config


class TestOverride:
    def test_scalar_and_tuple_overrides(self):
        cfg = Config().override(**{
            "model.d_model": 256,
            "data.bucket_boundaries_s": [1.2, 2.0],
            "decode.hotwords": ["XIN CHÀO"],
        })
        assert cfg.model.d_model == 256
        assert cfg.data.bucket_boundaries_s == (1.2, 2.0)
        assert cfg.decode.hotwords == ("XIN CHÀO",)

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            Config().override(**{"data.buckets": 1.0})

    def test_scalar_into_tuple_field_raises(self):
        # The CLI's --set parses values as JSON; "1.2,2.0" is not valid
        # JSON so it would arrive as a raw string — catch it at override
        # time instead of deep inside the data loader.
        with pytest.raises(TypeError):
            Config().override(**{"data.bucket_boundaries_s": "1.2,2.0"})
        with pytest.raises(TypeError):
            Config().override(**{"data.bucket_boundaries_s": 1.2})

    def test_tuple_into_scalar_field_raises(self):
        with pytest.raises(TypeError):
            Config().override(**{"model.d_model": [256]})

    def test_none_fields_accept_values(self):
        cfg = Config().override(**{"decode.lm_path": "/tmp/lm.arpa"})
        assert cfg.decode.lm_path == "/tmp/lm.arpa"

    def test_json_round_trip(self, tmp_path):
        cfg = Config().override(**{"model.n_blocks": 3,
                                   "data.bucket_batch_sizes": [8, 4]})
        p = str(tmp_path / "cfg.json")
        cfg.to_json(p)
        back = Config.from_json(p)
        assert back.model.n_blocks == 3
        assert back.data.bucket_batch_sizes == (8, 4)


class TestTokenizerResolution:
    """--tokenizer flag wins, then train.tokenizer_path, then 'vi'."""

    def _args(self, tokenizer=None):
        import argparse
        return argparse.Namespace(tokenizer=tokenizer)

    def test_flag_wins_over_config(self):
        from conformer_tpu.cli.common import load_tokenizer_from_args
        from conformer_tpu.text.tokenizer import load_tokenizer
        cfg = Config().override(**{"train.tokenizer_path": "vi"})
        tok = load_tokenizer_from_args(self._args("en"), cfg)
        assert tok.vocab == load_tokenizer("en").vocab

    def test_config_path_used_when_no_flag(self):
        from conformer_tpu.cli.common import load_tokenizer_from_args
        from conformer_tpu.text.tokenizer import load_tokenizer
        cfg = Config().override(**{"train.tokenizer_path": "en"})
        tok = load_tokenizer_from_args(self._args(None), cfg)
        assert tok.vocab == load_tokenizer("en").vocab

    def test_default_is_vi(self):
        from conformer_tpu.cli.common import load_tokenizer_from_args
        from conformer_tpu.text.tokenizer import load_tokenizer
        tok = load_tokenizer_from_args(self._args(None), Config())
        assert tok.vocab == load_tokenizer("vi").vocab
