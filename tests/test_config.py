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


class TestCheckpointDirConfig:
    """Training persists its composed config next to the checkpoints;
    checkpoint-consuming CLIs auto-load it so a non-default model shape
    never has to be re-typed (the reference crashed with a shape mismatch
    instead — its 40 flags had to match across entry points by hand)."""

    def _args(self, tmp, config=None):
        import argparse
        return argparse.Namespace(config=config, overrides=[],
                                  checkpoint_dir=str(tmp))

    def test_roundtrip_via_checkpoint_dir(self, tmp_path):
        from conformer_tpu.cli.common import load_config, save_config
        cfg = Config().override(**{"model.n_blocks": 3, "model.d_model": 96})
        save_config(cfg, str(tmp_path))
        got = load_config(self._args(tmp_path))
        assert got.model.n_blocks == 3 and got.model.d_model == 96

    def test_explicit_config_wins(self, tmp_path):
        from conformer_tpu.cli.common import load_config, save_config
        save_config(Config().override(**{"model.n_blocks": 3}),
                    str(tmp_path))
        other = tmp_path / "other.json"
        Config().override(**{"model.n_blocks": 5}).to_json(str(other))
        got = load_config(self._args(tmp_path, config=str(other)))
        assert got.model.n_blocks == 5

    def test_set_overrides_apply_on_top(self, tmp_path):
        import argparse
        from conformer_tpu.cli.common import load_config, save_config
        save_config(Config().override(**{"model.n_blocks": 3}),
                    str(tmp_path))
        args = argparse.Namespace(config=None,
                                  overrides=["model.n_blocks=7"],
                                  checkpoint_dir=str(tmp_path))
        assert load_config(args).model.n_blocks == 7

    def test_missing_dir_falls_back_to_defaults(self, tmp_path):
        from conformer_tpu.cli.common import load_config
        got = load_config(self._args(tmp_path / "nope"))
        assert got.model.n_blocks == Config().model.n_blocks
