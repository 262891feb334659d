"""Device-resident n-gram tables: the vectorized jnp backoff scorer must be
exact against the Python ARPA scorer, including backoff chains and OOV."""

import numpy as np
import pytest

from conformer_tpu.lm.device_table import DeviceNgramTable, score_tokens
from conformer_tpu.lm.ngram import PyNgramLM, build_arpa


@pytest.fixture(scope="module")
def arpa(tmp_path_factory):
    root = tmp_path_factory.mktemp("devlm")
    rng = np.random.default_rng(0)
    words = ["A", "B", "C", "D", "E", "F", "G", "H"]
    corpus = root / "corpus.txt"
    lines = [" ".join(rng.choice(words, rng.integers(2, 7)))
             for _ in range(400)]
    corpus.write_text("\n".join(lines), encoding="utf8")
    path = str(root / "lm.arpa")
    build_arpa(str(corpus), path, order=3)
    return path


class TestDeviceTable:
    def test_scorer_matches_python_exactly(self, arpa):
        import jax.numpy as jnp

        table = DeviceNgramTable.from_arpa(arpa)
        py = PyNgramLM(arpa)
        tables = table.device_arrays()
        m_ctx = table.order - 1

        rng = np.random.default_rng(1)
        ids = sorted(table.vocab.values())
        cases = []
        for _ in range(200):
            clen = int(rng.integers(0, m_ctx + 1))
            ctx = [int(rng.choice(ids)) for _ in range(clen)]
            tok = int(rng.choice(ids + [-1]))  # include OOV
            cases.append((ctx, tok))
        # include bos-context cases (beam search start state)
        cases += [([table.bos_id], int(rng.choice(ids))) for _ in range(20)]

        ctx_arr = np.zeros((len(cases), m_ctx), np.int32)
        ctx_len = np.zeros((len(cases),), np.int32)
        toks = np.zeros((len(cases),), np.int32)
        for i, (ctx, tok) in enumerate(cases):
            if ctx:
                ctx_arr[i, m_ctx - len(ctx):] = ctx  # right-aligned
            ctx_len[i] = len(ctx)
            toks[i] = tok

        got = np.asarray(score_tokens(
            tables, jnp.asarray(ctx_arr), jnp.asarray(ctx_len),
            jnp.asarray(toks), table.unk_logp, table.n_probes))
        for i, (ctx, tok) in enumerate(cases):
            want = py.score_id(list(ctx), tok)
            assert got[i] == pytest.approx(want, abs=1e-5), (ctx, tok)

    def test_sums_to_one(self, arpa):
        import jax.numpy as jnp

        table = DeviceNgramTable.from_arpa(arpa)
        tables = table.device_arrays()
        m_ctx = table.order - 1
        vocab_ids = [v for k, v in table.vocab.items() if k != "<s>"]
        for ctx in ([], [table.vocab["A"]], [table.vocab["A"],
                                             table.vocab["B"]]):
            ctx_arr = np.zeros((len(vocab_ids), m_ctx), np.int32)
            if ctx:
                ctx_arr[:, m_ctx - len(ctx):] = ctx
            scores = np.asarray(score_tokens(
                tables, jnp.asarray(ctx_arr),
                jnp.full((len(vocab_ids),), len(ctx), jnp.int32),
                jnp.asarray(vocab_ids, jnp.int32), table.unk_logp,
                table.n_probes))
            assert float((10.0 ** scores).sum()) == pytest.approx(1.0,
                                                                  abs=2e-3)
