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
            jnp.asarray(toks), table.unk_logp))
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
                ))
            assert float((10.0 ** scores).sum()) == pytest.approx(1.0,
                                                                  abs=2e-3)


class TestShardedTable:
    def test_sharded_probe_matches_unsharded(self, arpa):
        # Table slots sharded over a mesh axis; lookups combine via psum
        # (lm/device_table.py:_probe axis_name path). Must equal the
        # unsharded scorer bit-for-bit on the virtual 8-device mesh.
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, PartitionSpec as P

        from conformer_tpu.lm.device_table import score_tokens as st

        table = DeviceNgramTable.from_arpa(arpa)
        tables = table.device_arrays()
        n_slots = tables[0].shape[1]
        m_ctx = table.order - 1
        n_dev = len(jax.devices())
        assert n_slots % n_dev == 0

        rng = np.random.default_rng(3)
        ids = sorted(table.vocab.values())
        nq = 64
        ctx_arr = np.zeros((nq, m_ctx), np.int32)
        ctx_len = np.zeros((nq,), np.int32)
        toks = np.zeros((nq,), np.int32)
        for i in range(nq):
            clen = int(rng.integers(0, m_ctx + 1))
            ctx = [int(rng.choice(ids)) for _ in range(clen)]
            if ctx:
                ctx_arr[i, m_ctx - len(ctx):] = ctx
            ctx_len[i] = clen
            toks[i] = int(rng.choice(ids + [-1]))

        want = np.asarray(st(tables, jnp.asarray(ctx_arr),
                             jnp.asarray(ctx_len), jnp.asarray(toks),
                             table.unk_logp))

        mesh = Mesh(np.array(jax.devices()), ("model",))

        def body(tabs, ctx, cl, tk):
            return st(tabs, ctx, cl, tk, table.unk_logp,
                      axis_name="model", n_slots_global=n_slots)

        table_spec = ((P(None, "model", None),)    # packed (order, S, 4)
                      + (P(),) * (len(tables) - 1))  # dense arrays replicate
        got = jax.shard_map(
            body, mesh=mesh,
            in_specs=(table_spec, P(), P(), P()),
            out_specs=P(), check_vma=False,
        )(tuple(tables), jnp.asarray(ctx_arr), jnp.asarray(ctx_len),
          jnp.asarray(toks))
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_sharded_beam_search_matches_unsharded(self, arpa):
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh

        from conformer_tpu.ops.beam_search_device import (
            ctc_beam_search_device, ctc_beam_search_device_sharded)

        table = DeviceNgramTable.from_arpa(arpa)
        tables = table.device_arrays()
        v, b, t = 12, 4, 9
        rng = np.random.default_rng(5)
        lp = jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((b, t, v)).astype(np.float32)))
        lengths = jnp.asarray([9, 7, 9, 5], jnp.int32)
        tok2lm = jnp.asarray(
            [-1] + [rng.choice(sorted(table.vocab.values()))
                    for _ in range(v - 1)], jnp.int32)
        kw = dict(beam_width=6, top_k=4, lm_tables=tables, tok2lm=tok2lm,
                  lm_alpha=0.7, lm_beta=0.0, lm_bos_id=table.bos_id,
                  lm_unk_logp=table.unk_logp, lm_order=table.order)

        pre_w, pre_l, pre_s = ctc_beam_search_device(lp, lengths, **kw)

        devs = np.array(jax.devices()).reshape(4, 2)
        mesh = Mesh(devs, ("data", "model"))
        got_w, got_l, got_s = ctc_beam_search_device_sharded(
            lp, lengths, mesh=mesh, **kw)
        np.testing.assert_array_equal(np.asarray(got_l), np.asarray(pre_l))
        np.testing.assert_allclose(np.asarray(got_s), np.asarray(pre_s),
                                   atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got_w), np.asarray(pre_w))


class TestBucketLayout:
    """Builder-side hash-layout hardening (ADVICE r3, bucketized r4)."""

    def test_overflowing_bucket_returns_none(self):
        # More than _BUCKET entries in one bucket at this size -> None
        # (caller doubles and retries).
        from conformer_tpu.lm.device_table import _BUCKET, _bucket_layout

        n_buckets = 8
        same = [3 + i * n_buckets for i in range(_BUCKET + 1)]
        assert _bucket_layout(same, n_buckets) is None
        # At double the buckets the same hashes spread across two buckets.
        assert _bucket_layout(same, n_buckets * 2) is not None

    def test_pair_table_grows_past_crowded_buckets(self):
        # Hashes crowd one bucket at the initial size but separate after
        # doubling; every entry must round-trip through the device lookup.
        import jax.numpy as jnp

        from conformer_tpu.lm.device_table import (_BUCKET,
                                                   _build_pair_table,
                                                   _pack_pair_table,
                                                   lookup_pair)

        n0 = 8 * _BUCKET          # initial guess -> 8 buckets
        items = [(np.uint32(5 + i * 8), np.uint32(1000 + i), i)
                 for i in range(_BUCKET + 4)]   # all in bucket 5 at size 8
        keys1, keys2, ids, n_probes = _build_pair_table(items, n0)
        assert n_probes == 1
        packed = jnp.asarray(_pack_pair_table(keys1, keys2, ids))
        h1 = jnp.asarray([h for h, _, _ in items])
        h2 = jnp.asarray([h for _, h, _ in items])
        got = np.asarray(lookup_pair(packed, h1, h2))
        assert list(got) == [v for _, _, v in items]

    def test_pair_table_growth_is_capped(self):
        # Identical (h1, h2) pairs can never be separated by growth; the
        # builder must fail with a descriptive error instead of doubling
        # until memory exhaustion. (Real builders dedupe by key first; this
        # exercises the backstop directly.)
        from conformer_tpu.lm.device_table import _build_pair_table

        items = [(np.uint32(7), np.uint32(7), 0),
                 (np.uint32(7), np.uint32(7), 1)]
        with pytest.raises(RuntimeError, match="collide"):
            _build_pair_table(items, 64)
