"""RNN-T (Transducer) loss and greedy decode, TPU-first.

The reference ships only a dead Transducer stub (an unused ``nn.Transformer``
wrapper, reference: model/modules/transducer.py:4-9 — never imported); this
is a real implementation, exceeding reference capability.

Loss: the Graves 2012 forward recursion over the (T, U+1) lattice,

    alpha[t, u] = logaddexp(alpha[t-1, u] + blank[t-1, u],
                            alpha[t,  u-1] + emit[t, u-1])

as ONE ``lax.scan`` over time. The within-row dependency on u is an affine
recurrence in the log semiring, x_u = logaddexp(a_u, x_{u-1} + c_{u-1}),
whose composition law (c1+c2, logaddexp(a2, a1+c2)) is associative — so each
row resolves in O(log U) depth with ``jax.lax.associative_scan`` instead of a
sequential U-loop. No (T, U) alpha history is stacked; autodiff
rematerializes through the scan.

Memory note: the caller feeds per-lattice-cell log-probs of ONLY the blank
and the next target token ((B, T, U+1) each) — never the full (B, T, U+1, V)
logit lattice reduced here, which is the classic RNN-T memory trap.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.ops.topk import topk_lastaxis

NEG = -1e30


def _log_affine_combine(e1, e2):
    """Compose affine log-semiring maps x -> logaddexp(a, x + c)."""
    c1, a1 = e1
    c2, a2 = e2
    return c1 + c2, jnp.logaddexp(a2, a1 + c2)


def rnnt_alpha_final(lp_blank: jnp.ndarray, lp_emit: jnp.ndarray,
                     t_lengths: jnp.ndarray, u_lengths: jnp.ndarray
                     ) -> jnp.ndarray:
    """Forward log-probability of each sequence.

    lp_blank: (B, T, U+1) log P(blank | t, u); lp_emit: (B, T, U)
    log P(y_{u+1} | t, u); t_lengths: (B,) valid frames; u_lengths: (B,)
    label lengths. Returns (B,) log P(y | x) = alpha[T-1, U] + blank[T-1, U].
    """
    b, t, u1 = lp_blank.shape
    u = u1 - 1

    # u-position mask: emit[.., j] only valid for j < u_len.
    upos = jnp.arange(u)[None, :]
    emit_valid = upos < u_lengths[:, None]                    # (B, U)

    row0 = jnp.full((b, u1), NEG).at[:, 0].set(0.0)

    def step2(row, frame):
        # row = alpha[t-1, :]; blank of frame t-1 moves time forward, then
        # the in-row label recurrence uses emit of the CURRENT frame t.
        lp_b_prev, lp_e_t, active = frame
        a = row + lp_b_prev                                   # time transition
        c = lp_e_t                                            # (B, U) masked
        cs = jnp.concatenate([jnp.full((b, 1), NEG), c], axis=1)
        comp = jax.lax.associative_scan(_log_affine_combine, (cs, a), axis=1)
        new_row = comp[1]
        new_row = jnp.where(active[:, None], new_row, row)
        return new_row, None

    # Frame 0 row: alpha[0, u] = prefix-sum of emit[0, :u].
    c0 = jnp.where(emit_valid, lp_emit[:, 0], NEG)
    cs0 = jnp.concatenate([jnp.full((b, 1), NEG), c0], axis=1)
    comp0 = jax.lax.associative_scan(
        _log_affine_combine, (cs0, row0), axis=1)
    row = comp0[1]

    if t > 1:
        emit_rows = jnp.where(emit_valid[:, None, :], lp_emit[:, 1:], NEG)
        frames = (jnp.moveaxis(lp_blank[:, :-1], 1, 0),
                  jnp.moveaxis(emit_rows, 1, 0),
                  (jnp.arange(1, t)[:, None] < t_lengths[None, :]))
        row, _ = jax.lax.scan(step2, row, frames)

    # Final: alpha[T_b-1, U_b] + blank[T_b-1, U_b]. The scan stopped
    # updating at t >= T_b, so `row` holds alpha[T_b-1, :].
    last_blank = jnp.take_along_axis(
        lp_blank, (t_lengths - 1)[:, None, None], axis=1)[:, 0]  # (B, U+1)
    final = row + last_blank
    return jnp.take_along_axis(final, u_lengths[:, None], axis=1)[:, 0]


def rnnt_loss_from_logits(logits: jnp.ndarray, labels: jnp.ndarray,
                          t_lengths: jnp.ndarray, u_lengths: jnp.ndarray,
                          blank_id: int = 0,
                          row_mask: Optional[jnp.ndarray] = None
                          ) -> jnp.ndarray:
    """Mean RNN-T negative log-likelihood from the full joint lattice.

    logits: (B, T, U+1, V); labels: (B, U) int32; t_lengths/u_lengths: (B,).
    Convenience wrapper — prefer feeding pre-gathered lp_blank/lp_emit at
    scale (see rnnt_alpha_final) to avoid materializing (B, T, U+1, V) twice.
    """
    lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp_blank = lp[..., blank_id]                              # (B, T, U+1)
    emit_idx = labels[:, None, :, None]                       # (B,1,U,1)
    lp_emit = jnp.take_along_axis(
        lp[:, :, :-1, :], jnp.broadcast_to(
            emit_idx, (*lp.shape[:2], labels.shape[1], 1)), axis=-1)[..., 0]
    # Dummy remainder-padding rows (empty transcripts) must not dilute the
    # batch mean — same convention as ops/ctc.py:ctc_loss.
    return _nll_from_planes(lp_blank, lp_emit, t_lengths, u_lengths,
                            row_mask)


def _tree_concat(a, b):
    return jax.tree_util.tree_map(
        lambda x, y: jnp.concatenate([x, y], axis=0), a, b)


def _tree_gather(tree, idx):
    return jax.tree_util.tree_map(lambda x: x[idx], tree)


def _merge_topk(score, h1, h2, clen, k_out):
    """Merge duplicate hypotheses (same 64-bit rolling double hash) by
    log-sum-exp, then keep the top ``k_out`` -> (gather idx, merged scores).

    Same device merge scheme as the CTC prefix search
    (ops/beam_search_device.py): one variadic co-sort, then a WINDOW-2
    logaddexp at each run head. Window-2 is exact at every call site
    because a hash run holds at most TWO live hypotheses: both input pools
    (the finished pool and the blank-advances of the active pool) are
    outputs of a previous merge, hence internally duplicate-free, so a run
    is at most one element of each. Dead top-k fill slots DO share hashes
    with live hypotheses, so the score joins the sort key to order live
    entries first (their NEG mass is absorbed harmlessly). A genuine
    2x32-bit collision drops the colliding mass — score-conservative, the
    same contract as the cross-step merge. clen is not co-sorted: the
    64-bit hash alone defines identity (it already keys cross-step
    merging).
    """
    from conformer_tpu.ops.beam_search_device import _logaddexp

    del clen
    iota = jnp.arange(score.shape[0], dtype=jnp.int32)
    s_h1, s_h2, _, s_score, order = jax.lax.sort(
        (h1, h2, -score, score, iota), num_keys=3)

    def same(x):
        return x[1:] == x[:-1]

    same_prev = same(s_h1) & same(s_h2)
    boundary = jnp.concatenate([jnp.ones((1,), bool), ~same_prev])
    next_same = jnp.concatenate([same_prev, jnp.zeros((1,), bool)])
    nxt = jnp.concatenate([s_score[1:], jnp.full((1,), NEG, s_score.dtype)])
    merged = _logaddexp(s_score, jnp.where(next_same, nxt, NEG))
    head = jnp.where(boundary, merged, NEG)
    top_s, top_pos = jax.lax.top_k(head, k_out)
    sel = order[top_pos]
    return sel, jnp.where(top_s > NEG / 2, top_s, NEG)


def _select_topk(score, k_out):
    """Plain top-k for candidate pools that CANNOT contain duplicates:
    the per-round emission pool — ext(i, c) == ext(j, c') forces equal
    lengths, hence c == c', hence seq_i == seq_j, hence i == j because the
    active pool is a previous merge's output. No sort-by-hash needed; dead
    parents produce NEG scores that never win."""
    top_s, sel = jax.lax.top_k(score, k_out)
    return sel, jnp.where(top_s > NEG / 2, top_s, NEG)


# np (host) scalars, not jnp — see ops/beam_search_device.py on why a
# module-level jax.Array constant leaks tracers across traces.
_M1 = np.uint32(1000003)
_M2 = np.uint32(2654435761)
_LOG10_TO_LN = 2.302585092994046


# The 14+m_ctx small per-hypothesis columns live PACKED in one (W, C)
# int32 matrix inside the frame loop (same scheme as the CTC search's
# _pack_cols): the blank-merge and emission selections then propagate them
# with ONE row gather each instead of ~11 separate leaf gathers — in-loop
# gather DESCRIPTORS are the decode-time currency (~7 ns each, see
# ops/beam_search_device.py). score/buf/pred-state stay separate: score
# does f32 sort arithmetic, buf is its own row gather, and the prediction
# state tree keeps the dtypes/shapes pred_step_fn expects.
def _rn_pack(cnt, cl, wn, rc, h1, h2, wf1, wf2, rw1, rw2, ctx):
    u2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.concatenate([
        cnt[:, None], cl[:, None], wn[:, None], rc[:, None],
        u2i(h1)[:, None], u2i(h2)[:, None], u2i(wf1)[:, None],
        u2i(wf2)[:, None], u2i(rw1), u2i(rw2), ctx], axis=1)


class _Rn(NamedTuple):
    cnt: jnp.ndarray
    cl: jnp.ndarray
    wn: jnp.ndarray
    rc: jnp.ndarray
    h1: jnp.ndarray
    h2: jnp.ndarray
    wf1: jnp.ndarray
    wf2: jnp.ndarray
    rw1: jnp.ndarray
    rw2: jnp.ndarray
    ctx: jnp.ndarray


def _rn_unpack(sm, m_ctx):
    i2u = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)
    return _Rn(cnt=sm[:, 0], cl=sm[:, 1], wn=sm[:, 2], rc=sm[:, 3],
               h1=i2u(sm[:, 4]), h2=i2u(sm[:, 5]), wf1=i2u(sm[:, 6]),
               wf2=i2u(sm[:, 7]), rw1=i2u(sm[:, 8:11]),
               rw2=i2u(sm[:, 11:14]), ctx=sm[:, 14:])


def rnnt_beam_search(joint_fn, enc: jnp.ndarray, enc_lengths: jnp.ndarray,
                     pred_step_fn, pred_init, beam_width: int = 8,
                     top_k: int = 4, max_symbols: int = 4,
                     max_len: Optional[int] = None, blank_id: int = 0,
                     unk_id: Optional[int] = None, length_norm: bool = False,
                     lm_tables=None, tok2lm: Optional[jnp.ndarray] = None,
                     lm_alpha: float = 0.0, lm_beta: float = 0.0,
                     delim_id: Optional[int] = None, lm_bos_id: int = -1,
                     lm_unk_logp: float = -99.0, lm_order: int = 0,
                     word_arrays=None,
                     hot_arrays=None,
                     hot_weight: float = 0.0,
                     start_frames: Optional[jnp.ndarray] = None,
                     init_beams=None, return_beams: bool = False,
                     scan_unroll: int = 1,
                     lm_axis_name=None, lm_n_slots_global: int = 0):
    """Batched time-synchronous RNN-T beam search, fully on-device.

    New capability — the reference's Transducer is a dead stub and its only
    beam search is host Python over CTC posteriors (reference:
    processing/lm.py:62-75). One ``lax.scan`` over frames, ``vmap`` over the
    batch; static shapes throughout.

    Per frame, up to ``max_symbols`` expansion rounds run: each round the
    top-``top_k`` non-blank extensions of every live hypothesis compete for
    the ``beam_width`` active slots, while blank extensions retire
    hypotheses into the next frame's pool. Distinct alignments of the same
    label sequence are merged exactly by log-sum-exp (hash-keyed segments,
    see ``_merge_topk``), so a hypothesis' final score is the true
    alignment-marginal log P(y | x) restricted to the explored set — the
    device analogue of the lattice sum the loss computes.

    Optional token-level n-gram LM shallow fusion reuses the HBM-resident
    hashed ARPA tables (conformer_tpu.lm.device_table): emissions add
    ``lm_alpha * ln P_lm(tok | ctx)`` (+ ``lm_beta`` per word delimiter).

    Optional WORD-level fusion (pass `word_arrays` =
    DeviceWordVocab.device_arrays() and `lm_tables` from the word-level
    ARPA — the same machinery as the CTC search,
    ops/beam_search_device.py): each hypothesis carries rolling character
    hashes of its partial word; a delimiter emission completes the word,
    probes its LM id and adds ``lm_alpha * ln10 * log10 P(word | ctx) +
    lm_beta`` (+ hotword phrase boosts via `hot_arrays`/`hot_weight`).
    Delimiter emissions with an EMPTY partial word (leading or repeated
    delimiters) are suppressed in word mode — RNN-T emissions are final
    output tokens, and a large word bonus would otherwise reward
    "early delimiter + repeat" alignments that render as double spaces
    (see the delim-run normalization note in ops/beam_search_device.py).
    Trailing partial words are scored into the returned ranking; the raw
    beam carry (`return_beams`) stays unadjusted so streaming resume is
    exact.

    joint_fn(enc_t (N, D), pred (N, P)) -> (N, V) logits; pred_step_fn /
    pred_init as in :func:`rnnt_greedy_decode`. Returns (prefixes
    (B, W, U), counts (B, W), scores (B, W)), best first; `scores` are the
    un-normalized log-probabilities (``length_norm`` only changes ranking).

    Streaming hooks (decode/streaming.py): `start_frames` ((B,) int32)
    skips leading (left-context) frames; `init_beams` resumes from the raw
    beam tuple of a previous call and `return_beams=True` appends it to the
    outputs — the beam list then persists across chunks, so the search over
    streamed encoder frames is exactly the offline search up to the
    encoder's finite left context.
    """
    b, t, d = enc.shape
    w = beam_width
    u = max_len or t * max_symbols
    word_mode = word_arrays is not None and lm_tables is not None
    use_lm = lm_tables is not None and lm_order >= 2 and not word_mode
    m_ctx = max(lm_order - 1, 1)
    if start_frames is None:
        start_frames = jnp.zeros((b,), jnp.int32)

    def word_delta_fn(ctx, cl, wf1, wf2, rw1, rw2, rcount):
        """(W,) LM + hotword contribution of completing the partial word,
        and its LM id — same semantics as the CTC search
        (ops/beam_search_device.py:word_lm_delta)."""
        from conformer_tpu.lm.device_table import (_FNV_BASIS, _FNV_PRIME,
                                                   hotword_hit,
                                                   lookup_word_ids,
                                                   score_tokens)

        wid = lookup_word_ids(word_arrays, wf1, wf2)
        lm10 = score_tokens(lm_tables, ctx, cl, wid, lm_unk_logp,
                            lm_axis_name, lm_n_slots_global)
        delta = lm_alpha * _LOG10_TO_LN * lm10 + lm_beta
        if hot_arrays is not None and hot_weight:
            basis = jnp.uint32(_FNV_BASIS)
            prime = jnp.uint32(_FNV_PRIME)
            any_hit = jnp.zeros(wf1.shape, bool)
            for span in range(1, 5):
                fp1 = jnp.full(wf1.shape, basis)
                fp2 = jnp.full(wf1.shape, basis)
                for j in range(3 - (span - 1), 3):
                    fp1 = (fp1 ^ rw1[:, j]) * prime
                    fp2 = (fp2 ^ rw2[:, j]) * prime
                fp1 = (fp1 ^ wf1) * prime
                fp2 = (fp2 ^ wf2) * prime
                hit = hotword_hit(hot_arrays, fp1, fp2)
                any_hit = any_hit | (hit & (rcount >= span - 1))
            delta = delta + jnp.where(any_hit, hot_weight * _LOG10_TO_LN,
                                      0.0)
        return delta, wid

    def decode_one(enc_1, n, start, state0, pred0, carry_in):
        kk = top_k

        if carry_in is not None:
            init = carry_in
        else:
            state = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (w,) + x.shape), state0)
            pred = jnp.broadcast_to(pred0, (w,) + pred0.shape)
            lm_ctx0 = jnp.full((w, m_ctx), -1, jnp.int32)
            lm_len0 = jnp.zeros((w,), jnp.int32)
            if (use_lm or word_mode) and lm_bos_id >= 0:
                lm_ctx0 = lm_ctx0.at[:, -1].set(lm_bos_id)
                lm_len0 = jnp.ones((w,), jnp.int32)
            init = (
                jnp.full((w,), NEG).at[0].set(0.0),     # score
                jnp.zeros((w, u), jnp.int32),           # token buffer
                jnp.zeros((w,), jnp.int32),             # emitted count
                jnp.zeros((w,), jnp.uint32),            # h1
                jnp.zeros((w,), jnp.uint32),            # h2
                lm_ctx0, lm_len0,
                jnp.zeros((w,), jnp.uint32),            # wf1 (word mode)
                jnp.zeros((w,), jnp.uint32),            # wf2
                jnp.zeros((w,), jnp.int32),             # wn
                jnp.zeros((w, 3), jnp.uint32),          # rw1 (hotwords)
                jnp.zeros((w, 3), jnp.uint32),          # rw2
                jnp.zeros((w,), jnp.int32),             # rcount
                state, pred)

        def _to_internal(tup):
            (sc, buf, cnt, h1, h2, ctx, cl, wf1, wf2,
             wn, rw1, rw2, rc, st, pr) = tup
            return (sc, buf,
                    _rn_pack(cnt, cl, wn, rc, h1, h2, wf1, wf2, rw1, rw2,
                             ctx), st, pr)

        def _to_external(intr):
            sc, buf, sm, st, pr = intr
            c = _rn_unpack(sm, m_ctx)
            return (sc, buf, c.cnt, c.h1, c.h2, c.ctx, c.cl, c.wf1, c.wf2,
                    c.wn, c.rw1, c.rw2, c.rc, st, pr)

        def frame_step(carry, inputs):
            enc_t, ti = inputs
            active_frame = (ti >= start) & (ti < n)

            act = carry
            # Finished pool (hyps that consumed this frame): starts empty.
            fin = (jnp.full((w,), NEG),) + carry[1:]

            for s in range(max_symbols + 1):
                a_sc, a_buf, a_sm, a_st, a_pr = act
                a = _rn_unpack(a_sm, m_ctx)
                logits = joint_fn(
                    jnp.broadcast_to(enc_t, (w, enc_t.shape[-1])), a_pr)
                logp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)

                # -- blank extensions retire into the finished pool.
                cat = _tree_concat(fin, (a_sc + logp[:, blank_id],) + act[1:])
                c = _rn_unpack(cat[2], m_ctx)
                sel, msc = _merge_topk(cat[0], c.h1, c.h2, None, w)
                fin = (msc,) + _tree_gather(cat[1:], sel)
                if s == max_symbols:
                    break

                # -- non-blank extensions stay active within the frame.
                masked = logp.at[:, blank_id].set(NEG)
                if unk_id is not None:
                    masked = masked.at[:, unk_id].set(NEG)
                # Iterative exact top-k: jax.lax.top_k's full (W, V)
                # sort here x4 inner steps was 59% of the frame (r4
                # trace; ops/topk.py).
                cand_lp, cand_tok = topk_lastaxis(masked, kk)   # (W, KK)
                e_sc = a_sc[:, None] + cand_lp
                if use_lm:
                    from conformer_tpu.lm.device_table import score_tokens

                    lm_tok = tok2lm[cand_tok]                   # (W, KK)
                    lm10 = score_tokens(
                        lm_tables,
                        jnp.broadcast_to(a.ctx[:, None, :], (w, kk, m_ctx)),
                        jnp.broadcast_to(a.cl[:, None], (w, kk)),
                        lm_tok, lm_unk_logp,
                        lm_axis_name, lm_n_slots_global)
                    delta = lm_alpha * _LOG10_TO_LN * lm10
                    if delim_id is not None and lm_beta:
                        delta = delta + jnp.where(
                            cand_tok == delim_id, lm_beta, 0.0)
                    e_sc = e_sc + delta
                wid_done = None
                if word_mode:
                    w_delta, wid_done = word_delta_fn(
                        a.ctx, a.cl, a.wf1, a.wf2, a.rw1, a.rw2, a.rc)
                    is_delim_cand = cand_tok == delim_id
                    e_sc = e_sc + jnp.where(
                        is_delim_cand & (a.wn[:, None] > 0),
                        w_delta[:, None], 0.0)
                    # Suppress empty-word delimiters (leading / repeated).
                    e_sc = jnp.where(is_delim_cand & (a.wn[:, None] == 0),
                                     NEG, e_sc)
                e_sc = jnp.where(a.cnt[:, None] >= u, NEG, e_sc)
                tok = cand_tok.reshape(-1)
                e_sc = e_sc.reshape(-1)
                tu = tok.astype(jnp.uint32) + 1
                # jnp.repeat(x, kk) = broadcast+reshape on the vector path;
                # x[parent] lowered to an in-loop serializing gather (see
                # ops/beam_search_device.py on descriptor cost).
                e_h1 = jnp.repeat(a.h1, kk) * _M1 + tu
                e_h2 = jnp.repeat(a.h2, kk) * _M2 + tu
                # Emission pools cannot contain duplicate sequences (see
                # _select_topk) — skip the sort-merge entirely.
                sel, msc = _select_topk(e_sc, w)
                # Candidate i is extension (i % kk) of parent (i // kk) —
                # index arithmetic, not a gather.
                p = sel // kk
                tk = tok[sel]
                # ONE row gather propagates every packed parent column.
                pa = _rn_unpack(a_sm[p], m_ctx)
                new_buf = jnp.where(
                    jnp.arange(u)[None, :] == pa.cnt[:, None],
                    tk[:, None], a_buf[p])
                new_st, new_pr = pred_step_fn(_tree_gather(a_st, p), tk)
                n_wf1, n_wf2, n_wn = pa.wf1, pa.wf2, pa.wn
                n_rw1, n_rw2, n_rc = pa.rw1, pa.rw2, pa.rc
                if use_lm:
                    shifted = jnp.concatenate(
                        [pa.ctx[:, 1:],
                         tok2lm[tk][:, None].astype(jnp.int32)], 1)
                    new_ctx = shifted
                    new_cl = jnp.minimum(pa.cl + 1, m_ctx)
                elif word_mode:
                    # Selected delimiters always complete a word (empty-word
                    # delimiters were suppressed above).
                    is_d = tk == delim_id
                    tc = word_arrays[0][tk]          # (..., 4): one row
                    a1, b1, a2, b2 = (tc[..., 0], tc[..., 1],
                                      tc[..., 2], tc[..., 3])
                    zero = jnp.uint32(0)
                    grown1 = n_wf1 * a1 + b1
                    grown2 = n_wf2 * a2 + b2
                    n_rw1 = jnp.where(
                        is_d[:, None],
                        jnp.concatenate([n_rw1[:, 1:], n_wf1[:, None]], 1),
                        n_rw1)
                    n_rw2 = jnp.where(
                        is_d[:, None],
                        jnp.concatenate([n_rw2[:, 1:], n_wf2[:, None]], 1),
                        n_rw2)
                    n_rc = jnp.where(is_d, jnp.minimum(n_rc + 1, 3), n_rc)
                    n_wf1 = jnp.where(is_d, zero, grown1)
                    n_wf2 = jnp.where(is_d, zero, grown2)
                    n_wn = jnp.where(is_d, 0, n_wn + 1)
                    new_ctx = jnp.where(
                        is_d[:, None],
                        jnp.concatenate(
                            [pa.ctx[:, 1:], wid_done[p][:, None]], 1),
                        pa.ctx)
                    new_cl = jnp.where(
                        is_d, jnp.minimum(pa.cl + 1, m_ctx), pa.cl)
                else:
                    new_ctx, new_cl = pa.ctx, pa.cl
                act = (msc, new_buf,
                       _rn_pack(cnt=pa.cnt + 1, cl=new_cl, wn=n_wn,
                                rc=n_rc, h1=e_h1[sel], h2=e_h2[sel],
                                wf1=n_wf1, wf2=n_wf2, rw1=n_rw1,
                                rw2=n_rw2, ctx=new_ctx),
                       new_st, new_pr)

            return jax.tree_util.tree_map(
                lambda nv, ov: jnp.where(active_frame, nv, ov), fin,
                carry), None

        # The frame body already runs max_symbols+1 expansion rounds of
        # small ops; a modest unroll amortizes per-op dispatch further.
        final_int, _ = jax.lax.scan(
            frame_step, _to_internal(init),
            (enc_1, jnp.arange(t, dtype=jnp.int32)),
            unroll=min(scan_unroll, max(t, 1)))
        final = _to_external(final_int)
        score, buf, cnt = final[0], final[1], final[2]
        if word_mode:
            # Score the trailing partial word into the ranking (CTC-host
            # finalize semantics); the raw carry stays unadjusted so a
            # streaming caller can keep feeding frames.
            f_ctx, f_cl = final[5], final[6]
            f_wf1, f_wf2, f_wn = final[7], final[8], final[9]
            f_rw1, f_rw2, f_rc = final[10], final[11], final[12]
            w_delta, _ = word_delta_fn(f_ctx, f_cl, f_wf1, f_wf2,
                                       f_rw1, f_rw2, f_rc)
            score = score + jnp.where(f_wn > 0, w_delta, 0.0)
        rank = (score / jnp.maximum(cnt.astype(jnp.float32), 1.0)
                if length_norm else score)
        order = jnp.argsort(-rank)
        if return_beams:
            return buf[order], cnt[order], score[order], final
        return buf[order], cnt[order], score[order]

    state0, pred0 = pred_init
    if init_beams is None:
        return jax.vmap(
            lambda e_, n_, s_, st_, p_: decode_one(e_, n_, s_, st_, p_, None)
        )(enc, enc_lengths.astype(jnp.int32), start_frames.astype(jnp.int32),
          state0, pred0)
    return jax.vmap(decode_one)(enc, enc_lengths.astype(jnp.int32),
                                start_frames.astype(jnp.int32),
                                state0, pred0, init_beams)


def rnnt_beam_search_sharded(joint_fn, enc, enc_lengths, pred_step_fn,
                             pred_init, mesh=None, data_axis: str = "data",
                             model_axis: str = "model", **kw):
    """Multi-chip RNN-T device beam search — the transducer counterpart of
    ops/beam_search_device.py::ctc_beam_search_device_sharded, closing the
    decode-family symmetry (SURVEY §2.10 north star: "collective exchange
    of beam/LM state during decode"; no reference counterpart — its
    Transducer is a dead stub, model/modules/transducer.py:4).

    Batch (enc, lengths, prediction-network init state) shards over the
    data axis; the packed n-gram LM hash table shards over the model axis
    (slot dim) with probe results combined by psum over ICI
    (lm/device_table.py:_probe_rows). The search math replicates across the
    model axis — every chip in a model group holds the same beams,
    exchanging only LM probe state. joint_fn / pred_step_fn close over the
    (replicated) model parameters. Falls back to the unsharded search when
    no axis applies. `init_beams`/`return_beams` (streaming carry) are not
    supported here — streaming under a mesh feeds chunks through the
    unsharded search on sliced logits instead.
    """
    from jax.sharding import PartitionSpec as P

    if kw.get("init_beams") is not None or kw.get("return_beams"):
        raise ValueError("init_beams/return_beams are unsupported in the "
                         "sharded RNN-T search")
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    names = getattr(mesh, "axis_names", ())
    shape = dict(getattr(mesh, "shape", {}))
    b = enc.shape[0]
    d_ax = (data_axis if data_axis in names and shape.get(data_axis, 1) > 1
            and b % shape[data_axis] == 0 else None)
    lm_tables = kw.get("lm_tables")
    n_model = shape.get(model_axis, 1)
    m_ax = (model_axis if model_axis in names and n_model > 1
            and lm_tables is not None
            and lm_tables[0].shape[1] % n_model == 0 else None)
    if enc_lengths is None:  # default BEFORE the fallback so both paths take it
        enc_lengths = jnp.full((b,), enc.shape[1], jnp.int32)
    if d_ax is None and m_ax is None:
        return rnnt_beam_search(joint_fn, enc, enc_lengths, pred_step_fn,
                                pred_init, **kw)
    start = kw.pop("start_frames", None)
    if start is None:
        start = jnp.zeros((b,), jnp.int32)

    kw = dict(kw)
    tables = kw.pop("lm_tables", None)
    if m_ax is not None:
        kw["lm_axis_name"] = m_ax
        kw["lm_n_slots_global"] = int(tables[0].shape[1])
    init_spec = jax.tree_util.tree_map(lambda _: P(d_ax), pred_init)
    out_spec = (P(d_ax), P(d_ax), P(d_ax))

    if tables is None:
        def body(e, n, s, init):
            return rnnt_beam_search(joint_fn, e, n, pred_step_fn, init,
                                    start_frames=s, **kw)

        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(d_ax), P(d_ax), P(d_ax), init_spec),
            out_specs=out_spec, check_vma=False,
        )(enc, enc_lengths.astype(jnp.int32), start.astype(jnp.int32),
          pred_init)

    # Shard the slot axis of the packed (order, S, 4) n-gram table over the
    # model axis when it applies; the dense unigram arrays (id-indexed) and
    # the word-vocab/hotword tables (kwargs, closed over) replicate.
    table_spec = ((P(None, m_ax, None),) + (P(None),) * (len(tables) - 1))

    def body(e, n, s, init, tabs):
        return rnnt_beam_search(joint_fn, e, n, pred_step_fn, init,
                                start_frames=s, lm_tables=tabs, **kw)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(d_ax), P(d_ax), P(d_ax), init_spec, table_spec),
        out_specs=out_spec, check_vma=False,
    )(enc, enc_lengths.astype(jnp.int32), start.astype(jnp.int32),
      pred_init, tuple(tables))


def _nll_from_planes(lp_blank, lp_emit, t_lengths, u_lengths, row_mask):
    """(B,T,U+1)/(B,T,U) planes -> mean per-sequence NLL (shared
    normalization: -ll / max(U, 1), dummy rows excluded via row_mask)."""
    ll = rnnt_alpha_final(lp_blank, lp_emit, t_lengths, u_lengths)
    per_seq = -ll / jnp.maximum(u_lengths.astype(jnp.float32), 1.0)
    if row_mask is not None:
        w = row_mask.astype(jnp.float32)
        return jnp.sum(per_seq * w) / jnp.maximum(jnp.sum(w), 1.0)
    return jnp.mean(per_seq)


def rnnt_loss_scan(e: jnp.ndarray, p: jnp.ndarray, out_kernel: jnp.ndarray,
                   out_bias: jnp.ndarray, labels: jnp.ndarray,
                   t_lengths: jnp.ndarray, u_lengths: jnp.ndarray,
                   blank_id: int = 0,
                   row_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Lattice-free RNN-T loss from the ADDITIVE joint factors.

    The classic RNN-T memory trap is the (B, T, U+1, V) logit lattice —
    ~1.7 GB at the production operating point (B=56, T'=199, U~100, V=370,
    fp32) before autodiff residuals double it. Because the joint is additive
    (models/transducer.py::JointNetwork), this loss takes the two projected
    factors e = W_e·enc (B, T, J) and p = W_p·pred (B, U+1, J) and runs ONE
    ``lax.scan`` over frames: each step computes tanh(e_t + p) -> vocab
    logits (B, U+1, V), log-softmaxes, and keeps ONLY the blank/emit planes
    (B, U+1). ``jax.checkpoint`` on the step makes the backward recompute
    the per-frame joint instead of saving (T, B, U+1, ·) residuals, so peak
    memory is O(B·(T+U)·J + B·T·U) — the lattice never exists.

    Numerics are IDENTICAL to rnnt_loss_from_logits on the same model
    (tanh in the factors' dtype, fp32 vocab projection + softmax — matching
    JointNetwork.__call__; parity-tested in tests/test_transducer.py).

    e/p: joint factors; out_kernel (J, V) / out_bias (V,): the `out` Dense
    params (fp32); labels (B, U) int32; t_lengths/u_lengths (B,).
    """
    b, t, j = e.shape
    u1 = p.shape[1]

    # Emit-plane extraction as a masked reduce, NOT take_along_axis: the
    # labels are frame-invariant, and a (B*U)-descriptor gather inside the
    # frame scan serialized on the scalar core for ~13 ms/step at
    # b56/U=96 (r4 trace; plus its recompute under jax.checkpoint and a
    # scatter in the backward). The compare fuses into the log_softmax
    # consumer — the one-hot never materializes.
    v = out_kernel.shape[1]
    lab_mask = (labels[:, :, None].astype(jnp.int32)
                == jnp.arange(v, dtype=jnp.int32)[None, None, :])  # (B,U,V)

    def frame(_, e_t):
        x = jnp.tanh(e_t[:, None, :] + p)                     # (B, U+1, J)
        logits = x.astype(jnp.float32) @ out_kernel + out_bias
        lp = jax.nn.log_softmax(logits, -1)                   # (B, U+1, V)
        lpb = lp[..., blank_id]
        lpe = jnp.sum(jnp.where(lab_mask, lp[:, :-1, :], 0.0),
                      axis=-1)                                # (B, U)
        return None, (lpb, lpe)

    _, (lpb, lpe) = jax.lax.scan(jax.checkpoint(frame), None,
                                 jnp.moveaxis(e, 1, 0))
    return _nll_from_planes(jnp.moveaxis(lpb, 0, 1), jnp.moveaxis(lpe, 0, 1),
                            t_lengths, u_lengths, row_mask)


def rnnt_greedy_decode(joint_fn, enc: jnp.ndarray, enc_lengths: jnp.ndarray,
                       pred_step_fn, pred_init, max_symbols: int = 4,
                       max_len: Optional[int] = None, blank_id: int = 0,
                       start_frames: Optional[jnp.ndarray] = None,
                       return_carry: bool = False):
    """Batched time-synchronous greedy decode, jittable (static shapes).

    joint_fn(enc_t (B, D), pred (B, P)) -> (B, V) logits;
    pred_step_fn(state, token (B,)) -> (state, pred (B, P)) advances the
    prediction network by one emitted token; pred_init = (state0, pred0).
    At each frame up to `max_symbols` non-blank symbols may be emitted
    (standard greedy cap). Returns (tokens (B, T*max_symbols), counts (B,)).

    Streaming hooks: `start_frames` ((B,) int32) skips leading frames (the
    left-context half of a chunked window); `return_carry=True` additionally
    returns the final (state, pred) so the label history carries EXACTLY
    across chunk boundaries (decode/streaming.py) — the property CTC
    streaming can only approximate with its collapse-state carry.
    """
    b, t, _ = enc.shape
    u = (max_len or t * max_symbols)
    if start_frames is None:
        start_frames = jnp.zeros((b,), jnp.int32)

    def frame_step(carry, inputs):
        state, pred, buf, count = carry
        enc_t, ti = inputs
        active0 = (ti >= start_frames) & (ti < enc_lengths)

        def sym_step(c, _):
            state, pred, buf, count, alive = c
            logits = joint_fn(enc_t, pred)                    # (B, V)
            tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            emit = alive & (tok != blank_id) & (count < u)
            buf = jnp.where(
                (jnp.arange(u)[None, :] == count[:, None]) & emit[:, None],
                tok[:, None], buf)
            count = count + emit.astype(jnp.int32)
            new_state, new_pred = pred_step_fn(state, jnp.where(emit, tok, 0))

            def sel(n, o):
                m = emit.reshape((-1,) + (1,) * (n.ndim - 1))
                return jnp.where(m, n, o)

            state = jax.tree_util.tree_map(sel, new_state, state)
            pred = sel(new_pred, pred)
            return (state, pred, buf, count, emit), None

        (state, pred, buf, count, _), _ = jax.lax.scan(
            sym_step, (state, pred, buf, count, active0), None,
            length=max_symbols)
        return (state, pred, buf, count), None

    state0, pred0 = pred_init
    buf = jnp.zeros((b, u), jnp.int32)
    count = jnp.zeros((b,), jnp.int32)
    (state, pred, buf, count), _ = jax.lax.scan(
        frame_step, (state0, pred0, buf, count),
        (jnp.moveaxis(enc, 1, 0), jnp.arange(t, dtype=jnp.int32)))
    if return_carry:
        return buf, count, (state, pred)
    return buf, count
