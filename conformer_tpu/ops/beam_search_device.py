"""Device-resident CTC prefix beam search with optional n-gram LM fusion.

The reference's beam search is sequential host Python per utterance
(reference: processing/lm.py:62-75 via pyctcdecode). This implementation runs
the entire search as one XLA program — ``lax.scan`` over frames, ``vmap`` over
the batch — so batched beam decoding stays on-chip at accelerator speed.

LM shallow fusion (a SURVEY §2.10 north-star capability with no reference
counterpart) queries an HBM-resident hashed token-level n-gram table
(conformer_tpu.lm.device_table) on every candidate extension: the LM factor
is folded multiplicatively into the non-blank path mass at emission time,
which is algebraically identical to the host decoder's separate lm_score
bookkeeping (every path of a prefix shares the prefix's LM score, so p_b and
p_nb simply scale by it), and merging stays exact. The word-level host
decoder (conformer_tpu.decode.beam_search) remains the reference operating
point; the device LM is token-level (build with
``cli.create_lm --token-level``).

Algorithm (standard CTC prefix beam search, static shapes throughout):
- beam state: prefix token buffer + length, last token, two independent
  rolling hashes, LM context ring, log p(blank-ending) and
  log p(nonblank-ending);
- per frame: the top-K non-blank tokens generate W "keep" candidates
  (blank + repeat mass) and W*K "extend" candidates;
- identical prefixes merge by one variadic sort on (hash1, hash2, score)
  and a window-2 logaddexp at each run head — exact because a run holds at
  most two live candidates (proof at the merge site); the device analogue
  of pyctcdecode's dict merge (mass lost to a genuine 2x32-bit hash
  collision is score-conservative);
- the top-W unique prefixes by total mass survive; the prefix token buffer
  is rebuilt from per-frame backpointers after the scan.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from conformer_tpu.ops.topk import topk_lastaxis

NEG = -1e30
# Host-side numpy scalars, NOT jnp: a module-level jax.Array becomes a
# single device constant shared by every trace that touches this module;
# jax then weak-caches trace-lifted views on it, which leaks tracers
# across independent traces (observed: a prior eager rnnt_beam_search
# corrupted a later jit's argument pruning — "Execution supplied 111
# buffers but compiled program expected 135").
_M1 = np.uint32(1000003)
_M2 = np.uint32(2654435761)
_LOG10_TO_LN = math.log(10.0)


class BeamState(NamedTuple):
    prefixes: jnp.ndarray   # (W, U) int32
    plen: jnp.ndarray       # (W,) int32
    last: jnp.ndarray       # (W,) int32, -1 when empty
    h1: jnp.ndarray         # (W,) uint32
    h2: jnp.ndarray         # (W,) uint32
    p_b: jnp.ndarray        # (W,) f32 log prob of blank-ending paths
    p_nb: jnp.ndarray       # (W,) f32 log prob of nonblank-ending paths
    lm_ctx: jnp.ndarray     # (W, order-1) int32 LM ids, right-aligned
    lm_len: jnp.ndarray     # (W,) int32 valid context length
    # Word-level fusion only: rolling character hashes + token count of the
    # current partial word (lm/device_table.py:DeviceWordVocab).
    wf1: jnp.ndarray        # (W,) uint32
    wf2: jnp.ndarray        # (W,) uint32
    wn: jnp.ndarray         # (W,) int32
    # Hotword boosting only: character-hash pairs of the last completed
    # words (most recent last) + completed-word count (capped).
    rw1: jnp.ndarray        # (W, 3) uint32
    rw2: jnp.ndarray        # (W, 3) uint32
    rcount: jnp.ndarray     # (W,) int32


# Scan carry = BeamState WITHOUT the (W, U) prefix buffer. The per-frame
# body never READS prefixes — it keys merging on the rolling hashes — so
# carrying (and parent-gathering, and masked-updating) a (W, U) int32
# buffer every frame was pure per-frame overhead (~11 MB of state at
# W=190/U=256, plus its layout copies in the while-loop carry). Instead
# the scan emits (parent, token) backpointers per frame and the prefix
# buffer is rebuilt ONCE after the scan by a reverse walk + one scatter
# (ctc_beam_search_device). plen stays carried (the buffer-full guard and
# emission positions need it).
class _Carry(NamedTuple):
    plen: jnp.ndarray
    last: jnp.ndarray
    h1: jnp.ndarray
    h2: jnp.ndarray
    p_b: jnp.ndarray
    p_nb: jnp.ndarray
    lm_ctx: jnp.ndarray
    lm_len: jnp.ndarray
    wf1: jnp.ndarray
    wf2: jnp.ndarray
    wn: jnp.ndarray
    rw1: jnp.ndarray
    rw2: jnp.ndarray
    rcount: jnp.ndarray
    # Word-mode dense-unigram cache: uni_backoff(lm_ctx[-1]), 0.0 when the
    # context is empty/OOV. Set at word completion from the SAME (V, 2)
    # unigram row gather that fetches the completed word's logp, so the
    # per-frame uni_backoffs[ctx[-1]] gather (its own ~0.08 ms/frame
    # descriptor set at w190/b56, r4 trace) disappears.
    bo1: jnp.ndarray        # (W,) f32


# The 13+m_ctx parent-indexed per-beam columns live PACKED in one (W, C)
# int32 matrix inside the scan: every per-frame `state.X[parent]` gather
# ran as its own serializing scalar-core gather (~10 per frame, each a
# full dispatch); packing makes parent propagation ONE row gather plus
# static lane slices. h1/h2/p_b/p_nb stay separate — they come from the
# co-sorted candidate arrays, not from a parent gather, and p_b/p_nb do
# f32 arithmetic every frame.
def _pack_cols(plen, last, lm_len, wn, rcount, wf1, wf2, rw1, rw2, lm_ctx,
               bo1):
    u2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    f2i = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)
    return jnp.concatenate([
        plen[:, None], last[:, None], lm_len[:, None], wn[:, None],
        rcount[:, None], u2i(wf1)[:, None], u2i(wf2)[:, None],
        u2i(rw1), u2i(rw2), f2i(bo1)[:, None], lm_ctx], axis=1)


def _unpack_cols(S, h1, h2, p_b, p_nb, m_ctx):
    i2u = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)
    i2f = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)
    return _Carry(plen=S[:, 0], last=S[:, 1], h1=h1, h2=h2, p_b=p_b,
                  p_nb=p_nb, lm_ctx=S[:, 14:14 + m_ctx], lm_len=S[:, 2],
                  wn=S[:, 3], rcount=S[:, 4], wf1=i2u(S[:, 5]),
                  wf2=i2u(S[:, 6]), rw1=i2u(S[:, 7:10]),
                  rw2=i2u(S[:, 10:13]), bo1=i2f(S[:, 13]))


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    dead = m <= NEG / 2
    safe = jnp.where(dead, 0.0, m)
    out = safe + jnp.log(jnp.exp(a - safe) + jnp.exp(b - safe))
    return jnp.where(dead, NEG, out)


def ctc_beam_search_device(log_probs: jnp.ndarray,
                           lengths: Optional[jnp.ndarray] = None,
                           beam_width: int = 16, top_k: int = 8,
                           blank_id: int = 0,
                           unk_id: Optional[int] = None,
                           max_len: Optional[int] = None,
                           lm_tables=None,
                           tok2lm: Optional[jnp.ndarray] = None,
                           lm_alpha: float = 0.0,
                           lm_beta: float = 0.0,
                           delim_id: Optional[int] = None,
                           lm_bos_id: int = -1,
                           lm_unk_logp: float = -99.0,
                           lm_order: int = 0,
                           lm_axis_name=None,
                           lm_n_slots_global: int = 0,
                           word_arrays=None,
                           hot_arrays=None,
                           hot_weight: float = 0.0,
                           init_state: Optional[BeamState] = None,
                           return_state: bool = False,
                           start_frames: Optional[jnp.ndarray] = None,
                           scan_unroll: int = 1,
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, T, V) log-softmax -> (prefixes (B, W, U), plens (B, W),
    scores (B, W)), best beam first.

    `lengths` masks trailing frames; `max_len` caps emitted tokens
    (default T). `unk_id` tokens are never emitted (reference greedy drops
    <UNK>, processor.py:309).

    Token-level LM fusion (optional): `lm_tables` =
    DeviceNgramTable.device_arrays(), `tok2lm` (V,) int32 mapping token ids
    -> LM ids (-1 = OOV), `lm_alpha` the fusion weight on ln-scale LM
    scores, `lm_beta` a per-word bonus applied when `delim_id` is emitted;
    `lm_order` is a static table property.

    Word-level LM fusion (optional, the host decoder's operating point —
    decode/beam_search.py:_word_bonus): pass `word_arrays` =
    DeviceWordVocab.device_arrays() and `lm_tables` built from the
    WORD-level ARPA. Each beam carries rolling character hashes of its
    partial word; when `delim_id` completes a non-empty word the word id is
    probed from the hash table and scored against the word n-gram with
    exact backoff, adding alpha * ln10 * log10 P(word | ctx) + beta.
    Trailing partial words are scored into the final ranking exactly like
    the host finalize (beam_search.py:finalize_py).

    Hotword boosting (word mode only): pass `hot_arrays` =
    DeviceHotwords.device_arrays() and `hot_weight` (the config's
    hotword_weight; the ln10 conversion is applied here). Each beam keeps
    the character-hash pairs of its last completed words; when a word
    completes, suffix spans of 1..4 words are folded and probed — a hit
    adds hot_weight * ln10, matching the host's _word_bonus.

    Streaming: prefix beam search is frame-sequential, so feeding chunks
    through a carried state is exactly offline decode of the concatenation
    (the host BeamStream invariant, decode/beam_search.py). Pass
    `return_state=True` to also get the raw batched BeamState (UNsorted,
    without the trailing-partial adjustment) and feed it back via
    `init_state` with the next chunk's log-probs; `start_frames` ((B,)
    int32) skips leading (left-context) frames of each chunk. Pass an
    explicit `max_len` covering the whole stream — the token buffer is
    sized by it.
    """
    b, t, v = log_probs.shape
    u = max_len or t
    k = min(top_k, v - 1)
    w = beam_width
    word_mode = word_arrays is not None and lm_tables is not None
    use_lm = lm_tables is not None and lm_order >= 2 and not word_mode
    m_ctx = max(lm_order - 1, 1)

    def decode_one(lp: jnp.ndarray, n: jnp.ndarray, start: jnp.ndarray,
                   carry_in: Optional[BeamState] = None):
        lm_ctx0 = jnp.full((w, m_ctx), -1, jnp.int32)
        lm_len0 = jnp.zeros((w,), jnp.int32)
        if (use_lm or word_mode) and lm_bos_id >= 0:
            lm_ctx0 = lm_ctx0.at[:, -1].set(lm_bos_id)
            lm_len0 = jnp.ones((w,), jnp.int32)
        init = BeamState(
            prefixes=jnp.zeros((w, u), jnp.int32),
            plen=jnp.zeros((w,), jnp.int32),
            last=jnp.full((w,), -1, jnp.int32),
            h1=jnp.zeros((w,), jnp.uint32),
            h2=jnp.zeros((w,), jnp.uint32),
            p_b=jnp.full((w,), NEG).at[0].set(0.0),
            p_nb=jnp.full((w,), NEG),
            lm_ctx=lm_ctx0,
            lm_len=lm_len0,
            wf1=jnp.zeros((w,), jnp.uint32),
            wf2=jnp.zeros((w,), jnp.uint32),
            wn=jnp.zeros((w,), jnp.int32),
            rw1=jnp.zeros((w, 3), jnp.uint32),
            rw2=jnp.zeros((w, 3), jnp.uint32),
            rcount=jnp.zeros((w,), jnp.int32),
        )
        if carry_in is not None:
            init = carry_in

        def word_lm_delta(state, bo_last=None):
            """Per-beam (W,) LM + hotword contribution of completing the
            current partial word, the completed word's LM id (-1 = OOV),
            and its dense unigram backoff (the next frame's bo1 cache) —
            host semantics: decode/beam_search.py:_word_bonus.

            ``bo_last``: precomputed uni_backoff(lm_ctx[-1]) (the _Carry
            bo1 cache inside the scan; None recomputes it — the finalize
            path, where one extra gather is off the frame loop)."""
            from conformer_tpu.lm.device_table import (_FNV_BASIS,
                                                       _FNV_PRIME,
                                                       hotword_hit,
                                                       lookup_word_ids,
                                                       score_tokens)

            wid = lookup_word_ids(word_arrays, state.wf1, state.wf2)
            dense = len(lm_tables) >= 3
            bo_tok = jnp.zeros(wid.shape, jnp.float32)
            dense_pre = None
            if dense:
                uni_logps, uni_backoffs = lm_tables[1], lm_tables[2]
                v_lm = uni_logps.shape[0]
                # ONE (V, 2) row gather serves both the completed word's
                # unigram logp (scored now) and its backoff (cached as the
                # next context's bo1).
                uni2 = jnp.stack([uni_logps, uni_backoffs], -1)
                row = uni2[jnp.clip(wid, 0, v_lm - 1)]
                wid_ok = (wid >= 0) & (wid < v_lm)
                bo_tok = jnp.where(wid_ok, row[..., 1], 0.0)
                if bo_last is None:
                    last = state.lm_ctx[..., -1]
                    ok = (last >= 0) & (last < v_lm)
                    bo_last = jnp.where(
                        ok, uni_backoffs[jnp.clip(last, 0, v_lm - 1)], 0.0)
                dense_pre = (row[..., 0], bo_last)
            lm10 = score_tokens(lm_tables, state.lm_ctx, state.lm_len, wid,
                                lm_unk_logp,
                                lm_axis_name, lm_n_slots_global,
                                dense_pre=dense_pre)
            delta = lm_alpha * _LOG10_TO_LN * lm10 + lm_beta
            if hot_arrays is not None and hot_weight:
                # Fold the last-k completed-word hashes (k = 1..4, the
                # current word last) and probe the hotword phrase table —
                # all four spans in ONE batched lookup (fold = elementwise;
                # the gather launch is the serializing cost).
                basis = jnp.uint32(_FNV_BASIS)
                prime = jnp.uint32(_FNV_PRIME)
                fp1s, fp2s = [], []
                for span in range(1, 5):
                    fp1 = jnp.full((w,), basis)
                    fp2 = jnp.full((w,), basis)
                    for j in range(3 - (span - 1), 3):
                        fp1 = (fp1 ^ state.rw1[:, j]) * prime
                        fp2 = (fp2 ^ state.rw2[:, j]) * prime
                    fp1s.append((fp1 ^ state.wf1) * prime)
                    fp2s.append((fp2 ^ state.wf2) * prime)
                hits = hotword_hit(hot_arrays, jnp.stack(fp1s, -1),
                                   jnp.stack(fp2s, -1))        # (W, 4)
                spans_ok = (state.rcount[:, None]
                            >= jnp.arange(4)[None, :])
                any_hit = jnp.any(hits & spans_ok, axis=-1)
                delta = delta + jnp.where(
                    any_hit, hot_weight * _LOG10_TO_LN, 0.0)
            return delta, wid, bo_tok

        def step(carry, inputs):
            S, c_h1p, c_h2p, c_pbp, c_pnbp = carry
            state = _unpack_cols(S, c_h1p, c_h2p, c_pbp, c_pnbp, m_ctx)
            frame, t_idx = inputs
            active = (t_idx >= start) & (t_idx < n)

            total = _logaddexp(state.p_b, state.p_nb)          # (W,)
            lp_blank = frame[blank_id]
            masked = frame.at[blank_id].set(NEG)
            if unk_id is not None:
                masked = masked.at[unk_id].set(NEG)
            cand_lp, cand_tok = topk_lastaxis(masked, k)       # (K,)

            # -- keep candidates (same prefix): blank mass + repeat mass.
            is_rep = state.last[:, None] == cand_tok[None, :]  # (W, K)
            if delim_id is not None:
                # Delimiter runs normalize to ONE token: re-emitting the
                # delimiter merges into the same prefix (total + lp) instead
                # of appending. This is exactly the host decoder's TEXT
                # keying (decode/beam_search.py:_Beam.key — a second delim
                # with an empty partial lands on the same key), which
                # token-keyed prefixes cannot otherwise express; without it
                # a large word bonus makes "early delim + cheap re-emit"
                # beams surface as double-space texts the host never emits.
                is_rep = is_rep & (cand_tok[None, :] != delim_id)
            rep_lp = jnp.max(jnp.where(is_rep, cand_lp[None, :], NEG), axis=1)
            keep_pb = total + lp_blank
            keep_pnb = state.p_nb + rep_lp
            if delim_id is not None:
                keep_pnb = _logaddexp(
                    keep_pnb,
                    jnp.where(state.last == delim_id,
                              total + frame[delim_id], NEG))

            # -- extend candidates (append c): (W*K,)
            base = jnp.where(is_rep, state.p_b[:, None], total[:, None])
            ext_scores = base + cand_lp[None, :]                # (W, K)
            if delim_id is not None:
                # Delim-after-delim never appends (normalized above).
                ext_scores = jnp.where(
                    (state.last[:, None] == delim_id)
                    & (cand_tok[None, :] == delim_id), NEG, ext_scores)
            if use_lm:
                # Shallow fusion: alpha * ln P_lm(c | ctx) folded into the
                # emission mass (+ beta per word boundary). Exact backoff
                # lookups against the HBM-resident hashed ARPA tables.
                from conformer_tpu.lm.device_table import score_tokens

                lm_tok = tok2lm[cand_tok]                       # (K,)
                lm10 = score_tokens(
                    lm_tables,
                    jnp.broadcast_to(state.lm_ctx[:, None, :], (w, k, m_ctx)),
                    jnp.broadcast_to(state.lm_len[:, None], (w, k)),
                    jnp.broadcast_to(lm_tok[None, :], (w, k)),
                    lm_unk_logp,
                    lm_axis_name, lm_n_slots_global)            # (W, K)
                lm_delta = lm_alpha * _LOG10_TO_LN * lm10
                if delim_id is not None and lm_beta:
                    lm_delta = lm_delta + jnp.where(
                        cand_tok[None, :] == delim_id, lm_beta, 0.0)
                ext_scores = ext_scores + lm_delta
            wid_done = None
            if word_mode:
                # Word-level fusion: the LM fires only when the delimiter
                # completes a non-empty partial word (exactly the host's
                # step_py delim branch, decode/beam_search.py).
                w_delta, wid_done, bo_tok = word_lm_delta(
                    state, bo_last=state.bo1)    # (W,) each
                ext_scores = ext_scores + jnp.where(
                    (cand_tok[None, :] == delim_id) & (state.wn[:, None] > 0),
                    w_delta[:, None], 0.0)
            ext_pnb = ext_scores.reshape(-1)
            buffer_full = (state.plen[:, None] >= u) | (ext_pnb.reshape(w, k) <= NEG / 2)
            ext_pnb = jnp.where(buffer_full.reshape(-1), NEG, ext_pnb)
            ext_tok = jnp.tile(cand_tok, w)
            tok_u32 = ext_tok.astype(jnp.uint32) + 1
            # repeat = broadcast+reshape on the vector path; writing it as
            # h1[repeat(arange(w), k)] lowered to an in-loop gather (~0.09
            # ms/frame each at W=190 — descriptors are the loop currency).
            ext_h1 = jnp.repeat(state.h1, k) * _M1 + tok_u32
            ext_h2 = jnp.repeat(state.h2, k) * _M2 + tok_u32

            c_h1 = jnp.concatenate([state.h1, ext_h1])
            c_h2 = jnp.concatenate([state.h2, ext_h2])
            c_pb = jnp.concatenate([keep_pb, jnp.full((w * k,), NEG)])
            c_pnb = jnp.concatenate([keep_pnb, ext_pnb])

            # -- merge identical prefixes.
            # One variadic sort co-sorts every candidate array (XLA's sort
            # moves all operands inside the vectorized sort network);
            # argsort + per-array x[order] gathers lowered to SERIAL
            # scalar-core gathers and dominated the whole search (~0.8 ms
            # per gather per frame at W=190, measured). The (h1, h2) pair
            # is the SAME 64-bit rolling double hash that already keys
            # cross-frame merging (BeamState.h1/h2), so it alone defines
            # prefix identity here too — co-sorting plen/last as extra
            # equality guards (r2) only repeated information the hash
            # already encodes, at ~28% more sort traffic.
            #
            # A hash run holds AT MOST TWO live candidates, so the merge is
            # a single shifted logaddexp at the run head (window-2) instead
            # of two flag-reset associative scans (~90 (B, W(K+1)) vector
            # ops per frame at the r2 design — the search is per-op
            # dispatch-bound, tools/trace_step.py --mode beam_device).
            # Proof: live keeps are the previous merge's distinct run heads
            # (unique prefixes); two live extends parent_i+c == parent_j+c'
            # force equal lengths, hence c == c' (same last token), hence
            # parent_i == parent_j — so a run is at most one keep plus one
            # extend. Dead slots (duplicate-candidate fill from top_k) DO
            # share hashes with live beams, so the run-total score joins
            # the sort key: within a run, live candidates sort first and
            # the window-2 head sees all live mass. (A genuine 64-bit hash
            # collision drops the colliding mass — score-conservative,
            # same contract as the cross-frame merge; the r2 scan merged
            # it into the wrong prefix instead.)
            iota = jnp.arange(c_h1.shape[0], dtype=jnp.int32)
            neg_total = -_logaddexp(c_pb, c_pnb)
            (s_h1, s_h2, _, s_pb, s_pnb, order) = jax.lax.sort(
                (c_h1, c_h2, neg_total, c_pb, c_pnb, iota), num_keys=3)
            same = lambda x: x[1:] == x[:-1]
            same_prev = same(s_h1) & same(s_h2)
            boundary = jnp.concatenate([jnp.ones((1,), bool), ~same_prev])
            next_same = jnp.concatenate([same_prev, jnp.zeros((1,), bool)])
            nxt = lambda x: jnp.concatenate([x[1:], jnp.full((1,), NEG,
                                                             x.dtype)])
            suf_pb = _logaddexp(s_pb, jnp.where(next_same, nxt(s_pb), NEG))
            suf_pnb = _logaddexp(s_pnb, jnp.where(next_same, nxt(s_pnb), NEG))
            head_score = jnp.where(boundary,
                                   _logaddexp(suf_pb, suf_pnb), NEG)

            # Survivor selection: ONE variadic sort by head score (iota2
            # tiebreak = top_k's lowest-index-first) co-sorts every array
            # the next carry needs, then a STATIC [:w] slice. The previous
            # top_k + five x[top_pos]/x[sel] gathers paid ~0.45 ms/frame in
            # serializing in-loop gather descriptors; the sort network
            # moves all operands on the vector path.
            iota2 = jnp.arange(head_score.shape[0], dtype=jnp.int32)
            (neg_head, _, t_pb, t_pnb, t_h1, t_h2, t_sel) = jax.lax.sort(
                (-head_score, iota2, suf_pb, suf_pnb, s_h1, s_h2, order),
                num_keys=2)
            top_scores = -neg_head[:w]
            sel = t_sel[:w]
            sel_pb, sel_pnb = t_pb[:w], t_pnb[:w]
            sel_h1, sel_h2 = t_h1[:w], t_h2[:w]
            # Slots beyond the number of unique prefixes come back as
            # non-heads; kill them or their duplicated segment mass would be
            # double counted at the next merge.
            alive = top_scores > NEG / 2

            # parent/token are pure index arithmetic on the candidate
            # layout [W keeps | W*K extends] — no gather: candidate w*1 + i
            # at i >= w is extend (parent (i-w)//k, token cand_tok[(i-w)%k]).
            is_ext = sel >= w
            ext_off = jnp.where(is_ext, sel - w, 0)
            parent = jnp.where(is_ext, ext_off // k, sel)
            rel = ext_off % k                                   # (W,)
            tok_ext = jnp.where(rel[:, None] == jnp.arange(k)[None, :],
                                cand_tok[None, :], 0).sum(-1)
            tok = jnp.where(is_ext, tok_ext, -1)
            # ONE row gather propagates every parent-indexed column.
            # wid_done rides along as a temporary extra column (r4 trace:
            # the separate wid_done[parent] gather was its own ~0.1
            # ms/frame serializing descriptor set; a row gather's cost is
            # per DESCRIPTOR, so one more column is free).
            if word_mode:
                bo_bits = jax.lax.bitcast_convert_type(bo_tok, jnp.int32)
                rows = jnp.concatenate(
                    [S, wid_done[:, None], bo_bits[:, None]],
                    axis=1)[parent]
                par = _unpack_cols(rows[:, :-2], None, None, None, None,
                                   m_ctx)
                wid_par = rows[:, -2]
                bo_tok_par = jax.lax.bitcast_convert_type(
                    rows[:, -1], jnp.float32)
            else:
                par = _unpack_cols(S[parent], None, None, None, None, m_ctx)
            new_wf1, new_wf2 = par.wf1, par.wf2
            new_wn = par.wn
            new_rw1, new_rw2 = par.rw1, par.rw2
            new_rcount = par.rcount
            if use_lm:
                new_tok_lm = tok2lm[jnp.maximum(tok, 0)]
                shifted = jnp.concatenate(
                    [par.lm_ctx[:, 1:], new_tok_lm[:, None]], 1)
                new_ctx = jnp.where(is_ext[:, None], shifted, par.lm_ctx)
                new_len = jnp.where(
                    is_ext, jnp.minimum(par.lm_len + 1, m_ctx), par.lm_len)
                new_bo1 = par.bo1
            elif word_mode:
                tok_safe = jnp.maximum(tok, 0)
                is_delim = is_ext & (tok == delim_id)
                grow = is_ext & ~is_delim
                # Fold the token's characters into the rolling word hashes
                # (affine update; lm/device_table.py:DeviceWordVocab). One
                # (V, 4) row gather fetches all four fold constants.
                tc = word_arrays[0][tok_safe]                   # (W, 4)
                a1, b1, a2, b2 = tc[:, 0], tc[:, 1], tc[:, 2], tc[:, 3]
                zero = jnp.uint32(0)
                new_wf1 = jnp.where(
                    grow, new_wf1 * a1 + b1,
                    jnp.where(is_delim, zero, new_wf1))
                new_wf2 = jnp.where(
                    grow, new_wf2 * a2 + b2,
                    jnp.where(is_delim, zero, new_wf2))
                new_wn = jnp.where(grow, new_wn + 1,
                                   jnp.where(is_delim, 0, new_wn))
                # Word completed: shift its LM id into the word context;
                # its unigram backoff (fetched by word_lm_delta's (V, 2)
                # row gather) becomes the next frames' bo1 cache.
                completed = is_delim & (par.wn > 0)
                shifted = jnp.concatenate(
                    [par.lm_ctx[:, 1:], wid_par[:, None]], 1)
                new_ctx = jnp.where(completed[:, None], shifted, par.lm_ctx)
                new_len = jnp.where(
                    completed, jnp.minimum(par.lm_len + 1, m_ctx),
                    par.lm_len)
                new_bo1 = jnp.where(completed, bo_tok_par, par.bo1)
                if hot_arrays is not None:
                    # Shift the completed word's char hashes into the
                    # hotword ring (most recent last).
                    r1 = jnp.concatenate(
                        [new_rw1[:, 1:], par.wf1[:, None]], 1)
                    r2 = jnp.concatenate(
                        [new_rw2[:, 1:], par.wf2[:, None]], 1)
                    new_rw1 = jnp.where(completed[:, None], r1, new_rw1)
                    new_rw2 = jnp.where(completed[:, None], r2, new_rw2)
                    new_rcount = jnp.where(
                        completed, jnp.minimum(new_rcount + 1, 3),
                        new_rcount)
            else:
                new_ctx = par.lm_ctx
                new_len = par.lm_len
                new_bo1 = par.bo1
            new_S = _pack_cols(
                plen=jnp.where(is_ext, par.plen + 1, par.plen),
                last=jnp.where(is_ext, tok, par.last),
                lm_len=new_len, wn=new_wn, rcount=new_rcount,
                wf1=new_wf1, wf2=new_wf2, rw1=new_rw1, rw2=new_rw2,
                lm_ctx=new_ctx, bo1=new_bo1)
            new_carry = (new_S, sel_h1, sel_h2,
                         jnp.where(alive, sel_pb, NEG),
                         jnp.where(alive, sel_pnb, NEG))
            new_carry = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.reshape(active, (1,) * new.ndim), new, old),
                new_carry, carry)
            # Backpointers: identity on inactive frames so the reverse
            # walk passes through them unchanged. (parent, tok) pack into
            # one (W, 2) row so the reverse walk gathers ONE descriptor
            # set per frame instead of two (the two separate (B, W)
            # gathers were ~0.1 ms/frame EACH at w190/b56, r4 trace).
            bp_parent = jnp.where(active, parent, jnp.arange(w))
            bp_tok = jnp.where(active, tok, -1)
            return new_carry, jnp.stack([bp_parent, bp_tok], axis=-1)

        # Unrolling amortizes per-op dispatch over several frames — the
        # per-frame body is hundreds of SMALL ops (sorts, windowed probes,
        # (W,)-gathers), so the search is op-overhead-bound (profiled).
        # Initial bo1 cache: uni_backoff of the carried-in context's last
        # word — ONE gather outside the frame loop (zeros when dense
        # unigram rows are absent or fusion is off).
        bo1_0 = jnp.zeros((w,), jnp.float32)
        if word_mode and len(lm_tables) >= 3:
            uni_backoffs = lm_tables[2]
            v_lm = uni_backoffs.shape[0]
            last0 = init.lm_ctx[:, -1]
            bo1_0 = jnp.where(
                (last0 >= 0) & (last0 < v_lm),
                uni_backoffs[jnp.clip(last0, 0, v_lm - 1)], 0.0)
        carry0 = (_pack_cols(plen=init.plen, last=init.last,
                             lm_len=init.lm_len, wn=init.wn,
                             rcount=init.rcount, wf1=init.wf1,
                             wf2=init.wf2, rw1=init.rw1, rw2=init.rw2,
                             lm_ctx=init.lm_ctx, bo1=bo1_0),
                  init.h1, init.h2, init.p_b, init.p_nb)
        final_carry, bps = jax.lax.scan(
            step, carry0, (lp, jnp.arange(t, dtype=jnp.int32)),
            unroll=min(scan_unroll, max(t, 1)))
        final = _unpack_cols(*final_carry, m_ctx)

        # Rebuild the prefix buffer from the backpointers: walk the parent
        # chain backwards (toks land at their frame index under
        # reverse=True), then place the emitted tokens after the carried-in
        # prefix of the ORIGIN slot with one scatter. One packed-row
        # gather per frame fetches (parent, tok) together.
        def back(cur, bp_t):
            row = bp_t[cur]                                    # (W, 2)
            return row[:, 0], row[:, 1]

        origin, path_toks = jax.lax.scan(back, jnp.arange(w), bps,
                                         reverse=True)
        emitted = path_toks >= 0                               # (T, W)
        dest = (init.plen[origin][None, :]
                + jnp.cumsum(emitted, axis=0) - 1)             # (T, W)
        beam_idx = jnp.broadcast_to(jnp.arange(w)[None, :], dest.shape)
        prefixes = init.prefixes[origin].at[
            beam_idx.ravel(),
            jnp.where(emitted, dest, u).ravel()].set(
            jnp.maximum(path_toks, 0).ravel(), mode="drop")
        fd = final._asdict()
        fd.pop("bo1")              # scan-internal cache, not BeamState API
        final = BeamState(prefixes=prefixes, **fd)

        score = _logaddexp(final.p_b, final.p_nb)
        if word_mode:
            # Score the trailing partial word into the final ranking, like
            # the host finalize (decode/beam_search.py:finalize_py).
            w_delta, _, _ = word_lm_delta(final)
            score = score + jnp.where(final.wn > 0, w_delta, 0.0)
        order = jnp.argsort(-score)
        if return_state:
            return final.prefixes[order], final.plen[order], score[order], final
        return final.prefixes[order], final.plen[order], score[order]

    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    if start_frames is None:
        start_frames = jnp.zeros((b,), jnp.int32)
    if init_state is None:
        return jax.vmap(lambda lp, n, s: decode_one(lp, n, s, None))(
            log_probs, lengths.astype(jnp.int32),
            start_frames.astype(jnp.int32))
    return jax.vmap(decode_one)(log_probs, lengths.astype(jnp.int32),
                                start_frames.astype(jnp.int32), init_state)


ctc_beam_search_device_jit = jax.jit(
    ctc_beam_search_device,
    static_argnames=("beam_width", "top_k", "blank_id", "unk_id", "max_len",
                     "lm_alpha", "lm_beta", "delim_id", "lm_bos_id",
                     "lm_unk_logp", "lm_order",
                     "lm_axis_name", "lm_n_slots_global",
                     "hot_weight", "return_state",
                     "scan_unroll"))


def ctc_beam_search_device_sharded(log_probs, lengths=None, mesh=None,
                                   data_axis: str = "data",
                                   model_axis: str = "model", **kw):
    """Multi-chip device beam search: batch sharded over the data axis, LM
    hash tables sharded over the model axis (slot dim) with probe results
    combined by psum over ICI (lm/device_table.py:_probe). The search math
    replicates across the model axis — every chip in a model group holds
    the same beams, exchanging only LM state — realizing SURVEY §2.10's
    "collective exchange of beam/LM state during decode" north star (no
    reference counterpart: processing/lm.py:62-75 is sequential host
    Python). Falls back to the unsharded search when no axis applies.
    """
    from jax.sharding import PartitionSpec as P

    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    names = getattr(mesh, "axis_names", ())
    shape = dict(getattr(mesh, "shape", {}))
    b = log_probs.shape[0]
    d_ax = (data_axis if data_axis in names and shape.get(data_axis, 1) > 1
            and b % shape[data_axis] == 0 else None)
    lm_tables = kw.get("lm_tables")
    n_model = shape.get(model_axis, 1)
    m_ax = (model_axis if model_axis in names and n_model > 1
            and lm_tables is not None
            and lm_tables[0].shape[1] % n_model == 0 else None)
    if d_ax is None and m_ax is None:
        return ctc_beam_search_device(log_probs, lengths, **kw)
    if lengths is None:
        lengths = jnp.full((b,), log_probs.shape[1], jnp.int32)

    kw = dict(kw)
    tables = kw.pop("lm_tables", None)
    if m_ax is not None:
        kw["lm_axis_name"] = m_ax
        kw["lm_n_slots_global"] = int(tables[0].shape[1])
    out_spec = (P(d_ax), P(d_ax), P(d_ax))

    if tables is None:
        body = lambda lp, n: ctc_beam_search_device(lp, n, **kw)
        return jax.shard_map(
            body, mesh=mesh, in_specs=(P(d_ax), P(d_ax)),
            out_specs=out_spec, check_vma=False,
        )(log_probs, lengths.astype(jnp.int32))

    # Shard the slot axis of the packed (order, S, 4) table over the model
    # axis only when it applies; the tables are replicated otherwise. The
    # dense unigram arrays (id-indexed) are small and replicate.
    table_spec = ((P(None, m_ax, None),)
                  + (P(None),) * (len(tables) - 1))

    def body(lp, n, tabs):
        return ctc_beam_search_device(lp, n, lm_tables=tabs, **kw)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(d_ax), P(d_ax), table_spec),
        out_specs=out_spec, check_vma=False,
    )(log_probs, lengths.astype(jnp.int32), tuple(tables))
