"""Device-resident CTC prefix beam search (no LM), fully jittable.

The reference's beam search is sequential host Python per utterance
(reference: processing/lm.py:62-75 via pyctcdecode). This implementation runs
the entire search as one XLA program — ``lax.scan`` over frames, ``vmap`` over
the batch — so batched beam decoding stays on-chip at accelerator speed. LM
shallow fusion remains host-side (conformer_tpu.decode.beam_search); this op
covers the no-LM operating point and first-pass generation for rescoring.

Algorithm (standard CTC prefix beam search, static shapes throughout):
- beam state: prefix token buffer + length, last token, two independent
  rolling hashes, log p(blank-ending) and log p(nonblank-ending);
- per frame: the top-K non-blank tokens generate W "keep" candidates
  (blank + repeat mass) and W*K "extend" candidates;
- identical prefixes merge by sorting on hash1 and segment-logsumexp over
  runs where (hash1, hash2, len, last) all match — the device analogue of
  pyctcdecode's dict merge (a missed merge due to hash1 sort ties is
  score-conservative; a false merge needs a simultaneous 2x32-bit collision);
- the top-W unique prefixes by total mass survive.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG = -1e30
_M1 = jnp.uint32(1000003)
_M2 = jnp.uint32(2654435761)


class BeamState(NamedTuple):
    prefixes: jnp.ndarray   # (W, U) int32
    plen: jnp.ndarray       # (W,) int32
    last: jnp.ndarray       # (W,) int32, -1 when empty
    h1: jnp.ndarray         # (W,) uint32
    h2: jnp.ndarray         # (W,) uint32
    p_b: jnp.ndarray        # (W,) f32 log prob of blank-ending paths
    p_nb: jnp.ndarray       # (W,) f32 log prob of nonblank-ending paths


def _logaddexp(a, b):
    m = jnp.maximum(a, b)
    dead = m <= NEG / 2
    safe = jnp.where(dead, 0.0, m)
    out = safe + jnp.log(jnp.exp(a - safe) + jnp.exp(b - safe))
    return jnp.where(dead, NEG, out)


def _segment_logsumexp(values, seg_ids, num_segments):
    m = jax.ops.segment_max(values, seg_ids, num_segments)
    safe = jnp.where(m <= NEG / 2, 0.0, m)
    s = jax.ops.segment_sum(jnp.exp(values - safe[seg_ids]), seg_ids,
                            num_segments)
    out = safe + jnp.log(jnp.maximum(s, 1e-38))
    return jnp.where(m <= NEG / 2, NEG, out)


def ctc_beam_search_device(log_probs: jnp.ndarray,
                           lengths: Optional[jnp.ndarray] = None,
                           beam_width: int = 16, top_k: int = 8,
                           blank_id: int = 0,
                           unk_id: Optional[int] = None,
                           max_len: Optional[int] = None
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(B, T, V) log-softmax -> (prefixes (B, W, U), plens (B, W),
    scores (B, W)), best beam first.

    `lengths` masks trailing frames; `max_len` caps emitted tokens
    (default T). `unk_id` tokens are never emitted (reference greedy drops
    <UNK>, processor.py:309).
    """
    b, t, v = log_probs.shape
    u = max_len or t
    k = min(top_k, v - 1)
    w = beam_width

    def decode_one(lp: jnp.ndarray, n: jnp.ndarray):
        init = BeamState(
            prefixes=jnp.zeros((w, u), jnp.int32),
            plen=jnp.zeros((w,), jnp.int32),
            last=jnp.full((w,), -1, jnp.int32),
            h1=jnp.zeros((w,), jnp.uint32),
            h2=jnp.zeros((w,), jnp.uint32),
            p_b=jnp.full((w,), NEG).at[0].set(0.0),
            p_nb=jnp.full((w,), NEG),
        )

        def step(state: BeamState, inputs):
            frame, t_idx = inputs
            active = t_idx < n

            total = _logaddexp(state.p_b, state.p_nb)          # (W,)
            lp_blank = frame[blank_id]
            masked = frame.at[blank_id].set(NEG)
            if unk_id is not None:
                masked = masked.at[unk_id].set(NEG)
            cand_lp, cand_tok = jax.lax.top_k(masked, k)       # (K,)

            # -- keep candidates (same prefix): blank mass + repeat mass.
            is_rep = state.last[:, None] == cand_tok[None, :]  # (W, K)
            rep_lp = jnp.max(jnp.where(is_rep, cand_lp[None, :], NEG), axis=1)
            keep_pb = total + lp_blank
            keep_pnb = state.p_nb + rep_lp

            # -- extend candidates (append c): (W*K,)
            base = jnp.where(is_rep, state.p_b[:, None], total[:, None])
            ext_pnb = (base + cand_lp[None, :]).reshape(-1)
            buffer_full = (state.plen[:, None] >= u) | (ext_pnb.reshape(w, k) <= NEG / 2)
            ext_pnb = jnp.where(buffer_full.reshape(-1), NEG, ext_pnb)
            ext_parent = jnp.repeat(jnp.arange(w), k)
            ext_tok = jnp.tile(cand_tok, w)
            tok_u32 = ext_tok.astype(jnp.uint32) + 1
            ext_h1 = state.h1[ext_parent] * _M1 + tok_u32
            ext_h2 = state.h2[ext_parent] * _M2 + tok_u32

            n_cand = w + w * k
            c_h1 = jnp.concatenate([state.h1, ext_h1])
            c_h2 = jnp.concatenate([state.h2, ext_h2])
            c_len = jnp.concatenate([state.plen, state.plen[ext_parent] + 1])
            c_last = jnp.concatenate([state.last, ext_tok])
            c_pb = jnp.concatenate([keep_pb, jnp.full((w * k,), NEG)])
            c_pnb = jnp.concatenate([keep_pnb, ext_pnb])
            c_parent = jnp.concatenate([jnp.arange(w), ext_parent])
            c_tok = jnp.concatenate([jnp.full((w,), -1), ext_tok])

            # -- merge identical prefixes.
            order = jnp.argsort(c_h1)
            same = lambda x: x[order][1:] == x[order][:-1]
            boundary = jnp.concatenate([
                jnp.ones((1,), bool),
                ~(same(c_h1) & same(c_h2) & same(c_len) & same(c_last))])
            seg_ids = jnp.cumsum(boundary) - 1
            seg_pb = _segment_logsumexp(c_pb[order], seg_ids, n_cand)
            seg_pnb = _segment_logsumexp(c_pnb[order], seg_ids, n_cand)
            seg_score = _logaddexp(seg_pb, seg_pnb)
            head_score = jnp.where(boundary, seg_score[seg_ids], NEG)

            top_scores, top_pos = jax.lax.top_k(head_score, w)  # sorted-order idx
            sel = order[top_pos]
            sel_seg = seg_ids[top_pos]
            # Slots beyond the number of unique prefixes come back as
            # non-heads; kill them or their duplicated segment mass would be
            # double counted at the next merge.
            alive = top_scores > NEG / 2

            parent = c_parent[sel]
            tok = c_tok[sel]
            is_ext = tok >= 0
            new_state = BeamState(
                prefixes=jnp.where(
                    is_ext[:, None]
                    & (jnp.arange(u)[None, :] == state.plen[parent][:, None]),
                    tok[:, None], state.prefixes[parent]),
                plen=jnp.where(is_ext, state.plen[parent] + 1,
                               state.plen[parent]),
                last=jnp.where(is_ext, tok, state.last[parent]),
                h1=c_h1[sel], h2=c_h2[sel],
                p_b=jnp.where(alive, seg_pb[sel_seg], NEG),
                p_nb=jnp.where(alive, seg_pnb[sel_seg], NEG))

            new_state = jax.tree_util.tree_map(
                lambda new, old: jnp.where(
                    jnp.reshape(active, (1,) * new.ndim), new, old),
                new_state, state)
            return new_state, None

        final, _ = jax.lax.scan(step, init,
                                (lp, jnp.arange(t, dtype=jnp.int32)))
        score = _logaddexp(final.p_b, final.p_nb)
        order = jnp.argsort(-score)
        return final.prefixes[order], final.plen[order], score[order]

    if lengths is None:
        lengths = jnp.full((b,), t, jnp.int32)
    return jax.vmap(decode_one)(log_probs, lengths.astype(jnp.int32))


ctc_beam_search_device_jit = jax.jit(
    ctc_beam_search_device,
    static_argnames=("beam_width", "top_k", "blank_id", "unk_id", "max_len"))
