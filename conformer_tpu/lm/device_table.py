"""Device-resident n-gram LM: hashed probe tables queried inside jit.

Shallow LM fusion inside the on-device beam search needs log P(token | ctx)
lookups per (beam x candidate x frame) — far too many for host callbacks.
This module compiles an ARPA n-gram model (token-level — build one over
grapheme sequences with ``conformer_tpu.lm.ngram.build_arpa``) into
open-addressing hash tables stored as plain device arrays, plus a pure-jnp
backoff scorer that is exact with respect to the ARPA (verified against the
Python scorer in tests/test_device_lm.py).

Layout: one slot pool per n-gram order. Each entry is (key: uint32 fingerprint
of the id sequence, logp: f32, backoff: f32). Lookup = H probes of
linear open addressing — fully vectorized gathers, no data-dependent control
flow, so the beam search can score (B, W, K) candidates in one fused op.

No reference counterpart: the reference's LM work is sequential host Python
over pyctcdecode (reference: processing/lm.py:62-75); SURVEY §2.10 names
device-side beam/LM state as a north-star capability.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np

# FNV-1a based sequence fingerprint (uint32 wraparound).
_FNV_PRIME = np.uint32(16777619)
_FNV_BASIS = np.uint32(2166136261)
_EMPTY = np.uint32(0)          # reserved key for empty slots
_PROBES = 8
# Builders grow their tables until the max insertion displacement is below
# this, so probe windows (= per-query device gather width) stay narrow.
_TARGET_DISP = 4


def _fingerprint_np(ids: Sequence[int]) -> np.uint32:
    h = _FNV_BASIS
    for t in ids:
        h = np.uint32((int(h) ^ (int(t) & 0xFFFF)) & 0xFFFFFFFF)
        h = np.uint32((int(h) * int(_FNV_PRIME)) & 0xFFFFFFFF)
    if h == _EMPTY:
        h = np.uint32(1)
    return h


@dataclass
class DeviceNgramTable:
    """Per-order hash tables as host numpy (device_put once, reuse)."""

    order: int
    n_slots: int                       # per order, power of two
    keys: np.ndarray                   # (order, n_slots) uint32
    logps: np.ndarray                  # (order, n_slots) f32 (log10)
    backoffs: np.ndarray               # (order, n_slots) f32 (log10)
    unk_logp: float
    vocab: dict                        # word/token string -> LM id
    bos_id: int
    n_probes: int                      # max insertion displacement + 1

    @classmethod
    def from_arpa(cls, arpa_path: str, slots_per_entry: float = 2.0
                  ) -> "DeviceNgramTable":
        from conformer_tpu.lm.ngram import PyNgramLM

        lm = PyNgramLM(arpa_path)
        order = lm.order
        total = max(sum(len(t) for t in lm.tables), 1)
        n_slots = 1 << int(np.ceil(np.log2(max(total * slots_per_entry, 64))))
        # The probe window width IS the per-query gather width on device —
        # every frame of the device beam search gathers (B, W, n_probes)
        # elements per probe through the SERIALIZING scalar-core gather
        # (~6.6 ns/element measured), so small max displacement buys real
        # decode time. Grow the table (halve the load factor) until the
        # max insertion displacement is tiny; HBM slots are cheap.
        for _ in range(4):
            keys = np.zeros((order, n_slots), np.uint32)
            logps = np.zeros((order, n_slots), np.float32)
            backoffs = np.zeros((order, n_slots), np.float32)
            mask = n_slots - 1
            max_disp = 0
            for m, table in enumerate(lm.tables):
                for ids, (logp, backoff) in table.items():
                    fp = _fingerprint_np(ids)
                    slot = int(fp) & mask
                    for disp in range(n_slots):
                        if keys[m, slot] == _EMPTY:
                            keys[m, slot] = fp
                            logps[m, slot] = logp
                            backoffs[m, slot] = backoff
                            max_disp = max(max_disp, disp)
                            break
                        if keys[m, slot] == fp:
                            break  # fingerprint collision: first writer wins
                        slot = (slot + 1) & mask
            if max_disp < _TARGET_DISP:
                break
            n_slots *= 2
        unk = lm.vocab.get("<unk>")
        unk_logp = (lm.tables[0][(unk,)][0]
                    if unk is not None and (unk,) in lm.tables[0] else -99.0)
        return cls(order=order, n_slots=n_slots, keys=keys, logps=logps,
                   backoffs=backoffs, unk_logp=float(unk_logp),
                   vocab=dict(lm.vocab), bos_id=lm.vocab.get("<s>", -1),
                   n_probes=max_disp + 1)

    def device_arrays(self):
        import jax.numpy as jnp

        return (jnp.asarray(self.keys), jnp.asarray(self.logps),
                jnp.asarray(self.backoffs))


# ---------------------------------------------------------------------------
# Word-level fusion: character-rolling-hash word vocabulary.
# ---------------------------------------------------------------------------

# Polynomial rolling hash over unicode code points: H(s) = sum ord(s_i) *
# MULT^(n-1-i) mod 2^32. Unlike FNV it is affine in the running state
# (H(xy) = H(x) * MULT^|y| + H(y)), so the beam search can fold a whole
# TOKEN's characters into the per-beam partial-word hash with one multiply
# and one add of precomputed per-token constants. Two independent multipliers
# give a 64-bit effective key (a false word match needs a simultaneous
# 2x32-bit collision).
_POLY1 = np.uint32(1000003)
_POLY2 = np.uint32(2654435761)


def _poly_hash_np(s: str, mult: np.uint32) -> np.uint32:
    h = np.uint32(0)
    for ch in s:
        h = np.uint32((int(h) * int(mult) + ord(ch)) & 0xFFFFFFFF)
    return h


def _poly_consts_np(s: str, mult: np.uint32) -> Tuple[np.uint32, np.uint32]:
    """(A, B) with fold(h) = h * A + B for appending token string `s`."""
    a = np.uint32(1)
    for _ in s:
        a = np.uint32((int(a) * int(mult)) & 0xFFFFFFFF)
    return a, _poly_hash_np(s, mult)


@dataclass
class DeviceWordVocab:
    """Maps partial-word character hashes -> word-level LM ids, on device.

    The host beam search completes a word by string lookup in the LM vocab
    (decode/beam_search.py:_word_bonus); the device search instead carries two
    rolling character hashes per beam and probes this open-addressing table at
    word boundaries. `tok_a*/tok_b*` fold token id c's characters into a
    running hash h as h * tok_a[c] + tok_b[c], matching _poly_hash_np of the
    concatenated string exactly. Slots with id < 0 are empty; both 32-bit keys
    must match for a hit.

    No reference counterpart: the reference's word-level LM runs on the host
    (reference: processing/lm.py:62-75).
    """

    tok_a1: np.ndarray   # (V,) uint32
    tok_b1: np.ndarray   # (V,) uint32
    tok_a2: np.ndarray   # (V,) uint32
    tok_b2: np.ndarray   # (V,) uint32
    keys1: np.ndarray    # (S,) uint32
    keys2: np.ndarray    # (S,) uint32
    ids: np.ndarray      # (S,) int32, -1 = empty
    n_probes: int

    @classmethod
    def build(cls, token_strings: Sequence[str], word_vocab: dict,
              slots_per_entry: float = 2.0) -> "DeviceWordVocab":
        v = len(token_strings)
        tok_a1 = np.zeros((v,), np.uint32)
        tok_b1 = np.zeros((v,), np.uint32)
        tok_a2 = np.zeros((v,), np.uint32)
        tok_b2 = np.zeros((v,), np.uint32)
        for i, s in enumerate(token_strings):
            tok_a1[i], tok_b1[i] = _poly_consts_np(s, _POLY1)
            tok_a2[i], tok_b2[i] = _poly_consts_np(s, _POLY2)

        words = [(w, wid) for w, wid in word_vocab.items()
                 if w not in ("<s>", "</s>", "<unk>")]
        n_slots = 1 << int(np.ceil(np.log2(
            max(len(words) * slots_per_entry, 64))))
        for _ in range(4):  # small max displacement = narrow device gathers
            keys1 = np.zeros((n_slots,), np.uint32)
            keys2 = np.zeros((n_slots,), np.uint32)
            ids = np.full((n_slots,), -1, np.int32)
            mask = n_slots - 1
            max_disp = 0
            for w, wid in words:
                h1 = _poly_hash_np(w, _POLY1)
                h2 = _poly_hash_np(w, _POLY2)
                slot = int(h1) & mask
                for disp in range(n_slots):
                    if ids[slot] < 0:
                        keys1[slot], keys2[slot], ids[slot] = h1, h2, wid
                        max_disp = max(max_disp, disp)
                        break
                    if keys1[slot] == h1 and keys2[slot] == h2:
                        break  # duplicate spelling: first writer wins
                    slot = (slot + 1) & mask
            if max_disp < _TARGET_DISP:
                break
            n_slots *= 2
        return cls(tok_a1=tok_a1, tok_b1=tok_b1, tok_a2=tok_a2,
                   tok_b2=tok_b2, keys1=keys1, keys2=keys2, ids=ids,
                   n_probes=max_disp + 1)

    def device_arrays(self):
        import jax.numpy as jnp

        return tuple(jnp.asarray(a) for a in (
            self.tok_a1, self.tok_b1, self.tok_a2, self.tok_b2,
            self.keys1, self.keys2, self.ids))


# Hotword phrases: spans of up to _HOT_SPAN completed words, matched by
# folding the words' character-hash pairs with FNV (full 32-bit values).
_HOT_SPAN = 4


def _fold_word_seq_np(values: Sequence[int]) -> np.uint32:
    h = _FNV_BASIS
    for v in values:
        h = np.uint32((int(h) ^ int(v)) & 0xFFFFFFFF)
        h = np.uint32((int(h) * int(_FNV_PRIME)) & 0xFFFFFFFF)
    return h


@dataclass
class DeviceHotwords:
    """Hotword phrase fingerprints for on-device boosting.

    The host decoder boosts a completed word when any suffix of the text
    (span <= 4 words) equals a hotword phrase (decode/beam_search.py:
    _word_bonus). On device, each beam carries the character-hash pairs of
    its last completed words; at a word boundary the search folds the
    last-k hashes (k = 1..4) and probes this table. Spelling-exact: OOV
    words hash by their characters, not LM ids.
    """

    keys1: np.ndarray   # (S,) uint32
    keys2: np.ndarray   # (S,) uint32
    ids: np.ndarray     # (S,) int32 (1 = present, -1 = empty)
    n_probes: int

    @classmethod
    def build(cls, hotwords: Sequence[str],
              slots_per_entry: float = 4.0) -> "DeviceHotwords":
        phrases = []
        for h in hotwords:
            ws = h.upper().split()
            if 1 <= len(ws) <= _HOT_SPAN:
                phrases.append(ws)
        n_slots = 1 << int(np.ceil(np.log2(
            max(len(phrases) * slots_per_entry, 16))))
        for _ in range(4):  # small max displacement = narrow device gathers
            keys1 = np.zeros((n_slots,), np.uint32)
            keys2 = np.zeros((n_slots,), np.uint32)
            ids = np.full((n_slots,), -1, np.int32)
            mask = n_slots - 1
            max_disp = 0
            for ws in phrases:
                fp1 = _fold_word_seq_np(
                    [_poly_hash_np(w, _POLY1) for w in ws])
                fp2 = _fold_word_seq_np(
                    [_poly_hash_np(w, _POLY2) for w in ws])
                slot = int(fp1) & mask
                for disp in range(n_slots):
                    if ids[slot] < 0:
                        keys1[slot], keys2[slot], ids[slot] = fp1, fp2, 1
                        max_disp = max(max_disp, disp)
                        break
                    if keys1[slot] == fp1 and keys2[slot] == fp2:
                        break
                    slot = (slot + 1) & mask
            if max_disp < _TARGET_DISP:
                break
            n_slots *= 2
        return cls(keys1=keys1, keys2=keys2, ids=ids,
                   n_probes=max_disp + 1)

    def device_arrays(self):
        import jax.numpy as jnp

        return (jnp.asarray(self.keys1), jnp.asarray(self.keys2),
                jnp.asarray(self.ids))


def lookup_pair(keys1, keys2, ids, h1, h2, n_probes: int = _PROBES):
    """Open-addressing lookup keyed by (h1, h2) 32-bit pairs -> int value
    (-1 = miss). Slots with ids < 0 are empty; both keys must match.

    Windowed single-gather probing (see _probe): a (h1, h2) pair occupies
    at most one slot, so at most one probe hits."""
    import jax.numpy as jnp

    mask = np.uint32(keys1.shape[0] - 1)
    slots = (h1[..., None]
             + jnp.arange(n_probes, dtype=jnp.uint32)) & mask   # (..., P)
    hit = ((keys1[slots] == h1[..., None])
           & (keys2[slots] == h2[..., None]) & (ids[slots] >= 0))
    found = hit.any(-1)
    val = jnp.where(hit, ids[slots], 0).sum(-1)
    return jnp.where(found, val, -1)


def lookup_word_ids(word_arrays, h1, h2, n_probes: int = _PROBES):
    """(..., ) rolling hashes -> word LM ids (-1 when not in the LM vocab).

    word_arrays = DeviceWordVocab.device_arrays(); open addressing keyed by
    h1 with both 32-bit keys verified per slot.
    """
    return lookup_pair(word_arrays[4], word_arrays[5], word_arrays[6],
                       h1, h2, n_probes)


# ---------------------------------------------------------------------------
# jnp scorer.
# ---------------------------------------------------------------------------

def _fingerprint_jnp(ids, valid):
    """Vectorized FNV-1a over the trailing `valid` mask of ids.

    ids: (..., M) int32 (junk where ~valid); valid: (..., M) bool. The hash
    must equal _fingerprint_np of the valid subsequence, so invalid leading
    positions must not perturb the state: we fold positions left-to-right and
    carry the previous state where invalid.
    """
    import jax.numpy as jnp

    h = jnp.full(ids.shape[:-1], np.uint32(_FNV_BASIS))
    for m in range(ids.shape[-1]):
        t = ids[..., m].astype(jnp.uint32) & np.uint32(0xFFFF)
        nh = (h ^ t) * _FNV_PRIME
        h = jnp.where(valid[..., m], nh, h)
    return jnp.where(h == _EMPTY, np.uint32(1), h)


def _probe(keys, values, fp, n_probes: int = _PROBES,
           axis_name=None, n_slots_global: int = 0):
    """Open-addressing lookup. keys/values: (n_slots,); fp: (...,) uint32.
    -> (found (...,) bool, value (...,)). n_probes must cover the maximum
    insertion displacement (DeviceNgramTable.n_probes).

    With ``axis_name`` (inside a shard_map), keys/values are the LOCAL
    contiguous slot slice of a table of ``n_slots_global`` slots sharded
    over that mesh axis: each shard probes only the global slots it owns
    (uint32 wraparound makes the range test one compare) and the partial
    results combine with a psum over ICI. Exact, because insertion
    guarantees a fingerprint occupies at most one global slot — at most one
    shard can hit, so the masked-zero partials sum to the unsharded answer.
    This is the "collective exchange of LM state during decode" north star
    (SURVEY §2.10): the LM no longer needs to fit in one chip's HBM.
    """
    import jax
    import jax.numpy as jnp

    # All probe slots are gathered in ONE windowed gather (slot, slot+1,
    # ..., slot+P-1): TPU dynamic gathers run on the scalar core, so P
    # sequential gathers cost ~P gather launches; one (..., P) gather costs
    # one. Exactness: insertion stores a fingerprint in AT MOST one slot
    # (first writer wins on collision), so at most one probe hits and the
    # masked sum equals the hit value.
    window = jnp.arange(n_probes, dtype=jnp.uint32)
    if axis_name is None:
        mask = np.uint32(keys.shape[0] - 1)
        slots = (fp[..., None] + window) & mask         # (..., P)
        hit = keys[slots] == fp[..., None]
        found = hit.any(-1)
        out = jnp.where(hit, values[slots], 0).sum(-1).astype(values.dtype)
        return found, out

    s_local = keys.shape[0]
    mask = np.uint32(n_slots_global - 1)
    off = (jax.lax.axis_index(axis_name).astype(jnp.uint32)
           * np.uint32(s_local))
    slots = (fp[..., None] + window) & mask             # (..., P)
    local = slots - off                                  # uint32 wraparound
    in_rng = local < np.uint32(s_local)
    li = jnp.where(in_rng, local, np.uint32(0)).astype(jnp.int32)
    hit = in_rng & (keys[li] == fp[..., None])
    found = hit.any(-1)
    out = jnp.where(hit, values[li], 0).sum(-1).astype(values.dtype)
    found = jax.lax.psum(found.astype(jnp.int32), axis_name) > 0
    out = jax.lax.psum(out, axis_name)
    return found, out


def _probe_rows(keys2d, values2d, fps, rows, n_probes: int = _PROBES,
                axis_name=None, n_slots_global: int = 0):
    """Batched open-addressing lookup across table ROWS: one flattened
    gather replaces G separate _probe calls. keys2d/values2d: (order, S);
    fps: (..., G) uint32; rows: (G,) host ints — probe g looks up fps[..., g]
    in row rows[g]. -> (found (..., G) bool, value (..., G)).

    Per-op dispatch on the serializing scalar-core gather path is the cost
    this batches away (gathered ELEMENTS are unchanged — that is the probe
    window's job); the device beam search issues ~15 probes per frame.
    """
    import jax
    import jax.numpy as jnp

    rows_u = jnp.asarray(np.asarray(rows, np.uint32))
    window = jnp.arange(n_probes, dtype=jnp.uint32)
    if axis_name is None:
        s_row = keys2d.shape[1]
        mask = np.uint32(s_row - 1)
        slots = (fps[..., None] + window) & mask            # (..., G, P)
        flat = (rows_u[:, None] * np.uint32(s_row) + slots).astype(jnp.int32)
        hit = keys2d.reshape(-1)[flat] == fps[..., None]
        found = hit.any(-1)
        out = jnp.where(hit, values2d.reshape(-1)[flat], 0).sum(-1)
        return found, out.astype(values2d.dtype)

    s_local = keys2d.shape[1]
    mask = np.uint32(n_slots_global - 1)
    off = (jax.lax.axis_index(axis_name).astype(jnp.uint32)
           * np.uint32(s_local))
    slots = (fps[..., None] + window) & mask                # (..., G, P)
    local = slots - off                                      # uint32 wrap
    in_rng = local < np.uint32(s_local)
    li = jnp.where(in_rng, local, np.uint32(0))
    flat = (rows_u[:, None] * np.uint32(s_local) + li).astype(jnp.int32)
    hit = in_rng & (keys2d.reshape(-1)[flat] == fps[..., None])
    found = hit.any(-1)
    out = jnp.where(hit, values2d.reshape(-1)[flat], 0).sum(-1)
    found = jax.lax.psum(found.astype(jnp.int32), axis_name) > 0
    out = jax.lax.psum(out.astype(values2d.dtype), axis_name)
    return found, out


def score_tokens(tables, ctx, ctx_len, tok, unk_logp: float,
                 n_probes: int = _PROBES,
                 axis_name=None, n_slots_global: int = 0):
    """Exact ARPA backoff score, vectorized.

    tables: (keys (order, S), logps (order, S), backoffs (order, S));
    ctx: (..., order-1) int32 — the LAST (order-1) ids, RIGHT-aligned
    (ctx[..., -1] is the most recent), left-padded with junk; ctx_len:
    (...,) int32 — how many trailing entries are valid; tok: (...,) int32
    LM ids (< 0 treated as OOV -> unk penalty).

    Returns log10 P(tok | ctx) following the standard backoff recursion
    (reference semantics: native/ngram_lm.cpp Scorer::score).
    """
    import jax.numpy as jnp

    keys, logps, backoffs = tables
    order = keys.shape[0]
    m_ctx = order - 1
    # Positions: ctx[..., j] valid iff j >= m_ctx - ctx_len.
    pos = np.arange(m_ctx)

    # For each use-length u (number of context ids used, longest first),
    # compute: found_u, logp_u for (ctx[-u:], tok); bo_found_u, bo_u for
    # the context entry ctx[-u:] (order u). Fingerprints are elementwise;
    # the 2*order-1 table probes batch into TWO flattened gathers
    # (_probe_rows) instead of one serializing gather launch each.
    fp_list, bo_fp_list, usable_list = [], [], []
    for u in range(m_ctx, -1, -1):
        # sequence = ctx[-u:] + [tok]; valid only if ctx_len >= u.
        ids = jnp.concatenate(
            [ctx[..., m_ctx - u:], tok[..., None].astype(jnp.int32)], -1)
        fp_list.append(_fingerprint_jnp(ids, jnp.ones(ids.shape, bool)))
        usable_list.append(ctx_len >= u)
        if u >= 1:
            ctx_ids = ctx[..., m_ctx - u:]
            bo_fp_list.append(
                _fingerprint_jnp(ctx_ids, jnp.ones(ctx_ids.shape, bool)))
    lp_rows = list(range(m_ctx, -1, -1))
    f_all, lp_all = _probe_rows(keys, logps, jnp.stack(fp_list, -1),
                                lp_rows, n_probes,
                                axis_name, n_slots_global)
    found_list = [f_all[..., i] & usable_list[i]
                  for i in range(len(lp_rows))]
    logp_list = [lp_all[..., i] for i in range(len(lp_rows))]
    bo_rows = [u - 1 for u in range(m_ctx, 0, -1)]
    bo_list = []
    if bo_rows:
        bf_all, bo_all = _probe_rows(keys, backoffs,
                                     jnp.stack(bo_fp_list, -1),
                                     bo_rows, n_probes,
                                     axis_name, n_slots_global)
        bo_list = [jnp.where(bf_all[..., i] & usable_list[i],
                             bo_all[..., i], 0.0)
                   for i in range(len(bo_rows))]

    # Sequential backoff emulation: first found level (longest) wins; the
    # accumulated backoff is the sum of bo over levels longer than it.
    n_levels = len(found_list)                        # = order
    score = jnp.full(tok.shape, unk_logp)
    taken = jnp.zeros(tok.shape, bool)
    bo_sum = jnp.zeros(tok.shape, jnp.float32)
    for i in range(n_levels):
        hit = found_list[i] & ~taken
        score = jnp.where(hit, bo_sum + logp_list[i], score)
        taken = taken | hit
        if i < len(bo_list):
            bo_sum = bo_sum + jnp.where(taken, 0.0, bo_list[i])
    # total miss: accumulated backoff + unk penalty
    score = jnp.where(taken, score, bo_sum + unk_logp)
    oov = tok < 0
    return jnp.where(oov & ~taken, bo_sum + unk_logp, score)
