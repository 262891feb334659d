"""Device-resident n-gram LM: hashed probe tables queried inside jit.

Shallow LM fusion inside the on-device beam search needs log P(token | ctx)
lookups per (beam x candidate x frame) — far too many for host callbacks.
This module compiles an ARPA n-gram model (token-level — build one over
grapheme sequences with ``conformer_tpu.lm.ngram.build_arpa``) into
open-addressing hash tables stored as plain device arrays, plus a pure-jnp
backoff scorer that is exact with respect to the ARPA (verified against the
Python scorer in tests/test_device_lm.py).

Layout: one slot pool per n-gram order. Each slot is a PACKED row of four
uint32 lanes — (key: fingerprint of the id sequence, logp: f32 bits,
backoff: f32 bits, pad) — and lookup gathers exactly TWO cuckoo choice ROWS
per query — no data-dependent control flow, so the beam search can score
(B, W, K) candidates in one fused op. Two slots is the information-theoretic
floor for a hash table that must detect misses with one-round gathers, and
gather DESCRIPTORS are the decode-time currency: inside the decode frame
loop, TPU dynamic gathers serialize at ~6.6 ns per gathered slice
(descriptor) nearly independent of its width (a 17-wide row gather in the
same loop runs at ~3.2 ns/row), so packing (key, logp, backoff) into one
contiguous row — instead of the separate key/value arrays of rounds 2-3,
which paid one descriptor EACH — halves the dominant gather term again
(ops/beam_search_device.py). Linear probing (the round-2 scheme) needed a
probe WINDOW covering the max insertion displacement — ≥4 at any realistic
load factor, and irreducible by growth at real LM sizes (reaching max
displacement <2 by growth alone needs O(entries^1.5) slots) — so cuckoo
halves the choice-slot term outright.

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
_PROBES = 2                    # cuckoo: every key sits in one of two slots
# Cuckoo eviction chains longer than this trigger a table doubling. 128
# kicks at load factor <=0.5 fails with vanishing probability; growth is
# the fallback.
_MAX_KICKS = 128
# Growth is capped: each doubling halves the load factor, so a layout that
# still fails after this many retries means the keys collide in BOTH 32-bit
# hash choices (duplicate fingerprint pairs) — no amount of slots fixes
# that, and unbounded doubling would only exhaust memory.
_MAX_GROWTH = 8


def _mix_np(fp: np.uint32) -> np.uint32:
    """Second cuckoo choice: a full-avalanche uint32 mix (murmur3 finalizer)
    of the fingerprint. Must match _mix_jnp bit-for-bit."""
    h = int(fp) & 0xFFFFFFFF
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return np.uint32(h)


def _mix_jnp(fp):
    """Device twin of _mix_np (elementwise on uint32 arrays)."""
    h = fp ^ (fp >> 16)
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> 13)
    h = h * np.uint32(0xC2B2AE35)
    return h ^ (h >> 16)


def _cuckoo_layout(choices) -> "list | None":
    """Assign each item a slot from its (s1, s2) choice pair via cuckoo
    eviction. choices: list of (int, int). Returns slot per item, or None
    if an eviction chain exceeds _MAX_KICKS (caller doubles and retries).
    Items must be pre-deduplicated by key."""
    owner = {}                     # slot -> item index
    pos = [None] * len(choices)
    for i, (s1, _) in enumerate(choices):
        cur, slot = i, s1
        for _ in range(_MAX_KICKS):
            prev = owner.get(slot)
            if prev is not None:
                p1, p2 = choices[prev]
                if p1 == p2:
                    # Degenerate occupant (both choices equal): it is pinned
                    # to this slot — evicting it would ping-pong forever.
                    # Redirect `cur` to its own alternate choice instead.
                    a1, a2 = choices[cur]
                    alt = a2 if slot == a1 else a1
                    if alt == slot:
                        # Two degenerate items share one slot: unsatisfiable
                        # at this mask; only growth can separate them.
                        return None
                    slot = alt
                    continue
            owner[slot] = cur
            pos[cur] = slot
            if prev is None:
                break
            cur = prev
            # The evicted item moves to its OTHER choice (it occupied
            # `slot`, which equals one of its choices).
            slot = p2 if slot == p1 else p1
        else:
            return None
    return pos


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
    """Per-order hash tables as host numpy (device_put once, reuse).

    Unigrams live in DENSE arrays indexed by LM id instead of the hash
    rows: every ARPA vocabulary word has a unigram entry, so the key check
    is just ``id >= 0`` and the lookup gathers ONE element instead of a
    2-slot cuckoo probe of (key, value) pairs — 4 gathered elements -> 1
    for the unigram logp level AND for the length-1 context backoff, and
    gathered elements are the device decode-time currency (~6.6 ns each on
    the serializing scalar core). Hash row 0 is left empty."""

    order: int
    n_slots: int                       # per order, power of two
    keys: np.ndarray                   # (order, n_slots) uint32
    logps: np.ndarray                  # (order, n_slots) f32 (log10)
    backoffs: np.ndarray               # (order, n_slots) f32 (log10)
    unk_logp: float
    vocab: dict                        # word/token string -> LM id
    bos_id: int
    n_probes: int                      # always 2 (cuckoo choice slots)
    uni_logps: np.ndarray = None       # (V_lm,) f32 dense unigram logp
    uni_backoffs: np.ndarray = None    # (V_lm,) f32 dense unigram backoff

    @classmethod
    def from_arpa(cls, arpa_path: str, slots_per_entry: float = 2.0
                  ) -> "DeviceNgramTable":
        from conformer_tpu.lm.ngram import PyNgramLM

        lm = PyNgramLM(arpa_path)
        order = lm.order
        # Dense unigram arrays (see class docstring). Ids are contiguous
        # [0, V); entries missing a backoff store 0.0, matching a hash miss.
        v_lm = max(lm.vocab.values(), default=-1) + 1
        uni_logps = np.full((max(v_lm, 1),), -99.0, np.float32)
        uni_backoffs = np.zeros((max(v_lm, 1),), np.float32)
        for ids, (logp, backoff) in lm.tables[0].items():
            if 0 <= ids[0] < v_lm:
                uni_logps[ids[0]] = logp
                uni_backoffs[ids[0]] = backoff
        total = max(sum(len(t) for t in lm.tables[1:]), 1)
        n_slots = 1 << int(np.ceil(np.log2(max(total * slots_per_entry, 64))))
        # Per-order entry lists, deduplicated by fingerprint (first writer
        # wins on a genuine 32-bit collision — same contract as the lookup's
        # at-most-one-slot guarantee). Row 0 stays empty (unigrams are
        # dense).
        rows = [[]]
        for table in lm.tables[1:]:
            seen, items = set(), []
            for ids, (logp, backoff) in table.items():
                fp = _fingerprint_np(ids)
                if int(fp) in seen:
                    continue
                seen.add(int(fp))
                items.append((fp, _mix_np(fp), logp, backoff))
            rows.append(items)
        for attempt in range(_MAX_GROWTH + 1):
            keys = np.zeros((order, n_slots), np.uint32)
            logps = np.zeros((order, n_slots), np.float32)
            backoffs = np.zeros((order, n_slots), np.float32)
            mask = n_slots - 1
            ok = True
            for m, items in enumerate(rows):
                pos = _cuckoo_layout(
                    [(int(fp) & mask, int(fp2) & mask)
                     for fp, fp2, _, _ in items])
                if pos is None:
                    ok = False
                    break
                for (fp, _, logp, backoff), slot in zip(items, pos):
                    keys[m, slot] = fp
                    logps[m, slot] = logp
                    backoffs[m, slot] = backoff
            if ok:
                break
            n_slots *= 2
        else:
            raise RuntimeError(
                f"cuckoo layout failed for {arpa_path} even after "
                f"{_MAX_GROWTH} doublings ({n_slots} slots): the entries "
                "collide in both 32-bit hash choices; this ARPA cannot be "
                "compiled into a 2-choice device table")
        unk = lm.vocab.get("<unk>")
        unk_logp = (lm.tables[0][(unk,)][0]
                    if unk is not None and (unk,) in lm.tables[0] else -99.0)
        return cls(order=order, n_slots=n_slots, keys=keys, logps=logps,
                   backoffs=backoffs, unk_logp=float(unk_logp),
                   vocab=dict(lm.vocab), bos_id=lm.vocab.get("<s>", -1),
                   n_probes=_PROBES, uni_logps=uni_logps,
                   uni_backoffs=uni_backoffs)

    def device_arrays(self):
        """(packed (order, S, 4) uint32[, uni_logps, uni_backoffs]).

        Packed row lanes: (key, logp bits, backoff bits, pad). One row
        gather per probed slot fetches key AND both values — one gather
        descriptor where the round-2/3 separate key/value arrays paid two
        to four (descriptors are the in-loop decode-time currency, ~6.6 ns
        each on the serializing scalar path; see module docstring)."""
        import jax.numpy as jnp

        packed = np.zeros(self.keys.shape + (4,), np.uint32)
        packed[..., 0] = self.keys
        packed[..., 1] = self.logps.view(np.uint32)
        packed[..., 2] = self.backoffs.view(np.uint32)
        out = (jnp.asarray(packed),)
        if self.uni_logps is not None:
            out = out + (jnp.asarray(self.uni_logps),
                         jnp.asarray(self.uni_backoffs))
        return out


# ---------------------------------------------------------------------------
# Word-level fusion: character-rolling-hash word vocabulary.
# ---------------------------------------------------------------------------

def _build_pair_table(items, n_slots: int):
    """Hash table keyed by (h1, h2) uint32 pairs. items: deduplicated
    (h1, h2, value) triples. Returns (keys1, keys2, ids, n_probes) with
    ids -1 = empty.

    Tries DIRECT placement first (every item at h1 & mask, collision-free
    → lookups gather ONE slot), growing up to 2 doublings — small tables
    (hotword sets, toy vocabularies) usually fit, and one gathered element
    beats two. Falls back to cuckoo (choices h1 & mask / h2 & mask, two
    gathered slots), doubling until the layout succeeds."""
    for _ in range(3):
        mask = n_slots - 1
        slots = [int(h1) & mask for h1, _, _ in items]
        if len(set(slots)) == len(slots):
            pos, n_probes = slots, 1
            break
        n_slots *= 2
    else:
        n_slots = max(n_slots >> 3, 64)  # cuckoo packs tighter; reset
        for _ in range(_MAX_GROWTH + 1):
            mask = n_slots - 1
            pos = _cuckoo_layout(
                [(int(h1) & mask, int(h2) & mask) for h1, h2, _ in items])
            if pos is not None:
                break
            n_slots *= 2
        else:
            raise RuntimeError(
                f"cuckoo layout failed even after {_MAX_GROWTH} doublings "
                f"({n_slots} slots): entries collide in both 32-bit hashes")
        n_probes = 2
    keys1 = np.zeros((n_slots,), np.uint32)
    keys2 = np.zeros((n_slots,), np.uint32)
    ids = np.full((n_slots,), -1, np.int32)
    for (h1, h2, val), slot in zip(items, pos):
        keys1[slot], keys2[slot], ids[slot] = h1, h2, val
    return keys1, keys2, ids, n_probes


def _pack_pair_table(keys1, keys2, ids) -> np.ndarray:
    """(S, 4) uint32 rows (key1, key2, id bits, pad): one row gather per
    probed slot instead of three single-element gathers (key1/key2/id).
    id -1 (empty) round-trips through the uint32 view."""
    packed = np.zeros((keys1.shape[0], 4), np.uint32)
    packed[:, 0] = keys1
    packed[:, 1] = keys2
    packed[:, 2] = ids.view(np.uint32)
    return packed


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
        seen, items = set(), []
        for w, wid in words:
            h1 = _poly_hash_np(w, _POLY1)
            h2 = _poly_hash_np(w, _POLY2)
            if (int(h1), int(h2)) in seen:
                continue  # duplicate spelling: first writer wins
            seen.add((int(h1), int(h2)))
            items.append((h1, h2, wid))
        n_slots = 1 << int(np.ceil(np.log2(
            max(len(items) * slots_per_entry, 64))))
        keys1, keys2, ids, n_probes = _build_pair_table(items, n_slots)
        return cls(tok_a1=tok_a1, tok_b1=tok_b1, tok_a2=tok_a2,
                   tok_b2=tok_b2, keys1=keys1, keys2=keys2, ids=ids,
                   n_probes=n_probes)

    def device_arrays(self):
        """(tok_pack (V, 4) uint32, packed (S, 4) uint32).

        tok_pack rows are (a1, b1, a2, b2) — the affine fold constants of
        token id c for both rolling hashes — so the beam search's per-frame
        constant fetch is ONE row gather instead of four single-element
        gathers (in-loop descriptors are the decode-time currency)."""
        import jax.numpy as jnp

        tok_pack = np.stack(
            [self.tok_a1, self.tok_b1, self.tok_a2, self.tok_b2], axis=1)
        return (jnp.asarray(tok_pack),
                jnp.asarray(_pack_pair_table(self.keys1, self.keys2,
                                             self.ids)))


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
        seen, items = set(), []
        for ws in phrases:
            fp1 = _fold_word_seq_np([_poly_hash_np(w, _POLY1) for w in ws])
            fp2 = _fold_word_seq_np([_poly_hash_np(w, _POLY2) for w in ws])
            if (int(fp1), int(fp2)) in seen:
                continue
            seen.add((int(fp1), int(fp2)))
            items.append((fp1, fp2, 1))
        n_slots = 1 << int(np.ceil(np.log2(
            max(len(items) * slots_per_entry, 16))))
        keys1, keys2, ids, n_probes = _build_pair_table(items, n_slots)
        return cls(keys1=keys1, keys2=keys2, ids=ids, n_probes=n_probes)

    def device_arrays(self):
        """Packed (S, 4) uint32 pair-table rows (lookup_pair operand)."""
        import jax.numpy as jnp

        return jnp.asarray(_pack_pair_table(self.keys1, self.keys2,
                                            self.ids))


def lookup_pair(packed, h1, h2, n_probes: int = _PROBES):
    """Lookup keyed by (h1, h2) 32-bit pairs -> int value (-1 = miss).

    packed: (S, 4) uint32 rows (key1, key2, id bits, pad) from
    _pack_pair_table; slots with id < 0 are empty; both keys must match.
    `n_probes` is the table's static scheme (_build_pair_table): 1 = direct
    placement (ONE gathered row per query), 2 = cuckoo (the key occupies at
    most one of its two choice slots h1 & mask / h2 & mask). Gather
    DESCRIPTORS are the in-loop decode-time currency — one row fetch per
    probed slot replaces the three single-element gathers (key1/key2/id)
    of the unpacked layout."""
    import jax
    import jax.numpy as jnp

    mask = np.uint32(packed.shape[0] - 1)
    s1 = h1 & mask
    if n_probes == 1:
        g = packed[s1]                                          # (..., 4)
        idv = jax.lax.bitcast_convert_type(g[..., 2], jnp.int32)
        hit = (g[..., 0] == h1) & (g[..., 1] == h2) & (idv >= 0)
        return jnp.where(hit, idv, -1)
    s2 = h2 & mask
    slots = jnp.stack([s1, s2], axis=-1)                        # (..., 2)
    g = packed[slots]                                           # (..., 2, 4)
    idv = jax.lax.bitcast_convert_type(g[..., 2], jnp.int32)
    hit = ((g[..., 0] == h1[..., None])
           & (g[..., 1] == h2[..., None]) & (idv >= 0))
    # Degenerate pair (both choices are the same slot): count it once.
    hit = hit & jnp.stack([jnp.ones_like(s1, bool), s2 != s1], axis=-1)
    found = hit.any(-1)
    val = jnp.where(hit, idv, 0).sum(-1)
    return jnp.where(found, val, -1)


def lookup_word_ids(word_arrays, h1, h2, n_probes: int = _PROBES):
    """(..., ) rolling hashes -> word LM ids (-1 when not in the LM vocab).

    word_arrays = DeviceWordVocab.device_arrays(); cuckoo choices keyed by
    (h1, h2) with both 32-bit keys verified per slot.
    """
    return lookup_pair(word_arrays[1], h1, h2, n_probes)


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


def _choice_slots(fp, mask):
    """(..., 2) cuckoo choice slots for fingerprint keys, plus the
    double-count guard for the degenerate same-slot case (applied to the
    second probe's hit). Must match the builders' choice computation."""
    import jax.numpy as jnp

    s1 = fp & mask
    s2 = _mix_jnp(fp) & mask
    slots = jnp.stack([s1, s2], axis=-1)
    guard = jnp.stack([jnp.ones_like(s1, bool), s2 != s1], axis=-1)
    return slots, guard


def _probe_rows(packed, fps, rows, n_probes: int = _PROBES,
                axis_name=None, n_slots_global: int = 0):
    """Batched cuckoo lookup across table ROWS of a PACKED table: one
    flattened row gather fetches (key, logp, backoff) for every probed
    slot. packed: (order, S, 4) uint32 rows (key, logp bits, backoff bits,
    pad); fps: (..., G) uint32; rows: (G,) host ints — probe g looks up
    fps[..., g] in table row rows[g].
    -> (found (..., G) bool, logp (..., G) f32, backoff (..., G) f32).

    Cost model (the decode frame loop is gather-bound): in-loop gathers
    serialize at ~6.6 ns per DESCRIPTOR nearly independent of slice width,
    so one (1, 4)-row fetch per choice slot is half the descriptors of the
    round-2/3 separate key/value arrays — and the logp and backoff probes
    of score_tokens share the same gather instead of re-fetching keys.

    Exactness: insertion stores a fingerprint in AT MOST one of its two
    choice slots (first writer wins on collision), so at most one probe
    hits and the masked sums equal the hit values.

    With ``axis_name`` (inside a shard_map), packed is the LOCAL contiguous
    slot slice of a table of ``n_slots_global`` slots sharded over that
    mesh axis: each shard probes only the global slots it owns (uint32
    wraparound makes the range test one compare) and the partial results
    combine with a psum over ICI. Exact, because at most one shard can hit,
    so the masked-zero partials sum to the unsharded answer. This is the
    "collective exchange of LM state during decode" north star (SURVEY
    §2.10): the LM no longer needs to fit in one chip's HBM.
    """
    import jax
    import jax.numpy as jnp

    assert n_probes == _PROBES, (
        f"the device n-gram tables are cuckoo ({_PROBES} choice slots); "
        f"got n_probes={n_probes} — pass DeviceNgramTable.n_probes")
    rows_u = jnp.asarray(np.asarray(rows, np.uint32))
    if axis_name is None:
        s_row = packed.shape[1]
        mask = np.uint32(s_row - 1)
        slots, guard = _choice_slots(fps, mask)             # (..., G, 2)
        flat = (rows_u[:, None] * np.uint32(s_row) + slots).astype(jnp.int32)
        g = packed.reshape(-1, packed.shape[-1])[flat]      # (..., G, 2, 4)
        hit = guard & (g[..., 0] == fps[..., None])
        found = hit.any(-1)
        lp = jax.lax.bitcast_convert_type(g[..., 1], jnp.float32)
        bo = jax.lax.bitcast_convert_type(g[..., 2], jnp.float32)
        return (found, jnp.where(hit, lp, 0.0).sum(-1),
                jnp.where(hit, bo, 0.0).sum(-1))

    s_local = packed.shape[1]
    mask = np.uint32(n_slots_global - 1)
    off = (jax.lax.axis_index(axis_name).astype(jnp.uint32)
           * np.uint32(s_local))
    slots, guard = _choice_slots(fps, mask)                 # (..., G, 2)
    local = slots - off                                      # uint32 wrap
    in_rng = local < np.uint32(s_local)
    li = jnp.where(in_rng, local, np.uint32(0))
    flat = (rows_u[:, None] * np.uint32(s_local) + li).astype(jnp.int32)
    g = packed.reshape(-1, packed.shape[-1])[flat]          # (..., G, 2, 4)
    hit = guard & in_rng & (g[..., 0] == fps[..., None])
    found = hit.any(-1)
    lp = jax.lax.bitcast_convert_type(g[..., 1], jnp.float32)
    bo = jax.lax.bitcast_convert_type(g[..., 2], jnp.float32)
    found = jax.lax.psum(found.astype(jnp.int32), axis_name) > 0
    lp_out = jax.lax.psum(jnp.where(hit, lp, 0.0).sum(-1), axis_name)
    bo_out = jax.lax.psum(jnp.where(hit, bo, 0.0).sum(-1), axis_name)
    return found, lp_out, bo_out


def score_tokens(tables, ctx, ctx_len, tok, unk_logp: float,
                 n_probes: int = _PROBES,
                 axis_name=None, n_slots_global: int = 0):
    """Exact ARPA backoff score, vectorized.

    tables: (packed (order, S, 4)[, uni_logps, uni_backoffs]) from
    DeviceNgramTable.device_arrays();
    ctx: (..., order-1) int32 — the LAST (order-1) ids, RIGHT-aligned
    (ctx[..., -1] is the most recent), left-padded with junk; ctx_len:
    (...,) int32 — how many trailing entries are valid; tok: (...,) int32
    LM ids (< 0 treated as OOV -> unk penalty).

    Returns log10 P(tok | ctx) following the standard backoff recursion
    (reference semantics: native/ngram_lm.cpp Scorer::score).
    """
    import jax.numpy as jnp

    packed = tables[0]
    dense = len(tables) >= 3           # (..., uni_logps, uni_backoffs)
    order = packed.shape[0]
    m_ctx = order - 1

    # For each use-length u (number of context ids used, longest first),
    # compute: found_u, logp_u for (ctx[-u:], tok); bo_found_u, bo_u for
    # the context entry ctx[-u:] (order u). Fingerprints are elementwise;
    # ALL hashed probes (logp and backoff levels) batch into ONE flattened
    # packed-row gather (_probe_rows) — each probed slot's row carries key,
    # logp and backoff together. The unigram level (u == 0) and the
    # length-1 context backoff are DENSE when the table provides them: a
    # direct id-indexed gather of ONE element replaces a 2-row cuckoo
    # probe — exact, because every ARPA vocab word has a unigram entry
    # (id >= 0 IS the key check).
    fp_list, bo_fp_list, usable_list = [], [], []
    lp_rows = []
    bo_rows = []
    u_min = 1 if dense else 0
    for u in range(m_ctx, u_min - 1, -1):
        # sequence = ctx[-u:] + [tok]; valid only if ctx_len >= u.
        ids = jnp.concatenate(
            [ctx[..., m_ctx - u:], tok[..., None].astype(jnp.int32)], -1)
        fp_list.append(_fingerprint_jnp(ids, jnp.ones(ids.shape, bool)))
        usable_list.append(ctx_len >= u)
        lp_rows.append(u)
        if u >= 1 + u_min:
            ctx_ids = ctx[..., m_ctx - u:]
            bo_fp_list.append(
                _fingerprint_jnp(ctx_ids, jnp.ones(ctx_ids.shape, bool)))
            bo_rows.append(u - 1)
    found_list, logp_list, bo_list = [], [], []
    if lp_rows or bo_rows:
        n_lp = len(lp_rows)
        f_all, lp_all, bo_all = _probe_rows(
            packed, jnp.stack(fp_list + bo_fp_list, -1),
            lp_rows + bo_rows, n_probes, axis_name, n_slots_global)
        found_list = [f_all[..., i] & usable_list[i] for i in range(n_lp)]
        logp_list = [lp_all[..., i] for i in range(n_lp)]
        # Backoff fingerprint j was appended in iteration j (the bo
        # condition holds for a prefix of the u loop), so its usable gate
        # is usable_list[j].
        bo_list = [jnp.where(f_all[..., n_lp + j] & usable_list[j],
                             bo_all[..., n_lp + j], 0.0)
                   for j in range(len(bo_rows))]
    if dense:
        uni_logps, uni_backoffs = tables[1], tables[2]
        v_lm = uni_logps.shape[0]
        tok_ok = (tok >= 0) & (tok < v_lm)
        found_list.append(tok_ok)      # usable: ctx_len >= 0 always holds
        logp_list.append(uni_logps[jnp.clip(tok, 0, v_lm - 1)])
        usable_list.append(jnp.ones_like(tok_ok))
        if m_ctx >= 1:
            # Length-1 context backoff: dense by the context's last id.
            last = ctx[..., -1]
            ok = (ctx_len >= 1) & (last >= 0) & (last < v_lm)
            bo_list.append(jnp.where(
                ok, uni_backoffs[jnp.clip(last, 0, v_lm - 1)], 0.0))

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
