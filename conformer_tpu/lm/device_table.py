"""Device-resident n-gram LM: hashed probe tables queried inside jit.

Shallow LM fusion inside the on-device beam search needs log P(token | ctx)
lookups per (beam x candidate x frame) — far too many for host callbacks.
This module compiles an ARPA n-gram model (token-level — build one over
grapheme sequences with ``conformer_tpu.lm.ngram.build_arpa``) into
open-addressing hash tables stored as plain device arrays, plus a pure-jnp
backoff scorer that is exact with respect to the ARPA (verified against the
Python scorer in tests/test_device_lm.py).

Layout: one BUCKET pool per n-gram order. A bucket is a PACKED 32-lane row
of ``_BUCKET`` entries laid out PLANE-MAJOR — lanes [0:8) the entry keys
(fingerprints of the id sequence), [8:16) logp f32 bits, [16:24) backoff
f32 bits, [24:32) pad — and a lookup gathers exactly ONE bucket row
(``bucket = fp & mask``, single hash) and compares the ``_BUCKET`` keys
in-vector — no data-dependent control flow, so the beam search can score
(B, W, K) candidates in one fused op. Plane-major matters: every consumer
slices CONTIGUOUS lane ranges of the gathered (..., 32) rows (g[..., 0:8]
== fp), which XLA fuses straight into the gather consumer; the previous
entry-major (key, logp, backoff, pad)x8 interleave forced a 5-D reshape
whose materialized lane shuffle cost MORE than the gather itself
(0.39 vs 0.36 ms/frame at the w190/b56 op point, r4 xplane trace).

Why this shape: gather DESCRIPTORS are the decode-time currency. Inside the
decode frame loop, TPU dynamic gathers serialize at ~7 ns per gathered
slice (descriptor) nearly INDEPENDENT of its width (measured flat through
32 lanes — tools/bench_gather_shapes.py), so the design goal is minimum
descriptors per query, not minimum touched bytes. The scheme lineage, each
halving the dominant term: linear probing with displacement-minimized
windows (r2-r3) -> 2-choice cuckoo, 2 slots/query x separate key/value
arrays = 4+ descriptors (r3) -> packed (key, logp, backoff) slot rows, 2
descriptors (r4) -> single-hash 8-entry buckets, ONE descriptor per query
(r4). Misses are detected in the same round (all 8 keys mismatch); HBM
space is traded away instead (~4x the entry count in slots at the default
load target, irrelevant next to activations) — the miss-detection floor
of one descriptor per query is reached.

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
_BUCKET = 8                    # entries per bucket (one 32-lane row gather)
_LANES = 4                     # uint32 lanes per entry (key, v1, v2, pad)
# Bucket-count sizing: n_buckets = pow2(ceil(entries / _LOAD)) targets a
# mean bucket load of ~_LOAD entries; overflow of an 8-entry bucket at
# Poisson(2) has p ~1e-3, handled by doubling.
_LOAD = 2.0
# Growth is capped: each doubling halves the mean load, so a layout that
# still overflows after this many retries means more than _BUCKET entries
# share one 32-bit fingerprint-derived bucket at every size — duplicate
# keys, which no amount of buckets fixes; unbounded doubling would only
# exhaust memory.
_MAX_GROWTH = 8


def _bucket_layout(hashes, n_buckets: int) -> "list | None":
    """Assign each item a (bucket, lane) position by its hash. hashes: list
    of ints. Returns flat slot indices (bucket * _BUCKET + lane) per item,
    or None if any bucket overflows _BUCKET entries (caller doubles and
    retries). Items must be pre-deduplicated by key."""
    mask = n_buckets - 1
    fill = [0] * n_buckets
    pos = [0] * len(hashes)
    for i, h in enumerate(hashes):
        b = int(h) & mask
        lane = fill[b]
        if lane >= _BUCKET:
            return None
        fill[b] = lane + 1
        pos[i] = b * _BUCKET + lane
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
    bucket row, for the unigram logp level AND for the length-1 context
    backoff. Hash row 0 is left empty (unigrams are dense)."""

    order: int
    n_slots: int                       # BUCKETS per order, power of two
    keys: np.ndarray                   # (order, n_slots * _BUCKET) uint32
    logps: np.ndarray                  # (order, n_slots * _BUCKET) f32
    backoffs: np.ndarray               # (order, n_slots * _BUCKET) f32
    unk_logp: float
    vocab: dict                        # word/token string -> LM id
    bos_id: int
    n_probes: int                      # 1: bucketized single-probe lookup
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
        # Buckets sized for the LARGEST hashed level (the bucket pool is
        # shared across orders): mean load ~_LOAD entries of _BUCKET
        # capacity. `slots_per_entry` is kept for API stability and scales
        # the bucket count relative to the default load target.
        biggest = max([len(t) for t in lm.tables[1:]] or [1])
        n_buckets = 1 << int(np.ceil(np.log2(max(
            biggest * slots_per_entry / _LOAD / 2.0, 8))))
        # Per-order entry lists, deduplicated by fingerprint (first writer
        # wins on a genuine 32-bit collision — same contract as the lookup's
        # at-most-one-hit guarantee). Row 0 stays empty (unigrams are
        # dense).
        rows = [[]]
        for table in lm.tables[1:]:
            seen, items = set(), []
            for ids, (logp, backoff) in table.items():
                fp = _fingerprint_np(ids)
                if int(fp) in seen:
                    continue
                seen.add(int(fp))
                items.append((fp, logp, backoff))
            rows.append(items)
        for attempt in range(_MAX_GROWTH + 1):
            keys = np.zeros((order, n_buckets * _BUCKET), np.uint32)
            logps = np.zeros((order, n_buckets * _BUCKET), np.float32)
            backoffs = np.zeros((order, n_buckets * _BUCKET), np.float32)
            ok = True
            for m, items in enumerate(rows):
                pos = _bucket_layout([int(fp) for fp, _, _ in items],
                                     n_buckets)
                if pos is None:
                    ok = False
                    break
                for (fp, logp, backoff), slot in zip(items, pos):
                    keys[m, slot] = fp
                    logps[m, slot] = logp
                    backoffs[m, slot] = backoff
            if ok:
                break
            n_buckets *= 2
        else:
            raise RuntimeError(
                f"bucket layout failed for {arpa_path} even after "
                f"{_MAX_GROWTH} doublings ({n_buckets} buckets): more than "
                f"{_BUCKET} entries share one fingerprint bucket at every "
                "size (duplicate keys); this ARPA cannot be compiled into "
                "a bucketized device table")
        unk = lm.vocab.get("<unk>")
        unk_logp = (lm.tables[0][(unk,)][0]
                    if unk is not None and (unk,) in lm.tables[0] else -99.0)
        return cls(order=order, n_slots=n_buckets, keys=keys, logps=logps,
                   backoffs=backoffs, unk_logp=float(unk_logp),
                   vocab=dict(lm.vocab), bos_id=lm.vocab.get("<s>", -1),
                   n_probes=1, uni_logps=uni_logps,
                   uni_backoffs=uni_backoffs)

    def device_arrays(self):
        """(packed (order, n_buckets, _BUCKET*4) u32[, uni_logps,
        uni_backoffs]).

        A bucket row holds _BUCKET entries PLANE-MAJOR — keys in lanes
        [0:8), logp bits [8:16), backoff bits [16:24), pad [24:32). ONE
        row gather per query fetches the whole bucket; the _BUCKET key
        compares ride the vector path on contiguous lane slices (no
        reshape — see module docstring). Descriptors are the in-loop
        decode-time currency (~7 ns each, width-independent)."""
        import jax.numpy as jnp

        def planes(a):
            return a.reshape(a.shape[0], self.n_slots, _BUCKET)

        packed = np.concatenate([
            planes(self.keys),
            planes(self.logps.view(np.uint32)),
            planes(self.backoffs.view(np.uint32)),
            np.zeros((self.keys.shape[0], self.n_slots, _BUCKET),
                     np.uint32)], axis=-1)
        out = (jnp.asarray(packed),)
        if self.uni_logps is not None:
            out = out + (jnp.asarray(self.uni_logps),
                         jnp.asarray(self.uni_backoffs))
        return out


# ---------------------------------------------------------------------------
# Word-level fusion: character-rolling-hash word vocabulary.
# ---------------------------------------------------------------------------

def _build_pair_table(items, n_slots: int):
    """Bucketized hash table keyed by (h1, h2) uint32 pairs. items:
    deduplicated (h1, h2, value) triples. Returns (keys1, keys2, ids,
    n_probes=1) with ids -1 = empty; arrays are flat (n_buckets * _BUCKET)
    slot views, bucket = h1 & mask (single hash, both keys verified
    in-vector after ONE bucket-row gather)."""
    if len({(int(h1), int(h2)) for h1, h2, _ in items}) != len(items):
        raise RuntimeError(
            "duplicate (h1, h2) keys collide in both 32-bit hashes; "
            "dedupe before building the pair table")
    n_buckets = max(n_slots // _BUCKET, 8)
    for _ in range(_MAX_GROWTH + 1):
        pos = _bucket_layout([int(h1) for h1, _, _ in items], n_buckets)
        if pos is not None:
            break
        n_buckets *= 2
    else:
        raise RuntimeError(
            f"bucket layout failed even after {_MAX_GROWTH} doublings "
            f"({n_buckets} buckets): more than {_BUCKET} entries share one "
            "h1 bucket at every size")
    keys1 = np.zeros((n_buckets * _BUCKET,), np.uint32)
    keys2 = np.zeros((n_buckets * _BUCKET,), np.uint32)
    ids = np.full((n_buckets * _BUCKET,), -1, np.int32)
    for (h1, h2, val), slot in zip(items, pos):
        keys1[slot], keys2[slot], ids[slot] = h1, h2, val
    return keys1, keys2, ids, 1


def _pack_pair_table(keys1, keys2, ids) -> np.ndarray:
    """(n_buckets, _BUCKET*4) uint32 PLANE-MAJOR bucket rows — key1 in
    lanes [0:8), key2 [8:16), id bits [16:24), pad [24:32): one row gather
    per query, contiguous-lane compares (no reshape). id -1 (empty)
    round-trips through the uint32 view."""
    n_buckets = keys1.shape[0] // _BUCKET
    def planes(a):
        return a.reshape(n_buckets, _BUCKET)
    return np.concatenate([
        planes(keys1), planes(keys2), planes(ids.view(np.uint32)),
        np.zeros((n_buckets, _BUCKET), np.uint32)], axis=-1)


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
    last-k hashes (k = 1..4) and tests membership. Spelling-exact: OOV
    words hash by their characters, not LM ids.

    Hotword lists are SMALL (tens of phrases), so membership is a DENSE
    broadcast compare against all N key pairs on the vector path — zero
    gather descriptors (the in-loop decode-time currency), where the
    hashed table paid 4 spans x probe descriptors per beam per frame.
    """

    keys1: np.ndarray   # (N,) uint32, zero-padded to a power of two
    keys2: np.ndarray   # (N,) uint32
    valid: np.ndarray   # (N,) bool (padding rows are False)

    @classmethod
    def build(cls, hotwords: Sequence[str]) -> "DeviceHotwords":
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
            items.append((fp1, fp2))
        n = 1 << int(np.ceil(np.log2(max(len(items), 8))))
        keys1 = np.zeros((n,), np.uint32)
        keys2 = np.zeros((n,), np.uint32)
        valid = np.zeros((n,), bool)
        for i, (fp1, fp2) in enumerate(items):
            keys1[i], keys2[i], valid[i] = fp1, fp2, True
        return cls(keys1=keys1, keys2=keys2, valid=valid)

    def device_arrays(self):
        import jax.numpy as jnp

        return (jnp.asarray(self.keys1), jnp.asarray(self.keys2),
                jnp.asarray(self.valid))


def hotword_hit(hot_arrays, h1, h2):
    """(...,) bool — does the (h1, h2) phrase fingerprint pair match any
    hotword? Dense broadcast compare over all N phrases (see
    DeviceHotwords): pure vector work, no gathers."""
    k1, k2, valid = hot_arrays
    return ((valid & (k1 == h1[..., None]) & (k2 == h2[..., None]))
            .any(-1))


def lookup_pair(packed, h1, h2):
    """Lookup keyed by (h1, h2) 32-bit pairs -> int value (-1 = miss).

    packed: (n_buckets, _BUCKET*4) uint32 PLANE-MAJOR bucket rows (key1 /
    key2 / id-bits / pad planes of _BUCKET lanes each) from
    _pack_pair_table; entries with id < 0 are empty; both keys must match.
    Bucket = h1 & mask (single hash): ONE gathered bucket row per query —
    gather DESCRIPTORS are the in-loop decode-time currency — with the
    _BUCKET candidate compares on contiguous lane slices, no reshape.

    Exactness: the builder dedupes by (h1, h2), so at most one entry hits
    and the masked sum equals the hit value."""
    import jax
    import jax.numpy as jnp

    mask = np.uint32(packed.shape[0] - 1)
    g = packed[h1 & mask]                               # (..., _BUCKET*4)
    idv = jax.lax.bitcast_convert_type(
        g[..., 2 * _BUCKET:3 * _BUCKET], jnp.int32)
    hit = ((g[..., 0:_BUCKET] == h1[..., None])
           & (g[..., _BUCKET:2 * _BUCKET] == h2[..., None]) & (idv >= 0))
    found = hit.any(-1)
    val = jnp.where(hit, idv, 0).sum(-1)
    return jnp.where(found, val, -1)


def lookup_word_ids(word_arrays, h1, h2):
    """(..., ) rolling hashes -> word LM ids (-1 when not in the LM vocab).

    word_arrays = DeviceWordVocab.device_arrays(); bucketized by h1 with
    both 32-bit keys verified per entry after one bucket-row gather.
    """
    return lookup_pair(word_arrays[1], h1, h2)


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


def _probe_rows(packed, fps, rows,
                axis_name=None, n_slots_global: int = 0):
    """Batched bucketized lookup across table ROWS of a PACKED table: one
    flattened bucket-row gather fetches _BUCKET (key, logp, backoff)
    entries for every query. packed: (order, n_buckets, _BUCKET*4) uint32;
    fps: (..., G) uint32; rows: (G,) host ints — probe g looks up
    fps[..., g] in table row rows[g].
    -> (found (..., G) bool, logp (..., G) f32, backoff (..., G) f32).

    Cost model (the decode frame loop is gather-bound): in-loop gathers
    serialize at ~7 ns per DESCRIPTOR nearly independent of slice width
    (measured flat through 32 lanes, tools/bench_gather_shapes.py), so ONE
    bucket row per query — single hash, _BUCKET in-vector key compares —
    is the miss-detecting floor; the logp and backoff probe levels of
    score_tokens also share one gather instead of re-fetching keys.

    Exactness: the builder dedupes by fingerprint per order, so at most
    one entry hits and the masked sums equal the hit values; empty entries
    hold key 0, which no query fingerprint equals (_fingerprint_np maps
    0 -> 1).

    With ``axis_name`` (inside a shard_map), packed is the LOCAL contiguous
    bucket slice of a table of ``n_slots_global`` buckets sharded over that
    mesh axis: each shard probes only the global buckets it owns (uint32
    wraparound makes the range test one compare) and the partial results
    combine with a psum over ICI. Exact, because at most one shard can hit,
    so the masked-zero partials sum to the unsharded answer. This is the
    "collective exchange of LM state during decode" north star (SURVEY
    §2.10): the LM no longer needs to fit in one chip's HBM.
    """
    import jax
    import jax.numpy as jnp

    rows_u = jnp.asarray(np.asarray(rows, np.uint32))
    lane = packed.shape[-1]
    if axis_name is None:
        s_row = packed.shape[1]
        mask = np.uint32(s_row - 1)
        bucket = fps & mask                                 # (..., G)
        flat = (rows_u * np.uint32(s_row) + bucket).astype(jnp.int32)
        # Flatten every query dim into ONE axis around the gather: the
        # compare/select then reads the gathered (N, B*4) rows in their
        # native layout and writes (N,)-minor outputs. Keeping the (...,
        # G, B) shape instead made XLA emit transposing fusions into
        # (..., G, B)-shaped tiles whose tiny minor dims waste the vector
        # lanes (0.54 ms/frame at w190/b56, r4 trace).
        orig = fps.shape
        g = packed.reshape(-1, lane)[flat.reshape(-1)]      # (N, B*4)
        hit = g[:, 0:_BUCKET] == fps.reshape(-1)[:, None]   # (N, B)
        found = hit.any(-1).reshape(orig)
        lp = jax.lax.bitcast_convert_type(
            g[:, _BUCKET:2 * _BUCKET], jnp.float32)
        bo = jax.lax.bitcast_convert_type(
            g[:, 2 * _BUCKET:3 * _BUCKET], jnp.float32)
        return (found, jnp.where(hit, lp, 0.0).sum(-1).reshape(orig),
                jnp.where(hit, bo, 0.0).sum(-1).reshape(orig))

    s_local = packed.shape[1]
    mask = np.uint32(n_slots_global - 1)
    off = (jax.lax.axis_index(axis_name).astype(jnp.uint32)
           * np.uint32(s_local))
    bucket = fps & mask                                     # (..., G)
    local = bucket - off                                     # uint32 wrap
    in_rng = local < np.uint32(s_local)
    li = jnp.where(in_rng, local, np.uint32(0))
    flat = (rows_u * np.uint32(s_local) + li).astype(jnp.int32)
    orig = fps.shape
    g = packed.reshape(-1, lane)[flat.reshape(-1)]          # (N, B*4)
    hit = (in_rng.reshape(-1)[:, None]
           & (g[:, 0:_BUCKET] == fps.reshape(-1)[:, None]))
    found = hit.any(-1).reshape(orig)
    lp = jax.lax.bitcast_convert_type(
        g[:, _BUCKET:2 * _BUCKET], jnp.float32)
    bo = jax.lax.bitcast_convert_type(
        g[:, 2 * _BUCKET:3 * _BUCKET], jnp.float32)
    found = jax.lax.psum(found.astype(jnp.int32), axis_name) > 0
    lp_out = jax.lax.psum(
        jnp.where(hit, lp, 0.0).sum(-1).reshape(orig), axis_name)
    bo_out = jax.lax.psum(
        jnp.where(hit, bo, 0.0).sum(-1).reshape(orig), axis_name)
    return found, lp_out, bo_out


def score_tokens(tables, ctx, ctx_len, tok, unk_logp: float,
                 axis_name=None, n_slots_global: int = 0,
                 dense_pre=None):
    """Exact ARPA backoff score, vectorized.

    tables: (packed (order, n_buckets, _BUCKET*4)[, uni_logps,
    uni_backoffs]) from DeviceNgramTable.device_arrays();
    ctx: (..., order-1) int32 — the LAST (order-1) ids, RIGHT-aligned
    (ctx[..., -1] is the most recent), left-padded with junk; ctx_len:
    (...,) int32 — how many trailing entries are valid; tok: (...,) int32
    LM ids (< 0 treated as OOV -> unk penalty).

    Returns log10 P(tok | ctx) following the standard backoff recursion
    (reference semantics: native/ngram_lm.cpp Scorer::score).

    ``dense_pre``: optional (uni_logp_tok, uni_bo_last) precomputed by the
    caller — uni_logps gathered at tok (junk where tok is OOV; gated here
    by the found flag) and uni_backoffs at ctx[-1] ALREADY ZEROED for an
    invalid last id (the beam search carries it across frames, set at word
    completion from the same (V, 2) row gather that fetched the word's
    logp — one in-loop descriptor set instead of two).
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
    # direct id-indexed gather of ONE element replaces a bucket-row
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
            lp_rows + bo_rows, axis_name, n_slots_global)
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
        if dense_pre is not None:
            logp_list.append(dense_pre[0])
        else:
            logp_list.append(uni_logps[jnp.clip(tok, 0, v_lm - 1)])
        usable_list.append(jnp.ones_like(tok_ok))
        if m_ctx >= 1:
            # Length-1 context backoff: dense by the context's last id.
            if dense_pre is not None:
                bo_list.append(jnp.where(ctx_len >= 1, dense_pre[1], 0.0))
            else:
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
