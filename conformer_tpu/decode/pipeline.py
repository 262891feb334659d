"""Inference pipeline: checkpoint -> batched transcription (greedy or beam+LM).

Working replacement for the reference's broken infer path
(reference: infer.py:48,138,152,191 — calls nonexistent ``lm.decode_batch``,
references undefined ``device``; SURVEY §2) and the distributed eval driver
(reference: test.py:53-174).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Sequence, Tuple

import jax
import numpy as np

from conformer_tpu.config import Config
from conformer_tpu.data.dataset import Batch, BucketedLoader, ManifestDataset
from conformer_tpu.text.metrics import cer, wer
from conformer_tpu.text.tokenizer import GraphemeTokenizer
from conformer_tpu.train.checkpoint import CheckpointManager
from conformer_tpu.train.state import TrainState, make_optimizer
from conformer_tpu.train.steps import init_variables, make_eval_step


def _gather_pairs_across_hosts(refs: List[str], hyps: List[str]
                               ) -> Tuple[List[str], List[str]]:
    """Concatenate (ref, hyp) lists from every host process.

    Replaces the reference's ``all_gather_object`` + interleave-reorder dance
    (reference: test.py:31-51): because each host reads a disjoint manifest
    stripe (not DistributedSampler round-robin), plain concatenation in
    process order is already correct for corpus-level WER/CER.
    """
    if jax.process_count() == 1:
        return refs, hyps
    import json as _json

    from jax.experimental import multihost_utils

    payload = _json.dumps([refs, hyps]).encode("utf8")
    data = np.frombuffer(payload, np.uint8)
    # Pad to a common size and allgather bytes.
    size = np.array([len(data)], np.int32)
    sizes = multihost_utils.process_allgather(size).reshape(-1)
    buf = np.zeros((int(sizes.max()),), np.uint8)
    buf[: len(data)] = data
    gathered = multihost_utils.process_allgather(buf)
    all_refs: List[str] = []
    all_hyps: List[str] = []
    for i in range(jax.process_count()):
        raw = bytes(gathered[i][: int(sizes[i])])
        r, h = _json.loads(raw.decode("utf8"))
        all_refs.extend(r)
        all_hyps.extend(h)
    return all_refs, all_hyps


def resolve_beam_backend(n_devices: Optional[int] = None, mesh=None,
                         streaming: bool = False) -> str:
    """Pick the beam-search backend for decode='beam_auto'.

    Measured tradeoff (docs/PERFORMANCE.md, re-measured every round): as of
    round 4 the on-device search wins everywhere an accelerator is present —
    0.000849 vs 0.002435 RTF same-session at the reference operating point
    (width 190 + word 5-gram LM, batch 56, one XLA program; the r3-r4 probe
    narrowing, single-probe bucketized LM tables and gather-free survivor
    selection flipped the round-2 6x host advantage into a 2.9x device win).
    It is also the only correct choice when logits are sharded (GSPMD TP/DP
    decode) or on multi-chip, where fetching (B, T, V) log-probs to the host
    serializes the pipeline. The threaded host C++ prefix beam remains the
    backend for CPU-only deployments, where the dense static-shape device
    beam has no accelerator to run on.

    ``streaming`` encodes the OPPOSITE batch-1 tradeoff (docs/
    PERFORMANCE.md "Streaming"): per-chunk device beam programs are
    launch-latency-bound at batch 1, so the host C++ beam wins same-session
    (0.196 vs 0.289 RTF at w32) — EXCEPT under an active mesh, where chunk
    logits are sharded and must stay on-chip (fetching them serializes every
    chunk), making the shard_mapped device beam the only sound choice.
    """
    if mesh is None:
        mesh = jax.sharding.get_abstract_mesh()
    mesh_active = mesh is not None and not getattr(mesh, "empty", True)
    if streaming:
        return "beam_device" if mesh_active else "beam"
    n = len(jax.devices()) if n_devices is None else n_devices
    on_accel = jax.default_backend() != "cpu"
    return "beam_device" if (mesh_active or n > 1 or on_accel) else "beam"


def _device_lm_kwargs(cfg: Config, tokenizer: GraphemeTokenizer,
                      word_fallback: bool = False) -> dict:
    """Kwargs for on-device LM fusion (HBM-resident hashed tables,
    lm/device_table.py).

    cfg.decode.device_lm_path (a token-level ARPA) selects token-level
    fusion. Otherwise, with ``word_fallback`` (the CTC beam_device path),
    cfg.decode.lm_path — the host decoder's WORD-level ARPA, the reference
    operating point (reference: processing/lm.py:10-15) — is compiled into
    word-level device fusion: rolling character hashes complete words at
    delimiter emissions (ops/beam_search_device.py). Empty when no LM is
    configured."""
    import numpy as _np

    from conformer_tpu.lm.device_table import DeviceNgramTable

    common = dict(
        lm_alpha=float(cfg.decode.alpha),
        lm_beta=float(cfg.decode.beta),
        delim_id=tokenizer.delim_id)
    if cfg.decode.device_lm_path:
        table = DeviceNgramTable.from_arpa(cfg.decode.device_lm_path)
        tok2lm = _np.array(
            [table.vocab.get(tok_str, -1)
             for tok_str in tokenizer.vocab], _np.int32)
        return dict(
            common,
            lm_tables=table.device_arrays(),
            tok2lm=jax.numpy.asarray(tok2lm),
            lm_bos_id=int(table.bos_id),
            lm_unk_logp=float(table.unk_logp),
            lm_order=int(table.order))
    if word_fallback and cfg.decode.lm_path:
        from conformer_tpu.lm.device_table import (DeviceHotwords,
                                                   DeviceWordVocab)

        table = DeviceNgramTable.from_arpa(cfg.decode.lm_path)
        wv = DeviceWordVocab.build(tokenizer.vocab, table.vocab)
        kwargs = dict(
            common,
            lm_tables=table.device_arrays(),
            word_arrays=wv.device_arrays(),
            lm_bos_id=int(table.bos_id),
            lm_unk_logp=float(table.unk_logp),
            lm_order=int(table.order))
        if cfg.decode.hotwords and cfg.decode.hotword_weight:
            hot = DeviceHotwords.build(cfg.decode.hotwords)
            kwargs.update(hot_arrays=hot.device_arrays(),
                          hot_weight=float(cfg.decode.hotword_weight))
        return kwargs
    return {}


class InferencePipeline:
    """Restores a checkpoint and transcribes batches.

    CTC (cfg.model.arch='ctc'): decode='greedy' uses the on-device collapse;
    decode='beam' uses the host CTC beam search with optional word-level
    n-gram LM shallow fusion (conformer_tpu.decode.beam_search);
    decode='beam_device' runs the prefix beam search entirely on-device with
    optional LM fusion (conformer_tpu.ops.beam_search_device): token-level
    from cfg.decode.device_lm_path, else word-level from cfg.decode.lm_path
    (the host decoder's ARPA — hotword boosting remains host-only).

    Transducer (cfg.model.arch='transducer'): decode='greedy' runs the
    frame-synchronous greedy decode; decode='beam' or 'beam_device' both run
    the on-device RNN-T beam search (ops/rnnt.py::rnnt_beam_search) with
    LM fusion as above: token-level from cfg.decode.device_lm_path, else
    word-level (+hotwords) from cfg.decode.lm_path.
    """

    def __init__(self, cfg: Config, tokenizer: GraphemeTokenizer,
                 checkpoint_dir: Optional[str] = None,
                 decode: str = "greedy"):
        if decode == "beam_auto":
            decode = resolve_beam_backend()
            print(f"[infer] beam_auto -> {decode}")
        cfg = cfg.override(**{"model.vocab_size": tokenizer.vocab_size})
        self.cfg = cfg
        self.tok = tokenizer
        self.decode = decode
        arch = getattr(cfg.model, "arch", "ctc")

        tx = make_optimizer(cfg.optim)
        variables = init_variables(cfg, jax.random.PRNGKey(0))
        state = TrainState.create(variables["params"],
                                  variables.get("batch_stats", {}), tx)
        ckpt_dir = checkpoint_dir or cfg.train.checkpoint_dir
        mgr = CheckpointManager(ckpt_dir, keep=cfg.train.keep_checkpoints)
        if mgr.latest_step() is not None:
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
            state, _ = mgr.restore(abstract)
            print(f"[infer] restored step {int(jax.device_get(state.step))} "
                  f"from {ckpt_dir}")
        else:
            print(f"[infer] WARNING: no checkpoint in {ckpt_dir}; random weights")
        self.state = jax.device_put(state)

        self._beam = None
        self._device_beam = None
        if arch == "transducer":
            if decode in ("beam", "beam_device"):
                from conformer_tpu.train.steps import make_transducer_eval_step

                self.eval_step = make_transducer_eval_step(
                    cfg, decode="beam", unk_id=tokenizer.unk_id,
                    lm_kwargs=_device_lm_kwargs(cfg, tokenizer,
                                                word_fallback=True))
            else:
                self.eval_step = make_eval_step(cfg, unk_id=tokenizer.unk_id)
            return
        self.eval_step = make_eval_step(cfg, unk_id=tokenizer.unk_id)

        if decode == "beam":
            from conformer_tpu.decode.beam_search import BeamSearchDecoder

            self._beam = BeamSearchDecoder(tokenizer, cfg.decode)
        if decode == "beam_device":
            import functools

            from conformer_tpu.ops.beam_search_device import (
                ctc_beam_search_device, ctc_beam_search_device_sharded)

            lm_kwargs = _device_lm_kwargs(cfg, tokenizer, word_fallback=True)

            # Honors cfg.decode.beam_width exactly (the reference op point is
            # 190, processing/lm.py:12); widths are static shapes, memory is
            # O(B * width * max_tokens) device ints — tiny next to the model.
            # Under an active mesh the search is shard_mapped: batch over the
            # data axis, LM tables sharded over the model axis with
            # psum-combined probes (ops/beam_search_device.py).
            del ctc_beam_search_device  # sharded wrapper falls back itself
            self._device_beam = jax.jit(functools.partial(
                ctc_beam_search_device_sharded,
                beam_width=cfg.decode.beam_width,
                top_k=cfg.decode.device_top_k,
                blank_id=tokenizer.pad_id, unk_id=tokenizer.unk_id,
                max_len=cfg.data.max_tokens,
                scan_unroll=cfg.decode.device_scan_unroll, **lm_kwargs))

    # ------------------------------------------------------------------
    def texts_from_out(self, out: dict) -> List[str]:
        """Eval-step output -> transcripts, dispatching on the decode mode
        chosen at construction ('greedy' | 'beam' | 'beam_device')."""
        if self._device_beam is not None:
            prefixes, plens, _ = self._device_beam(out["log_probs"],
                                                   out["lengths"])
            prefixes = np.asarray(jax.device_get(prefixes))
            plens = np.asarray(jax.device_get(plens))
            # strip: a top beam may legitimately end in a delimiter (the
            # host renders those with no trailing space, beam_search.py).
            return [self.tok.spec_decode(self.tok.collapsed_ids_to_text(
                        prefixes[i, 0], int(plens[i, 0]))).strip()
                    for i in range(prefixes.shape[0])]
        if self._beam is not None:
            log_probs = np.asarray(jax.device_get(out["log_probs"]))
            lengths = np.asarray(jax.device_get(out["lengths"]))
            return self._beam.decode_batch(log_probs, lengths)
        tokens = np.asarray(jax.device_get(out["tokens"]))
        counts = np.asarray(jax.device_get(out["counts"]))
        return [self.tok.collapsed_ids_to_text(tokens[i], counts[i])
                for i in range(len(counts))]

    def transcribe_batch(self, batch: Batch) -> List[str]:
        args = jax.device_put((batch.audio, batch.audio_lengths,
                               batch.tokens, batch.token_lengths))
        out = self.eval_step(self.state, *args)
        return self.texts_from_out(out)

    def transcribe_files(self, paths: Sequence[str],
                         batch_size: int = 8,
                         channel: Optional[int] = None,
                         segments: Optional[Sequence[Tuple[float, float]]] = None
                         ) -> List[str]:
        """Transcribe audio files.

        `channel` selects one channel of stereo recordings and `segments`
        gives optional (start_s, end_s) spans per path — the reference's
        call-recording workflow (reference: dataset.py:14-45, infer.py:18-52)
        including its one-file audio cache (dataset.py:38).
        """
        from conformer_tpu.audio.io import load_audio, split_segment

        sr = self.cfg.audio.sample_rate
        cache: dict = {}

        def load(idx: int) -> np.ndarray:
            path = paths[idx]
            if path not in cache:
                cache.clear()  # one-file cache like the reference (dataset.py:38)
                cache[path] = load_audio(path, sr, channel=channel)
            sig = cache[path]
            if segments is not None:
                start, end = segments[idx]
                sig = split_segment(sig, start, end, sr)
            return sig

        results: List[str] = []
        for i in range(0, len(paths), batch_size):
            chunk = list(range(i, min(i + batch_size, len(paths))))
            signals = [load(j) for j in chunk]
            size = max(max(len(s) for s in signals), self.cfg.audio.hop_length)
            audio = np.zeros((len(chunk), size), np.float32)
            lengths = np.zeros((len(chunk),), np.int32)
            for j, s in enumerate(signals):
                audio[j, : len(s)] = s
                lengths[j] = len(s)
            tokens = np.zeros((len(chunk), 1), np.int32)
            tlens = np.zeros((len(chunk),), np.int32)
            results.extend(self.transcribe_batch(
                Batch(audio, lengths, tokens, tlens)))
        return results

    def transcribe_long(self, path: str, chunk_s: float = 24.0,
                        overlap_s: float = 2.0,
                        channel: Optional[int] = None) -> str:
        """Transcribe arbitrarily long audio by overlapping chunks.

        Chunks of `chunk_s` seconds advance by `chunk_s - overlap_s`; each
        chunk's transcript is trimmed at word boundaries inside the overlap
        halves so the stitched text has no duplicated or truncated words.
        New capability (the reference bounds utterances only by GPU memory,
        SURVEY §5 long-context).
        """
        from conformer_tpu.audio.io import load_audio

        sr = self.cfg.audio.sample_rate
        signal = load_audio(path, sr, channel=channel)
        chunk = int(chunk_s * sr)
        if len(signal) <= chunk:
            return self.transcribe_files([path], channel=channel)[0]
        hop = chunk - int(overlap_s * sr)
        starts = list(range(0, max(len(signal) - int(overlap_s * sr), 1), hop))

        pieces: List[str] = []
        for ci in range(0, len(starts), 8):
            batch_starts = starts[ci: ci + 8]
            audio = np.zeros((len(batch_starts), chunk), np.float32)
            lengths = np.zeros((len(batch_starts),), np.int32)
            for j, s0 in enumerate(batch_starts):
                seg = signal[s0: s0 + chunk]
                audio[j, : len(seg)] = seg
                lengths[j] = len(seg)
            texts = self.transcribe_batch(
                Batch(audio, lengths, np.zeros((len(batch_starts), 1), np.int32),
                      np.zeros((len(batch_starts),), np.int32)))
            pieces.extend(texts)

        # Stitch: drop the leading word-fragment of every chunk after the
        # first and the trailing fragment of every chunk before the last
        # (they fall inside the overlap and are covered by the neighbor).
        stitched: List[str] = []
        for i, text in enumerate(pieces):
            words = text.split()
            if i > 0 and words:
                words = words[1:]
            if i < len(pieces) - 1 and words:
                words = words[:-1]
            stitched.extend(words)
        return " ".join(stitched)

    # ------------------------------------------------------------------
    def evaluate(self, manifest: str, batch_size: Optional[int] = None
                 ) -> Tuple[dict, List[Tuple[str, str]]]:
        """-> (metrics {wer, cer, loss}, [(ref, hyp), ...]).

        Corpus WER/CER x100 like the reference eval
        (reference: test.py:160-165).
        """
        ds = ManifestDataset(manifest, self.cfg.audio.sample_rate,
                             num_examples=self.cfg.data.num_examples)
        data_cfg = self.cfg.data
        loader = BucketedLoader(ds, self.tok, data_cfg,
                                shard_index=jax.process_index(),
                                shard_count=jax.process_count(),
                                training=False,
                                batch_size=batch_size or data_cfg.batch_size)
        refs, hyps, losses = [], [], []
        for batch in loader.epoch(0):
            args = jax.device_put((batch.audio, batch.audio_lengths,
                                   batch.tokens, batch.token_lengths))
            out = self.eval_step(self.state, *args)
            losses.append(float(jax.device_get(out["loss"])))
            texts = self.texts_from_out(out)
            for i, ref_text in enumerate(batch.texts or []):
                if not ref_text:
                    continue
                refs.append(self.tok.clean_text(ref_text.upper()))
                hyps.append(texts[i])
        refs, hyps = _gather_pairs_across_hosts(refs, hyps)
        metrics = {
            "loss": float(np.mean(losses)) if losses else float("nan"),
            "wer": wer(hyps, refs) * 100 if refs else float("nan"),
            "cer": cer(hyps, refs) * 100 if refs else float("nan"),
        }
        return metrics, list(zip(refs, hyps))
