"""Serving micro-batching: concurrent requests must ride shared batches
(fixed shapes per bucket), and the HTTP surface must report them."""

import io
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from conformer_tpu.cli.serve import MicroBatcher, make_handler
from conformer_tpu.config import Config

SR = 16000


class FakePipe:
    """Stands in for InferencePipeline: records batch shapes, simulates a
    fixed per-batch device cost (so batching visibly wins)."""

    def __init__(self, cost_s=0.05):
        self.cost_s = cost_s
        self.batches = []

    def transcribe_batch(self, batch):
        real = int((batch.audio_lengths > 1).sum())
        self.batches.append((batch.audio.shape, real))
        time.sleep(self.cost_s)
        return [f"UTT{i}" if batch.audio_lengths[i] > 1 else ""
                for i in range(batch.audio.shape[0])]


def _signal(seconds=1.0, value=0.1):
    return np.full(int(seconds * SR), value, np.float32)


class TestMicroBatcher:
    def test_concurrent_requests_share_batches(self):
        pipe = FakePipe()
        mb = MicroBatcher(pipe, [2 * SR, 4 * SR], max_batch=4, window_ms=150)
        results = [None] * 6

        def client(i):
            results[i] = mb.submit(_signal(1.0))

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(6)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert all(r is not None and r.startswith("UTT") for r in results)
        assert mb.stats["requests"] == 6
        assert mb.stats["batches"] < 6          # batching engaged
        assert mb.stats["batched_requests"] >= 2
        assert mb.stats["max_batch_seen"] >= 2
        # every dispatched batch used a static ladder shape: the smallest
        # power-of-two rung that fits the real requests, audio at the bucket
        for shape, real in pipe.batches:
            assert shape[1] == 2 * SR
            assert shape[0] == mb.size_for(real)

    def test_mixed_buckets_do_not_mix_shapes(self):
        pipe = FakePipe(cost_s=0.01)
        mb = MicroBatcher(pipe, [2 * SR, 4 * SR], max_batch=4, window_ms=100)
        results = {}

        def client(name, seconds):
            results[name] = mb.submit(_signal(seconds))

        threads = [threading.Thread(target=client, args=(f"s{i}", 1.0))
                   for i in range(2)]
        threads += [threading.Thread(target=client, args=(f"l{i}", 3.0))
                    for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert len(results) == 4
        audio_shapes = {s[1] for s, _ in pipe.batches}
        assert audio_shapes == {2 * SR, 4 * SR}  # both buckets served
        assert all(s[0] in mb.sizes for s, _ in pipe.batches)

    def test_adaptive_batch_sizes(self):
        # A lone request must ride the smallest ladder rung, not max_batch.
        pipe = FakePipe(cost_s=0.0)
        mb = MicroBatcher(pipe, [SR], max_batch=8, window_ms=1)
        assert mb.sizes == [1, 2, 4, 8]
        assert mb.submit(_signal(0.5)) == "UTT0"
        assert pipe.batches[-1][0] == (1, SR)
        assert mb.stats["batch_size_hist"]["1"] == 1

        # adaptive off: always max_batch (the round-1 behavior)
        pipe2 = FakePipe(cost_s=0.0)
        mb2 = MicroBatcher(pipe2, [SR], max_batch=8, window_ms=1,
                           adaptive=False)
        assert mb2.submit(_signal(0.5)) == "UTT0"
        assert pipe2.batches[-1][0] == (8, SR)

    def test_warmup_compiles_ladder_ends(self):
        pipe = FakePipe(cost_s=0.0)
        mb = MicroBatcher(pipe, [SR, 2 * SR], max_batch=8, window_ms=1)
        mb.warmup()
        shapes = {s for s, _ in pipe.batches}
        assert shapes == {(1, SR), (8, SR), (1, 2 * SR), (8, 2 * SR)}
        pipe.batches.clear()
        mb.warmup(all_sizes=True)
        assert {s[0] for s, _ in pipe.batches} == {1, 2, 4, 8}

    def test_worker_error_propagates(self):
        class BoomPipe:
            def transcribe_batch(self, batch):
                raise ValueError("device on fire")

        mb = MicroBatcher(BoomPipe(), [SR], max_batch=2, window_ms=5)
        with pytest.raises(RuntimeError, match="device on fire"):
            mb.submit(_signal(0.5))


class FakeTranscriber:
    """Stands in for StreamingTranscriber: upper-cases sample counts."""

    built = 0

    def __init__(self):
        FakeTranscriber.built += 1
        self.reset()

    def reset(self):
        self._chunks = []
        self.resets = getattr(self, "resets", 0) + 1

    def feed(self, audio):
        self._chunks.append(len(audio))
        return f"<{len(audio)}>"

    def finish(self):
        self._chunks.append(0)
        return ""

    @property
    def text(self):
        return "|".join(str(c) for c in self._chunks)


class TestStreamSessions:
    def _sessions(self, **kw):
        from conformer_tpu.cli.serve import StreamSessions

        return StreamSessions(FakeTranscriber, **kw)

    def test_lifecycle_and_pooling(self):
        ss = self._sessions()
        before = FakeTranscriber.built
        sid = ss.start()
        assert ss.feed(sid, np.zeros(100, np.float32)) == "<100>"
        assert ss.feed(sid, np.zeros(50, np.float32)) == "<50>"
        assert ss.text(sid) == "100|50"
        assert ss.finish(sid) == "100|50|0"
        with pytest.raises(KeyError):
            ss.feed(sid, np.zeros(10, np.float32))
        # The transcriber went back to the pool reset; a new session reuses
        # it instead of building (= re-tracing) a fresh one.
        sid2 = ss.start()
        assert FakeTranscriber.built == before + 1
        assert ss.text(sid2) == ""

    def test_ttl_reaps_idle_sessions(self):
        ss = self._sessions(ttl_s=0.01)
        sid = ss.start()
        time.sleep(0.05)
        with pytest.raises(KeyError):
            ss.feed(sid, np.zeros(10, np.float32))
        assert ss.stats["stream_reaped"] == 1

    def test_session_cap(self):
        ss = self._sessions(max_sessions=2)
        ss.start(), ss.start()
        with pytest.raises(RuntimeError, match="too many"):
            ss.start()

    def test_http_stream_roundtrip(self):
        from http.server import ThreadingHTTPServer

        from conformer_tpu.cli.serve import make_handler

        pipe = FakePipe(cost_s=0.0)
        mb = MicroBatcher(pipe, [2 * SR], max_batch=2, window_ms=1)
        handler = make_handler(mb, Config(), self._sessions())
        server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        base = f"http://127.0.0.1:{port}"
        try:
            def post(path, data=b"", headers=None):
                req = urllib.request.Request(base + path, data=data,
                                             headers=headers or {})
                with urllib.request.urlopen(req, timeout=10) as r:
                    return json.loads(r.read())

            sid = post("/stream/start")["session"]
            pcm = (np.ones(400) * 16384).astype("<i2").tobytes()
            delta = post(f"/stream/{sid}", pcm,
                         {"Content-Type": "audio/l16"})["text_delta"]
            assert delta == "<400>"
            f32 = np.ones(200, "<f4").tobytes()
            assert post(f"/stream/{sid}", f32,
                        {"Content-Type": "audio/f32"})["text_delta"] == "<200>"
            with urllib.request.urlopen(f"{base}/stream/{sid}/text",
                                        timeout=10) as r:
                assert json.loads(r.read())["text"] == "400|200"
            assert post(f"/stream/{sid}/finish")["text"] == "400|200|0"
            with urllib.request.urlopen(f"{base}/stats", timeout=10) as r:
                stats = json.loads(r.read())
            assert stats["stream_sessions"] == 1
            assert stats["stream_chunks"] == 2
        finally:
            server.shutdown()


class TestHTTPServer:
    def test_end_to_end_concurrent_clients(self):
        from http.server import ThreadingHTTPServer
        from scipy.io import wavfile

        pipe = FakePipe()
        mb = MicroBatcher(pipe, [2 * SR], max_batch=4, window_ms=150)
        handler = make_handler(mb, Config())
        server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            buf = io.BytesIO()
            wavfile.write(buf, SR, (np.ones(SR) * 1000).astype(np.int16))
            raw = buf.getvalue()

            codes, bodies = [None] * 5, [None] * 5

            def client(i):
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/transcribe", data=raw)
                with urllib.request.urlopen(req, timeout=30) as r:
                    codes[i] = r.status
                    bodies[i] = json.loads(r.read())

            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(5)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            assert codes == [200] * 5
            assert all(b["text"].startswith("UTT") for b in bodies)

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=10) as r:
                stats = json.loads(r.read())
            assert stats["requests"] == 5
            assert stats["batches"] < 5          # batching engaged over HTTP
        finally:
            server.shutdown()

    def test_flac_upload(self):
        """The /transcribe payload sniffer accepts FLAC bodies (parity with
        load_audio's format routing — audio/io.py:decode_audio_bytes)."""
        from http.server import ThreadingHTTPServer

        from conformer_tpu.audio.flac import encode_flac_bytes

        pipe = FakePipe()
        mb = MicroBatcher(pipe, [2 * SR], max_batch=2, window_ms=50)
        handler = make_handler(mb, Config())
        server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            ints = (np.ones(SR) * 1000).astype(np.int64)
            raw = encode_flac_bytes(ints, SR)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/transcribe", data=raw)
            with urllib.request.urlopen(req, timeout=30) as r:
                assert r.status == 200
                assert json.loads(r.read())["text"].startswith("UTT")
        finally:
            server.shutdown()


class TestRouter:
    """Cross-host routing front (make_router_handler): round-robin
    /transcribe with failover, session-pinned /stream/*, aggregated stats.
    Backends are real in-process servers over FakePipe/FakeTranscriber —
    the router sees only HTTP, exactly as across hosts."""

    def _backend(self):
        from http.server import ThreadingHTTPServer

        from conformer_tpu.cli.serve import StreamSessions

        pipe = FakePipe(cost_s=0.0)
        mb = MicroBatcher(pipe, [2 * SR], max_batch=2, window_ms=5)
        sessions = StreamSessions(FakeTranscriber)
        server = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_handler(mb, Config(), sessions))
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server, pipe

    def _router(self, backend_servers, **kw):
        from http.server import ThreadingHTTPServer

        from conformer_tpu.cli.serve import make_router_handler

        urls = [f"http://127.0.0.1:{s.server_address[1]}"
                for s in backend_servers]
        router = ThreadingHTTPServer(
            ("127.0.0.1", 0), make_router_handler(urls, **kw))
        threading.Thread(target=router.serve_forever, daemon=True).start()
        return router, f"http://127.0.0.1:{router.server_address[1]}"

    def _wav_bytes(self):
        from scipy.io import wavfile

        buf = io.BytesIO()
        wavfile.write(buf, SR, (np.ones(SR) * 1000).astype(np.int16))
        return buf.getvalue()

    def _post(self, url, data=b"", headers=None):
        req = urllib.request.Request(url, data=data,
                                     headers=headers or {})
        with urllib.request.urlopen(req, timeout=15) as r:
            return r.status, json.loads(r.read())

    def test_round_robin_and_stats(self):
        b1, p1 = self._backend()
        b2, p2 = self._backend()
        router, base = self._router([b1, b2])
        try:
            raw = self._wav_bytes()
            for _ in range(6):
                code, payload = self._post(f"{base}/transcribe", raw)
                assert code == 200 and payload["text"].startswith("UTT")
            n1 = sum(real for _, real in p1.batches)
            n2 = sum(real for _, real in p2.batches)
            assert n1 == 3 and n2 == 3, (n1, n2)  # strict round-robin
            with urllib.request.urlopen(f"{base}/stats", timeout=15) as r:
                stats = json.loads(r.read())
            assert stats["router"]["routed"] == 6
            assert len(stats["backends"]) == 2
            assert sum(b["requests"] for b in stats["backends"]) == 6
            with urllib.request.urlopen(f"{base}/healthz", timeout=15) as r:
                assert json.loads(r.read())["backends_up"] == 2
        finally:
            router.shutdown(); b1.shutdown(); b2.shutdown()

    def test_stream_session_affinity(self):
        b1, _ = self._backend()
        b2, _ = self._backend()
        router, base = self._router([b1, b2])
        try:
            sids = [self._post(f"{base}/stream/start")[1]["session"]
                    for _ in range(2)]
            # Round-robin start: one session per backend.
            assert {s.split("-")[0] for s in sids} == {"b0", "b1"}
            for sid in sids:
                pcm = (np.ones(400) * 1000).astype("<i2").tobytes()
                code, payload = self._post(
                    f"{base}/stream/{sid}", pcm,
                    {"Content-Type": "audio/l16"})
                assert code == 200 and payload["text_delta"] == "<400>"
            # Feed the SAME session again: must reach the same transcriber
            # (text accumulates), proving affinity through the prefix.
            sid = sids[0]
            pcm = (np.ones(200) * 1000).astype("<i2").tobytes()
            self._post(f"{base}/stream/{sid}", pcm,
                       {"Content-Type": "audio/l16"})
            with urllib.request.urlopen(f"{base}/stream/{sid}/text",
                                        timeout=15) as r:
                assert json.loads(r.read())["text"] == "400|200"
            code, payload = self._post(f"{base}/stream/{sid}/finish")
            assert payload["text"] == "400|200|0"
        finally:
            router.shutdown(); b1.shutdown(); b2.shutdown()

    def test_failover_and_cooldown(self):
        b1, _ = self._backend()
        b2, p2 = self._backend()
        router, base = self._router([b1, b2], cooldown_s=30.0,
                                    timeout_s=2.0)
        try:
            # Kill one backend (close the listening socket too, so forwards
            # fail fast instead of hanging in the dead accept queue).
            b1.shutdown()
            b1.server_close()
            raw = self._wav_bytes()
            for _ in range(4):
                code, payload = self._post(f"{base}/transcribe", raw)
                assert code == 200 and payload["text"].startswith("UTT")
            assert sum(real for _, real in p2.batches) == 4
            with urllib.request.urlopen(f"{base}/healthz", timeout=15) as r:
                health = json.loads(r.read())
            assert health["backends_up"] == 1  # b1 cooled down after failure
        finally:
            router.shutdown(); b2.shutdown()

    def test_unroutable_session_404(self):
        b1, _ = self._backend()
        router, base = self._router([b1])
        try:
            req = urllib.request.Request(f"{base}/stream/nonsense/text")
            try:
                urllib.request.urlopen(req, timeout=15)
                assert False, "expected 404"
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            router.shutdown(); b1.shutdown()

    def test_backend_http_errors_relayed_not_treated_as_outage(self):
        """A 4xx/5xx RESPONSE from a live backend must be relayed verbatim
        and must NOT cool the backend down (r5 review finding: one bad
        upload used to mark every backend down and 502 all clients for
        cooldown_s)."""
        b1, _ = self._backend()
        router, base = self._router([b1], cooldown_s=60.0)
        try:
            # Garbage body -> backend replies 500; router must relay it.
            try:
                self._post(f"{base}/transcribe", b"not audio at all")
                assert False, "expected HTTPError"
            except urllib.error.HTTPError as e:
                assert e.code == 500
                assert "error" in json.loads(e.read())
            # Expired/unknown session -> backend 404 relayed, not 502.
            try:
                self._post(f"{base}/stream/b0-nonsense/finish")
                assert False, "expected HTTPError"
            except urllib.error.HTTPError as e:
                assert e.code == 404
            # The backend must still be healthy: a valid request succeeds.
            code, payload = self._post(f"{base}/transcribe", self._wav_bytes())
            assert code == 200 and payload["text"].startswith("UTT")
            with urllib.request.urlopen(f"{base}/healthz", timeout=15) as r:
                assert json.loads(r.read())["backends_up"] == 1
        finally:
            router.shutdown(); b1.shutdown()
