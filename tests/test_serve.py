"""TTS HTTP server test over a tiny model: real socket round-trip."""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from cosy_tpu.serve import TTSServer, make_handler, wav_bytes

from test_api import _make_api


@pytest.fixture(scope="module")
def api():
    """One compiled pipeline for the whole module (the server wraps it
    fresh per test): stops ~10 identical pipeline rebuilds, each paying
    full XLA recompilation of the decode/flow/vocoder programs."""
    return _make_api()


def test_wav_bytes_header():
    wav = np.sin(np.linspace(0, 10, 1000)).astype(np.float32)
    blob = wav_bytes(wav, 22050)
    assert blob[:4] == b"RIFF" and blob[8:12] == b"WAVE"
    assert len(blob) == 44 + 2000


def test_http_tts_round_trip(api, monkeypatch):
    # tiny model: remap token ids into the tiny vocab inside the pipeline call
    orig = api.frontend.extract_text_token
    monkeypatch.setattr(api.frontend, "extract_text_token", lambda text: orig(text) % 40)
    # tiny spk dim is 12, so patch the server path's zero embedding
    server = TTSServer(api)

    def synth(text, spk_id="", speed=1.0, stream=False):
        ids = api.frontend.extract_text_token(text)
        zero = np.zeros((1, 12), np.float32)
        gen = api.model.synthesize(api._next_rng(), ids, spk_embedding=zero,
                                   stream=stream, speed=speed)
        for out in gen:
            yield out["tts_speech"][0]

    server.synthesize = synth

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server, 22050))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        # health
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz") as r:
            assert r.read() == b"ok"
        # synthesis
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts",
            data=json.dumps({"text": "hi."}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            body = r.read()
        assert body[:4] == b"RIFF"
        assert len(body) > 44
        # malformed request -> 400
        bad = urllib.request.Request(f"http://127.0.0.1:{port}/tts", data=b"{}")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(bad, timeout=30)
        assert ei.value.code == 400
    finally:
        httpd.shutdown()


def test_concurrent_requests_share_a_batch(api, monkeypatch):
    """Concurrent prompt-free requests within the window run as ONE
    micro-batched decode (llm_decode_batch), not N serial decodes."""
    orig = api.frontend.extract_text_token
    monkeypatch.setattr(api.frontend, "extract_text_token", lambda text: orig(text) % 40)
    server = TTSServer(api, batch_window_ms=300.0, max_batch=8)

    results = {}
    errs = []

    def one(i):
        try:
            results[i] = server.synthesize_batched(f"hello number {i}.")
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=one, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errs, errs
    assert len(results) == 3
    for wav in results.values():
        assert wav.ndim == 1 and wav.size > 0 and np.isfinite(wav).all()
    # all three arrived within the window -> one (or at most two) batches
    assert server.batches_run <= 2, server.batches_run


def test_http_streaming_chunked_response(api, monkeypatch):
    """stream=true returns a chunked WAV whose PCM arrives incrementally."""
    orig = api.frontend.extract_text_token
    monkeypatch.setattr(api.frontend, "extract_text_token", lambda text: orig(text) % 40)
    server = TTSServer(api)

    def synth(text, spk_id="", speed=1.0, stream=False):
        ids = api.frontend.extract_text_token(text)
        zero = np.zeros((1, 12), np.float32)
        gen = api.model.synthesize(api._next_rng(), ids, spk_embedding=zero,
                                   stream=stream, speed=speed)
        for out in gen:
            yield out["tts_speech"][0]

    server.synthesize = synth
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server, 22050))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts",
            data=json.dumps({"text": "hello.", "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=600) as r:
            assert r.headers.get("Transfer-Encoding") == "chunked"
            body = r.read()
        assert body[:4] == b"RIFF" and body[8:12] == b"WAVE"
        assert len(body) > 44  # header + at least one PCM chunk
        assert (len(body) - 44) % 2 == 0  # whole PCM16 samples
    finally:
        httpd.shutdown()


def test_concurrent_streams_share_a_cohort(api, monkeypatch):
    """Two overlapping stream=true requests ride one lock-step segmented
    decode (batches_run == 1) and both receive valid chunked WAV."""
    orig = api.frontend.extract_text_token
    monkeypatch.setattr(api.frontend, "extract_text_token", lambda text: orig(text) % 40)
    server = TTSServer(api, batch_window_ms=1500.0)

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server, 22050))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    results = {}

    def one(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts",
            data=json.dumps({"text": f"hello number {i}.", "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=900) as r:
            results[i] = r.read()

    try:
        threads = [threading.Thread(target=one, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert set(results) == {0, 1}
        for body in results.values():
            assert body[:4] == b"RIFF" and len(body) > 44
            assert (len(body) - 44) % 2 == 0
        assert server.batches_run == 1, server.batches_run
    finally:
        httpd.shutdown()


def test_cohort_error_isolation(api, monkeypatch):
    """A failure after one stream finished must not corrupt that stream:
    the finished client keeps its clean audio; the unfinished one gets the
    error (serve.py _stream_worker per-stream sentinel/err handling)."""
    server = TTSServer(api, batch_window_ms=200.0)

    def fake_stream_batch(rng, ids_list, spks):
        # stream 0 completes, then the cohort generator dies mid-flight
        yield 0, np.zeros((1, 640), np.float32), True
        yield 1, np.zeros((1, 640), np.float32), False
        raise RuntimeError("boom")

    monkeypatch.setattr(api.model, "synthesize_stream_batch", fake_stream_batch, raising=False)
    results = {}

    def one(i):
        try:
            results[i] = list(server.synthesize_stream_batched(f"text {i}"))
        except RuntimeError as e:
            results[i] = e

    threads = [threading.Thread(target=one, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
        assert not t.is_alive(), "client blocked forever"
    done_streams = [r for r in results.values() if isinstance(r, list) and len(r) == 1]
    errored = [r for r in results.values() if isinstance(r, RuntimeError)]
    assert len(done_streams) == 1, results
    assert len(errored) == 1, results


def test_stream_worker_respawns_after_death(api, monkeypatch):
    """A dead worker thread must not strand later streaming clients: the
    enqueue path respawns it (serve.py synthesize_stream_batched), and a
    failure outside the per-cohort handler errors the cohort instead of
    killing the worker silently."""
    server = TTSServer(api, batch_window_ms=50.0)

    def fake_stream_batch(rng, ids_list, spks):
        for b in range(len(ids_list)):
            yield b, np.zeros((1, 640), np.float32), True

    monkeypatch.setattr(api.model, "synthesize_stream_batch", fake_stream_batch, raising=False)
    assert len(list(server.synthesize_stream_batched("first"))) == 1

    # simulate a crashed worker: plant a dead thread object
    dead = threading.Thread(target=lambda: None)
    dead.start()
    dead.join()
    server._stream_thread = dead

    t = threading.Thread(
        target=lambda: list(server.synthesize_stream_batched("second")))
    t.start()
    t.join(timeout=60)
    assert not t.is_alive(), "client stranded behind a dead worker"


def test_http_streaming_via_engine(api, monkeypatch):
    """--engine-slots routes stream=true requests through the continuous-
    batching engine (infer/engine.py): two overlapping requests both receive
    valid chunked WAV from the ONE persistent decode batch, and the cohort
    worker path stays unused."""
    orig = api.frontend.extract_text_token
    monkeypatch.setattr(api.frontend, "extract_text_token", lambda text: orig(text) % 40)
    server = TTSServer(api, engine_slots=2)
    assert server.engine is not None
    # --engine-prefetch plumbing: the kwarg must reach the engine (off by
    # default; ADVICE r4 — the flag was unreachable via the server)
    assert server.engine._prefetch_on is False
    pf_server = TTSServer(api, engine_slots=2, engine_prefetch=True)
    assert pf_server.engine._prefetch_on is True
    pf_server.engine.stop()
    # keep the tiny-model decode bounded (the default 512-token runway is
    # sized for the 300M production model)
    server.engine.max_len = 64

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server, 22050))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    results = {}

    def one(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts",
            data=json.dumps({"text": f"hello number {i}.", "stream": True}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=900) as r:
            assert r.headers.get("Transfer-Encoding") == "chunked"
            results[i] = r.read()

    try:
        threads = [threading.Thread(target=one, args=(i,)) for i in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert set(results) == {0, 1}
        for body in results.values():
            assert body[:4] == b"RIFF" and len(body) > 44
            assert (len(body) - 44) % 2 == 0
        assert server.engine.segments_run >= 1
        assert server.batches_run == 0  # engine, not the cohort worker
    finally:
        httpd.shutdown()
        server.engine.stop()


def test_cohorts_interleave_at_segment_boundaries(api, monkeypatch):
    """A stream arriving mid-cohort gets its first chunk while the first
    cohort is still decoding: cohort threads hold the device lock per
    segment, not per cohort (serve.py _run_stream_cohort)."""
    server = TTSServer(api, batch_window_ms=50.0)
    def fake_stream_batch(rng, ids_list, spks):
        # cohort 0: 10 slow segments (~2 s total); cohort 1: one instant
        # segment.  The per-segment sleep runs inside next(gen) — i.e.
        # while the device lock is held — so with cohort-held locking the
        # second cohort would wait the full ~2 s; with per-segment locking
        # it slips in after at most one segment.
        tag = int(ids_list[0][0, 0])
        n_segments = 10 if tag == 0 else 1
        for seg in range(n_segments):
            if tag == 0:
                time.sleep(0.2)
            for b in range(len(ids_list)):
                yield b, np.zeros((1, 640), np.float32), seg == n_segments - 1

    monkeypatch.setattr(api.model, "synthesize_stream_batch", fake_stream_batch, raising=False)
    monkeypatch.setattr(api.frontend, "normalize", lambda text, split=False: text)  # keep digits
    monkeypatch.setattr(api.frontend, "extract_text_token", lambda text: np.asarray(
        [[int(text), 5, 6]], np.int32))

    results = {}

    def run(i):
        q0 = time.time()
        got_first = None
        for _ in server.synthesize_stream_batched(str(i)):
            if got_first is None:
                got_first = time.time() - q0
        results[i] = got_first

    t0 = threading.Thread(target=run, args=(0,))
    t0.start()
    time.sleep(0.5)                 # cohort 0 is now mid-decode
    t1 = threading.Thread(target=run, args=(1,))
    t1.start()
    t1.join(timeout=30)
    assert not t1.is_alive(), "second cohort blocked behind the first"
    assert results.get(1) is not None
    # the proof of interleaving: cohort 1 finished while cohort 0 (with
    # ~1.5 s of segments left) is still running
    assert t0.is_alive(), "cohort 0 finished first — no interleaving happened"
    t0.join(timeout=30)
    assert not t0.is_alive()
    assert server.batches_run == 2


def test_http_keepalive_framing_and_bad_bodies(api):
    """HTTP/1.1 keep-alive: every plain response (healthz, 404, 400) carries
    Content-Length so a persistent connection can be reused — and malformed
    bodies (non-object JSON, non-numeric speed) return 400, not a dropped
    connection."""
    import http.client

    server = TTSServer(api)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(server, 22050))
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        # two requests over ONE socket: without Content-Length the second
        # request would hang waiting for the first body to end
        conn.request("GET", "/healthz")
        r = conn.getresponse()
        assert r.status == 200 and r.getheader("Content-Length") == "2"
        assert r.read() == b"ok"
        conn.request("GET", "/healthz")
        assert conn.getresponse().read() == b"ok"
        # framed 404
        conn.request("GET", "/nope")
        r = conn.getresponse()
        assert r.status == 404 and r.getheader("Content-Length") is not None
        r.read()
        # non-object JSON body -> 400 (not an unhandled TypeError)
        conn.request("POST", "/tts", body=b"[1, 2]")
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        # non-numeric speed -> 400
        conn.request("POST", "/tts",
                     body=json.dumps({"text": "hi.", "speed": "fast"}).encode())
        r = conn.getresponse()
        assert r.status == 400
        r.read()
        # the connection is still alive and usable
        conn.request("GET", "/healthz")
        assert conn.getresponse().read() == b"ok"
        conn.close()
    finally:
        httpd.shutdown()


def test_synthesize_releases_lock_between_chunks(api, monkeypatch):
    """The solo streaming path must hold the device lock per chunk, not
    across generator yields — one slow client must not freeze the chip for
    cohorts/engine/batched requests."""
    orig = api.frontend.extract_text_token
    monkeypatch.setattr(api.frontend, "extract_text_token", lambda text: orig(text) % 40)
    server = TTSServer(api)
    gen = server.synthesize("hello there friend.", stream=True)
    first = next(gen)
    assert first.size > 0
    # suspended at yield: the device lock must be free for other requests
    assert server.lock.acquire(timeout=30), "device lock held across a yield"
    server.lock.release()
    for _ in gen:
        pass


def test_engine_route_uses_zero_speaker_embedding(api, monkeypatch):
    """--engine-slots streaming must build the same prompt-free prefix as
    every other path: a zero speaker embedding, not a speaker-less
    (instruct-style) prefix."""
    orig = api.frontend.extract_text_token
    monkeypatch.setattr(api.frontend, "extract_text_token", lambda text: orig(text) % 40)
    server = TTSServer(api, engine_slots=2)
    server.engine.max_len = 64
    seen = {}
    real_submit = server.engine.submit

    def spy(rng, ids, spk_embedding=None):
        seen["spk"] = spk_embedding
        return real_submit(rng, ids, spk_embedding)

    server.engine.submit = spy
    try:
        wav = np.concatenate(
            [c for c in server.synthesize_stream_engine("hello.")])
        assert wav.size > 0
        assert seen["spk"] is not None and not seen["spk"].any()
        assert seen["spk"].shape == (1, 12)  # tiny model spk dim
    finally:
        server.engine.stop()
