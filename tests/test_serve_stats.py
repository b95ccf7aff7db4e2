"""Serving observability: /stats and /metrics over a real socket.

Exceeds-parity subsystem: the reference logs only per-chunk RTF to stdout
(cosyvoice/cli/cosyvoice.py:86-89); the server exposes route counters, RTF/
TTFA percentiles, queue depths, and error counts as JSON and Prometheus
text."""

import json
import threading
import time
import urllib.request
from http.server import ThreadingHTTPServer

import numpy as np

from cosy_tpu.serve import TTSServer, make_handler

from test_api import _make_api


import pytest


@pytest.fixture(scope="module")
def api():
    """One compiled pipeline for the whole module (see test_serve.py)."""
    return _make_api()


def _wait_for(pred, timeout=10.0):
    """Request accounting runs in the handler's finally block AFTER the
    client sees the response complete (serve.py do_POST), so an immediate
    stats poll can lose that benign race by microseconds — monitoring
    counters are eventually consistent.  Poll briefly instead of asserting
    the instantaneous view."""
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.02)
    return False


def _spin_up(server, sample_rate=22050):
    httpd = ThreadingHTTPServer(("127.0.0.1", 0),
                                make_handler(server, sample_rate))
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd, port


def test_stats_and_metrics_round_trip(monkeypatch, api):
    orig = api.frontend.extract_text_token
    monkeypatch.setattr(api.frontend, "extract_text_token", lambda text: orig(text) % 40)
    server = TTSServer(api)

    def synth(text, spk_id="", speed=1.0, stream=False, voice=""):
        ids = api.frontend.extract_text_token(text)
        zero = np.zeros((1, 12), np.float32)
        gen = api.model.synthesize(api._next_rng(), ids, spk_embedding=zero,
                                   stream=stream, speed=speed)
        for out in gen:
            yield out["tts_speech"][0]

    server.synthesize = synth
    # force the solo route (the tiny-topology batch path needs its own
    # embedding patching; routing is not what this test is about)
    if hasattr(api.model, "synthesize_batch"):
        monkeypatch.delattr(type(api.model), "synthesize_batch")

    httpd, port = _spin_up(server)
    try:
        # fresh server: empty stats
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
            s0 = json.loads(r.read())
        assert s0["requests"] == {} and s0["active_requests"] == 0

        # one ok request + one client error
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts",
            data=json.dumps({"text": "hi.", "speed": 1.1}).encode())
        with urllib.request.urlopen(req, timeout=300) as r:
            body = r.read()
        assert body[:4] == b"RIFF"
        try:
            urllib.request.urlopen(urllib.request.Request(
                f"http://127.0.0.1:{port}/tts", data=b"{}"), timeout=30)
        except urllib.error.HTTPError as e:
            assert e.code == 400

        def _stats():
            with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats") as r:
                return json.loads(r.read())

        assert _wait_for(lambda: _stats()["requests"].get("bad_request") == 1)
        s = _stats()
        assert s["requests"].get("solo") == 1
        assert s["requests"].get("bad_request") == 1
        assert s["errors"].get("bad_request") == 1
        assert "solo" not in s["errors"]
        assert s["audio_seconds"] > 0
        assert s["rtf"]["p50"] is not None and s["rtf"]["window"] == 1
        assert s["active_requests"] == 0

        # prometheus text exposition carries the same counters
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            text = r.read().decode()
        assert 'cosy_tpu_requests_total{route="solo"} 1' in text
        assert 'cosy_tpu_errors_total{route="bad_request"} 1' in text
        assert "cosy_tpu_rtf{quantile=" in text
        assert "cosy_tpu_audio_seconds_total" in text
    finally:
        httpd.shutdown()


def test_synthesis_failure_attributed_to_real_route(monkeypatch, api):
    """An exception AFTER route selection must count against that route in
    /stats, not against bad_request (operators would chase phantom
    malformed-client problems otherwise)."""
    import urllib.error
    import http.client

    server = TTSServer(api)

    def boom(text, spk_id="", speed=1.0, stream=False, voice=""):
        raise ValueError("synthesis exploded")
        yield  # pragma: no cover — make it a generator

    server.synthesize = boom
    if hasattr(api.model, "synthesize_batch"):
        monkeypatch.delattr(type(api.model), "synthesize_batch")

    httpd, port = _spin_up(server)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts",
            data=json.dumps({"text": "hi."}).encode())
        try:
            urllib.request.urlopen(req, timeout=60)
        except (urllib.error.URLError, http.client.HTTPException, OSError):
            pass  # handler dies mid-response; the stats are the point
        assert _wait_for(lambda: server.stats()["errors"].get("solo") == 1)
        s = server.stats()
        assert s["errors"].get("solo") == 1, s
        assert "bad_request" not in s["errors"], s
    finally:
        httpd.shutdown()


def test_streaming_records_ttfa(monkeypatch, api):
    orig = api.frontend.extract_text_token
    monkeypatch.setattr(api.frontend, "extract_text_token", lambda text: orig(text) % 40)
    server = TTSServer(api)

    def synth(text, spk_id="", speed=1.0, stream=False, voice=""):
        ids = api.frontend.extract_text_token(text)
        zero = np.zeros((1, 12), np.float32)
        gen = api.model.synthesize(api._next_rng(), ids, spk_embedding=zero,
                                   stream=stream, speed=speed)
        for out in gen:
            yield out["tts_speech"][0]

    server.synthesize = synth

    httpd, port = _spin_up(server)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/tts",
            data=json.dumps({"text": "hello there.", "stream": True}).encode())
        with urllib.request.urlopen(req, timeout=300) as r:
            assert len(r.read()) > 44
        assert _wait_for(
            lambda: server.stats()["requests"].get("stream_cohort") == 1)
        s = server.stats()
        assert s["requests"].get("stream_cohort") == 1
        assert s["ttfa_s"]["p50"] is not None and s["ttfa_s"]["p50"] > 0
    finally:
        httpd.shutdown()
