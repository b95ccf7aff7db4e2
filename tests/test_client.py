"""TTSClient against a live server over a real socket."""

import threading
from http.server import ThreadingHTTPServer

import numpy as np
import pytest

from cosy_tpu.client import TTSClient
from cosy_tpu.serve import TTSServer, make_handler

from test_api import _make_api


@pytest.mark.slow  # full client->server->pipeline e2e (~3 min on this
# 1-core box); the HTTP handler itself is covered by test_serve in the
# default tier, and healthz below keeps the client module smoke-checked
def test_client_round_trip_and_stream():
    api = _make_api()
    orig = api.frontend.extract_text_token
    api.frontend.extract_text_token = lambda text: orig(text) % 40
    server = TTSServer(api)

    def synth(text, spk_id="", speed=1.0, stream=False, voice=""):
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
        c = TTSClient(f"http://127.0.0.1:{port}", timeout=300)
        assert c.healthz()

        # non-streaming: float32 audio in [-1, 1] at the server rate
        wav, sr = c.tts("hi.", speed=1.1)
        assert sr == 22050
        assert wav.dtype == np.float32 and wav.size > 0
        assert np.abs(wav).max() <= 1.0

        # streaming: chunks concatenate to a same-length utterance (the
        # tiny model is deterministic given the API's rng sequence only in
        # token count; compare lengths structurally)
        chunks = list(c.tts_stream("hi."))
        assert chunks and all(ch.dtype == np.float32 for ch in chunks)
        assert c.last_sample_rate == 22050
        total = int(sum(ch.size for ch in chunks))
        assert total > 0

        # stats reflect both requests
        s = c.stats()
        assert sum(s["requests"].values()) == 2
    finally:
        httpd.shutdown()


def test_client_healthz_down():
    c = TTSClient("http://127.0.0.1:9")  # discard port: nothing listens
    assert c.healthz() is False
