"""Minimal production TTS serving: HTTP endpoint over the TTS pipeline.

The reference's high-throughput serving story is its vLLM plugin
(cosyvoice/vllm/cosyvoice2.py) — GPU-library glue with no TPU analogue.  The
TPU-native equivalent is this server: jitted decode/flow/vocoder stages with
length-bucketed compilation reuse, request queueing, and streaming chunk
responses.

    python -m cosy_tpu.serve --model-dir pretrained_models/CosyVoice-300M --port 8080

POST /tts  {"text": "...", "speed": 1.0, "stream": false}
    -> audio/wav (complete) or chunked WAV stream
GET /healthz
GET /stats    -> JSON serving statistics (requests/route, RTF percentiles,
                 queue depths, errors) — the server-side superset of the
                 reference's per-chunk RTF logging (cli/cosyvoice.py:86-89)
GET /metrics  -> the same counters in Prometheus text exposition format

SIGTERM/SIGINT drain gracefully: the listener closes, in-flight requests
finish (bounded by --drain-timeout), then the process exits.
"""

from __future__ import annotations

import argparse
import collections
import io
import json
import struct
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


def wav_bytes(wav: np.ndarray, sr: int) -> bytes:
    """PCM16 WAV encoding without scipy (streamable)."""
    pcm = (np.clip(wav, -1, 1) * 32767).astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVEfmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16) + b"data" + struct.pack("<I", len(pcm))
    return hdr + pcm


def load_voice_adapters(path: str) -> dict:
    """Split an adapter checkpoint (JointTrainer.export_adapters /
    merge_joint_weights.py --adapters-out) into the set_voices entry:
    ``{"llm": {...}|None, "flow": {...}|None, "llm_scale": float|None,
    "flow_scale": float|None}``.  Keys in the file are
    ``llm.<param path>.lora_A/B`` and ``flow.<...>`` plus ``._scaling``
    scalars recording the adapters' alpha/r."""
    from .params import load_torch_checkpoint

    blob = load_torch_checkpoint(path)
    llm = {k[len("llm."):]: v for k, v in blob.items()
           if k.startswith("llm.") and ".lora_" in k}
    flow = {k[len("flow."):]: v for k, v in blob.items()
            if k.startswith("flow.") and ".lora_" in k}
    if not llm and not flow:
        raise SystemExit(
            f"{path}: no llm.*/flow.* adapter keys — pass an adapter-only "
            "checkpoint (train_joint.py adapters_*.pt or "
            "merge_joint_weights.py --adapters-out), not merged weights")
    return {
        "llm": llm or None,
        "flow": flow or None,
        "llm_scale": float(blob["llm._scaling"]) if "llm._scaling" in blob else None,
        "flow_scale": float(blob["flow._scaling"]) if "flow._scaling" in blob else None,
    }


class TTSServer:
    def __init__(self, api, lock: Optional[threading.Lock] = None,
                 batch_window_ms: float = 20.0, max_batch: int = 8,
                 engine_slots: int = 0, engine_prefetch: bool = False):
        self.api = api
        # single-chip: serialize device work; the jitted stages batch internally
        self.lock = lock or threading.Lock()
        # continuous batching (infer/engine.py): requests join/leave the ONE
        # persistent decode batch at segment granularity — no cohort
        # formation wait, slots refill as streams finish.  Opt-in because it
        # compiles its own fixed-(slots, prefix, max_len) decode program.
        self.engine = None
        if engine_slots > 0 and hasattr(api.model, "_admit_jit"):
            from .infer.engine import ContinuousBatchEngine

            # prefetch: dispatch-pipeline segment k+1 before syncing k.
            # Default off — a win only at low concurrency where admissions
            # are rare (PERF.md engine A/B); surfaced via --engine-prefetch.
            self.engine = ContinuousBatchEngine(
                api.model, slots=engine_slots, device_lock=self.lock,
                prefetch=engine_prefetch)
        # dynamic batching for non-streaming prompt-free requests: requests
        # arriving within the window share one llm_decode_batch call
        # (PERF.md: 2.5x aggregate tok/s at B=8)
        self.batch_window_ms = batch_window_ms
        self.max_batch = max_batch
        self._queue: list = []
        self._queue_lock = threading.Lock()
        self._worker_busy = threading.Lock()
        # streaming cohorts (synthesize_stream_batched)
        self._stream_queue: list = []
        self._stream_wake = threading.Event()
        self._stream_thread: Optional[threading.Thread] = None
        # cohorts interleave at segment boundaries: each runs in its own
        # thread, re-acquiring the device lock per segment, so a newcomer's
        # first audio lands between a running cohort's segments instead of
        # after its longest utterance.  The semaphore bounds concurrent
        # cohorts (each batch size compiles its own program).
        self.max_concurrent_cohorts = 2
        self._cohort_slots = threading.Semaphore(self.max_concurrent_cohorts)
        self.batches_run = 0  # observability
        # -- serving statistics (GET /stats, /metrics) ------------------
        self._stats_lock = threading.Lock()
        self._t_started = time.time()
        self.active_requests = 0
        self._route_counts: collections.Counter = collections.Counter()
        self._route_errors: collections.Counter = collections.Counter()
        self._audio_seconds = 0.0
        self._busy_seconds = 0.0
        # rolling per-request RTF window (synthesis wall / audio duration)
        self._rtf_ring: collections.deque = collections.deque(maxlen=256)
        self._ttfa_ring: collections.deque = collections.deque(maxlen=256)

    # -- observability --------------------------------------------------

    def record_request(self, route: str, wall_s: float, audio_s: float,
                       ttfa_s: Optional[float] = None, error: bool = False):
        with self._stats_lock:
            self._route_counts[route] += 1
            if error:
                self._route_errors[route] += 1
            self._busy_seconds += wall_s
            if audio_s > 0:
                self._audio_seconds += audio_s
                self._rtf_ring.append(wall_s / audio_s)
            if ttfa_s is not None:
                self._ttfa_ring.append(ttfa_s)

    @staticmethod
    def _pct(ring, q):
        if not ring:
            return None
        return float(np.percentile(np.asarray(ring), q))

    def stats(self) -> dict:
        with self._stats_lock:
            with self._queue_lock:
                q_batch, q_stream = len(self._queue), len(self._stream_queue)
            out = {
                "uptime_s": round(time.time() - self._t_started, 1),
                "active_requests": self.active_requests,
                "requests": dict(self._route_counts),
                "errors": dict(self._route_errors),
                "batches_run": self.batches_run,
                "audio_seconds": round(self._audio_seconds, 2),
                "busy_seconds": round(self._busy_seconds, 2),
                "queue_depth": {"batched": q_batch, "stream": q_stream},
                "rtf": {"p50": self._pct(self._rtf_ring, 50),
                        "p95": self._pct(self._rtf_ring, 95),
                        "window": len(self._rtf_ring)},
                "ttfa_s": {"p50": self._pct(self._ttfa_ring, 50),
                           "p95": self._pct(self._ttfa_ring, 95),
                           "window": len(self._ttfa_ring)},
            }
            if self.engine is not None:
                out["engine"] = {
                    "slots": self.engine.B,
                    "active": sum(s is not None for s in self.engine._slots),
                    "segments_run": self.engine.segments_run,
                    "prefetch_hits": self.engine.prefetch_hits,
                }
            return out

    def metrics_text(self) -> str:
        """Prometheus text exposition of stats() counters/gauges."""
        s = self.stats()
        lines = [
            "# TYPE cosy_tpu_uptime_seconds gauge",
            f"cosy_tpu_uptime_seconds {s['uptime_s']}",
            "# TYPE cosy_tpu_active_requests gauge",
            f"cosy_tpu_active_requests {s['active_requests']}",
            "# TYPE cosy_tpu_requests_total counter",
        ]
        for route, n in sorted(s["requests"].items()):
            lines.append('cosy_tpu_requests_total{route="%s"} %d' % (route, n))
        lines.append("# TYPE cosy_tpu_errors_total counter")
        for route, n in sorted(s["errors"].items()):
            lines.append('cosy_tpu_errors_total{route="%s"} %d' % (route, n))
        lines += [
            "# TYPE cosy_tpu_batches_run_total counter",
            f"cosy_tpu_batches_run_total {s['batches_run']}",
            "# TYPE cosy_tpu_audio_seconds_total counter",
            f"cosy_tpu_audio_seconds_total {s['audio_seconds']}",
            "# TYPE cosy_tpu_busy_seconds_total counter",
            f"cosy_tpu_busy_seconds_total {s['busy_seconds']}",
        ]
        for name, key in (("rtf", "rtf"), ("ttfa_seconds", "ttfa_s")):
            for q in ("p50", "p95"):
                v = s[key][q]
                if v is not None:
                    lines.append(
                        'cosy_tpu_%s{quantile="%s"} %.6f' % (name, q, v))
        return "\n".join(lines) + "\n"

    def _zero_spk(self) -> np.ndarray:
        """Zero speaker embedding sized for whichever pipeline is loaded."""
        model = self.api.model
        spk_dim = (model.cfg.llm.spk_embed_dim if hasattr(model, "cfg")
                   else model.fcfg.spk_embed_dim)
        return np.zeros((1, spk_dim), np.float32)

    def _prompt_free_kwargs(self) -> dict:
        """The zero-embedding kwarg for model.synthesize — TTSPipeline takes
        spk_embedding, TTS2Pipeline takes flow_embedding (CosyVoice2 has no
        LLM speaker row)."""
        key = "spk_embedding" if hasattr(self.api.model, "cfg") else "flow_embedding"
        return {key: self._zero_spk()}

    def synthesize(self, text: str, spk_id: str = "", speed: float = 1.0,
                   stream: bool = False, voice: str = ""):
        if spk_id:
            gen = self.api.inference_sft(text, spk_id, stream=stream, speed=speed)
        else:
            # prompt-free path with zero speaker embedding; ``voice`` routes
            # through that registered LoRA adapter set (multi-voice serving,
            # pipeline.set_voices)
            ids = self.api.frontend.extract_text_token(
                self.api.frontend.normalize(text, split=False))
            kwargs = self._prompt_free_kwargs()
            if voice:
                kwargs["voice"] = voice
            gen = self.api.model.synthesize(
                self.api._next_rng(), ids, stream=stream, speed=speed,
                **kwargs)
        # hold the device lock per CHUNK, not across the generator's yields:
        # this generator suspends at yield while the handler writes to the
        # client socket, and a slow client must not freeze the chip for
        # every other request (cohorts, engine, batched)
        while True:
            with self.lock:
                try:
                    out = next(gen)
                except StopIteration:
                    break
            yield out["tts_speech"][0]

    def synthesize_batched(self, text: str, speed: float = 1.0,
                           voice: str = "") -> np.ndarray:
        """Enqueue a prompt-free request; a leader thread drains the queue
        into one micro-batched decode.  Blocks until this request's wav is
        ready.  ``voice`` routes this row's LoRA adapters inside the shared
        decode (mixed voiced/base batches supported)."""
        import time

        ids = self.api.frontend.extract_text_token(
            self.api.frontend.normalize(text, split=False))
        item = {"ids": ids, "speed": speed, "voice": voice,
                "event": threading.Event(), "wav": None, "err": None}
        with self._queue_lock:
            self._queue.append(item)
        # one request thread becomes the leader and runs the batch
        with self._worker_busy:
            if item["event"].is_set():  # a previous leader served us
                pass
            else:
                time.sleep(self.batch_window_ms / 1e3)  # collection window
                with self._queue_lock:
                    batch, self._queue = (self._queue[: self.max_batch],
                                          self._queue[self.max_batch:])
                if batch:
                    try:
                        zero = self._zero_spk()
                        vkw = ({"voices": [b.get("voice") or None
                                           for b in batch]}
                               if any(b.get("voice") for b in batch) else {})
                        with self.lock:
                            wavs = self.api.model.synthesize_batch(
                                self.api._next_rng(),
                                [b["ids"] for b in batch],
                                [zero] * len(batch),
                                speed=[b["speed"] for b in batch], **vkw)
                        for b, w in zip(batch, wavs):
                            b["wav"] = w[0]
                    except Exception as e:  # noqa: BLE001
                        for b in batch:
                            b["err"] = e
                    finally:
                        self.batches_run += 1
                        for b in batch:
                            b["event"].set()
        item["event"].wait()
        if item["err"] is not None:
            raise item["err"]
        return item["wav"]

    def synthesize_stream_engine(self, text: str):
        """Streaming via the continuous-batching engine: this request joins
        the persistent decode batch at the next segment boundary (one-segment
        TTFA under load) and its slot frees for the next request the moment
        it finishes — no cohort formation window, no lock-step drain."""
        ids = self.api.frontend.extract_text_token(
            self.api.frontend.normalize(text, split=False))
        # zero speaker embedding so the LLM prefix matches every other
        # prompt-free path (solo/cohort/batched all pass _zero_spk(); a None
        # embedding would build the speaker-less instruct-style prefix and
        # decode a different token stream)
        req = self.engine.submit(self.api._next_rng(), ids, self._zero_spk())
        try:
            for chunk in req.chunks():
                yield chunk[0]
        finally:
            # client disconnect closes this generator: release the decode
            # slot instead of synthesizing the rest of the utterance for a
            # dead consumer
            self.engine.cancel(req)

    def synthesize_stream_batched(self, text: str, voice: str = ""):
        """Streaming with cohort batching: requests arriving within the
        window share one lock-step segmented decode
        (pipeline.synthesize_stream_batch) — concurrent streams amortize the
        per-token weight read (the dominant bs=1 decode cost, PERF.md) —
        while every connection receives its own hop-sized chunks as they are
        produced.  A dispatcher thread admits cohorts; each cohort runs in
        its own thread holding the device lock per SEGMENT, so up to
        ``max_concurrent_cohorts`` cohorts interleave at segment boundaries —
        a request arriving mid-cohort starts after the current segment, not
        after the running cohort's longest utterance."""
        import queue as _queue

        ids = self.api.frontend.extract_text_token(
            self.api.frontend.normalize(text, split=False))
        item = {"ids": ids, "voice": voice, "q": _queue.Queue(), "err": None,
                "dead": False}
        with self._queue_lock:
            self._stream_queue.append(item)
            # respawn if the worker died (it is hardened below, but a dead
            # worker must never strand queued clients on q.get() forever)
            if self._stream_thread is None or not self._stream_thread.is_alive():
                self._stream_thread = threading.Thread(
                    target=self._stream_worker, daemon=True)
                self._stream_thread.start()
        self._stream_wake.set()
        try:
            while True:
                got = item["q"].get()
                if got is None:
                    if item["err"] is not None:
                        raise item["err"]
                    return
                yield got
        finally:
            # client disconnect closes this generator: stop accumulating
            # chunks for a dead consumer (the lock-step cohort itself runs
            # to completion — members cannot be dropped mid-decode)
            item["dead"] = True

    def _stream_worker(self):
        import time

        while True:
            cohort = []
            slot = False
            try:
                self._stream_wake.wait()
                self._cohort_slots.acquire()  # bound concurrent cohorts
                slot = True
                time.sleep(self.batch_window_ms / 1e3)  # collection window
                with self._queue_lock:
                    cohort, self._stream_queue = (
                        self._stream_queue[: self.max_batch],
                        self._stream_queue[self.max_batch:])
                    if not self._stream_queue:
                        self._stream_wake.clear()
                if not cohort:
                    self._cohort_slots.release()
                    continue
                threading.Thread(target=self._cohort_entry, args=(cohort,),
                                 daemon=True).start()
            except Exception as e:  # noqa: BLE001 — the worker must not die
                for it in cohort:
                    it["err"] = it["err"] or e
                    it["q"].put(None)
                if slot:
                    self._cohort_slots.release()

    def _cohort_entry(self, cohort):
        try:
            self._run_stream_cohort(cohort)
        finally:
            self._cohort_slots.release()

    def _run_stream_cohort(self, cohort):
        with self._queue_lock:
            self.batches_run += 1
        finished = [False] * len(cohort)
        try:
            zero = self._zero_spk()
            vkw = ({"voices": [it.get("voice") or None for it in cohort]}
                   if any(it.get("voice") for it in cohort) else {})
            gen = self.api.model.synthesize_stream_batch(
                self.api._next_rng(),
                [it["ids"] for it in cohort],
                [zero] * len(cohort), **vkw)
            while True:
                # the device lock is held per SEGMENT, not per cohort:
                # concurrent cohorts interleave their decode/token2wav
                # programs, so a later cohort's first chunk is one segment
                # away, not one full cohort away
                with self.lock:
                    try:
                        b, wav, done = next(gen)
                    except StopIteration:
                        break
                if not cohort[b]["dead"]:
                    cohort[b]["q"].put(wav[0])
                if done:
                    # release this client immediately — short streams
                    # must not wait for (or inherit errors from) the
                    # cohort's longest utterance
                    finished[b] = True
                    cohort[b]["q"].put(None)
        except Exception as e:  # noqa: BLE001
            for it, fin in zip(cohort, finished):
                if not fin:
                    it["err"] = e
        finally:
            for it, fin in zip(cohort, finished):
                if not fin:
                    it["q"].put(None)  # end-of-stream sentinel


def make_handler(server: TTSServer, sample_rate: int):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"  # required for chunked streaming

        def log_message(self, fmt, *args):  # quiet
            pass

        def _plain(self, code: int, body: bytes):
            """Plain response with Content-Length — under HTTP/1.1 keep-alive
            the client needs explicit framing or it waits forever for a
            connection close that never comes."""
            self.send_response(code)
            self.send_header("Content-Type", "text/plain")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._plain(200, b"ok")
            elif self.path == "/stats":
                body = json.dumps(server.stats(), indent=1).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/metrics":
                self._plain(200, server.metrics_text().encode())
            else:
                self._plain(404, b"not found")

        def do_POST(self):
            t_req = time.time()
            audio_samples = 0
            ttfa = None
            ok = False
            # _tts updates _cur_route as routing decisions are made, so an
            # exception AFTER route selection (client disconnect mid-stream,
            # synthesis failure) is attributed to the REAL route in /stats,
            # not lumped under bad_request
            self._cur_route = "bad_request"
            with server._stats_lock:
                server.active_requests += 1
            try:
                audio_samples, ttfa, ok = self._tts(t_req)
            finally:
                with server._stats_lock:
                    server.active_requests -= 1
                server.record_request(
                    self._cur_route, time.time() - t_req,
                    audio_samples / sample_rate, ttfa_s=ttfa, error=not ok)

        def _tts(self, t_req):
            """Returns (audio_samples, ttfa_s | None, ok); sets
            self._cur_route for stats attribution."""
            if self.path != "/tts":
                self._plain(404, b"not found")
                self._cur_route = "not_found"
                return 0, None, False
            n = int(self.headers.get("Content-Length", 0))
            try:
                req = json.loads(self.rfile.read(n) or b"{}")
                text = req["text"]
                stream = bool(req.get("stream", False))
                spk_id = req.get("spk_id", "")
                speed = float(req.get("speed", 1.0))
                voice = req.get("voice", "")
            except (json.JSONDecodeError, KeyError, TypeError, ValueError) as e:
                # TypeError: non-object JSON body ([1,2], "hi"); ValueError:
                # non-numeric speed — both are client errors, not 500s
                self._plain(400, f"bad request: {e}".encode())
                return 0, None, False
            if voice:
                if spk_id:
                    # spk_id routes to inference_sft, which has no voice
                    # wiring — honoring one silently would drop the other
                    self._plain(400, b"voice and spk_id are mutually "
                                     b"exclusive; pass one")
                    return 0, None, False
                known = getattr(server.api.model, "voice_names", [])
                if voice not in known:
                    self._plain(400, f"unknown voice {voice!r}; registered: "
                                     f"{known}".encode())
                    return 0, None, False
            if stream:
                # true chunked streaming: WAV header with unknown-length
                # markers, then PCM16 per synthesis chunk as it is produced
                self.send_response(200)
                self.send_header("Content-Type", "audio/wav")
                self.send_header("Transfer-Encoding", "chunked")
                self.end_headers()

                def send_chunk(data: bytes):
                    self.wfile.write(f"{len(data):X}\r\n".encode())
                    self.wfile.write(data)
                    self.wfile.write(b"\r\n")

                hdr = b"RIFF" + struct.pack("<I", 0xFFFFFFFF) + b"WAVEfmt " + \
                    struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                                sample_rate * 2, 2, 16) + \
                    b"data" + struct.pack("<I", 0xFFFFFFFF)
                send_chunk(hdr)
                if (not spk_id and not voice and speed == 1.0
                        and server.engine is not None):
                    # continuous batching: join the persistent decode batch
                    # (voiced requests skip the engine — its persistent
                    # program has no vids wiring — and join a cohort below)
                    self._cur_route = "stream_engine"
                    pieces = server.synthesize_stream_engine(text)
                elif (not spk_id and speed == 1.0
                        and hasattr(server.api.model, "synthesize_stream_batch")):
                    # concurrent prompt-free streams share a lock-step
                    # segmented decode (cohort batching); voiced rows route
                    # their adapters per row inside the SHARED decode
                    self._cur_route = "stream_cohort"
                    pieces = server.synthesize_stream_batched(text, voice)
                else:
                    self._cur_route = "stream_solo"
                    pieces = server.synthesize(text, spk_id, speed,
                                               stream=True, voice=voice)
                samples, ttfa = 0, None
                try:
                    for piece in pieces:
                        if ttfa is None:
                            ttfa = time.time() - t_req
                        samples += int(np.size(piece))
                        pcm = (np.clip(piece, -1, 1) * 32767).astype("<i2").tobytes()
                        send_chunk(pcm)
                    self.wfile.write(b"0\r\n\r\n")
                finally:
                    # on client disconnect the write raises and the generator
                    # is abandoned: close() runs its finally block (engine
                    # slot cancel / cohort dead-mark / device-lock release)
                    pieces.close()
                return samples, ttfa, True
            if (not spk_id
                    and hasattr(server.api.model, "synthesize_batch")):
                # concurrent prompt-free requests share a micro-batched
                # decode (voiced rows route adapters per row)
                self._cur_route = "batched"
                wav = server.synthesize_batched(text, speed, voice)
            else:
                self._cur_route = "solo_sft" if spk_id else "solo"
                wav = np.concatenate(list(server.synthesize(
                    text, spk_id, speed, stream=False, voice=voice)))
            body = wav_bytes(wav, sample_rate)
            self.send_response(200)
            self.send_header("Content-Type", "audio/wav")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return int(np.size(wav)), None, True

    return Handler


def resolve_finetuned_norm(flow_weights_path, override_flow, explicit,
                           cosyvoice2) -> bool:
    """Decide whether served v1 flow weights operate in normalized mel space
    (fine-tune/distill outputs, which need the output denorm like
    inference_joint.py:129-151) or raw mel space (pretrained-style).

    Precedence: explicit --finetuned-norm > the weights' .meta.json
    provenance sidecar (written by cosy_tpu's export tools) > the distilled
    time_mlp_s key signature.  Unknown provenance raises — a raw-mel
    checkpoint served with the denorm on fails SILENTLY as garbled audio, so
    guessing from the flag's mere presence is not acceptable."""
    if explicit is not None:
        return bool(explicit)
    if cosyvoice2 or override_flow is None:
        return False  # CV2 has no denorm; stock model-dir weights are raw
    from .params import load_weight_meta

    meta = load_weight_meta(flow_weights_path)
    if meta and "mel_space" in meta:
        print(f"flow: mel_space={meta['mel_space']} "
              f"({flow_weights_path}.meta.json)")
        return meta["mel_space"] == "normalized"
    if "decoder.estimator.time_mlp_s.linear_1.weight" in override_flow:
        return True  # distill_flow.py v1 output (normalized space)
    raise SystemExit(
        f"--flow-weights {flow_weights_path}: cannot tell whether these "
        "weights operate in normalized mel space (fine-tune/distill "
        "outputs) or raw mel space (pretrained-style) — no .meta.json "
        "sidecar was found next to the file.  Pass --finetuned-norm 1 "
        "(merged fine-tune / v1 distill outputs) or --finetuned-norm 0 "
        "(raw-mel-space weights); cosy_tpu's own export tools write the "
        "sidecar automatically.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="pretrained_models/CosyVoice-300M")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--cosyvoice2", action="store_true")
    ap.add_argument("--tp", type=int, default=1,
                    help="shard the LLM over a model-axis mesh of this size "
                         "(multi-chip serving: N chips = N x the per-token "
                         "weight bandwidth that bounds bs=1 decode; decoded "
                         "tokens are identical to the replicated run)")
    ap.add_argument("--engine-slots", type=int, default=0,
                    help="enable continuous batching with this many decode "
                         "slots (vLLM-style: streaming requests join/leave "
                         "the one persistent decode batch at segment "
                         "boundaries; 0 = cohort batching)")
    ap.add_argument("--engine-prefetch", action="store_true",
                    help="with --engine-slots: speculatively submit decode "
                         "segment k+1 before segment k is emitted (dispatch "
                         "pipelining).  Wins at low concurrency (admissions "
                         "discard prefetched segments, so keep it off for "
                         "sustained full-slot load — measured A/B in "
                         "PERF.md; hits show as prefetch_hits in /stats)")
    ap.add_argument("--warmup", action="store_true",
                    help="compile the synthesis programs before accepting "
                         "traffic (remote compilation takes minutes cold; "
                         "without this the first request of each shape "
                         "bucket pays it)")
    ap.add_argument("--flow-weights", default=None,
                    help="override the model dir's flow weights (e.g. a "
                         "merged fine-tune or a distill_flow.py output)")
    ap.add_argument("--voices", default=None, metavar="NAME=ADAPTERS.pt,...",
                    help="multi-voice LoRA serving: comma-separated "
                         "name=path pairs of adapter checkpoints "
                         "(train_joint.py adapters_*.pt or "
                         "merge_joint_weights.py --adapters-out).  ONE base "
                         "model serves every voice through per-request "
                         "un-merged adapter routing (~2M params/voice); "
                         "clients select with {\"voice\": \"name\"}")
    ap.add_argument("--sampler", default="euler", choices=["euler", "meanflow"],
                    help="meanflow: few-step distilled flow sampler (1-2 "
                         "estimator calls instead of 20-40; needs "
                         "distill_flow.py weights via --flow-weights; "
                         "measured 3.5-8.5x solve speedup, PERF.md; "
                         "validate quality per voice)")
    ap.add_argument("--meanflow-steps", type=int, default=2)
    ap.add_argument("--finetuned-norm", type=int, choices=[0, 1], default=None,
                    help="treat the flow weights as normalized-mel "
                         "(fine-tuned/distilled v1) and denormalize on "
                         "output; default: read from the weights' "
                         ".meta.json provenance sidecar (written by "
                         "cosy_tpu's export tools) — required explicitly "
                         "when --flow-weights points at a file without one")
    ap.add_argument("--aot-cache", default=None, metavar="DIR",
                    help="persist compiled serving programs to this "
                         "directory (jax serialize_executable): a restarted "
                         "server loads executables instead of recompiling — "
                         "cold --warmup drops from minutes to seconds on "
                         "the second start (utils/aot.py)")
    ap.add_argument("--drain-timeout", type=float, default=30.0,
                    help="seconds to wait for in-flight requests after "
                         "SIGTERM/SIGINT before exiting")
    ap.add_argument("--int8", action="store_true",
                    help="weight-only int8 AR decode (+~30%% tok/s on the "
                         "weight-bandwidth-bound bs=1 path).  Quantization "
                         "rounds the logits so emitted tokens can diverge "
                         "per voice — validate first with "
                         "tools/validate_quant.py (token agreement + MCD "
                         "thresholds, PERF.md int8 section)")
    ap.add_argument("--attn-window", type=int, default=0,
                    help="opt-in local-band estimator attention: each mel "
                         "frame attends only this many neighbor frames "
                         "(halved per U-Net level) on long non-streaming "
                         "utterances — up to 2x faster flow solves at the "
                         "30 s input cap, at an output-fidelity trade "
                         "(PERF.md); 0 = full attention (default)")
    args = ap.parse_args()
    if args.attn_window:
        import os

        os.environ["COSY_TPU_ATTN_WINDOW"] = str(args.attn_window)
    if args.aot_cache:
        # before any pipeline construction: the jit programs are created in
        # the pipeline __init__ and bind the cache at creation time
        from .utils.aot import set_cache_dir

        set_cache_dir(args.aot_cache)

    from .api import CosyVoice, CosyVoice2
    from .config import InferenceConfig, replace as creplace

    # infer_cfg=None lets CosyVoice apply the model dir's yaml-derived
    # sampling knobs (api.py yaml ingestion); only build an explicit config
    # when the sampler must be overridden — and then start FROM the yaml
    # config so those knobs survive the override
    icfg = None
    if args.sampler != "euler" or args.int8:
        import os as _os
        yaml_path = _os.path.join(args.model_dir, "cosyvoice.yaml")
        if not args.cosyvoice2 and _os.path.exists(yaml_path):
            from .compat.yaml_config import inference_config_from_yaml

            icfg = inference_config_from_yaml(yaml_path)
        icfg = creplace(icfg or InferenceConfig(), sampler=args.sampler,
                        meanflow_steps=args.meanflow_steps,
                        int8_decode=args.int8)
    # v1 fine-tuned/distilled flow weights operate in normalized mel space
    # (flow_distill_loss / the fine-tune loss, MEL −6.0/2.0) and need the
    # denorm on the way out, exactly like inference_joint.py; CV2 flows
    # train in raw mel space and take no such flag.  The default is keyed
    # off CHECKPOINT PROVENANCE, not off the flag's mere presence: a raw
    # mel-space v1 checkpoint served with the denorm on would fail silently
    # as garbled audio, so unknown provenance demands an explicit choice.
    override_flow = None
    if args.flow_weights:
        from .params import load_torch_checkpoint

        override_flow = load_torch_checkpoint(args.flow_weights)
    fnorm = resolve_finetuned_norm(args.flow_weights, override_flow,
                                   args.finetuned_norm, args.cosyvoice2)
    api = (CosyVoice2 if args.cosyvoice2 else CosyVoice)(
        args.model_dir, infer_cfg=icfg,
        **({} if args.cosyvoice2 else {"finetuned_norm": fnorm}))
    if fnorm:
        print("flow: finetuned_norm on (normalized-mel weights; "
              "--finetuned-norm 0 to disable)")
    if override_flow is not None:
        api.model.flow_params = override_flow
        print(f"flow weights <- {args.flow_weights}")
    _distilled = ("decoder.estimator.time_mlp_s.linear_1.weight"
                  in api.model.flow_params)
    if args.sampler == "meanflow":
        if not _distilled:
            raise SystemExit("--sampler meanflow needs distilled flow weights "
                             "(distill_flow.py; pass them via --flow-weights)")
        if args.meanflow_steps < 1:
            raise SystemExit("--meanflow-steps must be >= 1")
    elif _distilled:
        # distillation retrains the WHOLE estimator as part of the
        # (base + s-branch) sum — the Euler solver on those weights
        # evaluates neither v nor u and serves garbled audio
        raise SystemExit("these flow weights are MeanFlow-distilled; pass "
                         "--sampler meanflow (or serve un-distilled weights)")
    if args.voices:
        if args.cosyvoice2:
            raise SystemExit("--voices is CosyVoice(1)-only for now (the CV2 "
                             "pipeline has no multi-voice decode wiring)")
        voices, llm_s, flow_s = {}, None, None
        for pair in args.voices.split(","):
            name, _, path = pair.partition("=")
            name, path = name.strip(), path.strip()
            if not name or not path:
                raise SystemExit(f"--voices: bad pair {pair!r} (want name=path)")
            if name in voices:
                raise SystemExit(f"--voices: duplicate voice name {name!r}")
            v = load_voice_adapters(path)
            # a file without recorded ._scaling was trained at the default
            # alpha/r = 2.0 (config.py JOINT defaults) — pin it to that
            # rather than letting it inherit another voice's explicit scale
            for stage in ("llm_scale", "flow_scale"):
                if v[stage] is None and v[stage.split("_")[0]] is not None:
                    v[stage] = 2.0
            for stage, cur in (("llm_scale", llm_s), ("flow_scale", flow_s)):
                if v[stage] is not None and cur is not None and v[stage] != cur:
                    raise SystemExit(
                        f"--voices: {name} {stage}={v[stage]} differs from "
                        f"an earlier voice's {cur}; all voices must share "
                        "one adapter scaling per stage")
            llm_s = v["llm_scale"] if v["llm_scale"] is not None else llm_s
            flow_s = v["flow_scale"] if v["flow_scale"] is not None else flow_s
            voices[name] = {"llm": v["llm"], "flow": v["flow"]}
        api.model.set_voices(voices,
                             llm_scale=2.0 if llm_s is None else llm_s,
                             flow_scale=2.0 if flow_s is None else flow_s)
        print(f"voices: {list(voices)} (un-merged adapter routing)")
    if args.tp > 1:
        import jax

        from .parallel import mesh as pmesh, tp as tpmod

        mesh = pmesh.make_mesh(dp=1, model=args.tp,
                               devices=jax.devices()[: args.tp])
        api.model.llm_params = tpmod.shard_params(mesh, api.model.llm_params)
        # the flow estimator is the compute-bound half of token2wav
        # (PERF.md CFM roofline): its diffusers attn/ff blocks split over
        # the same axis, cutting flow-solve latency near-linearly; HiFT is
        # pure convs (no TP rule) and stays replicated
        api.model.flow_params = tpmod.shard_params(mesh, api.model.flow_params)
        print(f"LLM+flow tensor-parallel over {args.tp} devices "
              f"({tpmod.count_sharded(api.model.llm_params)} llm + "
              f"{tpmod.count_sharded(api.model.flow_params)} flow split params)")
    server = TTSServer(api, engine_slots=args.engine_slots,
                       engine_prefetch=args.engine_prefetch)
    if args.warmup:
        import time as _time

        t0 = _time.time()
        print("warmup: compiling synthesis programs ...", flush=True)
        for wav in server.synthesize("warmup.", stream=False):
            pass
        for wav in server.synthesize("warmup.", stream=True):
            pass
        vnames = getattr(api.model, "voice_names", [])
        # the live non-streaming route is synthesize_batched (a lone request
        # runs it at B=1) — warm the batch-decode program, not just the solo
        # one
        if hasattr(api.model, "synthesize_batch"):
            server.synthesize_batched("warmup.")
        if vnames:
            # voiced programs have their own jit signatures (lora bank + vid
            # args).  The handler routes voiced requests to the BATCHED
            # paths (synthesize_batched / synthesize_stream_batched), whose
            # bank-routed decode programs differ from the solo ones — warm
            # both the solo programs (used when speed != 1.0) and the
            # batched ones; one voice suffices (every voice shares the same
            # program)
            for wav in server.synthesize("warmup.", stream=False,
                                         voice=vnames[0]):
                pass
            for wav in server.synthesize("warmup.", stream=True,
                                         voice=vnames[0]):
                pass
            if hasattr(api.model, "synthesize_batch"):
                server.synthesize_batched("warmup.", voice=vnames[0])
        # the serving path proper is cohort streaming at B>1 — compile the
        # segmented batch decode + fused batch token2wav too, or the first
        # live concurrent-stream batch pays the minutes-long cold compile;
        # with voices registered, drain a voiced cohort so the bank-routed
        # segmented decode compiles too
        def _drain(voice=""):
            if server.engine is not None and not voice:
                for _ in server.synthesize_stream_engine("warmup cohort."):
                    pass
            else:
                for _ in server.synthesize_stream_batched("warmup cohort.",
                                                          voice=voice):
                    pass

        def _run_cohort(voice=""):
            cohort = [threading.Thread(target=_drain, args=(voice,))
                      for _ in range(2)]
            for t in cohort:
                t.start()
            for t in cohort:
                t.join()

        _run_cohort()
        if vnames:
            # a separate all-voiced cohort: mixing it into the unvoiced one
            # would compile only the bank-routed program and leave the
            # plain cohort decode cold
            _run_cohort(vnames[0])
        print(f"warmup done in {_time.time() - t0:.0f}s "
              f"({server.batches_run} batch programs)")
    httpd = ThreadingHTTPServer(("0.0.0.0", args.port),
                                make_handler(server, api.sample_rate))
    # graceful drain: SIGTERM/SIGINT close the listener; in-flight requests
    # (handler threads) run to completion bounded by --drain-timeout — the
    # preemption-safe serving analogue of the trainers' SIGTERM snapshots
    import signal

    def _drain(signum, frame):
        print(f"signal {signum}: draining "
              f"({server.active_requests} in flight) ...", flush=True)
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _drain)
    signal.signal(signal.SIGINT, _drain)
    print(f"cosy_tpu TTS server on :{args.port}")
    httpd.serve_forever()  # returns after shutdown()
    deadline = time.time() + args.drain_timeout
    while server.active_requests > 0 and time.time() < deadline:
        time.sleep(0.1)
    httpd.server_close()
    print(f"drained; served {sum(server.stats()['requests'].values())} "
          "requests total")


if __name__ == "__main__":
    main()
