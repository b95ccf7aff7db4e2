"""Concurrent load generator for the cosy_tpu TTS server.

Drives N concurrent client workers against a running server and reports
request throughput, latency / TTFA percentiles, and aggregate RTF — the
capacity-planning companion to serve.py's /stats endpoint (client-side
numbers include network + queueing, which /stats cannot see).

    python tools/loadtest.py --url http://localhost:8080 \
        --concurrency 4 --requests 32 [--stream] [--text "..."] [--voice v]

Works against any model size; on the real chip use --warmup on the server
first (or an --aot-cache'd restart) so compiles don't pollute the numbers.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosy_tpu.client import TTSClient


def pct(xs, q):
    return float(np.percentile(np.asarray(xs), q)) if xs else float("nan")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://localhost:8080")
    ap.add_argument("--concurrency", type=int, default=4)
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--text", default="The quick brown fox jumps over the lazy dog.")
    ap.add_argument("--voice", default="")
    ap.add_argument("--timeout", type=float, default=600.0)
    args = ap.parse_args()

    client = TTSClient(args.url, timeout=args.timeout)
    if not client.healthz():
        raise SystemExit(f"server at {args.url} is not healthy")

    results = []  # (wall_s, ttfa_s | None, audio_s, ok)
    lock = threading.Lock()
    queue = list(range(args.requests))

    def worker():
        c = TTSClient(args.url, timeout=args.timeout)
        while True:
            with lock:
                if not queue:
                    return
                queue.pop()
            t0 = time.perf_counter()
            try:
                if args.stream:
                    ttfa, samples = None, 0
                    for ch in c.tts_stream(args.text, voice=args.voice):
                        if ttfa is None:
                            ttfa = time.perf_counter() - t0
                        samples += ch.size
                    sr = getattr(c, "last_sample_rate", 22050)
                    rec = (time.perf_counter() - t0, ttfa, samples / sr, True)
                else:
                    wav, sr = c.tts(args.text, voice=args.voice)
                    rec = (time.perf_counter() - t0, None, len(wav) / sr, True)
            except Exception as e:  # noqa: BLE001
                print(f"[loadtest] request failed: {e}", file=sys.stderr)
                rec = (time.perf_counter() - t0, None, 0.0, False)
            with lock:
                results.append(rec)

    t_start = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(args.concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start

    ok = [r for r in results if r[3]]
    lat = [r[0] for r in ok]
    ttfa = [r[1] for r in ok if r[1] is not None]
    audio = sum(r[2] for r in ok)
    out = {
        "requests": len(results), "ok": len(ok),
        "failed": len(results) - len(ok),
        "concurrency": args.concurrency, "stream": args.stream,
        "wall_s": round(wall, 2),
        "req_per_s": round(len(ok) / wall, 3) if wall else None,
        "audio_seconds": round(audio, 2),
        "aggregate_rtf": round(wall / audio, 4) if audio else None,
        "latency_s": {"p50": round(pct(lat, 50), 3),
                      "p95": round(pct(lat, 95), 3),
                      "max": round(max(lat), 3) if lat else None},
    }
    if ttfa:
        out["ttfa_s"] = {"p50": round(pct(ttfa, 50), 3),
                         "p95": round(pct(ttfa, 95), 3)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
