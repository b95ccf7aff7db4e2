"""On-chip probe: continuous-batching engine serving metrics (infer/engine.py).

Two scenarios at the production 300M topology (random weights — serving cost
does not depend on weight values):

A. Sustained load: 8 requests staggered into a 4-slot engine.  Reports wall,
   aggregate audio, aggregate RTF, per-request TTFA.  Slots refill as streams
   finish, so the decode batch stays full without cohort formation waits.
B. Mid-flight join: one long request mid-decode, then a newcomer.  Its TTFA
   measures the admission promise — one segment + prefill + token2wav, NOT
   the running request's remaining drain (the cohort design's worst case).

Run on the attached TPU:  python tools/probe_engine.py
(Compiles the (slots, L0, max_len) segmented decode + admit + streaming
token2wav programs — minutes cold through the tunnel.)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("COSY_TPU_NO_CACHE", "1")

import numpy as np
import jax
import jax.numpy as jnp

from cosy_tpu.config import InferenceConfig, ModelConfig
from cosy_tpu.params import cast
from cosy_tpu.models import flow as F, llm as L
from cosy_tpu.models.hift import init_hift_params
from cosy_tpu.infer.pipeline import TTSPipeline
from cosy_tpu.infer.engine import ContinuousBatchEngine

SR = 22050


def make_pipeline():
    cfg = ModelConfig()
    key = jax.random.PRNGKey(0)
    llm_params = cast(jax.jit(lambda k: L.init_llm_params(k, cfg.llm))(key),
                      jnp.bfloat16)
    flow_params = jax.jit(lambda k: F.init_flow_params(k, cfg.flow))(
        jax.random.fold_in(key, 2))
    hift_params = init_hift_params(jax.random.fold_in(key, 3), cfg.hift)
    return cfg, TTSPipeline(cfg, llm_params, flow_params, hift_params,
                            InferenceConfig(), finetuned_norm=True)


def run_requests(eng, cfg, n_req, text_len, stagger_s):
    rng = np.random.default_rng(0)
    t0 = time.perf_counter()
    stats = []  # (submit, ttfa, done, audio_s)

    import threading

    def consume(req, submit_t, out):
        first = None
        audio = 0
        for c in req.chunks():
            if first is None:
                first = time.perf_counter() - submit_t
            audio += c.shape[1]
        out.append((submit_t - t0, first, time.perf_counter() - t0,
                    audio / SR))

    threads = []
    for i in range(n_req):
        ids = rng.integers(0, cfg.llm.text_token_size,
                           (1, text_len)).astype(np.int32)
        submit_t = time.perf_counter()
        req = eng.submit(jax.random.PRNGKey(100 + i), ids)
        th = threading.Thread(target=consume, args=(req, submit_t, stats))
        th.start()
        threads.append(th)
        time.sleep(stagger_s)
    for th in threads:
        th.join(timeout=1800)
    wall = time.perf_counter() - t0
    return wall, sorted(stats)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--reqs", type=int, default=0,
                    help="capacity mode: run ONLY sustained load with this "
                         "many requests (default scenario set when 0)")
    ap.add_argument("--text-len", type=int, default=12)
    ap.add_argument("--stagger", type=float, default=0.25)
    ap.add_argument("--ab", action="store_true",
                    help="A/B the decode-segment prefetch (dispatch "
                         "pipelining) in ONE process: sustained load with "
                         "prefetch off then on, sharing compiled programs")
    args = ap.parse_args()

    jax.config.update("jax_log_compiles", True)  # show mid-run cold compiles
    cfg, pipe = make_pipeline()
    print(f"devices: {jax.devices()}", flush=True)
    eng = ContinuousBatchEngine(pipe, slots=args.slots, prefix_len=64,
                                max_len=512)

    # warm the programs (compile): one request through all stages
    print("warmup (compiling engine programs)...", flush=True)
    t0 = time.perf_counter()
    wall, stats = run_requests(eng, cfg, n_req=1, text_len=args.text_len,
                               stagger_s=0)
    print(f"warmup done in {time.perf_counter() - t0:.0f}s "
          f"(audio {stats[0][3]:.1f}s)", flush=True)

    if args.ab:
        # prefetch A/B: same pipeline (shared jit caches), fresh engine per
        # arm.  One cold pass per arm eats residual compiles (the prefetch
        # arm can own one extra attend rung), then the warm pass is the
        # steady-state comparison.
        n_req = args.reqs or 8
        for name, pf in (("prefetch-off", False), ("prefetch-on", True)):
            e = ContinuousBatchEngine(pipe, slots=args.slots, prefix_len=64,
                                      max_len=512, prefetch=pf)
            for label in ("cold", "warm"):
                wall, stats = run_requests(e, cfg, n_req=n_req,
                                           text_len=args.text_len,
                                           stagger_s=args.stagger)
                total_audio = sum(s[3] for s in stats)
                ttfas = [s[1] for s in stats]
                print(f"[AB {name} {label}] {n_req} reqs / {args.slots} "
                      f"slots: wall {wall:.2f}s, audio {total_audio:.1f}s, "
                      f"agg RTF {wall / total_audio:.3f}, "
                      f"TTFA mean {np.mean(ttfas):.2f}s "
                      f"max {np.max(ttfas):.2f}s, "
                      f"prefetch_hits {e.prefetch_hits}/{e.segments_run}",
                      flush=True)
            e.stop()
        eng.stop()
        os._exit(0)

    if args.reqs:
        # capacity mode: oversubscribed sustained load, steady-state pass
        # after one cold pass (mid-run compiles stall every live stream)
        for label in ("cold", "warm"):
            wall, stats = run_requests(eng, cfg, n_req=args.reqs,
                                       text_len=args.text_len,
                                       stagger_s=args.stagger)
            total_audio = sum(s[3] for s in stats)
            ttfas = [s[1] for s in stats]
            print(f"[capacity {label}] {args.reqs} reqs / {args.slots} slots: "
                  f"wall {wall:.2f}s, audio {total_audio:.1f}s, "
                  f"agg RTF {wall / total_audio:.3f}, "
                  f"TTFA mean {np.mean(ttfas):.2f}s max {np.max(ttfas):.2f}s",
                  flush=True)
        eng.stop()
        os._exit(0)

    # A: sustained load — 8 requests, 4 slots, 0.5 s stagger
    wall, stats = run_requests(eng, cfg, n_req=8, text_len=12, stagger_s=0.5)
    total_audio = sum(s[3] for s in stats)
    ttfas = [s[1] for s in stats]
    print(f"[A sustained] 8 reqs / 4 slots: wall {wall:.2f}s, "
          f"audio {total_audio:.1f}s, agg RTF {wall / total_audio:.3f}, "
          f"TTFA mean {np.mean(ttfas):.2f}s max {np.max(ttfas):.2f}s",
          flush=True)
    for s in stats:
        print(f"    submit {s[0]:5.2f}  ttfa {s[1]:5.2f}  done {s[2]:6.2f}  "
              f"audio {s[3]:5.2f}s", flush=True)

    # B: mid-flight join — long request decoding, newcomer joins.  Run
    # twice: the first pass eats any shapes scenario A didn't compile (the
    # engine loop is single-threaded, so ONE cold compile stalls every
    # stream in flight); the second pass is the steady-state number.
    import threading
    rng = np.random.default_rng(1)
    ids_long = rng.integers(0, cfg.llm.text_token_size, (1, 24)).astype(np.int32)
    ids_short = rng.integers(0, cfg.llm.text_token_size, (1, 8)).astype(np.int32)
    for label in ("cold", "warm"):
        r1 = eng.submit(jax.random.PRNGKey(7), ids_long)
        t_done1 = []
        th = threading.Thread(target=lambda: (
            [None for _ in r1.chunks()], t_done1.append(time.perf_counter())))
        th.start()
        base_seg = eng.segments_run
        while eng.segments_run < base_seg + 2:  # r1 is mid-decode
            time.sleep(0.01)
        t_sub = time.perf_counter()
        r2 = eng.submit(jax.random.PRNGKey(8), ids_short)
        ttfa2 = None
        for c in r2.chunks():
            if ttfa2 is None:
                ttfa2 = time.perf_counter() - t_sub
        th.join(timeout=1800)
        drain_left = t_done1[0] - t_sub if t_done1 else float("nan")
        print(f"[B join {label}] newcomer TTFA {ttfa2:.2f}s while the "
              f"running request still had {drain_left:.2f}s of decode left "
              f"(cohort lock-step would have waited for it)", flush=True)
    eng.stop()
    os._exit(0)


if __name__ == "__main__":
    main()
