"""int8 decode x AOT executable cache: cold vs warm start on the real chip
(VERDICT r3 next #4).

The int8 weight-only decode program is +21% tok/s but compiled ~20 min
through the tunnel when measured in builder r4 — it shipped opt-in purely
for that compile cost.  The AOT cache exists to amortize exactly this;
this probe measures, cross-process:

  phase cold: build the int8 decode program via aot_jit (compile + persist),
              time build -> first tokens, then steady-state tok/s
  phase warm: fresh process, same cache dir: time build -> first tokens
              (deserialize instead of compile), then steady-state tok/s

Usage:
    python tools/probe_aot_int8.py cold /tmp/aot_int8
    python tools/probe_aot_int8.py warm /tmp/aot_int8
    python tools/probe_aot_int8.py both /tmp/aot_int8   # spawns the two phases
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def run_phase(cache_dir: str, int8: bool = True):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cosy_tpu.config import ModelConfig
    from cosy_tpu.models import llm as L
    from cosy_tpu.params import P, cast
    from cosy_tpu.utils import aot

    aot.set_cache_dir(cache_dir)
    model_cfg = ModelConfig()
    key = jax.random.PRNGKey(0)
    llm_params = cast(jax.jit(lambda k: L.init_llm_params(k, model_cfg.llm))(key),
                      jnp.bfloat16)
    prefix_len, max_len = 64, 256
    prefix = jax.random.normal(key, (1, prefix_len, model_cfg.llm.llm_input_size),
                               jnp.bfloat16)

    def _decode(p, r):
        return L.llm_decode(P(p), model_cfg.llm, r, prefix, prefix_len,
                            jnp.asarray(max_len), max_len, int8_weights=int8)

    fn = aot.aot_jit(_decode, name="probe_int8_decode",
                     salt=f"int8={int8}|probe")
    t0 = time.perf_counter()
    res = fn(llm_params, jax.random.PRNGKey(1))
    n = int(jax.block_until_ready(res.length))
    t_first = time.perf_counter() - t0
    print(f"build->first tokens: {t_first:.1f} s ({n} tokens), "
          f"stats {aot.AOT_STATS}", flush=True)

    # steady-state tok/s (depth-6 enqueue, same methodology as bench.py)
    depth = 6
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        outs = [fn(llm_params, jax.random.PRNGKey(10 + rep * depth + j))
                for j in range(depth)]
        lengths = [int(x) for x in jax.block_until_ready(
            jnp.stack([o.length for o in outs]))]
        ts.append((time.perf_counter() - t0) / sum(lengths))
    tps = 1.0 / float(np.median(ts))
    print(f"steady-state: {tps:.1f} tok/s "
          f"(int8={int8}, hits={aot.AOT_STATS['hits']} "
          f"misses={aot.AOT_STATS['misses']})", flush=True)
    return t_first, tps


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "both"
    cache_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/aot_int8_probe"
    if mode == "both":
        for phase in ("cold", "warm"):
            print(f"== phase {phase}", flush=True)
            rc = subprocess.call(
                [sys.executable, os.path.abspath(__file__), phase, cache_dir])
            if rc != 0:
                sys.exit(rc)
        return
    print(f"[{mode}] cache dir {cache_dir}", flush=True)
    run_phase(cache_dir)
    os._exit(0)  # axon plugin can hang at interpreter exit


if __name__ == "__main__":
    main()
