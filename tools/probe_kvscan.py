"""Probe: does batched-decode per-token cost scale with TOTAL cache width S?

Hypothesis: models/llm.py run_layers carries kv_buf through lax.scan as
xs/ys, which may materialize (copy) the full (2,B,H,S,dk) slice per layer
per token instead of aliasing in place.  If so, per-token cost grows with S
even when the generated token count is fixed — and restructuring the KV
buffer into the loop carry (dus in place, narrow reads) is a big win.

Method: llm_decode_batch at fixed generated tokens (stop_at=64) with
max_len in {64, 512} (S = L0 + max_len).  Steady-state via depth-k enqueue
(PERF.md methodology).  --cv2 probes qwen2lm_decode_batch instead (unrolled
layer loop + .at[li].set pattern, GQA cache).
"""

import os
import sys
import time

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from cosy_tpu.config import ModelConfig
from cosy_tpu.models import llm as L
from cosy_tpu.params import P, cast


def main():
    cv2 = "--cv2" in sys.argv
    rng = jax.random.PRNGKey(0)
    if cv2:
        from cosy_tpu.models import qwen2lm as Q

        cfg = Q.Qwen2LMConfig()
        params = cast(jax.jit(lambda k: Q.init_qwen2lm_params(k, cfg))(rng),
                      jnp.bfloat16)
        decode_batch, din = Q.qwen2lm_decode_batch, cfg.llm_input_size
    else:
        cfg = ModelConfig().llm
        params = cast(jax.jit(lambda k: L.init_llm_params(k, cfg))(rng),
                      jnp.bfloat16)
        decode_batch, din = L.llm_decode_batch, cfg.llm_input_size

    B, L0 = 8, 64
    prefix = jax.random.normal(jax.random.PRNGKey(2), (B, L0, din),
                               jnp.bfloat16)
    valid = jnp.full((B,), L0, jnp.int32)
    min_len = jnp.full((B,), 2, jnp.int32)

    def run(max_len, stop, label, depth=4, iters=3, attend_width=None):
        fn = jax.jit(
            lambda p_, r_, pre, v, ml: decode_batch(
                P(p_), cfg, r_, pre, v, ml, max_len=max_len,
                stop_at=jnp.asarray(stop), return_state=True,
                attend_width=attend_width))
        _, st = fn(params, rng, prefix, valid, min_len)
        float(jnp.asarray(st.i)[...])  # sync
        best = 1e9
        for _ in range(iters):
            t0 = time.time()
            outs = [fn(params, jax.random.fold_in(rng, k), prefix, valid,
                       min_len) for k in range(depth)]
            for _, s in outs:
                float(jnp.asarray(s.i)[...])
            dt = (time.time() - t0) / depth
            best = min(best, dt)
        print(f"{label}: S={L0+max_len} stop={stop} -> {best*1e3:.1f} ms "
              f"({best*1e3/stop:.3f} ms/step, B{B})", flush=True)
        return best

    t_small = run(64, 64, "max_len=64 ")
    t_big = run(512, 64, "max_len=512")
    print(f"S-dependence ratio (same 64 steps): {t_big / t_small:.2f}x")
    # attend_width rung: same 64 steps on the S=576 cache, reading only the
    # first 128/256 columns (exact — every live key is below the rung)
    run(512, 64, "max_len=512 W=128", attend_width=128)
    run(512, 64, "max_len=512 W=256", attend_width=256)
    os._exit(0)


if __name__ == "__main__":
    main()
