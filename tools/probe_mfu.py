"""Validate the analytic FLOPs/bytes models (cosy_tpu/ops/costs.py) against
XLA's own compiled cost analysis, at the production bench shapes.

Run on the real chip (or CPU — the HLO flop count is backend-independent for
the matmul/conv work the model counts):

    python tools/probe_mfu.py

For each bench workload it compiles the same program bench.py times, reads
``compiled.cost_analysis()['flops']``, and compares with the closed form.
lax.scan bodies are counted ONCE by XLA, so loop workloads compare the
per-iteration analytic cost against the reported body flops.

Expected agreement: within ~3% (residual = elementwise flops XLA counts and
the analytic model deliberately excludes — see costs.py docstring).
Results of record live in PERF.md ("MFU accounting" section).
"""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosy_tpu.config import ModelConfig, TrainConfig
from cosy_tpu.ctx import EVAL
from cosy_tpu.params import P, cast, KeyGen
from cosy_tpu.models import flow as F, llm as L
from cosy_tpu.ops import costs


def xla_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    d = ca if isinstance(ca, dict) else ca[0]
    return float(d["flops"])


def row(name, analytic, xla):
    dev = (analytic - xla) / xla * 100
    print(f"{name:<42} analytic {analytic/1e9:10.2f} G   xla {xla/1e9:10.2f} G"
          f"   dev {dev:+5.1f}%")
    return dev


def main():
    mc, tc = ModelConfig(), TrainConfig()
    key = jax.random.PRNGKey(0)
    devs = []
    parts = os.environ.get("PROBE_PARTS", "est,solve,joint,bytes").split(",")

    # -- estimator single call at the CFG-doubled headline batch ----------
    from cosy_tpu.layers.unet import init_conditional_decoder, conditional_decoder

    kg = KeyGen(key)
    est_params = {}
    init_conditional_decoder(kg, est_params, "", mc.flow.estimator)
    est_params = cast(est_params, jnp.bfloat16)
    B, T = 8, 512
    x = jax.random.normal(key, (B, 80, T), jnp.bfloat16)
    spks = jax.random.normal(key, (B, 80), jnp.bfloat16)
    t = jnp.full((B,), 0.5, jnp.bfloat16)

    if "est" in parts:
        fx = xla_flops(lambda p, x: conditional_decoder(
            P(p), mc.flow.estimator, x, None, x, t, spks, x, EVAL),
            est_params, x)
        devs.append(row(f"estimator call B{B} T{T}",
                        costs.estimator_call_flops(mc.flow.estimator, B, T).total, fx))

    # -- CFM solve: scan body == one CFG-doubled call + euler axpy --------
    if "solve" in parts:
        z = jax.random.normal(key, (4, 80, T), jnp.bfloat16)
        fx = xla_flops(lambda p, z: F.cfm_solve_euler(
            P(p), mc.flow, z, None, z, spks[:4], jnp.zeros_like(z), 10, EVAL),
            est_params, z)
        devs.append(row("cfm solve scan body (B4 -> CFG 8, T512)",
                        costs.cfm_solve_flops(mc.flow, 4, T, 10) / 10, fx))

    # -- joint train micro-step (the scan body of the bench step) ---------
    from cosy_tpu.models.joint import joint_forward_train
    from cosy_tpu.lora import init_lora

    llm_params = cast(jax.jit(lambda k: L.init_llm_params(k, mc.llm))(key), jnp.bfloat16)
    flow_params = cast(jax.jit(lambda k: F.init_flow_params(k, mc.flow))(key), jnp.bfloat16)
    loras = {
        "llm": init_lora(jax.random.fold_in(key, 1), llm_params, tc.llm_lora),
        "flow": init_lora(jax.random.fold_in(key, 2), flow_params, tc.flow_lora),
    }
    rng = np.random.default_rng(0)
    Tt, Ts, Tm = 32, 144, 248
    # the bench's own scan-accumulated step at accum=1: the scan body (one
    # micro fwd+bwd) is counted ONCE by cost analysis, so reported ~= the
    # per-micro cost.  (A scan-less jit(grad) of the same loss stalls the
    # remote compile service for 30+ min and then breaks its pipe — the
    # scan-wrapped form is the production path and compiles in minutes.)
    for B in ([8, 1] if "joint" in parts else []):
        batch = {
            "text_token": jnp.asarray(rng.integers(0, 1000, (1, B, Tt)), jnp.int32),
            "text_token_len": jnp.full((1, B), Tt, jnp.int32),
            "speech_token": jnp.asarray(rng.integers(0, 4096, (1, B, Ts)), jnp.int32),
            "speech_token_len": jnp.full((1, B), Ts, jnp.int32),
            "speech_feat": jnp.asarray(rng.standard_normal((1, B, Tm, 80)), jnp.float32),
            "speech_feat_len": jnp.full((1, B), Tm, jnp.int32),
            "embedding": jnp.asarray(rng.standard_normal((1, B, 192)), jnp.float32),
        }

        def loss_fn(loras, llm_p, flow_p, r, micro):
            return joint_forward_train(llm_p, flow_p, loras, mc,
                                       tc, r, micro, train=True)["loss"]

        # params as ARGUMENTS (as bench.py does), never closed over:
        # closure bakes the 300M tree into the HLO as constants, which
        # stalls compilation for 30+ min and overflows the remote compile
        # service's request limit (HTTP 413)
        def step(loras, llm_p, flow_p, batch, r):
            rngs = jax.random.split(r, 1)

            def body(gsum, xs):
                micro, ri = xs
                g = jax.grad(loss_fn)(loras, llm_p, flow_p, ri, micro)
                return jax.tree.map(jnp.add, gsum, g), None

            zero = jax.tree.map(jnp.zeros_like, loras)
            gsum, _ = jax.lax.scan(body, zero, (batch, rngs))
            return gsum

        step_key = jax.random.key(3, impl=tc.prng_impl)
        fx = xla_flops(step, loras, llm_params, flow_params, batch, step_key)
        devs.append(row(f"joint micro fwd+bwd B{B} (scan body)",
                        costs.joint_step_flops(mc, tc, B, 1, Tt, Ts, Tm), fx))

    # -- decode bytes: weight term vs the actual param tree ---------------
    if "bytes" in parts:
        bpt = costs.decode_bytes_per_token(llm_params, mc.llm, 64 + 256)
        bpt8 = costs.decode_bytes_per_token(llm_params, mc.llm, 64 + 256,
                                            int8_weights=True)
        print(f"{'decode bytes/token (S=320)':<42} bf16 {bpt/1e6:8.1f} MB"
              f"   int8 {bpt8/1e6:8.1f} MB")

    worst = max(abs(d) for d in devs) if devs else 0.0
    print(f"\nworst |deviation|: {worst:.1f}%  ({'OK' if worst < 5 else 'INVESTIGATE'})")
    os._exit(0 if worst < 5 else 1)


if __name__ == "__main__":
    main()
