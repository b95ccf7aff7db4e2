"""On-chip decomposition of the b8 x accum2 joint LoRA train step.

PERF.md's flop floor says ~1.9 ms/sample (0.37 TFLOP at 198 TFLOP/s) but the
measured step is ~7.3 ms/sample — this probe splits the gap by timing step
variants: joint vs llm_only vs flow_only, each with and without dropout, and
forward-only vs grad.  Steady-state depth-k methodology (PERF.md).

Usage: python tools/probe_trainstep.py
"""

import dataclasses
import os

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from cosy_tpu.config import ModelConfig, TrainConfig
from cosy_tpu.params import P, cast
from cosy_tpu.lora import init_lora
from cosy_tpu.models.joint import joint_forward_train
import cosy_tpu.models.llm as L
import cosy_tpu.models.flow as F


def zero_dropout(obj):
    """Recursively return a copy of a (frozen) dataclass tree with every
    float field whose name mentions 'dropout' set to 0.0 (bool *_enabled
    dropout switches set False)."""
    if not dataclasses.is_dataclass(obj):
        return obj
    updates = {}
    for f in dataclasses.fields(obj):
        v = getattr(obj, f.name)
        if dataclasses.is_dataclass(v):
            nv = zero_dropout(v)
            if nv is not v:
                updates[f.name] = nv
        elif "dropout" in f.name:
            if isinstance(v, bool):
                updates[f.name] = False
            elif isinstance(v, float) and v != 0.0:
                updates[f.name] = 0.0
    return dataclasses.replace(obj, **updates) if updates else obj


def _sync(out):
    np.asarray(jax.device_get(jnp.ravel(jax.tree.leaves(out)[0])[0]))


def step_ms(model_cfg, train_cfg, B, accum, grad=True, depth=6):
    key = jax.random.PRNGKey(0)
    llm_params = cast(jax.jit(lambda k: L.init_llm_params(k, model_cfg.llm))(key), jnp.bfloat16)
    flow_params = cast(jax.jit(lambda k: F.init_flow_params(k, model_cfg.flow))(key), jnp.bfloat16)
    loras = {
        "llm": init_lora(jax.random.fold_in(key, 1), llm_params, train_cfg.llm_lora),
        "flow": init_lora(jax.random.fold_in(key, 2), flow_params, train_cfg.flow_lora),
    }
    rng = np.random.default_rng(0)
    Tt, Ts, Tm = 32, 144, 248
    super_batch = {
        "text_token": jnp.asarray(rng.integers(0, 1000, (accum, B, Tt)), jnp.int32),
        "text_token_len": jnp.full((accum, B), Tt, jnp.int32),
        "speech_token": jnp.asarray(rng.integers(0, 4096, (accum, B, Ts)), jnp.int32),
        "speech_token_len": jnp.full((accum, B), Ts, jnp.int32),
        "speech_feat": jnp.asarray(rng.standard_normal((accum, B, Tm, 80)) * 2 - 6, jnp.float32),
        "speech_feat_len": jnp.full((accum, B), Tm, jnp.int32),
        "embedding": jnp.asarray(rng.standard_normal((accum, B, 192)), jnp.float32),
    }

    # params as explicit jit args (closing over them embeds the 420M-param
    # trees as consts in the serialized remote-compile payload -> HTTP 413)
    def loss_fn(lo, llm_p, flow_p, r, micro):
        return joint_forward_train(llm_p, flow_p, lo, model_cfg,
                                   train_cfg, r, micro, train=True)["loss"]

    def step(lo, llm_p, flow_p, batch, r):
        rngs = jax.random.split(r, accum)

        def body(acc_g, xs):
            micro, ri = xs
            if grad:
                g = jax.grad(loss_fn)(lo, llm_p, flow_p, ri, micro)
                return jax.tree.map(jnp.add, acc_g, g), None
            return jax.tree.map(jnp.add, acc_g,
                                {"l": loss_fn(lo, llm_p, flow_p, ri, micro)}), None

        init = (jax.tree.map(jnp.zeros_like, lo) if grad
                else {"l": jnp.zeros((), jnp.float32)})
        out, _ = jax.lax.scan(body, init, (batch, rngs))
        return out

    fn = jax.jit(step)
    r = jax.random.key(0, impl=train_cfg.prng_impl)
    out = fn(loras, llm_params, flow_params, super_batch, r)
    _sync(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(loras, llm_params, flow_params, super_batch, r)
                for _ in range(depth)]
        _sync(outs[-1])
        ts.append((time.perf_counter() - t0) / depth)
    return float(np.median(ts)) * 1e3


def main():
    B, accum = 8, 2
    mcfg = ModelConfig()
    tcfg = TrainConfig()
    mcfg0, tcfg0 = zero_dropout(mcfg), zero_dropout(tcfg)
    print(f"devices: {jax.devices()}", file=sys.stderr)
    rows = [
        ("joint grad", mcfg, tcfg, True),
        ("joint grad, no dropout", mcfg0, tcfg0, True),
        ("joint fwd only", mcfg, tcfg, False),
        ("joint fwd only, no dropout", mcfg0, tcfg0, False),
        ("llm_only grad", mcfg, dataclasses.replace(tcfg, training_mode="llm_only"), True),
        ("llm_only grad, no dropout", mcfg0, dataclasses.replace(tcfg0, training_mode="llm_only"), True),
        ("flow_only grad", mcfg, dataclasses.replace(tcfg, training_mode="flow_only"), True),
        ("flow_only grad, no dropout", mcfg0, dataclasses.replace(tcfg0, training_mode="flow_only"), True),
    ]
    for name, mc, tc, g in rows:
        t = step_ms(mc, tc, B, accum, grad=g)
        print(f"{name:34s}: {t:7.1f} ms/step ({t/(B*accum):5.2f} ms/sample)",
              flush=True)
    os._exit(0)


if __name__ == "__main__":
    main()
