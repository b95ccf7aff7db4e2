"""On-chip measurement: FULL-parameter joint fine-tune step (no LoRA).

The reference's vendored trainer (cosyvoice/bin/train.py + DDP/DeepSpeed)
trains all parameters; the LoRA path is its L4 specialization.  This probe
measures that regime on one chip: loss + grads over every llm+flow parameter
(~420M) plus the AdamW update, at the production shapes (seq 248 mel /
144 speech tokens), steady-state depth-k enqueue (PERF.md methodology).

Usage: python tools/probe_fullparam.py [B [accum]]
"""

import os
import sys
import time
from functools import partial

os.environ.setdefault("COSY_TPU_NO_CACHE", "1")

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cosy_tpu.config import ModelConfig, TrainConfig
from cosy_tpu.params import cast
import cosy_tpu.models.llm as L
import cosy_tpu.models.flow as F
from cosy_tpu.models.joint import joint_forward_train


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    accum = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    model_cfg = ModelConfig()
    train_cfg = TrainConfig()
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}", file=sys.stderr)

    llm_params = cast(jax.jit(lambda k: L.init_llm_params(k, model_cfg.llm))(key),
                      jnp.bfloat16)
    flow_params = cast(jax.jit(lambda k: F.init_flow_params(k, model_cfg.flow))(key),
                       jnp.bfloat16)
    n_params = sum(int(np.prod(v.shape)) for v in llm_params.values()) + \
        sum(int(np.prod(v.shape)) for v in flow_params.values())
    print(f"total params: {n_params/1e6:.1f}M (bf16)", file=sys.stderr)

    rng = np.random.default_rng(0)
    Tt, Ts, Tm = 32, 144, 248
    super_batch = {
        "text_token": jnp.asarray(rng.integers(0, 1000, (accum, B, Tt)), jnp.int32),
        "text_token_len": jnp.full((accum, B), Tt, jnp.int32),
        "speech_token": jnp.asarray(rng.integers(0, 4096, (accum, B, Ts)), jnp.int32),
        "speech_token_len": jnp.full((accum, B), Ts, jnp.int32),
        "speech_feat": jnp.asarray(rng.standard_normal((accum, B, Tm, 80)) * 2 - 6,
                                   jnp.float32),
        "speech_feat_len": jnp.full((accum, B), Tm, jnp.int32),
        "embedding": jnp.asarray(rng.standard_normal((accum, B, 192)), jnp.float32),
    }

    opt = optax.adamw(1e-5)
    params = {"llm": llm_params, "flow": flow_params}
    opt_state = jax.jit(opt.init)(params)

    def loss_fn(ps, r, micro):
        return joint_forward_train(ps["llm"], ps["flow"], {}, model_cfg,
                                   train_cfg, r, micro, train=True)["loss"]

    donate = os.environ.get("PROBE_DONATE", "1") == "1"

    @partial(jax.jit, donate_argnums=(0, 1) if donate else ())
    def step(ps, ostate, batch, r):
        rngs = jax.random.split(r, accum)

        def body(gsum, xs):
            micro, ri = xs
            g = jax.grad(loss_fn)(ps, ri, micro)
            return jax.tree.map(jnp.add, gsum, g), None

        zero = jax.tree.map(jnp.zeros_like, ps)
        gsum, _ = jax.lax.scan(body, zero, (batch, rngs))
        grads = jax.tree.map(lambda g: g / accum, gsum)
        updates, ostate = opt.update(grads, ostate, ps)
        return optax.apply_updates(ps, updates), ostate

    def sync(tree):
        # through the tunnel block_until_ready returns early; only a
        # device->host fetch of one element truly syncs (PERF.md)
        leaf = jax.tree.leaves(tree)[0]
        np.asarray(jax.jit(lambda x: x.reshape(-1)[:1])(leaf))

    step_key = jax.random.key(3, impl=train_cfg.prng_impl)
    t0 = time.perf_counter()
    p_, o_ = step(params, opt_state, super_batch, step_key)
    sync(p_)
    print(f"compile + first step: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # steady state: one continuous chain through the carried (params,
    # opt_state) — donation invalidates inputs, so never restart the chain
    depth = 8
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(depth):
            p_, o_ = step(p_, o_, super_batch, step_key)
        sync(p_)
        ts.append((time.perf_counter() - t0) / depth)
    t = float(np.median(ts))
    print(f"full-param joint step (bs{B} x accum{accum}, seq {Tm}, "
          f"{n_params/1e6:.0f}M params + AdamW, donate={donate}): "
          f"{t*1e3:.1f} ms/step steady-state ({t*1e3/(B*accum):.2f} ms/sample)")


if __name__ == "__main__":
    main()
