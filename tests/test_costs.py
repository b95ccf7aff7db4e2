"""Analytic FLOPs/bytes cost models (ops/costs.py) vs XLA's own count.

The MFU secondaries bench.py reports every driver round (cfm_mfu_pct /
joint_mfu_pct / decode_hbm_pct) are computed from these closed forms, so
they are pinned two ways:

- structurally: a tiny estimator config compiles on CPU and the analytic
  count must track ``compiled.cost_analysis()['flops']`` (the model skips
  elementwise work on purpose, so it sits a few % BELOW XLA's count);
- at production scale: the headline-config numbers are pinned to the
  XLA values recorded on the real chip (tools/probe_mfu.py) — an
  architecture or formula edit that shifts the cost >2% fails loudly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosy_tpu.config import EstimatorConfig, ModelConfig, TrainConfig
from cosy_tpu.ctx import EVAL
from cosy_tpu.params import P, KeyGen
from cosy_tpu.ops import costs


def _xla_flops(fn, *args):
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    d = ca if isinstance(ca, dict) else ca[0]
    return float(d["flops"])


def test_estimator_flops_tracks_xla_cost_analysis():
    from cosy_tpu.layers.unet import conditional_decoder, init_conditional_decoder

    cfg = EstimatorConfig(channels=(32, 32), n_blocks=1, num_mid_blocks=2,
                          num_heads=2, attention_head_dim=16)
    kg = KeyGen(jax.random.PRNGKey(0))
    p = {}
    init_conditional_decoder(kg, p, "", cfg)
    B, T = 2, 64
    x = jnp.ones((B, 80, T), jnp.float32)
    t = jnp.full((B,), 0.5)
    spks = jnp.ones((B, 80))
    fx = _xla_flops(lambda p, x: conditional_decoder(
        P(p), cfg, x, None, x, t, spks, x, EVAL), p, x)
    an = costs.estimator_call_flops(cfg, B, T).total
    dev = (an - fx) / fx
    # the model excludes elementwise flops, so it must sit slightly BELOW
    # XLA's count — never above, never far below
    assert -0.08 < dev <= 0.005, f"analytic {an:.3e} vs xla {fx:.3e} ({dev:+.1%})"


def test_production_costs_pinned_to_recorded_xla_values():
    """Headline-shape closed forms vs the XLA cost-analysis values recorded
    on the real chip (tools/probe_mfu.py, builder R5).  A drift here means
    either the architecture or the formula changed — re-run the probe and
    re-pin deliberately."""
    mc, tc = ModelConfig(), TrainConfig()
    est = costs.estimator_call_flops(mc.flow.estimator, 8, 512).total
    assert abs(est - 451.847e9) / 451.847e9 < 0.02, est / 1e9
    # solve = nfe CFG-doubled calls
    assert costs.cfm_solve_flops(mc.flow, 4, 512, 10) == pytest.approx(10 * est)
    # joint micro fwd+bwd vs the scan-body cost recorded on chip
    jb8 = costs.joint_step_flops(mc, tc, 8, 1, 32, 144, 248)
    assert abs(jb8 - 1767.40e9) / 1767.40e9 < 0.025, jb8 / 1e9
    jb1_micro = costs.joint_step_flops(mc, tc, 1, 1, 32, 144, 248)
    assert abs(jb1_micro - 231.91e9) / 231.91e9 < 0.03, jb1_micro / 1e9
    # joint step scales linearly in accum at fixed micro shape
    j1 = costs.joint_step_flops(mc, tc, 8, 1, 32, 144, 248)
    j2 = costs.joint_step_flops(mc, tc, 8, 2, 32, 144, 248)
    assert j2 == pytest.approx(2 * j1)
    # b8 x accum2 and b1 x accum16 do the same per-sample model work up to
    # the batch-1 overhead of the shared pos-emb projection (rel_pos
    # linear_pos is batch-independent, so 16 micros pay it 16x)
    j_b1 = costs.joint_step_flops(mc, tc, 1, 16, 32, 144, 248)
    assert j_b1 / j2 == pytest.approx(1.0, abs=0.15)


def test_decode_bytes_model_invariants():
    from cosy_tpu.config import EncoderConfig, LLMConfig, replace
    from cosy_tpu.models import llm as L

    enc = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                        linear_units=24, num_blocks=2)
    cfg = LLMConfig(text_encoder_input_size=16, llm_input_size=16,
                    llm_output_size=16, text_token_size=40, speech_token_size=30,
                    spk_embed_dim=12,
                    text_encoder=replace(enc, static_chunk_size=1),
                    llm=replace(enc, static_chunk_size=1,
                                input_layer="linear_legacy"))
    p = L.init_llm_params(jax.random.PRNGKey(0), cfg)
    p16 = {k: v.astype(jnp.bfloat16) for k, v in p.items()}
    b_bf16 = costs.decode_bytes_per_token(p16, cfg, 64)
    b_int8 = costs.decode_bytes_per_token(p16, cfg, 64, int8_weights=True)
    assert b_int8 < b_bf16  # halved 2-D weight stream
    # KV term grows with capacity
    assert costs.decode_bytes_per_token(p16, cfg, 128) > b_bf16
    # weight term covers the decode stack: at least the raw block params
    blk = sum(int(np.prod(v.shape)) * 2 for k, v in p16.items()
              if k.startswith("llm.encoders."))
    assert b_bf16 > blk * 0.9
