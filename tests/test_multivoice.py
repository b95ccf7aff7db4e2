"""Multi-voice LoRA serving: un-merged adapters applied inside the decode
loop and routed per batch row (the TPU-native equivalent of vLLM multi-LoRA
— the reference's serving plugin declares SupportsLoRA,
cosyvoice/vllm/cosyvoice2.py:29, but the reference itself can only merge one
voice into a full model copy; here ONE base model serves many voices with
~2 M adapter params each).

All equivalences run in f64 so reduction-order noise cannot flip a sampling
decision:
- solo decode with adapters == decode over MERGED weights (same voice);
- batch decode with per-row voice ids == per-voice solo decode;
- mid-flight admission carries the request's voice;
- flow_inference with adapters == flow_inference over merged flow params.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosy_tpu.config import (EncoderConfig, EstimatorConfig, FlowConfig,
                             LLMConfig, LoRAConfig, replace)
from cosy_tpu.ctx import Ctx
from cosy_tpu.models import flow as F, llm as L
from cosy_tpu.params import P
from cosy_tpu import lora as LORA


def _llm_cfg():
    enc = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                        linear_units=24, num_blocks=2)
    return LLMConfig(
        text_encoder_input_size=16, llm_input_size=16, llm_output_size=16,
        text_token_size=40, speech_token_size=30, spk_embed_dim=12,
        text_encoder=replace(enc, static_chunk_size=1),
        llm=replace(enc, static_chunk_size=1, input_layer="linear_legacy"))


LCFG = LoRAConfig(r=2, alpha=4.0, dropout=0.0,
                  target_modules=("linear_q", "linear_k", "linear_v",
                                  "linear_out", "w_1", "w_2"))


def _voices(params, n, seed=7):
    return [LORA.init_lora(jax.random.PRNGKey(seed + i), params, LCFG)
            for i in range(n)]


def _f64(d):
    return {k: jnp.asarray(v, jnp.float64) for k, v in d.items()}


@pytest.fixture(scope="module")
def llm_setup():
    with jax.enable_x64(True):
        cfg = _llm_cfg()
        params = _f64(L.init_llm_params(jax.random.PRNGKey(0), cfg))
        voices = [_f64(v) for v in _voices(params, 3)]
        prefix = jax.random.normal(jax.random.PRNGKey(1), (1, 6, 16),
                                   jnp.float64)
        yield cfg, params, voices, prefix


def test_solo_decode_adapters_match_merged(llm_setup):
    with jax.enable_x64(True):
        cfg, params, voices, prefix = llm_setup
        scale = LCFG.alpha / LCFG.r
        rng = jax.random.PRNGKey(5)
        for v, lora in enumerate(voices[:2]):
            merged = LORA.merge_lora(params, lora, scale)
            r_m = L.llm_decode(P(merged), cfg, rng, prefix, 6,
                               jnp.asarray(2), 12)
            r_a = L.llm_decode(P(params), cfg, rng, prefix, 6,
                               jnp.asarray(2), 12, lora=lora,
                               lora_scale=scale)
            np.testing.assert_array_equal(np.asarray(r_a.tokens),
                                          np.asarray(r_m.tokens),
                                          err_msg=f"voice {v}")


def test_stacked_solo_decode_selects_voice(llm_setup):
    """Voice-stacked dict + vid must equal the single-voice adapter run."""
    with jax.enable_x64(True):
        cfg, params, voices, prefix = llm_setup
        scale = LCFG.alpha / LCFG.r
        stacked = LORA.stack_voice_loras(voices)
        rng = jax.random.PRNGKey(6)
        for v in (0, 2):
            r_one = L.llm_decode(P(params), cfg, rng, prefix, 6,
                                 jnp.asarray(2), 12, lora=voices[v],
                                 lora_scale=scale)
            r_st = L.llm_decode(P(params), cfg, rng, prefix, 6,
                                jnp.asarray(2), 12, lora=stacked,
                                vid=jnp.asarray(v), lora_scale=scale)
            np.testing.assert_array_equal(np.asarray(r_st.tokens),
                                          np.asarray(r_one.tokens))


def test_batch_decode_routes_per_row(llm_setup):
    """Each batch row must decode exactly like a solo run with its own
    voice's adapters (rngs are fold_in(rng, b), matching llm_decode_batch's
    per-sample streams)."""
    with jax.enable_x64(True):
        cfg, params, voices, _ = llm_setup
        scale = LCFG.alpha / LCFG.r
        stacked = LORA.stack_voice_loras(voices)
        B = 3
        prefix = jax.random.normal(jax.random.PRNGKey(2), (B, 6, 16),
                                   jnp.float64)
        valid = jnp.asarray([6, 4, 5])
        mins = jnp.asarray([2, 2, 2])
        vids = jnp.asarray([2, 0, 1])
        rng = jax.random.PRNGKey(8)

        r_b = L.llm_decode_batch(P(params), cfg, rng, prefix, valid, mins, 12,
                                 lora=stacked, vids=vids, lora_scale=scale)
        for b in range(B):
            v = int(vids[b])
            pv = int(valid[b])
            solo_prefix = prefix[b:b + 1, 6 - pv:]
            r_s = L.llm_decode(P(params), cfg, jax.random.fold_in(rng, b),
                               solo_prefix, pv, jnp.asarray(2), 12,
                               lora=voices[v], lora_scale=scale)
            np.testing.assert_array_equal(np.asarray(r_b.tokens[b]),
                                          np.asarray(r_s.tokens),
                                          err_msg=f"row {b} voice {v}")


def test_admit_slot_carries_voice(llm_setup):
    """A request admitted mid-flight with voice v must produce v's solo
    token stream."""
    with jax.enable_x64(True):
        cfg, params, voices, _ = llm_setup
        scale = LCFG.alpha / LCFG.r
        stacked = LORA.stack_voice_loras(voices)
        B = 2
        prefix = jax.random.normal(jax.random.PRNGKey(3), (B, 6, 16),
                                   jnp.float64)
        valid = jnp.asarray([6, 6])
        mins = jnp.asarray([2, 2])
        vids = jnp.asarray([0, 1])
        rng = jax.random.PRNGKey(9)

        # run 3 segment steps, then admit a voice-2 request into slot 1
        _, st = L.llm_decode_batch(P(params), cfg, rng, prefix, valid, mins,
                                   12, lora=stacked, vids=vids,
                                   lora_scale=scale, stop_at=jnp.asarray(3),
                                   return_state=True)
        req_rng = jax.random.PRNGKey(77)
        new_prefix = jax.random.normal(jax.random.PRNGKey(4), (1, 6, 16),
                                       jnp.float64)
        st = L.llm_admit_slot(P(params), cfg, st, new_prefix, jnp.asarray(6),
                              req_rng, jnp.asarray(1), jnp.asarray(12),
                              lora=stacked, vid=jnp.asarray(2),
                              lora_scale=scale)
        vids2 = jnp.asarray([0, 2])
        r_b, _ = L.llm_decode_batch(P(params), cfg, rng, prefix, valid, mins,
                                    12, lora=stacked, vids=vids2,
                                    lora_scale=scale, state=st,
                                    stop_at=jnp.asarray(24),
                                    return_state=True)
        r_s = L.llm_decode(P(params), cfg, req_rng, new_prefix, 6,
                           jnp.asarray(2), 12, lora=voices[2],
                           lora_scale=scale)
        n = int(r_s.length)
        np.testing.assert_array_equal(np.asarray(r_b.tokens[1][:n]),
                                      np.asarray(r_s.tokens[:n]))


@pytest.mark.slow
def test_flow_inference_adapters_match_merged():
    with jax.enable_x64(True):
        enc = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                            linear_units=24, num_blocks=1)
        cfg = FlowConfig(
            input_size=16, output_size=80, spk_embed_dim=12, vocab_size=30,
            encoder=enc,
            estimator=EstimatorConfig(in_channels=320, out_channels=80,
                                      channels=(16, 16), attention_head_dim=4,
                                      n_blocks=1, num_mid_blocks=1,
                                      num_heads=2))
        fl_cfg = LoRAConfig(r=2, alpha=4.0, dropout=0.0,
                            target_modules=("to_q", "to_k", "to_v",
                                            "linear_q", "linear_k",
                                            "linear_v", "w_1", "w_2"))
        params = _f64(F.init_flow_params(jax.random.PRNGKey(0), cfg))
        lora = _f64(LORA.init_lora(jax.random.PRNGKey(11), params, fl_cfg))
        scale = fl_cfg.alpha / fl_cfg.r
        tok = jax.random.randint(jax.random.PRNGKey(1), (1, 8), 0,
                                 cfg.vocab_size)
        spk = jax.random.normal(jax.random.PRNGKey(2), (1, 12), jnp.float64)
        rng = jax.random.PRNGKey(3)

        def run(p, lo):
            return F.flow_inference(
                P(p), cfg, rng, tok, jnp.zeros((1, 0), jnp.int32),
                jnp.zeros((1, 0, 80), jnp.float64), spk, n_timesteps=4,
                finetuned_norm=True, lora=lo, lora_scale=scale)

        merged = LORA.merge_lora(params, lora, scale)
        r_m = np.asarray(run(merged, None))
        r_a = np.asarray(run(params, lora))
        # flow computes in f32 internally: merged-weights vs factored-delta
        # differ by f32 rounding of W + BA vs Wx + B(Ax)
        np.testing.assert_allclose(r_a, r_m, rtol=2e-3, atol=2e-3)
        # and the adapters actually change the output
        r_0 = np.asarray(run(params, None))
        assert np.abs(r_a - r_0).max() > 1e-3


def test_stacked_conv1x1_routing_both_layouts():
    """The voice-stacked 1x1-conv LoRA branches (layers/basic.py
    _conv1x1_lora_delta): per-row routing equals each voice's solo delta in
    BOTH conv layouts, and a stacked dict without Ctx.lora_vids raises the
    explicit error (not an opaque trace failure)."""
    from cosy_tpu.layers.basic import conv1d, conv1d_nwc

    with jax.enable_x64(True):
        rng = np.random.default_rng(0)
        V, B, Cin, Cout, T, r = 3, 4, 6, 5, 7, 2
        params = {"c.weight": jnp.asarray(rng.standard_normal((Cout, Cin, 1))),
                  "c.bias": jnp.asarray(rng.standard_normal((Cout,)))}
        a = jnp.asarray(rng.standard_normal((V, r, Cin, 1)))
        b = jnp.asarray(rng.standard_normal((V, Cout, r, 1)))
        vids = jnp.asarray(rng.integers(0, V, (B,)), jnp.int32)
        x_nct = jnp.asarray(rng.standard_normal((B, Cin, T)))

        stacked = Ctx(lora={"c.lora_A.weight": a, "c.lora_B.weight": b},
                      lora_scale=2.0, lora_vids=vids)
        got = conv1d(P(params), "c", x_nct, ctx=stacked)
        got_nwc = conv1d_nwc(P(params), "c", x_nct.transpose(0, 2, 1),
                             ctx=stacked)
        for i in range(B):
            solo = Ctx(lora={"c.lora_A.weight": a[vids[i]],
                             "c.lora_B.weight": b[vids[i]]}, lora_scale=2.0)
            want = conv1d(P(params), "c", x_nct[i:i + 1], ctx=solo)
            np.testing.assert_allclose(np.asarray(got[i]),
                                       np.asarray(want[0]), atol=1e-12)
            np.testing.assert_allclose(np.asarray(got_nwc[i]),
                                       np.asarray(want[0]).T, atol=1e-12)

        no_vids = Ctx(lora={"c.lora_A.weight": a, "c.lora_B.weight": b},
                      lora_scale=2.0)
        with pytest.raises(ValueError, match="lora_vids"):
            conv1d(P(params), "c", x_nct, ctx=no_vids)
        with pytest.raises(ValueError, match="lora_vids"):
            conv1d_nwc(P(params), "c", x_nct.transpose(0, 2, 1), ctx=no_vids)


def test_decode_lora_unsupported_target_raises(llm_setup):
    """Adapter keys the decode loop cannot route (e.g. a custom 'decoder'
    target hitting llm_decoder) fail loudly at stack time instead of being
    silently dropped mid-decode."""
    cfg, params, voices, prefix = llm_setup
    bad = dict(voices[0])
    bad["llm_decoder.lora_A"] = jnp.zeros((2, 16))
    bad["llm_decoder.lora_B"] = jnp.zeros((cfg.speech_token_size + 1, 2))
    with pytest.raises(ValueError, match="silently ignored"):
        L._stack_decode_loras(LORA.ensure_voice_stacked(bad),
                              cfg.llm.num_blocks)
    # text_encoder adapters are prefill-only and stay allowed
    ok = {k: v for k, v in voices[0].items()}
    L._stack_decode_loras(LORA.ensure_voice_stacked(ok), cfg.llm.num_blocks)
