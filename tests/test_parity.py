"""Golden parity tests: cosy_tpu vs recorded reference activations.

Fixtures in tests/goldens/*.npz were produced by tools/make_goldens.py from
the reference torch implementation on tiny seeded configs.  Every test loads
the recorded torch state_dict directly into a cosy_tpu flat param dict
(identity mapping — that is the point of the naming scheme) and compares
outputs.
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cosy_tpu.config import EncoderConfig, EstimatorConfig, FlowConfig, LLMConfig, CFMConfig, replace
from cosy_tpu.ctx import Ctx, EVAL
from cosy_tpu.params import P
from cosy_tpu.layers.conformer import encoder_forward, transformer_layer
from cosy_tpu.layers.unet import conditional_decoder
from cosy_tpu.models import flow as Fl
from cosy_tpu.models import llm as Lm

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def load_golden(name):
    blob = np.load(os.path.join(GOLDEN_DIR, name + ".npz"))
    params, ins, outs = {}, {}, {}
    for k in blob.files:
        kind, key = k.split(":", 1)
        arr = blob[k]
        if kind == "param":
            # large goldens store f16-representable params as float16 to
            # keep the repo small; compute always runs f32
            params[key] = jnp.asarray(arr, jnp.float32)
        elif kind == "pshape":
            # seeded golden: regenerate the exact per-name values the torch
            # generator used (tools/make_goldens2.py seed_module)
            from golden_seed import seeded_param

            params[key] = jnp.asarray(seeded_param(key, arr))
        elif kind == "in":
            ins[key] = arr
        else:
            outs[key] = arr
    return params, ins, outs


def assert_close(got, want, atol=2e-4, rtol=2e-4, name=""):
    got = np.asarray(got)
    np.testing.assert_allclose(got, want, atol=atol, rtol=rtol, err_msg=name)


# ---------------------------------------------------------------------------
# Encoders
# ---------------------------------------------------------------------------


L4_ENC = EncoderConfig(
    input_size=12, output_size=16, attention_heads=2, linear_units=24,
    num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
    attention_dropout_rate=0.0, use_cnn_module=False, macaron_style=False,
    layer_norm_eps=1e-5,
)


def test_conformer_l4_no_xscale():
    params, ins, outs = load_golden("conformer_l4")
    y, _ = encoder_forward(P(params), L4_ENC, jnp.asarray(ins["x"]), jnp.asarray(ins["lens"]),
                           EVAL, xscale=False, conformer=True)
    # padded rows are garbage in both implementations; compare valid region
    assert_close(y[0], outs["y"][0], name="sample0")
    assert_close(y[1, :5], outs["y"][1, :5], name="sample1-valid")


def test_conformer_l2_causal_xscale():
    params, ins, outs = load_golden("conformer_l2_causal")
    cfg = replace(L4_ENC, static_chunk_size=1, layer_norm_eps=1e-12)
    y, _ = encoder_forward(P(params), cfg, jnp.asarray(ins["x"]), jnp.asarray(ins["lens"]),
                           EVAL, xscale=True, conformer=True)
    assert_close(y[0], outs["y"][0], name="sample0")
    assert_close(y[1, :5], outs["y"][1, :5], name="sample1-valid")


TR_ENC = EncoderConfig(
    input_size=16, output_size=16, attention_heads=2, linear_units=24,
    num_blocks=2, dropout_rate=0.0, positional_dropout_rate=0.0,
    attention_dropout_rate=0.0, input_layer="linear_legacy",
    static_chunk_size=1, layer_norm_eps=1e-12, activation_type="relu",
)


def test_transformer_l2_causal():
    params, ins, outs = load_golden("transformer_l2_causal")
    y, _ = encoder_forward(P(params), TR_ENC, jnp.asarray(ins["x"]), jnp.asarray(ins["lens"]),
                           EVAL, xscale=True, conformer=False)
    assert_close(y[0], outs["y"][0], name="sample0")
    assert_close(y[1, :4], outs["y"][1, :4], name="sample1-valid")


def test_transformer_l2_incremental_kv_cache():
    """The fixed-capacity KV-cache decode step must match the reference's
    concat-based forward_chunk (llm.py:212-216 -> encoder.py:184-272)."""
    params, ins, outs = load_golden("transformer_l2_chunk")
    p = P(params)
    cfg = TR_ENC
    from cosy_tpu.layers.basic import dense, layer_norm
    from cosy_tpu.layers.attention import _split_heads
    from cosy_tpu.layers.posenc import rel_pos_table

    D, H, dk, nl = 16, 2, 8, 2
    S = 5  # capacity: 4 prefix + 1 step

    def embed(x):
        sp = p.sub("embed")
        h = dense(sp, "out.0", jnp.asarray(x))
        h = layer_norm(sp, "out.1", h, eps=1e-5)
        h = jax.nn.relu(h)
        return h * jnp.sqrt(jnp.asarray(float(D)))

    # ---- prefill over 4 tokens (plain causal pass), capture K/V ----
    x0 = embed(ins["xs1"])
    L0 = x0.shape[1]
    pe0 = rel_pos_table(L0, D)
    causal = jnp.where(jnp.arange(L0)[:, None] >= jnp.arange(L0)[None, :], 0.0, -1e10)[None]
    k_buf = jnp.zeros((nl, 1, H, S, dk))
    v_buf = jnp.zeros((nl, 1, H, S, dk))
    h = x0
    for i in range(nl):
        sp_l = p.sub(f"encoders.{i}")
        hn = layer_norm(sp_l, "norm1", h, eps=cfg.layer_norm_eps)
        k_buf = k_buf.at[i, :, :, :L0].set(_split_heads(dense(sp_l.sub("self_attn"), "linear_k", hn), H))
        v_buf = v_buf.at[i, :, :, :L0].set(_split_heads(dense(sp_l.sub("self_attn"), "linear_v", hn), H))
        h = transformer_layer(p, f"encoders.{i}", cfg, h, causal, pe0, EVAL)
    y1 = layer_norm(p, "after_norm", h, eps=1e-5)
    assert_close(y1, outs["y1"], name="prefill")

    # ---- one cached decode step ----
    table = rel_pos_table(S, D)
    x = embed(ins["xs2"])
    L = L0  # this token's cache slot / absolute position
    bias = jnp.where(jnp.arange(S)[None, None, :] <= L, 0.0, -1e10)
    h = x
    for i in range(nl):
        sp_l = p.sub(f"encoders.{i}")
        pk = _split_heads(dense(sp_l.sub("self_attn"), "linear_pos", table), H)
        pk_win = jax.lax.dynamic_slice(pk, (0, 0, S - 1 - L, 0), (1, H, S, dk))
        h, _ = transformer_layer(p, f"encoders.{i}", cfg, h, bias, None, EVAL,
                                 kv_cache=(k_buf[i], v_buf[i]), cache_index=L, pos_k=pk_win)
    y2 = layer_norm(p, "after_norm", h, eps=1e-5)
    assert_close(y2, outs["y2"], name="decode-step")


# ---------------------------------------------------------------------------
# Estimator / CFM
# ---------------------------------------------------------------------------


EST_CFG = EstimatorConfig(
    in_channels=24, out_channels=6, channels=(16, 16), dropout=0.0,
    attention_head_dim=4, n_blocks=1, num_mid_blocks=2, num_heads=2,
    act_fn="gelu",
)


def test_estimator_forward():
    params, ins, outs = load_golden("estimator")
    y = conditional_decoder(
        P(params), EST_CFG, jnp.asarray(ins["x"]), jnp.asarray(ins["mask"]),
        jnp.asarray(ins["mu"]), jnp.asarray(ins["t"]), jnp.asarray(ins["spks"]),
        jnp.asarray(ins["cond"]), EVAL,
    )
    assert_close(y, outs["y"], name="estimator")


def test_estimator_prompt_isolation():
    params, ins, outs = load_golden("estimator")
    pl = int(ins["prompt_len"])
    y = conditional_decoder(
        P(params), EST_CFG, jnp.asarray(ins["x"]), jnp.asarray(ins["mask"]),
        jnp.asarray(ins["mu"]), jnp.asarray(ins["t"]), jnp.asarray(ins["spks"]),
        jnp.asarray(ins["cond"]), EVAL,
        prompt_lens=jnp.asarray([pl, pl]),
    )
    assert_close(y, outs["y_iso"], name="estimator-isolation")


def test_cfm_solve_euler():
    params, ins, outs = load_golden("cfm_euler")
    cfg = FlowConfig(
        output_size=80,
        estimator=EstimatorConfig(
            in_channels=320, out_channels=80, channels=(16, 16), dropout=0.0,
            attention_head_dim=4, n_blocks=1, num_mid_blocks=1, num_heads=2,
            act_fn="gelu",
        ),
        cfm=CFMConfig(inference_cfg_rate=0.7),
    )
    y = Fl.cfm_solve_euler(
        P(params), cfg, jnp.asarray(ins["z"]), jnp.asarray(ins["mask"]),
        jnp.asarray(ins["mu"]), jnp.asarray(ins["spks"]), jnp.asarray(ins["cond"]),
        int(ins["n_timesteps"]), EVAL,
    )
    assert_close(y, outs["y"], atol=5e-4, rtol=5e-4, name="euler")


# ---------------------------------------------------------------------------
# Length regulator
# ---------------------------------------------------------------------------


def test_regulator_forward():
    params, ins, outs = load_golden("regulator")
    y = Fl.length_regulator(P(params), jnp.asarray(ins["x"]), jnp.asarray(ins["ylens"]),
                            int(ins["ylens"].max()), 4, EVAL)
    assert_close(y, outs["y"], name="regulator")


def test_regulator_inference_three_segment():
    params, ins, outs = load_golden("regulator")
    y = Fl.length_regulator_inference(
        P(params), jnp.asarray(ins["x1"]), jnp.asarray(ins["x2"]), 11, 69, 4, 50)
    assert_close(y, outs["y_inf"], name="regulator-inf")
    y2 = Fl.length_regulator_inference(
        P(params), jnp.asarray(ins["x1"][:, :0]), jnp.asarray(ins["x2"]), 0, 69, 4, 50)
    assert_close(y2, outs["y_inf_np"], name="regulator-inf-noprompt")


# ---------------------------------------------------------------------------
# TransformerLM training forward
# ---------------------------------------------------------------------------


def test_transformer_lm_loss_acc():
    params, ins, outs = load_golden("transformer_lm")
    cfg = LLMConfig(
        text_encoder_input_size=12, llm_input_size=16, llm_output_size=16,
        text_token_size=40, speech_token_size=30, spk_embed_dim=10,
        text_encoder=replace(L4_ENC, layer_norm_eps=1e-12, static_chunk_size=1),
        llm=TR_ENC,
    )
    batch = {k: jnp.asarray(v) for k, v in ins.items()}
    res = Lm.llm_forward_train(P(params), cfg, batch, EVAL)
    assert_close(res["loss"], outs["loss"], name="lm-loss")
    assert_close(res["acc"], outs["acc"], name="lm-acc")


# ---------------------------------------------------------------------------
# LoRA
# ---------------------------------------------------------------------------


def test_lora_forward_and_merge():
    params, ins, outs = load_golden("lora")
    # reference stored LoRA-wrapped modules: *.original_layer.weight + lora_A/B
    base = {
        "linear_q.weight": params["linear_q.original_layer.weight"],
        "linear_q.bias": params["linear_q.original_layer.bias"],
        "w_1.weight": params["w_1.original_layer.weight"],
        "w_1.bias": params["w_1.original_layer.bias"],
    }
    lora = {
        "linear_q.lora_A": params["linear_q.lora_A"],
        "linear_q.lora_B": params["linear_q.lora_B"],
        "w_1.lora_A": params["w_1.lora_A"],
        "w_1.lora_B": params["w_1.lora_B"],
    }
    from cosy_tpu.layers.basic import dense

    ctx = Ctx(lora=lora, lora_scale=4 / 2, lora_dropout=0.0)
    x = jnp.asarray(ins["x"])
    y = dense(P(base), "w_1", dense(P(base), "linear_q", x, ctx), ctx)
    assert_close(y, outs["y"], name="lora-forward")

    from cosy_tpu.lora import merge_lora

    merged = merge_lora(base, lora, scaling=4 / 2)
    for k in ("linear_q.weight", "linear_q.bias", "w_1.weight", "w_1.bias"):
        assert_close(merged[k], outs["merged:" + k], name=f"merged-{k}")
    y_m = dense(P(merged), "w_1", dense(P(merged), "linear_q", x))
    assert_close(y_m, outs["y_merged"], name="lora-merged-forward")


def test_llm_decode_int8_weights_smoke():
    """int8 weight-only decode runs and produces a valid token stream
    (bs=1 decode is weight-bandwidth-bound; llm.py int8_weights path)."""
    from cosy_tpu.config import EncoderConfig, LLMConfig, replace as _rep

    enc = EncoderConfig(input_size=16, output_size=16, attention_heads=2,
                        linear_units=24, num_blocks=2)
    cfg = LLMConfig(
        text_encoder_input_size=16, llm_input_size=16, llm_output_size=16,
        text_token_size=40, speech_token_size=30, spk_embed_dim=12,
        text_encoder=_rep(enc, static_chunk_size=1),
        llm=_rep(enc, static_chunk_size=1, input_layer="linear_legacy"))
    params = Lm.init_llm_params(jax.random.PRNGKey(0), cfg)
    prefix = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16))
    res_bf = Lm.llm_decode(P(params), cfg, jax.random.PRNGKey(2), prefix, 7,
                           jnp.asarray(2), 12)
    res_q = Lm.llm_decode(P(params), cfg, jax.random.PRNGKey(2), prefix, 7,
                          jnp.asarray(2), 12, int8_weights=True)
    for res in (res_bf, res_q):
        n = int(res.length)
        toks = np.asarray(res.tokens)[:n]
        assert n >= 2 and np.all((toks >= 0) & (toks <= 30))
