"""Weight-only int8 quantization (quant.py + the transparent dense path)."""

import numpy as np
import jax
import jax.numpy as jnp

from cosy_tpu.layers.qwen2 import Qwen2Config, init_qwen2_params, qwen2_forward
from cosy_tpu.params import P
from cosy_tpu.quant import count_quantized, quantize_int8

QCFG = Qwen2Config(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                   num_attention_heads=4, num_key_value_heads=2, head_dim=8,
                   vocab_size=100)


def test_quantize_int8_roundtrip_error():
    params = init_qwen2_params(jax.random.PRNGKey(0), QCFG)
    q = quantize_int8(params)
    n = count_quantized(q)
    assert n == 7 * QCFG.num_hidden_layers, n
    for k, v in q.items():
        if getattr(v, "dtype", None) == jnp.int8:
            w = np.asarray(params[k], np.float32)
            deq = np.asarray(v, np.float32) * np.asarray(q[k + "@scale"])[:, None]
            # per-channel symmetric int8: max error <= scale/2 per entry
            sc = np.asarray(q[k + "@scale"])[:, None]
            assert (np.abs(w - deq) <= sc / 2 + 1e-8).all()


def test_quantized_forward_close_to_fp():
    params = init_qwen2_params(jax.random.PRNGKey(1), QCFG)
    q = quantize_int8(params)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 32))
    lens = jnp.asarray([6, 4])
    h_fp = qwen2_forward(P(params).sub("model"), QCFG, x, lens)
    h_q = qwen2_forward(P(q).sub("model"), QCFG, x, lens)
    rel = (np.linalg.norm(np.asarray(h_q - h_fp)) /
           np.linalg.norm(np.asarray(h_fp)))
    assert rel < 0.05, rel


def test_validate_int8_voice_harness():
    """The per-voice int8 safety harness (tools/validate_quant.py core):
    bf16-vs-int8 decode comparison over a small prompt set returns a
    well-formed report with sane invariants, and the identical-tokens fast
    path short-circuits the MCD at exactly 0."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "."))
    from test_api import _make_api

    from cosy_tpu.quant import validate_int8_voice

    api = _make_api()
    texts = [api.frontend.extract_text_token("hello there.") % 40,
             api.frontend.extract_text_token("quant check.") % 40]
    rep = validate_int8_voice(
        api.cfg, api.model.llm_params, api.model.flow_params,
        api.model.hift_params, api.model.icfg, texts, seeds=(0, 1),
        finetuned_norm=True, max_len_cap=48)
    assert len(rep["prompts"]) == 4
    for r in rep["prompts"]:
        assert 0.0 <= r["agreement"] <= 1.0
        assert r["mcd_db"] >= 0.0
        assert r["tokens_bf16"] > 0 and r["tokens_int8"] > 0
        if r["agreement"] == 1.0:
            assert r["mcd_db"] == 0.0
    assert rep["agreement_min"] <= rep["agreement_mean"] <= 1.0
    assert rep["mcd_db_max"] == max(r["mcd_db"] for r in rep["prompts"])
