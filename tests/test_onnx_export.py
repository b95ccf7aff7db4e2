"""ONNX export of the flow estimator (compat/onnx_export.py) vs the JAX
forward — closing the reference's export_onnx.py interop surface
(bin/export_onnx.py:34-56).

The parity check runs the emitted bytes through compat.onnx.OnnxModel — an
independent reader/executor of the wire format the exporter writes (and the
runtime onnxruntime/TRT would parse); onnxruntime itself is not in this
image (the export entry point prefers it when installed)."""

import numpy as np
import jax
import pytest

from cosy_tpu.config import EstimatorConfig, FlowConfig
from cosy_tpu.compat.onnx import OnnxModel
from cosy_tpu.compat.onnx_export import export_estimator_onnx
from cosy_tpu.ctx import EVAL
from cosy_tpu.layers.unet import conditional_decoder, init_conditional_decoder
from cosy_tpu.params import P, KeyGen

CFG = EstimatorConfig(in_channels=32, out_channels=8, channels=(16, 16),
                      attention_head_dim=4, n_blocks=1, num_mid_blocks=1,
                      num_heads=2)


def _params(cfg=CFG, seed=0):
    d = {}
    init_conditional_decoder(KeyGen(jax.random.PRNGKey(seed)), d, "", cfg)
    return {k: np.asarray(v, np.float32) for k, v in d.items()}


def _feeds(cfg, B, T, seed=1, ragged=False):
    rng = np.random.default_rng(seed)
    mel = cfg.out_channels
    mask = np.ones((B, 1, T), np.float32)
    if ragged:
        mask[1, :, T - 6:] = 0.0
    return {
        "x": rng.standard_normal((B, mel, T)).astype(np.float32),
        "mask": mask,
        "mu": rng.standard_normal((B, mel, T)).astype(np.float32),
        "t": np.linspace(0.15, 0.85, B).astype(np.float32),
        "spks": rng.standard_normal((B, mel)).astype(np.float32),
        "cond": rng.standard_normal((B, mel, T)).astype(np.float32),
    }


def _jax_ref(weights, cfg, feeds):
    out = conditional_decoder(
        P(weights), cfg, feeds["x"], feeds["mask"], feeds["mu"], feeds["t"],
        feeds["spks"], feeds["cond"], EVAL)
    return np.asarray(out, np.float32)


@pytest.mark.parametrize("ragged", [False, True])
def test_exported_estimator_matches_jax(ragged):
    weights = _params()
    B, T = 2, 16
    data = export_estimator_onnx(weights, CFG, T=T, B=B)
    feeds = _feeds(CFG, B, T, ragged=ragged)
    got = np.asarray(OnnxModel(data).run(feeds)[0], np.float32)
    want = _jax_ref(weights, CFG, feeds)
    assert got.shape == want.shape == (B, CFG.out_channels, T)
    # padded frames are zeroed by the final mask mul on both sides
    if ragged:
        assert np.abs(got[1, :, T - 6:]).max() == 0.0
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_exported_estimator_erf_gelu_and_depth():
    """Exact-erf GELU + multiple transformer blocks per level."""
    cfg = EstimatorConfig(in_channels=32, out_channels=8, channels=(16, 16),
                          attention_head_dim=4, n_blocks=2, num_mid_blocks=2,
                          num_heads=2, gelu_approximate=False)
    weights = _params(cfg, seed=3)
    B, T = 2, 32
    data = export_estimator_onnx(weights, cfg, T=T, B=B)
    feeds = _feeds(cfg, B, T, seed=4)
    got = np.asarray(OnnxModel(data).run(feeds)[0], np.float32)
    want = _jax_ref(weights, cfg, feeds)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def test_export_entrypoint_and_coverage(tmp_path):
    """export.export_flow_estimator_onnx: writes the file, self-verifies,
    and the preflight audit passes on our own export."""
    import sys, os

    from cosy_tpu.config import ModelConfig, tiny_model_config
    from cosy_tpu.export import export_flow_estimator_onnx
    from cosy_tpu.models.flow import init_flow_params

    mc = tiny_model_config(n_mels=8)
    flow_params = init_flow_params(jax.random.PRNGKey(0), mc.flow)
    path = str(tmp_path / "estimator.onnx")
    out = export_flow_estimator_onnx(flow_params, mc, path, B=1, T=16)
    assert out == path and os.path.getsize(path) > 1000

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import onnx_coverage

    assert onnx_coverage.main([path]) == 0


def test_export_rejects_bad_T():
    with pytest.raises(ValueError, match="multiple"):
        export_estimator_onnx(_params(), CFG, T=15, B=1)
