"""Weight-provenance sidecars and serve's finetuned_norm default.

A raw-mel-space v1 flow checkpoint served with the output denorm on fails
SILENTLY as garbled audio (the reverse too), so serve.py must not guess the
denorm default from the mere presence of --flow-weights: the default is keyed
off the checkpoint's recorded provenance (params.save_weight_meta sidecar,
written by export_merged / distill export), with an explicit-flag requirement
when provenance is unknown.
"""

import jax.numpy as jnp
import pytest

from cosy_tpu.params import (load_torch_checkpoint, load_weight_meta,
                             save_torch_checkpoint, save_weight_meta)
from cosy_tpu.serve import resolve_finetuned_norm


def test_weight_meta_round_trip(tmp_path):
    path = str(tmp_path / "w.pt")
    save_torch_checkpoint({"a.weight": jnp.zeros((2, 2))}, path)
    assert load_weight_meta(path) is None  # no sidecar yet
    save_weight_meta(path, mel_space="normalized", producer="test")
    meta = load_weight_meta(path)
    assert meta == {"mel_space": "normalized", "producer": "test"}
    # the .pt itself stays a plain state dict (stock-loader compatible)
    loaded = load_torch_checkpoint(path)
    assert list(loaded) == ["a.weight"]


def test_resolve_explicit_flag_wins(tmp_path):
    path = str(tmp_path / "w.pt")
    save_torch_checkpoint({"a.weight": jnp.zeros((2,))}, path)
    save_weight_meta(path, mel_space="normalized")
    w = load_torch_checkpoint(path)
    assert resolve_finetuned_norm(path, w, explicit=0, cosyvoice2=False) is False
    assert resolve_finetuned_norm(path, w, explicit=1, cosyvoice2=False) is True


def test_resolve_from_sidecar(tmp_path):
    for space, want in (("normalized", True), ("raw", False)):
        path = str(tmp_path / f"w_{space}.pt")
        save_torch_checkpoint({"a.weight": jnp.zeros((2,))}, path)
        save_weight_meta(path, mel_space=space)
        w = load_torch_checkpoint(path)
        assert resolve_finetuned_norm(path, w, None, False) is want


def test_resolve_distilled_signature(tmp_path):
    path = str(tmp_path / "d.pt")
    save_torch_checkpoint(
        {"decoder.estimator.time_mlp_s.linear_1.weight": jnp.zeros((2, 2))},
        path)
    w = load_torch_checkpoint(path)
    # no sidecar, but the MeanFlow s-branch key marks a v1 distill output
    assert resolve_finetuned_norm(path, w, None, False) is True


def test_resolve_unknown_provenance_requires_flag(tmp_path):
    path = str(tmp_path / "u.pt")
    save_torch_checkpoint({"a.weight": jnp.zeros((2,))}, path)
    w = load_torch_checkpoint(path)
    with pytest.raises(SystemExit, match="finetuned-norm"):
        resolve_finetuned_norm(path, w, None, False)


def test_resolve_defaults_off_without_override_or_on_cv2(tmp_path):
    assert resolve_finetuned_norm(None, None, None, False) is False
    path = str(tmp_path / "w.pt")
    save_torch_checkpoint({"a.weight": jnp.zeros((2,))}, path)
    w = load_torch_checkpoint(path)
    assert resolve_finetuned_norm(path, w, None, True) is False  # CV2


def test_export_merged_writes_flow_sidecar(tmp_path):
    """The trainer's merged flow export records normalized-mel provenance
    (the fine-tune loss trains in MEL -6.0/2.0 space)."""
    import jax

    from cosy_tpu.models import flow as F, llm as L
    from cosy_tpu.train.trainer import JointTrainer
    from test_trainer import MODEL_CFG, TRAIN_CFG

    llm_params = L.init_llm_params(jax.random.PRNGKey(1), MODEL_CFG.llm)
    flow_params = F.init_flow_params(jax.random.PRNGKey(2), MODEL_CFG.flow)
    trainer = JointTrainer(MODEL_CFG, TRAIN_CFG, llm_params, flow_params,
                           out_dir=str(tmp_path), total_steps=4)
    state = trainer.init_state(jax.random.PRNGKey(3))
    trainer.export_merged(state, save=True)
    flow_pt = str(tmp_path / "flow_merged_joint.pt")
    meta = load_weight_meta(flow_pt)
    assert meta is not None and meta["mel_space"] == "normalized"
    # and serve would auto-enable the denorm from it
    w = load_torch_checkpoint(flow_pt)
    assert resolve_finetuned_norm(flow_pt, w, None, False) is True
    # the llm export carries no (and needs no) sidecar
    assert load_weight_meta(str(tmp_path / "llm_merged_joint.pt")) is None
