"""Model export tools — the TPU-native equivalent of the reference's
TorchScript/ONNX export path (cosyvoice/bin/export_jit.py, export_onnx.py).

On TPU the deployable artifact is a serialized StableHLO program
(jax.export): ahead-of-time compiled, loadable without Python model code.
Covers the same surfaces the reference exports:
- the flow decoder estimator (ONNX in the reference, for TensorRT)
- llm text encoder / flow encoder (TorchScript in the reference)

Also provides checkpoint averaging (cosyvoice/bin/average_model.py).
"""

from __future__ import annotations

import glob
import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .config import ModelConfig
from .ctx import EVAL
from .params import P, Params


def export_stablehlo(fn: Callable, example_args: Sequence, path: str) -> str:
    """Serialize a jitted function to a StableHLO artifact + parity check.

    The reference's export_onnx.py validates the exported graph against the
    torch module (export_onnx.py:34-56); we do the same round-trip check via
    jax.export deserialization.
    """
    from jax import export as jexport

    exported = jexport.export(jax.jit(fn))(*example_args)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)

    # parity check: deserialize and compare
    rehydrated = jexport.deserialize(blob)
    want = jax.jit(fn)(*example_args)
    got = rehydrated.call(*example_args)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32), rtol=1e-5, atol=1e-5)
    print(f"exported {path}: {len(blob)} bytes (parity checked)")
    return path


def export_flow_estimator(
    params: Params,
    model_cfg: ModelConfig,
    out_path: str,
    B: int = 2,
    T: int = 256,
) -> str:
    """Export the CFM estimator forward — the reference's ONNX surface
    (export_onnx.py: x, mask, mu, t, spks, cond -> velocity)."""
    from .layers.unet import conditional_decoder

    cfg = model_cfg.flow.estimator
    est = {k[len("decoder.estimator."):]: v for k, v in params.items()
           if k.startswith("decoder.estimator.")}

    def fn(p, x, mask, mu, t, spks, cond):
        return conditional_decoder(P(p), cfg, x, mask, mu, t, spks, cond, EVAL)

    n = cfg.out_channels
    args = (est,
            jnp.zeros((B, n, T)), jnp.ones((B, 1, T)), jnp.zeros((B, n, T)),
            jnp.zeros((B,)), jnp.zeros((B, n)), jnp.zeros((B, n, T)))
    return export_stablehlo(fn, args, out_path)


def average_checkpoints(paths: List[str], out_path: Optional[str] = None) -> Params:
    """Average N torch-format checkpoints (cosyvoice/bin/average_model.py)."""
    from .params import load_torch_checkpoint, save_torch_checkpoint

    assert paths, "no checkpoints to average"
    acc: Dict[str, np.ndarray] = {}
    for path in paths:
        params = load_torch_checkpoint(path)
        for k, v in params.items():
            a = np.asarray(v, np.float64)
            acc[k] = acc.get(k, 0.0) + a
    avg = {k: jnp.asarray(v / len(paths), jnp.float32) for k, v in acc.items()}
    if out_path:
        save_torch_checkpoint(avg, out_path)
        print(f"averaged {len(paths)} checkpoints -> {out_path}")
    return avg


def find_checkpoints(pattern: str, num: int = 5) -> List[str]:
    """Latest-N checkpoint selection by mtime (average_model.py --num)."""
    cands = sorted(glob.glob(pattern), key=os.path.getmtime, reverse=True)
    return cands[:num]


def export_flow_estimator_onnx(
    params: Params,
    model_cfg: ModelConfig,
    out_path: str,
    B: int = 2,
    T: int = 256,
    verify: bool = True,
) -> str:
    """ONNX export of the CFM estimator — the reference's export_onnx.py
    surface (bin/export_onnx.py:34-56), for hand-back to its GPU/ORT/TRT
    serving stack.  Static shapes (export one file per serving bucket).

    ``verify`` runs a parity check of the emitted graph against the JAX
    forward through onnxruntime when installed, else through the native
    ingestion runtime (compat/onnx.py) — an independent reader/executor."""
    import numpy as np

    from .compat.onnx_export import export_estimator_onnx
    from .layers.unet import conditional_decoder

    cfg = model_cfg.flow.estimator
    est = {k[len("decoder.estimator."):]: np.asarray(v, np.float32)
           for k, v in params.items() if k.startswith("decoder.estimator.")}
    if not est:  # a bare estimator tree (e.g. distilled student export)
        est = {k: np.asarray(v, np.float32) for k, v in params.items()}
    data = export_estimator_onnx(est, cfg, T=T, B=B)
    with open(out_path, "wb") as f:
        f.write(data)
    if verify:
        rng = np.random.default_rng(0)
        mel = cfg.out_channels
        feeds = {
            "x": rng.standard_normal((B, mel, T)).astype(np.float32),
            "mask": np.ones((B, 1, T), np.float32),
            "mu": rng.standard_normal((B, mel, T)).astype(np.float32),
            "t": np.linspace(0.1, 0.9, B).astype(np.float32),
            "spks": rng.standard_normal((B, mel)).astype(np.float32),
            "cond": rng.standard_normal((B, mel, T)).astype(np.float32),
        }
        want = np.asarray(jax.jit(
            lambda p, x, mask, mu, t, spks, cond: conditional_decoder(
                P(p), cfg, x, mask, mu, t, spks, cond, EVAL))(
            est, feeds["x"], feeds["mask"], feeds["mu"], feeds["t"],
            feeds["spks"], feeds["cond"]), np.float32)
        try:
            import onnxruntime as ort

            sess = ort.InferenceSession(data, providers=["CPUExecutionProvider"])
            got = sess.run(None, feeds)[0]
            backend = "onnxruntime"
        except ImportError:
            from .compat.onnx import OnnxModel

            got = np.asarray(OnnxModel(data).run(feeds)[0], np.float32)
            backend = "compat.onnx"
        err = float(np.max(np.abs(got - want)))
        if err > 5e-3:
            raise AssertionError(
                f"ONNX export parity check failed via {backend}: max|err| {err}")
    return out_path
