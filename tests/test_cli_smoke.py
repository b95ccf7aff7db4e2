"""End-to-end CLI smoke: prepare -> train --tiny -> merge -> inference.

Drives the four product entry points exactly as a user would (subprocesses),
on generated wav+txt pairs, with the --tiny smoke topology.  The reference's
equivalent flow is README.md:544-555."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ,
               JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               COSY_TPU_NO_CACHE="1", PYTHONPATH=REPO + ":" +
               os.environ.get("PYTHONPATH", ""))
    # don't inherit the test suite's forced 8-device flag — the CLI smoke
    # models a plain single-device user environment
    env.pop("XLA_FLAGS", None)
    r = subprocess.run([sys.executable] + args, cwd=cwd, env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, f"{args}\nSTDOUT:\n{r.stdout[-3000:]}\nSTDERR:\n{r.stderr[-3000:]}"
    return r.stdout


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    raw = d / "raw"
    raw.mkdir()
    from scipy.io import wavfile

    rng = np.random.default_rng(0)
    for i in range(4):
        t = np.arange(22050) / 22050.0
        wav = (0.3 * np.sin(2 * np.pi * (150 + 40 * i) * t)
               + 0.02 * rng.standard_normal(len(t))).astype(np.float32)
        wavfile.write(str(raw / f"clip{i}.wav"), 22050,
                      (wav * 32767).astype(np.int16))
        (raw / f"clip{i}.txt").write_text(f"hello tiny clip {i}")
    return d


@pytest.mark.slow
def test_cli_pipeline_end_to_end(workdir):
    d = str(workdir)
    out = _run([os.path.join(REPO, "prepare_joint_data.py"),
                "--input", "raw", "--output", "data"], cwd=d)
    assert os.path.exists(os.path.join(d, "data", "data.list")), out

    out = _run([os.path.join(REPO, "train_joint.py"), "--tiny",
                "--mode", "flow_only", "--data-dir", "data",
                "--epochs", "1", "--batch-size", "2", "--accum", "2",
                "--max-feat-len", "16", "--output", "out",
                "--pretrained", "missing_dir"], cwd=d)
    ckpts = [f for f in os.listdir(os.path.join(d, "out")) if f.endswith(".npz")]
    assert ckpts, out

    # the flagship joint mode trains through the same CLI
    out = _run([os.path.join(REPO, "train_joint.py"), "--tiny",
                "--mode", "joint", "--data-dir", "data",
                "--epochs", "1", "--batch-size", "2", "--accum", "2",
                "--max-feat-len", "16", "--output", "out_joint",
                "--pretrained", "missing_dir"], cwd=d)
    assert any(f.startswith("joint_joint") and f.endswith(".npz")
               for f in os.listdir(os.path.join(d, "out_joint"))), out

    _run([os.path.join(REPO, "merge_joint_weights.py"), "--tiny",
          "--mode", "flow_only", "--output", "out",
          "--pretrained", "missing_dir"], cwd=d)
    assert os.path.exists(os.path.join(d, "out", "flow_merged_flow_only.pt"))

    _run([os.path.join(REPO, "inference_joint.py"), "--tiny",
          "--text", "hello tiny world",
          "--flow", os.path.join(d, "out", "flow_merged_flow_only.pt"),
          "--pretrained", "missing_dir",
          "--output", os.path.join(d, "out", "tts.wav")], cwd=d)
    from scipy.io import wavfile

    sr, wav = wavfile.read(os.path.join(d, "out", "tts.wav"))
    assert sr == 22050 and wav.size > 0

    # beyond-reference: few-step MeanFlow distillation of the merged flow,
    # then synthesis through the distilled 2-step sampler
    _run([os.path.join(REPO, "distill_flow.py"), "--tiny",
          "--data-dir", "data", "--steps", "4", "--batch-size", "2",
          "--max-feat-len", "16", "--lr", "1e-4",
          "--flow", os.path.join(d, "out", "flow_merged_flow_only.pt"),
          "--pretrained", "missing_dir",
          "--out", os.path.join(d, "out", "flow_distilled.pt")], cwd=d)
    _run([os.path.join(REPO, "inference_joint.py"), "--tiny",
          "--text", "hello tiny world", "--meanflow",
          "--flow", os.path.join(d, "out", "flow_distilled.pt"),
          "--pretrained", "missing_dir",
          "--output", os.path.join(d, "out", "tts_mf.wav")], cwd=d)
    sr, wav = wavfile.read(os.path.join(d, "out", "tts_mf.wav"))
    assert sr == 22050 and wav.size > 0
