"""Continuous end-to-end quality gate at 300M scale (VERDICT r1 item #10).

Runs tools/parity_300m.py (jax vs reference-torch activation parity + the
DTW-free MCD between the two stacks' generated mels) and asserts every check
passes — in particular ``flow.mcd_between_stacks_db`` stays under its
recorded bound (0.01 dB), so output-fidelity parity is enforced on every
round instead of living in a one-off result JSON.  Skips when the reference
tree is not mounted (the tool needs the torch modules to compare against).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference/cosyvoice_flow_finetune"


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference tree not mounted")
def test_parity_300m_and_mcd_gate():
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               COSY_TPU_NO_CACHE="1",
               PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""))
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity_300m.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800)
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    assert "PARITY 300M OK" in res.stdout, res.stdout[-3000:]

    with open(os.path.join(REPO, "tools", "parity_300m_result.json")) as f:
        report = json.load(f)
    assert report["ok"] is True
    checks = report["checks"]
    mcd = checks["flow.mcd_between_stacks_db"]
    assert mcd["ok"] and mcd["rel_err"] < 0.01, mcd
    for name, c in checks.items():
        assert c["ok"], (name, c)
