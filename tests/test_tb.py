"""TensorBoard scalar output (utils/tb.py) — writer + jsonl converter."""

import glob
import json
import os

from cosy_tpu.utils.tb import TBWriter, jsonl_to_tb


def test_tbwriter_writes_event_file(tmp_path):
    w = TBWriter(str(tmp_path / "tb"))
    if not w.active:  # tensorboard genuinely absent: no-op contract
        w.add_scalars(0, {"loss": 1.0})
        w.flush()
        w.close()
        return
    w.add_scalars(1, {"loss": 2.5, "grad_norm": 0.1})
    w.add_scalars(2, {"loss": 2.0})
    w.flush()
    w.close()
    events = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert events and os.path.getsize(events[0]) > 0


def test_jsonl_to_tb_converter(tmp_path):
    jsonl = tmp_path / "metrics.jsonl"
    with open(jsonl, "w") as f:
        for i in range(3):
            f.write(json.dumps({"epoch": 0, "step": i, "loss": 3.0 - i}) + "\n")
    n = jsonl_to_tb(str(jsonl), str(tmp_path / "tb"))
    assert n == 3
