"""Convert a metrics.jsonl produced by the trainers into TensorBoard event
files: ``python tools/jsonl_to_tb.py runs/metrics.jsonl runs/tensorboard``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("jsonl")
    ap.add_argument("logdir")
    args = ap.parse_args()

    from cosy_tpu.utils.tb import jsonl_to_tb

    n = jsonl_to_tb(args.jsonl, args.logdir)
    print(f"wrote {n} records to {args.logdir}")


if __name__ == "__main__":
    main()
