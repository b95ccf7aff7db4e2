#!/usr/bin/env python3
"""Merge LoRA adapters from a training checkpoint into original-format weights.

TPU-native equivalent of the reference entry point (reference:
merge_joint_weights.py): finds the latest checkpoint for the mode (by mtime),
rebuilds the adapter structure, merges W' = W + BA*scale, and writes
llm_merged_<mode>.pt / flow_merged_<mode>.pt loadable by stock CosyVoice.

Usage:
    python merge_joint_weights.py [--mode joint] [--ckpt PATH]
        [--pretrained pretrained_models/CosyVoice-300M] [--output output]
"""

import argparse
import glob
import os

import jax

from cosy_tpu.config import ModelConfig, TrainConfig
from cosy_tpu.compat.loader import load_or_init
from cosy_tpu.train.trainer import JointTrainer


def find_latest_checkpoint(output_dir: str, mode: str) -> str:
    """Latest checkpoint by mtime for the mode (merge_joint_weights.py:38-62)."""
    pats = [os.path.join(output_dir, f"joint_{mode}_*.ckpt.npz"),
            os.path.join(output_dir, f"joint_{mode}_last.ckpt.npz")]
    cands = sorted({p for pat in pats for p in glob.glob(pat)},
                   key=os.path.getmtime, reverse=True)
    if not cands:
        raise FileNotFoundError(f"no checkpoint for mode {mode} in {output_dir}")
    return cands[0]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="joint", choices=["joint", "llm_only", "flow_only"])
    ap.add_argument("--ckpt", default=None)
    ap.add_argument("--pretrained", default="pretrained_models/CosyVoice-300M")
    ap.add_argument("--output", default="output")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test topology (toy widths; not checkpoint-compatible)")
    ap.add_argument("--adapters-out", default=None, metavar="PATH",
                    help="also write the raw (un-merged) LoRA adapters for "
                         "multi-voice serving (serve.py --voices name=PATH); "
                         "reference analogue: lora.py save_lora_weights")
    args = ap.parse_args()

    from cosy_tpu.config import tiny_model_config
    model_cfg = tiny_model_config() if args.tiny else ModelConfig()
    tcfg = TrainConfig(training_mode=args.mode)
    rng = jax.random.PRNGKey(0)
    pretrained = load_or_init(args.pretrained, model_cfg, rng)

    ckpt = args.ckpt or find_latest_checkpoint(args.output, args.mode)
    print(f"merging from checkpoint: {ckpt}")

    trainer = JointTrainer(model_cfg, tcfg, pretrained["llm"], pretrained["flow"],
                           out_dir=args.output)
    state = trainer.init_state(rng)
    state = trainer.load_checkpoint(ckpt, state)
    trainer.export_merged(state, save=True)
    if args.adapters_out:
        trainer.export_adapters(state, args.adapters_out)


if __name__ == "__main__":
    main()
