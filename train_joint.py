#!/usr/bin/env python3
"""Joint LLM + Flow LoRA training CLI.

TPU-native equivalent of the reference entry point (reference:
train_joint.py:229-393): same modes (joint / llm_only / flow_only), resume,
loss-threshold + early stopping, merged-weight export.

Usage:
    python train_joint.py --data-dir data [--mode joint] [--resume CKPT]
        [--pretrained pretrained_models/CosyVoice-300M] [--epochs N]
        [--batch-size N] [--lr LR] [--output output]
"""

import argparse
import os

import jax

from cosy_tpu.config import ModelConfig, TrainConfig, replace
from cosy_tpu.compat.loader import load_or_init
from cosy_tpu.data.dataset import FlowFinetuneDataset, DataLoader
from cosy_tpu.parallel import mesh as pmesh
from cosy_tpu.train.trainer import JointTrainer


def main():
    ap = argparse.ArgumentParser(description="Joint LLM+Flow LoRA training (TPU)")
    ap.add_argument("--mode", default="joint", choices=["joint", "llm_only", "flow_only"])
    ap.add_argument("--resume", default=None, help="checkpoint to resume from")
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--pretrained", default="pretrained_models/CosyVoice-300M")
    ap.add_argument("--output", default="output")
    ap.add_argument("--max-feat-len", type=int, default=None)
    ap.add_argument("--accum", type=int, default=None, help="gradient accumulation steps")
    ap.add_argument("--no-augmentation", action="store_true")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test topology (toy widths; not checkpoint-compatible)")
    ap.add_argument("--batched-micro", action="store_true",
                    help="(no-op since the bs8 x accum2 default; kept for "
                         "script compatibility) fold accumulation into the "
                         "batch dim at the same effective batch")
    ap.add_argument("--reference-layout", action="store_true",
                    help="train with the reference's bs1 x grad-accum-16 "
                         "layout (an 8 GB-GPU artifact, reference "
                         "config.py:219-224) instead of the TPU default "
                         "bs8 x accum2 — same effective batch and an "
                         "equivalent trajectory (tools/ab_batch_layout.py), "
                         "1.63x slower per step, 1/8 the activation memory")
    args = ap.parse_args()

    from cosy_tpu.config import tiny_model_config
    model_cfg = tiny_model_config() if args.tiny else ModelConfig()
    tcfg = TrainConfig(training_mode=args.mode)
    if args.epochs:
        tcfg = replace(tcfg, max_epochs=args.epochs)
    if args.batch_size:
        tcfg = replace(tcfg, batch_size=args.batch_size)
    if args.lr:
        tcfg = replace(tcfg, learning_rate=args.lr)
    if args.max_feat_len:
        tcfg = replace(tcfg, max_feat_len=args.max_feat_len)
    if args.accum:
        tcfg = replace(tcfg, accumulate_grad_batches=args.accum)
    if args.reference_layout:
        if args.batch_size or args.accum:
            raise SystemExit("--reference-layout conflicts with explicit "
                             "--batch-size/--accum")
        tcfg = replace(tcfg, batch_size=1, accumulate_grad_batches=16)
    elif args.batched_micro and tcfg.accumulate_grad_batches > 1:
        # fold micro-batches into the batch dim only by powers of two that
        # divide accum exactly, so effective batch (and expected gradient)
        # is unchanged for any accum value
        accum = tcfg.accumulate_grad_batches
        shift = min(3, (accum & -accum).bit_length() - 1)
        tcfg = replace(tcfg,
                       batch_size=tcfg.batch_size * (1 << shift),
                       accumulate_grad_batches=tcfg.accumulate_grad_batches >> shift)

    print("=" * 60)
    print("cosy_tpu joint LLM + Flow LoRA training")
    print("=" * 60)
    print(f"mode={tcfg.training_mode} lr={tcfg.learning_rate} "
          f"bs={tcfg.batch_size} x accum={tcfg.accumulate_grad_batches} "
          f"max_feat_len={tcfg.max_feat_len}")
    print(f"stop: llm_loss<={tcfg.llm_loss_threshold} flow_loss<={tcfg.flow_loss_threshold} "
          f"early-stop patience {tcfg.early_stop_patience}")
    print(f"devices: {jax.devices()}")

    from cosy_tpu.ctx import root_key
    rng = root_key(tcfg.seed, tcfg.prng_impl)
    pretrained = load_or_init(args.pretrained, model_cfg, rng)

    dataset = FlowFinetuneDataset(args.data_dir, augmentation=not args.no_augmentation,
                                  leak=tcfg.anti_leakage, seed=tcfg.seed)
    if len(dataset) == 0:
        print(f"no data in {args.data_dir}; run prepare_joint_data.py first")
        return
    # pad batch size up to the dp mesh size
    mesh = pmesh.make_mesh()
    dp = mesh.shape["dp"]
    if tcfg.batch_size % dp != 0:
        tcfg = replace(tcfg, batch_size=((tcfg.batch_size + dp - 1) // dp) * dp)
        print(f"batch_size rounded up to {tcfg.batch_size} for the {dp}-way dp mesh")

    loader = DataLoader(dataset, tcfg, seed=tcfg.seed,
                        num_shards=jax.process_count(), shard_index=jax.process_index())
    total_steps = max(1, loader.steps_per_epoch()) * tcfg.max_epochs

    trainer = JointTrainer(model_cfg, tcfg, pretrained["llm"], pretrained["flow"],
                           out_dir=args.output, mesh=mesh, total_steps=total_steps)
    state = trainer.fit(loader, resume=args.resume)

    print("\nsaving merged weights...")
    trainer.export_merged(state, save=True)
    # adapter-only export for multi-voice serving (one base model + this
    # file per voice: python -m cosy_tpu.serve --voices name=adapters_*.pt)
    trainer.export_adapters(state, os.path.join(
        args.output, f"adapters_{tcfg.training_mode}.pt"))
    print("done; next: python inference_joint.py --text '...'")


if __name__ == "__main__":
    main()
