#!/usr/bin/env python3
"""Full-parameter training CLI — the reference's vendored-trainer entry point.

Reference behavior: cosyvoice/bin/train.py (argparse driver: model from the
yaml config, parquet data.list pipeline, DDP/DeepSpeed engine, per-epoch CV +
rank-0 save) + utils/executor.py epoch loops + utils/train_utils.py.

TPU-native: the GSPMD FullTrainer (dp grad psum + ZeRO-2 opt-state sharding,
optional TP/SP/PP axes) or HiFiGanTrainer (two-optimizer GAN turns), the
processor-chain data pipeline (data/processor.py), orbax sharded async
checkpoints (--model_dir/ckpt), reference-format rank-0 .pt exports, and
TensorBoard scalars.

    python train_full.py --model llm --train_data data/data.list \
        --model_dir out_full [--config cosyvoice.yaml] [--cv_data cv.list] \
        [--checkpoint init.pt] [--epochs 2] [--accum 2] [--batch_size 8] \
        [--tensor_parallel] [--resume] ...

Batching: static batch size with time axes bucketed to --seq_bucket and
accumulation groups padded to a common shape (XLA static shapes — each
distinct shape compiles once; the bucket bounds the program count).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_loader(list_path: str, args, tokenizer=None, gan: bool = False):
    """data.list of parquet shards -> padded batch dicts (processor chain)."""
    from cosy_tpu.data import processor as Pr

    with open(list_path) as f:
        shards = [ln.strip() for ln in f if ln.strip()]
    shards = Pr.shard_list(shards)

    def rows():
        for row in Pr.parquet_opener(shards):
            # prepare.py writes flattened speech_feat + shape sidecar
            if "speech_feat" in row and "speech_feat_shape" in row:
                row["speech_feat"] = np.asarray(
                    row["speech_feat"], np.float32).reshape(
                        [int(d) for d in row["speech_feat_shape"]])
            yield row

    first = next(iter(Pr.parquet_opener(shards[:1])), None)
    if first is None:
        raise SystemExit(f"{list_path}: no rows")
    if tokenizer is None and "text_token" not in first:
        # rows carry only raw text: build the tokenizer like prepare.py does
        # (reference bin/train.py constructs it from the yaml config) — or
        # fail fast here instead of as an opaque KeyError in the jitted loss
        from cosy_tpu.data.tokenizer import TextTokenizer, find_vocab_file

        if find_vocab_file() is not None:
            tokenizer = TextTokenizer()
        elif args.model == "llm":
            raise SystemExit(
                f"{list_path}: rows lack text_token and no tokenizer vocab was "
                "found — run prepare first, or set COSY_TPU_TOKENIZER_VOCAB")
    have_feats = "speech_feat" in first
    need_feats = gan or args.model == "flow"
    stages = [(Pr.tokenize, {"tokenizer": tokenizer}), (Pr.filter_stage, {})]
    if need_feats and not have_feats:
        if "speech" not in first:
            raise SystemExit(f"{list_path}: rows carry neither speech_feat "
                             "nor raw speech — cannot train "
                             f"--model {args.model}")
        stages.append((Pr.resample_stage, {}))
        if gan:
            stages.append((Pr.truncate_stage,
                           {"truncate_length": args.gan_truncate}))
        stages.append((Pr.compute_fbank, {}))
    if gan:
        stages.append((Pr.compute_f0_stage, {}))
    stages += [
        (Pr.parse_embedding, {}),
        (Pr.shuffle_stage, {"shuffle_size": args.shuffle_size}),
        (Pr.sort_stage, {"sort_size": args.sort_size}),
        (Pr.static_batch, {"batch_size": args.batch_size}),
        (Pr.padding, {"use_spk_embedding": args.use_spk_embedding}),
    ]
    return Pr.build_pipeline(rows(), stages)


# keys each objective consumes — extra pipeline keys are dropped before the
# jitted step (they would ride the lax.scan as dead weight otherwise)
_MODEL_KEYS = {
    "llm": ("text_token", "text_token_len", "speech_token",
            "speech_token_len", "embedding"),
    "llm_dpo": ("text_token", "text_token_len", "speech_token",
                "speech_token_len", "reject_speech_token",
                "reject_speech_token_len"),
    "flow": ("speech_token", "speech_token_len", "speech_feat",
             "speech_feat_len", "embedding"),
}


def stack_accum(batches, accum: int, bucket: int):
    """Group ``accum`` same-B batches into one (accum, B, ...) super batch,
    padding time axes to the group max rounded up to ``bucket`` (masked
    regions carry no loss — lens ride along).  Partial trailing groups are
    dropped (reference drop_last)."""
    from cosy_tpu.data.dataset import MEL_PADDING_VALUE

    pad_values = {"speech_feat": MEL_PADDING_VALUE}  # -11.5; rest pad 0
    buf = []
    first_B = None
    for b in batches:
        B = b[next(iter(b))].shape[0]
        if first_B is None:
            first_B = B
        if B != first_B:
            buf = []  # trailing partial batch: different B — drop
            continue
        buf.append(b)
        if len(buf) < accum:
            continue
        keys = buf[0].keys()
        out = {}
        for k in keys:
            arrs = [np.asarray(x[k]) for x in buf]
            tgt = list(np.max([a.shape for a in arrs], axis=0))
            # bucket ONLY the time/length axis (axis 1 of (B, T, ...) and
            # (B, L) keys); feature dims (mel bins, embedding width) and
            # per-sample lens stay exact
            if len(tgt) >= 2 and k != "embedding":
                tgt[1] = -(-tgt[1] // bucket) * bucket
            pv = pad_values.get(k, 0)
            padded = [np.pad(a, [(0, t - s) for s, t in zip(a.shape, tgt)],
                             constant_values=pv) for a in arrs]
            out[k] = np.stack(padded)
        yield out
        buf = []


def main(argv=None):
    ap = argparse.ArgumentParser(description="full-parameter trainer "
                                 "(reference: cosyvoice/bin/train.py)")
    ap.add_argument("--model", required=True,
                    choices=["llm", "flow", "hifigan"])
    ap.add_argument("--train_data", required=True, help="data.list of parquet shards")
    ap.add_argument("--cv_data", default=None)
    ap.add_argument("--config", default=None, help="cosyvoice.yaml topology")
    ap.add_argument("--checkpoint", default=None, help="init weights .pt")
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--tensorboard_dir", default=None)
    ap.add_argument("--epochs", type=int, default=1)
    ap.add_argument("--max_steps", type=int, default=0, help="0 = unlimited")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--grad_clip", type=float, default=5.0)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--batch_size", type=int, default=4)
    ap.add_argument("--seq_bucket", type=int, default=32)
    ap.add_argument("--shuffle_size", type=int, default=1000)
    ap.add_argument("--sort_size", type=int, default=100)
    ap.add_argument("--gan_truncate", type=int, default=24576)
    ap.add_argument("--use_spk_embedding", action="store_true")
    ap.add_argument("--flow_style", choices=["vendored", "finetune"],
                    default="vendored",
                    help="vendored = stock CosyVoice flow training (no mel "
                         "norm, simple conds); finetune = the anti-leakage "
                         "normalized-mel objective")
    ap.add_argument("--cosyvoice2", action="store_true",
                    help="train the CosyVoice2 family: llm = Qwen2LM "
                         "(uni/bistream packing), flow = the causal "
                         "chunked flow (flow2), hifigan = the 24 kHz HiFT; "
                         "topology from the CV2 yaml (cv2_configs_from_yaml)")
    ap.add_argument("--cv2_streaming", action="store_true",
                    help="train the CV2 flow's STREAMING objective (chunked "
                         "causal attention) instead of non-streaming.  The "
                         "reference draws this 50/50 per batch "
                         "(flow.py:196); one jitted program per mode here — "
                         "alternate runs/epochs for the mixed recipe (the "
                         "distiller alternates per step, train/distill.py)")
    ap.add_argument("--dpo", action="store_true",
                    help="DPO preference training for the CosyVoice2 Qwen2 "
                         "speech LLM (reference: bin/train.py --dpo): the "
                         "frozen reference model is the init weights; rows "
                         "must carry reject_speech_token (processor dpo "
                         "padding)")
    ap.add_argument("--dpo_beta", type=float, default=0.01)
    ap.add_argument("--no_zero2", action="store_true")
    ap.add_argument("--tensor_parallel", action="store_true")
    ap.add_argument("--sequence_parallel", action="store_true")
    ap.add_argument("--pp_microbatches", type=int, default=0)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--log_every", type=int, default=10)
    ap.add_argument("--seed", type=int, default=1986)
    args = ap.parse_args(argv)

    import jax
    import optax

    from cosy_tpu.config import ModelConfig, replace as creplace
    from cosy_tpu.ctx import Ctx
    from cosy_tpu.utils.tb import TBWriter

    cfg = ModelConfig()
    if args.config:
        from cosy_tpu.compat.yaml_config import model_config_from_yaml

        cfg = model_config_from_yaml(args.config)
    os.makedirs(args.model_dir, exist_ok=True)
    ckpt_dir = os.path.join(args.model_dir, "ckpt")
    tb = TBWriter(args.tensorboard_dir or os.path.join(args.model_dir, "tb"))
    key = jax.random.PRNGKey(args.seed)

    init_override = None
    if args.checkpoint:
        from cosy_tpu.params import load_torch_checkpoint

        init_override = load_torch_checkpoint(args.checkpoint)
        print(f"init weights <- {args.checkpoint} ({len(init_override)} tensors)")

    # ------------------------------------------------------------------
    # HiFiGAN branch: two-optimizer GAN turns (executor.py:88-144)
    # ------------------------------------------------------------------
    cv2_cfgs = None
    if args.cosyvoice2:
        from cosy_tpu.compat.yaml_config import cv2_configs_from_yaml

        if args.config:
            cv2_cfgs = cv2_configs_from_yaml(args.config)
        else:
            from cosy_tpu.models.flow2 import Flow2Config
            from cosy_tpu.models.qwen2lm import Qwen2LMConfig

            cv2_cfgs = cv2_configs_from_yaml("sample_rate: 24000",
                                             llm_base=Qwen2LMConfig(),
                                             flow_base=Flow2Config())

    if args.model == "hifigan":
        from cosy_tpu.models.gan import init_discriminator_params
        from cosy_tpu.models.hift import init_hift_params
        from cosy_tpu.train.gan_trainer import HiFiGanTrainer

        if cv2_cfgs is not None:
            cfg = creplace(cfg, hift=cv2_cfgs[2])
        gen = init_override or init_hift_params(key, cfg.hift)
        disc = init_discriminator_params(jax.random.fold_in(key, 1))
        trainer = HiFiGanTrainer(cfg.hift, gen, disc, gen_lr=args.lr,
                                 disc_lr=args.lr, grad_clip=args.grad_clip)
        start_step = trainer.load_checkpoint(ckpt_dir) if args.resume and \
            os.path.isdir(ckpt_dir) else 0
        step = start_step
        for epoch in range(args.epochs):
            t0 = time.time()
            for batch in build_loader(args.train_data, args, gan=True):
                m = trainer.step(batch, jax.random.fold_in(key, 7000 + step))
                step += 1
                if step % args.log_every == 0:
                    tb.add_scalars(step, m, prefix="train")
                    print(f"epoch {epoch} step {step}: " + " ".join(
                        f"{k}={v:.4f}" for k, v in sorted(m.items())))
                if args.max_steps and step - start_step >= args.max_steps:
                    break
            trainer.save_checkpoint(ckpt_dir, step=step)
            from cosy_tpu.train.checkpoint import save_model_pt

            save_model_pt(trainer.gen_params,
                          os.path.join(args.model_dir, f"hift_epoch{epoch}.pt"),
                          info={"epoch": epoch, "step": step})
            print(f"== epoch {epoch} done ({time.time() - t0:.1f}s)")
            if args.max_steps and step - start_step >= args.max_steps:
                break
        if getattr(trainer, "_ckptr", None):  # absent when --epochs 0
            trainer._ckptr.wait()  # drain async saves before interpreter exit
            trainer._ckptr.close()
        tb.close()
        return 0

    # ------------------------------------------------------------------
    # llm / flow branch: FullTrainer (bin/train.py + executor.train_one_epoc)
    # ------------------------------------------------------------------
    from cosy_tpu.params import P
    from cosy_tpu.train.full_trainer import FullTrainer

    if args.model == "llm" and args.dpo:
        # CosyVoice2 Qwen2LM preference training (bin/train.py:131-166):
        # policy starts from the init weights; a frozen copy is the DPO
        # reference model, folded into the same XLA program
        from cosy_tpu.models.qwen2lm import init_qwen2lm_params
        from cosy_tpu.train.dpo import make_dpo_loss_fn

        lcfg = None
        if args.config:
            from cosy_tpu.compat.yaml_config import cv2_configs_from_yaml

            lcfg = cv2_configs_from_yaml(args.config)[0]
        if lcfg is None:
            from cosy_tpu.models.qwen2lm import Qwen2LMConfig

            lcfg = Qwen2LMConfig()
        params = init_override or init_qwen2lm_params(key, lcfg)
        ref = jax.tree.map(np.copy, params)
        _dpo_fn = make_dpo_loss_fn(lcfg, ref, beta=args.dpo_beta)

        def loss_fn(p, rng, batch, train=True):
            return _dpo_fn(p, rng, batch)
    elif args.model == "llm" and args.cosyvoice2:
        from cosy_tpu.models.qwen2lm import (init_qwen2lm_params,
                                             qwen2lm_forward_train)

        lcfg = cv2_cfgs[0]
        params = init_override or init_qwen2lm_params(key, lcfg)

        def loss_fn(p, rng, batch, train=True):
            out = qwen2lm_forward_train(P(p), lcfg, batch,
                                        Ctx(rng=rng, train=train), rng=rng)
            return out["loss"], {"acc": out["acc"]}
    elif args.model == "llm":
        from cosy_tpu.models import llm as L

        params = init_override or L.init_llm_params(key, cfg.llm)

        def loss_fn(p, rng, batch, train=True):
            out = L.llm_forward_train(P(p), cfg.llm, batch,
                                      Ctx(rng=rng, train=train))
            return out["loss"], {"acc": out["acc"]}
    elif args.cosyvoice2:
        from cosy_tpu.models.flow2 import flow2_forward_train, init_flow2_params

        f2cfg = cv2_cfgs[1]
        params = init_override or init_flow2_params(key, f2cfg)
        streaming = bool(args.cv2_streaming)

        def loss_fn(p, rng, batch, train=True):
            loss = flow2_forward_train(P(p), f2cfg, rng, batch,
                                       Ctx(rng=rng, train=train),
                                       streaming=streaming)
            return loss, {}
    else:
        from cosy_tpu.models import flow as F

        params = init_override or F.init_flow_params(key, cfg.flow)
        vendored = args.flow_style == "vendored"

        def loss_fn(p, rng, batch, train=True):
            loss = F.flow_forward_train(
                P(p), cfg.flow, rng, batch, Ctx(rng=rng, train=train),
                vendored_style=vendored, no_prompt=not vendored)
            return loss, {}

    trainer = FullTrainer(
        loss_fn, params, optax.adamw(args.lr), zero2=not args.no_zero2,
        grad_clip=args.grad_clip, accum=args.accum,
        tensor_parallel=args.tensor_parallel,
        sequence_parallel=args.sequence_parallel,
        pipeline_parallel_microbatches=args.pp_microbatches)
    dp = trainer.mesh.shape["dp"]
    if args.batch_size % dp:
        raise SystemExit(
            f"--batch_size {args.batch_size} must be divisible by the data-"
            f"parallel mesh size ({dp} devices): each micro batch shards "
            "over dp (reference DDP divides the global batch the same way)")
    if args.resume and os.path.isdir(ckpt_dir):
        print(f"resumed at step {trainer.load_checkpoint(ckpt_dir)}")
    start_step = trainer.step_count

    # CV runs dropout-free (reference executor.cv: model.eval())
    eval_jit = jax.jit(
        lambda p, rng, batch: loss_fn(p, rng, batch, train=False)[0])

    def run_cv(step):
        if not args.cv_data:
            return None
        losses = []
        cv_keep = _MODEL_KEYS["llm_dpo" if args.model == "llm" and args.dpo
                              else args.model]
        cv_batches = ({k: v for k, v in b.items() if k in cv_keep}
                      for b in build_loader(args.cv_data, args))
        for sb in stack_accum(cv_batches, 1, args.seq_bucket):
            b = {k: v[0] for k, v in sb.items()}  # accum=1 group -> bucketed batch
            losses.append(float(eval_jit(
                trainer.params, jax.random.PRNGKey(0), b)))
        if losses:
            cv = float(np.mean(losses))
            tb.add_scalars(step, {"loss": cv}, prefix="cv")
            print(f"CV loss at step {step}: {cv:.4f} ({len(losses)} batches)")
            return cv
        return None

    keep = _MODEL_KEYS["llm_dpo" if args.model == "llm" and args.dpo
                       else args.model]
    for epoch in range(args.epochs):
        t0 = time.time()
        batches = ({k: v for k, v in b.items() if k in keep}
                   for b in build_loader(args.train_data, args))
        for super_batch in stack_accum(batches, args.accum, args.seq_bucket):
            m = trainer.step(super_batch,
                             jax.random.fold_in(key, 9000 + trainer.step_count))
            if trainer.step_count % args.log_every == 0:
                tb.add_scalars(trainer.step_count, m, prefix="train")
                print(f"epoch {epoch} step {trainer.step_count}: " + " ".join(
                    f"{k}={v:.4f}" for k, v in sorted(m.items())))
            if args.max_steps and trainer.step_count - start_step >= args.max_steps:
                break
        run_cv(trainer.step_count)
        trainer.save_checkpoint(ckpt_dir)
        trainer.save_model(
            os.path.join(args.model_dir, f"{args.model}_epoch{epoch}.pt"),
            info={"epoch": epoch})
        print(f"== epoch {epoch} done ({time.time() - t0:.1f}s, "
              f"step {trainer.step_count})")
        if args.max_steps and trainer.step_count - start_step >= args.max_steps:
            break
    if getattr(trainer, "_ckptr", None):  # absent when --epochs 0
        trainer._ckptr.wait()  # drain async saves before interpreter exit
        trainer._ckptr.close()
    tb.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
