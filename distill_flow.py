#!/usr/bin/env python3
"""Few-step MeanFlow distillation of a (merged-finetune) flow model.

Beyond-reference capability (PAPERS.md: MeanFlow / IntMeanFlow): compresses
the reference's 10-20 step CFG-doubled Euler mel solve (20-40 estimator
calls, flow_model.py:94-125, 525-536) into 1-2 single estimator calls.
Train on the same prepared parquet data as train_joint.py, starting from
merged fine-tuned flow weights; synthesize with

    python inference_joint.py --text ... --flow output/flow_distilled.pt --meanflow

Usage:
    python distill_flow.py --data-dir data [--flow output/flow_merged_joint.pt]
        [--steps 2000] [--lr 1e-5] [--batch-size 4] [--out output/flow_distilled.pt]
"""

import argparse
import os

import jax

from cosy_tpu.config import ModelConfig


def _make_batches(args):
    """Shared data plumbing for both families: the flow-only TrainConfig,
    the parquet dataset, and an endless generator of flow-key batches.
    Returns None when the data dir is empty (caller prints and exits)."""
    from cosy_tpu.config import TrainConfig, replace as creplace
    from cosy_tpu.data.dataset import FlowFinetuneDataset, DataLoader

    tcfg = TrainConfig(training_mode="flow_only", batch_size=args.batch_size,
                       accumulate_grad_batches=1)
    if args.max_feat_len:
        tcfg = creplace(tcfg, max_feat_len=args.max_feat_len)
    dataset = FlowFinetuneDataset(args.data_dir, augmentation=False,
                                  seed=args.seed)
    if len(dataset) == 0:
        print(f"no data in {args.data_dir}; run prepare_joint_data.py first")
        return None, tcfg

    def batches():
        loader = DataLoader(dataset, tcfg, seed=args.seed)
        while True:
            for super_batch in loader:
                # (accum=1, B, ...) -> (B, ...), flow keys only
                yield {k: v[0] for k, v in super_batch.items()
                       if k in ("speech_token", "speech_token_len",
                                "speech_feat", "speech_feat_len", "embedding")}

    return batches, tcfg


def main():
    ap = argparse.ArgumentParser(description="MeanFlow few-step flow distillation")
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--flow", default=None,
                    help="teacher flow weights (default output/flow_merged_joint.pt, "
                         "else the pretrained flow)")
    ap.add_argument("--pretrained", default="pretrained_models/CosyVoice-300M")
    ap.add_argument("--out", default="output/flow_distilled.pt")
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--lr", type=float, default=1e-5)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--cfg-rate", type=float, default=None,
                    help="guidance strength folded into the student "
                         "(default: inference_cfg_rate 0.7)")
    ap.add_argument("--inst-frac", type=float, default=0.25,
                    help="fraction of draws with s == t (instantaneous anchor)")
    ap.add_argument("--target", default="integral", choices=["integral", "jvp"],
                    help="integral: regress onto m teacher Euler sub-steps "
                         "(robust); jvp: MeanFlow-identity bootstrap (one "
                         "teacher call/step)")
    ap.add_argument("--teacher-substeps", type=int, default=4)
    ap.add_argument("--max-feat-len", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test topology (toy widths; not checkpoint-compatible)")
    ap.add_argument("--cosyvoice2", action="store_true",
                    help="distill the CosyVoice2 causal flow (Flow2Config; "
                         "teacher from the CV2 model dir or --flow)")
    args = ap.parse_args()

    if args.cosyvoice2:
        _main_cv2(args)
        return

    from cosy_tpu.config import tiny_model_config
    model_cfg = tiny_model_config() if args.tiny else ModelConfig()
    batches, tcfg = _make_batches(args)
    if batches is None:
        return

    from cosy_tpu.ctx import root_key
    from cosy_tpu.params import load_torch_checkpoint
    teacher_path = args.flow or os.path.join("output", "flow_merged_joint.pt")
    if os.path.exists(teacher_path):
        print(f"teacher: merged flow weights {teacher_path}")
        flow_params = load_torch_checkpoint(teacher_path)
    elif args.flow:
        # an EXPLICIT teacher path that doesn't exist is a typo, not a
        # fallback — distilling 2000 steps from the base voice instead
        # would silently ship the wrong voice
        raise SystemExit(f"--flow {args.flow}: file not found")
    else:
        # only the implicit default falls back to the pretrained flow
        # (loaded alone — llm/hift are never touched by distillation)
        from cosy_tpu.compat.loader import load_or_init

        rng = root_key(args.seed, tcfg.prng_impl)
        flow_params = load_or_init(args.pretrained, model_cfg, rng)["flow"]
        print(f"teacher: base flow weights ({teacher_path} not found)")

    from cosy_tpu.train.distill import FlowDistiller
    print(f"devices: {jax.devices()}")
    print(f"distilling: steps={args.steps} lr={args.lr} bs={args.batch_size} "
          f"cfg_rate={model_cfg.flow.cfm.inference_cfg_rate if args.cfg_rate is None else args.cfg_rate} "
          f"inst_frac={args.inst_frac}")
    distiller = FlowDistiller(
        model_cfg.flow, flow_params, lr=args.lr, cfg_rate=args.cfg_rate,
        inst_frac=args.inst_frac, target=args.target,
        teacher_substeps=args.teacher_substeps,
        mel_norm=(model_cfg.mel_mean, model_cfg.mel_std),
        seed=args.seed, prng_impl=tcfg.prng_impl)
    state = distiller.fit(batches(), steps=args.steps)
    distiller.export(state, args.out)
    print(f"saved distilled flow -> {args.out}")
    print("synthesize with: python inference_joint.py --text ... "
          f"--flow {args.out} --meanflow")


def _main_cv2(args):
    """CosyVoice2 causal-flow distillation (train/distill.py family='cv2').

    The teacher is the CV2 model dir's flow.pt (topology from its
    cosyvoice.yaml when present) or --flow; data must be prepared with the
    CV2 tokenizer/24 kHz mel (prepare_joint_data.py --cosyvoice2-style
    features).  The distilled checkpoint serves via
    `python -m cosy_tpu.serve --cosyvoice2 --sampler meanflow --flow-weights ...`.
    """
    from cosy_tpu.models.flow2 import Flow2Config, init_flow2_params

    pretrained = args.pretrained
    if pretrained == "pretrained_models/CosyVoice-300M":  # v1 default
        pretrained = "pretrained_models/CosyVoice2-0.5B"

    if args.tiny:
        from cosy_tpu.config import EncoderConfig, EstimatorConfig
        from cosy_tpu.ctx import root_key

        # same graph structure as CosyVoice2 at toy widths, but data-dim
        # compatible with prepare_joint_data.py output (80 mel, 192 spk)
        flow_cfg = Flow2Config(
            input_size=16, output_size=80, spk_embed_dim=192, vocab_size=128,
            encoder=EncoderConfig(input_size=16, output_size=16,
                                  attention_heads=2, linear_units=24,
                                  num_blocks=1, static_chunk_size=4),
            num_up_blocks=1,
            estimator=EstimatorConfig(in_channels=320, out_channels=80,
                                      channels=(16, 16), attention_head_dim=4,
                                      n_blocks=1, num_mid_blocks=1,
                                      num_heads=2),
            decoder_static_chunk_size=4,
        )
        flow_params = init_flow2_params(root_key(args.seed, "threefry2x32"),
                                        flow_cfg)
    else:
        flow_cfg = Flow2Config()
        yaml_path = os.path.join(pretrained, "cosyvoice.yaml")
        if os.path.exists(yaml_path):
            from cosy_tpu.compat.yaml_config import cv2_configs_from_yaml

            _, flow_cfg, _, _ = cv2_configs_from_yaml(yaml_path)
        from cosy_tpu.ctx import root_key
        from cosy_tpu.params import load_torch_checkpoint
        teacher_path = args.flow or os.path.join(pretrained, "flow.pt")
        if os.path.exists(teacher_path):
            print(f"teacher: CV2 flow weights {teacher_path}")
            flow_params = load_torch_checkpoint(teacher_path)
        elif args.flow:
            raise SystemExit(f"--flow {args.flow}: file not found")
        else:
            print(f"WARNING: {teacher_path} not found — random init "
                  "(smoke-test mode)")
            flow_params = init_flow2_params(root_key(args.seed, "threefry2x32"),
                                            flow_cfg)

    batches, tcfg = _make_batches(args)
    if batches is None:
        return

    from cosy_tpu.train.distill import FlowDistiller
    print(f"devices: {jax.devices()}")
    print(f"distilling (cv2): steps={args.steps} lr={args.lr} "
          f"bs={args.batch_size} "
          f"cfg_rate={flow_cfg.cfm.inference_cfg_rate if args.cfg_rate is None else args.cfg_rate} "
          f"inst_frac={args.inst_frac}")
    distiller = FlowDistiller(
        flow_cfg, flow_params, lr=args.lr, cfg_rate=args.cfg_rate,
        inst_frac=args.inst_frac, target=args.target,
        teacher_substeps=args.teacher_substeps, family="cv2",
        seed=args.seed, prng_impl=tcfg.prng_impl)
    state = distiller.fit(batches(), steps=args.steps)
    distiller.export(state, args.out)
    print(f"saved distilled CV2 flow -> {args.out}")
    print("serve with: python -m cosy_tpu.serve --cosyvoice2 "
          f"--sampler meanflow --flow-weights {args.out}")


if __name__ == "__main__":
    main()
