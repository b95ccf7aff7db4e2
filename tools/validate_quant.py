#!/usr/bin/env python3
"""Is int8 decode safe for this voice?  One-command bf16-vs-int8 validation.

Serving's ``--int8`` ships opt-in because weight-only quantization rounds
the decode logits: the sampled token stream can diverge per voice (PERF.md
int8 section).  This harness turns "validate per voice" into a command:

    python tools/validate_quant.py --model-dir pretrained_models/CosyVoice-300M \
        [--adapters adapters_merged.pt] [--texts texts.txt] \
        [--seeds 3] [--min-agreement 0.90] [--max-mcd 1.5]

For every prompt x seed it decodes in bf16 and int8 under the SAME rng and
reports token agreement and the DTW-MCD between the two synthesized audio
outputs (cosy_tpu.quant.validate_int8_voice).  Exit 0 when all prompts meet
both thresholds (int8 is safe to enable for this voice), 1 otherwise.

Defaults: agreement >= 0.90 and MCD <= 1.5 dB — looser than the
inter-stack parity gates (those compare the SAME tokens) because here the
token streams legitimately differ; tune per deployment.  Writes a JSON
report next to the adapters (or to --out).
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", required=True)
    ap.add_argument("--adapters", default=None,
                    help="optional adapter checkpoint (train_joint.py "
                         "adapters_*.pt / merge_joint_weights.py "
                         "--adapters-out) merged before validation")
    ap.add_argument("--texts", default=None,
                    help="file with one prompt text per line (default: 3 "
                         "built-in sentences)")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--min-agreement", type=float, default=0.90)
    ap.add_argument("--max-mcd", type=float, default=1.5)
    ap.add_argument("--out", default=None, help="JSON report path")
    ap.add_argument("--finetuned-norm", type=int, choices=[0, 1], default=1)
    args = ap.parse_args(argv)

    import jax

    from cosy_tpu.api import CosyVoice
    from cosy_tpu.quant import validate_int8_voice

    api = CosyVoice(args.model_dir, finetuned_norm=bool(args.finetuned_norm))
    llm_params = dict(api.model.llm_params)
    flow_params = dict(api.model.flow_params)
    if args.adapters:
        from cosy_tpu.lora import merge_lora
        from cosy_tpu.serve import load_voice_adapters

        ad = load_voice_adapters(args.adapters)
        if ad["llm"]:
            llm_params = merge_lora(llm_params, ad["llm"], ad["llm_scale"])
        if ad["flow"]:
            flow_params = merge_lora(flow_params, ad["flow"], ad["flow_scale"])

    if args.texts:
        with open(args.texts) as f:
            texts = [ln.strip() for ln in f if ln.strip()]
    else:
        texts = ["收到好友从远方寄来的生日礼物。",
                 "那份意外的惊喜与深深的祝福，让我心中充满了甜蜜的快乐。",
                 "笑容如花儿般绽放。"]
    token_list = [np.asarray(api.frontend.extract_text_token(t)) for t in texts]

    report = validate_int8_voice(
        api.cfg, llm_params, flow_params, api.model.hift_params,
        api.model.icfg, token_list, seeds=range(args.seeds),
        finetuned_norm=bool(args.finetuned_norm))
    report["thresholds"] = {"min_agreement": args.min_agreement,
                            "max_mcd_db": args.max_mcd}
    ok = (report["agreement_min"] >= args.min_agreement
          and report["mcd_db_max"] <= args.max_mcd)
    report["ok"] = bool(ok)

    out = args.out or (os.path.splitext(args.adapters)[0] + "_int8_report.json"
                       if args.adapters else "int8_report.json")
    json.dump(report, open(out, "w"), indent=1)
    for r in report["prompts"]:
        print(f"prompt {r['prompt']} seed {r['seed']}: agreement "
              f"{r['agreement']:.3f} ({r['tokens_bf16']}/{r['tokens_int8']} "
              f"tokens), MCD {r['mcd_db']:.3f} dB")
    print(f"INT8 {'SAFE' if ok else 'NOT VALIDATED'} for this voice: "
          f"min agreement {report['agreement_min']:.3f} "
          f"(>= {args.min_agreement}), max MCD {report['mcd_db_max']:.3f} dB "
          f"(<= {args.max_mcd}) -> {out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
