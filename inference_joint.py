#!/usr/bin/env python3
"""Prompt-free TTS inference with merged fine-tuned weights.

TPU-native equivalent of the reference entry point (reference:
inference_joint.py): loads stock CosyVoice weights, overwrites llm/flow with
the merged fine-tuned state dicts, applies the mel normalize/denormalize
wrapper around flow (the reference monkey-patches flow.inference,
inference_joint.py:129-151 — here it is the pipeline's finetuned_norm flag),
synthesizes from empty prompts + zero speaker embedding.

Usage:
    python inference_joint.py --text "..." [--llm PATH] [--flow PATH]
        [--output out.wav] [--speed 1.0] [--stream]
"""

import argparse
import os

import numpy as np
import jax

from cosy_tpu.config import ModelConfig, InferenceConfig
from cosy_tpu.compat import fold_weight_norm
from cosy_tpu.compat.loader import load_or_init
from cosy_tpu.params import load_torch_checkpoint
from cosy_tpu.data.text import text_normalize, contains_chinese
from cosy_tpu.data.tokenizer import TextTokenizer, find_vocab_file
from cosy_tpu.infer.pipeline import TTSPipeline


def save_wav(path: str, wav: np.ndarray, sr: int = 22050):
    from scipy.io import wavfile

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    wavfile.write(path, sr, (np.clip(wav, -1, 1) * 32767).astype(np.int16))


def main():
    ap = argparse.ArgumentParser(description="prompt-free TTS with merged LoRA weights")
    ap.add_argument("--text", "-t", required=True)
    ap.add_argument("--llm", default=None, help="merged LLM weights (default output/llm_merged_joint.pt)")
    ap.add_argument("--flow", default=None, help="merged Flow weights (default output/flow_merged_joint.pt)")
    ap.add_argument("--pretrained", default="pretrained_models/CosyVoice-300M")
    ap.add_argument("--output", "-o", default="output/inference/joint_output.wav")
    ap.add_argument("--tiny", action="store_true",
                    help="smoke-test topology (toy widths; not checkpoint-compatible)")
    ap.add_argument("--speed", "-s", type=float, default=1.0)
    ap.add_argument("--stream", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--meanflow", action="store_true",
                    help="few-step distilled sampler (flow weights from "
                         "distill_flow.py; 1-2 estimator calls instead of "
                         "the 20-40 call Euler solve)")
    ap.add_argument("--meanflow-steps", type=int, default=2)
    args = ap.parse_args()

    from cosy_tpu.config import tiny_model_config
    model_cfg = tiny_model_config() if args.tiny else ModelConfig()
    rng = jax.random.PRNGKey(args.seed)
    params = load_or_init(args.pretrained, model_cfg, rng)

    llm_path = args.llm or os.path.join("output", "llm_merged_joint.pt")
    flow_path = args.flow or os.path.join("output", "flow_merged_joint.pt")
    for name, path in (("llm", llm_path), ("flow", flow_path)):
        if os.path.exists(path):
            print(f"loading merged {name} weights: {path}")
            params[name] = load_torch_checkpoint(path)
        else:
            print(f"[WARN] {path} not found — using base {name} weights")
    if not params.get("hift"):
        if args.tiny:
            # smoke mode: random vocoder (noise out, but the full path runs)
            from cosy_tpu.models.hift import init_hift_params

            params["hift"] = init_hift_params(jax.random.fold_in(rng, 9),
                                              model_cfg.hift)
        else:
            raise SystemExit("hift.pt is required for waveform synthesis "
                             f"(looked in {args.pretrained})")

    vocab = find_vocab_file(os.path.join(args.pretrained,
                                         "multilingual_zh_ja_yue_char_del.tiktoken"))
    normalized = text_normalize(args.text)
    if vocab is None and args.tiny:
        # smoke mode without the BPE asset: raw utf-8 byte ids
        ids = np.asarray([list(normalized.encode("utf-8"))], np.int32)
    else:
        tok = TextTokenizer(vocab)
        ids = np.asarray([tok.encode(normalized)], np.int32)
    print(f"text: {args.text!r} -> {ids.shape[1]} tokens "
          f"(lang={'zh' if contains_chinese(args.text) else 'en'})")

    icfg = InferenceConfig()
    _distilled = any(k in params["flow"] for k in (
        "flow.decoder.estimator.time_mlp_s.linear_1.weight",
        "decoder.estimator.time_mlp_s.linear_1.weight"))
    if args.meanflow:
        if not _distilled:
            raise SystemExit("--meanflow needs distilled flow weights "
                             "(run distill_flow.py first)")
        if args.meanflow_steps < 1:
            raise SystemExit("--meanflow-steps must be >= 1")
        from cosy_tpu.config import replace as creplace
        icfg = creplace(icfg, sampler="meanflow",
                        meanflow_steps=args.meanflow_steps)
    elif _distilled:
        # a distilled checkpoint under the Euler solver evaluates a field
        # that is neither v nor u (distillation retrains the whole
        # estimator as part of the (base + s-branch) sum) — garbled audio
        raise SystemExit("these flow weights are MeanFlow-distilled "
                         "(time_mlp_s branch present); pass --meanflow, or "
                         "point --flow at un-distilled weights")
    pipe = TTSPipeline(model_cfg, params["llm"], params["flow"], params["hift"],
                       icfg, finetuned_norm=True)

    # zero speaker embedding with the spk row present — the reference's
    # prompt-free path (inference_joint.py:179-181)
    zero_spk = np.zeros((1, model_cfg.llm.spk_embed_dim), np.float32)
    chunks = []
    for out in pipe.synthesize(jax.random.fold_in(rng, 1), ids,
                               spk_embedding=zero_spk,
                               stream=args.stream, speed=args.speed):
        chunks.append(out["tts_speech"])
        print(f"  chunk: {out['tts_speech'].shape[1] / model_cfg.sample_rate:.2f}s")
    wav = np.concatenate(chunks, axis=1)[0]
    save_wav(args.output, wav, model_cfg.sample_rate)
    print(f"saved {len(wav) / model_cfg.sample_rate:.2f}s -> {args.output}")


if __name__ == "__main__":
    main()
