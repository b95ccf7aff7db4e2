#!/usr/bin/env python3
"""Data preparation CLI: (wav, txt) pairs -> parquet dataset.

TPU-native equivalent of the reference entry point (reference:
prepare_joint_data.py:375-403) with batched fused-XLA mel extraction.

Usage:
    python prepare_joint_data.py --input raw_audio --output data
        [--speech-tokenizer-onnx PATH] [--campplus-onnx PATH]
"""

import argparse

from cosy_tpu.data.prepare import (
    JointDataPreparer, PrepareConfig, OnnxCampplus, OnnxSpeechTokenizer,
)


def main():
    ap = argparse.ArgumentParser(description="prepare (wav, txt) -> parquet")
    ap.add_argument("--input", default="raw_audio")
    ap.add_argument("--output", default="data")
    ap.add_argument("--speech-tokenizer-onnx", default=None,
                    help="speech_tokenizer_v1.onnx from the pretrained model dir")
    ap.add_argument("--campplus-onnx", default=None,
                    help="campplus.onnx from the pretrained model dir")
    ap.add_argument("--samples-per-shard", type=int, default=100)
    args = ap.parse_args()

    speech_tok = spk_enc = None
    if args.speech_tokenizer_onnx:
        try:
            speech_tok = OnnxSpeechTokenizer(args.speech_tokenizer_onnx)
        except Exception as e:  # noqa: BLE001
            print(f"[WARN] speech tokenizer unavailable ({e}); using fallback tokens")
    if args.campplus_onnx:
        try:
            spk_enc = OnnxCampplus(args.campplus_onnx)
        except Exception as e:  # noqa: BLE001
            print(f"[WARN] campplus unavailable ({e}); using fallback embeddings")

    prep = JointDataPreparer(
        PrepareConfig(samples_per_shard=args.samples_per_shard),
        speech_tokenizer=speech_tok, spk_encoder=spk_enc,
    )
    n = prep.prepare(args.input, args.output)
    print(f"prepared {n} samples")


if __name__ == "__main__":
    main()
