"""cosy_tpu — TPU-native (JAX/XLA/Pallas/pjit) framework for LoRA fine-tuning the
CosyVoice-300M TTS stack.

Built from scratch with the capabilities of
leeoisaboy/cosyvoice-lora-finetune-framework (reference layout documented in
SURVEY.md), re-designed TPU-first:

- speech-token LLM (text -> 50 Hz speech tokens), Conformer text encoder +
  causal transformer LM
- conditional-flow-matching mel decoder (speech tokens -> 80-bin mel) with a
  U-Net estimator
- HiFT NSF-iSTFT vocoder (mel -> waveform)
- functional LoRA adapters, joint LLM+Flow training, anti-semantic-leakage
  machinery, adapter merging, prompt-free inference

Parameters live in flat dicts keyed by the original torch state_dict names
(torch layouts), so pretrained CosyVoice checkpoints load with exact
weight-naming parity and merged adapters export back in the original format.
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache (first full-model compile is ~minutes
    over the TPU tunnel; cached compiles are seconds).  Opt out with
    COSY_TPU_NO_CACHE=1."""
    import os

    if os.environ.get("COSY_TPU_NO_CACHE"):
        return
    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.expanduser(
        "~/.cache/cosy_tpu/jax")
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 — cache is best-effort
        pass


_enable_compilation_cache()
