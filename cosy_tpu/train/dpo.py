"""DPO fine-tuning for the CosyVoice2 speech LLM.

Reference wiring: ``cosyvoice/bin/train.py`` ``--dpo`` swaps the model
forward for ``forward_dpo`` and builds a frozen reference model +
``DPOLoss(beta=0.01)`` (:131-166); ``train_utils.batch_forward`` (:238-274)
then combines ``loss = preference_loss + sft_loss`` from the policy's and the
no-grad reference model's chosen/rejected log-probs, logging dpo_acc and
mean rewards.  The dataset side carries ``reject_speech_token`` through
``processor.padding(dpo=True)`` (processor.py:422-429).

TPU-native design: one jitted loss closure over (policy params -> loss);
the frozen reference forward runs inside the same XLA program under
``stop_gradient`` (no separate "ref model" object, no second dispatch), and
the whole thing drops into ``FullTrainer`` for dp + ZeRO-2.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..ctx import Ctx, EVAL
from ..params import P, Params
from ..models.gan import dpo_loss
from ..models.qwen2lm import Qwen2LMConfig, qwen2lm_forward_dpo


def make_dpo_loss_fn(
    cfg: Qwen2LMConfig,
    ref_params: Params,
    beta: float = 0.01,
    label_smoothing: float = 0.0,
    ipo: bool = False,
):
    """Build ``loss_fn(policy_params, rng, batch) -> (loss, metrics)`` for
    FullTrainer.  ``batch`` needs text/speech token fields plus
    ``reject_speech_token``/``reject_speech_token_len``."""

    def loss_fn(params: Params, rng: jax.Array, batch: Dict[str, jax.Array]
                ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        pol = qwen2lm_forward_dpo(P(params), cfg, batch,
                                  Ctx(rng=rng, train=True), rng=rng)
        # frozen reference: eval mode, same uni/bistream coin (same rng) so
        # chosen/rejected sequences are packed identically
        ref = qwen2lm_forward_dpo(P(ref_params), cfg, batch, EVAL, rng=rng)
        ref = jax.tree.map(jax.lax.stop_gradient, ref)

        pref, chosen_r, reject_r = dpo_loss(
            pol["chosen_logps"], pol["rejected_logps"],
            ref["chosen_logps"], ref["rejected_logps"],
            beta=beta, label_smoothing=label_smoothing, ipo=ipo)
        sft = pol["loss"]
        loss = pref + sft  # train_utils.py:268
        metrics = {
            "sft_loss": sft,
            "dpo_loss": pref,
            "dpo_acc": jnp.mean((chosen_r > reject_r).astype(jnp.float32)),
            "chosen_reward": jnp.mean(chosen_r),
            "reject_reward": jnp.mean(reject_r),
            "acc": pol["acc"],
        }
        return loss, metrics

    return loss_fn
