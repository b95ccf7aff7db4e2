"""Joint LLM + Flow LoRA training forward.

Reference behavior: llm_flow_model.py (JointLLMFlowModel).  The joint loss is
llm_loss_weight * llm_ce + flow_loss_weight * flow_cfm, with both paths in
no-prompt mode by default (reference: llm_flow_model.py:77-229).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..config import ModelConfig, TrainConfig
from ..ctx import Ctx
from ..params import P, Params
from . import flow as F
from . import llm as L


def joint_forward_train(
    llm_params: Params,
    flow_params: Params,
    loras: Dict[str, Params],
    cfg: ModelConfig,
    tcfg: TrainConfig,
    rng: jax.Array,
    batch: Dict[str, jax.Array],
    train: bool = True,
) -> Dict[str, jax.Array]:
    """Returns {'loss', 'llm_loss', 'flow_loss', 'llm_acc'} (weighted like
    llm_flow_model.py:77-107).  ``loras`` maps 'llm'/'flow' to adapter dicts;
    either may be empty for frozen submodels."""
    losses: Dict[str, jax.Array] = {}
    mode = tcfg.training_mode

    if mode in ("joint", "llm_only"):
        lctx = Ctx(
            rng=jax.random.fold_in(rng, 1), train=train,
            lora=loras.get("llm") or None,
            lora_scale=tcfg.llm_lora.scaling, lora_dropout=tcfg.llm_lora.dropout,
        )
        res = L.llm_forward_train(P(llm_params), cfg.llm, batch, lctx)
        losses["llm_loss"] = res["loss"] * tcfg.llm_loss_weight
        losses["llm_acc"] = res["acc"]

    if mode in ("joint", "flow_only"):
        fctx = Ctx(
            rng=jax.random.fold_in(rng, 2), train=train,
            lora=loras.get("flow") or None,
            lora_scale=tcfg.flow_lora.scaling, lora_dropout=tcfg.flow_lora.dropout,
        )
        # no_prompt carries the full NoPromptConfig so mode='mixed'
        # (flow_model.py:443-457) reaches the flow forward; a plain bool
        # keeps the default 100%-promptless behavior
        fl = F.flow_forward_train(
            P(flow_params), cfg.flow, jax.random.fold_in(rng, 3), batch, fctx,
            leak=tcfg.anti_leakage,
            no_prompt=tcfg.no_prompt if tcfg.no_prompt_training else False,
            mel_norm=(cfg.mel_mean, cfg.mel_std),
        )
        losses["flow_loss"] = fl * tcfg.flow_loss_weight

    if mode == "joint":
        losses["loss"] = losses["llm_loss"] + losses["flow_loss"]
    elif mode == "llm_only":
        losses["loss"] = losses["llm_loss"]
    else:
        losses["loss"] = losses["flow_loss"]
    return losses
