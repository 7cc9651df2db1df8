"""LoRA adapters (capability-parity with reference models/lora.py).

The reference wraps torch modules (LoRALinear / ParameterizedLoRA,
lora.py:17-145) applied by an include-policy (default ``gpt``).  Here a
LoRA is a *separate pytree* of (a, b) factors over the stacked GPT trunk
weights; application is a pure function producing effective weights
``w + (alpha/rank) * a @ b`` — merged on the fly under jit, so the same
unified_voice forward serves base, adapter-train and merged-inference
modes without module surgery.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# stacked-GPT target weights (reference policy: every Linear/Conv1D under
# `gpt`, lora.py:163-195 + config.py:296-310 include=['gpt'])
GPT_TARGETS = ("attn_qkv", "attn_proj", "mlp_fc", "mlp_proj")


def init_lora(key, params: Params, rank: int = 128,
              targets: Tuple[str, ...] = GPT_TARGETS) -> Params:
    """Create zero-effect factors: a ~ kaiming-uniform, b = 0
    (lora.py:59-61 init scheme)."""
    lora: Params = {"gpt": {}}
    gpt = params["gpt"]
    for name in targets:
        w = gpt[name]["w"]            # (L, d_in, d_out)
        L, d_in, d_out = w.shape
        key, sub = jax.random.split(key)
        bound = 1.0 / math.sqrt(d_in)
        a = jax.random.uniform(sub, (L, d_in, rank), w.dtype, -bound, bound)
        b = jnp.zeros((L, rank, d_out), w.dtype)
        lora["gpt"][name] = {"a": a, "b": b}
    return lora


def apply_lora(params: Params, lora: Optional[Params], alpha: float = 128,
               rank: int = 128) -> Params:
    """Effective params with adapters merged (pure; jit-friendly)."""
    if lora is None:
        return params
    scale = alpha / rank
    gpt = dict(params["gpt"])
    for name, ab in lora["gpt"].items():
        entry = dict(gpt[name])
        delta = jnp.einsum("ldr,lrk->ldk", ab["a"].astype(entry["w"].dtype),
                           ab["b"].astype(entry["w"].dtype))
        entry["w"] = entry["w"] + scale * delta
        gpt[name] = entry
    out = dict(params)
    out["gpt"] = gpt
    return out


def merge_lora(params: Params, lora: Params, alpha: float = 128,
               rank: int = 128) -> Params:
    """Permanent merge for deployment (lora_get_state_dict merge mode,
    lora.py:220-228)."""
    return apply_lora(params, lora, alpha, rank)


def freeze_non_lora_mask(params: Params, lora: Params):
    """Trainable-mask pytrees: True for LoRA leaves (reference
    freeze_non_lora_weights, lora.py:207-218)."""
    frozen = jax.tree_util.tree_map(lambda _: False, params)
    trainable = jax.tree_util.tree_map(lambda _: True, lora)
    return frozen, trainable
