"""RandomLatentConverter — voice-less conditioning latents
(reference random_latent_generator.py).

5 x EqualLinear(lr_mul=0.1) with fused leaky-relu (slope 0.2, scale
sqrt 2) + final Linear, mapping N(0,1) noise to fake AR (1024-d) /
diffusion (2048-d) conditioning latents (rlg_auto / rlg_diffuser
checkpoints, models/__init__.py:97-103).
"""

from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .common import linear, linear_init

Params = Dict[str, Any]

LR_MUL = 0.1


def init(key, channels: int) -> Params:
    ks = jax.random.split(key, 6)
    eq = [{"w": jax.random.normal(ks[i], (channels, channels)) / LR_MUL,
           "b": jnp.zeros((channels,))} for i in range(5)]
    return {"equal_linears": eq, "final": linear_init(ks[5], channels, channels)}


def forward(p: Params, noise: jnp.ndarray) -> jnp.ndarray:
    """noise: (B, C) -> latent (B, C)."""
    x = noise
    c = x.shape[-1]
    scale = (1.0 / math.sqrt(c)) * LR_MUL
    for lp in p["equal_linears"]:
        # EqualLinear keeps torch-layout w (out, in); runtime scaling by
        # (1/sqrt(in))*lr_mul, bias by lr_mul, then fused leaky-relu with
        # slope 0.2 scaled by sqrt(2) (random_latent_generator.py:10-39).
        y = x @ (lp["w"].T * scale) + lp["b"] * LR_MUL
        x = jnp.where(y >= 0, y, y * 0.2) * math.sqrt(2)
    return linear(p["final"], x)


def sample(p: Params, key: jax.Array, batch: int, channels: int) -> jnp.ndarray:
    return forward(p, jax.random.normal(key, (batch, channels)))
