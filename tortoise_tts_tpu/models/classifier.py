"""Audio classifier (reference classifier.py:124-149).

AudioMiniEncoder + linear head; the downloadable 'classifier' checkpoint
is TorToiSe's "is this tortoise audio" detector.  Not wired into the TTS
pipeline (matching the reference) but available for parity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from .arch import audio_mini_encoder, audio_mini_encoder_init
from .common import linear, linear_init

Params = Dict[str, Any]


def init(key, classes: int = 2, spec_dim: int = 80, embedding_dim: int = 512,
         base_channels: int = 128, depth: int = 2, resnet_blocks: int = 2,
         attn_blocks: int = 4, num_attn_heads: int = 4,
         kernel_size: int = 3) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "enc": audio_mini_encoder_init(
            k1, spec_dim, embedding_dim, base_channels, depth, resnet_blocks,
            attn_blocks, num_attn_heads, kernel_size=kernel_size),
        "head": linear_init(k2, embedding_dim, classes),
    }


def forward(p: Params, mel: jnp.ndarray, num_attn_heads: int = 4,
            kernel_size: int = 3) -> jnp.ndarray:
    """mel: (B, spec_dim, T) -> logits (B, classes)."""
    h = audio_mini_encoder(p["enc"], mel, num_attn_heads, kernel_size)
    return linear(p["head"], h)
