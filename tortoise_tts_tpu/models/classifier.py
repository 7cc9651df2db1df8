"""Audio classifier (reference classifier.py:124-149).

AudioMiniEncoder + linear head; the downloadable 'classifier' checkpoint
is TorToiSe's "is this tortoise audio" detector.  Not wired into the TTS
pipeline (matching the reference, which ships the weights URL but never
constructs the module) but available for parity.

Defaults match the published classifier.pth architecture (the original
TorToiSe constructs it as AudioMiniEncoderWithClassifierHead(2,
spec_dim=1, embedding_dim=512, depth=5, downsample_factor=4,
resnet_blocks=2, attn_blocks=4, num_attn_heads=4, base_channels=32,
kernel_size=5) over RAW AUDIO (B, 1, T), not mels).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp

from .arch import audio_mini_encoder, audio_mini_encoder_init
from .common import linear, linear_init

Params = Dict[str, Any]


@dataclass(frozen=True)
class ClassifierConfig:
    classes: int = 2
    spec_dim: int = 1            # raw waveform channels
    embedding_dim: int = 512
    base_channels: int = 32
    depth: int = 5
    resnet_blocks: int = 2
    attn_blocks: int = 4
    num_attn_heads: int = 4
    downsample_factor: int = 4
    kernel_size: int = 5


def init(key, cfg: ClassifierConfig = ClassifierConfig()) -> Params:
    k1, k2 = jax.random.split(key)
    return {
        "enc": audio_mini_encoder_init(
            k1, cfg.spec_dim, cfg.embedding_dim, cfg.base_channels,
            cfg.depth, cfg.resnet_blocks, cfg.attn_blocks,
            cfg.num_attn_heads, downsample_factor=cfg.downsample_factor,
            kernel_size=cfg.kernel_size),
        "head": linear_init(k2, cfg.embedding_dim, cfg.classes),
    }


def forward(p: Params, audio: jnp.ndarray,
            cfg: ClassifierConfig = ClassifierConfig()) -> jnp.ndarray:
    """audio: (B, spec_dim, T) (raw waveform for the published
    checkpoint) -> logits (B, classes)."""
    h = audio_mini_encoder(p["enc"], audio, cfg.num_attn_heads,
                           cfg.kernel_size,
                           downsample_factor=cfg.downsample_factor)
    return linear(p["head"], h)
