"""HiFiGAN generator — the streaming vocoder (reference hifigan.py).

Operates on AR hidden-state latents (1024-ch input) with global
conditioning on the AR speaker latent (models/__init__.py:126-138 wiring:
in_channels=1024, resblock '1', kernels [3,7,11], up kernels [16,16,4,4],
factors [8,8,2,2], initial 512, cond_channels 1024).

Weight-norm is folded into plain weights at conversion time.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp

from .common import (conv1d, conv_transpose1d, interpolate_linear, leaky_relu)

Params = Dict[str, Any]

LRELU_SLOPE = 0.1


@dataclass(frozen=True)
class HifiganConfig:
    in_channels: int = 1024
    out_channels: int = 1
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    upsample_factors: Tuple[int, ...] = (8, 8, 2, 2)
    cond_channels: int = 1024


def _get_padding(k: int, d: int) -> int:
    return (k * d - d) // 2


def _resblock1(p: Params, x: jnp.ndarray, k: int,
               dilations: Tuple[int, ...]) -> jnp.ndarray:
    """ResBlock1 (hifigan.py:17-105): 3x (lrelu->dilated conv->lrelu->conv)."""
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        xt = leaky_relu(x, LRELU_SLOPE)
        xt = conv1d(c1, xt, padding=_get_padding(k, d), dilation=d)
        xt = leaky_relu(xt, LRELU_SLOPE)
        xt = conv1d(c2, xt, padding=_get_padding(k, 1))
        x = xt + x
    return x


def forward(p: Params, x: jnp.ndarray, g: Optional[jnp.ndarray] = None,
            cfg: HifiganConfig = HifiganConfig()) -> jnp.ndarray:
    """x: (B, C_in, T); g: (B, cond, 1) -> (B, 1, T*256). hifigan.py:239-268."""
    o = conv1d(p["conv_pre"], x, padding=3)
    if g is not None and "cond_layer" in p:
        o = o + conv1d(p["cond_layer"], g)
    nk = len(cfg.resblock_kernel_sizes)
    for i, (u, k) in enumerate(zip(cfg.upsample_factors,
                                   cfg.upsample_kernel_sizes)):
        o = leaky_relu(o, LRELU_SLOPE)
        o = conv_transpose1d(p["ups"][i], o, stride=u, padding=(k - u) // 2)
        z = None
        for j in range(nk):
            rb = p["resblocks"][i * nk + j]
            y = _resblock1(rb, o, cfg.resblock_kernel_sizes[j],
                           cfg.resblock_dilations[j])
            z = y if z is None else z + y
        o = z / nk
    o = leaky_relu(o, 0.01)  # default torch slope (hifigan.py:265)
    o = conv1d(p["conv_post"], o, padding=3)
    return jnp.tanh(o)


def inference(p: Params, latents: jnp.ndarray, g: jnp.ndarray,
              cfg: HifiganConfig = HifiganConfig()) -> jnp.ndarray:
    """Streaming-path decode (hifigan.py:270-296).

    latents: (B, T, 1024) AR hidden states; g: (B, 1024) AR speaker latent.
    Double linear interpolation x(1024/256) then x(24000/22050).
    """
    c = jnp.transpose(latents, (0, 2, 1))
    t = c.shape[-1]
    up1 = interpolate_linear(c, int(t * 1024 / 256), scale=256 / 1024)
    up2 = interpolate_linear(up1, int(up1.shape[-1] * 24000 / 22050),
                             scale=22050 / 24000)
    return forward(p, up2, g[:, :, None], cfg)
