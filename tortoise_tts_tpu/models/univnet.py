"""UnivNet vocoder — kernel-predictor location-variable convolutions
(reference vocoder.py:9-314, the original TorToiSe 'vocoder' checkpoint).

mel (B, 100, T) + noise (B, 64, T) -> 24 kHz waveform, 256x hop.

The LVC op (vocoder.py:184-218) is re-expressed as a blocked gather +
einsum: output[b,oc,i,t] = sum_{ic,k} x_pad[b,ic,i*hop+t+k*d] *
kernel[b,i,ic,oc,k] + bias — one batched MXU contraction per dilation
instead of the reference's unfold chain.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from .common import conv1d, conv_transpose1d, leaky_relu, reflect_pad_1d

Params = Dict[str, Any]


@dataclass(frozen=True)
class UnivNetConfig:
    noise_dim: int = 64
    channel_size: int = 32
    dilations: Tuple[int, ...] = (1, 3, 9, 27)
    strides: Tuple[int, ...] = (8, 8, 4)
    lrelu_slope: float = 0.2
    kpnet_conv_size: int = 3
    hop_length: int = 256
    n_mel_channels: int = 100
    kpnet_hidden: int = 64
    conv_kernel_size: int = 3


# ---------------------------------------------------------------------------
# kernel predictor (vocoder.py:9-103)
# ---------------------------------------------------------------------------


def _kernel_predictor(p: Params, c: jnp.ndarray, cfg: UnivNetConfig,
                      in_ch: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """c: (B, mel, T_cond) -> kernels (B, L, IC, OC, K, T), bias (B, L, OC, T)."""
    slope = cfg.lrelu_slope
    h = leaky_relu(conv1d(p["input_conv"], c, padding=2), slope)
    for rc in p["residual_convs"]:
        y = leaky_relu(conv1d(rc["c1"], h, padding=1), slope)
        y = leaky_relu(conv1d(rc["c2"], y, padding=1), slope)
        h = h + y
    k = conv1d(p["kernel_conv"], h, padding=1)
    b = conv1d(p["bias_conv"], h, padding=1)
    batch, _, t = c.shape
    layers = len(cfg.dilations)
    out_ch = 2 * in_ch
    kernels = k.reshape(batch, layers, in_ch, out_ch, cfg.conv_kernel_size, t)
    bias = b.reshape(batch, layers, out_ch, t)
    return kernels, bias


def _lvc(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
         dilation: int, hop: int) -> jnp.ndarray:
    """Location-variable convolution (vocoder.py:184-218).

    x: (B, IC, L) with L = T_cond*hop; kernel: (B, IC, OC, K, T_cond);
    bias: (B, OC, T_cond) -> (B, OC, L).
    """
    b_, ic, L = x.shape
    k = kernel.shape[3]
    t_cond = kernel.shape[-1]
    pad = dilation * (k - 1) // 2
    xp = jnp.pad(x, [(0, 0), (0, 0), (pad, pad)])
    # gather index (T_cond, hop, K): i*hop + t + k*d
    idx = (jnp.arange(t_cond)[:, None, None] * hop
           + jnp.arange(hop)[None, :, None]
           + jnp.arange(k)[None, None, :] * dilation)
    seg = xp[:, :, idx]                        # (B, IC, T_cond, hop, K)
    o = jnp.einsum("bcitk,bcoki->boit", seg, kernel,
                   preferred_element_type=jnp.float32)
    o = o.astype(x.dtype) + bias[:, :, :, None].astype(x.dtype)
    return o.reshape(b_, -1, t_cond * hop)


def _lvc_block(p: Params, x: jnp.ndarray, c: jnp.ndarray, stride: int,
               cond_hop: int, cfg: UnivNetConfig) -> jnp.ndarray:
    """LVCBlock (vocoder.py:106-182)."""
    slope = cfg.lrelu_slope
    in_ch = x.shape[1]
    x = leaky_relu(x, slope)
    x = conv_transpose1d(p["convt_pre"], x, stride=stride,
                         padding=stride // 2 + stride % 2,
                         output_padding=stride % 2)
    kernels, bias = _kernel_predictor(p["kernel_predictor"], c, cfg, in_ch)
    for i, d in enumerate(cfg.dilations):
        y = leaky_relu(x, slope)
        y = conv1d(p["conv_blocks"][i], y,
                   padding=d * (cfg.conv_kernel_size - 1) // 2, dilation=d)
        y = leaky_relu(y, slope)
        out = _lvc(y, kernels[:, i], bias[:, i], dilation=1, hop=cond_hop)
        x = x + jax.nn.sigmoid(out[:, :in_ch]) * jnp.tanh(out[:, in_ch:])
    return x


def forward(p: Params, mel: jnp.ndarray, noise: jnp.ndarray,
            cfg: UnivNetConfig = UnivNetConfig()) -> jnp.ndarray:
    """mel: (B, 100, T); noise: (B, 64, T) -> (B, 1, T*256).
    vocoder.py:269-284."""
    z = conv1d(p["conv_pre"], reflect_pad_1d(noise, 3))
    hop = 1
    for i, stride in enumerate(cfg.strides):
        hop *= stride
        z = _lvc_block(p["res_stack"][i], z, mel, stride, hop, cfg)
    z = leaky_relu(z, cfg.lrelu_slope)
    z = conv1d(p["conv_post"], reflect_pad_1d(z, 3))
    return jnp.tanh(z)


def inference(p: Params, mel: jnp.ndarray, key: Optional[jax.Array] = None,
              noise: Optional[jnp.ndarray] = None,
              cfg: UnivNetConfig = UnivNetConfig()) -> jnp.ndarray:
    """Pad 10 silent frames, decode, trim (vocoder.py:302-314)."""
    zero = jnp.full((mel.shape[0], cfg.n_mel_channels, 10), -11.5129,
                    mel.dtype)
    mel = jnp.concatenate([mel, zero], axis=2)
    if noise is None:
        noise = jax.random.normal(key, (mel.shape[0], cfg.noise_dim,
                                        mel.shape[2]), mel.dtype)
    audio = forward(p, mel, noise, cfg)
    audio = audio[:, :, : -(cfg.hop_length * 10)]
    return jnp.clip(audio, -1, 1)
