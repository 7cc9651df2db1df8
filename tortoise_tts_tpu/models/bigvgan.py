"""BigVGAN vocoder — anti-aliased periodic-activation GAN (reference
bigvgan.py:417-541 generator + Snake/SnakeBeta activations + kaiser-sinc
up/down filters).

The generator maps a 100-bin 24 kHz mel to a waveform (256x hop).  The
shipped checkpoint is NVIDIA's bigvgan_24khz_100band (config defaults
below mirror its JSON, downloaded by reference models/__init__.py:114-125).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .common import (conv1d, conv_transpose1d, depthwise_lowpass,
                     depthwise_upsample, reflect_pad_1d)

Params = Dict[str, Any]


@dataclass(frozen=True)
class BigVGANConfig:
    """bigvgan_24khz_100band.json defaults."""
    num_mels: int = 100
    upsample_rates: Tuple[int, ...] = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock: str = "1"
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    activation: str = "snakebeta"
    snake_logscale: bool = True
    hop_size: int = 256

    @staticmethod
    def from_json(d: dict) -> "BigVGANConfig":
        return BigVGANConfig(
            num_mels=d["num_mels"],
            upsample_rates=tuple(d["upsample_rates"]),
            upsample_kernel_sizes=tuple(d["upsample_kernel_sizes"]),
            upsample_initial_channel=d["upsample_initial_channel"],
            resblock=str(d["resblock"]),
            resblock_kernel_sizes=tuple(d["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(x) for x in d["resblock_dilation_sizes"]),
            activation=d["activation"],
            snake_logscale=bool(d["snake_logscale"]),
            hop_size=d["hop_size"],
        )


# ---------------------------------------------------------------------------
# kaiser-windowed sinc filter (bigvgan.py:40-69)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=16)
def kaiser_sinc_filter(cutoff: float, half_width: float,
                       kernel_size: int) -> np.ndarray:
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    filt = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    filt /= filt.sum()
    return filt.astype(np.float32)


import os as _os

# anti-alias resampler implementation for the Snake activation:
#   pallas  — fused up2->snake->down2 VMEM kernel (ops/pallas_snake.py);
#             TPU only, the fastest by far
#   blocked — MXU matmul FIR (fastest XLA form; the off-TPU default)
#   fused   — elementwise polyphase XLA form (slower: lane-shifted
#             operands materialize)
#   poly    — VPU slice sums;  conv — (B*C,1,T) conv (slowest)
# "auto" picks pallas on TPU, blocked elsewhere.
_RESAMPLE = _os.environ.get("TTS_BV_RESAMPLE", "auto")


def _resample_mode() -> str:
    mode = _RESAMPLE
    if mode == "auto":
        import jax as _jax
        mode = ("pallas" if _jax.default_backend() == "tpu"
                else "blocked")
    return mode


def _up2(x: jnp.ndarray, ratio: int = 2) -> jnp.ndarray:
    """UpSample1d(ratio) (bigvgan.py:112-135)."""
    k = int(6 * ratio // 2) * 2
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    filt = kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, k)
    if _resample_mode() not in ("poly", "conv"):
        from .common import depthwise_upsample_blocked
        return depthwise_upsample_blocked(x, filt, ratio, pad, pad_left,
                                          pad_right)
    if _RESAMPLE == "poly":
        from .common import depthwise_upsample_poly
        return depthwise_upsample_poly(x, jnp.asarray(filt), ratio, pad,
                                       pad_left, pad_right)
    return depthwise_upsample(x, jnp.asarray(filt), ratio, pad, pad_left,
                              pad_right)


def _down2(x: jnp.ndarray, ratio: int = 2) -> jnp.ndarray:
    """DownSample1d(ratio) (bigvgan.py:137-152)."""
    k = int(6 * ratio // 2) * 2
    even = k % 2 == 0
    pad_left = k // 2 - int(even)
    pad_right = k // 2
    filt = kaiser_sinc_filter(0.5 / ratio, 0.6 / ratio, k)
    if _resample_mode() not in ("poly", "conv"):
        from .common import depthwise_lowpass_blocked
        return depthwise_lowpass_blocked(x, filt, ratio, pad_left,
                                         pad_right)
    if _RESAMPLE == "poly":
        from .common import depthwise_lowpass_poly
        return depthwise_lowpass_poly(x, jnp.asarray(filt), ratio,
                                      pad_left, pad_right)
    return depthwise_lowpass(x, jnp.asarray(filt), ratio, pad_left,
                             pad_right)


def _shift_views(x: jnp.ndarray, lo: int, hi: int):
    """{s: x[..., t+s] edge-clamped} for s in [lo, hi] — one edge pad,
    then static slices (slices fuse into elementwise consumers; per-shift
    concatenates would each materialize a full copy)."""
    T = x.shape[-1]
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(-lo, hi)], mode="edge")
    return {s: jax.lax.slice_in_dim(xp, s - lo, s - lo + T, axis=-1)
            for s in range(lo, hi + 1)}


def _snake_act_fused(p: Params, x: jnp.ndarray, logscale: bool,
                     beta: bool) -> jnp.ndarray:
    """up2 -> snake -> down2 as one elementwise polyphase pass.

    Algebraically identical to `_up2`/snake/`_down2` for ratio 2
    (k=12 kaiser filters, edge padding), but expressed as shifted-sum
    polyphase FIRs over even/odd streams E[t]=u[2t], O[t]=u[2t+1]:

        E[t] = 2*(f1 x[t+2] + f3 x[t+1] + f5 x[t]
                  + f7 x[t-1] + f9 x[t-2] + f11 x[t-3])
        O[t] = 2*(f0 x[t+3] + f2 x[t+2] + f4 x[t+1]
                  + f6 x[t]  + f8 x[t-1] + f10 x[t-2])
        y[t] = g1 E[t-2] + g3 E[t-1] + g5 E[t] + g7 E[t+1]
             + g9 E[t+2] + g11 E[t+3]
             + g0 O[t-3] + g2 O[t-2] + g4 O[t-1] + g6 O[t]
             + g8 O[t+1] + g10 O[t+2]

    Everything is elementwise (no framing/matmul/interleave), so XLA
    fuses the whole activation into one HBM pass — the up-sampled 2T
    intermediate never exists in memory.  The three boundary columns on
    each side (where the reference's edge padding interleaves E/O
    values) are patched exactly afterwards.
    """
    dt = x.dtype
    f = jnp.asarray(kaiser_sinc_filter(0.25, 0.3, 12), dt)
    g = f  # up and down use the same cutoff/width/k for ratio 2
    a = p["alpha"][None, :, None].astype(dt)
    b = p["beta"][None, :, None].astype(dt) if beta else a
    if logscale:
        a, b = jnp.exp(a), jnp.exp(b)
    inv_b = 1.0 / (b + 1e-9)
    T = x.shape[-1]

    xs = _shift_views(x, -3, 3)
    E = 2.0 * (f[1] * xs[2] + f[3] * xs[1] + f[5] * xs[0]
               + f[7] * xs[-1] + f[9] * xs[-2] + f[11] * xs[-3])
    O = 2.0 * (f[0] * xs[3] + f[2] * xs[2] + f[4] * xs[1]
               + f[6] * xs[0] + f[8] * xs[-1] + f[10] * xs[-2])
    E = E + inv_b * jnp.square(jnp.sin(E * a))
    O = O + inv_b * jnp.square(jnp.sin(O * a))

    Es = _shift_views(E, -2, 3)
    Os = _shift_views(O, -3, 2)
    y = (g[1] * Es[-2] + g[3] * Es[-1] + g[5] * Es[0]
         + g[7] * Es[1] + g[9] * Es[2] + g[11] * Es[3]
         + g[0] * Os[-3] + g[2] * Os[-2] + g[4] * Os[-1] + g[6] * Os[0]
         + g[8] * Os[1] + g[10] * Os[2])

    # Boundary columns: the reference edge-pads the *interleaved* stream
    # v (v[0]=E[0] on the left, v[2T-1]=O[T-1] on the right), which the
    # per-stream clamped shifts above don't reproduce.  Recompute the 3
    # edge columns each side exactly: y[t] = sum_i g[i] * v_p[2t+i],
    # v_p[j] = v[clamp(j-5, 0, 2T-1)], v[2u]=E[u], v[2u+1]=O[u].
    def col(t):
        acc = None
        for i in range(12):
            j = 2 * t + i - 5
            j = min(max(j, 0), 2 * T - 1)
            src = E[..., j // 2] if j % 2 == 0 else O[..., j // 2]
            term = g[i] * src
            acc = term if acc is None else acc + term
        return acc

    left = jnp.stack([col(t) for t in range(3)], axis=-1)
    right = jnp.stack([col(t) for t in range(T - 3, T)], axis=-1)
    y = jnp.concatenate([left, y[..., 3:T - 3], right], axis=-1)
    return y.astype(dt)


def _snake_xla_ref(x, a, binv):
    """up2 -> snake -> down2 in plain XLA at the kernel's (C,) fp32
    parameterisation — the differentiable reference for the Pallas
    kernel's custom_vjp (and its parity oracle in tests)."""
    xu = _up2(x)
    af = a[None, :, None].astype(xu.dtype)
    bf = binv[None, :, None].astype(xu.dtype)
    return _down2(xu + bf * jnp.square(jnp.sin(xu * af)))


@jax.custom_vjp
def _snake_pallas(x, a, binv):
    """Pallas fused up2->snake->down2 forward with an XLA backward:
    the kernel has no JVP rule, so BigVGAN GAN training on real TPU
    (where the kernel is the default) would otherwise fail inside
    pallas_call."""
    from ..ops.pallas_snake import snake_resample2
    return snake_resample2(x, a, binv)


def _snake_pallas_fwd(x, a, binv):
    return _snake_pallas(x, a, binv), (x, a, binv)


def _snake_pallas_bwd(res, g):
    x, a, binv = res
    _, vjp = jax.vjp(_snake_xla_ref, x, a, binv)
    return vjp(g)


_snake_pallas.defvjp(_snake_pallas_fwd, _snake_pallas_bwd)


def _snake_act(p: Params, x: jnp.ndarray, logscale: bool,
               beta: bool) -> jnp.ndarray:
    """Activation1d(Snake/SnakeBeta): up2 -> snake -> down2
    (bigvgan.py:158-271)."""
    mode = _resample_mode()
    if mode == "pallas" and jax.default_backend() != "tpu":
        mode = "blocked"   # explicit TTS_BV_RESAMPLE=pallas off-TPU
    if mode == "pallas" and x.shape[-1] >= 8:
        a = p["alpha"].astype(jnp.float32)
        b = p["beta"].astype(jnp.float32) if beta else a
        if logscale:
            a, b = jnp.exp(a), jnp.exp(b)
        return _snake_pallas(x, a, 1.0 / (b + 1e-9))
    if mode == "fused" and x.shape[-1] >= 8:
        return _snake_act_fused(p, x, logscale, beta)
    x = _up2(x)
    a = p["alpha"][None, :, None].astype(x.dtype)
    b = p["beta"][None, :, None].astype(x.dtype) if beta else a
    if logscale:
        a, b = jnp.exp(a), jnp.exp(b)
    x = x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(x * a))
    return _down2(x)


def _get_padding(k: int, d: int) -> int:
    return (k * d - d) // 2


def _amp_block1(p: Params, x: jnp.ndarray, k: int,
                dilations: Tuple[int, ...], cfg: BigVGANConfig) -> jnp.ndarray:
    """AMPBlock1 (bigvgan.py:306-364)."""
    beta = cfg.activation == "snakebeta"
    acts1 = p["activations"][::2]
    acts2 = p["activations"][1::2]
    for c1, c2, a1, a2, d in zip(p["convs1"], p["convs2"], acts1, acts2,
                                 dilations):
        xt = _snake_act(a1, x, cfg.snake_logscale, beta)
        xt = conv1d(c1, xt, padding=_get_padding(k, d), dilation=d)
        xt = _snake_act(a2, xt, cfg.snake_logscale, beta)
        xt = conv1d(c2, xt, padding=_get_padding(k, 1))
        x = xt + x
    return x


def _amp_block2(p: Params, x: jnp.ndarray, k: int,
                dilations: Tuple[int, ...], cfg: BigVGANConfig) -> jnp.ndarray:
    beta = cfg.activation == "snakebeta"
    for c, a, d in zip(p["convs"], p["activations"], dilations):
        xt = _snake_act(a, x, cfg.snake_logscale, beta)
        xt = conv1d(c, xt, padding=_get_padding(k, d), dilation=d)
        x = xt + x
    return x


def forward(p: Params, mel: jnp.ndarray,
            cfg: BigVGANConfig = BigVGANConfig()) -> jnp.ndarray:
    """mel: (B, 100, T) -> (B, 1, T*256). bigvgan.py:489-511."""
    x = conv1d(p["conv_pre"], mel, padding=3)
    nk = len(cfg.resblock_kernel_sizes)
    block = _amp_block1 if cfg.resblock == "1" else _amp_block2
    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        x = conv_transpose1d(p["ups"][i], x, stride=u, padding=(k - u) // 2)
        xs = None
        for j in range(nk):
            y = block(p["resblocks"][i * nk + j], x,
                      cfg.resblock_kernel_sizes[j],
                      cfg.resblock_dilation_sizes[j], cfg)
            xs = y if xs is None else xs + y
        x = xs / nk
    x = _snake_act(p["activation_post"], x, cfg.snake_logscale,
                   cfg.activation == "snakebeta")
    x = conv1d(p["conv_post"], x, padding=3)
    return jnp.tanh(x)


def inference(p: Params, mel: jnp.ndarray,
              cfg: BigVGANConfig = BigVGANConfig()) -> jnp.ndarray:
    """Pad 10 silent frames, decode, trim tail (bigvgan.py:522-535)."""
    zero = jnp.full((mel.shape[0], cfg.num_mels, 10), -11.5129, mel.dtype)
    mel = jnp.concatenate([mel, zero], axis=2)
    audio = forward(p, mel, cfg)
    audio = audio[:, :, : -(cfg.hop_size * 10)]
    return jnp.clip(audio, -1, 1)
