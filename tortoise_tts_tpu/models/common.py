"""Functional NN primitives over plain parameter pytrees.

Design: every model in this package is a pair of pure functions
``init(rng, cfg) -> params`` and ``apply(params, *args) -> out`` where
``params`` is a nested dict of jnp arrays.  No module classes, no global
state; jit/vmap/shard_map compose directly.

Conventions (chosen for mechanical weight ingestion from the reference's
PyTorch checkpoints, see models/convert.py):

- linear weights are stored ``(in, out)`` so application is ``x @ w + b``
  (torch ``nn.Linear.weight`` is ``(out, in)`` -> transposed on import;
  HF GPT-2 ``Conv1D`` is already ``(in, out)`` -> imported as-is).
- conv1d weights are stored in torch layout ``(out, in, k)`` and applied
  with ``lax.conv_general_dilated`` using ``('NCH','OIH','NCH')`` numbers.
- norm params use ``scale`` / ``bias`` keys.

Reference behaviors mirrored here:
- GroupNorm32 (arch_utils.py:24-26): normalise in fp32, cast back.
- ``normalization`` group-count heuristic (arch_utils.py:29-44).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# init helpers
# ---------------------------------------------------------------------------


def _uniform(key, shape, bound, dtype=jnp.float32):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def linear_init(key, d_in: int, d_out: int, bias: bool = True,
                std: Optional[float] = None) -> Params:
    """Torch nn.Linear default init (kaiming-uniform) unless std given."""
    kw, kb = jax.random.split(key)
    if std is None:
        bound = 1.0 / math.sqrt(d_in)
        w = _uniform(kw, (d_in, d_out), bound)
    else:
        w = jax.random.normal(kw, (d_in, d_out)) * std
    p = {"w": w}
    if bias:
        bound = 1.0 / math.sqrt(d_in)
        p["b"] = _uniform(kb, (d_out,), bound)
    return p


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def embedding_init(key, n: int, dim: int, std: float = 0.02) -> Params:
    return {"w": jax.random.normal(key, (n, dim)) * std}


def embedding(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    # mode="clip": jnp.take's jit default fills out-of-range rows with
    # NaN on CPU but the TPU backend clamps — pin the TPU semantics so
    # a decode budget beyond max_*_seq_len degrades instead of NaNing
    return jnp.take(p["w"], ids, axis=0, mode="clip")


def conv1d_init(key, c_in: int, c_out: int, k: int, bias: bool = True) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(c_in * k)
    p = {"w": _uniform(kw, (c_out, c_in, k), bound)}
    if bias:
        p["b"] = _uniform(kb, (c_out,), bound)
    return p


def conv1d(p: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0,
           dilation: int = 1, groups: int = 1) -> jnp.ndarray:
    """x: (B, C, T) -> (B, C_out, T_out). Torch-compatible semantics."""
    w = p["w"].astype(x.dtype)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[None, :, None]
    return y


def conv1d_nhc(p: Params, x: jnp.ndarray, stride: int = 1, padding: int = 0,
               dilation: int = 1) -> jnp.ndarray:
    """Channels-last conv: x (B, T, C_in) -> (B, T', C_out).

    Same torch-layout weights as conv1d ((out, in, k)), transposed to
    (k, in, out) at trace time.  On TPU, channels ride the lane dim —
    dramatically better lowering for long-sequence small-channel convs
    (the vocoder regime)."""
    w = jnp.transpose(p["w"].astype(x.dtype), (2, 1, 0))
    y = lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(padding, padding)],
        rhs_dilation=(dilation,), dimension_numbers=("NHC", "HIO", "NHC"))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[None, None, :]
    return y


def conv_transpose1d_nhc(p: Params, x: jnp.ndarray, stride: int,
                         padding: int = 0,
                         output_padding: int = 0) -> jnp.ndarray:
    """Channels-last ConvTranspose1d: x (B, T, C_in) -> (B, T', C_out).
    Weight stored torch-layout (in, out, k); expressed as a zero-stuffed
    forward conv with flipped kernel."""
    w = p["w"].astype(x.dtype)              # (I, O, K)
    k = w.shape[-1]
    wf = jnp.transpose(w[:, :, ::-1], (2, 0, 1))   # (K, I, O)
    y = lax.conv_general_dilated(
        x, wf, window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
        lhs_dilation=(stride,), dimension_numbers=("NHC", "HIO", "NHC"))
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[None, None, :]
    return y


def depthwise_lowpass_nhc(x: jnp.ndarray, filt: jnp.ndarray, stride: int,
                          pad_left: int, pad_right: int,
                          pad_mode: str = "edge") -> jnp.ndarray:
    """Channels-last shared-filter FIR: x (B, T, C); filt (K,).
    Natively depthwise via feature_group_count=C with a broadcast kernel
    (K, 1, C) — channels stay on lanes."""
    b, t, c = x.shape
    x = jnp.pad(x, [(0, 0), (pad_left, pad_right), (0, 0)], mode=pad_mode)
    w = jnp.broadcast_to(filt.astype(x.dtype)[:, None, None],
                         (filt.shape[0], 1, c))
    return lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=[(0, 0)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c)


def depthwise_upsample_nhc(x: jnp.ndarray, filt: jnp.ndarray, ratio: int,
                           pad: int, pad_left: int,
                           pad_right: int) -> jnp.ndarray:
    """Channels-last BigVGAN UpSample1d."""
    b, t, c = x.shape
    k = filt.shape[0]
    x = jnp.pad(x, [(0, 0), (pad, pad), (0, 0)], mode="edge")
    w = jnp.broadcast_to(filt[::-1].astype(x.dtype)[:, None, None],
                         (k, 1, c))
    y = lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(ratio,), dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c)
    y = ratio * y
    return y[:, pad_left:y.shape[1] - pad_right]


def depthwise_lowpass_poly(x: jnp.ndarray, filt: jnp.ndarray, stride: int,
                           pad_left: int, pad_right: int,
                           pad_mode: str = "edge") -> jnp.ndarray:
    """Shared-filter FIR as a sum of K strided slices (pure VPU
    elementwise, one XLA fusion) — a 1-in/1-out-channel conv cannot use
    the MXU and lowers to a scalar loop on TPU; this formulation is the
    fast path for BigVGAN's anti-alias filters.  Matches
    depthwise_lowpass exactly."""
    b, c, t = x.shape
    x = jnp.pad(x, [(0, 0), (0, 0), (pad_left, pad_right)], mode=pad_mode)
    k = filt.shape[0]
    t_out = (x.shape[-1] - k) // stride + 1
    y = None
    for j in range(k):
        xj = lax.slice_in_dim(x, j, j + stride * (t_out - 1) + 1, stride,
                              axis=2)
        term = filt[j].astype(x.dtype) * xj
        y = term if y is None else y + term
    return y


def depthwise_upsample_poly(x: jnp.ndarray, filt: jnp.ndarray, ratio: int,
                            pad: int, pad_left: int,
                            pad_right: int) -> jnp.ndarray:
    """Polyphase zero-stuffed upsample matching depthwise_upsample:
    y[ratio*s + p] = ratio * sum_m filt[ratio*m + p] * x_pad[s - m],
    computed as per-phase tap sums (VPU) and interleaved."""
    b, c, t = x.shape
    k = filt.shape[0]
    x = jnp.pad(x, [(0, 0), (0, 0), (pad, pad)], mode="edge")
    tp = x.shape[-1]
    # full output before trimming: length ratio*tp + k - ratio
    # (conv with lhs_dilation=ratio, padding k-1, kernel k)
    n_out = ratio * tp + k - ratio
    s_len = (n_out + ratio - 1) // ratio
    # pad x on the left so x_pad[s - m] is a plain slice, and on the
    # right so every phase slice has s_len elements
    taps = (k + ratio - 1) // ratio
    xl = jnp.pad(x, [(0, 0), (0, 0), (taps - 1, s_len)])
    phases = []
    for p in range(ratio):
        yp = None
        for m in range(taps):
            i = ratio * m + p
            if i >= k:
                continue
            xs = lax.slice_in_dim(xl, taps - 1 - m, taps - 1 - m + s_len,
                                  1, axis=2)
            term = filt[i].astype(x.dtype) * xs
            yp = term if yp is None else yp + term
        phases.append(yp)
    y = jnp.stack(phases, axis=-1).reshape(b, c, s_len * ratio)
    y = (ratio * y)[..., :n_out]
    return y[:, :, pad_left:n_out - pad_right]


def _blocked_fir(x: jnp.ndarray, filt_np, stride: int, t_out: int,
                 block: int = 128) -> jnp.ndarray:
    """y[t] = sum_j filt[j] x[stride*t + j] for t < t_out, computed as a
    single MXU matmul: frame x into overlapping (win = stride*(block-1)+k)
    windows with hop stride*block (two reshapes + one concat — no
    gather), then contract with a banded (win, block) tap matrix.  The
    MXU-friendly form of a shared-filter FIR; 1-channel convs and
    strided slice-sums both lose badly on TPU."""
    filt_np = np.asarray(filt_np, np.float32)
    k = filt_np.shape[0]
    b, c, tp = x.shape
    nblk = -(-t_out // block)
    hop = stride * block
    win = stride * (block - 1) + k
    need = hop * (nblk - 1) + win
    if tp < need:
        x = jnp.pad(x, [(0, 0), (0, 0), (0, need - tp)])
    halo = win - hop
    main = x[..., : hop * nblk].reshape(b, c, nblk, hop)
    if halo > 0:
        ext = jnp.pad(x, [(0, 0), (0, 0), (0, hop)])[
            ..., hop: hop + hop * nblk].reshape(b, c, nblk, hop)[..., :halo]
        frames = jnp.concatenate([main, ext], axis=-1)
    else:
        frames = main[..., :win]
    W = np.zeros((win, block), np.float32)
    for u in range(block):
        W[stride * u: stride * u + k, u] = filt_np
    y = jnp.einsum("bcnw,wu->bcnu", frames, jnp.asarray(W, x.dtype),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    return y.reshape(b, c, nblk * block)[..., :t_out]


def depthwise_lowpass_blocked(x: jnp.ndarray, filt, stride: int,
                              pad_left: int, pad_right: int,
                              pad_mode: str = "edge") -> jnp.ndarray:
    """Blocked-matmul form of depthwise_lowpass (exact match)."""
    filt_np = np.asarray(filt, np.float32)
    k = filt_np.shape[0]
    x = jnp.pad(x, [(0, 0), (0, 0), (pad_left, pad_right)], mode=pad_mode)
    t_out = (x.shape[-1] - k) // stride + 1
    return _blocked_fir(x, filt_np, stride, t_out)


def depthwise_upsample_blocked(x: jnp.ndarray, filt, ratio: int,
                               pad: int, pad_left: int,
                               pad_right: int) -> jnp.ndarray:
    """Blocked-matmul form of depthwise_upsample: per-phase forward FIR
    via _blocked_fir(stride=1) + interleave (exact match)."""
    filt_np = np.asarray(filt, np.float32)
    b, c, t = x.shape
    k = filt_np.shape[0]
    x = jnp.pad(x, [(0, 0), (0, 0), (pad, pad)], mode="edge")
    tp = x.shape[-1]
    n_out = ratio * tp + k - ratio
    s_len = (n_out + ratio - 1) // ratio
    taps = (k + ratio - 1) // ratio
    xl = jnp.pad(x, [(0, 0), (0, 0), (taps - 1, s_len)])
    phases = []
    for p in range(ratio):
        # forward-FIR taps: h[j] = filt[ratio*(taps-1-j) + p]
        h = np.zeros((taps,), np.float32)
        for j in range(taps):
            i = ratio * (taps - 1 - j) + p
            if i < k:
                h[j] = filt_np[i]
        phases.append(_blocked_fir(xl, h, 1, s_len))
    y = jnp.stack(phases, axis=-1).reshape(b, c, s_len * ratio)
    y = (ratio * y)[..., :n_out]
    return y[:, :, pad_left:n_out - pad_right]


def conv_transpose1d(p: Params, x: jnp.ndarray, stride: int,
                     padding: int = 0, output_padding: int = 0) -> jnp.ndarray:
    """Torch ConvTranspose1d. Weight stored torch-layout (in, out, k)."""
    w = p["w"].astype(x.dtype)  # (C_in, C_out, K)
    k = w.shape[-1]
    # torch conv_transpose == gradient of conv: with transpose_kernel=True
    # the OIH spec is read post-swap, i.e. the torch (in,out,k) layout.
    y = lax.conv_transpose(
        x, w,
        strides=(stride,),
        padding=[(k - 1 - padding, k - 1 - padding + output_padding)],
        dimension_numbers=("NCH", "OIH", "NCH"),
        transpose_kernel=True,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)[None, :, None]
    return y


def depthwise_lowpass(x: jnp.ndarray, filt: jnp.ndarray, stride: int,
                      pad_left: int, pad_right: int,
                      pad_mode: str = "edge") -> jnp.ndarray:
    """Per-channel FIR filter (BigVGAN LowPassFilter1d, bigvgan.py:72-106).

    x: (B, C, T); filt: (K,) shared across channels.  The shared filter
    lets us fold channels into the batch dim (plain conv) instead of a
    C-group depthwise conv, which lowers poorly on TPU.
    """
    b, c, t = x.shape
    x = jnp.pad(x, [(0, 0), (0, 0), (pad_left, pad_right)], mode=pad_mode)
    w = filt.astype(x.dtype)[None, None, :]
    y = lax.conv_general_dilated(
        x.reshape(b * c, 1, -1), w, window_strides=(stride,),
        padding=[(0, 0)], dimension_numbers=("NCH", "OIH", "NCH"))
    return y.reshape(b, c, -1)


def depthwise_upsample(x: jnp.ndarray, filt: jnp.ndarray, ratio: int,
                       pad: int, pad_left: int, pad_right: int) -> jnp.ndarray:
    """BigVGAN UpSample1d (bigvgan.py:112-135): replicate-pad, zero-stuffed
    transposed conv with a kaiser-sinc filter shared across channels
    (channels folded into batch; see depthwise_lowpass)."""
    b, c, t = x.shape
    k = filt.shape[0]
    x = jnp.pad(x, [(0, 0), (0, 0), (pad, pad)], mode="edge")
    w = filt[::-1].astype(x.dtype)[None, None, :]
    y = lax.conv_general_dilated(
        x.reshape(b * c, 1, -1), w, window_strides=(1,),
        padding=[(k - 1, k - 1)], lhs_dilation=(ratio,),
        dimension_numbers=("NCH", "OIH", "NCH"))
    y = ratio * y.reshape(b, c, -1)
    return y[..., pad_left:y.shape[-1] - pad_right]


def layer_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    y = (x32 - mu) * lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(dt)


def rms_norm(p: Params, x: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """xtransformers RMSNorm (xtransformers.py:337-347): x / max(||x||*d^-.5, eps) * g."""
    dt = x.dtype
    x32 = x.astype(jnp.float32)
    norm = jnp.linalg.norm(x32, axis=-1, keepdims=True) * (x.shape[-1] ** -0.5)
    y = x32 / jnp.maximum(norm, eps) * p["scale"]
    return y.astype(dt)


def group_norm_init(dim: int) -> Params:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def group_norm(p: Params, x: jnp.ndarray, groups: int,
               eps: float = 1e-5) -> jnp.ndarray:
    """GroupNorm32 over (B, C, *spatial): fp32 compute, cast back

    (reference arch_utils.py:24-26)."""
    dt = x.dtype
    b, c = x.shape[0], x.shape[1]
    x32 = x.astype(jnp.float32).reshape(b, groups, c // groups, -1)
    mu = jnp.mean(x32, axis=(2, 3), keepdims=True)
    var = jnp.var(x32, axis=(2, 3), keepdims=True)
    y = ((x32 - mu) * lax.rsqrt(var + eps)).reshape(x.shape)
    scale = p["scale"].reshape((1, c) + (1,) * (x.ndim - 2))
    bias = p["bias"].reshape((1, c) + (1,) * (x.ndim - 2))
    return (y * scale + bias).astype(dt)


def norm_groups(channels: int) -> int:
    """Group-count heuristic from reference arch_utils.py:29-44."""
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups = int(groups / 2)
    assert groups > 2
    return groups


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


def gelu_new(x):
    """GPT-2 'gelu_new' (tanh approximation) — matches HF exactly."""
    return 0.5 * x * (1.0 + jnp.tanh(
        math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


def silu(x):
    return x * jax.nn.sigmoid(x)


def leaky_relu(x, slope=0.1):
    return jnp.where(x >= 0, x, x * slope)


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def interpolate_nearest(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') along last axis of (B, C, T)."""
    t = x.shape[-1]
    idx = (jnp.arange(size) * (t / size)).astype(jnp.int32)
    idx = jnp.clip(idx, 0, t - 1)
    return jnp.take(x, idx, axis=-1)


def interpolate_nearest_scale(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    return jnp.repeat(x, factor, axis=-1)


def interpolate_linear(x: jnp.ndarray, size: int,
                       scale: Optional[float] = None) -> jnp.ndarray:
    """torch F.interpolate(mode='linear', align_corners=False) along last axis.

    When torch is called with scale_factor (recompute_scale_factor=False),
    source coords use 1/scale_factor, not in_size/out_size — pass ``scale``
    (source samples per output sample) to match.
    """
    t = x.shape[-1]
    if scale is None:
        scale = t / size
    coords = (jnp.arange(size) + 0.5) * scale - 0.5
    lo = jnp.floor(coords)
    frac = (coords - lo).astype(x.dtype)
    lo_i = jnp.clip(lo.astype(jnp.int32), 0, t - 1)
    hi_i = jnp.clip(lo_i + 1, 0, t - 1)
    # where coords < 0, torch clamps (replicates edge): frac handling below
    frac = jnp.where(coords < 0, 0.0, frac).astype(x.dtype)
    xl = jnp.take(x, lo_i, axis=-1)
    xh = jnp.take(x, hi_i, axis=-1)
    return xl * (1 - frac) + xh * frac


def reflect_pad_1d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad last axis (torch 'reflect')."""
    return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")


def sinusoidal_timestep_embedding(t: jnp.ndarray, dim: int,
                                  max_period: int = 10000) -> jnp.ndarray:
    """Reference diffusion.py:1277-1295 timestep embedding ([cos | sin])."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) *
                    jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def tree_cast(params, dtype):
    """Cast all floating leaves of a pytree to dtype."""
    def cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, params)


def param_count(params) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
