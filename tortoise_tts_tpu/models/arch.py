"""Shared conv/attention building blocks (reference arch_utils.py).

Functional equivalents of: AttentionBlock (+QKVAttentionLegacy),
ResBlock, Upsample/Downsample, AudioMiniEncoder and the UnifiedVoice
ConditioningEncoder (unified_voice.py:269-293).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.attention import qkv_attention
from .common import (conv1d, conv1d_init, group_norm, group_norm_init,
                     interpolate_nearest_scale, norm_groups, silu)

Params = Dict[str, Any]

REL_POS_NUM_BUCKETS = 32
REL_POS_MAX_DISTANCE = 64


# ---------------------------------------------------------------------------
# AttentionBlock — arch_utils.py:136-190
# ---------------------------------------------------------------------------


def attention_block_init(key, channels: int, num_heads: int = 1,
                         relative_pos_embeddings: bool = False) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm": group_norm_init(channels),
        "qkv": conv1d_init(k1, channels, channels * 3, 1),
        # proj_out is zero-initialised in the reference (zero_module)
        "proj_out": {"w": jnp.zeros((channels, channels, 1)),
                     "b": jnp.zeros((channels,))},
    }
    if relative_pos_embeddings:
        p["rel_pos"] = {"w": jax.random.normal(
            k3, (REL_POS_NUM_BUCKETS, num_heads)) * 1.0}
    return p


def _gn_qkv_xla(pn: Params, pq: Params, x: jnp.ndarray) -> jnp.ndarray:
    h = group_norm(pn, x, norm_groups(x.shape[1]))
    return conv1d(pq, h)


@jax.custom_vjp
def _gn_qkv_fused(pn: Params, pq: Params, x: jnp.ndarray) -> jnp.ndarray:
    """Pallas [groupnorm + qkv conv1x1] forward with an XLA-recompute
    backward (pallas_call has no autodiff rule; the XLA formulation is
    bf16-equivalent)."""
    from ..ops.pallas_resblock import fused_gn_conv1x1
    out = fused_gn_conv1x1(pn, pq, x, norm_groups(x.shape[1]), act=False,
                           interpret=jax.default_backend() != "tpu")
    return out if out is not None else _gn_qkv_xla(pn, pq, x)


def _gn_qkv_fwd(pn, pq, x):
    return _gn_qkv_fused(pn, pq, x), (pn, pq, x)


def _gn_qkv_bwd(res, g):
    return jax.vjp(_gn_qkv_xla, *res)[1](g)


_gn_qkv_fused.defvjp(_gn_qkv_fwd, _gn_qkv_bwd)


def attention_block(p: Params, x: jnp.ndarray, num_heads: int,
                    mask: Optional[jnp.ndarray] = None,
                    bias: Optional[jnp.ndarray] = None,
                    bias_kq: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x: (B, C, T) -> (B, C, T).

    ``bias``: optional precomputed (H, T, T) rel-pos bias (already scaled)
    — pass it when this block runs inside a scan so the 60 MB gather is
    hoisted out of the loop (see precompute_rel_bias).  ``bias_kq`` is
    the same bias pre-TRANSPOSED to (H, S, Tq) for the transposed-score
    Pallas attention path."""
    import os
    c = x.shape[1]
    if (os.environ.get("TTS_FUSED_RESBLOCK", "1") == "1"
            and (jax.default_backend() == "tpu"
                 or os.environ.get("TTS_FUSED_RESBLOCK_INTERPRET") == "1")):
        # fused [groupnorm + qkv conv1x1] Pallas head (the same env
        # gates the denoiser resblock fusion — both or neither)
        qkv = _gn_qkv_fused(p["norm"], p["qkv"], x)
    else:
        qkv = _gn_qkv_xla(p["norm"], p["qkv"], x)
    if bias_kq is not None:
        a = qkv_attention(qkv, num_heads, bias_kq=bias_kq, mask=mask)
    elif bias is not None:
        a = qkv_attention(qkv, num_heads, bias=bias, mask=mask)
    else:
        rel_w = p.get("rel_pos", {}).get("w")
        # reference scales the rel-pos embedding by sqrt(head_dim)
        # (arch_utils.py:174: RelativePositionBias(scale=(C/H)**.5, ...))
        rel_scale = math.sqrt(c // num_heads) if rel_w is not None else 1.0
        a = qkv_attention(qkv, num_heads, rel_pos_w=rel_w,
                          rel_pos_scale=rel_scale, mask=mask)
    a = conv1d(p["proj_out"], a)
    return x + a


def precompute_rel_bias(p: Params, t: int, num_heads: int, channels: int,
                        dtype=None) -> Optional[jnp.ndarray]:
    """Materialise this block's scaled rel-pos bias once: (H, T, T)."""
    rel_w = p.get("rel_pos", {}).get("w")
    if rel_w is None:
        return None
    from ..ops.attention import rel_pos_bias_from_table
    bias = rel_pos_bias_from_table(rel_w, t, t) \
        * math.sqrt(channels // num_heads)
    return bias.astype(dtype) if dtype is not None else bias


# ---------------------------------------------------------------------------
# Up/Downsample — arch_utils.py:193-245
# ---------------------------------------------------------------------------


def upsample_init(key, channels: int, use_conv: bool,
                  out_channels: Optional[int] = None) -> Params:
    out_channels = out_channels or channels
    return {"conv": conv1d_init(key, channels, out_channels, 5)} if use_conv else {}


def upsample(p: Params, x: jnp.ndarray, factor: int = 4) -> jnp.ndarray:
    x = interpolate_nearest_scale(x, factor)
    if "conv" in p:
        x = conv1d(p["conv"], x, padding=2)
    return x


def downsample_init(key, channels: int, use_conv: bool,
                    out_channels: Optional[int] = None, ksize: int = 5) -> Params:
    out_channels = out_channels or channels
    return {"op": conv1d_init(key, channels, out_channels, ksize)} if use_conv else {}


def downsample(p: Params, x: jnp.ndarray, factor: int = 4, use_conv: bool = True,
               pad: int = 2) -> jnp.ndarray:
    if use_conv:
        return conv1d(p["op"], x, stride=factor, padding=pad)
    # AvgPool1d(kernel=stride, stride=stride)
    t = (x.shape[-1] // factor) * factor
    return x[..., :t].reshape(*x.shape[:-1], -1, factor).mean(-1)


# ---------------------------------------------------------------------------
# ResBlock — arch_utils.py:248-313 (no up/down variant used in-pipeline)
# ---------------------------------------------------------------------------


def res_block_init(key, channels: int, out_channels: Optional[int] = None,
                   use_conv: bool = False, kernel_size: int = 3) -> Params:
    out_channels = out_channels or channels
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "in_norm": group_norm_init(channels),
        "in_conv": conv1d_init(k1, channels, out_channels, kernel_size),
        "out_norm": group_norm_init(out_channels),
        # zero_module'd out conv
        "out_conv": {"w": jnp.zeros((out_channels, out_channels, kernel_size)),
                     "b": jnp.zeros((out_channels,))},
    }
    if out_channels != channels:
        p["skip"] = conv1d_init(
            k3, channels, out_channels, kernel_size if use_conv else 1)
    return p


def res_block(p: Params, x: jnp.ndarray, kernel_size: int = 3) -> jnp.ndarray:
    pad = 1 if kernel_size == 3 else 2
    h = group_norm(p["in_norm"], x, norm_groups(x.shape[1]))
    h = silu(h)
    h = conv1d(p["in_conv"], h, padding=pad)
    h = group_norm(p["out_norm"], h, norm_groups(h.shape[1]))
    h = silu(h)
    h = conv1d(p["out_conv"], h, padding=pad)
    if "skip" in p:
        skip_k = p["skip"]["w"].shape[-1]
        x = conv1d(p["skip"], x, padding=(1 if skip_k == 3 else (2 if skip_k == 5 else 0)))
    return x + h


# ---------------------------------------------------------------------------
# AudioMiniEncoder — arch_utils.py:316-356
# ---------------------------------------------------------------------------


def audio_mini_encoder_init(key, spec_dim: int, embedding_dim: int,
                            base_channels: int = 128, depth: int = 2,
                            resnet_blocks: int = 2, attn_blocks: int = 4,
                            num_attn_heads: int = 4, downsample_factor: int = 2,
                            kernel_size: int = 3) -> Params:
    keys = jax.random.split(key, 64)
    ki = iter(keys)
    p: Params = {"init": conv1d_init(next(ki), spec_dim, base_channels, 3)}
    ch = base_channels
    res = []
    for _ in range(depth):
        for _ in range(resnet_blocks):
            res.append({"res": res_block_init(next(ki), ch, kernel_size=kernel_size)})
        res.append({"down": downsample_init(next(ki), ch, True, ch * 2)})
        ch *= 2
    p["res"] = res
    p["final_norm"] = group_norm_init(ch)
    p["final_conv"] = conv1d_init(next(ki), ch, embedding_dim, 1)
    p["attn"] = [attention_block_init(next(ki), embedding_dim, num_attn_heads)
                 for _ in range(attn_blocks)]
    return p


def audio_mini_encoder(p: Params, x: jnp.ndarray, num_attn_heads: int = 4,
                       kernel_size: int = 3,
                       downsample_factor: int = 2) -> jnp.ndarray:
    """x: (B, spec_dim, T) -> (B, embedding_dim) (takes position 0)."""
    h = conv1d(p["init"], x, padding=1)
    for blk in p["res"]:
        if "res" in blk:
            h = res_block(blk["res"], h, kernel_size=kernel_size)
        else:
            h = downsample(blk["down"], h, factor=downsample_factor)
    h = group_norm(p["final_norm"], h, norm_groups(h.shape[1]))
    h = silu(h)
    h = conv1d(p["final_conv"], h)
    for a in p["attn"]:
        h = attention_block(a, h, num_attn_heads)
    return h[:, :, 0]


# ---------------------------------------------------------------------------
# ConditioningEncoder — unified_voice.py:269-293
# ---------------------------------------------------------------------------


def conditioning_encoder_init(key, spec_dim: int, embedding_dim: int,
                              attn_blocks: int = 6,
                              num_attn_heads: int = 4) -> Params:
    keys = jax.random.split(key, attn_blocks + 1)
    return {
        "init": conv1d_init(keys[0], spec_dim, embedding_dim, 1),
        "attn": [attention_block_init(keys[i + 1], embedding_dim, num_attn_heads)
                 for i in range(attn_blocks)],
    }


def conditioning_encoder(p: Params, x: jnp.ndarray, num_attn_heads: int,
                         mean: bool = False) -> jnp.ndarray:
    """x: (B, spec_dim, T) -> (B, embedding_dim)."""
    h = conv1d(p["init"], x)
    for a in p["attn"]:
        h = attention_block(a, h, num_attn_heads)
    return h.mean(axis=2) if mean else h[:, :, 0]
