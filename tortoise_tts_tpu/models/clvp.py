"""CLVP — contrastive text/speech reranker (reference clvp.py + the
exercised xtransformers Encoder subset).

Two 20-layer, 768-d, 12-head towers with RMSNorm pre-norm, rotary
positions (dim 32, applied to q, k AND v — a quirk of the vendored
xtransformers, xtransformers.py:627-630), and GEGLU feedforward
(ff_mult=2).  Inference returns per-pair similarity used to rerank AR
candidates (inference.py:392-396); training returns symmetric InfoNCE.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import NEG_INF
from .common import (embedding, embedding_init, layer_norm, layer_norm_init,
                     linear, linear_init, rms_norm)

Params = Dict[str, Any]


@dataclass(frozen=True)
class CLVPConfig:
    """Reference defaults: clvp.py:28-46."""
    dim_text: int = 768
    dim_speech: int = 768
    dim_latent: int = 768
    num_text_tokens: int = 256
    text_enc_depth: int = 20
    text_heads: int = 12
    num_speech_tokens: int = 8192
    speech_enc_depth: int = 20
    speech_heads: int = 12
    dim_head: int = 64
    ff_mult: int = 2
    rotary_dim: int = 32


# ---------------------------------------------------------------------------
# xtransformers Encoder subset
# ---------------------------------------------------------------------------


def _encoder_init(key, dim: int, depth: int, heads: int, dim_head: int,
                  ff_mult: int) -> Params:
    ks = iter(jax.random.split(key, depth * 8 + 2))
    inner = dim_head * heads
    ff_inner = dim * ff_mult
    layers = []
    for _ in range(depth):
        layers.append({
            "attn_norm": {"scale": jnp.ones((dim,))},
            "to_q": linear_init(next(ks), dim, inner, bias=False),
            "to_k": linear_init(next(ks), dim, inner, bias=False),
            "to_v": linear_init(next(ks), dim, inner, bias=False),
            "to_out": linear_init(next(ks), inner, dim),
            "ff_norm": {"scale": jnp.ones((dim,))},
            "ff_proj": linear_init(next(ks), dim, ff_inner * 2),
            "ff_out": linear_init(next(ks), ff_inner, dim),
        })
    return {"layers": layers, "final_norm": layer_norm_init(dim)}


def _rotary(t_len: int, rotary_dim: int):
    """xtransformers RotaryEmbedding (xtransformers.py:266-293)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, rotary_dim, 2) / rotary_dim))
    freqs = np.arange(t_len)[:, None] * inv_freq[None]
    emb = np.concatenate([freqs, freqs], axis=-1).astype(np.float32)
    return jnp.asarray(np.cos(emb)), jnp.asarray(np.sin(emb))


def _apply_rotary(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray,
                  rot: int) -> jnp.ndarray:
    """x: (B, H, T, D); rotate first `rot` dims (q, k and v alike)."""
    xl, xr = x[..., :rot], x[..., rot:]
    h = rot // 2
    x1, x2 = xl[..., :h], xl[..., h:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    xl = xl * cos[None, None] + rotated * sin[None, None]
    return jnp.concatenate([xl, xr], axis=-1)


def _encoder(p: Params, x: jnp.ndarray, mask: Optional[jnp.ndarray],
             heads: int, dim_head: int, rotary_dim: int) -> jnp.ndarray:
    """Pre-norm RMSNorm encoder. x: (B, T, D); mask (B, T) True=valid."""
    b, t, d = x.shape
    cos, sin = _rotary(t, rotary_dim)
    scale = dim_head ** -0.5
    attn_mask = None
    if mask is not None:
        attn_mask = (mask[:, None, :, None] & mask[:, None, None, :])
    for lp in p["layers"]:
        h = rms_norm(lp["attn_norm"], x)
        q = linear(lp["to_q"], h).reshape(b, t, heads, dim_head).transpose(0, 2, 1, 3)
        k = linear(lp["to_k"], h).reshape(b, t, heads, dim_head).transpose(0, 2, 1, 3)
        v = linear(lp["to_v"], h).reshape(b, t, heads, dim_head).transpose(0, 2, 1, 3)
        q = _apply_rotary(q, cos, sin, rotary_dim)
        k = _apply_rotary(k, cos, sin, rotary_dim)
        v = _apply_rotary(v, cos, sin, rotary_dim)
        dots = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32) * scale
        if attn_mask is not None:
            dots = jnp.where(attn_mask, dots, NEG_INF)
        w = jax.nn.softmax(dots, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, heads * dim_head)
        x = x + linear(lp["to_out"], o)
        # GEGLU FF (xtransformers.py:432-480, glu=True, gelu exact)
        h = rms_norm(lp["ff_norm"], x)
        proj = linear(lp["ff_proj"], h)
        a, gate = jnp.split(proj, 2, axis=-1)
        x = x + linear(lp["ff_out"], a * jax.nn.gelu(gate, approximate=False))
    return layer_norm(p["final_norm"], x)


# ---------------------------------------------------------------------------
# legacy DALLE-style tower (reference transformer.py, use_xformers=False)
# ---------------------------------------------------------------------------


def _layer_scale_init(depth_ind: int, dim: int) -> jnp.ndarray:
    """transformer.py LayerScale: depth-dependent small init."""
    if depth_ind <= 18:
        eps = 0.1
    elif depth_ind <= 24:
        eps = 1e-5
    else:
        eps = 1e-6
    return jnp.full((1, 1, dim), eps)


def legacy_encoder_init(key, dim: int, depth: int, heads: int,
                        dim_head: int = 64, ff_mult: int = 4) -> Params:
    ks = iter(jax.random.split(key, depth * 8 + 2))
    inner = dim_head * heads
    layers = []
    for ind in range(depth):
        layers.append({
            "attn_norm": layer_norm_init(dim),
            "to_qkv": linear_init(next(ks), dim, inner * 3, bias=False),
            "to_out": linear_init(next(ks), inner, dim),
            "attn_scale": _layer_scale_init(ind + 1, dim),
            "ff_norm": layer_norm_init(dim),
            "ff_in": linear_init(next(ks), dim, dim * ff_mult * 2),
            "ff_out": linear_init(next(ks), dim * ff_mult, dim),
            "ff_scale": _layer_scale_init(ind + 1, dim),
        })
    return {"layers": layers}


def legacy_encoder(p: Params, x: jnp.ndarray,
                   mask: Optional[jnp.ndarray], heads: int,
                   dim_head: int = 64) -> jnp.ndarray:
    """PreNorm + LayerScale stack (transformer.py:99-220, causal=False)."""
    b, t, d = x.shape
    scale = dim_head ** -0.5
    for lp in p["layers"]:
        h = layer_norm(lp["attn_norm"], x)
        qkv = linear(lp["to_qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, heads, dim_head).transpose(0, 2, 1, 3) * scale
        k = k.reshape(b, t, heads, dim_head).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, heads, dim_head).transpose(0, 2, 1, 3)
        dots = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                          preferred_element_type=jnp.float32)
        if mask is not None:
            dots = jnp.where(mask[:, None, None, :], dots, NEG_INF)
        w = jax.nn.softmax(dots, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhqk,bhkd->bhqd", w, v)
        o = o.transpose(0, 2, 1, 3).reshape(b, t, heads * dim_head)
        x = x + linear(lp["to_out"], o) * lp["attn_scale"]
        h = layer_norm(lp["ff_norm"], x)
        a, gate = jnp.split(linear(lp["ff_in"], h), 2, axis=-1)
        ff = linear(lp["ff_out"], a * jax.nn.gelu(gate, approximate=False))
        x = x + ff * lp["ff_scale"]
    return x


# ---------------------------------------------------------------------------
# CLVP
# ---------------------------------------------------------------------------


def init(key, cfg: CLVPConfig = CLVPConfig()) -> Params:
    ks = jax.random.split(key, 8)
    # token embeddings are plain nn.Embedding in the reference
    # (clvp.py:48-51) -> torch default N(0, 1), not the GPT-2 0.02
    return {
        "text_emb": embedding_init(ks[0], cfg.num_text_tokens, cfg.dim_text,
                                   std=1.0),
        "speech_emb": embedding_init(ks[1], cfg.num_speech_tokens,
                                     cfg.dim_speech, std=1.0),
        "to_text_latent": linear_init(ks[2], cfg.dim_text, cfg.dim_latent,
                                      bias=False),
        "to_speech_latent": linear_init(ks[3], cfg.dim_speech, cfg.dim_latent,
                                        bias=False),
        "text_transformer": _encoder_init(ks[4], cfg.dim_text,
                                          cfg.text_enc_depth, cfg.text_heads,
                                          cfg.dim_head, cfg.ff_mult),
        "speech_transformer": _encoder_init(ks[5], cfg.dim_speech,
                                            cfg.speech_enc_depth,
                                            cfg.speech_heads, cfg.dim_head,
                                            cfg.ff_mult),
        "temperature": jnp.ones(()),
    }


def _masked_mean(t: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    if mask is None:
        return t.mean(axis=1)
    m = mask[..., None].astype(t.dtype)
    return (t * m).sum(axis=1) / m.sum(axis=1)


def latents(params: Params, text: jnp.ndarray, speech_tokens: jnp.ndarray,
            cfg: CLVPConfig = CLVPConfig(),
            text_mask: Optional[jnp.ndarray] = None,
            speech_mask: Optional[jnp.ndarray] = None):
    """Normalised text/speech latents (clvp.py:100-130)."""
    te = embedding(params["text_emb"], text)
    se = embedding(params["speech_emb"], speech_tokens)
    enc_t = _encoder(params["text_transformer"], te, text_mask,
                     cfg.text_heads, cfg.dim_head, cfg.rotary_dim)
    enc_s = _encoder(params["speech_transformer"], se, speech_mask,
                     cfg.speech_heads, cfg.dim_head, cfg.rotary_dim)
    tl = linear(params["to_text_latent"], _masked_mean(enc_t, text_mask))
    sl = linear(params["to_speech_latent"], _masked_mean(enc_s, speech_mask))
    tl = tl / jnp.linalg.norm(tl, axis=-1, keepdims=True)
    sl = sl / jnp.linalg.norm(sl, axis=-1, keepdims=True)
    return tl, sl


def forward(params: Params, text: jnp.ndarray, speech_tokens: jnp.ndarray,
            cfg: CLVPConfig = CLVPConfig(), return_loss: bool = False,
            text_mask: Optional[jnp.ndarray] = None,
            speech_mask: Optional[jnp.ndarray] = None):
    """Similarity scores (B,) or InfoNCE loss (clvp.py:132-141)."""
    tl, sl = latents(params, text, speech_tokens, cfg, text_mask, speech_mask)
    temp = jnp.exp(params["temperature"])
    if not return_loss:
        return jnp.einsum("nd,nd->n", tl, sl) * temp
    sim = jnp.einsum("id,jd->ij", tl, sl) * temp
    labels = jnp.arange(sim.shape[0])
    logp_t = jax.nn.log_softmax(sim, axis=-1)
    logp_s = jax.nn.log_softmax(sim.T, axis=-1)
    loss = -(jnp.take_along_axis(logp_t, labels[:, None], 1).mean()
             + jnp.take_along_axis(logp_s, labels[:, None], 1).mean()) / 2
    return loss
