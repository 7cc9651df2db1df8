"""Attention ops.

Two families used across the pipeline:

1. ``qkv_attention`` — the conv-style fused-QKV attention of the reference's
   AttentionBlock (arch_utils.py:59-133, QKVAttentionLegacy): operates on
   (B, 3*H*C, T) channel-major tensors, head-major QKV interleave, with an
   optional T5-style relative position bias.  Non-causal, full sequence.
   Used by the conditioning encoders, diffusion trunk and CLVP-adjacent
   blocks.  Softmax in fp32.

2. ``mha`` — standard batched multi-head attention on (B, H, T, D) with
   optional causal / padding masks and additive bias, used by the GPT-2
   trunk and CLVP towers.  This is a thin wrapper that XLA fuses well on
   the MXU; a Pallas flash-attention kernel can be slotted in via
   ``mha_impl``.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9  # large negative for masking in fp32/bf16-safe range


def t5_rel_pos_bucket(n_query: int, n_key: int, num_buckets: int = 32,
                      max_distance: int = 64) -> np.ndarray:
    """Non-causal T5 relative position bucket table (static, numpy).

    Mirrors xtransformers.py:157-177 (_relative_position_bucket,
    causal=False).  Returns int32 (n_query, n_key).
    """
    q_pos = np.arange(n_query)[:, None]
    k_pos = np.arange(n_key)[None, :]
    rel = k_pos - q_pos          # relative_position
    n = -rel
    nb = num_buckets // 2
    ret = (n < 0).astype(np.int64) * nb
    n = np.abs(n)
    max_exact = nb // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        np.log(np.maximum(n, 1).astype(np.float64) / max_exact)
        / math.log(max_distance / max_exact) * (nb - max_exact)
    ).astype(np.int64)
    val_if_large = np.minimum(val_if_large, nb - 1)
    ret = ret + np.where(is_small, n, val_if_large)
    return ret.astype(np.int32)


def rel_pos_bias_from_table(emb_w: jnp.ndarray, n_q: int, n_k: int,
                            num_buckets: int = 32,
                            max_distance: int = 64) -> jnp.ndarray:
    """(num_buckets, heads) embedding -> (heads, n_q, n_k) bias (unscaled)."""
    bucket = t5_rel_pos_bucket(n_q, n_k, num_buckets, max_distance)
    vals = jnp.take(emb_w, jnp.asarray(bucket), axis=0)  # (q, k, h)
    return jnp.transpose(vals, (2, 0, 1))


def qkv_attention(qkv: jnp.ndarray, n_heads: int,
                  rel_pos_w: Optional[jnp.ndarray] = None,
                  rel_pos_scale: float = 1.0,
                  mask: Optional[jnp.ndarray] = None,
                  bias: Optional[jnp.ndarray] = None,
                  bias_kq: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Fused-QKV attention over channels-major sequences.

    qkv: (B, H*3*C, T) with per-head [q;k;v] channel interleave
         (arch_utils.py:76-79).
    mask: optional (B, T) bool; True = attend.  NOTE the reference
         multiplies the mask *after* softmax (arch_utils.py:87-90); we mask
         before softmax (correct form) — parity tests only use mask=None,
         matching every in-pipeline call site.
    returns (B, H*C, T).
    """
    b, width, t = qkv.shape
    ch = width // (3 * n_heads)
    import os
    if bias_kq is not None:
        # Transposed-bias Pallas path: scores stay (S, bq) in VMEM —
        # both matmuls MXU-native, zero large transposes, and none of
        # the ~256 MB/block score materialization of the XLA path.
        if (mask is None and t >= 256
                and (jax.default_backend() == "tpu"
                     or os.environ.get("TTS_FLASH_KQ_INTERPRET") == "1")):
            from .pallas_attention import flash_attention_bias_qkv_kq
            return flash_attention_bias_qkv_kq(
                qkv, bias_kq, n_heads,
                interpret=jax.default_backend() != "tpu")
        bias = jnp.swapaxes(bias_kq, 1, 2)
    # V-transposed Pallas kernel: default AUTO by batch — it loses to
    # the XLA bf16-scores path at the single-utterance cond-free pair
    # (8.49 vs 5.39 ms/step at B=2, T=896) but wins once the batch grid
    # amortizes its VMEM pipeline (33.0 vs 42.1 ms/step at B=16, T=896
    # — batched serving halves its score-traffic disadvantage).
    # TTS_FLASH_VT=1/0 forces it on/off.
    vt_env = os.environ.get("TTS_FLASH_VT", "auto")
    use_vt = b >= 8 if vt_env == "auto" else vt_env == "1"
    if (bias is not None and mask is None and t >= 256 and use_vt
            and (jax.default_backend() == "tpu"
                 or os.environ.get("TTS_FLASH_VT_INTERPRET") == "1")):
        # Row-major-score Pallas path with V pre-transposed: lane-wise
        # softmax + MXU-canonical AV matmul (see _attn_bias_vt_kernel).
        from .pallas_attention import flash_attention_bias_qkv_vt
        return flash_attention_bias_qkv_vt(
            qkv, bias, n_heads, interpret=jax.default_backend() != "tpu")
    if (bias is not None and mask is None and t >= 256
            and jax.default_backend() == "tpu"
            and os.environ.get("TTS_FLASH_BIAS", "0") == "1"):
        # Optional Pallas path keeping the (B,H,T,T) scores in VMEM,
        # fed the fused qkv tensor directly (no split copies).
        from .pallas_attention import flash_attention_bias_qkv
        return flash_attention_bias_qkv(qkv, bias, n_heads)
    q, k, v = jnp.split(qkv.reshape(b, n_heads, 3 * ch, t), 3, axis=2)
    scale = 1.0 / math.sqrt(math.sqrt(ch))
    # Reduced-precision scores when the model itself runs bf16 (the
    # production autocast-equivalent mode): halves the dominant
    # (B,H,T,T) HBM traffic of this materialised-scores path — measured
    # 7.54 -> 5.39 ms per denoiser step on v5e.  fp32 params (the
    # CPU-parity mode) keep fp32 scores; TTS_ATTN_BF16=0 forces fp32.
    bf16_scores = (os.environ.get("TTS_ATTN_BF16", "1") != "0"
                   and qkv.dtype == jnp.bfloat16)
    acc = jnp.bfloat16 if bf16_scores else jnp.float32
    # (B, H, Tq, Tk)
    dots = jnp.einsum("bhct,bhcs->bhts", q * scale, k * scale,
                      preferred_element_type=acc)
    if bias is not None:          # precomputed (H, T, T), already scaled
        dots = dots + bias[None].astype(dots.dtype)
    elif rel_pos_w is not None:
        rel = rel_pos_bias_from_table(rel_pos_w, t, t)  # (H, T, T)
        dots = dots + rel[None].astype(dots.dtype) * rel_pos_scale
    if mask is not None:
        dots = jnp.where(mask[:, None, None, :], dots, NEG_INF)
    if bf16_scores:
        w = jax.nn.softmax(dots, axis=-1)
    else:
        w = jax.nn.softmax(dots.astype(jnp.float32),
                           axis=-1).astype(qkv.dtype)
    out = jnp.einsum("bhts,bhcs->bhct", w, v)
    return out.reshape(b, n_heads * ch, t)


def mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
        bias: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        causal: bool = False,
        scale: Optional[float] = None) -> jnp.ndarray:
    """Standard MHA. q,k,v: (B, H, T, D). mask: bool, broadcastable to
    (B, H, Tq, Tk), True = attend. Returns (B, H, Tq, D)."""
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    dots = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                      preferred_element_type=jnp.float32) * scale
    if bias is not None:
        dots = dots + bias.astype(dots.dtype)
    if causal:
        tq, tk = dots.shape[-2:]
        cm = jnp.tril(jnp.ones((tq, tk), dtype=bool), k=tk - tq)
        dots = jnp.where(cm, dots, NEG_INF)
    if mask is not None:
        dots = jnp.where(mask, dots, NEG_INF)
    w = jax.nn.softmax(dots, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v)


def decode_attention(q: jnp.ndarray, k_cache: jnp.ndarray,
                     v_cache: jnp.ndarray, cur_len: jnp.ndarray,
                     scale: Optional[float] = None) -> jnp.ndarray:
    """Single-step decode attention against a fixed-size KV cache.

    q: (B, H, 1, D); k_cache/v_cache: (B, H, S, D) where only positions
    < cur_len are valid.  cur_len: scalar int array.  Returns (B, H, 1, D).
    """
    d = q.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    dots = jnp.einsum("bhqd,bhkd->bhqk", q, k_cache,
                      preferred_element_type=jnp.float32) * scale
    pos = jnp.arange(k_cache.shape[2])
    dots = jnp.where(pos[None, None, None, :] < cur_len, dots, NEG_INF)
    w = jax.nn.softmax(dots, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", w, v_cache)
