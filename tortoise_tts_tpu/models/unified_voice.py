"""UnifiedVoice — the autoregressive GPT-2-style TTS model, TPU-native.

Capability-parity with reference unified_voice.py:334-688 (UnifiedVoice /
GPT2InferenceModel / ConditioningEncoder / LearnedPositionEmbeddings), but
re-designed for XLA:

- the GPT-2 trunk is a stacked-parameter ``lax.scan`` over layers (one
  compiled layer body instead of 30 unrolled blocks);
- inference replaces HF GenerationMixin + KV-cache shims
  (unified_voice.py:98-266, stream_generator.py) with a single jitted
  prefill + ``lax.while_loop`` decode over a donated fixed-shape KV cache,
  with fused sampling (ops/sampling.py);
- all shapes are static: text is padded to ``text_bucket`` and masked, the
  decode loop always allocates ``max_mel_tokens`` steps and early-exits
  when every row has emitted the stop token.

Sequence layout (matches reference semantics, unified_voice.py:632-668):
    [cond (1)] [start_text, text.., stop_text (+pad)] [start_mel, mel..]
with per-modality learned positional embeddings and no trunk positions
(gpt.wpe is null in the reference, unified_voice.py:425-426).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.attention import mha
from ..ops.pallas_attention import flash_attention
from ..ops.sampling import SamplingConfig, sample_token


def _xla_trunk_attention(q, k, v, key_mask):
    mask = key_mask[:, None, None, :] if key_mask is not None else None
    return mha(q, k, v, mask=mask, causal=True)


@jax.custom_vjp
def _flash_trunk_attention(q, k, v, key_mask):
    """Pallas flash forward with an XLA backward: the kernel has no
    JVP/transpose rules, so differentiating the trunk (training at full
    scale on real TPU) would otherwise fail inside pallas_call."""
    return flash_attention(q, k, v, key_mask=key_mask, causal=True)


def _flash_trunk_fwd(q, k, v, key_mask):
    return _flash_trunk_attention(q, k, v, key_mask), (q, k, v, key_mask)


def _flash_trunk_bwd(res, g):
    q, k, v, key_mask = res
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_trunk_attention(
        q_, k_, v_, key_mask), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


_flash_trunk_attention.defvjp(_flash_trunk_fwd, _flash_trunk_bwd)


def _trunk_attention(q, k, v, key_mask=None):
    """Full-sequence causal attention for the GPT trunk: the Pallas flash
    kernel on TPU (XLA backward via custom_vjp), XLA mha elsewhere
    (backend known at trace time)."""
    if jax.default_backend() == "tpu" and q.shape[-1] == 64:
        return _flash_trunk_attention(q, k, v, key_mask)
    return _xla_trunk_attention(q, k, v, key_mask)
from .arch import conditioning_encoder, conditioning_encoder_init
from .common import (embedding, embedding_init, gelu_new, layer_norm,
                     layer_norm_init, linear, linear_init)

Params = Dict[str, Any]


@dataclass(frozen=True)
class UnifiedVoiceConfig:
    """Reference defaults: unified_voice.py:335-354."""
    layers: int = 30
    model_dim: int = 1024
    heads: int = 16
    max_text_tokens: int = 402
    max_prompt_tokens: int = 2
    max_mel_tokens: int = 604
    max_conditioning_inputs: int = 2
    mel_length_compression: int = 1024
    number_text_tokens: int = 255
    start_text_token: int = 255
    stop_text_token: int = 0
    number_mel_codes: int = 8194
    start_mel_token: int = 8192
    stop_mel_token: int = 8193
    types: int = 1
    # The reference's GPT2InferenceModel computes the fed token's mel
    # position as ``attention_mask.shape[1] - mel_len`` (reference
    # unified_voice.py:214).  Under HF generate() the mask already
    # includes the token being fed, so the first *sampled* token gets
    # mel position 2 (start_mel got 0; position 1 is never used) and
    # every later one is shifted +1 from the training layout.  True
    # reproduces that off-by-one so decode output matches the reference
    # pipeline on converted checkpoints; False uses training-consistent
    # positions (step+1).  Latents for diffusion are unaffected on the
    # non-streaming path (recomputed by forward(return_latent=True),
    # like reference inference.py:371-379).
    hf_decode_positions: bool = True

    @property
    def max_mel_seq_len(self) -> int:   # unified_voice.py:405
        return self.max_mel_tokens + 2 + self.max_conditioning_inputs

    @property
    def max_text_seq_len(self) -> int:  # unified_voice.py:406
        return self.max_text_tokens + 2

    @property
    def text_vocab(self) -> int:
        return self.number_text_tokens * self.types + 1


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init(key, cfg: UnifiedVoiceConfig = UnifiedVoiceConfig()) -> Params:
    ks = jax.random.split(key, 16)
    d, L = cfg.model_dim, cfg.layers
    normal = lambda k, sh, std=0.02: jax.random.normal(k, sh) * std
    # Residual-path projections use the GPT-2 scaled init
    # 0.02/sqrt(2*layers) (HF GPT2PreTrainedModel._init_weights applies
    # it to every c_proj.weight of the reference's trunk).
    proj_std = 0.02 / (2 * L) ** 0.5
    gpt = {
        "ln_1": {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))},
        "attn_qkv": {"w": normal(ks[0], (L, d, 3 * d)), "b": jnp.zeros((L, 3 * d))},
        "attn_proj": {"w": normal(ks[1], (L, d, d), proj_std), "b": jnp.zeros((L, d))},
        "ln_2": {"scale": jnp.ones((L, d)), "bias": jnp.zeros((L, d))},
        "mlp_fc": {"w": normal(ks[2], (L, d, 4 * d)), "b": jnp.zeros((L, 4 * d))},
        "mlp_proj": {"w": normal(ks[3], (L, 4 * d, d), proj_std), "b": jnp.zeros((L, d))},
        "ln_f": layer_norm_init(d),
    }
    return {
        "conditioning_encoder": conditioning_encoder_init(
            ks[4], 80, d, attn_blocks=6, num_attn_heads=cfg.heads),
        "text_embedding": embedding_init(ks[5], cfg.text_vocab, d),
        "mel_embedding": embedding_init(ks[6], cfg.number_mel_codes, d),
        "text_pos_embedding": embedding_init(ks[7], cfg.max_text_seq_len, d),
        "mel_pos_embedding": embedding_init(ks[8], cfg.max_mel_seq_len, d),
        "gpt": gpt,
        "final_norm": layer_norm_init(d),
        "text_head": linear_init(ks[9], d, cfg.text_vocab),
        "mel_head": linear_init(ks[10], d, cfg.number_mel_codes),
    }


# ---------------------------------------------------------------------------
# GPT-2 trunk (stacked layers, lax.scan)
# ---------------------------------------------------------------------------


def _layer_params(gpt: Params):
    """Stacked per-layer params as scan xs."""
    return {k: v for k, v in gpt.items() if k != "ln_f"}


def _gpt_layer(lp: Params, x: jnp.ndarray, heads: int,
               key_mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """One pre-LN GPT-2 block. x: (B, T, D); key_mask: (B, T) bool."""
    b, t, d = x.shape
    h = layer_norm(lp["ln_1"], x)
    qkv = linear(lp["attn_qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, t, heads, -1).transpose(0, 2, 1, 3)
    k = k.reshape(b, t, heads, -1).transpose(0, 2, 1, 3)
    v = v.reshape(b, t, heads, -1).transpose(0, 2, 1, 3)
    a = _trunk_attention(q, k, v, key_mask=key_mask)
    a = a.transpose(0, 2, 1, 3).reshape(b, t, d)
    x = x + linear(lp["attn_proj"], a)
    h = layer_norm(lp["ln_2"], x)
    h = linear(lp["mlp_proj"], gelu_new(linear(lp["mlp_fc"], h)))
    return x + h


def gpt_forward(gpt: Params, emb: jnp.ndarray, heads: int,
                key_mask: Optional[jnp.ndarray] = None,
                remat: bool = False) -> jnp.ndarray:
    """Full-sequence causal forward. emb: (B, T, D) -> (B, T, D) (incl ln_f).

    key_mask: optional (B, T) bool, True = valid key (padding masking).
    """
    def body(x, lp):
        return _gpt_layer(lp, x, heads, key_mask), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = lax.scan(body, emb, _layer_params(gpt))
    return layer_norm(gpt["ln_f"], x)


# ---------------------------------------------------------------------------
# KV-cached decode
# ---------------------------------------------------------------------------


class KVCache(NamedTuple):
    k: jnp.ndarray  # (L, B, H, S, D_head)
    v: jnp.ndarray  # (L, B, H, S, D_head)


def _init_cache(cfg: UnifiedVoiceConfig, batch: int, seq: int,
                dtype) -> KVCache:
    shape = (cfg.layers, batch, cfg.heads, seq, cfg.model_dim // cfg.heads)
    return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def _gpt_prefill(gpt: Params, emb: jnp.ndarray, heads: int,
                 key_mask: jnp.ndarray, cache_len: int
                 ) -> Tuple[jnp.ndarray, KVCache]:
    """Run full prefix, return final hidden of last position + filled cache."""
    b, t, d = emb.shape
    hd = d // heads

    def body(x, lp):
        bb, tt, dd = x.shape
        h = layer_norm(lp["ln_1"], x)
        qkv = linear(lp["attn_qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(bb, tt, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(bb, tt, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(bb, tt, heads, hd).transpose(0, 2, 1, 3)
        a = _trunk_attention(q, k, v, key_mask=key_mask)
        a = a.transpose(0, 2, 1, 3).reshape(bb, tt, dd)
        x = x + linear(lp["attn_proj"], a)
        h2 = layer_norm(lp["ln_2"], x)
        x = x + linear(lp["mlp_proj"], gelu_new(linear(lp["mlp_fc"], h2)))
        # pad KV out to cache length
        pad = cache_len - tt
        kc = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        vc = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        return x, (kc, vc)

    x, (kc, vc) = lax.scan(body, emb, _layer_params(gpt))
    return layer_norm(gpt["ln_f"], x), KVCache(kc, vc)


_Q_NAMES = ("attn_qkv", "attn_proj", "mlp_fc", "mlp_proj")


def _use_flash_decode() -> bool:
    """Pallas flash-decode attention (ops/pallas_decode_attn), OPT-IN
    (TTS_FLASH_DECODE=1).  Chip-measured round 4: the kernel LOSES to
    the XLA path at every batch (B=8: 2.41 vs 1.75 ms/token; B=16:
    4.02 vs 2.55) — per-(batch, S-block) grid steps are compute/launch
    bound (VPU broadcast-reduce + 30 pallas_calls per token) and the
    pos-clamped DMA saving (~16% at padded S) cannot recover it.  The
    shipped traffic cut is the pure-XLA attention LADDER instead
    (inference_speech decode_chunk_size + decode_chunk attn_len).
    Kept in-tree with parity tests as a measured negative result."""
    import os
    return (jax.default_backend() == "tpu"
            and os.environ.get("TTS_FLASH_DECODE", "0") == "1")


def _use_packed_kv() -> bool:
    """Packed K||V decode cache (TTS_DECODE_PACKKV=1): (L,B,H,S,2*hd)
    with K in the low 64 lanes and V in the high 64.  Dense in TPU
    tiling (the split per-head (S, 64) buffers each pad to 128 lanes —
    2x the HBM bytes on every cache read and write).  Mutually
    exclusive with the flash-decode kernel, which wants split K/V."""
    import os
    return (os.environ.get("TTS_DECODE_PACKKV", "0") == "1"
            and not _use_flash_decode())


def _use_kmajor() -> bool:
    """hd-major decode cache (TTS_DECODE_KMAJOR=1): (L,B,H,hd,S) with
    the SEQUENCE as the minor (lane) dim.  The shipped (L,B,H,S,hd)
    layout's hd=64 minor dim fills only half a 128-lane TPU tile, so
    every cache read streams 2x its dense bytes; hd-major pays only the
    S pad (268 -> 384, 1.43x).  Chip microbench (perf_lab attnread,
    S=268): B=8 0.81 vs 1.11 ms, B=16 1.30 vs 1.93 ms per 30-layer
    read — and it beats a raw jnp.sum over the split buffers, proving
    the split layout is lane-padded in memory.  Mutually exclusive
    with the packed-KV and flash-decode variants (both S-major)."""
    import os
    return (os.environ.get("TTS_DECODE_KMAJOR", "0") == "1"
            and not _use_flash_decode()
            and os.environ.get("TTS_DECODE_PACKKV", "0") != "1")


def _mha_kmajor(q: jnp.ndarray, kc: jnp.ndarray, vc: jnp.ndarray,
                mask: jnp.ndarray) -> jnp.ndarray:
    """Decode attention over the hd-major cache.  q: (B,H,1,hd);
    kc/vc: (B,H,hd,S); mask broadcastable to (B,H,1,S).  Numerics match
    ops.attention.mha: bf16 operands, fp32 MXU accumulate, fp32
    softmax cast back to the query dtype."""
    from ..ops.attention import NEG_INF
    scale = 1.0 / math.sqrt(q.shape[-1])
    dots = jnp.einsum("bhqd,bhds->bhqs", q, kc,
                      preferred_element_type=jnp.float32) * scale
    dots = jnp.where(mask, dots, NEG_INF)
    w = jax.nn.softmax(dots, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqs,bhds->bhqd", w, vc)


def _mha_shared(q: jnp.ndarray, kp: jnp.ndarray, vp: jnp.ndarray,
                kd: jnp.ndarray, vd: jnp.ndarray, mask: jnp.ndarray,
                kmaj: bool) -> jnp.ndarray:
    """Decode attention over a SHARED single-copy prefix + per-row decode
    region (candidate fan-out: every row's [cond‖text‖start_mel] prefill
    is identical, so its K/V are stored ONCE and each step streams them
    once instead of B times — the B=16 decode is attention-read-bound,
    1.75 of 2.55 ms/token, and the prefix is ~1/3 of the cache bytes).

    q: (B,H,1,hd); kp/vp: the prefix K/V with NO per-candidate axis —
    single-group form (H,Sp,hd) S-major / (H,hd,Sp) hd-major, or
    GROUPED form with a leading groups axis (G,H,...) where B = G*C
    (batched serving: each of G rows fans out C candidates sharing
    that row's prefill; candidate rows are group-major, row = g*C+c).
    kd/vd: per-row decode region, (B,H,Sd,hd) or (B,H,hd,Sd); mask:
    bool broadcastable to (B,H,1,Sp+Sd), or (G,1,1,1,Sp+Sd) grouped.

    The joint softmax over [prefix ‖ region] scores is mathematically
    identical to the full-cache attention (same dots, same mask); the
    output is accumulated in fp32 across the two partial AV matmuls, so
    values match the fused path to accumulation-order rounding."""
    from ..ops.attention import NEG_INF
    scale = 1.0 / math.sqrt(q.shape[-1])
    if kp.ndim == 4:                       # grouped: kp (G,H,...), B=G*C
        g = kp.shape[0]
        b, h, _, hd = q.shape
        c = b // g
        qg = q.reshape(g, c, h, 1, hd)
        if kmaj:
            kdg = kd.reshape(g, c, h, hd, -1)
            vdg = vd.reshape(g, c, h, hd, -1)
            dp = jnp.einsum("gchqd,ghds->gchqs", qg, kp,
                            preferred_element_type=jnp.float32)
            dd = jnp.einsum("gchqd,gchds->gchqs", qg, kdg,
                            preferred_element_type=jnp.float32)
        else:
            kdg = kd.reshape(g, c, h, -1, hd)
            vdg = vd.reshape(g, c, h, -1, hd)
            dp = jnp.einsum("gchqd,ghkd->gchqk", qg, kp,
                            preferred_element_type=jnp.float32)
            dd = jnp.einsum("gchqd,gchkd->gchqk", qg, kdg,
                            preferred_element_type=jnp.float32)
        dots = jnp.concatenate([dp, dd], axis=-1) * scale
        dots = jnp.where(mask, dots, NEG_INF)  # mask (G,1,1,1,Sp+Sd)
        w = jax.nn.softmax(dots, axis=-1).astype(q.dtype)
        sp = dp.shape[-1]
        if kmaj:
            out = (jnp.einsum("gchqs,ghds->gchqd", w[..., :sp], vp,
                              preferred_element_type=jnp.float32)
                   + jnp.einsum("gchqs,gchds->gchqd", w[..., sp:], vdg,
                                preferred_element_type=jnp.float32))
        else:
            out = (jnp.einsum("gchqk,ghkd->gchqd", w[..., :sp], vp,
                              preferred_element_type=jnp.float32)
                   + jnp.einsum("gchqk,gchkd->gchqd", w[..., sp:], vdg,
                                preferred_element_type=jnp.float32))
        return out.reshape(b, h, 1, hd).astype(q.dtype)
    if kmaj:
        dp = jnp.einsum("bhqd,hds->bhqs", q, kp,
                        preferred_element_type=jnp.float32)
        dd = jnp.einsum("bhqd,bhds->bhqs", q, kd,
                        preferred_element_type=jnp.float32)
    else:
        dp = jnp.einsum("bhqd,hkd->bhqk", q, kp,
                        preferred_element_type=jnp.float32)
        dd = jnp.einsum("bhqd,bhkd->bhqk", q, kd,
                        preferred_element_type=jnp.float32)
    dots = jnp.concatenate([dp, dd], axis=-1) * scale
    dots = jnp.where(mask, dots, NEG_INF)
    w = jax.nn.softmax(dots, axis=-1).astype(q.dtype)
    sp = dp.shape[-1]
    if kmaj:
        out = (jnp.einsum("bhqs,hds->bhqd", w[..., :sp], vp,
                          preferred_element_type=jnp.float32)
               + jnp.einsum("bhqs,bhds->bhqd", w[..., sp:], vd,
                            preferred_element_type=jnp.float32))
    else:
        out = (jnp.einsum("bhqk,hkd->bhqd", w[..., :sp], vp,
                          preferred_element_type=jnp.float32)
               + jnp.einsum("bhqk,bhkd->bhqd", w[..., sp:], vd,
                            preferred_element_type=jnp.float32))
    return out.astype(q.dtype)


def quantize_decode_weights(params: Params) -> Params:
    """Weight-only int8 quantization of the GPT trunk linears for the
    decode loop (per-output-channel symmetric scales).

    The decode step is HBM-bandwidth-bound on weight streaming (~772 MB
    of bf16 per token); int8 weights with the int8->bf16 convert fused
    into the GEMV halve that traffic (measured 1.26 -> 0.81 ms/token
    roof on v5e).  Only the four per-layer GEMVs are quantized —
    layer norms, embeddings, ``mel_head`` logits, the prefill and the
    latent pass stay at the params dtype, so conditioning latents are
    bit-identical and logits see only the trunk's quantization error.
    Standard weight-only serving quantization; enable via
    ``Config.inference.decode_quant = "int8"``.
    """
    gpt = params["gpt"]
    out = {}
    for name in _Q_NAMES:
        w = gpt[name]["w"].astype(jnp.float32)          # (L, in, out)
        s = jnp.max(jnp.abs(w), axis=-2, keepdims=True) / 127.0 + 1e-12
        q = {"wq": jnp.round(w / s).astype(jnp.int8),
             "s": jnp.squeeze(s, -2).astype(jnp.float32)}
        if "b" in gpt[name]:
            q["b"] = gpt[name]["b"].astype(jnp.float32)
        out[name] = q
    return out


def _qlinear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """linear() over either regular {'w','b'} or int8 {'wq','s','b'}
    params (dequant fused into the dot by XLA)."""
    if "wq" not in p:
        return linear(p, x)
    y = jnp.dot(x, p["wq"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    y = y * p["s"]
    if "b" in p:
        y = y + p["b"]
    return y.astype(x.dtype)


def _gpt_decode_step(gpt: Params, x: jnp.ndarray, heads: int,
                     cache: KVCache, pos: jnp.ndarray,
                     key_mask: jnp.ndarray,
                     qgpt: Optional[Params] = None,
                     quant_mode: str = "int8",
                     attn_len: Optional[int] = None,
                     prefix: Optional[KVCache] = None,
                     prefix_mask: Optional[jnp.ndarray] = None
                     ) -> Tuple[jnp.ndarray, KVCache]:
    """One-token step. x: (B, 1, D); pos: scalar — cache slot to write.

    prefix: optional SHARED (L, 1, H, ...) read-only prefix K/V (see
    _mha_shared) — then ``cache`` holds only the per-row decode REGION,
    ``pos`` is the region index, and ``prefix_mask`` is the (1, Sp)
    prefix-validity mask.  Mutually exclusive with attn_len and the
    packed/flash-decode cache layouts.

    key_mask: (B, S) bool of *prefix validity* (text padding); positions
    >= pos are masked by the running-length check.

    attn_len: static bound on the attention READ — K/V past it are
    sliced away before the dot (XLA fuses the static slice, so only
    attn_len rows stream from HBM).  The caller guarantees pos <
    attn_len for every step of the enclosing chunk (the decode ladder);
    results are bit-identical to the full masked read because the
    dropped positions contribute exact softmax zeros.

    The cache rides the scan *carry* and is updated with one-position
    dynamic_update_slice writes (in-place under the enclosing
    while_loop); routing it through scan ys instead would rewrite the
    entire (L,B,H,S,Dh) buffer every token (~100 MB of HBM writes per
    step at decode shapes — measured ~0.2 ms/token on v5e).
    """
    import os
    # perf A/B fallback (cache through scan ys).  w8a8 stays on the main
    # path — its in-kernel activation quant has no scan-ys analogue, and
    # silently dropping quantization would conflate the A/B.
    packed = cache.v.ndim != 5      # K||V packed into 128 lanes
    kmaj = _use_kmajor()            # (L,B,H,hd,S) hd-major cache
    if (os.environ.get("TTS_DECODE_SCANYS") == "1" and not packed
            and not kmaj and prefix is None
            and not (qgpt is not None and quant_mode == "w8a8")):
        return _gpt_decode_step_scanys(gpt, x, heads, cache, pos, key_mask,
                                       qgpt=qgpt)
    b, _, d = x.shape
    hd = d // heads
    s = cache.k.shape[4] if kmaj else cache.k.shape[3]
    if prefix is not None:
        assert attn_len is None and not packed, \
            "shared-prefix decode excludes attn_len/packed layouts"
        s_att = s
        g = prefix.k.shape[1]             # prefill groups (B = G*C)
        sp = prefix.k.shape[4] if kmaj else prefix.k.shape[3]
        valid = jnp.concatenate(
            [jnp.broadcast_to(prefix_mask, (g, sp)),
             jnp.broadcast_to(jnp.arange(s)[None, :] <= pos, (g, s))],
            axis=1)                                       # (G, Sp+Sd)
        # single group: (1,1,1,S*) broadcasting over rows; grouped:
        # rank-5 (G,1,1,1,S*) matching _mha_shared's (G,C,H,1,S*) dots
        mask = (valid[:, None, None, :] if g == 1
                else valid[:, None, None, None, :])
    else:
        s_att = s if attn_len is None else min(attn_len, s)
        valid = key_mask[:, :s_att] & (jnp.arange(s_att)[None, :] <= pos)
        mask = valid[:, None, None, :]
    L = cache.k.shape[0]
    lp_all = _layer_params(gpt)
    # Quantized GEMVs go through the Pallas kernel with the FULL stacked
    # (L, in, out) int8 weights + a scalar-prefetched layer index: fed
    # through the scan xs instead, XLA copies each sliced layer before
    # the dot AND materialises the int8->bf16 convert (measured 1.27
    # ms/token for the GEMV roof vs 0.77 through the kernel on v5e).
    use_kernel = (qgpt is not None and jax.default_backend() == "tpu"
                  and os.environ.get("TTS_QGEMV", "1") != "0")
    if qgpt is not None and not use_kernel and quant_mode != "w8a8":
        lp_all = {**lp_all, **qgpt}

    def qlin(lp, name, li, h, ln=None):
        if qgpt is not None and quant_mode == "w8a8":
            # int8 x int8 MXU with dynamic per-row activation quant —
            # works on every backend (XLA int32-dot fallback off-TPU;
            # TTS_QGEMV=0 forces it on TPU too, same escape hatch as
            # the weight-only kernel)
            from ..ops.pallas_gemv import qgemv_stacked_w8a8
            qp = qgpt[name]
            y = qgemv_stacked_w8a8(h.reshape(b, -1), qp["wq"], qp["s"],
                                   qp.get("b"), li,
                                   force_xla=not use_kernel, ln=ln)
            return y.reshape(b, 1, -1)
        if not use_kernel:
            return _qlinear(lp[name], h)
        from ..ops.pallas_gemv import qgemv_stacked
        qp = qgpt[name]
        y = qgemv_stacked(h.reshape(b, -1), qp["wq"], qp["s"],
                          qp.get("b"), li, ln=ln)
        return y.reshape(b, 1, -1)

    # LayerNorms fuse into the GEMV kernels on the quantized paths
    # (~60 tiny LN op-chains per token otherwise); stacked gamma/beta
    # are indexed by the same scalar-prefetched layer index.
    # TTS_QGEMV_LN=0 keeps the XLA LNs (chip-measured: 0.96 vs 1.03
    # ms/token with the fusion on, so it defaults on)
    fuse_ln = (qgpt is not None and (use_kernel or quant_mode == "w8a8")
               and os.environ.get("TTS_QGEMV_LN", "1") == "1")
    ln1 = ((gpt["ln_1"]["scale"], gpt["ln_1"]["bias"])
           if fuse_ln else None)
    ln2 = ((gpt["ln_2"]["scale"], gpt["ln_2"]["bias"])
           if fuse_ln else None)

    use_fd = _use_flash_decode() and s % 128 == 0 and prefix is None

    def body(carry, layer):
        x, ck, cv = carry
        lp, li = layer
        if fuse_ln:
            qkv = qlin(lp, "attn_qkv", li, x, ln=ln1)
        else:
            qkv = qlin(lp, "attn_qkv", li, layer_norm(lp["ln_1"], x))
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)[None]
        v = v.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)[None]
        if packed:
            kv = jnp.concatenate([k, v], axis=-1)
            ck = lax.dynamic_update_slice(ck, kv.astype(ck.dtype),
                                          (li, 0, 0, pos, 0))
        elif kmaj:
            # one (hd, 1) column per head at lane position `pos`
            ck = lax.dynamic_update_slice(
                ck, jnp.swapaxes(k, -1, -2).astype(ck.dtype),
                (li, 0, 0, 0, pos))
            cv = lax.dynamic_update_slice(
                cv, jnp.swapaxes(v, -1, -2).astype(cv.dtype),
                (li, 0, 0, 0, pos))
        else:
            ck = lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                          (li, 0, 0, pos, 0))
            cv = lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                          (li, 0, 0, pos, 0))
        if use_fd:
            from ..ops.pallas_decode_attn import flash_decode_stacked
            a = flash_decode_stacked(q[:, :, 0], ck, cv, li, pos,
                                     key_mask).reshape(b, 1, d)
        else:
            if isinstance(li, int):
                # static layer index (TTS_DECODE_UNROLL=full): a
                # contiguous leading-axis slice of the carry — XLA can
                # read it in place instead of materialising the
                # dynamic-slice copy the scanned path pays for
                layer_k = ck[li]
                layer_v = None if packed else cv[li]
            else:
                layer_k = lax.dynamic_index_in_dim(ck, li, 0,
                                                   keepdims=False)
                layer_v = (None if packed else
                           lax.dynamic_index_in_dim(cv, li, 0,
                                                    keepdims=False))
            if prefix is not None:
                if isinstance(li, int):
                    kp_l, vp_l = prefix.k[li], prefix.v[li]
                else:
                    kp_l = lax.dynamic_index_in_dim(prefix.k, li, 0,
                                                    keepdims=False)
                    vp_l = lax.dynamic_index_in_dim(prefix.v, li, 0,
                                                    keepdims=False)
                if kp_l.shape[0] == 1:     # single group: squeeze
                    kp_l, vp_l = kp_l[0], vp_l[0]
                a = _mha_shared(q, kp_l, vp_l, layer_k, layer_v, mask,
                                kmaj)
            elif kmaj:
                a = _mha_kmajor(q, layer_k[..., :s_att],
                                layer_v[..., :s_att], mask)
            elif packed:
                kvc = layer_k[:, :, :s_att]
                a = mha(q, kvc[..., :hd], kvc[..., hd:], mask=mask)
            else:
                a = mha(q, layer_k[:, :, :s_att],
                        layer_v[:, :, :s_att], mask=mask)
            a = a.transpose(0, 2, 1, 3).reshape(b, 1, d)
        x = x + qlin(lp, "attn_proj", li, a)
        if fuse_ln:
            x = x + qlin(lp, "mlp_proj", li,
                         gelu_new(qlin(lp, "mlp_fc", li, x, ln=ln2)))
        else:
            h2 = layer_norm(lp["ln_2"], x)
            x = x + qlin(lp, "mlp_proj", li,
                         gelu_new(qlin(lp, "mlp_fc", li, h2)))
        return (x, ck, cv), None

    # unroll=2 interleaves adjacent layers' GEMV kernel dispatches
    # (measured 10.84 -> 11.03x e2e RTF median-of-3 on v5e).
    # TTS_DECODE_UNROLL=full Python-unrolls the layer loop with STATIC
    # layer indices: the attention cache read becomes a contiguous
    # static slice of the while_loop carry instead of the scanned
    # path's dynamic-slice (which XLA materialises as a copy — the
    # batch-decode attention cost is ~3x the pure K/V-read roof).
    unroll_env = os.environ.get("TTS_DECODE_UNROLL", "2")
    if unroll_env == "full":
        carry = (x, cache.k, cache.v)
        for li in range(L):
            lp = jax.tree.map(lambda a, li=li: a[li], lp_all)
            carry, _ = body(carry, (lp, li))
        x, nk, nv = carry
    else:
        (x, nk, nv), _ = lax.scan(
            body, (x, cache.k, cache.v),
            (lp_all, jnp.arange(L)), unroll=int(unroll_env))
    return layer_norm(gpt["ln_f"], x), KVCache(nk, nv)


def _gpt_decode_step_scanys(gpt: Params, x: jnp.ndarray, heads: int,
                            cache: KVCache, pos: jnp.ndarray,
                            key_mask: jnp.ndarray,
                            qgpt: Optional[Params] = None
                            ) -> Tuple[jnp.ndarray, KVCache]:
    """Former decode step (cache through scan ys) — kept for perf A/B.
    Weight-only int8 params (qgpt) dequantize through _qlinear so the
    A/B isolates cache routing, not quantization."""
    b, _, d = x.shape
    hd = d // heads
    s = cache.k.shape[3]
    valid = key_mask & (jnp.arange(s)[None, :] <= pos)  # (B, S)
    mask = valid[:, None, None, :]
    lp_all = _layer_params(gpt)
    if qgpt is not None:
        lp_all = {**lp_all, **qgpt}

    def body(x, layer):
        lp, kc, vc = layer
        h = layer_norm(lp["ln_1"], x)
        qkv = _qlinear(lp["attn_qkv"], h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, 1, heads, hd).transpose(0, 2, 1, 3)
        kc = lax.dynamic_update_slice(kc, k.astype(kc.dtype), (0, 0, pos, 0))
        vc = lax.dynamic_update_slice(vc, v.astype(vc.dtype), (0, 0, pos, 0))
        a = mha(q, kc, vc, mask=mask)
        a = a.transpose(0, 2, 1, 3).reshape(b, 1, d)
        x = x + _qlinear(lp["attn_proj"], a)
        h2 = layer_norm(lp["ln_2"], x)
        x = x + _qlinear(lp["mlp_proj"], gelu_new(_qlinear(lp["mlp_fc"], h2)))
        return x, (kc, vc)

    x, (nk, nv) = lax.scan(body, x, (lp_all, cache.k, cache.v))
    return layer_norm(gpt["ln_f"], x), KVCache(nk, nv)


# ---------------------------------------------------------------------------
# embedding builders
# ---------------------------------------------------------------------------


def get_conditioning(params: Params, cond_mels: jnp.ndarray,
                     cfg: UnifiedVoiceConfig = UnifiedVoiceConfig()) -> jnp.ndarray:
    """cond_mels: (B, N, 80, T) or (B, 80, T) -> (B, D).

    Mirrors unified_voice.py:535-542 (mean over N clips)."""
    if cond_mels.ndim == 3:
        cond_mels = cond_mels[:, None]
    b, n = cond_mels.shape[:2]
    flat = cond_mels.reshape((b * n,) + cond_mels.shape[2:])
    lat = conditioning_encoder(params["conditioning_encoder"], flat, cfg.heads)
    return lat.reshape(b, n, -1).mean(axis=1)


def _build_text_segment(params: Params, text: jnp.ndarray,
                        text_lengths: jnp.ndarray, cfg: UnifiedVoiceConfig
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[start, text.., stop, pad..] embeddings + validity mask.

    text: (B, Tt) ids (padding ignored); lengths: (B,).
    Returns emb (B, Tt+2, D), mask (B, Tt+2).
    """
    b, tt = text.shape
    seg_len = tt + 2
    pos = jnp.arange(seg_len)[None, :]
    # token at position 0 = start; 1..len = text; len+1 = stop; rest pad(stop)
    shifted = jnp.pad(text, ((0, 0), (1, 1)),
                      constant_values=cfg.stop_text_token)
    ids = jnp.where(pos == 0, cfg.start_text_token, shifted)
    ids = jnp.where(pos > text_lengths[:, None], cfg.stop_text_token, ids)
    mask = pos <= (text_lengths[:, None] + 1)
    emb = embedding(params["text_embedding"], ids)
    emb = emb + embedding(params["text_pos_embedding"],
                          jnp.arange(seg_len))[None]
    return emb, mask


# ---------------------------------------------------------------------------
# training forward
# ---------------------------------------------------------------------------


def forward(params: Params, cond_latent: jnp.ndarray, text: jnp.ndarray,
            text_lengths: jnp.ndarray, mel_codes: jnp.ndarray,
            wav_lengths: jnp.ndarray,
            cfg: UnifiedVoiceConfig = UnifiedVoiceConfig(),
            return_latent: bool = False, remat: bool = False):
    """Teacher-forced forward (reference unified_voice.py:544-612).

    cond_latent: (B, D) from get_conditioning.
    text: (B, Tt) token ids; text_lengths: (B,).
    mel_codes: (B, Tm) mel code ids; wav_lengths: (B,) in samples.
    Fixed shapes; the reference's clip_inputs is a host-side concern.

    Returns (loss_text, loss_mel, mel_logits) or latents (B, Tm, D) when
    return_latent (reference strips the 2 appended tokens; here latents[i]
    is the hidden state above mel input i for i < Tm).
    """
    b, tt = text.shape
    tm = mel_codes.shape[1]
    d = cfg.model_dim

    # --- text segment: [start, text, stop] + aligned targets ---
    text_emb, _ = _build_text_segment(params, text, text_lengths, cfg)
    pos_t = jnp.arange(tt + 2)[None, :]
    # reference pads text with stop(0) in its dataloader; positions >= len
    # are all stop in the aligned target [text, stop, stop]
    text_targets = jnp.where(
        pos_t >= text_lengths[:, None], cfg.stop_text_token,
        jnp.pad(text, ((0, 0), (0, 2))))

    # --- mel segment: set_mel_padding (unified_voice.py:494-506) ---
    mel_lengths = wav_lengths // cfg.mel_length_compression
    pos_m = jnp.arange(tm)[None, :]
    codes = jnp.where(pos_m >= mel_lengths[:, None] + 1, cfg.stop_mel_token,
                      mel_codes)
    # aligned: inputs [start, codes, stop]; targets [codes, stop, stop]
    mel_in = jnp.concatenate(
        [jnp.full((b, 1), cfg.start_mel_token, codes.dtype), codes,
         jnp.full((b, 1), cfg.stop_mel_token, codes.dtype)], axis=1)
    mel_targets = jnp.concatenate(
        [codes, jnp.full((b, 2), cfg.stop_mel_token, codes.dtype)], axis=1)
    mel_emb = embedding(params["mel_embedding"], mel_in)
    mel_emb = mel_emb + embedding(params["mel_pos_embedding"],
                                  jnp.arange(tm + 2))[None]

    emb = jnp.concatenate([cond_latent[:, None].astype(text_emb.dtype),
                           text_emb, mel_emb], axis=1)
    hidden = gpt_forward(params["gpt"], emb, cfg.heads, remat=remat)
    # first position tied to the conditioning input (unified_voice.py:518)
    enc = layer_norm(params["final_norm"], hidden[:, 1:])

    text_latents = enc[:, : tt + 2]
    mel_latents = enc[:, -(tm + 2):]
    if return_latent:
        return mel_latents[:, :-2]

    text_logits = linear(params["text_head"], text_latents)
    mel_logits = linear(params["mel_head"], mel_latents)

    loss_text = _ce(text_logits, text_targets)
    loss_mel = _ce(mel_logits, mel_targets)
    return loss_text, loss_mel, mel_logits


def _ce(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None].astype(jnp.int32),
                               axis=-1)[..., 0]
    return nll.mean()


# ---------------------------------------------------------------------------
# inference (prefill + while_loop decode)
# ---------------------------------------------------------------------------


class DecodeResult(NamedTuple):
    codes: jnp.ndarray     # (B, max_len) int32, stop-padded
    lengths: jnp.ndarray   # (B,) int32 — number of codes before stop
    latents: jnp.ndarray   # (B, max_len, D) hidden states (streaming path)


class DecodeState(NamedTuple):
    """Persistent decode carry — lives on device between chunked calls."""
    step: jnp.ndarray
    cache: KVCache
    lat: jnp.ndarray       # latent producing current step's logits
    tokens: jnp.ndarray
    counts: jnp.ndarray
    latents: jnp.ndarray
    finished: jnp.ndarray
    lengths: jnp.ndarray
    rng: jax.Array         # (B, 2) per-row threefry keys
    key_mask: jnp.ndarray  # (B, cache_len) prefix-validity mask
    mu: jnp.ndarray        # (B,) mirostat running max-surprise


@partial(jax.jit, static_argnames=("cfg", "max_length", "shared_rows"))
def decode_start(params: Params, cond_latent: jnp.ndarray,
                 text: jnp.ndarray, text_lengths: jnp.ndarray,
                 key: jax.Array,
                 cfg: UnifiedVoiceConfig = UnifiedVoiceConfig(),
                 max_length: int = 500, shared_rows: int = 0) -> DecodeState:
    """Prefill [cond, text, start_mel] and return a resumable DecodeState.

    Sequence: [cond, start_text, text, stop_text, pad.., start_mel, ...]
    (reference unified_voice.py:632-668 layout).

    shared_rows > 0 (candidate fan-out, rows share prefills): the B
    input rows are G prefill GROUPS; each fans out ``shared_rows``
    candidate rows (group-major, row g*C+c) sharing its prefill.  The
    return is ``(state, prefix)`` — ``state`` carries only the
    per-row decode-REGION cache for G*shared_rows rows and ``prefix``
    is the read-only (L,G,H,...) prefill K/V, passed to decode_chunk's
    ``prefix=`` (it never rides the while_loop carry, so it is
    streamed once per step per group and never copied).  The
    single-call candidates path is G=1.  Excluded with the
    packed/flash-decode cache layouts.
    """
    b, tt = text.shape
    d = cfg.model_dim
    prefix_len = 1 + tt + 2              # cond + text segment
    cache_len = prefix_len + 1 + max_length
    # flash-decode kernel wants S as a block multiple: pad the cache
    # with a MASKED gap between the prefill and the decode region
    # (key_mask=False there, so the zero K/V are never attended;
    # decode_chunk's prefix_len arithmetic stays consistent because the
    # gap counts as prefix)
    pad = (-cache_len) % 128 if _use_flash_decode() else 0
    cache_len += pad
    dtype = params["mel_embedding"]["w"].dtype

    text_emb, text_mask = _build_text_segment(params, text, text_lengths, cfg)
    start_emb = (params["mel_embedding"]["w"][cfg.start_mel_token]
                 + params["mel_pos_embedding"]["w"][0])[None, None].astype(text_emb.dtype)
    prefill = jnp.concatenate(
        [cond_latent[:, None].astype(text_emb.dtype), text_emb,
         jnp.broadcast_to(start_emb, (b, 1, d))], axis=1)

    ones = jnp.ones((b, 1), dtype=bool)
    prefill_mask = jnp.concatenate([ones, text_mask, ones], axis=1)
    if shared_rows:
        if _use_packed_kv() or _use_flash_decode():
            raise ValueError("shared-prefix decode excludes the "
                             "packed-KV/flash-decode cache layouts")
        # b prefill rows = G groups; every group fans out `shared_rows`
        # candidate rows (group-major: row g*C+c) sharing its prefill
        r, hd = b * shared_rows, d // cfg.heads
        sp = prefill.shape[1]
        hidden, pcache = _gpt_prefill(params["gpt"], prefill, cfg.heads,
                                      prefill_mask, sp)
        if _use_kmajor():
            pcache = KVCache(jnp.swapaxes(pcache.k, -1, -2),
                             jnp.swapaxes(pcache.v, -1, -2))
            rshape = (cfg.layers, r, cfg.heads, hd, max_length)
        else:
            rshape = (cfg.layers, r, cfg.heads, max_length, hd)
        if key.ndim == 1:   # same per-row streams as the fan-out path
            if b != 1:
                raise ValueError(
                    "grouped shared-prefix decode needs explicit "
                    f"({r}, 2) per-row keys (the batch caller derives "
                    "them per group seed — _row_keys)")
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
                jnp.arange(r))
        else:
            keys = key
        counts0 = jnp.zeros((r, cfg.number_mel_codes), jnp.int32)
        counts0 = counts0.at[:, cfg.start_mel_token].add(1)
        first_lat = jnp.repeat(
            layer_norm(params["final_norm"], hidden[:, -1]),
            shared_rows, axis=0)                           # (G*C, D)
        state = DecodeState(
            jnp.zeros((), jnp.int32),
            KVCache(jnp.zeros(rshape, dtype), jnp.zeros(rshape, dtype)),
            first_lat,
            jnp.full((r, max_length), cfg.stop_mel_token, jnp.int32),
            counts0, jnp.zeros((r, max_length, d), dtype),
            jnp.zeros((r,), bool), jnp.full((r,), max_length, jnp.int32),
            keys, prefill_mask, jnp.zeros((r,), jnp.float32))
        return state, pcache
    hidden, cache = _gpt_prefill(params["gpt"], prefill, cfg.heads,
                                 prefill_mask, cache_len)
    if _use_packed_kv():
        # pack K||V of each head into one 128-lane row: the per-head
        # head_dim of 64 pads to 128 lanes in TPU tiling, so the split
        # (S, 64) K and V buffers each occupy (and stream) 2x their
        # bytes; the packed (S, 128) buffer is dense and one read
        # serves both attention dots.  decode_chunk detects the layout
        # from the cache shape (cache.v becomes a 0-size sentinel).
        cache = KVCache(jnp.concatenate([cache.k, cache.v], axis=-1),
                        jnp.zeros((0,), cache.k.dtype))
    elif _use_kmajor():
        # hd-major layout: S becomes the minor (lane) dim — see
        # _use_kmajor for the chip-measured motivation
        cache = KVCache(jnp.swapaxes(cache.k, -1, -2),
                        jnp.swapaxes(cache.v, -1, -2))
    key_mask = jnp.concatenate(
        [prefill_mask, jnp.zeros((b, pad), dtype=bool),
         jnp.ones((b, cache_len - pad - prefill.shape[1]), dtype=bool)],
        axis=1)

    # per-row RNG streams: the sampled bitstream of row r depends only
    # on row r's key, so any row of a batched decode replays bit-exactly
    # as a B=1 call with that key (reference per-call seed semantics,
    # inference.py:142,157-160, kept at batch scale).  A single (2,)
    # key is accepted for b == 1 (bit-identical to the per-row form) or
    # fanned out in-graph via fold_in for legacy batch-keyed callers.
    if key.ndim == 1:
        keys = (key[None] if b == 1 else
                jax.vmap(lambda i: jax.random.fold_in(key, i))(
                    jnp.arange(b)))
    else:
        keys = key

    first_lat = layer_norm(params["final_norm"], hidden[:, -1])
    counts0 = jnp.zeros((b, cfg.number_mel_codes), jnp.int32)
    # start_mel token counts as seen for repetition penalty (HF counts all
    # generated input_ids; prefix dummies are token id 1 in a different
    # vocab space and never produced again, so only mel tokens matter).
    counts0 = counts0.at[:, cfg.start_mel_token].add(1)

    return DecodeState(
        jnp.zeros((), jnp.int32), cache, first_lat,
        jnp.full((b, max_length), cfg.stop_mel_token, jnp.int32), counts0,
        jnp.zeros((b, max_length, d), dtype), jnp.zeros((b,), bool),
        jnp.full((b,), max_length, jnp.int32), keys, key_mask,
        jnp.zeros((b,), jnp.float32))


@partial(jax.jit, static_argnames=("quant_mode", "cfg", "sampling",
                                   "chunk", "collect_latents",
                                   "attn_len"))
def decode_chunk(params: Params, state: DecodeState,
                 cfg: UnifiedVoiceConfig = UnifiedVoiceConfig(),
                 sampling: SamplingConfig = SamplingConfig(),
                 chunk: Optional[int] = None,
                 collect_latents: bool = False,
                 qgpt: Optional[Params] = None,
                 quant_mode: str = "int8",
                 attn_len: Optional[int] = None,
                 prefix: Optional[KVCache] = None) -> DecodeState:
    """Advance the decode by up to `chunk` tokens (while_loop with early
    exit).  chunk=None runs to max_length.  The streaming route calls
    this in 40-token chunks, vocoding between calls (inference.py:250-329
    behavior with a persistent on-device KV cache).

    ``attn_len``: static attention-read bound for this chunk — every
    step reads only the first attn_len cache rows (must cover the
    chunk's last write position; see inference_speech's ladder).

    ``prefix``: shared read-only prefill K/V from
    ``decode_start(shared_rows=R)`` — state.cache then holds only the
    decode region and state.key_mask the (1, Sp) prefix mask."""
    b = state.tokens.shape[0]
    max_len = state.tokens.shape[1]
    if prefix is not None and attn_len is not None:
        raise ValueError("attn_len is not supported with a shared prefix")
    if _use_kmajor() and state.cache.v.size:
        # guard against a layout/env mismatch (TTS_DECODE_KMAJOR flipped
        # between decode_start and decode_chunk, or a stale cache):
        # hd-major caches are (L,B,H,hd,S) with axis 3 == head_dim —
        # silently reading an S-major cache here would treat hd as the
        # sequence axis and produce garbage tokens with no error
        hd = (state.lat.shape[-1]
              // state.cache.k.shape[2])      # model_dim / heads
        if state.cache.k.shape[3] != hd:
            raise ValueError(
                "TTS_DECODE_KMAJOR=1 but the KV cache is S-major "
                f"(k.shape={tuple(state.cache.k.shape)}, head_dim={hd})"
                " — the cache was built with a different layout env")
    elif state.cache.v.size:
        # split S-major cache expected: (L,B,H,S,hd) with axis 4 == hd
        # (packed K||V announces itself via the 0-size v sentinel)
        hd = state.lat.shape[-1] // state.cache.k.shape[2]
        if state.cache.k.shape[4] != hd and state.cache.k.shape[3] == hd:
            raise ValueError(
                "KV cache is hd-major but TTS_DECODE_KMAJOR is unset "
                f"(k.shape={tuple(state.cache.k.shape)}, head_dim={hd})"
                " — the cache was built with a different layout env")
    cache_len = (state.cache.k.shape[4] if _use_kmajor()
                 else state.cache.k.shape[3])
    # shared-prefix mode: the cache IS the decode region (write index =
    # step); otherwise the write position offsets past the prefill
    prefix_len = None if prefix is not None else cache_len - 1 - max_len
    dtype = params["mel_embedding"]["w"].dtype

    def latent_of(h):
        """final_norm'd hidden above the last input position — the latent
        that produces the *next* token's logits (stream_generator.py:1172)."""
        return layer_norm(params["final_norm"], h[:, -1])

    def logits_of(lat):
        return linear(params["mel_head"], lat).astype(jnp.float32)

    start_step = state.step
    limit = (max_len if chunk is None
             else jnp.minimum(start_step + chunk, max_len))

    def cond_fn(c: DecodeState):
        return (c.step < limit) & ~jnp.all(c.finished)

    def body_fn(c: DecodeState):
        # c.rng is (B, 2) per-row keys (see decode_start): split each
        # row's stream independently so row draws are row-key functions
        ks = jax.vmap(jax.random.split)(c.rng)        # (B, 2, 2)
        rng, sub = ks[:, 0], ks[:, 1]
        logits = logits_of(c.lat)
        if sampling.length_penalty_factor != 0.0:
            # stop-logit length penalty in the *sampled* path
            # (reference samplers.py:35-40: stop /= length**factor; the
            # HF-style length_penalty only applies to beam selection)
            from ..ops.sampling import apply_length_penalty
            sl = apply_length_penalty(logits[:, cfg.stop_mel_token],
                                      c.step, sampling.length_penalty_factor)
            logits = logits.at[:, cfg.stop_mel_token].set(sl)
        if sampling.mirostat_tau > 0:
            from ..ops.sampling import (apply_repetition_penalty,
                                        mirostat_step)
            x = apply_repetition_penalty(logits, c.counts,
                                         sampling.repetition_penalty)
            mu0 = jnp.where(c.step == 0, 2.0 * sampling.mirostat_tau, c.mu)
            tok, mu = mirostat_step(sub, x, mu0, sampling.mirostat_tau,
                                    sampling.mirostat_eta)
        else:
            tok = sample_token(sub, logits, sampling, c.counts)
            mu = c.mu
        tok = jnp.where(c.finished, cfg.stop_mel_token, tok)
        now_stop = (tok == cfg.stop_mel_token) & ~c.finished
        lengths = jnp.where(now_stop, c.step, c.lengths)
        finished = c.finished | (tok == cfg.stop_mel_token)
        tokens = c.tokens.at[:, c.step].set(tok)
        counts = c.counts.at[jnp.arange(b), tok].add(1)
        latents = c.latents
        if collect_latents:
            # latent aligned with the token it predicted
            latents = latents.at[:, c.step].set(c.lat.astype(latents.dtype))

        emb = embedding(params["mel_embedding"], tok)[:, None]
        pos_off = 2 if cfg.hf_decode_positions else 1
        emb = emb + params["mel_pos_embedding"]["w"][c.step + pos_off][None, None]
        pos = c.step if prefix is not None else prefix_len + 1 + c.step
        h, cache = _gpt_decode_step(params["gpt"], emb.astype(dtype),
                                    cfg.heads, c.cache, pos, c.key_mask,
                                    qgpt=qgpt, quant_mode=quant_mode,
                                    attn_len=attn_len, prefix=prefix,
                                    prefix_mask=c.key_mask)
        return DecodeState(c.step + 1, cache, latent_of(h), tokens, counts,
                           latents, finished, lengths, rng, c.key_mask, mu)

    return lax.while_loop(cond_fn, body_fn, state)


@partial(jax.jit, static_argnames=("quant_mode", "cfg", "sampling",
                                   "max_length", "collect_latents",
                                   "decode_chunk_size"))
def inference_speech(params: Params, cond_latent: jnp.ndarray,
                     text: jnp.ndarray, text_lengths: jnp.ndarray,
                     key: jax.Array,
                     cfg: UnifiedVoiceConfig = UnifiedVoiceConfig(),
                     sampling: SamplingConfig = SamplingConfig(),
                     max_length: int = 500,
                     collect_latents: bool = False,
                     qgpt: Optional[Params] = None,
                     quant_mode: str = "int8",
                     decode_chunk_size: int = 0) -> DecodeResult:
    """Generate mel codes (reference unified_voice.py:632-668 + HF loop):
    ONE jitted program — prefill + a trace-time-unrolled LADDER of
    while_loop chunks with stop early-exit.

    The attention ladder (round-4 chip finding — the batch-decode gap
    is entirely the cache read: 0.99 of 1.75 ms/token at B=8): the
    decode advances in ``decode_chunk_size`` chunks and each chunk's
    attention reads only the static cache prefix it can possibly touch
    (``attn_len``), cutting the streamed K/V bytes to ~0.74x of the
    fixed-budget read at a 200-token budget.  Results are bit-identical
    (dropped positions are exact softmax zeros — tested).  The ladder
    unrolls INSIDE the jit: a host-side chunk loop was chip-measured
    SLOWER (+0.36 ms/token at B=8) because each extra dispatch through
    the remote relay costs ~20 ms un-overlapped; here the whole decode
    stays one dispatch.  A chunk whose rows have all stopped exits its
    while_loop in one cond evaluation.

    ``decode_chunk_size``: ladder granularity (static); the DEFAULT is
    0 = one full-budget while_loop: the in-jit ladder ALSO measured
    slower on chip (B=8 2.04 vs 1.74 ms/token, B=16 4.37 vs 2.55 —
    XLA does not alias the 100-500 MB KV cache across the sequential
    while_loops, so each chunk boundary copies it), leaving the
    fixed-budget masked read as the fastest decode in this
    environment.  Both negative results are recorded in DESIGN.md;
    the ablation matrix (tools/perf_lab.py decodebatch) reproduces
    them.
    """
    cs = decode_chunk_size or max_length
    state = decode_start(params, cond_latent, text, text_lengths, key, cfg,
                         max_length)
    cache_len = (state.cache.k.shape[4] if _use_kmajor()
                 else state.cache.k.shape[3])
    prefix_eff = cache_len - 1 - max_length   # incl. any kernel pad gap
    done = 0
    while done < max_length:                  # unrolls at trace time
        n = min(cs, max_length - done)
        attn_len = min(prefix_eff + 1 + done + n, cache_len)
        state = decode_chunk(params, state, cfg, sampling, chunk=n,
                             collect_latents=collect_latents, qgpt=qgpt,
                             quant_mode=quant_mode,
                             attn_len=attn_len if cs < max_length else None)
        done += n
    return DecodeResult(state.tokens, state.lengths, state.latents)


@partial(jax.jit, static_argnames=("quant_mode", "cfg", "sampling",
                                   "max_length", "collect_latents",
                                   "rows"))
def inference_speech_shared(params: Params, cond_latent: jnp.ndarray,
                            text: jnp.ndarray, text_lengths: jnp.ndarray,
                            key: jax.Array, rows: int,
                            cfg: UnifiedVoiceConfig = UnifiedVoiceConfig(),
                            sampling: SamplingConfig = SamplingConfig(),
                            max_length: int = 500,
                            collect_latents: bool = False,
                            qgpt: Optional[Params] = None,
                            quant_mode: str = "int8") -> DecodeResult:
    """Candidate fan-out decode with a SHARED prefix cache.

    All ``rows`` candidates of one (text, voice) pair have the same
    [cond‖text‖start_mel] prefill (reference candidates fan-out,
    inference.py:334+392-396 with num_return_sequences): prefill runs
    once per group, its K/V are stored ONCE outside the while_loop
    carry, and each decode step streams them once instead of ``rows``
    times (_mha_shared).  Inputs carry G rows (single call: G=1;
    batched serving: one row per text, decode rows group-major
    g*rows+c); ``key`` is one (2,) key for G=1 (per-row streams
    derived via fold_in, matching the batched fan-out) or explicit
    (G*rows, 2) keys.  Token streams are the fan-out path's to
    accumulation-order rounding (exact on the dots and softmax; the
    AV matmul accumulates the prefix and region partials in fp32)."""
    state, pcache = decode_start(params, cond_latent, text, text_lengths,
                                 key, cfg, max_length, shared_rows=rows)
    state = decode_chunk(params, state, cfg, sampling, chunk=None,
                         collect_latents=collect_latents, qgpt=qgpt,
                         quant_mode=quant_mode, prefix=pcache)
    return DecodeResult(state.tokens, state.lengths, state.latents)


# ---------------------------------------------------------------------------
# beam-search decode (HF num_beams equivalent; cache reorder =
# unified_voice.py:256-266 _reorder_cache, as an in-graph gather)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("cfg", "num_beams", "max_length",
                                   "length_penalty", "sampling",
                                   "do_sample"))
def inference_speech_beam(params: Params, cond_latent: jnp.ndarray,
                          text: jnp.ndarray, text_lengths: jnp.ndarray,
                          cfg: UnifiedVoiceConfig = UnifiedVoiceConfig(),
                          num_beams: int = 4, max_length: int = 500,
                          length_penalty: float = 1.0,
                          sampling: Optional[SamplingConfig] = None,
                          key: Optional[jax.Array] = None,
                          do_sample: bool = False) -> DecodeResult:
    """Beam-search decode with the HF logit-processor stack.

    Beams live in the batch dimension (B*W); each step expands to W*V
    candidates, keeps the top W, and gathers the KV cache by beam index
    (the reference reorders HF past_key_values the same way).
    Finished beams are frozen with their score; final selection divides
    by length**length_penalty (HF semantics).

    ``sampling`` wires the processor stack the reference passes through
    ``generate()`` (inference.py:330-345 + unified_voice.py:653-668):
    repetition penalty (per-beam count state) and the typical warper
    apply as *processors* to the log-probs before beam expansion, and
    the stop-logit ``length_penalty_factor`` applies as in the sampled
    path.  With ``do_sample=True`` (the reference's actual mode —
    do_sample=True + num_beams>1 => HF ``beam_sample``), the
    temperature/top-k/top-p warpers then apply to score+beam totals and
    2W candidates are drawn without replacement (Gumbel top-k == HF's
    ``multinomial(..., 2*num_beams)``), of which the top W by warped
    score continue.  Design delta vs HF BeamHypotheses (documented +
    tested): finished beams stay in the active set frozen on their
    score instead of moving to a hypothesis list, so ties near the stop
    boundary can resolve differently; selection-by-score semantics are
    otherwise identical.
    """
    snap = sampling if sampling is not None else SamplingConfig(
        temperature=1.0, repetition_penalty=1.0,
        length_penalty=length_penalty)
    length_penalty = snap.length_penalty if sampling is not None \
        else length_penalty
    if key is None:
        key = jax.random.PRNGKey(0)
    b, tt = text.shape
    w = num_beams
    d = cfg.model_dim
    text_seg = tt + 2
    prefix_len = 1 + text_seg
    cache_len = prefix_len + 1 + max_length
    dtype = params["mel_embedding"]["w"].dtype
    V = cfg.number_mel_codes

    text_emb, text_mask = _build_text_segment(params, text, text_lengths, cfg)
    start_emb = (params["mel_embedding"]["w"][cfg.start_mel_token]
                 + params["mel_pos_embedding"]["w"][0])[None, None].astype(text_emb.dtype)
    prefill = jnp.concatenate(
        [cond_latent[:, None].astype(text_emb.dtype), text_emb,
         jnp.broadcast_to(start_emb, (b, 1, d))], axis=1)
    ones = jnp.ones((b, 1), dtype=bool)
    prefill_mask = jnp.concatenate([ones, text_mask, ones], axis=1)

    # expand to beams
    def rep(x):
        return jnp.repeat(x, w, axis=0)

    hidden, cache = _gpt_prefill(params["gpt"], rep(prefill), cfg.heads,
                                 rep(prefill_mask), cache_len)
    if _use_kmajor():
        cache = KVCache(jnp.swapaxes(cache.k, -1, -2),
                        jnp.swapaxes(cache.v, -1, -2))
    key_mask = jnp.concatenate(
        [rep(prefill_mask),
         jnp.ones((b * w, cache_len - prefill.shape[1]), dtype=bool)], axis=1)

    def latent_of(h):
        return layer_norm(params["final_norm"], h[:, -1])

    def logits_of(lat):
        return linear(params["mel_head"], lat).astype(jnp.float32)

    class Carry(NamedTuple):
        step: jnp.ndarray
        cache: KVCache
        lat: jnp.ndarray            # (B*W, D)
        tokens: jnp.ndarray         # (B, W, T)
        scores: jnp.ndarray         # (B, W) cumulative logprob
        finished: jnp.ndarray       # (B, W)
        lengths: jnp.ndarray        # (B, W)
        counts: jnp.ndarray         # (B, W, V) per-beam token counts
        rng: jax.Array

    scores0 = jnp.tile(jnp.concatenate(
        [jnp.zeros((1,)), jnp.full((w - 1,), -1e9)])[None], (b, 1))
    counts0 = jnp.zeros((b, w, V), jnp.int32).at[
        :, :, cfg.start_mel_token].add(1)
    init = Carry(jnp.zeros((), jnp.int32), cache, latent_of(hidden),
                 jnp.full((b, w, max_length), cfg.stop_mel_token, jnp.int32),
                 scores0, jnp.zeros((b, w), bool),
                 jnp.full((b, w), max_length, jnp.int32), counts0, key)

    def cond_fn(c: Carry):
        return (c.step < max_length) & ~jnp.all(c.finished)

    def body_fn(c: Carry):
        from ..ops.sampling import (apply_length_penalty,
                                    apply_repetition_penalty,
                                    apply_temperature, apply_top_k,
                                    apply_top_p, apply_typical)
        rng, sub = jax.random.split(c.rng)
        x = logits_of(c.lat)                            # (B*W, V) fp32
        # stop-logit length penalty on raw logits (reference
        # samplers.py:35-40 operates pre-softmax)
        if snap.length_penalty_factor != 0.0:
            sl = apply_length_penalty(x[:, cfg.stop_mel_token], c.step,
                                      snap.length_penalty_factor)
            x = x.at[:, cfg.stop_mel_token].set(sl)
        logp = jax.nn.log_softmax(x, axis=-1)
        # logits PROCESSORS on LOG-PROB scores — HF's beam modes apply
        # the processor list to log_softmax'ed scores (generate's
        # beam_search/beam_sample), unlike sample() which processes raw
        # logits: repetition penalty on per-beam counts, then the
        # typical warper (the reference passes it through generate()'s
        # logits_processor list, unified_voice.py:659)
        logp = apply_repetition_penalty(logp, c.counts.reshape(b * w, V),
                                        snap.repetition_penalty)
        logp = apply_typical(logp, snap.typical_mass).reshape(b, w, V)
        # frozen beams: only 'continue as stop' with 0 added score
        stop_only = jnp.full((V,), -jnp.inf).at[cfg.stop_mel_token].set(0.0)
        logp = jnp.where(c.finished[..., None], stop_only[None, None], logp)
        total = c.scores[..., None] + logp              # (B, W, V)
        if do_sample:
            # HF beam_sample: the temperature/top-k/top-p WARPERS apply
            # to score+beam totals, then 2W candidates are drawn without
            # replacement from softmax(flat) — Gumbel top-k is exactly
            # that — and the top W by warped score continue.  Frozen
            # beams' stop-continuations are ADDED deterministically to
            # the candidate pool: HF moves finished hypotheses to
            # BeamHypotheses where a random draw can never displace
            # them, so they must not be subject to sampling loss here.
            warped = apply_temperature(total.reshape(b * w, V),
                                       snap.temperature)
            warped = apply_top_k(warped, snap.top_k)
            warped = apply_top_p(warped, snap.top_p)
            flat = warped.reshape(b, w * V)
            gumbel = jax.random.gumbel(sub, flat.shape, jnp.float32)
            _, cand = lax.top_k(jnp.where(jnp.isfinite(flat),
                                          flat + gumbel, -jnp.inf), 2 * w)
            stop_cand = (jnp.arange(w)[None] * V
                         + cfg.stop_mel_token).astype(cand.dtype)
            # unfinished beams' stop entries just compete on their own
            # warped score (possibly -inf after top-k/p); frozen beams'
            # are their only finite entry, so they survive on score
            cand = jnp.concatenate(
                [cand, jnp.broadcast_to(stop_cand, (b, w))], axis=1)
            cand_scores = jnp.take_along_axis(flat, cand, axis=1)
            top_scores, order = lax.top_k(cand_scores, w)   # sort desc
            top_idx = jnp.take_along_axis(cand, order, axis=1)
        else:
            flat = total.reshape(b, w * V)
            top_scores, top_idx = lax.top_k(flat, w)    # (B, W)
        beam_idx = top_idx // V                         # (B, W)
        tok = (top_idx % V).astype(jnp.int32)

        gather = (jnp.arange(b)[:, None] * w + beam_idx).reshape(-1)
        cache2 = KVCache(jnp.take(c.cache.k, gather, axis=1),
                         jnp.take(c.cache.v, gather, axis=1)
                         if c.cache.v.ndim == 5 else c.cache.v)
        tokens = jnp.take_along_axis(
            c.tokens, beam_idx[..., None], axis=1)
        tokens = tokens.at[:, :, c.step].set(tok)
        counts = jnp.take_along_axis(c.counts, beam_idx[..., None], axis=1)
        counts = counts.at[jnp.arange(b)[:, None], jnp.arange(w)[None],
                           tok].add(1)
        finished = jnp.take_along_axis(c.finished, beam_idx, axis=1)
        lengths = jnp.take_along_axis(c.lengths, beam_idx, axis=1)
        now_stop = (tok == cfg.stop_mel_token) & ~finished
        lengths = jnp.where(now_stop, c.step, lengths)
        finished = finished | (tok == cfg.stop_mel_token)

        emb = embedding(params["mel_embedding"], tok.reshape(-1))[:, None]
        pos_off = 2 if cfg.hf_decode_positions else 1
        emb = emb + params["mel_pos_embedding"]["w"][c.step + pos_off][None, None]
        pos = prefix_len + 1 + c.step
        h, cache3 = _gpt_decode_step(params["gpt"], emb.astype(dtype),
                                     cfg.heads, cache2, pos, key_mask)
        return Carry(c.step + 1, cache3, latent_of(h), tokens, top_scores,
                     finished, lengths, counts, rng)

    out = lax.while_loop(cond_fn, body_fn, init)
    # final beam selection with length penalty (HF BeamHypotheses)
    norm = out.scores / jnp.power(
        jnp.maximum(out.lengths, 1).astype(jnp.float32), length_penalty)
    best = jnp.argmax(norm, axis=1)                     # (B,)
    tokens = jnp.take_along_axis(
        out.tokens, best[:, None, None], axis=1)[:, 0]
    lengths = jnp.take_along_axis(out.lengths, best[:, None], axis=1)[:, 0]
    latents = jnp.zeros((b, max_length, d), dtype)
    return DecodeResult(tokens, lengths, latents)
