"""Pallas TPU attention kernels.

``flash_attention``: blocked causal attention for the GPT trunk's
prefill/training path (seq <= ~1k, head dim 64).  At TorToiSe's sequence
lengths the whole K/V for one (batch, head) fits comfortably in VMEM
(~1010 x 64 x 4 B = 260 KB), so each grid step loads K/V once and
processes one query block — no online-softmax streaming needed, fp32
accumulation on the MXU, causal + key-padding masks fused.

Falls back to the XLA path (ops/attention.py mha) off-TPU or for odd
shapes; both are numerically interchangeable (tests compare them).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend only exists on TPU builds
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _mosaic_ok() -> bool:
    """Mosaic lowering is only available when the *backend* is TPU —
    the pallas.tpu module itself imports fine on CPU-only jax builds,
    so gating on the import alone would crash instead of falling back
    (interpret=True bypasses this for tests)."""
    return _HAS_PLTPU and jax.default_backend() == "tpu"

from .attention import NEG_INF, mha

BLOCK_Q = 256


# ---------------------------------------------------------------------------
# Non-causal attention with additive (H, T, T) bias — the diffusion
# denoiser's AttentionBlock path (reference arch_utils.py:59-133 with
# RelativePositionBias).  The XLA fallback materialises the full
# (B, H, T, T) fp32 score tensor in HBM; at T~900 that is ~100 MB per
# block x 13 blocks per denoiser step, which dominates the step time.
# This kernel keeps scores in VMEM: per (batch*head, q-block) grid step
# it loads K/V once (~128 KB each) plus one (block_q, S) bias tile.
# ---------------------------------------------------------------------------


def _attn_bias_kernel(q_ref, k_ref, v_ref, b_ref, o_ref, *, scale: float):
    """Channels-major block: q_ref: (1, D, bq); k_ref/v_ref: (1, D, S);
    b_ref: (1, bq, S); o_ref: (1, D, bq).  Contractions run directly on
    the channels axis so no layout transposes are needed around the
    kernel (the model's tensors are (B, H*C, T) channels-major).

    Matmul inputs stay in their storage dtype (bf16 in production) with
    fp32 MXU accumulation — pre-casting inputs to fp32 would force the
    slow multi-pass fp32 MXU mode; softmax runs in fp32."""
    dots = jax.lax.dot_general(q_ref[0], k_ref[0], (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dots = dots * scale + b_ref[0].astype(jnp.float32)
    p = jax.nn.softmax(dots, axis=-1).astype(v_ref.dtype)
    o = jax.lax.dot_general(v_ref[0], p, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def flash_attention_bias_cm(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                            bias: jnp.ndarray, block_q: int = 512,
                            interpret: bool = False) -> jnp.ndarray:
    """Non-causal attention with per-head additive bias, channels-major.

    q,k,v: (B, H, D, T); bias: (H, T, T) fp32/bf16 (already scaled).
    Returns (B, H, D, T).  Scores never touch HBM; scaling matches
    qkv_attention: softmax(q.k/sqrt(D) + bias).
    """
    b, h, d, s = q.shape
    if not _mosaic_ok() and not interpret:
        out = mha(jnp.swapaxes(q, -1, -2), jnp.swapaxes(k, -1, -2),
                  jnp.swapaxes(v, -1, -2), bias=bias[None])
        return jnp.swapaxes(out, -1, -2)
    return _bias_cm_call(
        q.reshape(b * h, d, s), k.reshape(b * h, d, s),
        v.reshape(b * h, d, s), bias, b, h, d, s, block_q, interpret
    ).reshape(b, h, d, -1)[..., :s]


def flash_attention_bias_qkv(qkv: jnp.ndarray, bias: jnp.ndarray,
                             n_heads: int, block_q: int = 512,
                             interpret: bool = False) -> jnp.ndarray:
    """Same kernel, fed the *fused* channels-major qkv tensor
    (B, H*3*D, T) with per-head [q;k;v] interleave (the AttentionBlock
    conv output, arch_utils.py:76-79) — q/k/v are sliced by BlockSpec
    index maps into the same buffer, so no split/copies materialise.
    Returns (B, H*D, T)."""
    b, width, s = qkv.shape
    d = width // (3 * n_heads)
    if not _mosaic_ok() and not interpret:
        from .attention import qkv_attention
        return qkv_attention(qkv, n_heads, bias=bias)
    f = qkv.reshape(b * n_heads * 3, d, s)
    out = _bias_cm_call(f, None, None, bias, b, n_heads, d, s, block_q,
                        interpret, fused=True)
    return out.reshape(b, n_heads * d, -1)[..., :s]


# 2^f on [0, 1): degree-4 Chebyshev power coefficients, rel err 7.3e-6
# (the softmax weights are cast to bf16 anyway — eps ~4e-3)
_EXP2_COEFS = (1.0000072864795251, 0.69293126093373347,
               0.24171032460751829, 0.051666843464985374,
               0.013676524375017769)
_LOG2E = 1.4426950408889634


def _exp2_fast(t: jnp.ndarray) -> jnp.ndarray:
    """2^t for t <= 0 via floor split + degree-4 poly + exponent-bit
    scaling — ~12 VPU ops vs the transcendental builtin, which is the
    dominant VPU cost of an attention kernel at (bq, S) score shapes."""
    t = jnp.maximum(t, -126.0)
    k = jnp.floor(t)
    f = t - k
    acc = jnp.float32(_EXP2_COEFS[-1])
    for c in _EXP2_COEFS[-2::-1]:
        acc = acc * f + jnp.float32(c)
    ki = (k.astype(jnp.int32) + 127) << 23
    return acc * jax.lax.bitcast_convert_type(ki, jnp.float32)


def _attn_bias_vt_kernel(q_ref, k_ref, vt_ref, b_ref, o_ref, *,
                         scale: float, d_out: int, fast_exp: bool,
                         bf16_scores: bool = False,
                         prescaled: bool = False,
                         ones_col: bool = True,
                         ablate: str = ""):
    """Row-major scores with a pre-transposed V: dots live as (bq, S)
    so the softmax reduces over LANES (the fast VPU axis), and the AV
    matmul is MXU-canonical because V arrives as (S, D) — the one
    layout transpose this orientation needs is done OUTSIDE the kernel
    on the tiny (S, D) value tensor (128 KB/head) instead of the 4 MB
    fp32 score block that sank `_attn_bias_kernel`.

    Mosaic lowers elementwise ops over the (bq, S) block through VMEM
    one op at a time (the measured killer of the earlier kernels), so
    the softmax chain is restructured to a minimum of full-block
    passes: the exp is written at V's dtype (half the bytes in bf16
    mode) and the row-sum normaliser comes out of the AV matmul itself
    — V carries an appended ones-column, so softmax normalisation is a
    cheap (bq, 1)-broadcast divide after the MXU instead of an extra
    read+write of the score block."""
    # TTS_FLASH_VT_BF16=1: the score block (the kernel's largest VMEM
    # tensor, bq x S) runs bf16 through the elementwise chain — Mosaic
    # walks these ops one full-block pass at a time, so halving the
    # block bytes halves that traffic.  The MXU accumulator itself must
    # be 32-bit (Mosaic rejects a bf16 matmul acc on real hardware —
    # chip-verified round 5), so the cast happens in the first
    # elementwise pass after the dot.  Numerics precedent: the XLA
    # fallback path already defaults to bf16 scores
    # (ops/attention.qkv_attention, TTS_ATTN_BF16).
    acc_t = jnp.bfloat16 if bf16_scores else jnp.float32
    dots = jax.lax.dot_general(q_ref[0], k_ref[0],
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    # TTS_FLASH_VT_PRESCALE=1 folds 1/sqrt(d) into q OUTSIDE the kernel
    # (XLA fuses it into the qkv producer) — one fewer full-block
    # elementwise pass here; the bias arrives already in the score
    # dtype so its cast is free
    if ablate == "nobias":
        # TTS_FLASH_VT_ABLATE=nobias: cost of the bias tile DMA + add.
        # With prescale the 1/sqrt(d) already rode in on q — scaling
        # again would both double-apply it and reintroduce the
        # elementwise pass prescale removes, corrupting the A/B
        dots = (dots.astype(acc_t) if prescaled
                else dots.astype(acc_t) * acc_t(scale))
    elif prescaled:
        dots = dots.astype(acc_t) + b_ref[0].astype(acc_t)
    else:
        dots = (dots.astype(acc_t) * acc_t(scale)
                + b_ref[0].astype(acc_t))                 # (bq, S)
    if ablate == "nosoftmax":
        # TTS_FLASH_VT_ABLATE=nosoftmax: matmuls + bias only (cast is
        # kept so the AV operand dtype matches the real kernel)
        p = dots.astype(vt_ref.dtype)
    else:
        m = jnp.max(dots, axis=1, keepdims=True)
        if fast_exp:
            p = _exp2_fast((dots - m) * acc_t(_LOG2E)).astype(
                vt_ref.dtype)
        else:
            p = jnp.exp(dots - m).astype(vt_ref.dtype)
    acc = jax.lax.dot_general(p, vt_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if ones_col:
        o = acc[:, :d_out] / acc[:, d_out:d_out + 1]
    else:
        # TTS_FLASH_VT_NOONES=1: V stays (S, d) — the AV matmul does
        # HALF the FLOPs of the 128-lane ones-padded layout; the
        # softmax normaliser comes from an explicit (bq, S) row-sum
        # reduce instead of the appended ones column
        denom = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
        o = acc[:, :d_out] / denom
    o_ref[0] = o.astype(o_ref.dtype)                      # (1, bq, D)


def flash_attention_bias_qkv_vt(qkv: jnp.ndarray, bias: jnp.ndarray,
                                n_heads: int, block_q: int = 1024,
                                interpret: bool = False) -> jnp.ndarray:
    """V-transposed variant of flash_attention_bias_qkv.

    qkv: (B, H*3*D, T) fused channels-major tensor; bias: (H, Tq, S)
    additive bias, already scaled.  Returns (B, H*D, T).

    Grid is (q-blocks, heads, batch) with batch innermost so the bias
    tile's index map is batch-invariant and Pallas re-uses the DMA'd
    tile across the cond-free batch pair (the bias is the largest DMA
    of the kernel at ~1.6 MB/tile)."""
    b, width, s = qkv.shape
    d = width // (3 * n_heads)
    if not _mosaic_ok() and not interpret:
        from .attention import qkv_attention
        return qkv_attention(qkv, n_heads, bias=bias)
    import os as _os
    h = n_heads
    scale = 1.0 / math.sqrt(d)
    sp = -(-s // 128) * 128
    if _os.environ.get("TTS_FLASH_VT_BQ"):      # perf-lab block sweep
        # round DOWN to a lane multiple: a non-128-multiple bq makes
        # the sp rounding and the (1, d, bq) BlockSpecs lane-misaligned
        # (Mosaic compile failure instead of a clean rejection)
        bq = max(min(int(_os.environ["TTS_FLASH_VT_BQ"]), sp), 128)
        bq = max(128, (bq // 128) * 128)
    else:
        bq = sp if sp <= max(block_q, 1024) else max(block_q, 128)
    sp = -(-sp // bq) * bq
    pad = sp - s
    prescale = _os.environ.get("TTS_FLASH_VT_PRESCALE", "0") == "1"
    ones_col = _os.environ.get("TTS_FLASH_VT_NOONES", "0") != "1"
    if prescale:
        # fold 1/sqrt(d) into the q channels outside the kernel: a
        # (width, 1) mask multiply that XLA fuses into the qkv producer
        # — saves one full-block elementwise pass per kernel grid step
        ch = jnp.arange(width) % (3 * d)
        mult = jnp.where(ch < d, jnp.asarray(scale, qkv.dtype),
                         jnp.ones((), qkv.dtype))
        qkv = qkv * mult[None, :, None]
    f = qkv.reshape(b * h * 3, d, s)
    # V transposed outside: (B*H, S, D) — a cheap XLA transpose of the
    # small value tensor; lets the in-kernel AV matmul run canonically.
    # Column d carries the softmax normaliser's ones (see kernel doc);
    # the width is padded to a lane multiple so every tile is aligned.
    # (TTS_FLASH_VT_NOONES=1 keeps V at its dense d lanes instead —
    # half the AV FLOPs, normaliser via an explicit row-sum.)
    vt = jnp.swapaxes(
        qkv.reshape(b, h, 3, d, s)[:, :, 2], -1, -2).reshape(b * h, s, d)
    if ones_col:
        dv = -(-(d + 1) // 128) * 128
        ones = jnp.ones((b * h, s, 1), vt.dtype)
        vt = jnp.concatenate(
            [vt, ones, jnp.zeros((b * h, s, dv - d - 1), vt.dtype)],
            axis=-1)
    else:
        dv = d
    if pad:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, pad)))
        vt = jnp.pad(vt, ((0, 0), (0, pad), (0, 0)))
        # padded KEYS (bias axis 2) masked pre-softmax; padded query
        # rows (axis 1) only need finite values (sliced off after)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad)),
                       constant_values=NEG_INF)
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, 0)))

    import os
    bf16_sc = (os.environ.get("TTS_FLASH_VT_BF16", "0") == "1"
               and qkv.dtype == jnp.bfloat16)
    # head-group default 4: chip-measured win at every working shape
    # (B=16/T=896: 32.28 vs 32.79 ms full denoiser step; B=16/T=640:
    # 21.68 vs 22.42; B=8/T=896: 15.84 vs 16.12).  TTS_FLASH_VT_HG=0
    # reverts to the per-head grid; guards fall back automatically
    # when h % g != 0 or the shape needs query blocking.
    hg = int(os.environ.get("TTS_FLASH_VT_HG", "4"))
    if (hg > 1 and bq == sp and h % hg == 0 and ones_col
            and not prescale
            # measurement knobs below are only implemented by the
            # per-head kernel — routing them through hg would silently
            # measure the full unablated kernel
            and not os.environ.get("TTS_FLASH_VT_ABLATE")
            and os.environ.get("TTS_FLASH_VT_EXP2", "0") != "1"):
        # head-group path: g heads per grid step (see the hg kernel's
        # doc for the chip-measured motivation); requires the single
        # q-block shape (bq == sp), which is every production T
        out = _vt_hg_call(f, vt, bias, b, h, d, dv, sp, hg, scale,
                          bf16_sc, qkv.dtype, interpret)
        out = jnp.swapaxes(out.reshape(b, h, sp, d), -1, -2)
        return out.reshape(b, h * d, sp)[..., :s]
    if (os.environ.get("TTS_FLASH_VT_QT", "0") == "1" and ones_col
            and not prescale
            # the qt kernel implements neither the ablation nor the
            # exp2 measurement knobs — fall through to the per-head
            # kernel rather than silently measuring the full kernel
            # (same guard as the hg path above)
            and not os.environ.get("TTS_FLASH_VT_ABLATE")
            and os.environ.get("TTS_FLASH_VT_EXP2", "0") != "1"):
        # row-major-q path: both matmuls MXU-canonical (see qt kernel)
        qt = jnp.swapaxes(
            qkv.reshape(b, h, 3, d, s)[:, :, 0], -1, -2
        ).reshape(b * h, s, d)
        if pad:
            qt = jnp.pad(qt, ((0, 0), (0, pad), (0, 0)))
        out = _vt_qt_call(qt, f, vt, bias, b, h, d, dv, sp, bq, scale,
                          bf16_sc, qkv.dtype, interpret)
        out = jnp.swapaxes(out.reshape(b, h, sp, d), -1, -2)
        return out.reshape(b, h * d, sp)[..., :s]
    grid = (sp // bq, h, b)
    kernel = functools.partial(
        _attn_bias_vt_kernel, scale=scale, d_out=d,
        fast_exp=os.environ.get("TTS_FLASH_VT_EXP2", "0") == "1",
        bf16_scores=bf16_sc,
        prescaled=prescale, ones_col=ones_col,
        ablate=os.environ.get("TTS_FLASH_VT_ABLATE", ""))
    in_specs = [
        pl.BlockSpec((1, d, bq),
                     lambda j, hi, bi, h=h: (3 * (bi * h + hi), 0, j)),
        pl.BlockSpec((1, d, sp),
                     lambda j, hi, bi, h=h: (3 * (bi * h + hi) + 1, 0, 0)),
        pl.BlockSpec((1, sp, dv),
                     lambda j, hi, bi, h=h: (bi * h + hi, 0, 0)),
        pl.BlockSpec((1, bq, sp), lambda j, hi, bi: (hi, j, 0)),
    ]
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * 2 * sp * sp * d * (b * h),
            transcendentals=sp * sp * b * h,
            bytes_accessed=(3 * b * h * d * sp + h * sp * sp) * 2)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), qkv.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, d),
                               lambda j, hi, bi, h=h: (bi * h + hi, j, 0)),
        interpret=interpret,
        **kwargs,
    )(f, f, vt, bias)
    # (B*H, S, D) -> channels-major (B, H*D, T)
    out = jnp.swapaxes(out.reshape(b, h, sp, d), -1, -2)
    return out.reshape(b, h * d, sp)[..., :s]


def _attn_bias_vt_hg_kernel(f_ref, vt_ref, b_ref, o_ref, *,
                            scale: float, d_out: int, g: int,
                            bf16_scores: bool = False):
    """Head-GROUP variant of the VT kernel: one grid step computes `g`
    heads (static in-kernel loop) instead of one.  The per-head VT
    kernel's grid step costs ~5.6 us against a ~2.3 us MXU floor
    (chip-measured round 5: matmuls+casts are 18.8 of the 19.3 ms
    attention cost at B=16/T=896, bias and softmax are ~free), so the
    fixed per-step overhead is the target: g heads per step cuts grid
    steps g-fold and lets the next head's DMA ride under the current
    head's matmuls.

    f_ref: (3g, D, bq) — g heads' interleaved [q;k;v] channel blocks;
    vt_ref: (g, S, dv); b_ref: (g, bq, S); o_ref: (g, bq, D)."""
    acc_t = jnp.bfloat16 if bf16_scores else jnp.float32
    for j in range(g):
        dots = jax.lax.dot_general(f_ref[3 * j], f_ref[3 * j + 1],
                                   (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dots = (dots.astype(acc_t) * acc_t(scale)
                + b_ref[j].astype(acc_t))                 # (bq, S)
        m = jnp.max(dots, axis=1, keepdims=True)
        p = jnp.exp(dots - m).astype(vt_ref.dtype)
        acc = jax.lax.dot_general(p, vt_ref[j], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o = acc[:, :d_out] / acc[:, d_out:d_out + 1]
        o_ref[j] = o.astype(o_ref.dtype)


def _attn_bias_vt_qt_kernel(qt_ref, k_ref, vt_ref, b_ref, o_ref, *,
                            scale: float, d_out: int,
                            bf16_scores: bool = False):
    """Fully-canonical-matmul variant (TTS_FLASH_VT_QT=1): q arrives
    ROW-major (bq, d) — the qk dot contracts d on q's LANES and k's
    sublanes, the canonical MXU orientation, where the channels-major
    kernel's (d, bq) q forces a transposed-lhs matmul.  The AV dot was
    already canonical.  The q transpose happens OUTSIDE on the tiny
    (S, d) per-head tensor, exactly like V's."""
    acc_t = jnp.bfloat16 if bf16_scores else jnp.float32
    dots = jax.lax.dot_general(qt_ref[0], k_ref[0],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dots = (dots.astype(acc_t) * acc_t(scale)
            + b_ref[0].astype(acc_t))                     # (bq, S)
    m = jnp.max(dots, axis=1, keepdims=True)
    p = jnp.exp(dots - m).astype(vt_ref.dtype)
    acc = jax.lax.dot_general(p, vt_ref[0], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o = acc[:, :d_out] / acc[:, d_out:d_out + 1]
    o_ref[0] = o.astype(o_ref.dtype)                      # (1, bq, D)


def _vt_qt_call(qt, f, vt, bias, b, h, d, dv, sp, bq, scale, bf16_sc,
                dtype, interpret):
    """pallas_call plumbing for the row-major-q VT kernel.

    qt: (B*H, SP, D); f: (B*H*3, D, SP) (k is sliced from it);
    vt: (B*H, SP, DV); bias: (H, SP, SP).  Returns (B*H, SP, D)."""
    grid = (sp // bq, h, b)
    kernel = functools.partial(_attn_bias_vt_qt_kernel, scale=scale,
                               d_out=d, bf16_scores=bf16_sc)
    in_specs = [
        pl.BlockSpec((1, bq, d), lambda j, hi, bi, h=h: (bi * h + hi, j, 0)),
        pl.BlockSpec((1, d, sp),
                     lambda j, hi, bi, h=h: (3 * (bi * h + hi) + 1, 0, 0)),
        pl.BlockSpec((1, sp, dv), lambda j, hi, bi, h=h: (bi * h + hi, 0, 0)),
        pl.BlockSpec((1, bq, sp), lambda j, hi, bi: (hi, j, 0)),
    ]
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * sp * sp * (d + dv) * (b * h),
            transcendentals=sp * sp * b * h,
            bytes_accessed=(4 * b * h * d * sp + h * sp * sp) * 2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, d),
                               lambda j, hi, bi, h=h: (bi * h + hi, j, 0)),
        interpret=interpret,
        **kwargs,
    )(qt, f, vt, bias)


def _vt_hg_call(f, vt, bias, b, h, d, dv, sp, g, scale, bf16_sc,
                dtype, interpret):
    """pallas_call plumbing for the head-group VT kernel.

    f: (B*H*3, D, SP); vt: (B*H, SP, DV); bias: (H, SP, SP).
    Grid (H//g, B) with batch innermost so the g-head bias tile's DMA
    is reused across the batch.  Returns channels-major (B, H*D, SP)."""
    grid = (h // g, b)
    kernel = functools.partial(_attn_bias_vt_hg_kernel, scale=scale,
                               d_out=d, g=g, bf16_scores=bf16_sc)
    in_specs = [
        pl.BlockSpec((3 * g, d, sp),
                     lambda hi, bi, h=h, g=g: (bi * (h // g) + hi, 0, 0)),
        pl.BlockSpec((g, sp, dv),
                     lambda hi, bi, h=h, g=g: (bi * (h // g) + hi, 0, 0)),
        pl.BlockSpec((g, sp, sp), lambda hi, bi: (hi, 0, 0)),
    ]
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * sp * sp * (d + dv) * (b * h),
            transcendentals=sp * sp * b * h,
            bytes_accessed=(3 * b * h * d * sp + h * sp * sp
                            + b * h * sp * dv) * 2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, sp, d), dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (g, sp, d),
            lambda hi, bi, h=h, g=g: (bi * (h // g) + hi, 0, 0)),
        interpret=interpret,
        **kwargs,
    )(f, vt, bias)


def _attn_bias_kq_kernel(q_ref, k_ref, v_ref, bt_ref, o_ref, *,
                         scale: float):
    """Score-TRANSPOSED block: dots live as (S, bq) so both matmuls are
    MXU-native (contraction dim on lhs lanes / rhs sublanes) — the
    (bq, S) orientation of `_attn_bias_kernel` forces Mosaic to
    transpose the 4 MB fp32 softmaxed scores before the AV matmul,
    which measured ~2x the whole XLA attention cost.  bt_ref is the
    (1, S, bq) *transposed* bias tile (built transposed for free from
    the static bucket matrix); softmax reduces over sublanes (S)."""
    dots = jax.lax.dot_general(k_ref[0], q_ref[0],
                               (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    dots = dots * scale + bt_ref[0].astype(jnp.float32)   # (S, bq)
    m = jnp.max(dots, axis=0, keepdims=True)
    e = jnp.exp(dots - m)
    p = (e / jnp.sum(e, axis=0, keepdims=True)).astype(v_ref.dtype)
    o = jax.lax.dot_general(v_ref[0], p, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)                      # (1, D, bq)


def flash_attention_bias_qkv_kq(qkv: jnp.ndarray, bias_t: jnp.ndarray,
                                n_heads: int, block_q: int = 1024,
                                interpret: bool = False) -> jnp.ndarray:
    """Transposed-score variant of flash_attention_bias_qkv.

    qkv: (B, H*3*D, T) fused channels-major tensor; bias_t: (H, S, Tq)
    — the TRANSPOSE of the usual (H, Tq, S) additive bias, already
    scaled.  Returns (B, H*D, T).

    Grid is (q-blocks, heads, batch) with batch innermost so the bias
    tile's index map is batch-invariant and Pallas re-uses the DMA'd
    tile across the batch."""
    b, width, s = qkv.shape
    d = width // (3 * n_heads)
    if not _mosaic_ok() and not interpret:
        from .attention import qkv_attention
        return qkv_attention(qkv, n_heads,
                             bias=jnp.swapaxes(bias_t, 1, 2))
    h = n_heads
    scale = 1.0 / math.sqrt(d)
    sp = -(-s // 128) * 128
    bq = sp if sp <= max(block_q, 1024) else max(block_q, 128)
    sp = -(-sp // bq) * bq
    pad = sp - s
    f = qkv.reshape(b * h * 3, d, s)
    if pad:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, pad)))
        # padded KEYS (axis 1) must be masked out pre-softmax; padded
        # query columns (axis 2) just need finite values (sliced off)
        bias_t = jnp.pad(bias_t, ((0, 0), (0, pad), (0, 0)),
                         constant_values=NEG_INF)
        bias_t = jnp.pad(bias_t, ((0, 0), (0, 0), (0, pad)))

    grid = (sp // bq, h, b)
    kernel = functools.partial(_attn_bias_kq_kernel, scale=scale)
    in_specs = [
        pl.BlockSpec((1, d, bq),
                     lambda j, hi, bi, h=h: (3 * (bi * h + hi), 0, j)),
        pl.BlockSpec((1, d, sp),
                     lambda j, hi, bi, h=h: (3 * (bi * h + hi) + 1, 0, 0)),
        pl.BlockSpec((1, d, sp),
                     lambda j, hi, bi, h=h: (3 * (bi * h + hi) + 2, 0, 0)),
        pl.BlockSpec((1, sp, bq), lambda j, hi, bi: (hi, 0, j)),
    ]
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024)
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * 2 * sp * sp * d * (b * h),
            transcendentals=sp * sp * b * h,
            bytes_accessed=(3 * b * h * d * sp + h * sp * sp) * 2)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, d, sp), qkv.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, d, bq),
                               lambda j, hi, bi, h=h: (bi * h + hi, 0, j)),
        interpret=interpret,
        **kwargs,
    )(f, f, f, bias_t)
    return out.reshape(b, h * d, -1)[..., :s]


def _bias_cm_call(qf, kf, vf, bias, b, h, d, s, block_q, interpret,
                  fused: bool = False):
    scale = 1.0 / math.sqrt(d)
    # one grid step per (batch, head) with the full sequence in VMEM
    # when it fits (dots fp32 sp^2 + bias tile); otherwise block queries.
    sp = -(-s // 128) * 128
    bq = sp if sp <= max(block_q, 1024) else max(block_q, 128)
    sp = -(-sp // bq) * bq
    pad = sp - s
    if pad:
        padw = ((0, 0), (0, 0), (0, pad))
        qf = jnp.pad(qf, padw)
        if not fused:
            kf = jnp.pad(kf, padw)
            vf = jnp.pad(vf, padw)
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)),
                       constant_values=NEG_INF)

    grid = (b * h, sp // bq)
    kernel = functools.partial(_attn_bias_kernel, scale=scale)
    if fused:
        in_specs = [
            pl.BlockSpec((1, d, bq), lambda i, j: (3 * i, 0, j)),
            pl.BlockSpec((1, d, sp), lambda i, j: (3 * i + 1, 0, 0)),
            pl.BlockSpec((1, d, sp), lambda i, j: (3 * i + 2, 0, 0)),
            pl.BlockSpec((1, bq, sp), lambda i, j, h=h: (i % h, j, 0)),
        ]
        args = (qf, qf, qf, bias)
    else:
        in_specs = [
            pl.BlockSpec((1, d, bq), lambda i, j: (i, 0, j)),
            pl.BlockSpec((1, d, sp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, d, sp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, bq, sp), lambda i, j, h=h: (i % h, j, 0)),
        ]
        args = (qf, kf, vf, bias)
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        flops = 2 * 2 * sp * sp * d * (b * h)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"))
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=flops, transcendentals=sp * sp * b * h,
            bytes_accessed=(3 * b * h * d * sp + h * sp * sp) * 2)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, d, sp), qf.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, d, bq), lambda i, j: (i, 0, j)),
        interpret=interpret,
        **kwargs,
    )(*args)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float,
                 causal: bool, block_q: int):
    """One (batch*head, q_block) grid step.

    q_ref: (1, block_q, D); k_ref/v_ref: (1, S, D); mask_ref: (1, 1, S)
    int32 validity of keys; o_ref: (1, block_q, D).
    """
    qi = pl.program_id(1)
    # inputs stay in storage dtype (bf16 on TPU) with fp32 MXU
    # accumulation; pre-casting to fp32 would force the slow multi-pass
    # fp32 MXU mode
    dots = jax.lax.dot_general(q_ref[0], k_ref[0],
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32) * scale
    s = k_ref.shape[1]
    key_ok = mask_ref[0, 0, :] > 0
    valid = jnp.broadcast_to(key_ok[None, :], (block_q, s))
    if causal:
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, s), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, s), 1)
        valid = valid & (k_pos <= q_pos)
    dots = jnp.where(valid, dots, NEG_INF)
    p = jax.nn.softmax(dots, axis=-1).astype(v_ref.dtype)
    o = jax.lax.dot_general(p, v_ref[0], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    key_mask: Optional[jnp.ndarray] = None,
                    causal: bool = True,
                    block_q: int = BLOCK_Q,
                    interpret: bool = False) -> jnp.ndarray:
    """q,k,v: (B, H, S, D) -> (B, H, S, D); key_mask: (B, S) bool."""
    b, h, s, d = q.shape
    if not _mosaic_ok() and not interpret:
        mask = key_mask[:, None, None, :] if key_mask is not None else None
        return mha(q, k, v, mask=mask, causal=causal)

    scale = 1.0 / math.sqrt(d)
    bq = min(block_q, s)
    if s % bq != 0:
        pad = bq - s % bq
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        km = jnp.zeros((b, pad), dtype=bool)
        key_mask = (jnp.concatenate([key_mask, km], 1)
                    if key_mask is not None else
                    jnp.concatenate([jnp.ones((b, s), bool), km], 1))
        s_p = s + pad
    else:
        s_p = s
        if key_mask is None:
            key_mask = jnp.ones((b, s), dtype=bool)

    qf = q.reshape(b * h, s_p, d)
    kf = k.reshape(b * h, s_p, d)
    vf = v.reshape(b * h, s_p, d)
    # (B*H, 1, S): keep the mask 3D so its block shape meets the TPU
    # (sublane, lane) tiling rules (last two dims equal the array dims)
    maskf = jnp.repeat(key_mask.astype(jnp.int32), h, axis=0)[:, None, :]

    grid = (b * h, s_p // bq)
    kernel = functools.partial(_attn_kernel, scale=scale, causal=causal,
                               block_q=bq)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, s_p, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, s_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, s_p, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, s_p), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out.reshape(b, h, s_p, d)[:, :, :s]
