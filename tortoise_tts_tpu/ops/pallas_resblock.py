"""Pallas TPU kernels for the diffusion denoiser's timestep resblock.

The reference resblock (diffusion.py:172-232, use_scale_shift_norm with
the efficient-config 1x1 in_conv) is

    h = conv1x1(silu(groupnorm(x)))
    h = groupnorm(h) * (1 + scale) + shift        # scale/shift from emb
    y = x + conv3(silu(h))

As XLA ops each groupnorm/silu/conv round-trips the (B, C, T) tensor
through HBM (~6 array passes per resblock at B=2, C=1024, T~900); the
measured resblock cost is ~131 us vs a ~75 us MXU FLOP roof.  These two
kernels keep everything VMEM-resident per batch row: group statistics
via tiny (G, C) selection matmuls (no layout-hostile reshapes), the 1x1
conv as one canonical (C, C) x (C, T) MXU matmul, and the k=3 conv as
three shifted matmuls against an in-VMEM zero-padded activation.

Two kernels instead of one keep peak VMEM under the ~16 MB/core budget
(weights 2 MB + 6 MB bf16 live across grid steps with constant index
maps, so they are DMA'd once per call, not per batch row).

Numerics follow models/common.group_norm: fp32 statistics and
normalization, cast to the storage dtype BEFORE the silu (matching the
XLA path exactly in fp32; within one bf16 rounding of it in bf16),
fp32 MXU accumulation for both convs.

Opt-in via TTS_FUSED_RESBLOCK=1 (models/diffusion._ts_res_block).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend only exists on TPU builds
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False


def _group_stats(xf, groups: int, eps: float):
    """xf: (C, T) fp32 -> per-row (mu, rstd) (C, 1) for GroupNorm.

    Group reductions run as (G, C) x (C, 1) selection matmuls — a
    sublane reshape to (G, C//G, T) is layout-hostile in Mosaic, while
    the selection matmul is exact 0/1 arithmetic on the MXU."""
    c, t = xf.shape
    per = c // groups
    row = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1)
    sel = (col // per == row).astype(jnp.float32)        # (G, C)
    s1 = jnp.sum(xf, axis=1, keepdims=True)              # (C, 1)
    s2 = jnp.sum(xf * xf, axis=1, keepdims=True)
    n = jnp.float32(per * t)
    g1 = jax.lax.dot_general(sel, s1, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / n
    g2 = jax.lax.dot_general(sel, s2, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) / n
    var = g2 - g1 * g1
    rstd = jax.lax.rsqrt(var + eps)                      # (G, 1)
    # scatter back to rows: (C, G) x (G, 1)
    mu = jax.lax.dot_general(sel, g1, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    rs = jax.lax.dot_general(sel, rstd, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    return mu, rs


def _gn_conv_kernel(x_ref, g_ref, b_ref, w_ref, wb_ref, o_ref, *,
                    groups: int, eps: float, act: bool):
    """conv1x1(act(groupnorm(x))) with the output channels blocked.
    x_ref: (1, C, T); g_ref/b_ref: (C, 1) fp32 affine;
    w_ref: (bn, C) [out-block, in]; wb_ref: (bn, 1) fp32; act: silu.
    Group stats are recomputed per output block — 2 cheap VPU passes
    vs holding a (c_out, T) block and the full weight in VMEM at once.
    """
    x = x_ref[0]
    xf = x.astype(jnp.float32)
    mu, rs = _group_stats(xf, groups, eps)
    y = ((xf - mu) * rs * g_ref[...] + b_ref[...]).astype(x.dtype)
    if act:
        # silu: sigmoid at fp32 (Mosaic rejects jax.nn.sigmoid on bf16
        # vectors — the 1.0 literal broadcasts as f32 -> vector<bf16>),
        # product at dt; one dt rounding from a pure-dt silu.
        y = y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(x.dtype)
    acc = jax.lax.dot_general(w_ref[...].astype(x.dtype), y,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = (acc + wb_ref[...]).astype(o_ref.dtype)


def fused_gn_conv1x1(p_norm, p_conv, x: jnp.ndarray, groups: int,
                     act: bool, eps: float = 1e-5, block_n: int = 1024,
                     interpret: bool = False):
    """conv1x1(act?(groupnorm(x))) — the [norm + qkv-conv] head of the
    denoiser AttentionBlock (act=False) and the resblock input half
    (act=True).  x: (B, C, T) -> (B, C_out, T); returns None off-TPU
    or for unaligned shapes (caller falls back to XLA)."""
    b, c, t = x.shape
    c_out = p_conv["w"].shape[0]
    if ((not _HAS_PLTPU and not interpret) or c % 128 or t % 128
            or c_out % min(block_n, c_out)):
        return None
    import os as _os
    if _os.environ.get("TTS_RB_BLOCK"):
        # escape hatch for scheduler-dependent scoped-VMEM compile
        # OOMs: at (c_out=3072, T=896, bn=1024) Mosaic accounts
        # ~18.45 MB against the 16 MB limit, and the SAME shape can
        # pass in one surrounding program and fail in another
        # (chip-observed in a perf-lab ablation, round 4).  Production
        # shapes compile at the default; set TTS_RB_BLOCK=512 if a
        # custom config hits the OOM.
        block_n = int(_os.environ["TTS_RB_BLOCK"])
        if c_out % min(block_n, c_out):
            return None
    bn = min(block_n, c_out)
    dt = x.dtype
    g = jnp.asarray(p_norm["scale"], jnp.float32).reshape(c, 1)
    bb = jnp.asarray(p_norm["bias"], jnp.float32).reshape(c, 1)
    w = p_conv["w"][:, :, 0]                             # (C_out, C)
    wb = jnp.asarray(p_conv.get(
        "b", jnp.zeros((c_out,))), jnp.float32).reshape(c_out, 1)
    kern = functools.partial(_gn_conv_kernel, groups=groups, eps=eps,
                             act=act)
    return pl.pallas_call(
        kern,
        grid=(b, c_out // bn),
        in_specs=[
            pl.BlockSpec((1, c, t), lambda bi, j: (bi, 0, 0)),
            pl.BlockSpec((c, 1), lambda bi, j: (0, 0)),
            pl.BlockSpec((c, 1), lambda bi, j: (0, 0)),
            pl.BlockSpec((bn, c), lambda bi, j: (j, 0)),
            pl.BlockSpec((bn, 1), lambda bi, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((1, bn, t), lambda bi, j: (bi, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, c_out, t), dt),
        interpret=interpret,
    )(x, g, bb, w, wb)


def _rb_out_kernel(h_ref, x_ref, g_ref, b_ref, sc_ref, sh_ref, w_ref,
                   wb_ref, o_ref, *, groups: int, eps: float):
    """y = x + conv3(silu(groupnorm(h) * (1+scale) + shift)).
    h_ref/x_ref: (1, C, T); sc_ref/sh_ref: (1, C, 1) per-batch emb
    scale/shift; w_ref: (C, 3C) = [W(-1) | W(0) | W(+1)] tap blocks;
    wb_ref: (C, 1)."""
    h = h_ref[0]
    c, t = h.shape
    hf = h.astype(jnp.float32)
    mu, rs = _group_stats(hf, groups, eps)
    yn = (hf - mu) * rs * g_ref[...] + b_ref[...]
    yn = yn * (1.0 + sc_ref[0]) + sh_ref[0]
    yb = yn.astype(h.dtype)
    a = yb * jax.nn.sigmoid(yb.astype(jnp.float32)).astype(h.dtype)
    ap = jnp.pad(a, ((0, 0), (1, 1)))                    # zero pad T+2
    w = w_ref[...].astype(h.dtype)
    acc = None
    for s in range(3):
        ws = jax.lax.slice_in_dim(w, s * c, (s + 1) * c, axis=1)
        xs = jax.lax.slice_in_dim(ap, s, s + t, axis=1)
        d = jax.lax.dot_general(ws, xs, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    out = acc + wb_ref[...] + x_ref[0].astype(jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _bspec(shape, const=False):
    if const:
        return pl.BlockSpec(shape, lambda bi: (0,) * len(shape))
    return pl.BlockSpec(shape, lambda bi: (bi,) + (0,) * (len(shape) - 1))


def fused_ts_res_block(p, x: jnp.ndarray, emb_out: jnp.ndarray,
                       groups: int, eps: float = 1e-5,
                       interpret: bool = False) -> jnp.ndarray:
    """VMEM-fused timestep resblock.  p: the _ts_res_block param dict;
    x: (B, C, T); emb_out: (B, 2C) = linear(emb params, silu(emb))
    computed outside (it is tiny and per-step).  Returns (B, C, T)."""
    b, c, t = x.shape
    if (not _HAS_PLTPU and not interpret) or c % 128 or t % 128:
        return None  # caller falls back to the XLA path

    dt = x.dtype
    h = fused_gn_conv1x1(p["in_norm"], p["in_conv"], x, groups,
                         act=True, eps=eps, interpret=interpret)
    if h is None:
        # the inner kernel has an extra alignment guard (c_out % block);
        # engage the caller's full XLA fallback rather than crash
        return None

    # The out kernel holds the (C, 3C) tap matrix + fp32 temps for a
    # (C, T) row per grid step, and Mosaic's scoped-VMEM accounting
    # grows with the batch grid: chip-measured compile OOMs at
    # (16, 1024, 896) = 18.6 MB and (8, 1024, 1024) ≈ 20 MB vs the
    # 16 MB limit, while the production single-stream shapes
    # (B<=2 cond-free pair, T<=1024) compile and win (~4%/step).
    # Outside that validated envelope run the fused in-half + XLA
    # out-half.
    if not (b <= 2 and t <= 1024):
        from ..models.common import conv1d, group_norm, silu
        scale, shift = jnp.split(emb_out[..., None], 2, axis=1)
        hx = group_norm(p["out_norm"], h, groups) * (1 + scale) + shift
        hx = silu(hx)
        return x + conv1d(p["out_conv"], hx, padding=1)

    scale = emb_out[:, :c].astype(jnp.float32).reshape(b, c, 1)
    shift = emb_out[:, c:].astype(jnp.float32).reshape(b, c, 1)
    g2 = jnp.asarray(p["out_norm"]["scale"], jnp.float32).reshape(c, 1)
    b2 = jnp.asarray(p["out_norm"]["bias"], jnp.float32).reshape(c, 1)
    # (C, C, 3) -> (C, 3C) tap blocks [W(-1) | W(0) | W(+1)]
    w3 = jnp.concatenate([p["out_conv"]["w"][:, :, s] for s in range(3)],
                         axis=1)
    wb3 = jnp.asarray(p["out_conv"].get(
        "b", jnp.zeros((c,))), jnp.float32).reshape(c, 1)
    kern2 = functools.partial(_rb_out_kernel, groups=groups, eps=eps)
    return pl.pallas_call(
        kern2,
        grid=(b,),
        in_specs=[_bspec((1, c, t)), _bspec((1, c, t)),
                  _bspec((c, 1), True), _bspec((c, 1), True),
                  _bspec((1, c, 1)), _bspec((1, c, 1)),
                  _bspec((c, 3 * c), True), _bspec((c, 1), True)],
        out_specs=_bspec((1, c, t)),
        out_shape=jax.ShapeDtypeStruct((b, c, t), dt),
        interpret=interpret,
    )(h, x, g2, b2, scale, shift, w3, wb3)
