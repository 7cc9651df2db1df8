"""Pallas TPU kernel: single-step decode attention over the stacked
KV cache.

Chip-measured round 4 (tools/perf_lab.py decodebatch): at batch 8 the
XLA decode step spends **0.99 of its 1.75 ms/token in attention** (the
GEMV weight streaming is 0.77; sampling is ~0.03).  Two structural
costs in the XLA path:

1. it reads the FULL fixed (S,) cache row every step and masks — at
   B=8, S=268 that is ~260 MB/token of K/V traffic although the valid
   prefix averages ~half of S over a 200-token decode;
2. the per-layer ``dynamic_index_in_dim`` on the stacked (L,B,H,S,Dh)
   carry plus the separate QK/mask/softmax/AV ops cost extra HBM
   round-trips at GEMV-sized shapes.

This kernel reads K/V **only up to the decode position**: the grid
walks S in ``block_s`` chunks and the BlockSpec index map CLAMPS the
block index at ``pos // block_s`` — Pallas skips the re-DMA when
consecutive grid steps map to the same block, and ``pl.when`` skips
the compute, so blocks past the position cost nothing.  The layer is
selected from the full stacked cache by a scalar-prefetched index
(same pattern as ops/pallas_gemv), avoiding the sliced-operand copy.

Numerics match ops/attention.mha at decode shapes: fp32 scores
(q·k / sqrt(Dh)), fp32 online softmax + accumulation, cast to the
query dtype on write.

No custom_vjp on purpose: the decode step is inference-only (the
training forward uses the full-sequence trunk attention) — this kernel
is never differentiated.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pallas TPU backend only exists on TPU builds
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PLTPU = True
except ImportError:  # pragma: no cover
    pltpu = None
    _HAS_PLTPU = False

_NEG = -1e30


def _mosaic_ok() -> bool:
    return _HAS_PLTPU and jax.default_backend() == "tpu"


def _fd_kernel(idx_ref, q_ref, k_ref, v_ref, m3_ref, o_ref,
               m_ref, l_ref, acc_ref, *, block_s: int, scale: float):
    """One (batch row, S-block) grid step of online-softmax decode
    attention.  q_ref: (1, H, Dh); k/v_ref: (1, 1, H, bs, Dh);
    m3_ref: (1, 1, bs) fp32 prefix-validity; o_ref: (1, H, Dh);
    scratch m/l: (H, 128) fp32 (value broadcast across lanes),
    acc: (H, Dh) fp32."""
    i = pl.program_id(1)
    pos = idx_ref[1]
    pos_blk = pos // block_s

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(i <= pos_blk)
    def _block():
        q = q_ref[0].astype(jnp.float32)                 # (H, Dh)
        k = k_ref[0, 0].astype(jnp.float32)              # (H, bs, Dh)
        s = jnp.sum(k * q[:, None, :], axis=-1) * scale  # (H, bs)
        posn = i * block_s + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_s), 1)                  # (1, bs)
        # mask rides as fp32: Mosaic has no int8 vector compare
        valid = (posn <= pos) & (m3_ref[0] > 0.5)        # (1, bs)
        s = jnp.where(valid, s, _NEG)

        m_old = m_ref[:, :1]                             # (H, 1)
        m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m_old - m_new)                   # (H, 1)
        p = jnp.exp(s - m_new)                           # (H, bs)
        p = jnp.where(valid, p, 0.0)
        l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        v = v_ref[0, 0].astype(jnp.float32)              # (H, bs, Dh)
        pv = jnp.sum(p[:, :, None] * v, axis=1)          # (H, Dh)
        acc_new = acc_ref[...] * alpha + pv

        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
        acc_ref[...] = acc_new
        o_ref[0] = (acc_new / l_new).astype(o_ref.dtype)


def flash_decode_stacked(q: jnp.ndarray, ck: jnp.ndarray, cv: jnp.ndarray,
                         li, pos, key_mask: jnp.ndarray,
                         block_s: int = 128,
                         interpret: bool = False) -> jnp.ndarray:
    """Decode attention against layer ``li`` of the stacked cache.

    q: (B, H, Dh) current-step queries; ck/cv: (L, B, H, S, Dh) with S a
    multiple of ``block_s`` (decode_start pads the cache); li/pos traced
    scalars; key_mask: (B, S) bool/int8 prefix validity (text padding).
    Returns (B, H, Dh) in q.dtype — softmax(q·k[:pos+1]/sqrt(Dh))·v.
    """
    b, h, dh = q.shape
    L, _, _, s, _ = ck.shape
    scale = 1.0 / math.sqrt(dh)
    if (not _HAS_PLTPU or (not _mosaic_ok() and not interpret)
            or s % block_s):
        # XLA fallback — identical math on the masked full row
        kc = jax.lax.dynamic_index_in_dim(ck, li, 0, keepdims=False)
        vc = jax.lax.dynamic_index_in_dim(cv, li, 0, keepdims=False)
        valid = (key_mask > 0) & (jnp.arange(s)[None, :] <= pos)
        from .attention import mha
        return mha(q[:, :, None], kc, vc,
                   mask=valid[:, None, None, :])[:, :, 0]

    m3 = key_mask.astype(jnp.float32).reshape(b, 1, s)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, s // block_s),
        in_specs=[
            pl.BlockSpec((1, h, dh), lambda bb, i, sref: (bb, 0, 0)),
            pl.BlockSpec((1, 1, h, block_s, dh),
                         lambda bb, i, sref, bs=block_s: (
                             sref[0], bb, 0,
                             jnp.minimum(i, sref[1] // bs), 0)),
            pl.BlockSpec((1, 1, h, block_s, dh),
                         lambda bb, i, sref, bs=block_s: (
                             sref[0], bb, 0,
                             jnp.minimum(i, sref[1] // bs), 0)),
            pl.BlockSpec((1, 1, block_s),
                         lambda bb, i, sref, bs=block_s: (
                             bb, 0, jnp.minimum(i, sref[1] // bs))),
        ],
        out_specs=pl.BlockSpec((1, h, dh), lambda bb, i, sref: (bb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, 128), jnp.float32),
            pltpu.VMEM((h, dh), jnp.float32),
        ],
    )
    kernel = functools.partial(_fd_kernel, block_s=block_s, scale=scale)
    scalars = jnp.stack([jnp.asarray(li, jnp.int32),
                         jnp.asarray(pos, jnp.int32)])
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, dh), q.dtype),
        interpret=interpret,
    )(scalars, q, ck, cv, m3)
