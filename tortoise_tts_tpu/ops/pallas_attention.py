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

from .attention import NEG_INF, mha

BLOCK_Q = 256


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale: float,
                 causal: bool, block_q: int):
    """One (batch*head, q_block) grid step.

    q_ref: (1, block_q, D); k_ref/v_ref: (1, S, D); mask_ref: (1, 1, S)
    int32 validity of keys; o_ref: (1, block_q, D).
    """
    qi = pl.program_id(1)
    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    dots = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    s = k.shape[0]
    key_ok = mask_ref[0, 0, :] > 0
    valid = jnp.broadcast_to(key_ok[None, :], (block_q, s))
    if causal:
        q_pos = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, s), 0)
        k_pos = jax.lax.broadcasted_iota(jnp.int32, (block_q, s), 1)
        valid = valid & (k_pos <= q_pos)
    dots = jnp.where(valid, dots, NEG_INF)
    p = jax.nn.softmax(dots, axis=-1)
    o = jax.lax.dot_general(p, v_ref[0].astype(jnp.float32),
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    key_mask: Optional[jnp.ndarray] = None,
                    causal: bool = True,
                    block_q: int = BLOCK_Q,
                    interpret: bool = False) -> jnp.ndarray:
    """q,k,v: (B, H, S, D) -> (B, H, S, D); key_mask: (B, S) bool."""
    b, h, s, d = q.shape
    if not _HAS_PLTPU and not interpret:
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
