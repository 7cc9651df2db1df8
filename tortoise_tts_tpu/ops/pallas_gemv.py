"""Pallas TPU kernel: quantized GEMVs for the AR decode loop.

The decode step is HBM-bound on weight streaming (~378 MB of int8 per
token across the 30-layer GPT trunk).  Two problems with expressing the
dequantised GEMV in plain XLA from inside the layer scan:

1. ``jnp.dot(x, wq.astype(bf16))`` can materialise the int8->bf16
   convert as its own fusion at GEMV shapes, doubling streamed bytes.
2. a custom call (or any kernel) fed by a scan-sliced ``(L, K, N)``
   weight forces an HBM->HBM copy of the slice first — tripling traffic.

``qgemv_stacked`` fixes both: the kernel sees the FULL stacked int8
weight in HBM and uses a scalar-prefetched layer index in its BlockSpec
index map, so each grid step DMAs exactly one (K, block_n) int8 tile
into VMEM and dequantises in-register before the MXU dot.

``qgemv_stacked_w8a8`` additionally quantizes the activation row-wise
to int8 IN-KERNEL and runs the dot on the int8 MXU (2x rate, no
int8->bf16 convert — the convert is the measured compute floor of the
weight-only kernel, ~0.3 ms/token of VPU work).

Both kernels optionally fuse the preceding LayerNorm (``ln=(gamma,
beta)`` stacked (L, K)): the decode layer otherwise dispatches ~60
tiny LN op-chains per token between kernel calls.

Numerics match ``unified_voice._qlinear`` / ``common.layer_norm``:
fp32 normalization and accumulation, bf16 multiplicands in weight-only
mode, cast back to the activation dtype.
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

_LN_EPS = 1e-5


def _ln_f32(xf, g, b):
    """LayerNorm over lanes, fp32 in/out (common.layer_norm math)."""
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
    return (xf - mu) * jax.lax.rsqrt(var + _LN_EPS) * g + b


def _gemv_body(x_ref, g_ref, b_ref, w_ref, s_ref, bias_ref, o_ref,
               w8a8: bool):
    xf = x_ref[...].astype(jnp.float32)
    if g_ref is not None:
        xf = _ln_f32(xf, g_ref[0], b_ref[0])
    if w8a8:
        sx = jnp.max(jnp.abs(xf), axis=1, keepdims=True) / 127.0 + 1e-12
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, w_ref[0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)             # (M, bn)
        acc = acc.astype(jnp.float32) * sx * s_ref[0]
    else:
        xd = xf.astype(o_ref.dtype)
        w = w_ref[0].astype(o_ref.dtype)                  # (K, bn)
        acc = jax.lax.dot_general(
            xd, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (M, bn)
        acc = acc * s_ref[0]
    o_ref[...] = (acc + bias_ref[0]).astype(o_ref.dtype)


def _qgemv_kernel(idx_ref, x_ref, w_ref, s_ref, b_ref, o_ref, *,
                  w8a8: bool):
    del idx_ref  # consumed by the index maps
    _gemv_body(x_ref, None, None, w_ref, s_ref, b_ref, o_ref, w8a8)


def _qgemv_ln_kernel(idx_ref, x_ref, g_ref, bl_ref, w_ref, s_ref,
                     b_ref, o_ref, *, w8a8: bool):
    del idx_ref
    _gemv_body(x_ref, g_ref, bl_ref, w_ref, s_ref, b_ref, o_ref, w8a8)


def _stacked_call(acts, wq, s, b, li, bn, out_dtype, interpret: bool,
                  ln=None, w8a8: bool = False):
    """Shared PrefetchScalarGridSpec plumbing for the stacked GEMV
    kernels: `acts` are the per-call activation operands (full-block,
    grid-invariant); weight/scale/bias (and optional stacked LayerNorm
    gamma/beta) tiles are selected by the scalar-prefetched layer
    index, with a 1-layer bias broadcast when the bias is shared."""
    m = acts[0].shape[0]
    L, k, n = wq.shape
    s3 = s.reshape(L, 1, n).astype(jnp.float32)
    if b is None:
        b3 = jnp.zeros((1, 1, n), jnp.float32)
    elif b.ndim == 1:
        b3 = b.reshape(1, 1, n).astype(jnp.float32)
    else:
        b3 = b.reshape(L, 1, n).astype(jnp.float32)
    lb = b3.shape[0]

    ln_ops, ln_specs = (), []
    kernel = functools.partial(_qgemv_kernel, w8a8=w8a8)
    if ln is not None:
        g, bl = ln
        # (L, 1, K) with a (1, 1, K) block: the last two block dims
        # EQUAL the array dims, satisfying Mosaic's last-two-dims rule
        # (a (1, K) block on (L, K) does not — 1 is neither divisible
        # by 8 nor equal to L).
        ln_ops = (g.astype(jnp.float32).reshape(L, 1, k),
                  bl.astype(jnp.float32).reshape(L, 1, k))
        ln_specs = [pl.BlockSpec((1, 1, k), lambda i, sref: (sref[0], 0, 0)),
                    pl.BlockSpec((1, 1, k), lambda i, sref: (sref[0], 0, 0))]
        kernel = functools.partial(_qgemv_ln_kernel, w8a8=w8a8)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bn,),
        in_specs=[pl.BlockSpec(a.shape, lambda i, sref: (0, 0))
                  for a in acts] + ln_specs + [
            pl.BlockSpec((1, k, bn), lambda i, sref: (sref[0], 0, i)),
            pl.BlockSpec((1, 1, bn), lambda i, sref: (sref[0], 0, i)),
            pl.BlockSpec((1, 1, bn),
                         lambda i, sref, lb=lb: (
                             jnp.minimum(sref[0], lb - 1), 0, i)),
        ],
        out_specs=pl.BlockSpec((m, bn), lambda i, sref: (0, i)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        interpret=interpret,
    )(jnp.asarray(li, jnp.int32).reshape(1), *acts, *ln_ops, wq, s3, b3)


def _ln_xla(x, ln, li):
    if ln is None:
        return x
    g, b = ln
    xf = x.astype(jnp.float32)
    return _ln_f32(xf, g[li].astype(jnp.float32),
                   b[li].astype(jnp.float32)).astype(x.dtype)


def qgemv_stacked(x: jnp.ndarray, wq: jnp.ndarray, s: jnp.ndarray,
                  b: jnp.ndarray | None, li, block_n: int = 512,
                  interpret: bool = False, ln=None) -> jnp.ndarray:
    """Dequantised GEMV against layer ``li`` of a stacked weight.

    x: (M, K) activations (M small); wq: (L, K, N) int8;
    s: (L, N) fp32 per-channel scales; b: optional (L, N) or (N,) fp32
    bias; li: traced scalar layer index; ln: optional stacked
    ((L, K) gamma, (L, K) beta) LayerNorm fused ahead of the dot.
    Returns (M, N) in x.dtype.
    """
    m, k = x.shape
    L, _, n = wq.shape
    bn = min(block_n, n)
    on_tpu = _HAS_PLTPU and jax.default_backend() == "tpu"
    if (not on_tpu and not interpret) or n % bn or k % 128:
        xn = _ln_xla(x, ln, li)
        w = wq[li]
        y = jnp.dot(xn, w.astype(x.dtype),
                    preferred_element_type=jnp.float32) * s[li]
        if b is not None:
            y = y + (b[li] if b.ndim == 2 else b)
        return y.astype(x.dtype)

    return _stacked_call((x,), wq, s, b, li, bn, x.dtype, interpret,
                         ln=ln)


def quantize_rowwise(x: jnp.ndarray):
    """Symmetric per-row int8 quantization of activations (W8A8 decode).
    x: (M, K) -> (int8 (M, K), fp32 (M, 1) scales)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=1,
                keepdims=True) / 127.0 + 1e-12
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return q.astype(jnp.int8), s


def qgemv_stacked_w8a8(x: jnp.ndarray, wq: jnp.ndarray, s: jnp.ndarray,
                       b: jnp.ndarray | None, li, block_n: int = 512,
                       interpret: bool = False,
                       force_xla: bool = False, ln=None) -> jnp.ndarray:
    """W8A8 variant of qgemv_stacked: dynamic per-row activation
    quantization (in-kernel) + int8 MXU matmul (2x int8 MXU rate, no
    in-kernel dequant convert).  Adds activation-quantization noise on
    top of the weight-only error — opt-in via
    ``Config.inference.decode_quant="w8a8"``.
    """
    m, k = x.shape
    L, _, n = wq.shape
    bn = min(block_n, n)
    on_tpu = _HAS_PLTPU and jax.default_backend() == "tpu"
    if force_xla or (not on_tpu and not interpret) or n % bn or k % 128:
        xq, sx = quantize_rowwise(_ln_xla(x, ln, li))
        y = jax.lax.dot_general(
            xq.astype(jnp.int32), wq[li].astype(jnp.int32),
            (((1,), (0,)), ((), ()))).astype(jnp.float32) * sx * s[li]
        if b is not None:
            y = y + (b[li] if b.ndim == 2 else b)
        return y.astype(x.dtype)

    return _stacked_call((x,), wq, s, b, li, bn, x.dtype, interpret,
                         ln=ln, w8a8=True)
