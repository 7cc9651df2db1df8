"""Pallas TPU kernel for BigVGAN's anti-aliased Snake activation.

The reference Activation1d (bigvgan.py:158-271) is up2 (k=12 kaiser
FIR, 2x zero-stuff) -> snake -> down2 (k=12 kaiser FIR, stride 2).  As
plain XLA ops the 2x-upsampled intermediate and the FIR framings round-
trip HBM ~6x per activation, and the generator runs 109 activations per
utterance — the resamplers alone measured ~110 ms of a 179 ms BigVGAN
pass at T=896 mel frames.

This kernel evaluates the whole chain in VMEM in one pass using the
polyphase form over even/odd streams of the upsampled signal u
(E[t]=u[2t], O[t]=u[2t+1]; f = g = kaiser_sinc_filter(0.25, 0.3, 12)):

    E[t] = 2*(f1 x[t+2] + f3 x[t+1] + f5 x[t]
              + f7 x[t-1] + f9 x[t-2] + f11 x[t-3])
    O[t] = 2*(f0 x[t+3] + f2 x[t+2] + f4 x[t+1]
              + f6 x[t]  + f8 x[t-1] + f10 x[t-2])
    s(v) = v + inv_b * sin(a*v)^2            (applied to E and O)
    y[t] = g1 E[t-2] + g3 E[t-1] + g5 E[t] + g7 E[t+1]
         + g9 E[t+2] + g11 E[t+3]
         + g0 O[t-3] + g2 O[t-2] + g4 O[t-1] + g6 O[t]
         + g8 O[t+1] + g10 O[t+2]

so HBM traffic is one read + one write of (B, C, T).  The reference
edge-pads the *interleaved* stream v (v[0] replicated on the left,
v[2T-1] on the right), which per-stream shifts cannot express; the
three boundary columns on each side are recomputed exactly in-kernel
from the same E/O values.

Numerics: FIR taps and snake run in fp32 regardless of storage dtype
(the taps sum to 1; bf16 accumulation would cost ~2 decimal digits).
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


# sin^2(y) = u * P(u), u = frac(y/pi)^2 — degree-5 Chebyshev-fit power
# coefficients on u in [0, 1/4]; max abs error 6.8e-8 (fp64 fit) /
# ~2e-5 fp32 end-to-end at |y|~300 (range-reduction rounding), both far
# below the bf16 output resolution the vocoder stores.  The VPU's sin
# builtin is the measured floor of the MXU snake kernel (~1 G evals per
# utterance at the anti-aliased 2x rate); this runs in ~12 VPU ops.
_SIN2_COEFS = (9.8696043382019916, -32.469677318903273,
               42.727418959476246, -30.104237594895572,
               13.063995181790219, -3.3807205885122107)


def _sin2(y: jnp.ndarray) -> jnp.ndarray:
    """sin(y)^2 via range-reduced even polynomial — chip-validated
    default (BigVGAN 896 frames: 128.8 ms vs 152.6 ms exact on v5e);
    TTS_SNAKE_SIN=exact reverts to the transcendental."""
    import os
    if os.environ.get("TTS_SNAKE_SIN", "poly") == "exact":
        return jnp.square(jnp.sin(y))
    z = y * jnp.float32(1.0 / math.pi)
    fr = z - jnp.round(z)
    u = fr * fr
    acc = jnp.float32(_SIN2_COEFS[-1])
    for c in _SIN2_COEFS[-2::-1]:
        acc = acc * u + jnp.float32(c)
    return u * acc


def _snake_kernel(c_ref, r_ref, ab_ref, o_ref, *, block: int, T: int,
                  f: tuple, patches: dict):
    """c_ref/r_ref: (R, block) current / next column-block of the padded
    input (halo comes from the first lanes of the next block); ab_ref:
    (R, 2) fp32 [exp'd alpha, 1/(beta+eps)]; o_ref: (R, block)."""
    buf = jnp.concatenate([c_ref[...], r_ref[:, :128]], axis=1)
    buf = buf.astype(jnp.float32)
    a = ab_ref[:, 0:1]
    inv_b = ab_ref[:, 1:2]
    W = block + 6

    def tap(k, off):
        return f[k] * jax.lax.slice_in_dim(buf, off, off + W, axis=1)

    # E_w[u] / O_w[u] = E/O at global t = i*block - 3 + u; x[t+s] lives
    # at buf[:, u + 3 + s]
    E = 2.0 * (tap(1, 5) + tap(3, 4) + tap(5, 3)
               + tap(7, 2) + tap(9, 1) + tap(11, 0))
    O = 2.0 * (tap(0, 6) + tap(2, 5) + tap(4, 4)
               + tap(6, 3) + tap(8, 2) + tap(10, 1))
    E = E + inv_b * _sin2(E * a)
    O = O + inv_b * _sin2(O * a)

    def down(src, k, off):
        return f[k] * jax.lax.slice_in_dim(src, off, off + block, axis=1)

    # y[i*block + v] reads E[t+s] at E[:, v + s + 3] (s in -2..3) and
    # O[t+s] at O[:, v + s + 3] (s in -3..2)
    y = (down(E, 1, 1) + down(E, 3, 2) + down(E, 5, 3)
         + down(E, 7, 4) + down(E, 9, 5) + down(E, 11, 6)
         + down(O, 0, 0) + down(O, 2, 1) + down(O, 4, 2)
         + down(O, 6, 3) + down(O, 8, 4) + down(O, 10, 5))
    o_ref[...] = y.astype(o_ref.dtype)

    # Exact boundary columns (reference pads interleaved v with edge
    # values).  `patches` maps block-index -> list of global columns.
    i = pl.program_id(1)
    for ib, cols in patches.items():
        @pl.when(i == ib)
        def _(cols=cols, ib=ib):
            for t in cols:
                acc = None
                for k in range(12):
                    j = min(max(2 * t + k - 5, 0), 2 * T - 1)
                    u = j // 2 - ib * block + 3
                    src = E if j % 2 == 0 else O
                    term = f[k] * src[:, u]
                    acc = term if acc is None else acc + term
                o_ref[:, t - ib * block] = acc.astype(o_ref.dtype)


def _snake_kernel_mxu(c_ref, r_ref, ab_ref, mu_ref, me_ref, mo_ref,
                      o_ref, *, block: int, T: int, f: tuple,
                      patches: dict):
    """MXU variant: the 24 FIR taps run as 128-aligned group frames
    times static band matrices instead of lane-shifted VPU sums — the
    VPU kernel is compute-bound on its misaligned slice taps (~1 ms per
    activation); here only the snake transcendentals stay on the VPU.

    mu_ref: (256, 256) up-band [E | O]; me_ref/mo_ref: (256, 128)
    down-bands.  All frame slices are 128-aligned, so no vector
    realignment is generated."""
    dt = c_ref.dtype
    buf = jnp.concatenate([c_ref[...], r_ref[:, :256]], axis=1)
    a = ab_ref[:, 0:1]
    inv_b = ab_ref[:, 1:2]
    mu = mu_ref[...].astype(dt)
    gups = block // 128 + 1                    # covers W6 = block + 6

    eo = []
    for g in range(gups):
        frame = jax.lax.slice_in_dim(buf, g * 128, g * 128 + 256, axis=1)
        eo.append(jax.lax.dot_general(
            frame, mu, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
    # snake stays fp32: Mosaic rejects bf16 sin, and the ~11M
    # transcendentals per activation are this kernel's compute floor
    E = jnp.concatenate([t[:, :128] for t in eo], axis=1)
    O = jnp.concatenate([t[:, 128:] for t in eo], axis=1)
    Eb = (E + inv_b * _sin2(E * a)).astype(dt)
    Ob = (O + inv_b * _sin2(O * a)).astype(dt)

    me = me_ref[...].astype(dt)
    mo = mo_ref[...].astype(dt)
    for g in range(block // 128):
        fe = jax.lax.slice_in_dim(Eb, g * 128, g * 128 + 256, axis=1)
        fo = jax.lax.slice_in_dim(Ob, g * 128, g * 128 + 256, axis=1)
        y = (jax.lax.dot_general(fe, me, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
             + jax.lax.dot_general(fo, mo, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32))
        o_ref[:, g * 128:(g + 1) * 128] = y.astype(o_ref.dtype)

    i = pl.program_id(1)
    for ib, cols in patches.items():
        @pl.when(i == ib)
        def _(cols=cols, ib=ib):
            for t in cols:
                acc = None
                for k in range(12):
                    j = min(max(2 * t + k - 5, 0), 2 * T - 1)
                    u = j // 2 - ib * block + 3
                    src = Eb if j % 2 == 0 else Ob
                    term = f[k] * src[:, u].astype(jnp.float32)
                    acc = term if acc is None else acc + term
                o_ref[:, t - ib * block] = acc.astype(o_ref.dtype)


@functools.lru_cache(maxsize=4)
def _band_matrices():
    """Static band matrices for the MXU kernel (from kaiser12 taps).

    up[j, c]     += 2*f[k] at j = c + off for E pairs
                    (1,5)(3,4)(5,3)(7,2)(9,1)(11,0)  -> cols 0..127
                 += 2*f[k] for O pairs (0,6)(2,5)(4,4)(6,3)(8,2)(10,1)
                    -> cols 128..255
    down_e[j, c] += f[k] at j = c + off for (1,1)(3,2)(5,3)(7,4)(9,5)(11,6)
    down_o[j, c] += f[k] at j = c + off for (0,0)(2,1)(4,2)(6,3)(8,4)(10,5)
    """
    import numpy as np
    f = kaiser12()
    up = np.zeros((256, 256), np.float32)
    for k, off in ((1, 5), (3, 4), (5, 3), (7, 2), (9, 1), (11, 0)):
        for c in range(128):
            up[c + off, c] += 2.0 * f[k]
    for k, off in ((0, 6), (2, 5), (4, 4), (6, 3), (8, 2), (10, 1)):
        for c in range(128):
            up[c + off, 128 + c] += 2.0 * f[k]
    de = np.zeros((256, 128), np.float32)
    for k, off in ((1, 1), (3, 2), (5, 3), (7, 4), (9, 5), (11, 6)):
        for c in range(128):
            de[c + off, c] += f[k]
    do = np.zeros((256, 128), np.float32)
    for k, off in ((0, 0), (2, 1), (4, 2), (6, 3), (8, 4), (10, 5)):
        for c in range(128):
            do[c + off, c] += f[k]
    return up, de, do


def snake_resample2(x: jnp.ndarray, alpha: jnp.ndarray,
                    inv_beta: jnp.ndarray, *, block_t: int = 0,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused up2 -> snake -> down2 for ratio 2 / k=12 kaiser filters.

    x: (B, C, T); alpha, inv_beta: (C,) fp32 — alpha already exp'd when
    logscale, inv_beta = 1/(beta+1e-9) (or 1/(alpha+1e-9) for plain
    Snake).  Returns (B, C, T) in x.dtype.
    """
    B, C, T = x.shape
    rows = B * C
    f = kaiser12()

    if not block_t:
        # BigVGAN's late stages have few channels and very long T
        # (e.g. 24 x 232k); a fixed small block there means hundreds of
        # tiny grid steps whose fixed cost dominates.  Size the block so
        # one step touches >= ~384k elements (VMEM use stays < ~8 MB
        # fp32 across the four working buffers), capped at 8192 lanes.
        block_t = max(512, min(8192, -(-393216 // max(rows, 1)) // 512 * 512))
    nblk = -(-T // block_t)
    xlen = (nblk + 1) * block_t
    row_pad = (-rows) % 8
    xp = jnp.pad(x.reshape(rows, T), ((0, row_pad), (6, xlen - T - 6)),
                 mode="edge")
    rp = rows + row_pad
    rblk = next(r for r in (64, 56, 48, 40, 32, 24, 16, 8) if rp % r == 0)

    ab = jnp.stack(
        [jnp.tile(alpha.astype(jnp.float32), B),
         jnp.tile(inv_beta.astype(jnp.float32), B)], axis=1)
    if row_pad:
        ab = jnp.pad(ab, ((0, row_pad), (0, 0)), mode="edge")

    patches: dict = {}
    for t in list(range(min(3, T))) + list(range(max(T - 3, 3), T)):
        patches.setdefault(t // block_t, []).append(t)

    import os
    use_mxu = os.environ.get("TTS_BV_SNAKE", "mxu") == "mxu"
    kwargs = {}
    if _HAS_PLTPU and not interpret:
        # several (rblk, block_t) fp32 working arrays stay live; the
        # default 16 MB scoped-vmem cap rejects the large low-channel
        # blocks (v5e has 128 MB VMEM)
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    common_specs = [
        pl.BlockSpec((rblk, block_t), lambda r, i: (r, i)),
        pl.BlockSpec((rblk, block_t), lambda r, i: (r, i + 1)),
        pl.BlockSpec((rblk, 2), lambda r, i: (r, 0)),
    ]
    if use_mxu:
        mu, de, do = _band_matrices()
        kernel = functools.partial(_snake_kernel_mxu, block=block_t, T=T,
                                   f=tuple(float(v) for v in f),
                                   patches=patches)
        in_specs = common_specs + [
            pl.BlockSpec((256, 256), lambda r, i: (0, 0)),
            pl.BlockSpec((256, 128), lambda r, i: (0, 0)),
            pl.BlockSpec((256, 128), lambda r, i: (0, 0)),
        ]
        args = (xp, xp, ab, jnp.asarray(mu), jnp.asarray(de),
                jnp.asarray(do))
    else:
        kernel = functools.partial(_snake_kernel, block=block_t, T=T,
                                   f=tuple(float(v) for v in f),
                                   patches=patches)
        in_specs = common_specs
        args = (xp, xp, ab)
    out = pl.pallas_call(
        kernel,
        grid=(rp // rblk, nblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rblk, block_t), lambda r, i: (r, i)),
        out_shape=jax.ShapeDtypeStruct((rp, nblk * block_t), x.dtype),
        interpret=interpret,
        **kwargs,
    )(*args)
    return out[:rows, :T].reshape(B, C, T)


@functools.lru_cache(maxsize=1)
def kaiser12():
    """kaiser_sinc_filter(0.25, 0.3, 12) — the ratio-2 filter both
    resamplers use (import is function-local: bigvgan imports this
    module lazily inside _snake_act, so there is no cycle)."""
    import numpy as np
    from ..models.bigvgan import kaiser_sinc_filter
    return np.asarray(kaiser_sinc_filter(0.25, 0.3, 12), np.float32)
