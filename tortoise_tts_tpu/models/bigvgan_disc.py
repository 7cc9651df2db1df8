"""BigVGAN adversarial training side — TPU-native.

Capability-parity with reference bigvgan.py:543-762:
- ``DiscriminatorP`` / MultiPeriodDiscriminator (periods reshape the
  waveform to (T/p, p) and run strided 2D convs; bigvgan.py:543-604),
- ``DiscriminatorR`` / MultiResolutionDiscriminator (per-resolution STFT
  magnitude + 2D convs; bigvgan.py:606-686),
- LSGAN discriminator/generator losses, feature-matching loss (x2) and
  the training mel-spectrogram L1 (bigvgan.py:687-762).

Design deltas for TPU: weight-norm convs are parameterized as
``{"v", "g"}`` and folded at apply time (functional equivalent of torch
weight_norm); each discriminator is a pure ``(params, wav) -> (score,
fmaps)`` function; the joint train step (engine/train_step.py
``make_vocoder_train_step``) alternates D and G updates inside one
jitted call.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

Params = Dict[str, Any]

LRELU_SLOPE = 0.1

MPD_PERIODS = (2, 3, 5, 7, 11)                     # h.mpd_reshapes
MRD_RESOLUTIONS = ((1024, 120, 600), (2048, 240, 1200), (512, 50, 240))


@dataclass(frozen=True)
class DiscriminatorConfig:
    periods: Tuple[int, ...] = MPD_PERIODS
    resolutions: Tuple[Tuple[int, int, int], ...] = MRD_RESOLUTIONS
    channel_mult: int = 1


# ---------------------------------------------------------------------------
# weight-norm 2D conv
# ---------------------------------------------------------------------------


def _wn_conv2d_init(key, c_in: int, c_out: int, kh: int, kw: int) -> Params:
    k1, k2 = jax.random.split(key)
    v = jax.random.normal(k1, (c_out, c_in, kh, kw)) * 0.01
    g = jnp.sqrt(jnp.sum(v * v, axis=(1, 2, 3)))
    bound = 1.0 / math.sqrt(c_in * kh * kw)
    b = jax.random.uniform(k2, (c_out,), minval=-bound, maxval=bound)
    return {"v": v, "g": g, "b": b}


def _wn_conv2d(p: Params, x: jnp.ndarray, stride=(1, 1),
               padding=((0, 0), (0, 0))) -> jnp.ndarray:
    v = p["v"].astype(x.dtype)
    norm = jnp.sqrt(jnp.sum(
        p["v"].astype(jnp.float32) ** 2, axis=(1, 2, 3), keepdims=True)
        + 1e-12).astype(x.dtype)
    w = p["g"].astype(x.dtype)[:, None, None, None] * v / norm
    y = lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return y + p["b"].astype(x.dtype)[None, :, None, None]


# ---------------------------------------------------------------------------
# DiscriminatorP (bigvgan.py:543-580)
# ---------------------------------------------------------------------------


def _disc_p_init(key, mult: int) -> Params:
    ks = jax.random.split(key, 6)
    chans = [1, 32 * mult, 128 * mult, 512 * mult, 1024 * mult, 1024 * mult]
    convs = []
    for i in range(4):
        convs.append(_wn_conv2d_init(ks[i], chans[i], chans[i + 1], 5, 1))
    convs.append(_wn_conv2d_init(ks[4], chans[4], chans[5], 5, 1))
    return {"convs": convs,
            "post": _wn_conv2d_init(ks[5], chans[5], 1, 3, 1)}


def _disc_p_apply(p: Params, x: jnp.ndarray, period: int
                  ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """x: (B, 1, T) -> (score (B, N), fmaps)."""
    b, c, t = x.shape
    if t % period != 0:
        pad = period - t % period
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)), mode="reflect")
        t = t + pad
    x = x.reshape(b, c, t // period, period)
    fmap = []
    for i, conv in enumerate(p["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        x = _wn_conv2d(conv, x, stride=stride, padding=((2, 2), (0, 0)))
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = _wn_conv2d(p["post"], x, padding=((1, 1), (0, 0)))
    fmap.append(x)
    return x.reshape(b, -1), fmap


# ---------------------------------------------------------------------------
# DiscriminatorR (bigvgan.py:606-655)
# ---------------------------------------------------------------------------


def _disc_r_init(key, mult: int) -> Params:
    ks = jax.random.split(key, 6)
    ch = 32 * mult
    return {
        "convs": [
            _wn_conv2d_init(ks[0], 1, ch, 3, 9),
            _wn_conv2d_init(ks[1], ch, ch, 3, 9),
            _wn_conv2d_init(ks[2], ch, ch, 3, 9),
            _wn_conv2d_init(ks[3], ch, ch, 3, 9),
            _wn_conv2d_init(ks[4], ch, ch, 3, 3),
        ],
        "post": _wn_conv2d_init(ks[5], ch, 1, 3, 3),
    }


def _resolution_spectrogram(x: jnp.ndarray, n_fft: int, hop: int,
                            win: int, window: str = "hann") -> jnp.ndarray:
    """|STFT| with center=False + reflect pad (n_fft-hop)/2 on both sides
    (bigvgan.py:648-655). x: (B, T) -> (B, F, frames).

    window: "hann" (mel_spectrogram, bigvgan.py:700,706) or "ones"
    (DiscriminatorR.spectrogram passes window=None to torch.stft, i.e. a
    rectangular window, bigvgan.py:653)."""
    pad = (n_fft - hop) // 2
    x = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    # torch.stft zero-pads a short window symmetrically inside n_fft, so
    # the windowed samples are the CENTERED (n_fft-win)//2-offset slice
    # of each frame; the in-buffer position itself only shifts phase,
    # which |.| discards
    off = (n_fft - win) // 2
    idx = (np.arange(n_frames)[:, None] * hop + off
           + np.arange(win)[None, :])
    frames = x[:, idx]
    if window == "hann":
        frames = frames * jnp.asarray(
            np.hanning(win + 1)[:-1].astype(np.float32))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    # sqrt(re^2+im^2+eps): jnp.abs(complex) has a NaN gradient at
    # exactly-zero bins (reference guards its mel path the same way,
    # bigvgan.py mel_spectrogram sqrt(...+1e-9))
    mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + 1e-9)
    return jnp.transpose(mag, (0, 2, 1))


def _disc_r_apply(p: Params, x: jnp.ndarray,
                  resolution: Tuple[int, int, int]
                  ) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """x: (B, 1, T) -> (score, fmaps)."""
    n_fft, hop, win = resolution
    mag = _resolution_spectrogram(x[:, 0], n_fft, hop, win,
                                  window="ones")[:, None]
    fmap = []
    h = mag
    strides = [(1, 1), (1, 2), (1, 2), (1, 2), (1, 1)]
    pads = [((1, 1), (4, 4))] * 4 + [((1, 1), (1, 1))]
    for conv, s, pd in zip(p["convs"], strides, pads):
        h = _wn_conv2d(conv, h, stride=s, padding=pd)
        h = jax.nn.leaky_relu(h, LRELU_SLOPE)
        fmap.append(h)
    h = _wn_conv2d(p["post"], h, padding=((1, 1), (1, 1)))
    fmap.append(h)
    return h.reshape(h.shape[0], -1), fmap


# ---------------------------------------------------------------------------
# Multi-discriminator wrappers + losses
# ---------------------------------------------------------------------------


def init(key, cfg: DiscriminatorConfig = DiscriminatorConfig()) -> Params:
    kp = jax.random.split(key, len(cfg.periods) + len(cfg.resolutions))
    return {
        "mpd": [_disc_p_init(kp[i], cfg.channel_mult)
                for i in range(len(cfg.periods))],
        "mrd": [_disc_r_init(kp[len(cfg.periods) + i], cfg.channel_mult)
                for i in range(len(cfg.resolutions))],
    }


def discriminate(p: Params, wav: jnp.ndarray,
                 cfg: DiscriminatorConfig = DiscriminatorConfig()):
    """wav: (B, 1, T) -> (scores list, fmaps list) over MPD + MRD."""
    scores, fmaps = [], []
    for dp, period in zip(p["mpd"], cfg.periods):
        s, f = _disc_p_apply(dp, wav, period)
        scores.append(s)
        fmaps.append(f)
    for dr, res in zip(p["mrd"], cfg.resolutions):
        s, f = _disc_r_apply(dr, wav, res)
        scores.append(s)
        fmaps.append(f)
    return scores, fmaps


def discriminator_loss(real_scores, fake_scores):
    """LSGAN: (1-D(y))^2 + D(y_hat)^2 (bigvgan.py:738-750)."""
    loss = 0.0
    for dr, dg in zip(real_scores, fake_scores):
        loss = loss + jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg ** 2)
    return loss


def generator_loss(fake_scores):
    """LSGAN generator: (1-D(y_hat))^2 (bigvgan.py:753-761)."""
    loss = 0.0
    for dg in fake_scores:
        loss = loss + jnp.mean((1.0 - dg) ** 2)
    return loss


def feature_loss(real_fmaps, fake_fmaps):
    """L1 feature matching, x2 (bigvgan.py:722-728)."""
    loss = 0.0
    for fr, fg in zip(real_fmaps, fake_fmaps):
        for rl, gl in zip(fr, fg):
            loss = loss + jnp.mean(jnp.abs(
                lax.stop_gradient(rl).astype(jnp.float32)
                - gl.astype(jnp.float32)))
    return loss * 2.0


def training_mel(wav: jnp.ndarray) -> jnp.ndarray:
    """BigVGAN's training mel (bigvgan.py:690-719): 100-bin 24 kHz,
    center=False |STFT| -> slaney mel -> log-clamp.  wav: (B, T)."""
    from ..ops.stft import mel_filterbank
    mag = _resolution_spectrogram(wav, 1024, 256, 1024)
    fb = jnp.asarray(mel_filterbank(24000, 1024, 100, 0.0, 12000.0,
                                    scale="slaney", norm="slaney"))
    mel = jnp.einsum("mf,bft->bmt", fb, mag)
    return jnp.log(jnp.clip(mel, min=1e-5))


def mel_loss(wav_real: jnp.ndarray, wav_fake: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(training_mel(wav_real) - training_mel(wav_fake)))
