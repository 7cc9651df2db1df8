"""Audio frontends: STFT, mel filterbanks, resampling — pure jnp.

Replaces the reference's torchaudio/librosa-backed frontends:

- ``mel_ar``: TorchMelSpectrogram (arch_utils.py:361-395) — 22.05 kHz,
  n_fft 1024, hop 256, power-2 spectrogram, 80 HTK-scale mels with slaney
  area-normalisation (torchaudio MelSpectrogram defaults + norm='slaney'),
  log-clamped at 1e-5, divided by per-bin mel_norms.
- ``mel_diffusion``: TacotronSTFT (arch_utils.py:662-700) — 24 kHz, same
  STFT geometry, 100 slaney-scale/slaney-norm mels (librosa defaults),
  log-clamped at 1e-5, input clipped to [-1, 1].
- ``resample``: torchaudio.functional.resample equivalent (windowed-sinc
  polyphase, hann window, lowpass_filter_width=6, rolloff=0.99) used for
  sr -> 22050 -> 24000 conversions (emb/mel.py:70,85).

STFT is framed + rfft; frames land on the MXU through the mel matmul.
All filterbanks are precomputed with numpy at trace time (static shapes).
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# mel filterbanks
# ---------------------------------------------------------------------------


def _hz_to_mel(f, scale: str):
    f = np.asarray(f, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mels)


def _mel_to_hz(m, scale: str):
    m = np.asarray(m, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


@lru_cache(maxsize=8)
def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float, fmax: float,
                   scale: str = "slaney", norm: str = "slaney") -> np.ndarray:
    """Triangular mel filterbank, shape (n_mels, n_fft//2 + 1).

    scale='slaney', norm='slaney'  == librosa.filters.mel defaults
    scale='htk',    norm='slaney'  == torchaudio MelSpectrogram(norm='slaney')
    """
    fft_freqs = np.linspace(0, sr / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(_hz_to_mel(fmin, scale), _hz_to_mel(fmax, scale),
                          n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, scale)
    fb = np.zeros((n_mels, len(fft_freqs)))
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        fb[i] = np.maximum(0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
        fb *= enorm[:, None]
    return fb.astype(np.float32)


@lru_cache(maxsize=4)
def hann_window(win_length: int) -> np.ndarray:
    """Periodic hann (scipy get_window(..., fftbins=True) / torch.hann_window)."""
    n = np.arange(win_length)
    return (0.5 - 0.5 * np.cos(2 * np.pi * n / win_length)).astype(np.float32)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """Center-padded (reflect) framing. x: (B, T) -> (B, n_frames, n_fft)."""
    pad = n_fft // 2
    x = jnp.pad(x, [(0, 0), (pad, pad)], mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return x[:, idx]


def stft_magnitude(x: jnp.ndarray, n_fft: int = 1024, hop: int = 256,
                   win_length: int = 1024, power: float = 1.0) -> jnp.ndarray:
    """|STFT|^power. x: (B, T) -> (B, n_fft//2+1, n_frames). fp32 compute.

    win_length < n_fft centers the window inside the frame like
    torch.stft (symmetric zero pad)."""
    window = np.asarray(hann_window(win_length))
    if win_length != n_fft:
        lo = (n_fft - win_length) // 2
        window = np.pad(window, (lo, n_fft - win_length - lo))
    window = jnp.asarray(window)
    frames = frame_signal(x.astype(jnp.float32), n_fft, hop) * window
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag ** power
    return jnp.transpose(mag, (0, 2, 1))


# ---------------------------------------------------------------------------
# Mel frontends (pipeline-facing)
# ---------------------------------------------------------------------------


def mel_ar(wav: jnp.ndarray, mel_norms: jnp.ndarray | None = None) -> jnp.ndarray:
    """AR-conditioning mel: TorchMelSpectrogram equivalent.

    wav: (B, T) at 22.05 kHz -> (B, 80, frames); log-compressed, divided by
    mel_norms if given (arch_utils.py:384-395).
    """
    mag2 = stft_magnitude(wav, 1024, 256, 1024, power=2.0)
    fb = jnp.asarray(mel_filterbank(22050, 1024, 80, 0.0, 8000.0,
                                    scale="htk", norm="slaney"))
    mel = jnp.einsum("mf,bft->bmt", fb, mag2)
    mel = jnp.log(jnp.clip(mel, min=1e-5))
    if mel_norms is not None:
        mel = mel / mel_norms[None, :, None]
    return mel


def mel_diffusion(wav24: jnp.ndarray) -> jnp.ndarray:
    """Diffusion-conditioning mel: TacotronSTFT(1024,256,1024,100,24000,0,12000).

    wav24: (B, T) at 24 kHz -> (B, 100, frames). Input clipped to [-1,1]
    (arch_utils.py:692-694); log dynamic-range compression.
    """
    wav24 = jnp.clip(wav24, -1.0, 1.0)
    mag = stft_magnitude(wav24, 1024, 256, 1024, power=1.0)
    fb = jnp.asarray(mel_filterbank(24000, 1024, 100, 0.0, 12000.0,
                                    scale="slaney", norm="slaney"))
    mel = jnp.einsum("mf,bft->bmt", fb, mag)
    return jnp.log(jnp.clip(mel, min=1e-5))


TACOTRON_MEL_MAX = 2.3143386840820312
TACOTRON_MEL_MIN = -11.512925148010254


def normalize_tacotron_mel(mel):
    """arch_utils.py:540-541"""
    return 2 * ((mel - TACOTRON_MEL_MIN) / (TACOTRON_MEL_MAX - TACOTRON_MEL_MIN)) - 1


def denormalize_tacotron_mel(norm_mel):
    """arch_utils.py:536-537"""
    return ((norm_mel + 1) / 2) * (TACOTRON_MEL_MAX - TACOTRON_MEL_MIN) + TACOTRON_MEL_MIN


# ---------------------------------------------------------------------------
# Griffin-Lim (mel -> audio approximation, for dataset listening checks)
# ---------------------------------------------------------------------------


def griffin_lim_from_mel(mel_log: jnp.ndarray, sr: int = 22050,
                         n_fft: int = 1024, hop: int = 256,
                         n_mels: int = 80, fmax: float = 8000.0,
                         scale: str = "htk", iters: int = 32,
                         key=None) -> jnp.ndarray:
    """Rough audio from a log-mel (dataset `--action=sample` listening aid).

    mel_log: (B, n_mels, T) natural-log mel. Pseudo-inverse filterbank +
    Griffin-Lim phase recovery. Quality is 'debug-listenable' only.
    """
    fb = mel_filterbank(sr, n_fft, n_mels, 0.0, fmax, scale=scale)
    pinv = jnp.asarray(np.linalg.pinv(fb))             # (F, n_mels)
    mag = jnp.sqrt(jnp.clip(jnp.einsum(
        "fm,bmt->bft", pinv, jnp.exp(mel_log)), 1e-10, None))
    window = jnp.asarray(hann_window(n_fft))
    b, f, t = mag.shape
    if key is None:
        key = jax.random.PRNGKey(0)
    phase = jax.random.uniform(key, mag.shape, minval=-np.pi, maxval=np.pi)
    spec = mag * jnp.exp(1j * phase)

    def istft(s):
        frames = jnp.fft.irfft(jnp.transpose(s, (0, 2, 1)), n=n_fft, axis=-1)
        frames = frames * window
        out_len = n_fft + hop * (t - 1)
        wav = jnp.zeros((b, out_len))
        wsum = jnp.zeros((out_len,))
        idx = (jnp.arange(t)[:, None] * hop + jnp.arange(n_fft)[None]).reshape(-1)
        wav = wav.at[:, idx].add(frames.reshape(b, -1))
        wsum = wsum.at[idx].add(jnp.tile(window ** 2, (t,)))
        wav = wav / jnp.maximum(wsum, 1e-8)[None]
        return wav[:, n_fft // 2: -(n_fft // 2)]

    def body(_, s):
        wav = istft(s)
        re = jnp.fft.rfft(frame_signal(wav, n_fft, hop) * window, n=n_fft)
        re = jnp.transpose(re, (0, 2, 1))
        return mag * jnp.exp(1j * jnp.angle(re))

    spec = jax.lax.fori_loop(0, iters, body, spec)
    return istft(spec)


# ---------------------------------------------------------------------------
# Resampling (torchaudio.functional.resample equivalent)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=16)
def _resample_kernel(orig_freq: int, new_freq: int,
                     lowpass_filter_width: int = 6,
                     rolloff: float = 0.99) -> tuple[np.ndarray, int, int]:
    """Polyphase windowed-sinc kernel, hann window (torchaudio default)."""
    gcd = math.gcd(orig_freq, new_freq)
    orig = orig_freq // gcd
    new = new_freq // gcd
    base_freq = min(orig, new) * rolloff
    width = math.ceil(lowpass_filter_width * orig / base_freq)
    idx = np.arange(-width, width + orig, dtype=np.float64)[None] / orig
    t = np.arange(0, -new, -1, dtype=np.float64)[:, None] / new + idx
    t = t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    scale = base_freq / orig
    kernel = np.where(t == 0, 1.0, np.sinc(t)) * window * scale
    return kernel.astype(np.float32), width, int(orig)


def resample(wav: jnp.ndarray, orig_freq: int, new_freq: int) -> jnp.ndarray:
    """wav: (..., T) -> (..., ceil(T*new/orig)). Matches torchaudio defaults."""
    if orig_freq == new_freq:
        return wav
    kernel, width, orig = _resample_kernel(orig_freq, new_freq)
    gcd = math.gcd(orig_freq, new_freq)
    new = new_freq // gcd
    shape = wav.shape
    x = wav.reshape(-1, shape[-1]).astype(jnp.float32)
    length = x.shape[-1]
    x = jnp.pad(x, [(0, 0), (width, width + orig)])
    # conv with stride orig, each of `new` phases an output channel
    y = jax.lax.conv_general_dilated(
        x[:, None, :], jnp.asarray(kernel)[:, None, :],
        window_strides=(orig,), padding=[(0, 0)],
        dimension_numbers=("NCH", "OIH", "NCH"))
    y = jnp.transpose(y, (0, 2, 1)).reshape(x.shape[0], -1)
    target_len = math.ceil(new * length / orig)
    return y[:, :target_len].reshape(shape[:-1] + (target_len,))
