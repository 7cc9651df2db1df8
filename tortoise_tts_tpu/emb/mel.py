"""Audio encode pipeline: wav -> codes / conditioning mels / latents.

Capability-parity with reference emb/mel.py:50-126 (encode,
encode_from_files, format_* conditioning helpers):

    wav --resample 22.05k--> 80-mel  --DVAE--> discrete codes
                             80-mel (132300-sample clip) --UV--> AR latent
        --resample 24k, pad/trunc 102400--> 100-mel --Diff--> diff latent
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..models import load_model, load_mel_norms
from ..ops import stft
from ..utils.io import read_wav

AR_COND_SAMPLES = 132_300   # emb/mel.py:50
DIFF_COND_SAMPLES = 102_400  # emb/mel.py:72

# jitted stage functions (params as args; cached per input-length bucket)
from functools import partial as _partial

# DVAE-codes frame bucket: full-utterance mels are edge-padded up to a
# multiple of this many frames so dataset prep compiles one program per
# bucket instead of one per distinct segment length (each new shape is
# minutes through the remote-compile relay).  Edge padding only
# perturbs codes within the encoder's receptive field of the true end,
# and those are sliced off below; TTS_MEL_EXACT=1 restores exact-shape
# encoding (one compile per length, reference-exact trailing codes).
MEL_FRAME_BUCKET = 256


@_partial(jax.jit, static_argnames=("cfg",))
def _jit_dvae_codes(params, mel, cfg):
    from ..models import dvae as _dvae
    return _dvae.get_codebook_indices(params, mel, cfg)


def _dvae_codes_bucketed(dvae, mel_full: jnp.ndarray) -> jnp.ndarray:
    import os
    from ..models import dvae as _dvae
    t = mel_full.shape[-1]
    if os.environ.get("TTS_MEL_EXACT") == "1":
        return _jit_dvae_codes(dvae.params, mel_full, dvae.config)
    bt = -(-t // MEL_FRAME_BUCKET) * MEL_FRAME_BUCKET
    # the exact-shape code count, from shape arithmetic only (no compile)
    n_codes = jax.eval_shape(
        lambda m: _dvae.get_codebook_indices(dvae.params, m, dvae.config),
        jax.ShapeDtypeStruct(mel_full.shape, mel_full.dtype)).shape[-1]
    padded = jnp.pad(mel_full, [(0, 0), (0, 0), (0, bt - t)], mode="edge")
    return _jit_dvae_codes(dvae.params, padded, dvae.config)[:, :n_codes]


@_partial(jax.jit, static_argnames=("cfg",))
def _jit_ar_conditioning(params, mels, cfg):
    from ..models import unified_voice as _uv
    return _uv.get_conditioning(params, mels, cfg)


@_partial(jax.jit, static_argnames=("cfg",))
def _jit_diff_conditioning(params, mels, cfg):
    from ..models import diffusion as _dtts
    return _dtts.get_conditioning(params, mels, cfg)


def format_autoregressive_conditioning(wav22: np.ndarray,
                                       cond_length: int = AR_COND_SAMPLES,
                                       rng: Optional[np.random.RandomState] = None
                                       ) -> jnp.ndarray:
    """(B?, T) 22.05 kHz -> (B, 80, frames) AR-conditioning mel
    (emb/mel.py:50-65: pad or random-crop to cond_length)."""
    wav22 = np.atleast_2d(np.asarray(wav22))
    if cond_length > 0:
        gap = wav22.shape[-1] - cond_length
        if gap < 0:
            wav22 = np.pad(wav22, [(0, 0), (0, -gap)])
        elif gap > 0:
            rng = rng or np.random.RandomState()
            start = rng.randint(0, gap + 1)
            wav22 = wav22[:, start:start + cond_length]
    mel_norms = load_mel_norms()
    norms = jnp.asarray(mel_norms) if mel_norms is not None else None
    return stft.mel_ar(jnp.asarray(wav22, dtype=jnp.float32), norms)


def format_diffusion_conditioning(wav22: np.ndarray,
                                  wav24: Optional[jnp.ndarray] = None
                                  ) -> jnp.ndarray:
    """(B?, T) 22.05 kHz -> (B, 100, frames) diffusion-conditioning mel
    (emb/mel.py:67-78: resample to 24 kHz, pad/truncate to 102400).
    Pass a precomputed ``wav24`` to skip the resample."""
    if wav24 is None:
        wav22 = np.atleast_2d(np.asarray(wav22))
        wav24 = stft.resample(jnp.asarray(wav22, dtype=jnp.float32),
                              22050, 24000)
    t = wav24.shape[-1]
    if t < DIFF_COND_SAMPLES:
        wav24 = jnp.pad(wav24, [(0, 0), (0, DIFF_COND_SAMPLES - t)])
    else:
        wav24 = wav24[:, :DIFF_COND_SAMPLES]
    return stft.mel_diffusion(wav24)


def encode(wav: np.ndarray, sr: int, dtype: str = "float32",
           rng: Optional[np.random.RandomState] = None,
           return_mels: bool = False) -> Dict:
    """Full encode (emb/mel.py:82-109). wav: (T,) or (1, T) float.

    ``return_mels`` additionally returns the full-utterance training
    mels: ``mel`` (80-bin 22.05 kHz DVAE/AR space) and ``mel_diff``
    (100-bin 24 kHz tacotron-normalized — the diffusion x_start space),
    which the trainer's diffusion/DVAE/vocoder engines consume.
    """
    wav = np.atleast_2d(np.asarray(wav, dtype=np.float32))
    wav_length = wav.shape[-1]
    wav22 = np.asarray(stft.resample(jnp.asarray(wav), sr, 22050))

    dvae = load_model("dvae", dtype)
    ar = load_model("autoregressive", dtype)
    diff = load_model("diffusion", dtype)

    mel_norms = load_mel_norms()
    norms = jnp.asarray(mel_norms) if mel_norms is not None else None
    mel_full = stft.mel_ar(jnp.asarray(wav22), norms)

    wav24 = stft.resample(jnp.asarray(wav22), 22050, 24000)
    ar_conds = format_autoregressive_conditioning(wav22, rng=rng)[:, None]
    diff_conds = format_diffusion_conditioning(wav22, wav24=wav24)[:, None]

    codes = _dvae_codes_bucketed(dvae, mel_full)
    ar_latent = _jit_ar_conditioning(ar.params, ar_conds, ar.config)
    diff_latent = _jit_diff_conditioning(diff.params, diff_conds,
                                         diff.config)
    out = {
        "codes": codes,
        "conds": (ar_conds, diff_conds),
        "latent": (ar_latent, diff_latent),
        "metadata": {
            "original_length": wav_length,
            "sample_rate": sr,
            "duration": wav_length / sr,
        },
    }
    if return_mels:
        out["mel"] = mel_full
        out["mel_diff"] = stft.normalize_tacotron_mel(
            stft.mel_diffusion(wav24))
    return out


def encode_from_files(paths: Sequence[str | Path], dtype: str = "float32",
                      rng: Optional[np.random.RandomState] = None) -> Dict:
    """Concatenate reference clips then encode (emb/mel.py:111-126)."""
    wavs, main_sr = [], None
    for p in paths:
        data, sr = read_wav(p)
        if main_sr is None:
            main_sr = sr
        assert sr == main_sr, "Mismatching sample rates"
        wavs.append(data)
    wav = np.concatenate(wavs, axis=-1)
    return encode(wav, main_sr, dtype=dtype, rng=rng)


def trim(qnt: np.ndarray, target: int) -> np.ndarray:
    """emb/mel.py:146-161."""
    length = qnt.shape[0]
    if target > 0:
        start, end = 0, target
        if end >= length:
            start, end = length - target, length
    else:
        start, end = length + target, length
        if start < 0:
            start = 0
    return qnt[start:end]


def repeat_extend_audio(qnt: np.ndarray, target: int) -> np.ndarray:
    """emb/mel.py:177-184."""
    pieces, length = [], 0
    while length < target:
        pieces.append(qnt)
        length += qnt.shape[0]
    return trim(np.concatenate(pieces), target)
