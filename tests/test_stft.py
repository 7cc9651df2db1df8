"""Mel frontend / resampler invariants.

torchaudio/librosa are absent from the image, so the oracles here are
mathematical properties + the filterbank formulas themselves (the
filterbank code is independently exercised by the reference-parity
tests via tests/ref/harness.py's librosa stub, which delegates to it).
"""

import numpy as np

import jax.numpy as jnp

from tortoise_tts_tpu.ops import stft


def test_mel_filterbank_shapes_and_coverage():
    fb = stft.mel_filterbank(22050, 1024, 80, 0.0, 8000.0,
                             scale="htk", norm="slaney")
    assert fb.shape == (80, 513)
    assert (fb >= 0).all()
    # every mel filter has support
    assert (fb.sum(axis=1) > 0).all()
    fb2 = stft.mel_filterbank(24000, 1024, 100, 0.0, 12000.0,
                              scale="slaney", norm="slaney")
    assert fb2.shape == (100, 513)


def test_stft_frame_count_and_tone_peak():
    sr = 22050
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None]
    mag = stft.stft_magnitude(jnp.asarray(tone), 1024, 256, 1024, power=2.0)
    assert mag.shape == (1, 513, 1 + sr // 256)
    peak_bin = int(jnp.argmax(mag[0].mean(axis=1)))
    expected = round(1000 / (sr / 1024))
    assert abs(peak_bin - expected) <= 1


def test_mel_ar_shape_and_range():
    wav = np.random.RandomState(0).randn(1, 22050).astype(np.float32) * 0.1
    mel = stft.mel_ar(jnp.asarray(wav))
    assert mel.shape[1] == 80
    # log-clamped at 1e-5 => >= log(1e-5)
    assert float(mel.min()) >= np.log(1e-5) - 1e-4


def test_mel_diffusion_clip_and_shape():
    wav = np.random.RandomState(1).randn(1, 24000).astype(np.float32) * 5
    mel = stft.mel_diffusion(jnp.asarray(wav))
    assert mel.shape[1] == 100
    assert np.isfinite(np.asarray(mel)).all()


def test_tacotron_mel_normalize_roundtrip():
    x = jnp.linspace(-11.5, 2.3, 100)
    y = stft.denormalize_tacotron_mel(stft.normalize_tacotron_mel(x))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_resample_preserves_tone_frequency():
    sr1, sr2, f = 22050, 24000, 440.0
    t = np.arange(sr1 * 2) / sr1
    tone = np.sin(2 * np.pi * f * t).astype(np.float32)[None]
    out = np.asarray(stft.resample(jnp.asarray(tone), sr1, sr2))
    assert abs(out.shape[-1] - 2 * sr2) <= 2
    # dominant frequency via FFT
    spec = np.abs(np.fft.rfft(out[0]))
    freq = np.fft.rfftfreq(out.shape[-1], 1 / sr2)
    assert abs(freq[int(spec.argmax())] - f) < 2.0
    # energy preserved approximately
    assert abs(np.square(out).mean() - 0.5) < 0.02


def test_resample_identity():
    wav = np.random.RandomState(0).randn(1, 1000).astype(np.float32)
    out = stft.resample(jnp.asarray(wav), 22050, 22050)
    np.testing.assert_array_equal(np.asarray(out), wav)
