"""Parity: BigVGAN discriminators vs reference torch (bigvgan.py:543-686).

Pins the DiscriminatorP reshape/conv stack and the DiscriminatorR
spectrogram front-end — notably that the MRD STFT uses torch.stft's
default *rectangular* window (window=None, bigvgan.py:653), not hann.
"""

from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tortoise_tts_tpu.models import bigvgan_disc as bvd

from tests.ref.harness import import_ref


@pytest.fixture(scope="module")
def ref_mod():
    return import_ref("models.bigvgan")


def _cfg():
    return SimpleNamespace(discriminator_channel_mult=1,
                           use_spectral_norm=False)


def _convert_wn_conv(sd, prefix):
    g = sd[f"{prefix}.weight_g"].numpy()          # (O, 1, 1, 1)
    return {"v": jnp.asarray(sd[f"{prefix}.weight_v"].numpy()),
            "g": jnp.asarray(g.reshape(g.shape[0])),
            "b": jnp.asarray(sd[f"{prefix}.bias"].numpy())}


def _convert_disc(m):
    sd = m.state_dict()
    return {"convs": [_convert_wn_conv(sd, f"convs.{i}")
                      for i in range(len(m.convs))],
            "post": _convert_wn_conv(sd, "conv_post")}


def _assert_close(got, want, atol=2e-4):
    np.testing.assert_allclose(np.asarray(got), want.detach().numpy(),
                               atol=atol, rtol=1e-3)


@pytest.mark.parametrize("period", [2, 3])
def test_discriminator_p_parity(ref_mod, period):
    torch.manual_seed(period)
    m = ref_mod.DiscriminatorP(_cfg(), period)
    m.eval()
    params = _convert_disc(m)
    wav = torch.randn(2, 1, 1000) * 0.5
    with torch.no_grad():
        score, fmap = m(wav)
    got_score, got_fmap = bvd._disc_p_apply(params, jnp.asarray(wav.numpy()),
                                            period)
    _assert_close(got_score, score)
    assert len(got_fmap) == len(fmap)
    for g, w in zip(got_fmap, fmap):
        _assert_close(g, w)


@pytest.mark.parametrize("resolution", [(256, 60, 150), (512, 50, 240)])
def test_discriminator_r_parity(ref_mod, resolution):
    torch.manual_seed(resolution[0])
    m = ref_mod.DiscriminatorR(_cfg(), list(resolution))
    m.eval()
    params = _convert_disc(m)
    wav = torch.randn(2, 1, 2048) * 0.5
    with torch.no_grad():
        score, fmap = m(wav)
    got_score, got_fmap = bvd._disc_r_apply(params, jnp.asarray(wav.numpy()),
                                            resolution)
    _assert_close(got_score, score, atol=5e-4)
    assert len(got_fmap) == len(fmap)
    for g, w in zip(got_fmap, fmap):
        _assert_close(g, w, atol=5e-4)


def test_mrd_spectrogram_matches_torch_stft(ref_mod):
    """The MRD front-end alone vs torch.stft with window=None."""
    torch.manual_seed(0)
    m = ref_mod.DiscriminatorR(_cfg(), [512, 50, 240])
    wav = torch.randn(2, 1, 2048)
    with torch.no_grad():
        want = m.spectrogram(wav).numpy()
    got = np.asarray(bvd._resolution_spectrogram(
        jnp.asarray(wav[:, 0].numpy()), 512, 50, 240, window="ones"))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-4)
