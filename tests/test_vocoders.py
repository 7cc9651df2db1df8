"""Parity: HiFiGAN / BigVGAN / UnivNet vs reference torch (CPU golden).

Covers SURVEY §2.1 vocoder rows, including weight-norm folding,
kaiser-sinc anti-aliased Snake activations, and the LVC kernel.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tortoise_tts_tpu.models import (bigvgan as bv, convert, hifigan as hg,
                                     univnet as uv)

from tests.ref.harness import import_ref


HG_CFG = hg.HifiganConfig(in_channels=32, upsample_initial_channel=64,
                          cond_channels=32)


def test_hifigan_parity():
    rhg = import_ref("models.hifigan")
    torch.manual_seed(0)
    m = rhg.HifiganGenerator(
        in_channels=32, out_channels=1, resblock_type="1",
        resblock_dilation_sizes=[[1, 3, 5]] * 3,
        resblock_kernel_sizes=[3, 7, 11],
        upsample_kernel_sizes=[16, 16, 4, 4],
        upsample_initial_channel=64, upsample_factors=[8, 8, 2, 2],
        cond_channels=32)
    m.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert.convert_hifigan(m.state_dict()))
    torch.manual_seed(1)
    x = torch.randn(1, 32, 20)
    g = torch.randn(1, 32, 1)
    with torch.no_grad():
        ref = m(x, g).numpy()
    got = np.asarray(hg.forward(params, jnp.asarray(x.numpy()),
                                jnp.asarray(g.numpy()), HG_CFG))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_hifigan_inference_interpolation_parity():
    rhg = import_ref("models.hifigan")
    torch.manual_seed(2)
    m = rhg.HifiganGenerator(
        in_channels=32, out_channels=1, resblock_type="1",
        resblock_dilation_sizes=[[1, 3, 5]] * 3,
        resblock_kernel_sizes=[3, 7, 11],
        upsample_kernel_sizes=[16, 16, 4, 4],
        upsample_initial_channel=64, upsample_factors=[8, 8, 2, 2],
        cond_channels=32)
    m.eval()
    m.device = torch.device("cpu")
    params = jax.tree_util.tree_map(
        jnp.asarray, convert.convert_hifigan(m.state_dict()))
    lat = torch.randn(1, 12, 32)   # (B, T, C)
    cond = torch.randn(1, 32)
    with torch.no_grad():
        ref = m.inference(lat, cond).numpy()
    got = np.asarray(hg.inference(params, jnp.asarray(lat.numpy()),
                                  jnp.asarray(cond.numpy()), HG_CFG))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


BV_JSON = dict(num_mels=100, upsample_rates=[4, 4, 2, 2, 2, 2],
               upsample_kernel_sizes=[8, 8, 4, 4, 4, 4],
               upsample_initial_channel=64, resblock="1",
               resblock_kernel_sizes=[3, 7, 11],
               resblock_dilation_sizes=[[1, 3, 5]] * 3,
               activation="snakebeta", snake_logscale=True,
               hop_size=256, n_fft=1024)


def test_bigvgan_parity():
    rbv = import_ref("models.bigvgan")
    torch.manual_seed(3)
    m = rbv.BigVGAN(data=BV_JSON)
    m.eval()
    cfg = bv.BigVGANConfig.from_json(BV_JSON)
    params = jax.tree_util.tree_map(
        jnp.asarray,
        convert.convert_bigvgan(m.state_dict(), n_ups=6, resblock="1"))
    mel = torch.randn(1, 100, 12)
    with torch.no_grad():
        ref = m(mel, None).numpy()
    got = np.asarray(bv.forward(params, jnp.asarray(mel.numpy()), cfg))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_bigvgan_inference_pad_trim():
    rbv = import_ref("models.bigvgan")
    torch.manual_seed(4)
    m = rbv.BigVGAN(data=BV_JSON)
    m.eval()
    cfg = bv.BigVGANConfig.from_json(BV_JSON)
    params = jax.tree_util.tree_map(
        jnp.asarray,
        convert.convert_bigvgan(m.state_dict(), n_ups=6, resblock="1"))
    mel = torch.randn(1, 100, 8)
    with torch.no_grad():
        ref = m.inference(mel).numpy()
    got = np.asarray(bv.inference(params, jnp.asarray(mel.numpy()), cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_univnet_parity():
    ruv = import_ref("models.vocoder")
    torch.manual_seed(5)
    m = ruv.UnivNetGenerator(noise_dim=16, channel_size=8)
    m.eval()
    cfg = uv.UnivNetConfig(noise_dim=16, channel_size=8)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert.convert_univnet(m.state_dict()))
    mel = torch.randn(2, 100, 6)
    z = torch.randn(2, 16, 6)
    with torch.no_grad():
        ref = m(mel, z).numpy()
    got = np.asarray(uv.forward(params, jnp.asarray(mel.numpy()),
                                jnp.asarray(z.numpy()), cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_univnet_inference_pad_trim():
    ruv = import_ref("models.vocoder")
    torch.manual_seed(6)
    m = ruv.UnivNetGenerator(noise_dim=16, channel_size=8)
    m.eval()
    cfg = uv.UnivNetConfig(noise_dim=16, channel_size=8)
    params = jax.tree_util.tree_map(
        jnp.asarray, convert.convert_univnet(m.state_dict()))
    mel = torch.randn(1, 100, 6)
    z = torch.randn(1, 16, 16)
    with torch.no_grad():
        ref = m.inference(mel, z).numpy()
    got = np.asarray(uv.inference(params, jnp.asarray(mel.numpy()),
                                  noise=jnp.asarray(z.numpy()), cfg=cfg))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_pallas_snake_kernel_parity():
    """ops/pallas_snake.snake_resample2 (interpret mode) and the
    elementwise polyphase XLA form both match the blocked up2->snake->
    down2 reference path exactly, including the interleaved-edge-pad
    boundary columns and block-boundary halos."""
    import os
    from tortoise_tts_tpu.ops.pallas_snake import snake_resample2
    key = jax.random.PRNGKey(0)
    old = bv._RESAMPLE
    mode = os.environ.get("TTS_BV_SNAKE_TEST", "mxu")
    os.environ["TTS_BV_SNAKE"] = mode
    try:
        for (b, c, t) in ((1, 5, 224), (2, 24, 900), (1, 3, 513),
                          (1, 8, 8), (1, 8, 1025)):
            x = jax.random.normal(key, (b, c, t), jnp.float32)
            p = {"alpha": jax.random.normal(jax.random.PRNGKey(1),
                                            (c,)) * 0.3,
                 "beta": jax.random.normal(jax.random.PRNGKey(2),
                                           (c,)) * 0.3}
            bv._RESAMPLE = "blocked"
            ref = bv._snake_act(p, x, True, True)
            a = jnp.exp(p["alpha"])
            ib = 1.0 / (jnp.exp(p["beta"]) + 1e-9)
            got = snake_resample2(x, a, ib, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=1e-5)
            if t > 600:
                # multi-block grid: exercises the r_ref halo and the
                # cross-block boundary patches (production stages run
                # nblk > 1; the default block heuristic here does not)
                got_mb = snake_resample2(x, a, ib, block_t=512,
                                         interpret=True)
                np.testing.assert_allclose(np.asarray(got_mb),
                                           np.asarray(ref),
                                           atol=2e-5, rtol=1e-5)
            got2 = bv._snake_act_fused(p, x, True, True)
            np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                                       atol=2e-5, rtol=1e-5)
    finally:
        bv._RESAMPLE = old
        os.environ.pop("TTS_BV_SNAKE", None)


def test_snake_sin2_poly_accuracy():
    """The range-reduced sin^2 polynomial stays within 3e-5 of the
    transcendental over a wide argument range (vs ~8e-3 bf16 output
    resolution)."""
    from tortoise_tts_tpu.ops.pallas_snake import _sin2
    y = jnp.asarray(np.linspace(-300, 300, 400001, dtype=np.float32))
    got = np.asarray(_sin2(y))
    ref = np.sin(np.asarray(y, np.float64)) ** 2
    assert np.abs(got - ref).max() < 3e-5


def test_pallas_snake_vpu_variant_parity():
    import os
    os.environ["TTS_BV_SNAKE_TEST"] = "vpu"
    try:
        test_pallas_snake_kernel_parity()
    finally:
        os.environ.pop("TTS_BV_SNAKE_TEST", None)


def test_snake_pallas_grad_matches_xla(monkeypatch):
    """BigVGAN GAN training must differentiate through the default-on
    Pallas snake kernel: _snake_pallas runs the kernel forward
    (interpret here) and the XLA up2->snake->down2 backward via
    custom_vjp, so grads match the pure-XLA path."""
    import numpy as np
    from tortoise_tts_tpu.ops import pallas_snake as ps

    # route the kernel through interpret mode on CPU
    real = ps.snake_resample2
    monkeypatch.setattr(
        ps, "snake_resample2",
        lambda x, a, binv, **kw: real(x, a, binv, interpret=True))

    rng = np.random.RandomState(0)
    B, C, T = 2, 8, 64
    x = jnp.asarray(rng.randn(B, C, T), jnp.float32)
    a = jnp.asarray(np.abs(rng.randn(C)) + 0.5, jnp.float32)
    binv = jnp.asarray(1.0 / (np.abs(rng.randn(C)) + 0.5), jnp.float32)

    def loss_k(x, a, binv):
        return jnp.sum(bv._snake_pallas(x, a, binv) ** 2)

    def loss_x(x, a, binv):
        return jnp.sum(bv._snake_xla_ref(x, a, binv) ** 2)

    lk, gk = jax.value_and_grad(loss_k, argnums=(0, 1, 2))(x, a, binv)
    lx, gx = jax.value_and_grad(loss_x, argnums=(0, 1, 2))(x, a, binv)
    np.testing.assert_allclose(float(lk), float(lx), rtol=1e-5)
    for g1, g2 in zip(gk, gx):
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-4, rtol=1e-4)
