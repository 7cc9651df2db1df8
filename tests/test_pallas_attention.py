"""Pallas flash attention vs XLA mha (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tts_tpu.ops.attention import mha
from tortoise_tts_tpu.ops.pallas_attention import flash_attention


@pytest.mark.parametrize("s,causal", [(256, True), (256, False),
                                      (300, True)])
def test_flash_matches_mha(s, causal):
    rng = np.random.RandomState(0)
    b, h, d = 2, 4, 64
    q = jnp.asarray(rng.randn(b, h, s, d), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(b, h, s, d), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(b, h, s, d), dtype=jnp.float32)
    mask = jnp.asarray(rng.rand(b, s) > 0.2)
    mask = mask.at[:, 0].set(True)
    ref = mha(q, k, v, mask=mask[:, None, None, :], causal=causal)
    got = flash_attention(q, k, v, key_mask=mask, causal=causal,
                          block_q=128, interpret=True)
    # rows whose keys are fully masked out are undefined in both paths;
    # compare where at least one key is attendable
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_no_mask():
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(1, 2, 128, 64), dtype=jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 128, 64), dtype=jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 128, 64), dtype=jnp.float32)
    ref = mha(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, block_q=64, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_bias_matches_qkv_attention():
    """flash_attention_bias vs the XLA qkv_attention path (diffusion
    AttentionBlock semantics: softmax(qk/sqrt(d) + rel-pos bias))."""
    from tortoise_tts_tpu.ops.attention import qkv_attention
    from tortoise_tts_tpu.ops.pallas_attention import \
        flash_attention_bias_cm
    rng = np.random.RandomState(2)
    b, h, t, d = 2, 4, 300, 64
    qkv = jnp.asarray(rng.randn(b, h * 3 * d, t), dtype=jnp.float32)
    bias = jnp.asarray(rng.randn(h, t, t) * 0.3, dtype=jnp.float32)
    ref = qkv_attention(qkv, h, bias=bias)
    q, k, v = jnp.split(qkv.reshape(b, h, 3 * d, t), 3, axis=2)
    got = flash_attention_bias_cm(q, k, v, bias, interpret=True)
    got = got.reshape(b, h * d, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_bias_fused_qkv_matches():
    from tortoise_tts_tpu.ops.attention import qkv_attention
    from tortoise_tts_tpu.ops.pallas_attention import \
        flash_attention_bias_qkv
    rng = np.random.RandomState(3)
    b, h, t, d = 2, 4, 300, 64
    qkv = jnp.asarray(rng.randn(b, h * 3 * d, t), dtype=jnp.float32)
    bias = jnp.asarray(rng.randn(h, t, t) * 0.3, dtype=jnp.float32)
    ref = qkv_attention(qkv, h, bias=bias)
    got = flash_attention_bias_qkv(qkv, bias, h, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_flash_bias_kq_matches_xla():
    """Transposed-score kernel (interpret) == XLA qkv_attention with the
    same (untransposed) bias."""
    import jax
    import jax.numpy as jnp
    from tortoise_tts_tpu.ops.attention import qkv_attention
    from tortoise_tts_tpu.ops.pallas_attention import \
        flash_attention_bias_qkv_kq
    for (b, h, d, t) in ((2, 4, 64, 300), (1, 2, 64, 513)):
        qkv = jax.random.normal(jax.random.PRNGKey(0),
                                (b, h * 3 * d, t), jnp.float32) * 0.5
        bias = jax.random.normal(jax.random.PRNGKey(1), (h, t, t)) * 0.3
        ref = qkv_attention(qkv, h, bias=bias)
        got = flash_attention_bias_qkv_kq(qkv, jnp.swapaxes(bias, 1, 2),
                                          h, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_flash_bias_vt_matches_xla():
    """V-transposed row-major-score kernel (interpret) == XLA
    qkv_attention, incl. a non-128-multiple length (key padding path)
    and sub-full query blocking."""
    import jax
    import jax.numpy as jnp
    from tortoise_tts_tpu.ops.attention import qkv_attention
    from tortoise_tts_tpu.ops.pallas_attention import \
        flash_attention_bias_qkv_vt
    for (b, h, d, t, bq) in ((2, 4, 64, 300, 1024), (1, 2, 64, 513, 1024),
                             (1, 2, 64, 1100, 512)):
        qkv = jax.random.normal(jax.random.PRNGKey(0),
                                (b, h * 3 * d, t), jnp.float32) * 0.5
        bias = jax.random.normal(jax.random.PRNGKey(1), (h, t, t)) * 0.3
        ref = qkv_attention(qkv, h, bias=bias)
        got = flash_attention_bias_qkv_vt(qkv, bias, h, block_q=bq,
                                          interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_rel_biases_kq_static_over_jit():
    """RelBiases' orientation flag survives a jit boundary as static
    aux data, and the transposed build equals the transpose of the
    plain build."""
    import jax
    import jax.numpy as jnp
    from tortoise_tts_tpu.models import diffusion as dm
    cfg = dm.DiffusionConfig(model_channels=64, num_layers=2,
                             in_latent_channels=64, num_heads=4)
    p = dm.init(jax.random.PRNGKey(0), cfg)
    rb = dm.precompute_rel_biases(p, 33, cfg, jnp.float32)
    rbt = dm.precompute_rel_biases(p, 33, cfg, jnp.float32,
                                   transposed=True)
    assert rb["kq"] is False and rbt["kq"] is True
    for a, b in zip(rb["layers"], rbt["layers"]):
        np.testing.assert_allclose(np.asarray(jnp.swapaxes(a, 1, 2)),
                                   np.asarray(b), atol=1e-6)

    @jax.jit
    def through(r):
        return bool(r.get("kq")), r["layers"][0]

    kq_flag, _ = through(rbt)   # jit returns it as an array; the point
    assert bool(kq_flag)        # is that bool() didn't raise while tracing


def test_flash_bias_vt_fast_exp2():
    """TTS_FLASH_VT_EXP2: polynomial exp2 softmax stays within ~1e-4 of
    the exact-exp kernel (bf16 weight rounding is ~4e-3)."""
    import os
    import jax
    import jax.numpy as jnp
    from tortoise_tts_tpu.ops.pallas_attention import \
        flash_attention_bias_qkv_vt
    b, h, d, t = 2, 2, 64, 300
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, h * 3 * d, t),
                            jnp.float32) * 0.5
    bias = jax.random.normal(jax.random.PRNGKey(1), (h, t, t)) * 0.3
    exact = flash_attention_bias_qkv_vt(qkv, bias, h, interpret=True)
    os.environ["TTS_FLASH_VT_EXP2"] = "1"
    try:
        fast = flash_attention_bias_qkv_vt(qkv, bias, h, interpret=True)
    finally:
        os.environ.pop("TTS_FLASH_VT_EXP2", None)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact),
                               atol=2e-4, rtol=2e-4)


def test_flash_bias_vt_bf16_scores():
    """TTS_FLASH_VT_BF16: the score block rides VMEM as bf16 (halving
    the kernel's dominant elementwise traffic); accuracy stays within
    bf16 rounding of the XLA bf16-scores production path, which is the
    numerics precedent (ops/attention TTS_ATTN_BF16 default)."""
    import os
    import jax
    import jax.numpy as jnp
    from tortoise_tts_tpu.ops.attention import qkv_attention
    from tortoise_tts_tpu.ops.pallas_attention import \
        flash_attention_bias_qkv_vt
    b, h, d, t = 2, 2, 64, 300
    qkv = (jax.random.normal(jax.random.PRNGKey(0), (b, h * 3 * d, t))
           * 0.5).astype(jnp.bfloat16)
    bias = (jax.random.normal(jax.random.PRNGKey(1), (h, t, t))
            * 0.3).astype(jnp.bfloat16)
    ref = qkv_attention(qkv, h, bias=bias)  # bf16 scores by default
    os.environ["TTS_FLASH_VT_BF16"] = "1"
    try:
        got = flash_attention_bias_qkv_vt(qkv, bias, h, interpret=True)
    finally:
        os.environ.pop("TTS_FLASH_VT_BF16", None)
    r = np.asarray(ref, np.float32)
    g = np.asarray(got, np.float32)
    assert np.abs(g - r).max() / max(np.abs(r).max(), 1e-6) < 0.03


def test_trunk_flash_attention_grad_matches_xla(monkeypatch):
    """The GPT trunk's flash-attention path must be differentiable:
    _flash_trunk_attention runs the Pallas kernel forward (interpret
    here) and an XLA backward via custom_vjp — without it, full-scale
    training on real TPU died inside pallas_call's missing JVP rule."""
    import numpy as np
    from tortoise_tts_tpu.models import unified_voice as uvm
    from tortoise_tts_tpu.ops import pallas_attention as pa

    monkeypatch.setattr(
        uvm, "flash_attention",
        lambda q, k, v, key_mask=None, causal=True: pa.flash_attention(
            q, k, v, key_mask=key_mask, causal=causal, interpret=True))

    rng = np.random.RandomState(0)
    b, h, s, d = 2, 4, 48, 64
    q = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, h, s, d), jnp.float32)
    km = jnp.asarray(np.arange(s)[None, :] < np.asarray([[40], [48]]))

    def loss_flash(q, k, v):
        return jnp.sum(uvm._flash_trunk_attention(q, k, v, km) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(uvm._xla_trunk_attention(q, k, v, km) ** 2)

    lf, gf = jax.value_and_grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    lx, gx = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(float(lf), float(lx), rtol=1e-5)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# round 4: flash-decode kernel (ops/pallas_decode_attn)
# ---------------------------------------------------------------------------


def test_flash_decode_stacked_matches_mha_interpret():
    """Kernel (interpret mode) == masked XLA decode attention across
    positions, layers and text-padding masks."""
    import math
    from tortoise_tts_tpu.ops.attention import mha
    from tortoise_tts_tpu.ops.pallas_decode_attn import flash_decode_stacked
    rng = np.random.RandomState(0)
    L, B, H, S, Dh = 3, 2, 4, 256, 64
    ck = jnp.asarray(rng.randn(L, B, H, S, Dh).astype(np.float32))
    cv = jnp.asarray(rng.randn(L, B, H, S, Dh).astype(np.float32))
    q = jnp.asarray(rng.randn(B, H, Dh).astype(np.float32))
    key_mask = np.ones((B, S), bool)
    key_mask[0, 5:9] = False          # text padding holes
    key_mask[1, 200:240] = False      # a masked gap region
    key_mask = jnp.asarray(key_mask)

    for li in (0, 2):
        for pos in (0, 7, 127, 128, 200, 255):
            got = flash_decode_stacked(q, ck, cv, li, pos, key_mask,
                                       interpret=True)
            kc, vc = ck[li], cv[li]
            valid = np.asarray(key_mask) & (np.arange(S)[None] <= pos)
            want = mha(q[:, :, None], kc, vc,
                       mask=jnp.asarray(valid)[:, None, None, :])[:, :, 0]
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5, rtol=2e-5,
                                       err_msg=f"li={li} pos={pos}")


def test_decode_cache_gap_padding_token_exact(monkeypatch):
    """_use_flash_decode()=True pads the KV cache to a 128 multiple
    with a masked gap between prefill and decode region; greedy codes
    must be IDENTICAL to the unpadded decode (on CPU the kernel falls
    back to the same masked XLA math, so this isolates the padding
    arithmetic)."""
    from tortoise_tts_tpu.models import unified_voice as uv
    from tortoise_tts_tpu.ops.sampling import SamplingConfig
    cfg = uv.UnifiedVoiceConfig(layers=2, model_dim=64, heads=4,
                                max_text_tokens=40, max_mel_tokens=40)
    params = uv.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(1)
    text = jnp.asarray(rng.randint(3, 255, (2, 12)))
    cond = jnp.asarray(rng.randn(2, cfg.model_dim), dtype=jnp.float32)
    lengths = jnp.asarray([12, 9])

    def run():
        return uv.inference_speech(params, cond, text, lengths,
                                   jax.random.PRNGKey(3), cfg,
                                   SamplingConfig(greedy=True),
                                   max_length=16)

    def clear():
        # inference_speech wraps decode_start/chunk in its own jit —
        # all three caches must go or the patched _use_flash_decode is
        # never retraced
        uv.inference_speech.clear_cache()
        uv.decode_start.clear_cache()
        uv.decode_chunk.clear_cache()

    ref = run()
    monkeypatch.setattr(uv, "_use_flash_decode", lambda: True)
    clear()
    try:
        got = run()
        # the padded run really took the padded-cache branch
        st = uv.decode_start(params, cond, text, lengths,
                             jax.random.PRNGKey(3), cfg, 16)
        assert st.cache.k.shape[3] % 128 == 0
    finally:
        clear()
    np.testing.assert_array_equal(np.asarray(ref.codes),
                                  np.asarray(got.codes))
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(got.lengths))


def test_flash_bias_vt_prescale_and_noones():
    """TTS_FLASH_VT_PRESCALE (scale folded into q outside the kernel)
    and TTS_FLASH_VT_NOONES (dense-d AV + explicit row-sum normaliser)
    are bit-compatible restructurings: each, and their combination,
    matches the plain VT kernel within fp tolerance (interpret)."""
    import os
    import jax
    import jax.numpy as jnp
    from tortoise_tts_tpu.ops.pallas_attention import \
        flash_attention_bias_qkv_vt
    b, h, d, t = 2, 2, 64, 300
    qkv = jax.random.normal(jax.random.PRNGKey(0), (b, h * 3 * d, t),
                            jnp.float32) * 0.5
    bias = jax.random.normal(jax.random.PRNGKey(1), (h, t, t)) * 0.3
    ref = flash_attention_bias_qkv_vt(qkv, bias, h, interpret=True)
    for env in ({"TTS_FLASH_VT_PRESCALE": "1"},
                {"TTS_FLASH_VT_NOONES": "1"},
                {"TTS_FLASH_VT_PRESCALE": "1",
                 "TTS_FLASH_VT_NOONES": "1"}):
        for k, v in env.items():
            os.environ[k] = v
        try:
            got = flash_attention_bias_qkv_vt(qkv, bias, h,
                                              interpret=True)
        finally:
            for k in env:
                os.environ.pop(k, None)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-6, rtol=1e-5, err_msg=str(env))
