"""Shared-prefix candidate decode (inference_speech_shared).

All rows of a candidate fan-out share one [cond‖text‖start_mel] prefill
(reference inference.py:334 + 392-396 generates num_return_sequences
candidates of ONE prompt): the shared-prefix decode stores the prefill
K/V once at B=1 outside the while_loop carry and joins it with the
per-row decode region inside the attention (_mha_shared).  These tests
pin that the restructuring is a pure layout change: candidates match
the batched fan-out draw for draw.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tortoise_tts_tpu.models import unified_voice as uv
from tortoise_tts_tpu.ops.attention import mha
from tortoise_tts_tpu.ops.sampling import SamplingConfig

CFG = uv.UnifiedVoiceConfig(layers=2, model_dim=64, heads=4,
                            max_text_tokens=40, max_mel_tokens=80)


def _clear_decode_caches():
    uv.decode_start.clear_cache()
    uv.decode_chunk.clear_cache()
    uv.inference_speech.clear_cache()
    uv.inference_speech_shared.clear_cache()


@pytest.fixture(autouse=True)
def _fresh_caches():
    # env-keyed trace decisions (kmajor) must not leak between tests
    _clear_decode_caches()
    yield
    _clear_decode_caches()


def test_mha_shared_matches_full_attention():
    """Joint prefix+region softmax == full-cache attention on the same
    values (the split only changes accumulation order)."""
    rng = np.random.RandomState(0)
    b, h, hd, sp, sd = 3, 4, 16, 7, 11
    q = jnp.asarray(rng.randn(b, h, 1, hd), jnp.float32)
    kp = jnp.asarray(rng.randn(h, sp, hd), jnp.float32)
    vp = jnp.asarray(rng.randn(h, sp, hd), jnp.float32)
    kd = jnp.asarray(rng.randn(b, h, sd, hd), jnp.float32)
    vd = jnp.asarray(rng.randn(b, h, sd, hd), jnp.float32)
    pmask = jnp.asarray(rng.rand(1, sp) > 0.3)
    pos = 6
    mask = jnp.concatenate(
        [jnp.broadcast_to(pmask, (1, sp)), jnp.arange(sd)[None] <= pos],
        axis=1)[:, None, None, :]

    got = uv._mha_shared(q, kp, vp, kd, vd, mask, kmaj=False)
    got_km = uv._mha_shared(q, jnp.swapaxes(kp, -1, -2),
                            jnp.swapaxes(vp, -1, -2),
                            jnp.swapaxes(kd, -1, -2),
                            jnp.swapaxes(vd, -1, -2), mask, kmaj=True)

    k_full = jnp.concatenate([jnp.broadcast_to(kp, (b, h, sp, hd)), kd], 2)
    v_full = jnp.concatenate([jnp.broadcast_to(vp, (b, h, sp, hd)), vd], 2)
    ref = mha(q, k_full, v_full, mask=mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_km), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def _single_row_inputs(seed=4, tt=10):
    rng = np.random.RandomState(seed)
    text = jnp.asarray(rng.randint(3, 255, (1, tt)))
    cond = jnp.asarray(rng.randn(1, CFG.model_dim), dtype=jnp.float32)
    return cond, text, jnp.asarray([tt - 2])


def _fanout(params, cond, text, lengths, key, samp, rows, q,
            collect_latents=False):
    # the batched fan-out: repeated rows + the SAME single key (decode_start
    # fans it out per-row via fold_in, identically to the shared path)
    return uv.inference_speech(
        params, jnp.broadcast_to(cond, (rows, CFG.model_dim)),
        jnp.broadcast_to(text, (rows, text.shape[1])),
        jnp.broadcast_to(lengths, (rows,)), key, CFG, samp,
        max_length=48, collect_latents=collect_latents, qgpt=q,
        quant_mode="int8")


def _shared(params, cond, text, lengths, key, samp, rows, q,
            collect_latents=False):
    return uv.inference_speech_shared(
        params, cond, text, lengths, key, rows=rows, cfg=CFG,
        sampling=samp, max_length=48, collect_latents=collect_latents,
        qgpt=q, quant_mode="int8")


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_shared_prefix_matches_fanout_sampled(quant):
    params = uv.init(jax.random.PRNGKey(0), CFG)
    q = uv.quantize_decode_weights(params) if quant == "int8" else None
    cond, text, lengths = _single_row_inputs()
    samp = SamplingConfig(temperature=0.8, top_p=0.9,
                          repetition_penalty=2.0)
    key = jax.random.PRNGKey(7)
    ref = _fanout(params, cond, text, lengths, key, samp, 4, q)
    got = _shared(params, cond, text, lengths, key, samp, 4, q)
    np.testing.assert_array_equal(np.asarray(ref.codes),
                                  np.asarray(got.codes))
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(got.lengths))


def test_shared_prefix_matches_fanout_kmajor():
    params = uv.init(jax.random.PRNGKey(0), CFG)
    qgpt = uv.quantize_decode_weights(params)
    cond, text, lengths = _single_row_inputs(seed=5)
    samp = SamplingConfig(temperature=0.8, top_p=0.9,
                          repetition_penalty=2.0)
    key = jax.random.PRNGKey(11)
    ref = _fanout(params, cond, text, lengths, key, samp, 4, qgpt)
    old = os.environ.get("TTS_DECODE_KMAJOR")
    os.environ["TTS_DECODE_KMAJOR"] = "1"
    _clear_decode_caches()
    try:
        got = _shared(params, cond, text, lengths, key, samp, 4, qgpt)
        np.testing.assert_array_equal(np.asarray(ref.codes),
                                      np.asarray(got.codes))
        np.testing.assert_array_equal(np.asarray(ref.lengths),
                                      np.asarray(got.lengths))
    finally:
        if old is None:
            del os.environ["TTS_DECODE_KMAJOR"]
        else:
            os.environ["TTS_DECODE_KMAJOR"] = old


def test_shared_prefix_w8a8_and_latents():
    """w8a8 quant path + collect_latents through the shared decode."""
    params = uv.init(jax.random.PRNGKey(0), CFG)
    q8 = uv.quantize_decode_weights(params)   # same qdict, w8a8 mode
    cond, text, lengths = _single_row_inputs(seed=6)
    samp = SamplingConfig(temperature=0.7, top_k=40)
    key = jax.random.PRNGKey(3)

    def run(fn):
        return fn(params, cond, text, lengths, key, samp, 3, None,
                  collect_latents=True)

    ref = run(_fanout)
    got = run(_shared)
    np.testing.assert_array_equal(np.asarray(ref.codes),
                                  np.asarray(got.codes))
    np.testing.assert_allclose(np.asarray(ref.latents),
                               np.asarray(got.latents), atol=1e-4)

    ref8 = uv.inference_speech(
        params, jnp.broadcast_to(cond, (3, CFG.model_dim)),
        jnp.broadcast_to(text, (3, text.shape[1])),
        jnp.broadcast_to(lengths, (3,)), key, CFG, samp, max_length=48,
        qgpt=q8, quant_mode="w8a8")
    got8 = uv.inference_speech_shared(
        params, cond, text, lengths, key, rows=3, cfg=CFG, sampling=samp,
        max_length=48, qgpt=q8, quant_mode="w8a8")
    np.testing.assert_array_equal(np.asarray(ref8.codes),
                                  np.asarray(got8.codes))


def test_shared_prefix_respects_text_padding():
    """Prefix validity (text-pad masking) carries through the shared
    mask: rows must ignore padded text positions exactly like the
    fan-out decode (greedy => deterministic)."""
    params = uv.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(9)
    tt = 12
    text = jnp.asarray(rng.randint(3, 255, (1, tt)))
    cond = jnp.asarray(rng.randn(1, CFG.model_dim), dtype=jnp.float32)
    lengths = jnp.asarray([5])                 # rest of the bucket is pad
    samp = SamplingConfig(greedy=True)
    key = jax.random.PRNGKey(1)
    # changing the PAD content must not change the output
    text2 = text.at[:, 6:].set(7)
    got1 = _shared(params, cond, text, lengths, key, samp, 2, None)
    got2 = _shared(params, cond, text2, lengths, key, samp, 2, None)
    np.testing.assert_array_equal(np.asarray(got1.codes),
                                  np.asarray(got2.codes))
    ref = _fanout(params, cond, text, lengths, key, samp, 2, None)
    np.testing.assert_array_equal(np.asarray(ref.codes),
                                  np.asarray(got1.codes))


def test_grouped_shared_prefix_matches_fanout():
    """Batched serving shape: G=2 texts x C=3 candidates each — the
    grouped prefix (L,G,H,...) must reproduce the flat fan-out decode
    (6 repeated rows) token for token, with the group-major row order
    and per-row keys of the batch path."""
    params = uv.init(jax.random.PRNGKey(0), CFG)
    qgpt = uv.quantize_decode_weights(params)
    rng = np.random.RandomState(8)
    g, c, tt = 2, 3, 10
    text = jnp.asarray(rng.randint(3, 255, (g, tt)))
    cond = jnp.asarray(rng.randn(g, CFG.model_dim), dtype=jnp.float32)
    lengths = jnp.asarray([tt, tt - 3])
    samp = SamplingConfig(temperature=0.8, top_p=0.9,
                          repetition_penalty=2.0)
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(50 + gi), ci)
                      for gi in range(g) for ci in range(c)])
    for q in (None, qgpt):
        ref = uv.inference_speech(
            params, jnp.repeat(cond, c, axis=0),
            jnp.repeat(text, c, axis=0), jnp.repeat(lengths, c), keys,
            CFG, samp, max_length=48, qgpt=q, quant_mode="int8")
        got = uv.inference_speech_shared(
            params, cond, text, lengths, keys, rows=c, cfg=CFG,
            sampling=samp, max_length=48, qgpt=q, quant_mode="int8")
        np.testing.assert_array_equal(np.asarray(ref.codes),
                                      np.asarray(got.codes))
        np.testing.assert_array_equal(np.asarray(ref.lengths),
                                      np.asarray(got.lengths))


def test_grouped_shared_prefix_kmajor_matches_fanout():
    params = uv.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(12)
    g, c, tt = 2, 2, 9
    text = jnp.asarray(rng.randint(3, 255, (g, tt)))
    cond = jnp.asarray(rng.randn(g, CFG.model_dim), dtype=jnp.float32)
    lengths = jnp.asarray([tt, tt - 2])
    samp = SamplingConfig(temperature=0.9, top_k=50)
    keys = jnp.stack([jax.random.fold_in(jax.random.PRNGKey(gi), ci)
                      for gi in range(g) for ci in range(c)])
    ref = uv.inference_speech(
        params, jnp.repeat(cond, c, axis=0), jnp.repeat(text, c, axis=0),
        jnp.repeat(lengths, c), keys, CFG, samp, max_length=32)
    old = os.environ.get("TTS_DECODE_KMAJOR")
    os.environ["TTS_DECODE_KMAJOR"] = "1"
    _clear_decode_caches()
    try:
        got = uv.inference_speech_shared(
            params, cond, text, lengths, keys, rows=c, cfg=CFG,
            sampling=samp, max_length=32)
        np.testing.assert_array_equal(np.asarray(ref.codes),
                                      np.asarray(got.codes))
    finally:
        if old is None:
            del os.environ["TTS_DECODE_KMAJOR"]
        else:
            os.environ["TTS_DECODE_KMAJOR"] = old


def test_shared_prefix_rejects_bad_keys_and_layouts():
    params = uv.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(2)
    text = jnp.asarray(rng.randint(3, 255, (2, 8)))
    cond = jnp.asarray(rng.randn(2, CFG.model_dim), dtype=jnp.float32)
    # grouped (G>1) with a single key: per-row stream derivation is the
    # caller's contract (per group seed) — must not silently fold_in
    with pytest.raises(ValueError, match="per-row keys"):
        uv.decode_start(params, cond, text, jnp.asarray([8, 8]),
                        jax.random.PRNGKey(0), CFG, max_length=16,
                        shared_rows=4)
    old = os.environ.get("TTS_DECODE_PACKKV")
    os.environ["TTS_DECODE_PACKKV"] = "1"
    _clear_decode_caches()
    try:
        with pytest.raises(ValueError, match="packed-KV"):
            uv.decode_start(params, cond[:1], text[:1], jnp.asarray([8]),
                            jax.random.PRNGKey(0), CFG, max_length=16,
                            shared_rows=4)
    finally:
        if old is None:
            del os.environ["TTS_DECODE_PACKKV"]
        else:
            os.environ["TTS_DECODE_PACKKV"] = old
