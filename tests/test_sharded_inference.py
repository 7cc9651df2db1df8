"""Sharded batch inference on the virtual 8-device mesh.

Covers BASELINE configs #3 (candidate fan-out + CLVP scores across
chips) and #5 (data-parallel batch inference) at test scale.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tortoise_tts_tpu.models import clvp as clvp_m, unified_voice as uv
from tortoise_tts_tpu.ops.sampling import SamplingConfig
from tortoise_tts_tpu.parallel import mesh as pmesh

CFG = uv.UnifiedVoiceConfig(layers=2, model_dim=64, heads=4,
                            max_text_tokens=40, max_mel_tokens=32)


def test_batched_decode_sharded_over_data_axis():
    """8 utterances decoded with the batch sharded across 8 devices."""
    mesh = pmesh.make_mesh(data=8, model=1)
    params = uv.init(jax.random.PRNGKey(0), CFG)
    rng = np.random.RandomState(0)
    text = jnp.asarray(rng.randint(3, 255, (8, 12)))
    cond = jnp.asarray(rng.randn(8, CFG.model_dim), dtype=jnp.float32)
    lengths = jnp.full((8,), 12)

    res_ref = uv.inference_speech(params, cond, text, lengths,
                                  jax.random.PRNGKey(1), CFG,
                                  SamplingConfig(greedy=True), max_length=8)

    bs = NamedSharding(mesh, P("data"))
    text_s = jax.device_put(text, bs)
    cond_s = jax.device_put(cond, bs)
    lengths_s = jax.device_put(lengths, bs)
    res_dp = uv.inference_speech(params, cond_s, text_s, lengths_s,
                                 jax.random.PRNGKey(1), CFG,
                                 SamplingConfig(greedy=True), max_length=8)
    np.testing.assert_array_equal(np.asarray(res_ref.codes),
                                  np.asarray(res_dp.codes))


def test_candidate_fanout_with_sharded_clvp_scores():
    """16 candidates: decode + CLVP scoring with candidates on the data
    axis (the reference reranks on one GPU; here scores come back from a
    sharded forward — inference.py:392-396 capability at mesh scale)."""
    mesh = pmesh.make_mesh(data=8, model=1)
    cl_cfg = clvp_m.CLVPConfig(dim_text=32, dim_speech=32, dim_latent=32,
                               text_enc_depth=1, speech_enc_depth=1,
                               text_heads=2, speech_heads=2, dim_head=16,
                               rotary_dim=16)
    params = clvp_m.init(jax.random.PRNGKey(0), cl_cfg)
    rng = np.random.RandomState(0)
    text = jnp.asarray(np.tile(rng.randint(0, 256, (1, 12)), (16, 1)))
    codes = jnp.asarray(rng.randint(0, 8192, (16, 24)))

    scores_ref = clvp_m.forward(params, text, codes, cl_cfg)

    bs = NamedSharding(mesh, P("data"))
    scores_dp = jax.jit(
        lambda p, t, c: clvp_m.forward(p, t, c, cl_cfg))(
            params, jax.device_put(text, bs), jax.device_put(codes, bs))
    np.testing.assert_allclose(np.asarray(scores_dp),
                               np.asarray(scores_ref), atol=1e-5)
    assert int(jnp.argmax(scores_dp)) == int(jnp.argmax(scores_ref))
