"""Logit warper parity vs HF transformers implementations.

The reference drives sampling through HF generate() warpers
(unified_voice.py:659-666); ours are pure functions — verify identical
masking/scaling on random logits, including the reference's custom
TypicalLogitsWarper (unified_voice.py:47-75).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from tortoise_tts_tpu.ops import sampling as S
from tortoise_tts_tpu.ops.sampling import (SamplingConfig,
                                           apply_dynamic_temperature)


@pytest.fixture(scope="module")
def logits():
    rng = np.random.RandomState(0)
    return rng.randn(3, 50).astype(np.float32) * 3


def _masked_set(x):
    """Set of surviving token indices per row (finite values)."""
    return [set(np.nonzero(row > -1e8)[0]) for row in np.asarray(x)]


def test_top_k_matches_hf(logits):
    from transformers.generation.logits_process import TopKLogitsWarper
    hf = TopKLogitsWarper(top_k=7)
    ref = hf(None, torch.tensor(logits)).numpy()
    got = S.apply_top_k(jnp.asarray(logits), 7)
    assert _masked_set(got) == _masked_set(ref)


@pytest.mark.parametrize("p", [0.5, 0.9, 0.99])
def test_top_p_matches_hf(logits, p):
    from transformers.generation.logits_process import TopPLogitsWarper
    hf = TopPLogitsWarper(top_p=p)
    ref = hf(None, torch.tensor(logits)).numpy()
    got = S.apply_top_p(jnp.asarray(logits), p)
    assert _masked_set(got) == _masked_set(ref)


@pytest.mark.parametrize("p", [1e-9, 0.0])
def test_top_p_degenerate_keeps_argmax(logits, p):
    """min_tokens_to_keep=1: p ~ 0 must keep exactly the argmax, never
    mask the entire vocab (binary-search threshold is capped at the max
    probability)."""
    got = np.asarray(S.apply_top_p(jnp.asarray(logits), p))
    keep = got > -1e9
    assert (keep.sum(-1) == 1).all()
    assert (np.argmax(got, -1) == np.argmax(logits, -1)).all()


def test_repetition_penalty_matches_hf(logits):
    from transformers.generation.logits_process import \
        RepetitionPenaltyLogitsProcessor
    hf = RepetitionPenaltyLogitsProcessor(penalty=1.7)
    input_ids = torch.tensor([[1, 4, 4, 9], [0, 2, 3, 3], [5, 6, 7, 8]])
    ref = hf(input_ids, torch.tensor(logits)).numpy()
    counts = np.zeros((3, 50), np.int32)
    for b in range(3):
        for t in input_ids[b]:
            counts[b, int(t)] += 1
    got = np.asarray(S.apply_repetition_penalty(
        jnp.asarray(logits), jnp.asarray(counts), 1.7))
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_typical_matches_reference_warper(logits):
    from tests.ref.harness import import_ref
    ruv = import_ref("models.unified_voice")
    ref_warper = ruv.TypicalLogitsWarper(mass=0.8)
    ref = ref_warper(None, torch.tensor(logits)).numpy()
    got = S.apply_typical(jnp.asarray(logits), 0.8)
    assert _masked_set(got) == _masked_set(ref)


def test_greedy_and_temperature():
    logits = jnp.asarray([[1.0, 5.0, 2.0]])
    import jax
    tok = S.sample_token(jax.random.PRNGKey(0), logits,
                         S.SamplingConfig(greedy=True))
    assert int(tok[0]) == 1
    warped = S.apply_temperature(logits, 0.5)
    np.testing.assert_allclose(np.asarray(warped), np.asarray(logits) * 2)


def test_mirostat_step_runs():
    import jax
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(2, 200).astype(np.float32))
    mu = jnp.full((2,), 10.0)
    tok, new_mu = S.mirostat_step(jax.random.PRNGKey(0), logits, mu)
    assert tok.shape == (2,)
    assert np.isfinite(np.asarray(new_mu)).all()
    assert not np.allclose(np.asarray(new_mu), 10.0)


def test_mirostat_decode_reachable():
    """mirostat is reachable from the public decode API
    (SamplingConfig.mirostat_tau -> decode_chunk branch)."""
    import jax
    from tortoise_tts_tpu.models import unified_voice as uv
    cfg = uv.UnifiedVoiceConfig(layers=1, model_dim=32, heads=2,
                                max_text_tokens=20, max_mel_tokens=24)
    params = uv.init(jax.random.PRNGKey(0), cfg)
    text = jnp.asarray(np.random.RandomState(0).randint(3, 255, (1, 8)))
    res = uv.inference_speech(
        params, jnp.zeros((1, 32)), text, jnp.asarray([8]),
        jax.random.PRNGKey(1), cfg,
        SamplingConfig(mirostat_tau=5.0, mirostat_eta=0.1),
        max_length=16)
    codes = np.asarray(res.codes)
    assert codes.shape == (1, 16)
    assert (codes >= 0).all() and (codes < cfg.number_mel_codes).all()


def test_dynamic_temperature_and_length_penalty_decode():
    """dynamic temperature + stop-logit length penalty wired through
    SamplingConfig into the decode loop."""
    import jax
    from tortoise_tts_tpu.models import unified_voice as uv
    cfg = uv.UnifiedVoiceConfig(layers=1, model_dim=32, heads=2,
                                max_text_tokens=20, max_mel_tokens=24)
    params = uv.init(jax.random.PRNGKey(0), cfg)
    text = jnp.asarray(np.random.RandomState(0).randint(3, 255, (1, 8)))
    res_pen = uv.inference_speech(
        params, jnp.zeros((1, 32)), text, jnp.asarray([8]),
        jax.random.PRNGKey(1), cfg,
        SamplingConfig(temperature=0.9, min_temperature=0.3,
                       length_penalty_factor=2.0),
        max_length=16)
    assert np.asarray(res_pen.codes).shape == (1, 16)
    assert np.isfinite(np.asarray(res_pen.lengths)).all()


def test_dynamic_temperature_interpolates():
    logits = jnp.asarray(np.random.RandomState(0).randn(2, 50) * 3)
    hot = apply_dynamic_temperature(logits, 1.0, 0.999)
    np.testing.assert_allclose(np.asarray(hot), np.asarray(logits / 1.0),
                               rtol=1e-2)


def test_dynamic_temperature_matches_reference(logits):
    from tests.ref.harness import import_ref
    rs = import_ref("samplers")
    ref = rs.dynamic_temperature(torch.tensor(logits).clone(),
                                 temperature=0.9,
                                 min_temperature=0.3).numpy()
    got = np.asarray(apply_dynamic_temperature(jnp.asarray(logits),
                                               0.9, 0.3))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


def test_length_penalty_matches_reference(logits):
    from tests.ref.harness import import_ref
    rs = import_ref("samplers")
    stop_tok = 7
    for factor in (2.0, -1.0):
        for length in (3, 40):
            ref = rs.length_penalize(torch.tensor(logits).clone(),
                                     length=length, factor=factor,
                                     token=stop_tok).numpy()
            got = np.asarray(S.apply_length_penalty(
                jnp.asarray(logits[:, stop_tok]),
                jnp.asarray(length), factor))
            np.testing.assert_allclose(got, ref[:, stop_tok],
                                       atol=1e-5, rtol=1e-5)


def test_greedy_applies_processors():
    """HF greedy applies repetition penalty (a logits *processor*)
    before argmax; the reference also routes TypicalLogitsWarper through
    generate()'s logits_processor list (unified_voice.py:659), so both
    must shift the greedy argmax."""
    import jax
    logits = jnp.asarray([[1.0, 5.0, 4.0]])
    counts = jnp.asarray([[0, 3, 0]])
    tok = S.sample_token(jax.random.PRNGKey(0), logits,
                         S.SamplingConfig(greedy=True,
                                          repetition_penalty=2.0),
                         token_counts=counts)
    # 5.0/2.0 = 2.5 < 4.0 -> the repeat-penalized top-1 loses
    assert int(tok[0]) == 2


def test_mirostat_matches_reference_formula():
    """k (Zipf fit + round+1) and the mu update match the reference
    compute_k / surprise math (samplers.py:117-157) for the token our
    step sampled."""
    import jax, math
    rng = np.random.RandomState(2)
    logits = rng.randn(1, 500).astype(np.float32) * 2
    mu0 = 8.0
    tok, new_mu = S.mirostat_step(jax.random.PRNGKey(3),
                                  jnp.asarray(logits),
                                  jnp.full((1,), mu0), tau=4.0, eta=0.1)
    srt = np.sort(logits[0])[::-1]
    prob = np.exp(srt - srt.max())
    prob /= prob.sum()
    num = den = 0.0
    for i in range(100):
        b = prob[i] / prob[i + 1]
        t = (i + 2) / (i + 1)
        num += math.log(b) * math.log(t)
        den += math.log(t) ** 2
    s = num / den
    eps = s - 1
    k_ref = round(((eps * 2 ** mu0) / (1 - 500 ** -eps)) ** (1 / s)) + 1
    # the sampled token must come from the top-k_ref set
    rank = int(np.sum(logits[0] > logits[0, int(tok[0])]))
    assert rank < k_ref
    p_full = np.exp(logits[0] - logits[0].max())
    p_full /= p_full.sum()
    surprise = math.log2(1 / p_full[int(tok[0])])
    np.testing.assert_allclose(float(new_mu[0]),
                               mu0 - 0.1 * (surprise - 4.0), rtol=1e-3)
