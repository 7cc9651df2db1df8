"""Parity: TPU UnifiedVoice vs reference PyTorch UnifiedVoice (CPU golden).

Covers SURVEY §2.1 rows: UnifiedVoice fwd/losses/latents,
ConditioningEncoder, and the KV-cached greedy decode loop vs a manual
loop over the reference's GPT2InferenceModel semantics.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tortoise_tts_tpu.models import convert, unified_voice as uv
from tortoise_tts_tpu.ops.sampling import SamplingConfig

from tests.ref.harness import import_ref

CFG = uv.UnifiedVoiceConfig(layers=2, model_dim=64, heads=4,
                            max_text_tokens=50, max_mel_tokens=60)


@pytest.fixture(scope="module")
def ref_model():
    ruv = import_ref("models.unified_voice")
    torch.manual_seed(0)
    m = ruv.UnifiedVoice(layers=CFG.layers, model_dim=CFG.model_dim,
                         heads=CFG.heads, max_text_tokens=CFG.max_text_tokens,
                         max_mel_tokens=CFG.max_mel_tokens,
                         checkpointing=False)
    m.eval()
    return m


@pytest.fixture(scope="module")
def params(ref_model):
    return jax.tree_util.tree_map(
        jnp.asarray,
        convert.convert_unified_voice(ref_model.state_dict(), CFG.layers))


def test_conditioning_parity(ref_model, params):
    torch.manual_seed(1)
    mel = torch.randn(2, 1, 80, 120)
    with torch.no_grad():
        ref = ref_model.get_conditioning(mel).numpy()
    got = np.asarray(uv.get_conditioning(params, jnp.asarray(mel.numpy()), CFG))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def _rand_batch(b=2, tt=12, tm=20):
    rng = np.random.RandomState(2)
    text_lengths = np.array([tt, tt - 4])
    text = np.zeros((b, tt), dtype=np.int64)
    for i, l in enumerate(text_lengths):
        text[i, :l] = rng.randint(3, 255, size=l)
    mel_lengths = np.array([tm - 2, tm - 6])
    codes = rng.randint(0, 8192, size=(b, tm)).astype(np.int64)
    wav_lengths = mel_lengths * CFG.mel_length_compression
    return text, text_lengths, codes, wav_lengths


def test_forward_parity(ref_model, params):
    text, text_lengths, codes, wav_lengths = _rand_batch()
    cond = torch.randn(2, CFG.model_dim)
    with torch.no_grad():
        lt, lm, logits = ref_model(
            cond, torch.tensor(text), torch.tensor(text_lengths),
            torch.tensor(codes.copy()), torch.tensor(wav_lengths),
            clip_inputs=False)
    got_lt, got_lm, got_logits = uv.forward(
        params, jnp.asarray(cond.numpy()), jnp.asarray(text),
        jnp.asarray(text_lengths), jnp.asarray(codes),
        jnp.asarray(wav_lengths), CFG)
    np.testing.assert_allclose(float(got_lt), float(lt), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(float(got_lm), float(lm), atol=1e-4, rtol=1e-4)
    # reference returns (B, V, T) logits; ours (B, T, V)
    np.testing.assert_allclose(np.asarray(got_logits).transpose(0, 2, 1),
                               logits.numpy(), atol=2e-3, rtol=1e-3)


def test_latent_parity(ref_model, params):
    text, text_lengths, codes, wav_lengths = _rand_batch()
    cond = torch.randn(2, CFG.model_dim)
    with torch.no_grad():
        ref_lat = ref_model(
            cond, torch.tensor(text), torch.tensor(text_lengths),
            torch.tensor(codes.copy()), torch.tensor(wav_lengths),
            clip_inputs=False, return_latent=True).numpy()
    got = np.asarray(uv.forward(
        params, jnp.asarray(cond.numpy()), jnp.asarray(text),
        jnp.asarray(text_lengths), jnp.asarray(codes),
        jnp.asarray(wav_lengths), CFG, return_latent=True))
    np.testing.assert_allclose(got, ref_lat, atol=2e-4, rtol=1e-3)


def _ref_greedy_decode(ref_model, cond, text, max_steps):
    """Manual greedy loop mirroring inference_speech + GPT2InferenceModel
    (unified_voice.py:632-668, 178-254) without HF generate()."""
    import torch.nn.functional as F
    m = ref_model
    text_in = F.pad(torch.tensor(text), (0, 1), value=m.stop_text_token)
    text_in = F.pad(text_in, (1, 0), value=m.start_text_token)
    emb = m.text_embedding(text_in) + m.text_pos_embedding(text_in)
    conds = cond.unsqueeze(1)
    emb = torch.cat([conds, emb], dim=1)

    tokens = []
    past = None
    mel_len = emb.shape[1]
    with torch.no_grad():
        # prefill: [cond+text emb, start_mel emb @ mel pos 0]
        start = m.mel_embedding(torch.tensor([[m.start_mel_token]]))
        start = start + m.mel_pos_embedding.emb.weight[0]
        full = torch.cat([emb, start], dim=1)
        out = m.gpt(inputs_embeds=full, use_cache=True, return_dict=True)
        past = out.past_key_values
        hidden = out.last_hidden_state[:, -1]
        for step in range(max_steps):
            logits = m.mel_head(m.final_norm(hidden))
            tok = int(logits.argmax(-1))
            tokens.append(tok)
            if tok == m.stop_mel_token:
                break
            nxt = m.mel_embedding(torch.tensor([[tok]]))
            # HF GPT2InferenceModel feeds sampled tokens with position
            # attention_mask.shape[1]-mel_len = step+2 (the reference's
            # off-by-one: start_mel got 0, position 1 is never used) —
            # reference unified_voice.py:214
            nxt = nxt + m.mel_pos_embedding.emb.weight[step + 2]
            out = m.gpt(inputs_embeds=nxt, past_key_values=past,
                        use_cache=True, return_dict=True)
            past = out.past_key_values
            hidden = out.last_hidden_state[:, -1]
    return tokens


def _ref_hf_greedy_decode(ref_model, cond, text, max_steps):
    """Greedy loop through the reference's actual GPT2InferenceModel
    *forward* (unified_voice.py:178-254), driven exactly as HF
    generate() drives it: full-prompt prefill with fake input_ids, then
    one-token steps with a growing attention mask — so the reference's
    own ``attention_mask.shape[1] - mel_len`` position arithmetic picks
    the mel positions (the +2 quirk), not our re-derivation of it."""
    import torch.nn.functional as F
    m = ref_model
    if not hasattr(m, "inference_model"):
        m.post_init_gpt2_config(kv_cache=True)
    im = m.inference_model
    ti = F.pad(torch.tensor(text), (0, 1), value=m.stop_text_token)
    inp, _ = m.build_aligned_inputs_and_targets(
        ti, m.start_text_token, m.stop_text_token)
    emb = m.text_embedding(inp) + m.text_pos_embedding(inp)
    emb = torch.cat([cond.unsqueeze(1), emb], dim=1)
    im.store_mel_emb(emb)
    fake = torch.full((1, 1 + emb.shape[1]), 1, dtype=torch.long)
    fake[:, -1] = m.start_mel_token
    tokens, past, n = [], None, fake.shape[1]
    with torch.no_grad():
        out = im(input_ids=fake, attention_mask=torch.ones_like(fake),
                 use_cache=True, return_dict=True)
        for _ in range(max_steps):
            past = out.past_key_values
            tok = int(out.logits[:, -1].argmax(-1))
            tokens.append(tok)
            if tok == m.stop_mel_token:
                break
            n += 1
            out = im(input_ids=torch.tensor([[tok]]),
                     attention_mask=torch.ones((1, n), dtype=torch.long),
                     past_key_values=past, use_cache=True, return_dict=True)
    return tokens


def test_greedy_decode_parity(ref_model, params):
    rng = np.random.RandomState(3)
    text = rng.randint(3, 255, size=(1, 10)).astype(np.int64)
    cond = torch.randn(1, CFG.model_dim)
    max_steps = 24

    ref_tokens = _ref_greedy_decode(ref_model, cond, text, max_steps)
    # the manual loop must agree with the reference's own inference
    # forward — pins the mel-position quirk to the real torch code path
    assert ref_tokens == _ref_hf_greedy_decode(ref_model, cond, text,
                                               max_steps)

    res = uv.inference_speech(
        params, jnp.asarray(cond.numpy()), jnp.asarray(text),
        jnp.asarray([text.shape[1]]), jax.random.PRNGKey(0), CFG,
        SamplingConfig(greedy=True), max_length=max_steps,
        collect_latents=True)
    got = np.asarray(res.codes[0])
    n = len([t for t in ref_tokens if t != CFG.stop_mel_token])
    np.testing.assert_array_equal(got[:n], ref_tokens[:n])
    # stop bookkeeping: rows are stop-padded after length
    assert np.all(got[n:] == CFG.stop_mel_token)


def test_int8_decode_quant(params):
    """Weight-only int8 decode: _qlinear numerics stay within per-channel
    quantization error, and the greedy decode with qgpt matches the bf16
    trunk's codes on a small model (quantization noise << logit margins
    here; on the 1024-d production model the measured trunk error is
    ~0.1% relative)."""
    rng = np.random.RandomState(5)
    qgpt = jax.jit(uv.quantize_decode_weights)(params)
    # numerics: dequantized GEMV ~= full-precision GEMV
    w = np.asarray(params["gpt"]["attn_qkv"]["w"][0])
    x = jnp.asarray(rng.randn(1, w.shape[0]).astype(np.float32))
    lp = {k: v[0] for k, v in qgpt["attn_qkv"].items()}
    got = np.asarray(uv._qlinear(lp, x))
    want = np.asarray(x @ w + np.asarray(params["gpt"]["attn_qkv"]["b"][0]))
    err = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert err < 2e-2, err

    text = rng.randint(3, 255, size=(1, 10)).astype(np.int64)
    cond = jnp.asarray(rng.randn(1, CFG.model_dim).astype(np.float32))
    res = uv.inference_speech(
        params, cond, jnp.asarray(text), jnp.asarray([10]),
        jax.random.PRNGKey(0), CFG, SamplingConfig(greedy=True),
        max_length=16)
    res_q = uv.inference_speech(
        params, cond, jnp.asarray(text), jnp.asarray([10]),
        jax.random.PRNGKey(0), CFG, SamplingConfig(greedy=True),
        max_length=16, qgpt=qgpt)
    agree = np.mean(np.asarray(res.codes) == np.asarray(res_q.codes))
    assert agree >= 0.75, agree


def test_decode_respects_text_padding(params):
    """Padded text + mask must give identical codes to exact-length text."""
    rng = np.random.RandomState(4)
    text = rng.randint(3, 255, size=(1, 8)).astype(np.int64)
    cond = jnp.asarray(rng.randn(1, CFG.model_dim).astype(np.float32))
    res_exact = uv.inference_speech(
        params, cond, jnp.asarray(text), jnp.asarray([8]),
        jax.random.PRNGKey(0), CFG, SamplingConfig(greedy=True), max_length=12)
    padded = np.pad(text, ((0, 0), (0, 6)))
    res_pad = uv.inference_speech(
        params, cond, jnp.asarray(padded), jnp.asarray([8]),
        jax.random.PRNGKey(0), CFG, SamplingConfig(greedy=True), max_length=12)
    np.testing.assert_array_equal(np.asarray(res_exact.codes),
                                  np.asarray(res_pad.codes))


def test_qgemv_stacked_kernel_parity():
    """ops/pallas_gemv.qgemv_stacked (interpret mode) matches the plain
    dequantized GEMV for every layer index, with (L,N)/(N,)/no bias."""
    import jax
    import jax.numpy as jnp
    from tortoise_tts_tpu.ops.pallas_gemv import qgemv_stacked
    rng = np.random.RandomState(0)
    L, K, N, M = 3, 256, 1024, 2
    w = jnp.asarray(rng.randn(L, K, N).astype(np.float32)) * 0.02
    s = jnp.max(jnp.abs(w), axis=1) / 127.0 + 1e-12
    wq = jnp.round(w / s[:, None, :]).astype(jnp.int8)
    b2 = jnp.asarray(rng.randn(L, N).astype(np.float32)) * 0.1
    b1 = jnp.asarray(rng.randn(N).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    for bias in (b2, b1, None):
        for li in range(L):
            ref = jnp.dot(x, wq[li].astype(x.dtype),
                          preferred_element_type=jnp.float32) * s[li]
            if bias is not None:
                ref = ref + (bias[li] if bias.ndim == 2 else bias)
            got = qgemv_stacked(x, wq, s, bias, li, interpret=True)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(ref.astype(x.dtype)),
                                       atol=2e-5, rtol=1e-5)


def test_qgemv_fused_ln_parity():
    """Fused-LayerNorm GEMV kernels (interpret mode) == layer_norm +
    plain GEMV, for both the weight-only and w8a8 kernels, at every
    layer index."""
    import jax
    import jax.numpy as jnp
    from tortoise_tts_tpu.models.common import layer_norm
    from tortoise_tts_tpu.ops.pallas_gemv import (qgemv_stacked,
                                                  qgemv_stacked_w8a8)
    rng = np.random.RandomState(4)
    L, K, N, M = 3, 256, 512, 2
    w = jnp.asarray(rng.randn(L, K, N).astype(np.float32)) * 0.02
    s = jnp.max(jnp.abs(w), axis=1) / 127.0 + 1e-12
    wq = jnp.round(w / s[:, None, :]).astype(jnp.int8)
    bias = jnp.asarray(rng.randn(L, N).astype(np.float32)) * 0.1
    g = jnp.asarray(1.0 + 0.1 * rng.randn(L, K).astype(np.float32))
    be = jnp.asarray(0.1 * rng.randn(L, K).astype(np.float32))
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    for li in range(L):
        xn = layer_norm({"scale": g[li], "bias": be[li]}, x)
        ref = qgemv_stacked(xn, wq, s, bias, li, interpret=True)
        got = qgemv_stacked(x, wq, s, bias, li, interpret=True,
                            ln=(g, be))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, rtol=1e-5)
        ref8 = qgemv_stacked_w8a8(xn, wq, s, bias, li, interpret=True)
        got8 = qgemv_stacked_w8a8(x, wq, s, bias, li, interpret=True,
                                  ln=(g, be))
        np.testing.assert_allclose(np.asarray(got8), np.asarray(ref8),
                                   atol=3e-5, rtol=1e-5)


def test_qgemv_stacked_w8a8_kernel_parity():
    """ops/pallas_gemv.qgemv_stacked_w8a8 (interpret mode — the real
    kernel, not the XLA fallback) matches the int32-dot reference for
    every layer index, with (L,N)/(N,)/no bias."""
    import jax
    import jax.numpy as jnp
    from tortoise_tts_tpu.ops.pallas_gemv import (qgemv_stacked_w8a8,
                                                  quantize_rowwise)
    rng = np.random.RandomState(0)
    L, K, N, M = 3, 256, 1024, 2
    w = jnp.asarray(rng.randn(L, K, N).astype(np.float32)) * 0.02
    s = jnp.max(jnp.abs(w), axis=1) / 127.0 + 1e-12
    wq = jnp.round(w / s[:, None, :]).astype(jnp.int8)
    b2 = jnp.asarray(rng.randn(L, N).astype(np.float32)) * 0.1
    b1 = jnp.asarray(rng.randn(N).astype(np.float32)) * 0.1
    x = jnp.asarray(rng.randn(M, K).astype(np.float32))
    xq, sx = quantize_rowwise(x)
    for bias in (b2, b1, None):
        for li in range(L):
            ref = jax.lax.dot_general(
                xq.astype(jnp.int32), wq[li].astype(jnp.int32),
                (((1,), (0,)), ((), ()))).astype(jnp.float32) * sx * s[li]
            if bias is not None:
                ref = ref + (bias[li] if bias.ndim == 2 else bias)
            got = qgemv_stacked_w8a8(x, wq, s, bias, li, interpret=True)
            np.testing.assert_allclose(np.asarray(got),
                                       np.asarray(ref.astype(x.dtype)),
                                       atol=2e-5, rtol=1e-5)


def test_w8a8_decode_quant(params):
    """W8A8 decode (dynamic activation quant + int8 dot): codes mostly
    agree with the bf16 trunk on a small model, and the w8a8 GEMV error
    vs full precision stays within combined quantization error."""
    import jax
    import jax.numpy as jnp
    from tortoise_tts_tpu.ops.pallas_gemv import qgemv_stacked_w8a8
    rng = np.random.RandomState(7)
    qgpt = jax.jit(uv.quantize_decode_weights)(params)
    w = np.asarray(params["gpt"]["attn_qkv"]["w"])
    x = jnp.asarray(rng.randn(1, w.shape[1]).astype(np.float32))
    got = np.asarray(qgemv_stacked_w8a8(
        x, qgpt["attn_qkv"]["wq"], qgpt["attn_qkv"]["s"],
        qgpt["attn_qkv"].get("b"), 0))
    want = np.asarray(x @ w[0] + np.asarray(params["gpt"]["attn_qkv"]["b"][0]))
    rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
    assert rel < 4e-2, rel

    text = rng.randint(3, 255, size=(1, 10)).astype(np.int64)
    cond = jnp.asarray(rng.randn(1, CFG.model_dim).astype(np.float32))
    res = uv.inference_speech(
        params, cond, jnp.asarray(text), jnp.asarray([10]),
        jax.random.PRNGKey(0), CFG, SamplingConfig(greedy=True),
        max_length=16)
    res_q = uv.inference_speech(
        params, cond, jnp.asarray(text), jnp.asarray([10]),
        jax.random.PRNGKey(0), CFG, SamplingConfig(greedy=True),
        max_length=16, qgpt=qgpt, quant_mode="w8a8")
    agree = np.mean(np.asarray(res.codes) == np.asarray(res_q.codes))
    assert agree >= 0.6, agree


def test_decode_ladder_token_exact():
    """The attention ladder (chunked decode with static attn_len reads)
    is bit-identical to the single full-budget chunk: dropped cache
    positions contribute exact softmax zeros (round-4 chip finding —
    the cache read is the whole batch-decode gap)."""
    from tortoise_tts_tpu.ops.sampling import SamplingConfig
    cfg = uv.UnifiedVoiceConfig(layers=2, model_dim=64, heads=4,
                                max_text_tokens=40, max_mel_tokens=80)
    params = uv.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(2)
    text = jnp.asarray(rng.randint(3, 255, (2, 10)))
    cond = jnp.asarray(rng.randn(2, cfg.model_dim), dtype=jnp.float32)
    lengths = jnp.asarray([10, 7])
    for samp in (SamplingConfig(greedy=True),
                 SamplingConfig(temperature=0.8, top_p=0.9,
                                repetition_penalty=2.0)):
        full = uv.inference_speech(params, cond, text, lengths,
                                   jax.random.PRNGKey(5), cfg, samp,
                                   max_length=50, decode_chunk_size=0)
        lad = uv.inference_speech(params, cond, text, lengths,
                                  jax.random.PRNGKey(5), cfg, samp,
                                  max_length=50, decode_chunk_size=16)
        np.testing.assert_array_equal(np.asarray(full.codes),
                                      np.asarray(lad.codes))
        np.testing.assert_array_equal(np.asarray(full.lengths),
                                      np.asarray(lad.lengths))


def test_decode_packed_kv_token_exact():
    """TTS_DECODE_PACKKV=1 (K||V of each head packed into one 128-lane
    cache row — dense TPU tiling vs the 2x-padded split buffers) is
    bit-identical to the split-cache decode: same values, same dots,
    only the storage layout changes."""
    import os
    from tortoise_tts_tpu.ops.sampling import SamplingConfig
    cfg = uv.UnifiedVoiceConfig(layers=2, model_dim=64, heads=4,
                                max_text_tokens=40, max_mel_tokens=80)
    params = uv.init(jax.random.PRNGKey(0), cfg)
    qgpt = uv.quantize_decode_weights(params)
    rng = np.random.RandomState(4)
    text = jnp.asarray(rng.randint(3, 255, (2, 10)))
    cond = jnp.asarray(rng.randn(2, cfg.model_dim), dtype=jnp.float32)
    lengths = jnp.asarray([10, 7])
    samp = SamplingConfig(temperature=0.8, top_p=0.9,
                          repetition_penalty=2.0)

    def run(q):
        return uv.inference_speech(params, cond, text, lengths,
                                   jax.random.PRNGKey(5), cfg, samp,
                                   max_length=50, qgpt=q,
                                   quant_mode="int8")

    refs = [run(None), run(qgpt)]
    old = os.environ.get("TTS_DECODE_PACKKV")
    os.environ["TTS_DECODE_PACKKV"] = "1"
    uv.decode_start.clear_cache()
    uv.decode_chunk.clear_cache()
    try:
        for ref, q in zip(refs, (None, qgpt)):
            got = run(q)
            np.testing.assert_array_equal(np.asarray(ref.codes),
                                          np.asarray(got.codes))
            np.testing.assert_array_equal(np.asarray(ref.lengths),
                                          np.asarray(got.lengths))
    finally:
        if old is None:
            del os.environ["TTS_DECODE_PACKKV"]
        else:
            os.environ["TTS_DECODE_PACKKV"] = old
        uv.decode_start.clear_cache()
        uv.decode_chunk.clear_cache()


def test_decode_kmajor_token_exact():
    """TTS_DECODE_KMAJOR=1 ((L,B,H,hd,S) hd-major cache — S in the
    lane dim so reads stream dense instead of 2x-lane-padded) matches
    the split-cache decode token-for-token: the dots contract the same
    values, only the storage layout changes.  Covers the sampled path
    (fp + int8) and beam search (which transposes after its own
    prefill)."""
    import os
    from tortoise_tts_tpu.ops.sampling import SamplingConfig
    cfg = uv.UnifiedVoiceConfig(layers=2, model_dim=64, heads=4,
                                max_text_tokens=40, max_mel_tokens=80)
    params = uv.init(jax.random.PRNGKey(0), cfg)
    qgpt = uv.quantize_decode_weights(params)
    rng = np.random.RandomState(4)
    text = jnp.asarray(rng.randint(3, 255, (2, 10)))
    cond = jnp.asarray(rng.randn(2, cfg.model_dim), dtype=jnp.float32)
    lengths = jnp.asarray([10, 7])
    samp = SamplingConfig(temperature=0.8, top_p=0.9,
                          repetition_penalty=2.0)

    def run(q):
        return uv.inference_speech(params, cond, text, lengths,
                                   jax.random.PRNGKey(5), cfg, samp,
                                   max_length=50, qgpt=q,
                                   quant_mode="int8")

    def run_beam():
        return uv.inference_speech_beam(params, cond, text, lengths,
                                        cfg, num_beams=3, max_length=30)

    refs = [run(None), run(qgpt)]
    ref_beam = run_beam()
    old = os.environ.get("TTS_DECODE_KMAJOR")
    os.environ["TTS_DECODE_KMAJOR"] = "1"
    uv.decode_start.clear_cache()
    uv.decode_chunk.clear_cache()
    try:
        for ref, q in zip(refs, (None, qgpt)):
            got = run(q)
            np.testing.assert_array_equal(np.asarray(ref.codes),
                                          np.asarray(got.codes))
            np.testing.assert_array_equal(np.asarray(ref.lengths),
                                          np.asarray(got.lengths))
        got_beam = run_beam()
        np.testing.assert_array_equal(np.asarray(ref_beam.codes),
                                      np.asarray(got_beam.codes))
    finally:
        if old is None:
            del os.environ["TTS_DECODE_KMAJOR"]
        else:
            os.environ["TTS_DECODE_KMAJOR"] = old
        uv.decode_start.clear_cache()
        uv.decode_chunk.clear_cache()


def test_decode_static_unroll_token_exact():
    """TTS_DECODE_UNROLL=full (Python-unrolled layer loop with static
    layer indices — the cache read becomes a static slice of the carry)
    is bit-identical to the scanned decode, sampled and greedy, with
    and without int8 quantization."""
    import os
    from tortoise_tts_tpu.ops.sampling import SamplingConfig
    cfg = uv.UnifiedVoiceConfig(layers=2, model_dim=64, heads=4,
                                max_text_tokens=40, max_mel_tokens=80)
    params = uv.init(jax.random.PRNGKey(0), cfg)
    qgpt = uv.quantize_decode_weights(params)
    rng = np.random.RandomState(3)
    text = jnp.asarray(rng.randint(3, 255, (2, 10)))
    cond = jnp.asarray(rng.randn(2, cfg.model_dim), dtype=jnp.float32)
    lengths = jnp.asarray([10, 7])
    samp = SamplingConfig(temperature=0.8, top_p=0.9,
                          repetition_penalty=2.0)

    def run(q):
        return uv.inference_speech(params, cond, text, lengths,
                                   jax.random.PRNGKey(5), cfg, samp,
                                   max_length=50, qgpt=q,
                                   quant_mode="int8")

    refs = [run(None), run(qgpt)]
    old = os.environ.get("TTS_DECODE_UNROLL")
    os.environ["TTS_DECODE_UNROLL"] = "full"
    uv.decode_chunk.clear_cache()
    try:
        for ref, q in zip(refs, (None, qgpt)):
            got = run(q)
            np.testing.assert_array_equal(np.asarray(ref.codes),
                                          np.asarray(got.codes))
            np.testing.assert_array_equal(np.asarray(ref.lengths),
                                          np.asarray(got.lengths))
    finally:
        if old is None:
            del os.environ["TTS_DECODE_UNROLL"]
        else:
            os.environ["TTS_DECODE_UNROLL"] = old
        uv.decode_chunk.clear_cache()
