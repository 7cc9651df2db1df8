"""Parity: CLVP, DVAE, RLG, classifier + tokenizer vs references."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tortoise_tts_tpu.models import (classifier as clf, clvp as clvp_m,
                                     convert, dvae as dvae_m, rlg as rlg_m)
from tortoise_tts_tpu import tokenizer as tok

from tests.ref.harness import import_ref


def test_clvp_parity():
    rclvp = import_ref("models.clvp")
    torch.manual_seed(0)
    # xtransformers keeps dim_head at its default 64 regardless of
    # dim/heads (xtransformers.py:772)
    cfg = clvp_m.CLVPConfig(dim_text=64, dim_speech=64, dim_latent=64,
                            text_enc_depth=2, speech_enc_depth=2,
                            text_heads=4, speech_heads=4, dim_head=64,
                            rotary_dim=32)
    m = rclvp.CLVP(dim_text=64, dim_speech=64, dim_latent=64,
                   text_enc_depth=2, speech_enc_depth=2, text_heads=4,
                   speech_heads=4, use_xformers=True)
    m.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert.convert_clvp(m.state_dict(), depth=2))
    text = torch.randint(0, 256, (3, 20))
    speech = torch.randint(0, 8192, (3, 40))
    with torch.no_grad():
        ref_sim = m(text, speech, return_loss=False).numpy()
        ref_loss = float(m(text, speech, return_loss=True))
    got_sim = np.asarray(clvp_m.forward(params, jnp.asarray(text.numpy()),
                                        jnp.asarray(speech.numpy()), cfg))
    np.testing.assert_allclose(got_sim, ref_sim, atol=1e-3, rtol=1e-3)
    got_loss = float(clvp_m.forward(params, jnp.asarray(text.numpy()),
                                    jnp.asarray(speech.numpy()), cfg,
                                    return_loss=True))
    np.testing.assert_allclose(got_loss, ref_loss, atol=1e-4, rtol=1e-4)


def test_clvp_rerank_selects_best():
    """Candidate reranking semantics (inference.py:392-396)."""
    cfg = clvp_m.CLVPConfig(dim_text=32, dim_speech=32, dim_latent=32,
                            text_enc_depth=1, speech_enc_depth=1,
                            text_heads=2, speech_heads=2, dim_head=16,
                            rotary_dim=16)
    params = clvp_m.init(jax.random.PRNGKey(0), cfg)
    text = jnp.tile(jnp.arange(10)[None], (4, 1))
    speech = jax.random.randint(jax.random.PRNGKey(1), (4, 16), 0, 8192)
    scores = clvp_m.forward(params, text, speech, cfg)
    assert scores.shape == (4,)
    best = int(jnp.argmax(scores))
    assert 0 <= best < 4


DVAE_CFG = dvae_m.DVAEConfig()


def test_dvae_codes_and_decode_parity():
    rdvae = import_ref("models.dvae")
    torch.manual_seed(1)
    m = rdvae.DiscreteVAE()
    m.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert.convert_dvae(m.state_dict()))
    mel = torch.randn(2, 80, 64)
    with torch.no_grad():
        ref_codes = m.get_codebook_indices(mel).numpy()
    got_codes = np.asarray(dvae_m.get_codebook_indices(
        params, jnp.asarray(mel.numpy()), DVAE_CFG))
    np.testing.assert_array_equal(got_codes, ref_codes)
    with torch.no_grad():
        ref_dec = m.decode(torch.tensor(ref_codes))[0].numpy()
    got_dec = np.asarray(dvae_m.decode(params, jnp.asarray(got_codes),
                                       DVAE_CFG))
    np.testing.assert_allclose(got_dec, ref_dec, atol=2e-4, rtol=1e-3)


def test_dvae_ema_update_moves_codebook():
    params = dvae_m.init(jax.random.PRNGKey(0), dvae_m.DVAEConfig(
        num_tokens=64, codebook_dim=16, hidden_dim=32))
    cfg = dvae_m.DVAEConfig(num_tokens=64, codebook_dim=16, hidden_dim=32)
    mel = jax.random.normal(jax.random.PRNGKey(1), (2, 80, 32))
    _, commit, recon, codes, new_state = dvae_m.forward(
        params, mel, cfg, training=True)
    assert not np.allclose(np.asarray(new_state.cluster_size),
                           np.asarray(params["codebook"]["cluster_size"]))
    assert np.isfinite(float(commit))


def test_dvae_codes_bucketed_matches_exact():
    """emb.mel pads full-utterance mels to a frame bucket (one relay
    compile per bucket instead of per segment length); edge padding may
    only perturb codes within the encoder's receptive field of the true
    end — the prefix must be exact and the count unchanged."""
    from types import SimpleNamespace
    import tortoise_tts_tpu.emb.mel as emel
    cfg = dvae_m.DVAEConfig(num_tokens=64, codebook_dim=16, hidden_dim=32)
    params = dvae_m.init(jax.random.PRNGKey(0), cfg)
    loaded = SimpleNamespace(params=params, config=cfg)
    for t in (100, 256, 301):
        mel = jax.random.normal(jax.random.PRNGKey(t), (1, 80, t))
        exact = np.asarray(dvae_m.get_codebook_indices(params, mel, cfg))
        got = np.asarray(emel._dvae_codes_bucketed(loaded, mel))
        assert got.shape == exact.shape
        # receptive-field tail: allow the last few codes to differ
        tail = 8
        np.testing.assert_array_equal(got[:, :-tail], exact[:, :-tail])


def test_rlg_parity():
    rrlg = import_ref("models.random_latent_generator")
    torch.manual_seed(2)
    m = rrlg.RandomLatentConverter(64)
    m.eval()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert.convert_rlg(m.state_dict()))
    noise = torch.randn(3, 64)
    with torch.no_grad():
        ref = m.layers(noise).numpy()
    got = np.asarray(rlg_m.forward(params, jnp.asarray(noise.numpy())))
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-3)


def test_classifier_forward():
    """NOTE: the reference classifier cannot be constructed against its own
    arch_utils (classifier.py:111 passes do_checkpoint= to AttentionBlock,
    which only accepts use_checkpoint — a reference bug), so golden parity
    is impossible; we verify our classifier's structure/shapes instead.
    Shrunk from the published classifier.pth architecture (spec_dim=1 raw
    audio, base 32, depth 5, downsample 4, kernel 5)."""
    cfg = clf.ClassifierConfig(embedding_dim=64, depth=2)
    params = clf.init(jax.random.PRNGKey(0), cfg)
    # depth=2 x downsample 4 = 16x reduction; raw audio input
    wav = jnp.asarray(np.random.RandomState(0).randn(2, 1, 256),
                      dtype=jnp.float32)
    logits = clf.forward(params, wav, cfg)
    assert logits.shape == (2, 2)
    assert bool(jnp.isfinite(logits).all())


def test_classifier_checkpoint_shape_contract():
    """init() at published defaults produces the exact parameter tree the
    classifier.pth converter expects: depth=5 (10 res + 5 downs), enc.init
    conv (32, 1, 3), final norm/conv over 32*2**5=1024 channels."""
    params = clf.init(jax.random.PRNGKey(0))
    assert params["enc"]["init"]["w"].shape == (32, 1, 3)
    res = params["enc"]["res"]
    assert len(res) == 15 and sum("down" in b for b in res) == 5
    assert params["enc"]["final_conv"]["w"].shape == (512, 1024, 1)
    assert params["head"]["w"].shape == (512, 2)


# ---------------------------------------------------------------------------
# tokenizer
# ---------------------------------------------------------------------------


def test_bpe_matches_hf_tokenizers():
    """Our pure-python BPE vs the HF tokenizers runtime on the same file."""
    from tokenizers import Tokenizer
    hf = Tokenizer.from_file("/root/reference/data/tokenizer.json")
    ours = tok.VoiceBpeTokenizer("/root/reference/data/tokenizer.json")
    samples = [
        "hello world", "the quick brown fox jumps over the lazy dog",
        "it costs money, obviously!", "what? where... when; why:",
        "supercalifragilisticexpialidocious",
    ]
    for s in samples:
        cleaned = ours.preprocess_text(s).replace(" ", "[SPACE]")
        ref_ids = hf.encode(cleaned).ids
        got_ids = ours.encode(s)
        assert got_ids == ref_ids, (s, got_ids, ref_ids)


def test_cleaners():
    c = tok.english_cleaners
    assert c("Mr. Smith") == "mister smith"
    assert c("Dr. Who?") == "doctor who?"
    assert c("I have $5.50") == "i have five dollars, fifty cents"
    assert c("born in 1985") == "born in nineteen eighty-five"
    assert c("in 1905") == "in nineteen oh five"
    assert c("the year 2000") == "the year two thousand"
    assert c("in 2007") == "in two thousand seven"
    assert c("chapter 3.5") == "chapter three point five"
    assert c("the 2nd time") == "the second time"
    assert c("the 23rd") == "the twenty-third"
    assert c("100 things") == "one hundred things"
    assert c('say "hi"') == "say hi"
    assert c("café naïve") == "cafe naive"
    # the reference's _expand_number treats 1000<n<3000 as a year
    # (tokenizer.py:88-100): 1,234 -> group-of-two reading
    assert c("1,234 items") == "twelve thirty-four items"
    assert c("3,456 items") == "three thousand, four hundred fifty-six items"


def test_tokenizer_roundtrip():
    t = tok.VoiceBpeTokenizer("/root/reference/data/tokenizer.json")
    ids = t.encode("hello world")
    assert t.decode(ids) == "hello world"
    assert all(0 <= i < 256 for i in ids)


def test_legacy_transformer_tower_parity():
    """Non-xformers CLVP tower (reference transformer.py Transformer)."""
    rt = import_ref("models.transformer")
    torch.manual_seed(7)
    m = rt.Transformer(dim=64, depth=2, seq_len=32, causal=False, heads=4,
                       dim_head=16)
    m.eval()
    from tortoise_tts_tpu.models.clvp import legacy_encoder
    params = jax.tree_util.tree_map(
        jnp.asarray, convert.convert_legacy_tower(
            {f"t.{k}": v for k, v in m.state_dict().items()}, "t", 2))
    x = torch.randn(2, 20, 64)
    mask = torch.ones(2, 20, dtype=torch.bool)
    with torch.no_grad():
        ref = m(x, mask=mask).numpy()
    got = np.asarray(legacy_encoder(params, jnp.asarray(x.numpy()),
                                    jnp.asarray(mask.numpy()), heads=4,
                                    dim_head=16))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_weight_downloader_file_url(tmp_path, monkeypatch):
    """download_model (reference models/__init__.py:49-87): URL table +
    cache + atomic write + graceful offline fallback, driven through a
    file:// mirror."""
    from tortoise_tts_tpu import models as M
    src = tmp_path / "mirror" / "autoregressive.pth"
    src.parent.mkdir(parents=True)
    src.write_bytes(b"\x00" * 128)
    monkeypatch.setenv("TORTOISE_TPU_URL_AUTOREGRESSIVE",
                       src.as_uri())
    M._download_failed.clear()
    dest = M.download_model("autoregressive.pth",
                            dest_dir=tmp_path / "cache")
    assert dest is not None and dest.read_bytes() == b"\x00" * 128
    # second call returns the cached file without re-fetching
    src.unlink()
    again = M.download_model("autoregressive.pth",
                             dest_dir=tmp_path / "cache")
    assert again == dest

    # offline fallback: bad URL -> None, no partial files
    monkeypatch.setenv("TORTOISE_TPU_URL_DIFFUSION",
                       (tmp_path / "nope.pth").as_uri())
    M._download_failed.clear()
    out = M.download_model("diffusion.pth", dest_dir=tmp_path / "cache2")
    assert out is None
    assert not list((tmp_path / "cache2").glob("*.part")) if \
        (tmp_path / "cache2").exists() else True
    # negative cache: second attempt short-circuits
    assert M.download_model("diffusion.pth",
                            dest_dir=tmp_path / "cache2") is None
