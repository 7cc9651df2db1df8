"""Training engine tests: train steps, LoRA, checkpoints, DP/TP sharding.

Uses the 8-device virtual CPU mesh from conftest for the multi-chip
coverage (SURVEY §4 implication (c)).
"""

from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tortoise_tts_tpu.config import Hyperparameters, LoRAConfig
from tortoise_tts_tpu.engine import optim, state as st, train_step as ts
from tortoise_tts_tpu.models import (diffusion as diff_m, dvae as dvae_m,
                                     clvp as clvp_m, gaussian,
                                     unified_voice as uv_m)
from tortoise_tts_tpu.models.lora import apply_lora, init_lora
from tortoise_tts_tpu.parallel import mesh as pmesh

AR_CFG = uv_m.UnifiedVoiceConfig(layers=2, model_dim=64, heads=4,
                                 max_text_tokens=40, max_mel_tokens=48)


def _ar_batch(b=4, tt=12, tm=20, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "latents": jnp.asarray(rng.randn(b, AR_CFG.model_dim),
                               dtype=jnp.float32),
        "text": jnp.asarray(rng.randint(3, 255, (b, tt)), dtype=jnp.int32),
        "text_lengths": jnp.full((b,), tt, dtype=jnp.int32),
        "codes": jnp.asarray(rng.randint(0, 8192, (b, tm)), dtype=jnp.int32),
        "wav_lengths": jnp.full((b,), (tm - 2) * 1024, dtype=jnp.int32),
    }


def test_ar_train_step_reduces_loss():
    params = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    tx = optim.make_optimizer(Hyperparameters(
        optimizer="AdamW", learning_rate=1e-3, gradient_clipping=1.0,
        gradient_accumulation_steps=1, warmup_steps=0))
    step = ts.make_ar_train_step(AR_CFG, tx, remat=True, donate=False)
    state = st.init_state(params, tx)
    batch = _ar_batch()
    losses = []
    for _ in range(8):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    assert int(state.samples_processed) == 32


def test_ar_train_step_grad_accumulation():
    params = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    tx = optim.make_optimizer(Hyperparameters(
        optimizer="AdamW", learning_rate=1e-3,
        gradient_accumulation_steps=2, warmup_steps=0))
    step = ts.make_ar_train_step(AR_CFG, tx, donate=False)
    state = st.init_state(params, tx)
    p0 = state.params["final_norm"]["scale"]
    state, _ = step(state, _ar_batch(seed=1))
    # first micro-step: params unchanged (accumulating)
    np.testing.assert_array_equal(np.asarray(state.params["final_norm"]["scale"]),
                                  np.asarray(p0))
    state, _ = step(state, _ar_batch(seed=2))
    assert not np.allclose(np.asarray(state.params["final_norm"]["scale"]),
                           np.asarray(p0))


def test_lora_train_updates_only_adapter():
    base = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    lcfg = LoRAConfig(rank=4, alpha=8)
    lora = init_lora(jax.random.PRNGKey(1), base, rank=lcfg.rank)
    tx = optim.make_optimizer(Hyperparameters(
        optimizer="AdamW", learning_rate=1e-3,
        gradient_accumulation_steps=1, warmup_steps=0))
    step = ts.make_ar_train_step(AR_CFG, tx, lora_cfg=lcfg,
                                 base_params=base, donate=False)
    state = st.init_state(lora, tx)
    state, m = step(state, _ar_batch())
    assert np.isfinite(float(m["loss"]))
    # b factors start zero and must move after a step
    assert not np.allclose(
        np.asarray(state.params["gpt"]["attn_qkv"]["b"]), 0)
    # merged-weight inference equals base when lora is zero-init
    lora0 = init_lora(jax.random.PRNGKey(2), base, rank=4)
    merged = apply_lora(base, lora0, alpha=8, rank=4)
    np.testing.assert_allclose(
        np.asarray(merged["gpt"]["attn_qkv"]["w"]),
        np.asarray(base["gpt"]["attn_qkv"]["w"]), atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    params = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    tx = optim.make_optimizer(Hyperparameters(gradient_accumulation_steps=1))
    state = st.init_state(params, tx)
    step = ts.make_ar_train_step(AR_CFG, tx, donate=False)
    state, _ = step(state, _ar_batch())
    st.save_checkpoint(tmp_path, "autoregressive", state, step=1,
                       keep_last=2, userdata={"symmap": {"a": 1}})
    fresh = st.init_state(uv_m.init(jax.random.PRNGKey(9), AR_CFG), tx)
    restored = st.load_checkpoint(tmp_path, "autoregressive", fresh)
    np.testing.assert_allclose(
        np.asarray(restored.params["final_norm"]["scale"]),
        np.asarray(state.params["final_norm"]["scale"]), atol=1e-6)
    assert int(restored.step) == int(state.step)
    # latest tag + pruning
    st.save_checkpoint(tmp_path, "autoregressive", state, step=2, keep_last=2)
    st.save_checkpoint(tmp_path, "autoregressive", state, step=3, keep_last=2)
    dirs = sorted(p.name for p in (tmp_path / "autoregressive").iterdir()
                  if p.is_dir())
    assert dirs == ["2", "3"]
    assert st.latest_checkpoint(tmp_path, "autoregressive").name == "3"


def test_dp_sharded_train_step_matches_single():
    """DP over the 8-device mesh == single-device result (grad psum)."""
    mesh = pmesh.make_mesh(data=8, model=1)
    params = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    tx = optax.sgd(0.1)
    batch = _ar_batch(b=8)

    step_single = ts.make_ar_train_step(AR_CFG, tx, donate=False)
    s1, m1 = step_single(st.init_state(params, tx), batch)

    sharded_batch = pmesh.shard_batch(mesh, batch)
    step_dp = ts.make_ar_train_step(AR_CFG, tx, donate=False)
    s2, m2 = step_dp(st.init_state(params, tx), sharded_batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params["final_norm"]["scale"]),
        np.asarray(s2.params["final_norm"]["scale"]), atol=1e-5)


def test_tp_sharded_params_forward():
    """Megatron TP layout compiles + matches replicated forward."""
    mesh = pmesh.make_mesh(data=2, model=4)
    params = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    shardings = pmesh.param_shardings(mesh, params)
    sharded = jax.device_put(params, shardings)
    batch = _ar_batch(b=4)

    def fwd(p, b):
        lt, lm, _ = uv_m.forward(p, b["latents"], b["text"],
                                 b["text_lengths"], b["codes"],
                                 b["wav_lengths"], AR_CFG)
        return lt + lm
    ref = float(fwd(params, batch))
    got = float(jax.jit(fwd)(sharded, pmesh.shard_batch(mesh, batch)))
    np.testing.assert_allclose(got, ref, rtol=2e-5)


def test_fsdp_sharded_train_step_matches_single():
    """trainer.param_sharding: fsdp (ZeRO-3 role): params + moments
    sharded over 'data', one step == the replicated result."""
    mesh = pmesh.make_mesh(data=8, model=1)
    params = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    tx = optax.adamw(1e-3)
    batch = _ar_batch(b=8)

    step = ts.make_ar_train_step(AR_CFG, tx, donate=False)
    s1, m1 = step(st.init_state(params, tx), batch)

    # tiny test params: force sharding of everything shardable
    fshard = pmesh.fsdp_param_shardings(mesh, params, min_size=64)
    fparams = jax.device_put(params, fshard)
    fstate = st.init_state(fparams, tx)
    fstate = st.TrainState(
        fstate.params,
        jax.device_put(fstate.opt_state,
                       pmesh.opt_state_shardings(mesh, fstate.opt_state,
                                                 fparams, mode="fsdp",
                                                 min_size=64)),
        fstate.step, fstate.samples_processed, fstate.tokens_processed)
    s2, m2 = step(fstate, pmesh.shard_batch(mesh, batch))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params["final_norm"]["scale"]),
        np.asarray(s2.params["final_norm"]["scale"]), atol=1e-5)
    # at least one large param is actually sharded over 'data'
    w = fparams["gpt"]["attn_qkv"]["w"]
    assert any(s == "data" for s in w.sharding.spec if s is not None)


def test_engines_shard_on_mesh(tmp_path):
    """Engines.shard lays every engine state onto the mesh and a step
    still runs (train.py multi-chip path)."""
    from tortoise_tts_tpu.engine.engines import Engines
    mesh = pmesh.make_mesh(data=8, model=1)
    params = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    tx = optim.make_optimizer(Hyperparameters(
        optimizer="AdamW", learning_rate=1e-3, gradient_clipping=1.0,
        gradient_accumulation_steps=1, warmup_steps=0))
    engines = Engines()
    engines.add("autoregressive", st.init_state(params, tx),
                ts.make_ar_train_step(AR_CFG, tx, donate=False),
                config={"base_lr": 1e-3})
    engines.shard(mesh, "fsdp")
    m = engines.step(pmesh.shard_batch(mesh, _ar_batch(b=8)))
    assert np.isfinite(m["autoregressive.loss"])
    assert engines.global_step == 1


def test_diffusion_train_step():
    cfg = diff_m.DiffusionConfig(model_channels=64, num_layers=2,
                                 in_latent_channels=64, num_heads=4)
    params = diff_m.init(jax.random.PRNGKey(0), cfg)
    sched = gaussian.get_schedule(steps=100, cond_free=False)
    tx = optax.adamw(1e-4)
    step = ts.make_diffusion_train_step(cfg, tx, sched, donate=False)
    state = st.init_state(params, tx)
    rng = np.random.RandomState(0)
    batch = {
        "mel": jnp.asarray(rng.randn(2, 100, 64), dtype=jnp.float32),
        "latents": jnp.asarray(rng.randn(2, 16, 64), dtype=jnp.float32),
        "conditioning_latents": jnp.asarray(rng.randn(2, 128),
                                            dtype=jnp.float32),
    }
    first = None
    for i in range(8):
        state, m = step(state, batch, jax.random.PRNGKey(1))
        if first is None:
            first = float(m["loss"])
    # fixed batch + fixed rng: the optimizer must drive the loss down
    assert float(m["loss"]) < first
    assert np.isfinite(float(m["loss.vb"]))


def test_diffusion_train_step_seeded_resume():
    """seed=<int> mode: rng derives in-graph from state.step, so a run
    resumed from a checkpoint replays the exact loss trajectory of the
    uninterrupted run (VERDICT r2: itertools.count rng was neither
    seedable nor resume-consistent)."""
    cfg = diff_m.DiffusionConfig(model_channels=64, num_layers=2,
                                 in_latent_channels=64, num_heads=4)
    params = diff_m.init(jax.random.PRNGKey(0), cfg)
    sched = gaussian.get_schedule(steps=100, cond_free=False)
    tx = optax.adamw(1e-4)
    step = ts.make_diffusion_train_step(cfg, tx, sched, donate=False,
                                        seed=7)
    rng = np.random.RandomState(0)
    batch = {
        "mel": jnp.asarray(rng.randn(2, 100, 64), dtype=jnp.float32),
        "latents": jnp.asarray(rng.randn(2, 16, 64), dtype=jnp.float32),
        "conditioning_latents": jnp.asarray(rng.randn(2, 128),
                                            dtype=jnp.float32),
    }
    state = st.init_state(params, tx)
    losses, ckpt = [], None
    for i in range(4):
        if i == 2:  # "checkpoint" = host copy of the full state
            ckpt = jax.tree_util.tree_map(np.asarray, state)
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    # distinct steps draw distinct t/noise
    assert losses[0] != losses[1]
    # resume from the copy: steps 3-4 must replay identically
    state2 = jax.tree_util.tree_map(jnp.asarray, ckpt)
    resumed = []
    for _ in range(2):
        state2, m = step(state2, batch)
        resumed.append(float(m["loss"]))
    np.testing.assert_allclose(resumed, losses[2:], rtol=0, atol=0)


def test_dvae_train_step():
    cfg = dvae_m.DVAEConfig(num_tokens=128, codebook_dim=32, hidden_dim=32)
    params = dvae_m.init(jax.random.PRNGKey(0), cfg)
    tx = optax.adamw(1e-4)
    step = ts.make_dvae_train_step(cfg, tx, donate=False)
    state = st.init_state(params, tx)
    batch = {"mel": jnp.asarray(np.random.RandomState(0).randn(2, 80, 32),
                                dtype=jnp.float32)}
    s0_embed = np.asarray(state.params["codebook"]["embed"])
    first = None
    for i in range(8):
        state, m = step(state, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first
    # EMA moved the codebook
    assert not np.allclose(np.asarray(state.params["codebook"]["embed"]),
                           s0_embed)


def test_clvp_train_step():
    cfg = clvp_m.CLVPConfig(dim_text=32, dim_speech=32, dim_latent=32,
                            text_enc_depth=1, speech_enc_depth=1,
                            text_heads=2, speech_heads=2, dim_head=16,
                            rotary_dim=16)
    params = clvp_m.init(jax.random.PRNGKey(0), cfg)
    tx = optax.adamw(1e-4)
    step = ts.make_clvp_train_step(cfg, tx, donate=False)
    state = st.init_state(params, tx)
    rng = np.random.RandomState(0)
    batch = {"text": jnp.asarray(rng.randint(0, 256, (4, 16))),
             "codes": jnp.asarray(rng.randint(0, 8192, (4, 24)))}
    first = None
    for i in range(8):
        state, m = step(state, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first


def test_teacher_distillation_step():
    params = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    teacher = uv_m.init(jax.random.PRNGKey(7), AR_CFG)
    tx = optax.adamw(1e-4)
    step = ts.make_ar_train_step(AR_CFG, tx, teacher_params=teacher,
                                 teacher_alpha=0.5, donate=False)
    state = st.init_state(params, tx)
    state, m = step(state, _ar_batch())
    assert np.isfinite(float(m["loss"]))
    assert np.isfinite(float(m["loss.kl"])) and float(m["loss.kl"]) > 0


def test_engines_orchestrator(tmp_path):
    from tortoise_tts_tpu.engine.engines import Engines
    params = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    tx = optax.adamw(1e-4)
    step = ts.make_ar_train_step(AR_CFG, tx, donate=False)
    engines = Engines()
    engines.add("autoregressive", st.init_state(params, tx), step)
    m = engines.step(_ar_batch())
    assert "autoregressive.loss" in m and "loss" in m
    assert engines.global_step == 1
    engines.save_checkpoint(tmp_path)
    engines.export(tmp_path)
    assert (tmp_path / "autoregressive" / "fp32.sft").exists()
    engines2 = Engines()
    engines2.add("autoregressive", st.init_state(params, tx), step)
    engines2.load_checkpoint(tmp_path)
    assert engines2.global_step == 1


def test_zero1_optimizer_state_sharding():
    """ZeRO-1 equivalent: Adam moments sharded with the same megatron
    specs as the params (parallel/mesh.py opt_state_shardings), train
    step executes under those shardings and keeps them."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = pmesh.make_mesh(data=4, model=2)
    params = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    tx = optax.adam(1e-4)
    state = st.init_state(params, tx)

    pshard = pmesh.param_shardings(mesh, params)
    oshard = pmesh.opt_state_shardings(mesh, state.opt_state, params)
    rep = NamedSharding(mesh, P())
    state_shardings = st.TrainState(pshard, oshard, rep, rep, rep)

    # the qkv moment must carry the model-sharded spec, not replication
    mu_qkv = oshard[0].mu["gpt"]["attn_qkv"]["w"]
    assert mu_qkv.spec == P(None, None, "model")

    step = ts.make_ar_train_step(
        AR_CFG, tx, remat=False, donate=False,
        in_shardings=(state_shardings,
                      jax.tree_util.tree_map(
                          lambda _: NamedSharding(mesh, P("data")),
                          _ar_batch())))
    state = jax.device_put(state, state_shardings)
    batch = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))),
        _ar_batch(b=8))
    new, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    got = new.opt_state[0].mu["gpt"]["attn_qkv"]["w"].sharding
    assert got.spec == P(None, None, "model")
