"""Parity: TPU DiffusionTTS + gaussian samplers vs reference (CPU golden).

Covers SURVEY §2.1 rows: DiffusionTTS (denoiser fwd, conditioning paths,
timestep_independent), Gaussian diffusion math (schedules, DDIM loop,
p_mean_variance) with conditioning-free guidance.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tortoise_tts_tpu.models import convert, diffusion as dtts, gaussian

from tests.ref.harness import import_ref

CFG = dtts.DiffusionConfig(model_channels=64, num_layers=2, in_channels=100,
                           in_latent_channels=64, num_heads=4)


@pytest.fixture(scope="module")
def ref_model():
    rdiff = import_ref("models.diffusion")
    torch.manual_seed(0)
    m = rdiff.DiffusionTTS(model_channels=CFG.model_channels,
                           num_layers=CFG.num_layers,
                           in_channels=CFG.in_channels,
                           in_latent_channels=CFG.in_latent_channels,
                           num_heads=CFG.num_heads)
    m.eval()
    return m


@pytest.fixture(scope="module")
def params(ref_model):
    return jax.tree_util.tree_map(
        jnp.asarray,
        convert.convert_diffusion(ref_model.state_dict(), CFG.num_layers))


def test_get_conditioning_parity(ref_model, params):
    torch.manual_seed(1)
    mel = torch.randn(2, 1, 100, 96)
    with torch.no_grad():
        ref = ref_model.get_conditioning(mel).numpy()
    got = np.asarray(dtts.get_conditioning(params, jnp.asarray(mel.numpy()),
                                           CFG))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_timestep_independent_parity(ref_model, params):
    torch.manual_seed(2)
    lat = torch.randn(2, 40, CFG.in_latent_channels)
    cond = torch.randn(2, 2 * CFG.model_channels)
    with torch.no_grad():
        ref = ref_model.timestep_independent(lat, cond, 120, False).numpy()
    got = np.asarray(dtts.timestep_independent(
        params, jnp.asarray(lat.numpy()), jnp.asarray(cond.numpy()), 120, CFG))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_denoiser_forward_parity(ref_model, params):
    torch.manual_seed(3)
    x = torch.randn(2, 100, 120)
    lat = torch.randn(2, 40, CFG.in_latent_channels)
    cond = torch.randn(2, 2 * CFG.model_channels)
    ts = torch.tensor([600, 1200])
    with torch.no_grad():
        pre = ref_model.timestep_independent(lat, cond, 120, False)
        ref = ref_model(x, ts, precomputed_aligned_embeddings=pre).numpy()
    pre_j = dtts.timestep_independent(
        params, jnp.asarray(lat.numpy()), jnp.asarray(cond.numpy()), 120, CFG)
    got = np.asarray(dtts.forward(params, jnp.asarray(x.numpy()),
                                  jnp.asarray(ts.numpy()), pre_j, CFG))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_conditioning_free_forward_parity(ref_model, params):
    torch.manual_seed(4)
    x = torch.randn(1, 100, 80)
    ts = torch.tensor([2000])
    dummy = torch.zeros(1, CFG.model_channels, 80)
    with torch.no_grad():
        ref = ref_model(x, ts, precomputed_aligned_embeddings=dummy,
                        conditioning_free=True).numpy()
    uncond = dtts.unconditioned_embedding(params, 1, 80)
    got = np.asarray(dtts.forward(params, jnp.asarray(x.numpy()),
                                  jnp.asarray(ts.numpy()), uncond, CFG))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_schedule_tables_match_reference():
    rdiff = import_ref("models.diffusion")
    ref = rdiff.SpacedDiffusion(
        use_timesteps=rdiff.space_timesteps(4000, [30]),
        model_mean_type="epsilon", model_var_type="learned_range",
        loss_type="mse", betas=rdiff.get_named_beta_schedule("linear", 4000),
        conditioning_free=False, conditioning_free_k=1)
    sch = gaussian.get_schedule(steps=30, cond_free=False)
    np.testing.assert_allclose(sch.betas, ref.betas, rtol=1e-12)
    np.testing.assert_allclose(sch.timestep_map, ref.timestep_map)
    np.testing.assert_allclose(sch.posterior_log_variance_clipped,
                               ref.posterior_log_variance_clipped, rtol=1e-10)
    np.testing.assert_allclose(sch.posterior_mean_coef1,
                               ref.posterior_mean_coef1, rtol=1e-10)


@pytest.mark.parametrize("cond_free", [False, True])
def test_ddim_loop_parity(ref_model, params, cond_free):
    """Full DDIM sample loop, eta=0 (deterministic given noise)."""
    rdiff = import_ref("models.diffusion")
    steps = 6
    ref_diffuser = rdiff.get_diffuser(steps=steps, cond_free=cond_free)
    torch.manual_seed(5)
    b, t_out = 1, 64
    lat = torch.randn(b, 16, CFG.in_latent_channels)
    cond = torch.randn(b, 2 * CFG.model_channels)
    noise = torch.randn(b, 100, t_out)
    with torch.no_grad():
        pre = ref_model.timestep_independent(lat, cond, t_out, False)
        ref = ref_diffuser.ddim_sample_loop(
            ref_model, (b, 100, t_out), noise=noise,
            model_kwargs={"precomputed_aligned_embeddings": pre}).numpy()

    sch = gaussian.get_schedule(steps=steps, cond_free=cond_free)
    pre_j = dtts.timestep_independent(
        params, jnp.asarray(lat.numpy()), jnp.asarray(cond.numpy()), t_out, CFG)
    uncond = dtts.unconditioned_embedding(params, b, t_out)

    if cond_free:
        code_emb = jnp.concatenate([pre_j, uncond], axis=0)
    else:
        code_emb = pre_j

    def model_fn(x, ts, t_idx=None):
        return dtts.forward(params, x, ts, code_emb, CFG)

    got = np.asarray(gaussian.sample_loop(
        model_fn, jnp.asarray(noise.numpy()), jax.random.PRNGKey(0), sch,
        sampler="ddim"))
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-2)


def test_p_mean_variance_parity(ref_model, params):
    """One P-sampler step's mean/logvar (noise injection differs by RNG)."""
    rdiff = import_ref("models.diffusion")
    steps = 6
    ref_diffuser = rdiff.get_diffuser(steps=steps, cond_free=False)
    torch.manual_seed(6)
    b, t_out = 1, 48
    lat = torch.randn(b, 12, CFG.in_latent_channels)
    cond = torch.randn(b, 2 * CFG.model_channels)
    x = torch.randn(b, 100, t_out)
    t_idx = 3
    with torch.no_grad():
        pre = ref_model.timestep_independent(lat, cond, t_out, False)
        ref_out = ref_diffuser.p_mean_variance(
            ref_model, x, torch.tensor([t_idx]),
            model_kwargs={"precomputed_aligned_embeddings": pre})

    sch = gaussian.get_schedule(steps=steps, cond_free=False)
    pre_j = dtts.timestep_independent(
        params, jnp.asarray(lat.numpy()), jnp.asarray(cond.numpy()), t_out, CFG)

    def model_fn(xx, ts, t_idx=None):
        return dtts.forward(params, xx, ts, pre_j, CFG)

    mean, logvar, xstart = gaussian.p_mean_variance(
        model_fn, jnp.asarray(x.numpy()), jnp.asarray(t_idx), sch)
    np.testing.assert_allclose(np.asarray(mean), ref_out["mean"].numpy(),
                               atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(logvar),
                               ref_out["log_variance"].numpy(),
                               atol=1e-3, rtol=1e-3)


def test_dpmpp_recovers_x0_with_exact_eps_model():
    """With an oracle eps model for a point-mass data distribution, any
    correct deterministic sampler must return x0 exactly."""
    rng = np.random.RandomState(0)
    x0_true = jnp.asarray(rng.randn(1, 100, 32).astype(np.float32)) * 0.5
    sch = gaussian.get_schedule(steps=12, cond_free=False)

    def oracle(x, ts_orig, t_idx=None):
        # map original-timestep values back to respaced indices
        tmap = np.asarray(sch.timestep_map)
        idx = jnp.argmax(jnp.asarray(tmap)[None, :] == ts_orig[:, None],
                         axis=1)
        a = jnp.asarray(sch.sqrt_alphas_cumprod, jnp.float32)[idx][:, None, None]
        s = jnp.asarray(sch.sqrt_one_minus_alphas_cumprod,
                        jnp.float32)[idx][:, None, None]
        eps = (x - a * x0_true) / s
        var = jnp.zeros_like(x)
        return jnp.concatenate([eps, var], axis=1)

    noise = jnp.asarray(rng.randn(1, 100, 32).astype(np.float32))
    out_dpm = gaussian.sample_loop(oracle, noise, jax.random.PRNGKey(0), sch,
                                   sampler="dpm++", clip_denoised=False)
    np.testing.assert_allclose(np.asarray(out_dpm), np.asarray(x0_true),
                               atol=1e-3, rtol=1e-3)
    out_ddim = gaussian.sample_loop(oracle, noise, jax.random.PRNGKey(0),
                                    sch, sampler="ddim", clip_denoised=False)
    np.testing.assert_allclose(np.asarray(out_ddim), np.asarray(x0_true),
                               atol=1e-3, rtol=1e-3)


def test_dpmpp_on_denoiser_finite(ref_model, params):
    sch = gaussian.get_schedule(steps=6, cond_free=True)
    b, t_out = 1, 64
    rng = np.random.RandomState(1)
    lat = jnp.asarray(rng.randn(b, 16, CFG.in_latent_channels),
                      dtype=jnp.float32)
    cond = jnp.asarray(rng.randn(b, 2 * CFG.model_channels),
                       dtype=jnp.float32)
    pre = dtts.timestep_independent(params, lat, cond, t_out, CFG)
    uncond = dtts.unconditioned_embedding(params, b, t_out)
    code_emb = jnp.concatenate([pre, uncond], axis=0)
    noise = jnp.asarray(rng.randn(b, 100, t_out), dtype=jnp.float32)
    out = gaussian.sample_loop(
        lambda x, ts, t_idx=None: dtts.forward(params, x, ts, code_emb, CFG),
        noise, jax.random.PRNGKey(0), sch, sampler="dpm++")
    assert np.isfinite(np.asarray(out)).all()


def test_precomputed_rel_biases_match_inline(params):
    """Hoisted bias path must be numerically identical to the inline
    gather path."""
    rng = np.random.RandomState(9)
    x = jnp.asarray(rng.randn(1, 100, 48), dtype=jnp.float32)
    ce = jnp.asarray(rng.randn(1, CFG.model_channels, 48),
                     dtype=jnp.float32)
    ts = jnp.asarray([1500])
    ref = dtts.forward(params, x, ts, ce, CFG)
    biases = dtts.precompute_rel_biases(params, 48, CFG)
    got = dtts.forward(params, x, ts, ce, CFG, rel_biases=biases)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_training_losses_parity(ref_model, params):
    """training_losses (mse + frozen-mean vb) vs reference at t>0."""
    rdiff = import_ref("models.diffusion")
    steps = 10
    ref_d = rdiff.get_diffuser(steps=steps, cond_free=False)
    rng = np.random.RandomState(11)
    b, t_out = 2, 48
    x_start = torch.tensor(rng.randn(b, 100, t_out).astype(np.float32))
    noise = torch.tensor(rng.randn(b, 100, t_out).astype(np.float32))
    lat = torch.tensor(rng.randn(b, 12, CFG.in_latent_channels)
                       .astype(np.float32))
    cond = torch.tensor(rng.randn(b, 2 * CFG.model_channels)
                        .astype(np.float32))
    t_idx = torch.tensor([3, 7])
    with torch.no_grad():
        pre = ref_model.timestep_independent(lat, cond, t_out, False)
        terms = ref_d.training_losses(
            ref_model, x_start, t_idx, noise=noise,
            model_kwargs={"precomputed_aligned_embeddings": pre})

    sch = gaussian.get_schedule(steps=steps, cond_free=False)
    tj = jnp.asarray(t_idx.numpy())
    x_t = gaussian.q_sample(jnp.asarray(x_start.numpy()), tj,
                            jnp.asarray(noise.numpy()), sch)
    pre_j = dtts.timestep_independent(
        params, jnp.asarray(lat.numpy()), jnp.asarray(cond.numpy()),
        t_out, CFG)
    t_orig = jnp.asarray(sch.timestep_map)[tj]
    out = dtts.forward(params, x_t, t_orig, pre_j, CFG)
    got = gaussian.training_losses(out, jnp.asarray(x_start.numpy()), x_t,
                                   tj, jnp.asarray(noise.numpy()), sch)
    np.testing.assert_allclose(np.asarray(got["mse"]),
                               terms["mse"].numpy(), atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(got["vb"]),
                               terms["vb"].numpy(), atol=1e-3, rtol=1e-2)


def test_fused_resblock_kernel_parity():
    """ops/pallas_resblock.fused_ts_res_block (interpret mode) matches
    the XLA _ts_res_block exactly in fp32, including per-batch
    scale/shift, group statistics and the k=3 conv edge columns."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from tortoise_tts_tpu.models import diffusion as dm
    from tortoise_tts_tpu.models.common import linear, silu, norm_groups
    from tortoise_tts_tpu.ops.pallas_resblock import fused_ts_res_block
    for (b, c, t) in ((2, 256, 128), (1, 128, 256)):
        p = dm._ts_res_block_init(jax.random.PRNGKey(0), c, c)
        x = jax.random.normal(jax.random.PRNGKey(1), (b, c, t),
                              jnp.float32)
        emb = jax.random.normal(jax.random.PRNGKey(2), (b, c),
                                jnp.float32)
        ref = dm._ts_res_block(p, x, emb)
        emb_out = linear(p["emb"], silu(emb))
        got = fused_ts_res_block(p, x, emb_out, norm_groups(c),
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, rtol=1e-5)


def test_fused_gn_conv_kernel_parity():
    """fused_gn_conv1x1 (interpret) == groupnorm + conv1d for the
    attention head (act=False, C_out=3C, blocked) and the resblock
    input half (act=True)."""
    import jax
    import numpy as np
    import jax.numpy as jnp
    from tortoise_tts_tpu.models.common import (conv1d, conv1d_init,
                                                group_norm,
                                                group_norm_init,
                                                norm_groups, silu)
    from tortoise_tts_tpu.ops.pallas_resblock import fused_gn_conv1x1
    c, t = 256, 128
    for (cout, act, bn) in ((3 * c, False, 256), (c, True, 1024)):
        pn = group_norm_init(c)
        pc = conv1d_init(jax.random.PRNGKey(3), c, cout, 1)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, c, t),
                              jnp.float32)
        h = group_norm(pn, x, norm_groups(c))
        if act:
            h = silu(h)
        ref = conv1d(pc, h)
        got = fused_gn_conv1x1(pn, pc, x, norm_groups(c), act=act,
                               block_n=bn, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5, rtol=1e-5)


def test_fused_resblock_grad_matches_xla(monkeypatch):
    """Training must differentiate through the fused-default resblock:
    the custom_vjp runs the Pallas kernel forward (interpret here) and
    the XLA formulation backward, so grads match the pure-XLA path."""
    import os
    import jax
    import numpy as np
    import jax.numpy as jnp
    from tortoise_tts_tpu.models import diffusion as dm
    from tortoise_tts_tpu.models import arch

    b, c, t = 2, 128, 128
    p = dm._ts_res_block_init(jax.random.PRNGKey(0), c, c)
    pa = arch.attention_block_init(jax.random.PRNGKey(1), c, 4)
    x = jax.random.normal(jax.random.PRNGKey(2), (b, c, t), jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(3), (b, c), jnp.float32)

    def loss(params, px):
        y = dm._ts_res_block(params, px, emb)
        y = arch.attention_block(pa, y, 4)
        return jnp.sum(y * y)

    # force the ref side onto the XLA path explicitly (on a TPU backend
    # the fused path would otherwise be the default on BOTH sides and
    # the comparison would be vacuous); monkeypatch restores the env.
    monkeypatch.setenv("TTS_FUSED_RESBLOCK", "0")
    ref_l, ref_g = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
    monkeypatch.setenv("TTS_FUSED_RESBLOCK", "1")
    monkeypatch.setenv("TTS_FUSED_RESBLOCK_INTERPRET", "1")
    got_l, got_g = jax.value_and_grad(loss, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
    flat_r = jax.tree_util.tree_leaves(ref_g)
    flat_g = jax.tree_util.tree_leaves(got_g)
    for r, g in zip(flat_r, flat_g):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                   atol=2e-3, rtol=1e-3)


def test_dpmpp25_matches_ddim80_error_on_analytic_model():
    """Pin the 'DPM++-25 ~ DDIM-80 quality' claim (README/PARITY).

    An analytic eps-model for a two-component Gaussian mixture gives a
    nontrivial probability-flow ODE whose converged solution both
    deterministic samplers share; DDIM-1000 approximates it.  The
    second-order DPM-Solver++(2M) at 25 steps must land at least as
    close to the converged solution as first-order DDIM at 80 steps
    (same noise, same schedule family).  Measured numbers are recorded
    in docs/PARITY.md."""
    rng = np.random.RandomState(7)
    d = (1, 4, 32)
    m1 = jnp.asarray(rng.randn(*d).astype(np.float32)) * 0.8
    m2 = -m1 + 0.3
    s2 = 0.05 ** 2                        # component variance

    def make_oracle(sch):
        tmap = jnp.asarray(np.asarray(sch.timestep_map))
        a_all = jnp.asarray(sch.sqrt_alphas_cumprod, jnp.float32) ** 2

        def oracle(x, ts_orig, t_idx=None):
            idx = jnp.argmax(tmap[None, :] == ts_orig[:, None], axis=1)
            a = a_all[idx][:, None, None]
            var_t = a * s2 + (1.0 - a)
            # responsibilities over flattened dims (shared per sample)
            def logq(m):
                return -0.5 * jnp.sum(
                    (x - jnp.sqrt(a) * m) ** 2, axis=(1, 2)) / var_t[:, 0, 0]
            l1, l2 = logq(m1), logq(m2)
            w1 = jax.nn.sigmoid(l1 - l2)[:, None, None]
            score = (w1 * (jnp.sqrt(a) * m1 - x)
                     + (1 - w1) * (jnp.sqrt(a) * m2 - x)) / var_t
            eps = -jnp.sqrt(1.0 - a) * score
            return jnp.concatenate([eps, jnp.zeros_like(eps)], axis=1)
        return oracle

    noise = jnp.asarray(rng.randn(*d).astype(np.float32))

    def run(sampler, steps):
        sch = gaussian.get_schedule(steps=steps, cond_free=False)
        return np.asarray(gaussian.sample_loop(
            make_oracle(sch), noise, jax.random.PRNGKey(0), sch,
            sampler=sampler, clip_denoised=False))

    ref = run("ddim", 1000)               # ~converged ODE solution
    errs = {name: float(np.abs(run(s, n) - ref).mean())
            for name, (s, n) in {
                "dpm++25": ("dpm++", 25), "ddim50": ("ddim", 50),
                "ddim80": ("ddim", 80), "dpm++12": ("dpm++", 12)}.items()}
    # the headline claim: 2nd-order at 25 steps >= 1st-order at 80
    assert errs["dpm++25"] <= errs["ddim80"] * 1.05, errs
    # and the order advantage is real, not marginal
    assert errs["dpm++25"] < errs["ddim50"], errs
    print("solver errors vs DDIM-1000:", errs)


def test_dpmpp_on_trained_denoiser_convergence_and_ranking():
    """The fast-preset question on a LEARNED score field (VERDICT r4
    weak #5): the analytic-ODE test above proves solver ORDER; this one
    measures a REAL trained eps-model with cond-free guidance ON.

    A tiny DiffusionTTS is trained (with conditioning dropout, so the
    unconditioned branch the guidance extrapolates through is itself
    trained — reference diffusion.py:1529-1536) on synthetic
    mel<-latent pairs, then sampled with the production guided
    schedule (ramped cond-free, k=2).

    MEASURED OUTCOME (round 5, recorded in docs/PARITY.md): DPM++(2M)
    converges to the SAME solution as DDIM (consistency pinned below),
    but its error constant on the learned field is WORSE than DDIM's —
    DPM++-25 lands ~8x farther from the converged solution than
    DDIM-80 (0.0195 vs 0.0023 mean-abs mel units) because the 2M
    finite-difference correction amplifies the learned model's
    roughness in t.  The 'DPM++-25 ~ DDIM-80 quality' README claim is
    therefore DEMOTED: the fast preset stays opt-in, documented as
    analytic-field-only evidence.  This test pins (a) solver
    consistency on the learned field, (b) within-family error decay,
    and (c) the measured ranking that justified the demotion — if a
    sampler change makes DPM++ genuinely beat DDIM here, assertion (c)
    fails and the claim should be re-promoted."""
    import optax
    cfg = dtts.DiffusionConfig(model_channels=32, num_layers=2,
                               in_channels=100, in_latent_channels=32,
                               num_heads=2)
    T, TL, B = 32, 8, 8
    params = dtts.init(jax.random.PRNGKey(0), cfg)

    rng = np.random.RandomState(0)
    W = (rng.randn(32, 100) * 0.7).astype(np.float32)
    W2 = (rng.randn(32, 2 * cfg.model_channels) * 0.5).astype(np.float32)
    pool_lat = rng.randn(64, TL, 32).astype(np.float32)

    def mel_of(lat):                     # deterministic target in [-1,1]
        t_lat = np.repeat(lat, T // TL, axis=1)        # (N, T, 32)
        return np.tanh(t_lat @ W).transpose(0, 2, 1)   # (N, 100, T)

    def cond_of(lat):
        return np.tanh(lat.mean(axis=1) @ W2)          # (N, 2C)

    pool_mel = mel_of(pool_lat)
    pool_cond = cond_of(pool_lat)
    sched_tr = gaussian.get_schedule(steps=1000, cond_free=False)
    tx = optax.adam(2e-3)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, kk, lat, cond, mel):
        def loss_fn(p):
            k_t, k_n, k_d = jax.random.split(kk, 3)
            t = jax.random.randint(k_t, (B,), 0, sched_tr.num_timesteps)
            noise = jax.random.normal(k_n, mel.shape, jnp.float32)
            x_t = gaussian.q_sample(mel, t, noise, sched_tr)
            ce = dtts.timestep_independent(p, lat, cond, T, cfg)
            un = dtts.unconditioned_embedding(p, B, T)
            drop = jax.random.bernoulli(k_d, 0.15, (B, 1, 1))
            ce = jnp.where(drop, un, ce)
            t_orig = jnp.asarray(sched_tr.timestep_map)[t]
            out = dtts.forward(p, x_t, t_orig, ce, cfg)
            return gaussian.training_losses(out, mel, x_t, t, noise,
                                            sched_tr)["loss"].mean()
        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    k = jax.random.PRNGKey(1)
    losses = []
    for i in range(1200):
        k, kb, kk = jax.random.split(k, 3)
        idx = jax.random.randint(kb, (B,), 0, 64)
        params, opt, loss = train_step(
            params, opt, kk, jnp.asarray(pool_lat)[idx],
            jnp.asarray(pool_cond)[idx], jnp.asarray(pool_mel)[idx])
        losses.append(float(loss))
    # the score field must actually be learned, not noise (eps-MSE
    # plateaus ~0.72 on this task from ~1.13 at init)
    assert np.mean(losses[-20:]) < 0.8 * np.mean(losses[:20]), (
        losses[:5], losses[-5:])

    bs = 4
    lat_s = jnp.asarray(pool_lat[:bs])
    cond_s = jnp.asarray(pool_cond[:bs])
    noise = jnp.asarray(rng.randn(bs, 100, T).astype(np.float32))

    def run(sampler, steps):
        sch = gaussian.get_schedule(steps=steps, cond_free=True,
                                    cond_free_k=2.0)
        ce = dtts.timestep_independent(params, lat_s, cond_s, T, cfg)
        un = dtts.unconditioned_embedding(params, bs, T)
        cemb = jnp.concatenate([ce, un], axis=0)

        def model_fn(x, ts, t_idx=None):
            return dtts.forward(params, x, ts, cemb, cfg)

        return np.asarray(gaussian.sample_loop(
            model_fn, noise, jax.random.PRNGKey(0), sch, sampler=sampler))

    ref = run("ddim", 400)              # converged guided solution
    errs = {name: float(np.abs(run(s, n) - ref).mean())
            for name, (s, n) in {
                "dpm++25": ("dpm++", 25), "dpm++50": ("dpm++", 50),
                "dpm++400": ("dpm++", 400), "ddim25": ("ddim", 25),
                "ddim50": ("ddim", 50), "ddim80": ("ddim", 80)}.items()}
    print("guided sampler errors vs DDIM-400 (trained denoiser):", errs)
    # (a) solver consistency: both families converge to the SAME
    # solution of the learned guided field (r5 measured 0.0010)
    assert errs["dpm++400"] < 0.004, errs
    # (b) within-family decay: more steps -> closer, for both
    assert errs["dpm++25"] > errs["dpm++50"] > errs["dpm++400"], errs
    assert errs["ddim25"] > errs["ddim50"] > errs["ddim80"], errs
    # (c) the measured ranking that DEMOTED the fast-preset claim:
    # on this learned field DPM++-25 is farther from the converged
    # solution than DDIM-80 (r5: 0.0195 vs 0.0023).  If this flips,
    # re-promote the claim (README "Samplers" note + PARITY.md).
    assert errs["dpm++25"] > errs["ddim80"], errs
