"""Pure jitted train steps (reference Engines.step + train.py feeders).

Each ``make_*_train_step`` returns a jitted ``(state, batch, rng) ->
(state, metrics)`` with donated state.  Data parallelism comes from jit
+ NamedSharding on the batch (GSPMD inserts the gradient psum — the
DDP/ZeRO replacement, SURVEY §2.3); tensor parallelism from the
param shardings in parallel/mesh.py.

Batch layout for the AR step (reference train_feeder, train.py:35-63):
    latents (B, D) — precomputed AR conditioning latents,
    text (B, Tt) int32 stop-padded, text_lengths (B,),
    codes (B, Tm) int32, wav_lengths (B,).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models import gaussian
from ..models import unified_voice as uv
from ..models.lora import apply_lora
from .state import TrainState

Metrics = Dict[str, jnp.ndarray]


def make_ar_train_step(cfg: uv.UnifiedVoiceConfig,
                       tx: optax.GradientTransformation,
                       remat: bool = True,
                       lora_cfg=None,
                       base_params=None,
                       teacher_params=None,
                       teacher_alpha: float = 0.5,
                       teacher_temperature: float = 1.0,
                       in_shardings=None,
                       donate: bool = True):
    """AR (UnifiedVoice) train step.

    When ``lora_cfg`` is given, ``state.params`` is the LoRA tree and
    ``base_params`` the frozen full model (reference LoRA training mode,
    engines/__init__.py:102-104 + lora freeze).

    When ``teacher_params`` is given, a KL distillation term against the
    teacher's mel logits is blended in (reference teacher plumbing,
    engines/base.py:518-543 + config.py:359-361).

    The frozen base/teacher pytrees are passed to the jitted step as
    ARGUMENTS, never closed over: the remote-compile relay rejects HLO
    with multi-hundred-MB embedded constants (HTTP 413 — CLAUDE.md).
    """

    def loss_fn(trainable, batch, frozen):
        if lora_cfg is not None:
            params = apply_lora(frozen["base"], trainable, lora_cfg.alpha,
                                lora_cfg.rank)
        else:
            params = trainable
        cond = uv.get_conditioning(params, batch["cond_mels"], cfg) \
            if "cond_mels" in batch else batch["latents"]
        lt, lm, mel_logits = uv.forward(
            params, cond, batch["text"], batch["text_lengths"],
            batch["codes"], batch["wav_lengths"], cfg, remat=remat)
        # feeder sums the loss dict (train.py:56-57)
        loss = lt + lm
        parts = {"loss.text": lt, "loss.mel": lm}
        if teacher_params is not None:
            _, _, t_logits = uv.forward(
                frozen["teacher"], cond, batch["text"],
                batch["text_lengths"], batch["codes"],
                batch["wav_lengths"], cfg)
            T = teacher_temperature
            p_t = jax.nn.softmax(
                jax.lax.stop_gradient(t_logits).astype(jnp.float32) / T, -1)
            logq = jax.nn.log_softmax(mel_logits.astype(jnp.float32) / T, -1)
            kl = -jnp.mean(jnp.sum(p_t * logq, axis=-1)) * (T * T)
            parts["loss.kl"] = kl
            loss = (1 - teacher_alpha) * loss + teacher_alpha * kl
        return loss, parts

    def step(state: TrainState, batch, frozen
             ) -> Tuple[TrainState, Metrics]:
        (loss, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, frozen)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        b = batch["text"].shape[0]
        tokens = jnp.sum(batch["text_lengths"]) + jnp.sum(
            batch["wav_lengths"] // cfg.mel_length_compression)
        new = TrainState(params, opt_state, state.step + 1,
                         state.samples_processed + b,
                         state.tokens_processed + tokens)
        metrics = {"loss": loss, "grad_norm": optax.global_norm(grads),
                   **parts}
        return new, metrics

    frozen = {"base": base_params if lora_cfg is not None else None,
              "teacher": teacher_params}
    if in_shardings is not None and len(in_shardings) == 2:
        # callers spec (state, batch); the frozen arg rides unspecified
        in_shardings = (*in_shardings, None)
    jitted = jax.jit(step, donate_argnums=(0,) if donate else (),
                     in_shardings=in_shardings)
    return lambda state, batch: jitted(state, batch, frozen)


def make_diffusion_train_step(cfg, tx, sched: gaussian.DiffusionSchedule,
                              donate: bool = True,
                              seed: int | None = None):
    """Diffusion decoder training (reference trains via
    GaussianDiffusion.training_losses, diffusion.py:847-933).

    Batch: mel (B, 100, T) normalized targets, latents (B, Tl, 1024),
    conditioning_latents (B, 2C), rng for t/noise.

    ``seed=None``: the returned step takes an explicit rng argument.
    ``seed=<int>``: the step takes (state, batch) and derives its rng
    IN-GRAPH as fold_in(PRNGKey(seed), state.step) — seedable from
    config and resume-consistent (a checkpointed step counter replays
    the exact t/noise sequence the uninterrupted run would draw).
    """
    from ..models import diffusion as dtts

    def loss_fn(params, batch, rng):
        k_t, k_n = jax.random.split(rng)
        x_start = batch["mel"]
        b = x_start.shape[0]
        t = jax.random.randint(k_t, (b,), 0, sched.num_timesteps)
        noise = jax.random.normal(k_n, x_start.shape, x_start.dtype)
        x_t = gaussian.q_sample(x_start, t, noise, sched)
        code_emb = dtts.timestep_independent(
            params, batch["latents"], batch["conditioning_latents"],
            x_start.shape[-1], cfg)
        t_orig = jnp.asarray(sched.timestep_map)[t]
        out = dtts.forward(params, x_t, t_orig, code_emb, cfg)
        terms = gaussian.training_losses(out, x_start, x_t, t, noise, sched)
        return terms["loss"].mean(), {"loss.mse": terms["mse"].mean(),
                                      "loss.vb": terms["vb"].mean()}

    def step(state: TrainState, batch, rng):
        (loss, parts), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new = TrainState(params, opt_state, state.step + 1,
                         state.samples_processed + batch["mel"].shape[0],
                         state.tokens_processed)
        return new, {"loss": loss, "grad_norm": optax.global_norm(grads),
                     **parts}

    if seed is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def step_seeded(state: TrainState, batch):
        rng = jax.random.fold_in(jax.random.PRNGKey(seed), state.step)
        return step(state, batch, rng)

    return jax.jit(step_seeded, donate_argnums=(0,) if donate else ())


def make_dvae_train_step(cfg, tx, donate: bool = True):
    """DVAE training: recon + commitment losses with the EMA codebook
    update applied out-of-gradient (dvae.py:281-302)."""
    from ..models import dvae as dvae_m

    def loss_fn(params, batch):
        recon_loss, commit, recon, codes, new_vq = dvae_m.forward(
            params, batch["mel"], cfg, training=True)
        return recon_loss.mean() + commit, (commit, new_vq)

    def step(state: TrainState, batch):
        (loss, (commit, new_vq)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        # codebook buffers are EMA-updated, not grad-updated: zero their grads
        grads["codebook"] = jax.tree_util.tree_map(
            jnp.zeros_like, grads["codebook"])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        params = dict(params)
        params["codebook"] = {"embed": new_vq.embed,
                              "cluster_size": new_vq.cluster_size,
                              "embed_avg": new_vq.embed_avg}
        new = TrainState(params, opt_state, state.step + 1,
                         state.samples_processed + batch["mel"].shape[0],
                         state.tokens_processed)
        return new, {"loss": loss, "loss.commit": commit}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_vocoder_train_step(gen_cfg, tx_g, tx_d, disc_cfg=None,
                            mel_weight: float = 45.0, donate: bool = True):
    """BigVGAN adversarial training (reference bigvgan.py:543-762 +
    upstream BigVGAN train recipe): alternating discriminator /
    generator updates in one jitted call.

    State: one TrainState whose ``params`` = {"generator",
    "discriminator"} and ``opt_state`` = {"g", "d"}.
    Batch: {"wav": (B, T) 24 kHz segments, T a multiple of 256}.
    Losses: LSGAN adv + feature matching (x2) + ``mel_weight`` x mel L1.
    """
    from ..models import bigvgan as bv
    from ..models import bigvgan_disc as bvd
    if disc_cfg is None:
        disc_cfg = bvd.DiscriminatorConfig()

    def step(state: TrainState, batch) -> Tuple[TrainState, Metrics]:
        wav = batch["wav"]
        if wav.ndim == 2:
            wav = wav[:, None]                      # (B, 1, T)
        mel = bvd.training_mel(wav[:, 0])

        gen_params = state.params["generator"]
        fake_detached = jax.lax.stop_gradient(
            bv.forward(gen_params, mel, gen_cfg))

        def d_loss_fn(dp):
            rs, _ = bvd.discriminate(dp, wav, disc_cfg)
            fs, _ = bvd.discriminate(dp, fake_detached, disc_cfg)
            return bvd.discriminator_loss(rs, fs)

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(
            state.params["discriminator"])
        d_updates, d_opt = tx_d.update(d_grads, state.opt_state["d"],
                                       state.params["discriminator"])
        disc_params = optax.apply_updates(state.params["discriminator"],
                                          d_updates)

        def g_loss_fn(gp):
            fake = bv.forward(gp, mel, gen_cfg)
            _, real_f = bvd.discriminate(disc_params, wav, disc_cfg)
            fake_s, fake_f = bvd.discriminate(disc_params, fake, disc_cfg)
            adv = bvd.generator_loss(fake_s)
            fm = bvd.feature_loss(real_f, fake_f)
            ml = bvd.mel_loss(wav[:, 0], fake[:, 0])
            return adv + fm + mel_weight * ml, (adv, fm, ml)

        (g_loss, (adv, fm, ml)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True)(gen_params)
        g_updates, g_opt = tx_g.update(g_grads, state.opt_state["g"],
                                       gen_params)
        gen_params2 = optax.apply_updates(gen_params, g_updates)

        new = TrainState(
            {"generator": gen_params2, "discriminator": disc_params},
            {"g": g_opt, "d": d_opt}, state.step + 1,
            state.samples_processed + wav.shape[0],
            state.tokens_processed)
        return new, {"loss": g_loss, "loss.disc": d_loss,
                     "loss.adv": adv, "loss.fm": fm, "loss.mel": ml}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_clvp_train_step(cfg, tx, donate: bool = True):
    """CLVP InfoNCE training (clvp.py:138-141)."""
    from ..models import clvp as clvp_m

    def loss_fn(params, batch):
        return clvp_m.forward(params, batch["text"], batch["codes"], cfg,
                              return_loss=True), {}

    def step(state: TrainState, batch):
        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new = TrainState(params, opt_state, state.step + 1,
                         state.samples_processed + batch["text"].shape[0],
                         state.tokens_processed)
        return new, {"loss": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())
