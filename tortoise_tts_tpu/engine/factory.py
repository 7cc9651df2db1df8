"""Config-driven engine factory (reference load_engines,
engines/__init__.py:40-338).

Builds one engine per ``cfg.models`` entry with ``training=True``: model
weights (checkpoint > explicit path > registry weights > random init,
with shape-resize compat), a per-model optimizer/scheduler (global
hyperparameters plus per-model overrides), the matching jitted train
step, and a feeder that maps the global artifact batch onto the
engine's inputs.  LoRA (``cfg.loras``) redirects the AR engine to
adapter training; ``teacher: true`` models are loaded frozen and plumbed
into the AR step's distillation term.

The diffusion engine's feeder computes the AR hidden latents on the fly
with the *current* AR params when the AR engine co-trains (otherwise the
frozen registry AR) — the TorToiSe recipe (diffusion conditions on AR
latents, reference diffusion.py:1487-1515).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Any, Dict, Optional

import numpy as np

from ..config import Config, Hyperparameters, ModelConfig
from . import optim
from . import state as st
from . import train_step as ts
from .engines import Engines

_logger = logging.getLogger(__name__)

TRAINABLE = ("autoregressive", "diffusion", "dvae", "clvp", "bigvgan")


def _merged_hp(cfg: Config, m: ModelConfig) -> Hyperparameters:
    if not m.hyperparameters:
        return cfg.hyperparameters
    import dataclasses
    known = {f.name for f in dataclasses.fields(Hyperparameters)}
    over = {k: v for k, v in m.hyperparameters.items() if k in known}
    for k in m.hyperparameters:
        if k not in known:
            _logger.warning("models.%s.hyperparameters: unknown key %s",
                            m.name, k)
    return dataclasses.replace(cfg.hyperparameters, **over)


def _resize_like(loaded, template):
    """Shape-compat resize on load (reference resize_modules,
    engines/__init__.py:241-247 + ml.resize_weight): pad/truncate the
    leading dim when vocab-size experiments change it."""
    import jax.numpy as jnp

    def leaf(l, t):
        l = jnp.asarray(l)
        if l.shape == t.shape:
            return l.astype(t.dtype)
        if l.ndim == t.ndim and l.shape[1:] == t.shape[1:]:
            n, m = l.shape[0], t.shape[0]
            if n > m:
                out = l[:m]
            else:
                out = jnp.concatenate([l, jnp.zeros((m - n,) + t.shape[1:],
                                                    l.dtype)], axis=0)
            _logger.warning("resized %s -> %s on load",
                            tuple(l.shape), tuple(t.shape))
            return out.astype(t.dtype)
        raise ValueError(f"shape mismatch {l.shape} vs {t.shape}")

    import jax
    return jax.tree_util.tree_map(leaf, loaded, template)


def load_engines(cfg: Config, training: bool = True,
                 mesh=None) -> Engines:
    """Build Engines from ``cfg.models`` (reference load_engines)."""
    import jax

    from ..models import LoadedModel, load_model
    from ..models.lora import apply_lora, init_lora

    engines = Engines()
    dtype = cfg.trainer.weight_dtype if training \
        else cfg.inference.weight_dtype

    loaded: Dict[str, LoadedModel] = {}
    teacher_params = None
    teacher_cfg = None
    for m in cfg.models:
        lm = load_model(m.name, dtype)
        if m.path:
            from ..utils.io import load_state_dict
            sd = load_state_dict(m.path)
            if any("/" in k for k in sd):
                # this package's export layout (state.flatten_tree
                # '/'-joined names)
                params = st.unflatten_like(lm.params, sd)
            elif any("." in k for k in sd):
                # reference torch layout — same converters load_model
                # uses (key remap + Conv1D orientation,
                # reference engines/__init__.py:120-171)
                from ..models import convert_torch_sd
                params = convert_torch_sd(m.name, sd, lm.config)
            else:
                params = sd
            if cfg.trainer.resize_modules:
                params = _resize_like(params, lm.params)
            lm = LoadedModel(lm.name, lm.module, lm.config, params, True)
        loaded[m.name] = lm
        if m.teacher:
            teacher_params = lm.params
            teacher_cfg = lm.config

    # Diffusion-latent computation: use the CURRENT AR params when the
    # AR engine co-trains (under its LoRA name if adapted — the adapted
    # model, not the frozen base, is what inference will run), else the
    # loaded/frozen AR.  `ar_engine` is filled in when the AR engine is
    # added below; the AR model/config are only materialised if a
    # diffusion engine actually needs them.
    lora = cfg.lora
    ar_engine: Dict[str, str] = {}

    def ar_latents_provider():
        name = ar_engine.get("name")
        if name is not None and name in engines:
            p = engines[name].params
            if ar_engine.get("lora"):
                p = apply_lora(loaded["autoregressive"].params, p,
                               lora.alpha, lora.rank)
            return p
        if "autoregressive" in loaded:
            return loaded["autoregressive"].params
        return load_model("autoregressive", dtype).params

    _latent_fn_cache: Dict[str, Any] = {}

    def latent_fn(*args):
        if "fn" not in _latent_fn_cache:
            ar_cfg = (loaded.get("autoregressive")
                      or load_model("autoregressive", dtype)).config
            _latent_fn_cache["fn"] = jax.jit(
                partial(_ar_latents, cfg=ar_cfg))
        return _latent_fn_cache["fn"](*args)

    for m in cfg.models:
        if not (training and m.training) or m.teacher:
            continue
        if m.name not in TRAINABLE:
            _logger.warning("model %s has no train step; skipping", m.name)
            continue
        hp = _merged_hp(cfg, m)
        tx = optim.make_optimizer(hp)
        lm = loaded[m.name]
        donate = cfg.trainer.donate_train_state

        if m.name == "autoregressive":
            if lora is not None and lora.training:
                lora_params = init_lora(jax.random.PRNGKey(0), lm.params,
                                        rank=lora.rank)
                state = st.init_state(lora_params, tx)
                step_fn = ts.make_ar_train_step(
                    lm.config, tx,
                    remat=cfg.trainer.gradient_checkpointing,
                    lora_cfg=lora, base_params=lm.params,
                    teacher_params=teacher_params,
                    teacher_alpha=hp.teacher_alpha,
                    teacher_temperature=hp.teacher_temperature,
                    donate=donate)
                name = lora.full_name
                ar_engine.update(name=name, lora=True)
            else:
                state = st.init_state(lm.params, tx)
                step_fn = ts.make_ar_train_step(
                    lm.config, tx,
                    remat=cfg.trainer.gradient_checkpointing,
                    teacher_params=teacher_params,
                    teacher_alpha=hp.teacher_alpha,
                    teacher_temperature=hp.teacher_temperature,
                    donate=donate)
                name = m.full_name
                ar_engine.update(name=name, lora=False)
            engines.add(name, state, step_fn,
                        batch_selector=_select_ar,
                        config={"model": m.name, "base_lr": hp.learning_rate})

        elif m.name == "diffusion":
            from ..models import gaussian
            # training samples over the full original schedule
            # (reference get_diffuser trained_diffusion_steps=4000)
            sched = gaussian.get_schedule(steps=4000, cond_free=False)
            # rng derives in-graph from trainer.seed + state.step:
            # config-seedable and resume-consistent (a resumed run
            # replays the t/noise draws of the uninterrupted one)
            diff_step = ts.make_diffusion_train_step(
                lm.config, tx, sched, seed=cfg.trainer.seed,
                donate=donate)

            def diff_select(batch):
                if "mel_diff" not in batch:
                    raise KeyError(
                        "diffusion training needs 'mel_diff' targets — "
                        "re-run emb.process with store_mels and set "
                        "dataset.load_mels: true")
                lat = latent_fn(ar_latents_provider(),
                                batch["latents"], batch["text"],
                                batch["text_lengths"], batch["codes"],
                                batch["wav_lengths"])
                return {"mel": batch["mel_diff"],
                        "latents": lat,
                        "conditioning_latents": batch["diffusion_latents"]}

            state = st.init_state(lm.params, tx)
            engines.add(m.full_name, state, diff_step,
                        batch_selector=diff_select,
                        config={"model": m.name, "base_lr": hp.learning_rate})

        elif m.name == "dvae":
            state = st.init_state(lm.params, tx)
            dvstep = ts.make_dvae_train_step(lm.config, tx, donate=donate)

            def dvae_select(batch):
                if "mel" not in batch:
                    raise KeyError(
                        "dvae training needs 'mel' targets — re-run "
                        "emb.process with store_mels and set "
                        "dataset.load_mels: true")
                return {"mel": batch["mel"]}

            engines.add(m.full_name, state, dvstep,
                        batch_selector=dvae_select,
                        config={"model": m.name, "base_lr": hp.learning_rate})

        elif m.name == "clvp":
            state = st.init_state(lm.params, tx)
            cstep = ts.make_clvp_train_step(lm.config, tx, donate=donate)
            engines.add(m.full_name, state, cstep,
                        batch_selector=lambda b: {"text": b["text"],
                                                  "codes": b["codes"]},
                        config={"model": m.name, "base_lr": hp.learning_rate})

        elif m.name == "bigvgan":
            tx_d = optim.make_optimizer(hp)
            vstep = ts.make_vocoder_train_step(lm.config, tx, tx_d,
                                           donate=donate)
            from ..models import bigvgan_disc as bvd
            disc = bvd.init(jax.random.PRNGKey(1))
            import jax.numpy as jnp
            params = {"generator": lm.params, "discriminator": disc}
            state = st.TrainState(params,
                                  {"g": tx.init(lm.params),
                                   "d": tx_d.init(disc)},
                                  jnp.zeros((), jnp.int32),
                                  jnp.zeros((), jnp.int32),
                                  jnp.zeros((), jnp.int32))
            engines.add(m.full_name, state, vstep,
                        batch_selector=lambda b: {"wav": b["wav"]},
                        config={"model": m.name, "base_lr": hp.learning_rate})

    if not engines.names() and training:
        raise RuntimeError("training, but no model set to train "
                           "(reference trainer.py:140-147 behavior)")

    # resume (reference engines.load_checkpoint)
    engines.load_checkpoint(cfg.ckpt_dir, strict=cfg.trainer.strict_loading)
    return engines


def _ar_latents(params, cond, text, text_lengths, codes, wav_lengths, cfg):
    from ..models import unified_voice as uv
    return uv.forward(params, cond, text, text_lengths, codes,
                      wav_lengths, cfg, return_latent=True)


def _select_ar(batch):
    return {k: batch[k] for k in ("latents", "text", "text_lengths",
                                  "codes", "wav_lengths")}
