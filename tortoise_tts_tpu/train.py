"""Training entry point (capability-parity with reference train.py).

    python -m tortoise_tts_tpu.train --yaml config.yaml

Builds the AR TrainState (or LoRA adapter state), the jitted DP/TP
train step, resumable dataloader, and runs the trainer loop with
checkpoint/eval scheduling.  Eval runs the generative round-trip and a
mel-spectral distance between hyp/ref audio (reference run_eval,
train.py:65-256, auraloss MelSTFT -> our stft-based distance).
"""

from __future__ import annotations

import argparse
import logging
import time
from pathlib import Path
from typing import Optional

import numpy as np

_logger = logging.getLogger(__name__)


def run_eval(cfg, state, val_ds, log_dir: Path, lora_cfg=None,
             base_params=None, max_samples: int = 4,
             prefix: str = "eval") -> dict:
    """Generative round-trip eval (reference run_eval, train.py:65-256).

    For a few val samples: AR decode with the current params,
    **conditioned on the eval sample's own reference latents** (the
    artifact carries both the AR and diffusion conditioning latents;
    reference train.py:99-213 conditions on the sample's audio) ->
    diffusion (30-step P sampler, cond_free off — train.py:77) ->
    vocoder, then a mel-spectral distance between hyp audio and the
    reference audio reconstructed from the sample's DVAE codes.  Wavs
    are dumped under logs/<step>/ for listening.

    ``prefix`` names the split in metric keys and wav filenames — the
    reference evaluates BOTH a subtrain slice and the val set per eval
    (train.py:216-256; subtrain is its overfitting probe).
    """
    import jax
    import jax.numpy as jnp
    from .inference import TTS
    from .models import load_model
    from .models.lora import apply_lora
    from .utils.io import write_wav

    step = int(state.step)
    out_dir = log_dir / str(step)
    out_dir.mkdir(parents=True, exist_ok=True)

    params = state.params
    if lora_cfg is not None:
        params = apply_lora(base_params, params, lora_cfg.alpha,
                            lora_cfg.rank)

    tts = TTS(config=cfg, dtype=cfg.trainer.weight_dtype)
    ar = load_model("autoregressive", cfg.trainer.weight_dtype)
    from .models import LoadedModel
    tts._models["autoregressive"] = LoadedModel(
        "autoregressive", ar.module, ar.config, params, True)
    dvae = load_model("dvae", cfg.trainer.weight_dtype)

    from .models import load_mel_norms
    from .ops.stft import mel_ar, resample
    from .tokenizer import default_tokenizer
    tok = default_tokenizer()
    # DVAE codes were produced from mel_norms-divided mels
    # (emb/mel.py:100-102), so dvae.decode returns mels in that
    # normalized space; the hyp mel must be computed with the same
    # norms or the L1 mixes two scales.
    mel_norms = load_mel_norms()
    norms = jnp.asarray(mel_norms) if mel_norms is not None else None
    dists = []
    it = val_ds.batches(batch_size=1)
    for i in range(min(max_samples, len(val_ds))):
        batch = next(it)
        n = int(batch["wav_lengths"][0]) // 1024
        codes = jnp.asarray(batch["codes"][:, :max(n, 4)])
        # the reference ground-truth in DVAE-mel space (80-bin, 22.05 kHz)
        ref_mel = dvae.module.decode(dvae.params, codes, dvae.config)
        text = tok.decode(batch["text"][0][:int(batch["text_lengths"][0])])
        # Evaluation.kwargs remap (reference config.py:369-397 ar_kwargs)
        ek = cfg.evaluation.kwargs or {}
        try:
            hyp_wav, _ = tts.inference(
                text or "evaluation sample", None,
                conditioning_latents=(batch["latents"][:1],
                                      batch["diffusion_latents"][:1]),
                max_ar_steps=int(ek.get("max_steps",
                                        min(200, n * 2 + 16))),
                ar_temp=float(ek.get("ar_temp", 0.8)),
                top_p=float(ek.get("top_p", 1.0)),
                top_k=int(ek.get("top_k", 0)),
                max_diffusion_steps=30, diffusion_sampler="p",
                cond_free=False, seed=step + i)
        except Exception as e:
            _logger.warning("eval generation failed: %s", e)
            continue
        write_wav(out_dir / f"{prefix}_{i}_hyp.wav", hyp_wav, 24_000)
        # hyp audio -> 22.05 kHz 80-bin mel, L1 vs ref over common frames
        hyp22 = resample(jnp.asarray(hyp_wav[None]), 24_000, 22_050)
        hyp_mel = mel_ar(hyp22, norms)
        t = min(hyp_mel.shape[-1], ref_mel.shape[-1])
        if t > 4:
            d = float(jnp.mean(jnp.abs(hyp_mel[..., :t]
                                       - ref_mel[..., :t])))
            dists.append(d)
    metric = float(np.mean(dists)) if dists else float("nan")
    _logger.info("%s@%d: mel_distance=%.4f (%d samples)",
                 prefix, step, metric, len(dists))
    return {f"{prefix}.mel_distance": metric}


def main(argv=None):
    import os
    parser = argparse.ArgumentParser("tortoise_tts_tpu.train")
    parser.add_argument("--yaml", type=Path,
                        default=os.environ.get("TORTOISE_YAML"),
                        required="TORTOISE_YAML" not in os.environ)
    parser.add_argument("--iterations", type=int, default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    import jax
    from .config import Config
    from .data import create_train_val_dataloader
    from .engine.factory import load_engines
    from .models import load_model
    from .parallel import mesh as pmesh
    from .utils.trainer import train_engines

    cfg = Config.load(args.yaml)

    if cfg.trainer.detect_grad_anomaly:
        # torch.autograd.set_detect_anomaly equivalent (reference
        # trainer.py:183): error out at the op that first produces a
        # NaN instead of training on silently
        jax.config.update("jax_debug_nans", True)

    train_ds, val_ds = create_train_val_dataloader(
        cfg, jax.process_index(), jax.process_count())

    mesh = pmesh.make_mesh(*cfg.trainer.mesh_shape) \
        if len(cfg.trainer.mesh_shape) == 2 else pmesh.make_mesh()
    nd = int(mesh.shape["data"])
    if cfg.hyperparameters.batch_size % nd:
        raise ValueError(
            f"hyperparameters.batch_size={cfg.hyperparameters.batch_size} "
            f"must be divisible by the mesh data axis ({nd}) — each step's "
            "host batch is DP-sharded over it")

    # one engine per cfg.models entry (reference load_engines,
    # engines/__init__.py:40-338) — AR / diffusion / DVAE / CLVP /
    # BigVGAN, each with its own optimizer and feeder
    engines = load_engines(cfg, training=True)
    if mesh.size > 1:
        # real multi-chip layout: params/opt-state device_put per
        # trainer.param_sharding (DDP+TP 'replicated' or ZeRO-3 'fsdp')
        engines.shard(mesh, cfg.trainer.param_sharding)
    _logger.info("engines: %s (resumed at step %d)",
                 engines.names(), engines.global_step)
    train_ds.load_state(cfg.ckpt_dir /
                        f"sampler.{jax.process_index()}.state")

    def save_fn(es, step):
        es.save_checkpoint(cfg.ckpt_dir,
                           keep_last=cfg.trainer.keep_last_checkpoints,
                           is_leader=pmesh.is_leader(),
                           mode=("async" if cfg.trainer.async_checkpoint
                                 else "sync"))
        train_ds.save_state(cfg.ckpt_dir /
                            f"sampler.{jax.process_index()}.state")

    ar_engine_name = (cfg.lora.full_name
                      if cfg.lora is not None and cfg.lora.training
                      else "autoregressive")

    # subtrain eval split: a sequential (non-training) view over the
    # TRAINING paths — the reference's overfitting probe evaluates both
    # a subtrain slice and the val set per eval (train.py:216-256).
    # Built lazily on the first eval: a separate Dataset leaves the
    # resumable training sampler untouched, and runs with eval disabled
    # never pay the duplicate metadata scan.
    _subtrain: list = []

    def eval_fn(es):
        if ar_engine_name not in es:
            return
        if not _subtrain:
            from .data import Dataset as _Dataset
            _subtrain.append(_Dataset(cfg, cfg.dataset.training,
                                      training=False))
        lora_cfg = cfg.lora if cfg.lora is not None and \
            cfg.lora.training else None
        base = (load_model("autoregressive",
                           cfg.trainer.weight_dtype).params
                if lora_cfg else None)
        for name, ds in (("subtrain", _subtrain[0]), ("val", val_ds)):
            run_eval(cfg, es[ar_engine_name], ds, log_dir,
                     lora_cfg=lora_cfg, base_params=base,
                     max_samples=cfg.evaluation.size, prefix=name)

    class ShardedBatches:
        """DP-shard each host batch over the mesh before engines.step."""
        def __len__(self):
            return len(train_ds)

        def batches(self):
            for batch in train_ds.batches():
                yield pmesh.shard_batch(mesh, batch)

    log_dir = cfg.log_dir / time.strftime("%Y%m%d_%H%M%S")
    log_dir.mkdir(parents=True, exist_ok=True)

    engines = train_engines(cfg, ShardedBatches(), engines,
                            eval_fn=eval_fn, save_fn=save_fn,
                            log_path=log_dir / "log.txt",
                            max_iterations=args.iterations)
    return engines


if __name__ == "__main__":
    main()
