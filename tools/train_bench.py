"""Sustained on-chip training bench: the REAL trainer loop at full AR
scale (BASELINE config #5's finetuning half).

    python tools/train_bench.py [--steps 55] [--lora] [--batch 8]

Runs `train_engines` end-to-end — config -> load_engines -> native
melbin loader (pipelined batch assembly) -> log-cadence metric fetch ->
one in-loop checkpoint — on synthetic full-shape data, and reports:

  steady_ms_per_step   wall/step over the steady window (excludes the
                       first 10 warmup/compile steps and the checkpoint
                       step), fetch-cadence steps included
  tokens_per_s         STEADY-WINDOW real tokens / steady-window wall
                       (excludes warmup/compile and the checkpoint —
                       the round-4 record divided by total wall and
                       understated steady throughput ~24x)
  mfu                  6*N*tokens_per_s / chip peak (TPU only; bf16
                       peak 197 TFLOP/s on v5e)
  loader_stall_ms      mean time the loop waited on `next(batches)` —
                       the native loader assembles one batch ahead, so
                       this is the pipeline-stall measurement
  checkpoint_stall_s   train-loop stall of the one in-loop save (async
                       mode: the on-device snapshot only)
  checkpoint_write_s   background transfer+write wall of that save

Emits one JSON line for benchmarks/r05.json.
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
os.environ.setdefault("TORTOISE_TPU_OFFLINE", "1")

import numpy as np


def make_dataset(root: Path, n: int = 64, codes_len: int = 240,
                 text_len: int = 100, dim: int = 1024):
    d = root / "data" / "bench" / "speaker"
    d.mkdir(parents=True, exist_ok=True)
    rng = np.random.RandomState(0)
    for i in range(n):
        nc = codes_len + int(rng.randint(-24, 16))
        artifact = {
            "codes": rng.randint(0, 8192, (nc,)).astype(np.uint16),
            "conds": (rng.randn(1, 1, 80, 100).astype(np.float32),
                      rng.randn(1, 1, 100, 100).astype(np.float32)),
            "latent": (rng.randn(1, dim).astype(np.float32),
                       rng.randn(1, 2 * dim).astype(np.float32)),
            "text": rng.randint(3, 255,
                                (text_len + int(rng.randint(-20, 20)),)
                                ).astype(np.uint8),
            "metadata": {"original_length": nc * 1024,
                         "sample_rate": 22050,
                         "duration": nc * 1024 / 22050,
                         "text": "bench"},
        }
        with open(d / f"utt{i:04d}.mel", "wb") as f:
            np.save(f, artifact)
    return root / "data"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=55)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lora", action="store_true")
    ap.add_argument("--no-melbin", action="store_true")
    ap.add_argument("--small", action="store_true",
                    help="tiny AR (CPU smoke of the loop plumbing)")
    ap.add_argument("--sync-ckpt", action="store_true",
                    help="synchronous checkpoint (A/B the async path)")
    args = ap.parse_args()

    import yaml
    import jax

    tmp = Path(tempfile.mkdtemp(prefix="trainbench_"))
    data_dir = make_dataset(tmp, dim=64 if args.small else 1024)

    cfg_raw = {
        "models": [{"name": "autoregressive", "training": True}],
        "hyperparameters": {"batch_size": args.batch,
                            "gradient_accumulation_steps": 1,
                            "learning_rate": 1e-5,
                            "optimizer": "AdamW"},
        "trainer": {"iterations": args.steps, "save_frequency": 45,
                    "export_on_save": False, "log_frequency": 10,
                    "keep_last_checkpoints": 1,
                    "weight_dtype": "bfloat16",
                    "async_checkpoint": not args.sync_ckpt,
                    "gradient_checkpointing": True},
        "dataset": {"training": [str(data_dir)], "validate": False,
                    "text_bucket": 128, "mel_bucket": 256,
                    "use_melbin": not args.no_melbin},
        "evaluation": {"frequency": 0},
    }
    if args.lora:
        cfg_raw["loras"] = [{"name": "bench-lora", "rank": 128,
                             "alpha": 128, "training": True}]
    cfg_path = tmp / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg_raw))

    from tortoise_tts_tpu.config import Config
    from tortoise_tts_tpu.data import Dataset
    from tortoise_tts_tpu.data.native_loader import pack_melbin
    from tortoise_tts_tpu.engine.factory import load_engines
    from tortoise_tts_tpu.utils import trainer as tr

    if args.small:
        import jax as _jax
        import tortoise_tts_tpu.models as models_pkg
        from tortoise_tts_tpu.models import LoadedModel
        from tortoise_tts_tpu.models import unified_voice as uv_m
        small_cfg = uv_m.UnifiedVoiceConfig(layers=2, model_dim=64,
                                            heads=4, max_text_tokens=130,
                                            max_mel_tokens=260)
        models_pkg.load_model = lambda name, dtype="float32": LoadedModel(
            name, uv_m, small_cfg,
            uv_m.init(_jax.random.PRNGKey(0), small_cfg), False)

    cfg = Config.load(cfg_path)
    if not args.no_melbin:
        paths = sorted((data_dir / "bench" / "speaker").glob("*.mel"))
        pack_melbin(paths, cfg.rel_path / "data.melbin")

    ds = Dataset(cfg, cfg.dataset.training, training=True)
    engines = load_engines(cfg, training=True)
    name = engines.names()[0]
    print(f"engine: {name}, backend: {jax.default_backend()}, "
          f"melbin: {ds._melbin is not None}", flush=True)

    # instrument: loader wait + per-step wall + checkpoint wall
    stalls, steps_t, ckpt_s = [], [], [0.0]

    class TimedBatches:
        def __len__(self):
            return len(ds)

        def batches(self):
            it = ds.batches()
            while True:
                t0 = time.perf_counter()
                b = next(it)
                stalls.append(time.perf_counter() - t0)
                yield b

    orig_step = engines.step

    def timed_step(batch, fetch_metrics=True):
        t0 = time.perf_counter()
        out = orig_step(batch, fetch_metrics=fetch_metrics)
        steps_t.append(time.perf_counter() - t0)
        return out

    engines.step = timed_step

    save_at = [None]          # steps_t index when the save was issued

    def save_fn(es, step):
        save_at[0] = len(steps_t)
        t0 = time.perf_counter()
        es.save_checkpoint(cfg.ckpt_dir,
                           keep_last=cfg.trainer.keep_last_checkpoints,
                           mode=("sync" if args.sync_ckpt else "async"))
        ckpt_s[0] = time.perf_counter() - t0
        print(f"checkpoint@{step}: stall {ckpt_s[0]:.2f}s", flush=True)

    tr._non_blocking_input = lambda: ""
    t_start = time.perf_counter()
    engines = tr.train_engines(cfg, TimedBatches(), engines,
                               save_fn=save_fn,
                               max_iterations=args.steps)
    wall = time.perf_counter() - t_start

    # steady window: skip the first 10 (compile/warmup) steps.  The
    # checkpoint wall is NOT in steps_t (save_fn is timed separately,
    # timed_step wraps only engines.step), so every remaining step —
    # including log-cadence metric-fetch steps — counts.
    skip = 10 if len(steps_t) > 10 else 0
    # steady window ends where the in-loop checkpoint was issued: the
    # steps that overlap the BACKGROUND write may contend with its
    # relay transfers and are reported as their own metric, not
    # blended in.  Sync mode has no background write — no cut, and no
    # misleading "overlap" figure.
    cut = (save_at[0] if save_at[0] is not None and not args.sync_ckpt
           else len(steps_t))
    window = steps_t[skip:cut]
    overlap = steps_t[cut:]
    st_stalls = stalls[skip:] or stalls
    steady = float(np.mean(window)) if window else float("nan")
    st = engines[name]
    tokens = int(st.tokens_processed)
    # steady-window throughput: real tokens per step x window steps /
    # window wall — warmup/compile steps and the checkpoint are
    # excluded (the r4 record divided total tokens by total wall,
    # checkpoint included, understating steady throughput ~24x)
    tok_per_step = tokens / max(1, len(steps_t))
    tokens_per_s = (tok_per_step * len(window) / sum(window)
                    if window else float("nan"))
    # MFU on the 6*N*T basis (N = trainable+frozen params touched by
    # the fwd+bwd; v5e bf16 peak 197 TFLOP/s).  LoRA steps backprop
    # through the full trunk, so N is the full model either way.
    n_params = sum(int(np.prod(np.shape(p)))
                   for p in jax.tree_util.tree_leaves(st.params))
    peak = 197e12
    mfu = (6.0 * n_params * tokens_per_s / peak
           if jax.default_backend() == "tpu" else None)
    saver = getattr(engines, "_saver", None)
    result = {
        "mode": "lora" if args.lora else "full",
        "steps": len(steps_t),
        "steady_ms_per_step": round(steady * 1e3, 1),
        "tokens_per_s": round(tokens_per_s, 0),
        "mfu": round(mfu, 3) if mfu is not None else None,
        "n_params": n_params,
        "loader_stall_ms_mean": round(float(np.mean(st_stalls)) * 1e3, 2),
        "loader_stall_ms_max": round(float(np.max(st_stalls)) * 1e3, 2),
        "ckpt_overlap_ms_per_step": (round(float(np.mean(overlap)) * 1e3,
                                           1) if overlap else None),
        "checkpoint_stall_s": round(ckpt_s[0], 2),
        "checkpoint_write_s": (round(saver.last_write_s, 1)
                               if saver is not None
                               and saver.last_write_s
                               else round(ckpt_s[0], 1)),
        "ckpt_mode": "sync" if args.sync_ckpt else "async",
        "wall_s": round(wall, 1),
        "melbin": ds._melbin is not None,
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
