"""Config system: YAML -> immutable nested dataclasses.

Capability-parity with reference config.py:174-925 (Dataset / Model /
LoRA / Hyperparameters / Evaluation / Trainer / Inference groups, YAML
loading with unknown-key warnings, path conventions), with one deliberate
design delta (SURVEY §7): **no process-global mutable ``cfg`` singleton**.
A ``Config`` is constructed explicitly and passed down; anything that
affects jit'd code (model dims, buckets, dtypes) is hashable/static.

The YAML schema accepts the reference's key names (data/config.yaml) so
existing configs load; TPU-specific knobs live under ``trainer`` /
``inference`` with sensible defaults.
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple

import yaml

_logger = logging.getLogger(__name__)


def _build(cls, data: Optional[dict], path: str = ""):
    """Recursively build a dataclass from a dict, warning on unknown keys
    (mirrors reference prune_missing, config.py:102-109)."""
    if data is None:
        return cls()
    fields = {f.name: f for f in dataclasses.fields(cls)}
    kwargs = {}
    for k, v in data.items():
        if k not in fields:
            _logger.warning("config: unknown key %s%s", path, k)
            continue
        f = fields[k]
        sub = f.type if isinstance(f.type, type) else None
        if dataclasses.is_dataclass(sub) and isinstance(v, dict):
            v = _build(sub, v, path=f"{path}{k}.")
        if isinstance(v, list):
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        kwargs[k] = v
    return cls(**kwargs)


@dataclass(frozen=True)
class ModelConfig:
    """One named model in the pipeline (reference config.py Model)."""
    name: str = "autoregressive"
    training: bool = False
    # explicit weights path (reference model.config.path,
    # engines/__init__.py:66-68)
    path: Optional[str] = None
    # teacher models are loaded frozen for distillation
    # (engines/__init__.py:49; engines/base.py:518-543)
    teacher: bool = False
    # per-model hyperparameter overrides merged over the global
    # Hyperparameters (optimizer/learning_rate/... per engine)
    hyperparameters: Optional[dict] = None
    # TPU additions
    dtype: str = "bfloat16"

    @property
    def full_name(self) -> str:
        return self.name


@dataclass(frozen=True)
class LoRAConfig:
    name: str = "lora"
    rank: int = 128
    alpha: int = 128
    training: bool = True
    # which modules to wrap (reference config.py:296-310 include policy)
    include: Tuple[str, ...] = ("gpt",)
    path: Optional[str] = None

    @property
    def full_name(self) -> str:
        return f"{self.name}-r{self.rank}-a{self.alpha}"


@dataclass(frozen=True)
class Hyperparameters:
    batch_size: int = 16
    gradient_accumulation_steps: int = 4
    gradient_clipping: float = 1.0
    warmup_steps: int = 100
    optimizer: str = "AdamW"
    learning_rate: float = 1e-4
    scheduler: str = ""
    # reference deepspeed-only fields accepted and ignored
    autotune: bool = False
    autotune_params: Optional[dict] = None
    torch_optimizer: bool = True
    torch_scheduler: bool = True
    teacher_alpha: float = 0.5
    teacher_temperature: float = 1.0
    teacher_loss_fn: str = "mse"


@dataclass(frozen=True)
class Evaluation:
    batch_size: int = 8
    frequency: int = 5000
    size: int = 8
    kwargs: Optional[dict] = None


@dataclass(frozen=True)
class Trainer:
    iterations: int = 1_000_000
    save_tag: str = "step"
    save_on_oom: bool = True
    save_on_quit: bool = True
    save_frequency: int = 250
    export_on_save: bool = True
    keep_last_checkpoints: int = 4
    gradient_checkpointing: bool = True
    strict_loading: bool = False
    resize_modules: bool = True
    weight_dtype: str = "bfloat16"
    amp: bool = False
    backend: str = "local"          # accepted for compat; always jax here
    load_webui: bool = False
    deepspeed: Optional[dict] = None  # accepted, ignored (no deepspeed on TPU)
    # TPU additions
    mesh_axes: Tuple[str, ...] = ("data",)
    mesh_shape: Tuple[int, ...] = (-1,)
    wandb: bool = False
    detect_grad_anomaly: bool = False
    # global training seed (reference utils.set_seed); drives the
    # diffusion step's in-graph t/noise rng via fold_in(seed, step)
    seed: int = 0
    # metric device->host fetch cadence: through the remote relay every
    # fetch is a ~50-100 ms round trip, so fetching per step caps real
    # TPU step rate; off-cadence steps are dispatch-only
    log_frequency: int = 10
    # periodic checkpoints: snapshot on device + write in a background
    # thread (the synchronous full-AR save measured 124.9 s of dead
    # chip through the relay; the snapshot stall is the HBM copy only).
    # Terminal saves (save_on_quit, OOM recovery) are always joined
    # before the process continues past them.
    async_checkpoint: bool = True
    # donate the TrainState buffers to the jitted step (halves peak HBM
    # during the update).  Set false to make OOM-skip recovery free:
    # with donation on, a step that dies mid-execution consumes the
    # state and Engines.step rebuilds it from the last checkpoint
    donate_train_state: bool = True
    # training param layout: "replicated" (DDP role) or "fsdp"
    # (ZeRO-3 role — params sharded over 'data', allgathered per use by
    # GSPMD; reference config.py:533-545 zero_optimization stages)
    param_sharding: str = "replicated"

    def dtype(self):
        import jax.numpy as jnp
        return {"float32": jnp.float32, "float16": jnp.float16,
                "bfloat16": jnp.bfloat16}[self.weight_dtype]


@dataclass(frozen=True)
class Inference:
    backend: str = "local"
    normalize: bool = False
    weight_dtype: str = "bfloat16"
    amp: bool = False
    auto_unload: bool = False   # CPU offload is a non-feature on TPU
    batch_size: int = 1
    # static decode buckets (SURVEY §7 'fixed shapes under jit')
    text_buckets: Tuple[int, ...] = (64, 128, 256, 402)
    mel_frame_bucket: int = 256   # diffusion length rounding, frames
    # AR-decode GEMV quantization ("none" | "int8" | "w8a8"): "int8" is
    # weight-only (halves decode weight HBM traffic; models/
    # unified_voice.quantize_decode_weights), "w8a8" adds dynamic
    # per-row activation quant + int8 MXU dots (ops/pallas_gemv.
    # qgemv_stacked_w8a8) at some extra quantization noise.
    # Prefill/latents/logits stay bf16 in every mode.
    # Default int8 == the benched config (bench.py); quality guardrails:
    # tests/fullscale_census.py::test_zz_int8_fullsize_quality_guardrail
    # (run via tests/test_zz_fullscale.py) + the small-model int8
    # agreement tests in tests/test_unified_voice.py.
    decode_quant: str = "int8"

    def __post_init__(self):
        # fail loudly on typos (e.g. BENCH_QUANT=W8A8) — a silently
        # ignored value would run unquantized and corrupt perf A/Bs
        if self.decode_quant not in ("none", "int8", "w8a8"):
            raise ValueError(
                f"decode_quant must be none|int8|w8a8, got "
                f"{self.decode_quant!r}")

    def dtype(self):
        import jax.numpy as jnp
        return {"float32": jnp.float32, "float16": jnp.float16,
                "bfloat16": jnp.bfloat16}[self.weight_dtype]


@dataclass(frozen=True)
class DatasetConfig:
    training: Tuple[str, ...] = ()
    validation: Tuple[str, ...] = ()
    noise: Tuple[str, ...] = ()
    speaker_name_getter: str = "lambda p: f'{p.parts[-3]}_{p.parts[-2]}'"
    speaker_group_getter: str = "lambda p: f'{p.parts[-3]}'"
    speaker_languages: Optional[dict] = None
    use_hdf5: bool = False
    hdf5_flag: str = "r"
    hdf5_name: str = "data.h5"
    use_metadata: bool = True
    validate: bool = True
    workers: int = 2
    cache: bool = True
    duration_range: Tuple[float, float] = (3.0, 5.0)
    min_utterances: int = 2
    prompt_max_samples: int = 1
    prompt_duration_range: Tuple[float, float] = (3.0, 6.0)
    prompt_similar_p: float = 1.0
    resps_max_samples: int = 1
    resps_append_p: float = 0.0
    sample_type: str = "path"
    sample_order: str = "duration"
    sample_max_duration_batch: float = 0
    sample_shuffle: bool = False
    retokenize_text: bool = False
    tasks_list: Tuple[str, ...] = ("tts",)
    # TPU additions
    text_bucket: int = 256       # fixed text length for training batches
    mel_bucket: int = 512        # fixed mel-code length for training batches
    use_melbin: bool = False     # native C++ packed-dataset loader
    load_mels: bool = False      # load mel/mel_diff training targets
                                 # (artifacts written with store_mels)


@dataclass(frozen=True)
class Config:
    yaml_path: Optional[str] = None
    device: str = "tpu"
    mode: str = "training"
    audio_backend: str = "mel"
    sample_rate: int = 24_000
    vocoder: str = "bigvgan"
    models: Tuple[ModelConfig, ...] = (ModelConfig(),)
    loras: Tuple[LoRAConfig, ...] = ()
    hyperparameters: Hyperparameters = field(default_factory=Hyperparameters)
    evaluation: Evaluation = field(default_factory=Evaluation)
    trainer: Trainer = field(default_factory=Trainer)
    inference: Inference = field(default_factory=Inference)
    dataset: DatasetConfig = field(default_factory=DatasetConfig)
    optimizations: Optional[dict] = None  # accepted, ignored
    weights_format: str = "sft"
    # wildcard dataset paths that match nothing: () instead of raising
    # (reference config.py:795-800)
    silent_errors: bool = False

    # ---- path conventions (reference config.py:38-67) ----
    @property
    def cfg_path(self) -> Optional[Path]:
        return Path(self.yaml_path).parent if self.yaml_path else None

    @property
    def rel_path(self) -> Path:
        return self.cfg_path if self.cfg_path else Path(".")

    @property
    def ckpt_dir(self) -> Path:
        return self.rel_path / "ckpt"

    @property
    def log_dir(self) -> Path:
        return self.rel_path / "logs"

    @property
    def data_dir(self) -> Path:
        return self.rel_path / "data"

    @property
    def metadata_dir(self) -> Path:
        return self.rel_path / "metadata"

    @property
    def cache_dir(self) -> Path:
        return self.rel_path / ".cache"

    @property
    def lora(self) -> Optional[LoRAConfig]:
        return self.loras[0] if self.loras else None

    @property
    def model(self) -> ModelConfig:
        return self.models[0]

    # ---- provenance capture (reference config.py:73-87) ----
    def _git(self, *args) -> str:
        """Provenance is captured from the repo CONTAINING THE CONFIG
        (rel_path), not the process CWD — a run launched from elsewhere
        (cron, notebook) must not record another checkout's state."""
        import subprocess
        try:
            return subprocess.check_output(
                ["git", *args], cwd=str(self.rel_path),
                stderr=subprocess.DEVNULL).decode().strip()
        except Exception:
            return ""

    @property
    def git_commit(self) -> str:
        return self._git("rev-parse", "HEAD")

    @property
    def git_status(self) -> str:
        return self._git("status")

    def dumps(self) -> str:
        """JSON dump of the full config + git provenance
        (reference config.py:88-99 dumps/dump)."""
        import json
        data = dataclasses.asdict(self)
        data["git_commit"] = self.git_commit
        data["git_status"] = self.git_status
        return json.dumps(data, indent=2, default=str)

    def dump(self, path: Optional[str | Path] = None):
        p = Path(path) if path else self.log_dir / "cfg.json"
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(self.dumps())
        return p

    # ---- wildcard dataset expansion (reference config.py:767-800) ----
    def _expand_path(self, path: str) -> Tuple[str, ...]:
        if "*" not in str(path):
            return (path,)
        rel = Path(path)
        name = rel.name
        # metadata dir first (HDF5-keyed paths), then the data dir
        for parent, keep_stem in ((self.metadata_dir / rel.parent, True),
                                  (self.data_dir / rel.parent, False)):
            if parent.exists():
                found = sorted(parent.glob(name))
                if found:
                    return tuple(str(rel.parent / (c.stem if keep_stem
                                                   else c.name))
                                 for c in found)
        if self.silent_errors:
            return ()
        raise ValueError(f"cannot expand dataset path: {path}")

    def _expand_datasets(self) -> "Config":
        ds = self.dataset
        if not any("*" in str(p) for group in (ds.training, ds.validation,
                                               ds.noise) for p in group):
            return self
        def exp(group):
            return tuple(q for p in group for q in self._expand_path(p))
        return dataclasses.replace(
            self, dataset=dataclasses.replace(
                ds, training=exp(ds.training),
                validation=exp(ds.validation), noise=exp(ds.noise)))

    # ---- loading ----
    @classmethod
    def from_cli(cls, args: Optional[List[str]] = None) -> "Config":
        """--yaml / --model / --lora with TORTOISE_YAML / TORTOISE_MODEL /
        TORTOISE_LORA env-var defaults (reference config.py:145-163 —
        env vars so a HuggingFace-Space-style host can configure it)."""
        import argparse
        import os
        import sys
        argv = list(sys.argv[1:] if args is None else args)
        for i, a in enumerate(argv):   # legacy `yaml=...` form
            if a.startswith("yaml="):
                argv[i] = f"--{a}"
        p = argparse.ArgumentParser(allow_abbrev=False, add_help=False)
        p.add_argument("--yaml", type=Path,
                       default=os.environ.get("TORTOISE_YAML"))
        p.add_argument("--model", type=Path,
                       default=os.environ.get("TORTOISE_MODEL"))
        p.add_argument("--lora", type=Path,
                       default=os.environ.get("TORTOISE_LORA"))
        ns, _ = p.parse_known_args(argv)
        overrides: Dict[str, Any] = {}
        if ns.lora:
            overrides["loras"] = (LoRAConfig(path=str(ns.lora),
                                             training=False),)
        if ns.model:
            return cls.load_model(ns.model, **overrides)
        if ns.yaml:
            return cls.load(ns.yaml, **overrides)
        return cls(**overrides)

    @staticmethod
    def load(path: Optional[str | Path] = None, **overrides) -> "Config":
        """Load from YAML, or from a weights file with embedded config
        (.sft — reference config.py:127-144 --model mode)."""
        if path is None:
            return Config(**overrides)
        path = Path(path)
        if path.suffix in (".sft", ".safetensors"):
            return Config.load_model(path, **overrides)
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
        return Config.from_dict(raw, yaml_path=str(path), **overrides)

    @staticmethod
    def load_model(path: str | Path, **overrides) -> "Config":
        """Reconstruct config from safetensors metadata
        (reference cfg.load_model, config.py:127-144)."""
        from .utils.io import load_metadata
        meta = load_metadata(path)
        raw = meta.get("config", {}) or {}
        if not isinstance(raw, dict):
            raw = {}
        return Config.from_dict(raw, yaml_path=str(Path(path).parent /
                                                   "config.yaml"),
                                **overrides)

    @staticmethod
    def from_dict(raw: dict, **overrides) -> "Config":
        kwargs: Dict[str, Any] = {}
        if "models" in raw:
            kwargs["models"] = tuple(
                _build(ModelConfig, m, "models.") for m in raw["models"])
        if "loras" in raw:
            kwargs["loras"] = tuple(
                _build(LoRAConfig, m, "loras.") for m in raw["loras"])
        for key, cls in [("hyperparameters", Hyperparameters),
                         ("evaluation", Evaluation), ("trainer", Trainer),
                         ("inference", Inference), ("dataset", DatasetConfig)]:
            if key in raw:
                kwargs[key] = _build(cls, raw[key], key + ".")
        for key in ["device", "mode", "audio_backend", "sample_rate",
                    "vocoder", "weights_format", "optimizations",
                    "silent_errors"]:
            if key in raw:
                kwargs[key] = raw[key]
        kwargs.update(overrides)
        return Config(**kwargs)._expand_datasets()
