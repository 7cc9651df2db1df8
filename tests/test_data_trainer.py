"""Data pipeline + trainer loop tests (reference-format artifacts)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tortoise_tts_tpu.config import (Config, DatasetConfig, Hyperparameters,
                                     Trainer)
from tortoise_tts_tpu.data import Dataset
from tortoise_tts_tpu.data.sampler import (BatchedOrderedSampler,
                                           OrderedSampler, RandomSampler)
from tortoise_tts_tpu.engine import state as st, train_step as ts
from tortoise_tts_tpu.models import unified_voice as uv_m
from tortoise_tts_tpu.utils.trainer import train

AR_CFG = uv_m.UnifiedVoiceConfig(layers=2, model_dim=64, heads=4,
                                 max_text_tokens=40, max_mel_tokens=48)


def _write_artifact(path: Path, n_codes=30, n_text=12, seed=0, dim=64):
    """Fabricate a reference-format .mel artifact (emb/process.py:43-74)."""
    rng = np.random.RandomState(seed)
    artifact = {
        "codes": rng.randint(0, 8192, (n_codes,)).astype(np.uint16),
        "conds": (rng.randn(1, 1, 80, 100).astype(np.float32),
                  rng.randn(1, 1, 100, 100).astype(np.float32)),
        "latent": (rng.randn(1, dim).astype(np.float32),
                   rng.randn(1, 2 * dim).astype(np.float32)),
        "text": rng.randint(3, 255, (n_text,)).astype(np.uint8),
        "metadata": {"original_length": n_codes * 1024,
                     "sample_rate": 22050,
                     "duration": n_codes * 1024 / 22050,
                     "text": "hello"},
    }
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "wb") as f:
        np.save(f, artifact)


@pytest.fixture()
def dataset_dir(tmp_path):
    d = tmp_path / "data" / "group" / "speaker"
    for i in range(10):
        _write_artifact(d / f"utt{i:03d}.mel", n_codes=20 + i, seed=i)
    return tmp_path


def _cfg(tmp_path, **ds_kwargs):
    return Config(
        yaml_path=str(tmp_path / "cfg.yaml"),
        hyperparameters=Hyperparameters(batch_size=4,
                                        gradient_accumulation_steps=1),
        # log_frequency=1: per-step metric lines (the default 10 defers
        # device->host metric fetches to the log cadence on real TPUs)
        trainer=Trainer(save_frequency=0, iterations=5, log_frequency=1),
        dataset=DatasetConfig(training=(str(tmp_path / "data"),),
                              validate=False, text_bucket=40, mel_bucket=48,
                              **ds_kwargs))


def test_dataset_fixed_shapes(dataset_dir):
    cfg = _cfg(dataset_dir)
    ds = Dataset(cfg, cfg.dataset.training, training=True)
    assert len(ds) == 10
    batch = next(ds.batches())
    assert batch["text"].shape == (4, 40)
    assert batch["codes"].shape == (4, 48)
    assert batch["latents"].shape == (4, 64)
    assert batch["wav_lengths"].max() <= 48 * 1024


def test_dataset_duration_sorted(dataset_dir):
    cfg = _cfg(dataset_dir, sample_order="duration")
    ds = Dataset(cfg, cfg.dataset.training, training=True)
    assert ds.durations == sorted(ds.durations)


def test_sampler_state_roundtrip():
    s = RandomSampler(10, seed=3)
    it = iter(s)
    first = [next(it) for _ in range(4)]
    state = s.get_state()
    rest = list(it)
    s2 = RandomSampler(10, seed=99)
    s2.set_state(state)
    assert list(iter(s2)) == rest

    b = BatchedOrderedSampler([1.0] * 10, max_batch_size=3)
    itb = iter(b)
    next(itb)
    state = b.get_state()
    rest = [x for x in itb]
    b2 = BatchedOrderedSampler([1.0] * 4, max_batch_size=2)
    b2.set_state(state)
    assert [x for x in iter(b2)] == rest


def test_dataset_host_sharding(dataset_dir):
    cfg = _cfg(dataset_dir)
    d0 = Dataset(cfg, cfg.dataset.training, training=True,
                 process_index=0, process_count=2)
    d1 = Dataset(cfg, cfg.dataset.training, training=True,
                 process_index=1, process_count=2)
    assert len(d0) + len(d1) == 10
    assert set(map(str, d0.paths)).isdisjoint(set(map(str, d1.paths)))


def test_trainer_loop_end_to_end(dataset_dir, tmp_path):
    cfg = _cfg(dataset_dir)
    ds = Dataset(cfg, cfg.dataset.training, training=True)
    params = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    tx = optax.adamw(1e-4)
    step_fn_raw = ts.make_ar_train_step(AR_CFG, tx, donate=False)
    state = st.init_state(params, tx)

    saved = []

    def step_fn(s, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k in ("latents", "text", "text_lengths", "codes",
                          "wav_lengths")}
        return step_fn_raw(s, batch)

    def save_fn(s, step):
        saved.append(step)
        st.save_checkpoint(tmp_path / "ckpt", "ar", s, step)

    log = tmp_path / "log.txt"
    final = train(cfg, ds, step_fn, state, save_fn=save_fn, log_path=log,
                  max_iterations=5)
    assert int(final.step) == 5
    assert saved and saved[-1] == 5
    lines = [json.loads(line) for line in log.read_text().splitlines()]
    assert len(lines) == 5
    assert "loss" in lines[0] and "elapsed_time" in lines[0]
    # resume from checkpoint
    restored = st.load_checkpoint(tmp_path / "ckpt", "ar",
                                  st.init_state(params, tx))
    assert int(restored.step) == 5


def test_trainer_log_frequency_cadence(dataset_dir, tmp_path):
    """log_frequency=2: metrics are fetched + logged every 2nd step only
    (per-step device_get is a ~50-100 ms relay round trip on real TPU)."""
    import dataclasses
    cfg = _cfg(dataset_dir)
    cfg = dataclasses.replace(cfg, trainer=dataclasses.replace(
        cfg.trainer, log_frequency=2, iterations=4))
    ds = Dataset(cfg, cfg.dataset.training, training=True)
    params = uv_m.init(jax.random.PRNGKey(0), AR_CFG)
    tx = optax.adamw(1e-4)
    step_fn_raw = ts.make_ar_train_step(AR_CFG, tx, donate=False)

    def step_fn(s, batch):
        batch = {k: jnp.asarray(v) for k, v in batch.items()
                 if k in ("latents", "text", "text_lengths", "codes",
                          "wav_lengths")}
        return step_fn_raw(s, batch)

    log = tmp_path / "log2.txt"
    final = train(cfg, ds, step_fn, st.init_state(params, tx),
                  log_path=log, max_iterations=4)
    assert int(final.step) == 4
    lines = [json.loads(l) for l in log.read_text().splitlines()]
    assert [l["it"] for l in lines] == [2, 4]
    assert all("loss" in l for l in lines)


def test_hdf5_pack_and_read(dataset_dir, tmp_path):
    from tortoise_tts_tpu.data.__main__ import create_hdf5
    import dataclasses
    cfg = _cfg(dataset_dir)
    n = create_hdf5(cfg)
    assert n == 10
    cfg_h5 = dataclasses.replace(
        cfg, dataset=dataclasses.replace(cfg.dataset, use_hdf5=True))
    ds = Dataset(cfg_h5, cfg_h5.dataset.training, training=True)
    assert len(ds) == 10
    batch = next(ds.batches())
    assert batch["text"].shape == (4, 40)
    assert batch["codes"].shape == (4, 48)


def test_config_embedded_in_weights_roundtrip(tmp_path):
    from tortoise_tts_tpu.engine.state import export_weights
    cfg_dict = {"vocoder": "bigvgan",
                "hyperparameters": {"batch_size": 7}}
    export_weights({"w": np.ones((2, 2), np.float32)},
                   tmp_path / "model.sft", config=cfg_dict)
    loaded = Config.load(tmp_path / "model.sft")
    assert loaded.hyperparameters.batch_size == 7
    assert loaded.vocoder == "bigvgan"


def test_batches_span_epochs_when_batch_exceeds_dataset(dataset_dir):
    """batch_size > len(dataset): the fill buffer must carry across
    epochs — a per-epoch reset yielded NOTHING forever (found as an
    infinite spin in the mesh train.py integration test; the reference
    torch DataLoader drops the partial batch but never starves)."""
    import dataclasses
    cfg = _cfg(dataset_dir)
    cfg = dataclasses.replace(
        cfg, hyperparameters=dataclasses.replace(
            cfg.hyperparameters, batch_size=16))   # dataset has 10
    ds = Dataset(cfg, cfg.dataset.training, training=True)
    it = ds.batches()
    b1 = next(it)
    b2 = next(it)
    assert b1["codes"].shape[0] == 16
    assert b2["codes"].shape[0] == 16
