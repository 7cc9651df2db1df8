"""Dataset over .mel artifacts (capability-parity with reference data.py).

Reads the reference's artifact format (emb/process.py:43-74: np.save'd
dict with uint16 codes, float32 cond/latent tuples, uint8 text tokens,
metadata) from ``<data_dir>/<group>/<speaker>/<utt>.mel`` trees, with:

- per-speaker metadata JSONs + disk cache (data.py:347-412),
- speaker pruning by minimum utterances (data.py:487-489),
- host-sharded paths ``i % process_count`` (data.py:496-497 rank shard),
- duration-bucketed / random / ordered sampling with resumable state
  (data.py:499-661),
- **fixed-shape batches** for jit: text padded to ``text_bucket`` with
  stop(0), codes to ``mel_bucket`` (TPU design delta — the reference
  pads dynamically per batch, SURVEY §7 'fixed shapes under jit').
"""

from __future__ import annotations

import json
import logging
import pickle
from pathlib import Path
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from ..config import Config, DatasetConfig
from .sampler import BatchedOrderedSampler, OrderedSampler, RandomSampler

_logger = logging.getLogger(__name__)


def load_artifact(path: str | Path) -> Dict[str, Any]:
    return np.load(path, allow_pickle=True)[()]


class Dataset:
    def __init__(self, cfg: Config, paths: Sequence[str | Path],
                 training: bool = True,
                 process_index: int = 0, process_count: int = 1):
        self.cfg = cfg
        self.dcfg = cfg.dataset
        self.training = training
        self.paths: List[Path] = []
        self.durations: List[float] = []
        self._h5 = None
        self._melbin = None
        melbin = cfg.rel_path / "data.melbin"
        if getattr(self.dcfg, "use_melbin", False) and melbin.exists():
            try:
                from .native_loader import MelBinDataset
                self._melbin = MelBinDataset(melbin)
                _logger.info("using native melbin loader: %s", melbin)
            except Exception as e:
                _logger.warning("native melbin unavailable: %s", e)
        if self.dcfg.use_hdf5:
            import h5py
            h5_path = cfg.rel_path / self.dcfg.hdf5_name
            self._h5 = h5py.File(h5_path, "r")

        all_paths = (self._gather_h5() if self._h5 is not None
                     else self._gather(paths))
        # host shard (data.py:496-497)
        if training and process_count > 1:
            all_paths = [p for i, p in enumerate(all_paths)
                         if i % process_count == process_index]
        metadata = self._load_metadata(all_paths)
        # duration validation (data.py:487-489 / duration_range)
        lo, hi = self.dcfg.duration_range
        for p in all_paths:
            dur = metadata.get(str(p), {}).get("duration", 0.0)
            if self.dcfg.validate and training and not (lo <= dur <= hi):
                continue
            self.paths.append(p)
            self.durations.append(dur)

        order = self.dcfg.sample_order
        if training and order == "duration":
            idx = np.argsort(self.durations)
            self.paths = [self.paths[i] for i in idx]
            self.durations = [self.durations[i] for i in idx]

        self.sampler = self._make_sampler()

    def _gather(self, roots) -> List[Path]:
        out = []
        for root in roots:
            root = Path(root)
            if root.is_dir():
                out.extend(sorted(root.rglob("*.mel")))
            elif root.exists():
                out.append(root)
        return out

    def _gather_h5(self) -> List[str]:
        keys: List[str] = []

        def visit(name, obj):
            if hasattr(obj, "keys") and "codes" in obj:
                keys.append(name)
        self._h5.visititems(visit)
        return sorted(keys)

    def _load(self, path) -> Dict[str, Any]:
        if self._h5 is not None:
            g = self._h5[str(path)]
            meta = json.loads(g.attrs.get("metadata", "{}"))
            return {
                "codes": np.asarray(g["codes"]),
                "text": np.asarray(g["text"]) if "text" in g else
                np.zeros((0,), np.int32),
                "latent": (np.asarray(g["latent_ar"]),
                           np.asarray(g["latent_diff"])),
                "metadata": meta,
            }
        return load_artifact(path)

    def _load_metadata(self, paths) -> Dict[str, dict]:
        """Durations per path, with a pickle disk cache
        (data.py:347-412)."""
        cache = self.cfg.cache_dir / ("metadata.train.pkl" if self.training
                                      else "metadata.val.pkl")
        if self.dcfg.cache and cache.exists():
            try:
                meta = pickle.loads(cache.read_bytes())
                if set(meta) >= {str(p) for p in paths}:
                    return meta
            except Exception:
                pass
        meta = {}
        for p in paths:
            try:
                art = self._load(p)
                md = art.get("metadata", {})
                dur = md.get("duration")
                if dur is None and "original_length" in md:
                    dur = md["original_length"] / md.get("sample_rate", 1)
                meta[str(p)] = {"duration": float(dur or 0.0)}
            except Exception as e:
                _logger.warning("bad artifact %s: %s", p, e)
                meta[str(p)] = {"duration": 0.0}
        if self.dcfg.cache:
            cache.parent.mkdir(parents=True, exist_ok=True)
            cache.write_bytes(pickle.dumps(meta))
        return meta

    def _make_sampler(self):
        if self.training and self.dcfg.sample_max_duration_batch > 0:
            return BatchedOrderedSampler(
                self.durations,
                max_duration=self.dcfg.sample_max_duration_batch,
                max_batch_size=self.cfg.hyperparameters.batch_size,
                shuffle=self.dcfg.sample_shuffle)
        if self.training and self.dcfg.sample_shuffle:
            return RandomSampler(len(self.paths))
        return OrderedSampler(len(self.paths))

    # ------------------------------------------------------------------
    def __len__(self):
        return len(self.paths)

    def __getitem__(self, i: int) -> Dict[str, Any]:
        """One sample -> fixed-shape arrays (data.py:766-853)."""
        art = self._load(self.paths[i])
        codes = np.asarray(art["codes"]).reshape(-1).astype(np.int32)
        text = np.asarray(art["text"]).reshape(-1).astype(np.int32)
        lat_ar = np.asarray(art["latent"][0]).reshape(-1).astype(np.float32)
        lat_diff = np.asarray(art["latent"][1]).reshape(-1).astype(np.float32)
        wav_length = int(art["metadata"]["original_length"])

        tb, mb = self.dcfg.text_bucket, self.dcfg.mel_bucket
        text_len = min(len(text), tb)
        ncodes = min(len(codes), mb)
        out_text = np.zeros((tb,), np.int32)         # stop(0) padding
        out_text[:text_len] = text[:text_len]
        out_codes = np.zeros((mb,), np.int32)
        out_codes[:ncodes] = codes[:ncodes]
        wav_length = min(wav_length, ncodes * 1024)
        return {
            "text": out_text,
            "text_lengths": np.int32(text_len),
            "codes": out_codes,
            "wav_lengths": np.int32(wav_length),
            "latents": lat_ar,
            "diffusion_latents": lat_diff,
        }

    def collate(self, items: List[Dict[str, Any]]) -> Dict[str, np.ndarray]:
        return {k: np.stack([it[k] for it in items]) for k in items[0]}

    def _native_batch(self, indices) -> Dict[str, np.ndarray]:
        return self._melbin.batch(indices, self.dcfg.text_bucket,
                                  self.dcfg.mel_bucket)

    # ------------------------------------------------------------------
    def batches(self, batch_size: Optional[int] = None
                ) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite epoch iterator (trainer.py:104-120)."""
        bs = batch_size or self.cfg.hyperparameters.batch_size
        while True:
            if isinstance(self.sampler, BatchedOrderedSampler):
                for batch_idx in self.sampler:
                    if self._melbin is not None:
                        yield self._native_batch(batch_idx)
                    else:
                        yield self.collate([self[i] for i in batch_idx])
            else:
                buf = []
                for i in self.sampler:
                    buf.append(i)
                    if len(buf) == bs:
                        if self._melbin is not None:
                            yield self._native_batch(buf)
                        else:
                            yield self.collate([self[j] for j in buf])
                        buf = []

    # ------------------------------------------------------------------
    def get_state(self) -> Dict[str, Any]:
        return {"sampler": self.sampler.get_state(),
                "n_paths": len(self.paths)}

    def set_state(self, state: Dict[str, Any]):
        if state.get("n_paths") != len(self.paths):
            _logger.warning("dataset changed since checkpoint; "
                            "sampler state not restored")
            return
        self.sampler.set_state(state["sampler"])

    def save_state(self, path: Path):
        path.parent.mkdir(parents=True, exist_ok=True)
        path.write_bytes(pickle.dumps(self.get_state()))

    def load_state(self, path: Path):
        if path.exists():
            self.set_state(pickle.loads(path.read_bytes()))


def create_train_val_dataloader(cfg: Config, process_index: int = 0,
                                process_count: int = 1):
    """data.py:944 equivalent -> (train Dataset, val Dataset)."""
    train = Dataset(cfg, cfg.dataset.training, training=True,
                    process_index=process_index, process_count=process_count)
    val = Dataset(cfg, cfg.dataset.validation or cfg.dataset.training,
                  training=False)
    _logger.info("dataset: %d train, %d val samples", len(train), len(val))
    return train, val
