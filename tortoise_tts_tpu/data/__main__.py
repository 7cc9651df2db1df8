"""Dataset maintenance CLI (capability-parity with reference
data.py:1215-1350 __main__ actions).

    python -m tortoise_tts_tpu.data --yaml cfg.yaml --action=metadata
    python -m tortoise_tts_tpu.data --yaml cfg.yaml --action=hdf5
    python -m tortoise_tts_tpu.data --yaml cfg.yaml --action=validate
    python -m tortoise_tts_tpu.data --yaml cfg.yaml --action=sample
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np

from ..config import Config
from .dataset import Dataset, load_artifact

_logger = logging.getLogger(__name__)


def create_dataset_metadata(cfg: Config) -> int:
    """Per-speaker metadata JSONs with durations + similar lists
    (data.py:1014-1086; 'similar' copied from artifact metadata,
    data.py:976-978)."""
    n = 0
    for root in cfg.dataset.training + cfg.dataset.validation:
        root = Path(root)
        if not root.is_dir():
            continue
        speakers = {}
        for mel in sorted(root.rglob("*.mel")):
            spk = mel.parent
            speakers.setdefault(spk, {})
            art = load_artifact(mel)
            md = art.get("metadata", {})
            dur = md.get("duration") or (
                md.get("original_length", 0) / md.get("sample_rate", 1))
            entry = {
                "duration": float(dur or 0.0),
                "text": md.get("text", ""),
            }
            if "similar" in md:
                entry["similar"] = md["similar"]
            speakers[spk][mel.stem] = entry
        for spk, entries in speakers.items():
            rel = spk.relative_to(root)
            out = cfg.metadata_dir / rel
            out.mkdir(parents=True, exist_ok=True)
            (out / "metadata.json").write_text(json.dumps(entries, indent=1))
            n += len(entries)
    _logger.info("wrote metadata for %d utterances", n)
    return n


def compute_similar_utterances(cfg: Config, top_k: int = 8) -> int:
    """Top-k similar utterances per speaker by AR conditioning-latent
    cosine similarity, written into the per-speaker metadata JSONs
    (capability of reference 'similar' metadata, data.py:738-763 —
    the reference relies on an external similarity pass; here the
    artifact's own 1024-d speaker latent is the embedding)."""
    n = 0
    for root in cfg.dataset.training + cfg.dataset.validation:
        root = Path(root)
        if not root.is_dir():
            continue
        speakers = {}
        for mel in sorted(root.rglob("*.mel")):
            speakers.setdefault(mel.parent, []).append(mel)
        for spk, mels in speakers.items():
            if len(mels) < 2:
                continue
            lats = []
            for m in mels:
                art = load_artifact(m)
                lats.append(np.asarray(art["latent"][0],
                                       np.float32).reshape(-1))
            L = np.stack(lats)
            L = L / (np.linalg.norm(L, axis=1, keepdims=True) + 1e-8)
            sim = L @ L.T
            np.fill_diagonal(sim, -np.inf)
            order = np.argsort(-sim, axis=1)[:, :top_k]

            rel = spk.relative_to(root)
            meta_path = cfg.metadata_dir / rel / "metadata.json"
            entries = (json.loads(meta_path.read_text())
                       if meta_path.exists() else {})
            for i, m in enumerate(mels):
                entry = entries.setdefault(m.stem, {})
                entry["similar"] = [mels[j].stem for j in order[i]
                                    if np.isfinite(sim[i, j])]
                n += 1
            meta_path.parent.mkdir(parents=True, exist_ok=True)
            meta_path.write_text(json.dumps(entries, indent=1))
    _logger.info("computed similar lists for %d utterances", n)
    return n


def create_hdf5(cfg: Config) -> int:
    """Pack artifacts into one HDF5 file (data.py:1088-1213)."""
    import h5py
    out = cfg.rel_path / cfg.dataset.hdf5_name
    n = 0
    with h5py.File(out, "a") as f:
        for root in cfg.dataset.training + cfg.dataset.validation:
            root = Path(root)
            if not root.is_dir():
                continue
            for mel in sorted(root.rglob("*.mel")):
                key = str(mel.relative_to(root).with_suffix(""))
                if key in f:
                    continue
                art = load_artifact(mel)
                g = f.create_group(key)
                g.create_dataset("codes", data=np.asarray(art["codes"]))
                if "text" in art:
                    g.create_dataset("text", data=np.asarray(art["text"]))
                g.create_dataset("latent_ar",
                                 data=np.asarray(art["latent"][0]))
                g.create_dataset("latent_diff",
                                 data=np.asarray(art["latent"][1]))
                for mk in ("mel", "mel_diff"):   # training-mel targets
                    if mk in art:
                        g.create_dataset(mk, data=np.asarray(art[mk]))
                g.attrs["metadata"] = json.dumps(
                    art.get("metadata", {}), default=str)
                n += 1
    _logger.info("packed %d artifacts into %s", n, out)
    return n


def validate_dataset(cfg: Config) -> int:
    """Check every token is inside the tokenizer vocab (data.py:1270-1326)."""
    from ..tokenizer import default_tokenizer
    vocab_size = default_tokenizer().vocab_size
    bad = 0
    for root in cfg.dataset.training + cfg.dataset.validation:
        root = Path(root)
        if not root.is_dir():
            continue
        for mel in sorted(root.rglob("*.mel")):
            art = load_artifact(mel)
            text = np.asarray(art.get("text", []))
            if text.size and int(text.max()) >= vocab_size:
                _logger.warning("%s has out-of-vocab tokens (max %d)",
                                mel, int(text.max()))
                bad += 1
            codes = np.asarray(art["codes"])
            if np.count_nonzero(codes) == 0:
                _logger.warning("%s has zero'd codes", mel)
                bad += 1
    _logger.info("validation done, %d bad artifacts", bad)
    return bad


def sample_dataset(cfg: Config, out_dir: Path) -> None:
    """Decode two samples to wav for manual listening (data.py:1241-1269).

    DVAE codes -> 80-bin 22.05 kHz mel -> Griffin-Lim approximation
    (the mel domain here has no direct neural vocoder; GL is the
    listening aid)."""
    import jax.numpy as jnp
    from ..models import load_model, load_mel_norms
    from ..ops.stft import griffin_lim_from_mel
    from ..utils.io import write_wav
    ds = Dataset(cfg, cfg.dataset.training, training=False)
    dvae = load_model("dvae")
    it = ds.batches(batch_size=1)
    out_dir.mkdir(parents=True, exist_ok=True)
    norms = load_mel_norms()
    for i in range(2):
        batch = next(it)
        codes = jnp.asarray(batch["codes"][:, : max(4,
                            int(batch["wav_lengths"][0]) // 1024)])
        mel = dvae.module.decode(dvae.params, codes, dvae.config)
        if norms is not None:   # undo the mel_norms division
            mel = mel * jnp.asarray(norms)[None, :, None]
        wav = griffin_lim_from_mel(mel.astype(jnp.float32))
        write_wav(out_dir / f"sample{i}.wav", np.asarray(wav[0]), 22050)
    _logger.info("wrote samples to %s", out_dir)


def main(argv=None):
    parser = argparse.ArgumentParser("tortoise_tts_tpu.data")
    parser.add_argument("--yaml", type=Path, required=True)
    parser.add_argument("--action", type=str, default="metadata",
                        choices=["metadata", "similar", "hdf5", "validate",
                                 "sample", "melbin"])
    parser.add_argument("--out", type=Path, default=Path("data/samples"))
    parser.add_argument("--top-k", type=int, default=8)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    cfg = Config.load(args.yaml)
    if args.action == "metadata":
        create_dataset_metadata(cfg)
    elif args.action == "similar":
        compute_similar_utterances(cfg, top_k=args.top_k)
    elif args.action == "hdf5":
        create_hdf5(cfg)
    elif args.action == "validate":
        validate_dataset(cfg)
    elif args.action == "sample":
        sample_dataset(cfg, args.out)
    elif args.action == "melbin":
        from .native_loader import pack_melbin
        paths = []
        for root in cfg.dataset.training + cfg.dataset.validation:
            root = Path(root)
            if root.is_dir():
                paths.extend(sorted(root.rglob("*.mel")))
        n = pack_melbin(paths, cfg.rel_path / "data.melbin")
        _logger.info("packed %d artifacts into data.melbin", n)


if __name__ == "__main__":
    main()
