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
    """Per-speaker metadata JSONs with durations (data.py:1014-1086)."""
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
            speakers[spk][mel.stem] = {
                "duration": float(dur or 0.0),
                "text": md.get("text", ""),
            }
        for spk, entries in speakers.items():
            rel = spk.relative_to(root)
            out = cfg.metadata_dir / rel
            out.mkdir(parents=True, exist_ok=True)
            (out / "metadata.json").write_text(json.dumps(entries, indent=1))
            n += len(entries)
    _logger.info("wrote metadata for %d utterances", n)
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
                        choices=["metadata", "hdf5", "validate", "sample",
                                 "melbin"])
    parser.add_argument("--out", type=Path, default=Path("data/samples"))
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    cfg = Config.load(args.yaml)
    if args.action == "metadata":
        create_dataset_metadata(cfg)
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
