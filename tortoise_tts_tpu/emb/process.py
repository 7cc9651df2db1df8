"""Dataset preparation: slice + quantize audio into .mel artifacts
(capability-parity with reference emb/process.py).

    python -m tortoise_tts_tpu.emb.process --input-audio voices \
        --output-dataset training/data [--stride N --stride-offset K]

Walks ``<input>/<group>/<speaker>/*.wav`` with sibling ``whisper.json``
transcripts (or ``.txt`` files), slices by segment timestamps, encodes
via emb.mel.encode, and writes the reference-compatible artifact
(uint16 codes, float32 conds/latents, uint8 text tokens, metadata) —
emb/process.py:43-74.  ``--stride/--stride-offset`` shard speakers
across processes (process.py:412-415).
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path
from typing import Optional

import numpy as np

from ..tokenizer import default_tokenizer
from ..utils.io import read_wav
from . import mel as emb_mel

_logger = logging.getLogger(__name__)


def process_job(outpath: Path, wav: np.ndarray, sample_rate: int,
                text: Optional[str] = None, language: str = "en",
                dtype: str = "float32", store_mels: bool = True) -> bool:
    state = emb_mel.encode(wav, sample_rate, dtype=dtype,
                           return_mels=store_mels)
    codes = np.asarray(state["codes"])
    if np.count_nonzero(codes) == 0:
        _logger.warning("quantization returned zero'd tensor: %s", outpath)
        return False
    artifact = {
        "codes": codes.astype(np.uint16),
        "conds": (np.asarray(state["conds"][0], dtype=np.float32),
                  np.asarray(state["conds"][1], dtype=np.float32)),
        "latent": (np.asarray(state["latent"][0], dtype=np.float32),
                   np.asarray(state["latent"][1], dtype=np.float32)),
        "metadata": dict(state["metadata"]),
    }
    if store_mels:
        # training-mel targets for the diffusion/DVAE/vocoder engines
        artifact["mel"] = np.asarray(state["mel"], dtype=np.float16)
        artifact["mel_diff"] = np.asarray(state["mel_diff"],
                                          dtype=np.float16)
    if text:
        text = text.strip()
        artifact["text"] = np.array(default_tokenizer().encode(text),
                                    dtype=np.uint8)
        artifact["metadata"].update({"text": text, "language": language})
    outpath.parent.mkdir(parents=True, exist_ok=True)
    with open(outpath, "wb") as f:
        np.save(f, artifact)
    return True


def _segments_for(audio_path: Path):
    """Yield (name, start, end, text) from whisper.json or a .txt sibling."""
    wj = audio_path.parent / "whisper.json"
    if wj.exists():
        meta = json.loads(wj.read_text())
        entry = meta.get(audio_path.name)
        if entry:
            for i, seg in enumerate(entry.get("segments", [])):
                # pad segments (process.py:349-350)
                yield (f"{audio_path.stem}_{i:05d}",
                       max(0.0, seg["start"] - 0.05), seg["end"] + 0.5,
                       seg["text"])
            return
    txt = audio_path.with_suffix(".txt")
    if txt.exists():
        yield audio_path.stem, 0.0, -1.0, txt.read_text()
    else:
        yield audio_path.stem, 0.0, -1.0, None


def process(input_audio: Path, output_dataset: Path, stride: int = 0,
            stride_offset: int = 0, dtype: str = "float32",
            audio_exts=(".wav",)) -> int:
    speakers = sorted(p for p in input_audio.rglob("*") if p.is_dir()) or \
        [input_audio]
    if stride:
        speakers = [s for i, s in enumerate(speakers)
                    if (i + stride_offset) % stride == 0]
    done = 0
    for spk in speakers:
        rel = spk.relative_to(input_audio)
        for audio in sorted(spk.iterdir()):
            if audio.suffix.lower() not in audio_exts:
                continue
            wav, sr = read_wav(audio)
            for name, start, end, text in _segments_for(audio):
                out = output_dataset / rel / f"{name}.mel"
                if out.exists():
                    continue
                s = int(start * sr)
                e = len(wav) if end < 0 else int(end * sr)
                seg = wav[s:e]
                if len(seg) < sr // 4:
                    continue
                if process_job(out, seg, sr, text=text, dtype=dtype):
                    done += 1
    return done


def main(argv=None):
    parser = argparse.ArgumentParser("tortoise_tts_tpu.emb.process")
    parser.add_argument("--input-audio", type=Path, required=True)
    parser.add_argument("--output-dataset", type=Path, required=True)
    parser.add_argument("--stride", type=int, default=0)
    parser.add_argument("--stride-offset", type=int, default=0)
    parser.add_argument("--dtype", type=str, default="float32")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    n = process(args.input_audio, args.output_dataset, args.stride,
                args.stride_offset, args.dtype)
    print(f"processed {n} segments")


if __name__ == "__main__":
    main()
