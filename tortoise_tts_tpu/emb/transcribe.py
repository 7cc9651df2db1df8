"""Batch transcription to whisper.json (capability-parity with reference
emb/transcribe.py).

    python -m tortoise_tts_tpu.emb.transcribe --input-audio voices \
        --output-metadata training/metadata [--model-name openai/whisper-base]

Uses the HF transformers ASR pipeline with word timestamps when the
model weights are locally available (transcribe.py:140-336); in
zero-egress environments point --model-name at a local snapshot.
``--stride/--stride-offset`` shard speakers across processes
(transcribe.py:359-364).
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

_logger = logging.getLogger(__name__)


def transcribe_batch(input_audio: Path, output_metadata: Path,
                     model_name: str = "openai/whisper-base",
                     language: str = "en", stride: int = 0,
                     stride_offset: int = 0, batch_size: int = 4) -> int:
    from transformers import pipeline
    from ..utils.io import read_wav

    pipe = pipeline("automatic-speech-recognition", model=model_name,
                    chunk_length_s=30, return_timestamps=True)

    speakers = sorted(p for p in input_audio.rglob("*") if p.is_dir()) or \
        [input_audio]
    if stride:
        speakers = [s for i, s in enumerate(speakers)
                    if (i + stride_offset) % stride == 0]
    done = 0
    for spk in speakers:
        rel = spk.relative_to(input_audio) if spk != input_audio else Path(".")
        outdir = output_metadata / rel
        outpath = outdir / "whisper.json"
        meta = json.loads(outpath.read_text()) if outpath.exists() else {}
        for audio in sorted(spk.glob("*.wav")):
            if audio.name in meta:
                continue
            wav, sr = read_wav(audio)
            result = pipe({"array": wav, "sampling_rate": sr})
            segments = []
            for chunk in result.get("chunks", []):
                t0, t1 = chunk["timestamp"]
                segments.append({"start": t0 or 0.0,
                                 "end": t1 if t1 is not None else
                                 len(wav) / sr,
                                 "text": chunk["text"]})
            meta[audio.name] = {"text": result["text"],
                                "language": language,
                                "segments": segments}
            done += 1
            outdir.mkdir(parents=True, exist_ok=True)
            outpath.write_text(json.dumps(meta, indent=1))
    return done


def main(argv=None):
    parser = argparse.ArgumentParser("tortoise_tts_tpu.emb.transcribe")
    parser.add_argument("--input-audio", type=Path, required=True)
    parser.add_argument("--output-metadata", type=Path, required=True)
    parser.add_argument("--model-name", type=str,
                        default="openai/whisper-base")
    parser.add_argument("--language", type=str, default="en")
    parser.add_argument("--stride", type=int, default=0)
    parser.add_argument("--stride-offset", type=int, default=0)
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    n = transcribe_batch(args.input_audio, args.output_metadata,
                         args.model_name, args.language, args.stride,
                         args.stride_offset)
    print(f"transcribed {n} files")


if __name__ == "__main__":
    main()
