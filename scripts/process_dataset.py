#!/usr/bin/env python
"""Encode a voices/ tree + cleaned metadata into .mel artifacts
(capability-parity with reference scripts/process_dataset.py:1-169).

    python scripts/process_dataset.py --input-audio voices \
        --input-metadata training/metadata --output training/data

Differences from `python -m tortoise_tts_tpu.emb.process` (which slices
from sibling whisper.json/txt): this driver consumes a separate cleaned
metadata tree, handles the audio-only "Noise" speaker pathway, applies
the reference's auto-slice policy (slice when a speaker has a single
long file or belongs to LibriVox/Audiobooks groups), and writes
missing.json / dataset_list.json reports.
"""

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

ALWAYS_SLICE_GROUPS = ("LibriVox", "Audiobooks")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-audio", type=Path, required=True)
    ap.add_argument("--input-metadata", type=Path, required=True)
    ap.add_argument("--output", type=Path, required=True)
    ap.add_argument("--stride", type=int, default=0)
    ap.add_argument("--stride-offset", type=int, default=0)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--no-store-mels", dest="store_mels",
                    action="store_false", default=True)
    args = ap.parse_args(argv)

    from tortoise_tts_tpu.emb.process import process_job
    from tortoise_tts_tpu.utils.io import read_wav

    missing = {"transcription": [], "audio": []}
    dataset = []
    done = 0
    speakers = sorted(p for group in sorted(args.input_audio.iterdir())
                      if group.is_dir()
                      for p in sorted(group.iterdir()) if p.is_dir())
    if args.stride:
        speakers = [s for i, s in enumerate(speakers)
                    if (i + args.stride_offset) % args.stride == 0]

    for spk in speakers:
        group = spk.parent.name
        rel = Path(group) / spk.name
        out_dir = args.output / rel
        out_dir.mkdir(parents=True, exist_ok=True)

        if spk.name == "Noise":
            # audio-only pathway (process_dataset.py:52-63): encode raw
            # clips with no transcript
            for audio in sorted(spk.iterdir()):
                if audio.suffix.lower() not in (".wav", ".flac", ".mp3"):
                    continue
                out = out_dir / f"{audio.stem}.mel"
                if out.exists():
                    continue
                wav, sr = read_wav(audio)
                if process_job(out, wav, sr, text=None,
                               dtype=args.dtype,
                               store_mels=args.store_mels):
                    done += 1
            continue

        meta_path = args.input_metadata / rel / "whisper.json"
        if not meta_path.exists():
            missing["transcription"].append(str(meta_path))
            continue
        try:
            meta = json.loads(meta_path.read_text())
        except Exception:
            missing["transcription"].append(str(meta_path))
            continue
        dataset.append(str(rel))

        use_slices = len(meta) == 1 or group in ALWAYS_SLICE_GROUPS
        for filename in sorted(meta):
            inpath = spk / filename
            if not inpath.exists():
                missing["audio"].append(str(inpath))
                continue
            entry = meta[filename]
            language = entry.get("language", "en")
            wav, sr = read_wav(inpath)
            segments = entry.get("segments", [])
            if not segments or not use_slices:
                text = entry.get("text", "")
                if not text:
                    continue
                out = out_dir / f"{inpath.stem}.mel"
                if out.exists():
                    continue
                if process_job(out, wav, sr, text=text, language=language,
                               dtype=args.dtype,
                               store_mels=args.store_mels):
                    done += 1
            else:
                for i, seg in enumerate(segments):
                    text = seg.get("text", "")
                    if not text:
                        continue
                    out = out_dir / f"{inpath.stem}_{i:05d}.mel"
                    if out.exists():
                        continue
                    s = max(0, int(seg["start"] * sr))
                    e = min(len(wav), int(seg["end"] * sr))
                    if e - s < sr // 4:
                        continue
                    if process_job(out, wav[s:e], sr, text=text,
                                   language=language, dtype=args.dtype,
                                   store_mels=args.store_mels):
                        done += 1

    (args.output / "missing.json").write_text(json.dumps(missing))
    (args.output / "dataset_list.json").write_text(json.dumps(dataset))
    print(f"encoded {done} artifacts "
          f"({len(missing['audio'])} missing audio, "
          f"{len(missing['transcription'])} missing transcripts)")


if __name__ == "__main__":
    main()
