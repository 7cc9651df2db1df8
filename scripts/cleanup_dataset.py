#!/usr/bin/env python
"""Normalize/clean whisper.json transcript metadata (capability-parity
with reference scripts/cleanup_dataset.py:1-98).

    python scripts/cleanup_dataset.py --input training/metadata \
        --output training/metadata-cleaned

Per <group>/<speaker>/whisper.json: merges segment texts, recomputes
start/end bounds, drops entries with no usable segments, and splits
diarized segments (segments tagged with a "speaker" key) into their own
per-speaker whisper.json files.
"""

import argparse
import json
from pathlib import Path


def clean_speaker(in_meta: dict):
    """-> (cleaned metadata, {diarized_speaker: metadata})."""
    out, diarized = {}, {}
    for filename, result in in_meta.items():
        language = result.get("language", "en")
        entry = {"segments": [], "language": language, "text": "",
                 "start": 0.0, "end": 0.0}
        texts = []
        start, end = 0.0, 0.0
        for seg in result.get("segments", []):
            if "speaker" in seg:
                spk = seg["speaker"]
                d = diarized.setdefault(spk, {}).setdefault(
                    filename, {"segments": [], "language": language,
                               "text": "", "start": 0.0, "end": 0.0})
                d["segments"].append(seg)
            else:
                entry["segments"].append(seg)
            texts.append(seg.get("text", ""))
            start = min(start, seg.get("start", 0.0))
            end = max(end, seg.get("end", 0.0))
        entry["text"] = " ".join(texts).strip()
        entry["start"], entry["end"] = start, end
        if entry["segments"]:
            out[filename] = entry
    for spk_meta in diarized.values():
        for filename, d in spk_meta.items():
            d["text"] = " ".join(s.get("text", "")
                                 for s in d["segments"]).strip()
            d["start"] = min((s.get("start", 0.0)
                              for s in d["segments"]), default=0.0)
            d["end"] = max((s.get("end", 0.0)
                            for s in d["segments"]), default=0.0)
    return out, diarized


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", type=Path, default=Path("training/metadata"))
    ap.add_argument("--output", type=Path,
                    default=Path("training/metadata-cleaned"))
    args = ap.parse_args(argv)

    n = 0
    for inpath in sorted(args.input.rglob("whisper.json")):
        rel = inpath.parent.relative_to(args.input)
        outpath = args.output / rel / "whisper.json"
        if outpath.exists():
            continue
        try:
            meta = json.loads(inpath.read_text())
        except Exception as e:
            print(f"failed to read {inpath}: {e}")
            continue
        cleaned, diarized = clean_speaker(meta)
        outpath.parent.mkdir(parents=True, exist_ok=True)
        outpath.write_text(json.dumps(cleaned))
        for spk, m in diarized.items():
            p = args.output / rel.parent / spk / "whisper.json"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text(json.dumps(m))
        n += 1
    print(f"cleaned {n} speaker metadata files")


if __name__ == "__main__":
    main()
