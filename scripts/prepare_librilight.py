#!/usr/bin/env python
"""Flatten a LibriLight-style download (speaker/book/*.flac+json) into
the voices layout speaker/<speaker>_<bookid>_<n>.<ext> (capability-
parity with reference scripts/prepare_librilight.py:1-32).

    python scripts/prepare_librilight.py --input duplicate \
        --output LibriLight-4K
"""

import argparse
import json
import shutil
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", type=Path, required=True)
    ap.add_argument("--output", type=Path, required=True)
    ap.add_argument("--move", action="store_true",
                    help="rename instead of copy")
    args = ap.parse_args(argv)

    n = 0
    for spk_dir in sorted(p for p in args.input.iterdir() if p.is_dir()):
        speaker = spk_dir.name
        subid = 0
        for book_dir in sorted(p for p in spk_dir.iterdir() if p.is_dir()):
            for jpath in sorted(book_dir.glob("*.json")):
                base = jpath.with_suffix("")
                audio = next((base.with_suffix(ext)
                              for ext in (".flac", ".wav", ".mp3")
                              if base.with_suffix(ext).exists()), None)
                if audio is None:
                    continue
                meta = json.loads(jpath.read_text())
                book_id = meta.get("book_meta", {}).get("id",
                                                        book_dir.name)
                out_dir = args.output / speaker
                out_dir.mkdir(parents=True, exist_ok=True)
                stem = f"{speaker}_{book_id}_{subid}"
                op = shutil.move if args.move else shutil.copy2
                op(str(jpath), str(out_dir / f"{stem}.json"))
                op(str(audio), str(out_dir / f"{stem}{audio.suffix}"))
                subid += 1
                n += 1
    print(f"prepared {n} utterances")


if __name__ == "__main__":
    main()
