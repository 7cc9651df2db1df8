#!/usr/bin/env python
"""Report speaker/book overlaps between LibriLight and LibriTTS trees
(capability-parity with reference
scripts/deduplicate_librilight_libritts.py:1-44) so duplicated books can
be dropped before training.

    python scripts/deduplicate_librilight_libritts.py \
        --librilight LibriLight-6K --libritts LibriTTS-Train \
        [--remove-from libritts]

File naming convention: <speaker>_<book>_<sub>.<ext>.
"""

import argparse
import shutil
from pathlib import Path


def index(root: Path):
    data = {}
    for spk_dir in sorted(p for p in root.iterdir() if p.is_dir()):
        for f in spk_dir.iterdir():
            parts = f.stem.split("_")
            if len(parts) < 3:
                continue
            data.setdefault(spk_dir.name, {}).setdefault(
                parts[1], []).append(f)
    return data


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--librilight", type=Path, required=True)
    ap.add_argument("--libritts", type=Path, required=True)
    ap.add_argument("--remove-from", choices=["none", "librilight",
                                              "libritts"], default="none")
    args = ap.parse_args(argv)

    light = index(args.librilight)
    tts = index(args.libritts)

    duplicates = []
    for speaker, books in tts.items():
        for book in books:
            if book in light.get(speaker, {}):
                duplicates.append(f"{speaker}/{book}")
                if args.remove_from != "none":
                    victims = (light if args.remove_from == "librilight"
                               else tts)[speaker][book]
                    for f in victims:
                        f.unlink(missing_ok=True)
    print("duplicates:", duplicates)
    print(f"{len(duplicates)} duplicated speaker/book pairs")


if __name__ == "__main__":
    main()
