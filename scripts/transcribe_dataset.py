#!/usr/bin/env python
"""Batch-transcribe a voices/ tree to whisper.json metadata (capability-
parity with reference scripts/transcribe_dataset.py:1-102).

    python scripts/transcribe_dataset.py --input-audio voices \
        --output-metadata training/metadata [--device N --num-devices M]

A thin multi-process driver over tortoise_tts_tpu.emb.transcribe (word
timestamps + cached model): --device/--num-devices stride speakers
across processes like the reference's GPU striding.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input-audio", type=Path, required=True)
    ap.add_argument("--output-metadata", type=Path, required=True)
    ap.add_argument("--model-name", default="openai/whisper-large-v3")
    ap.add_argument("--language", default="en")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--device", type=int, default=0)
    ap.add_argument("--num-devices", type=int, default=1)
    args = ap.parse_args(argv)

    from tortoise_tts_tpu.emb.transcribe import transcribe_batch
    n = transcribe_batch(args.input_audio, args.output_metadata,
                         model_name=args.model_name,
                         language=args.language,
                         stride=args.num_devices,
                         stride_offset=args.device,
                         batch_size=args.batch_size)
    print(f"transcribed {n} files")


if __name__ == "__main__":
    main()
