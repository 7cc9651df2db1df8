"""Train a BPE tokenizer over a dataset's transcripts (reference
scripts/train_tokenizer.py:52-59 — BpeTrainer, vocab 256).

    python scripts/train_tokenizer.py --metadata-dir training/metadata \
        --output tokenizer.json [--vocab-size 256]
"""
import argparse
import json
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metadata-dir", type=Path, required=True)
    ap.add_argument("--output", type=Path, default=Path("tokenizer.json"))
    ap.add_argument("--vocab-size", type=int, default=256)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, str(Path(__file__).parent.parent))
    from tortoise_tts_tpu.tokenizer import english_cleaners

    texts = []
    for wj in args.metadata_dir.rglob("whisper.json"):
        meta = json.loads(wj.read_text())
        for entry in meta.values():
            t = english_cleaners(entry.get("text", ""))
            if t:
                texts.append(t.replace(" ", "[SPACE]"))
    for mj in args.metadata_dir.rglob("metadata.json"):
        meta = json.loads(mj.read_text())
        for entry in meta.values():
            t = english_cleaners(entry.get("text", ""))
            if t:
                texts.append(t.replace(" ", "[SPACE]"))
    if not texts:
        raise SystemExit("no transcripts found")

    from tokenizers import Tokenizer, models, pre_tokenizers, trainers
    tok = Tokenizer(models.BPE(unk_token="[UNK]"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    trainer = trainers.BpeTrainer(
        special_tokens=["[STOP]", "[UNK]", "[SPACE]"],
        vocab_size=args.vocab_size)
    tok.train_from_iterator(texts, trainer=trainer)
    tok.save(str(args.output))
    print(f"trained {args.vocab_size}-token BPE over {len(texts)} "
          f"transcripts -> {args.output}")


if __name__ == "__main__":
    main()
