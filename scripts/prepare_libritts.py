"""Organize a LibriTTS(-R)-style corpus into the voices/ tree expected by
emb.process (reference scripts/process_libritts.py capability).

LibriTTS layout: <root>/<split>/<speaker>/<chapter>/<utt>.wav +
<utt>.normalized.txt. Output: <out>/librispeech/<speaker>/<utt>.{wav,txt}.

    python scripts/prepare_libritts.py --input LibriTTS/train-clean-100 \
        --output voices
"""
import argparse
import shutil
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", type=Path, required=True)
    ap.add_argument("--output", type=Path, required=True)
    ap.add_argument("--group", type=str, default="librispeech")
    ap.add_argument("--link", action="store_true",
                    help="symlink audio instead of copying")
    ap.add_argument("--encode", action="store_true",
                    help="also encode straight to .mel artifacts "
                         "(reference scripts/process_libritts.py one-step "
                         "path); --output then receives the artifacts")
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    if args.encode:
        import sys
        sys.path.insert(0, str(Path(__file__).parent.parent))
        from tortoise_tts_tpu.emb.process import process_job
        from tortoise_tts_tpu.utils.io import read_wav
        n = 0
        for wav_path in sorted(args.input.rglob("*.wav")):
            speaker = wav_path.relative_to(args.input).parts[0]
            out = args.output / args.group / speaker / \
                f"{wav_path.stem}.mel"
            if out.exists():
                continue
            text = None
            for suffix in (".normalized.txt", ".original.txt", ".txt"):
                cand = Path(str(wav_path)[:-4] + suffix)
                if cand.exists():
                    text = cand.read_text().strip()
                    break
            wav, sr = read_wav(wav_path)
            if process_job(out, wav, sr, text=text, dtype=args.dtype):
                n += 1
        print(f"encoded {n} artifacts into {args.output}")
        return

    n = 0
    for wav in sorted(args.input.rglob("*.wav")):
        speaker = wav.relative_to(args.input).parts[0]
        out_dir = args.output / args.group / speaker
        out_dir.mkdir(parents=True, exist_ok=True)
        dst = out_dir / wav.name
        if not dst.exists():
            if args.link:
                dst.symlink_to(wav.resolve())
            else:
                shutil.copy2(wav, dst)
        for suffix in (".normalized.txt", ".original.txt", ".txt"):
            txt = wav.with_suffix("").with_suffix(suffix) \
                if suffix != ".txt" else wav.with_suffix(".txt")
            cand = Path(str(wav)[:-4] + suffix)
            if cand.exists():
                (out_dir / (wav.stem + ".txt")).write_text(cand.read_text())
                break
        n += 1
    print(f"organized {n} utterances into {args.output}")


if __name__ == "__main__":
    main()
