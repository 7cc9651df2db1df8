"""Export trainer checkpoints to deployable weights (reference export.py).

    python -m tortoise_tts_tpu.export --yaml config.yaml [--lora]
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

_logger = logging.getLogger(__name__)


def main(argv=None):
    parser = argparse.ArgumentParser("tortoise_tts_tpu.export")
    parser.add_argument("--yaml", type=Path, required=True)
    parser.add_argument("--module-name", type=str, default="autoregressive")
    parser.add_argument("--lora", action="store_true",
                        help="export standalone LoRA weights")
    parser.add_argument("--out", type=Path, default=None)
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from .config import Config
    from .engine import state as st
    from .models import load_model
    from .utils.io import load_state_dict, save_state_dict

    cfg = Config.load(args.yaml)
    if args.lora and cfg.lora is None:
        # silently exporting the base model where LoRA weights were
        # requested would ship the wrong artifact
        raise SystemExit("--lora requested but the config defines no "
                         "loras entry")
    name = cfg.lora.full_name if args.lora else args.module_name
    ckpt = st.latest_checkpoint(cfg.ckpt_dir, name)
    if ckpt is None:
        raise SystemExit(f"no checkpoint for {name} under {cfg.ckpt_dir}")
    flat = load_state_dict(ckpt / "module.sft")
    out = args.out or (cfg.ckpt_dir / name / "fp32.sft")
    save_state_dict({k: v.astype("float32") if v.dtype.kind == "f" else v
                     for k, v in flat.items()}, out,
                    metadata={"config": {"name": name},
                              "step": ckpt.name})
    _logger.info("exported %s -> %s", ckpt, out)


if __name__ == "__main__":
    main()
