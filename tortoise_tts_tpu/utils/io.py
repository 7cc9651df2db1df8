"""Checkpoint / audio IO (capability-parity with reference utils/io.py).

- ``load_state_dict``: reads .pth (torch pickle) or .sft (safetensors)
  into a flat name->numpy dict; JSON metadata decoded from safetensors
  headers (reference io.py:62-127 semantics).
- ``save_state_dict``: writes safetensors with JSON-coerced metadata.
- ``pick_path``: multi-extension resolution (io.py:45-53).
- WAV read/write via stdlib (soundfile/torchaudio are not in the image).
"""

from __future__ import annotations

import json
import struct
import wave
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np


def pick_path(path: Path, *extensions: str) -> Path:
    """Return the first existing sibling with one of the extensions."""
    if path.exists():
        return path
    for ext in extensions:
        p = path.with_suffix(ext)
        if p.exists():
            return p
    return path


def load_state_dict(path: str | Path, key: Optional[str] = None
                    ) -> Dict[str, np.ndarray]:
    """Load a checkpoint file into {name: numpy array}.

    Handles the reference's formats: .pth/.pt (torch zipfile pickles —
    requires torch, present in the image) and .sft/.safetensors.
    ``key`` selects a sub-dict (e.g. 'model_g' for UnivNet,
    'generator' for BigVGAN — models/__init__.py:125,142).
    """
    path = Path(path)
    if path.suffix in (".sft", ".safetensors"):
        from safetensors import safe_open
        out: Dict[str, np.ndarray] = {}
        with safe_open(str(path), framework="np") as f:
            for name in f.keys():
                out[name] = f.get_tensor(name)
        return out
    import torch
    sd = torch.load(str(path), map_location="cpu", weights_only=False)
    if key is not None and key in sd:
        sd = sd[key]
    # trainer-style checkpoints nest the weights under 'model'
    # (engine/state.py layout; reference engines/base.py:152-165) —
    # unwrap so converters see the flat tensor dict
    if (isinstance(sd, dict) and isinstance(sd.get("model"), dict)
            and not hasattr(sd["model"], "detach")):
        sd = sd["model"]
    out = {}
    for k, v in sd.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = v
    return out


def save_state_dict(state: Dict[str, np.ndarray], path: str | Path,
                    metadata: Optional[Dict[str, Any]] = None) -> None:
    from safetensors.numpy import save_file
    meta = {k: json.dumps(v) if not isinstance(v, str) else v
            for k, v in (metadata or {}).items()}
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    save_file({k: np.ascontiguousarray(v) for k, v in state.items()},
              str(path), metadata=meta or None)


def load_metadata(path: str | Path) -> Dict[str, Any]:
    """Read the JSON metadata from a safetensors header."""
    path = Path(path)
    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(n))
    meta = header.get("__metadata__", {})
    out = {}
    for k, v in meta.items():
        try:
            out[k] = json.loads(v)
        except (json.JSONDecodeError, TypeError):
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------


def write_wav(path: str | Path, wav: np.ndarray, sr: int = 24_000) -> None:
    """wav: float array (T,) or (1, T) in [-1, 1] -> 16-bit PCM WAV."""
    wav = np.asarray(wav).squeeze()
    if wav.ndim != 1:
        wav = wav.reshape(-1)
    pcm = np.clip(wav, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())


def read_wav(path: str | Path) -> tuple[np.ndarray, int]:
    """Read 16/24/32-bit PCM or float WAV -> (float32 (T,) mono, sr)."""
    with wave.open(str(path), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2**31
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        vals = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16))
        vals = np.where(vals >= 2**23, vals - 2**24, vals)
        data = vals.astype(np.float32) / 2**23
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        data = data.reshape(-1, ch)[:, 0]   # take first channel (mel.py:119-121)
    return data, sr
