"""Native (C++) packed-dataset batch loader — ctypes bindings for
native/melbin.cpp.

``pack_melbin`` converts a tree of reference-format .mel artifacts into
one mmap-able pack file; ``MelBinDataset`` assembles fixed-shape
training batches in C++ threads (padding/truncation/dtype widening off
the Python hot path — the role torch DataLoader workers play in the
reference, data.py:897-905).

The .so is built on demand with the repo's native/Makefile; everything
degrades gracefully to the Python path when a toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import struct
import subprocess
from pathlib import Path
from typing import Dict, List, Optional, Sequence

import numpy as np

_logger = logging.getLogger(__name__)

NATIVE_DIR = Path(__file__).parent.parent.parent / "native"
SO_PATH = NATIVE_DIR / "libmelbin.so"

MAGIC = 0x424C454D  # "MELB"
# v2: record payloads are 4-byte aligned (record start aligned; pad
# between text and lat) so the C++ reader's u16/f32 pointers satisfy
# natural alignment — v1 packed back-to-back, which was UB on
# strict-alignment builds.  The reader rejects v1 files; repack.
VERSION = 2
_INDEX_FMT = "<QIIIIQfI"          # offset, n_codes, n_text, lat, dlat,
_INDEX_SIZE = struct.calcsize(_INDEX_FMT)  # wav_length, duration, pad
_HEADER_FMT = "<IIQ"
_HEADER_SIZE = struct.calcsize(_HEADER_FMT)

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(NATIVE_DIR)], check=True,
                       capture_output=True)
        return SO_PATH.exists()
    except Exception as e:
        _logger.warning("native melbin build failed: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not SO_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(SO_PATH))
    lib.mb_open.restype = ctypes.c_void_p
    lib.mb_open.argtypes = [ctypes.c_char_p]
    lib.mb_close.argtypes = [ctypes.c_void_p]
    lib.mb_count.restype = ctypes.c_uint64
    lib.mb_count.argtypes = [ctypes.c_void_p]
    lib.mb_durations.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.mb_batch.restype = ctypes.c_int
    lib.mb_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                             ctypes.c_int, ctypes.c_int, ctypes.c_int,
                             ctypes.c_int, ctypes.c_int] + \
        [ctypes.c_void_p] * 6 + [ctypes.c_int]
    _lib = lib
    return _lib


# ---------------------------------------------------------------------------
# packer
# ---------------------------------------------------------------------------


def pack_melbin(mel_paths: Sequence[str | Path], out_path: str | Path) -> int:
    """Pack reference-format .mel artifacts into one melbin file.

    A ``<out>.paths.json`` sidecar records the packed record order so
    the Dataset can map its (pruned/sharded/filtered/reordered) sample
    indices onto pack rows — sampler indices and raw pack order do NOT
    coincide in general."""
    from .dataset import load_artifact
    records = []
    for p in mel_paths:
        art = load_artifact(p)
        codes = np.asarray(art["codes"]).reshape(-1).astype(np.uint16)
        text = np.asarray(art.get("text", [])).reshape(-1).astype(np.uint8)
        lat = np.asarray(art["latent"][0]).reshape(-1).astype(np.float32)
        dlat = np.asarray(art["latent"][1]).reshape(-1).astype(np.float32)
        md = art.get("metadata", {})
        wav_length = int(md.get("original_length", len(codes) * 1024))
        duration = float(md.get("duration") or
                         wav_length / md.get("sample_rate", 22050))
        records.append((codes, text, lat, dlat, wav_length, duration))

    def _align4(x: int) -> int:
        return (x + 3) & ~3

    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    # write to a temp file + atomic rename: an interrupted pack must
    # never leave a truncated file that a later run mmaps
    tmp_path = out_path.with_suffix(out_path.suffix + ".tmp")
    with open(tmp_path, "wb") as f:
        f.write(struct.pack(_HEADER_FMT, MAGIC, VERSION, len(records)))
        offset = _align4(_HEADER_SIZE + len(records) * _INDEX_SIZE)
        for codes, text, lat, dlat, wav_length, duration in records:
            f.write(struct.pack(_INDEX_FMT, offset, len(codes), len(text),
                                len(lat), len(dlat), wav_length, duration, 0))
            offset = _align4(
                offset + _align4(codes.nbytes + text.nbytes)
                + lat.nbytes + dlat.nbytes)
        pos = _HEADER_SIZE + len(records) * _INDEX_SIZE
        f.write(b"\0" * (_align4(pos) - pos))
        pos = _align4(pos)
        for codes, text, lat, dlat, _, _ in records:
            f.write(codes.tobytes())
            f.write(text.tobytes())
            pos += codes.nbytes + text.nbytes
            f.write(b"\0" * (_align4(pos) - pos))
            pos = _align4(pos)
            f.write(lat.tobytes())
            f.write(dlat.tobytes())
            pos += lat.nbytes + dlat.nbytes
            f.write(b"\0" * (_align4(pos) - pos))
            pos = _align4(pos)
    os.replace(tmp_path, out_path)
    import json
    Path(str(out_path) + ".paths.json").write_text(
        json.dumps([str(p) for p in mel_paths]))
    return len(records)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------


class MelBinDataset:
    def __init__(self, path: str | Path,
                 lat_dim: Optional[int] = None,
                 dlat_dim: Optional[int] = None, num_threads: int = 4):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native melbin library unavailable")
        self._lib = lib
        self._h = lib.mb_open(str(path).encode())
        if not self._h:
            raise IOError(f"cannot open melbin file {path}")
        if lat_dim is None or dlat_dim is None:
            # dims live per-record in the index; peek record 0 so the
            # Dataset integration works for any model width (the old
            # 1024/2048 defaults broke non-published-scale packs)
            try:
                with open(path, "rb") as f:
                    f.seek(_HEADER_SIZE)
                    rec = struct.unpack(_INDEX_FMT, f.read(_INDEX_SIZE))
                lat_dim = lat_dim if lat_dim is not None else rec[3]
                dlat_dim = dlat_dim if dlat_dim is not None else rec[4]
            except struct.error:          # empty pack
                lat_dim, dlat_dim = lat_dim or 1024, dlat_dim or 2048
        self.lat_dim = int(lat_dim)
        self.dlat_dim = int(dlat_dim)
        self.num_threads = num_threads

    def __len__(self) -> int:
        return int(self._lib.mb_count(self._h))

    def durations(self) -> np.ndarray:
        out = np.zeros(len(self), dtype=np.float32)
        self._lib.mb_durations(self._h, out.ctypes.data_as(ctypes.c_void_p))
        return out

    def batch(self, indices: Sequence[int], text_bucket: int,
              mel_bucket: int) -> Dict[str, np.ndarray]:
        idx = np.asarray(indices, dtype=np.uint32)
        n = len(idx)
        text = np.empty((n, text_bucket), dtype=np.int32)
        text_len = np.empty((n,), dtype=np.int32)
        codes = np.empty((n, mel_bucket), dtype=np.int32)
        wav_len = np.empty((n,), dtype=np.int32)
        lat = np.empty((n, self.lat_dim), dtype=np.float32)
        dlat = np.empty((n, self.dlat_dim), dtype=np.float32)
        rc = self._lib.mb_batch(
            self._h, idx.ctypes.data_as(ctypes.c_void_p), n,
            text_bucket, mel_bucket, self.lat_dim, self.dlat_dim,
            text.ctypes.data_as(ctypes.c_void_p),
            text_len.ctypes.data_as(ctypes.c_void_p),
            codes.ctypes.data_as(ctypes.c_void_p),
            wav_len.ctypes.data_as(ctypes.c_void_p),
            lat.ctypes.data_as(ctypes.c_void_p),
            dlat.ctypes.data_as(ctypes.c_void_p),
            self.num_threads)
        if rc != 0:
            raise ValueError("mb_batch failed (bad index or dim mismatch)")
        return {"text": text, "text_lengths": text_len, "codes": codes,
                "wav_lengths": wav_len, "latents": lat,
                "diffusion_latents": dlat}

    def close(self):
        if self._h:
            self._lib.mb_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
