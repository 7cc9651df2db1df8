"""Import harness for the read-only reference implementation.

Parity tests run the reference PyTorch models on CPU as golden oracles.
The image lacks several of the reference's optional deps (torchaudio,
librosa, xformers, vector_quantize_pytorch, ...) — none of which are on
the code paths we exercise — so minimal stubs are installed before import.

The stubs implement just enough real math (librosa mel filterbank,
pad_center, get_window passthrough) for the reference modules' import-time
and constructor-time needs.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REFERENCE_ROOT = "/root/reference"

_installed = False


def _mk(name: str, **attrs) -> types.ModuleType:
    import importlib.machinery
    m = types.ModuleType(name)
    # give stubs a real ModuleSpec so importlib.util.find_spec() works on
    # them (transformers probes for librosa at import time)
    m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def _librosa_mel(sr=22050, n_fft=2048, n_mels=128, fmin=0.0, fmax=None,
                 htk=False, norm="slaney", dtype=np.float32):
    from tortoise_tts_tpu.ops.stft import mel_filterbank
    if fmax is None:
        fmax = sr / 2
    scale = "htk" if htk else "slaney"
    return mel_filterbank(int(sr), int(n_fft), int(n_mels), float(fmin),
                          float(fmax), scale=scale,
                          norm=norm or "none").astype(dtype)


def install_stubs():
    global _installed
    if _installed:
        return
    import torch

    # ---- torchaudio ----
    ta = _mk("torchaudio")
    trans = _mk("torchaudio.transforms")
    func = _mk("torchaudio.functional")
    ta.transforms = trans
    ta.functional = func

    class MelSpectrogram(torch.nn.Module):
        """torchaudio.transforms.MelSpectrogram equivalent (power spec +
        htk-scale mel with requested norm), torch ops only."""

        def __init__(self, n_fft=400, hop_length=None, win_length=None,
                     power=2.0, normalized=False, sample_rate=16000,
                     f_min=0.0, f_max=None, n_mels=128, norm=None):
            super().__init__()
            self.n_fft = n_fft
            self.hop = hop_length or n_fft // 2
            self.win = win_length or n_fft
            self.power = power
            fb = _librosa_mel(sr=sample_rate, n_fft=n_fft, n_mels=n_mels,
                              fmin=f_min, fmax=f_max or sample_rate / 2,
                              htk=True, norm=norm)
            self.register_buffer("fb", torch.from_numpy(fb.copy()))
            self.register_buffer("window", torch.hann_window(self.win))

        def forward(self, x):
            spec = torch.stft(x, self.n_fft, self.hop, self.win,
                              window=self.window, center=True,
                              pad_mode="reflect", return_complex=True)
            mag = spec.abs() ** self.power
            return torch.matmul(self.fb, mag)

    trans.MelSpectrogram = MelSpectrogram

    def resample(wav, orig, new, **kw):
        raise NotImplementedError("stub: not needed in parity tests")

    func.resample = resample

    # ---- librosa ----
    lib = _mk("librosa")
    filters = _mk("librosa.filters", mel=_librosa_mel)
    util = _mk("librosa.util")

    def pad_center(data, size=None, **kwargs):
        size = size if size is not None else kwargs.get("size")
        n = len(data)
        lpad = (size - n) // 2
        return np.pad(data, (lpad, size - n - lpad))

    def tiny(x):
        return np.finfo(np.float32).tiny

    def normalize(S, norm=None, **kw):
        if norm is None:
            return S
        raise NotImplementedError

    util.pad_center = pad_center
    util.tiny = tiny
    util.normalize = normalize
    lib.filters = filters
    lib.util = util

    # ---- misc optional deps ----
    class _VQ(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    _mk("vector_quantize_pytorch", VectorQuantize=_VQ)

    class _RotEmb(torch.nn.Module):
        def __init__(self, *a, **k):
            super().__init__()

    _mk("rotary_embedding_torch", RotaryEmbedding=_RotEmb,
        broadcat=lambda *a, **k: None,
        apply_rotary_emb=lambda *a, **k: None)

    # The reference's vendored stream_generator targets transformers ~4.2x
    # (BeamSearchScorer import) and fails on the installed 4.5x.  Only the
    # NewGenerationMixin base class is needed by unified_voice's
    # GPT2InferenceModel; parity tests drive decode manually.
    class NewGenerationMixin:
        pass

    _mk("tortoise_tts.models.stream_generator",
        NewGenerationMixin=NewGenerationMixin,
        init_stream_support=lambda: None)

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    _installed = True


def import_ref(modname: str):
    """import_ref('models.unified_voice') -> reference module."""
    install_stubs()
    import importlib
    return importlib.import_module(f"tortoise_tts.{modname}")
