"""Model registry (capability-parity with reference models/__init__.py).

``load_model(name)`` resolves a model name to a ``LoadedModel`` — the
functional module, its config, and a parameter pytree ingested from the
reference's checkpoint files when present (the weight inventory of
models/__init__.py:23-44: autoregressive/clvp2/diffusion/vocoder/dvae/
rlg_auto/rlg_diffuser/mel_norms/bigvgan/hifigan) or randomly initialised
otherwise.  Zero-egress environments simply drop the weight files into
``model_dir``.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path
from typing import Any, Callable, Dict, Optional

import numpy as np

from ..utils.io import load_state_dict, pick_path

_logger = logging.getLogger(__name__)

DEFAULT_MODEL_DIRS = [
    Path(os.environ.get("TORTOISE_TPU_MODELS", "")) if
    os.environ.get("TORTOISE_TPU_MODELS") else None,
    Path(__file__).parent.parent / "data" / "models",
    Path("/root/reference/data/models"),
]

# name -> (weight filename, state-dict key)
WEIGHT_FILES = {
    "autoregressive": ("autoregressive.pth", None),
    "classifier": ("classifier.pth", None),
    "clvp": ("clvp2.pth", None),
    "diffusion": ("diffusion.pth", None),
    "vocoder": ("vocoder.pth", "model_g"),
    "dvae": ("dvae.pth", None),
    "rlg_auto": ("rlg_auto.pth", None),
    "rlg_diffuser": ("rlg_diffuser.pth", None),
    "bigvgan": ("bigvgan_24khz_100band.pth", "generator"),
    "hifigan": ("hifigan.pth", None),
    "mel_norms": ("mel_norms.pth", None),
}


# Acquisition table mirroring reference models/__init__.py:23-44 —
# original TorToiSe-v2 weights + ecker's BigVGAN + HiFiGAN mirrors.
# Overridable per-file via TORTOISE_TPU_URL_<FILENAME-STEM> (any urllib
# scheme, incl. file:// for offline mirrors/tests).
DEFAULT_MODEL_URLS = {
    "autoregressive.pth": "https://huggingface.co/jbetker/tortoise-tts-v2/resolve/main/.models/autoregressive.pth",
    "classifier.pth": "https://huggingface.co/jbetker/tortoise-tts-v2/resolve/main/.models/classifier.pth",
    "clvp2.pth": "https://huggingface.co/jbetker/tortoise-tts-v2/resolve/main/.models/clvp2.pth",
    # listed by the reference URL table (models/__init__.py:27) though
    # nothing in its pipeline loads it; kept for table parity
    "cvvp.pth": "https://huggingface.co/jbetker/tortoise-tts-v2/resolve/main/.models/cvvp.pth",
    "diffusion.pth": "https://huggingface.co/jbetker/tortoise-tts-v2/resolve/main/.models/diffusion_decoder.pth",
    "vocoder.pth": "https://huggingface.co/jbetker/tortoise-tts-v2/resolve/main/.models/vocoder.pth",
    "dvae.pth": "https://huggingface.co/jbetker/tortoise-tts-v2/resolve/3704aea61678e7e468a06d8eea121dba368a798e/.models/dvae.pth",
    "rlg_auto.pth": "https://huggingface.co/jbetker/tortoise-tts-v2/resolve/main/.models/rlg_auto.pth",
    "rlg_diffuser.pth": "https://huggingface.co/jbetker/tortoise-tts-v2/resolve/main/.models/rlg_diffuser.pth",
    "mel_norms.pth": "https://huggingface.co/jbetker/tortoise-tts-v2/resolve/main/data/mel_norms.pth",
    "bigvgan_24khz_100band.pth": "https://huggingface.co/ecker/tortoise-tts-models/resolve/main/models/bigvgan_24khz_100band.pth",
    "bigvgan_24khz_100band.json": "https://huggingface.co/ecker/tortoise-tts-models/resolve/main/models/bigvgan_24khz_100band.json",
    "hifigan.pth": "https://huggingface.co/Manmay/tortoise-tts/resolve/main/hifidecoder.pth",
}


_download_failed: set = set()     # one attempt per file per process


def download_model(fname: str, dest_dir: Optional[Path] = None,
                   timeout: float = 10.0) -> Optional[Path]:
    """Fetch one weight file into the model cache (reference
    download_model, models/__init__.py:49-87).

    Graceful offline fallback: any failure (no egress, 404, timeout)
    logs and returns None so callers fall back to random init.  URL per
    file overridable via ``TORTOISE_TPU_URL_<STEM>`` env (e.g.
    ``TORTOISE_TPU_URL_AUTOREGRESSIVE=file:///mirror/ar.pth``) —
    file:// schemes make the path testable without network.
    """
    if fname in _download_failed:
        return None
    env_key = "TORTOISE_TPU_URL_" + \
        Path(fname).stem.upper().replace("-", "_").replace(".", "_")
    url = os.environ.get(env_key) or DEFAULT_MODEL_URLS.get(fname)
    if url is None:
        _logger.warning("no download URL for %s", fname)
        return None
    dest_dir = dest_dir or next(
        (d for d in DEFAULT_MODEL_DIRS
         if d is not None and os.access(d.parent if not d.exists() else d,
                                        os.W_OK)),
        Path.home() / ".cache" / "tortoise_tts_tpu")
    dest = Path(dest_dir) / fname
    if dest.exists():
        return dest
    import urllib.request
    tmp = dest.with_suffix(dest.suffix + ".part")
    try:
        dest.parent.mkdir(parents=True, exist_ok=True)
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                open(tmp, "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        tmp.rename(dest)        # atomic: interrupted downloads never land
        _logger.info("downloaded %s -> %s", url, dest)
        return dest
    except Exception as e:
        _logger.warning("download of %s failed (%s); offline fallback",
                        fname, e)
        _download_failed.add(fname)
        tmp.unlink(missing_ok=True)
        return None


def find_weight_file(name: str, allow_download: bool = True
                     ) -> Optional[Path]:
    fname, _ = WEIGHT_FILES.get(name, (None, None))
    if fname is None:
        return None
    for d in DEFAULT_MODEL_DIRS:
        if d is None:
            continue
        p = d / fname
        if p.exists():
            return p
        p = pick_path(p, ".sft", ".safetensors")
        if p.exists():
            return p
    if allow_download and os.environ.get("TORTOISE_TPU_OFFLINE") != "1":
        return download_model(fname)
    return None


@dataclass
class LoadedModel:
    name: str
    module: Any          # the model's python module (init/forward/...)
    config: Any          # its config dataclass
    params: Dict[str, Any]
    from_checkpoint: bool


@lru_cache(maxsize=1)
def load_mel_norms() -> Optional[np.ndarray]:
    """The 80-bin mel normalisation vector (arch_utils.py:378-394).
    Cached: it sits on the per-segment dataset-prep hot path (two calls
    per encode), and the vector is read-only."""
    p = find_weight_file("mel_norms")
    if p is None:
        return None
    if p.suffix in (".sft", ".safetensors"):
        return load_state_dict(p)["mel_norms"]
    import torch
    t = torch.load(str(p), map_location="cpu", weights_only=False)
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_torch_sd(name: str, sd, cfg):
    """Reference torch-layout flat state dict -> this package's params
    (the same converters load_model's registry path uses; serves the
    engine factory's explicit ``models[].path`` checkpoints)."""
    from . import convert
    c = _canonical(name)
    if c == "autoregressive":
        return convert.convert_unified_voice(sd, cfg.layers)
    if c == "diffusion":
        return convert.convert_diffusion(sd, cfg.num_layers)
    if c == "clvp":
        return convert.convert_clvp(sd, cfg.text_enc_depth)
    if c == "dvae":
        return convert.convert_dvae(sd)
    if c == "bigvgan":
        return convert.convert_bigvgan(sd, n_ups=len(cfg.upsample_rates),
                                       resblock=cfg.resblock)
    if c == "hifigan":
        return convert.convert_hifigan(sd)
    if c == "vocoder":
        return convert.convert_univnet(sd)
    if c in ("rlg_auto", "rlg_diffuser"):
        return convert.convert_rlg(sd)
    if c == "classifier":
        return convert.convert_classifier(sd, depth=cfg.depth)
    raise KeyError(f"no torch-layout converter for model: {name}")


@lru_cache(maxsize=None)
def load_model(name: str, dtype: str = "float32",
               seed: int = 0) -> LoadedModel:
    """Resolve + construct a model by name (reference load_model,
    models/__init__.py:90-176).  Results are cached per (name, dtype)."""
    import jax
    import jax.numpy as jnp
    from . import (bigvgan, classifier, clvp, convert, diffusion, dvae,
                   hifigan, rlg, unified_voice, univnet)

    key = jax.random.PRNGKey(seed)
    wpath = find_weight_file(name if name in WEIGHT_FILES else
                             _canonical(name))
    sd = None
    if wpath is not None:
        try:
            sd = load_state_dict(wpath, key=WEIGHT_FILES[_canonical(name)][1])
        except Exception as e:  # corrupt/missing — fall back to random
            _logger.warning("failed to load %s: %s", wpath, e)

    cname = _canonical(name)
    if cname == "autoregressive":
        cfg = unified_voice.UnifiedVoiceConfig()
        params = (convert.convert_unified_voice(sd, cfg.layers) if sd
                  else unified_voice.init(key, cfg))
        module = unified_voice
    elif cname == "diffusion":
        cfg = diffusion.DiffusionConfig()
        params = (convert.convert_diffusion(sd, cfg.num_layers) if sd
                  else diffusion.init(key, cfg))
        module = diffusion
    elif cname == "clvp":
        cfg = clvp.CLVPConfig()
        params = (convert.convert_clvp(sd, cfg.text_enc_depth) if sd
                  else clvp.init(key, cfg))
        module = clvp
    elif cname == "dvae":
        cfg = dvae.DVAEConfig()
        params = convert.convert_dvae(sd) if sd else dvae.init(key, cfg)
        module = dvae
    elif cname == "bigvgan":
        jcfg = None
        if wpath is not None:
            jpath = wpath.with_suffix(".json")
            if jpath.exists():
                jcfg = json.loads(jpath.read_text())
        cfg = (bigvgan.BigVGANConfig.from_json(jcfg) if jcfg
               else bigvgan.BigVGANConfig())
        params = (convert.convert_bigvgan(
            sd, n_ups=len(cfg.upsample_rates), resblock=cfg.resblock)
            if sd else _bigvgan_random(key, cfg))
        module = bigvgan
    elif cname == "hifigan":
        cfg = hifigan.HifiganConfig()
        params = (convert.convert_hifigan(sd) if sd
                  else _hifigan_random(key, cfg))
        module = hifigan
    elif cname == "vocoder":
        cfg = univnet.UnivNetConfig()
        params = (convert.convert_univnet(sd) if sd
                  else _univnet_random(key, cfg))
        module = univnet
    elif cname in ("rlg_auto", "rlg_diffuser"):
        ch = 1024 if cname == "rlg_auto" else 2048
        cfg = ch
        params = convert.convert_rlg(sd) if sd else rlg.init(key, ch)
        module = rlg
    elif cname == "classifier":
        cfg = classifier.ClassifierConfig()
        params = (convert.convert_classifier(sd, depth=cfg.depth) if sd
                  else classifier.init(key, cfg))
        module = classifier
    else:
        raise KeyError(f"unknown model name: {name}")

    jdt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
           "float16": jnp.float16}[dtype]

    def to_jax(x):
        arr = jnp.asarray(x)
        if jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(jdt)
        return arr

    params = jax.tree_util.tree_map(to_jax, params)
    from .common import param_count
    _logger.info("%s (%s): %d parameters%s", name, dtype,
                 param_count(params),
                 "" if sd is not None else " [random init]")
    return LoadedModel(cname, module, cfg, params, sd is not None)


def _canonical(name: str) -> str:
    if "rlg" in name:
        return "rlg_auto" if "auto" in name else "rlg_diffuser"
    for key in ("autoregressive", "unified_voice", "diffusion", "clvp",
                "bigvgan", "hifigan", "vocoder", "dvae", "classifier"):
        if key in name:
            return "autoregressive" if key == "unified_voice" else key
    return name


def unload_models():
    load_model.cache_clear()


# ---------------------------------------------------------------------------
# random inits for vocoders (no reference init() counterpart needed for
# checkpointed use, but useful for tests/benches without weights)
# ---------------------------------------------------------------------------


def _keygen(key):
    """Unbounded stream of PRNG keys."""
    import jax
    while True:
        key, sub = jax.random.split(key)
        yield sub


def _hifigan_random(key, cfg):
    import jax
    from .common import conv1d_init
    ks = _keygen(key)
    ch0 = cfg.upsample_initial_channel
    p = {"conv_pre": conv1d_init(next(ks), cfg.in_channels, ch0, 7),
         "cond_layer": conv1d_init(next(ks), cfg.cond_channels, ch0, 1),
         "ups": [], "resblocks": []}
    for i, (u, k) in enumerate(zip(cfg.upsample_factors,
                                   cfg.upsample_kernel_sizes)):
        cin, cout = ch0 // (2 ** i), ch0 // (2 ** (i + 1))
        w = jax.random.normal(next(ks), (cin, cout, k)) * 0.02
        p["ups"].append({"w": w, "b": np.zeros((cout,))})
        for kk, dil in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilations):
            p["resblocks"].append({
                "convs1": [conv1d_init(next(ks), cout, cout, kk)
                           for _ in dil],
                "convs2": [conv1d_init(next(ks), cout, cout, kk)
                           for _ in dil]})
    p["conv_post"] = conv1d_init(next(ks), cout, cfg.out_channels, 7)
    return p


def _bigvgan_random(key, cfg):
    import jax
    import jax.numpy as jnp
    from .common import conv1d_init
    ks = _keygen(key)
    ch0 = cfg.upsample_initial_channel
    p = {"conv_pre": conv1d_init(next(ks), cfg.num_mels, ch0, 7),
         "ups": [], "resblocks": []}

    def snake(ch):
        z = jnp.zeros((ch,)) if cfg.snake_logscale else jnp.ones((ch,))
        return {"alpha": z, "beta": z}

    for i, (u, k) in enumerate(zip(cfg.upsample_rates,
                                   cfg.upsample_kernel_sizes)):
        cin, cout = ch0 // (2 ** i), ch0 // (2 ** (i + 1))
        w = jax.random.normal(next(ks), (cin, cout, k)) * 0.02
        p["ups"].append({"w": w, "b": np.zeros((cout,))})
        for kk, dil in zip(cfg.resblock_kernel_sizes,
                           cfg.resblock_dilation_sizes):
            p["resblocks"].append({
                "convs1": [conv1d_init(next(ks), cout, cout, kk)
                           for _ in dil],
                "convs2": [conv1d_init(next(ks), cout, cout, kk)
                           for _ in dil],
                "activations": [snake(cout) for _ in range(2 * len(dil))]})
    p["activation_post"] = snake(cout)
    p["conv_post"] = conv1d_init(next(ks), cout, 1, 7)
    return p


def _univnet_random(key, cfg):
    import jax
    from .common import conv1d_init
    ks = _keygen(key)
    cs = cfg.channel_size
    kp_hidden = cfg.kpnet_hidden
    layers = len(cfg.dilations)

    def kp():
        return {
            "input_conv": conv1d_init(next(ks), cfg.n_mel_channels,
                                      kp_hidden, 5),
            "residual_convs": [
                {"c1": conv1d_init(next(ks), kp_hidden, kp_hidden, 3),
                 "c2": conv1d_init(next(ks), kp_hidden, kp_hidden, 3)}
                for _ in range(3)],
            "kernel_conv": conv1d_init(
                next(ks), kp_hidden,
                cs * 2 * cs * cfg.conv_kernel_size * layers, 3),
            "bias_conv": conv1d_init(next(ks), kp_hidden, 2 * cs * layers, 3),
        }

    p = {"conv_pre": conv1d_init(next(ks), cfg.noise_dim, cs, 7),
         "conv_post": conv1d_init(next(ks), cs, 1, 7),
         "res_stack": []}
    for stride in cfg.strides:
        w = jax.random.normal(next(ks), (cs, cs, 2 * stride)) * 0.02
        p["res_stack"].append({
            "kernel_predictor": kp(),
            "convt_pre": {"w": w, "b": np.zeros((cs,))},
            "conv_blocks": [conv1d_init(next(ks), cs, cs,
                                        cfg.conv_kernel_size)
                            for _ in cfg.dilations]})
    return p
