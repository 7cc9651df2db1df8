"""DVAE — discrete mel quantiser (reference dvae.py:12-315).

Strided-conv encoder/decoder + EMA-codebook VQ (8192 codes x 512-d).
Inference uses ``get_codebook_indices`` to produce the AR's target mel
codes; training updates the codebook with EMA statistics that are
psum'd across data-parallel replicas (dvae.py:42-59) — expressed here as
a pure function over an explicit ``VQState``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .common import conv1d, conv1d_init, interpolate_nearest_scale

Params = Dict[str, Any]


@dataclass(frozen=True)
class DVAEConfig:
    """Reference defaults (dvae.py:117-137 as instantiated with no kwargs)."""
    num_tokens: int = 8192
    codebook_dim: int = 512
    num_layers: int = 2
    num_resnet_blocks: int = 3
    hidden_dim: int = 512
    channels: int = 80
    stride: int = 2
    kernel_size: int = 3
    decay: float = 0.99
    eps: float = 1e-5


class VQState(NamedTuple):
    """EMA codebook state (dvae.py:24-27 buffers)."""
    embed: jnp.ndarray        # (dim, n_embed)
    cluster_size: jnp.ndarray  # (n_embed,)
    embed_avg: jnp.ndarray    # (dim, n_embed)


def init(key, cfg: DVAEConfig = DVAEConfig()) -> Params:
    ks = iter(jax.random.split(key, 32))
    h, c = cfg.hidden_dim, cfg.channels
    enc_chans = [h * 2 ** i for i in range(cfg.num_layers)]      # [512, 1024]
    dec_chans = list(reversed(enc_chans))                         # [1024, 512]
    inner = dec_chans[0]
    p: Params = {"enc_convs": [], "enc_res": [], "dec_convs": [],
                 "dec_res": []}
    chans = [c] + enc_chans
    for cin, cout in zip(chans[:-1], chans[1:]):
        p["enc_convs"].append(conv1d_init(next(ks), cin, cout, cfg.kernel_size))
    for _ in range(cfg.num_resnet_blocks):
        p["enc_res"].append(_res_init(next(ks), inner))
    p["enc_out"] = conv1d_init(next(ks), inner, cfg.codebook_dim, 1)

    p["dec_in"] = conv1d_init(next(ks), cfg.codebook_dim, inner, 1)
    for _ in range(cfg.num_resnet_blocks):
        p["dec_res"].append(_res_init(next(ks), inner))
    dchans = [inner] + dec_chans
    for cin, cout in zip(dchans[:-1], dchans[1:]):
        p["dec_convs"].append(conv1d_init(next(ks), cin, cout, cfg.kernel_size))
    p["dec_out"] = conv1d_init(next(ks), dec_chans[-1], c, 1)

    embed = jax.random.normal(next(ks), (cfg.codebook_dim, cfg.num_tokens))
    p["codebook"] = {"embed": embed, "cluster_size": jnp.zeros(cfg.num_tokens),
                     "embed_avg": embed.copy()}
    return p


def _res_init(key, ch: int) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    return {"c1": conv1d_init(k1, ch, ch, 3), "c2": conv1d_init(k2, ch, ch, 3),
            "c3": conv1d_init(k3, ch, ch, 1)}


def _res(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """dvae ResBlock (dvae.py:89-101): conv-relu-conv-relu-conv1 + x."""
    h = jax.nn.relu(conv1d(p["c1"], x, padding=1))
    h = jax.nn.relu(conv1d(p["c2"], h, padding=1))
    h = conv1d(p["c3"], h)
    return h + x


def encode_logits(p: Params, mel: jnp.ndarray,
                  cfg: DVAEConfig = DVAEConfig()) -> jnp.ndarray:
    """mel (B, 80, T) -> pre-VQ features (B, T/4, codebook_dim)."""
    h = mel
    pad = (cfg.kernel_size - 1) // 2
    for conv in p["enc_convs"]:
        h = jax.nn.relu(conv1d(conv, h, stride=cfg.stride, padding=pad))
    for r in p["enc_res"]:
        h = _res(r, h)
    h = conv1d(p["enc_out"], h)
    return jnp.transpose(h, (0, 2, 1))


def get_codebook_indices(p: Params, mel: jnp.ndarray,
                         cfg: DVAEConfig = DVAEConfig()) -> jnp.ndarray:
    """dvae.py:239-246. mel (B, 80, T) -> codes (B, T/4)."""
    flat = encode_logits(p, mel, cfg)
    embed = p["codebook"]["embed"]
    dist = (jnp.sum(flat ** 2, -1, keepdims=True)
            - 2 * flat @ embed
            + jnp.sum(embed ** 2, 0, keepdims=True))
    return jnp.argmin(dist, axis=-1).astype(jnp.int32)


def _decode_features(p: Params, feats: jnp.ndarray,
                     cfg: DVAEConfig) -> jnp.ndarray:
    """Decoder body shared by decode()/forward(): (B, T, D) features
    (codebook lookup or straight-through quantized) -> mel (B, 80, T*4)."""
    h = jnp.transpose(feats, (0, 2, 1))
    h = conv1d(p["dec_in"], h)
    for r in p["dec_res"]:
        h = _res(r, h)
    pad = (cfg.kernel_size - 1) // 2
    for conv in p["dec_convs"]:
        h = interpolate_nearest_scale(h, cfg.stride)   # UpsampledConv
        h = jax.nn.relu(conv1d(conv, h, padding=pad))
    return conv1d(p["dec_out"], h)


def decode(p: Params, codes: jnp.ndarray,
           cfg: DVAEConfig = DVAEConfig()) -> jnp.ndarray:
    """codes (B, T) -> mel (B, 80, T*4). dvae.py:248-270."""
    emb = jnp.take(p["codebook"]["embed"].T, codes, axis=0)  # (B, T, D)
    return _decode_features(p, emb, cfg)


def quantize_ema(state: VQState, flat: jnp.ndarray,
                 cfg: DVAEConfig = DVAEConfig(),
                 training: bool = False,
                 axis_name: Optional[str] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, VQState]:
    """EMA vector quantisation (dvae.py:29-69).

    flat: (..., D).  Returns (quantized straight-through, codes,
    commitment loss, new state).  When training under a mapped axis,
    the EMA statistics are psum'd across replicas (dvae.py:46-48).
    """
    d = flat.shape[-1]
    x = flat.reshape(-1, d)
    embed = state.embed
    dist = (jnp.sum(x ** 2, 1, keepdims=True) - 2 * x @ embed
            + jnp.sum(embed ** 2, 0, keepdims=True))
    idx = jnp.argmin(dist, axis=1)
    onehot = jax.nn.one_hot(idx, embed.shape[1], dtype=x.dtype)
    codes = idx.reshape(flat.shape[:-1])
    quant = jnp.take(embed.T, idx, axis=0).reshape(flat.shape)

    new_state = state
    if training:
        onehot_sum = onehot.sum(0)
        embed_sum = x.T @ onehot
        if axis_name is not None:
            onehot_sum = jax.lax.psum(onehot_sum, axis_name)
            embed_sum = jax.lax.psum(embed_sum, axis_name)
        cluster = state.cluster_size * cfg.decay + onehot_sum * (1 - cfg.decay)
        embed_avg = state.embed_avg * cfg.decay + embed_sum * (1 - cfg.decay)
        n = cluster.sum()
        cs = (cluster + cfg.eps) / (n + embed.shape[1] * cfg.eps) * n
        new_embed = embed_avg / cs[None]
        new_state = VQState(new_embed, cluster, embed_avg)

    diff = jnp.mean((jax.lax.stop_gradient(quant) - flat) ** 2)
    quant_st = flat + jax.lax.stop_gradient(quant - flat)
    return quant_st, codes, diff, new_state


def forward(p: Params, mel: jnp.ndarray, cfg: DVAEConfig = DVAEConfig(),
            training: bool = False, axis_name: Optional[str] = None):
    """Full VAE pass (dvae.py:281-302): returns (recon_loss per-elem,
    commitment loss, recon, codes, new VQState)."""
    flat = encode_logits(p, mel, cfg)
    state = VQState(p["codebook"]["embed"], p["codebook"]["cluster_size"],
                    p["codebook"]["embed_avg"])
    quant, codes, commit, new_state = quantize_ema(
        state, flat, cfg, training=training, axis_name=axis_name)
    recon = _decode_features(p, quant, cfg)
    recon_loss = (mel - recon) ** 2
    return recon_loss, commit, recon, codes, new_state
