"""TTS inference API (capability-parity with reference inference.py).

Pipeline per line of text (reference call stack, SURVEY §3.1):
  tokenize -> AR decode (jitted prefill+while_loop, fixed text bucket)
  -> stop-token cleanup (calm-token constants, inference.py:353-366)
  -> full-seq latent pass (return_latent) -> calm-token latent trim
  -> diffusion (DDIM/P lax.scan, cond-free guidance batched)
  -> denormalize -> vocoder {bigvgan | vocoder(univnet) | hifigan-stream}

TPU-first design: every jitted shape is bucketed (text buckets, decode
budget, optional diffusion frame rounding) so repeated calls hit the
compile cache; all host<->device traffic is the small token/latent
arrays.
"""

from __future__ import annotations

import logging
import os
import time
from pathlib import Path
from typing import Iterator, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import Config
from .emb import mel as emb_mel
from .models import load_model
from .models import gaussian
from .models.unified_voice import DecodeResult, forward as uv_forward, \
    inference_speech, inference_speech_beam, inference_speech_shared
from .ops.sampling import SamplingConfig
from .ops.stft import denormalize_tacotron_mel
from .tokenizer import VoiceBpeTokenizer
from .utils.io import write_wav

_logger = logging.getLogger(__name__)

CALM_TOKEN = 83          # inference.py:231
TAIL_TOKENS = (45, 45, 248)  # inference.py:363-366


# ---------------------------------------------------------------------------
# jitted stage functions — params are ARGUMENTS (never closures), so the
# compiled programs are parameter-free and cached per shape bucket.
# ---------------------------------------------------------------------------

from functools import partial

from .models import diffusion as _dtts


@jax.jit
def _jit_latent_window(latents, idx):
    """Streaming window gather + fp32 cast in ONE program (the eager
    fancy-index form costs 2-3 relay dispatches per 40-token chunk)."""
    return jnp.take(latents[0], idx, axis=0)[None].astype(jnp.float32)


@partial(jax.jit, static_argnames=("cfg",))
def _jit_latent_pass(params, cond, text, text_lengths, codes, wav_lengths,
                     cfg):
    return uv_forward(params, cond, text, text_lengths, codes, wav_lengths,
                      cfg, return_latent=True)


def _device_cleanup(codes, lengths, cfg):
    """Vectorized stop-token cleanup + calm-trim point on device — the
    exact math of ``TTS.cleanup_codes`` + ``TTS.calm_trim_point``
    (reference inference.py:353-389).  Returns (cleaned codes with the
    past-lv region stop-padded, per-row trim point t_lat, lv)."""
    b, n = codes.shape
    idx = jnp.arange(n)[None, :]
    lv = jnp.minimum(jnp.max(lengths) + 1, n)          # scalar, traced
    in_range = idx < lv
    stop_mask = (codes == cfg.stop_mel_token) & in_range
    has_stop = jnp.any(stop_mask, axis=1, keepdims=True)
    fs = jnp.min(jnp.where(stop_mask, idx, n), axis=1, keepdims=True)
    cleaned = jnp.where(has_stop & (idx >= fs), CALM_TOKEN, codes)
    off = idx - (lv - 3)                               # 0,1,2 at the tail
    tails = jnp.asarray(TAIL_TOKENS, codes.dtype)[jnp.clip(off, 0, 2)]
    cleaned = jnp.where(has_stop & (off >= 0) & in_range, tails, cleaned)
    # region past lv = stop token (the host path pads codes with it)
    cleaned = jnp.where(in_range, cleaned, cfg.stop_mel_token)

    # first index where >8 consecutive calm tokens begin, else lv
    is_calm = (cleaned == CALM_TOKEN) & in_range
    nc = jnp.where(~is_calm, idx, -1)
    run = idx - jax.lax.cummax(nc, axis=1)
    t_lat = jnp.min(jnp.where((run > 8) & in_range, idx, lv), axis=1)
    return cleaned, t_lat.astype(jnp.int32), lv


@partial(jax.jit, static_argnames=("cfg",))
def _jit_cleanup_latents(params, cond, text, text_lengths, codes, lengths,
                         cfg):
    """Device-side stop-token cleanup + calm-trim + latent pass in ONE
    program — the vectorized equivalent of ``TTS.cleanup_codes`` +
    ``TTS.calm_trim_point`` (reference inference.py:353-389) followed by
    the return_latent forward.

    Keeping this on device matters enormously here: through the remote
    relay every device->host fetch costs ~50-100 ms of round-trip
    latency, and the host path fetches codes AND lengths before it can
    dispatch the latent pass.  Returns (latents (B, N, D), t_lat (B,)).
    """
    b = codes.shape[0]
    cleaned, t_lat, lv = _device_cleanup(codes, lengths, cfg)
    wav_lengths = jnp.full((b,), 1, jnp.int32) * lv * \
        cfg.mel_length_compression
    latents = uv_forward(params, cond, text, text_lengths, cleaned,
                         wav_lengths, cfg, return_latent=True)
    return latents, t_lat


@partial(jax.jit, static_argnames=("cfg", "clvp_cfg", "ncand", "n_real"))
def _jit_rerank_latents(params, clvp_params, cond, text, text_lengths,
                        codes, lengths, cfg, clvp_cfg,
                        ncand: Optional[int] = None,
                        n_real: Optional[int] = None):
    """Candidate fan-out, fully device-resident (config #3 fast path):
    cleanup all candidates, CLVP-score them, argmax, and run the
    return_latent pass on the WINNER row(s) only — zero host fetches
    between the AR decode and the diffusion dispatch (the host path
    fetches codes+lengths, then the scores: 2+ relay round trips).

    ``ncand``: rows come in groups of this many candidates (row-major;
    default = all rows are one group, the single-utterance path).  One
    winner is picked PER GROUP — the batched-serving per-row rerank.
    ``n_real``: rows >= n_real are mesh padding (the fan-out is padded
    to the data axis); their scores are masked out of the argmax.

    Design delta vs the host path (documented + tested): CLVP scores
    the budget-length CALM-padded candidates instead of truncating at
    the longest candidate — trailing calm tokens past lv are exactly
    what the reference's own cleanup emits before that truncation.
    Returns (latents (G, N, D), t_lat (G,), best (G,) flat row index)
    where G = rows // ncand.
    """
    from .models import clvp as _clvp
    R = codes.shape[0]
    C = R if ncand is None else ncand
    cleaned, t_lat, lv = _device_cleanup(codes, lengths, cfg)
    # CLVP's speech vocab is 8192: the stop-padding past lv is
    # out-of-vocab, so score the calm-padded form instead
    idx = jnp.arange(cleaned.shape[1])[None, :]
    clvp_codes = jnp.where(idx < lv, cleaned, CALM_TOKEN)
    scores = _clvp.forward(clvp_params, text, clvp_codes, clvp_cfg)
    if n_real is not None and n_real < R:
        scores = jnp.where(jnp.arange(R) < n_real, scores, -jnp.inf)
    best = (jnp.argmax(scores.reshape(-1, C), axis=1)
            + jnp.arange(R // C) * C)                    # (G,) flat rows

    def sel(x):
        return jnp.take(x, best, axis=0)

    wav_lengths = jnp.full((best.shape[0],), 1, jnp.int32) * lv * \
        cfg.mel_length_compression
    latents = uv_forward(params, sel(cond), sel(text), sel(text_lengths),
                         sel(cleaned), wav_lengths, cfg,
                         return_latent=True)
    return latents, sel(t_lat), best


@partial(jax.jit, static_argnames=("dcfg", "steps", "sampler", "seq_len",
                                   "cond_free", "cond_free_k", "n_lat",
                                   "pad_seq_len"))
def _jit_diffusion(dparams, latents, diff_cond, key, dcfg, steps,
                   sampler, seq_len, cond_free, diffusion_temp=1.0,
                   cond_free_k=2.0, n_lat=None, t_lat=None,
                   pad_seq_len=None, uncond_h=None, rows=None):
    """timestep_independent + noise + full DDIM/P scan in one compiled
    program (noise is generated in-graph — a host-side
    jax.random.normal would be one extra eager dispatch through the
    remote relay per utterance).

    When ``n_lat``/``t_lat`` are given, ``latents`` is the full
    (B, max_steps, D) device buffer from the latent pass and the
    calm-trim + edge-pad to ``n_lat`` frames happens here (dynamic
    gather), avoiding a host roundtrip of the latents.  ``t_lat`` may be
    scalar or per-row (B,).

    ``pad_seq_len``: run the denoiser at this MXU-aligned length (e.g.
    the 128-multiple above ``seq_len``).  The code embedding is first
    interpolated to ``seq_len`` with the reference's exact latent->mel
    ratio, then edge-padded — identical semantics to edge-repeating calm
    latents, but the hot attention/conv shapes stay tile-aligned
    (T=975 -> 1024 measured well over 1 ms/step cheaper on v5e).  The
    caller trims the vocoded wav to the exact length as before."""
    sched = gaussian.get_schedule(steps=steps, cond_free=cond_free,
                                  cond_free_k=cond_free_k)
    if rows is not None:
        # row-bucketed batch serving: gather this bucket's rows in-graph
        # (a host-side fancy index would be an eager relay dispatch AND
        # break GSPMD propagation from the sharded latent pass)
        latents = jnp.take(latents, rows, axis=0)
        if t_lat is not None:
            t_lat = jnp.take(jnp.atleast_1d(t_lat), rows, axis=0)
        if diff_cond.ndim == 2 and diff_cond.shape[0] > 1:
            # per-row voices: each bucket row keeps ITS voice's latent
            diff_cond = jnp.take(diff_cond, rows, axis=0)
        if key.ndim == 2:
            # per-row seeds: each bucket row keeps ITS key stream
            key = jnp.take(key, rows, axis=0)
    b = latents.shape[0]
    if n_lat is not None:
        t = jnp.atleast_1d(t_lat)
        idx = jnp.minimum(jnp.arange(n_lat)[None, :], t[:, None] - 1)
        idx = jnp.broadcast_to(idx, (b, n_lat))
        latents = jnp.take_along_axis(latents, idx[..., None], axis=1)
    latents = latents.astype(jnp.float32)
    diff_cond = jnp.broadcast_to(diff_cond.astype(jnp.float32),
                                 (b, diff_cond.shape[-1]))
    T = seq_len if pad_seq_len is None else max(pad_seq_len, seq_len)
    pre = _dtts.timestep_independent(dparams, latents, diff_cond, seq_len,
                                     dcfg)
    if T > seq_len:
        pre = jnp.pad(pre, ((0, 0), (0, 0), (0, T - seq_len)), mode="edge")
    if cond_free and uncond_h is None:
        uncond = _dtts.unconditioned_embedding(dparams, b, T)
        code_emb = jnp.concatenate([pre.astype(jnp.float32),
                                    uncond.astype(jnp.float32)], axis=0)
    else:
        code_emb = pre.astype(jnp.float32)

    # run the denoiser trunk at the params' dtype (bf16 in production —
    # the reference's fp16 autocast equivalent, diffusion.py:1558-1563);
    # the sampler math stays fp32 (p_mean_variance upcasts outputs)
    pdt = jnp.asarray(dparams["inp_block"]["w"]).dtype
    code_emb = code_emb.astype(pdt)
    # timestep-invariant rel-pos biases hoisted out of the scan (~70% of
    # per-step cost when gathered inside the loop).  TTS_DENOISE_KQ=1
    # switches to the transposed-score Pallas attention
    # (flash_attention_bias_qkv_kq) — measured 9.5 vs 7.1 ms/step on
    # v5e (Mosaic's per-op VMEM round trips on the softmax chain cost
    # as much as XLA's fused HBM score materialization), so the XLA
    # bf16-scores path stays the default.
    kq = (jax.default_backend() == "tpu"
          and os.environ.get("TTS_DENOISE_KQ", "0") == "1")
    rel_biases = _dtts.precompute_rel_biases(dparams, T, dcfg, pdt,
                                             transposed=kq)

    # Note: hoisting the conditioning_timestep_integrator out of the
    # scan (batched over all S steps via forward_trunk) was measured at
    # parity — the in-scan B=2/T=1024 matmuls are already MXU-efficient,
    # and the (S, B, C, T) precompute adds ~400 MB of HBM round-trip.
    if cond_free and uncond_h is not None:
        # The UNCONDITIONAL integrator branch depends only on (weights,
        # T, schedule) — precomputed once per shape by
        # TTS._uncond_integrated and cached across utterances.  The
        # in-scan integrator then runs at B=1 (cond row only): ~0.8
        # ms/step saved at production shapes.
        uh = uncond_h.astype(pdt)

        def model_fn(x, ts, t_idx):
            te = _dtts.embed_time(dparams, ts, dcfg, pdt)
            h_c = _dtts.integrate_conditioning(
                dparams, code_emb, te[:b], dcfg, rel_biases)
            h_u = jnp.broadcast_to(uh[t_idx], h_c.shape)
            h = jnp.concatenate([h_c, h_u], axis=0)
            return _dtts.forward_trunk(dparams, x.astype(pdt), te, h,
                                       dcfg, rel_biases=rel_biases)
    else:
        def model_fn(x, ts, t_idx=None):
            return _dtts.forward(dparams, x.astype(pdt), ts, code_emb,
                                 dcfg, rel_biases=rel_biases)

    if key.ndim == 2:
        # per-row keys (batched serving with per-row seeds): row r's
        # noise is a function of row r's key only, bit-matching the
        # single-row call with the same seed (see sample_loop)
        ks = jax.vmap(jax.random.split)(key)          # (B, 2, 2)
        k_noise, k_samp = ks[:, 0], ks[:, 1]
        noise = jax.vmap(lambda kk: jax.random.normal(
            kk, (100, T), jnp.float32))(k_noise) * diffusion_temp
    else:
        k_noise, k_samp = jax.random.split(key)
        noise = jax.random.normal(k_noise, (b, 100, T),
                                  jnp.float32) * diffusion_temp
    mel = gaussian.sample_loop(model_fn, noise, k_samp, sched,
                               sampler=sampler)
    return denormalize_tacotron_mel(mel)


@partial(jax.jit, static_argnames=("dcfg", "steps", "cond_free_k", "T"))
def _jit_uncond_integrate(dparams, dcfg, steps, cond_free_k, T):
    """Per-step conditioning_timestep_integrator outputs for the
    UNCONDITIONAL guidance branch — a pure function of (weights, T,
    schedule), so TTS caches the (S, 1, C, T) result across utterances
    and _jit_diffusion's scan gathers its 2 MB slice instead of running
    the integrator at B=2 every step."""
    sched = gaussian.get_schedule(steps=steps, cond_free=True,
                                  cond_free_k=cond_free_k)
    pdt = jnp.asarray(dparams["inp_block"]["w"]).dtype
    kq = (jax.default_backend() == "tpu"
          and os.environ.get("TTS_DENOISE_KQ", "0") == "1")
    rel_biases = _dtts.precompute_rel_biases(dparams, T, dcfg, pdt,
                                             transposed=kq)
    uncond = _dtts.unconditioned_embedding(dparams, 1, T).astype(pdt)
    temb = _dtts.embed_time(dparams, jnp.asarray(sched.timestep_map),
                            dcfg, pdt)                    # (S, C)

    def body(_, te):
        h = _dtts.integrate_conditioning(dparams, uncond, te[None], dcfg,
                                         rel_biases)
        return None, h

    _, hs = jax.lax.scan(body, None, temb)
    return hs                                             # (S, 1, C, T)


@partial(jax.jit, static_argnames=("cfg", "as_i16"))
def _jit_bigvgan(params, mel, cfg, as_i16=False, prefix=None):
    from .models import bigvgan as _bv
    pdt = jnp.asarray(params["conv_pre"]["w"]).dtype
    wav = _bv.inference(params, mel.astype(pdt), cfg).astype(jnp.float32)
    if as_i16:
        # device-side 16-bit PCM quantization: the delivered artifact is
        # a 16-bit WAV anyway (utils/io.write_wav), and the int16 payload
        # halves the device->host transfer through the relay (~1 MB of
        # fp32 wav costs ~75 ms of wall at relay bandwidth)
        wav = jnp.clip(wav * 32767.0, -32768.0, 32767.0).astype(jnp.int16)
        if prefix is not None:
            # pack small per-row scalars (e.g. the device-computed calm
            # trim point) into the wav payload so the host needs only
            # ONE fetch for the whole utterance (each fetch is a
            # ~50-100 ms relay round trip)
            pre = prefix.astype(jnp.int16)[:, None, None]
            pre = jnp.broadcast_to(pre, (wav.shape[0], wav.shape[1], 1))
            wav = jnp.concatenate([pre, wav], axis=2)
    return wav


@partial(jax.jit, static_argnames=("cfg",))
def _jit_univnet(params, mel, key, cfg):
    from .models import univnet as _un
    if key.ndim == 2:
        # per-row keys: draw each row's noise from its own stream
        # (bit-matches the B=1 call with that row's key)
        noise = jax.vmap(lambda kk: jax.random.normal(
            kk, (cfg.noise_dim, mel.shape[2] + 10), mel.dtype))(key)
        return _un.inference(params, mel, noise=noise, cfg=cfg)
    return _un.inference(params, mel, key=key, cfg=cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _jit_hifigan(params, latents, g, cfg):
    from .models import hifigan as _hg
    return _hg.inference(params, latents, g, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _jit_clvp_scores(params, text, codes, cfg):
    from .models import clvp as _clvp
    return _clvp.forward(params, text, codes, cfg)



def _sampling_from_knobs(ar_temp=0.8, top_k=0, top_p=1.0,
                         typical_sampling=False, typical_mass=0.9,
                         repetition_penalty=1.0, length_penalty=1.0,
                         length_penalty_factor=0.0, beam_width=1,
                         greedy=False, mirostat_tau=0.0, mirostat_eta=0.1,
                         min_temperature=0.0) -> SamplingConfig:
    """One SamplingConfig builder for all three public entry points
    (inference / batch_inference / stream) — the knob surface cannot
    drift between them (the knob-parity test pins it)."""
    return SamplingConfig(
        temperature=ar_temp, top_k=top_k, top_p=top_p,
        typical_mass=typical_mass if typical_sampling else 0.0,
        repetition_penalty=repetition_penalty,
        length_penalty=length_penalty,
        length_penalty_factor=length_penalty_factor,
        beam_width=beam_width, greedy=greedy,
        mirostat_tau=mirostat_tau, mirostat_eta=mirostat_eta,
        min_temperature=min_temperature)


def _host_keys(seed: int, n: int):
    """n independent raw PRNG keys computed on the host.

    jax.random.PRNGKey/split outside jit are each one eager dispatch
    through the remote-compile relay (~10 ms of pure latency per call on
    the axon platform); a raw (2,) uint32 array is a valid legacy
    threefry key, so derive them with numpy's SeedSequence instead."""
    ss = np.random.SeedSequence(int(seed))
    return [np.asarray(s.generate_state(2), np.uint32) for s in ss.spawn(n)]


@partial(jax.jit, static_argnames=("channels",))
def _jit_rlg_rows(params, keys, channels):
    """Batched voiceless conditioning: one RLG sample per row key.

    keys: (n, 2) uint32 raw threefry keys.  Each row draws
    normal(key, (1, channels)) — bit-identical to the single-call
    ``rlg.sample(params, key, 1, channels)`` — so batching changes the
    dispatch count, not the latents."""
    from .models import rlg as rlg_m
    return jax.vmap(
        lambda k: rlg_m.sample(params, k, 1, channels)[0])(keys)


def _key_int(key) -> int:
    """Fold a (2,) uint32 raw threefry key back into one host int."""
    k = np.asarray(key)
    return (int(k[0]) << 32) | int(k[1])


def _row_keys(key, n: int) -> np.ndarray:
    """(n, 2) per-row decode keys derived from one stage key.

    SeedSequence.spawn children are prefix-stable (child i is identical
    for any n > i), so the first C keys of a mesh-padded candidate
    fan-out equal the unpadded call's keys, and a batched row group's
    keys equal the single-call ``inference(candidates=C, seed=s)`` keys
    — the replay contract of per-row seeds."""
    return np.stack(_host_keys(_key_int(key), n))


def _stage_keys(row_seed: int):
    """The (k_ar, k_diff, k_voc) triple of a single-line call with
    ``seed=row_seed`` — one derivation shared by inference() (via
    _infer_line) and batch_inference's per-row seeds, so a batch row
    replays bit-exactly as ``inference(text, seed=row_seed)``."""
    (sub,) = _host_keys(row_seed * 1000003, 1)
    return _host_keys(_key_int(sub), 3)


class TTS:
    """User-facing inference API (reference TTS, inference.py:34-424)."""

    def __init__(self, config: Optional[Config | str | Path] = None,
                 lora=None, device=None, amp=None, dtype: Optional[str] = None,
                 attention=None, mesh=None):
        if config is None:
            # TORTOISE_YAML / TORTOISE_MODEL / TORTOISE_LORA env modes
            # (reference config.py:154-156 from_cli defaults)
            if (os.environ.get("TORTOISE_YAML")
                    or os.environ.get("TORTOISE_MODEL")
                    or os.environ.get("TORTOISE_LORA")):
                config = Config.from_cli([])
        if isinstance(config, (str, Path)):
            config = Config.load(config)
        self.cfg = config or Config()
        self.dtype = dtype or self.cfg.inference.weight_dtype
        self.tokenizer = VoiceBpeTokenizer()
        self.lora = lora
        self.cache_voice = True
        self._models = {}
        # serving mesh: batched utterances / candidate fan-out are
        # sharded over its 'data' axis (BASELINE configs #2/#3/#5)
        self.mesh = mesh

    # ------------------------------------------------------------------
    @staticmethod
    def serving_mesh(n_devices: Optional[int] = None):
        """1-D ('data',) mesh over the first n visible devices — the
        multi-chip serving layout (batch rows / candidates shard over
        'data'; every model fits one chip so no 'model' axis is needed
        at inference)."""
        from jax.sharding import Mesh
        devs = jax.devices()
        if n_devices is not None:
            devs = devs[:n_devices]
        return Mesh(np.asarray(devs), ("data",))

    def _data_sharding(self, mesh):
        from jax.sharding import NamedSharding, PartitionSpec as P
        return NamedSharding(mesh, P("data"))

    def _sharded_params(self, name: str, mesh, params=None):
        """Model params replicated onto every mesh device (cached per
        (model, mesh)).  With mesh=None returns the plain params."""
        params = self._model(name).params if params is None else params
        if mesh is None:
            return params
        from jax.sharding import NamedSharding, PartitionSpec as P
        cache = self.__dict__.setdefault("_mesh_params", {})
        key = (name, tuple(mesh.devices.flat))
        if key not in cache:
            rep = NamedSharding(mesh, P())
            cache[key] = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, rep), params)
        return cache[key]

    def _model(self, name: str):
        if name not in self._models:
            m = load_model(name, self.dtype)
            if name == "autoregressive":
                m = self._maybe_apply_lora(m)
            self._models[name] = m
        return self._models[name]

    def _ar_qgpt(self, mesh=None):
        """Cached int8 decode weights when decode_quant='int8' (weight
        only) or 'w8a8' (+ dynamic per-row activation quantization on
        the int8 MXU; see ops/pallas_gemv.qgemv_stacked_w8a8)."""
        mode = self.cfg.inference.decode_quant
        if mode not in ("int8", "w8a8"):
            return None
        if not hasattr(self, "_qgpt"):
            from .models.unified_voice import quantize_decode_weights
            ar = self._model("autoregressive")
            self._qgpt = jax.jit(quantize_decode_weights)(ar.params)
        if mesh is None:
            return self._qgpt
        return self._sharded_params("__qgpt__", mesh, params=self._qgpt)

    @property
    def _quant_mode(self) -> str:
        mode = self.cfg.inference.decode_quant
        return mode if mode in ("int8", "w8a8") else "int8"

    def _maybe_apply_lora(self, m):
        """Runtime LoRA load + merge for the AR model (reference
        inference.py:205-216 + lora_load_state_dict)."""
        lcfg = self.cfg.lora
        if lcfg is None:
            return m
        from dataclasses import replace as _dc_replace
        from .models import LoadedModel
        from .models.lora import init_lora, merge_lora
        from .engine.state import unflatten_like
        from .utils.io import load_state_dict, pick_path
        path = Path(lcfg.path) if lcfg.path else pick_path(
            self.cfg.ckpt_dir / lcfg.full_name /
            f"lora.{self.cfg.weights_format}", ".sft", ".safetensors")
        if not path.exists():
            return m
        lora = init_lora(jax.random.PRNGKey(0), m.params, rank=lcfg.rank)
        lora = unflatten_like(lora, load_state_dict(path), strict=False)
        merged = merge_lora(m.params, lora, lcfg.alpha, lcfg.rank)
        _logger.info("merged LoRA %s into autoregressive", path)
        return LoadedModel(m.name, m.module, m.config, merged, True)

    # ------------------------------------------------------------------
    def enable_lora(self, enabled: bool = True):
        """Toggle the merged LoRA adapter (reference inference.py:99-104).

        Merging is pure, so toggling just reloads the AR model with or
        without the adapter applied."""
        from .models import load_model
        self._models.pop("autoregressive", None)
        self.__dict__.pop("_qgpt", None)   # int8 cache follows the weights
        self.__dict__.pop("_mesh_params", None)  # mesh copies follow too
        if enabled:
            self._model("autoregressive")      # re-merges if cfg.lora
        else:
            self._models["autoregressive"] = load_model(
                "autoregressive", self.dtype)

    def disable_lora(self):
        return self.enable_lora(False)

    # ------------------------------------------------------------------
    def encode_text(self, text: str) -> np.ndarray:
        return np.asarray(self.tokenizer.encode(text), dtype=np.int32)

    def encode_audio(self, paths: str | Sequence[str | Path],
                     seed: Optional[int] = None):
        if isinstance(paths, str):
            paths = [Path(p) for p in paths.split(";")]
        # voice-latent cache keyed by the reference clips (the original
        # tortoise caches per-voice conditioning latents; the reference
        # re-encodes per call — set cache_voice=False for that behavior).
        # The AR-conditioning random crop is seeded for reproducibility.
        cache_key = tuple(str(p) for p in paths) if self.cache_voice \
            else (tuple(str(p) for p in paths), seed)
        if not hasattr(self, "_voice_cache"):
            self._voice_cache = {}
        if cache_key in self._voice_cache:
            return self._voice_cache[cache_key]
        rng = np.random.RandomState(seed)
        enc = emb_mel.encode_from_files(paths, dtype=self.dtype, rng=rng)
        if len(self._voice_cache) < 16:
            self._voice_cache[cache_key] = enc
        return enc

    def _diffusion_geometry(self, diffusion, n_lat_base: int,
                            diffusion_pad_multiple: int,
                            mel_pad_multiple: int, steps: int,
                            cond_free: bool, cond_free_k: float = 2.0):
        """Shared program-shape sizing for the three inference paths:
        pad the latent count to its bucket, derive the 22.05k->24k mel
        length and its MXU-aligned pad, and fetch the cached
        unconditional-integrator precompute for that shape."""
        n_lat = n_lat_base
        if diffusion_pad_multiple > 1:
            n_lat += (-n_lat) % diffusion_pad_multiple
        seq_len = n_lat * 4 * 24000 // 22050
        pad_seq_len = None
        if mel_pad_multiple > 1:
            pad_seq_len = seq_len + ((-seq_len) % mel_pad_multiple)
        uh = (self._uncond_integrated(diffusion, steps, cond_free_k,
                                      pad_seq_len or seq_len)
              if cond_free else None)
        return n_lat, seq_len, pad_seq_len, uh

    # budgets at or under this are STATIC program-shape keys (sized by
    # the budget itself, zero mid-pipeline fetches); larger budgets pay
    # one lengths fetch — keep every consumer on this one constant
    STATIC_BUDGET_MAX = 256

    @classmethod
    def _decode_budget_latents(cls, max_ar_steps: int, res_lengths,
                               upto: Optional[int] = None) -> int:
        """Small decode budgets: size programs by the budget itself
        (zero mid-pipeline fetches).  Large budgets: spend ONE cheap
        lengths fetch (~55 ms) so a short utterance doesn't pay for a
        max_ar_steps-sized diffusion.  ``upto`` restricts the fetch to
        the REAL rows (mesh-padding rows never emit stop, so they always
        report the full budget)."""
        if max_ar_steps <= cls.STATIC_BUDGET_MAX:
            return max_ar_steps
        arr = np.asarray(res_lengths)
        if upto is not None:
            arr = arr[:upto]
        return min(int(arr.max()) + 1, max_ar_steps)

    def _uncond_integrated(self, diffusion, steps: int,
                           cond_free_k: float, T: int):
        """Cached per-(steps, k, T) unconditional-branch integrator
        precompute (see _jit_uncond_integrate) — ~100 MB device-resident
        per shape at production sizes, so keep only a few."""
        key = (steps, float(cond_free_k), T)
        if not hasattr(self, "_uncond_cache"):
            self._uncond_cache = {}
        if key not in self._uncond_cache:
            if len(self._uncond_cache) >= 4:
                self._uncond_cache.pop(next(iter(self._uncond_cache)))
            self._uncond_cache[key] = _jit_uncond_integrate(
                diffusion.params, diffusion.config, steps, cond_free_k, T)
        return self._uncond_cache[key]

    def _bucket_text(self, tokens: np.ndarray) -> np.ndarray:
        buckets = self.cfg.inference.text_buckets
        n = tokens.shape[-1]
        for b in buckets:
            if n <= b:
                return np.pad(tokens, (0, b - n))
        return tokens[:buckets[-1]]

    # ------------------------------------------------------------------
    def inference(
        self,
        text: str,
        references: Optional[str | Sequence[str | Path]] = None,
        max_ar_steps: int = 500,
        max_diffusion_steps: int = 80,
        ar_temp: float = 0.8,
        diffusion_temp: float = 1.0,
        top_p: float = 1.0,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
        length_penalty: float = 1.0,
        length_penalty_factor: float = 0.0,
        beam_width: int = 1,
        typical_sampling: bool = False,
        typical_mass: float = 0.9,
        diffusion_sampler: str = "ddim",
        cond_free: bool = True,
        vocoder_type: str = "bigvgan",
        candidates: int = 1,
        seed: Optional[int] = None,
        out_path: Optional[str | Path] = None,
        diffusion_pad_multiple: int = 0,
        mel_pad_multiple: int = 0,
        mirostat_tau: float = 0.0,
        mirostat_eta: float = 0.1,
        min_temperature: float = 0.0,
        greedy: bool = False,
        conditioning_latents: Optional[Tuple] = None,
    ) -> Tuple[np.ndarray, int]:
        """Full pipeline; returns (wav float32 (T,), 24000).

        ``conditioning_latents``: explicit (ar_latent (1, 1024),
        diff_latent (1, 2048)) pair, bypassing reference encoding — used
        by training eval to condition on the eval sample's own latents
        (reference train.py:99-213)."""
        seed = int(time.time()) if seed is None else seed
        sr = 24_000

        ar = self._model("autoregressive")
        # conditioning latents
        if conditioning_latents is not None:
            ar_latent, diff_latent = conditioning_latents
            ar_latent = np.atleast_2d(np.asarray(ar_latent))
            diff_latent = np.atleast_2d(np.asarray(diff_latent))
        elif references is not None:
            enc = self.encode_audio(references, seed=seed)
            ar_latent, diff_latent = enc["latent"]
        else:
            # voice-less generation via random-latent converters
            # (models/__init__.py:97-103 rlg_auto / rlg_diffuser)
            from .models import rlg as rlg_m
            k1, k2 = _host_keys(seed ^ 0x5F3C, 2)
            rga = self._model("rlg_auto")
            rgd = self._model("rlg_diffuser")
            ar_latent = rlg_m.sample(rga.params, k1, 1, int(rga.config))
            diff_latent = rlg_m.sample(rgd.params, k2, 1, int(rgd.config))

        sampling = _sampling_from_knobs(
            ar_temp=ar_temp, top_k=top_k, top_p=top_p,
            typical_sampling=typical_sampling, typical_mass=typical_mass,
            repetition_penalty=repetition_penalty,
            length_penalty=length_penalty,
            length_penalty_factor=length_penalty_factor,
            beam_width=beam_width, greedy=greedy,
            mirostat_tau=mirostat_tau, mirostat_eta=mirostat_eta,
            min_temperature=min_temperature)

        wavs = []
        for i, line in enumerate(text.split("\n")):
            if not line.strip():
                continue
            (sub,) = _host_keys(seed * 1000003 + i, 1)
            if vocoder_type == "hifigan":
                chunks = list(self._stream_line(
                    line, ar_latent, sampling, max_ar_steps, sub))
                wav = np.concatenate(chunks, axis=-1)
            else:
                wav = self._infer_line(
                    line, ar_latent, diff_latent, sampling, max_ar_steps,
                    max_diffusion_steps, diffusion_temp, diffusion_sampler,
                    cond_free, vocoder_type, candidates, sub,
                    diffusion_pad_multiple, mel_pad_multiple,
                    defer_fetch=True)
            wavs.append(wav)

        # fetch AFTER every line's programs are dispatched: line i+1's
        # device compute overlaps line i's host fetch
        wavs = [self._unpack_wav(np.asarray(w))
                if not isinstance(w, np.ndarray) else w for w in wavs]
        wav = np.concatenate(wavs, axis=-1)
        if out_path is not None:
            write_wav(out_path, wav, sr)
        return wav, sr

    # ------------------------------------------------------------------
    def _encode_voice_rows(self, references, voices, texts, row_seeds):
        """Per-row conditioning latents for batched serving.

        ``references`` keeps the round-3 single-voice semantics
        unchanged: a str of ";"-joined clip paths OR a sequence of clip
        paths, all describing ONE voice broadcast to every row.

        ``voices`` is the EXPLICIT per-row argument (one entry per
        text; each entry: None for voiceless RLG conditioning, a str of
        ";"-joined clip paths, or a sequence of clip paths).  A
        separate parameter — not an overload of ``references`` — so a
        list of N clips for one voice can never be silently reread as N
        per-row voices.  Each distinct voice is encoded once (the voice
        cache) and its latents stacked row-wise, matching the
        reference's per-call ``references`` conditioning
        (inference.py:142, 220-235) at batch scale.

        Returns (ar_rows (B, Da), diff_rows (B, Dd) or (1, Dd) when a
        single voice is shared)."""
        b = len(texts)

        def one(ref, row):
            if ref is None:
                # voiceless RLG conditioning seeded exactly like the
                # single call with seed=row_seeds[row] (inference():
                # _host_keys(seed ^ 0x5F3C, 2)) — the per-row replay
                # contract covers voiceless rows too
                from .models import rlg as rlg_m
                k1, k2 = _host_keys(row_seeds[row] ^ 0x5F3C, 2)
                rga = self._model("rlg_auto")
                rgd = self._model("rlg_diffuser")
                return (np.asarray(rlg_m.sample(rga.params, k1, 1,
                                                int(rga.config))),
                        np.asarray(rlg_m.sample(rgd.params, k2, 1,
                                                int(rgd.config))))
            enc = self.encode_audio(ref, seed=row_seeds[row])
            a, d = enc["latent"]
            return np.asarray(a), np.asarray(d)

        if voices is None:
            if references is None:
                # default voiceless batch: PER-ROW random voices (each
                # row's RLG draw from its own seed), so the per-row
                # replay contract holds for the default call too — a
                # single shared random voice would derive from row 0's
                # seed and make rows 1.. irreproducible as single calls
                voices = [None] * b
            else:
                # ONE shared voice (round-3 semantics): encoded once
                # with row 0's seed.  Replay note: single-call replay
                # of row r re-encodes with seeds[r]; the voice-latent
                # cache (cache_voice=True, seed-independent key) makes
                # the latents identical within a process — for exact
                # cross-process replay pass per-row ``voices`` or
                # explicit conditioning_latents.
                a, d = one(references, 0)
                return (np.broadcast_to(a, (b, a.shape[-1])),
                        d.reshape(1, -1))
        if references is not None:
            raise ValueError("pass either references (one voice) or "
                             "voices (one entry per row), not both")
        if len(voices) != b:
            raise ValueError(f"voices has {len(voices)} entries for "
                             f"{b} texts")
        rows: list = [None] * b
        none_idx = [i for i, r in enumerate(voices) if r is None]
        if none_idx:
            # ALL voiceless rows in one vmapped sample per RLG model —
            # the per-row host loop is 2 eager dispatches + 2 blocking
            # ~50-100 ms relay fetches PER ROW (a 16-row voiceless
            # batch paid ~2-5 s of serialized latency before the AR
            # stage).  vmap draws normal(key, (1, C)) from each row's
            # own key exactly like the single call, so the latents are
            # bit-identical and the replay contract is unchanged.
            rga = self._model("rlg_auto")
            rgd = self._model("rlg_diffuser")
            pairs = [_host_keys(row_seeds[i] ^ 0x5F3C, 2)
                     for i in none_idx]
            a_all, d_all = jax.device_get((
                _jit_rlg_rows(rga.params,
                              jnp.asarray(np.stack([p[0] for p in pairs])),
                              int(rga.config)),
                _jit_rlg_rows(rgd.params,
                              jnp.asarray(np.stack([p[1] for p in pairs])),
                              int(rgd.config))))
            for j, i in enumerate(none_idx):
                rows[i] = (np.asarray(a_all[j:j + 1]),
                           np.asarray(d_all[j:j + 1]))
        for i, r in enumerate(voices):
            if r is not None:
                rows[i] = one(r, i)
        return (np.concatenate([a for a, _ in rows], axis=0),
                np.concatenate([d for _, d in rows], axis=0))

    def batch_inference(
        self,
        texts: Sequence[str],
        references: Optional[str | Sequence] = None,
        voices: Optional[Sequence] = None,
        max_ar_steps: int = 500,
        max_diffusion_steps: int = 80,
        ar_temp: float = 0.8,
        diffusion_temp: float = 1.0,
        top_p: float = 1.0,
        top_k: int = 0,
        repetition_penalty: float = 1.0,
        length_penalty: float = 1.0,
        length_penalty_factor: float = 0.0,
        beam_width: int = 1,
        typical_sampling: bool = False,
        typical_mass: float = 0.9,
        mirostat_tau: float = 0.0,
        mirostat_eta: float = 0.1,
        min_temperature: float = 0.0,
        greedy: bool = False,
        candidates: int = 1,
        diffusion_sampler: str = "ddim",
        cond_free: bool = True,
        vocoder_type: str = "bigvgan",
        seed: Optional[int] = None,
        seeds: Optional[Sequence[int]] = None,
        diffusion_pad_multiple: int = 32,
        mel_pad_multiple: int = 0,
        mesh=None,
        row_buckets: bool = True,
        fetch: str = "sync",
    ) -> Tuple[list, int]:
        """Batched multi-utterance inference (one jitted program per
        stage over the whole batch) — the product path for BASELINE
        configs #2 (batch throughput) and #5 (multi-chip serving).

        ``fetch="async"``: return ``(finalize, sr)`` where
        ``finalize()`` performs the device->host wav transfer and
        returns the row list.  Through the remote relay the int16
        payload transfer is a large fraction of per-call wall (~1.1 s
        for a 8x9 s batch — DESIGN.md round-4 split); a serving loop
        overlaps call i's transfer (worker thread) with call i+1's
        dispatch/compute and sustains the compute-bound rate.

        The full per-call knob surface of ``inference()`` applies per
        batch: sampling warpers (temperature/top-k/top-p/typical/
        mirostat/penalties), ``beam_width`` (HF beam_sample over every
        row), and ``candidates`` (per-row fan-out: each row decodes N
        candidates and keeps its own CLVP-reranked winner —
        reference inference.py:392-396 batched).  ``references`` is ONE
        voice (str or clip sequence — round-3 semantics unchanged);
        ``voices`` conditions each row on its own voice (see
        ``_encode_voice_rows``).

        **Per-row seeds** (reference inference.py:142, 157-160 per-call
        ``seed`` at batch scale): row r draws every sample — AR tokens,
        candidate fan-out, diffusion noise, vocoder noise — from keys
        derived from its OWN seed, ``seeds[r]`` (default ``seed + r``),
        so any production row replays as
        ``inference(texts[r], seed=seeds[r], ...)`` with the same voice
        conditioning and knobs.  The replay is bit-exact when the row's
        diffusion length padding matches the single call's —
        always with ``row_buckets=False`` (pinned by
        tests/test_sharded_inference.py::test_batch_row_matches_single_call);
        with the default ``row_buckets=True`` a row may ride a
        different ladder rung T than the single call's padded length,
        and since diffusion noise bits are a function of the whole
        (100, T) array shape, its audio then differs within sampling
        noise (the AR tokens, candidate set and CLVP winner are
        T-independent and replay exactly either way).
        Voice conditioning and replay: per-row ``voices`` entries (or
        the default voiceless per-row RLG) are derived from each row's
        own seed — replay-exact.  A shared ``references`` voice is
        encoded ONCE with row 0's seed; the voice-latent cache
        (seed-independent key) makes single-call replays identical
        within a process, but exact cross-process replay of a shared
        voice should pass explicit ``conditioning_latents`` or per-row
        ``voices``.

        ``mesh`` (or ``TTS(mesh=...)``): a ('data',) jax.sharding.Mesh —
        rows are device_put sharded over 'data' and every stage runs
        SPMD via GSPMD (the batch is padded to a multiple of the axis
        size).  Matches the reference's batched entry
        (inference.py:142-237) scaled over chips instead of one CUDA
        stream.

        ``row_buckets``: after the AR decode, spend ONE ~50-100 ms relay
        fetch on the per-row trim points and run diffusion+vocoder per
        length bucket (geometric ladder of diffusion_pad_multiple·2^k)
        instead of every row paying the longest row's T — the
        shared-max sizing was the r2 batch-throughput gap.  Bucket row
        counts are padded to powers of two (and the mesh axis) so
        steady-state serving stays within a handful of compiled shapes.

        Returns (list of per-row float32 wavs, 24000)."""
        seed = int(time.time()) if seed is None else seed
        sr = 24_000
        mesh = mesh if mesh is not None else self.mesh
        nshard = int(mesh.shape["data"]) if mesh is not None else 1
        timing = os.environ.get("TTS_STAGE_TIMING") == "1"
        t_wall = [time.perf_counter()]

        def tick(name, out=None):
            if not timing:
                return
            if out is not None:
                np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
            now = time.perf_counter()
            _logger.info("batch stage %-14s %.3f s", name, now - t_wall[0])
            t_wall[0] = now

        ar = self._model("autoregressive")
        diffusion = self._model("diffusion")

        b = len(texts)
        if any("\n" in t.strip() for t in texts):
            # inference() splits lines and keys each line separately;
            # a silent single-line encode here would break the per-row
            # replay contract for multi-line rows
            raise ValueError(
                "batch_inference rows are single utterances; split "
                "multi-line texts into rows (or use inference() for "
                "line-split synthesis)")
        if seeds is not None and len(seeds) != b:
            raise ValueError(f"seeds has {len(seeds)} entries for "
                             f"{b} texts")
        row_seeds = ([int(s) for s in seeds] if seeds is not None
                     else [seed + r for r in range(b)])
        ar_rows, diff_rows = self._encode_voice_rows(references, voices,
                                                     texts, row_seeds)
        bp = b + (-b) % nshard                 # pad rows to the mesh axis
        C = max(1, candidates) if beam_width <= 1 else 1
        toks = [self.encode_text(t) for t in texts]
        bucket = self._bucket_text(max(toks, key=len)).shape[-1]
        tokens = np.stack([np.pad(t[:bucket], (0, bucket - len(t[:bucket])))
                           for t in toks]
                          + [np.zeros((bucket,), np.int32)] * (bp - b))
        lengths = np.asarray([min(len(t), bucket) for t in toks]
                             + [1] * (bp - b))
        lat = np.concatenate(
            [ar_rows.astype(np.float32),
             np.repeat(ar_rows[:1], bp - b, axis=0).astype(np.float32)],
            axis=0)                                          # (bp, Da)
        if diff_rows.shape[0] > 1:
            diff_cond = np.concatenate(
                [diff_rows, np.repeat(diff_rows[:1], bp - b, axis=0)],
                axis=0).astype(np.float32)                   # (bp, Dd)
        else:
            diff_cond = diff_rows.astype(np.float32)         # (1, Dd)
        g_tokens, g_lengths, g_lat = tokens, lengths, lat  # pre-fan-out
        if C > 1:
            # per-row candidate fan-out: row-major groups of C
            tokens = np.repeat(tokens, C, axis=0)
            lengths = np.repeat(lengths, C, axis=0)
            lat = np.repeat(lat, C, axis=0)
        sampling = _sampling_from_knobs(
            ar_temp=ar_temp, top_k=top_k, top_p=top_p,
            typical_sampling=typical_sampling, typical_mass=typical_mass,
            repetition_penalty=repetition_penalty,
            length_penalty=length_penalty,
            length_penalty_factor=length_penalty_factor,
            beam_width=beam_width, greedy=greedy,
            mirostat_tau=mirostat_tau, mirostat_eta=mirostat_eta,
            min_temperature=min_temperature)
        # per-row stage keys: row r's (k_ar, k_diff, k_voc) are exactly
        # the single-call triple for seed row_seeds[r] (_stage_keys);
        # candidate row (r, c) gets the same prefix-stable spawn child
        # as inference(candidates=C, seed=row_seeds[r]) (_row_keys).
        # Mesh-padding rows reuse row 0's keys (their output is sliced
        # off).  The beam path keeps one batch key (beam frontier
        # semantics are whole-batch; derived from row 0's seed).
        trips = [_stage_keys(s) for s in row_seeds]
        trips += [trips[0]] * (bp - b)
        ar_keys = np.concatenate(
            [_row_keys(t[0], C) for t in trips], axis=0)     # (bp*C, 2)
        diff_keys = np.stack([t[1] for t in trips])          # (bp, 2)
        voc_keys = np.stack([t[2] for t in trips])           # (bp, 2)

        ar_params = self._sharded_params("autoregressive", mesh,
                                         params=ar.params)
        if mesh is not None:
            ds = self._data_sharding(mesh)
            tokens = jax.device_put(tokens, ds)
            lengths = jax.device_put(lengths, ds)
            lat = jax.device_put(np.ascontiguousarray(lat), ds)
            ar_keys = jax.device_put(np.ascontiguousarray(ar_keys), ds)

        if beam_width > 1:
            # HF beam_sample over every row (processor stack included);
            # candidates are a sampling-mode feature, like generate()
            res = inference_speech_beam(
                ar_params, lat, jnp.asarray(tokens), jnp.asarray(lengths),
                ar.config, num_beams=beam_width, max_length=max_ar_steps,
                sampling=sampling, key=trips[0][0], do_sample=not greedy)
        elif (C > 1 and mesh is None
              and os.environ.get("TTS_DECODE_SHARED_PREFIX", "1") != "0"
              and os.environ.get("TTS_DECODE_PACKKV", "0") != "1"
              and os.environ.get("TTS_FLASH_DECODE", "0") != "1"):
            # grouped shared-prefix decode: each row's C candidates
            # share that row's prefill K/V, stored once per group
            # outside the decode carry (see _mha_shared; same win as
            # the single-call candidates path, chip A/B +19%).  Keys
            # stay the (bp*C, 2) per-row schedule, so candidates match
            # the fan-out decode draw for draw.
            res = inference_speech_shared(
                ar_params, jnp.asarray(g_lat), jnp.asarray(g_tokens),
                jnp.asarray(g_lengths), jnp.asarray(ar_keys), rows=C,
                cfg=ar.config, sampling=sampling,
                max_length=max_ar_steps, qgpt=self._ar_qgpt(mesh),
                quant_mode=self._quant_mode)
        else:
            res = inference_speech(ar_params, lat, jnp.asarray(tokens),
                                   jnp.asarray(lengths), ar_keys,
                                   ar.config,
                                   sampling, max_length=max_ar_steps,
                                   qgpt=self._ar_qgpt(mesh),
                                   quant_mode=self._quant_mode)
        tick("ar_decode", res.codes)
        # Device-resident handoff: cleanup + per-row calm trim + latent
        # pass in one program (every relay fetch is a ~50-100 ms round
        # trip; the host path would fetch codes AND lengths first).
        if C > 1:
            clvp = self._model("clvp")
            cparams = self._sharded_params("clvp", mesh,
                                           params=clvp.params)
            latents, t_lat, _best = _jit_rerank_latents(
                ar_params, cparams, lat, tokens, lengths, res.codes,
                res.lengths, ar.config, clvp.config, ncand=C,
                n_real=b * C)
        else:
            latents, t_lat = _jit_cleanup_latents(
                ar_params, lat, tokens, lengths, res.codes, res.lengths,
                ar.config)
        tick("latent_pass", latents)

        dparams = self._sharded_params("diffusion", mesh,
                                       params=diffusion.params)
        voc_name = "bigvgan" if vocoder_type == "bigvgan" else "vocoder"
        voc = self._model(voc_name)
        vparams = self._sharded_params(voc_name, mesh, params=voc.params)
        # (bp, Dd) per-row voices or (1, Dd) shared — _jit_diffusion
        # gathers/broadcasts rows in-graph

        if row_buckets:
            # ONE fetch: per-row trim points size the diffusion work
            t_np = np.asarray(jax.device_get(t_lat)).astype(np.int64)
            tick("t_lat_fetch")
            budget = max(int(t_np[:b].max()), 1)
            mult = max(diffusion_pad_multiple, 1)

            # n_lat ladder: geometric (mult * 2^k) below, REFINED near
            # the budget — denoiser time scales ~linearly with the
            # padded T, and sampled rows concentrate just under the AR
            # budget, so the pow2 ladder's last jump (128 -> budget=200,
            # i.e. T 576 -> 896) put EVERY row in the top bucket
            # (chip-measured round 4: the diffusion+vocoder compute is
            # 2.16 of the 2.65 s batch-8 wall).  Extra rungs sit at the
            # max n_lat of each padded-T plateau below the budget's, so
            # each rung is a distinct denoiser shape that actually
            # saves a T tile; shape count grows by <= 3 (compile-cached)
            def _t_pad(n):
                t = n * 4 * 24000 // 22050
                if mel_pad_multiple > 1:
                    t += (-t) % mel_pad_multiple
                return t

            rungs = {budget}
            n = mult
            while n < budget:
                rungs.add(n)
                n *= 2
            if mel_pad_multiple > 1:
                for k in range(1, 4):
                    t_r = _t_pad(budget) - k * mel_pad_multiple
                    if t_r <= 0:
                        break
                    cand = min(int(t_r * 22050 // 96000) + 2, budget)
                    while cand > 0 and _t_pad(cand) > t_r:
                        cand -= 1
                    if cand >= mult:
                        rungs.add(cand)
            srungs = sorted(rungs)

            def ladder(t):
                t = min(t, budget)
                for r in srungs:
                    if r >= t:
                        return r
                return budget

            # bucket only the REAL rows: mesh-padding rows decode to the
            # full budget (they never emit stop) and would otherwise
            # drag garbage rows through the largest diffusion bucket
            n_lats = np.asarray([ladder(max(int(t), 1))
                                 for t in t_np[:b]])
            # anti-fragmentation: a denoiser dispatch has a large fixed
            # cost (weight streaming + cond-free doubling), so a bucket
            # of 1-2 rows costs more than riding the next rung up when
            # that rung's T is close (the refined plateau rungs are one
            # 128-tile apart).  Promote small buckets upward while each
            # row's CUMULATIVE T growth vs its original rung stays
            # <= 25% (a cascade through several adjacent rungs would
            # otherwise compound to ~1.25^k); never demote.
            orig_pad = np.asarray([_t_pad(int(n)) for n in n_lats],
                                  np.int64)
            occupied = sorted(set(n_lats.tolist()))
            for ri, r in enumerate(occupied[:-1]):
                here = n_lats == r
                rows_here = int(here.sum())
                nxt = occupied[ri + 1]
                if (rows_here < 3 and rows_here > 0
                        and _t_pad(nxt) <= 1.25 * orig_pad[here].min()):
                    n_lats[here] = nxt
            # cap rows per diffusion dispatch: the denoiser's sweet spot
            # is 8 rows (cond-free B=16 — 16.1 ms/step with the VT
            # kernel); one B=32 program measures WORSE than two B=16
            # (batch-16 bench 24.2 vs batch-8 26.7 audio-s/s), so larger
            # batches pipeline through several dispatches instead
            cap_rows = max(nshard, 8)
            pending = []          # (rows, wav_handle, kind)
            chunks = []
            for n_lat in sorted(set(n_lats.tolist())):
                rows_all = np.nonzero(n_lats == n_lat)[0]
                chunks += [(n_lat, rows_all[i:i + cap_rows])
                           for i in range(0, len(rows_all), cap_rows)]
            if timing:
                _logger.info("batch row t_lat %s -> buckets %s",
                             t_np[:b].tolist(),
                             [(n, len(r)) for n, r in chunks])
            for n_lat, rows in chunks:
                k = len(rows)
                kp = max(nshard, 1 << (k - 1).bit_length())  # pow2 pad
                rows_p = np.concatenate(
                    [rows, np.repeat(rows[:1], kp - k)]).astype(np.int32)
                seq_len = n_lat * 4 * 24000 // 22050
                pad_seq_len = None
                if mel_pad_multiple > 1:
                    pad_seq_len = seq_len + ((-seq_len) % mel_pad_multiple)
                uh = (self._uncond_integrated(
                    diffusion, max_diffusion_steps, 2.0,
                    pad_seq_len or seq_len) if cond_free else None)
                mel = _jit_diffusion(
                    dparams, latents, diff_cond, diff_keys,
                    diffusion.config, max_diffusion_steps,
                    diffusion_sampler, seq_len, cond_free, diffusion_temp,
                    n_lat=n_lat, t_lat=t_lat, pad_seq_len=pad_seq_len,
                    uncond_h=uh, rows=rows_p)
                if vocoder_type == "bigvgan":
                    wav = _jit_bigvgan(vparams, mel, voc.config,
                                       as_i16=True)
                    pending.append((rows[:k], wav, "i16"))
                else:
                    wav = _jit_univnet(vparams, mel, voc_keys[rows_p],
                                       voc.config)
                    pending.append((rows[:k], wav, "f32"))
            tick("diffusion+voc dispatch")

            def finalize():
                out = [None] * bp
                fetch_sum = os.environ.get("TTS_FETCH_SUM") == "1"
                if fetch_sum:
                    # perf instrument: sync the COMPUTE with a scalar
                    # fetch and skip the wav payload — isolates device
                    # time from the relay's D2H transfer.  Loud on every
                    # call: a stray env var in a serving process would
                    # otherwise return silent all-zero audio
                    _logger.warning(
                        "TTS_FETCH_SUM=1: batch_inference returning "
                        "ZERO audio (perf instrumentation mode)")
                    for rows, wav, kind in pending:
                        float(jnp.sum(wav.astype(jnp.float32)))
                        for r in rows:
                            n = int(t_np[r] * 4 * 24000 // 22050) * 256
                            out[r] = np.zeros((n,), np.float32)
                    tick("fetch")
                    return out[:b]
                # pow2 row padding: don't pay relay transfer for the
                # duplicate rows — slice them off on device; then start
                # EVERY bucket's device->host copy before blocking on
                # the first, so later buckets' transfers ride the relay
                # while earlier ones are unpacked
                trimmed = []
                for rows, wav, kind in pending:
                    if wav.shape[0] > len(rows):
                        wav = wav[:len(rows)]
                    try:
                        wav.copy_to_host_async()
                    except Exception:  # platform without async copy
                        pass
                    trimmed.append((rows, wav, kind))
                for rows, wav, kind in trimmed:
                    arr = np.asarray(wav)
                    for j, r in enumerate(rows):
                        n = int(t_np[r] * 4 * 24000 // 22050) * 256
                        w = arr[j, 0, :n]
                        out[r] = (w.astype(np.float32) / 32767.0
                                  if kind == "i16" else w)
                tick("fetch")
                return out[:b]

            if fetch == "async":
                return finalize, sr
            return finalize(), sr

        # single shared-max program (zero mid-pipeline fetches): sized
        # by the decode budget — every row pays the longest REAL row's T
        # (mesh-padding rows never emit stop and would report the full
        # budget, defeating the lengths-based sizing)
        n_lat, seq_len, pad_seq_len, uh = self._diffusion_geometry(
            diffusion, self._decode_budget_latents(max_ar_steps,
                                                   res.lengths,
                                                   upto=b * C),
            diffusion_pad_multiple, mel_pad_multiple,
            max_diffusion_steps, cond_free)
        mel = _jit_diffusion(
            dparams, latents, diff_cond,
            diff_keys, diffusion.config, max_diffusion_steps,
            diffusion_sampler, seq_len, cond_free, diffusion_temp,
            n_lat=n_lat, t_lat=t_lat, pad_seq_len=pad_seq_len,
            uncond_h=uh)
        if vocoder_type == "bigvgan":
            dwav = _jit_bigvgan(vparams, mel, voc.config,
                                as_i16=True, prefix=t_lat)
        else:
            dwav = _jit_univnet(vparams, mel, voc_keys, voc.config)

        def finalize():
            if vocoder_type == "bigvgan":
                arr = np.asarray(dwav)
                row_lengths = arr[:, 0, 0].astype(np.int64)
                wavs = arr[..., 1:].astype(np.float32) / 32767.0
            else:
                row_lengths = np.asarray(t_lat).astype(np.int64)
                wavs = np.asarray(dwav)
            # trim each row to its own generated length
            out = []
            for i in range(b):
                n = int(row_lengths[i] * 4 * 24000 // 22050) * 256
                out.append(wavs[i, 0, :n])
            return out

        if fetch == "async":
            return finalize, sr
        return finalize(), sr

    # ------------------------------------------------------------------
    def _decode_codes(self, line: str, ar_latent, sampling: SamplingConfig,
                      max_ar_steps: int, key, candidates: int = 1,
                      collect_latents: bool = False) -> DecodeResult:
        ar = self._model("autoregressive")
        toks = self.encode_text(line)
        tokens = self._bucket_text(toks)[None]
        mesh = self.mesh
        nrows = candidates
        if mesh is not None and candidates > 1:
            # pad the fan-out to the data axis (extra rows are decoded
            # but excluded from the rerank) instead of silently running
            # unsharded when candidates % axis != 0
            ax = int(mesh.shape["data"])
            nrows = candidates + (-candidates) % ax
            if nrows != candidates:
                _logger.warning(
                    "candidates=%d padded to %d decode rows to shard "
                    "over the %d-way 'data' axis (pad rows are ignored "
                    "by the rerank)", candidates, nrows, ax)
        if nrows > 1:
            tokens = np.repeat(tokens, nrows, axis=0)
        lengths = np.minimum(
            np.full((tokens.shape[0],), len(toks)), tokens.shape[1])
        # host-side broadcast: a jnp.broadcast_to here is an eager
        # dispatch through the remote relay
        lat = np.broadcast_to(np.asarray(ar_latent),
                              (tokens.shape[0],
                               np.asarray(ar_latent).shape[-1]))
        # per-row decode keys (prefix-stable spawn of the call's k_ar):
        # candidate row c's stream is a function of (k_ar, c) only, so
        # the batched-serving fan-out with the same seed draws the same
        # candidates (see _row_keys); the beam path keeps the single
        # call key (one stream drives the whole beam frontier)
        if sampling.beam_width <= 1:
            key = _row_keys(key, tokens.shape[0])
        # candidate fan-out over the serving mesh (BASELINE config #3:
        # N candidates sharded over the 'data' axis, CLVP-reranked)
        ar_params = ar.params
        if mesh is not None and candidates > 1:
            ds = self._data_sharding(mesh)
            tokens = jax.device_put(tokens, ds)
            lengths = jax.device_put(lengths, ds)
            lat = jax.device_put(np.ascontiguousarray(lat), ds)
            if sampling.beam_width <= 1:
                key = jax.device_put(np.ascontiguousarray(key), ds)
            ar_params = self._sharded_params("autoregressive", mesh)
        if sampling.beam_width > 1:
            # the reference always generates with do_sample=True, so
            # beam_width>1 is HF beam_sample with the full processor
            # stack (inference.py:330-345); greedy=True falls back to
            # deterministic beam search
            res = inference_speech_beam(
                ar_params, lat, jnp.asarray(tokens), jnp.asarray(lengths),
                ar.config, num_beams=sampling.beam_width,
                max_length=max_ar_steps, sampling=sampling, key=key,
                do_sample=not sampling.greedy)
            return res, tokens, lengths
        qmesh = mesh if ar_params is not ar.params else None
        if (candidates > 1 and mesh is None
                and os.environ.get("TTS_DECODE_SHARED_PREFIX", "1") != "0"
                and os.environ.get("TTS_DECODE_PACKKV", "0") != "1"
                and os.environ.get("TTS_FLASH_DECODE", "0") != "1"):
            # candidate rows share one [cond‖text] prefill: store its K/V
            # once (B=1) outside the decode carry so each step streams the
            # prefix once instead of `candidates` times (the fan-out
            # decode is attention-read-bound — see _mha_shared).  Keys
            # are the same per-row _row_keys streams, so candidates match
            # the fan-out path draw for draw (token-exact + wav-bit-exact
            # tested).  Chip A/B (same session, candidates-16 bench):
            # 10.45x vs 8.75x RTF — DEFAULT ON for the unsharded fan-out;
            # TTS_DECODE_SHARED_PREFIX=0 reverts.
            res = inference_speech_shared(
                ar_params, lat[:1], jnp.asarray(tokens[:1]),
                jnp.asarray(lengths[:1]), key, rows=nrows,
                cfg=ar.config, sampling=sampling, max_length=max_ar_steps,
                collect_latents=collect_latents, qgpt=self._ar_qgpt(qmesh),
                quant_mode=self._quant_mode)
            return res, tokens, lengths
        return inference_speech(
            ar_params, lat, jnp.asarray(tokens), jnp.asarray(lengths), key,
            ar.config, sampling, max_length=max_ar_steps,
            collect_latents=collect_latents,
            qgpt=self._ar_qgpt(qmesh),
            quant_mode=self._quant_mode), tokens, lengths

    @staticmethod
    def cleanup_codes(codes: np.ndarray, lengths: np.ndarray,
                      stop_token: int = 8193) -> np.ndarray:
        """Stop-token cleanup (inference.py:353-366): stops -> calm token,
        everything past the first stop -> calm, last 3 -> fixed tail."""
        L = min(int(lengths.max()) + 1, codes.shape[1])
        codes = np.array(codes[:, :L])
        for i in range(codes.shape[0]):
            stops = np.nonzero(codes[i] == stop_token)[0]
            if len(stops) == 0:
                continue
            stm = int(stops.min())
            codes[i][stops] = CALM_TOKEN
            codes[i][stm:] = CALM_TOKEN
            # rows shorter than the tail (stop at step 0/1) take what fits
            t = min(3, codes.shape[1])
            codes[i][-t:] = np.asarray(TAIL_TOKENS)[3 - t:]
        return codes

    @staticmethod
    def trim_latents_at_calm(codes_row: np.ndarray, latents: np.ndarray,
                             breathing_room: int = 8) -> np.ndarray:
        """Trim latents where >8 consecutive calm tokens begin
        (inference.py:381-389)."""
        k = TTS.calm_trim_point(codes_row, latents.shape[1],
                                breathing_room)
        return latents[:, :k]

    @staticmethod
    def calm_trim_point(codes_row: np.ndarray, upto: int,
                        breathing_room: int = 8) -> int:
        """First index where >8 consecutive calm tokens begin
        (inference.py:381-389), else `upto`."""
        calm = 0
        for k in range(min(codes_row.shape[-1], upto)):
            calm = calm + 1 if int(codes_row[k]) == CALM_TOKEN else 0
            if calm > breathing_room:
                return k
        return upto

    @staticmethod
    def _unpack_wav(arr: np.ndarray) -> np.ndarray:
        """Host side of the packed-int16 payload: [0,0,0] is the
        device-computed calm trim point, the rest is 16-bit PCM."""
        t_lat = int(arr[0, 0, 0])
        exact_seq_len = t_lat * 4 * 24000 // 22050
        return arr[0, 0, 1:1 + exact_seq_len * 256].astype(
            np.float32) / 32767.0

    def _infer_line(self, line, ar_latent, diff_latent, sampling,
                    max_ar_steps, max_diffusion_steps, diffusion_temp,
                    diffusion_sampler, cond_free, vocoder_type, candidates,
                    key, diffusion_pad_multiple,
                    mel_pad_multiple: int = 0, defer_fetch: bool = False):
        timing = os.environ.get("TTS_STAGE_TIMING") == "1"

        def tick(name, out=None):
            if not timing:
                return
            if out is not None:   # force completion of this stage
                np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
            now = time.perf_counter()
            _logger.info("stage %-12s %.3f s", name, now - tick.t0)
            tick.t0 = now
        tick.t0 = time.perf_counter()

        ar = self._model("autoregressive")
        diffusion = self._model("diffusion")
        # the (k_ar, k_diff, k_voc) triple of _stage_keys(seed) — key
        # is the line's spawn child of the call seed
        k_ar, k_diff, k_voc = _host_keys(_key_int(key), 3)

        res, tokens, text_lengths = self._decode_codes(
            line, ar_latent, sampling, max_ar_steps, k_ar,
            candidates=candidates)

        # Single-fetch device-resident path for the BigVGAN route: the
        # ONLY device->host transfer of the whole utterance is the
        # final packed wav (each relay fetch costs ~50-100 ms; the host
        # path below does three+).  Cleanup, calm trim, CLVP rerank
        # (for candidates>1), latent pass, diffusion and vocoding all
        # stay on device; the trim point rides inside the wav payload.
        if (vocoder_type == "bigvgan"
                and os.environ.get("TTS_HOST_TRIM") != "1"):
            tick("ar_decode")
            nrows = np.asarray(tokens).shape[0] if candidates > 1 else 1
            lat_b = np.broadcast_to(
                np.asarray(ar_latent),
                (nrows, np.asarray(ar_latent).shape[-1]))
            if candidates > 1:
                clvp = self._model("clvp")
                cmesh = self.mesh
                cparams = self._sharded_params("clvp", cmesh,
                                               params=clvp.params) \
                    if cmesh is not None else clvp.params
                aparams = self._sharded_params(
                    "autoregressive", cmesh) if cmesh is not None \
                    else ar.params
                if cmesh is not None:
                    lat_b = jax.device_put(np.ascontiguousarray(lat_b),
                                           self._data_sharding(cmesh))
                latents, t_lat_d, _best = _jit_rerank_latents(
                    aparams, cparams, lat_b, tokens, text_lengths,
                    res.codes, res.lengths, ar.config, clvp.config,
                    n_real=candidates)
            else:
                latents, t_lat_d = _jit_cleanup_latents(
                    ar.params, lat_b, tokens, text_lengths, res.codes,
                    res.lengths, ar.config)
            tick("latent_pass", latents)
            # a static decode budget already keys the program shape, so
            # skip the n_lat rounding — mel_pad_multiple tile-aligns T,
            # and rounding 200 -> 224 latents inflated the denoiser to
            # T=1024 where the budget fits T=896 (~14%/step)
            dpm = (0 if (max_ar_steps <= self.STATIC_BUDGET_MAX
                         and mel_pad_multiple > 1)
                   else diffusion_pad_multiple)
            n_lat, output_seq_len, pad_seq_len, uh = \
                self._diffusion_geometry(
                    diffusion,
                    self._decode_budget_latents(max_ar_steps,
                                                res.lengths),
                    dpm, mel_pad_multiple,
                    max_diffusion_steps, cond_free)
            mel = _jit_diffusion(
                diffusion.params, latents,
                np.asarray(diff_latent, np.float32), k_diff,
                diffusion.config, max_diffusion_steps, diffusion_sampler,
                output_seq_len, cond_free, diffusion_temp,
                n_lat=n_lat, t_lat=t_lat_d, pad_seq_len=pad_seq_len,
                uncond_h=uh)
            tick(f"diffusion_{pad_seq_len or output_seq_len}", mel)
            voc = self._model("bigvgan")
            wav = _jit_bigvgan(voc.params, mel, voc.config, as_i16=True,
                               prefix=t_lat_d)
            if defer_fetch:
                # multi-line texts: hand the packed device array back so
                # the caller can dispatch the NEXT line's programs before
                # paying this line's ~50-100 ms relay fetch
                return wav
            out = self._unpack_wav(np.asarray(wav))
            tick("vocoder")
            return out

        # ONE device_get for codes+lengths (separate np.asarray calls
        # are two ~50-100 ms relay round trips)
        codes_h, lengths_h = jax.device_get((res.codes, res.lengths))
        codes = self.cleanup_codes(np.asarray(codes_h),
                                   np.asarray(lengths_h),
                                   ar.config.stop_mel_token)
        tick("ar_decode")
        L = codes.shape[1]

        # CLVP rerank (inference.py:392-396) — candidates ride the
        # serving mesh's 'data' axis when one is configured (config #3)
        if candidates > 1:
            clvp = self._model("clvp")
            cparams = clvp.params
            ctok, ccod = jnp.asarray(np.asarray(tokens)), jnp.asarray(codes)
            if self.mesh is not None:
                ds = self._data_sharding(self.mesh)
                ctok = jax.device_put(np.asarray(tokens), ds)
                ccod = jax.device_put(np.asarray(codes), ds)
                cparams = self._sharded_params("clvp", self.mesh)
            scores = _jit_clvp_scores(cparams, ctok, ccod, clvp.config)
            # rows past `candidates` are mesh padding — never winners
            best = int(np.asarray(scores)[:candidates].argmax())
            tokens = np.asarray(tokens)
            codes = codes[best:best + 1]
            tokens = tokens[best:best + 1]
            text_lengths = np.asarray(text_lengths)[best:best + 1]

        # latent pass over [cond, text, codes] (inference.py:371-379)
        pad_codes = np.pad(codes, ((0, 0), (0, max_ar_steps - L)),
                           constant_values=ar.config.stop_mel_token)
        wav_lengths = np.full((codes.shape[0],),
                              L * ar.config.mel_length_compression)
        latents = _jit_latent_pass(
            ar.params, np.broadcast_to(np.asarray(ar_latent),
                                       (codes.shape[0],
                                        np.asarray(ar_latent).shape[-1])),
            tokens[:codes.shape[0]], text_lengths[:codes.shape[0]],
            pad_codes, wav_lengths, ar.config)
        tick("latent_pass", latents)
        # latents stay on device; the calm-token trim point is decided
        # from the (small) codes array (inference.py:381-389 semantics)
        t_lat = self.calm_trim_point(codes[0], upto=L)

        # diffusion (inference.py:398-413)
        n_lat, output_seq_len, pad_seq_len, uh = self._diffusion_geometry(
            diffusion, t_lat, diffusion_pad_multiple, mel_pad_multiple,
            max_diffusion_steps, cond_free)
        exact_seq_len = t_lat * 4 * 24000 // 22050
        mel = _jit_diffusion(
            diffusion.params, latents, np.asarray(diff_latent, np.float32),
            k_diff, diffusion.config, max_diffusion_steps,
            diffusion_sampler, output_seq_len, cond_free, diffusion_temp,
            n_lat=n_lat, t_lat=np.int32(t_lat), pad_seq_len=pad_seq_len,
            uncond_h=uh)
        tick(f"diffusion_{pad_seq_len or output_seq_len}", mel)

        # vocoder (inference.py:415-417) — runs on the *padded* mel so
        # the vocoder program is keyed by the bucketed length (an exact
        # slice here would both add an eager dispatch and recompile the
        # vocoder per utterance length); the host trims the wav instead
        voc = self._model("bigvgan" if vocoder_type == "bigvgan"
                          else "vocoder")
        if vocoder_type == "bigvgan":
            wav = _jit_bigvgan(voc.params, mel, voc.config, as_i16=True)
            out = np.asarray(wav)[0, 0, : exact_seq_len * 256]
            out = out.astype(np.float32) / 32767.0
        else:
            wav = _jit_univnet(voc.params, mel, k_voc, voc.config)
            out = np.asarray(wav)[0, 0, : exact_seq_len * 256]
        tick("vocoder")
        return out

    # ------------------------------------------------------------------
    @staticmethod
    def _latents_to_samples(n: int) -> int:
        """HiFiGAN sample count for n latents (double interpolation,
        hifigan.py:283-293: n -> int(4n) -> int(*24000/22050) -> *256)."""
        t1 = int(n * 1024 / 256)
        t2 = int(t1 * 24000 / 22050)
        return t2 * 256

    def stream(self, text: str,
               references: Optional[str | Sequence[str | Path]] = None,
               max_ar_steps: int = 500, ar_temp: float = 0.8,
               top_p: float = 1.0, top_k: int = 0,
               repetition_penalty: float = 1.0,
               length_penalty: float = 1.0,
               length_penalty_factor: float = 0.0,
               typical_sampling: bool = False,
               typical_mass: float = 0.9,
               mirostat_tau: float = 0.0,
               mirostat_eta: float = 0.1,
               min_temperature: float = 0.0,
               greedy: bool = False,
               seed: Optional[int] = None,
               mode: str = "windowed",
               stream_chunk_size: int = 40,
               first_buffer: int = 60) -> Iterator[np.ndarray]:
        """Public streaming API (HiFiGAN route, reference
        inference.py:250-329): yields 24 kHz float32 chunks as the AR
        decode advances.  The full sampling-knob surface of
        ``inference()`` applies (the reference passes the same kwargs
        set through its streaming route, inference.py:250-329).

        ``mode='windowed'`` (TPU default) vocodes a fixed 60-latent
        trailing window per chunk — one compiled program, constant
        chunk latency; ``mode='growing'`` reproduces the reference
        exactly (re-vocode the whole prefix per chunk: O(n^2) audio
        work and one fresh compile per chunk length through the
        relay).  Seam quality of the windowed mode is pinned by
        tests/test_inference_e2e.py::test_stream_windowed_seams."""
        seed = int(time.time()) if seed is None else seed
        if references is not None:
            enc = self.encode_audio(references, seed=seed)
            ar_latent, _ = enc["latent"]
        else:
            from .models import rlg as rlg_m
            (k1,) = _host_keys(seed ^ 0x5F3C, 1)
            rga = self._model("rlg_auto")
            ar_latent = rlg_m.sample(rga.params, k1, 1, int(rga.config))
        sampling = _sampling_from_knobs(
            ar_temp=ar_temp, top_k=top_k, top_p=top_p,
            typical_sampling=typical_sampling, typical_mass=typical_mass,
            repetition_penalty=repetition_penalty,
            length_penalty=length_penalty,
            length_penalty_factor=length_penalty_factor,
            greedy=greedy, mirostat_tau=mirostat_tau,
            mirostat_eta=mirostat_eta, min_temperature=min_temperature)
        for i, line in enumerate(text.split("\n")):
            if not line.strip():
                continue
            (sub,) = _host_keys(seed * 1000003 + i, 1)
            yield from self._stream_line(
                line, ar_latent, sampling, max_ar_steps, sub,
                stream_chunk_size=stream_chunk_size,
                first_buffer=first_buffer, mode=mode)

    def _stream_line(self, line, ar_latent, sampling, max_ar_steps, key,
                     stream_chunk_size: int = 40, first_buffer: int = 60,
                     overlap_wav_len: int = 1024,
                     mode: str = "windowed") -> Iterator[np.ndarray]:
        """HiFiGAN TRUE streaming route (inference.py:250-329): the decode
        advances in 40-token chunks against a persistent on-device KV
        cache (60-token first buffer), vocoding + 1024-sample linear
        crossfade between chunks — audio is yielded while the AR decode
        of later chunks is still pending.

        mode='windowed' (TPU default): each chunk vocodes a fixed
        60-latent window ending at the decode position, so every step
        reuses ONE compiled program (constant latency).  mode='growing'
        reproduces the reference exactly: re-vocode the whole prefix per
        chunk (O(n^2) audio work and one compile per chunk length).
        """
        if mode == "windowed":
            yield from self._stream_line_windowed(
                line, ar_latent, sampling, max_ar_steps, key,
                stream_chunk_size, first_buffer, overlap_wav_len)
            return
        from .models.unified_voice import decode_chunk, decode_start
        ar = self._model("autoregressive")
        voc = self._model("hifigan")
        toks = self.encode_text(line)
        tokens = self._bucket_text(toks)[None]
        lengths = np.asarray([min(len(toks), tokens.shape[1])])
        # host-side broadcast/cast: eager jnp ops here are relay
        # round trips (CLAUDE.md)
        lat = np.broadcast_to(np.asarray(ar_latent),
                              (1, np.asarray(ar_latent).shape[-1]))
        g = np.asarray(lat, np.float32)

        # same AR key derivation as the bigvgan route (_infer_line ->
        # _decode_codes): k_ar triple + per-row spawn, so one seed
        # produces ONE token stream regardless of vocoder route
        rk = _row_keys(_host_keys(_key_int(key), 3)[0], 1)
        state = decode_start(ar.params, lat, jnp.asarray(tokens),
                             jnp.asarray(lengths), jnp.asarray(rk),
                             ar.config, max_ar_steps)
        wav_gen_prev, wav_overlap = None, None
        first = True
        while True:
            chunk = max(stream_chunk_size, first_buffer) if first \
                else stream_chunk_size
            first = False
            state = decode_chunk(ar.params, state, ar.config, sampling,
                                 chunk=chunk, collect_latents=True,
                                 qgpt=self._ar_qgpt(), quant_mode=self._quant_mode)
            pos = int(state.step)
            n = int(np.asarray(state.lengths)[0])
            done = bool(np.asarray(state.finished).all()) or \
                pos >= max_ar_steps
            upto = min(pos, n) if done else pos
            upto = max(upto, 1)
            chunk_lat = state.latents[:, :upto].astype(jnp.float32)
            wav_gen = np.asarray(_jit_hifigan(
                voc.params, chunk_lat, g, voc.config))[0, 0]
            wav_chunk = wav_gen[:-overlap_wav_len]
            if wav_gen_prev is not None:
                wav_chunk = wav_gen[
                    wav_gen_prev.shape[0] - overlap_wav_len:-overlap_wav_len]
            if wav_overlap is not None and len(wav_chunk) >= overlap_wav_len:
                ramp = np.linspace(0.0, 1.0, overlap_wav_len,
                                   dtype=np.float32)
                cross = wav_chunk[:overlap_wav_len] * ramp
                wav_chunk = np.array(wav_chunk)
                wav_chunk[:overlap_wav_len] = wav_overlap * ramp[::-1] + cross
            wav_overlap = wav_gen[-overlap_wav_len:]
            wav_gen_prev = wav_gen
            yield wav_chunk
            if done:
                break

    def _stream_line_windowed(self, line, ar_latent, sampling, max_ar_steps,
                              key, stream_chunk_size: int = 40,
                              window: int = 60,
                              overlap_wav_len: int = 1024
                              ) -> Iterator[np.ndarray]:
        """Fixed-window streaming: vocode the trailing `window` latents
        (left context warms the vocoder's receptive field), emit the new
        chunk with a linear crossfade at each seam.  All shapes static."""
        from .models.unified_voice import decode_chunk, decode_start
        ar = self._model("autoregressive")
        voc = self._model("hifigan")
        toks = self.encode_text(line)
        tokens = self._bucket_text(toks)[None]
        lengths = np.asarray([min(len(toks), tokens.shape[1])])
        # host-side broadcast/cast: eager jnp ops here are relay
        # round trips (CLAUDE.md)
        lat = np.broadcast_to(np.asarray(ar_latent),
                              (1, np.asarray(ar_latent).shape[-1]))
        g = np.asarray(lat, np.float32)

        # same AR key derivation as the bigvgan route (see _stream_line)
        rk = _row_keys(_host_keys(_key_int(key), 3)[0], 1)
        state = decode_start(ar.params, lat, jnp.asarray(tokens),
                             jnp.asarray(lengths), jnp.asarray(rk),
                             ar.config, max_ar_steps)
        emitted = 0          # latents already emitted as audio
        wav_overlap = None
        first = True
        while True:
            chunk = window if first else stream_chunk_size
            first = False
            state = decode_chunk(ar.params, state, ar.config, sampling,
                                 chunk=chunk, collect_latents=True,
                                 qgpt=self._ar_qgpt(), quant_mode=self._quant_mode)
            pos = int(state.step)
            n = int(np.asarray(state.lengths)[0])
            done = bool(np.asarray(state.finished).all()) or \
                pos >= max_ar_steps
            upto = min(pos, n) if done else pos
            if upto <= emitted:
                if done:
                    break
                continue
            # fixed 60-latent window ending at `upto` (left-pad by
            # repeating the first latent when the prefix is short)
            start = max(0, upto - window)
            idx = np.clip(np.arange(upto - window, upto), 0, None)
            win_lat = _jit_latent_window(state.latents, jnp.asarray(idx))
            wav_win = np.asarray(_jit_hifigan(
                voc.params, win_lat, g, voc.config))[0, 0]
            # samples for the new (upto-emitted) latents + crossfade lead-in
            new_samples = (self._latents_to_samples(upto - start)
                           - self._latents_to_samples(emitted - start))
            take = min(new_samples + overlap_wav_len, wav_win.shape[-1])
            piece = np.array(wav_win[-take:])
            if wav_overlap is not None and piece.shape[0] > overlap_wav_len:
                ramp = np.linspace(0.0, 1.0, overlap_wav_len,
                                   dtype=np.float32)
                piece[:overlap_wav_len] = (wav_overlap * ramp[::-1]
                                           + piece[:overlap_wav_len] * ramp)
            wav_overlap = piece[-overlap_wav_len:].copy() \
                if piece.shape[0] >= overlap_wav_len else None
            yield piece[:-overlap_wav_len] if not done else piece
            emitted = upto
            if done:
                break
