"""Pure-functional logit processors / samplers for the AR decode loop.

Replaces the reference's HF LogitsWarper stack (stream_generator.py,
samplers.py, unified_voice.py:47-75) with fixed-shape pure functions of
(logits, state) usable inside lax.scan/while_loop.  Application order
mirrors HF generate(): repetition penalty -> typical -> temperature ->
top-k -> top-p, then categorical sampling.

All functions take and return (B, V) fp32 logits.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e10


@dataclass(frozen=True)
class SamplingConfig:
    temperature: float = 0.8
    top_k: int = 0            # 0 = disabled
    top_p: float = 1.0        # 1.0 = disabled
    typical_mass: float = 0.0  # 0 = disabled (reference default .9 when on)
    repetition_penalty: float = 1.0
    beam_width: int = 1
    # HF beam length penalty (final-beam selection exponent); sampling
    # mode ignores it, exactly like HF generate()
    length_penalty: float = 1.0
    # stop-logit length penalty for the *sampled* path (reference
    # samplers.py:35-40: stop_logit /= length**factor; >0 = longer
    # sequences, <0 = shorter, 0 = disabled)
    length_penalty_factor: float = 0.0
    greedy: bool = False
    # max-probability-sigmoid dynamic temperature (samplers.py:78-91):
    # active when 0 < min_temperature < temperature
    min_temperature: float = 0.0
    # mirostat v1 (samplers.py:117-157): active when tau > 0
    mirostat_tau: float = 0.0
    mirostat_eta: float = 0.1


def apply_repetition_penalty(logits: jnp.ndarray,
                             token_counts: jnp.ndarray,
                             penalty: float) -> jnp.ndarray:
    """HF RepetitionPenaltyLogitsProcessor on a count-vector state.

    token_counts: (B, V) int — number of times each token has appeared in
    the generated prefix (counts>0 <=> 'seen').  HF semantics: seen tokens
    with score>0 divided by penalty, score<0 multiplied.
    """
    if penalty == 1.0:
        return logits
    seen = token_counts > 0
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def apply_temperature(logits: jnp.ndarray, temperature: float) -> jnp.ndarray:
    if temperature == 1.0:
        return logits
    return logits / max(temperature, 1e-5)


def apply_top_k(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_top_p(logits: jnp.ndarray, p: float,
                iters: int = 30) -> jnp.ndarray:
    """HF TopPLogitsWarper (min_tokens_to_keep=1), sort-free.

    The sorted-cumsum form keeps {prob >= p_tau} where p_tau is the
    probability of the token whose ascending cumsum first exceeds 1-p.
    A full-vocab sort costs ~0.1 ms/token on TPU (bitonic); instead we
    binary-search the keep threshold t in [0, max_prob]: t is feasible
    iff the mass strictly below it is <= 1-p, and the feasible region's
    supremum is exactly p_tau.  30 masked-sum passes resolve t to
    ~2^-30 — identical keep-set for distinct probabilities (only
    float-level ties within ~1e-9 of the boundary can differ, where the
    sorted form's tie order is itself arbitrary)."""
    if p >= 1.0:
        return logits
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    rm = jnp.float32(1.0 - p)
    # hi0 = max prob exactly: lo can never exceed it, so the argmax is
    # always kept (HF's min_tokens_to_keep=1) even for degenerate p<=0
    # where every threshold is feasible
    hi0 = jnp.max(probs, axis=-1, keepdims=True)
    lo0 = jnp.zeros_like(hi0)

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        removed = jnp.sum(jnp.where(probs < mid, probs, 0.0),
                          axis=-1, keepdims=True)
        ok = removed <= rm
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    lo, _ = jax.lax.fori_loop(0, iters, body, (lo0, hi0))
    return jnp.where(probs < lo, NEG_INF, logits)


def apply_typical(logits: jnp.ndarray, mass: float) -> jnp.ndarray:
    """Typical sampling (unified_voice.py:47-75 TypicalLogitsWarper)."""
    if mass <= 0.0 or mass >= 1.0:
        return logits
    logp = jax.nn.log_softmax(logits, axis=-1)
    p = jnp.exp(logp)
    ent = -jnp.sum(jnp.where(p > 0, logp * p, 0.0), axis=-1, keepdims=True)
    shifted = jnp.abs(-logp - ent)
    # sort by shifted score ascending; accumulate prob of the corresponding
    # logits until mass reached
    order = jnp.argsort(shifted, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    last_ind = jnp.sum((cum < mass).astype(jnp.int32), axis=-1, keepdims=True)
    sorted_shifted = jnp.take_along_axis(shifted, order, axis=-1)
    cutoff = jnp.take_along_axis(sorted_shifted, last_ind, axis=-1)
    keep = shifted <= cutoff
    # min_tokens_to_keep=1: always keep the most-typical token
    best = jnp.argmin(shifted, axis=-1, keepdims=True)
    keep = keep | (jnp.arange(logits.shape[-1])[None] == best)
    return jnp.where(keep, logits, NEG_INF)


def warp_logits(logits: jnp.ndarray, cfg: SamplingConfig,
                token_counts: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Full warping chain in HF order."""
    x = logits.astype(jnp.float32)
    if token_counts is not None:
        x = apply_repetition_penalty(x, token_counts, cfg.repetition_penalty)
    x = apply_typical(x, cfg.typical_mass)
    if 0.0 < cfg.min_temperature < cfg.temperature:
        x = apply_dynamic_temperature(x, cfg.temperature,
                                      cfg.min_temperature)
    else:
        x = apply_temperature(x, cfg.temperature)
    x = apply_top_k(x, cfg.top_k)
    x = apply_top_p(x, cfg.top_p)
    return x


def categorical_rows(key: jax.Array, logits: jnp.ndarray) -> jnp.ndarray:
    """Categorical draw with either ONE key for the whole (B, V) batch
    (key (2,) — legacy batch-keyed stream) or PER-ROW keys (key (B, 2)):
    each row's draw is a function of its own key only, so any row of a
    batched decode reproduces bit-exactly as a B=1 call with that row's
    key (the reference's per-call ``seed``, inference.py:142,157-160,
    preserved at batch scale).  For B=1 the two modes are bit-identical
    (threefry bits for shape (V,) == shape (1, V))."""
    if key.ndim == 2:
        return jax.vmap(lambda k, l: jax.random.categorical(k, l, axis=-1)
                        )(key, logits)
    return jax.random.categorical(key, logits, axis=-1)


def sample_token(key: jax.Array, logits: jnp.ndarray,
                 cfg: SamplingConfig,
                 token_counts: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Warp + draw one token per row. logits (B, V) -> (B,) int32.

    ``key`` may be per-row (B, 2) — see categorical_rows."""
    if cfg.greedy:
        # HF greedy applies logits *processors* before argmax but skips
        # the warpers.  Repetition penalty is a default processor, and
        # the reference passes TypicalLogitsWarper through generate()'s
        # logits_processor list (unified_voice.py:659), so both apply
        # here; temperature/top-k/top-p are warpers (sample-mode only)
        # and never change an argmax anyway.
        x = logits.astype(jnp.float32)
        if token_counts is not None:
            x = apply_repetition_penalty(x, token_counts,
                                         cfg.repetition_penalty)
        x = apply_typical(x, cfg.typical_mass)
        return jnp.argmax(x, axis=-1).astype(jnp.int32)
    warped = warp_logits(logits, cfg, token_counts)
    return categorical_rows(key, warped).astype(jnp.int32)


def apply_dynamic_temperature(logits: jnp.ndarray, temperature: float,
                              min_temperature: float = 0.0,
                              k: float = 10.0,
                              sigmoid_center: float = 0.5) -> jnp.ndarray:
    """Dynamic temperature (reference samplers.py:78-91): the per-row
    temperature slides from `temperature` toward `min_temperature` by a
    sigmoid of the pre-temperature max-token probability —
    t = T - (T - T_min) / (1 + exp(-k * (p_max - center)))."""
    if min_temperature >= temperature:
        return apply_temperature(logits, temperature)
    p_max = jnp.max(jax.nn.softmax(logits.astype(jnp.float32), axis=-1),
                    axis=-1, keepdims=True)
    t = temperature - (temperature - min_temperature) \
        / (1.0 + jnp.exp(-k * (p_max - sigmoid_center)))
    return logits / jnp.maximum(t, 1e-5)


def apply_length_penalty(stop_logit: jnp.ndarray, length: jnp.ndarray,
                         factor: float) -> jnp.ndarray:
    """Stop-logit length penalty (reference samplers.py:35-40):
    stop_logit /= length**factor.  factor>0 shrinks the stop logit as
    the sequence grows (longer audio), factor<0 amplifies it."""
    if factor == 0.0:
        return stop_logit
    scale = jnp.power(jnp.maximum(length.astype(jnp.float32), 1.0), factor)
    return stop_logit / scale


def mirostat_step(key: jax.Array, logits: jnp.ndarray, mu: jnp.ndarray,
                  tau: float = 5.0, eta: float = 0.1,
                  n_vocab: Optional[int] = None):
    """Mirostat v1 sampling step (reference samplers.py:117-157).

    logits: (B, V); mu: (B,) running max-surprise estimate.
    Returns (token (B,), new_mu (B,)).
    """
    v = logits.shape[-1]
    n = n_vocab or v
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    # estimate Zipf exponent s from the top-100 probability ratios
    # (compute_k, samplers.py:118-131): log b_i = logit[i] - logit[i+1],
    # t_i = (i+2)/(i+1), i = 0..99 (needs 101 sorted logits)
    m = 100
    top = sorted_logits[:, :m + 1]
    i = jnp.arange(m, dtype=jnp.float32)
    logt = jnp.log((i + 2) / (i + 1))
    logb = top[:, :-1] - top[:, 1:]
    s_hat = jnp.sum(logb * logt[None], axis=-1) / jnp.sum(logt * logt)
    eps = s_hat - 1.0
    k = jnp.power((eps * jnp.power(2.0, mu)) / (1 - jnp.power(n, -eps)),
                  1.0 / jnp.maximum(s_hat, 1e-3))
    # reference: k = round(k) + 1 (samplers.py:130, 145)
    k = jnp.clip(jnp.round(k) + 1, 1, v).astype(jnp.int32)
    # top-k mask with per-row dynamic k
    ranks = jnp.argsort(jnp.argsort(-logits, axis=-1), axis=-1)
    masked = jnp.where(ranks < k[:, None], logits, NEG_INF)
    tok = categorical_rows(key, masked)
    # surprise uses the ORIGINAL (unmasked) distribution
    # (samplers.py:143,152: prob_original)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    surprise = -jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0] \
        / jnp.log(2.0)
    new_mu = mu - eta * (surprise - tau)
    return tok.astype(jnp.int32), new_mu
