"""Perf lab: micro-benchmarks of the pipeline's hot programs on the real
chip, for stage-level optimization work (not the official bench).

Usage: python tools/perf_lab.py [denoiser] [decode] [vocoder]

Prints per-variant wall times.  One process = one compile session; keep
all variants here so a single run (slow remote-compile relay) measures
everything.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    # jax.block_until_ready is a NO-OP on the axon relay platform —
    # force a device-to-host transfer to measure execution, not dispatch
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])


def timeit(fn, *args, n=10, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    _sync(out)
    return (time.perf_counter() - t0) / n


def bench_denoiser():
    # N denoiser evals inside ONE program (lax.scan) — the pipeline runs
    # the sampler this way, and per-call dispatch through the axon relay
    # would otherwise dominate a per-step measurement.
    from functools import partial

    from tortoise_tts_tpu.models import diffusion as diff_m
    cfg = diff_m.DiffusionConfig()
    p = diff_m.init(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    N = 20
    for T in (896, 1024):
        x = jnp.zeros((2, 100, T), jnp.bfloat16)
        ts = jnp.zeros((2,), jnp.int32)
        ce = jnp.zeros((2, cfg.model_channels, T), jnp.bfloat16)
        biases = diff_m.precompute_rel_biases(p, T, cfg, jnp.bfloat16)

        @partial(jax.jit, static_argnames=())
        def loop(p, x, ts, ce, rb):
            def body(h, _):
                out = diff_m.forward(p, h, ts, ce, cfg, rel_biases=rb)
                return out[:, :100].astype(h.dtype), None
            h, _ = jax.lax.scan(body, x, None, length=N)
            return h

        dt = timeit(loop, p, x, ts, ce, biases, n=3, warmup=1) / N
        print(f"denoiser T={T} flash={os.environ.get('TTS_FLASH_BIAS','1')}:"
              f" {dt*1e3:.2f} ms/step  ({80*dt:.3f} s per 80-step DDIM)")


def bench_denoiser_ablate():
    """Denoiser cost decomposition: TTS_ABLATE=noattn|nores|nonorm skips
    a component class; (full - ablated) isolates its cost."""
    mode = os.environ.get("TTS_ABLATE", "")
    import tortoise_tts_tpu.models.diffusion as diff_m
    if mode == "noattn":
        diff_m.attention_block = \
            lambda p, x, heads, mask=None, bias=None: x
    elif mode == "nores":
        diff_m._ts_res_block = lambda p, x, emb: x
    elif mode == "nonorm":
        import tortoise_tts_tpu.models.common as common
        common.group_norm = lambda p, x, groups: x
        import importlib
        importlib.reload(diff_m)
    print("ablate:", mode or "none")
    bench_denoiser()


def bench_decode():
    from tortoise_tts_tpu.models import unified_voice as uv
    from tortoise_tts_tpu.ops.sampling import SamplingConfig
    cfg = uv.UnifiedVoiceConfig()
    p = uv.init(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    b, tt, max_len = 1, 64, 200
    cond = jnp.zeros((b, cfg.model_dim), jnp.bfloat16)
    text = jnp.zeros((b, tt), jnp.int32)
    tl = jnp.full((b,), tt, jnp.int32)
    if os.environ.get("TTS_DECODE_GREEDY") == "1":
        samp = SamplingConfig(greedy=True)
        print("decode: greedy (no warp chain)")
    else:
        samp = SamplingConfig(temperature=0.8, top_p=0.9)
    st = uv.decode_start(p, cond, text, tl, jax.random.PRNGKey(0), cfg,
                         max_len)
    jax.block_until_ready(st)

    def run(state):
        return uv.decode_chunk(p, state, cfg, samp, max_len, None, False)

    dt = timeit(run, st, n=3, warmup=1)
    print(f"decode: {dt:.3f} s for {max_len} tokens "
          f"= {dt/max_len*1e3:.2f} ms/token")


def bench_vocoder():
    from functools import partial

    from tortoise_tts_tpu.models import bigvgan as bv
    from tortoise_tts_tpu.models import _bigvgan_random
    if os.environ.get("TTS_ABLATE_BV") == "plain":
        # isolate resampler cost: plain snake, no anti-alias up/down
        def plain_snake(p, x, logscale, beta):
            import jax.numpy as jnp
            a = p["alpha"][None, :, None].astype(x.dtype)
            b = p["beta"][None, :, None].astype(x.dtype) if beta else a
            if logscale:
                a, b = jnp.exp(a), jnp.exp(b)
            return x + (1.0 / (b + 1e-9)) * jnp.square(jnp.sin(x * a))
        bv._snake_act = plain_snake
        print("ablate_bv: plain snake (no up/down)")
    cfg = bv.BigVGANConfig()
    p = _bigvgan_random(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    T = 896
    N = 10
    mel = jnp.zeros((1, 100, T), jnp.bfloat16)

    @jax.jit
    def loop(p, m):
        def body(c, _):
            w = bv.forward(p, m * c, cfg)
            return jnp.mean(w).astype(m.dtype), None
        c, _ = jax.lax.scan(body, jnp.ones((), mel.dtype), None, length=N)
        return c

    dt = timeit(loop, p, mel, n=3, warmup=1) / N
    print(f"bigvgan T={T}: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    which = sys.argv[1:] or ["denoiser", "decode", "vocoder"]
    print("backend:", jax.default_backend())
    if "ablate" in which:
        bench_denoiser_ablate()
    if "denoiser" in which:
        bench_denoiser()
    if "decode" in which:
        bench_decode()
    if "vocoder" in which:
        bench_vocoder()
