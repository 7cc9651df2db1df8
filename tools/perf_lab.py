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

if os.environ.get("TTS_LAB_CPU") == "1":
    # the axon sitecustomize pins jax_platforms; env alone is overridden
    jax.config.update("jax_platforms", "cpu")

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
    Ts = tuple(int(t) for t in os.environ.get(
        "TTS_DENOISER_T", "896,1024").split(","))
    # batch: 2 = one utterance's cond-free pair; 16 = batch-8 serving
    B = int(os.environ.get("TTS_DENOISER_B", "2"))
    for T in Ts:
        x = jnp.zeros((B, 100, T), jnp.bfloat16)
        ts = jnp.zeros((B,), jnp.int32)
        ce = jnp.zeros((B, cfg.model_channels, T), jnp.bfloat16)
        biases = diff_m.precompute_rel_biases(
            p, T, cfg, jnp.bfloat16,
            transposed=os.environ.get("TTS_LAB_KQ") == "1")

        vary_ts = os.environ.get("TTS_VARY_TS") == "1"

        @partial(jax.jit, static_argnames=())
        def loop(p, x, ts, ce, rb):
            def body(h, t):
                tt = jnp.full_like(ts, t) if vary_ts else ts
                out = diff_m.forward(p, h, tt, ce, cfg, rel_biases=rb)
                return out[:, :100].astype(h.dtype), None
            h, _ = jax.lax.scan(body, x, jnp.arange(N), length=N)
            return h

        dt = timeit(loop, p, x, ts, ce, biases, n=3, warmup=1) / N
        print(f"denoiser B={B} T={T} "
              f"flash={os.environ.get('TTS_FLASH_BIAS','1')}:"
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
    b, tt, max_len = int(os.environ.get("TTS_DECODE_B", "1")), 64, 200
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
    quant = os.environ.get("TTS_DECODE_QUANT", "none")  # none|int8|w8a8
    qgpt = (jax.jit(uv.quantize_decode_weights)(p)
            if quant in ("int8", "w8a8") else None)
    print("decode quant:", quant)

    def run(state):
        return uv.decode_chunk(p, state, cfg, samp, None, False,
                               qgpt=qgpt, quant_mode=quant
                               if quant != "none" else "int8")

    dt = timeit(run, st, n=3, warmup=1)
    print(f"decode B={b}: {dt:.3f} s for {max_len} tokens "
          f"= {dt/max_len*1e3:.2f} ms/token "
          f"= {b*max_len/dt:.0f} mel-tokens/s/chip")


def bench_decode_ablate():
    """Decode-step cost decomposition: TTS_ABLATE_DEC=noattn replaces
    the cache-read attention with an identity on q (cache writes, GEMVs,
    norms and sampling all stay); (full - noattn) isolates the
    attention-read cost of the step."""
    mode = os.environ.get("TTS_ABLATE_DEC", "")
    from tortoise_tts_tpu.models import unified_voice as uv
    orig = uv.mha
    if mode == "noattn":
        uv.mha = lambda q, k, v, mask=None, **kw: q
    print("ablate_dec:", mode or "none")
    try:
        bench_decode()
    finally:
        uv.mha = orig


def bench_decode_roof():
    """Pure weight-streaming roof for the decode step: the 4 GEMVs per
    layer (+ logits head), no attention/cache/sampling.  The gap between
    this and bench_decode is cache+attention+bookkeeping cost; the gap to
    772 MB / 819 GB/s = 0.94 ms is XLA GEMV streaming efficiency."""
    from functools import partial

    from tortoise_tts_tpu.models import unified_voice as uv
    from tortoise_tts_tpu.models.common import gelu_new, linear
    cfg = uv.UnifiedVoiceConfig()
    p = uv.init(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    N = 200

    @jax.jit
    def loop(p):
        lp = uv._layer_params(p["gpt"])
        x0 = jnp.ones((1, 1, cfg.model_dim), jnp.bfloat16)

        def token(x, _):
            def layer(h, w):
                qkv = linear(w["attn_qkv"], h)
                q = jnp.split(qkv, 3, axis=-1)[0]
                h = h + linear(w["attn_proj"], q)
                h = h + linear(w["mlp_proj"],
                               gelu_new(linear(w["mlp_fc"], h)))
                return h, None
            h, _ = jax.lax.scan(layer, x, lp,
                                unroll=int(os.environ.get(
                                    "TTS_DECODE_UNROLL", "1")))
            lg = linear(p["mel_head"], h[:, -1]).astype(jnp.float32)
            # feed a data dependency back so steps serialize
            return h + lg[..., :1].astype(h.dtype) * 0, None
        h, _ = jax.lax.scan(token, x0, None, length=N)
        return h

    dt = timeit(loop, p, n=3, warmup=1) / N
    print(f"decode_roof unroll={os.environ.get('TTS_DECODE_UNROLL','1')}: "
          f"{dt*1e3:.2f} ms/token")


def bench_decode_roof_int8():
    """Weight-only int8 variant of the roof: per-output-channel scales,
    dequant fused into the dot by XLA (weight HBM traffic halves if the
    convert fuses; this measures whether it does)."""
    from tortoise_tts_tpu.models import unified_voice as uv
    from tortoise_tts_tpu.models.common import gelu_new
    cfg = uv.UnifiedVoiceConfig()
    p = uv.init(jax.random.PRNGKey(0), cfg)
    lp = jax.tree.map(lambda x: x, uv._layer_params(p["gpt"]))

    def quant(w):     # (..., in, out) -> int8 + (..., out) scale
        s = jnp.max(jnp.abs(w), axis=-2) / 127.0 + 1e-12
        return (jnp.round(w / s[..., None, :]).astype(jnp.int8),
                s.astype(jnp.bfloat16))

    names = ("attn_qkv", "attn_proj", "mlp_fc", "mlp_proj")
    q = {n: (quant(lp[n]["w"])) for n in names}
    b = {n: lp[n].get("b") for n in names}
    qlp = {n: {"wq": q[n][0], "s": q[n][1],
               "b": (jnp.zeros(q[n][1].shape, jnp.bfloat16)
                     if b[n] is None else b[n].astype(jnp.bfloat16))}
           for n in names}
    mh_q, mh_s = quant(p["mel_head"]["w"])
    N = 200

    def lin(w, x):
        y = jnp.dot(x, w["wq"].astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32)
        return (y * w["s"].astype(jnp.float32)).astype(jnp.bfloat16) \
            + w["b"]

    @jax.jit
    def loop(qlp, mh_q, mh_s):
        x0 = jnp.ones((1, 1, cfg.model_dim), jnp.bfloat16)

        def token(x, _):
            def layer(h, w):
                qkv = lin(w["attn_qkv"], h)
                qh = jnp.split(qkv, 3, axis=-1)[0]
                h = h + lin(w["attn_proj"], qh)
                h = h + lin(w["mlp_proj"], gelu_new(lin(w["mlp_fc"], h)))
                return h, None
            h, _ = jax.lax.scan(layer, x, qlp)
            lg = jnp.dot(h[:, -1], mh_q.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32) * mh_s
            return h + lg[..., :1].astype(h.dtype)[None] * 0, None
        h, _ = jax.lax.scan(token, x0, None, length=N)
        return h

    dt = timeit(loop, qlp, mh_q, mh_s, n=3, warmup=1) / N
    print(f"decode_roof_int8: {dt*1e3:.2f} ms/token")


def bench_decode_roof_qgemv(block_n=None, w8a8=False):
    """Same roof loop driven through the Pallas int8 GEMV kernel
    (ops/pallas_gemv.qgemv_stacked): stacked weights stay in HBM and
    each token streams exactly the int8 tiles.  w8a8=True routes
    through qgemv_stacked_w8a8 (dynamic activation quant + int8 MXU)."""
    from tortoise_tts_tpu.models import unified_voice as uv
    from tortoise_tts_tpu.models.common import gelu_new
    from tortoise_tts_tpu.ops.pallas_gemv import (qgemv_stacked,
                                                  qgemv_stacked_w8a8)
    gemv = qgemv_stacked_w8a8 if w8a8 else qgemv_stacked
    cfg = uv.UnifiedVoiceConfig()
    p = uv.init(jax.random.PRNGKey(0), cfg)
    lp = uv._layer_params(p["gpt"])

    def quant(w):
        s = jnp.max(jnp.abs(w), axis=-2) / 127.0 + 1e-12
        return (jnp.round(w / s[..., None, :]).astype(jnp.int8),
                s.astype(jnp.float32))

    names = ("attn_qkv", "attn_proj", "mlp_fc", "mlp_proj")
    q = {n: quant(lp[n]["w"]) for n in names}
    bias = {n: (lp[n]["b"].astype(jnp.float32) if "b" in lp[n] else None)
            for n in names}
    L = cfg.layers
    N = 200

    @jax.jit
    def loop(q, bias):
        x0 = jnp.ones((1, cfg.model_dim), jnp.bfloat16)

        def token(x, _):
            def layer(h, li):
                bn = block_n or 512
                qkv = gemv(h, q["attn_qkv"][0], q["attn_qkv"][1],
                           bias["attn_qkv"], li, block_n=bn)
                qh = jnp.split(qkv, 3, axis=-1)[0]
                h = h + gemv(qh, q["attn_proj"][0], q["attn_proj"][1],
                             bias["attn_proj"], li, block_n=bn)
                m = gemv(h, q["mlp_fc"][0], q["mlp_fc"][1],
                         bias["mlp_fc"], li, block_n=bn)
                h = h + gemv(gelu_new(m), q["mlp_proj"][0],
                             q["mlp_proj"][1],
                             bias["mlp_proj"], li, block_n=bn)
                return h, None
            h, _ = jax.lax.scan(layer, x, jnp.arange(L))
            return h, None
        h, _ = jax.lax.scan(token, x0, None, length=N)
        return h

    dt = timeit(loop, q, bias, n=3, warmup=1) / N
    tag = "w8a8" if w8a8 else "qgemv"
    print(f"decode_roof_{tag} bn={block_n or 512}: {dt*1e3:.2f} ms/token")


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
    N = 10
    Ts = tuple(int(t) for t in os.environ.get(
        "TTS_VOCODER_T", "896").split(","))
    B = int(os.environ.get("TTS_VOCODER_B", "1"))
    for T in Ts:
        mel = jnp.zeros((B, 100, T), jnp.bfloat16)

        @jax.jit
        def loop(p, m):
            def body(c, _):
                w = bv.forward(p, m * c, cfg)
                return jnp.mean(w).astype(m.dtype), None
            c, _ = jax.lax.scan(body, jnp.ones((), mel.dtype), None,
                                length=N)
            return c

        dt = timeit(loop, p, mel, n=3, warmup=1) / N
        print(f"bigvgan B={B} T={T} poly={os.environ.get('TTS_BV_POLY','?')}:"
              f" {dt*1e3:.1f} ms")


def bench_diffusion_program():
    """Full _jit_diffusion program (timestep_independent + DDIM scan +
    denorm + dispatch/sync) vs the bare denoiser loop — isolates the
    sampler/cond/dispatch overhead the e2e stage carries."""
    from tortoise_tts_tpu.inference import _jit_diffusion
    from tortoise_tts_tpu.models import diffusion as diff_m
    cfg = diff_m.DiffusionConfig()
    p = diff_m.init(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    steps = int(os.environ.get("TTS_DIFF_STEPS", "80"))
    n_lat, t_lat = 224, 224
    latents = jnp.zeros((1, 500, 1024), jnp.float32)
    cond = jnp.zeros((1, 2048), jnp.float32)
    key = jnp.zeros((2,), jnp.uint32)
    seq = n_lat * 4 * 24000 // 22050
    for pad in (None, 1024):
        def run():
            return _jit_diffusion(p, latents, cond, key, cfg, steps,
                                  "ddim", seq, True, 1.0, 2.0,
                                  n_lat=n_lat, t_lat=jnp.int32(t_lat),
                                  pad_seq_len=pad)
        dt = timeit(lambda: run(), n=3, warmup=1)
        print(f"diffusion_program steps={steps} seq={seq} pad={pad}: "
              f"{dt*1e3:.0f} ms ({dt/steps*1e3:.2f} ms/step incl overhead)")


def bench_latent_pass():
    """_jit_latent_pass warm-call cost (the e2e stage showed 74 ms for a
    ~2 ms-of-FLOPs forward — decompose dispatch/arg-transfer vs exec)."""
    from tortoise_tts_tpu.inference import _jit_latent_pass
    from tortoise_tts_tpu.models import unified_voice as uv
    cfg = uv.UnifiedVoiceConfig()
    p = uv.init(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    b, tt, ml = 1, 64, 200
    cond = np.zeros((b, cfg.model_dim), np.float32)
    text = np.zeros((b, tt), np.int32)
    tl = np.full((b,), tt, np.int32)
    codes = np.zeros((b, ml), np.int32)
    wl = np.full((b,), ml * cfg.mel_length_compression, np.int32)
    # host-numpy args every call (as the pipeline does)
    dt = timeit(lambda: _jit_latent_pass(p, cond, text, tl, codes, wl, cfg),
                n=5, warmup=2)
    print(f"latent_pass host-args: {dt*1e3:.1f} ms")
    # device-resident args
    dargs = [jnp.asarray(a) for a in (cond, text, tl, codes, wl)]
    dt = timeit(lambda: _jit_latent_pass(p, *dargs, cfg), n=5, warmup=2)
    print(f"latent_pass dev-args:  {dt*1e3:.1f} ms")


def bench_vocoder_transfer():
    """Vocoder program + FULL wav device->host transfer (what the e2e
    stage pays), fp32 vs int16 payload."""
    from tortoise_tts_tpu.inference import _jit_bigvgan
    from tortoise_tts_tpu.models import bigvgan as bv
    from tortoise_tts_tpu.models import _bigvgan_random
    cfg = bv.BigVGANConfig()
    p = _bigvgan_random(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    Ts = tuple(int(t) for t in os.environ.get(
        "TTS_VOCTRANS_T", "1024").split(","))
    for T in Ts:
        mel = jnp.zeros((1, 100, T), jnp.bfloat16)
        modes = ((False, True) if os.environ.get("TTS_VOCTRANS_F32")
                 else (True,))
        for i16 in modes:
            def run():
                return np.asarray(_jit_bigvgan(p, mel, cfg, as_i16=i16))
            run(); run()
            t0 = time.perf_counter()
            for _ in range(3):
                run()
            dt = (time.perf_counter() - t0) / 3
            print(f"bigvgan+transfer T={T} i16={i16}: {dt*1e3:.0f} ms")


def bench_snake():
    """Per-stage cost of one snake activation: pallas kernel vs the
    blocked-matmul XLA path, at BigVGAN's (C, T) stage shapes for 896
    mel frames."""
    import tortoise_tts_tpu.models.bigvgan as bv
    shapes = [(768, 3584), (384, 14336), (192, 28672), (96, 57344),
              (48, 114688), (24, 229376)]
    N = 20
    saved = bv._RESAMPLE
    for mode in ("pallas", "blocked"):
        tot = 0.0
        for C, T in shapes:
            x = jnp.zeros((1, C, T), jnp.bfloat16)
            p = {"alpha": jnp.full((C,), 0.1), "beta": jnp.full((C,), 0.2)}
            bv._RESAMPLE = mode

            @jax.jit
            def loop(p, x):
                def body(c, _):
                    y = bv._snake_act(p, x * c, True, True)
                    return jnp.max(y).astype(x.dtype), None
                c, _ = jax.lax.scan(body, jnp.ones((), x.dtype), None,
                                    length=N)
                return c

            dt = timeit(loop, p, x, n=3, warmup=1) / N
            tot += dt
            print(f"snake {mode} C={C} T={T}: {dt*1e6:.0f} us")
        print(f"snake {mode} total/act-sweep: {tot*1e3:.2f} ms")
    bv._RESAMPLE = saved


def bench_trainstep():
    """Full-scale train step on chip (BASELINE config #5's training
    half): bf16 params, remat on, AdamW; reports ms/step and
    tokens/s/chip.  TTS_TRAIN_B / TTS_TRAIN_TT / TTS_TRAIN_TM size the
    batch; TTS_TRAIN_LORA=1 trains a rank-128 adapter;
    TTS_TRAIN_MODEL=ar|diffusion|bigvgan picks the engine (the latter
    two validate the Pallas kernels' custom_vjp backwards on the real
    chip — CPU tests bypass the kernels)."""
    import optax
    from tortoise_tts_tpu.engine import state as st, train_step as ts
    from tortoise_tts_tpu.models import unified_voice as uv
    from tortoise_tts_tpu.models.lora import init_lora

    which = os.environ.get("TTS_TRAIN_MODEL", "ar")
    if which == "diffusion":
        return _bench_trainstep_diffusion()
    if which == "bigvgan":
        return _bench_trainstep_bigvgan()

    cfg = uv.UnifiedVoiceConfig()
    B = int(os.environ.get("TTS_TRAIN_B", "8"))
    TT = int(os.environ.get("TTS_TRAIN_TT", "128"))
    TM = int(os.environ.get("TTS_TRAIN_TM", "256"))
    lora = os.environ.get("TTS_TRAIN_LORA") == "1"
    params = uv.init(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    tx = optax.adamw(1e-5)
    if lora:
        adapters = init_lora(jax.random.PRNGKey(1), params, rank=128)
        from tortoise_tts_tpu.config import LoRAConfig
        step = ts.make_ar_train_step(
            cfg, tx, remat=True, donate=False,
            lora_cfg=LoRAConfig(rank=128, alpha=128), base_params=params)
        state = st.init_state(adapters, tx)
    else:
        step = ts.make_ar_train_step(cfg, tx, remat=True, donate=False)
        state = st.init_state(params, tx)
    rng = np.random.RandomState(0)
    batch = {
        "latents": jnp.asarray(rng.randn(B, cfg.model_dim), jnp.float32),
        "text": jnp.asarray(rng.randint(3, 255, (B, TT)), jnp.int32),
        "text_lengths": jnp.full((B,), TT, jnp.int32),
        "codes": jnp.asarray(rng.randint(0, 8192, (B, TM)), jnp.int32),
        "wav_lengths": jnp.full((B,), (TM - 2) * 1024, jnp.int32),
    }

    def run(s):
        s2, m = step(s, batch)
        return s2, m

    # warm (compile)
    state, m = run(state)
    _sync(m["loss"])
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        state, m = run(state)
    _sync(m["loss"])
    dt = (time.perf_counter() - t0) / n
    toks = B * (TT + TM)
    print(f"trainstep{' lora' if lora else ''} B={B} TT={TT} TM={TM}: "
          f"{dt*1e3:.0f} ms/step = {toks/dt:.0f} tokens/s/chip "
          f"(loss {float(np.asarray(m['loss'])):.3f})")


def _bench_trainstep_diffusion():
    """Full-scale diffusion train step (10Lx1024d denoiser, remat's
    role is minor here; exercises the fused-resblock/qkv-head
    custom_vjp backwards on chip)."""
    import optax
    from tortoise_tts_tpu.engine import state as st, train_step as ts
    from tortoise_tts_tpu.models import diffusion as dm, gaussian

    cfg = dm.DiffusionConfig()
    B = int(os.environ.get("TTS_TRAIN_B", "8"))
    T = int(os.environ.get("TTS_TRAIN_T", "512"))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                          dm.init(jax.random.PRNGKey(0), cfg))
    sched = gaussian.get_schedule(steps=4000, cond_free=False)
    tx = optax.adamw(1e-5)
    step = ts.make_diffusion_train_step(cfg, tx, sched, donate=False,
                                        seed=0)
    state = st.init_state(params, tx)
    rng = np.random.RandomState(0)
    batch = {
        "mel": jnp.asarray(rng.randn(B, 100, T), jnp.float32),
        "latents": jnp.asarray(rng.randn(B, T // 4, 1024), jnp.float32),
        "conditioning_latents": jnp.asarray(rng.randn(B, 2048),
                                            jnp.float32),
    }
    state, m = step(state, batch)
    _sync(m["loss"])
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        state, m = step(state, batch)
    _sync(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"trainstep diffusion B={B} T={T}: {dt*1e3:.0f} ms/step "
          f"= {B*T/dt:.0f} frames/s/chip "
          f"(loss {float(np.asarray(m['loss'])):.3f})")


def _bench_trainstep_bigvgan():
    """Full-scale BigVGAN GAN train step (generator + MPD/MRD
    discriminators; exercises the Pallas snake kernel's custom_vjp
    backward on chip)."""
    import optax
    from tortoise_tts_tpu.engine import state as st, train_step as ts
    from tortoise_tts_tpu.models import _bigvgan_random
    from tortoise_tts_tpu.models import bigvgan_disc as bvd
    from tortoise_tts_tpu.models.bigvgan import BigVGANConfig

    cfg = BigVGANConfig()
    B = int(os.environ.get("TTS_TRAIN_B", "4"))
    SEG = int(os.environ.get("TTS_TRAIN_SEG", "8192"))
    gen = jax.tree.map(lambda x: x.astype(jnp.bfloat16),
                       _bigvgan_random(jax.random.PRNGKey(0), cfg))
    disc = bvd.init(jax.random.PRNGKey(1))
    tx_g, tx_d = optax.adamw(1e-5), optax.adamw(1e-5)
    step = ts.make_vocoder_train_step(cfg, tx_g, tx_d, donate=False)
    params = {"generator": gen, "discriminator": disc}
    state = st.TrainState(params,
                          {"g": tx_g.init(gen), "d": tx_d.init(disc)},
                          jnp.zeros((), jnp.int32),
                          jnp.zeros((), jnp.int32),
                          jnp.zeros((), jnp.int32))
    rng = np.random.RandomState(0)
    batch = {"wav": jnp.asarray(rng.randn(B, SEG) * 0.1, jnp.float32)}
    state, m = step(state, batch)
    _sync(m["loss"])
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        state, m = step(state, batch)
    _sync(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"trainstep bigvgan B={B} SEG={SEG}: {dt*1e3:.0f} ms/step "
          f"= {B*SEG/dt/24000:.2f} audio-s/s/chip "
          f"(loss {float(np.asarray(m['loss'])):.3f})")


def bench_decode_batch_matrix():
    """Batch-decode cost decomposition (VERDICT r4 item: batch AR at the
    weight-streaming roof).  For each B, times the production int8
    decode step and ablations that isolate where the per-row cost goes:

      full       int8 kernel + sampled warp chain (the bench config)
      greedy     same but argmax sampling      -> warp-chain cost
      noattn     mha -> identity on q          -> cache-read cost
      nocollect  (full already skips latent collection)
      norep      repetition_penalty=1.0        -> counts-scatter cost

    All decode 200 tokens from the same prefill state."""
    from tortoise_tts_tpu.models import unified_voice as uv
    from tortoise_tts_tpu.ops.sampling import SamplingConfig
    cfg = uv.UnifiedVoiceConfig()
    p = uv.init(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    qgpt = jax.jit(uv.quantize_decode_weights)(p)
    tt, max_len = 64, 200
    bs = tuple(int(x) for x in os.environ.get(
        "TTS_DECODE_BS", "1,8,16").split(","))
    # the bench sampling config (temperature + top-p + rep penalty)
    samp_full = SamplingConfig(temperature=0.8, top_p=0.9,
                               repetition_penalty=2.0)
    samp_norep = SamplingConfig(temperature=0.8, top_p=0.9)
    samp_notopp = SamplingConfig(temperature=0.8,
                                 repetition_penalty=2.0)
    samp_greedy = SamplingConfig(greedy=True)
    orig_mha = uv.mha

    for b in bs:
        cond = jnp.zeros((b, cfg.model_dim), jnp.bfloat16)
        text = jnp.zeros((b, tt), jnp.int32)
        tl = jnp.full((b,), tt, jnp.int32)
        st = uv.decode_start(p, cond, text, tl, jax.random.PRNGKey(0),
                             cfg, max_len)
        _sync(st.cache.k)

        def run(state, samp):
            return uv.decode_chunk(p, state, cfg, samp, None, False,
                                   qgpt=qgpt, quant_mode="int8")

        rows = {}
        for name, samp in (("full", samp_full), ("norep", samp_norep),
                           ("notopp", samp_notopp),
                           ("greedy", samp_greedy)):
            dt = timeit(run, st, samp, n=3, warmup=1)
            rows[name] = dt
        # decode_chunk is jitted: clear its cache so the patched mha is
        # actually traced into the ablated variant
        uv.mha = lambda q, k, v, mask=None, **kw: q
        uv.decode_chunk.clear_cache()
        try:
            rows["noattn"] = timeit(run, st, samp_full, n=3, warmup=1)
        finally:
            uv.mha = orig_mha
            uv.decode_chunk.clear_cache()

        # static-layer-unroll variant: the cache read is a static slice
        # of the carry instead of the scanned dynamic-slice copy
        old_unroll = os.environ.get("TTS_DECODE_UNROLL")
        os.environ["TTS_DECODE_UNROLL"] = "full"
        uv.decode_chunk.clear_cache()
        try:
            rows["staticl"] = timeit(run, st, samp_full, n=3, warmup=1)
        finally:
            if old_unroll is None:
                del os.environ["TTS_DECODE_UNROLL"]
            else:
                os.environ["TTS_DECODE_UNROLL"] = old_unroll
            uv.decode_chunk.clear_cache()

        # hd-major cache (S in the lane dim — dense reads; the attnread
        # microbench winner at every batch)
        old_km = os.environ.get("TTS_DECODE_KMAJOR")
        os.environ["TTS_DECODE_KMAJOR"] = "1"
        uv.decode_start.clear_cache()
        uv.decode_chunk.clear_cache()
        try:
            st_km = uv.decode_start(p, cond, text, tl,
                                    jax.random.PRNGKey(0), cfg, max_len)
            _sync(st_km.cache.k)
            rows["kmajor"] = timeit(run, st_km, samp_full, n=3, warmup=1)
        finally:
            if old_km is None:
                del os.environ["TTS_DECODE_KMAJOR"]
            else:
                os.environ["TTS_DECODE_KMAJOR"] = old_km
            uv.decode_start.clear_cache()
            uv.decode_chunk.clear_cache()

        # packed K||V cache (dense 128-lane rows vs 2x-padded split
        # buffers); also combined with the static layer unroll
        old_pk = os.environ.get("TTS_DECODE_PACKKV")
        os.environ["TTS_DECODE_PACKKV"] = "1"
        uv.decode_start.clear_cache()
        uv.decode_chunk.clear_cache()
        try:
            st_pk = uv.decode_start(p, cond, text, tl,
                                    jax.random.PRNGKey(0), cfg, max_len)
            _sync(st_pk.cache.k)
            rows["packkv"] = timeit(run, st_pk, samp_full, n=3, warmup=1)
            os.environ["TTS_DECODE_UNROLL"] = "full"
            uv.decode_chunk.clear_cache()
            rows["packstat"] = timeit(run, st_pk, samp_full, n=3,
                                      warmup=1)
        finally:
            if old_pk is None:
                del os.environ["TTS_DECODE_PACKKV"]
            else:
                os.environ["TTS_DECODE_PACKKV"] = old_pk
            if old_unroll is None:
                os.environ.pop("TTS_DECODE_UNROLL", None)
            else:
                os.environ["TTS_DECODE_UNROLL"] = old_unroll
            uv.decode_start.clear_cache()
            uv.decode_chunk.clear_cache()

        # the attention LADDER (inference_speech chunked attn_len reads)
        # vs the single full-budget chunk, both through the public entry
        # (prefill included in both, so the delta isolates the ladder)
        def run_ladder(chunk_size):
            return uv.inference_speech(
                params_like, cond, text, tl, jax.random.PRNGKey(0), cfg,
                samp_full, max_length=max_len, qgpt=qgpt,
                quant_mode="int8", decode_chunk_size=chunk_size)

        params_like = p
        for name, csz in (("ladder0", 0), ("ladder64", 64)):
            dt = timeit(run_ladder, csz, n=3, warmup=1)
            rows[name] = dt
        base = rows["full"] / max_len * 1e3
        print(f"B={b}: full {base:.2f} ms/tok ({b*max_len/rows['full']:.0f} tok/s) | "
              + " | ".join(
                  f"{k} {v/max_len*1e3:.2f} (d={base - v/max_len*1e3:+.2f})"
                  for k, v in rows.items() if k != "full"))


def bench_attn_layout():
    """Decode-attention CACHE LAYOUT microbench (round-4: batch decode
    attention measures ~2.6x the dense K/V-read roof).  Simulates the
    per-token attention over a 30-layer stacked cache inside ONE
    program (scan over layers, fori over steps), per layout:

      split    (L,B,H,S,hd)  — the shipped layout (hd=64 minor: TPU
                               (8,128) tiling pads lanes 64->128, 2x?)
      packed   (L,B,H,S,2hd) — K||V dense rows; q zero-padded for the
                               score dot, AV takes the high lanes
      kmajor   (L,B,H,hd,S)  — S minor (268->pad 384, 1.43x); scores
                               contract hd over sublanes, AV contracts S
      flat     (L,B,S,D)     — heads packed in the minor dim (dense),
                               per-head dots via reshape
      readroof (split)       — jnp.sum over the same buffers: pure read
    """
    L, H, hd = 30, 16, 64
    D = H * hd
    S = int(os.environ.get("TTS_ATTN_S", "268"))
    steps = 50
    bs = tuple(int(x) for x in os.environ.get(
        "TTS_DECODE_BS", "1,8,16").split(","))
    scale = 1.0 / (hd ** 0.5)

    for b in bs:
        key = jax.random.PRNGKey(0)
        k_s = jax.random.normal(key, (L, b, H, S, hd), jnp.bfloat16)
        v_s = jax.random.normal(key, (L, b, H, S, hd), jnp.bfloat16)
        q0 = jax.random.normal(key, (b, H, hd), jnp.bfloat16)
        mask = (jnp.arange(S)[None, :] < S - 10)[None]  # (1,1,S)

        def attend(q, kc, vc, packed=False):
            # q (b,H,hd[*2]), kc/vc per layout; matches ops/attention.mha
            # numerics: bf16 operands, fp32 MXU accumulate (an explicit
            # fp32 astype would MATERIALISE a fp32 copy of the cache)
            s = jnp.einsum("bhd,bhsd->bhs", q, kc,
                           preferred_element_type=jnp.float32) * scale
            s = jnp.where(mask, s, -1e30)
            p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
            o = jnp.einsum("bhs,bhsd->bhd", p, vc,
                           preferred_element_type=jnp.float32)
            if packed:
                o = o[..., hd:]
            return o.astype(jnp.bfloat16)

        def run_layers(q, fn, kv):
            def body(q, lkv):
                return fn(q, lkv).reshape(b, H, hd), None

            def step(i, q):
                out, _ = jax.lax.scan(body, q, kv)
                return out

            return jax.lax.fori_loop(0, steps, step, q)

        @jax.jit
        def split(q, kc, vc):
            return run_layers(
                q, lambda qq, lkv: attend(qq, lkv[0], lkv[1]), (kc, vc))

        @jax.jit
        def packed(q, kv):
            qp = jnp.concatenate([q, jnp.zeros_like(q)], axis=-1)

            def fn(qq, lkv):
                qq = jnp.concatenate([qq, jnp.zeros_like(qq)], axis=-1)
                return attend(qq, lkv, lkv, packed=True)

            return run_layers(q, fn, kv)

        @jax.jit
        def kmajor(q, kt, vt):
            def fn(qq, lkv):
                kc, vc = lkv
                s = jnp.einsum("bhd,bhds->bhs", qq, kc,
                               preferred_element_type=jnp.float32) * scale
                s = jnp.where(mask, s, -1e30)
                p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
                return jnp.einsum("bhs,bhds->bhd", p, vc,
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)

            return run_layers(q, fn, (kt, vt))

        @jax.jit
        def flat(q, kf, vf):
            def fn(qq, lkv):
                kc = lkv[0].reshape(b, S, H, hd)
                vc = lkv[1].reshape(b, S, H, hd)
                s = jnp.einsum("bhd,bshd->bhs", qq, kc,
                               preferred_element_type=jnp.float32) * scale
                s = jnp.where(mask, s, -1e30)
                p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
                return jnp.einsum("bhs,bshd->bhd", p, vc,
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)

            return run_layers(q, fn, (kf, vf))

        @jax.jit
        def readroof(q, kc, vc):
            def fn(qq, lkv):
                r = (jnp.sum(lkv[0].astype(jnp.float32), axis=(2, 3))
                     + jnp.sum(lkv[1].astype(jnp.float32), axis=(2, 3)))
                return qq + r[:, :, None].astype(jnp.bfloat16)

            return run_layers(q, fn, (kc, vc))

        @jax.jit
        def int8kv(q, k8, ks, v8, vs):
            # int8 cache via int8 x int8 MXU dots: q is quantized per
            # (b,h) so the score dot runs in the MXU's int8 mode with NO
            # dequant materialisation; scale application is elementwise
            # on the (b,h,s) scores.  AV: p*scale_v quantized to int8.
            def fn(qq, lkv):
                kc, kcs, vc, vcs = lkv     # int8 (b,H,S,hd), bf16 (b,H,S)
                sq = jnp.max(jnp.abs(qq), axis=-1, keepdims=True) / 127.0
                q8 = jnp.round(qq / sq).astype(jnp.int8)
                s = jnp.einsum("bhd,bhsd->bhs", q8, kc,
                               preferred_element_type=jnp.int32)
                s = (s.astype(jnp.float32) * kcs.astype(jnp.float32)
                     * sq.astype(jnp.float32)) * scale
                s = jnp.where(mask, s, -1e30)
                p = jax.nn.softmax(s, axis=-1)
                pv = p * vcs.astype(jnp.float32)           # fold V scale
                sp = jnp.max(pv, axis=-1, keepdims=True) / 127.0
                p8 = jnp.round(pv / sp).astype(jnp.int8)
                o = jnp.einsum("bhs,bhsd->bhd", p8, vc,
                               preferred_element_type=jnp.int32)
                return (o.astype(jnp.float32)
                        * sp.astype(jnp.float32)).astype(jnp.bfloat16)

            return run_layers(q, fn, (k8, ks, v8, vs))

        kv_p = jnp.concatenate([k_s, v_s], axis=-1)
        k_t = jnp.swapaxes(k_s, -1, -2)
        v_t = jnp.swapaxes(v_s, -1, -2)
        k_f = jnp.swapaxes(k_s, 2, 3).reshape(L, b, S, D)
        v_f = jnp.swapaxes(v_s, 2, 3).reshape(L, b, S, D)
        k_sc = jnp.max(jnp.abs(k_s), axis=-1) / 127.0       # (L,b,H,S)
        v_sc = jnp.max(jnp.abs(v_s), axis=-1) / 127.0
        k_8 = jnp.round(k_s / k_sc[..., None]).astype(jnp.int8)
        v_8 = jnp.round(v_s / v_sc[..., None]).astype(jnp.int8)

        gb = (2 * L * b * H * S * hd * 2) / 1e9  # dense K+V bytes
        rows = {
            "split": timeit(split, q0, k_s, v_s, n=3, warmup=1),
            "packed": timeit(packed, q0, kv_p, n=3, warmup=1),
            "kmajor": timeit(kmajor, q0, k_t, v_t, n=3, warmup=1),
            "flat": timeit(flat, q0, k_f, v_f, n=3, warmup=1),
            "int8kv": timeit(int8kv, q0, k_8, k_sc.astype(jnp.bfloat16),
                             v_8, v_sc.astype(jnp.bfloat16), n=3,
                             warmup=1),
            "readroof": timeit(readroof, q0, k_s, v_s, n=3, warmup=1),
        }
        print(f"B={b} S={S} dense {gb*1e3:.0f} MB/step: " + " | ".join(
            f"{k} {v/steps*1e3:.2f} ms ({gb/(v/steps):.0f} GB/s)"
            for k, v in rows.items()))


def bench_diffparts():
    """Decompose the diffusion program intercept: rel-bias precompute,
    timestep_independent, and the latent trim-gather, each as its own
    program at production shapes."""
    from functools import partial

    from tortoise_tts_tpu.models import diffusion as diff_m
    cfg = diff_m.DiffusionConfig()
    p = diff_m.init(jax.random.PRNGKey(0), cfg)
    p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
    T = 1024

    relb = jax.jit(lambda pp: diff_m.precompute_rel_biases(
        pp, T, cfg, jnp.bfloat16))
    dt = timeit(relb, p, n=3, warmup=1)
    print(f"rel_biases T={T}: {dt*1e3:.1f} ms")

    lat = jnp.zeros((1, 224, 1024), jnp.float32)
    cond = jnp.zeros((1, 2048), jnp.float32)
    tsi = jax.jit(partial(diff_m.timestep_independent,
                          expected_seq_len=975, cfg=cfg))
    dt = timeit(lambda: tsi(p, lat, cond), n=3, warmup=1)
    print(f"timestep_independent seq=975: {dt*1e3:.1f} ms")

    full_lat = jnp.zeros((1, 500, 1024), jnp.float32)

    @jax.jit
    def trim(x):
        idx = jnp.minimum(jnp.arange(224)[None, :], 199)
        return jnp.take_along_axis(x, idx[..., None], axis=1)

    dt = timeit(trim, full_lat, n=3, warmup=1)
    print(f"latent trim-gather: {dt*1e3:.1f} ms")


if __name__ == "__main__":
    which = sys.argv[1:] or ["denoiser", "decode", "vocoder"]
    print("backend:", jax.default_backend())
    if "ablate" in which:
        bench_denoiser_ablate()
    if "denoiser" in which:
        bench_denoiser()
    if "decode" in which:
        bench_decode()
    if "roof" in which:
        bench_decode_roof()
    if "roof8" in which:
        bench_decode_roof_int8()
    if "roofq" in which:
        bench_decode_roof_qgemv()
    if "trainstep" in which:
        bench_trainstep()
    if "roofq1024" in which:
        bench_decode_roof_qgemv(block_n=1024)
    if "decablate" in which:
        bench_decode_ablate()
    if "decodebatch" in which:
        bench_decode_batch_matrix()
    if "attnread" in which:
        bench_attn_layout()
    if "roofw8a8" in which:
        bench_decode_roof_qgemv(w8a8=True)
    if "roofw8a8x1024" in which:
        bench_decode_roof_qgemv(block_n=1024, w8a8=True)
    if "vocoder" in which:
        bench_vocoder()
    if "snake" in which:
        bench_snake()
    if "diffparts" in which:
        bench_diffparts()
    if "diffprog" in which:
        bench_diffusion_program()
    if "latent" in which:
        bench_latent_pass()
    if "voctransfer" in which:
        bench_vocoder_transfer()
