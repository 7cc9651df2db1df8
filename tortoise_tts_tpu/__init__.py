"""tortoise_tts_tpu — a TPU-native (JAX/XLA/Pallas) TTS framework.

A from-scratch re-design of the capabilities of ecker's tortoise-tts
(reference: /root/reference) for TPU hardware:

- The five-model pipeline (UnifiedVoice AR, DiffusionTTS, CLVP, DVAE,
  UnivNet/BigVGAN/HiFiGAN vocoders) implemented as pure-functional JAX
  models over parameter pytrees.
- Fixed-shape, jit-compiled decode/sampling loops (lax.scan / while_loop)
  with a donated KV cache instead of the reference's HF GenerationMixin.
- Diffusion samplers (DDIM / P) as lax.scan over precomputed respaced
  schedule tables, with cond / cond-free batched into one forward.
- Data/tensor parallelism via jax.sharding.Mesh + shard_map, not NCCL.
- Training engine as a pure train_step over a TrainState pytree.

Public API mirrors the reference's entry points:
    from tortoise_tts_tpu import TTS
    tts = TTS(config=...)
    wav, sr = tts.inference("hello world", "reference.wav")
"""

__version__ = "0.1.0"

from .config import Config  # noqa: F401


def __getattr__(name):
    # Lazy import so that `import tortoise_tts_tpu` stays cheap and does not
    # pull in jax at module import (keeps CLI snappy and avoids surprising
    # device initialisation in tooling).
    if name == "TTS":
        from .inference import TTS
        return TTS
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
