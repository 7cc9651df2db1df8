"""Test env: force CPU JAX with an 8-device virtual mesh.

The container's sitecustomize registers the axon TPU PJRT plugin and
pins jax_platforms to it; tests must run on the host CPU backend with 8
virtual devices for mesh/sharding coverage, so override the config
before any backend is initialised.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
# never attempt weight downloads from tests (zero-egress environment)
os.environ.setdefault("TORTOISE_TPU_OFFLINE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
