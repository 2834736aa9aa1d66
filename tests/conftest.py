"""Test config: run everything on a virtual 8-device CPU mesh.

Real-TPU behavior is exercised by bench.py / the driver; unit tests must be
hermetic and fast, and validate sharding on host CPU devices. The container's
axon sitecustomize force-registers the TPU plugin and sets
JAX_PLATFORMS=axon, so we override the config explicitly before any backend
initializes (env alone is not enough — the plugin prepends itself).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

assert jax.default_backend() == "cpu", jax.default_backend()
