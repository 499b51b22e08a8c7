"""Force tests onto a virtual 8-device CPU mesh.

The axon sitecustomize registers the remote-TPU backend in every interpreter
and sets jax_platforms="axon,cpu" via jax.config (which wins over the
JAX_PLATFORMS env var), so we must counter-override through jax.config —
before any backend is used.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
