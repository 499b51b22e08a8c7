"""Persistent XLA compilation cache for every CLI entry point.

The reference pays its CUDA warmup every run; on TPU the first compile of each
program costs 20-40 s through the remote-compile path, repeated on every
process start. JAX's persistent compilation cache removes that for warm
restarts: compiled executables are keyed on (HLO, flags, backend) and
reloaded from disk, so a second `infer.py` run skips straight to execution.

Opt-out with RSVLDM_COMPILE_CACHE=0; override the location with
RSVLDM_COMPILE_CACHE_DIR (default ~/.cache/rsvldm_tpu/xla).
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "rsvldm_tpu", "xla")


def enable_compilation_cache(directory: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a disk directory.

    Call before the first jit dispatch (CLIs call it right after argument
    parsing). Returns the cache dir, or None when disabled/unavailable.
    min_compile_time 1 s keeps trivial programs (host-side glue jits) out
    of the cache; every model-scale program clears it easily."""
    if os.environ.get("RSVLDM_COMPILE_CACHE", "1") == "0":
        return None
    directory = (directory or os.environ.get("RSVLDM_COMPILE_CACHE_DIR")
                 or _DEFAULT_DIR)
    try:
        import jax
        os.makedirs(directory, exist_ok=True)
        changed = jax.config.jax_compilation_cache_dir != directory
        jax.config.update("jax_compilation_cache_dir", directory)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        if changed:
            # jax's cache is a lazily-created singleton bound to the dir
            # it FIRST initialized with — without a reset, re-pointing the
            # config is silently ignored for the rest of the process
            # (surfaced as the round-4 test_compile_cache ordering flake)
            try:
                from jax._src import compilation_cache as _cc
                _cc.reset_cache()
            except Exception:
                pass
    except Exception as e:  # never fail an entry point over a cache
        log.warning("compilation cache unavailable: %s", e)
        return None
    return directory


def cli_setup(platform: str | None = None) -> None:
    """Shared entry-point preamble for every CLI: force a jax platform
    BEFORE the first backend touch (the axon sitecustomize wins over the
    JAX_PLATFORMS env var, so this must go through jax.config), join the
    multi-process runtime when the RSVLDM_COORDINATOR/RSVLDM_DISTRIBUTED
    env rendezvous is set (no-op otherwise — see parallel/distributed.py),
    and point the persistent compilation cache at disk."""
    if platform:
        import jax
        jax.config.update("jax_platforms", platform)
    from ..parallel.distributed import init_distributed
    init_distributed()
    enable_compilation_cache()
