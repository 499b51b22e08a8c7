"""Persistent XLA compilation cache (utils/compile_cache.py)."""

import os
import random

import jax
import jax.numpy as jnp

from rsvldm_tpu.utils.compile_cache import enable_compilation_cache


def test_enable_sets_config_and_writes_entries(tmp_path, monkeypatch):
    d = str(tmp_path / "xla")
    assert enable_compilation_cache(d) == d
    assert os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d
    # drop the time floor so this tiny program qualifies for the cache
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # fold a per-run-unique constant into the program: if any earlier test
    # in the session compiled the same HLO, jax's in-memory executable
    # cache would satisfy this jit without ever touching the persistent
    # cache and the listdir assert below would flake (round-4 review
    # Weak #1 — deterministic failure in any multi-file run)
    salt = jnp.float32(random.random() + 2.0)
    try:
        jax.jit(lambda x: (x * salt + jnp.float32(1)).sum())(
            jnp.arange(8, dtype=jnp.float32)).block_until_ready()
        assert os.listdir(d), "no cache entry written"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_compilation_cache_dir", None)


def test_env_opt_out(tmp_path, monkeypatch):
    monkeypatch.setenv("RSVLDM_COMPILE_CACHE", "0")
    assert enable_compilation_cache(str(tmp_path / "nope")) is None
    assert not os.path.exists(str(tmp_path / "nope"))
