"""NaN guards + profiling hooks.

Parity target: /root/reference utils/devices.py (test_for_nans:108-123,
NansException) and the tilevae perfcount decorator (utils/tilevae.py:572-596
wall-clock + peak-memory print). TPU equivalents: jitted finite checks,
jax.profiler trace scopes and per-stage timers with device memory stats.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Any

import jax
import jax.numpy as jnp

log = logging.getLogger("rsvldm")


class NansException(Exception):
    pass


def test_for_nans(x: jnp.ndarray, where: str = "unet") -> None:
    """Raise NansException when the tensor is entirely non-finite
    (devices.py:108-123 triggers on all-NaN; we flag ANY non-finite, which
    is stricter and catches problems earlier)."""
    if not bool(jnp.all(jnp.isfinite(x))):
        hints = {
            "unet": "try a different precision (bf16) or checkpoint",
            "vae": "use fp32/bf16 VAE — fp16 NaNs in the AE (SR_model.py:29)",
        }
        raise NansException(
            f"non-finite values produced in {where}; {hints.get(where, '')}")


def tree_finite(tree) -> bool:
    leaves = jax.tree_util.tree_leaves(tree)
    return all(bool(jnp.all(jnp.isfinite(l))) for l in leaves
               if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating))


@contextlib.contextmanager
def stage_timer(name: str, sync: Any | None = None):
    """Wall-clock a pipeline stage; blocks on `sync` (a jax array) so device
    work is included (the perfcount equivalent)."""
    t0 = time.perf_counter()
    holder = {}
    try:
        yield holder
    finally:
        out = holder.get("out", sync)
        if out is not None:
            jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        mem = ""
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats:
                mem = f", {stats.get('bytes_in_use', 0) / 2**20:.0f} MiB in use"
        except Exception:
            pass
        log.info("[%s] %.3fs%s", name, dt, mem)
        holder["seconds"] = dt


@contextlib.contextmanager
def profile_trace(logdir: str):
    """jax.profiler trace scope — view with TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
