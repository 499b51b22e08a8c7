"""LR schedules. Parity target: /root/reference sgm/lr_scheduler.py
(LambdaWarmUpCosineScheduler:4 and the multi-cycle variant 2) as plain
step->multiplier functions usable with optax.scale_by_schedule.
"""

from __future__ import annotations

import math

import numpy as np


def lambda_warmup_cosine(warm_up_steps: int, lr_min: float, lr_max: float,
                         lr_start: float, max_decay_steps: int):
    """Single-cycle warmup + cosine decay returning the LR multiplier."""

    def sched(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        warm = lr_start + (lr_max - lr_start) * step / max(warm_up_steps, 1)
        t = jnp.clip((step - warm_up_steps)
                     / max(max_decay_steps - warm_up_steps, 1), 0.0, 1.0)
        cos = lr_min + 0.5 * (lr_max - lr_min) * (1 + jnp.cos(t * math.pi))
        return jnp.where(step < warm_up_steps, warm, cos)

    return sched


def lambda_warmup_cosine2(warm_up_steps, f_min, f_max, f_start, cycle_lengths):
    """Multi-cycle variant (LambdaWarmUpCosineScheduler2): per-cycle warmup
    then cosine from f_max[c] to f_min[c]."""
    cum = np.cumsum([0] + list(cycle_lengths))

    def sched(step):
        import jax.numpy as jnp
        step = jnp.asarray(step, jnp.float32)
        out = jnp.zeros_like(step)
        done = jnp.zeros_like(step, dtype=bool)
        for c in range(len(cycle_lengths)):
            in_cycle = (step >= cum[c]) & (step < cum[c + 1]) & ~done
            local = step - cum[c]
            warm = f_start[c] + (f_max[c] - f_start[c]) * local \
                / max(warm_up_steps[c], 1)
            t = jnp.clip((local - warm_up_steps[c])
                         / max(cycle_lengths[c] - warm_up_steps[c], 1), 0.0, 1.0)
            cos = f_min[c] + 0.5 * (f_max[c] - f_min[c]) * (1 + jnp.cos(t * math.pi))
            val = jnp.where(local < warm_up_steps[c], warm, cos)
            out = jnp.where(in_cycle, val, out)
            done = done | in_cycle
        return jnp.where(done, out, f_min[-1])

    return sched
