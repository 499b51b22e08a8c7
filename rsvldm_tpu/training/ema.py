"""Exponential moving average of a param pytree.

Parity target: /root/reference sgm/modules/ema.py (LitEma buffer mirror with
warmup decay min((1+step)/(10+step), decay)) and the SR3 EMA config
(configs/sr_sr3.json:87-91). Pure pytree ops — composes with pjit; the EMA
state shards exactly like the params.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any
    step: jnp.ndarray


def ema_init(params) -> EmaState:
    return EmaState(params=jax.tree_util.tree_map(jnp.asarray, params),
                    step=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, new_params, decay: float = 0.9999,
               use_warmup: bool = True) -> EmaState:
    step = state.step + 1
    if use_warmup:
        d = jnp.minimum((1.0 + step) / (10.0 + step), decay)
    else:
        d = jnp.asarray(decay)
    ema = jax.tree_util.tree_map(
        lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype),
        state.params, new_params)
    return EmaState(params=ema, step=step)
