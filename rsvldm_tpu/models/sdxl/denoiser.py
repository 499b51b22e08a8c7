"""Discrete EDM-preconditioned denoiser bound to the controlled SDXL UNet.

Parity target: /root/reference sgm/modules/diffusionmodules/denoiser.py
(DiscreteDenoiser sigma quantization :31-63, DiscreteDenoiserWithControl
:66-78) with EpsScaling and the LegacyDDPM 1000-entry sigma table
(juggernautXL.yaml:10-19).

D(x, sigma) = c_skip*x + c_out*F(c_in*x, idx(sigma), cond) where sigma is
quantized to the nearest table entry and the network timestep is the integer
table index. Split into `first` (ControlNet + UNet input blocks — always run)
and `rest` (middle + injected decode — gated by the first-block cache).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp

from ...diffusion import scalings
from ...diffusion.schedules import legacy_ddpm_sigmas, sigma_to_idx
from .control import ControlledUNet, GLVControl


@dataclasses.dataclass
class PartialState:
    """Carry between `first` and `rest` (reference partial_info dict)."""
    h: jnp.ndarray          # last input-block feature (cache key)
    hs: list                # skip features
    emb: jnp.ndarray
    control: list           # GLVControl multiscale features
    x: jnp.ndarray          # raw (unscaled) noisy latent
    c_skip: jnp.ndarray
    c_out: jnp.ndarray


@dataclasses.dataclass
class ControlDenoiser:
    """Functional denoiser: holds modules + params, pure methods."""
    unet: ControlledUNet
    control_net: GLVControl
    unet_params: Any
    control_params: Any
    num_idx: int = 1000

    def __post_init__(self):
        # ascending full sigma table (denoiser flip=True, no appended zero)
        self.sigma_table = legacy_ddpm_sigmas(
            self.num_idx, do_append_zero=False, flip=True)

    def _precondition(self, sigma: jnp.ndarray):
        idx = sigma_to_idx(sigma, self.sigma_table)
        sigma_q = self.sigma_table[idx]
        s4 = sigma_q.reshape(-1, 1, 1, 1)
        c_skip, c_out, c_in, _ = scalings.eps_scaling(s4)
        return idx, c_skip, c_out, c_in

    def first_block_shape(self, n: int, h: int, w: int):
        """Shape of the last input-block feature for a [n, h, w, 4] latent
        batch — the first-block-cache key."""
        cfg = self.unet.cfg
        ds = 2 ** (len(cfg.channel_mult) - 1)
        return (n, h // ds, w // ds,
                cfg.model_channels * cfg.channel_mult[-1])

    def first(self, x: jnp.ndarray, sigma: jnp.ndarray,
              cond: Dict[str, jnp.ndarray]) -> PartialState:
        """ControlNet + UNet input blocks on the (CFG-doubled) batch."""
        idx, c_skip, c_out, c_in = self._precondition(sigma)
        x_in = x * c_in
        control = self.control_net.apply(
            self.control_params, cond["control"], x_in, idx,
            cond["crossattn"], cond["vector"])
        h, hs, emb = self.unet.apply(
            self.unet_params, x_in, idx, cond["crossattn"], cond["vector"],
            method=self.unet.input_stage)
        return PartialState(h=h, hs=hs, emb=emb, control=control, x=x,
                            c_skip=c_skip, c_out=c_out)

    def rest(self, p: PartialState, cond: Dict[str, jnp.ndarray],
             control_scale) -> jnp.ndarray:
        """Middle + injected decode + preconditioning -> denoised (pre-CFG)."""
        f = self.unet.apply(
            self.unet_params, p.h, p.hs, p.emb, cond["crossattn"], p.control,
            control_scale, method=self.unet.rest_stage)
        return f * p.c_out + p.x * p.c_skip

    def __call__(self, x, sigma, cond, control_scale=1.0):
        p = self.first(x, sigma, cond)
        return self.rest(p, cond, control_scale)
