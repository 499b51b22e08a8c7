"""End-to-end RestoreEDM sampling through the real (tiny) SDXL+ControlNet."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.diffusion.samplers import RestoreEDMConfig, restore_edm_sample
from rsvldm_tpu.models.sdxl import SDXLUNetConfig, UNetModel, GLVControl, ControlledUNet
from rsvldm_tpu.models.sdxl.denoiser import ControlDenoiser

TINY = SDXLUNetConfig(model_channels=32, num_res_blocks=1,
                      attention_resolutions=(2,), channel_mult=(1, 2),
                      num_head_channels=16, transformer_depth=(1, 1),
                      context_dim=64, adm_in_channels=40)


@pytest.fixture(scope="module")
def denoiser():
    rng = jax.random.PRNGKey(0)
    unet = ControlledUNet(TINY)
    control = GLVControl(TINY)
    lat = jnp.zeros((2, 8, 8, 4))
    t = jnp.zeros((2,))
    ctx = jnp.zeros((2, 7, 64))
    y = jnp.zeros((2, 40))
    cparams = control.init(rng, lat, lat, t, ctx, y)
    feats = control.apply(cparams, lat, lat, t, ctx, y)
    uparams = unet.init(rng, lat, t, ctx, y, feats)
    return ControlDenoiser(unet=unet, control_net=control,
                           unet_params=uparams, control_params=cparams)


def _cond(n=1):
    return dict(crossattn=jnp.ones((n, 7, 64)) * 0.1,
                vector=jnp.ones((n, 40)) * 0.1,
                control=jnp.ones((n, 8, 8, 4)) * 0.1)


def test_e2e_sampling_runs(denoiser):
    cfg = RestoreEDMConfig(num_steps=3, s_churn=5.0, img_threshold=0.3,
                           restore_cfg=4.0)
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    xc = jnp.zeros_like(noise)
    out = jax.jit(lambda n, r: restore_edm_sample(
        denoiser, _cond(), _cond(), n, xc, cfg, r))(noise, jax.random.PRNGKey(2))
    assert out.shape == (1, 8, 8, 4)
    assert jnp.all(jnp.isfinite(out))


def test_e2e_deterministic(denoiser):
    cfg = RestoreEDMConfig(num_steps=2, s_churn=0.0, img_threshold=0.3)
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
    xc = jnp.zeros_like(noise)
    a = restore_edm_sample(denoiser, _cond(), _cond(), noise, xc, cfg,
                           jax.random.PRNGKey(4))
    b = restore_edm_sample(denoiser, _cond(), _cond(), noise, xc, cfg,
                           jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.array(a), np.array(b))


def test_denoiser_sigma_quantization(denoiser):
    # sigma exactly on the table quantizes to itself
    s = denoiser.sigma_table[500]
    idx, c_skip, c_out, c_in = denoiser._precondition(jnp.array([float(s)]))
    assert int(idx[0]) == 500
    np.testing.assert_allclose(float(c_out[0, 0, 0, 0]), -float(s), rtol=1e-6)
    np.testing.assert_allclose(float(c_in[0, 0, 0, 0]),
                               1.0 / np.sqrt(float(s) ** 2 + 1), rtol=1e-6)
