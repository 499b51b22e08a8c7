"""SR3 UNet + diffusion tests on a tiny config (CPU, few steps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.models.sr3 import SR3UNet, SR3UNetConfig, SR3Diffusion, sr3_sample, sr3_loss
from rsvldm_tpu.models.sr3.unet import noise_level_embedding

TINY = SR3UNetConfig(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
                     attn_res=(8,), res_blocks=1, image_size=16)


@pytest.fixture(scope="module")
def unet_and_params():
    model = SR3UNet(TINY)
    x = jnp.zeros((1, 16, 16, 6))
    nl = jnp.ones((1, 1)) * 0.5
    params = model.init(jax.random.PRNGKey(0), x, nl)
    return model, params


def test_noise_level_embedding_shape():
    e = noise_level_embedding(jnp.array([0.5, 0.9]), 64)
    assert e.shape == (2, 64)
    # first half sin, second half cos; at step 0, sin(nl), cos(nl)
    np.testing.assert_allclose(float(e[0, 0]), np.sin(0.5), rtol=1e-5)
    np.testing.assert_allclose(float(e[0, 32]), np.cos(0.5), rtol=1e-5)


def test_unet_forward_shape(unet_and_params):
    model, params = unet_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 6))
    nl = jnp.ones((2, 1)) * 0.7
    out = model.apply(params, x, nl)
    assert out.shape == (2, 16, 16, 3)
    assert jnp.all(jnp.isfinite(out))


def test_unet_attn_levels():
    """attn_res selects the level whose input resolution matches."""
    model = SR3UNet(TINY)
    x = jnp.zeros((1, 16, 16, 6))
    params = model.init(jax.random.PRNGKey(0), x, jnp.ones((1, 1)))
    names = set(params["params"].keys())
    # 16 -> level0 res16 (no attn), level1 res8 (attn); mid always attn
    assert "down_1_0" in names and "mid_0" in names
    assert "attn" in params["params"]["down_1_0"]
    assert "attn" not in params["params"]["down_0_0"]


def test_sr3_sample_few_steps(unet_and_params):
    model, params = unet_and_params
    diff = SR3Diffusion.from_schedule(n_timestep=4)
    cond = jnp.zeros((1, 16, 16, 3))
    apply_fn = lambda p, x, nl: model.apply(p, x, nl)
    out = jax.jit(lambda p, c, r: sr3_sample(diff, apply_fn, p, c, r))(
        params, cond, jax.random.PRNGKey(42))
    assert out.shape == (1, 16, 16, 3)
    assert jnp.all(jnp.isfinite(out))


def test_sr3_sample_deterministic(unet_and_params):
    model, params = unet_and_params
    diff = SR3Diffusion.from_schedule(n_timestep=3)
    cond = jnp.zeros((1, 16, 16, 3))
    apply_fn = lambda p, x, nl: model.apply(p, x, nl)
    a = sr3_sample(diff, apply_fn, params, cond, jax.random.PRNGKey(7))
    b = sr3_sample(diff, apply_fn, params, cond, jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.array(a), np.array(b))


def test_sr3_loss(unet_and_params):
    model, params = unet_and_params
    diff = SR3Diffusion.from_schedule(n_timestep=10)
    hr = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3)) * 0.5
    sr = jnp.zeros_like(hr)
    apply_fn = lambda p, x, nl: model.apply(p, x, nl)
    loss = sr3_loss(diff, apply_fn, params, hr, sr, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))
    # gradient flows
    g = jax.grad(lambda p: sr3_loss(diff, apply_fn, p, hr, sr, jax.random.PRNGKey(3)))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_ddim_eta1_fullsteps_equals_ancestral():
    """DDIM with eta=1 at the full step count reduces algebraically to the
    ancestral sampler (sigma^2 = DDPM posterior variance + posterior-mean
    identity) — bitwise-comparable since both draw fold_in(rng, t) noise."""
    from rsvldm_tpu.models.sr3 import (SR3Diffusion, SR3UNet, SR3UNetConfig,
                                       sr3_sample, sr3_sample_ddim)
    cfg = SR3UNetConfig(inner_channel=8, norm_groups=4, channel_mults=(1, 2),
                        attn_res=(4,), res_blocks=1, image_size=8)
    model = SR3UNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 6)),
                        jnp.ones((1, 1)))
    diff = SR3Diffusion.from_schedule(n_timestep=6)
    apply_fn = lambda p, x, nl: model.apply(p, x, nl)
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3)) * 0.3
    rng = jax.random.PRNGKey(2)
    anc = sr3_sample(diff, apply_fn, params, cond, rng)
    ddim = sr3_sample_ddim(diff, apply_fn, params, cond, rng,
                           num_steps=6, eta=1.0)
    np.testing.assert_allclose(np.asarray(ddim), np.asarray(anc),
                               atol=1e-4, rtol=1e-3)


def test_ddim_fewstep_deterministic():
    from rsvldm_tpu.models.sr3 import (SR3Diffusion, SR3UNet, SR3UNetConfig,
                                       sr3_sample_ddim)
    cfg = SR3UNetConfig(inner_channel=8, norm_groups=4, channel_mults=(1, 2),
                        attn_res=(4,), res_blocks=1, image_size=8)
    model = SR3UNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 6)),
                        jnp.ones((1, 1)))
    diff = SR3Diffusion.from_schedule(n_timestep=100)
    apply_fn = lambda p, x, nl: model.apply(p, x, nl)
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 3)) * 0.3
    a = sr3_sample_ddim(diff, apply_fn, params, cond, jax.random.PRNGKey(3),
                        num_steps=8, eta=0.0)
    # eta=0: only the INITIAL x_T draw depends on rng; same rng -> identical
    b = sr3_sample_ddim(diff, apply_fn, params, cond, jax.random.PRNGKey(3),
                        num_steps=8, eta=0.0)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert np.all(np.isfinite(np.asarray(a)))
