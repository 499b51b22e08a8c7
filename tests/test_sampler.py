"""RestoreEDM sampler + first-block cache semantics tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.diffusion import samplers
from rsvldm_tpu.diffusion.samplers import RestoreEDMConfig, restore_edm_sample
from rsvldm_tpu.diffusion.schedules import legacy_ddpm_sigmas
from rsvldm_tpu.models.sdxl.denoiser import PartialState


class FakeDenoiser:
    """Denoiser whose prediction is `factor * x`; first-block feature is the
    current x mean (changes every step -> controllable cache behavior)."""

    def __init__(self, factor=-1.0, constant_h=False):
        self.factor = factor
        self.constant_h = constant_h

    def first_block_shape(self, n, h, w):
        return (n, 1, 1, 1)

    def first(self, x, sigma, cond):
        n = x.shape[0]
        if self.constant_h:
            h = jnp.ones((n, 1, 1, 1))
        else:
            h = jnp.mean(x, axis=(1, 2, 3), keepdims=True) + \
                jnp.full((n, 1, 1, 1), jnp.sum(sigma) * 0.001)
        return PartialState(h=h, hs=[], emb=jnp.zeros(()), control=[], x=x,
                            c_skip=jnp.ones(()), c_out=jnp.ones(()))

    def rest(self, p, cond, control_scale):
        return p.x * self.factor


CFG_BASE = RestoreEDMConfig(num_steps=6, s_churn=0.0, restore_cfg=-1.0,
                            use_linear_cfg=False, cfg_scale=1.0)
COND = dict(crossattn=jnp.zeros((1, 1, 1)), vector=jnp.zeros((1, 1)),
            control=jnp.zeros((1, 4, 4, 4)))


def _run(cfg, factor=-1.0, constant_h=False, seed=0):
    noise = jax.random.normal(jax.random.PRNGKey(seed), (1, 4, 4, 4))
    xc = jnp.zeros_like(noise)
    return restore_edm_sample(FakeDenoiser(factor, constant_h), COND, COND,
                              noise, xc, cfg, jax.random.PRNGKey(1))


def test_cache_off_equals_never_hit():
    """threshold<=0 (disabled) == never-hitting cache: the cache plumbing
    must not perturb the math (SURVEY §4 contract).

    NOTE the threshold is ADAPTIVE (reference just_sampling updates it to
    the measured diff each miss, SR_model.py:276-291), so a tiny initial
    threshold does NOT stay tiny; dec_img=0 forces it to 0 after every step,
    and diff < 0 never holds -> guaranteed all-miss."""
    off = _run(dataclasses.replace(CFG_BASE, img_threshold=0.0))
    nohit = _run(dataclasses.replace(CFG_BASE, img_threshold=1e-12, dec_img=0.0))
    np.testing.assert_allclose(np.array(off), np.array(nohit), atol=1e-6)


def test_cache_always_hit_freezes_denoised():
    """With a huge threshold every step after the first reuses the cached
    prediction; verify against a NumPy re-simulation of that trajectory."""
    cfg = dataclasses.replace(CFG_BASE, img_threshold=1e9)
    out = _run(cfg, factor=-1.0)

    sigmas = np.array(legacy_ddpm_sigmas(cfg.num_steps))
    noise = np.array(jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4)))
    x = noise * np.sqrt(1 + sigmas[0] ** 2)
    denoised = -x  # step-0 miss: factor * x0, CFG(scale=1, equal halves) = same
    for i in range(len(sigmas) - 1):
        d = (x - denoised) / sigmas[i]
        x = x + d * (sigmas[i + 1] - sigmas[i])
        # cache hit on every later step: denoised stays frozen
    np.testing.assert_allclose(np.array(out), x, rtol=1e-4)


def test_cache_on_differs_from_off():
    on = _run(dataclasses.replace(CFG_BASE, img_threshold=1e9))
    off = _run(dataclasses.replace(CFG_BASE, img_threshold=0.0))
    assert not np.allclose(np.array(on), np.array(off))


def test_no_cache_matches_manual_euler():
    """Cache off, factor=-1 -> x_{i+1} = x_i + 2 x_i (s_{i+1}-s_i)/s_i."""
    out = _run(dataclasses.replace(CFG_BASE, img_threshold=0.0))
    sigmas = np.array(legacy_ddpm_sigmas(CFG_BASE.num_steps))
    noise = np.array(jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4)))
    x = noise * np.sqrt(1 + sigmas[0] ** 2)
    for i in range(len(sigmas) - 1):
        x = x + 2 * x * (sigmas[i + 1] - sigmas[i]) / sigmas[i]
    np.testing.assert_allclose(np.array(out), x, rtol=1e-4)


def test_restore_cfg_drift():
    """restore_cfg > 0 pulls the prediction toward x_center at high sigma."""
    cfg = dataclasses.replace(CFG_BASE, img_threshold=0.0, restore_cfg=4.0)
    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, 4))
    xc = jnp.ones_like(noise) * 5.0
    with_rc = restore_edm_sample(FakeDenoiser(0.0), COND, COND, noise, xc,
                                 cfg, jax.random.PRNGKey(1))
    without = restore_edm_sample(
        FakeDenoiser(0.0), COND, COND, noise, xc,
        dataclasses.replace(cfg, restore_cfg=-1.0), jax.random.PRNGKey(1))
    assert not np.allclose(np.array(with_rc), np.array(without))


def test_churn_noise_applied():
    cfg = dataclasses.replace(CFG_BASE, img_threshold=0.0, s_churn=5.0)
    a = _run(cfg)
    b = _run(dataclasses.replace(CFG_BASE, img_threshold=0.0))
    assert not np.allclose(np.array(a), np.array(b))


def test_linear_cfg_schedule_values():
    cfg = RestoreEDMConfig(use_linear_cfg=True, cfg_scale=7.5, cfg_scale_start=4.0)
    # at sigma_max the scale is cfg_scale_start, at 0 it's cfg_scale
    assert np.isclose(float(cfg.cfg_at(jnp.float32(14.6146))), 4.0, atol=1e-4)
    assert np.isclose(float(cfg.cfg_at(jnp.float32(0.0))), 7.5)


def test_linear_control_scale():
    cfg = RestoreEDMConfig(use_linear_control_scale=True, control_scale=1.0,
                           control_scale_start=0.0)
    assert np.isclose(float(cfg.control_scale_at(jnp.float32(14.6146))), 0.0)
    assert np.isclose(float(cfg.control_scale_at(jnp.float32(0.0))), 1.0)


def test_cache_hit_counter():
    """return_aux exposes the on-device hit count (observability parity with
    DFBCache VERBOSE_SIMILARITY)."""
    cfg = dataclasses.replace(CFG_BASE, img_threshold=1e9)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    xc = jnp.zeros_like(noise)
    out, aux = restore_edm_sample(FakeDenoiser(-1.0), COND, COND, noise, xc,
                                  cfg, jax.random.PRNGKey(1), return_aux=True)
    # huge threshold: every step after the first hits
    assert int(aux["cache_hits"]) == aux["num_steps"] - 1
    assert aux["thresholds"].shape == (aux["num_steps"],)

    _, aux0 = restore_edm_sample(
        FakeDenoiser(-1.0), COND, COND, noise, xc,
        dataclasses.replace(CFG_BASE, img_threshold=1e-12, dec_img=0.0),
        jax.random.PRNGKey(1), return_aux=True)
    assert int(aux0["cache_hits"]) == 0
