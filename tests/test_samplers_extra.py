"""Extra sampler family tests against analytic denoisers.

For DELTA data at `target`, the ideal denoiser is D(x,sigma)=target and the
probability-flow ODE trajectory is x(sigma) = target + C*sigma — every
consistent sampler must land exactly on `target` at sigma=0.

For GAUSSIAN data N(target, I), D(x,sigma) = (x + sigma^2 t)/(1+sigma^2) and
the ODE solution is x(0) = t + (x(s0)-t)/sqrt(1+s0^2) — used to rank Euler
vs Heun accuracy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.diffusion import samplers_extra as S
from rsvldm_tpu.diffusion.schedules import legacy_ddpm_sigmas, karras_sigmas

TARGET = jnp.ones((1, 8, 8, 2)) * 0.37
NOISE = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 2))


def delta_denoiser(x, sigma):
    return jnp.broadcast_to(TARGET, x.shape)


def gauss_denoiser(x, sigma):
    return (x + sigma**2 * TARGET) / (1 + sigma**2)


@pytest.mark.parametrize("name,fn,kw,tol", [
    ("edm", S.edm_sample, {}, 1e-4),
    ("heun", S.edm_sample, dict(heun=True), 1e-4),
    ("euler_anc", S.euler_ancestral_sample, {}, 0.15),  # injects noise
    ("dpmpp2s", S.dpmpp2s_ancestral_sample, {}, 0.15),
    ("dpmpp2m", S.dpmpp2m_sample, {}, 1e-3),
])
def test_samplers_converge_delta(name, fn, kw, tol):
    sigmas = legacy_ddpm_sigmas(30)
    out = fn(delta_denoiser, NOISE, sigmas, jax.random.PRNGKey(1), **kw)
    err = float(jnp.abs(out - TARGET).mean())
    assert err < tol, (name, err)


def test_edm_gaussian_matches_analytic():
    """ODE solution for Gaussian data: x(0) = t + (x(s0)-t)/sqrt(1+s0^2)."""
    sigmas = legacy_ddpm_sigmas(500)
    out = S.edm_sample(gauss_denoiser, NOISE, sigmas, jax.random.PRNGKey(1),
                       heun=True)
    s0 = float(sigmas[0])
    x0 = NOISE * np.sqrt(1 + s0**2)
    expected = TARGET + (x0 - TARGET) / np.sqrt(1 + s0**2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=0.02)


def test_linear_multistep_converges():
    sigmas = karras_sigmas(20, 0.02, 20.0)
    out = S.linear_multistep_sample(delta_denoiser, NOISE, sigmas)
    assert float(jnp.abs(out - TARGET).mean()) < 0.05


def test_heun_more_accurate_than_euler():
    sigmas = karras_sigmas(8, 0.05, 20.0)
    s0 = float(sigmas[0])
    expected = TARGET + (NOISE * np.sqrt(1 + s0**2) - TARGET) / np.sqrt(1 + s0**2)
    e = S.edm_sample(gauss_denoiser, NOISE, sigmas, jax.random.PRNGKey(1))
    h = S.edm_sample(gauss_denoiser, NOISE, sigmas, jax.random.PRNGKey(1),
                     heun=True)
    err_e = float(jnp.abs(e - expected).mean())
    err_h = float(jnp.abs(h - expected).mean())
    assert err_h < err_e


def test_substep_sigmas():
    s = np.asarray(S.substep_sigmas(4))
    assert s.shape == (5,)
    # golden values: indices [0,100,200,300,1000] into the reference's
    # DESCENDING 1001-entry LegacyDDPM table (sampling.py:375-381)
    np.testing.assert_allclose(
        s, [14.6146, 8.3028, 5.0878, 3.3211, 0.0], atol=2e-3)
    # truncation keeps the HIGH-sigma end + terminal zero
    s2 = np.asarray(S.substep_sigmas(2))
    np.testing.assert_allclose(s2, [14.6146, 8.3028, 0.0], atol=2e-3)


def test_restore_dpmpp2m():
    # eta folds into the update and injects per-step noise (sampling.py:
    # 421-485, default eta=1); eta=0 reduces to the deterministic DPM++(2M)
    # update on the class's Karras-re-ramped schedule
    sigmas = legacy_ddpm_sigmas(10)
    rng = jax.random.PRNGKey(3)
    a = S.restore_dpmpp2m_sample(gauss_denoiser, NOISE, sigmas, rng)
    b = S.restore_dpmpp2m_sample(gauss_denoiser, NOISE, sigmas, rng,
                                 eta=0.0)
    assert not np.allclose(np.asarray(a), np.asarray(b))  # eta matters
    # deterministic in rng
    a2 = S.restore_dpmpp2m_sample(gauss_denoiser, NOISE, sigmas, rng)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
    # delta-data convergence (final sigma->0 step lands on the denoiser)
    d = S.restore_dpmpp2m_sample(delta_denoiser, NOISE, sigmas, rng)
    assert float(jnp.abs(d - TARGET).mean()) < 1e-3


def test_sliding_windows():
    wins = S.sliding_windows(16, 24, 8, 8)
    assert (0, 8, 0, 8) in wins and (8, 16, 16, 24) in wins
    wins = S.sliding_windows(20, 8, 8, 8)
    assert (12, 20, 0, 8) in wins


def test_tiled_restore_edm_matches_untiled_for_local_denoiser():
    """With a pointwise denoiser, tiled and whole-image sampling agree
    exactly (gaussian blending of identical values is a no-op)."""
    sigmas = legacy_ddpm_sigmas(6)
    whole = S.edm_sample(delta_denoiser, NOISE, sigmas, jax.random.PRNGKey(1))

    def denoise_tile_fn(tiles, sigma, lq_tiles):
        return jnp.broadcast_to(TARGET[:, :tiles.shape[1], :tiles.shape[2], :],
                                tiles.shape)

    lq = jnp.zeros_like(NOISE)
    tiled = S.tiled_restore_edm_sample(denoise_tile_fn, NOISE, sigmas,
                                       jnp.zeros_like(NOISE), lq,
                                       jax.random.PRNGKey(1), tile=4, stride=4)
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(whole), atol=1e-4)


def test_tiled_restore_dpmpp2m_single_tile_equals_untiled():
    # one window covering the canvas: weights normalize out, the eps
    # slice is the full canvas — must reproduce restore_dpmpp2m_sample
    # (same Brownian tree, same rng) to fp32 rounding
    sigmas = legacy_ddpm_sigmas(8)
    rng = jax.random.PRNGKey(5)
    lq = jax.random.normal(jax.random.PRNGKey(6), NOISE.shape)
    a = S.restore_dpmpp2m_sample(gauss_denoiser, NOISE, sigmas, rng)
    b = S.tiled_restore_dpmpp2m_sample(
        lambda t, s, _lq: gauss_denoiser(t, s), NOISE, sigmas, lq, rng,
        tile=8, stride=8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_tiled_restore_dpmpp2m_multi_tile():
    # overlapping 3x3 grid (reference tile=128, stride=64 geometry scaled
    # down): runs green, finite, deterministic in rng, converges for the
    # delta denoiser, and the lq control slices reach the denoiser
    noise = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 2))
    target = jnp.ones((1, 16, 16, 2)) * 0.37
    lq = jax.random.normal(jax.random.PRNGKey(2), noise.shape)
    sigmas = legacy_ddpm_sigmas(12)
    seen = []

    def den(t, s, lq_tiles):
        seen.append(lq_tiles.shape)
        return jnp.broadcast_to(target[:, :8, :8, :], t.shape)

    out = S.tiled_restore_dpmpp2m_sample(den, noise, sigmas, lq,
                                         jax.random.PRNGKey(3),
                                         tile=8, stride=4, eta=0.0)
    assert seen[0] == (9, 8, 8, 2)  # 3x3 windows stacked on batch
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.broadcast_to(target, out.shape)),
                               atol=1e-3)
    out2 = S.tiled_restore_dpmpp2m_sample(den, noise, sigmas, lq,
                                          jax.random.PRNGKey(3),
                                          tile=8, stride=4, eta=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
