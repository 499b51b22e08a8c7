"""Golden-value tests for schedules/scalings/guidance against the published
formulas (computed independently here with NumPy — not imported from torch)."""

import numpy as np
import pytest

from rsvldm_tpu.diffusion import schedules, scalings, guidance


def test_linear_beta_schedule():
    b = schedules.make_beta_schedule("linear", 2000, 1e-6, 1e-2)
    assert b.shape == (2000,)
    assert np.isclose(b[0], 1e-6) and np.isclose(b[-1], 1e-2)
    assert np.all(np.diff(b) > 0)


def test_quad_warmup_const_jsd_cosine():
    for name in ["quad", "warmup10", "warmup50", "const", "jsd", "cosine"]:
        b = schedules.make_beta_schedule(name, 100)
        assert b.shape == (100,)
        assert np.all(b > 0) and np.all(b <= 1.0)


def test_ddpm_buffers_identities():
    b = schedules.make_beta_schedule("linear", 500, 1e-6, 1e-2)
    buf = schedules.ddpm_buffers(b)
    acp = np.cumprod(1 - b)
    np.testing.assert_allclose(buf.alphas_cumprod, acp, rtol=1e-6)
    # sqrt_alphas_cumprod_prev has length T+1 with leading 1
    assert buf.sqrt_alphas_cumprod_prev.shape == (501,)
    assert np.isclose(buf.sqrt_alphas_cumprod_prev[0], 1.0)
    # posterior mean coefs sum: coef1 + coef2*sqrt(acp_t/acp_{t-1}) relation holds
    np.testing.assert_allclose(
        buf.posterior_variance,
        b * (1 - np.append(1, acp[:-1])) / (1 - acp), rtol=1e-5)
    # x0-prediction identity: sqrt_recip^2 - sqrt_recipm1^2 == 1
    np.testing.assert_allclose(
        np.array(buf.sqrt_recip_alphas_cumprod) ** 2
        - np.array(buf.sqrt_recipm1_alphas_cumprod) ** 2,
        np.ones(500), rtol=1e-3)


def test_legacy_ddpm_sigmas():
    s = schedules.legacy_ddpm_sigmas(1000)
    assert s.shape == (1001,)
    # descending, terminal zero, sigma_max matches LinearCFG constant
    assert s[-1] == 0.0
    assert np.all(np.diff(np.array(s[:-1])) < 0)
    assert abs(float(s[0]) - 14.6146) < 1e-3

    s50 = schedules.legacy_ddpm_sigmas(50)
    assert s50.shape == (51,)
    assert float(s50[0]) == float(s[0])  # first subset step is t=999


def test_equally_spaced_steps():
    t = schedules.equally_spaced_steps(50, 1000)
    assert t.shape == (50,)
    assert t[-1] == 999 and t[0] == 19
    assert np.all(np.diff(t) == 20)


def test_karras_sigmas():
    s = schedules.karras_sigmas(10, 0.02, 80.0, 7.0)
    assert np.isclose(float(s[0]), 80.0, rtol=1e-5)
    assert np.isclose(float(s[-2]), 0.02, rtol=1e-5)
    assert s[-1] == 0.0


def test_sigma_to_idx_roundtrip():
    table = schedules.legacy_ddpm_sigmas(1000, do_append_zero=False, flip=True)  # ascending
    idx = schedules.sigma_to_idx(np.array([float(table[3]), float(table[700])]), table)
    np.testing.assert_array_equal(np.array(idx), [3, 700])


def test_eps_scaling():
    sigma = np.array([0.5, 1.0, 14.6], dtype=np.float32)
    c_skip, c_out, c_in, c_noise = scalings.eps_scaling(sigma)
    np.testing.assert_allclose(c_skip, 1.0)
    np.testing.assert_allclose(c_out, -sigma)
    np.testing.assert_allclose(c_in, 1 / np.sqrt(sigma**2 + 1), rtol=1e-6)
    np.testing.assert_allclose(c_noise, sigma)


def test_v_scaling():
    sigma = np.array([2.0], dtype=np.float32)
    c_skip, c_out, c_in, _ = scalings.v_scaling(sigma)
    np.testing.assert_allclose(c_skip, 1 / 5.0, rtol=1e-6)
    np.testing.assert_allclose(c_out, -2 / np.sqrt(5.0), rtol=1e-6)
    np.testing.assert_allclose(c_in, 1 / np.sqrt(5.0), rtol=1e-6)


def test_linear_cfg_scale():
    # at sigma_max the scale equals `scale`, at 0 it equals scale_min
    s = guidance.linear_cfg_scale(np.float32(guidance.SIGMA_MAX), 7.5, 4.0)
    assert np.isclose(float(s), 7.5, rtol=1e-5)
    s0 = guidance.linear_cfg_scale(np.float32(0.0), 7.5, 4.0)
    assert np.isclose(float(s0), 4.0)


def test_apply_cfg():
    import jax.numpy as jnp
    x_u = jnp.ones((2, 4, 4, 3)) * 1.0
    x_c = jnp.ones((2, 4, 4, 3)) * 3.0
    out = guidance.apply_cfg(jnp.concatenate([x_u, x_c]), 2.0)
    np.testing.assert_allclose(np.array(out), 5.0)  # 1 + 2*(3-1)
