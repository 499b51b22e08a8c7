"""Brownian-tree noise sampler properties (diffusion/brownian.py).

The reference delegates to k_diffusion/torchsde (sampling.py:9,493) —
neither is installed here, so instead of a bit-parity oracle these tests
pin the MATHEMATICAL contract the sampler relies on: pointwise
determinism, exact increment additivity, correct marginals, independence
of disjoint increments, and path consistency across step counts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.diffusion.brownian import (BrownianTreeNoiseSampler,
                                           brownian_point)
from rsvldm_tpu.diffusion import samplers_extra as S
from rsvldm_tpu.diffusion.schedules import legacy_ddpm_sigmas

KEY = jax.random.PRNGKey(7)
SHAPE = (4096,)
T0, T1 = 0.03, 14.6


def w(t, key=KEY, shape=SHAPE):
    return np.asarray(brownian_point(key, t, T0, T1, shape))


def test_deterministic_and_query_order_free():
    # same (key, t) -> identical value, no matter what else was queried
    a1 = w(3.7)
    _ = w(11.0), w(0.5)
    a2 = w(3.7)
    np.testing.assert_array_equal(a1, a2)
    # endpoints: W(t0) = 0 exactly; W(t1) = the root endpoint draw
    assert np.all(w(T0) == 0.0)
    assert np.isfinite(w(T1)).all()


def test_increment_additivity():
    # W(a,c) == W(a,b) + W(b,c): exact algebraically (differences of
    # pointwise values), up to one fp32 rounding in the re-association
    wa, wb, wc = w(1.0), w(5.0), w(12.0)
    np.testing.assert_allclose(wc - wa, (wb - wa) + (wc - wb), atol=1e-6)


def test_marginals_and_independence():
    # increments over disjoint intervals: N(0, dt), uncorrelated
    ts = np.linspace(T0, T1, 9)
    pts = [w(t) for t in ts]
    incs = [(pts[i + 1] - pts[i]) / np.sqrt(ts[i + 1] - ts[i])
            for i in range(8)]
    for inc in incs:
        assert abs(inc.mean()) < 0.08
        assert abs(inc.std() - 1.0) < 0.08
    for i in range(7):
        corr = np.corrcoef(incs[i], incs[i + 1])[0, 1]
        assert abs(corr) < 0.08


def test_normalized_sampler_call():
    tree = BrownianTreeNoiseSampler(KEY, T0, T1, SHAPE)
    eps = np.asarray(tree(9.0, 4.0))  # descending query, like the loop
    assert abs(eps.std() - 1.0) < 0.08
    # sign convention: tree(a, b) == -tree(b, a)
    np.testing.assert_allclose(eps, -np.asarray(tree(4.0, 9.0)), rtol=1e-6)


def test_path_consistency_across_grids():
    # the point of the tree: a finer grid samples the SAME path, so
    # summed fine increments reproduce the coarse increment exactly
    tree = BrownianTreeNoiseSampler(KEY, T0, T1, SHAPE)
    coarse = np.asarray(tree.w(10.0) - tree.w(2.0))
    fine = sum(np.asarray(tree.w(a + 2.0) - tree.w(a))
               for a in [2.0, 4.0, 6.0, 8.0])
    np.testing.assert_allclose(coarse, fine, atol=1e-4)


def test_jit_scan_safe():
    # traced t inside lax.scan (the sampler's usage pattern)
    def f(key, ts):
        def body(c, t):
            return c, brownian_point(key, t, T0, T1, (64,))
        return jax.lax.scan(body, 0, ts)[1]

    ts = jnp.linspace(T0, T1, 5)
    out = jax.jit(f)(KEY, ts)
    ref = np.stack([w(float(t), shape=(64,)) for t in ts])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_restore_dpmpp2m_uses_tree():
    # the stochastic sampler runs green on the Brownian source and is
    # deterministic in rng; different rng -> different output
    sigmas = legacy_ddpm_sigmas(10)
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    den = lambda x, s: x / (1 + s**2)
    a = S.restore_dpmpp2m_sample(den, noise, sigmas, jax.random.PRNGKey(3))
    a2 = S.restore_dpmpp2m_sample(den, noise, sigmas, jax.random.PRNGKey(3))
    b = S.restore_dpmpp2m_sample(den, noise, sigmas, jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(a2))
    assert not np.allclose(np.asarray(a), np.asarray(b))
    assert np.isfinite(np.asarray(a)).all()
