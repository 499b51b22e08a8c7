"""Brownian-tree noise sampler — TPU-native BrownianTreeNoiseSampler.

Parity target: k_diffusion.sampling.BrownianTreeNoiseSampler as used by
/root/reference sgm/modules/diffusionmodules/sampling.py:9,493,784 —
`noise_sampler(sigma, sigma_next)` returns the increment of ONE fixed
Brownian path W over [sigma, sigma_next], normalized to unit variance:
(W(t1) - W(t0)) / sqrt(|t1 - t0|). The tree spans
[sigma_min, sigma_max] = [sigmas[-2], sigmas[0]] with the identity
transform (the reference passes no `transform`).

Why a tree at all: over one fixed descending sigma grid the per-step
increments are independent gaussians, so any fresh-normal source is
statistically identical. The property the Brownian construction adds is
CONSISTENCY ACROSS STEP COUNTS — re-running the sampler with a different
number of steps queries the SAME underlying path at different points, so
outputs vary smoothly with step count instead of re-rolling all noise.

TPU design (vs torchsde.BrownianTree): torchsde builds a lazy binary tree
of cached torch tensors with data-dependent Python recursion — untraceable.
Here W(t) is a PURE FUNCTION of (key, t): a fixed-depth dyadic descent of
Lévy-bridge midpoints, each midpoint's normal drawn from a counter-based
key `fold_in(fold_in(key, level), dyadic_index)`. No state, no cache, no
data-dependent control flow — safe inside jit/lax.scan, identical results
regardless of query order. Increment additivity W(a,c)=W(a,b)+W(b,c) is
EXACT (differences of pointwise values); marginal variance is exact up to
the leaf truncation: after DEPTH=24 levels the final Brownian-bridge
residual inside a `span * 2^-24`-wide leaf is linearly interpolated, a
variance deficit <= span * 2^-26 — immaterial for sampler steps, which are
~span/num_steps wide. Bit-parity with torchsde's PRNG is out of scope
(different generator by construction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEPTH = 24


def brownian_point(key, t, t0, t1, shape, dtype=jnp.float32,
                   depth: int = DEPTH):
    """W(t) for a standard Brownian path on [t0, t1] with W(t0) = 0.

    Pure in (key, t): Lévy-bridge dyadic construction, `depth` levels of
    conditional midpoints, linear interpolation inside the final leaf.
    """
    k_end, k_tree = jax.random.split(key)
    t = jnp.clip(jnp.asarray(t, jnp.float32), t0, t1)
    span = t1 - t0
    w1 = jnp.sqrt(span) * jax.random.normal(k_end, shape, dtype)

    a = jnp.asarray(t0, jnp.float32)
    b = jnp.asarray(t1, jnp.float32)
    wa = jnp.zeros(shape, dtype)
    wb = w1
    idx = jnp.zeros((), jnp.uint32)
    for level in range(depth):
        m = 0.5 * (a + b)
        k_node = jax.random.fold_in(jax.random.fold_in(k_tree, level), idx)
        z = jax.random.normal(k_node, shape, dtype)
        # W(m) | W(a), W(b)  ~  N((wa+wb)/2, (b-a)/4)
        wm = 0.5 * (wa + wb) + 0.5 * jnp.sqrt(b - a).astype(dtype) * z
        right = t >= m
        a, wa = jnp.where(right, m, a), jnp.where(right, wm, wa)
        b, wb = jnp.where(right, b, m), jnp.where(right, wb, wm)
        idx = 2 * idx + right.astype(jnp.uint32)
    frac = jnp.where(b > a, (t - a) / (b - a), 0.0).astype(dtype)
    return wa + frac * (wb - wa)


class BrownianTreeNoiseSampler:
    """`sampler(sigma, sigma_next)` -> unit-variance increment noise.

    Mirrors k_diffusion's call contract (sampling.py:493,498): the tree
    spans [sigma_min, sigma_max]; each query returns
    (W(sigma_next) - W(sigma)) / sqrt(|sigma_next - sigma|). Queries with
    sigma_next < sigma (the usual descending loop) are handled by the
    signed difference — increments stay exactly additive and gaussian.
    """

    def __init__(self, key, sigma_min, sigma_max, shape,
                 dtype=jnp.float32, depth: int = DEPTH):
        self.key = key
        self.t0 = float(sigma_min)
        self.t1 = float(sigma_max)
        self.shape = tuple(shape)
        self.dtype = dtype
        self.depth = depth

    def w(self, t):
        return brownian_point(self.key, t, self.t0, self.t1, self.shape,
                              self.dtype, self.depth)

    def __call__(self, sigma, sigma_next):
        dw = self.w(sigma_next) - self.w(sigma)
        dt = jnp.abs(jnp.asarray(sigma_next, jnp.float32) - sigma)
        return dw / jnp.sqrt(jnp.maximum(dt, 1e-20)).astype(self.dtype)
