"""Flash-attention kernel vs reference XLA attention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.ops.attention import _xla_attention, attention
from rsvldm_tpu.ops.flash_attention import flash_attention


def _rand(shape, key):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32) * 0.5


@pytest.mark.parametrize("sq,sk,causal", [
    (128, 128, False),
    (128, 77, False),    # cross-attn to text tokens
    (200, 200, False),   # non-multiple of block
    (128, 128, True),
    (96, 96, True),
    (64, 192, True),     # causal sq != sk: suffix-aligned like _xla_attention
    (50, 130, True),     # same, non-multiple of block
])
def test_flash_matches_xla(sq, sk, causal):
    b, h, d = 2, 4, 64
    q = _rand((b, sq, h, d), 0)
    k = _rand((b, sk, h, d), 1)
    v = _rand((b, sk, h, d), 2)
    ref = _xla_attention(q, k, v, causal=causal)
    out = flash_attention(q, k, v, causal=causal, block_q=64, block_k=64,
                          interpret=True)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=2e-5, rtol=2e-4)


@pytest.mark.parametrize("sq,sk,block_q", [
    (48, 24, 16),    # block straddles the empty/live row boundary
    (48, 24, 8),     # block-aligned boundary
    (130, 60, 64),   # non-multiple tail
])
def test_flash_causal_sq_gt_sk_empty_rows(sq, sk, block_q):
    """causal sq > sk (suffix-aligned): q rows before the first key have
    NO valid key. Both paths must return ZEROS there — the naive
    max-subtracted softmax of an all-masked row is uniform and emitted
    mean-of-v garbage (found in round-4 review), worst when block_q
    straddles the empty/live boundary."""
    b, h, d = 1, 2, 64
    q = _rand((b, sq, h, d), 20)
    k = _rand((b, sk, h, d), 21)
    v = _rand((b, sk, h, d), 22)
    ref = _xla_attention(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, block_q=block_q,
                          block_k=block_q, interpret=True)
    n_empty = sq - sk
    np.testing.assert_array_equal(np.array(out[:, :n_empty]), 0.0)
    np.testing.assert_array_equal(np.array(ref[:, :n_empty]), 0.0)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=2e-5,
                               rtol=2e-4)


def test_flash_causal_sq_gt_sk_grads_finite():
    """Gradients through empty causal rows must be zero/finite, and match
    the einsum VJP for the live rows."""
    from rsvldm_tpu.ops.attention import _flash_diff
    b, sq, sk, h, d = 1, 48, 24, 2, 16
    q = _rand((b, sq, h, d), 23)
    k = _rand((b, sk, h, d), 24)
    v = _rand((b, sk, h, d), 25)

    def loss_flash(q, k, v):
        return jnp.sum(_flash_diff(q, k, v, True, None) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, causal=True) ** 2)

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_f, g_x):
        assert np.all(np.isfinite(np.array(a)))
        np.testing.assert_allclose(np.array(a), np.array(b_), atol=1e-4,
                                   rtol=1e-3)
    np.testing.assert_array_equal(np.array(g_f[0][:, :sq - sk]), 0.0)


def test_attention_dispatch():
    q = _rand((1, 32, 2, 64), 3)
    out = attention(q, q, q)
    assert out.shape == q.shape


def test_flash_bf16():
    b, s, h, d = 1, 128, 2, 64
    q = _rand((b, s, h, d), 4).astype(jnp.bfloat16)
    ref = _xla_attention(q, q, q)
    out = flash_attention(q, q, q, block_q=64, block_k=64, interpret=True)
    np.testing.assert_allclose(np.array(out, np.float32), np.array(ref, np.float32),
                               atol=3e-2)


def test_flash_dispatch_gradient_matches_xla():
    """The flash path is reachable from training code: its custom_vjp must
    produce the same gradients as the einsum formulation."""
    from rsvldm_tpu.ops.attention import _flash_diff
    b, s, h, d = 1, 64, 2, 16
    q = _rand((b, s, h, d), 5)
    k = _rand((b, s, h, d), 6)
    v = _rand((b, s, h, d), 7)

    def loss_flash(q, k, v):
        return jnp.sum(_flash_diff(q, k, v, True, None) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, causal=True) ** 2)

    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_x = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_f, g_x):
        np.testing.assert_allclose(np.array(a), np.array(b_), atol=1e-4,
                                   rtol=1e-3)


def test_flash_bwd_chunked_matches_full(monkeypatch):
    """The RSVLDM_FLASH_BWD=xla fallback runs Q-chunked; gradients must
    equal the unchunked einsum VJP (incl. the per-chunk causal offset)."""
    import rsvldm_tpu.ops.attention as A
    monkeypatch.setenv("RSVLDM_FLASH_BWD", "xla")
    b, s, h, d = 1, 96, 2, 8
    q = _rand((b, s, h, d), 11)
    k = _rand((b, s, h, d), 12)
    v = _rand((b, s, h, d), 13)

    for causal in (True, False):
        def loss_ref(q, k, v):
            return jnp.sum(_xla_attention(q, k, v, causal=causal) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

        old = A._BWD_CHUNK_Q
        A._BWD_CHUNK_Q = 32  # force the chunked path (3 chunks)
        try:
            def loss_flash(q, k, v):
                return jnp.sum(A._flash_diff(q, k, v, causal, None) ** 2)
            g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        finally:
            A._BWD_CHUNK_Q = old
        for a, b_ in zip(g_f, g_ref):
            np.testing.assert_allclose(np.array(a), np.array(b_),
                                       atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("sq,sk,causal", [
    (96, 96, False),
    (96, 96, True),
    (64, 160, True),     # suffix-aligned causal, sq != sk
    (90, 150, False),    # non-multiples of the block
    (90, 150, True),
])
def test_flash_fused_bwd_matches_xla_grads(sq, sk, causal):
    """The fused Pallas backward (default path of _flash_diff's custom_vjp)
    must reproduce the einsum formulation's gradients, incl. padded rows
    and the suffix-aligned causal mask."""
    from rsvldm_tpu.ops.attention import _flash_diff
    b, h, d = 2, 2, 16
    q = _rand((b, sq, h, d), 21)
    k = _rand((b, sk, h, d), 22)
    v = _rand((b, sk, h, d), 23)
    g = _rand((b, sq, h, d), 24)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, causal=causal) * g)

    def loss_flash(q, k, v):
        return jnp.sum(_flash_diff(q, k, v, causal, None) * g)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_f = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_f, g_ref):
        np.testing.assert_allclose(np.array(a), np.array(b_),
                                   atol=2e-4, rtol=2e-3)


def test_flash_lse_matches_softmax():
    from rsvldm_tpu.ops.flash_attention import flash_attention
    b, s, h, d = 1, 70, 2, 16
    q, k, v = _rand((b, s, h, d), 31), _rand((b, s, h, d), 32), \
        _rand((b, s, h, d), 33)
    out, lse = flash_attention(q, k, v, causal=True, block_q=32, block_k=32,
                               interpret=True, return_lse=True)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / (d ** 0.5)
    mask = jnp.tril(jnp.ones((s, s), bool))
    logits = jnp.where(mask, logits, -1e30)
    ref = jax.scipy.special.logsumexp(logits, axis=-1)
    np.testing.assert_allclose(np.array(lse), np.array(ref), atol=1e-4,
                               rtol=1e-4)


@pytest.mark.parametrize("sq,sk,causal", [
    (192, 192, False),   # all kv blocks full for every q block
    (192, 192, True),    # interior full blocks below the diagonal
    (200, 264, True),    # full interior + partial tail, suffix-aligned
])
def test_flash_fused_bwd_small_blocks(sq, sk, causal):
    """Drive flash_attention_bwd with 64-wide blocks so BOTH branch paths
    of the bwd kernels run (the interior-block fast path skips the mask
    entirely; the default 512/1024 blocks never produce a full block at
    test-scale sequence lengths)."""
    from rsvldm_tpu.ops.flash_attention import (flash_attention,
                                                flash_attention_bwd)
    b, h, d = 2, 2, 16
    q = _rand((b, sq, h, d), 41)
    k = _rand((b, sk, h, d), 42)
    v = _rand((b, sk, h, d), 43)
    g = _rand((b, sq, h, d), 44)
    out, lse = flash_attention(q, k, v, causal=causal, block_q=64,
                               block_k=64, interpret=True, return_lse=True)
    dq, dk, dv = flash_attention_bwd(q, k, v, out, lse, g, causal=causal,
                                     block_q=64, block_k=64, interpret=True)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, causal=causal) * g)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip((dq, dk, dv), g_ref):
        np.testing.assert_allclose(np.array(a), np.array(b_),
                                   atol=2e-4, rtol=2e-3)
