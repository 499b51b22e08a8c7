"""Pallas TPU flash attention (online-softmax, O(S) memory).

Replaces xformers memory_efficient_attention / torch SDPA / flash-attn from
the reference stack. One kernel serves the SDXL SpatialTransformer self/cross
attention (up to 16k image tokens at 128x128 latents) and LLaMA prefill.

Design (per pallas_guide.md): grid over (batch*heads, q-blocks); K/V live in
VMEM per grid row; the kernel walks K in `block_k` chunks with a fori_loop
carrying (m, l, acc) running max / normalizer / fp32 accumulator — the
standard flash recurrence. MXU matmuls via jnp.dot with fp32 accumulation.
Falls back to interpret mode off-TPU so CPU tests exercise the same code.

Measured (v5e, 4096 tokens, bf16, amortized over 8 calls in one jit — the
axon relay costs ~33 ms per dispatch, so single-call timings are noise):
~37 TFLOP/s at b*h>=32 grid rows, ~24 at b*h=20; ~12% over the XLA einsum
path at this length, plus O(S) memory (XLA OOMs at 16k). Head-packing
experiment (round-2 review item): equal-FLOPs h=16/d=64 vs h=8/d=128
differ by <2% — Mosaic does NOT meaningfully penalize d=64 contractions,
so no packing is warranted (negative result, kept for the record). Block
size sweeps (256-2048) are flat; defaults below are fine.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal, block_k,
                  kv_len, q_offset_blocks):
    q = q_ref[0]                      # [block_q, d]
    block_q, d = q.shape
    padded_kv = k_ref.shape[1]
    num_kb = padded_kv // block_k

    qi = pl.program_id(1)
    q_start = (qi + q_offset_blocks) * block_q  # global query offset

    m0 = jnp.full((block_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)

    if causal:
        # block pruning: K blocks entirely above the diagonal contribute
        # nothing — bound the loop at the last block that intersects the
        # causal frontier of this q block
        kb_bound = jnp.minimum(
            num_kb, (q_start + block_q + block_k - 1) // block_k)
    else:
        kb_bound = num_kb

    def body(i, carry):
        m, l, acc = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :]
        v = v_ref[0, pl.ds(i * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [bq, bk]
        k_pos = i * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                       (block_q, block_k), 1)
        valid = k_pos < kv_len
        if causal:
            q_pos = q_start + jax.lax.broadcasted_iota(jnp.int32,
                                                       (block_q, block_k), 0)
            valid = jnp.logical_and(valid, k_pos <= q_pos)
        s = jnp.where(valid, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc * alpha + pv
        return m_new, l, acc

    m, l, acc = jax.lax.fori_loop(0, kb_bound, body, (m0, l0, acc0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q",
                                             "block_k", "interpret"))
def flash_attention(q, k, v, *, causal: bool = False, scale: float | None = None,
                    block_q: int = 256, block_k: int = 512,
                    interpret: bool | None = None):
    """q: [B, Sq, H, D]; k/v: [B, Sk, H, D] -> [B, Sq, H, D]."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    block_q = min(block_q, _round_up(sq, 8))
    block_k = min(block_k, _round_up(sk, 8))

    # [B,S,H,D] -> [B*H, S, D]
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)

    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    qt = jnp.pad(qt, ((0, 0), (0, sq_p - sq), (0, 0)))
    kt = jnp.pad(kt, ((0, 0), (0, sk_p - sk), (0, 0)))
    vt = jnp.pad(vt, ((0, 0), (0, sk_p - sk), (0, 0)))

    grid = (b * h, sq_p // block_q)
    kernel = functools.partial(
        _flash_kernel, scale=scale, causal=causal, block_k=block_k,
        kv_len=sk,
        # decode-style usage can offset queries; full-seq here
        q_offset_blocks=0)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk_p, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
        interpret=interpret,
    )(qt, kt, vt)

    out = out[:, :sq, :].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    return out
