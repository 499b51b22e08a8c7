"""Pallas TPU flash attention (online-softmax, O(S) memory).

Replaces xformers memory_efficient_attention / torch SDPA / flash-attn from
the reference stack. One kernel serves the SDXL SpatialTransformer self/cross
attention (up to 16k image tokens at 128x128 latents) and LLaMA prefill.

v2 design (per pallas_guide.md): grid over (batch*heads, q-blocks,
kv-blocks) with the kv dimension INNERMOST — each K/V block streams
HBM->VMEM through Pallas' grid pipeline (double-buffered DMA overlapped
with the MXU), instead of v1's whole-K/V-per-grid-row VMEM residency which
both capped the sequence length and serialized transfer behind compute.
The flash recurrence (m, l, acc) lives in VMEM scratch persisting across
the sequential kv grid steps; the output block is written on the last kv
step. Causal q-blocks skip compute for blocks beyond the diagonal.

v3 softmax: scores are kept in base 2 — log2(e) folds into the score
scale so the online recurrence uses bare exp2 per element (the VPU's
pow2 is ~2x cheaper than exp, and exp(x)=2^(x*log2e) is exact in fp32
up to one multiply that the scale absorbs); interior causal blocks
(fully below the diagonal) skip the mask iota/compare/select entirely —
only the one diagonal block per q-row pays for masking.

Measured (v5e, bf16, 32 carry-chained calls inside ONE jit — the axon
relay costs ~33 ms/dispatch; bench_full.py part_flash_fwd):
  8k d=64 causal  40.5 TFLOP/s     8k d=128 causal 100.4 TFLOP/s
  16k d=64 causal 48.3 TFLOP/s     16k d=128 causal 91.9 TFLOP/s
  4k d=64 non-causal 49.5 TFLOP/s  (pre-v3 same harness: ~24 — the
       base-2 softmax roughly DOUBLES d=64 throughput; the remaining
       ceiling is the [bq,bk] exp2+max+sum VPU work against d=64 MXU
       contractions — d=128 halves softmax work per FLOP, hence ~100 TF)
Head-packing negative result from v1 still holds (equal-FLOPs d=64 vs
d=128 packing within 2%).

Backward: FlashAttention-2-style fused kernels (flash_attention_bwd) —
p rebuilt per block from the forward's logsumexp, dK/dV and dQ in two
pallas_calls with fp32 VMEM accumulators; O(S) memory like the forward.
Gradients verified exactly against the einsum VJP (test_attention), incl.
suffix-aligned causal sq != sk and padded-row zero contributions. Wired as
the DEFAULT backward of attention()'s flash path (RSVLDM_FLASH_BWD=xla
keeps the chunked-recompute fallback).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = math.log2(math.e)
LN2 = math.log(2.0)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref,
                  acc_ref, *, scale, causal, block_q, block_k, kv_len,
                  q_offset):
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q_start = qi * block_q
    k_start = ki * block_k
    # causal: K blocks strictly above this q block's diagonal contribute
    # nothing — skip their compute (the DMA is already pipelined).
    # q_offset suffix-aligns sq != sk (q row r is global key position
    # r + q_offset), matching _xla_attention's off = sk - sq convention
    live = (k_start <= q_start + block_q - 1 + q_offset) if causal else True

    @pl.when(live)
    def _update():
        q = q_ref[0]                    # [block_q, d]
        k = k_ref[0]                    # [block_k, d]
        v = v_ref[0]
        # base-2 softmax: log2(e) folds into the score scale so the
        # per-element transcendental is a bare exp2 — at d=64 the online
        # softmax is VPU-bound, so the multiply Mosaic's exp lowering
        # would add per element is on the critical path. m/l carry the
        # SAME values as the base-e recurrence (only s/m change units);
        # _finish converts lse back to natural log for the backward.
        # v4: the wrapper pre-folds scale*log2e into q itself (one S*d
        # elementwise pass vs S^2 here), so this static branch compiles
        # away entirely — one less VPU op per score element.
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if scale * LOG2E != 1.0:
            s = s * (scale * LOG2E)

        def _commit(s):
            m = m_ref[:]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp2(s - m_new)
            alpha = jnp.exp2(m - m_new)
            l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc_ref[:] = acc_ref[:] * alpha + pv
            m_ref[:] = m_new

        # interior blocks skip the mask entirely (iota + compare + select
        # per element): full = every key slot in range AND (causal) at/
        # below the diagonal for even the FIRST q row of the block
        full = k_start + block_k <= kv_len
        if causal:
            full = jnp.logical_and(
                full, k_start + block_k - 1 <= q_start + q_offset)

        @pl.when(full)
        def _fast():
            _commit(s)

        @pl.when(jnp.logical_not(full))
        def _masked():
            k_pos = k_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            valid = k_pos < kv_len
            if causal:
                q_pos = q_start + q_offset + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0)
                valid = jnp.logical_and(valid, k_pos <= q_pos)
            _commit(jnp.where(valid, s, NEG_INF))

    @pl.when(ki == num_kb - 1)
    def _finish():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
                    ).astype(o_ref.dtype)
        # logsumexp per q row — the softmax statistic the fused backward
        # rebuilds p from (p = exp(s - lse)). m is in base-2 units (see
        # _update) — convert back to natural log here. Stored
        # [*, block_q, 1]: the trailing length-1 lane dim keeps the block
        # spec legal on TPU (a 2-D (1, block_q) block fails Mosaic's
        # divisible-by-8 sublane rule whenever b*h > 1).
        lse_ref[0] = (m_ref[:] * LN2
                      + jnp.log(jnp.maximum(l_ref[:], 1e-30)))


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q",
                                             "block_k", "interpret",
                                             "return_lse"))
def flash_attention(q, k, v, *, causal: bool = False, scale: float | None = None,
                    block_q: int = 512, block_k: int = 1024,
                    interpret: bool | None = None, return_lse: bool = False):
    """q: [B, Sq, H, D]; k/v: [B, Sk, H, D] -> [B, Sq, H, D].
    causal with sq != sk is SUFFIX-aligned (q row r attends keys
    <= r + sk - sq), matching _xla_attention and the custom-VJP backward.
    return_lse: additionally return the per-row logsumexp [B, H, Sq]
    (fp32) — the residual the fused Pallas backward consumes."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    block_q = min(block_q, _round_up(sq, 8))
    block_k = min(block_k, _round_up(sk, 8))

    # fold scale*log2e into q up front (fp32 mult, cast back): an S*d
    # elementwise pass XLA fuses into the transpose, replacing the S^2
    # per-score-element multiply inside the kernel (the d=64 path is
    # VPU-bound — see bench_full part_flash_roofline). kernel_scale
    # 1/log2e makes the in-kernel static rescale branch compile away.
    # The fused backward recomputes s from the ORIGINAL q — the bf16
    # rounding of q*c differs from s*c by <=2^-8 relative, far below the
    # bf16 MXU dot's own noise floor (grads verified in test_attention).
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    kernel_scale = 1.0 / LOG2E

    # [B,S,H,D] -> [B*H, S, D]
    qt = q.transpose(0, 2, 1, 3).reshape(b * h, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(b * h, sk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(b * h, sk, d)

    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    qt = jnp.pad(qt, ((0, 0), (0, sq_p - sq), (0, 0)))
    kt = jnp.pad(kt, ((0, 0), (0, sk_p - sk), (0, 0)))
    vt = jnp.pad(vt, ((0, 0), (0, sk_p - sk), (0, 0)))

    grid = (b * h, sq_p // block_q, sk_p // block_k)
    kernel = functools.partial(
        _flash_kernel, scale=kernel_scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_len=sk, q_offset=sk - sq)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_p, d), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_p, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),    # running max
            pltpu.VMEM((block_q, 1), jnp.float32),    # normalizer
            pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
        ],
        interpret=interpret,
    )(qt, kt, vt)

    out = out[:, :sq, :].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    if return_lse:
        return out, lse[:, :sq, 0].reshape(b, h, sq)
    return out


# ---------------------------------------------------------------- backward
# FlashAttention-2-style fused backward: p is REBUILT per block from the
# forward's logsumexp (p = exp(q k^T * scale - lse)), so nothing O(S^2) is
# ever materialized. Two kernels:
#   dK/dV — grid (B*H, kv-blocks, q-blocks), q innermost: each kv block
#           accumulates ds^T q and p^T dO over the streaming q blocks.
#   dQ    — grid (B*H, q-blocks, kv-blocks), kv innermost: each q block
#           accumulates ds k over the streaming kv blocks.
# delta = rowsum(dO * O) is a cheap XLA reduction outside the kernels.
# Causal masking mirrors the forward's suffix alignment (q_offset = sk-sq).


def _bwd_p_ds(q, kk, vv, do, lse_row, delta_row, *, scale, causal,
              q_start, k_start, block_q, block_k, kv_len, q_offset,
              masked=True):
    """Shared block math: rebuild p, return (p, ds) both fp32 [bq, bk].
    lse_row / delta_row arrive as [bq, 1] column vectors (the trailing
    lane dim the TPU block spec requires) and broadcast over keys.
    masked=False is the interior-block fast path (no key slot out of
    range, no diagonal crossing) — skips the per-element iota/compare/
    select; padded q ROWS stay benign without it because q and do are
    zero-padded (s=0, dp=0, delta=0 ⇒ ds=0)."""
    # base-2 rebuild (see _flash_kernel): scale·log2e folds into the dot's
    # scale and lse (natural units) converts per ROW — the per-element
    # transcendental is a bare exp2
    s = jax.lax.dot_general(q, kk, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32
                            ) * (scale * LOG2E)
    p = jnp.exp2(s - lse_row * LOG2E)
    if masked:
        k_pos = k_start + jax.lax.broadcasted_iota(jnp.int32,
                                                   (block_q, block_k), 1)
        valid = k_pos < kv_len
        if causal:
            q_pos = q_start + q_offset + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            valid = jnp.logical_and(valid, k_pos <= q_pos)
        p = jnp.where(valid, p, 0.0)
    dp = jax.lax.dot_general(do, vv, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta_row) * scale
    return p, ds


def _bwd_full_block(k_start, q_start, *, causal, block_k, kv_len, q_offset):
    """Traced predicate: this (q block, kv block) pair has no masked
    element — all key slots in range and (causal) at/below the diagonal
    for even the block's first q row."""
    full = k_start + block_k <= kv_len
    if causal:
        full = jnp.logical_and(
            full, k_start + block_k - 1 <= q_start + q_offset)
    return full


def _flash_bwd_kv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dk_ref, dv_ref, dk_acc, dv_acc, *, scale, causal,
                         block_q, block_k, kv_len, q_offset):
    qi = pl.program_id(2)
    num_qb = pl.num_programs(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q_start = qi * block_q
    k_start = pl.program_id(1) * block_k
    # causal: q blocks entirely above this kv block's diagonal contribute
    # nothing — skip their compute
    live = (q_start + block_q - 1 + q_offset >= k_start) if causal else True

    def _do_update(masked):
        q = q_ref[0]
        kk = k_ref[0]
        vv = v_ref[0]
        do = do_ref[0]
        p, ds = _bwd_p_ds(q, kk, vv, do, lse_ref[0], delta_ref[0],
                          scale=scale, causal=causal, q_start=q_start,
                          k_start=k_start, block_q=block_q, block_k=block_k,
                          kv_len=kv_len, q_offset=q_offset, masked=masked)
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dk_acc[:] += jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    full = _bwd_full_block(k_start, q_start, causal=causal,
                           block_k=block_k, kv_len=kv_len, q_offset=q_offset)

    @pl.when(jnp.logical_and(live, full))
    def _fast():
        _do_update(False)

    @pl.when(jnp.logical_and(live, jnp.logical_not(full)))
    def _masked():
        _do_update(True)

    @pl.when(qi == num_qb - 1)
    def _finish():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_q_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                        dq_ref, dq_acc, *, scale, causal, block_q, block_k,
                        kv_len, q_offset):
    ki = pl.program_id(2)
    num_kb = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q_start = pl.program_id(1) * block_q
    k_start = ki * block_k
    live = (k_start <= q_start + block_q - 1 + q_offset) if causal else True

    def _do_update(masked):
        q = q_ref[0]
        kk = k_ref[0]
        _, ds = _bwd_p_ds(q, kk, v_ref[0], do_ref[0], lse_ref[0],
                          delta_ref[0], scale=scale, causal=causal,
                          q_start=q_start, k_start=k_start, block_q=block_q,
                          block_k=block_k, kv_len=kv_len, q_offset=q_offset,
                          masked=masked)
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(kk.dtype), kk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    full = _bwd_full_block(k_start, q_start, causal=causal,
                           block_k=block_k, kv_len=kv_len, q_offset=q_offset)

    @pl.when(jnp.logical_and(live, full))
    def _fast():
        _do_update(False)

    @pl.when(jnp.logical_and(live, jnp.logical_not(full)))
    def _masked():
        _do_update(True)

    @pl.when(ki == num_kb - 1)
    def _finish():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


@functools.partial(jax.jit, static_argnames=("causal", "scale", "block_q",
                                             "block_k", "interpret"))
def flash_attention_bwd(q, k, v, out, lse, do, *, causal: bool = False,
                        scale: float | None = None, block_q: int = 512,
                        block_k: int = 1024, interpret: bool | None = None):
    """Fused backward: (q, k, v, out, lse [B,H,Sq], dO) -> (dq, dk, dv).
    lse comes from flash_attention(..., return_lse=True); padded rows of
    dO contribute nothing (delta and dO are zero there)."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    scale = scale if scale is not None else 1.0 / math.sqrt(d)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block_q = min(block_q, _round_up(sq, 8))
    block_k = min(block_k, _round_up(sk, 8))

    bh = b * h
    qt = q.transpose(0, 2, 1, 3).reshape(bh, sq, d)
    kt = k.transpose(0, 2, 1, 3).reshape(bh, sk, d)
    vt = v.transpose(0, 2, 1, 3).reshape(bh, sk, d)
    dot = do.transpose(0, 2, 1, 3).reshape(bh, sq, d)
    ot = out.transpose(0, 2, 1, 3).reshape(bh, sq, d)
    # delta_i = sum_d dO_i * O_i (one fused XLA pass; O(S*D))
    delta = jnp.sum(dot.astype(jnp.float32) * ot.astype(jnp.float32),
                    axis=-1)
    lse2 = lse.reshape(bh, sq)

    sq_p = _round_up(sq, block_q)
    sk_p = _round_up(sk, block_k)
    qt = jnp.pad(qt, ((0, 0), (0, sq_p - sq), (0, 0)))
    dot = jnp.pad(dot, ((0, 0), (0, sq_p - sq), (0, 0)))
    kt = jnp.pad(kt, ((0, 0), (0, sk_p - sk), (0, 0)))
    vt = jnp.pad(vt, ((0, 0), (0, sk_p - sk), (0, 0)))
    # [bh, sq_p, 1]: the trailing length-1 lane dim keeps the (1, block_q,
    # 1) block specs legal on TPU and matches the kernels' [bq, 1] rows
    delta = jnp.pad(delta, ((0, 0), (0, sq_p - sq)))[..., None]
    lse2 = jnp.pad(lse2, ((0, 0), (0, sq_p - sq)))[..., None]

    q_off = sk - sq
    common = dict(scale=scale, causal=causal, block_q=block_q,
                  block_k=block_k, kv_len=sk, q_offset=q_off)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kv_kernel, **common),
        grid=(bh, sk_p // block_k, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, kk, qq: (i, qq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, kk, qq: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, kk, qq: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, kk, qq: (i, qq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, kk, qq: (i, qq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, kk, qq: (i, qq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda i, kk, qq: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, kk, qq: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, sk_p, d), k.dtype),
            jax.ShapeDtypeStruct((bh, sk_p, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(qt, kt, vt, dot, lse2, delta)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_q_kernel, **common),
        grid=(bh, sq_p // block_q, sk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, qq, kk: (i, qq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, qq, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, qq, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), lambda i, qq, kk: (i, qq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, qq, kk: (i, qq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), lambda i, qq, kk: (i, qq, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, qq, kk: (i, qq, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, sq_p, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(qt, kt, vt, dot, lse2, delta)

    dq = dq[:, :sq].reshape(b, h, sq, d).transpose(0, 2, 1, 3)
    dk = dk[:, :sk].reshape(b, h, sk, d).transpose(0, 2, 1, 3)
    dv = dv[:, :sk].reshape(b, h, sk, d).transpose(0, 2, 1, 3)
    return dq, dk, dv
