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
relay costs ~33 ms/dispatch; bench_full.py part_flash_fwd; the shared
chip shows ~20-30% run-to-run variance, ranges over 4 round-4 runs):
  8k d=64 causal  43-46 TFLOP/s    8k d=128 causal 78-92 TFLOP/s
  4k d=64 non-causal 51-80 TFLOP/s
Roofline (round-4, bench_full part_flash_roofline + back-to-back diag):
the kernel is VPU-SOFTMAX-BOUND at d=64 — the measured VPU rate for the
kernel's per-score-element chain (row-max, sub, exp2, row-sum, bf16
cast) is 228 Gelem/s (bare sub+exp2: 313), and the kernel processes
scores at 203 (causal) / 212 (non-causal) Gelem/s = ~90% of that bound.
The causal-credited gap on top is block quantization: with block_q=512/
block_k=1024 the kernel computes 56.25% of the score matrix while the
FLOP convention credits 50%. Implied d=64 causal-credited ceiling at the
chain bound: 51.9 TF/s — the kernel sits at ~87%; block tuning cannot
move it materially (block_k=512 trades ~6% less quantization waste for
~5% more per-block m/l/acc rescale work). d=128 halves chain work per
FLOP: bound 116.8 TF/s, measured ~75-79% of it.
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
            s_m = jnp.where(valid, s, NEG_INF)
            # rows with NO valid key so far (causal sq > sk puts q rows
            # before the first key): m_new stays NEG_INF and the naive
            # exp2(s - m_new) = exp2(0) = 1 would emit mean-of-v garbage
            # — zero p so l stays 0 and _finish outputs zeros (the
            # convention _xla_attention shares)
            m_now = jnp.maximum(m_ref[:], jnp.max(s_m, axis=-1,
                                                  keepdims=True))
            _commit(jnp.where(m_now > NEG_INF * 0.5, s_m, -jnp.inf))

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

    # causal: kv blocks past this q block's diagonal are dead (compute is
    # predicated off in-kernel) — CLAMP their block index to the diagonal
    # block so consecutive dead grid steps revisit the SAME block and the
    # pipeline elides their K/V DMA. Measured LATENCY-NEUTRAL at 8k d=64
    # (the pipeline already hid dead-block DMA behind live compute; back-
    # to-back diag: causal 203 vs non-causal 212 Gelem/s of processed
    # scores, both ~90% of the VPU softmax-chain bound) — kept because it
    # removes the dead half of K/V HBM reads, real bandwidth under
    # contention even when latency-hidden.
    if causal:
        q_off = sk - sq

        def kv_map(i, j, kk):
            last_live = jnp.maximum(
                (j * block_q + block_q - 1 + q_off) // block_k, 0)
            return (i, jnp.minimum(kk, last_live), 0)
    else:
        def kv_map(i, j, kk):
            return (i, kk, 0)

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_map,
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

    # causal dead-block DMA elision (see flash_attention's kv_map): in the
    # dK/dV kernel the q dimension is innermost and the DEAD steps are the
    # EARLY q blocks (those entirely above this kv block's diagonal) —
    # clamp their q-side block index UP to the first live block so the
    # pipeline revisits one block instead of streaming dead ones.
    if causal:
        def q_map(i, kk, qq):
            first_live = jnp.maximum(
                (kk * block_k - q_off) // block_q, 0)
            return (i, jnp.maximum(qq, first_live), 0)
    else:
        def q_map(i, kk, qq):
            return (i, qq, 0)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_kv_kernel, **common),
        grid=(bh, sk_p // block_k, sq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), q_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, kk, qq: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, kk, qq: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d), q_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), q_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 1), q_map,
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

    # dQ kernel: kv innermost — same diagonal clamp as the forward
    if causal:
        def kv_map(i, qq, kk):
            last_live = jnp.maximum(
                (qq * block_q + block_q - 1 + q_off) // block_k, 0)
            return (i, jnp.minimum(kk, last_live), 0)
    else:
        def kv_map(i, qq, kk):
            return (i, kk, 0)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_q_kernel, **common),
        grid=(bh, sq_p // block_q, sk_p // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, qq, kk: (i, qq, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), kv_map,
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
