"""Int8 weight-only quantization on the native s8 MXU path.

Reference parity target: the 4/8-bit loading options of the LLaVA builder
(/root/reference/llava/model/builder.py:33-37, bitsandbytes). TPU-native
design: weights are stored int8 with per-output-channel fp32 scales;
activations are quantized per-token (symmetric absmax) right before each
matmul; the contraction runs int8 x int8 -> int32 on the MXU
(lax.dot_general with preferred_element_type=int32), and the two scales are
applied to the small int32 accumulator — the weight stream out of HBM stays
int8, which is what makes batch-1 decode (memory-bound) ~2x faster than
bf16 and lets an 8B model fit a single 16 GB v5e chip (~8 GB weights).

This deliberately avoids the round-2 failure mode (ROUND2.md): dequantizing
the weights (in-kernel on the VPU, or at the XLA level) materializes a bf16
copy and loses the bandwidth win. Here nothing ever widens the weights.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class QuantizedLinear(NamedTuple):
    """Per-output-channel symmetric int8 weight. kernel layout [in, out]
    (flax Dense convention); scale [out] fp32 such that
    w ~= q.astype(f32) * scale."""
    q: jnp.ndarray       # int8 [in, out]
    scale: jnp.ndarray   # float32 [out]


def quantize_weight(w: jnp.ndarray) -> QuantizedLinear:
    """Symmetric absmax int8 quantization, per output channel.
    w: [in, out] (contraction is always over dim 0 — int8_matmul broadcasts
    scale against the out axis, so no other reduction axis is valid)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=0, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return QuantizedLinear(q, scale.reshape(-1))


def quantize_acts(x: jnp.ndarray):
    """Per-token (last-axis) symmetric absmax int8 quantization.
    Returns (x_q int8, x_scale fp32 with trailing dim 1)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def int8_matmul(x: jnp.ndarray, w: QuantizedLinear,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """y = x @ dequant(w), computed as s8xs8->s32 on the MXU with scales on
    the accumulator. x: [..., in]; returns [..., out] in out_dtype."""
    xq, xs = quantize_acts(x)
    nd = xq.ndim
    acc = jax.lax.dot_general(
        xq, w.q, (((nd - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * xs * w.scale
    return y.astype(out_dtype)


# ---------------------------------------------------------------------------
# Int4 weight-only (group-wise) — the load_4bit / bitsandbytes-NF4 stand-in
# (/root/reference/llava/model/builder.py:35-37). Two 4-bit values pack into
# one int8 byte along the contraction dim, so the decode weight stream out
# of HBM halves again vs int8 (~4.3 GB for 8B). Per-(group, out) scales
# (group ~128 along `in`) keep RTN-int4 accuracy usable — the contraction is
# blocked per group (Gb becomes a dot_general batch dim) so scales apply to
# the int32 group accumulator, exactly like the int8 path; nothing ever
# widens the weight stream.
# ---------------------------------------------------------------------------


class Int4Linear(NamedTuple):
    """packed: int8 [in//2, out] — PLANE layout: row j holds weight row j in
    the LOW nibble (stored BIASED: value+8, in [1, 15]) and weight row
    j + in//2 in the HIGH nibble (two's-complement signed, in [-7, 7]).

    The asymmetric format is deliberate, for the Pallas decode kernel:
    Mosaic legalizes only bitwise ops on int8 vectors (no shifts, no
    sub), and with this format both planes are a single AND each:
    lo_b = pk & 0x0F (biased low nibble, non-negative) and
    hi16 = pk & 0xF0 == 16*hi as an int8 VALUE (mask keeps the sign bit).
    The x16 folds into the high-plane scales and the +8 bias is removed
    by one small correction matmul against the per-group activation sums.
    Plane packing (vs interleaved 2i/2i+1 rows) makes the XLA unpack a
    concat of two copies — no lane interleave.

    scale: float32 [in//group, out] with w[i, o] ~= q[i, o] * scale[i//group, o];
    group = (2 * packed.shape[0]) // scale.shape[0]."""
    packed: jnp.ndarray
    scale: jnp.ndarray


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """q: int8 [in, out] with values in [-8, 7] -> int8 [in//2, out]
    (plane layout; low nibble stored biased +8 — see Int4Linear)."""
    half = q.shape[0] // 2
    lo = (q[:half].astype(jnp.int8) + 8) & 0xF
    hi = q[half:].astype(jnp.int8)
    return ((hi << 4) | lo).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """int8 [in//2, out] -> int8 [in, out] (signed nibble planes)."""
    lo = (packed & 0xF) - 8          # un-bias the low plane
    hi = packed >> 4                 # arithmetic shift sign-extends
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def quantize_weight_int4(w: jnp.ndarray, group: int = 128) -> Int4Linear:
    """Symmetric absmax RTN int4, per (group-of-`group`-input-rows, output
    channel). w: [in, out], in % (2, group) == 0."""
    wf = w.astype(jnp.float32)
    inf, out = wf.shape
    group = min(group, inf)
    assert inf % group == 0 and inf % 2 == 0, (inf, group)
    g = wf.reshape(inf // group, group, out)
    amax = jnp.max(jnp.abs(g), axis=1, keepdims=True)
    scale = jnp.maximum(amax / 7.0, 1e-12)
    q = jnp.clip(jnp.round(g / scale), -7, 7).astype(jnp.int8)
    return Int4Linear(pack_int4(q.reshape(inf, out)),
                      scale.reshape(inf // group, out))


def quantize_acts_grouped(x: jnp.ndarray, group: int):
    """Per-(token, group-of-`group`-features) symmetric absmax int8.
    x: [..., in] -> (xq int8 [..., Gb, group], xs fp32 [..., Gb, 1])."""
    xf = x.astype(jnp.float32)
    gb = x.shape[-1] // group
    xf = xf.reshape(*x.shape[:-1], gb, group)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-12)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return xq, s


def _int4_matmul_xla(x: jnp.ndarray, w: Int4Linear,
                     out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Reference XLA path: unpack nibbles -> s8xs8->s32 per group block on
    the MXU (group axis as a dot_general batch dim) -> both scales on the
    int32 group accumulator -> sum over groups. x: [..., in].

    Fine for PREFILL (the unpack materialization and the [Gb, R, G] batched
    dots amortize over many rows R); pathological for batch-1 decode, where
    XLA materializes the unpacked int8 weights to HBM every step (measured
    3.9 tok/s at the 8B geometry) — decode goes through the Pallas kernel
    below instead."""
    inf = 2 * w.packed.shape[0]
    gb = w.scale.shape[0]
    group = inf // gb
    q = unpack_int4(w.packed).reshape(gb, group, -1)       # [Gb, G, out]
    xq, xs = quantize_acts_grouped(x, group)               # [..., Gb, G]
    lead = tuple(range(xq.ndim - 2))
    # batch over Gb: [..., Gb, G] x [Gb, G, out] -> [Gb, ..., out]
    acc = jax.lax.dot_general(
        xq, q,
        (((xq.ndim - 1,), (1,)), ((xq.ndim - 2,), (0,))),
        preferred_element_type=jnp.int32)
    # acc: [Gb, ..., out]; move scales to match
    xs_t = jnp.moveaxis(xs, -2, 0)                          # [Gb, ..., 1]
    ws = w.scale.reshape(gb, *(1,) * len(lead), -1)         # [Gb, 1.., out]
    y = (acc.astype(jnp.float32) * xs_t * ws).sum(axis=0)
    return y.astype(out_dtype)


# --- Pallas int4 decode kernel ---------------------------------------------
# Streams the PACKED nibbles HBM->VMEM through the grid pipeline, unpacks
# in-register on the VPU (two arithmetic shifts), runs one s8xs8->s32 MXU
# sub-dot per 128-row scale group, and applies both scales to the int32
# group accumulator in a fp32 VMEM scratch. The weight stream out of HBM is
# the packed 4-bit bytes — nothing is ever materialized wider, which is the
# whole point for memory-bound batch-1 decode (~4.3 GB/token for 8B).


def _int4_decode_kernel(xql_ref, xqh_ref, xsl_ref, xsh_ref, packed_ref,
                        wl_ref, wh_ref, out_ref, acc_ref, *, gpb: int,
                        n_in2: int):
    """One grid step: a [bin2, bout] packed block covering the SAME rows of
    both nibble planes. All operand refs are blocked by the grid (static
    in-kernel indexing only — dynamic slices measurably stall the DMA
    pipeline at this blocks/second rate)."""
    kin = pl.program_id(1)

    @pl.when(kin == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pk = packed_ref[:]                       # [bin2, bout] packed nibbles
    # two packed int8 VPU ops per byte — bitwise ANDs only (Mosaic
    # legalizes i8 vector andi but not shifts/subi; see Int4Linear for the
    # biased format that makes this sufficient): masking the top nibble
    # keeps the sign bit, so (pk & 0xF0) IS 16*hi as an int8 value.
    lob = pk & jnp.int8(0x0F)                # low plane, biased +8, in [0,15]
    hi16 = pk & jnp.int8(-16)                # 0xF0 mask == 16 * high plane
    for g in range(gpb):
        sl = slice(g * 128, (g + 1) * 128)
        acc_l = jax.lax.dot_general(
            xql_ref[g], lob[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_h = jax.lax.dot_general(
            xqh_ref[g], hi16[sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc_ref[:] += (acc_l.astype(jnp.float32) * xsl_ref[g]
                       * wl_ref[pl.ds(g, 1), :]
                       + acc_h.astype(jnp.float32) * xsh_ref[g]
                       * wh_ref[pl.ds(g, 1), :])

    @pl.when(kin == n_in2 - 1)
    def _fin():
        out_ref[:] = acc_ref[:].astype(out_ref.dtype)


def _pick_block(n: int) -> int:
    """Largest of the supported block sizes dividing n (0 if none) — used
    for both the contraction block (bin2) and the out block (bout), so no
    operand ever needs a per-call jnp.pad copy of the full weight."""
    for cand in (1024, 512, 256, 128):
        if n % cand == 0:
            return cand
    return 0


def int4_matmul_pallas(x: jnp.ndarray, w: Int4Linear,
                       out_dtype=jnp.bfloat16, *, bout: int | None = None,
                       interpret: bool | None = None) -> jnp.ndarray:
    """Decode-path y = x @ dequant(w) via the Pallas kernel. Requires
    group == 128 and in % 256 == 0; rows padded to a multiple of 8 (use for
    small-R decode steps — prefill takes _int4_matmul_xla).

    bout defaults to the largest supported block dividing `out` (e.g. 256
    for the 128256 lm_head) so the packed weight/scales are never jnp.pad-
    copied per call — that copy would double the very HBM traffic this
    kernel exists to halve. Non-multiple-of-128 outs fall back to one pad."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    lead = x.shape[:-1]
    inf = 2 * w.packed.shape[0]
    gb = w.scale.shape[0]
    group = inf // gb
    assert group == 128 and inf % 256 == 0, (inf, group)
    in_half = inf // 2
    bin2 = _pick_block(in_half)
    assert bin2, in_half
    r = 1
    for d in lead:
        r *= d
    bp = max(8, -(-r // 8) * 8)
    out = w.packed.shape[1]
    if bout is None:
        bout = _pick_block(out) or 1024
    out_p = -(-out // bout) * bout

    xq, xs = quantize_acts_grouped(x.reshape(r, inf), 128)  # [R,Gb,128],[R,Gb,1]
    xq = jnp.pad(xq, ((0, bp - r), (0, 0), (0, 0)))
    xs = jnp.pad(xs.astype(jnp.float32), ((0, bp - r), (0, 0), (0, 0)))
    gbh = gb // 2
    xq3 = xq.transpose(1, 0, 2)                             # [Gb, Bp, 128]
    xs3 = xs.transpose(1, 0, 2)                             # [Gb, Bp, 1]
    packed = w.packed
    wsc = w.scale.astype(jnp.float32)
    # fold the biased-format algebra into the scales: high plane operands
    # come out of the kernel as 16*q (scale /16); the low plane's +8 bias
    # is removed by the correction matmul below
    wl, wh = wsc[:gbh], wsc[gbh:] / 16.0
    if out_p != out:
        packed = jnp.pad(packed, ((0, 0), (0, out_p - out)))
        wl = jnp.pad(wl, ((0, 0), (0, out_p - out)))
        wh = jnp.pad(wh, ((0, 0), (0, out_p - out)))

    n_in2 = in_half // bin2
    gpb = bin2 // 128
    grid = (out_p // bout, n_in2)
    kernel = functools.partial(_int4_decode_kernel, gpb=gpb, n_in2=n_in2)
    y = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((gpb, bp, 128), lambda j, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),    # xq low-plane groups
            pl.BlockSpec((gpb, bp, 128), lambda j, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),    # xq high-plane groups
            pl.BlockSpec((gpb, bp, 1), lambda j, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bp, 1), lambda j, k: (k, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bin2, bout), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bout), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gpb, bout), lambda j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bp, bout), lambda j, k: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, out_p), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bp, bout), jnp.float32)],
        interpret=interpret,
    )(xq3[:gbh], xq3[gbh:], xs3[:gbh], xs3[gbh:], packed, wl, wh)
    # remove the low plane's +8 bias: 8 * sum_g xs_g * (sum_k xq_gk) * sw_g
    xsum = xq[:, :gbh].astype(jnp.float32).sum(axis=-1)     # [Bp, Gbh]
    corr = 8.0 * ((xs[:, :gbh, 0] * xsum) @ wsc[:gbh])      # [Bp, out]
    y = y[:, :out] - corr
    return y[:r].reshape(*lead, out).astype(out_dtype)


def int4_matmul(x: jnp.ndarray, w: Int4Linear,
                out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """y = x @ dequant(w) with group-128 weight scales on the int32 group
    accumulator. Small-R (decode) calls on TPU take the Pallas packed-stream
    kernel; everything else takes the XLA grouped-dot path."""
    inf = 2 * w.packed.shape[0]
    gb = w.scale.shape[0]
    r = 1
    for d in x.shape[:-1]:
        r *= d
    if (jax.default_backend() == "tpu" and r <= 32
            and inf // gb == 128 and inf % 256 == 0):
        # inf % 256 == 0 already guarantees a valid contraction block
        return int4_matmul_pallas(x, w, out_dtype=out_dtype)
    return _int4_matmul_xla(x, w, out_dtype=out_dtype)


# ---------------------------------------------------------------------------
# Straight-through-estimator backward for the quantized matmuls — the
# QLoRA training path (/root/reference/llava/train/train.py:1471-1529:
# bits 4/8 + prepare_model_for_kbit_training + LoRA). The FORWARD is the
# exact int8/int4 MXU path above (activations quantized per token); the
# BACKWARD treats the layer as y = x @ dequant(w): dx = g @ W_deq^T with
# the dequantization done only inside the gradient (bitsandbytes does the
# same — its backward is a fp matmul against dequantized weights). The
# frozen quantized weights get symbolic-zero cotangents (int leaves have
# float0 tangents); only gradients wrt x flow, which is all LoRA training
# needs (adapter grads arrive through x of downstream layers and the
# explicit low-rank branch).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def int8_matmul_ste(x, q, scale, out_dtype=jnp.bfloat16):
    return int8_matmul(x, QuantizedLinear(q, scale), out_dtype=out_dtype)


def _int8_ste_fwd(x, q, scale, out_dtype):
    # residuals must be jax types: carry x's dtype as a 0-size array
    return int8_matmul_ste(x, q, scale, out_dtype), (
        jnp.zeros((0,), x.dtype), q, scale)


def _int8_ste_bwd(out_dtype, res, g):
    import numpy as np
    x_proto, q, scale = res
    x_dtype = x_proto.dtype
    w = q.astype(jnp.float32) * scale          # dequant in backward only
    dx = jnp.einsum("...o,io->...i", g.astype(jnp.float32), w)
    return (dx.astype(x_dtype), np.zeros(q.shape, jax.dtypes.float0),
            jnp.zeros_like(scale))


int8_matmul_ste.defvjp(_int8_ste_fwd, _int8_ste_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def int4_matmul_ste(x, packed, scale, out_dtype=jnp.bfloat16):
    return int4_matmul(x, Int4Linear(packed, scale), out_dtype=out_dtype)


def _int4_ste_fwd(x, packed, scale, out_dtype):
    return int4_matmul_ste(x, packed, scale, out_dtype), (
        jnp.zeros((0,), x.dtype), packed, scale)


def _int4_ste_bwd(out_dtype, res, g):
    import numpy as np
    x_proto, packed, scale = res
    x_dtype = x_proto.dtype
    inf = 2 * packed.shape[0]
    group = inf // scale.shape[0]
    w = unpack_int4(packed).astype(jnp.float32) * jnp.repeat(
        scale, group, axis=0)
    dx = jnp.einsum("...o,io->...i", g.astype(jnp.float32), w)
    return (dx.astype(x_dtype), np.zeros(packed.shape, jax.dtypes.float0),
            jnp.zeros_like(scale))


int4_matmul_ste.defvjp(_int4_ste_fwd, _int4_ste_bwd)
