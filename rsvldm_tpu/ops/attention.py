"""Multi-head attention dispatch: Pallas flash kernel on TPU, fused XLA
einsum path elsewhere.

Replaces every attention backend the reference selects between —
xformers memory_efficient_attention / torch SDPA (sgm/modules/attention.py:
273-373), the VAE AttnBlock matmuls and flash-attn for the LLM — with one
entry point. Layout: [B, S, H, D].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _xla_attention(q, k, v, *, causal: bool = False, scale: float | None = None,
                   q_offset: int | None = None):
    """Plain batched attention with fp32 accumulation; XLA fuses the softmax
    chain into the matmuls on TPU. Fine for short/medium sequences.

    q_offset: global position of q's first row (used by the chunked flash
    backward); the default reproduces the usual aligned-suffix causal mask."""
    d = q.shape[-1]
    scale = scale if scale is not None else 1.0 / (d ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if causal:
        sq, sk = logits.shape[-2], logits.shape[-1]
        off = q_offset if q_offset is not None else sk - sq
        mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=off)
        logits = jnp.where(mask, logits, -1e30)
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    if causal and off < 0:
        # q rows before the first key (sq > sk) have NO valid key; the
        # max-subtracted softmax of an all-masked row is uniform, which
        # would emit mean-of-v garbage — zero those rows (the convention
        # the Pallas kernel shares)
        probs = jnp.where(mask.any(-1)[None, None, :, None], probs, 0.0)
    return jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash_diff(q, k, v, causal, scale):
    """Flash forward with a FUSED Pallas backward (flash_attention_bwd):
    p is rebuilt per block from the stashed logsumexp, so the backward is
    O(S) memory like the forward. RSVLDM_FLASH_BWD=xla falls back to the
    chunked einsum-VJP recompute path (kept for A/B and as a safety
    hatch)."""
    from .flash_attention import flash_attention
    return flash_attention(q, k, v, causal=causal, scale=scale)


def _flash_diff_fwd(q, k, v, causal, scale):
    from .flash_attention import flash_attention
    out, lse = flash_attention(q, k, v, causal=causal, scale=scale,
                               return_lse=True)
    return out, (q, k, v, out, lse)


_BWD_CHUNK_Q = 1024


def _flash_diff_bwd(causal, scale, res, g):
    """Fused Pallas backward by default; RSVLDM_FLASH_BWD=xla selects the
    chunked einsum-VJP recompute (peak [B,H,chunk,S] fp32 per chunk)."""
    import os
    q, k, v, out, lse = res
    if os.environ.get("RSVLDM_FLASH_BWD", "pallas") != "xla":
        from .flash_attention import flash_attention_bwd
        return flash_attention_bwd(q, k, v, out, lse, g, causal=causal,
                                   scale=scale)
    return _flash_bwd_xla(causal, scale, (q, k, v), g)


def _flash_bwd_xla(causal, scale, res, g):
    """Chunked recompute backward: the einsum VJP is taken per Q-chunk so
    peak memory is [B,H,chunk,S] fp32 instead of [B,H,S,S] — long sequences
    whose FORWARD needed the flash kernel would otherwise OOM here. Rows of
    a chunk see the full K/V with the causal mask offset to the chunk's
    global position; dK/dV accumulate across chunks, dQ concatenates."""
    q, k, v = res
    sq = q.shape[1]
    if sq <= _BWD_CHUNK_Q:
        _, vjp = jax.vjp(
            lambda q, k, v: _xla_attention(q, k, v, causal=causal,
                                           scale=scale), q, k, v)
        return vjp(g)
    dq_chunks = []
    dk = jnp.zeros_like(k, dtype=jnp.float32)
    dv = jnp.zeros_like(v, dtype=jnp.float32)
    for o in range(0, sq, _BWD_CHUNK_Q):
        qc = q[:, o:o + _BWD_CHUNK_Q]
        gc = g[:, o:o + _BWD_CHUNK_Q]
        _, vjp = jax.vjp(
            lambda qc, k, v: _xla_attention(qc, k, v, causal=causal,
                                            scale=scale, q_offset=o),
            qc, k, v)
        dqc, dkc, dvc = vjp(gc)
        dq_chunks.append(dqc)
        dk = dk + dkc.astype(jnp.float32)
        dv = dv + dvc.astype(jnp.float32)
    return (jnp.concatenate(dq_chunks, axis=1), dk.astype(k.dtype),
            dv.astype(v.dtype))


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


def _flash_min_seq() -> int:
    """Sequence length at/above which "auto" picks the Pallas flash kernel.
    Tunable via RSVLDM_FLASH_MIN_SEQ for A/B measurement (read per call —
    a dict lookup is noise next to a dispatch — so one process can sweep
    the crossover, e.g. the SDXL ds=2 self-attention at ~1k tokens)."""
    import os
    return int(os.environ.get("RSVLDM_FLASH_MIN_SEQ", "1024"))


def attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, *,
              causal: bool = False, scale: float | None = None,
              impl: str = "auto") -> jnp.ndarray:
    """q: [B, Sq, H, D]; k/v: [B, Sk, H, D] -> [B, Sq, H, D].

    impl: "auto" picks the Pallas flash kernel on TPU for long sequences,
    else the XLA path. "xla" / "flash" force a backend.
    """
    if impl == "auto":
        on_tpu = jax.default_backend() == "tpu"
        min_seq = _flash_min_seq()
        long_seq = q.shape[1] >= min_seq and k.shape[1] >= min_seq
        impl = "flash" if (on_tpu and long_seq) else "xla"
    if impl == "flash":
        return _flash_diff(q, k, v, causal, scale)
    return _xla_attention(q, k, v, causal=causal, scale=scale)
