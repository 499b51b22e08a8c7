"""Llama-family decoders (the LLaVA language backbones) with KV-cache decode.

Parity target: /root/reference llava/model/language_model/ — llava_llama.py
(:31-152, the shipped model) plus the sibling bindings llava_qwen.py /
llava_mistral.py / llava_gemma.py, which differ only in config-level
architecture knobs covered here: attention projection bias (Qwen2), sliding
window (Mistral), RMSNorm (1+w) scaling + embedding scaling + tied head
(Gemma), rope theta / dims per family. RMSNorm, RoPE, GQA, SwiGLU, untied or
tied lm_head.

TPU design: one code path serves prefill and decode — new tokens' K/V are
written into a preallocated [L, B, T, kvh, hd] cache with
dynamic_update_slice at a traced offset, and attention masks by absolute
position, so the whole autoregressive loop compiles to a single lax.scan
(see generate.py). Attention matmuls run on the MXU in bf16 with fp32
softmax via ops.attention's math.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    dim: int = 4096
    layers: int = 32
    heads: int = 32
    kv_heads: int = 8
    ffn_dim: int = 14336
    rope_theta: float = 500000.0
    rms_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32
    # family knobs
    attn_bias: bool = False        # Qwen2: q/k/v projections carry bias
    sliding_window: int | None = None  # Mistral: local attention window
    norm_plus_one: bool = False    # Gemma: y = x_norm * (1 + w)
    act: str = "silu"              # Gemma: "gelu_tanh"
    scale_embeds: bool = False     # Gemma: embeds *= sqrt(dim)
    tie_lm_head: bool = False      # Gemma: lm_head = embed_tokens^T
    # Weight-only quantization (the TPU-native stand-in for the builder's
    # bitsandbytes 4/8-bit options, llava/model/builder.py:33-37):
    # "int8" = projections + lm_head stored int8 w/ per-output-channel
    # scales; "int4" = two nibbles per byte + per-(group-128, out) scales
    # (the load_4bit / NF4 equivalent). Either way contractions run
    # s8xs8->s32 on the MXU (ops/quant.py); 8B fits one 16GB chip at int8
    # (~8.5 GB) with int4 (~4.3 GB) halving the decode weight stream again.
    quant: str | None = None       # None | "int8" | "int4"
    quant_group: int = 128         # int4 scale group size (along `in`)
    # int8 KV cache: K/V stored int8 with per-(position, kv-head) absmax
    # scales (fp32, ~0.4% of the cache bytes). Halves decode KV traffic
    # and doubles the context (or engine slots) a chip holds; dequant is
    # fused into the attention dot's operand read. No reference
    # counterpart (HF keeps fp16 KV); quality: per-head absmax on RoPE'd
    # keys is the standard KV-quant recipe (logits cos > 0.999 at tiny
    # scale, test_quant_kv).
    kv_quant: bool = False
    # Rematerialize each block in the backward pass (jax.checkpoint via
    # nn.remat): activation memory drops from O(layers * seq) to one layer
    # plus the inter-block residual stream, at one extra forward of
    # recompute — what lets a 2k-token QLoRA step fit next to 8.5 GB of
    # int8 weights on a 16 GB chip (the reference side of this trade is
    # train.py's gradient_checkpointing flag). Forward-only paths
    # (generate/engine) are unaffected numerically either way.
    remat: bool = False
    # MoE knobs (Mixtral / Qwen2-MoE; llava_mixtral.py / llava_qwen_moe.py)
    num_experts: int = 0           # 0 = dense FFN
    experts_per_tok: int = 2       # Mixtral top-2; Qwen2-MoE top-4
    moe_ffn_dim: int | None = None     # per-expert FFN width (def: ffn_dim)
    norm_topk_prob: bool = True    # Mixtral: renormalize top-k weights
    shared_expert_dim: int | None = None  # Qwen2-MoE sigmoid-gated shared FFN
    # Families where head_dim != dim // heads (Gemma-7B: 3072/16 heads but
    # 256-wide heads); 0 = derive from dim // heads
    head_dim_cfg: int = 0

    @property
    def head_dim(self) -> int:
        return self.head_dim_cfg or self.dim // self.heads


LLAMA3_8B_CONFIG = LlamaConfig()
QWEN2_7B_CONFIG = LlamaConfig(vocab_size=152064, dim=3584, layers=28,
                              heads=28, kv_heads=4, ffn_dim=18944,
                              rope_theta=1000000.0, rms_eps=1e-6,
                              attn_bias=True)
MISTRAL_7B_CONFIG = LlamaConfig(vocab_size=32000, dim=4096, layers=32,
                                heads=32, kv_heads=8, ffn_dim=14336,
                                rope_theta=10000.0, rms_eps=1e-5,
                                sliding_window=4096)
GEMMA_7B_CONFIG = LlamaConfig(vocab_size=256000, dim=3072, layers=28,
                              heads=16, kv_heads=16, ffn_dim=24576,
                              rope_theta=10000.0, rms_eps=1e-6,
                              norm_plus_one=True, scale_embeds=True,
                              tie_lm_head=True, act="gelu_tanh",
                              head_dim_cfg=256)  # HF gemma-7b: NOT dim//heads
MIXTRAL_8X7B_CONFIG = LlamaConfig(vocab_size=32000, dim=4096, layers=32,
                                  heads=32, kv_heads=8, ffn_dim=14336,
                                  rope_theta=1000000.0, rms_eps=1e-5,
                                  num_experts=8, experts_per_tok=2)
QWEN2_MOE_A2_7B_CONFIG = LlamaConfig(vocab_size=151936, dim=2048, layers=24,
                                     heads=16, kv_heads=16, ffn_dim=5632,
                                     rope_theta=1000000.0, rms_eps=1e-6,
                                     attn_bias=True, num_experts=60,
                                     experts_per_tok=4, moe_ffn_dim=1408,
                                     norm_topk_prob=False,
                                     shared_expert_dim=5632)


class KVCache(NamedTuple):
    k: jnp.ndarray  # [L, B, T, kvh, hd] (int8 when cfg.kv_quant)
    v: jnp.ndarray
    k_scale: jnp.ndarray | None = None  # [L, B, T, kvh] fp32 absmax/127
    v_scale: jnp.ndarray | None = None

    @classmethod
    def init(cls, cfg: LlamaConfig, batch: int, max_len: int,
             dtype=jnp.float32) -> "KVCache":
        shape = (cfg.layers, batch, max_len, cfg.kv_heads, cfg.head_dim)
        if cfg.kv_quant:
            ss = shape[:-1]
            return cls(jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                       jnp.zeros(ss, jnp.float32), jnp.zeros(ss, jnp.float32))
        return cls(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding, interleaved-halves convention (HF Llama).
    x: [B, S, H, D]; positions: [S] or [B, S]."""
    d = x.shape[-1]
    inv_freq = 1.0 / (theta ** (jnp.arange(0, d, 2, dtype=jnp.float32) / d))
    if positions.ndim == 1:
        positions = positions[None, :]
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [B,S,D/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


def _maybe_lora(mod: nn.Module, x, y):
    """Optional runtime low-rank branch for frozen-quantized layers — the
    QLoRA recipe (reference train.py:1471-1529: kbit base + PEFT LoRA).
    When the caller passes a "lora" collection into `.apply` (tree mirrors
    the module path: {<layer>: {<proj>: {"a": [in,r], "b": [r,out]}}}),
    y += (x @ a) @ b. The adapter SCALE (alpha/r) is folded into `b` by the
    caller (training/vlm_trainer.py::runtime_lora) so inference and the
    trainer share one convention. Quantized kernels cannot fold adapters in
    (apply_lora's W + s*AB needs fp kernels), hence the runtime branch."""
    if mod.has_variable("lora", "a"):
        a = mod.get_variable("lora", "a")
        b = mod.get_variable("lora", "b")
        y = y + ((x.astype(jnp.float32) @ a) @ b).astype(y.dtype)
    return y


class QDense(nn.Module):
    """Dense with int8 weight storage: params {kernel_q int8 [in,out],
    scale f32 [out]} (+bias). The matmul stays s8 on the MXU; only the
    [.., out] accumulator is rescaled. See ops/quant.py."""
    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from ...ops.quant import int8_matmul_ste
        in_f = x.shape[-1]
        q = self.param("kernel_q", nn.initializers.zeros,
                       (in_f, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        # STE wrapper == int8_matmul in forward; its custom backward makes
        # the layer differentiable wrt x (the QLoRA training path)
        y = int8_matmul_ste(x, q, scale, self.dtype)
        y = _maybe_lora(self, x, y)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class Q4Dense(nn.Module):
    """Dense with int4 weight storage: params {kernel_q4 int8 [in//2, out]
    (two nibbles along `in`), scale f32 [in//group, out]} (+bias). The
    contraction is blocked per scale group and stays s8 on the MXU; scales
    apply to the int32 group accumulator. See ops/quant.py::int4_matmul."""
    features: int
    use_bias: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    group: int = 128

    @nn.compact
    def __call__(self, x):
        from ...ops.quant import int4_matmul_ste
        in_f = x.shape[-1]
        g = min(self.group, in_f)
        q = self.param("kernel_q4", nn.initializers.zeros,
                       (in_f // 2, self.features), jnp.int8)
        scale = self.param("scale", nn.initializers.ones,
                           (in_f // g, self.features), jnp.float32)
        y = int4_matmul_ste(x, q, scale, self.dtype)
        y = _maybe_lora(self, x, y)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros,
                           (self.features,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


def _dense(cfg: "LlamaConfig", features: int, use_bias: bool, name: str):
    if cfg.quant == "int8":
        return QDense(features, use_bias=use_bias, dtype=cfg.dtype, name=name)
    if cfg.quant == "int4":
        return Q4Dense(features, use_bias=use_bias, dtype=cfg.dtype,
                       group=cfg.quant_group, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=cfg.dtype, name=name)


_QUANT_MODULES = ("q_proj", "k_proj", "v_proj", "o_proj",
                  "gate_proj", "up_proj", "down_proj", "lm_head")


def quantize_llama_params(params, embed_dtype=None, mode: str = "int8",
                          group: int = 128):
    """Convert a dense LlamaModel param tree to the cfg.quant layout:
    every _QUANT_MODULES kernel becomes {kernel_q, scale} (mode='int8',
    per-output-channel absmax) or {kernel_q4, scale} (mode='int4', packed
    nibbles + per-(group, out) scales); everything else (embeds, norms,
    biases) passes through. embed_dtype: optionally narrow the embedding
    table (bf16 halves the second-largest buffer; the fp32 table alone is
    2.1 GB at 8B scale)."""
    from ...ops.quant import quantize_weight, quantize_weight_int4

    def qmod(kernel):
        if mode == "int4":
            ql = quantize_weight_int4(jnp.asarray(kernel), group=group)
            return {"kernel_q4": ql.packed, "scale": ql.scale}
        ql = quantize_weight(jnp.asarray(kernel))
        return {"kernel_q": ql.q, "scale": ql.scale}

    def walk(d):
        out = {}
        for k, v in d.items():
            if k.startswith("experts_") or k == "moe":
                # stacked MoE expert kernels have no quantized execution
                # path (MoEFFN ignores cfg.quant) — quantizing around them
                # would silently leave ~95% of a Mixtral's weights wide
                raise NotImplementedError(
                    "weight-only quantization does not cover MoE expert "
                    "stacks yet — load MoE families unquantized")
            if isinstance(v, dict):
                if k in _QUANT_MODULES and "kernel" in v:
                    nv = qmod(v["kernel"])
                    if "bias" in v:
                        nv["bias"] = jnp.asarray(v["bias"], jnp.float32)
                    out[k] = nv
                else:
                    out[k] = walk(v)
            elif k == "embedding" and embed_dtype is not None:
                out[k] = jnp.asarray(v, embed_dtype)
            else:
                out[k] = v
        return out

    return walk(params)


class RMSNorm(nn.Module):
    eps: float = 1e-5
    plus_one: bool = False  # Gemma convention: scale by (1 + w)

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.plus_one else nn.initializers.ones
        w = self.param("weight", init, (x.shape[-1],))
        xf = x.astype(jnp.float32)
        n = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + self.eps)
        scale = (1.0 + w) if self.plus_one else w
        return (n * scale).astype(x.dtype)


class LlamaBlock(nn.Module):
    cfg: LlamaConfig

    @nn.compact
    def __call__(self, x, layer_k, layer_v, start_pos, valid_len,
                 layer_ks=None, layer_vs=None):
        """x: [B, S, D] new tokens at absolute positions start_pos..+S.
        layer_k/v: [B, T, kvh, hd] cache for this layer (full buffer;
        int8 with [B, T, kvh] fp32 scales layer_ks/vs when cfg.kv_quant).
        start_pos: scalar, or a [B] array for batched decode of rows with
        different prompt lengths (each row stays CONTIGUOUS in its cache:
        physical slot == logical position, so masking is purely causal).
        Returns (out, new_layer_k, new_layer_v, new_layer_ks, new_layer_vs)."""
        cfg = self.cfg
        b, s, _ = x.shape
        hd = cfg.head_dim
        per_row = getattr(start_pos, "ndim", 0) == 1
        h = RMSNorm(cfg.rms_eps, cfg.norm_plus_one, name="attn_norm")(x)
        bias = cfg.attn_bias
        q = _dense(cfg, cfg.heads * hd, bias,
                   "q_proj")(h).reshape(b, s, cfg.heads, hd)
        k = _dense(cfg, cfg.kv_heads * hd, bias,
                   "k_proj")(h).reshape(b, s, cfg.kv_heads, hd)
        v = _dense(cfg, cfg.kv_heads * hd, bias,
                   "v_proj")(h).reshape(b, s, cfg.kv_heads, hd)
        if per_row:
            positions = start_pos[:, None] + jnp.arange(s)[None]  # [B,S]
        else:
            positions = start_pos + jnp.arange(s)                 # [S]
        q = rope(q, positions, cfg.rope_theta)
        k = rope(k, positions, cfg.rope_theta)

        if cfg.kv_quant:
            # per-(position, kv-head) absmax int8: scales ride along the
            # same cache indices; dequant fuses into the attention dot's
            # operand read, so HBM streams int8 + 0.4% scale bytes
            k_sc = jnp.max(jnp.abs(k.astype(jnp.float32)),
                           axis=-1) / 127.0 + 1e-8          # [B, S, kvh]
            v_sc = jnp.max(jnp.abs(v.astype(jnp.float32)),
                           axis=-1) / 127.0 + 1e-8
            k_st = jnp.round(k.astype(jnp.float32)
                             / k_sc[..., None]).astype(jnp.int8)
            v_st = jnp.round(v.astype(jnp.float32)
                             / v_sc[..., None]).astype(jnp.int8)
        else:
            k_st, v_st = k.astype(layer_k.dtype), v.astype(layer_v.dtype)
        if per_row:
            rows = jnp.arange(b)[:, None]
            layer_k = layer_k.at[rows, positions].set(k_st)
            layer_v = layer_v.at[rows, positions].set(v_st)
            if cfg.kv_quant:
                layer_ks = layer_ks.at[rows, positions].set(k_sc)
                layer_vs = layer_vs.at[rows, positions].set(v_sc)
        else:
            layer_k = jax.lax.dynamic_update_slice(
                layer_k, k_st, (0, start_pos, 0, 0))
            layer_v = jax.lax.dynamic_update_slice(
                layer_v, v_st, (0, start_pos, 0, 0))
            if cfg.kv_quant:
                layer_ks = jax.lax.dynamic_update_slice(
                    layer_ks, k_sc, (0, start_pos, 0))
                layer_vs = jax.lax.dynamic_update_slice(
                    layer_vs, v_sc, (0, start_pos, 0))
        rep = cfg.heads // cfg.kv_heads
        if (s > 1 and isinstance(start_pos, int) and start_pos == 0
                and cfg.sliding_window is None):
            # prefill from position 0: no cache history to attend — use the
            # attention dispatcher (Pallas flash on TPU for anyres-length
            # prompts; no [S,S] fp32 logits materialization). GQA repeat is
            # a one-time prefill cost here, not a per-decode-step one.
            # Batched prompts RIGHT-pad to a shared bucket before this call:
            # pad garbage is strictly in the causal future of every real
            # token, and decode later overwrites it slot by slot.
            from ...ops.attention import attention as attn_op
            kk = jnp.repeat(k, rep, axis=2).astype(q.dtype)
            vv = jnp.repeat(v, rep, axis=2).astype(q.dtype)
            o = attn_op(q, kk, vv, causal=True).astype(x.dtype)
        else:
            # decode / general path: grouped-query einsum directly against
            # the UNREPEATED cache — the old jnp.repeat streamed a
            # heads/kv_heads x larger K/V copy out of HBM every decode step
            t = layer_k.shape[1]
            if cfg.kv_quant:
                k_eff = (layer_k * layer_ks[..., None]).astype(q.dtype)
                v_eff = (layer_v * layer_vs[..., None]).astype(q.dtype)
            else:
                # cast BOTH operands to compute dtype: with an fp32 cache
                # an uncast V would stream 2x the bytes into the PV einsum
                # on the memory-bound decode path
                k_eff = layer_k.astype(q.dtype)
                v_eff = layer_v.astype(q.dtype)
            qg = q.reshape(b, s, cfg.kv_heads, rep, hd)
            logits = jnp.einsum(
                "bqgrd,bkgd->bgrqk", qg, k_eff,
                preferred_element_type=jnp.float32) / (hd ** 0.5)
            if per_row:
                q_pos = positions[:, None, None, :, None]
                vl = valid_len.reshape(b, 1, 1, 1, 1)
            else:
                q_pos = positions[None, None, None, :, None]
                vl = valid_len
            k_pos = jnp.arange(t)[None, None, None, None, :]
            mask = (k_pos <= q_pos) & (k_pos < vl)
            if cfg.sliding_window is not None:
                mask = mask & (k_pos > q_pos - cfg.sliding_window)
            logits = jnp.where(mask, logits, -1e30)
            probs = jax.nn.softmax(logits, axis=-1).astype(v_eff.dtype)
            o = jnp.einsum("bgrqk,bkgd->bqgrd", probs, v_eff,
                           preferred_element_type=jnp.float32)
            o = o.reshape(b, s, cfg.heads, hd).astype(x.dtype)
        o = _dense(cfg, cfg.dim, False,
                   "o_proj")(o.reshape(b, s, cfg.heads * hd))
        x = x + o

        h = RMSNorm(cfg.rms_eps, cfg.norm_plus_one, name="mlp_norm")(x)
        act = nn.silu if cfg.act == "silu" else \
            (lambda v: nn.gelu(v, approximate=True))
        if cfg.num_experts > 0:
            down = MoEFFN(cfg, name="moe")(h)
        else:
            gate = _dense(cfg, cfg.ffn_dim, False, "gate_proj")(h)
            up = _dense(cfg, cfg.ffn_dim, False, "up_proj")(h)
            down = _dense(cfg, cfg.dim, False, "down_proj")(act(gate) * up)
        return x + down, layer_k, layer_v, layer_ks, layer_vs


class MoEFFN(nn.Module):
    """Sparse-MoE FFN (Mixtral MixtralSparseMoeBlock / Qwen2-MoE
    Qwen2MoeSparseMoeBlock semantics): fp32-softmax router, top-k expert
    selection (optionally renormalized), SwiGLU experts, plus Qwen2-MoE's
    sigmoid-gated shared expert.

    TPU design: expert kernels live STACKED on a leading expert axis and
    every expert runs on every token as one batched einsum (dense-mix); the
    top-k routing weights zero out non-selected experts, so the result is
    numerically identical to gather-dispatch. On a mesh, shard the expert
    axis (expert parallelism) — each device computes its expert shard and
    XLA reduces the weighted sum; no capacity limits, no token dropping,
    and no dynamic shapes under jit."""
    cfg: "LlamaConfig"

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        e, d = cfg.num_experts, cfg.dim
        f = cfg.moe_ffn_dim or cfg.ffn_dim
        router = nn.Dense(e, use_bias=False, dtype=cfg.dtype, name="router")
        probs = jax.nn.softmax(router(h).astype(jnp.float32), axis=-1)
        topv, topi = jax.lax.top_k(probs, cfg.experts_per_tok)
        if cfg.norm_topk_prob:
            topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
        # [B,S,E] combine weights (zero for unselected experts)
        w = jnp.einsum("bske,bsk->bse",
                       jax.nn.one_hot(topi, e, dtype=jnp.float32), topv)
        init = nn.initializers.lecun_normal()
        gate_k = self.param("experts_gate", init, (e, d, f))
        up_k = self.param("experts_up", init, (e, d, f))
        down_k = self.param("experts_down", init, (e, f, d))
        hc = h.astype(cfg.dtype)
        g = jnp.einsum("bsd,edf->bsef", hc, gate_k.astype(cfg.dtype))
        u = jnp.einsum("bsd,edf->bsef", hc, up_k.astype(cfg.dtype))
        y = jnp.einsum("bsef,efd->bsed", nn.silu(g) * u,
                       down_k.astype(cfg.dtype))
        out = jnp.einsum("bsed,bse->bsd", y, w.astype(y.dtype))
        if cfg.shared_expert_dim:
            sg = nn.Dense(cfg.shared_expert_dim, use_bias=False,
                          dtype=cfg.dtype, name="shared_gate_proj")(hc)
            su = nn.Dense(cfg.shared_expert_dim, use_bias=False,
                          dtype=cfg.dtype, name="shared_up_proj")(hc)
            sd = nn.Dense(d, use_bias=False, dtype=cfg.dtype,
                          name="shared_down_proj")(nn.silu(sg) * su)
            gate1 = nn.Dense(1, use_bias=False, dtype=cfg.dtype,
                             name="shared_expert_gate")(hc)
            out = out + jax.nn.sigmoid(gate1) * sd
        return out.astype(h.dtype)


class LlamaModel(nn.Module):
    cfg: LlamaConfig = LLAMA3_8B_CONFIG

    def setup(self):
        cfg = self.cfg
        if cfg.quant and cfg.num_experts > 0:
            raise NotImplementedError(
                "cfg.quant does not cover MoE expert stacks (MoEFFN runs "
                "them full-precision) — quantizing only the attention "
                "projections would leave ~95% of the weights wide")
        self.embed_tokens = nn.Embed(cfg.vocab_size, cfg.dim,
                                     param_dtype=jnp.float32, name="embed_tokens")
        # static_argnums keeps start_pos/valid_len as PYTHON ints through
        # the remat trace — otherwise the flash-prefill gate
        # (`isinstance(start_pos, int)` below) sees a tracer and training
        # silently falls into the quadratic masked-einsum branch. Remat is
        # a training knob: prefill-from-0 calls pass ints; traced decode
        # positions on a remat model would raise a hashability error.
        # NB nn.remat counts the module itself as arg 0, so __call__'s
        # (start_pos, valid_len) are positions (4, 5) — (3, 4) would pin
        # (layer_v, start_pos) and leak valid_len in as a tracer
        # (verified empirically against flax 0.12).
        block_cls = (nn.remat(LlamaBlock, static_argnums=(4, 5))
                     if cfg.remat else LlamaBlock)
        self.blocks = [block_cls(cfg, name=f"layer_{i}")
                       for i in range(cfg.layers)]
        self.norm = RMSNorm(cfg.rms_eps, cfg.norm_plus_one, name="norm")
        if not cfg.tie_lm_head:
            self.lm_head = _dense(cfg, cfg.vocab_size, False, "lm_head")

    def embed(self, tokens: jnp.ndarray) -> jnp.ndarray:
        e = self.embed_tokens(tokens).astype(self.cfg.dtype)
        if self.cfg.scale_embeds:
            e = e * jnp.sqrt(jnp.float32(self.cfg.dim)).astype(e.dtype)
        return e

    def from_tokens(self, tokens: jnp.ndarray, cache: KVCache, start_pos):
        """Token-id entry point (also ensures init touches embed_tokens)."""
        return self(self.embed(tokens), cache, start_pos)

    def __call__(self, embeds: jnp.ndarray, cache: KVCache, start_pos):
        """embeds: [B, S, D]; returns (logits [B, S, vocab], new cache).
        start_pos: scalar, or [B] per-row positions (batched decode)."""
        valid_len = start_pos + embeds.shape[1]
        x = embeds.astype(self.cfg.dtype)
        new_k, new_v, new_ks, new_vs = [], [], [], []
        for i, block in enumerate(self.blocks):
            lks = cache.k_scale[i] if cache.k_scale is not None else None
            lvs = cache.v_scale[i] if cache.v_scale is not None else None
            x, lk, lv, lks, lvs = block(x, cache.k[i], cache.v[i],
                                        start_pos, valid_len, lks, lvs)
            new_k.append(lk)
            new_v.append(lv)
            new_ks.append(lks)
            new_vs.append(lvs)
        x = self.norm(x)
        if self.cfg.tie_lm_head:
            logits = self.embed_tokens.attend(x).astype(jnp.float32)
        else:
            logits = self.lm_head(x).astype(jnp.float32)
        if self.cfg.kv_quant:
            return logits, KVCache(jnp.stack(new_k), jnp.stack(new_v),
                                   jnp.stack(new_ks), jnp.stack(new_vs))
        return logits, KVCache(jnp.stack(new_k), jnp.stack(new_v))
