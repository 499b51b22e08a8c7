#!/usr/bin/env python
"""Composite pipeline benchmark (our records; the driver runs bench.py).

Measures on the real chip, fetch-synced:
  1. Stage-1 SR3: 500-step loop @224^2 (the shipped val schedule)
  2. Stage-2b: one SDXL+ControlNet denoise step @ latent 64^2 and the
     implied 50-step loop
  3. SDXL VAE decode @512px
  4. Llama decode proxy tokens/s (2B-scale config; the real 8B runs
     TP-sharded over a slice, parallel/llama_sharding.py)

Prints one JSON line with the composite per-image estimate.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent XLA compilation cache: parts are dominated by remote-relay
# compiles (the actual measured kernels run in ms..s); a warm cache turns
# a several-minute part into seconds, which is what lets bench.py fit the
# driver's wall clock. Entries key on (HLO, flags, backend) — a code
# change simply misses and recompiles.
from rsvldm_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])


def timed(f, *args, n=2):
    out = f(*args)
    fetch(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best


def dispatch_overhead():
    """Measured per-call cost of the axon relay round trip (~33 ms): timed
    on a trivial jitted op, subtracted from single-call kernel timings.
    Anything that runs inside ONE jit in the real pipeline (scan loops)
    must not be charged for per-step dispatch — but big multi-step programs
    stall the remote-compile relay when built standalone, so parts measure
    one step and correct with this."""
    x = jnp.zeros((8, 8))
    f = jax.jit(lambda v: v + 1.0)
    return timed(lambda: f(x), n=4)


def zeros_like_shapes(tree):
    return jax.tree_util.tree_map(lambda s: jnp.zeros(s.shape, s.dtype), tree)


# v5e single-chip ceilings: 197 TFLOP/s bf16, 819 GB/s HBM
V5E_PEAK_FLOPS = 197e12
V5E_PEAK_BW = 819e9


def aot(jitted, *args):
    """AOT-compile once; the same executable is then TIMED and asked for
    cost_analysis — no second compile through the remote relay (which
    roughly doubled bench wall-clock per part before)."""
    return jitted.lower(*args).compile()


def roofline(compiled, t_seconds, prefix="", trips=1):
    """MFU / HBM utilization from the compiled program's cost analysis —
    anchors 'fast' in hardware ceilings instead of baseline assumptions
    (round-2 review Weak #4). Returns {} when cost_analysis is unavailable
    (e.g. relay backends that don't expose it).

    trips: XLA's cost analysis counts a while/scan BODY once — pass the
    known trip count for scan-shaped programs (500-step SR3 loop, N-token
    decode) so the totals reflect actual executed work.

    Both percentages are normalized to the BF16 ceilings. int8-MXU-
    dominated programs (the quantized prefill) can legitimately exceed
    100% mfu_pct — the s8xs8 MXU peak is ~2x bf16 — and cost_analysis
    "bytes accessed" counts VMEM-reused reads, so hbm_pct > 100% marks
    fused reuse, not impossible bandwidth."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fl = float(ca.get("flops", 0.0)) * trips
        by = float(ca.get("bytes accessed", 0.0)) * trips
        out = {}
        if fl > 0:
            out[f"{prefix}mfu_pct"] = round(
                100.0 * fl / t_seconds / V5E_PEAK_FLOPS, 2)
        if by > 0:
            out[f"{prefix}hbm_pct"] = round(
                100.0 * by / t_seconds / V5E_PEAK_BW, 2)
        return out
    except Exception:
        return {}


def _part(name):
    """Run one section in-process (invoked in a subprocess per part so the
    16GB HBM is not shared across model families)."""
    return PARTS[name]()


def dummy_llama_params(lm, cfg):
    """Build a llama param tree directly at size in the model's quantized
    layout (host-side eval_shape -> ones/zeros; no fp32 8B intermediate
    ever exists). The embed table is cast bf16 — the one fp32 leaf that
    must shrink for the 8B to fit a 16 GB chip. Shared by every llama
    bench (bench_full parts, bench_engine, bench_spec)."""
    from rsvldm_tpu.models.vlm.llama import KVCache
    cache = KVCache.init(cfg, 1, 8, jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda k: lm.init(k, jnp.zeros((1, 8), jnp.int32), cache, 0,
                          method=lm.from_tokens), jax.random.PRNGKey(0))

    def mk(s):
        if s.dtype == jnp.float32 and s.shape == (cfg.vocab_size, cfg.dim):
            return jnp.zeros(s.shape, jnp.bfloat16)
        return jnp.ones(s.shape, s.dtype)
    return jax.tree_util.tree_map(mk, shapes)


def part_hbm_peak():
    """Measured ACHIEVABLE HBM read bandwidth on this chip — the anchor for
    every "decode is at weight-streaming speed-of-light" claim. The 819 GB/s
    v5e figure is the paper peak; real programs see less, and the decode
    parts should be judged against what a pure streaming loop actually
    reaches here, not the datasheet.

    A lax.scan whose every iteration reduces the FULL 2 GiB buffer through
    the carry (acc enters the elementwise op, so iterations are serially
    dependent and XLA can neither hoist the reduction out of the loop nor
    CSE it across steps). bytes = N * |x| in ONE jit; 64 iterations put the
    program at ~200+ ms so the relay's ~33 ms dispatch floor is both
    amortized AND subtracted (same correction as the sibling parts)."""
    import jax.lax as lax
    gib = float(os.environ.get("RSVLDM_BENCH_HBM_GIB", "2"))
    n_elems = int(gib * 1024**3) // 2     # bf16 buffer (env knob for smoke)
    x = jnp.ones((n_elems,), jnp.bfloat16)
    n_iters = 64

    @jax.jit
    def stream(x):
        def body(acc, _):
            # acc-dependent elementwise -> full re-read each iteration
            return jnp.max(x + acc.astype(jnp.bfloat16)).astype(jnp.float32), None
        acc, _ = lax.scan(body, jnp.float32(0), None, length=n_iters)
        return acc

    fc = aot(stream, x)
    raw = timed(lambda: fc(x), n=3)
    dt = max(raw - dispatch_overhead(), raw / 4)
    gbs = n_iters * (n_elems * 2) / dt / 1e9
    return {"hbm_read_gbs_measured": round(gbs, 1),
            "hbm_read_pct_of_peak": round(100.0 * gbs * 1e9 / V5E_PEAK_BW, 1)}


def part_stage1():
    from rsvldm_tpu.models.sr3 import (SR3Diffusion, SR3UNet, SR3UNetConfig,
                                       sr3_sample)
    cfg = SR3UNetConfig(inner_channel=64, channel_mults=(1, 2, 4, 8, 8),
                        attn_res=(28,), res_blocks=1, image_size=224,
                        dtype=jnp.bfloat16)
    model = SR3UNet(cfg)
    cond = jnp.zeros((1, 224, 224, 3))
    # eval_shape zeros, NOT model.init: a real init is its own full XLA
    # program and cost 300+ s through the remote-compile relay on a bad
    # day (round-4 measurement) — 20x the program actually being timed
    params = zeros_like_shapes(jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 224, 224, 6)),
                             jnp.ones((1, 1))), jax.random.PRNGKey(0)))
    diff = SR3Diffusion.from_schedule(n_timestep=500)
    f1 = jax.jit(lambda p, c, r: sr3_sample(
        diff, lambda pp, x, nl: model.apply(pp, x, nl), p, c, r))
    rng = jax.random.PRNGKey(1)
    f1c = aot(f1, params, cond, rng)
    t = timed(lambda: f1c(params, cond, rng), n=2)
    return {"stage1_500step_s": t,
            **roofline(f1c, t, prefix="stage1_", trips=500)}


def part_sdxl():
    from rsvldm_tpu.models.sdxl import (ControlledUNet, GLVControl,
                                        SDXLUNetConfig)
    from rsvldm_tpu.models.sdxl.denoiser import ControlDenoiser
    ucfg = SDXLUNetConfig(dtype=jnp.bfloat16)
    unet, ctrl = ControlledUNet(ucfg), GLVControl(ucfg)
    n, h, w = 2, 64, 64
    x = jnp.zeros((n, h, w, 4), jnp.bfloat16)
    t = jnp.zeros((n,))
    ca = jnp.zeros((n, 77, 2048), jnp.bfloat16)
    vec = jnp.zeros((n, 2816), jnp.bfloat16)
    cp = zeros_like_shapes(jax.eval_shape(
        lambda k: ctrl.init(k, x, x, t, ca, vec), jax.random.PRNGKey(0)))
    feats = zeros_like_shapes(jax.eval_shape(
        lambda p: ctrl.apply(p, x, x, t, ca, vec), cp))
    up = zeros_like_shapes(jax.eval_shape(
        lambda k: unet.init(k, x, t, ca, vec, feats), jax.random.PRNGKey(1)))

    # single step, dispatch-corrected. Both a lax.scan and an unrolled
    # multi-step chain around the full XL denoiser stall the remote-compile
    # relay when built standalone (the real pipeline's 50-step sampling
    # scan is compiled once per run shape on the chip itself); in the real
    # sampler all steps live inside one jit, so per-step dispatch must not
    # be charged. Params are jit ARGUMENTS (like the pipeline's _sample_jit)
    # — closing over them would bake them in as constants and let XLA fold
    # the known-zero weights, faking a faster step.
    def step(up, cp, xx, sigma):
        den = ControlDenoiser(unet=unet, control_net=ctrl, unet_params=up,
                              control_params=cp)
        return den(xx, sigma, dict(crossattn=ca, vector=vec, control=xx))

    f2 = jax.jit(step)
    sigma = jnp.full((n,), 14.6)
    f2c = aot(f2, up, cp, x, sigma)
    raw = timed(lambda: f2c(up, cp, x, sigma), n=8)
    dt = max(raw - dispatch_overhead(), raw / 4)

    # cache-HIT step cost: on a DFBCache hit the sampler still pays the
    # ControlNet + UNet input blocks (denoiser.first — the reference's
    # ControlWrapper always runs control_model, and *stage1 fbcache modes
    # run the input blocks) plus the rel-L1 similarity test; the middle +
    # injected decoder (denoiser.rest) is skipped via lax.cond. The
    # composite deliberately counts NO hits (data-dependent); this bounds
    # the cache-active rate: real = miss_steps*step + hit_steps*hit_step.
    from rsvldm_tpu.diffusion.samplers import _rel_l1

    def hit_step(up, cp, xx, sigma, prev_h):
        den = ControlDenoiser(unet=unet, control_net=ctrl, unet_params=up,
                              control_params=cp)
        p = den.first(xx, sigma, dict(crossattn=ca, vector=vec, control=xx))
        # every field of the PartialState is a live output: in the sampler
        # `first` runs unconditionally (its ControlNet features are cond
        # OPERANDS even on a hit) — only (diff, p.h) as outputs would let
        # XLA dead-code the ControlNet and fake a cheaper hit
        return _rel_l1(p.h, prev_h), (p.h, p.hs, p.emb, p.control, p.x,
                                      p.c_skip, p.c_out)

    fh = jax.jit(hit_step)
    den0 = ControlDenoiser(unet=unet, control_net=ctrl, unet_params=up,
                           control_params=cp)
    prev_h = jnp.zeros(den0.first_block_shape(n, h, w), jnp.bfloat16)
    fhc = aot(fh, up, cp, x, sigma, prev_h)
    raw_h = timed(lambda: fhc(up, cp, x, sigma, prev_h), n=8)
    dt_h = max(raw_h - dispatch_overhead(), raw_h / 4)
    return {"sdxl_step_64lat_s": dt, "stage2_50step_est_s": 50 * dt,
            "sdxl_step_hit_s": dt_h,
            **roofline(f2c, dt, prefix="sdxl_")}


def part_sdxl_1024():
    """One CFG-doubled SDXL+ControlNet denoise step at a 128^2 LATENT —
    the reference's PRODUCTION resolution: PIL2Tensor(min_size=1024)
    (models/util.py:132-156, infer.py:47) puts every real image at a
    >=1024px stage-2 input, i.e. a >=128^2 latent with 4x the spatial
    work of the 512px step. Round-3 review Weak #2: the composite must be
    demonstrated at this path too."""
    from rsvldm_tpu.models.sdxl import (ControlledUNet, GLVControl,
                                        SDXLUNetConfig)
    from rsvldm_tpu.models.sdxl.denoiser import ControlDenoiser
    ucfg = SDXLUNetConfig(dtype=jnp.bfloat16)
    unet, ctrl = ControlledUNet(ucfg), GLVControl(ucfg)
    n, h, w = 2, 128, 128
    x = jnp.zeros((n, h, w, 4), jnp.bfloat16)
    t = jnp.zeros((n,))
    ca = jnp.zeros((n, 77, 2048), jnp.bfloat16)
    vec = jnp.zeros((n, 2816), jnp.bfloat16)
    cp = zeros_like_shapes(jax.eval_shape(
        lambda k: ctrl.init(k, x, x, t, ca, vec), jax.random.PRNGKey(0)))
    feats = zeros_like_shapes(jax.eval_shape(
        lambda p: ctrl.apply(p, x, x, t, ca, vec), cp))
    up = zeros_like_shapes(jax.eval_shape(
        lambda k: unet.init(k, x, t, ca, vec, feats), jax.random.PRNGKey(1)))

    def step(up, cp, xx, sigma):
        den = ControlDenoiser(unet=unet, control_net=ctrl, unet_params=up,
                              control_params=cp)
        return den(xx, sigma, dict(crossattn=ca, vector=vec, control=xx))

    f2 = jax.jit(step)
    sigma = jnp.full((n,), 14.6)
    f2c = aot(f2, up, cp, x, sigma)
    raw = timed(lambda: f2c(up, cp, x, sigma), n=8)
    dt = max(raw - dispatch_overhead(), raw / 4)

    # cache-HIT step at the production latent (see part_sdxl for the
    # contract): at 128^2 the skipped middle+decoder is most of the step,
    # so [hit, miss] meaningfully bounds the cache-active 1024px rate
    from rsvldm_tpu.diffusion.samplers import _rel_l1

    def hit_step(up, cp, xx, sigma, prev_h):
        den = ControlDenoiser(unet=unet, control_net=ctrl, unet_params=up,
                              control_params=cp)
        p = den.first(xx, sigma, dict(crossattn=ca, vector=vec, control=xx))
        return _rel_l1(p.h, prev_h), (p.h, p.hs, p.emb, p.control, p.x,
                                      p.c_skip, p.c_out)

    den0 = ControlDenoiser(unet=unet, control_net=ctrl, unet_params=up,
                           control_params=cp)
    prev_h = jnp.zeros(den0.first_block_shape(n, h, w), jnp.bfloat16)
    fhc = aot(jax.jit(hit_step), up, cp, x, sigma, prev_h)
    raw_h = timed(lambda: fhc(up, cp, x, sigma, prev_h), n=8)
    dt_h = max(raw_h - dispatch_overhead(), raw_h / 4)
    return {"sdxl_step_128lat_s": dt, "sdxl_step_128lat_hit_s": dt_h,
            **roofline(f2c, dt, prefix="sdxl1024_")}


def part_vae_1024():
    """SDXL VAE decode at the production 128^2 latent (1024px image) —
    the 1024px-composite sibling of part_vae. The pipeline's default
    config decodes this un-tiled (use_tile_vae=False, config.py:127);
    tiled decode parity/sharding is covered by tests and dryrun."""
    from rsvldm_tpu.models.vae import AutoencoderKL, SDXL_VAE_CONFIG
    import dataclasses
    vcfg = dataclasses.replace(SDXL_VAE_CONFIG, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg)
    vp = zeros_like_shapes(jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3))),
        jax.random.PRNGKey(2)))
    z = jnp.zeros((1, 128, 128, 4))
    fv = jax.jit(lambda p, zz: vae.apply(p, zz, method=vae.decode))
    fvc = aot(fv, vp, z)
    raw = timed(lambda: fvc(vp, z), n=8)
    dt = max(raw - dispatch_overhead(), raw / 4)
    return {"vae_decode_1024px_s": dt, **roofline(fvc, dt, prefix="vae1024_")}


def part_vae():
    from rsvldm_tpu.models.vae import AutoencoderKL, SDXL_VAE_CONFIG
    import dataclasses
    vcfg = dataclasses.replace(SDXL_VAE_CONFIG, dtype=jnp.bfloat16)
    vae = AutoencoderKL(vcfg)
    vp = zeros_like_shapes(jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 64, 64, 3))),
        jax.random.PRNGKey(2)))
    z = jnp.zeros((1, 64, 64, 4))
    fv = jax.jit(lambda p, zz: vae.apply(p, zz, method=vae.decode))
    fvc = aot(fv, vp, z)  # params as jit args
    raw = timed(lambda: fvc(vp, z), n=8)
    # dispatch-corrected (see dispatch_overhead)
    dt = max(raw - dispatch_overhead(), raw / 4)
    return {"vae_decode_512px_s": dt, **roofline(fvc, dt, prefix="vae_")}


def part_llama():
    from rsvldm_tpu.models.vlm.llama import KVCache, LlamaConfig, LlamaModel
    lcfg = LlamaConfig(vocab_size=128256, dim=4096, layers=8, heads=32,
                       kv_heads=8, ffn_dim=14336, dtype=jnp.bfloat16)
    lm = LlamaModel(lcfg)
    cache = KVCache.init(lcfg, 1, 1024, jnp.bfloat16)
    lp = zeros_like_shapes(jax.eval_shape(
        lambda k: lm.init(k, jnp.zeros((1, 8), jnp.int32), cache, 0,
                          method=lm.from_tokens), jax.random.PRNGKey(3)))

    def decode32(params, cache):
        def body(carry, i):
            tok, cache = carry
            emb = lm.apply(params, tok[None, None], method=lm.embed)
            lg, cache = lm.apply(params, emb, cache, 512 + i)
            return (jnp.argmax(lg[0, -1]).astype(jnp.int32), cache), 0.0
        (tok, cache), _ = jax.lax.scan(body, (jnp.int32(1), cache),
                                       jnp.arange(32))
        return tok

    fd = jax.jit(decode32)
    dt = timed(lambda: fd(lp, cache), n=2)
    tok_s = 32 / dt
    # 8B has 4x the layers of this proxy
    return {"llama2B_tok_s": tok_s, "llama8B_est_tok_s": tok_s / 4}


def part_llama_int8():
    """MEASURED decode at the FULL 8B geometry (32 layers, real dims,
    128k vocab, 4k KV cache) — weight-only int8 keeps the whole model
    (~7.5 GB projections int8 + bf16 embed) on ONE 16 GB chip, which bf16
    cannot do. Per the round-2 review, this replaces the extrapolated
    8-layer-proxy/4 number with a real one. Decode tok/s is the HBM weight
    stream: every token reads every int8 weight byte once."""
    import dataclasses

    from rsvldm_tpu.models.vlm.llama import (KVCache, LLAMA3_8B_CONFIG,
                                             LlamaModel)
    lcfg = dataclasses.replace(LLAMA3_8B_CONFIG, dtype=jnp.bfloat16,
                               quant="int8")
    lm = LlamaModel(lcfg)
    cache = KVCache.init(lcfg, 1, 4096, jnp.bfloat16)
    lp = dummy_llama_params(lm, lcfg)

    def decode(params, cache, n):
        def body(carry, i):
            tok, cache = carry
            emb = lm.apply(params, tok[None, None], method=lm.embed)
            lg, cache = lm.apply(params, emb, cache, 3500 + i)
            return (jnp.argmax(lg[0, -1]).astype(jnp.int32), cache), 0.0
        (tok, cache), _ = jax.lax.scan(body, (jnp.int32(1), cache),
                                       jnp.arange(n))
        return tok

    fd = jax.jit(decode, static_argnums=2)
    n = 16
    fdc = aot(fd, lp, cache, n)
    # best-of-6: the decode tok/s is the composite's largest term and a
    # 2-sample best once caught a 35% congestion outlier (39 tok/s)
    dt = timed(lambda: fdc(lp, cache), n=6)
    return {"llama8B_int8_tok_s": n / dt,
            **roofline(fdc, dt, prefix="llama_int8_", trips=n)}


def part_llama_int4():
    """MEASURED decode at the FULL 8B geometry with int4 weight-only
    (group-128 scales, packed nibbles — the load_4bit/NF4 equivalent,
    builder.py:35-37): ~3.7 GB projections + bf16 embed. Halves the decode
    weight stream again vs int8."""
    import dataclasses

    from rsvldm_tpu.models.vlm.llama import (KVCache, LLAMA3_8B_CONFIG,
                                             LlamaModel)
    lcfg = dataclasses.replace(LLAMA3_8B_CONFIG, dtype=jnp.bfloat16,
                               quant="int4")
    lm = LlamaModel(lcfg)
    cache = KVCache.init(lcfg, 1, 4096, jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda k: lm.init(k, jnp.zeros((1, 8), jnp.int32), cache, 0,
                          method=lm.from_tokens), jax.random.PRNGKey(0))

    def mk(s):
        if s.dtype == jnp.float32 and s.shape == (lcfg.vocab_size, lcfg.dim):
            return jnp.zeros(s.shape, jnp.bfloat16)  # embed table bf16
        return jnp.ones(s.shape, s.dtype)
    lp = jax.tree_util.tree_map(mk, shapes)

    def decode(params, cache, n):
        def body(carry, i):
            tok, cache = carry
            emb = lm.apply(params, tok[None, None], method=lm.embed)
            lg, cache = lm.apply(params, emb, cache, 3500 + i)
            return (jnp.argmax(lg[0, -1]).astype(jnp.int32), cache), 0.0
        (tok, cache), _ = jax.lax.scan(body, (jnp.int32(1), cache),
                                       jnp.arange(n))
        return tok

    fd = jax.jit(decode, static_argnums=2)
    n = 16
    fdc = aot(fd, lp, cache, n)
    dt = timed(lambda: fdc(lp, cache), n=6)
    return {"llama8B_int4_tok_s": n / dt,
            **roofline(fdc, dt, prefix="llama_int4_", trips=n)}


def part_llama_int8kv():
    """int8 weights + int8 KV cache (per-position/head absmax scales) at
    the full 8B geometry: the KV stream at a 4k context is ~0.9 GB/token
    of the ~8.4 GB int8 decode read — quantizing it trims ~10% off the
    per-token HBM traffic and HALVES the cache footprint (double engine
    slots / context per chip)."""
    import dataclasses

    from rsvldm_tpu.models.vlm.llama import (KVCache, LLAMA3_8B_CONFIG,
                                             LlamaModel)
    lcfg = dataclasses.replace(LLAMA3_8B_CONFIG, dtype=jnp.bfloat16,
                               quant="int8", kv_quant=True)
    lm = LlamaModel(lcfg)
    cache = KVCache.init(lcfg, 1, 4096, jnp.bfloat16)
    lp = dummy_llama_params(lm, lcfg)

    def decode(params, cache, n):
        def body(carry, i):
            tok, cache = carry
            emb = lm.apply(params, tok[None, None], method=lm.embed)
            lg, cache = lm.apply(params, emb, cache, 3500 + i)
            return (jnp.argmax(lg[0, -1]).astype(jnp.int32), cache), 0.0
        (tok, cache), _ = jax.lax.scan(body, (jnp.int32(1), cache),
                                       jnp.arange(n))
        return tok

    fd = jax.jit(decode, static_argnums=2)
    n = 16
    fdc = aot(fd, lp, cache, n)
    dt = timed(lambda: fdc(lp, cache), n=6)
    return {"llama8B_int8kv_tok_s": n / dt,
            **roofline(fdc, dt, prefix="llama_int8kv_", trips=n)}


def part_llama_prefill():
    """MEASURED anyres-scale prefill at the full 8B int8 geometry: one
    3584-token prompt (a typical spliced anyres caption prompt is 3-6k
    tokens) through the 32-layer stack — the caption stage cost the
    decode-only term misses. Runs once per image, so it is measured as a
    single fetch-synced call (33 ms relay dispatch is noise at this
    scale)."""
    import dataclasses

    from rsvldm_tpu.models.vlm.llama import (KVCache, LLAMA3_8B_CONFIG,
                                             LlamaModel)
    lcfg = dataclasses.replace(LLAMA3_8B_CONFIG, dtype=jnp.bfloat16,
                               quant="int8")
    lm = LlamaModel(lcfg)
    s = 3584
    cache = KVCache.init(lcfg, 1, 4096, jnp.bfloat16)
    lp = dummy_llama_params(lm, lcfg)
    emb = jnp.zeros((1, s, lcfg.dim), jnp.bfloat16)

    def prefill(params, emb, cache):
        logits, cache = lm.apply(params, emb, cache, 0)
        return logits[0, -1]

    fp = jax.jit(prefill)
    fpc = aot(fp, lp, emb, cache)
    dt = timed(lambda: fpc(lp, emb, cache), n=2)
    return {"llama8B_prefill_3584_s": dt,
            **roofline(fpc, dt, prefix="llama_prefill_")}


def part_sr3_train():
    """SR3 TRAINING step throughput at the reference train geometry
    (configs/sr_sr3.json:22-23 batch 8 @224^2; model geometry :41-57;
    adam 1e-4 + EMA, train schedule linear-2000): the full jitted
    loss+grad+adam+EMA step of training/sr3_trainer.py — the reference's
    sr3_model optimize_parameters equivalent. Informational (training is
    not part of the per-image composite)."""
    from rsvldm_tpu.models.sr3 import SR3UNetConfig
    from rsvldm_tpu.training.sr3_trainer import SR3TrainConfig, SR3Trainer
    mcfg = SR3UNetConfig(inner_channel=64, channel_mults=(1, 2, 4, 8, 8),
                         attn_res=(28,), res_blocks=1, image_size=224,
                         dtype=jnp.bfloat16)
    tr = SR3Trainer(mcfg, SR3TrainConfig())
    b = 8
    hr = jnp.zeros((b, 224, 224, 3))
    sr = jnp.zeros((b, 224, 224, 3))
    rng = jax.random.PRNGKey(1)
    fc = aot(tr._train_step, tr.params, tr.opt_state, tr.ema, hr, sr, rng)
    raw = timed(lambda: fc(tr.params, tr.opt_state, tr.ema, hr, sr, rng),
                n=3)
    dt = max(raw - dispatch_overhead(), raw / 4)
    return {"sr3_train_step_b8_s": dt,
            "sr3_train_img_s": round(b / dt, 1),
            **roofline(fc, dt, prefix="sr3_train_")}


def part_qlora_train():
    """QLoRA finetune step at the FULL 8B geometry on ONE 16 GB chip —
    impossible in bf16 (weights alone are ~16 GB): int8 base (s8 MXU
    forward, STE backward), per-block remat, LoRA r=16 on the attention
    projections, adamw on the adapters only, 2048 supervised tokens per
    step (train.py:1471-1529 kbit+LoRA equivalent). Informational."""
    import dataclasses

    import optax

    from rsvldm_tpu.models.vlm.llama import (KVCache, LLAMA3_8B_CONFIG,
                                             LlamaModel)
    from rsvldm_tpu.training.vlm_trainer import (LoraConfig, init_lora,
                                                 vlm_loss)
    mcfg = dataclasses.replace(LLAMA3_8B_CONFIG, dtype=jnp.bfloat16,
                               quant="int8", remat=True)
    lm = LlamaModel(mcfg)
    lp = dummy_llama_params(lm, mcfg)
    s = 2048
    lcfg = LoraConfig(r=16)
    lora = init_lora(lp, lcfg, jax.random.PRNGKey(0))
    tx = optax.adamw(2e-4)
    opt = tx.init(lora)
    emb = jnp.zeros((1, s, mcfg.dim), jnp.bfloat16)
    labels = jnp.ones((1, s), jnp.int32)
    cache = KVCache.init(mcfg, 1, s, jnp.bfloat16)

    def step(lora, opt, base, emb, labels, cache):
        loss, g = jax.value_and_grad(
            lambda l: vlm_loss(lm, base, l, lcfg, emb, labels, cache))(lora)
        up, opt = tx.update(g, opt, lora)
        return optax.apply_updates(lora, up), opt, loss

    f = jax.jit(step)   # base params as jit ARGS (no constant folding)
    fc = aot(f, lora, opt, lp, emb, labels, cache)
    raw = timed(lambda: fc(lora, opt, lp, emb, labels, cache), n=2)
    dt = max(raw - dispatch_overhead(), raw / 4)
    return {"qlora8B_step_2048tok_s": dt,
            "qlora8B_train_tok_s": round(s / dt, 1),
            **roofline(fc, dt, prefix="qlora_")}


def part_flash_bwd():
    """Fused Pallas flash backward vs the XLA chunked-recompute fallback
    (ROUND3 item 28): a train-shaped grad of the flash attention path at
    8k causal, d=64 (H=8) and d=128 (H=4). 8 serially-dependent grad
    iterations inside ONE jit (carry feeds q) so the relay dispatch floor
    is amortized, same discipline as every other part. TFLOP/s uses the
    FlashAttention convention: fwd = 4*B*H*S^2*D (halved causal),
    fwd+bwd = 3.5x fwd. Informational."""
    import jax.lax as lax

    from rsvldm_tpu.ops.attention import attention

    res = {}
    for d, h, tag in ((64, 8, "d64"), (128, 4, "d128")):
        s = int(os.environ.get("RSVLDM_BENCH_FLASH_SEQ", "8192"))
        shape = (1, s, h, d)
        q = jnp.ones(shape, jnp.bfloat16)
        k = jnp.ones(shape, jnp.bfloat16)
        v = jnp.ones(shape, jnp.bfloat16)
        fwd_flops = 4.0 * h * s * s * d * 0.5
        # 32 iters ≈ 1-2 s of device work for the XLA fallback and ≥300 ms
        # for the Pallas path — at 8 the Pallas grad was ~10 ms of device
        # time vs the ~33 ms relay dispatch and the subtraction was noise
        iters = 32

        def loss(q_, k_, v_):
            return attention(q_, k_, v_, causal=True,
                             impl="flash").astype(jnp.float32).sum()

        def grad_loop(q, k, v):
            # grads wrt ALL THREE operands feed the carry — argnums=0 alone
            # lets XLA DCE the entire dK/dV kernel and the "backward" bench
            # measures only dQ
            def body(carry, _):
                qc, kc, vc = carry
                gq, gk, gv = jax.grad(loss, argnums=(0, 1, 2))(qc, kc, vc)
                return (qc + (1e-6 * gq).astype(qc.dtype),
                        kc + (1e-6 * gk).astype(kc.dtype),
                        vc + (1e-6 * gv).astype(vc.dtype)), None
            (qc, _, _), _ = lax.scan(body, (q, k, v), None, length=iters)
            return qc

        for mode in ("pallas", "xla"):
            os.environ["RSVLDM_FLASH_BWD"] = mode
            # fresh function object per mode: the env var is read at TRACE
            # time, so a shared jit cache entry would alias the two modes
            fc = aot(jax.jit(lambda q, k, v: grad_loop(q, k, v)), q, k, v)
            raw = timed(lambda: fc(q, k, v), n=3)
            dt = max(raw - dispatch_overhead(), raw / 4)
            tfs = 3.5 * fwd_flops * iters / dt / 1e12
            key = (f"flash_bwd_8k_{tag}_tfs" if mode == "pallas"
                   else f"flash_bwd_xla_8k_{tag}_tfs")
            res[key] = round(tfs, 1)
        os.environ.pop("RSVLDM_FLASH_BWD", None)
    return res


def part_flash_fwd():
    """Pallas flash attention FORWARD throughput (informational): causal
    8k at d=64/d=128 (LLaMA-prefill shape) and non-causal 4k at d=64 (the
    SDXL 128x128-latent SpatialTransformer shape class). 32 carry-chained
    calls inside ONE jit amortize the relay dispatch floor. TFLOP/s uses
    4*B*H*S^2*D (halved when causal)."""
    import jax.lax as lax

    from rsvldm_tpu.ops.attention import attention

    res = {}
    for s, d, h, causal, tag in ((8192, 64, 8, True, "8k_d64"),
                                 (8192, 128, 4, True, "8k_d128"),
                                 (4096, 64, 8, False, "4k_d64_nc")):
        shape = (1, s, h, d)
        q = jnp.ones(shape, jnp.bfloat16)
        k = jnp.ones(shape, jnp.bfloat16)
        v = jnp.ones(shape, jnp.bfloat16)
        flops = 4.0 * h * s * s * d * (0.5 if causal else 1.0)
        iters = 32

        def loop(q, k, v):
            def body(acc, _):
                o = attention(q + acc, k, v, causal=causal, impl="flash")
                return acc + (1e-6 * o).astype(acc.dtype), None
            acc, _ = lax.scan(body, jnp.zeros_like(q), None, length=iters)
            return acc

        fc = aot(jax.jit(loop), q, k, v)
        raw = timed(lambda: fc(q, k, v), n=3)
        dt = max(raw - dispatch_overhead(), raw / 4)
        res[f"flash_fwd_{tag}_tfs"] = round(flops * iters / dt / 1e12, 1)
    return res


def part_flash_roofline():
    """Is the flash kernel's d=64 plateau a real VPU softmax bound?
    (round-3 review Weak #4.) Measures the chip's VPU elementwise
    throughput on (a) a bare sub+exp2 chain and (b) the kernel's full
    per-score-element softmax chain (row-max, sub, exp2, row-sum, bf16
    cast) — same VPU the Pallas kernel uses. The flash kernel does 4*d
    MXU FLOPs per score element, so the softmax-bound ceiling is
    chain_rate * 4 * d: if measured flash TF/s sits at that product, the
    kernel is VPU-bound at d=64 and block tuning cannot move it; if the
    ceiling sits far above, the plateau is NOT a softmax bound.

    The chain is applied REPS times per element inside the fused scan
    body so each HBM round-trip of the carry amortizes over REPS chain
    applications — a single application per iteration measures HBM
    bandwidth (~30 Gelem/s on this chip), not the VPU, and implies a
    nonsense ceiling BELOW the kernel's own measured throughput."""
    import jax.lax as lax

    x = jnp.full((2048, 2048), 0.5, jnp.float32)
    iters, reps = 32, 16

    def chain(body):
        def loop(x):
            def step(c, _):
                y = c
                for _ in range(reps):
                    y = body(y)
                return y, None
            y, _ = lax.scan(step, x, None, length=iters)
            return y
        fc = aot(jax.jit(loop), x)
        raw = timed(lambda: fc(x), n=3)
        dt = max(raw - dispatch_overhead(), raw / 4)
        return x.size * reps * iters / dt

    # (a) sub+exp2 only: converges to the stable fixed point y=1
    exp2_rate = chain(lambda y: jnp.exp2(y - 1.0))

    # (b) the kernel's per-element softmax work (flash_attention.py
    # _commit): row-max, sub, exp2, row-sum, cast to the MXU input dtype.
    # p stays in (0, 1] so the chain is stable.
    def softmax_elem(y):
        m = jnp.max(y, axis=-1, keepdims=True)
        p = jnp.exp2(y - m)
        s = jnp.sum(p, axis=-1, keepdims=True)
        return (p + 1e-6 * s).astype(jnp.bfloat16).astype(jnp.float32)

    sm_rate = chain(softmax_elem)

    return {"flash_roofline_exp2_gelem_s": round(exp2_rate / 1e9, 1),
            "flash_roofline_smchain_gelem_s": round(sm_rate / 1e9, 1),
            # softmax-bound flash ceilings implied by (b): rate * 4d FLOPs
            "flash_roofline_d64_bound_tfs": round(sm_rate * 256 / 1e12, 1),
            "flash_roofline_d128_bound_tfs": round(sm_rate * 512 / 1e12, 1)}


def part_sdxl_profile():
    """Per-component split of the PRODUCTION 128^2-latent CFG-doubled SDXL
    step (round-4 review item 7: the step is 62%% of the 1024px composite
    and had only a one-line 'blended' bound claim). Subtractive
    decomposition on the real programs:

      ctrl   — GLVControl alone (the always-paid cache key's biggest part)
      first  — ControlNet + UNet input blocks + similarity test (the
               DFBCache-hit path, denoiser.first)
      rest   — middle + injected decoder + CFG (full - first: what a
               cache hit skips)
      noattn — the same step with attention_resolutions=() (every
               SpatialTransformer removed): full - noattn isolates the
               attention share; noattn is the conv+GN+SFT floor

    Each timing is dispatch-corrected; cost_analysis flops ride along so
    PERF.md can anchor the split in hardware ceilings."""
    from rsvldm_tpu.models.sdxl import (ControlledUNet, GLVControl,
                                        SDXLUNetConfig)
    from rsvldm_tpu.models.sdxl.denoiser import ControlDenoiser

    n, h, w = 2, 128, 128
    t = jnp.zeros((n,))
    ca = jnp.zeros((n, 77, 2048), jnp.bfloat16)
    vec = jnp.zeros((n, 2816), jnp.bfloat16)
    x = jnp.zeros((n, h, w, 4), jnp.bfloat16)
    sigma = jnp.full((n,), 14.6)
    res = {}

    def build(ucfg):
        unet, ctrl = ControlledUNet(ucfg), GLVControl(ucfg)
        cp = zeros_like_shapes(jax.eval_shape(
            lambda k: ctrl.init(k, x, x, t, ca, vec), jax.random.PRNGKey(0)))
        feats = zeros_like_shapes(jax.eval_shape(
            lambda p: ctrl.apply(p, x, x, t, ca, vec), cp))
        up = zeros_like_shapes(jax.eval_shape(
            lambda k: unet.init(k, x, t, ca, vec, feats),
            jax.random.PRNGKey(1)))
        return unet, ctrl, up, cp

    def clock(f, *args, label=""):
        fc = aot(jax.jit(f), *args)
        raw = timed(lambda: fc(*args), n=6)
        dt = max(raw - dispatch_overhead(), raw / 4)
        res[f"sdxlprof_{label}_ms"] = round(1000 * dt, 1)
        try:
            cacost = fc.cost_analysis()
            if isinstance(cacost, (list, tuple)):
                cacost = cacost[0]
            res[f"sdxlprof_{label}_gflop"] = round(
                float(cacost.get("flops", 0.0)) / 1e9, 1)
        except Exception:
            pass
        return dt

    ucfg = SDXLUNetConfig(dtype=jnp.bfloat16)
    unet, ctrl, up, cp = build(ucfg)

    def full_step(up, cp, xx, sigma):
        den = ControlDenoiser(unet=unet, control_net=ctrl, unet_params=up,
                              control_params=cp)
        return den(xx, sigma, dict(crossattn=ca, vector=vec, control=xx))

    def first_only(up, cp, xx, sigma):
        den = ControlDenoiser(unet=unet, control_net=ctrl, unet_params=up,
                              control_params=cp)
        p = den.first(xx, sigma, dict(crossattn=ca, vector=vec, control=xx))
        return (p.h, p.hs, p.emb, p.control, p.x, p.c_skip, p.c_out)

    t_full = clock(full_step, up, cp, x, sigma, label="full")
    t_first = clock(first_only, up, cp, x, sigma, label="first")
    t_ctrl = clock(lambda cp, xx: ctrl.apply(cp, xx, xx, t, ca, vec),
                   cp, x, label="ctrl")
    del t_ctrl  # reported via res; silence the unused name

    # the two param sets cannot coexist: ~7.7 GB (full) + ~6 GB (noattn)
    # + step activations exceeds the 16 GB chip (this part OOM'd and
    # wedged the device for every later part before this free)
    import gc
    del up, cp
    gc.collect()
    jax.clear_caches()

    # attention share: identical step with every SpatialTransformer gone
    ucfg_na = SDXLUNetConfig(dtype=jnp.bfloat16, attention_resolutions=())
    unet_na, ctrl_na, up_na, cp_na = build(ucfg_na)

    def noattn_step(up, cp, xx, sigma):
        den = ControlDenoiser(unet=unet_na, control_net=ctrl_na,
                              unet_params=up, control_params=cp)
        return den(xx, sigma, dict(crossattn=ca, vector=vec, control=xx))

    t_na = clock(noattn_step, up_na, cp_na, x, sigma, label="noattn")
    res["sdxlprof_rest_ms"] = round(1000 * (t_full - t_first), 1)
    res["sdxlprof_attn_share_ms"] = round(1000 * (t_full - t_na), 1)
    return res


def part_e2e_1024():
    """ONE true end-to-end `process()` wall clock at the PRODUCTION 1024px
    path (round-4 review item 1: the headline composite was an arithmetic
    estimate that omitted the VAE encodes, the conditioner, colorfix, PIL
    hops, and inter-jit dispatch on a ~33 ms/dispatch relay).

    Runs the REAL SuperResolutionPipeline (pipeline.py::process — the
    reference's infer.py:206-215 unit of work): 28x28 LR input -> 500-step
    SR3 at 224^2 -> PNG hop -> stage-2b at the min_size=1024 path (3 VAE
    codec passes + conditioner + 50-step RestoreEDM scan + 1024px decode +
    wavelet colorfix + PNG save). Weights are full-scale seeded random
    ON-DEVICE inits in bf16 (the pipeline's documented no-checkpoint
    smoke mode; one jit per family with init-faithful magnitudes — the
    pre-round-5 host fp32 init + relay transfer measured ~515 s/run) —
    weight VALUES don't change the timed compute because every stage jit
    takes params as arguments. no_llava: the 8B captioner cannot co-reside
    with the full SDXL stack on one 16 GB chip; the caption term is
    measured by its own parts, and bench.py reconciles this wall clock
    against the no-caption arithmetic composite.

    Also reports the MEASURED DFBCache hit-rate trace of the run's 50-step
    trajectory at threshold 0.3 (round-4 review item 3) — synthetic
    weights shift the rate vs real ones; the JSON line says so."""
    import tempfile

    from PIL import Image

    from rsvldm_tpu.config import PipelineConfig
    from rsvldm_tpu.pipeline import SuperResolutionPipeline

    td = tempfile.mkdtemp(prefix="rsvldm_e2e_")
    rng = np.random.default_rng(0)
    lr = rng.integers(0, 255, size=(28, 28, 3), dtype=np.uint8)
    inp = os.path.join(td, "lr.png")
    Image.fromarray(lr).save(inp)

    cfg = PipelineConfig(input_img=inp, output_dir=os.path.join(td, "out"),
                         ckpt_dir=os.path.join(td, "no_ckpts"),
                         no_llava=True)
    t0 = time.time()
    pipe = SuperResolutionPipeline(cfg)
    pipe._ensure_stage2()
    t_init = time.time() - t0

    t0 = time.time()
    pipe.process()              # cold: pays every stage compile
    t_cold = time.time() - t0

    best = 1e9
    for _ in range(2):
        t0 = time.time()
        pipe.process()
        best = min(best, time.time() - t0)

    dfb = pipe.last_dfb or {}
    hits = int(dfb.get("hits", 0))
    steps = int(dfb.get("steps", 0)) or 1
    trace = dfb.get("trace")
    res = {"e2e_measured_s_per_image_1024px": best,
           "e2e_cold_s": round(t_cold, 1),
           "e2e_init_s": round(t_init, 1),
           "dfb_hit_rate": round(hits / steps, 3),
           "dfb_hits": hits, "dfb_steps": steps}
    if trace is not None:
        # per-step decisions as a compact 0/1 string (step order) — shows
        # WHERE on the trajectory the misses cluster, not just the rate
        res["dfb_trace"] = "".join(str(int(bool(v))) for v in trace)

    # stage split (warm, informational): the same units process() chains
    t0 = time.time()
    sr_np = pipe.run_stage1(inp)
    res["e2e_stage1_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    pipe.run_refinement(Image.fromarray(sr_np), "", use_bucket=False)
    res["e2e_stage2b_s"] = round(time.time() - t0, 2)

    # cache-OFF wall clock: the hit rate above depends on the synthetic
    # weights (observed 0.84 vs 0.96 across init styles), so also measure
    # the WEIGHT-INDEPENDENT number — every step runs the full model.
    # img_threshold<=0 selects a sampler program without the cache cond
    # (one extra compile, persistent-cached); bench.py reconciles it
    # against the zero-hit arithmetic stage sum.
    pipe.cfg.refine.img_threshold = 0.0
    pipe.process()                      # pays the cache-off compile once
    best_nc = 1e9
    for _ in range(2):
        t0 = time.time()
        pipe.process()
        best_nc = min(best_nc, time.time() - t0)
    res["e2e_measured_nocache_s_per_image_1024px"] = round(best_nc, 3)

    # 512px path (the round-1/2 contract metric, `min_size=512` -> 64^2
    # latent): measured the same way as the production path, cache active
    # at the reference threshold — stamps the driver's headline `value`
    # as a wall clock instead of an arithmetic estimate.
    pipe.cfg.refine.img_threshold = 0.3
    pipe.cfg.refine.min_size = 512
    pipe.process()                      # pays the 64^2 compiles once
    best5 = 1e9
    for _ in range(2):
        t0 = time.time()
        pipe.process()
        best5 = min(best5, time.time() - t0)
    res["e2e_measured_s_per_image_512px"] = round(best5, 3)
    dfb5 = pipe.last_dfb or {}
    res["dfb_hit_rate_512px"] = round(
        int(dfb5.get("hits", 0)) / (int(dfb5.get("steps", 0)) or 1), 3)
    return res


def part_caption_probe():
    """Caption-stage accelerator evidence at the FULL 8B int8/int4
    geometry (round-4 review item 2: speculative/self-draft and int4 were
    shipped but never measured into the bench story).

    Weights: deterministic per-leaf DEVICE random normals (std 0.02),
    quantized leaf-by-leaf on chip with the dense transient discarded —
    the dense 8B never exists anywhere (32 GB fp32 exceeds both HBM and
    any sane relay-transfer budget; a host-generated tree measured >40 min
    of tunnel time). Synthetic: no trained-weight outliers, so the
    int4-vs-int8 agreement here is an upper bound and the self-draft
    acceptance a lower bound; both labels ride the JSON line via
    bench.py's notes.

    (a) int4-vs-int8 fidelity: greedy-decode 64 tokens from a fixed
        prompt through BOTH quantizations of the same dense weights;
        report greedy-match prefix %% and mean logit cosine — the evidence
        gate for using the faster int4 decode in a composite variant.
    (b) self-draft speculative decode (speculative.py::self_draft, 16 of
        32 layers, k=4): measured tok/s + Leviathan acceptance rate on a
        deterministic greedy stream through the real round jit; plus a
        converged-residual variant (layers 16-31 output scales damped)
        representing the regime trained LayerSkip-style models sit in."""
    import dataclasses
    import gc
    import zlib

    from rsvldm_tpu.models.vlm.generate import GenerateConfig
    from rsvldm_tpu.models.vlm.llama import (KVCache, LLAMA3_8B_CONFIG,
                                             LlamaModel)
    from rsvldm_tpu.models.vlm.speculative import (self_draft,
                                                   speculative_generate)

    from rsvldm_tpu.models.vlm.llama import _QUANT_MODULES
    from rsvldm_tpu.ops.quant import quantize_weight, quantize_weight_int4

    base = dataclasses.replace(LLAMA3_8B_CONFIG, dtype=jnp.bfloat16)
    dense_model = LlamaModel(base)
    cache0 = KVCache.init(base, 1, 8, jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda k: dense_model.init(k, jnp.zeros((1, 8), jnp.int32), cache0,
                                   0, method=dense_model.from_tokens),
        jax.random.PRNGKey(0))

    def build_quant_tree(mode):
        """Generate + quantize the ENTIRE 8B tree in ONE jit, mirroring
        llama.quantize_llama_params's layout rules (the canonical
        converter path). Leaf values are seeded by PATH NAME so the int8
        and int4 passes quantize the SAME dense weights; each fp32 dense
        transient lives only inside the program (XLA buffer reuse), and
        the congested relay is charged ONE compile + ONE dispatch instead
        of ~300 (a per-leaf version stalled >20 min on relay queueing)."""
        specs = []   # (name, shape, kind) in traversal order

        def collect(d, prefix):
            layout = {}
            for k, v in d.items():
                name = prefix + "/" + k
                if isinstance(v, dict):
                    if k in _QUANT_MODULES and "kernel" in v:
                        specs.append((name + "/kernel",
                                      tuple(v["kernel"].shape), "quant"))
                        layout[k] = ("quant", len(specs) - 1, "bias" in v)
                        if "bias" in v:
                            specs.append((name + "/bias",
                                          tuple(v["bias"].shape), "plain"))
                    else:
                        layout[k] = collect(v, name)
                else:
                    kind = "embed" if k == "embedding" else "plain"
                    specs.append((name, tuple(v.shape), kind))
                    layout[k] = ("leaf", len(specs) - 1)
            return layout

        layout = collect(shapes, "")
        seeds = jnp.asarray([zlib.crc32(n.encode()) % (2**31)
                             for n, _, _ in specs], jnp.uint32)

        @jax.jit
        def build(seeds):
            outs = []
            for j, (_, shape, kind) in enumerate(specs):
                w = jax.random.normal(jax.random.PRNGKey(seeds[j]), shape,
                                      jnp.float32) * 0.02
                if kind == "quant":
                    if mode == "int4":
                        ql = quantize_weight_int4(w, group=128)
                        outs.append({"kernel_q4": ql.packed,
                                     "scale": ql.scale})
                    else:
                        ql = quantize_weight(w)
                        outs.append({"kernel_q": ql.q, "scale": ql.scale})
                elif kind == "embed":
                    outs.append(w.astype(jnp.bfloat16))
                else:
                    outs.append(w)
            return outs

        outs = build(seeds)

        def rebuild(node):
            if isinstance(node, tuple):
                if node[0] == "leaf":
                    return outs[node[1]]
                q = dict(outs[node[1]])          # ("quant", idx, has_bias)
                if node[2]:
                    q["bias"] = outs[node[1] + 1]
                return q
            return {k: rebuild(v) for k, v in node.items()}

        return rebuild(layout)

    prompt = jnp.asarray((np.arange(32) * 97 + 11) % base.vocab_size,
                         jnp.int32)
    n_dec = 64

    def decode_logits(lm):
        def fn(params, cache):
            emb = lm.apply(params, prompt[None], method=lm.embed)
            lg, cache = lm.apply(params, emb, cache, 0)
            tok0 = jnp.argmax(lg[0, -1]).astype(jnp.int32)

            def body(carry, i):
                tok, cache = carry
                emb = lm.apply(params, tok[None, None], method=lm.embed)
                lg, cache = lm.apply(params, emb, cache, prompt.shape[0] + i)
                nxt = jnp.argmax(lg[0, -1]).astype(jnp.int32)
                return (nxt, cache), (tok, lg[0, -1].astype(jnp.float32))
            (_, cache), (toks, logits) = jax.lax.scan(
                body, (tok0, cache), jnp.arange(n_dec))
            return toks, logits
        return fn

    def run_mode(mode):
        cfg = dataclasses.replace(base, quant=mode)
        lm = LlamaModel(cfg)
        t0 = time.time()
        qp = build_quant_tree(mode)
        jax.block_until_ready(qp)
        res[f"caption_probe_gen_{mode}_s"] = round(time.time() - t0, 1)
        # structural safety net: the bench-local walk must stay in
        # lock-step with the model's real quantized layout
        want = jax.eval_shape(
            lambda k: lm.init(k, jnp.zeros((1, 8), jnp.int32),
                              KVCache.init(cfg, 1, 8, jnp.bfloat16), 0,
                              method=lm.from_tokens), jax.random.PRNGKey(0))
        assert (jax.tree_util.tree_structure(qp)
                == jax.tree_util.tree_structure(want)), (
            "caption_probe quant tree diverged from the model layout")
        jax.tree_util.tree_map(
            lambda a, b: None if (tuple(a.shape) == tuple(b.shape)) else
            (_ for _ in ()).throw(AssertionError((a.shape, b.shape))),
            qp, want)
        cache = KVCache.init(cfg, 1, 256, jnp.bfloat16)
        fd = aot(jax.jit(decode_logits(lm)), qp, cache)
        toks, logits = fd(qp, cache)
        return lm, cfg, qp, np.asarray(toks), np.asarray(logits)

    res = {}

    # --- (a) int8 reference stream, then self-draft on the SAME tree ----
    lm8, cfg8, qp8, toks8, logits8 = run_mode("int8")

    gcfg = GenerateConfig(max_new_tokens=128, temperature=0.0,
                          do_sample=False, eot_ids=(), pad_to=128)
    emb = lm8.apply(qp8, prompt, method=lm8.embed)
    dm, dp = self_draft(qp8, cfg8, layers=16)

    def spec_run(tp):
        _ = speculative_generate(lm8, tp, dm, dp, emb, gcfg,
                                 jax.random.PRNGKey(0), k=4,
                                 return_stats=True)   # warm compile
        t0 = time.time()
        ids, st = speculative_generate(lm8, tp, dm, dp, emb, gcfg,
                                       jax.random.PRNGKey(0), k=4,
                                       return_stats=True)
        dt = time.time() - t0
        return len(ids) / dt, st

    tok_s, st = spec_run(qp8)
    res["caption_selfdraft_tok_s"] = round(tok_s, 1)
    res["caption_selfdraft_accept"] = round(st["accept_rate"], 3)
    res["caption_selfdraft_rounds"] = st["rounds"]

    # converged-residual variant: damp the residual contributions of the
    # SKIPPED layers (o_proj/down_proj output scales of layers 16-31) so
    # draft and target hidden states agree — the regime a trained
    # early-exit/LayerSkip model sits in; acceptance becomes high and the
    # measured tok/s shows the mechanism's real gain shape
    def damp(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                sub = damp(v)
                if (k.startswith("layer_")
                        and int(k.split("_", 1)[1]) >= 16):
                    for m in ("o_proj", "down_proj"):
                        if m in sub and "scale" in sub[m]:
                            sub[m] = {**sub[m],
                                      "scale": sub[m]["scale"] * 0.05}
                out[k] = sub
            else:
                out[k] = v
        return out

    qp8c = {c: damp(t) for c, t in qp8.items()}
    tok_s_c, st_c = spec_run(qp8c)
    res["caption_selfdraft_conv_tok_s"] = round(tok_s_c, 1)
    res["caption_selfdraft_conv_accept"] = round(st_c["accept_rate"], 3)

    del qp8c, qp8, dp, emb
    gc.collect()
    jax.clear_caches()

    # --- (b) int4 of the SAME dense weights, TEACHER-FORCED compare ----
    # Independent greedy decodes desynchronize at the first near-tie flip
    # and everything after is incomparable; the right fidelity probe runs
    # int4 over the int8 stream's OWN context (one forward over
    # prompt+toks8) and scores per-position next-token agreement — the
    # standard teacher-forced eval. logits8 from the int8 scan ARE its
    # teacher-forced logits on that stream (greedy is self-consistent).
    cfg4 = dataclasses.replace(base, quant="int4")
    lm4 = LlamaModel(cfg4)
    qp4 = build_quant_tree("int4")
    full_ids = jnp.concatenate([prompt, jnp.asarray(toks8)])

    def tf(params, cache, ids):
        emb = lm4.apply(params, ids[None], method=lm4.embed)
        lg, cache = lm4.apply(params, emb, cache, 0)
        # predictions for positions prompt..end (the toks8 stream)
        return lg[0, prompt.shape[0] - 1:-1].astype(jnp.float32)

    cache4 = KVCache.init(cfg4, 1, 256, jnp.bfloat16)
    ftf = aot(jax.jit(tf), qp4, cache4, full_ids)
    logits4 = np.asarray(ftf(qp4, cache4, full_ids))       # [n_dec, V]
    del qp4
    gc.collect()

    agree = np.argmax(logits4, axis=-1) == toks8
    # alignment: the int8 scan emits lg AFTER consuming tok, so
    # logits8[i] predicts toks8[i+1]; teacher-forced logits4[i] predicts
    # toks8[i] — pair logits8[i] with logits4[i+1] (same prediction point)
    cos = np.mean([
        float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
        for a, b in zip(logits8[:-1], logits4[1:])])
    res["int4_vs_int8_greedy_match_pct"] = float(
        round(100.0 * agree.mean(), 1))
    res["int4_vs_int8_logit_cos"] = float(round(cos, 4))
    # softer rank metric: how often int8's greedy choice is in int4's
    # top-5 — near-ties flip argmax without changing decode quality
    top5 = np.argsort(logits4, axis=-1)[:, -5:]
    in5 = [int(t8) in set(int(v) for v in row)
           for t8, row in zip(toks8, top5)]
    res["int4_vs_int8_top5_pct"] = float(round(100.0 * np.mean(in5), 1))
    return res


PARTS = {"stage1": part_stage1, "sdxl": part_sdxl, "vae": part_vae,
         "e2e_1024": part_e2e_1024, "caption_probe": part_caption_probe,
         "sdxl_profile": part_sdxl_profile,
         "flash_roofline": part_flash_roofline,
         "sdxl_1024": part_sdxl_1024, "vae_1024": part_vae_1024,
         "hbm_peak": part_hbm_peak, "flash_bwd": part_flash_bwd,
         "flash_fwd": part_flash_fwd,
         "sr3_train": part_sr3_train, "qlora_train": part_qlora_train,
         "llama": part_llama, "llama_int8": part_llama_int8,
         "llama_int4": part_llama_int4,
         "llama_prefill": part_llama_prefill,
         "llama_int8kv": part_llama_int8kv}


def _release_device_memory():
    """Free all HBM between parts so sequential model families never share
    the 16 GB chip: drop jit caches (they pin compiled executables and
    their constants), then force-delete every live device array."""
    import gc
    jax.clear_caches()
    gc.collect()
    try:
        for a in jax.live_arrays():
            a.delete()
    except Exception:
        pass
    gc.collect()


def main():
    """Run the named parts SEQUENTIALLY IN THIS PROCESS, printing one JSON
    line per part as it completes: {"part": name, ...results}.

    One process for all parts is the round-4 relay fix: the FIRST compile
    of a process pays a large, congestion-dependent toll through the axon
    remote-compile relay (measured 68-302 s even for a trivial v+1
    program); every subsequent compile is ~0.5-2 s. Per-part subprocesses
    paid that toll once PER PART, which is what blew round 3's driver wall
    clock. HBM is released between parts (_release_device_memory) so model
    families still never share the chip. A part that raises prints an
    error line and the run continues; bench.py merges lines as they
    stream and can respawn this script with the remaining parts if the
    process dies outright."""
    import sys
    import traceback
    names = sys.argv[1:] or list(PARTS)
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            res = _part(name)
        except Exception as e:  # keep later parts alive past one failure
            traceback.print_exc()
            res = {f"{name}_error": f"{type(e).__name__}: {e}"[:200]}
        # np.floating would crash json.dumps below and take every later
        # part down with it — normalize to plain Python floats
        res = {k: (round(float(v), 4) if isinstance(v, (float, np.floating))
                   else int(v) if isinstance(v, np.integer) else v)
               for k, v in res.items()}
        res[f"{name}_part_s"] = round(time.time() - t0, 1)
        print(json.dumps({"part": name, **res}), flush=True)
        if i + 1 < len(names):
            _release_device_memory()


if __name__ == "__main__":
    main()
