"""Driver benchmark: composite per-image cost on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Round 1 measured only the Stage-1 SR3 loop; per the round-2 review the
driver bench now covers every hot stage (each in its own subprocess so the
16GB HBM is never shared across model families — bench_full.py parts):

  stage1_500step_s   full 500-step SR3 ancestral loop @224^2 (shipped val
                     schedule, configs/sr_sr3.json:65-70)
  sdxl_step_ms       one CFG-doubled SDXL+ControlNet denoise step @64^2
                     latent (512px image) — the Stage-2b hot op BEFORE
                     first-block-cache hits
  vae_decode_512px_s SDXL VAE decode
  llama8B_est_tok_s  KV-cache scan decode tok/s (2B-layer proxy x4; the
                     real 8B runs TP-sharded over a slice)

value = composite e2e seconds/image at the 512px path:
  stage1 + 50*sdxl_step + 2*vae_decode + prefill + 256/llama_tok_s
(the caption term counts BOTH the measured 3584-token anyres prefill and
the 256-token decode at the full int8 8B geometry. No cache hits counted
— the DFBCache skips most SDXL middle+decoder work at threshold 0.3, so
the real steady-state is faster; ROUND1.md measured 10.0 s/image with the
cache active and real weights. Not counted: vision tower + CLIP
conditioning forwards (single sub-10ms calls) and host PIL round-trips.)

vs_baseline uses a documented ASSUMPTION for the torch/CUDA reference,
which publishes no latency numbers (BASELINE.md): ~60 s/image — 500 SR3
UNet steps at ~10 steps/s on its GPU (PyTorch 2.5 + CUDA 12.4, ~100M-param
pixel-space UNet with 784-token full attention) plus ~10 s for captioning +
50 CFG-doubled SDXL steps. vs_baseline = ref_seconds / our_seconds; >= 3.0
meets the BASELINE.json north-star.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ASSUMED_REF_S_PER_IMAGE = 60.0

HERE = os.path.dirname(os.path.abspath(__file__))


# parts that live in their own driver script (everything else is a
# bench_full.py part name)
PART_CMDS = {"engine": ("bench_engine.py", "8")}


def run_part(name: str) -> dict:
    script, *extra = PART_CMDS.get(name, ("bench_full.py", name))
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(HERE, script), *extra],
            capture_output=True, text=True, timeout=1800)
    except subprocess.TimeoutExpired:
        # never break the one-JSON-line contract on a hung part
        return {f"{name}_error": "timeout after 1800s"}
    if not out.stdout.strip():
        # a silent crash must not masquerade as an empty result
        return {f"{name}_error":
                f"rc={out.returncode} " + (out.stderr or "").strip()[-200:]}
    line = out.stdout.strip().splitlines()[-1]
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        return {f"{name}_error": (out.stderr or out.stdout).strip()[-200:]}


def main():
    import time
    budget = float(os.environ.get("BENCH_BUDGET_S", "3000"))
    t0 = time.time()
    res = {}
    # priority order: stage1 is the round-1 contract and the fallback
    # metric; later parts are skipped if relay congestion eats the budget.
    # llama_int8 MEASURES the caption stage at the true 8B geometry (the
    # bf16 "llama" proxy stays as a comparison point, run last).
    # required composite terms first (stage1/sdxl/llama_int8/vae), then
    # the optional prefill term (0.0 fallback), then informational parts —
    # budget exhaustion degrades the metric gracefully in that order
    # sr3_train / qlora_train are informational TRAINING throughputs
    # (reference train geometry batch-8 SR3 step; 2048-token 8B QLoRA
    # step on one chip) — last, so budget exhaustion drops them first
    for name in ("stage1", "sdxl", "llama_int8", "vae", "llama_prefill",
                 "hbm_peak", "llama_int4", "llama", "engine", "sr3_train",
                 "qlora_train", "flash_bwd", "flash_fwd"):
        if time.time() - t0 > budget:
            res[f"{name}_error"] = "skipped: bench budget exceeded"
            continue
        res.update(run_part(name))

    extras = {}
    if "stage1_500step_s" in res:
        extras["sr3_steps_per_sec"] = round(500 / res["stage1_500step_s"], 2)
    if "sdxl_step_64lat_s" in res:
        extras["sdxl_step_ms"] = round(1000 * res["sdxl_step_64lat_s"], 1)
    if "sdxl_step_hit_s" in res:
        # informational: a DFBCache-HIT step (ControlNet + UNet input
        # blocks + similarity test; lax.cond skips the middle/decoder).
        # The composite counts zero hits — the hit rate is data-dependent —
        # so [hit, miss] step times bound the cache-active composite.
        extras["sdxl_step_hit_ms"] = round(1000 * res["sdxl_step_hit_s"], 1)
    if "vae_decode_512px_s" in res:
        extras["vae_decode_ms"] = round(1000 * res["vae_decode_512px_s"], 1)
    if "llama8B_est_tok_s" in res:
        extras["llama8B_est_tok_s"] = round(res["llama8B_est_tok_s"], 1)
    if "llama8B_int8_tok_s" in res:
        extras["llama8B_int8_tok_s"] = round(res["llama8B_int8_tok_s"], 1)
    if "llama8B_int4_tok_s" in res:
        # informational: the load_4bit-equivalent path (composite stays on
        # the default int8 decoder)
        extras["llama8B_int4_tok_s"] = round(res["llama8B_int4_tok_s"], 1)
    if "hbm_read_gbs_measured" in res:
        # the chip's measured achievable read bandwidth — the honest ceiling
        # for the weight-streaming decode claims (819 GB/s is the datasheet)
        extras["hbm_read_gbs_measured"] = res["hbm_read_gbs_measured"]
        extras["hbm_read_pct_of_peak"] = res.get("hbm_read_pct_of_peak")
    if "engine_8slot_agg_tok_s" in res:
        # informational: continuous-batching serving throughput (8 slots,
        # int8 8B, one chip) — the sglang_worker-equivalent runtime
        extras["engine_8slot_agg_tok_s"] = res["engine_8slot_agg_tok_s"]
    if "sr3_train_img_s" in res:
        extras["sr3_train_img_s"] = res["sr3_train_img_s"]
    if "qlora8B_train_tok_s" in res:
        extras["qlora8B_train_tok_s"] = res["qlora8B_train_tok_s"]
    # informational: Pallas flash kernels (fwd; fused bwd vs XLA recompute)
    extras.update({k: v for k, v in res.items()
                   if k.startswith(("flash_bwd_", "flash_fwd_"))})
    # roofline columns (compiled-program cost_analysis vs v5e ceilings)
    extras.update({k: v for k, v in res.items()
                   if k.endswith("_mfu_pct") or k.endswith("_hbm_pct")})

    # caption term: prefer the MEASURED full-geometry int8 decode over the
    # bf16 proxy extrapolation (round-2 review Weak #1); the measured
    # anyres prefill joins the composite when available (0.0 fallback keeps
    # older partial runs comparable — its absence is visible in the extras)
    tok_s = res.get("llama8B_int8_tok_s") or res.get("llama8B_est_tok_s")
    prefill = res.get("llama8B_prefill_3584_s", 0.0)
    if prefill:
        extras["llama8B_prefill_s"] = round(prefill, 2)
    needed = ("stage1_500step_s", "sdxl_step_64lat_s", "vae_decode_512px_s")
    if all(k in res for k in needed) and tok_s:
        composite = (res["stage1_500step_s"] + 50 * res["sdxl_step_64lat_s"]
                     + 2 * res["vae_decode_512px_s"]
                     + prefill + 256 / tok_s)
        extras["composite_s_per_image"] = round(composite, 2)
        print(json.dumps({
            "metric": "e2e_seconds_per_image_512px_est",
            "value": round(composite, 2),
            "unit": "s/image",
            "vs_baseline": round(ASSUMED_REF_S_PER_IMAGE / composite, 2),
            **extras,
        }))
        return
    # fallback: report the Stage-1 metric (round-1 contract) + any errors
    errs = {k: v for k, v in res.items() if k.endswith("_error")}
    sps = extras.get("sr3_steps_per_sec", 0.0)
    print(json.dumps({
        "metric": "sr3_unet_denoise_steps_per_sec_224px",
        "value": sps,
        "unit": "steps/s",
        "vs_baseline": round(sps / 10.0, 2),
        **extras, **errs,
    }))


if __name__ == "__main__":
    main()
