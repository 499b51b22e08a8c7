#!/usr/bin/env python
"""Continuous-batching engine throughput at the full 8B int8 geometry.

Invoked by the driver bench (bench.py PART_CMDS runs `bench_engine.py 8`
budget-gated, parsing the LAST stdout line as JSON — keep stray prints out
of main) and standalone for the ROUND3.md scaling numbers. The engine pays
one host dispatch per
token step (that is the price of dynamic batch membership; under the axon
relay the dispatch floor is ~33 ms), but the weight stream is shared by
every occupied slot, so AGGREGATE tok/s scales with concurrency while the
scan-decode path (bench_full.py part_llama_int8) serves one stream.

Run: python bench_engine.py [slots ...]   (suffix q = int8 KV cache,
e.g. `bench_engine.py 8 16q` — kv_quant halves cache bytes so 16 slots
at the same context fit where bf16 KV allows 8; suffix hN = decode
horizon, e.g. `8h8` — N decode steps per dispatch when the scheduler is
idle, amortizing the per-step host sync N-fold)

     python bench_engine.py spec [slots] — speculative rounds over the
     slot pool (8B int8 target + 4-layer draft, k=4): per-round step time
     and the implied aggregate tok/s at draft-acceptance 0 / 2 / 4 —
     batching and speculation compose (every slot commits 1..k+1 tokens
     per shared target read).

     python bench_engine.py iso    — decode-latency isolation: worst
     per-step() latency seen by a decoding co-tenant while a 3584-token
     prompt is admitted, monolithic prefill vs prefill_chunk=256 (the
     chunked-prefill path), plus the admitted request's time-to-first-token
     both ways (chunking trades TTFT for co-tenant latency).
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

if os.environ.get("BENCH_TINY"):
    # CPU smoke: the axon sitecustomize ignores JAX_PLATFORMS (CLAUDE.md) —
    # force the backend before first device use
    jax.config.update("jax_platforms", "cpu")

# warm-cache compiles (see bench_full.py) — keeps the engine part inside
# bench.py's per-part timeout
from rsvldm_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def parse_spec(a: str):
    """Slot spec grammar: `<slots>[q][h<H>]` — q = int8 KV cache,
    hN = decode horizon N. E.g. 8, 16q, 8h8, 16qh4."""
    import re
    m = re.fullmatch(r"(\d+)(q?)(?:h([1-9]\d*))?", a)
    if not m:
        raise SystemExit(f"bad slot spec {a!r} (want e.g. 8, 16q, 8h8)")
    return int(m.group(1)), bool(m.group(2)), int(m.group(3) or 1)


def isolation():
    """Chunked-prefill decode-latency isolation at the 8B int8 geometry."""
    from rsvldm_tpu.models.vlm.llama import LLAMA3_8B_CONFIG, LlamaModel
    from rsvldm_tpu.models.vlm.generate import GenerateConfig
    from rsvldm_tpu.serving.engine import DecodeEngine

    from bench_full import dummy_llama_params

    tiny = bool(os.environ.get("BENCH_TINY"))  # CPU smoke of the flow only
    if tiny:
        from rsvldm_tpu.models.vlm.llama import LlamaConfig
        lcfg = LlamaConfig(vocab_size=64, dim=32, layers=2, heads=4,
                           kv_heads=2, ffn_dim=64, quant="int8")
        long_s, chunk, max_len, pad = 96, 16, 192, 8
    else:
        lcfg = dataclasses.replace(LLAMA3_8B_CONFIG, dtype=jnp.bfloat16,
                                   quant="int8")
        long_s, chunk, max_len, pad = 3584, 256, 3968, 128
    lm = LlamaModel(lcfg)
    lp = dummy_llama_params(lm, lcfg)
    res = {}
    eng = None
    for use_chunk in (False, True):
        del eng  # one engine's KV pool at a time next to 8.5 GB of weights
        eng = DecodeEngine(lm, lp, slots=2, max_len=max_len, pad_to=pad,
                           prefill_chunk=chunk if use_chunk else None)
        cfg = GenerateConfig(max_new_tokens=64, temperature=0.0,
                             do_sample=False, eot_ids=(), pad_to=pad)
        warm = dataclasses.replace(cfg, max_new_tokens=1)
        emb_a = jnp.zeros((pad, lm.cfg.dim), jnp.bfloat16)
        emb_b = jnp.zeros((long_s, lm.cfg.dim), jnp.bfloat16)
        eng.submit(emb_a, warm)          # warm short-prefill + decode exes
        while eng.step():
            pass
        eng.submit(emb_b, warm)          # warm the long-admission path
        while eng.step():
            pass
        ua = eng.submit(emb_a, cfg)      # the decoding co-tenant
        for _ in range(3):
            eng.step()
        ub = eng.submit(emb_b, cfg)      # the long admission
        t_sub = time.perf_counter()
        step_ms, ttft = [], None
        for _ in range(24):
            t0 = time.perf_counter()
            eng.step()
            step_ms.append(1000 * (time.perf_counter() - t0))
            if ttft is None and eng._requests[ub].out_ids:
                ttft = time.perf_counter() - t_sub
        del ua
        tag = "chunked" if use_chunk else "monolithic"
        res[f"iso_{tag}_max_step_ms"] = round(max(step_ms), 1)
        res[f"iso_{tag}_median_step_ms"] = round(
            float(np.median(step_ms)), 1)
        res[f"iso_{tag}_long_ttft_ms"] = round(1000 * ttft, 1)
    print(json.dumps(res))


def spec(slots: int = 4):
    """Speculative rounds over the slot pool at the 8B int8 geometry."""
    from rsvldm_tpu.models.vlm.llama import (LLAMA3_8B_CONFIG, LlamaConfig,
                                             LlamaModel)
    from rsvldm_tpu.models.vlm.generate import GenerateConfig
    from rsvldm_tpu.serving.engine import DecodeEngine

    from bench_full import dummy_llama_params

    tiny = bool(os.environ.get("BENCH_TINY"))
    if tiny:
        tcfg = LlamaConfig(vocab_size=64, dim=32, layers=2, heads=4,
                           kv_heads=2, ffn_dim=64, quant="int8")
        max_len, pad, k = 256, 8, 4
    else:
        tcfg = dataclasses.replace(LLAMA3_8B_CONFIG, dtype=jnp.bfloat16,
                                   quant="int8")
        max_len, pad, k = 1280, 128, 4
    dcfg = dataclasses.replace(tcfg, layers=max(1, tcfg.layers // 8))
    lm, dm = LlamaModel(tcfg), LlamaModel(dcfg)
    lp, dp = dummy_llama_params(lm, tcfg), dummy_llama_params(dm, dcfg)
    eng = DecodeEngine(lm, lp, slots=slots, max_len=max_len, pad_to=pad,
                       draft=dm, draft_params=dp, spec_k=k)
    prompt_len = pad * (2 if tiny else 4)
    cfg = GenerateConfig(
        max_new_tokens=max_len - prompt_len - (k + 2), temperature=0.0,
        do_sample=False, eot_ids=(), pad_to=pad)
    emb = jnp.zeros((prompt_len, lm.cfg.dim), jnp.bfloat16)
    for _ in range(slots):
        eng.submit(emb, cfg)
    for _ in range(3):          # warm prefill + round executables
        eng.step()
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        eng.step()
    dt = (time.perf_counter() - t0) / n
    res = {f"engine_spec{slots}slot_round_ms": round(1000 * dt, 1)}
    for acc in (0, 2, 4):
        res[f"engine_spec{slots}slot_acc{acc}_tok_s"] = round(
            slots * (acc + 1) / dt, 1)
    print(json.dumps(res))


def main():
    if "iso" in sys.argv[1:]:
        isolation()
        return
    if "spec" in sys.argv[1:]:
        rest = [a for a in sys.argv[1:] if a != "spec"]
        spec(int(rest[0]) if rest else 4)
        return
    specs = ([parse_spec(a) for a in sys.argv[1:]]
             or [(1, False, 1), (4, False, 1)])
    from rsvldm_tpu.models.vlm.llama import LLAMA3_8B_CONFIG, LlamaModel
    from rsvldm_tpu.models.vlm.generate import GenerateConfig
    from rsvldm_tpu.serving.engine import DecodeEngine

    max_len = 1536    # 8.5 GB weights + slots*0.40 GB KV on one 16 GB chip

    from bench_full import dummy_llama_params

    def build(kvq):
        lcfg = dataclasses.replace(LLAMA3_8B_CONFIG, dtype=jnp.bfloat16,
                                   quant="int8", kv_quant=kvq)
        lm = LlamaModel(lcfg)
        return lm, dummy_llama_params(lm, lcfg)

    res = {}
    lm = lp = eng = emb = None
    for slots, kvq, horizon in specs:
        # drop the previous iteration's ~9.5 GB param set BEFORE building
        # the next one — two sets cannot coexist on a 16 GB chip
        lm = lp = eng = emb = None
        lm, lp = build(kvq)
        tag = (f"{slots}slot" + ("_kvq" if kvq else "")
               + (f"_h{horizon}" if horizon > 1 else ""))
        eng = DecodeEngine(lm, lp, slots=slots, max_len=max_len, pad_to=128,
                           decode_horizon=horizon)
        # enough max_new that every timed step is a full-horizon burst
        # (prompt 1000 -> 1536-1000 = 536 cache positions of room)
        cfg = GenerateConfig(
            max_new_tokens=(24 if horizon == 1
                            else min(500, (3 + 20 + 2) * horizon)),
            temperature=0.0, do_sample=False, eot_ids=(), pad_to=128)
        emb = jnp.zeros((1000, lm.cfg.dim), jnp.bfloat16)
        uids = [eng.submit(emb, cfg) for _ in range(slots)]
        # warm both executables (prefill bucket + decode step)
        for _ in range(3):
            eng.step()
        t0 = time.perf_counter()
        n_steps = 20
        for _ in range(n_steps):
            eng.step()
        dt = time.perf_counter() - t0
        del uids
        step_ms = 1000 * dt / n_steps
        res[f"engine_{tag}_step_ms"] = round(step_ms, 1)
        res[f"engine_{tag}_agg_tok_s"] = round(
            slots * n_steps * horizon / dt, 1)
        del eng, cfg
    print(json.dumps(res))


if __name__ == "__main__":
    main()
