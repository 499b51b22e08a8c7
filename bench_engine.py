#!/usr/bin/env python
"""Continuous-batching engine throughput at the full 8B int8 geometry.

Not part of the driver bench contract (bench.py) — records the serving
engine's scaling for ROUND3.md. The engine pays one host dispatch per
token step (that is the price of dynamic batch membership; under the axon
relay the dispatch floor is ~33 ms), but the weight stream is shared by
every occupied slot, so AGGREGATE tok/s scales with concurrency while the
scan-decode path (bench_full.py part_llama_int8) serves one stream.

Run: python bench_engine.py [slots ...]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    slot_counts = [int(a) for a in sys.argv[1:]] or [1, 4]
    from rsvldm_tpu.models.vlm.llama import (KVCache, LLAMA3_8B_CONFIG,
                                             LlamaModel)
    from rsvldm_tpu.models.vlm.generate import GenerateConfig
    from rsvldm_tpu.serving.engine import DecodeEngine

    lcfg = dataclasses.replace(LLAMA3_8B_CONFIG, dtype=jnp.bfloat16,
                               quant="int8")
    lm = LlamaModel(lcfg)
    max_len = 1536    # 8.5 GB weights + slots*0.40 GB KV on one 16 GB chip
    cache = KVCache.init(lcfg, 1, 8, jnp.bfloat16)
    shapes = jax.eval_shape(
        lambda k: lm.init(k, jnp.zeros((1, 8), jnp.int32), cache, 0,
                          method=lm.from_tokens), jax.random.PRNGKey(0))

    def mk(s):
        if s.dtype == jnp.float32 and s.shape == (lcfg.vocab_size, lcfg.dim):
            return jnp.zeros(s.shape, jnp.bfloat16)
        return jnp.ones(s.shape, s.dtype)
    lp = jax.tree_util.tree_map(mk, shapes)

    res = {}
    for slots in slot_counts:
        eng = DecodeEngine(lm, lp, slots=slots, max_len=max_len, pad_to=128)
        cfg = GenerateConfig(max_new_tokens=24, temperature=0.0,
                             do_sample=False, eot_ids=(), pad_to=128)
        emb = jnp.zeros((1000, lcfg.dim), jnp.bfloat16)
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
        res[f"engine_{slots}slot_step_ms"] = round(step_ms, 1)
        res[f"engine_{slots}slot_agg_tok_s"] = round(
            slots * n_steps / dt, 1)
        del eng, cfg
    print(json.dumps(res))


if __name__ == "__main__":
    main()
