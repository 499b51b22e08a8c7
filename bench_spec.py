#!/usr/bin/env python
"""Speculative-decoding round mechanics at the full 8B int8 geometry.

Not part of the driver bench contract — records for ROUND3.md what a
speculative round costs on one chip: k draft steps (tiny weight stream) +
ONE (k+1)-token target forward (≈ the same HBM traffic as a 1-token
step, since decode is weight-bound). The end-to-end speedup is
(1 + E[accepted]) * t_token / t_round — acceptance depends on the trained
draft, so this reports t_round and the implied tok/s at several
acceptance levels instead of inventing an acceptance rate.

Run: python bench_spec.py [k]            # separate 4-layer draft (~1 GB)
     python bench_spec.py [k] --self-draft N   # depth-pruned SELF-draft:
         the target's own first N layers propose (zero extra HBM — leaves
         shared), measuring what `--self_draft N` costs per round.
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
    argv = list(sys.argv[1:])
    if "--help" in argv or "-h" in argv:
        print(__doc__)
        return
    self_layers = 0
    if "--self-draft" in argv:
        i = argv.index("--self-draft")
        self_layers = int(argv[i + 1])
        del argv[i:i + 2]
    k = int(argv[0]) if argv else 4
    from rsvldm_tpu.models.vlm.llama import (KVCache, LLAMA3_8B_CONFIG,
                                             LlamaModel)
    from rsvldm_tpu.models.vlm.speculative import make_round_fn, self_draft

    tcfg = dataclasses.replace(LLAMA3_8B_CONFIG, dtype=jnp.bfloat16,
                               quant="int8")
    import os
    if os.environ.get("BENCH_TINY"):   # CPU smoke of the flow only
        # the axon sitecustomize ignores JAX_PLATFORMS (CLAUDE.md) —
        # force the backend before first device use
        jax.config.update("jax_platforms", "cpu")
        tcfg = dataclasses.replace(tcfg, dim=64, layers=4, heads=4,
                                   kv_heads=2, ffn_dim=128, vocab_size=256)
    tm = LlamaModel(tcfg)
    total = 4096 if not os.environ.get("BENCH_TINY") else 64

    from bench_full import dispatch_overhead, dummy_llama_params
    tp = dummy_llama_params(tm, tcfg)
    if self_layers:
        # zero-extra-HBM draft: the target's own first N layers
        dm, dp = self_draft(tp, tcfg, self_layers)
        dcfg = dm.cfg
    else:
        # depth-4 draft of the same family/width (~1 GB int8): what a
        # layer-pruned + distilled draft would cost at serve time
        dcfg = dataclasses.replace(tcfg, layers=4)
        dm = LlamaModel(dcfg)
        dp = dummy_llama_params(dm, dcfg)
    cache_t = KVCache.init(tcfg, 1, total, jnp.bfloat16)
    cache_d = KVCache.init(dcfg, 1, total, jnp.bfloat16)
    rf = make_round_fn(tm, dm, k)
    p0 = 3500 if total >= 4096 else total // 2   # steady-state fill point
    args = (jnp.int32(1), jnp.int32(p0), jnp.int32(1), jnp.float32(0.0),
            jax.random.PRNGKey(0))

    # warm + steady state (donated caches flow through)
    committed, n_c, cache_t, cache_d = rf(tp, dp, cache_t, cache_d, *args)
    np.asarray(committed)
    times = []
    for _ in range(6):
        t0 = time.perf_counter()
        committed, n_c, cache_t, cache_d = rf(tp, dp, cache_t, cache_d,
                                              *args)
        np.asarray(committed)
        times.append(time.perf_counter() - t0)
    raw = min(times)
    # single-dispatch measurement: subtract the relay round-trip floor
    # (CLAUDE.md ~33 ms/dispatch) to get the device-side round cost; both
    # numbers are reported. In THIS environment each round still pays the
    # dispatch (the host must see n_committed to schedule the next round);
    # on a local TPU runtime that overhead is ~100 us.
    round_s = max(raw - dispatch_overhead(), raw / 4)
    res = {"spec_k": k, "spec_round_ms_dispatched": round(1000 * raw, 1),
           "spec_round_ms_device": round(1000 * round_s, 1)}
    if self_layers:
        res["self_draft_layers"] = self_layers
    for a in (0, 2, 4):
        res[f"spec_tok_s_at_acc{a}"] = round((1 + a) / round_s, 1)
        res[f"spec_tok_s_at_acc{a}_relay"] = round((1 + a) / raw, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
