"""CPU end-to-end guard for the round-5 bench parts' LOGIC.

A bench part that only ever runs on the TPU can break silently and cost a
whole driver round (round 3 shipped zero verified numbers that way). Here
part_caption_probe runs END-TO-END on CPU at a tiny monkeypatched
geometry: the one-jit quant-tree builder (and its structural lock-step
assert against the model's real quantized layout), the teacher-forced
int4-vs-int8 fidelity metrics, and the self-draft speculative path with
acceptance bookkeeping. Slow tier (~3-4 min of CPU compiles).
"""

import jax
import numpy as np
import pytest


@pytest.mark.slow
def test_caption_probe_runs_at_tiny_geometry(monkeypatch):
    import rsvldm_tpu.models.vlm.llama as L
    tiny = L.LlamaConfig(vocab_size=512, dim=128, layers=18, heads=4,
                         kv_heads=2, ffn_dim=256, dtype=jax.numpy.bfloat16)
    monkeypatch.setattr(L, "LLAMA3_8B_CONFIG", tiny)
    import bench_full
    res = bench_full.part_caption_probe()

    # every key the bench.py emit() contract consumes is present and sane
    assert 0.0 <= res["caption_selfdraft_accept"] <= 1.0
    assert res["caption_selfdraft_tok_s"] > 0
    assert res["caption_selfdraft_rounds"] > 0
    assert 0.0 <= res["caption_selfdraft_conv_accept"] <= 1.0
    assert 0.0 <= res["int4_vs_int8_greedy_match_pct"] <= 100.0
    assert res["int4_vs_int8_top5_pct"] >= res["int4_vs_int8_greedy_match_pct"]
    assert -1.0 <= res["int4_vs_int8_logit_cos"] <= 1.0
    # int4 of the SAME weights must be a close model of int8 under
    # teacher forcing (catches a broken quant layout or seed mismatch —
    # unrelated weights measured ~0 here)
    assert res["int4_vs_int8_greedy_match_pct"] > 60.0
    # JSON-serializable exactly as the part child will emit it
    import json
    json.dumps(res)
