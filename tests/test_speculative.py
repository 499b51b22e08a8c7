"""Speculative decoding (models/vlm/speculative.py).

Contracts: greedy output == target `generate` for ANY draft; draft==target
accepts every proposal and reproduces `generate`'s sampled stream
bit-for-bit (same key schedule); eot/max_new semantics match `generate`.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.models.vlm.generate import GenerateConfig, generate
from rsvldm_tpu.models.vlm.llama import KVCache, LlamaConfig, LlamaModel
from rsvldm_tpu.models.vlm.speculative import (make_round_fn, self_draft,
                                               speculative_generate)

CFG = LlamaConfig(vocab_size=96, dim=32, layers=2, heads=4, kv_heads=2,
                  ffn_dim=64, dtype=jnp.float32)


def _make(cfg, seed):
    model = LlamaModel(cfg)
    cache = KVCache.init(cfg, 1, 8, jnp.float32)
    params = model.init(jax.random.PRNGKey(seed),
                        jnp.zeros((1, 4), jnp.int32), cache, 0,
                        method=model.from_tokens)
    return model, params


@pytest.fixture(scope="module")
def target():
    return _make(CFG, 0)


@pytest.fixture(scope="module")
def weak_draft():
    # different depth AND different weights — a genuinely bad draft
    return _make(dataclasses.replace(CFG, layers=1), 5)


def _prompt(model, params, s=6, seed=3):
    ids = jnp.asarray(np.random.default_rng(seed).integers(
        0, CFG.vocab_size, size=(s,)), jnp.int32)
    return model.apply(params, ids, method=model.embed)


GREEDY = GenerateConfig(max_new_tokens=14, temperature=0.0, do_sample=False,
                        eot_ids=(95,), pad_to=8)
SAMPLED = GenerateConfig(max_new_tokens=14, temperature=0.8, do_sample=True,
                         eot_ids=(95,), pad_to=8)


def test_greedy_equals_generate_any_draft(target, weak_draft):
    tm, tp = target
    dm, dp = weak_draft
    for seed in (3, 4, 5):
        emb = _prompt(tm, tp, s=5 + seed, seed=seed)
        d_emb = dm.apply(dp, jnp.asarray(np.random.default_rng(seed)
                         .integers(0, CFG.vocab_size, size=(5 + seed,)),
                         jnp.int32), method=dm.embed)
        ref = generate(tm, tp, emb, GREEDY, jax.random.PRNGKey(9))
        out = speculative_generate(tm, tp, dm, dp, emb, GREEDY,
                                   jax.random.PRNGKey(9), k=3,
                                   draft_embeds=d_emb)
        np.testing.assert_array_equal(ref, out)


def test_self_draft_reproduces_sampled_stream(target):
    """draft == target: every proposal accepted, committed stream equals
    the vanilla sampler's (same per-index key schedule)."""
    tm, tp = target
    emb = _prompt(tm, tp, s=7, seed=21)
    ref = generate(tm, tp, emb, SAMPLED, jax.random.PRNGKey(2))
    out = speculative_generate(tm, tp, tm, tp, emb, SAMPLED,
                               jax.random.PRNGKey(2), k=4)
    np.testing.assert_array_equal(ref, out)


def test_depth_pruned_self_draft(target):
    """self_draft (LayerSkip-style): the sliced tree IS the target's first
    k layers (forward equals a hand-built truncated model), leaves are
    SHARED (no copy), and speculative decode with it stays greedy-exact."""
    tm, tp = target
    dm, dp = self_draft(tp, CFG, layers=1)
    assert dm.cfg.layers == 1
    assert "layer_1" not in dp["params"] and "layer_0" in dp["params"]
    # zero-copy: same leaf objects
    assert dp["params"]["layer_0"]["q_proj"]["kernel"] is \
        tp["params"]["layer_0"]["q_proj"]["kernel"]
    # forward == a model built at layers=1 over the same subtree
    ref_m = LlamaModel(dataclasses.replace(CFG, layers=1))
    ids = jnp.asarray([3, 5, 7], jnp.int32)
    cache = KVCache.init(dm.cfg, 1, 8, jnp.float32)
    ours = dm.apply(dp, ids[None], cache, 0, method=dm.from_tokens)[0]
    theirs = ref_m.apply(dp, ids[None], cache, 0,
                         method=ref_m.from_tokens)[0]
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))
    # greedy-exact through speculative decode
    emb = _prompt(tm, tp, s=6, seed=11)
    ref = generate(tm, tp, emb, GREEDY, jax.random.PRNGKey(4))
    out = speculative_generate(tm, tp, dm, dp, emb, GREEDY,
                               jax.random.PRNGKey(4), k=3)
    np.testing.assert_array_equal(ref, out)
    with pytest.raises(ValueError):
        self_draft(tp, CFG, layers=2)   # must be < target depth
    with pytest.raises(ValueError):
        self_draft(tp, CFG, layers=0)


def test_self_draft_full_acceptance_round(target):
    """One raw round with draft == target commits k+1 tokens."""
    tm, tp = target
    emb = _prompt(tm, tp, s=6, seed=31)
    s, k = emb.shape[0], 3
    total = 8 + GREEDY.max_new_tokens + k + 1
    cache_t = KVCache.init(CFG, 1, total, jnp.float32)
    cache_d = KVCache.init(CFG, 1, total, jnp.float32)
    pe = jnp.pad(emb, ((0, 8 - s), (0, 0)))[None]
    lg, cache_t = tm.apply(tp, pe, cache_t, 0)
    _, cache_d = tm.apply(tp, pe, cache_d, 0)
    pending = jnp.argmax(lg[0, s - 1]).astype(jnp.int32)
    rf = make_round_fn(tm, tm, k)
    committed, n_c, _, _ = rf(tp, tp, cache_t, cache_d, pending,
                              jnp.int32(s), jnp.int32(1), jnp.float32(0.0),
                              jax.random.PRNGKey(0))
    assert int(n_c) == k + 1
    ref = generate(tm, tp, emb, GREEDY, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(committed), ref[1:k + 2])


def test_eot_truncation_matches(target, weak_draft):
    """Make a token that actually occurs mid-stream the eot: both paths
    must truncate identically (exclusive of the eot)."""
    tm, tp = target
    dm, dp = weak_draft
    emb = _prompt(tm, tp, s=6, seed=41)
    base = generate(tm, tp, emb, GREEDY, jax.random.PRNGKey(1))
    assert len(base) >= 4
    eot_tok = int(base[3])
    cfg = dataclasses.replace(GREEDY, eot_ids=(eot_tok,))
    ref = generate(tm, tp, emb, cfg, jax.random.PRNGKey(1))
    out = speculative_generate(tm, tp, dm, dp, emb, cfg,
                               jax.random.PRNGKey(1), k=3,
                               draft_embeds=emb[:, :32])
    np.testing.assert_array_equal(ref, out)
    assert len(ref) == 3


def test_max_new_tokens_bound(target, weak_draft):
    tm, tp = target
    dm, dp = weak_draft
    emb = _prompt(tm, tp, s=9, seed=51)
    for m in (1, 2, 5):
        cfg = dataclasses.replace(GREEDY, max_new_tokens=m)
        ref = generate(tm, tp, emb, cfg, jax.random.PRNGKey(4))
        out = speculative_generate(tm, tp, dm, dp, emb, cfg,
                                   jax.random.PRNGKey(4), k=3,
                                   draft_embeds=emb)
        np.testing.assert_array_equal(ref, out)


def test_return_stats(target, weak_draft):
    """return_stats reports the Leviathan acceptance bookkeeping: the
    correction/bonus token never counts as accepted, so draft==target is
    exactly 1.0 and a weak draft lands strictly below it (the rate is the
    input to any speculative speedup claim — bench caption_probe)."""
    tm, tp = target
    emb = _prompt(tm, tp, s=6, seed=9)
    ids_ref = generate(tm, tp, emb, GREEDY, jax.random.PRNGKey(0))
    ids, st = speculative_generate(tm, tp, tm, tp, emb, GREEDY,
                                   jax.random.PRNGKey(0), k=3,
                                   return_stats=True)
    np.testing.assert_array_equal(ids, ids_ref)
    assert st["rounds"] > 0 and st["proposed"] == 3 * st["rounds"]
    # draft == target: every proposal accepted (identical greedy argmax)
    assert st["accept_rate"] == 1.0

    dm, dp = weak_draft
    ids2, st2 = speculative_generate(tm, tp, dm, dp, emb, GREEDY,
                                     jax.random.PRNGKey(0), k=3,
                                     return_stats=True)
    np.testing.assert_array_equal(ids2, ids_ref)   # output never depends
    assert 0.0 <= st2["accept_rate"] < 1.0
    assert st2["accepted"] <= st2["proposed"]
