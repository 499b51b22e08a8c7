"""int8 KV cache (LlamaConfig.kv_quant): numerics vs the bf16/fp32 cache,
decode-path equivalence, engine compatibility, and sharding."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.models.vlm.generate import (GenerateConfig, generate,
                                            generate_batch)
from rsvldm_tpu.models.vlm.llama import KVCache, LlamaConfig, LlamaModel

BASE = LlamaConfig(vocab_size=96, dim=32, layers=2, heads=4, kv_heads=2,
                   ffn_dim=64, dtype=jnp.float32)
QCFG = dataclasses.replace(BASE, kv_quant=True)


@pytest.fixture(scope="module")
def params():
    model = LlamaModel(BASE)
    cache = KVCache.init(BASE, 1, 8, jnp.float32)
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                      cache, 0, method=model.from_tokens)


def _cos(a, b):
    a, b = np.asarray(a).ravel(), np.asarray(b).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def test_kv_quant_decode_logits_close(params):
    """Prefill + several decode steps: the int8-KV logits track the exact
    cache closely (the params are IDENTICAL — kv_quant only changes cache
    storage)."""
    mb, mq = LlamaModel(BASE), LlamaModel(QCFG)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 96, (1, 6)),
                      jnp.int32)
    cb = KVCache.init(BASE, 1, 32, jnp.float32)
    cq = KVCache.init(QCFG, 1, 32, jnp.float32)
    assert cq.k.dtype == jnp.int8 and cq.k_scale.shape == (2, 1, 32, 2)
    lb, cb = mb.apply(params, ids, cb, 0, method=mb.from_tokens)
    lq, cq = mq.apply(params, ids, cq, 0, method=mq.from_tokens)
    assert _cos(lb[0, -1], lq[0, -1]) > 0.999
    tok = jnp.argmax(lb[0, -1])[None, None].astype(jnp.int32)
    for i in range(4):
        lb, cb = mb.apply(params, tok, cb, 6 + i, method=mb.from_tokens)
        lq, cq = mq.apply(params, tok, cq, 6 + i, method=mq.from_tokens)
        assert _cos(lb[0, -1], lq[0, -1]) > 0.999
        tok = jnp.argmax(lb[0, -1])[None, None].astype(jnp.int32)


GREEDY = GenerateConfig(max_new_tokens=10, temperature=0.0, do_sample=False,
                        eot_ids=(95,), pad_to=8)


def test_kv_quant_generate_runs_and_matches(params):
    """Greedy generate through the quantized cache: identical tokens at
    this tiny scale (the quantization error is far below the argmax
    margins of a random-weight model's logits)."""
    mb, mq = LlamaModel(BASE), LlamaModel(QCFG)
    emb = mb.apply(params, jnp.asarray([3, 7, 11, 2, 9], jnp.int32),
                   method=mb.embed)
    ref = generate(mb, params, emb, GREEDY, jax.random.PRNGKey(1))
    out = generate(mq, params, emb, GREEDY, jax.random.PRNGKey(1))
    np.testing.assert_array_equal(ref, out)


def test_kv_quant_batched_per_row_path(params):
    """generate_batch drives the per-row .at[rows, positions] scale-write
    path."""
    mb, mq = LlamaModel(BASE), LlamaModel(QCFG)
    rng = np.random.default_rng(3)
    embs = [mb.apply(params, jnp.asarray(rng.integers(0, 96, (s,)),
                     jnp.int32), method=mb.embed) for s in (4, 7, 5)]
    ref = generate_batch(mb, params, embs, GREEDY, jax.random.PRNGKey(1))
    out = generate_batch(mq, params, embs, GREEDY, jax.random.PRNGKey(1))
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(r, o)


def test_kv_quant_engine(params):
    """The continuous-batching engine runs on an int8-KV pool (the slot
    insert must carry the scale planes)."""
    from rsvldm_tpu.serving.engine import DecodeEngine
    mq = LlamaModel(QCFG)
    rng = np.random.default_rng(5)
    embs = [mq.apply(params, jnp.asarray(rng.integers(0, 96, (s,)),
                     jnp.int32), method=mq.embed) for s in (5, 8)]
    ref = [generate(mq, params, e, GREEDY, jax.random.PRNGKey(1))
           for e in embs]
    eng = DecodeEngine(mq, params, slots=2, max_len=48, pad_to=8)
    out = eng.generate_all(embs, GREEDY)
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(r, o)


def test_kv_quant_shard_cache():
    from rsvldm_tpu.parallel.llama_sharding import shard_kv_cache
    from rsvldm_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(2)
    cache = KVCache.init(QCFG, 1, 16, jnp.float32)
    sharded = shard_kv_cache(cache, mesh)
    assert sharded.k.dtype == jnp.int8
    assert sharded.k_scale.sharding.spec[3] == "data"


def test_kv_quant_engine_speculative(params):
    """int8-KV pool + engine speculative rounds compose: draft==target on
    quantized caches reproduces the vanilla int8-KV engine stream."""
    from rsvldm_tpu.serving.engine import DecodeEngine
    mq = LlamaModel(QCFG)
    rng = np.random.default_rng(7)
    embs = [mq.apply(params, jnp.asarray(rng.integers(0, 96, (s,)),
                     jnp.int32), method=mq.embed) for s in (5, 9)]
    ref = []
    for i, e in enumerate(embs):
        eng0 = DecodeEngine(mq, params, slots=1, max_len=48, pad_to=8)
        for _ in range(i):
            next(eng0._nonce)
        uid = eng0.submit(e, GREEDY)
        eng0.run_until_idle()
        ref.append(eng0.result(uid))
    eng = DecodeEngine(mq, params, slots=2, max_len=48, pad_to=8,
                       draft=mq, draft_params=params, spec_k=2)
    out = eng.generate_all(embs, GREEDY)
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(r, o)
