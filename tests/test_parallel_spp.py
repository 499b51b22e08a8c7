"""Sequence-parallel attention and GPipe pipeline executor
(rsvldm_tpu/parallel/sequence.py) on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rsvldm_tpu.parallel.sequence import (gpipe_apply,
                                          sequence_parallel_attention,
                                          stack_stage_params)


def _mesh(n, name):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, (name,))


def _ref_attention(q, k, v, causal):
    b, s, h, d = q.shape
    rep = h // k.shape[2]
    if rep > 1:
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * d ** -0.5
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        logits = jnp.where(mask, logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v.astype(jnp.float32)
                      ).astype(q.dtype)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize("kvh", [4, 2])
def test_sp_attention_matches_full(causal, kvh):
    mesh = _mesh(4, "sp")
    rng = np.random.default_rng(0)
    b, s, h, d = 2, 16, 4, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, kvh, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, kvh, d)).astype(np.float32))
    ref = _ref_attention(q, k, v, causal)
    spec = NamedSharding(mesh, P(None, "sp"))
    qs = jax.device_put(q, spec)
    ks = jax.device_put(k, spec)
    vs = jax.device_put(v, spec)
    out = jax.jit(lambda a, b_, c: sequence_parallel_attention(
        a, b_, c, mesh, "sp", causal=causal))(qs, ks, vs)
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gpipe_matches_sequential():
    mesh = _mesh(4, "stage")
    rng = np.random.default_rng(1)
    dim, m = 8, 6

    stages = []
    for i in range(4):
        stages.append({
            "w": jnp.asarray(rng.normal(size=(dim, dim)).astype(np.float32)
                             * 0.3),
            "b": jnp.asarray(rng.normal(size=(dim,)).astype(np.float32)),
        })
    stacked = stack_stage_params(stages)

    def stage_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    x_mb = jnp.asarray(rng.normal(size=(m, 3, dim)).astype(np.float32))

    ref = []
    for i in range(m):
        y = x_mb[i]
        for p in stages:
            y = stage_fn(p, y)
        ref.append(y)
    ref = jnp.stack(ref)

    out = jax.jit(lambda sp, xs: gpipe_apply(stage_fn, sp, xs, mesh,
                                             "stage"))(stacked, x_mb)
    assert out.shape == ref.shape
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-5), \
        np.abs(np.asarray(out) - np.asarray(ref)).max()


def test_gpipe_llama_blocks_by_stage():
    """Pipeline the decoder stack itself: 4 stages of 1 tiny llama block
    each == sequential forward (PP over the caption stage's layers)."""
    from rsvldm_tpu.models.vlm.llama import (KVCache, LlamaConfig,
                                             LlamaModel)
    mesh = _mesh(4, "stage")
    cfg = LlamaConfig(vocab_size=32, dim=16, layers=4, heads=2, kv_heads=2,
                      ffn_dim=32)
    lm = LlamaModel(cfg)
    toks = jnp.asarray([[1, 5, 9]], jnp.int32)
    cache = KVCache.init(cfg, 1, 8)
    params = lm.init(jax.random.PRNGKey(0), toks, cache, 0,
                     method=lm.from_tokens)
    ref, _ = lm.apply(params, toks, cache, 0, method=lm.from_tokens)

    # split block params into one stage per layer; embed/norm/head outside
    p = params["params"]
    stage_trees = [p[f"layer_{i}"] for i in range(cfg.layers)]
    stacked = stack_stage_params(stage_trees)

    from rsvldm_tpu.models.vlm.llama import LlamaBlock, RMSNorm
    block = LlamaBlock(cfg)
    # forward-only prefill pipeline: kv cache side outputs are discarded
    k0 = jnp.zeros((1, 8, cfg.kv_heads, cfg.head_dim), jnp.float32)

    def stage_fn(bp, x):
        out = block.apply({"params": bp}, x, k0, k0, 0, toks.shape[1])[0]
        return out

    emb = p["embed_tokens"]["embedding"][toks]          # [1, S, D]
    out = gpipe_apply(stage_fn, stacked, emb[None], mesh, "stage")
    h = out[0]                                          # one microbatch
    hn = RMSNorm(cfg.rms_eps, cfg.norm_plus_one).apply(
        {"params": p["norm"]}, h)
    logits = hn @ p["lm_head"]["kernel"]
    assert np.allclose(np.asarray(logits), np.asarray(ref), atol=2e-4), \
        np.abs(np.asarray(logits) - np.asarray(ref)).max()
