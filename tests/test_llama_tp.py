"""Tensor-parallel Llama: sharded == replicated outputs on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from rsvldm_tpu.models.vlm.llama import KVCache, LlamaConfig, LlamaModel
from rsvldm_tpu.parallel import make_mesh
from rsvldm_tpu.parallel.llama_sharding import (shard_llama_params,
                                                shard_kv_cache,
                                                llama_param_spec)

CFG = LlamaConfig(vocab_size=128, dim=32, layers=2, heads=8, kv_heads=4,
                  ffn_dim=64)


def test_param_specs():
    from jax.sharding import PartitionSpec as P
    import jax.tree_util as tu
    model = LlamaModel(CFG)
    toks = jnp.zeros((1, 4), jnp.int32)
    cache = KVCache.init(CFG, 1, 8)
    params = model.init(jax.random.PRNGKey(0), toks, cache, 0,
                        method=model.from_tokens)
    specs = tu.tree_map_with_path(lambda p, l: llama_param_spec(p, l), params)
    flat = {"/".join(str(getattr(k, "key", k)) for k in path): s
            for path, s in tu.tree_flatten_with_path(specs)[0]}
    assert any("q_proj" in k and s == P(None, "data") for k, s in flat.items())
    assert any("o_proj" in k and s == P("data", None) for k, s in flat.items())
    assert any("attn_norm" in k and s == P() for k, s in flat.items())


def test_tp_matches_replicated():
    # 4-way TP (kv_heads=4 must divide the axis; the real 8B has 8 kv heads
    # matching a v5e-8 slice)
    mesh = make_mesh(4, tile=1)
    model = LlamaModel(CFG)
    toks = jnp.array([[3, 17, 99, 42, 7, 1, 0, 5]], jnp.int32)
    cache = KVCache.init(CFG, 1, 16)
    params = model.init(jax.random.PRNGKey(0), toks, cache, 0,
                        method=model.from_tokens)

    ref_logits, _ = model.apply(params, toks, cache, 0,
                                method=model.from_tokens)

    with mesh:
        sparams = shard_llama_params(params, mesh)
        scache = shard_kv_cache(cache, mesh)
        f = jax.jit(lambda p, t, c: model.apply(p, t, c, 0,
                                                method=model.from_tokens))
        tp_logits, new_cache = f(sparams, toks, scache)

    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=1e-3)
    # params remained sharded (no silent full replication of a big kernel)
    q = sparams["params"]["layer_0"]["q_proj"]["kernel"]
    assert len(q.sharding.device_set) == 4


def test_moe_expert_sharding():
    """EP: stacked expert kernels shard over the mesh axis; TP decode of an
    MoE config matches the replicated forward."""
    from jax.sharding import PartitionSpec as P
    mesh = make_mesh(4, tile=1)
    cfg = LlamaConfig(vocab_size=128, dim=32, layers=2, heads=8, kv_heads=4,
                      ffn_dim=64, num_experts=4, experts_per_tok=2,
                      moe_ffn_dim=16)
    model = LlamaModel(cfg)
    toks = jnp.array([[3, 17, 99, 42]], jnp.int32)
    cache = KVCache.init(cfg, 1, 8)
    params = model.init(jax.random.PRNGKey(0), toks, cache, 0,
                        method=model.from_tokens)
    ref, _ = model.apply(params, toks, cache, 0, method=model.from_tokens)
    assert llama_param_spec(
        (jax.tree_util.DictKey("layer_0"), jax.tree_util.DictKey("moe"),
         jax.tree_util.DictKey("experts_gate")),
        jnp.zeros((4, 32, 16))) == P("data", None, None)
    with mesh:
        sp = shard_llama_params(params, mesh)
        eg = sp["params"]["layer_0"]["moe"]["experts_gate"]
        assert len(eg.sharding.device_set) == 4
        out, _ = jax.jit(lambda p, t, c: model.apply(
            p, t, c, 0, method=model.from_tokens))(
            sp, toks, shard_kv_cache(cache, mesh))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               rtol=1e-3)


def test_int8_tp_matches_int8_replicated():
    """int8 weight-only decode composes with TP: the s8 kernels shard like
    dense kernels, per-output scales follow the output sharding; sharded
    logits == unsharded int8 logits."""
    import dataclasses

    from rsvldm_tpu.models.vlm.llama import quantize_llama_params

    qcfg = dataclasses.replace(CFG, quant="int8")
    dense = LlamaModel(CFG)
    model = LlamaModel(qcfg)
    toks = jnp.array([[3, 17, 99, 42, 7, 1, 0, 5]], jnp.int32)
    cache = KVCache.init(CFG, 1, 16)
    params = dense.init(jax.random.PRNGKey(0), toks, cache, 0,
                        method=dense.from_tokens)
    qparams = {"params": quantize_llama_params(params["params"])}

    ref_logits, _ = model.apply(qparams, toks, cache, 0,
                                method=model.from_tokens)

    mesh = make_mesh(4, tile=1)
    with mesh:
        sparams = shard_llama_params(qparams, mesh)
        scache = shard_kv_cache(cache, mesh)
        f = jax.jit(lambda p, t, c: model.apply(p, t, c, 0,
                                                method=model.from_tokens))
        tp_logits, _ = f(sparams, toks, scache)

    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=1e-3)
    q = sparams["params"]["layer_0"]["q_proj"]["kernel_q"]
    s = sparams["params"]["layer_0"]["q_proj"]["scale"]
    assert len(q.sharding.device_set) == 4
    assert len(s.sharding.device_set) == 4


def test_int4_tp_matches_int4_replicated():
    """int4 weight-only decode composes with TP: packed nibble kernels and
    2D group scales follow the same Megatron col/row rules; for row-parallel
    modules the group axis Gb aligns with the input shards and the
    post-group sum becomes the all-reduce."""
    import dataclasses

    from rsvldm_tpu.models.vlm.llama import quantize_llama_params

    # group=8 so Gb (=in/8) is divisible by the 4-way axis even at toy dims,
    # exercising sharded group scales on the row-parallel o/down projections
    qcfg = dataclasses.replace(CFG, quant="int4", quant_group=8)
    dense = LlamaModel(CFG)
    model = LlamaModel(qcfg)
    toks = jnp.array([[3, 17, 99, 42, 7, 1, 0, 5]], jnp.int32)
    cache = KVCache.init(CFG, 1, 16)
    params = dense.init(jax.random.PRNGKey(0), toks, cache, 0,
                        method=dense.from_tokens)
    qparams = {"params": quantize_llama_params(params["params"], mode="int4",
                                               group=8)}

    ref_logits, _ = model.apply(qparams, toks, cache, 0,
                                method=model.from_tokens)

    mesh = make_mesh(4, tile=1)
    with mesh:
        sparams = shard_llama_params(qparams, mesh)
        scache = shard_kv_cache(cache, mesh)
        f = jax.jit(lambda p, t, c: model.apply(p, t, c, 0,
                                                method=model.from_tokens))
        tp_logits, _ = f(sparams, toks, scache)

    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits),
                               atol=2e-4, rtol=1e-3)
    lay = sparams["params"]["layer_0"]
    assert len(lay["q_proj"]["kernel_q4"].sharding.device_set) == 4
    assert len(lay["q_proj"]["scale"].sharding.device_set) == 4
    assert len(lay["o_proj"]["kernel_q4"].sharding.device_set) == 4
    assert len(lay["o_proj"]["scale"].sharding.device_set) == 4
