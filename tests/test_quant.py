"""Int8 weight-only quantization (ops/quant.py + LlamaConfig.quant).

The TPU-native equivalent of the reference builder's bitsandbytes 8-bit
loading (llava/model/builder.py:33-37): s8xs8->s32 MXU contraction with
per-channel weight scales and per-token activation scales.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rsvldm_tpu.models.vlm.llama import (KVCache, LlamaConfig, LlamaModel,
                                         quantize_llama_params)
from rsvldm_tpu.ops.quant import (int8_matmul, quantize_acts,
                                  quantize_weight)


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(64, 48)).astype(np.float32))
    ql = quantize_weight(w)
    assert ql.q.dtype == jnp.int8 and ql.scale.shape == (48,)
    deq = ql.q.astype(jnp.float32) * ql.scale
    # absmax symmetric: error bounded by scale/2 per element
    err = np.max(np.abs(np.asarray(deq - w)) / np.asarray(ql.scale))
    assert err <= 0.5 + 1e-5


def test_int8_matmul_close_to_fp32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 256)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(256, 128)).astype(np.float32))
    ref = x @ w
    y = int8_matmul(x, quantize_weight(w), out_dtype=jnp.float32)
    rel = np.linalg.norm(np.asarray(y - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.02, rel


def test_quantize_acts_shapes():
    x = jnp.ones((2, 3, 8))
    xq, s = quantize_acts(x)
    assert xq.dtype == jnp.int8 and s.shape == (2, 3, 1)
    np.testing.assert_allclose(np.asarray(xq), 127)


def _tiny_cfg(**kw):
    return LlamaConfig(vocab_size=120, dim=64, layers=2, heads=4, kv_heads=2,
                       ffn_dim=128, dtype=jnp.float32, **kw)


def test_llama_int8_matches_dense():
    cfg = _tiny_cfg()
    qcfg = dataclasses.replace(cfg, quant="int8")
    model, qmodel = LlamaModel(cfg), LlamaModel(qcfg)
    toks = jnp.asarray([[3, 17, 99, 4, 8, 23, 56, 7]], jnp.int32)
    cache = KVCache.init(cfg, 1, 16)
    params = model.init(jax.random.PRNGKey(0), toks, cache, 0,
                        method=model.from_tokens)
    qparams = {"params": quantize_llama_params(params["params"])}
    # the quantized tree matches what init would build (same apply works)
    ref_q = qmodel.init(jax.random.PRNGKey(0), toks, cache, 0,
                        method=qmodel.from_tokens)
    assert (jax.tree_util.tree_structure(ref_q)
            == jax.tree_util.tree_structure(qparams))

    lg, _ = model.apply(params, toks, cache, 0, method=model.from_tokens)
    qlg, _ = qmodel.apply(qparams, toks, cache, 0, method=qmodel.from_tokens)
    lg, qlg = np.asarray(lg), np.asarray(qlg)
    # logits track the dense model closely and rank the same next token
    cos = np.sum(lg * qlg) / (np.linalg.norm(lg) * np.linalg.norm(qlg))
    assert cos > 0.999, cos
    assert np.array_equal(lg[0, -1].argmax(), qlg[0, -1].argmax())


def test_llama_int8_decode_scan():
    """The generate-style scan (prefill + stepwise decode) runs under the
    int8 path and each step's greedy token matches the dense model."""
    cfg = _tiny_cfg()
    qcfg = dataclasses.replace(cfg, quant="int8")
    model, qmodel = LlamaModel(cfg), LlamaModel(qcfg)
    toks = jnp.asarray([[5, 9, 2, 31]], jnp.int32)
    cache = KVCache.init(cfg, 1, 16)
    params = model.init(jax.random.PRNGKey(1), toks, cache, 0,
                        method=model.from_tokens)
    qparams = {"params": quantize_llama_params(params["params"])}

    def decode(m, p):
        c = KVCache.init(cfg, 1, 16)
        lg, c = m.apply(p, toks, c, 0, method=m.from_tokens)
        tok = jnp.argmax(lg[0, -1]).astype(jnp.int32)
        outs = [int(tok)]
        pos = toks.shape[1]
        for _ in range(4):
            lg, c = m.apply(p, tok[None, None], c, pos, method=m.from_tokens)
            tok = jnp.argmax(lg[0, -1]).astype(jnp.int32)
            outs.append(int(tok))
            pos += 1
        return outs

    assert decode(model, params) == decode(qmodel, qparams)


def test_qdense_bias():
    cfg = _tiny_cfg(attn_bias=True)
    qcfg = dataclasses.replace(cfg, quant="int8")
    model, qmodel = LlamaModel(cfg), LlamaModel(qcfg)
    toks = jnp.asarray([[1, 2, 3]], jnp.int32)
    cache = KVCache.init(cfg, 1, 8)
    params = model.init(jax.random.PRNGKey(2), toks, cache, 0,
                        method=model.from_tokens)
    qparams = {"params": quantize_llama_params(params["params"])}
    lg, _ = model.apply(params, toks, cache, 0, method=model.from_tokens)
    qlg, _ = qmodel.apply(qparams, toks, cache, 0, method=qmodel.from_tokens)
    lg, qlg = np.asarray(lg), np.asarray(qlg)
    cos = np.sum(lg * qlg) / (np.linalg.norm(lg) * np.linalg.norm(qlg))
    assert cos > 0.99, cos
