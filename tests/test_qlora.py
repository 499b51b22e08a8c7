"""QLoRA: LoRA finetuning on a frozen int8/int4 base.

Reference parity target: /root/reference/llava/train/train.py:1471-1529 —
bits 4/8 loading + prepare_model_for_kbit_training + PEFT LoRA. TPU-native
design: the quantized forward stays on the s8 MXU (QDense/Q4Dense), the
backward is a straight-through estimator (ops/quant.py::int8_matmul_ste —
dx against dequantized weights, computed only inside the gradient, exactly
the bitsandbytes backward), and the adapters ride a "lora" Flax collection
into a runtime low-rank branch (llama.py::_maybe_lora) because quantized
kernels cannot absorb a fold-in merge per step.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.models.vlm.llama import (KVCache, LlamaConfig, LlamaModel,
                                         quantize_llama_params)
from rsvldm_tpu.training.vlm_trainer import (IGNORE_INDEX, LoraConfig,
                                             VLMTrainer, apply_model,
                                             dpo_loss, export_merged,
                                             init_lora, quant_mode,
                                             runtime_lora, vlm_loss)

CFG = LlamaConfig(vocab_size=64, dim=16, layers=2, heads=2, kv_heads=2,
                  ffn_dim=32, dtype=jnp.float32)


def _fp_model_and_params(seed=0):
    model = LlamaModel(CFG)
    toks = jnp.zeros((1, 4), jnp.int32)
    cache = KVCache.init(CFG, 1, 8)
    params = model.init(jax.random.PRNGKey(seed), toks, cache, 0,
                        method=model.from_tokens)
    return model, params


def _quant(params, mode):
    return quantize_llama_params(params, mode=mode)


def _batch(model, params):
    toks = jnp.array([[1, 2, 3, 10, 11, 63, 0, 0]], jnp.int32)
    labels = jnp.array([[IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX,
                         10, 11, 63, IGNORE_INDEX, IGNORE_INDEX]])
    embeds = model.apply(params, toks[0], method=model.embed)[None]
    return embeds, labels


@pytest.mark.parametrize("mode", ["int8", "int4"])
def test_qlora_identity_at_init(mode):
    """B=0 adapters through the runtime branch do not change the quantized
    forward at all."""
    model, params = _fp_model_and_params()
    qcfg = dataclasses.replace(CFG, quant=mode)
    qmodel = LlamaModel(qcfg)
    qparams = _quant(params, mode)
    assert quant_mode(qparams) == mode
    lcfg = LoraConfig(r=2)
    lora = init_lora(qparams, lcfg, jax.random.PRNGKey(1))
    emb, _ = _batch(model, params)
    cache = KVCache.init(qcfg, 1, 8)
    base, _ = qmodel.apply(qparams, emb, cache, 0)
    with_l, _ = apply_model(qmodel, qparams, lora, lcfg, emb, cache, 0)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(with_l))


def test_qlora_training_reduces_loss_int8():
    model, params = _fp_model_and_params()
    qcfg = dataclasses.replace(CFG, quant="int8")
    qmodel = LlamaModel(qcfg)
    qparams = _quant(params, "int8")
    trainer = VLMTrainer(qmodel, qparams, LoraConfig(r=4), lr=5e-2,
                         rng=jax.random.PRNGKey(2))
    emb, labels = _batch(model, params)
    cache = KVCache.init(qcfg, 1, 8)
    frozen = jax.tree_util.tree_map(np.asarray, qparams)
    losses = [trainer.train_step(emb, labels, cache) for _ in range(20)]
    assert losses[-1] < losses[0] * 0.8, losses[::5]
    # the quantized base never moved; only the adapters did
    for a, b in zip(jax.tree_util.tree_leaves(frozen),
                    jax.tree_util.tree_leaves(qparams)):
        np.testing.assert_array_equal(a, np.asarray(b))
    assert float(jnp.abs(trainer.lora["layer_0"]["q_proj"]["b"]).max()) > 0


def test_qlora_training_runs_int4():
    model, params = _fp_model_and_params()
    qcfg = dataclasses.replace(CFG, quant="int4")
    qmodel = LlamaModel(qcfg)
    qparams = _quant(params, "int4")
    trainer = VLMTrainer(qmodel, qparams, LoraConfig(r=2), lr=5e-2,
                         rng=jax.random.PRNGKey(3))
    emb, labels = _batch(model, params)
    cache = KVCache.init(qcfg, 1, 8)
    l0 = trainer.train_step(emb, labels, cache)
    l5 = [trainer.train_step(emb, labels, cache) for _ in range(10)][-1]
    assert np.isfinite(l0) and l5 < l0


def test_qlora_grads_track_dequant_base():
    """STE gradients wrt the adapters on the int8 base closely track the
    exact gradients on an fp base whose weights are the dequantized int8
    values (forwards differ only by activation quantization)."""
    model, params = _fp_model_and_params()
    qcfg = dataclasses.replace(CFG, quant="int8")
    qmodel = LlamaModel(qcfg)
    qparams = _quant(params, "int8")

    # fp twin: dequantize every quantized kernel back into a dense tree
    def deq(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict) and "kernel_q" in v:
                out[k] = {"kernel": v["kernel_q"].astype(jnp.float32)
                          * v["scale"]}
            elif isinstance(v, dict):
                out[k] = deq(v)
            else:
                out[k] = v
        return out

    fp_params = {"params": deq(qparams["params"])}
    lcfg = LoraConfig(r=4)
    lora = init_lora(qparams, lcfg, jax.random.PRNGKey(4))
    # non-zero B so adapter grads flow through both a and b
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.ones_like(x), lora)
    emb, labels = _batch(model, params)
    cache = KVCache.init(qcfg, 1, 8)

    gq = jax.grad(lambda l: vlm_loss(qmodel, qparams, l, lcfg, emb, labels,
                                     cache))(lora)
    gf = jax.grad(lambda l: vlm_loss(model, fp_params, l, lcfg, emb, labels,
                                     KVCache.init(CFG, 1, 8)))(lora)
    num = den_a = den_b = 0.0
    for a, b in zip(jax.tree_util.tree_leaves(gq),
                    jax.tree_util.tree_leaves(gf)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        num += float((a * b).sum())
        den_a += float((a * a).sum())
        den_b += float((b * b).sum())
    cos = num / np.sqrt(den_a * den_b)
    assert cos > 0.98, cos


def test_qlora_export_merged_int8_close_to_runtime():
    model, params = _fp_model_and_params()
    qcfg = dataclasses.replace(CFG, quant="int8")
    qmodel = LlamaModel(qcfg)
    qparams = _quant(params, "int8")
    trainer = VLMTrainer(qmodel, qparams, LoraConfig(r=4), lr=5e-2,
                         rng=jax.random.PRNGKey(5))
    emb, labels = _batch(model, params)
    cache = KVCache.init(qcfg, 1, 8)
    for _ in range(5):
        trainer.train_step(emb, labels, cache)
    merged = trainer.merged_params()
    run_l, _ = apply_model(qmodel, qparams, trainer.lora, trainer.lora_cfg,
                           emb, KVCache.init(qcfg, 1, 8), 0)
    mrg_l, _ = qmodel.apply(merged, emb, KVCache.init(qcfg, 1, 8), 0)
    run_p = jax.nn.softmax(np.asarray(run_l, np.float32), axis=-1)
    mrg_p = jax.nn.softmax(np.asarray(mrg_l, np.float32), axis=-1)
    # merge re-rounds the adapted kernels once (RTN) — close, not exact
    assert float(jnp.abs(run_p - mrg_p).max()) < 0.05


def test_qlora_export_merged_int4_raises():
    _, params = _fp_model_and_params()
    qparams = _quant(params, "int4")
    lora = init_lora(qparams, LoraConfig(r=2), jax.random.PRNGKey(6))
    with pytest.raises(NotImplementedError):
        export_merged(qparams, lora, LoraConfig(r=2))


def test_qlora_dpo_runs_on_quant_base():
    model, params = _fp_model_and_params()
    qcfg = dataclasses.replace(CFG, quant="int8")
    qmodel = LlamaModel(qcfg)
    qparams = _quant(params, "int8")
    lcfg = LoraConfig(r=2)
    lora = init_lora(qparams, lcfg, jax.random.PRNGKey(7))
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.ones_like(x), lora)
    emb, labels = _batch(model, params)
    cache = KVCache.init(qcfg, 1, 8)
    loss, g = jax.value_and_grad(
        lambda l: dpo_loss(qmodel, qparams, l, lcfg, emb, labels,
                           emb + 0.1, labels, cache))(lora)
    assert np.isfinite(float(loss))
    gmax = max(float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g))
    assert gmax > 0


def test_runtime_lora_scales_b_only():
    _, params = _fp_model_and_params()
    qparams = _quant(params, "int8")
    cfg = LoraConfig(r=2, alpha=8)
    lora = init_lora(qparams, cfg, jax.random.PRNGKey(8))
    lora = jax.tree_util.tree_map(lambda x: x + 1.0, lora)
    rt = runtime_lora(lora, cfg.scale)
    l0, r0 = lora["layer_0"]["q_proj"], rt["layer_0"]["q_proj"]
    np.testing.assert_array_equal(np.asarray(l0["a"]), np.asarray(r0["a"]))
    np.testing.assert_allclose(np.asarray(r0["b"]),
                               np.asarray(l0["b"]) * cfg.scale)


def test_remat_matches_no_remat():
    """cfg.remat recomputes blocks in the backward; forward and adapter
    grads match the unrematerialized model to fp rounding."""
    model, params = _fp_model_and_params()
    qparams = _quant(params, "int8")
    qcfg = dataclasses.replace(CFG, quant="int8")
    rcfg = dataclasses.replace(qcfg, remat=True)
    qm, rm = LlamaModel(qcfg), LlamaModel(rcfg)
    emb, labels = _batch(model, params)
    cache = KVCache.init(qcfg, 1, 8)
    l1, _ = qm.apply(qparams, emb, cache, 0)
    l2, _ = rm.apply(qparams, emb, cache, 0)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                               rtol=1e-5, atol=1e-5)
    lcfg = LoraConfig(r=2)
    lora = init_lora(qparams, lcfg, jax.random.PRNGKey(9))
    lora = jax.tree_util.tree_map(lambda x: x + 0.01, lora)
    g1 = jax.grad(lambda l: vlm_loss(qm, qparams, l, lcfg, emb, labels,
                                     cache))(lora)
    g2 = jax.grad(lambda l: vlm_loss(rm, qparams, l, lcfg, emb, labels,
                                     cache))(lora)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)
