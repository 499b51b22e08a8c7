"""MMTrainer: projector pretrain stage + joint LoRA/projector finetune.

Reference: /root/reference/llava/train/train.py:1618-1630
(tune_mm_mlp_adapter — projector-only pretrain) and
llava_trainer.py:361-438 (mm_projector_lr param groups)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from rsvldm_tpu.models.vlm.llama import (KVCache, LlamaConfig, LlamaModel,
                                         quantize_llama_params)
from rsvldm_tpu.models.vlm.projector import MLPProjector
from rsvldm_tpu.training.vlm_trainer import (IGNORE_INDEX, LoraConfig,
                                             MMTrainer, load_projector_npz,
                                             save_projector_npz)

CFG = LlamaConfig(vocab_size=64, dim=16, layers=2, heads=2, kv_heads=2,
                  ffn_dim=32, dtype=jnp.float32)
T, DV = 3, 8  # image token count / tower feature width


def _setup(quant=None):
    model = LlamaModel(CFG)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                        KVCache.init(CFG, 1, 8), 0, method=model.from_tokens)
    if quant:
        params = {"params": quantize_llama_params(params["params"],
                                                  mode=quant)}
        model = LlamaModel(dataclasses.replace(CFG, quant=quant))
    proj = MLPProjector(out_dim=CFG.dim)
    pp = proj.init(jax.random.PRNGKey(1), jnp.zeros((1, T, DV)))
    return model, params, proj, pp


def _batch(model, params):
    """One row: ids [5..] with a reserved T-span at position 2."""
    s = 12
    ids = np.array([1, 2] + [0] * T + [10, 11, 63, 5, 6, 7, 8], np.int32)
    emb = model.apply(params, jnp.asarray(ids), method=model.embed)[None]
    emb = emb.at[0, 2:2 + T].set(0.0)
    labels = np.full((1, s), IGNORE_INDEX, np.int32)
    labels[0, 2 + T:2 + T + 3] = [10, 11, 63]
    feats = jnp.asarray(
        np.random.default_rng(2).normal(size=(1, T, DV)), jnp.float32)
    return feats, emb, np.array([2]), jnp.asarray(labels)


def test_projector_pretrain_reduces_loss_base_frozen():
    model, params, proj, pp = _setup()
    tr = MMTrainer(model, params, proj, pp, tune=("projector",), lr=5e-2,
                   rng=jax.random.PRNGKey(3))
    assert tr.lora is None
    feats, emb, pos, labels = _batch(model, params)
    cache = KVCache.init(CFG, 1, 16)
    frozen = jax.tree_util.tree_map(np.asarray, params)
    losses = [tr.train_step(feats, emb, pos, labels, cache)
              for _ in range(25)]
    assert losses[-1] < losses[0] * 0.85, losses[::6]
    for a, b in zip(jax.tree_util.tree_leaves(frozen),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(a, np.asarray(b))
    # projector moved
    d0 = np.asarray(pp["params"]["fc0"]["kernel"])
    d1 = np.asarray(tr.proj_params["params"]["fc0"]["kernel"])
    assert not np.allclose(d0, d1)


def test_joint_finetune_moves_both_groups():
    model, params, proj, pp = _setup()
    tr = MMTrainer(model, params, proj, pp, LoraConfig(r=2),
                   tune=("lora", "projector"), lr=5e-2,
                   rng=jax.random.PRNGKey(4))
    feats, emb, pos, labels = _batch(model, params)
    cache = KVCache.init(CFG, 1, 16)
    l0 = tr.train_step(feats, emb, pos, labels, cache)
    for _ in range(10):
        le = tr.train_step(feats, emb, pos, labels, cache)
    assert le < l0
    assert float(jnp.abs(tr.lora["layer_0"]["q_proj"]["b"]).max()) > 0
    assert not np.allclose(np.asarray(pp["params"]["fc0"]["kernel"]),
                           np.asarray(tr.proj_params["params"]["fc0"]
                                      ["kernel"]))


def test_mm_projector_lr_zero_freezes_projector():
    model, params, proj, pp = _setup()
    tr = MMTrainer(model, params, proj, pp, LoraConfig(r=2),
                   tune=("lora", "projector"), lr=5e-2, mm_projector_lr=0.0,
                   rng=jax.random.PRNGKey(5))
    feats, emb, pos, labels = _batch(model, params)
    cache = KVCache.init(CFG, 1, 16)
    for _ in range(5):
        tr.train_step(feats, emb, pos, labels, cache)
    np.testing.assert_array_equal(
        np.asarray(pp["params"]["fc0"]["kernel"]),
        np.asarray(tr.proj_params["params"]["fc0"]["kernel"]))
    assert float(jnp.abs(tr.lora["layer_0"]["q_proj"]["b"]).max()) > 0


def test_mm_trainer_on_int8_base():
    model, params, proj, pp = _setup(quant="int8")
    tr = MMTrainer(model, params, proj, pp, LoraConfig(r=2),
                   tune=("lora", "projector"), lr=5e-2,
                   rng=jax.random.PRNGKey(6))
    feats, emb, pos, labels = _batch(model, params)
    qcfg = model.cfg
    cache = KVCache.init(qcfg, 1, 16)
    l0 = tr.train_step(feats, emb, pos, labels, cache)
    for _ in range(10):
        le = tr.train_step(feats, emb, pos, labels, cache)
    assert np.isfinite(l0) and le < l0


def test_projector_npz_roundtrip(tmp_path):
    _, _, _, pp = _setup()
    save_projector_npz(pp, tmp_path / "proj.npz")
    back = load_projector_npz(tmp_path / "proj.npz")
    for a, b in zip(jax.tree_util.tree_leaves(pp),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
