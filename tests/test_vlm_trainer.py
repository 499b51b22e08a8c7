"""VLM LoRA finetune loop tests."""

import jax
import jax.numpy as jnp
import numpy as np

from rsvldm_tpu.models.vlm.llama import KVCache, LlamaConfig, LlamaModel
from rsvldm_tpu.training.vlm_trainer import (IGNORE_INDEX, LoraConfig,
                                             VLMTrainer, apply_lora,
                                             init_lora,
                                             preprocess_conversation,
                                             vlm_loss)

CFG = LlamaConfig(vocab_size=64, dim=16, layers=2, heads=2, kv_heads=2,
                  ffn_dim=32)


def _model_and_params():
    model = LlamaModel(CFG)
    toks = jnp.zeros((1, 4), jnp.int32)
    cache = KVCache.init(CFG, 1, 8)
    params = model.init(jax.random.PRNGKey(0), toks, cache, 0,
                        method=model.from_tokens)
    return model, params


def test_init_lora_targets_all_lm_linears():
    """Default targets match the reference recipe (find_all_linear_names:
    every LM linear incl. the MLP projections, lm_head excluded)."""
    _, params = _model_and_params()
    lora = init_lora(params, LoraConfig(r=2), jax.random.PRNGKey(1))
    l0 = lora["layer_0"]
    assert set(l0) == {"q_proj", "k_proj", "v_proj", "o_proj",
                       "gate_proj", "up_proj", "down_proj"}
    assert "lm_head" not in lora
    assert l0["q_proj"]["a"].shape == (16, 2)
    assert float(jnp.abs(l0["q_proj"]["b"]).max()) == 0.0  # B zero-init
    # A ~ kaiming-uniform U(-1/sqrt(in), 1/sqrt(in)) (PEFT lora_A init)
    bound = 1.0 / 16 ** 0.5
    a = np.asarray(l0["q_proj"]["a"])
    assert np.abs(a).max() <= bound and np.abs(a).max() > 0.5 * bound


def test_apply_lora_identity_at_init():
    _, params = _model_and_params()
    cfg = LoraConfig(r=2)
    lora = init_lora(params, cfg, jax.random.PRNGKey(1))
    eff = apply_lora(params, lora, cfg.scale)
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(eff)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-7)


def test_preprocess_masks_prompt():
    inp, labels = preprocess_conversation(np.array([1, 2, 3]),
                                          np.array([10, 11]), eot_id=63)
    np.testing.assert_array_equal(inp, [1, 2, 3, 10, 11, 63])
    np.testing.assert_array_equal(labels[:3], [IGNORE_INDEX] * 3)
    np.testing.assert_array_equal(labels[3:], [10, 11, 63])


def test_training_reduces_loss():
    model, params = _model_and_params()
    trainer = VLMTrainer(model, params, LoraConfig(r=4), lr=5e-2,
                         rng=jax.random.PRNGKey(2))
    toks = jnp.array([[1, 2, 3, 10, 11, 63, 0, 0]], jnp.int32)
    labels = jnp.array([[IGNORE_INDEX, IGNORE_INDEX, IGNORE_INDEX,
                         10, 11, 63, IGNORE_INDEX, IGNORE_INDEX]])
    embeds = model.apply(params, toks[0], method=model.embed)[None]
    cache = KVCache.init(CFG, 1, 8)
    losses = [trainer.train_step(embeds, labels, cache) for _ in range(20)]
    assert losses[-1] < losses[0] * 0.8, losses[::5]
    # merged export differs from the base after training
    merged = trainer.merged_params()
    q0 = np.asarray(params["params"]["layer_0"]["q_proj"]["kernel"])
    q1 = np.asarray(merged["params"]["layer_0"]["q_proj"]["kernel"])
    assert not np.allclose(q0, q1)


def test_loss_ignores_masked_positions():
    model, params = _model_and_params()
    cfg = LoraConfig(r=2)
    lora = init_lora(params, cfg, jax.random.PRNGKey(3))
    toks = jnp.array([[1, 2, 3, 4]], jnp.int32)
    embeds = model.apply(params, toks[0], method=model.embed)[None]
    cache = KVCache.init(CFG, 1, 4)
    all_masked = jnp.full((1, 4), IGNORE_INDEX)
    loss = vlm_loss(model, params, lora, cfg, embeds, all_masked, cache)
    assert float(loss) == 0.0


def test_dpo_loss_prefers_chosen():
    import optax
    from rsvldm_tpu.training.vlm_trainer import dpo_loss
    model, params = _model_and_params()
    cfg = LoraConfig(r=4)
    lora = init_lora(params, cfg, jax.random.PRNGKey(4))
    cache = KVCache.init(CFG, 1, 6)

    chosen = jnp.array([[1, 2, 10, 11, 63, 0]], jnp.int32)
    rejected = jnp.array([[1, 2, 20, 21, 63, 0]], jnp.int32)
    mask = jnp.array([[IGNORE_INDEX, IGNORE_INDEX, 0, 0, 0, IGNORE_INDEX]])
    c_lab = jnp.where(mask == 0, chosen, IGNORE_INDEX)
    r_lab = jnp.where(mask == 0, rejected, IGNORE_INDEX)
    c_emb = model.apply(params, chosen[0], method=model.embed)[None]
    r_emb = model.apply(params, rejected[0], method=model.embed)[None]

    # at init (policy == ref) the loss is exactly -log sigmoid(0) = log 2
    l0 = dpo_loss(model, params, lora, cfg, c_emb, c_lab, r_emb, r_lab, cache)
    np.testing.assert_allclose(float(l0), np.log(2), atol=1e-5)

    tx = optax.adamw(5e-2)
    opt = tx.init(lora)
    step = jax.jit(lambda l, o: _dpo_step(model, params, l, cfg, c_emb, c_lab,
                                          r_emb, r_lab, cache, tx, o))
    for _ in range(15):
        lora, opt, loss = step(lora, opt)
    assert float(loss) < float(l0)


def _dpo_step(model, params, lora, cfg, ce, cl, re_, rl, cache, tx, opt):
    from rsvldm_tpu.training.vlm_trainer import dpo_loss
    import optax
    loss, grads = jax.value_and_grad(
        lambda l: dpo_loss(model, params, l, cfg, ce, cl, re_, rl, cache))(lora)
    updates, opt = tx.update(grads, opt, lora)
    return optax.apply_updates(lora, updates), opt, loss
