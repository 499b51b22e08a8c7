"""VLM stack tests: vision tower, projector, anyres, llama decode."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from rsvldm_tpu.models.vlm import (CLIPVisionConfig, CLIPVisionTower,
                                   MLPProjector, LlamaConfig, LlamaModel,
                                   KVCache, anyres)
from rsvldm_tpu.models.vlm.generate import (GenerateConfig, generate,
                                            llama3_chat_prompt,
                                            tokenize_with_image,
                                            splice_image_embeds,
                                            IMAGE_TOKEN_INDEX)

TINY_VIT = CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=3,
                            heads=2, select_layer=-2)
TINY_LLAMA = LlamaConfig(vocab_size=256, dim=32, layers=2, heads=4, kv_heads=2,
                         ffn_dim=64)


def test_vision_tower():
    tower = CLIPVisionTower(TINY_VIT)
    px = jax.random.normal(jax.random.PRNGKey(0), (2, 28, 28, 3))
    params = tower.init(jax.random.PRNGKey(1), px)
    out = tower.apply(params, px)
    assert out.shape == (2, 4, 32)  # 2x2 patches, CLS dropped
    assert jnp.all(jnp.isfinite(out))


def test_projector():
    proj = MLPProjector(out_dim=16)
    x = jnp.ones((2, 4, 8))
    p = proj.init(jax.random.PRNGKey(0), x)
    assert proj.apply(p, x).shape == (2, 4, 16)


def test_select_best_resolution():
    grids = anyres.DEFAULT_GRID_PINPOINTS
    # wide image prefers a wide grid
    assert anyres.select_best_resolution((1000, 300), grids) in [(1008, 336)]
    assert anyres.select_best_resolution((300, 1000), grids) in [(336, 1008)]
    assert anyres.select_best_resolution((500, 500), grids) == (672, 672)


def test_process_anyres_image():
    img = Image.new("RGB", (800, 400), (120, 30, 200))
    arr = anyres.process_anyres_image(img, patch_size=336)
    # best res for 800x400 -> 672x336 -> 2x1 grid -> 2 patches + base
    assert arr.shape == (3, 336, 336, 3)
    assert arr.max() <= 1.0


def test_assemble_spatial_unpad():
    side, c = 4, 8
    feats = np.random.default_rng(0).normal(size=(3, side * side, c)).astype(np.float32)
    newline = np.zeros((c,), np.float32)
    out = anyres.assemble_spatial_unpad(feats, (800, 400), newline,
                                        patch_size=336)
    # grid 2x1 -> map (4, 8, c) -> unpad to aspect 2:1 keeps (4, 8) ->
    # newline col -> 4*9 + base 16 tokens
    assert out.shape == (16 + 4 * 9, c)


def test_unpad_feature():
    f = np.arange(8 * 8 * 1, dtype=np.float32).reshape(8, 8, 1)
    # original 2:1 wide -> crop rows: 8w/ratio -> keep 4 rows
    out = anyres.unpad_feature(f, (200, 100))
    assert out.shape == (4, 8, 1)


@pytest.fixture(scope="module")
def llama():
    model = LlamaModel(TINY_LLAMA)
    toks = jnp.zeros((1, 4), jnp.int32)
    cache = KVCache.init(TINY_LLAMA, 1, 16)
    params = model.init(jax.random.PRNGKey(0), toks, cache, 0,
                        method=model.from_tokens)
    return model, params


def test_llama_prefill_shapes(llama):
    model, params = llama
    emb = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 32))
    cache = KVCache.init(TINY_LLAMA, 1, 16)
    logits, cache2 = model.apply(params, emb, cache, 0)
    assert logits.shape == (1, 4, 256)
    assert cache2.k.shape == (2, 1, 16, 2, 8)  # head_dim = 32/4
    # cache positions 0..3 written, 4.. untouched (zero)
    assert float(jnp.abs(cache2.k[:, :, 4:]).max()) == 0.0
    assert float(jnp.abs(cache2.k[:, :, :4]).max()) > 0.0


def test_llama_incremental_matches_full(llama):
    """Decode one token at a time == full forward (causal consistency)."""
    model, params = llama
    emb = jax.random.normal(jax.random.PRNGKey(2), (1, 5, 32))
    cache = KVCache.init(TINY_LLAMA, 1, 8)
    full_logits, _ = model.apply(params, emb, cache, 0)

    cache = KVCache.init(TINY_LLAMA, 1, 8)
    outs = []
    for i in range(5):
        lg, cache = model.apply(params, emb[:, i:i + 1], cache, i)
        outs.append(lg[:, 0])
    inc = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.array(inc), np.array(full_logits),
                               atol=2e-4, rtol=1e-3)


def test_generate_greedy_deterministic(llama):
    model, params = llama
    emb = jax.random.normal(jax.random.PRNGKey(3), (6, 32))
    cfg = GenerateConfig(max_new_tokens=8, do_sample=False, eot_ids=(255,),
                         pad_to=8)
    a = generate(model, params, emb, cfg, jax.random.PRNGKey(0))
    b = generate(model, params, emb, cfg, jax.random.PRNGKey(9))
    np.testing.assert_array_equal(a, b)  # greedy ignores rng
    assert len(a) <= 8


def test_generate_padding_invariance(llama):
    """Bucketed prompt padding must not change greedy output."""
    model, params = llama
    emb = jax.random.normal(jax.random.PRNGKey(4), (5, 32))
    a = generate(model, params, emb,
                 GenerateConfig(max_new_tokens=4, do_sample=False,
                                eot_ids=(255,), pad_to=8), jax.random.PRNGKey(0))
    b = generate(model, params, emb,
                 GenerateConfig(max_new_tokens=4, do_sample=False,
                                eot_ids=(255,), pad_to=16), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(a, b)


def test_prompt_and_splice():
    p = llama3_chat_prompt("describe <image> please")
    assert p.startswith("<|begin_of_text|>")
    assert p.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    fake_encode = lambda s: [len(w) for w in s.split()]
    ids = tokenize_with_image("hello <image> world", fake_encode)
    assert IMAGE_TOKEN_INDEX in ids
    text_embeds = jnp.ones((len(ids), 4))
    img = jnp.zeros((10, 4))
    out = splice_image_embeds(ids, text_embeds, img)
    assert out.shape == (len(ids) - 1 + 10, 4)


def test_resamplers():
    from rsvldm_tpu.models.vlm import resampler as R
    f = jnp.arange(1 * 16 * 4, dtype=jnp.float32).reshape(1, 16, 4)
    assert R.identity_resampler(f) is f
    pooled = R.spatial_pool(f, stride=2)
    assert pooled.shape == (1, 4, 4)
    # average of a 2x2 token block
    grid = np.asarray(f).reshape(1, 4, 4, 4)
    np.testing.assert_allclose(np.asarray(pooled)[0, 0],
                               grid[0, :2, :2].mean(axis=(0, 1)), rtol=1e-6)
    dropped = R.masked_drop(f, jax.random.PRNGKey(0), ratio=0.5)
    assert dropped.shape == (1, 8, 4)
    same = R.masked_drop(f, jax.random.PRNGKey(0), deterministic=True)
    np.testing.assert_array_equal(np.asarray(same), np.asarray(f))


def test_conversation_templates():
    from rsvldm_tpu.models.vlm.conversation import conv_templates
    assert set(conv_templates) >= {"llava_llama_3", "v1", "qwen",
                                   "mistral_instruct", "gemma_instruct",
                                   "plain"}
    p = conv_templates["llava_llama_3"].prompt("describe <image>")
    assert p.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert "describe <image>" in p
    q = conv_templates["qwen"].prompt("hi")
    assert q.startswith("<|im_start|>system")


def test_assemble_anyres_max():
    """anyres_max_N downscales the unpadded grid when it exceeds N patches."""
    side, c = 4, 8
    feats = np.random.default_rng(1).normal(size=(5, side * side, c)).astype(np.float32)
    newline = np.zeros((c,), np.float32)
    full = anyres.assemble_spatial_unpad(feats, (672, 672), newline,
                                         patch_size=336)
    capped = anyres.assemble_spatial_unpad(feats, (672, 672), newline,
                                           patch_size=336, max_num_patches=1)
    assert capped.shape[0] < full.shape[0]
    # base tokens are untouched
    np.testing.assert_allclose(capped[:side * side], feats[0], atol=1e-6)
