"""End-to-end LLaVA captioner glue test with a tiny synthetic checkpoint."""

import json

import numpy as np
import pytest
from PIL import Image

torch = pytest.importorskip("torch")

from rsvldm_tpu.models.vlm.captioner import LlavaCaptioner  # noqa: E402
from rsvldm_tpu.models.vlm.llama import LlamaConfig  # noqa: E402
from rsvldm_tpu.models.vlm.vision import CLIPVisionConfig  # noqa: E402
from rsvldm_tpu.config import LlavaConfig  # noqa: E402

LCFG = LlamaConfig(vocab_size=256, dim=32, layers=2, heads=4, kv_heads=2,
                   ffn_dim=64)
VCFG = CLIPVisionConfig(image_size=28, patch_size=14, width=24, layers=2,
                        heads=2, select_layer=-2)


class FakeTokenizer:
    eos_token_id = 255

    def encode(self, s, add_special_tokens=False):
        return [min(ord(c), 250) for c in s[:40]]

    def decode(self, ids, skip_special_tokens=True):
        return "".join(chr(max(i, 32) % 127) for i in ids if i < 250)


def _tiny_llava_state_dict():
    """torch state dict with HF LLaVA naming, tiny shapes."""
    sd = {}
    g = torch.Generator().manual_seed(0)
    r = lambda *s: torch.randn(*s, generator=g) * 0.05

    sd["model.embed_tokens.weight"] = r(256, 32)
    for i in range(2):
        p = f"model.layers.{i}"
        sd[f"{p}.input_layernorm.weight"] = torch.ones(32)
        sd[f"{p}.post_attention_layernorm.weight"] = torch.ones(32)
        sd[f"{p}.self_attn.q_proj.weight"] = r(32, 32)
        sd[f"{p}.self_attn.k_proj.weight"] = r(16, 32)
        sd[f"{p}.self_attn.v_proj.weight"] = r(16, 32)
        sd[f"{p}.self_attn.o_proj.weight"] = r(32, 32)
        sd[f"{p}.mlp.gate_proj.weight"] = r(64, 32)
        sd[f"{p}.mlp.up_proj.weight"] = r(64, 32)
        sd[f"{p}.mlp.down_proj.weight"] = r(32, 64)
    sd["model.norm.weight"] = torch.ones(32)
    sd["lm_head.weight"] = r(256, 32)

    vp = "model.vision_tower.vision_tower.vision_model"
    sd[f"{vp}.embeddings.class_embedding"] = r(24)
    sd[f"{vp}.embeddings.position_embedding.weight"] = r(5, 24)
    sd[f"{vp}.embeddings.patch_embedding.weight"] = r(24, 3, 14, 14)
    sd[f"{vp}.pre_layrnorm.weight"] = torch.ones(24)
    sd[f"{vp}.pre_layrnorm.bias"] = torch.zeros(24)
    for i in range(2):
        p = f"{vp}.encoder.layers.{i}"
        for ln in ["layer_norm1", "layer_norm2"]:
            sd[f"{p}.{ln}.weight"] = torch.ones(24)
            sd[f"{p}.{ln}.bias"] = torch.zeros(24)
        for proj in ["q_proj", "k_proj", "v_proj", "out_proj"]:
            sd[f"{p}.self_attn.{proj}.weight"] = r(24, 24)
            sd[f"{p}.self_attn.{proj}.bias"] = torch.zeros(24)
        sd[f"{p}.mlp.fc1.weight"] = r(96, 24)
        sd[f"{p}.mlp.fc1.bias"] = torch.zeros(96)
        sd[f"{p}.mlp.fc2.weight"] = r(24, 96)
        sd[f"{p}.mlp.fc2.bias"] = torch.zeros(24)

    sd["model.mm_projector.0.weight"] = r(32, 24)
    sd["model.mm_projector.0.bias"] = torch.zeros(32)
    sd["model.mm_projector.2.weight"] = r(32, 32)
    sd["model.mm_projector.2.bias"] = torch.zeros(32)
    sd["model.image_newline"] = r(32)
    return sd


def test_captioner_end_to_end(tmp_path):
    from safetensors.torch import save_file
    d = tmp_path / "llava"
    d.mkdir()
    save_file(_tiny_llava_state_dict(), str(d / "model.safetensors"))

    cap = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                              tokenizer=FakeTokenizer())
    assert cap is not None

    img = Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (50, 70, 3), dtype=np.uint8))
    lcfg = LlavaConfig(max_new_tokens=6, temperature=0.0, do_sample=False)
    out = cap.caption(img, lcfg)
    assert isinstance(out, str)


def test_lora_merge_dir(tmp_path):
    from safetensors.torch import save_file
    d = tmp_path / "llava"
    d.mkdir()
    save_file(_tiny_llava_state_dict(), str(d / "model.safetensors"))
    ad = tmp_path / "Llava-next"
    ad.mkdir()
    (ad / "adapter_config.json").write_text(json.dumps({"r": 4, "lora_alpha": 8}))
    a = torch.zeros(4, 32)
    b = torch.ones(32, 4) * 0.01
    save_file({
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a + 0.1,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b,
    }, str(ad / "adapter_model.safetensors"))

    cap = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                              tokenizer=FakeTokenizer())
    assert cap is not None
    # q_proj of layer 0 should differ from the unmerged conversion
    import shutil
    shutil.rmtree(ad)
    cap0 = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                               tokenizer=FakeTokenizer())
    q1 = np.asarray(cap.llama_params["params"]["layer_0"]["q_proj"]["kernel"])
    q0 = np.asarray(cap0.llama_params["params"]["layer_0"]["q_proj"]["kernel"])
    assert not np.allclose(q1, q0)


def test_captioner_tp_matches_single(tmp_path):
    """Mesh-sharded captioner (Megatron TP over the data axis) produces the
    same caption as the unsharded one — the wiring the caption stage uses in
    the pipeline (SuperResolutionPipeline(mesh=...))."""
    from safetensors.torch import save_file
    from rsvldm_tpu.parallel import make_mesh

    d = tmp_path / "llava"
    d.mkdir()
    save_file(_tiny_llava_state_dict(), str(d / "model.safetensors"))
    img = Image.fromarray(
        np.random.default_rng(1).integers(0, 255, (50, 70, 3), dtype=np.uint8))
    lcfg = LlavaConfig(max_new_tokens=6, temperature=0.0, do_sample=False)

    cap = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                              tokenizer=FakeTokenizer())
    ref = cap.caption(img, lcfg)

    mesh = make_mesh(2, tile=1)  # kv_heads=2 shards 2-way
    cap_tp = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                                 tokenizer=FakeTokenizer(), mesh=mesh)
    assert cap_tp.mesh is mesh
    q = cap_tp.llama_params["params"]["layer_0"]["q_proj"]["kernel"]
    assert len(q.sharding.device_set) == 2  # actually sharded, not replicated
    out = cap_tp.caption(img, lcfg)
    assert out == ref


def test_caption_batch_matches_single(tmp_path):
    """Batched decode (left-padded rows, per-row pad masking, shared RoPE
    shift) must reproduce each image's individual greedy caption."""
    from safetensors.torch import save_file
    d = tmp_path / "llava"
    d.mkdir()
    save_file(_tiny_llava_state_dict(), str(d / "model.safetensors"))
    cap = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                              tokenizer=FakeTokenizer())
    rng = np.random.default_rng(3)
    # different sizes -> different anyres token counts -> different pad_lens
    imgs = [Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8))
            for h, w in ((40, 60), (64, 40), (30, 30))]
    lcfg = LlavaConfig(max_new_tokens=6, temperature=0.0, do_sample=False)
    singles = [cap.caption(im, lcfg) for im in imgs]
    batched = cap.caption_batch(imgs, lcfg)
    assert batched == singles


def _write_draft_dir(root, layers):
    """<root>/llava_draft: plain Llama LM checkpoint = the LM subset of the
    tiny LLaVA state dict, truncated to `layers` layers, + config.json."""
    from safetensors.torch import save_file
    dd = root / "llava_draft"
    dd.mkdir()
    sd = _tiny_llava_state_dict()
    keep = {k: v for k, v in sd.items()
            if k in ("model.embed_tokens.weight", "model.norm.weight",
                     "lm_head.weight")
            or (k.startswith("model.layers.")
                and int(k.split(".")[2]) < layers)}
    save_file(keep, str(dd / "model.safetensors"))
    (dd / "config.json").write_text(json.dumps({
        "vocab_size": 256, "hidden_size": 32, "num_hidden_layers": layers,
        "num_attention_heads": 4, "num_key_value_heads": 2,
        "intermediate_size": 64, "rms_norm_eps": 1e-5,
        "rope_theta": LCFG.rope_theta}))
    return dd


def test_spec_captioner_draft_equals_target(tmp_path):
    """Auto-detected <ckpt_dir>/llava_draft wires speculative decoding into
    caption(); draft == target reproduces the vanilla SAMPLED caption
    bit-for-bit (the speculative key-schedule contract)."""
    from safetensors.torch import save_file
    d = tmp_path / "llava"
    d.mkdir()
    save_file(_tiny_llava_state_dict(), str(d / "model.safetensors"))
    img = Image.fromarray(
        np.random.default_rng(5).integers(0, 255, (50, 70, 3), dtype=np.uint8))
    lcfg = LlavaConfig(max_new_tokens=8, temperature=0.7, do_sample=True)
    ref = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                              tokenizer=FakeTokenizer()).caption(img, lcfg)

    _write_draft_dir(tmp_path, layers=2)   # draft == target
    cap = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                              tokenizer=FakeTokenizer())
    assert cap.draft is not None
    assert cap.draft.cfg.layers == 2
    assert cap.caption(img, lcfg) == ref


def test_spec_captioner_mismatched_draft_greedy_exact(tmp_path):
    """A 1-layer (wrong) draft must still produce EXACTLY the vanilla
    greedy caption — draft quality only changes speed, never output."""
    from safetensors.torch import save_file
    d = tmp_path / "llava"
    d.mkdir()
    save_file(_tiny_llava_state_dict(), str(d / "model.safetensors"))
    img = Image.fromarray(
        np.random.default_rng(6).integers(0, 255, (40, 56, 3), dtype=np.uint8))
    lcfg = LlavaConfig(max_new_tokens=8, temperature=0.0, do_sample=False)
    ref = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                              tokenizer=FakeTokenizer()).caption(img, lcfg)

    _write_draft_dir(tmp_path, layers=1)
    cap = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                              tokenizer=FakeTokenizer(), spec_k=3)
    assert cap.draft is not None and cap.draft.cfg.layers == 1
    assert cap.caption(img, lcfg) == ref


def test_lora_npz_adapters(tmp_path):
    """train_vlm.py adapters attach at load: folded kernels on an fp base,
    runtime "lora" collection on the int8 base — and the quant caption
    output actually responds to the adapters."""
    import jax
    import jax.numpy as jnp
    from safetensors.torch import save_file

    from rsvldm_tpu.training.vlm_trainer import (LoraConfig, init_lora,
                                                 save_lora_npz)
    d = tmp_path / "llava"
    d.mkdir()
    save_file(_tiny_llava_state_dict(), str(d / "model.safetensors"))

    cap0 = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                               tokenizer=FakeTokenizer())
    lcfg = LoraConfig(r=2, alpha=4)
    lora = init_lora(cap0.llama_params, lcfg, jax.random.PRNGKey(0))
    lora = jax.tree_util.tree_map(lambda x: x + 0.05, lora)
    save_lora_npz(lora, lcfg, tmp_path / "lora.npz")

    cap_fp = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                                 tokenizer=FakeTokenizer(),
                                 lora_npz=tmp_path / "lora.npz")
    q1 = np.asarray(cap_fp.llama_params["params"]["layer_0"]["q_proj"]
                    ["kernel"])
    q0 = np.asarray(cap0.llama_params["params"]["layer_0"]["q_proj"]
                    ["kernel"])
    assert not np.allclose(q1, q0)  # folded in

    cap_q = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                                tokenizer=FakeTokenizer(), quant="int8",
                                lora_npz=tmp_path / "lora.npz")
    assert "lora" in cap_q.llama_params  # runtime branch, kernels untouched
    img = Image.fromarray(np.random.default_rng(1).integers(
        0, 255, (40, 40, 3), dtype=np.uint8))
    gen = LlavaConfig(max_new_tokens=4, temperature=0.0, do_sample=False)
    cap_q_plain = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG,
                                      vision_cfg=VCFG,
                                      tokenizer=FakeTokenizer(),
                                      quant="int8")
    # adapters flow through the generate path: logits must differ
    e = jnp.ones((3, 32), jnp.float32)
    c_with = cap_q.llama.apply(cap_q.llama_params, e[None],
                               __import__("rsvldm_tpu.models.vlm.llama",
                                          fromlist=["KVCache"]).KVCache.init(
                                   cap_q.llama.cfg, 1, 8), 0)[0]
    c_wo = cap_q_plain.llama.apply(cap_q_plain.llama_params, e[None],
                                   __import__("rsvldm_tpu.models.vlm.llama",
                                              fromlist=["KVCache"]).KVCache
                                   .init(cap_q_plain.llama.cfg, 1, 8), 0)[0]
    assert not np.allclose(np.asarray(c_with), np.asarray(c_wo))
    assert isinstance(cap_q.caption(img, gen), str)


def test_projector_npz_replaces_mm_projector(tmp_path):
    import jax
    import jax.numpy as jnp
    from safetensors.torch import save_file

    from rsvldm_tpu.training.vlm_trainer import save_projector_npz
    d = tmp_path / "llava"
    d.mkdir()
    save_file(_tiny_llava_state_dict(), str(d / "model.safetensors"))
    cap0 = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                               tokenizer=FakeTokenizer())
    trained = jax.tree_util.tree_map(lambda x: x + 0.5,
                                     cap0.projector_params)
    save_projector_npz(trained, tmp_path / "proj.npz")
    cap1 = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                               tokenizer=FakeTokenizer(),
                               projector_npz=tmp_path / "proj.npz")
    a = np.asarray(jax.tree_util.tree_leaves(cap1.projector_params)[0])
    b = np.asarray(jax.tree_util.tree_leaves(trained)[0])
    np.testing.assert_array_equal(a, b)


def test_embed_mm_multi_image_ordering(tmp_path):
    """embed_multimodal_prompt: one feature stream per <image>, in prompt
    order — swapping the images swaps exactly the image spans."""
    from safetensors.torch import save_file

    from rsvldm_tpu.models.vlm.generate import tokenize_with_image
    d = tmp_path / "llava"
    d.mkdir()
    save_file(_tiny_llava_state_dict(), str(d / "model.safetensors"))
    cap = LlavaCaptioner.load(tmp_path, llama_cfg=LCFG, vision_cfg=VCFG,
                              tokenizer=FakeTokenizer())
    rng = np.random.default_rng(3)
    a = Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
    b = Image.fromarray(rng.integers(0, 255, (40, 40, 3), dtype=np.uint8))
    prompt = "x <image> y <image> z"
    ids = tokenize_with_image(
        prompt, lambda s: FakeTokenizer().encode(s))
    p1, p2 = np.where(ids == -200)[0]
    ab = np.asarray(cap.embed_mm(prompt, [a, b]))
    ba = np.asarray(cap.embed_mm(prompt, [b, a]))
    assert ab.shape == ba.shape
    t = (ab.shape[0] - (len(ids) - 2)) // 2   # tokens per image stream
    s1, s2 = int(p1), int(p2) - 1 + t          # span starts in the spliced seq
    np.testing.assert_allclose(ab[s1:s1 + t], ba[s2:s2 + t], atol=1e-6)
    np.testing.assert_allclose(ab[s2:s2 + t], ba[s1:s1 + t], atol=1e-6)
    assert not np.allclose(ab[s1:s1 + t], ab[s2:s2 + t])
    # text segments identical either way
    np.testing.assert_allclose(ab[:s1], ba[:s1], atol=1e-6)
    np.testing.assert_allclose(ab[s1 + t:s2], ba[s1 + t:s2], atol=1e-6)
    np.testing.assert_allclose(ab[s2 + t:], ba[s2 + t:], atol=1e-6)
