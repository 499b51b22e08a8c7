"""Parity vs HF transformers / hand-built torch oracles for the text and
VLM towers (tiny random-weight configs; validates architecture + converters)."""

import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from rsvldm_tpu.models.text.clip import CLIPTextConfig, CLIPTextTransformer  # noqa: E402
from rsvldm_tpu.models.vlm.vision import CLIPVisionConfig, CLIPVisionTower  # noqa: E402
from rsvldm_tpu.models.vlm.llama import LlamaConfig, LlamaModel, KVCache  # noqa: E402
from rsvldm_tpu.models.vlm.projector import MLPProjector  # noqa: E402
from rsvldm_tpu.utils import convert_hf  # noqa: E402


def test_hf_clip_text_parity():
    from transformers import CLIPTextConfig as HFCfg, CLIPTextModel
    hf_cfg = HFCfg(vocab_size=99, hidden_size=32, intermediate_size=128,
                   num_hidden_layers=3, num_attention_heads=4,
                   max_position_embeddings=77, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = CLIPTextModel(hf_cfg).eval()

    cfg = CLIPTextConfig(vocab_size=99, width=32, layers=3, heads=4,
                         quick_gelu=True)
    params = convert_hf.convert_hf_clip_text(hf.state_dict(), cfg)

    toks = np.array([[49 % 99, 3, 7, 98] + [0] * 73], dtype=np.int64)
    with torch.no_grad():
        out = hf(input_ids=torch.from_numpy(toks), output_hidden_states=True)
    ours = CLIPTextTransformer(cfg).apply(params, jnp.asarray(toks))

    # hidden_states[layers-1] == penultimate
    np.testing.assert_allclose(np.asarray(ours["penultimate"]),
                               out.hidden_states[2].numpy(), atol=2e-4,
                               rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["last"]),
                               out.hidden_states[3].numpy(), atol=2e-4,
                               rtol=1e-3)


def test_openclip_text_parity():
    """Oracle: hand-built torch module with open_clip's exact structure
    (pre-LN resblocks with nn.MultiheadAttention, causal mask, ln_final,
    text_projection + argmax pooling)."""
    W, L, H, V, CTX = 32, 2, 4, 60, 16
    torch.manual_seed(1)

    class Block(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = torch.nn.LayerNorm(W)
            self.attn = torch.nn.MultiheadAttention(W, H)
            self.ln_2 = torch.nn.LayerNorm(W)
            self.mlp = torch.nn.Sequential()
            self.mlp.add_module("c_fc", torch.nn.Linear(W, W * 4))
            self.mlp.add_module("gelu", torch.nn.GELU())
            self.mlp.add_module("c_proj", torch.nn.Linear(W * 4, W))

        def forward(self, x, attn_mask):  # x: [S, N, W]
            y = self.ln_1(x)
            y = self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
            x = x + y
            x = x + self.mlp(self.ln_2(x))
            return x

    class Tower(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.token_embedding = torch.nn.Embedding(V, W)
            self.positional_embedding = torch.nn.Parameter(torch.randn(CTX, W) * 0.01)
            self.transformer = torch.nn.Module()
            self.transformer.resblocks = torch.nn.ModuleList(
                [Block() for _ in range(L)])
            self.ln_final = torch.nn.LayerNorm(W)
            self.text_projection = torch.nn.Parameter(torch.randn(W, W) * 0.02)

        def forward(self, toks):
            mask = torch.full((CTX, CTX), float("-inf")).triu(1)
            x = self.token_embedding(toks) + self.positional_embedding
            x = x.permute(1, 0, 2)
            pen = None
            for i, r in enumerate(self.transformer.resblocks):
                if i == L - 1:
                    pen = x.permute(1, 0, 2)
                x = r(x, mask)
            last = x.permute(1, 0, 2)
            o = self.ln_final(last)
            pooled = o[torch.arange(o.shape[0]), toks.argmax(dim=-1)] \
                @ self.text_projection
            return pen, last, pooled

    tower = Tower().eval()
    toks = np.array([[1, 5, 9, 59] + [0] * (CTX - 4)], dtype=np.int64)
    with torch.no_grad():
        pen, last, pooled = tower(torch.from_numpy(toks))

    cfg = CLIPTextConfig(vocab_size=V, width=W, layers=L, heads=H,
                         context_length=CTX, quick_gelu=False,
                         use_text_projection=True)
    params = convert_hf.convert_openclip_text(tower.state_dict(), cfg)
    ours = CLIPTextTransformer(cfg).apply(params, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(ours["penultimate"]), pen.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours["pooled"]), pooled.numpy(),
                               atol=2e-4, rtol=1e-3)


def test_hf_clip_vision_parity():
    from transformers import CLIPVisionConfig as HFCfg, CLIPVisionModel
    hf_cfg = HFCfg(hidden_size=32, intermediate_size=128, num_hidden_layers=3,
                   num_attention_heads=4, image_size=28, patch_size=14,
                   hidden_act="quick_gelu")
    torch.manual_seed(2)
    hf = CLIPVisionModel(hf_cfg).eval()

    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=3,
                           heads=4, select_layer=-2)
    params = convert_hf.convert_hf_clip_vision(hf.state_dict(), cfg)

    px = np.random.default_rng(0).normal(size=(1, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                 output_hidden_states=True)
    ours = CLIPVisionTower(cfg).apply(params, jnp.asarray(px))
    # select_layer=-2 with CLS dropped == hidden_states[-2][:, 1:]
    ref = out.hidden_states[-2][:, 1:].numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_llama_parity():
    from transformers import LlamaConfig as HFCfg, LlamaForCausalLM
    hf_cfg = HFCfg(vocab_size=120, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=4,
                   num_key_value_heads=2, rope_theta=500000.0,
                   rms_norm_eps=1e-5, attn_implementation="eager",
                   tie_word_embeddings=False)
    torch.manual_seed(3)
    hf = LlamaForCausalLM(hf_cfg).eval()

    cfg = LlamaConfig(vocab_size=120, dim=32, layers=2, heads=4, kv_heads=2,
                      ffn_dim=64)
    params = convert_hf.convert_llama(hf.state_dict(), cfg)

    toks = np.array([[5, 17, 99, 3, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(toks)).logits.numpy()

    model = LlamaModel(cfg)
    cache = KVCache.init(cfg, 1, 8)
    logits, _ = model.apply(params, jnp.asarray(toks), cache, 0,
                            method=model.from_tokens)
    np.testing.assert_allclose(np.asarray(logits), ref, atol=5e-4, rtol=1e-2)


def test_mm_projector_parity():
    torch.manual_seed(4)
    tp = torch.nn.Sequential(torch.nn.Linear(16, 24), torch.nn.GELU(),
                             torch.nn.Linear(24, 24)).eval()
    sd = {f"model.mm_projector.{k}": v for k, v in tp.state_dict().items()}
    params = convert_hf.convert_mm_projector(sd)
    x = np.random.default_rng(1).normal(size=(2, 5, 16)).astype(np.float32)
    with torch.no_grad():
        ref = tp(torch.from_numpy(x)).numpy()
    ours = MLPProjector(out_dim=24).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5, rtol=1e-4)


def test_merge_lora():
    base = np.eye(4, dtype=np.float32)
    a = np.ones((2, 4), np.float32)
    b = np.ones((4, 2), np.float32) * 0.5
    merged = convert_hf.merge_lora(base, a, b, scale=2.0)
    np.testing.assert_allclose(merged, base + 2.0)


def test_siglip_vision_parity():
    from transformers import SiglipVisionConfig as HFCfg, SiglipVisionModel
    from rsvldm_tpu.models.vlm.siglip import (SigLIPVisionConfig,
                                              SigLIPVisionTower,
                                              convert_hf_siglip_vision)
    hf_cfg = HFCfg(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
                   num_attention_heads=4, image_size=28, patch_size=14,
                   hidden_act="gelu_pytorch_tanh")
    torch.manual_seed(5)
    hf = SiglipVisionModel(hf_cfg).eval()
    cfg = SigLIPVisionConfig(image_size=28, patch_size=14, width=32, layers=3,
                             heads=4, mlp_dim=64, select_layer=-2)
    params = convert_hf_siglip_vision(hf.state_dict(), cfg)
    px = np.random.default_rng(3).normal(size=(1, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
                 output_hidden_states=True)
    ours = SigLIPVisionTower(cfg).apply(params, jnp.asarray(px))
    ref = out.hidden_states[-2].numpy()  # no CLS token in SigLIP
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4, rtol=1e-3)
