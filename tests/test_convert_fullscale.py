"""Full-shape converter validation (round-2 review item #3).

Tiny-config oracle tests can hide naming/shape bugs that only appear at the
real checkpoint scale (e.g. a missed block index past the tiny depth, a
channel-mult-dependent skip connection). Here every converter runs over the
COMPLETE state_dict key set of the reference torch model instantiated at
production scale (meta device -> zero tensors, so conversion is view-based
and costs no real memory), and the result must match our Flax model's
jax.eval_shape init tree key-for-key and shape-for-shape, with total
parameter-count equality against the torch side (so nothing is silently
dropped). SR3 and the VAE additionally get a full-scale random-weight
forward parity spot-check.

Scales: SR3 from configs/sr_sr3.json:41-57; SDXL UNet/GLVControl/VAE from
model_configs/juggernautXL.yaml:21-125; CLIP-L (HF SDXL embedder 0); bigG
key set synthesized from open_clip ViT-bigG-14 naming (open_clip is not
installed in this environment); LLaVA = llama3-8B + ViT-L/336 HF naming.
"""

import numpy as np
import pytest

import ref_oracle

pytestmark = pytest.mark.skipif(not ref_oracle.available(),
                                reason="reference repo not mounted")
if ref_oracle.available():
    ref_oracle.install()

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import jax.tree_util as tu  # noqa: E402

from rsvldm_tpu.models.sr3 import SR3UNet, SR3UNetConfig  # noqa: E402
from rsvldm_tpu.models.sdxl import (ControlledUNet, GLVControl,  # noqa: E402
                                    SDXLUNetConfig)
from rsvldm_tpu.models.text import (CLIP_L_CONFIG,  # noqa: E402
                                    OPENCLIP_BIGG_CONFIG, CLIPTextTransformer)
from rsvldm_tpu.models.vae import AutoencoderKL, SDXL_VAE_CONFIG  # noqa: E402
from rsvldm_tpu.models.vlm.llama import LLAMA3_8B_CONFIG, KVCache, LlamaModel  # noqa: E402
from rsvldm_tpu.models.vlm.vision import (CLIP_VIT_L_336_CONFIG,  # noqa: E402
                                          CLIPVisionTower)
from rsvldm_tpu.utils import convert, convert_hf  # noqa: E402


def _zeros_sd(module, skip=()):
    """state_dict of a meta-device module as zero tensors (calloc-backed;
    converters only transpose views so nothing materializes)."""
    return {k: torch.zeros(v.shape, dtype=torch.float32)
            for k, v in module.state_dict().items()
            if not any(s in k for s in skip)}


def _flat_shapes(tree):
    return {"/".join(str(getattr(k, "key", getattr(k, "name", k)))
                     for k in path): tuple(np.shape(v))
            for path, v in tu.tree_flatten_with_path(tree)[0]}


def _count(tree_or_sd):
    if isinstance(tree_or_sd, dict) and all(
            hasattr(v, "shape") and not isinstance(v, dict)
            for v in tree_or_sd.values()):
        return sum(int(np.prod(v.shape)) for v in tree_or_sd.values())
    return sum(int(np.prod(np.shape(v)))
               for v in tu.tree_leaves(tree_or_sd))


def _assert_tree_matches(converted, init_shapes):
    got = _flat_shapes(converted)
    want = _flat_shapes(init_shapes)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing and not extra, (
        f"missing={missing[:8]} extra={extra[:8]}")
    bad = [k for k in want if got[k] != want[k]]
    assert not bad, {k: (got[k], want[k]) for k in bad[:8]}


# ------------------------------------------------------------------- SR3

SR3_CFG = SR3UNetConfig(inner_channel=64, channel_mults=(1, 2, 4, 8, 8),
                        attn_res=(28,), res_blocks=1, image_size=224)


def _ref_sr3(device="meta"):
    from models.sr3_model.sr3_modules.unet import UNet as RefUNet
    with torch.device(device):
        return RefUNet(in_channel=6, out_channel=3, inner_channel=64,
                       norm_groups=32, channel_mults=(1, 2, 4, 8, 8),
                       attn_res=(28,), res_blocks=1, dropout=0.2,
                       image_size=224)


def test_sr3_fullscale_keys_and_shapes():
    sd = _zeros_sd(_ref_sr3())
    converted = convert.convert_sr3_unet(sd, SR3_CFG)
    init_shapes = jax.eval_shape(
        lambda: SR3UNet(SR3_CFG).init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 224, 224, 6)),
                                      jnp.ones((1, 1))))
    _assert_tree_matches(converted, init_shapes)
    assert _count(converted) == _count(sd)


def test_sr3_fullscale_forward_parity():
    """Random weights at the PRODUCTION structure (attn placement derived
    from image_size=224), evaluated on a small input for speed — the attn
    blocks still execute, at the shifted resolution, on both sides."""
    torch.manual_seed(0)
    ref = _ref_sr3(device="cpu").eval()
    for p in ref.parameters():
        p.data.normal_(0, 0.02)
    x = np.random.default_rng(0).normal(size=(1, 64, 64, 6)).astype(np.float32)
    nl = np.asarray([[0.7]], np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()),
                   torch.from_numpy(nl)).numpy().transpose(0, 2, 3, 1)
    params = convert.convert_sr3_unet(ref.state_dict(), SR3_CFG)
    got = SR3UNet(SR3_CFG).apply(params, jnp.asarray(x), jnp.asarray(nl))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


# ------------------------------------------------------------------- VAE

def _ref_vae(device="meta"):
    from sgm.models.autoencoder import AutoencoderKL as RefAE
    dd = dict(attn_type="vanilla", double_z=True, z_channels=4,
              resolution=256, in_channels=3, out_ch=3, ch=128,
              ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
              dropout=0.0)
    with torch.device(device):
        return RefAE(embed_dim=4, ddconfig=dd,
                     lossconfig={"target": "torch.nn.Identity"})


def test_vae_fullscale_keys_and_shapes():
    sd = _zeros_sd(_ref_vae())
    # the SR-v0Q overlay ships denoise_encoder.* (SR_model.py:22) — mirror
    # the encoder keys the way the real two-ckpt overlay does
    sd.update({f"denoise_encoder.{k[len('encoder.'):]}": v
               for k, v in list(sd.items()) if k.startswith("encoder.")})
    converted = convert.convert_autoencoder(sd, SDXL_VAE_CONFIG)
    vae = AutoencoderKL(SDXL_VAE_CONFIG)
    init_shapes = jax.eval_shape(
        lambda: vae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))))
    _assert_tree_matches(converted, init_shapes)
    assert _count(converted) == _count(sd)


def test_vae_fullscale_forward_parity():
    torch.manual_seed(1)
    ref = _ref_vae(device="cpu").eval()
    for p in ref.parameters():
        p.data.normal_(0, 0.02)
    sd = {k: v for k, v in ref.state_dict().items()}
    sd.update({f"denoise_encoder.{k[len('encoder.'):]}": v
               for k, v in list(sd.items()) if k.startswith("encoder.")})
    params = convert.convert_autoencoder(sd, SDXL_VAE_CONFIG)
    vae = AutoencoderKL(SDXL_VAE_CONFIG)
    x = np.random.default_rng(1).normal(size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        post = ref.encode(torch.from_numpy(x.transpose(0, 3, 1, 2).copy()))
        # our encode applies scale_factor (SR_model.py:58-62 semantics)
        want = post.mode().numpy().transpose(0, 2, 3, 1) * \
            SDXL_VAE_CONFIG.scale_factor
    got = vae.apply(params, jnp.asarray(x), method=vae.encode_with_denoise)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-4, rtol=1e-3)


# ----------------------------------------------------- SDXL UNet + control

XL_KW = dict(adm_in_channels=2816, num_classes="sequential",
             use_checkpoint=False, in_channels=4, out_channels=4,
             model_channels=320, attention_resolutions=[4, 2],
             num_res_blocks=2, channel_mult=[1, 2, 4], num_head_channels=64,
             use_spatial_transformer=True, use_linear_in_transformer=True,
             transformer_depth=[1, 2, 10], context_dim=2048,
             spatial_transformer_attn_type="softmax", legacy=False)

XL_CFG = SDXLUNetConfig()  # defaults == juggernautXL.yaml:21-64


import functools


@functools.lru_cache(maxsize=1)
def _xl_shape_trees():
    lat = jnp.zeros((1, 8, 8, 4))
    tt = jnp.zeros((1,))
    ctx = jnp.zeros((1, 7, XL_CFG.context_dim))
    yv = jnp.zeros((1, XL_CFG.adm_in_channels))
    ctrl = GLVControl(XL_CFG)
    ctrl_shapes = jax.eval_shape(
        lambda: ctrl.init(jax.random.PRNGKey(0), lat, lat, tt, ctx, yv))
    feat_shapes = jax.eval_shape(
        lambda p: ctrl.apply(p, lat, lat, tt, ctx, yv), ctrl_shapes)
    unet_shapes = jax.eval_shape(
        lambda f: ControlledUNet(XL_CFG).init(
            jax.random.PRNGKey(0), lat, tt, ctx, yv, f), feat_shapes)
    return ctrl_shapes, unet_shapes


def test_controlled_unet_fullscale_keys_and_shapes():
    from models.modules.SR_modules import LightGLVUNet
    with torch.device("meta"):
        ref = LightGLVUNet(mode="XL-base", project_type="ZeroSFT",
                           project_channel_scale=2, **XL_KW)
    sd = _zeros_sd(ref)
    converted = convert.convert_controlled_unet(sd, XL_CFG)
    _, unet_shapes = _xl_shape_trees()
    _assert_tree_matches(converted, unet_shapes)
    assert _count(converted) == _count(sd)


def test_glv_control_fullscale_keys_and_shapes():
    from models.modules.SR_modules import GLVControl as RefControl
    with torch.device("meta"):
        ref = RefControl(input_upscale=1, **XL_KW)
    sd = _zeros_sd(ref)
    converted = convert.convert_glv_control(sd, XL_CFG)
    ctrl_shapes, _ = _xl_shape_trees()
    _assert_tree_matches(converted, ctrl_shapes)
    assert _count(converted) == _count(sd)


# --------------------------------------------------------------- text towers

def test_clip_l_fullscale_keys_and_shapes():
    from transformers import CLIPTextConfig as HFTextConfig, CLIPTextModel
    hf_cfg = HFTextConfig(vocab_size=49408, hidden_size=768,
                          intermediate_size=3072, num_hidden_layers=12,
                          num_attention_heads=12, max_position_embeddings=77)
    with torch.device("meta"):
        ref = CLIPTextModel(hf_cfg)
    sd = _zeros_sd(ref, skip=("position_ids",))
    converted = convert_hf.convert_hf_clip_text(sd, CLIP_L_CONFIG)
    init_shapes = jax.eval_shape(
        lambda: CLIPTextTransformer(CLIP_L_CONFIG).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)))
    _assert_tree_matches(converted, init_shapes)
    assert _count(converted) == _count(sd)


def _bigg_synthetic_sd():
    """open_clip ViT-bigG-14 text-tower key set (open_clip is not installed;
    naming per open_clip.transformer.TextTransformer: token_embedding,
    positional_embedding, transformer.resblocks.{i}.{ln_1,attn.in_proj_*,
    attn.out_proj,ln_2,mlp.c_fc,mlp.c_proj}, ln_final, text_projection)."""
    w, layers, ff, vocab, ctx = 1280, 32, 5120, 49408, 77
    z = lambda *s: torch.zeros(*s)
    sd = {"token_embedding.weight": z(vocab, w),
          "positional_embedding": z(ctx, w),
          "ln_final.weight": z(w), "ln_final.bias": z(w),
          "text_projection": z(w, w)}
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": z(w), f"{p}.ln_1.bias": z(w),
            f"{p}.ln_2.weight": z(w), f"{p}.ln_2.bias": z(w),
            f"{p}.attn.in_proj_weight": z(3 * w, w),
            f"{p}.attn.in_proj_bias": z(3 * w),
            f"{p}.attn.out_proj.weight": z(w, w),
            f"{p}.attn.out_proj.bias": z(w),
            f"{p}.mlp.c_fc.weight": z(ff, w), f"{p}.mlp.c_fc.bias": z(ff),
            f"{p}.mlp.c_proj.weight": z(w, ff), f"{p}.mlp.c_proj.bias": z(w),
        })
    return sd


def test_bigg_fullscale_keys_and_shapes():
    sd = _bigg_synthetic_sd()
    converted = convert_hf.convert_openclip_text(sd, OPENCLIP_BIGG_CONFIG)
    init_shapes = jax.eval_shape(
        lambda: CLIPTextTransformer(OPENCLIP_BIGG_CONFIG).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32)))
    _assert_tree_matches(converted, init_shapes)
    assert _count(converted) == _count(sd)


# ------------------------------------------------------------------ LLaVA

def test_llama3_8b_fullscale_keys_and_shapes():
    from transformers import LlamaConfig as HFLlamaConfig, LlamaForCausalLM
    hf_cfg = HFLlamaConfig(vocab_size=128256, hidden_size=4096,
                           intermediate_size=14336, num_hidden_layers=32,
                           num_attention_heads=32, num_key_value_heads=8)
    with torch.device("meta"):
        ref = LlamaForCausalLM(hf_cfg)
    sd = _zeros_sd(ref, skip=("rotary_emb.inv_freq",))
    converted = convert_hf.convert_llama(sd, LLAMA3_8B_CONFIG)
    cfg = LLAMA3_8B_CONFIG
    model = LlamaModel(cfg)
    cache_shapes = jax.eval_shape(
        lambda: KVCache.init(cfg, 1, 8))
    init_shapes = jax.eval_shape(
        lambda c: model.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 4), jnp.int32), c, 0,
                             method=model.from_tokens), cache_shapes)
    _assert_tree_matches(converted, init_shapes)
    assert _count(converted) == _count(sd)


def test_clip_vit_l_336_fullscale_keys_and_shapes():
    from transformers import CLIPVisionConfig as HFVisionConfig, CLIPVisionModel
    hf_cfg = HFVisionConfig(hidden_size=1024, intermediate_size=4096,
                            num_hidden_layers=24, num_attention_heads=16,
                            image_size=336, patch_size=14)
    with torch.device("meta"):
        ref = CLIPVisionModel(hf_cfg)
    # select_layer=-2 never runs the final post_layernorm — converter skips
    sd = _zeros_sd(ref, skip=("position_ids",))
    pl_count = sum(int(np.prod(v.shape)) for k, v in sd.items()
                   if "post_layernorm" in k)
    converted = convert_hf.convert_hf_clip_vision(sd, CLIP_VIT_L_336_CONFIG)
    tower = CLIPVisionTower(CLIP_VIT_L_336_CONFIG)
    init_shapes = jax.eval_shape(
        lambda: tower.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 336, 336, 3))))
    _assert_tree_matches(converted, init_shapes)
    assert _count(converted) == _count(sd) - pl_count


def test_controlled_unet_fullscale_forward_parity():
    """Full-production-scale numerics (round-2 review weak #5): GLVControl +
    LightGLVUNet XL-base with ALL reference-table injections, random
    weights, vs our ControlledUNet with converted weights. The tiny-config
    parity test rebuilds the project modules at derived sizes; at the real
    scale the reference's hardcoded channel plan is used as-is, so this
    also cross-checks derive_project_specs against SR_modules.py:544-548.
    zero-init modules are randomized so every injection path contributes."""
    from models.modules.SR_modules import (GLVControl as TGLV,
                                           LightGLVUNet as TLight)
    torch.manual_seed(7)
    tglv = TGLV(input_upscale=1, **XL_KW)
    tunet = TLight(mode="XL-base", project_type="ZeroSFT",
                   project_channel_scale=2, **XL_KW)
    for m in (tglv, tunet):
        for p in m.parameters():
            p.data.normal_(0, 0.02)
        m.eval()

    rng = np.random.default_rng(7)
    x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    lq = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
    t = np.asarray([500.0], np.float32)
    ctx = rng.normal(size=(1, 7, 2048)).astype(np.float32) * 0.1
    y = rng.normal(size=(1, 2816)).astype(np.float32) * 0.1

    def nchw(a):
        return torch.from_numpy(a.transpose(0, 3, 1, 2).copy())

    with torch.no_grad():
        control = tglv(nchw(lq), torch.from_numpy(t), nchw(x),
                       context=torch.from_numpy(ctx), y=torch.from_numpy(y))
        ref = tunet(nchw(x), torch.from_numpy(t),
                    context=torch.from_numpy(ctx), y=torch.from_numpy(y),
                    control=[c.clone() for c in control], control_scale=0.7,
                    fbcache_mode="none").numpy()

    cparams = convert.convert_glv_control(tglv.state_dict(), XL_CFG)
    uparams = convert.convert_controlled_unet(tunet.state_dict(), XL_CFG)
    feats = GLVControl(XL_CFG).apply(
        cparams, jnp.asarray(lq), jnp.asarray(x), jnp.asarray(t),
        jnp.asarray(ctx), jnp.asarray(y))
    for o, r in zip(feats, control):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2),
                                   r.numpy(), atol=5e-3, rtol=2e-2)
    ours = ControlledUNet(XL_CFG).apply(
        uparams, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        jnp.asarray(y), feats, 0.7)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=1e-2, rtol=2e-2)


def test_bigg_fullscale_forward_parity():
    """bigG text tower full-scale numerics (round-2 review weak #5, the
    last family without a full-scale forward check). open_clip is absent,
    so the oracle is an HF CLIPTextModelWithProjection built at the bigG
    geometry (gelu, penultimate + argmax-EOT pooled @ projection — the
    exact semantics FrozenOpenCLIPEmbedder2 uses, encoders/modules.py:
    569-609); its weights are remapped to open_clip naming and fed through
    convert_openclip_text."""
    from transformers import CLIPTextConfig as HFTextConfig
    from transformers import CLIPTextModelWithProjection

    w, layers, heads, ff = 1280, 32, 20, 5120
    hf_cfg = HFTextConfig(hidden_size=w, num_hidden_layers=layers,
                          num_attention_heads=heads, intermediate_size=ff,
                          hidden_act="gelu", projection_dim=w,
                          vocab_size=49408, max_position_embeddings=77)
    torch.manual_seed(9)
    ref = CLIPTextModelWithProjection(hf_cfg).eval()
    with torch.no_grad():
        for p in ref.parameters():
            p.normal_(0, 0.02)

    hsd = ref.state_dict()
    t = lambda k: hsd[k]
    sd = {"token_embedding.weight":
          t("text_model.embeddings.token_embedding.weight"),
          "positional_embedding":
          t("text_model.embeddings.position_embedding.weight"),
          "ln_final.weight": t("text_model.final_layer_norm.weight"),
          "ln_final.bias": t("text_model.final_layer_norm.bias"),
          "text_projection": t("text_projection.weight").T.contiguous()}
    for i in range(layers):
        hp = f"text_model.encoder.layers.{i}"
        p = f"transformer.resblocks.{i}"
        sd.update({
            f"{p}.ln_1.weight": t(f"{hp}.layer_norm1.weight"),
            f"{p}.ln_1.bias": t(f"{hp}.layer_norm1.bias"),
            f"{p}.ln_2.weight": t(f"{hp}.layer_norm2.weight"),
            f"{p}.ln_2.bias": t(f"{hp}.layer_norm2.bias"),
            f"{p}.attn.in_proj_weight": torch.cat(
                [t(f"{hp}.self_attn.q_proj.weight"),
                 t(f"{hp}.self_attn.k_proj.weight"),
                 t(f"{hp}.self_attn.v_proj.weight")]),
            f"{p}.attn.in_proj_bias": torch.cat(
                [t(f"{hp}.self_attn.q_proj.bias"),
                 t(f"{hp}.self_attn.k_proj.bias"),
                 t(f"{hp}.self_attn.v_proj.bias")]),
            f"{p}.attn.out_proj.weight": t(f"{hp}.self_attn.out_proj.weight"),
            f"{p}.attn.out_proj.bias": t(f"{hp}.self_attn.out_proj.bias"),
            f"{p}.mlp.c_fc.weight": t(f"{hp}.mlp.fc1.weight"),
            f"{p}.mlp.c_fc.bias": t(f"{hp}.mlp.fc1.bias"),
            f"{p}.mlp.c_proj.weight": t(f"{hp}.mlp.fc2.weight"),
            f"{p}.mlp.c_proj.bias": t(f"{hp}.mlp.fc2.bias"),
        })

    toks = np.zeros((1, 77), np.int32)
    toks[0, 0] = 49406
    toks[0, 1:6] = [320, 1125, 539, 320, 2368]
    toks[0, 6] = 49407
    with torch.no_grad():
        out = ref(torch.tensor(toks.astype(np.int64)),
                  output_hidden_states=True)
    want_pen = out.hidden_states[-2].numpy()
    want_pooled = out.text_embeds.numpy()

    params = convert_hf.convert_openclip_text(sd, OPENCLIP_BIGG_CONFIG)
    got = CLIPTextTransformer(OPENCLIP_BIGG_CONFIG).apply(
        params, jnp.asarray(toks))
    np.testing.assert_allclose(np.asarray(got["penultimate"]), want_pen,
                               atol=2e-3, rtol=1e-2)
    np.testing.assert_allclose(np.asarray(got["pooled"]), want_pooled,
                               atol=2e-3, rtol=1e-2)
