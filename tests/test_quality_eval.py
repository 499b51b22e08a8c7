"""Quality harness tests: full-CLIP embedder parity vs HF CLIPModel and the
directory evaluator (eval_dir.py surface)."""

import json
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")

tf = pytest.importorskip("transformers")


def _tiny_hf_clip():
    import torch
    from transformers import CLIPConfig, CLIPModel

    cfg = CLIPConfig(
        projection_dim=32,
        text_config={"hidden_size": 128, "num_hidden_layers": 2,
                     "num_attention_heads": 2, "intermediate_size": 512,
                     "max_position_embeddings": 77, "vocab_size": 49408},
        vision_config={"hidden_size": 128, "num_hidden_layers": 2,
                       "num_attention_heads": 2, "intermediate_size": 512,
                       "image_size": 28, "patch_size": 14},
    )
    torch.manual_seed(0)
    model = CLIPModel(cfg).eval()
    return model


def _convert(model):
    import jax.numpy as jnp

    from rsvldm_tpu.models.text.clip import (CLIPTextConfig,
                                             CLIPTextTransformer)
    from rsvldm_tpu.models.vlm.vision import (CLIPVisionConfig,
                                              CLIPVisionEmbedder)
    from rsvldm_tpu.utils import convert_hf

    sd = {k: v for k, v in model.state_dict().items()}
    vcfg = CLIPVisionConfig(image_size=28, patch_size=14, width=128,
                            layers=2, heads=2)
    vision = CLIPVisionEmbedder(vcfg, projection_dim=32)
    vparams = convert_hf.convert_hf_clip_embedder(sd, vcfg)
    tcfg = CLIPTextConfig(width=128, layers=2, heads=2,
                          use_text_projection=True, projection_dim=32)
    text = CLIPTextTransformer(tcfg)
    tparams = convert_hf.convert_hf_clip_text(sd, tcfg)
    return vision, vparams, text, tparams


def test_clip_embedder_parity_vs_hf():
    """CLIPVisionEmbedder == CLIPModel.get_image_features; pooled text
    projection == get_text_features (the CLIP-IQA scoring towers)."""
    import jax.numpy as jnp
    import torch

    model = _tiny_hf_clip()
    vision, vparams, text, tparams = _convert(model)

    rng = np.random.default_rng(0)
    px = rng.uniform(-1, 1, (2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        ref_img = model.get_image_features(
            torch.tensor(px.transpose(0, 3, 1, 2))).numpy()
    ours_img = np.asarray(vision.apply(vparams, jnp.asarray(px)))
    np.testing.assert_allclose(ours_img, ref_img, rtol=0, atol=2e-4)

    toks = np.array([[49406, 320, 1125, 49407, 0, 0],
                     [49406, 1890, 49407, 0, 0, 0]], np.int32)
    with torch.no_grad():
        ref_txt = model.get_text_features(
            torch.tensor(toks.astype(np.int64))).numpy()
    ours_txt = np.asarray(text.apply(tparams, jnp.asarray(toks))["pooled"])
    np.testing.assert_allclose(ours_txt, ref_txt, rtol=0, atol=2e-4)


def _write_assets(tmp_path, model):
    """Write the tiny CLIP ckpt + a trivially-valid tokenizer dir."""
    from safetensors.torch import save_file

    from rsvldm_tpu.utils.tokenizer import bytes_to_unicode

    d = tmp_path / "clip"
    d.mkdir(parents=True)
    sd = {k: v.contiguous() for k, v in model.state_dict().items()
          if "position_ids" not in k}
    save_file(sd, str(d / "model.safetensors"))
    base = list(bytes_to_unicode().values())
    toks = base + [v + "</w>" for v in base] + \
        ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(toks)}
    vd = tmp_path / "clip_vocab"
    vd.mkdir()
    with open(vd / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(vd / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
    return tmp_path


def test_evaluate_dir_end_to_end(tmp_path):
    from PIL import Image

    from rsvldm_tpu.eval.quality import build_clip_scorer, evaluate_dir

    model = _tiny_hf_clip()
    ckpt = _write_assets(tmp_path, model)

    sr_d = tmp_path / "out"
    hr_d = tmp_path / "hr"
    sr_d.mkdir()
    hr_d.mkdir()
    rng = np.random.default_rng(1)
    for name in ("a", "b"):
        img = rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(img).save(sr_d / f"{name}_final_0.png")
        Image.fromarray(img).save(hr_d / f"{name}.png")

    scorer = build_clip_scorer(ckpt)
    assert scorer is not None
    res = evaluate_dir(sr_d, hr_d, scorer=scorer)
    assert res["num_images"] == 2
    assert 0.0 <= res["CLIP-IQA"] <= 1.0
    # identical SR/HR pairs: perfect full-reference scores
    assert res["PSNR"] > 50
    assert res["SSIM"] > 0.99
    assert res["SMS"] < 1e-5


def test_evaluate_dir_no_clip_assets(tmp_path):
    """Without CLIP weights the harness still returns PSNR/SSIM."""
    from PIL import Image

    from rsvldm_tpu.eval.quality import evaluate_dir

    sr_d = tmp_path / "out"
    hr_d = tmp_path / "hr"
    sr_d.mkdir()
    hr_d.mkdir()
    img = np.zeros((16, 16, 3), np.uint8)
    Image.fromarray(img).save(sr_d / "x_final_0.png")
    Image.fromarray(img + 4).save(hr_d / "x.png")
    res = evaluate_dir(sr_d, hr_d, ckpt_dir=tmp_path)
    assert "PSNR" in res and "CLIP-IQA" not in res
