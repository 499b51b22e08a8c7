"""Directory-level quality evaluation: CLIP-IQA / SMS / PSNR / SSIM / LPIPS.

This makes the reference's headline quality table executable
(/root/reference/README.md:30-85 — CLIP-IQA up, SMS down, per dataset):
given a folder of SR outputs and optionally the matching HR folder, score
with the framework's own converted CLIP towers and print one JSON line.
The "CLIP-IQA/SMS within 1%" north-star (BASELINE.md) runs through here
the day real weights are present.

Asset layout: <ckpt_dir>/clip/ — a full HF CLIPModel checkpoint
(*.safetensors / pytorch_model.bin with text_model.* + vision_model.* +
both projections) + clip_vocab tokenizer files (vocab.json/merges.txt)
under <ckpt_dir>/clip_vocab/ or the clip dir itself.
"""

from __future__ import annotations

import dataclasses
import json
import logging
from pathlib import Path
from typing import Optional

import numpy as np

log = logging.getLogger("rsvldm")

IMG_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")


def _list_images(d: Path) -> list[Path]:
    return sorted(p for p in d.iterdir() if p.suffix.lower() in IMG_EXTS)


def _strip_suffixes(stem: str) -> str:
    """Map pipeline output names back to source stems
    (X_final_<i>.png -> X for ANY sample index — the pipeline writes one
    file per num_samples; sr3_X.png -> X; infer_dir.py:176-181 naming)."""
    if stem.startswith("sr3_"):
        stem = stem[len("sr3_"):]
    import re
    m = re.fullmatch(r"(.+)_final_\d+", stem)
    if m:
        return m.group(1)
    for suf in ("_final", "_sr3"):
        if stem.endswith(suf):
            return stem[: -len(suf)]
    return stem


def build_clip_scorer(ckpt_dir: str | Path, jit: bool = True):
    """CLIPScorer over the framework's converted CLIP towers, or None when
    any required asset is absent (weights, text tower, tokenizer files).
    The CLIP input size comes from the checkpoint's position embeddings.
    Images are bicubic-resized to the CLIP input square and CLIP-normalized
    (the torchmetrics CLIP-IQA protocol)."""
    import glob

    import jax
    import jax.numpy as jnp

    from ..models.text.clip import CLIPTextConfig, CLIPTextTransformer
    from ..models.vlm.vision import (CLIPVisionConfig, CLIPVisionEmbedder,
                                     normalize_pixels)
    from ..utils import convert_hf
    from ..utils.checkpoint import load_torch_state_dict
    from ..utils.metrics import CLIPScorer
    from ..utils.tokenizer import CLIPTokenizer

    d = Path(ckpt_dir) / "clip"
    if not d.is_dir():
        return None
    sd: dict = {}
    for shard in sorted(glob.glob(str(d / "*.safetensors"))) or \
            sorted(glob.glob(str(d / "pytorch_model*.bin"))):
        sd.update(load_torch_state_dict(shard))
    if not any(k.startswith("vision_model.") for k in sd):
        return None
    if not any(k.startswith("text_model.encoder.layers.") for k in sd):
        log.warning("CLIP checkpoint under %s has no text tower — "
                    "CLIP-IQA/SMS need a full CLIPModel export", d)
        return None

    # infer geometry from the checkpoint (+config.json for head counts —
    # head_dim is NOT derivable from weight shapes and is not always 64)
    hf_cfg = {}
    cfg_json = d / "config.json"
    if cfg_json.exists():
        with open(cfg_json) as f:
            hf_cfg = json.load(f)
    n_v = 1 + max(int(k.split(".")[3]) for k in sd
                  if k.startswith("vision_model.encoder.layers."))
    width = sd["vision_model.embeddings.class_embedding"].shape[0]
    patch = sd["vision_model.embeddings.patch_embedding.weight"].shape[-1]
    n_pos = sd["vision_model.embeddings.position_embedding.weight"].shape[0]
    img_size = patch * int(round((n_pos - 1) ** 0.5))
    heads = hf_cfg.get("vision_config", {}).get("num_attention_heads",
                                                width // 64)
    if heads == width // 64 and not cfg_json.exists():
        log.warning("no config.json under %s — assuming head_dim=64 for "
                    "the CLIP towers", d)
    vcfg = CLIPVisionConfig(image_size=img_size, patch_size=patch,
                            width=width, layers=n_v, heads=heads)
    proj_dim = sd["visual_projection.weight"].shape[0]
    vision = CLIPVisionEmbedder(vcfg, projection_dim=proj_dim)
    vparams = convert_hf.convert_hf_clip_embedder(sd, vcfg)

    n_t = 1 + max(int(k.split(".")[3]) for k in sd
                  if k.startswith("text_model.encoder.layers."))
    t_width = sd["text_model.embeddings.token_embedding.weight"].shape[1]
    t_proj = sd["text_projection.weight"].shape[0]
    t_heads = hf_cfg.get("text_config", {}).get("num_attention_heads",
                                                t_width // 64)
    tcfg = CLIPTextConfig(width=t_width, layers=n_t, heads=t_heads,
                          use_text_projection=True, projection_dim=t_proj)
    text = CLIPTextTransformer(tcfg)
    tparams = convert_hf.convert_hf_clip_text(sd, tcfg)

    tok_dir = Path(ckpt_dir) / "clip_vocab"
    try:
        tokenizer = CLIPTokenizer.from_dir(
            str(tok_dir if tok_dir.is_dir() else d))
    except FileNotFoundError as e:
        log.warning("CLIP tokenizer assets absent (%s) — "
                    "CLIP-IQA/SMS skipped", e)
        return None

    def tower(pixels):
        return vision.apply(vparams, normalize_pixels(pixels))

    if jit:
        tower = jax.jit(tower)

    def vision_embed(images01):
        """[N,H,W,3] in [0,1] -> [N, proj] CLIP image embeds. The resize to
        the CLIP square runs on HOST (torch-interpolate bicubic, matching
        the torchmetrics protocol) so the jitted ViT compiles ONCE at the
        fixed [N, img, img, 3] signature instead of per source resolution
        (each recompile costs minutes through the remote relay)."""
        from ..ops.image import resize_bicubic_torch
        x = resize_bicubic_torch(np.asarray(images01), (img_size, img_size))
        return tower(jnp.asarray(x))

    def text_embed(tokens):
        return text.apply(tparams, tokens)["pooled"]

    if jit:
        text_embed = jax.jit(text_embed)
    return CLIPScorer(vision_embed, text_embed, tokenizer)


def evaluate_dir(sr_dir: str | Path, hr_dir: str | Path | None = None,
                 ckpt_dir: str | Path | None = None,
                 scorer=None, lpips=None) -> dict:
    """Score every image in sr_dir; pair with hr_dir by stripped stem for
    the full-reference metrics. Returns the aggregate dict (means) plus
    per-image records under 'images'."""
    import jax.numpy as jnp
    from PIL import Image

    from ..utils import metrics as M

    sr_dir = Path(sr_dir)
    srs = _list_images(sr_dir)
    if not srs:
        raise FileNotFoundError(f"no images under {sr_dir}")
    hr_by_stem = {}
    if hr_dir is not None:
        for p in _list_images(Path(hr_dir)):
            hr_by_stem[p.stem] = p

    if scorer is None and ckpt_dir is not None:
        scorer = build_clip_scorer(ckpt_dir)
        if scorer is None:
            log.warning("CLIP assets absent under %s/clip — "
                        "CLIP-IQA/SMS skipped", ckpt_dir)
    if lpips is None and ckpt_dir is not None:
        lp = M.load_lpips(str(ckpt_dir))
        if lp is not None:
            model, params = lp
            lpips = lambda a, b: model.apply(params, a, b)

    per_image = []
    for p in srs:
        sr = np.asarray(Image.open(p).convert("RGB"), np.float32) / 255.0
        rec: dict = {"image": p.name}
        hr_p = hr_by_stem.get(_strip_suffixes(p.stem))
        if scorer is not None:
            rec["CLIP-IQA"] = float(scorer.clip_iqa(jnp.asarray(sr)[None])[0])
        if hr_p is not None:
            hr = np.asarray(Image.open(hr_p).convert("RGB"),
                            np.float32) / 255.0
            sr_m = sr
            if sr.shape != hr.shape:  # compare at HR grid (README protocol,
                # torch-bicubic like Tensor2PIL — NOT the antialiased kernel)
                from ..ops.image import resize_bicubic_torch
                sr_m = resize_bicubic_torch(sr[None], hr.shape[:2])[0]
            rec["PSNR"] = float(M.psnr(jnp.asarray(sr_m), jnp.asarray(hr)))
            rec["SSIM"] = float(M.ssim(jnp.asarray(sr_m)[None],
                                       jnp.asarray(hr)[None]))
            if scorer is not None:
                rec["SMS"] = float(scorer.sms(jnp.asarray(sr)[None],
                                              jnp.asarray(hr)[None])[0])
            if lpips is not None:
                rec["LPIPS"] = float(np.mean(np.asarray(
                    lpips(jnp.asarray(sr_m * 2 - 1)[None],
                          jnp.asarray(hr * 2 - 1)[None]))))
        per_image.append(rec)

    agg: dict = {"num_images": len(per_image)}
    for key in ("CLIP-IQA", "SMS", "PSNR", "SSIM", "LPIPS"):
        vals = [r[key] for r in per_image if key in r]
        if vals:
            agg[key] = float(np.mean(vals))
    agg["images"] = per_image
    return agg


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(
        description="Quality harness: CLIP-IQA/SMS/PSNR/SSIM/LPIPS over a "
                    "folder of SR outputs (README.md:30-85 metrics).")
    ap.add_argument("--sr_dir", required=True)
    ap.add_argument("--hr_dir", default=None)
    ap.add_argument("--ckpt_dir", default="./CKPT_PTH")
    ap.add_argument("--out", default=None, help="write JSON here too")
    args = ap.parse_args(argv)

    res = evaluate_dir(args.sr_dir, args.hr_dir, args.ckpt_dir)
    line = json.dumps({k: v for k, v in res.items() if k != "images"})
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)
    return res
