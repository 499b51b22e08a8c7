"""Quality metrics: PSNR / SSIM / CLIP-IQA / SMS (+ LPIPS gate).

Parity target: /root/reference models/SR_model.py calc_metrics (:158-169,
torchmetrics PSNR/SSIM + LPIPS-VGG) and the README benchmark metrics
(CLIP-IQA up / SMS down, README.md:30-85).

PSNR/SSIM are exact reimplementations (jitted). CLIP-IQA follows the
published formula: softmax over cosine similarities of the image embedding
against the ("Good photo.", "Bad photo.") prompt pair, using this
framework's CLIP towers (weights supplied by the caller). SMS ("semantic
mismatch score", lower is better) is computed as 1 - cosine(CLIP(SR),
CLIP(HR)) — the semantic-consistency protocol; LPIPS requires VGG weights
and is gated behind their availability.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """a/b: [...,H,W,C] in [0, data_range]."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Mean SSIM with 11x11 gaussian window (the torchmetrics default
    configuration). a/b: [N,H,W,C] in [0, data_range]."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    kern = _gaussian_kernel()
    c = a.shape[-1]
    kernel = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kernel, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)

    mu_a = filt(a)
    mu_b = filt(b)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    s_aa = filt(a * a) - mu_aa
    s_bb = filt(b * b) - mu_bb
    s_ab = filt(a * b) - mu_ab
    num = (2 * mu_ab + c1) * (2 * s_ab + c2)
    den = (mu_aa + mu_bb + c1) * (s_aa + s_bb + c2)
    return jnp.mean(num / den)


class CLIPScorer:
    """CLIP-IQA and SMS using the framework's CLIP towers.

    vision_embed(pixels[N,S,S,3] in [0,1]) -> [N, D] L2-normalized embeds;
    text_embed(token_ids)                  -> [M, D] (prompt embeds).
    """

    GOOD_BAD = ("Good photo.", "Bad photo.")

    def __init__(self, vision_embed, text_embed, tokenizer):
        self.vision_embed = vision_embed
        self.text_embed = text_embed
        self.tokenizer = tokenizer
        toks = tokenizer(list(self.GOOD_BAD), pad_id=0)
        # normalized once — the anchor is constant across scored images
        self._anchor = self._norm(self.text_embed(jnp.asarray(toks)))

    @staticmethod
    def _norm(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    def clip_iqa(self, images: jnp.ndarray, logit_scale: float = 100.0):
        """softmax(logit_scale * cos(img, [good, bad]))[good]."""
        img = self._norm(self.vision_embed(images))
        logits = logit_scale * img @ self._anchor.T
        return jax.nn.softmax(logits, axis=-1)[:, 0]

    def sms(self, sr: jnp.ndarray, hr: jnp.ndarray):
        """Semantic mismatch score: 1 - cos(CLIP(sr), CLIP(hr)); lower is
        better (README SMS column semantics)."""
        a = self._norm(self.vision_embed(sr))
        b = self._norm(self.vision_embed(hr))
        return 1.0 - jnp.sum(a * b, axis=-1)


def load_lpips(ckpt_dir: str):
    """(LPIPS model, params) when VGG16/lin weights exist under
    <ckpt_dir>/lpips/ (vgg16 torchvision state dict + LPIPS lin heads),
    else None. Conversion is cached as orbax like the other families."""
    from pathlib import Path
    from . import checkpoint as ckpt
    from .lpips import LPIPS, convert_lpips

    d = Path(ckpt_dir) / "lpips"
    cache = Path(ckpt_dir) / "jax" / "lpips"
    if cache.exists():
        return LPIPS(), ckpt.load_orbax(cache)
    vgg_p = d / "vgg16.pth"
    if not vgg_p.exists():
        return None
    vgg_sd = ckpt.load_torch_state_dict(str(vgg_p))
    lin_p = d / "lpips_vgg.pth"
    lin_sd = ckpt.load_torch_state_dict(str(lin_p)) if lin_p.exists() else None
    params = convert_lpips(vgg_sd, lin_sd)
    ckpt.save_orbax(params, cache)
    return LPIPS(), params


def calc_metrics(sr: np.ndarray, hr: np.ndarray,
                 lpips_fn=None) -> dict:
    """PSNR/SSIM (+LPIPS when a scorer is provided) on [-1,1] NHWC inputs —
    the SR_backbone calc_metrics surface."""
    sr = jnp.asarray(sr)
    hr = jnp.asarray(hr)
    if sr.shape != hr.shape:
        # TF.resize(sr, hr.shape[-2:], antialias=True) with the DEFAULT
        # interpolation — antialiased BILINEAR, not bicubic
        # (models/SR_model.py:158-169)
        sr = jax.image.resize(sr, (sr.shape[0],) + tuple(hr.shape[1:3])
                              + (sr.shape[-1],), method="linear",
                              antialias=True)
    sr01 = (sr + 1) / 2
    hr01 = (hr + 1) / 2
    out = {"PSNR": float(psnr(sr01, hr01)), "SSIM": float(ssim(sr01, hr01))}
    if lpips_fn is not None:
        out["LPIPS"] = float(jnp.mean(lpips_fn(sr, hr)))
    return out
