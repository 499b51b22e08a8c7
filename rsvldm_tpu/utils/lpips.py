"""LPIPS perceptual metric (VGG16 backbone) in Flax.

Parity target: /root/reference sgm/modules/autoencoding/lpips/loss/lpips.py
and the SR_backbone metric (models/SR_model.py:53-55,168: lpips.LPIPS(
net='vgg')). Distance = sum_l mean_hw || w_l * (phi_l(x)^ - phi_l(y)^) ||^2
over the 5 VGG16 relu stages, with unit-normalized channel features and
learned 1x1 linear weights.

Weights: converted from the published torchvision VGG16 + LPIPS linear
heads when present under <ckpt_dir>/lpips/ (utils/checkpoint machinery);
`calc_metrics` gates on availability.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

# VGG16 feature config: conv channels per stage, maxpool between stages
VGG16_STAGES = [(64, 64), (128, 128), (256, 256, 256), (512, 512, 512),
                (512, 512, 512)]

# imagenet scaling used by LPIPS (lpips.py ScalingLayer)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


class VGG16Features(nn.Module):
    """VGG16 conv trunk returning the 5 post-ReLU stage outputs."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        for si, stage in enumerate(VGG16_STAGES):
            for ci, ch in enumerate(stage):
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{si}_{ci}")(x)
                x = nn.relu(x)
            feats.append(x)
            if si < len(VGG16_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


class LPIPS(nn.Module):
    """Full LPIPS head over VGG16Features."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        """x/y: [N,H,W,3] in [-1,1] -> [N] distances."""
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        norm_in = lambda v: (v - shift) / scale
        vgg = VGG16Features(self.dtype, name="vgg")
        fx = vgg(norm_in(x))
        fy = vgg(norm_in(y))
        total = 0.0
        for li, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, axis=-1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, axis=-1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            w = self.param(f"lin{li}", nn.initializers.ones, (d.shape[-1],))
            # learned 1x1 conv (non-negative weights in the published head)
            total = total + jnp.mean(jnp.sum(d * jnp.abs(w), axis=-1),
                                     axis=(1, 2))
        return total


def convert_lpips(vgg_sd: dict, lin_sd: dict | None = None) -> dict:
    """torchvision vgg16().features + LPIPS lin heads -> LPIPS params.

    torchvision naming: features.{0,2,5,7,10,12,14,17,19,21,24,26,28}
    (convs). LPIPS head naming: lin{i}.model.1.weight [C,1,1,1]."""
    from .convert import conv_w, t2n
    idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    p: dict = {"vgg": {}}
    it = iter(idx)
    for si, stage in enumerate(VGG16_STAGES):
        for ci, _ in enumerate(stage):
            ti = next(it)
            p["vgg"][f"conv{si}_{ci}"] = {
                "kernel": conv_w(vgg_sd[f"features.{ti}.weight"]),
                "bias": t2n(vgg_sd[f"features.{ti}.bias"])}
    for li in range(5):
        if lin_sd is not None and f"lin{li}.model.1.weight" in lin_sd:
            w = t2n(lin_sd[f"lin{li}.model.1.weight"]).reshape(-1)
        else:
            w = None
        if w is not None:
            p[f"lin{li}"] = w
    # fill missing lins with ones at aggregate channel sizes
    ch = [s[-1] for s in VGG16_STAGES]
    for li in range(5):
        if f"lin{li}" not in p:
            import numpy as np
            p[f"lin{li}"] = np.ones((ch[li],), np.float32)
    return {"params": p}
