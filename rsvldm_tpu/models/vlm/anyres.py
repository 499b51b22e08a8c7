"""AnyRes image preprocessing + feature reassembly (host-side NumPy).

Parity target: /root/reference llava/mm_utils.py —
select_best_resolution (:121-151), resize_and_pad_image (:154-190),
divide_to_patches (:193-212), get_anyres_image_grid_shape (:215-242),
process_anyres_image (:245-295) — and the spatial_unpad feature reassembly
of llava/model/llava_arch.py:355-417 (grid view, unpad, image_newline
column, base-feature concat).

These run once per image on the host (dynamic shapes); the vision tower runs
jitted on the fixed [N,336,336,3] patch batch.
"""

from __future__ import annotations

import math

import numpy as np

try:
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None

# llama3-llava-next-8b grid pinpoints (2x2 grid family at 336)
DEFAULT_GRID_PINPOINTS = [(336, 672), (672, 336), (672, 672),
                          (1008, 336), (336, 1008)]


def grid_pinpoints_for(patch_size: int):
    """The default pinpoint family rescaled to a different tower size
    (used by tiny test configs)."""
    s = patch_size / 336
    return [(int(w * s), int(h * s)) for w, h in DEFAULT_GRID_PINPOINTS]


def select_best_resolution(original_size, possible_resolutions):
    """Pick the candidate (w, h) maximizing effective resolution then
    minimizing wasted area (mm_utils.py:121-151)."""
    ow, oh = original_size
    best_fit = None
    max_effective = 0
    min_wasted = float("inf")
    for (w, h) in possible_resolutions:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        effective = min(dw * dh, ow * oh)
        wasted = w * h - effective
        if effective > max_effective or (effective == max_effective
                                         and wasted < min_wasted):
            max_effective = effective
            min_wasted = wasted
            best_fit = (w, h)
    return best_fit


def resize_and_pad_image(image, target):
    """Aspect-preserving resize then center-pad to target (w, h)
    (mm_utils.py:154-190)."""
    ow, oh = image.size
    tw, th = target
    scale_w, scale_h = tw / ow, th / oh
    if scale_w < scale_h:
        nw, nh = tw, min(math.ceil(oh * scale_w), th)
    else:
        nh, nw = th, min(math.ceil(ow * scale_h), tw)
    resized = image.resize((nw, nh), Image.BICUBIC)
    out = Image.new("RGB", (tw, th), (0, 0, 0))
    out.paste(resized, ((tw - nw) // 2, (th - nh) // 2))
    return out


def divide_to_patches(image, patch_size):
    """Row-major patch_size x patch_size crops (mm_utils.py:193-212)."""
    patches = []
    w, h = image.size
    for i in range(0, h, patch_size):
        for j in range(0, w, patch_size):
            patches.append(image.crop((j, i, j + patch_size, i + patch_size)))
    return patches


def get_anyres_image_grid_shape(image_size, grid_pinpoints, patch_size):
    """(n_patch_w, n_patch_h) for the chosen resolution (mm_utils.py:215-242)."""
    w, h = select_best_resolution(image_size, grid_pinpoints)
    return w // patch_size, h // patch_size


def process_anyres_image(image, patch_size: int = 336,
                         grid_pinpoints=DEFAULT_GRID_PINPOINTS) -> np.ndarray:
    """PIL -> [1 + n_patches, S, S, 3] float32 in [0,1].

    Entry 0 is the square-resized base image; entries 1.. are the anyres grid
    tiles (mm_utils.py:245-295). CLIP normalization is applied later on
    device (vision.normalize_pixels)."""
    best = select_best_resolution(image.size, grid_pinpoints)
    padded = resize_and_pad_image(image, best)
    patches = divide_to_patches(padded, patch_size)
    base = image.resize((patch_size, patch_size), Image.BICUBIC)
    stack = [base] + patches
    arr = np.stack([np.asarray(p.convert("RGB"), np.float32) / 255.0
                    for p in stack])
    return arr


def unpad_feature(feature: np.ndarray, original_size) -> np.ndarray:
    """Remove the letterbox padding from a [H, W, C] feature map
    (llava_arch unpad_image semantics)."""
    ow, oh = original_size
    h, w = feature.shape[:2]
    ratio_o = ow / oh
    ratio_f = w / h
    if ratio_o > ratio_f:
        scale = w / ow
        nh = int(oh * scale)
        pad = (h - nh) // 2
        return feature[pad:h - pad, :, :]
    else:
        scale = h / oh
        nw = int(ow * scale)
        pad = (w - nw) // 2
        return feature[:, pad:w - pad, :]


def assemble_spatial_unpad(features: np.ndarray, image_size,
                           image_newline: np.ndarray,
                           grid_pinpoints=DEFAULT_GRID_PINPOINTS,
                           patch_size: int = 336,
                           max_num_patches: int | None = None) -> np.ndarray:
    """[1+n, 576, C] projected features -> [T, C] token stream.

    spatial_unpad: grid tiles -> (nph*24, npw*24, C) map -> unpad to the
    original aspect -> append the learned image_newline column -> flatten,
    prepended with the 576 base tokens (llava_arch.py:355-417).

    max_num_patches enables the 'anyres_max_N' variant: when the unpadded
    map exceeds N patch-areas, it is bilinearly downscaled by
    sqrt(h*w / (N * side^2)) before the newline append (llava_arch.py:
    385-397)."""
    side = int(math.sqrt(features.shape[1]))
    c = features.shape[-1]
    base = features[0]
    tiles = features[1:]
    npw, nph = get_anyres_image_grid_shape(image_size, grid_pinpoints, patch_size)
    grid = tiles.reshape(nph, npw, side, side, c)
    grid = grid.transpose(0, 2, 1, 3, 4).reshape(nph * side, npw * side, c)
    grid = unpad_feature(grid, image_size)
    if max_num_patches is not None:
        h, w = grid.shape[:2]
        times = math.sqrt(h * w / (max_num_patches * side ** 2))
        if times > 1.1:
            import jax
            import jax.numpy as jnp
            nh, nw = int(h // times), int(w // times)
            grid = np.asarray(jax.image.resize(
                jnp.asarray(grid), (nh, nw, c), method="linear"))
    newline = np.broadcast_to(image_newline, (grid.shape[0], 1, c))
    grid = np.concatenate([grid, newline], axis=1)
    return np.concatenate([base, grid.reshape(-1, c)], axis=0)


def expand2square(pil_img, background_color):
    """Pad a PIL image to square with the given fill, centered — the "pad"
    image_aspect_ratio mode (llava/mm_utils.py:302-313, train.py:1127-1141)."""
    from PIL import Image
    width, height = pil_img.size
    if width == height:
        return pil_img
    if width > height:
        result = Image.new(pil_img.mode, (width, width), background_color)
        result.paste(pil_img, (0, (width - height) // 2))
        return result
    result = Image.new(pil_img.mode, (height, height), background_color)
    result.paste(pil_img, ((height - width) // 2, 0))
    return result
