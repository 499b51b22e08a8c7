"""Host-side image preparation + jitted resize ops.

Replaces /root/reference models/util.py:132-239 (PIL2Tensor / Tensor2PIL /
Numpy2Tensor), data/dataset.py:30-42 (bicubic LR upsample + normalize) and
utils/tensor2img.py. Host code uses PIL/NumPy (one-time per image); anything
on the hot path is a jitted jax.image.resize.

Internal layout is NHWC float32 in [-1, 1].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

try:  # PIL is only needed on the host IO path.
    from PIL import Image
except ImportError:  # pragma: no cover
    Image = None


def round_to_multiple(x: float, m: int = 64) -> int:
    """Round to the nearest multiple of m (models/util.py:150-151 semantics)."""
    return int(np.round(x / float(m))) * m


_WARNED_PIL_FALLBACK = False


def pil_to_array(img, upscale: float = 1, min_size: int = 1024,
                 fix_resize: int | None = None, unit: int = 64):
    """PIL.Image -> (np.float32 [H,W,3] in [-1,1], h0, w0).

    Mirrors PIL2Tensor (models/util.py:132-156): scale by `upscale`, enforce
    `min_size` on the short side, round H/W to /64, bicubic resample.
    h0/w0 are the pre-rounding target sizes used to resize the final output
    back (Tensor2PIL).
    """
    w, h = img.size
    w *= upscale
    h *= upscale
    w0, h0 = round(w), round(h)
    if min(w, h) < min_size:
        s = min_size / min(w, h)
        w *= s
        h *= s
    if fix_resize is not None:
        s = fix_resize / min(w, h)
        w *= s
        h *= s
        w0, h0 = round(w), round(h)
    w = round_to_multiple(w, unit)
    h = round_to_multiple(h, unit)
    src = np.asarray(img.convert("RGB"))
    reason = "native.available() returned False"
    try:  # native fused resize+normalize (exact PIL-float bicubic)
        from .. import native
        if native.available():
            x = native.resize_bicubic_u8(src, h, w, normalize="none")
            x = x.round().clip(0, 255) / 255.0 * 2.0 - 1.0
            return x.astype(np.float32), h0, w0
    except Exception as e:
        reason = str(e)
    # make the path visible ONCE: native (float-exact) and PIL (8bpc
    # fixed-point) quantize ~1% of pixels one level apart, so a silent
    # fallback would hide a cross-host numerics difference
    global _WARNED_PIL_FALLBACK
    if not _WARNED_PIL_FALLBACK:
        _WARNED_PIL_FALLBACK = True
        import logging
        logging.getLogger("rsvldm").warning(
            "native resampler unavailable (%s) — PIL fallback (fixed-point "
            "bicubic; +-1 uint8 level vs native on ~1%% of pixels)", reason)
    x = img.convert("RGB").resize((w, h), Image.BICUBIC)
    x = np.asarray(x).round().clip(0, 255).astype(np.uint8)
    x = x.astype(np.float32) / 255.0 * 2.0 - 1.0
    return x, h0, w0


def array_to_pil(x: np.ndarray, h0: int | None = None, w0: int | None = None):
    """[H,W,3] float in [-1,1] -> PIL.Image, optionally bicubic-resized to (h0,w0).

    Mirrors Tensor2PIL (models/util.py:159-166).
    """
    x = np.asarray(x)
    if h0 is not None and w0 is not None and (x.shape[0] != h0 or x.shape[1] != w0):
        # torch-interpolate bicubic (A=-0.75, no antialias), NOT jax cubic —
        # the final-output downscale is visually different otherwise
        x = resize_bicubic_torch(x[None], (h0, w0))[0]
    x = (x * 127.5 + 127.5).clip(0, 255).astype(np.uint8)
    return Image.fromarray(x)


def to_uint8(x: np.ndarray, min_max=(-1.0, 1.0)) -> np.ndarray:
    """[H,W,C] float -> uint8, like utils/tensor2img.py:4-21 (3D path)."""
    x = np.asarray(x, dtype=np.float32)
    x = (np.clip(x, *min_max) - min_max[0]) / (min_max[1] - min_max[0])
    return (x * 255.0).round().astype(np.uint8)


@functools.partial(jax.jit, static_argnums=(1, 2))
def resize_bicubic(x: jnp.ndarray, size: tuple[int, int], antialias: bool = True) -> jnp.ndarray:
    """Bicubic resize of an NHWC batch to (H, W)."""
    n, _, _, c = x.shape
    return jax.image.resize(x, (n, size[0], size[1], c), method="cubic",
                            antialias=antialias)


def _torch_cubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] row-stochastic resample matrix reproducing torch
    F.interpolate(mode='bicubic', align_corners=False, antialias=False):
    cubic convolution with A=-0.75, half-pixel centers, clamped (replicate)
    border taps — NOT the Keys A=-0.5 + antialias kernel jax.image uses.
    (aten/native UpSampleBicubic2d semantics.)"""
    scale = in_size / out_size
    src = (np.arange(out_size) + 0.5) * scale - 0.5
    i0 = np.floor(src).astype(np.int64)
    frac = src - i0
    A = -0.75

    def k(x):
        x = np.abs(x)
        return np.where(
            x <= 1, ((A + 2) * x - (A + 3)) * x * x + 1,
            np.where(x < 2, (((x - 5) * x + 8) * x - 4) * A, 0.0))

    w = np.zeros((out_size, in_size), np.float64)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(i0 + tap, 0, in_size - 1)
        np.add.at(w, (np.arange(out_size), idx), k(frac - tap))
    return w.astype(np.float32)


def resize_bicubic_torch(x, size: tuple[int, int]) -> np.ndarray:
    """NHWC resize matching torch F.interpolate(..., mode='bicubic') — the
    kernel Tensor2PIL (models/util.py:159-166) resizes the final output
    with. Separable host-side matmuls in fp32 (exact vs the torch kernel;
    a device einsum would round through bf16 on the MXU)."""
    x = np.asarray(x, np.float32)
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = size
    if (h_in, w_in) == (h_out, w_out):
        return x
    wh = _torch_cubic_matrix(h_in, h_out)
    ww = _torch_cubic_matrix(w_in, w_out)
    # optimize=True routes through BLAS (~10x at 1k px; default einsum
    # loops in C without dgemm)
    y = np.einsum("oh,nhwc->nowc", wh, x, optimize=True)
    return np.einsum("pw,nowc->nopc", ww, y, optimize=True)


def degrade_image(img, down_factor: float = 1.5):
    """Bicubic down-up degradation for validation inputs
    (models/util.py:120-129)."""
    w, h = img.size
    small = img.resize((int(w / down_factor), int(h / down_factor)),
                       Image.BICUBIC)
    return small.resize((w, h), Image.BICUBIC)


def load_lr_conditioning(path: str, upscale: int):
    """Single-image Stage-1 input: bicubic-upsample x`upscale`, center-crop,
    [-1,1]. Mirrors data/dataset.py:30-42 (resize max(w,h)*scale + center crop).

    Returns np.float32 [H,W,3].
    """
    img = Image.open(path).convert("RGB")
    w, h = img.size
    target = max(w, h) * upscale
    # torchvision Resize(int) scales the SHORT side to `target` and
    # TRUNCATES the long side (int(size * long / short), no rounding);
    # center_crop offsets use int(round(diff / 2.0))
    if w < h:
        nw, nh = target, int(h * target / w)
    else:
        nh, nw = target, int(w * target / h)
    img = img.resize((nw, nh), Image.BICUBIC)
    left = int(round((nw - target) / 2.0))
    top = int(round((nh - target) / 2.0))
    img = img.crop((left, top, left + target, top + target))
    x = np.asarray(img).astype(np.float32) / 255.0
    return (x - 0.5) / 0.5
