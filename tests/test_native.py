"""Native resampler vs PIL bicubic (same Keys a=-0.5 antialiased filter)."""

import numpy as np
import pytest
from PIL import Image

from rsvldm_tpu import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no toolchain)")


@pytest.mark.parametrize("src_size,dst_size", [
    ((64, 80), (128, 160)),   # upscale
    ((128, 96), (32, 24)),    # antialiased downscale
    ((50, 50), (224, 224)),   # SR3 LR conditioning path
])
def test_matches_pil_float_exact(src_size, dst_size):
    """Per-channel PIL 'F'-mode resize is the exact float reference; the
    native path must match it to float precision. (PIL's uint8 path rounds
    the horizontal pass to 8 bits — ours is strictly more accurate.)"""
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (*src_size, 3), dtype=np.uint8)
    ref = np.stack([
        np.asarray(Image.fromarray(img[:, :, c].astype(np.float32), mode="F")
                   .resize(dst_size[::-1], Image.BICUBIC))
        for c in range(3)], axis=-1)
    out = native.resize_bicubic_u8(img, *dst_size, normalize="none")
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_close_to_pil_uint8():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
    ref = np.asarray(Image.fromarray(img).resize((160, 128), Image.BICUBIC),
                     np.float32)
    out = native.resize_bicubic_u8(img, 128, 160, normalize="none")
    assert np.abs(out - ref).mean() < 1.0  # PIL 8-bit intermediate rounding


def test_normalize_modes():
    img = np.array([[[0, 128, 255]]], dtype=np.uint8)
    pm1 = native.resize_bicubic_u8(img, 1, 1, normalize="pm1")
    np.testing.assert_allclose(pm1[0, 0], [-1.0, 128 / 255 * 2 - 1, 1.0],
                               atol=1e-6)
    unit = native.resize_bicubic_u8(img, 1, 1, normalize="unit")
    np.testing.assert_allclose(unit[0, 0], [0.0, 128 / 255, 1.0], atol=1e-6)


def test_normalize_u8():
    x = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    out = native.normalize_u8(x)
    np.testing.assert_allclose(out, x / 255.0 * 2 - 1, atol=1e-6)


def test_speed_vs_pil():
    """The native path should not be slower than PIL for the SR3 preprocessing
    shape (this is informational — asserts only a generous bound)."""
    import time
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (512, 512, 3), dtype=np.uint8)
    pil_img = Image.fromarray(img)
    t0 = time.perf_counter()
    for _ in range(5):
        pil_img.resize((1024, 1024), Image.BICUBIC)
    t_pil = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        native.resize_bicubic_u8(img, 1024, 1024, normalize="pm1")
    t_nat = time.perf_counter() - t0
    assert t_nat < t_pil * 10  # sanity only; fused normalize is the win
