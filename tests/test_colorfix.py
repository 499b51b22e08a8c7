import numpy as np
import jax.numpy as jnp

from rsvldm_tpu.ops import colorfix


def test_wavelet_blur_preserves_constant():
    x = jnp.ones((1, 32, 32, 3)) * 0.7
    for r in [1, 2, 4]:
        y = colorfix.wavelet_blur(x, r)
        assert y.shape == x.shape
        np.testing.assert_allclose(np.array(y), 0.7, rtol=1e-6)


def test_wavelet_decomposition_sums():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    hi, lo = colorfix.wavelet_decomposition(x)
    np.testing.assert_allclose(np.array(hi + lo), np.array(x), atol=1e-5)


def test_wavelet_reconstruction_color_transfer():
    rng = np.random.default_rng(1)
    content = jnp.asarray(rng.normal(size=(1, 64, 64, 3)).astype(np.float32))
    style = content + 0.5  # constant color shift = pure low frequency
    out = colorfix.wavelet_reconstruction(content, style)
    # output should inherit style's low-freq (mean) but content's detail
    np.testing.assert_allclose(np.array(out), np.array(style), atol=1e-4)


def test_adain_matches_moments():
    rng = np.random.default_rng(2)
    content = jnp.asarray(rng.normal(2.0, 3.0, size=(1, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.normal(-1.0, 0.5, size=(1, 32, 32, 3)).astype(np.float32))
    out = np.array(colorfix.adaptive_instance_normalization(content, style))
    for c in range(3):
        np.testing.assert_allclose(out[..., c].mean(),
                                   np.array(style)[..., c].mean(), atol=1e-2)
        np.testing.assert_allclose(out[..., c].std(),
                                   np.array(style)[..., c].std(), atol=1e-2)


def test_image_ops():
    from rsvldm_tpu.ops import image as I
    assert I.round_to_multiple(1000) == 1024
    assert I.round_to_multiple(1023.9) == 1024
    assert I.round_to_multiple(95, 64) == 64
    u8 = I.to_uint8(np.array([[[-1.0, 0.0, 1.0]]]))
    np.testing.assert_array_equal(u8, [[[0, 128, 255]]])
