"""Misc parity: colorfix wavelet/adain and tensor2img vs the reference."""

import numpy as np
import pytest

import ref_oracle

pytestmark = pytest.mark.skipif(not ref_oracle.available(),
                                reason="reference repo not mounted")
if ref_oracle.available():
    ref_oracle.install()

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from rsvldm_tpu.ops import colorfix  # noqa: E402


def _nchw(x):
    return torch.from_numpy(x.transpose(0, 3, 1, 2).copy())


def test_wavelet_reconstruction_parity():
    from utils.colorfix import wavelet_reconstruction as ref_fn
    rng = np.random.default_rng(0)
    content = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    style = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = ref_fn(_nchw(content), _nchw(style)).numpy()
    ours = colorfix.wavelet_reconstruction(jnp.asarray(content),
                                           jnp.asarray(style))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=1e-4, rtol=1e-4)


def test_adain_parity():
    from utils.colorfix import adaptive_instance_normalization as ref_fn
    rng = np.random.default_rng(1)
    content = rng.normal(2.0, 1.5, size=(1, 32, 32, 3)).astype(np.float32)
    style = rng.normal(-1.0, 0.4, size=(1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = ref_fn(_nchw(content), _nchw(style)).numpy()
    ours = colorfix.adaptive_instance_normalization(jnp.asarray(content),
                                                    jnp.asarray(style))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=1e-4, rtol=1e-3)


def test_tensor2img_parity():
    from utils.tensor2img import tensor2img as ref_fn
    from rsvldm_tpu.ops.image import to_uint8
    rng = np.random.default_rng(2)
    x = rng.uniform(-1.2, 1.2, size=(3, 16, 16)).astype(np.float32)  # CHW
    ref = ref_fn(torch.from_numpy(x), min_max=(-1, 1))
    ours = to_uint8(x.transpose(1, 2, 0))
    np.testing.assert_array_equal(ours, ref)
