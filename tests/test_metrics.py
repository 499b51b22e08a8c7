import jax
import jax.numpy as jnp
import numpy as np

from rsvldm_tpu.utils import metrics


def test_psnr():
    a = jnp.zeros((1, 16, 16, 3))
    assert float(metrics.psnr(a, a)) > 100
    b = a + 0.1
    np.testing.assert_allclose(float(metrics.psnr(a, b)), 20.0, atol=0.01)


def test_ssim_identity_and_noise():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    assert float(metrics.ssim(a, a)) > 0.999
    noisy = jnp.clip(a + rng.normal(0, 0.2, a.shape).astype(np.float32), 0, 1)
    s = float(metrics.ssim(a, noisy))
    assert 0.0 < s < 0.9


def test_clip_scorer():
    d = 8

    def vision_embed(images):
        return jnp.mean(images, axis=(1, 2)).repeat(d // 3 + 1, -1)[:, :d]

    def text_embed(toks):
        return jnp.stack([jnp.ones(d), -jnp.ones(d)])

    class Tok:
        def __call__(self, texts, pad_id=0):
            return np.zeros((len(texts), 77), np.int32)

    sc = metrics.CLIPScorer(vision_embed, text_embed, Tok())
    bright = jnp.ones((2, 4, 4, 3))
    iqa = sc.clip_iqa(bright)
    assert iqa.shape == (2,)
    assert float(iqa[0]) > 0.99  # aligned with the "good" anchor

    sms_same = sc.sms(bright, bright)
    np.testing.assert_allclose(np.asarray(sms_same), 0.0, atol=1e-6)
    sms_diff = sc.sms(bright, -bright)
    assert float(sms_diff[0]) > 1.0


def test_calc_metrics_resizes():
    rng = np.random.default_rng(1)
    hr = rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32)
    sr = rng.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
    out = metrics.calc_metrics(sr, hr)
    assert "PSNR" in out and "SSIM" in out
    assert np.isfinite(out["PSNR"])
