"""Dormant sgm embedders: T5 (HF oracle), Class/SpatialRescaler/LowScale/
Gaussian/Image embedders."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rsvldm_tpu.models.text.embedders import (ClassEmbedder, ImageEmbedder,
                                              LowScaleEncoder,
                                              SpatialRescaler,
                                              gaussian_encode)
from rsvldm_tpu.models.text.t5 import T5Config, T5Encoder


def test_t5_encoder_hf_parity():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config, T5EncoderModel
    from rsvldm_tpu.utils.convert_hf import convert_t5_encoder

    hf_cfg = HFT5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=37,
                        num_layers=2, num_heads=4,
                        relative_attention_num_buckets=8,
                        relative_attention_max_distance=16,
                        feed_forward_proj="gated-gelu", dropout_rate=0.0)
    torch.manual_seed(0)
    ref = T5EncoderModel(hf_cfg).eval()
    toks = np.array([[5, 17, 99, 42, 7, 1, 0, 3]], np.int64)
    with torch.no_grad():
        want = ref(input_ids=torch.from_numpy(toks)).last_hidden_state.numpy()

    cfg = T5Config(vocab_size=100, d_model=32, d_kv=8, d_ff=37, layers=2,
                   heads=4, rel_buckets=8, rel_max_distance=16)
    params = convert_t5_encoder(ref.state_dict(), cfg)
    got = T5Encoder(cfg).apply(params, jnp.asarray(toks.astype(np.int32)))
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_t5_encoder_relu_variant():
    torch = pytest.importorskip("torch")
    from transformers import T5Config as HFT5Config, T5EncoderModel
    from rsvldm_tpu.utils.convert_hf import convert_t5_encoder
    hf_cfg = HFT5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=24,
                        num_layers=2, num_heads=4,
                        relative_attention_num_buckets=8,
                        relative_attention_max_distance=16,
                        feed_forward_proj="relu", dropout_rate=0.0)
    torch.manual_seed(1)
    ref = T5EncoderModel(hf_cfg).eval()
    toks = np.array([[1, 2, 3, 4, 5]], np.int64)
    with torch.no_grad():
        want = ref(input_ids=torch.from_numpy(toks)).last_hidden_state.numpy()
    cfg = T5Config(vocab_size=64, d_model=16, d_kv=4, d_ff=24, layers=2,
                   heads=4, rel_buckets=8, rel_max_distance=16,
                   gated_ff=False)
    params = convert_t5_encoder(ref.state_dict(), cfg)
    got = T5Encoder(cfg).apply(params, jnp.asarray(toks.astype(np.int32)))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_class_embedder():
    m = ClassEmbedder(embed_dim=8, n_classes=10)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32))
    out = m.apply(p, jnp.asarray([1, 9]))
    assert out.shape == (2, 8)
    assert m.unconditional_class() == 9
    m2 = ClassEmbedder(embed_dim=8, n_classes=10, add_sequence_dim=True)
    p2 = m2.init(jax.random.PRNGKey(0), jnp.zeros((2,), jnp.int32))
    assert m2.apply(p2, jnp.asarray([1, 2])).shape == (2, 1, 8)


def test_spatial_rescaler():
    m = SpatialRescaler(n_stages=2, multiplier=0.5, method="bilinear")
    x = jnp.ones((1, 16, 16, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (1, 4, 4, 3)
    m2 = SpatialRescaler(out_channels=7)
    p2 = m2.init(jax.random.PRNGKey(0), x)
    assert m2.apply(p2, x).shape == (1, 8, 8, 7)


def test_lowscale_encoder():
    from rsvldm_tpu.diffusion.schedules import make_beta_schedule
    betas = jnp.asarray(make_beta_schedule("linear", 100, 1e-4, 2e-2))
    enc = LowScaleEncoder(encode_fn=lambda x: x[:, ::2, ::2, :1],
                          betas=betas, max_noise_level=50, out_size=4,
                          scale_factor=0.5)
    x = jnp.ones((2, 16, 16, 3))
    z, t = enc(x, jax.random.PRNGKey(0))
    assert z.shape == (2, 4, 4, 1)
    assert t.shape == (2,) and int(t.max()) < 50
    # q_sample interpolates between clean signal and noise
    clean = enc.q_sample(jnp.ones((1, 2, 2, 1)), jnp.asarray([0]),
                         jnp.zeros((1, 2, 2, 1)))
    np.testing.assert_allclose(np.asarray(clean), np.sqrt(1 - 1e-4),
                               rtol=1e-5)


def test_gaussian_encode():
    # fake encoder: moments = concat(mean=x_ch0, logvar=-inf-ish)
    def enc(x):
        mean = x[..., :2]
        logvar = jnp.full_like(mean, -30.0)
        return jnp.concatenate([mean, logvar], axis=-1)

    x = jnp.ones((1, 4, 4, 4))
    log, z = gaussian_encode(enc, x, jax.random.PRNGKey(0))
    assert z.shape == (1, 16, 2)  # flattened tokens
    np.testing.assert_allclose(np.asarray(z), 1.0, atol=1e-3)
    assert "kl_loss" in log and np.isfinite(float(log["loss"]))


def test_image_embedder():
    def vision_apply(px):
        n = px.shape[0]
        cls = jnp.mean(px, axis=(1, 2))[:, :1] * jnp.ones((n, 8))
        rest = jnp.zeros((n, 3, 8))
        return jnp.concatenate([cls[:, None], rest], axis=1)

    emb = ImageEmbedder(vision_apply=vision_apply)
    imgs = jnp.zeros((2, 4, 4, 3))
    out = emb(imgs)
    assert out.shape == (2, 8)
    # ucg zeroing
    masked = emb(imgs, ucg_mask=jnp.asarray([1, 0]))
    assert np.allclose(np.asarray(masked[1]), 0)
    rep = ImageEmbedder(vision_apply=vision_apply, repeat_to_max_len=5)
    assert rep(imgs).shape == (2, 5, 8)


def test_byt5_tokenize():
    from rsvldm_tpu.models.text.embedders import byt5_tokenize
    ids = byt5_tokenize("Ab", max_length=6)
    assert ids.shape == (1, 6)
    np.testing.assert_array_equal(np.asarray(ids[0]),
                                  [ord("A") + 3, ord("b") + 3, 1, 0, 0, 0])
    # matches HF ByT5Tokenizer when available
    try:
        from transformers import ByT5Tokenizer
        tok = ByT5Tokenizer()
        want = tok("Ab", padding="max_length", max_length=6).input_ids
        np.testing.assert_array_equal(np.asarray(ids[0]), want)
    except Exception:
        pass
