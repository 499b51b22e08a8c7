"""Training subsystem + data package tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from rsvldm_tpu.training import (EmaState, ema_init, ema_update,
                                 standard_diffusion_loss,
                                 StandardDiffusionLossConfig,
                                 edm_sigma_sampling, discrete_sigma_sampling,
                                 lambda_warmup_cosine, SR3Trainer,
                                 SR3TrainConfig)
from rsvldm_tpu.models.sr3 import SR3UNetConfig
from rsvldm_tpu.data import prepare_triplets, LRHRDataset, augment


def test_ema_update():
    p = {"w": jnp.ones((3,))}
    s = ema_init(p)
    s = ema_update(s, {"w": jnp.zeros((3,))}, decay=0.9999)
    # warmup: decay = min(2/11, .9999) at step 1
    np.testing.assert_allclose(np.asarray(s.params["w"]), 2 / 11, rtol=1e-5)


def test_sigma_samplers():
    s = edm_sigma_sampling(jax.random.PRNGKey(0), 1000)
    assert np.all(np.asarray(s) > 0)
    # lognormal median ~ exp(-1.2)
    assert abs(float(jnp.median(jnp.log(s))) - (-1.2)) < 0.2
    d = discrete_sigma_sampling(jax.random.PRNGKey(1), 1000)
    assert float(d.min()) > 0 and float(d.max()) < 15.0


def test_standard_diffusion_loss_perfect_denoiser_zero():
    x0 = jax.random.normal(jax.random.PRNGKey(2), (4, 8, 8, 3))
    loss = standard_diffusion_loss(lambda x, s: x0, x0, jax.random.PRNGKey(3))
    assert float(loss) < 1e-10


def test_lr_schedule():
    sched = lambda_warmup_cosine(10, 0.0, 1.0, 0.1, 100)
    assert abs(float(sched(0)) - 0.1) < 1e-6
    assert abs(float(sched(10)) - 1.0) < 1e-6
    assert float(sched(100)) < 1e-6
    assert float(sched(55)) < 1.0


def test_sr3_trainer_steps(tmp_path):
    cfg = SR3UNetConfig(inner_channel=8, norm_groups=4, channel_mults=(1, 2),
                        attn_res=(), res_blocks=1, image_size=8)
    tr = SR3Trainer(cfg, SR3TrainConfig(n_timestep=10, lr=1e-3))
    hr = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3)) * 0.5
    sr = jnp.zeros_like(hr)
    l1 = tr.train_step(hr, sr, jax.random.PRNGKey(1))
    l2 = tr.train_step(hr, sr, jax.random.PRNGKey(1))
    assert np.isfinite(l1) and np.isfinite(l2)
    assert tr.step == 2
    # checkpoint round trip
    tr.save(tmp_path)
    tr2 = SR3Trainer(cfg, SR3TrainConfig(n_timestep=10, lr=1e-3))
    tr2.load(tmp_path, 2)
    assert tr2.step == 2
    a = jax.tree_util.tree_leaves(tr.params)[0]
    b = jax.tree_util.tree_leaves(tr2.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_prepare_and_lrhr_dataset(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
                        ).save(src / f"im{i}.png")
    out = tmp_path / "prepared"
    done = prepare_triplets(str(src), str(out), l_res=4, r_res=16, workers=2)
    assert len(done) == 3
    ds = LRHRDataset(str(out), 4, 16, split="val", need_lr=True, hflip=False)
    assert len(ds) == 3
    hr, sr, lr = ds[0]
    assert hr.shape == (16, 16, 3) and sr.shape == (16, 16, 3)
    assert lr.shape == (4, 4, 3)
    assert hr.min() >= -1.0 and hr.max() <= 1.0
    # batch iterator (need_lr=True -> triplets)
    b_hr, b_sr, b_lr = next(ds_iter(ds))
    assert b_hr.shape == (2, 16, 16, 3)
    assert b_lr.shape == (2, 4, 4, 3)


def ds_iter(ds):
    return ds.batches(2)


def test_augment_joint():
    a = np.arange(8, dtype=np.float32).reshape(2, 4, 1)
    b = a.copy()
    import random as _r
    r = _r.Random(1)
    for _ in range(10):
        fa, fb = augment([a, b], hflip=True, rng=r)
        np.testing.assert_array_equal(fa, fb)  # joint transform
