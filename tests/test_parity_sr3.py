"""Numerical parity vs the reference torch implementation (used as a test
oracle only — imported from /root/reference, never vendored).

Validates both the architecture reimplementation and the weight converter:
reference torch SR3 UNet with random weights -> convert -> our Flax UNet
must produce the same outputs; diffusion schedule buffers must match; a
deterministic (zero-noise) ancestral step must match.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rsvldm_tpu.models.sr3 import SR3UNet, SR3UNetConfig, SR3Diffusion  # noqa: E402
from rsvldm_tpu.models.sr3.diffusion import _p_step  # noqa: E402
from rsvldm_tpu.utils.convert import convert_sr3_unet  # noqa: E402


@pytest.fixture(scope="module")
def torch_unet():
    from models.sr3_model.sr3_modules.unet import UNet
    torch.manual_seed(0)
    net = UNet(in_channel=6, out_channel=3, inner_channel=16, norm_groups=8,
               channel_mults=(1, 2), attn_res=(8,), res_blocks=2, dropout=0,
               image_size=16)
    net.eval()
    return net


CFG = SR3UNetConfig(in_channel=6, out_channel=3, inner_channel=16,
                    norm_groups=8, channel_mults=(1, 2), attn_res=(8,),
                    res_blocks=2, image_size=16)


def test_unet_forward_parity(torch_unet):
    sd = torch_unet.state_dict()
    params = convert_sr3_unet(sd, CFG)
    model = SR3UNet(CFG)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 16, 16)).astype(np.float32)
    nl = np.array([[0.7], [0.3]], dtype=np.float32)

    with torch.no_grad():
        ref = torch_unet(torch.from_numpy(x), torch.from_numpy(nl)).numpy()

    ours = model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                       jnp.asarray(nl))
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=1e-3)


def test_schedule_buffer_parity():
    from models.sr3_model.sr3_modules.diffusion import GaussianDiffusion

    class Dummy(torch.nn.Module):
        def forward(self, x, t):
            return x[:, 3:, ...]

    gd = GaussianDiffusion(Dummy(), image_size=16, channels=3)
    gd.set_new_noise_schedule(
        dict(schedule="linear", n_timestep=50, linear_start=1e-6,
             linear_end=1e-2), device="cpu")

    diff = SR3Diffusion.from_schedule("linear", 50, 1e-6, 1e-2)
    buf = diff.buffers
    np.testing.assert_allclose(np.asarray(buf.betas), gd.betas.numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(buf.sqrt_alphas_cumprod_prev),
                               gd.sqrt_alphas_cumprod_prev, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(buf.posterior_mean_coef1),
                               gd.posterior_mean_coef1.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(buf.posterior_log_variance_clipped),
                               gd.posterior_log_variance_clipped.numpy(),
                               rtol=1e-5)


def test_ancestral_step_parity(torch_unet):
    """One deterministic p_sample step (t=0 -> zero noise) must match."""
    from models.sr3_model.sr3_modules.diffusion import GaussianDiffusion

    gd = GaussianDiffusion(torch_unet, image_size=16, channels=3)
    gd.set_new_noise_schedule(
        dict(schedule="linear", n_timestep=20, linear_start=1e-6,
             linear_end=1e-2), device="cpu")

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 3, 16, 16)).astype(np.float32)
    cond = rng.normal(size=(1, 3, 16, 16)).astype(np.float32) * 0.5

    with torch.no_grad():
        ref = gd.p_sample(torch.from_numpy(x), 0,
                          condition_x=torch.from_numpy(cond)).numpy()

    diff = SR3Diffusion.from_schedule("linear", 20, 1e-6, 1e-2)
    params = convert_sr3_unet(torch_unet.state_dict(), CFG)
    model = SR3UNet(CFG)
    apply_fn = lambda p, xx, nl: model.apply(p, xx, nl)
    ours = _p_step(diff, apply_fn, params,
                   jnp.asarray(cond.transpose(0, 2, 3, 1)),
                   jnp.asarray(x.transpose(0, 2, 3, 1)),
                   0, jax.random.PRNGKey(0))
    ours = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)
