"""Numerical parity vs the reference sgm/SR_modules torch code (oracle)."""

import os

import numpy as np
import pytest

import ref_oracle

pytestmark = pytest.mark.skipif(not ref_oracle.available(),
                                reason="reference repo not mounted")
if ref_oracle.available():
    ref_oracle.install()

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from rsvldm_tpu.models.vae import VAEConfig, Encoder, Decoder  # noqa: E402
from rsvldm_tpu.models.sdxl import SDXLUNetConfig, UNetModel, GLVControl, ControlledUNet  # noqa: E402
from rsvldm_tpu.utils import convert  # noqa: E402

VCFG = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, z_channels=4,
                 embed_dim=4)

# tiny-but-real SDXL shape: all structural features present
UCFG = SDXLUNetConfig(model_channels=32, num_res_blocks=2,
                      attention_resolutions=(4, 2), channel_mult=(1, 2, 4),
                      num_head_channels=16, transformer_depth=(1, 2, 2),
                      context_dim=48, adm_in_channels=40)

TKW = dict(adm_in_channels=40, num_classes="sequential", use_checkpoint=False,
           in_channels=4, out_channels=4, model_channels=32,
           attention_resolutions=[4, 2], num_res_blocks=2,
           channel_mult=[1, 2, 4], num_head_channels=16,
           use_spatial_transformer=True, use_linear_in_transformer=True,
           transformer_depth=[1, 2, 2], context_dim=48,
           spatial_transformer_attn_type="softmax", legacy=False)


def _nchw(x):
    return torch.from_numpy(x.transpose(0, 3, 1, 2).copy())


def _nhwc(t):
    return jnp.asarray(t.detach().numpy().transpose(0, 2, 3, 1))


def test_vae_encoder_parity():
    from sgm.modules.diffusionmodules.model import Encoder as TEnc
    torch.manual_seed(0)
    tenc = TEnc(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                attn_resolutions=[], dropout=0.0, in_channels=3,
                resolution=32, z_channels=4, double_z=True,
                attn_type="vanilla").eval()
    x = np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = tenc(_nchw(x)).numpy()
    params = {"params": convert.convert_vae_encoder(tenc.state_dict(), VCFG)}
    ours = Encoder(VCFG).apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=3e-4, rtol=1e-3)


def test_vae_decoder_parity():
    from sgm.modules.diffusionmodules.model import Decoder as TDec
    torch.manual_seed(1)
    tdec = TDec(ch=32, out_ch=3, ch_mult=(1, 2), num_res_blocks=1,
                attn_resolutions=[], dropout=0.0, in_channels=3,
                resolution=32, z_channels=4, attn_type="vanilla").eval()
    z = np.random.default_rng(1).normal(size=(1, 16, 16, 4)).astype(np.float32)
    with torch.no_grad():
        ref = tdec(_nchw(z)).numpy()
    params = {"params": convert.convert_vae_decoder(tdec.state_dict(), VCFG)}
    ours = Decoder(VCFG).apply(params, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=3e-4, rtol=1e-3)


@pytest.fixture(scope="module")
def torch_unet():
    from sgm.modules.diffusionmodules.openaimodel import UNetModel as TUNet
    torch.manual_seed(2)
    return TUNet(**TKW).eval()


@pytest.fixture(scope="module")
def sample_inputs():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    t = np.array([10.0, 500.0], dtype=np.float32)
    ctx = rng.normal(size=(2, 7, 48)).astype(np.float32)
    y = rng.normal(size=(2, 40)).astype(np.float32)
    return x, t, ctx, y


def test_sdxl_unet_parity(torch_unet, sample_inputs):
    x, t, ctx, y = sample_inputs
    with torch.no_grad():
        ref = torch_unet(_nchw(x), torch.from_numpy(t),
                         context=torch.from_numpy(ctx),
                         y=torch.from_numpy(y)).numpy()
    params = convert.convert_sdxl_unet(torch_unet.state_dict(), UCFG)
    ours = UNetModel(UCFG).apply(params, jnp.asarray(x), jnp.asarray(t),
                                 jnp.asarray(ctx), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=1e-3, rtol=1e-2)


def test_glv_control_parity(sample_inputs):
    from models.modules.SR_modules import GLVControl as TGLV
    torch.manual_seed(3)
    tglv = TGLV(**TKW).eval()
    x, t, ctx, y = sample_inputs
    lq = np.random.default_rng(3).normal(size=(2, 16, 16, 4)).astype(np.float32)
    with torch.no_grad():
        ref_feats = tglv(_nchw(lq), torch.from_numpy(t), _nchw(x),
                         context=torch.from_numpy(ctx),
                         y=torch.from_numpy(y))
    params = convert.convert_glv_control(tglv.state_dict(), UCFG)
    ours = GLVControl(UCFG).apply(params, jnp.asarray(lq), jnp.asarray(x),
                                  jnp.asarray(t), jnp.asarray(ctx),
                                  jnp.asarray(y))
    assert len(ours) == len(ref_feats)
    for o, r in zip(ours, ref_feats):
        np.testing.assert_allclose(np.asarray(o).transpose(0, 3, 1, 2),
                                   r.numpy(), atol=1e-3, rtol=1e-2)


def test_controlled_unet_full_parity(sample_inputs):
    """The decisive end-to-end parity: GLVControl + LightGLVUNet with all 12
    project injections vs our ControlledUNet, converted weights."""
    from models.modules.SR_modules import GLVControl as TGLV, LightGLVUNet as TLight
    torch.manual_seed(4)
    tglv = TGLV(**TKW).eval()
    tunet = TLight(mode="XL-base", project_type="ZeroSFT",
                   project_channel_scale=2, **TKW).eval()
    x, t, ctx, y = sample_inputs
    lq = np.random.default_rng(4).normal(size=(2, 16, 16, 4)).astype(np.float32)

    # LightGLVUNet XL-base hardcodes the REAL channel plan; our tiny config
    # derives its own — instead verify against torch by rebuilding its
    # project modules at the derived sizes:
    from rsvldm_tpu.models.sdxl.control import derive_project_specs
    specs = derive_project_specs(UCFG)  # consumption order
    n = len(specs)
    from models.modules.SR_modules import ZeroSFT as TZeroSFT, ZeroCrossAttn as TZCA
    new_mods = []
    for c, s in enumerate(reversed(specs)):  # torch index order
        if s["kind"] == "sft":
            # label channels == control feature channels at that site; for
            # the torch module label_nc only sizes convs -> infer from spec
            label_nc = s["norm_nc"]
            new_mods.append(TZeroSFT(label_nc, s["norm_nc"],
                                     concat_channels=s["concat_nc"]))
        else:
            new_mods.append(TZCA(s["query_dim"] // 2, s["query_dim"]))
    torch.manual_seed(5)
    import torch.nn as tnn
    tunet.project_modules = tnn.ModuleList(new_mods)
    tunet = tunet.eval()

    with torch.no_grad():
        control = tglv(_nchw(lq), torch.from_numpy(t), _nchw(x),
                       context=torch.from_numpy(ctx), y=torch.from_numpy(y))
        ref = tunet(_nchw(x), torch.from_numpy(t),
                    context=torch.from_numpy(ctx), y=torch.from_numpy(y),
                    control=control, control_scale=0.7,
                    fbcache_mode="none").numpy()

    cparams = convert.convert_glv_control(tglv.state_dict(), UCFG)
    uparams = convert.convert_controlled_unet(tunet.state_dict(), UCFG)
    feats = GLVControl(UCFG).apply(cparams, jnp.asarray(lq), jnp.asarray(x),
                                   jnp.asarray(t), jnp.asarray(ctx),
                                   jnp.asarray(y))
    ours = ControlledUNet(UCFG).apply(uparams, jnp.asarray(x), jnp.asarray(t),
                                      jnp.asarray(ctx), jnp.asarray(y),
                                      feats, 0.7)
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=2e-3, rtol=1e-2)
