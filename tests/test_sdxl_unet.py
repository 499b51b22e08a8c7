"""SDXL UNet + ControlNet shape/structure tests on a tiny config."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.models.sdxl import (SDXLUNetConfig, UNetModel, GLVControl,
                                    ControlledUNet, timestep_embedding)
from rsvldm_tpu.models.sdxl.unet import _build_specs
from rsvldm_tpu.models.sdxl.control import project_specs

TINY = SDXLUNetConfig(model_channels=32, num_res_blocks=1,
                      attention_resolutions=(2,), channel_mult=(1, 2),
                      num_head_channels=16, transformer_depth=(1, 1),
                      context_dim=64, adm_in_channels=40)


def test_build_specs_xl_base():
    from rsvldm_tpu.models.sdxl.unet import XL_BASE_CONFIG
    in_specs, out_specs, skip_ch = _build_specs(XL_BASE_CONFIG)
    assert len(in_specs) == 8          # 2 res x3 levels + 2 downsamples
    assert len(out_specs) == 9
    assert skip_ch == [320, 320, 320, 320, 640, 640, 640, 1280, 1280]
    # transformer depths per level
    depths = [s["st_depth"] for s in in_specs if s["kind"] == "res"]
    assert depths == [0, 0, 2, 2, 10, 10]
    ups = [s["has_up"] for s in out_specs]
    assert ups == [False, False, True, False, False, True, False, False, False]


def test_project_specs_xl_base():
    specs = project_specs("XL-base", 2.0)
    assert len(specs) == 12
    kinds = [s["kind"] for s in specs]
    assert kinds.count("zca") == 2
    assert kinds[3] == "zca" and kinds[7] == "zca"
    # middle adapter (last) modulates 1280 with no concat
    assert specs[-1] == dict(kind="sft", norm_nc=1280, concat_nc=0)


def test_timestep_embedding():
    e = timestep_embedding(jnp.array([0.0, 999.0]), 320)
    assert e.shape == (2, 320)
    # t=0: cos part 1, sin part 0
    np.testing.assert_allclose(np.array(e[0, :160]), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.array(e[0, 160:]), 0.0, atol=1e-6)


@pytest.fixture(scope="module")
def tiny_models():
    unet = UNetModel(TINY)
    x = jnp.zeros((1, 16, 16, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 7, 64))
    y = jnp.zeros((1, 40))
    uparams = unet.init(jax.random.PRNGKey(0), x, t, ctx, y)
    return unet, uparams


def test_unet_forward(tiny_models):
    unet, params = tiny_models
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    t = jnp.array([500.0, 500.0])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 64))
    y = jax.random.normal(jax.random.PRNGKey(3), (2, 40))
    out = unet.apply(params, x, t, ctx, y)
    assert out.shape == (2, 16, 16, 4)
    assert jnp.all(jnp.isfinite(out))


def test_unet_zero_init_out(tiny_models):
    """out_conv is zero-init => fresh model returns 0 (pre-training SDXL
    convention for the eps head)."""
    unet, params = tiny_models
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 4))
    out = unet.apply(params, x, jnp.array([10.0]),
                     jnp.zeros((1, 7, 64)), jnp.zeros((1, 40)))
    np.testing.assert_allclose(np.array(out), 0.0)


def test_controlled_unet_matches_structure():
    model = ControlledUNet(TINY, mode="XL-base")
    # XL-base wiring requires the real channel plan; here we only check that
    # setup builds 12 projects and a full forward runs on the REAL plan with
    # a scaled-down spatial size.
    specs = project_specs("XL-base", 2.0)
    assert len(specs) == 12


@pytest.mark.slow
def test_glv_control_and_injection_real_plan():
    """Run the real XL-base channel plan at 8x8 latent to validate the full
    injection wiring end-to-end (slow: ~1.5B params worth of inits is too
    much; we shrink transformer depth but keep the channel plan)."""
    cfg = SDXLUNetConfig(transformer_depth=(1, 1, 1))
    control = GLVControl(cfg)
    lq = jnp.zeros((1, 8, 8, 4))
    xt = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,))
    ctx = jnp.zeros((1, 7, 2048))
    y = jnp.zeros((1, 2816))
    cparams = control.init(jax.random.PRNGKey(0), lq, xt, t, ctx, y)
    feats = control.apply(cparams, lq, xt, t, ctx, y)
    assert len(feats) == 10
    chans = [f.shape[-1] for f in feats]
    assert chans == [320, 320, 320, 320, 640, 640, 640, 1280, 1280, 1280]

    unet = ControlledUNet(cfg)
    uparams = unet.init(jax.random.PRNGKey(1), xt, t, ctx, y, feats)
    out = unet.apply(uparams, xt, t, ctx, y, feats)
    assert out.shape == (1, 8, 8, 4)
    assert jnp.all(jnp.isfinite(out))


def test_derive_project_specs_matches_xl_refine_table():
    """The generic derivation reproduces the reference's hardcoded XL-refine
    plan (SR_modules.py:550-555: cond=[384]*4+[768]*3+[1536]*6,
    concat=[384]*2+[768]*3+[1536]*7+[0], ZCA inserts at [9,6,3] which land
    at final indices [3,7,11])."""
    from rsvldm_tpu.models.sdxl.control import derive_project_specs
    cfg = SDXLUNetConfig(model_channels=384, channel_mult=(1, 2, 4, 4),
                         num_res_blocks=2, attention_resolutions=(2, 4),
                         transformer_depth=(4, 4, 4, 4), context_dim=1280,
                         adm_in_channels=2560)
    specs = list(reversed(derive_project_specs(cfg)))  # torch index order
    assert len(specs) == 16
    sft = [s for s in specs if s["kind"] == "sft"]
    assert [s["norm_nc"] for s in sft] == [384] * 4 + [768] * 3 + [1536] * 6
    assert [s["concat_nc"] for s in sft] == \
        [384] * 2 + [768] * 3 + [1536] * 7 + [0]
    zca_idx = [i for i, s in enumerate(specs) if s["kind"] == "zca"]
    assert zca_idx == [3, 7, 11]


def test_project_specs_xl_refine_mode_plumbed():
    """mode='XL-refine' resolves through XL_REFINE_CONFIG (round-1 gap #7:
    the derivation existed but the refiner config was not plumbed)."""
    from rsvldm_tpu.models.sdxl import XL_REFINE_CONFIG
    from rsvldm_tpu.models.sdxl.control import derive_project_specs
    import pytest as _pt
    specs = project_specs("XL-refine")
    assert specs == list(reversed(derive_project_specs(XL_REFINE_CONFIG)))
    assert len(specs) == 16
    with _pt.raises(NotImplementedError):
        project_specs("XL-v9")
