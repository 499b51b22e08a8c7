"""Converter drift guard against COMMITTED reference activations.

Round-4 review item 8: the full-scale converter parity evidence lived only
in the oracle tier (needs /root/reference). Here the reference modules'
outputs — captured once at production structure with deterministic
key-seeded weights by tests/update_convert_stats.py — are frozen in
tests/fixtures/convert_stats.json, and this test rebuilds the SAME
state_dict from the fixture's key table, feeds it through OUR converters,
runs OUR Flax modules on the same fixed inputs, and asserts the committed
activations are reproduced. No reference import anywhere: the fixture IS
the oracle.

Tolerances mirror test_convert_fullscale.py's live-parity bounds (same
modules, same scales, same input magnitudes).
"""

import os

import numpy as np
import pytest

from convert_stats_lib import (check_against, det_values, family_inputs,
                               load_fixture, FIXTURE)

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rsvldm_tpu.models.sr3 import SR3UNet, SR3UNetConfig  # noqa: E402
from rsvldm_tpu.models.sdxl import (ControlledUNet, GLVControl,  # noqa: E402
                                    SDXLUNetConfig)
from rsvldm_tpu.models.vae import AutoencoderKL, SDXL_VAE_CONFIG  # noqa: E402
from rsvldm_tpu.utils import convert  # noqa: E402

pytestmark = pytest.mark.skipif(not os.path.exists(FIXTURE),
                                reason="fixture not generated")


def _sd(keys: dict) -> dict:
    """Rebuild the torch state_dict the capture used — the det rule keys
    on the NAME, so this is bit-identical to the capture's weights."""
    return {k: torch.from_numpy(det_values(k, tuple(s)))
            for k, s in keys.items()}


def test_sr3_reproduces_reference_activations():
    fix = load_fixture()["sr3"]
    inp = family_inputs()["sr3"]
    cfg = SR3UNetConfig(inner_channel=64, channel_mults=(1, 2, 4, 8, 8),
                        attn_res=(28,), res_blocks=1, image_size=224)
    params = convert.convert_sr3_unet(_sd(fix["keys"]), cfg)
    out = SR3UNet(cfg).apply(params, jnp.asarray(inp["x"]),
                             jnp.asarray(inp["noise_level"]))
    check_against(fix["outputs"]["out"], np.asarray(out),
                  atol=2e-4, rtol=1e-3, label="sr3.out")


def test_vae_reproduces_reference_activations():
    fix = load_fixture()["vae"]
    inp = family_inputs()["vae"]
    params = convert.convert_autoencoder(_sd(fix["keys"]), SDXL_VAE_CONFIG)
    vae = AutoencoderKL(SDXL_VAE_CONFIG)
    enc = vae.apply(params, jnp.asarray(inp["img"]),
                    method=vae.encode_with_denoise)
    # fixture stores the raw posterior mode; our encode path multiplies
    # scale_factor in (SR_model.py:58-62 semantics)
    check_against(fix["outputs"]["encode_mode"],
                  np.asarray(enc) / SDXL_VAE_CONFIG.scale_factor,
                  atol=3e-4, rtol=1e-3, label="vae.encode_mode")
    # our decode path divides the scale factor out of the latent first
    dec = vae.apply(params,
                    jnp.asarray(inp["z"]) * SDXL_VAE_CONFIG.scale_factor,
                    method=vae.decode)
    check_against(fix["outputs"]["decode"], np.asarray(dec),
                  atol=3e-4, rtol=1e-3, label="vae.decode")


def test_xl_reproduces_reference_activations():
    fix = load_fixture()["xl"]
    inp = family_inputs()["xl"]
    cfg = SDXLUNetConfig()
    cparams = convert.convert_glv_control(_sd(fix["control_keys"]), cfg)
    uparams = convert.convert_controlled_unet(_sd(fix["unet_keys"]), cfg)
    feats = GLVControl(cfg).apply(
        cparams, jnp.asarray(inp["lq"]), jnp.asarray(inp["x"]),
        jnp.asarray(inp["t"]), jnp.asarray(inp["ctx"]),
        jnp.asarray(inp["y"]))
    for i, f in enumerate(feats):
        check_against(fix["outputs"][f"control_{i}"], np.asarray(f),
                      atol=5e-3, rtol=2e-2, label=f"xl.control_{i}")
    out = ControlledUNet(cfg).apply(
        uparams, jnp.asarray(inp["x"]), jnp.asarray(inp["t"]),
        jnp.asarray(inp["ctx"]), jnp.asarray(inp["y"]), feats,
        inp["control_scale"])
    check_against(fix["outputs"]["out"], np.asarray(out),
                  atol=1e-2, rtol=2e-2, label="xl.out")
