#!/usr/bin/env python
"""One-time checkpoint conversion CLI: reference torch weights -> orbax.

Converts the diffusion-stack families (sr3 vae unet control clip_l big_g)
and caches them under <ckpt_dir>/jax/ — the same conversions the pipeline
runs lazily on first use, done explicitly up front. The LLaVA stack
(vision tower / 8B decoder / projector) converts on captioner load
(utils/convert_hf.py) and is not covered here. Sanity signal is the
logged per-model parameter count; numerical parity lives in the
tests/test_parity_* oracle suite.
"""

import argparse
import logging
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt_dir", type=str, default="./CKPT_PTH")
    ap.add_argument("--models", nargs="*",
                    choices=["sr3", "vae", "unet", "control", "clip_l",
                             "big_g"],
                    default=["sr3", "vae", "unet", "control", "clip_l",
                             "big_g"],
                    help="subset of the diffusion-stack families")
    ap.add_argument("--platform", type=str, default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args()
    from rsvldm_tpu.utils.compile_cache import cli_setup
    cli_setup(args.platform)
    logging.basicConfig(level=logging.INFO)
    log = logging.getLogger("convert")

    import jax
    from rsvldm_tpu.models.sdxl import XL_BASE_CONFIG
    from rsvldm_tpu.models.sr3 import SR3UNetConfig
    from rsvldm_tpu.models.text import CLIP_L_CONFIG, OPENCLIP_BIGG_CONFIG
    from rsvldm_tpu.models.vae import SDXL_VAE_CONFIG
    from rsvldm_tpu.utils import checkpoint as ckpt
    from rsvldm_tpu.utils import convert, convert_hf

    cd = Path(args.ckpt_dir)
    jug = str(cd / "juggernautXL_v8Rundiffusion.safetensors")
    srq = str(cd / "SR-v0Q.ckpt")

    plans = {
        "sr3": ([str(cd / "I1000000_E800_gen.pth")],
                lambda sd: convert.convert_sr3_unet(sd, SR3UNetConfig())),
        "vae": ([jug, srq],
                lambda sd: convert.convert_autoencoder(
                    ckpt.strip_prefix(sd, "first_stage_model"),
                    SDXL_VAE_CONFIG)),
        "unet": ([jug, srq],
                 lambda sd: convert.convert_controlled_unet(
                     ckpt.strip_prefix(sd, "model.diffusion_model"),
                     XL_BASE_CONFIG)),
        "control": ([jug, srq],
                    lambda sd: convert.convert_glv_control(
                        ckpt.strip_prefix(sd, "model.control_model"),
                        XL_BASE_CONFIG)),
        "clip_l": ([jug, srq],
                   lambda sd: convert_hf.convert_hf_clip_text(
                       ckpt.strip_prefix(
                           sd, "conditioner.embedders.0.transformer"),
                       CLIP_L_CONFIG)),
        "big_g": ([jug, srq],
                  lambda sd: convert_hf.convert_openclip_text(
                      ckpt.strip_prefix(sd, "conditioner.embedders.1.model"),
                      OPENCLIP_BIGG_CONFIG)),
    }

    for name in args.models:
        paths, fn = plans[name]
        out = ckpt.load_or_convert(cd, name, paths, fn)
        if out is None:
            log.warning("%s: no source checkpoint found (%s)", name, paths)
        else:
            n = sum(x.size for x in jax.tree_util.tree_leaves(out))
            log.info("%s: ok (%.1fM params) -> %s/jax/%s", name, n / 1e6,
                     cd, name)


if __name__ == "__main__":
    main()
