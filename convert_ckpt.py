#!/usr/bin/env python
"""One-time checkpoint conversion CLI: reference torch weights -> orbax.

Converts the diffusion-stack families (sr3 vae unet control clip_l big_g)
and caches them under <ckpt_dir>/jax/ — the same conversions the pipeline
runs lazily on first use, done explicitly up front. The LLaVA stack
(vision tower / 8B decoder / projector) converts on captioner load
(utils/convert_hf.py) and is not covered here. Sanity signal is the
logged per-model parameter count; numerical parity lives in the
tests/test_parity_* oracle suite, and the full directory chain
(these plans -> Pipeline load -> eval) in tests/test_e2e_ckpt_roundtrip.py.
"""

import argparse
import logging
from pathlib import Path

log = logging.getLogger("convert")


def conversion_plans(ckpt_dir, cfgs: dict | None = None) -> dict:
    """name -> (source torch paths overlaid in order, convert_fn).

    The single source of truth for the reference checkpoint layout
    (models/util.py:93-117 load order): juggernautXL base + SR-v0Q
    overlay for the SDXL stack, I1000000_E800_gen.pth for SR3. `cfgs`
    overrides the per-family model configs (keys sr3/sdxl/vae/clip_l/
    big_g) — tests run the same plans at tiny geometry."""
    from rsvldm_tpu.models.sdxl import XL_BASE_CONFIG
    from rsvldm_tpu.models.sr3 import SR3UNetConfig
    from rsvldm_tpu.models.text import CLIP_L_CONFIG, OPENCLIP_BIGG_CONFIG
    from rsvldm_tpu.models.vae import SDXL_VAE_CONFIG
    from rsvldm_tpu.utils import checkpoint as ckpt
    from rsvldm_tpu.utils import convert, convert_hf

    c = {"sr3": SR3UNetConfig(), "sdxl": XL_BASE_CONFIG,
         "vae": SDXL_VAE_CONFIG, "clip_l": CLIP_L_CONFIG,
         "big_g": OPENCLIP_BIGG_CONFIG, **(cfgs or {})}
    cd = Path(ckpt_dir)
    jug = str(cd / "juggernautXL_v8Rundiffusion.safetensors")
    srq = str(cd / "SR-v0Q.ckpt")

    return {
        "sr3": ([str(cd / "I1000000_E800_gen.pth")],
                lambda sd: convert.convert_sr3_unet(sd, c["sr3"])),
        "vae": ([jug, srq],
                lambda sd: convert.convert_autoencoder(
                    ckpt.strip_prefix(sd, "first_stage_model"), c["vae"])),
        "unet": ([jug, srq],
                 lambda sd: convert.convert_controlled_unet(
                     ckpt.strip_prefix(sd, "model.diffusion_model"),
                     c["sdxl"])),
        "control": ([jug, srq],
                    lambda sd: convert.convert_glv_control(
                        ckpt.strip_prefix(sd, "model.control_model"),
                        c["sdxl"])),
        "clip_l": ([jug, srq],
                   lambda sd: convert_hf.convert_hf_clip_text(
                       ckpt.strip_prefix(
                           sd, "conditioner.embedders.0.transformer"),
                       c["clip_l"])),
        "big_g": ([jug, srq],
                  lambda sd: convert_hf.convert_openclip_text(
                      ckpt.strip_prefix(sd, "conditioner.embedders.1.model"),
                      c["big_g"])),
    }


def convert_all(ckpt_dir, models=None, cfgs: dict | None = None) -> dict:
    """Run the plans through the pipeline's own load_or_convert cache
    (<ckpt_dir>/jax/<name>). Returns name -> params (None if no source)."""
    import jax
    from rsvldm_tpu.utils import checkpoint as ckpt

    plans = conversion_plans(ckpt_dir, cfgs)
    out = {}
    # an explicitly EMPTY models list means "convert nothing" (argparse
    # `--models` with no values yields []); only None means "all"
    for name in (plans if models is None else models):
        paths, fn = plans[name]
        params = ckpt.load_or_convert(Path(ckpt_dir), name, paths, fn)
        out[name] = params
        if params is None:
            log.warning("%s: no source checkpoint found (%s)", name, paths)
        else:
            n = sum(x.size for x in jax.tree_util.tree_leaves(params))
            log.info("%s: ok (%.1fM params) -> %s/jax/%s", name, n / 1e6,
                     ckpt_dir, name)
    return out


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
    convert_all(args.ckpt_dir, args.models)


if __name__ == "__main__":
    main()
