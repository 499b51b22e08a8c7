"""Regenerate tests/fixtures/convert_stats.json from the REFERENCE modules.

Run manually when a converter's contract legitimately changes:
    cd /root/repo && python tests/update_convert_stats.py
Needs /root/reference mounted (ref_oracle) and torch. See
convert_stats_lib.py for the scheme; test_convert_stats.py consumes the
result without the reference.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np  # noqa: E402

import ref_oracle  # noqa: E402
from convert_stats_lib import (det_values, family_inputs,  # noqa: E402
                               save_fixture, summarize)

ref_oracle.install()

import torch  # noqa: E402


def fill_det(module: torch.nn.Module, prefix: str = "") -> dict:
    """Overwrite every state_dict entry with det_values(prefix + key);
    returns {full_key: shape} for the fixture's key table."""
    sd = module.state_dict()
    new = {k: torch.from_numpy(det_values(prefix + k, tuple(v.shape)))
           for k, v in sd.items()}
    module.load_state_dict(new)
    return {prefix + k: list(v.shape) for k, v in sd.items()}


def nchw(a: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(a.transpose(0, 3, 1, 2).copy())


def capture_sr3(inp) -> dict:
    from models.sr3_model.sr3_modules.unet import UNet as RefUNet
    m = RefUNet(in_channel=6, out_channel=3, inner_channel=64,
                norm_groups=32, channel_mults=(1, 2, 4, 8, 8),
                attn_res=(28,), res_blocks=1, dropout=0.2,
                image_size=224).eval()
    keys = fill_det(m)
    with torch.no_grad():
        out = m(nchw(inp["x"]),
                torch.from_numpy(inp["noise_level"])).numpy()
    return {"keys": keys,
            "outputs": {"out": summarize("out",
                                         out.transpose(0, 2, 3, 1))}}


def capture_vae(inp) -> dict:
    """encode_with_denoise: the reference runs the SR-v0Q denoise_encoder
    (SR_model.py:22,58-62) — modeled by filling the torch encoder with the
    denoise_encoder.* det values; decode: plain decoder. scale_factor
    (0.13025) is applied by OUR encode path, so the fixture stores the
    raw mode() and the test divides it out."""
    from sgm.models.autoencoder import AutoencoderKL as RefAE
    dd = dict(attn_type="vanilla", double_z=True, z_channels=4,
              resolution=256, in_channels=3, out_ch=3, ch=128,
              ch_mult=[1, 2, 4, 4], num_res_blocks=2, attn_resolutions=[],
              dropout=0.0)
    m = RefAE(embed_dim=4, ddconfig=dd,
              lossconfig={"target": "torch.nn.Identity"}).eval()
    keys = fill_det(m)
    # the overlay's denoise_encoder keys: independent det values, loaded
    # into the torch encoder for the encode capture below
    denoise_keys = {}
    enc_sd = {}
    for k in list(keys):
        if k.startswith("encoder."):
            dk = "denoise_encoder." + k[len("encoder."):]
            denoise_keys[dk] = keys[k]
            enc_sd[k[len("encoder."):]] = torch.from_numpy(
                det_values(dk, tuple(keys[k])))
    m.encoder.load_state_dict(enc_sd)
    keys.update(denoise_keys)
    with torch.no_grad():
        post = m.encode(nchw(inp["img"]))
        enc = post.mode().numpy().transpose(0, 2, 3, 1)
        dec = m.decode(nchw(inp["z"])).numpy().transpose(0, 2, 3, 1)
    return {"keys": keys,
            "outputs": {"encode_mode": summarize("encode_mode", enc),
                        "decode": summarize("decode", dec)}}


def capture_xl(inp) -> dict:
    from models.modules.SR_modules import GLVControl, LightGLVUNet
    kw = dict(adm_in_channels=2816, num_classes="sequential",
              use_checkpoint=False, in_channels=4, out_channels=4,
              model_channels=320, attention_resolutions=[4, 2],
              num_res_blocks=2, channel_mult=[1, 2, 4],
              num_head_channels=64, use_spatial_transformer=True,
              use_linear_in_transformer=True,
              transformer_depth=[1, 2, 10], context_dim=2048,
              spatial_transformer_attn_type="softmax", legacy=False)
    glv = GLVControl(input_upscale=1, **kw).eval()
    unet = LightGLVUNet(mode="XL-base", project_type="ZeroSFT",
                        project_channel_scale=2, **kw).eval()
    keys_c = fill_det(glv)
    keys_u = fill_det(unet)
    with torch.no_grad():
        control = glv(nchw(inp["lq"]), torch.from_numpy(inp["t"]),
                      nchw(inp["x"]), context=torch.from_numpy(inp["ctx"]),
                      y=torch.from_numpy(inp["y"]))
        out = unet(nchw(inp["x"]), torch.from_numpy(inp["t"]),
                   context=torch.from_numpy(inp["ctx"]),
                   y=torch.from_numpy(inp["y"]),
                   control=[c.clone() for c in control],
                   control_scale=inp["control_scale"],
                   fbcache_mode="none").numpy()
    outputs = {"out": summarize("out", out.transpose(0, 2, 3, 1))}
    for i, c in enumerate(control):
        outputs[f"control_{i}"] = summarize(
            f"control_{i}", c.numpy().transpose(0, 2, 3, 1))
    return {"control_keys": keys_c, "unet_keys": keys_u,
            "outputs": outputs}


def main():
    torch.set_grad_enabled(False)
    inputs = family_inputs()
    fix = {
        "sr3": capture_sr3(inputs["sr3"]),
        "vae": capture_vae(inputs["vae"]),
        "xl": capture_xl(inputs["xl"]),
    }
    save_fixture(fix)
    for fam, d in fix.items():
        outs = ", ".join(f"{k}{tuple(v['shape'])}"
                         for k, v in d["outputs"].items())
        print(f"{fam}: {outs}")


if __name__ == "__main__":
    main()
