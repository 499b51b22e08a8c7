"""Three-stage E2E ORCHESTRATION parity vs the reference pipeline.

Runs the reference flow (infer.py:206-215 — SR3 p_sample_loop -> tensor2img
-> PNG -> PIL2Tensor /64 rounding -> SR_backbone.just_sampling (real sgm
DiffusionEngine + GLVControl/LightGLVUNet) -> wavelet colorfix ->
Tensor2PIL) against our SuperResolutionPipeline.process() at tiny scale,
with SHARED converted weights, a shared deterministic fake conditioner
(e2e_fakes — conditioner parity is covered by module tests) and IDENTICAL
injected noise on both sides. Catches uint8 round-trip placement, /64
rounding, x_center wiring, colorfix order — everything module parity can't.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, "tests")
import ref_oracle  # noqa: E402

pytestmark = [pytest.mark.skipif(not ref_oracle.available(),
                                 reason="reference repo not present")]
if ref_oracle.available():
    ref_oracle.install_sr_model()

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import e2e_fakes as EF  # noqa: E402

S1_STEPS = 4
EDM_STEPS = 4
MIN_SIZE = 64

# the 3-level shape test_parity_sdxl's full-parity test validated against
# torch (the 2-level variant misaligns LightGLVUNet's hardcoded XL-base
# project-module walk), with the fake-conditioner ctx/adm dims
TINY_UNET_KW = dict(
    adm_in_channels=EF.ADM_DIM, num_classes="sequential",
    use_checkpoint=False, in_channels=4, out_channels=4, model_channels=32,
    attention_resolutions=[4, 2], num_res_blocks=2, channel_mult=[1, 2, 4],
    num_head_channels=16, use_spatial_transformer=True,
    use_linear_in_transformer=True, transformer_depth=[1, 2, 2],
    context_dim=EF.CTX_DIM, spatial_transformer_attn_type="softmax",
    legacy=False)


class _NoiseQueue:
    """Deterministic replacement for torch.randn/randn_like."""

    def __init__(self, arrays):
        self.q = [torch.tensor(np.asarray(a)) for a in arrays]

    def randn(self, *shape, **kw):
        if len(shape) == 1 and isinstance(shape[0], (tuple, torch.Size)):
            shape = tuple(shape[0])
        t = self.q.pop(0)
        assert tuple(t.shape) == tuple(shape), (t.shape, shape)
        return t

    def randn_like(self, x, **kw):
        return self.randn(*x.shape)


def _make_noises(rng, lat_hw):
    """All unit normals both loops consume, NCHW."""
    h, w = lat_hw
    return dict(
        sr3=[rng.standard_normal((1, 3, 16, 16)).astype(np.float32)
             for _ in range(S1_STEPS)],          # init + (S1_STEPS-1) steps
        enc=rng.standard_normal((1, 4, h, w)).astype(np.float32),
        init=rng.standard_normal((1, 4, h, w)).astype(np.float32),
        churn=[rng.standard_normal((1, 4, h, w)).astype(np.float32)
               for _ in range(EDM_STEPS)],
    )


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    from PIL import Image

    from models.sr3_model.sr3_modules.diffusion import \
        GaussianDiffusion as TGaussianDiffusion
    from models.sr3_model.sr3_modules.unet import UNet as TSR3UNet
    from models.SR_model import SR_backbone
    from models.modules.SR_modules import (ZeroCrossAttn as TZCA,
                                           ZeroSFT as TZeroSFT)

    from rsvldm_tpu.models.sdxl.control import derive_project_specs
    from rsvldm_tpu.pipeline import _tiny_overrides
    from rsvldm_tpu.utils import convert

    tmp = tmp_path_factory.mktemp("e2e")
    img_path = tmp / "x.png"
    Image.fromarray(np.random.default_rng(0).integers(
        0, 255, (2, 2, 3), dtype=np.uint8)).save(img_path)

    import dataclasses

    import rsvldm_tpu.pipeline as P

    tiny = _tiny_overrides()
    tiny["sdxl"] = dataclasses.replace(
        tiny["sdxl"], num_res_blocks=2, attention_resolutions=(4, 2),
        channel_mult=(1, 2, 4), transformer_depth=(1, 2, 2))
    orig_tiny = P._tiny_overrides
    P._tiny_overrides = lambda: dict(tiny)

    # ---- torch stage-1 (tiny SR3) -----------------------------------
    torch.manual_seed(10)
    t_sr3 = TSR3UNet(in_channel=6, out_channel=3, inner_channel=16,
                     norm_groups=8, channel_mults=[1, 2], attn_res=[8],
                     res_blocks=1, dropout=0, image_size=16).eval()
    t_diff = TGaussianDiffusion(t_sr3, image_size=16, channels=3,
                                conditional=True)
    t_diff.set_new_noise_schedule(dict(
        schedule="linear", n_timestep=S1_STEPS, linear_start=1e-6,
        linear_end=1e-2), device="cpu")
    t_diff.eval()

    # ---- torch stage-2b (tiny SR_backbone via the real config DI) ---
    network_config = {
        "target": "models.modules.SR_modules.LightGLVUNet",
        "params": dict(mode="XL-base", project_type="ZeroSFT",
                       project_channel_scale=2, **TINY_UNET_KW)}
    control_config = {
        "target": "models.modules.SR_modules.GLVControl",
        "params": dict(input_upscale=1, **TINY_UNET_KW)}
    denoiser_config = {
        "target":
            "sgm.modules.diffusionmodules.denoiser.DiscreteDenoiserWithControl",
        "params": dict(
            num_idx=1000,
            weighting_config={"target": "sgm.modules.diffusionmodules."
                              "denoiser_weighting.EpsWeighting"},
            scaling_config={"target": "sgm.modules.diffusionmodules."
                            "denoiser_scaling.EpsScaling"},
            discretization_config={"target": "sgm.modules.diffusionmodules."
                                   "discretizer.LegacyDDPMDiscretization"})}
    first_stage_config = {
        "target": "sgm.models.autoencoder.AutoencoderKLInferenceWrapper",
        "params": dict(
            embed_dim=4, monitor="val/rec_loss",
            ddconfig=dict(attn_type="vanilla", double_z=True, z_channels=4,
                          resolution=64, in_channels=3, out_ch=3, ch=32,
                          ch_mult=[1, 2], num_res_blocks=1,
                          attn_resolutions=[], dropout=0.0),
            lossconfig={"target": "torch.nn.Identity"})}
    sampler_config = EF.AttrDict(
        target="sgm.modules.diffusionmodules.sampling.RestoreEDMSampler",
        params=EF.AttrDict(
            num_steps=EDM_STEPS, restore_cfg=4.0, s_churn=0, s_noise=1.003,
            device="cpu",
            discretization_config={"target": "sgm.modules.diffusionmodules."
                                   "discretizer.LegacyDDPMDiscretization"},
            guider_config=EF.AttrDict(
                target="sgm.modules.diffusionmodules.guiders.LinearCFG",
                params=EF.AttrDict(scale=7.5, scale_min=4.0))))

    torch.manual_seed(11)
    sr = SR_backbone(
        control_stage_config=control_config, ae_dtype="fp32",
        diffusion_dtype="fp32", p_p="pp", n_p="np",
        network_config=network_config, denoiser_config=denoiser_config,
        first_stage_config=first_stage_config,
        conditioner_config={"target": "e2e_fakes.FakeCondTorch"},
        sampler_config=sampler_config, scale_factor=0.13025,
        disable_first_stage_autocast=True,
        network_wrapper="sgm.modules.diffusionmodules.wrappers.ControlWrapper")

    # XL-base hardcodes the REAL channel plan — rebuild the project modules
    # at the tiny derived sizes (same recipe as test_parity_sdxl)
    specs = derive_project_specs(tiny["sdxl"])
    torch.manual_seed(5)
    new_mods = []
    for s in reversed(specs):
        if s["kind"] == "sft":
            new_mods.append(TZeroSFT(s["norm_nc"], s["norm_nc"],
                                     concat_channels=s["concat_nc"]))
        else:
            new_mods.append(TZCA(s["query_dim"] // 2, s["query_dim"]))
    sr.model.diffusion_model.project_modules = torch.nn.ModuleList(new_mods)
    sr.eval()

    # de-zero the zero-initialized convs (OpenAI UNet out layer, zero convs,
    # ZeroSFT/ZeroCrossAttn, input_hint) — with them at 0 the denoiser is
    # exactly D(x)=x and the loop wouldn't exercise the UNet/control at all
    def dezero(mod, seed):
        g = torch.Generator().manual_seed(seed)
        with torch.no_grad():
            for _, p in mod.named_parameters():
                if p.abs().sum() == 0:
                    p.copy_(torch.randn(p.shape, generator=g) * 0.05)

    dezero(sr.model.diffusion_model, 21)
    dezero(sr.model.control_model, 22)

    # ---- converted shared weights -----------------------------------
    params = dict(
        sr3=convert.convert_sr3_unet(t_sr3.state_dict(), tiny["sr3"]),
        unet=convert.convert_controlled_unet(
            sr.model.diffusion_model.state_dict(), tiny["sdxl"]),
        control=convert.convert_glv_control(
            sr.model.control_model.state_dict(), tiny["sdxl"]),
        vae=convert.convert_autoencoder(
            sr.first_stage_model.state_dict(), tiny["vae"]),
    )

    noises = _make_noises(np.random.default_rng(123), (32, 32))
    yield dict(img_path=img_path, tmp=tmp, t_diff=t_diff, sr=sr,
               params=params, noises=noises, tiny=tiny)
    P._tiny_overrides = orig_tiny


def _run_torch(world, threshold, tag):
    from PIL import Image

    import utils.tensor2img as T2I
    from models.util import PIL2Tensor, Tensor2PIL

    from rsvldm_tpu.ops.image import load_lr_conditioning

    nz = world["noises"]
    out = world["tmp"] / f"ref_{tag}"
    out.mkdir(exist_ok=True)

    cond = load_lr_conditioning(str(world["img_path"]), 8)  # [16,16,3] NHWC
    x_in = torch.tensor(cond.transpose(2, 0, 1))[None]

    queue = _NoiseQueue(nz["sr3"])
    real_randn, real_randn_like = torch.randn, torch.randn_like
    torch.randn, torch.randn_like = queue.randn, queue.randn_like
    try:
        with torch.no_grad():
            sr_t = world["t_diff"].super_resolution(x_in, continous=True)
    finally:
        torch.randn, torch.randn_like = real_randn, real_randn_like
    if sr_t.dim() == 4:
        sr_t = sr_t[-1]
    sr_pil = Image.fromarray(T2I.tensor2img(sr_t, min_max=(-1, 1)))
    sr_pil.save(out / "sr3_x.png")

    lq, h0, w0 = PIL2Tensor(sr_pil, upscale=1, min_size=MIN_SIZE)
    lq = lq.unsqueeze(0)[:, :3, :, :]

    queue = _NoiseQueue([nz["enc"], nz["init"]] + nz["churn"])
    torch.randn, torch.randn_like = queue.randn, queue.randn_like
    try:
        with torch.no_grad():
            samples = world["sr"].just_sampling(
                lq, [""], p_p="pp", n_p="np", num_steps=EDM_STEPS,
                restoration_scale=4.0, s_churn=5, s_noise=1.003,
                cfg_scale=7.5, control_scale=1.0, use_linear_CFG=True,
                use_linear_control_scale=False, cfg_scale_start=4.0,
                control_scale_start=0.0, img_threshold=threshold, dec_img=1,
                color_fix_type="Wavelet", seed=-1, num_samples=1)
    finally:
        torch.randn, torch.randn_like = real_randn, real_randn_like
    Tensor2PIL(samples[0], h0, w0).save(out / "x_final_0.png")
    return (np.asarray(Image.open(out / "sr3_x.png")),
            np.asarray(Image.open(out / "x_final_0.png")))


def _run_ours(world, threshold, tag):
    from PIL import Image

    from rsvldm_tpu.config import PipelineConfig, Stage1Config
    from rsvldm_tpu.diffusion.samplers import restore_edm_sample
    from rsvldm_tpu.models.sdxl.denoiser import ControlDenoiser
    from rsvldm_tpu.models.sr3.diffusion import sr3_sample
    from rsvldm_tpu.models.vae.model import DiagonalGaussian
    from rsvldm_tpu.pipeline import SuperResolutionPipeline

    nz = world["noises"]
    out = world["tmp"] / f"ours_{tag}"
    nhwc = lambda a: jnp.asarray(np.transpose(a, (0, 2, 3, 1)))

    cfg = PipelineConfig(input_img=str(world["img_path"]),
                         output_dir=str(out), upscale=8, no_llava=True)
    cfg.stage1 = Stage1Config(steps=S1_STEPS)
    cfg.refine.edm_steps = EDM_STEPS
    cfg.refine.min_size = MIN_SIZE
    cfg.refine.s_stage1 = 4.0
    cfg.refine.s_churn = 5.0
    cfg.refine.img_threshold = threshold
    cfg.refine.a_prompt = "pp"
    cfg.refine.n_prompt = "np"

    pipe = SuperResolutionPipeline(cfg, debug_tiny=True)
    pipe.sr3_params = world["params"]["sr3"]
    pipe._ensure_stage2()
    pipe.unet_params = world["params"]["unet"]
    pipe.control_params = world["params"]["control"]
    pipe.vae_params = world["params"]["vae"]

    # [S1_STEPS+1, 1, 16, 16, 3]: init + per-step noise (last is masked)
    sr3_noise = jnp.stack([nhwc(a)[0] for a in nz["sr3"]]
                          + [jnp.zeros((16, 16, 3))])[:, None]
    apply_fn = lambda p, x, nl: pipe.sr3.apply(p, x, nl)
    pipe._jit_cache["stage1"] = jax.jit(
        lambda p, c, r: sr3_sample(pipe.sr3_diff, apply_fn, p, c, r,
                                   noise_override=sr3_noise))

    enc_eps = nhwc(nz["enc"])

    def prep(vae_params, x, k_enc):
        vae = pipe.vae
        _z = vae.apply(vae_params, x, method=vae.encode_with_denoise)
        x_stage1 = vae.apply(vae_params, _z, method=vae.decode)
        moments = vae.apply(
            vae_params, x_stage1,
            method=lambda m, t: m.quant_conv(m.encoder(t)))
        dg = DiagonalGaussian(moments)
        z_stage1 = vae.cfg.scale_factor * (dg.mean + dg.std * enc_eps)
        return _z, x_stage1, z_stage1

    def cond_fn(clip_l_params, big_g_params, tl_c, tg_c, tl_u, tg_u, _z):
        ca_c, ca_u, v_c, v_u = EF.fake_cond_arrays(_z.shape[0])
        c = dict(crossattn=jnp.asarray(ca_c), vector=jnp.asarray(v_c),
                 control=_z)
        uc = dict(crossattn=jnp.asarray(ca_u), vector=jnp.asarray(v_u),
                  control=_z)
        return c, uc

    init_noise = nhwc(nz["init"])
    churn = jnp.stack([nhwc(a) for a in nz["churn"]])

    def sample_fn(scfg, unet_params, control_params, cond, uc, z_stage1,
                  k_noise, k_loop):
        den = ControlDenoiser(unet=pipe.unet, control_net=pipe.control,
                              unet_params=unet_params,
                              control_params=control_params)
        z, aux = restore_edm_sample(den, cond, uc, init_noise, z_stage1,
                                    scfg, k_loop, return_aux=True,
                                    churn_noise=churn)
        return z, aux["cache_hits"], aux["num_steps"], aux["hit_trace"]

    pipe._vae_prep_jit = prep
    pipe._cond_jit = cond_fn
    pipe._sample_jit = sample_fn

    pipe.process()
    return (np.asarray(Image.open(out / "sr3_x.png")),
            np.asarray(Image.open(out / "x_final_0.png")))


def _compare(ref, ours, max_frac=0.01, max_abs=3):
    assert ref.shape == ours.shape
    d = np.abs(ref.astype(np.int32) - ours.astype(np.int32))
    frac_off = float(np.mean(d > 1))
    assert frac_off <= max_frac, (frac_off, d.max())
    assert d.max() <= max_abs, d.max()


def test_resize_bicubic_torch_parity():
    """array_to_pil's final downscale must use torch-interpolate bicubic
    (A=-0.75, no antialias) — jax.image cubic is a visually different
    kernel (the E2E mismatch that motivated this)."""
    from torch.nn.functional import interpolate

    from rsvldm_tpu.ops.image import resize_bicubic_torch

    rng = np.random.default_rng(0)
    for (hi, wi, ho, wo) in [(64, 64, 16, 16), (16, 20, 64, 80),
                             (33, 17, 100, 50)]:
        x = rng.standard_normal((1, hi, wi, 3)).astype(np.float32)
        ref = interpolate(torch.tensor(x.transpose(0, 3, 1, 2)),
                          size=(ho, wo), mode="bicubic").numpy()
        ours = np.asarray(resize_bicubic_torch(x, (ho, wo)))
        np.testing.assert_allclose(ours.transpose(0, 3, 1, 2), ref,
                                   rtol=0, atol=2e-5)


def test_e2e_orchestration_parity_cache_off(world):
    ref_sr3, ref_final = _run_torch(world, threshold=0.0, tag="off")
    our_sr3, our_final = _run_ours(world, threshold=0.0, tag="off")
    _compare(ref_sr3, our_sr3)
    _compare(ref_final, our_final)


def test_e2e_orchestration_parity_cache_on(world):
    """First-block cache at the shipped threshold: identical hit/miss
    decisions and matching outputs through the whole pipeline."""
    ref_sr3, ref_final = _run_torch(world, threshold=0.3, tag="on")
    our_sr3, our_final = _run_ours(world, threshold=0.3, tag="on")
    _compare(ref_sr3, our_sr3)
    _compare(ref_final, our_final)
