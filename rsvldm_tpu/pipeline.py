"""Three-stage super-resolution pipeline orchestration.

Parity target: /root/reference infer.py SuperResolutionPipeline (:79-216)
and models/SR_model.py just_sampling (:200-298):

  Stage 1  — SR3 ancestral diffusion on the bicubic-upsampled LR image
  Stage 2a — LLaVA caption of the Stage-1 output
  Stage 2b — SDXL+ControlNet RestoreEDM refinement guided by the caption,
             with the first-block cache, then wavelet/AdaIN color fix

TPU design: each stage is one jitted program; images cross stages as device
arrays (the reference round-trips through PIL/uint8 between stages — we
keep PIL round-trips only where the reference's uint8-quantization semantics
are load-bearing for parity: after Stage 1, since the caption model and the
refinement consume the SAVED uint8 image there).

Weights: loaded from <ckpt_dir> via the converters (utils/checkpoint.py);
missing checkpoints fall back to seeded random init with a loud warning so
the full graph stays runnable for smoke/perf work.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .config import PipelineConfig
from .diffusion.samplers import RestoreEDMConfig, restore_edm_sample
from .models.sr3 import (SR3Diffusion, SR3UNet, SR3UNetConfig, sr3_sample,
                         sr3_sample_ddim)
from .models.sdxl import ControlledUNet, GLVControl, SDXLUNetConfig
from .models.sdxl.denoiser import ControlDenoiser
from .models.text import (CLIP_L_CONFIG, OPENCLIP_BIGG_CONFIG, CLIPTextConfig,
                          CLIPTextTransformer, SDXLConditioner)
from .models.vae import AutoencoderKL, SDXL_VAE_CONFIG, VAEConfig
from .ops import colorfix
from .ops.image import array_to_pil, load_lr_conditioning, pil_to_array, to_uint8
from .utils import checkpoint as ckpt
from .utils import convert, convert_hf
from .utils.tokenizer import CLIPTokenizer

log = logging.getLogger("rsvldm")


def _tiny_overrides():
    """Shrunken model configs for tests/smoke runs (--debug_tiny)."""
    return dict(
        sr3=SR3UNetConfig(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
                          attn_res=(8,), res_blocks=1, image_size=16),
        # context = clip_l.width + big_g.width; adm = big_g.width + 3*512
        sdxl=SDXLUNetConfig(model_channels=32, num_res_blocks=1,
                            attention_resolutions=(2,), channel_mult=(1, 2),
                            num_head_channels=16, transformer_depth=(1, 1),
                            context_dim=64, adm_in_channels=32 + 3 * 512),
        vae=VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1),
        clip_l=CLIPTextConfig(vocab_size=1000, width=32, layers=2, heads=2),
        big_g=CLIPTextConfig(vocab_size=1000, width=32, layers=2, heads=2,
                             quick_gelu=False, use_text_projection=True),
    )


def bucket_pad(x: np.ndarray, bucket: int) -> np.ndarray:
    """Edge-pad an HWC image up to the next `bucket` multiple in H and W so
    differently-sized inputs share one compiled sampling program; callers
    crop the decode back to the original H, W."""
    if not bucket:
        return x
    h, w = x.shape[0], x.shape[1]
    hb = -(-h // bucket) * bucket
    wb = -(-w // bucket) * bucket
    if (hb, wb) == (h, w):
        return x
    return np.pad(x, ((0, hb - h), (0, wb - w), (0, 0)), mode="edge")


class SuperResolutionPipeline:
    """Loads all stages once, then processes images (infer.py:79-101)."""

    def __init__(self, cfg: PipelineConfig, debug_tiny: bool = False,
                 mesh=None, llava_load_kw: dict | None = None,
                 model_cfgs: dict | None = None):
        self.cfg = cfg
        self.debug_tiny = debug_tiny
        self.mesh = mesh  # TP-shards the captioner; shards folder batches
        # override LlavaCaptioner.load kwargs (llama_cfg/vision_cfg/
        # tokenizer) — lets tests run the REAL caption stage at tiny scale
        self.llava_load_kw = llava_load_kw
        self.rng = jax.random.PRNGKey(cfg.seed)
        t = _tiny_overrides() if debug_tiny else None
        # model_cfgs (keys sr3/sdxl/vae/clip_l/big_g) replaces individual
        # model geometries while KEEPING the checkpoint-load path active —
        # unlike debug_tiny, which skips loading entirely. This is how the
        # directory round-trip test runs the real convert->cache->load
        # chain at tiny geometry (tests/test_e2e_ckpt_roundtrip.py).
        mc = model_cfgs or {}

        s1 = cfg.stage1
        self.sr3_cfg = mc.get("sr3") or (t["sr3"] if t else SR3UNetConfig(
            inner_channel=s1.inner_channel, channel_mults=tuple(s1.channel_mults),
            attn_res=tuple(s1.attn_res), res_blocks=s1.res_blocks,
            image_size=s1.image_size, dtype=jnp.bfloat16))
        self.sr3 = SR3UNet(self.sr3_cfg)
        self.sr3_diff = SR3Diffusion.from_schedule(
            s1.schedule, s1.steps, s1.linear_start, s1.linear_end)

        self.sdxl_cfg = mc.get("sdxl") or (
            t["sdxl"] if t else SDXLUNetConfig(dtype=jnp.bfloat16))
        self.vae_cfg = mc.get("vae") or (t["vae"] if t else SDXL_VAE_CONFIG)
        self.unet = ControlledUNet(self.sdxl_cfg)
        self.control = GLVControl(self.sdxl_cfg)
        self.vae = AutoencoderKL(self.vae_cfg)

        self.clip_l_cfg = mc.get("clip_l") or (
            t["clip_l"] if t else CLIP_L_CONFIG)
        self.big_g_cfg = mc.get("big_g") or (
            t["big_g"] if t else OPENCLIP_BIGG_CONFIG)
        self.clip_l = CLIPTextTransformer(self.clip_l_cfg)
        self.big_g = CLIPTextTransformer(self.big_g_cfg)

        self._stage2_loaded = False
        self._load_stage1_weights()
        self._jit_cache: dict = {}
        self.last_dfb: dict | None = None  # set by every _refine_core run

    def _cast(self, tree):
        """fp32 -> bf16 storage cast, staged through the host so the
        transient fp32 copy never lands in HBM."""
        if self.cfg.params_dtype != "bf16" or self.debug_tiny:
            return tree
        cpus = jax.devices("cpu")
        host = cpus[0] if cpus else None
        accel = jax.devices()[0]

        def _leaf(x):
            if hasattr(x, "dtype") and x.dtype == jnp.float32:
                if host is not None:
                    x = jax.device_put(x, host)
                x = jnp.asarray(x, jnp.bfloat16)
            return jax.device_put(x, accel)

        return jax.tree_util.tree_map(_leaf, tree)

    # ------------------------------------------------------------- weights
    def _init_params(self, what: str, init_fn):
        log.warning("checkpoint for %s not found under %s — using seeded "
                    "random init (smoke mode, outputs are not meaningful)",
                    what, self.cfg.ckpt_dir)
        # stable across processes (Python's hash() is PYTHONHASHSEED-salted,
        # which made smoke/perf runs non-reproducible)
        import zlib
        seed = zlib.crc32(what.encode()) % (2**31)
        key = jax.random.PRNGKey(seed)
        if self.debug_tiny:
            return init_fn(key)
        if self.cfg.params_dtype != "bf16":
            # fp32 storage: the full-scale fp32 stack exceeds one chip's
            # HBM, so init on HOST (the pre-round-5 path)
            cpus = jax.devices("cpu")
            if cpus:
                with jax.default_device(cpus[0]):
                    return init_fn(key)
            return init_fn(key)
        # Full scale: generate the params ON DEVICE directly in the bf16
        # storage dtype, in ONE jit. The previous host fp32 `.init` +
        # per-leaf relay transfer of the whole Stage-2 stack measured
        # ~515 s per bench run (e2e_1024's dominant cost); eval_shape
        # gives the exact tree, and an init-faithful per-leaf rule (norm
        # scales 1, biases 0, kernels fan-in-scaled normals) reproduces
        # the real init's magnitudes so smoke activations stay in the
        # same regime. fp32 init on device is not an option: the full
        # stack's fp32 transient exceeds one chip's 16 GB HBM.
        shapes = jax.eval_shape(init_fn, key)
        paths_leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
        dtype = (jnp.bfloat16 if self.cfg.params_dtype == "bf16"
                 else jnp.float32)

        def _leaf(k, name, s):
            if not jnp.issubdtype(s.dtype, jnp.floating):
                return jnp.zeros(s.shape, s.dtype)
            dt = dtype
            if name == "bias" or s.ndim == 0:
                return jnp.zeros(s.shape, dt)
            if name == "scale":
                return jnp.ones(s.shape, dt)
            if name == "kernel" and s.ndim >= 2:
                # lecun_normal magnitude: fan_in = prod(all but last dim)
                fan_in = 1
                for d in s.shape[:-1]:
                    fan_in *= d
                return (jax.random.normal(k, s.shape, dt)
                        * (1.0 / fan_in) ** 0.5)
            return jax.random.normal(k, s.shape, dt) * 0.02

        def build(key):
            out = []
            for i, (path, s) in enumerate(paths_leaves):
                name = str(getattr(path[-1], "key", path[-1]))
                out.append(_leaf(jax.random.fold_in(key, i), name, s))
            return out
        leaves = jax.jit(build)(key)
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def _load_stage1_weights(self):
        cd = Path(self.cfg.ckpt_dir)
        scfg = self.sr3_cfg
        p = None if self.debug_tiny else ckpt.load_or_convert(
            cd, "sr3", [str(cd / "I1000000_E800_gen.pth")],
            lambda sd: convert.convert_sr3_unet(sd, scfg))
        self.sr3_params = self._cast(p if p is not None else self._init_params(
            "sr3", lambda k: self.sr3.init(
                k, jnp.zeros((1, scfg.image_size, scfg.image_size, 6)),
                jnp.ones((1, 1)))))

    def _ensure_stage2(self):
        """Lazy Stage-2 weight loading — stage1-only runs never pay for the
        SDXL/VAE/text-tower weights (the reference loads everything up
        front; lazy loading is strictly better here)."""
        if self._stage2_loaded:
            return
        self._load_stage2_weights()
        self._stage2_loaded = True

    def _load_stage2_weights(self):
        cd = Path(self.cfg.ckpt_dir)
        ucfg = self.sdxl_cfg
        lat = jnp.zeros((1, 8, 8, 4))
        tt = jnp.zeros((1,))
        ctx = jnp.zeros((1, 7, ucfg.context_dim))
        yv = jnp.zeros((1, ucfg.adm_in_channels))

        jug = str(cd / "juggernautXL_v8Rundiffusion.safetensors")
        srq = str(cd / "SR-v0Q.ckpt")

        p = None if self.debug_tiny else ckpt.load_or_convert(
            cd, "control", [jug, srq],
            lambda sd: convert.convert_glv_control(
                ckpt.strip_prefix(sd, "model.control_model"), ucfg))
        self.control_params = self._cast(p if p is not None else self._init_params(
            "control", lambda k: self.control.init(k, lat, lat, tt, ctx, yv)))

        # unet.init only needs the control features' SHAPES/dtypes — an
        # eval_shape costs nothing, whereas a real eager control forward
        # here dispatched hundreds of un-jitted ops through the TPU relay
        # (minutes of compile toll on first load, all for throwaway values)
        feats = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype),
            jax.eval_shape(lambda p: self.control.apply(p, lat, lat, tt, ctx,
                                                        yv),
                           self.control_params))
        p = None if self.debug_tiny else ckpt.load_or_convert(
            cd, "unet", [jug, srq],
            lambda sd: convert.convert_controlled_unet(
                ckpt.strip_prefix(sd, "model.diffusion_model"), ucfg))
        self.unet_params = self._cast(p if p is not None else self._init_params(
            "unet", lambda k: self.unet.init(k, lat, tt, ctx, yv, feats)))

        p = None if self.debug_tiny else ckpt.load_or_convert(
            cd, "vae", [jug, srq],
            lambda sd: convert.convert_autoencoder(
                ckpt.strip_prefix(sd, "first_stage_model"), self.vae_cfg))
        self.vae_params = self._cast(p if p is not None else self._init_params(
            "vae", lambda k: self.vae.init(k, jnp.zeros((1, 32, 32, 3)))))

        toks = jnp.zeros((1, 77), jnp.int32)
        p = None if self.debug_tiny else ckpt.load_or_convert(
            cd, "clip_l", [jug, srq],
            lambda sd: convert_hf.convert_hf_clip_text(
                ckpt.strip_prefix(sd, "conditioner.embedders.0.transformer"),
                self.clip_l_cfg))
        self.clip_l_params = self._cast(p if p is not None else self._init_params(
            "clip_l", lambda k: self.clip_l.init(k, toks)))

        p = None if self.debug_tiny else ckpt.load_or_convert(
            cd, "big_g", [jug, srq],
            lambda sd: convert_hf.convert_openclip_text(
                ckpt.strip_prefix(sd, "conditioner.embedders.1.model"),
                self.big_g_cfg))
        self.big_g_params = self._cast(p if p is not None else self._init_params(
            "big_g", lambda k: self.big_g.init(k, toks)))

        tok_dir = cd / "clip_vocab"
        try:
            self.tokenizer = CLIPTokenizer.from_dir(str(tok_dir))
        except FileNotFoundError:
            log.warning("CLIP tokenizer assets missing (%s) — using a "
                        "hash-bucket fallback tokenizer (smoke mode)", tok_dir)
            self.tokenizer = None

        self.llava = None
        if not self.cfg.no_llava and (not self.debug_tiny
                                      or self.llava_load_kw):
            try:
                from .models.vlm.captioner import LlavaCaptioner
                kw = {"quant": self.cfg.llava.quant or None,
                      "draft_dir": self.cfg.llava.draft_dir or None,
                      "spec_k": self.cfg.llava.spec_k,
                      "self_draft_layers": self.cfg.llava.self_draft_layers,
                      "lora_npz": self.cfg.llava.lora_npz or None,
                      "projector_npz": self.cfg.llava.projector_npz or None,
                      **(self.llava_load_kw or {})}
                self.llava = LlavaCaptioner.load(cd, mesh=self.mesh, **kw)
            except Exception as e:  # assets missing/partial
                log.warning("LLaVA load failed (%s) — captioning disabled", e)

    # ------------------------------------------------------------- stage 1
    def _stage1_sample_fn(self):
        """ddpm = the reference's full ancestral loop; ddim = few-step
        sampler on the same schedule (Stage1Config.sampler)."""
        apply_fn = lambda p, x, nl: self.sr3.apply(p, x, nl)
        s1 = self.cfg.stage1
        if s1.sampler == "ddim":
            return lambda p, c, r: sr3_sample_ddim(
                self.sr3_diff, apply_fn, p, c, r,
                num_steps=s1.ddim_steps, eta=s1.ddim_eta)
        return lambda p, c, r: sr3_sample(self.sr3_diff, apply_fn, p, c, r)

    def run_stage1(self, image_path: str) -> np.ndarray:
        """Bicubic x upscale + 500-step SR3 ancestral loop (infer.py:123-143).
        Returns uint8 HWC."""
        cond = load_lr_conditioning(image_path, self.cfg.upscale)[None]
        if self.debug_tiny:
            from .ops.image import resize_bicubic
            s = self.sr3_cfg.image_size
            cond = resize_bicubic(jnp.asarray(cond), (s, s))
        key = "stage1"
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._stage1_sample_fn())
        self.rng, sub = jax.random.split(self.rng)
        out = self._jit_cache[key](self.sr3_params, jnp.asarray(cond), sub)
        return to_uint8(np.asarray(out[0]))

    def run_stage1_batch(self, image_paths: list, mesh=None) -> list:
        """Folder-parallel Stage 1: images grouped by conditioning shape,
        each group stacked into ONE batched sr3_sample call sharded over the
        mesh's data axis (SURVEY P4: each chip runs the whole denoise loop on
        its shard of the batch). Returns uint8 arrays in input order."""
        conds = [load_lr_conditioning(str(p), self.cfg.upscale)
                 for p in image_paths]
        if self.debug_tiny:
            from .ops.image import resize_bicubic
            s = self.sr3_cfg.image_size
            conds = [np.asarray(resize_bicubic(jnp.asarray(c)[None], (s, s))[0])
                     for c in conds]
        groups: dict = {}
        for i, c in enumerate(conds):
            groups.setdefault(c.shape, []).append(i)

        key = "stage1_batch"
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._stage1_sample_fn())
        results: list = [None] * len(conds)
        n_dev = 1
        if mesh is not None:
            n_dev = int(np.prod(mesh.devices.shape))
        mesh_params: dict = {}

        def run_chunk(idxs, use_mesh):
            batch = jnp.asarray(np.stack([conds[i] for i in idxs]))
            params = self.sr3_params
            if use_mesh is not None:
                from .parallel import batch_sharding, replicate
                batch = jax.device_put(batch, batch_sharding(use_mesh, 4))
                # params are committed to ONE device by _cast; a jit mixing
                # them with a mesh-sharded batch raises 'incompatible
                # devices' — replicate them over this mesh (memoized: one
                # transfer per mesh per folder run)
                if id(use_mesh) not in mesh_params:
                    mesh_params[id(use_mesh)] = jax.device_put(
                        self.sr3_params, replicate(use_mesh))
                params = mesh_params[id(use_mesh)]
            self.rng, sub = jax.random.split(self.rng)
            out = np.asarray(self._jit_cache[key](params, batch, sub))
            for j, i in enumerate(idxs):
                results[i] = to_uint8(out[j])

        for shape, idxs in groups.items():
            # mesh-divisible head shards over the full mesh; the remainder
            # shards over a sub-mesh of exactly its size — no lane ever runs
            # the 500-step denoise on padding (the old path duplicated
            # leading images to reach divisibility and discarded the work)
            head = (len(idxs) // n_dev) * n_dev
            if head:
                run_chunk(idxs[:head], mesh)
            rem = len(idxs) - head
            if rem:
                sub_mesh = None
                if mesh is not None and rem > 1:
                    devs = mesh.devices.ravel()[:rem].reshape(rem, 1)
                    sub_mesh = jax.sharding.Mesh(devs, ("data", "tile"))
                run_chunk(idxs[head:], sub_mesh)
        return results

    # ------------------------------------------------------------ stage 2a
    def run_caption(self, sr_image) -> str:
        """LLaVA caption (infer.py:145-166). Empty when no_llava or the
        Llama/tokenizer assets are unavailable."""
        if self.cfg.no_llava:
            return ""
        self._ensure_stage2()
        if self.llava is None:
            log.warning("LLaVA assets not loaded — skipping captioning "
                        "(equivalent of --no_llava)")
            return ""
        return self.llava.caption(sr_image, self.cfg.llava)

    # ------------------------------------------------------------ stage 2b
    def _tokenize(self, texts):
        if self.tokenizer is not None:
            tl = self.tokenizer(texts, pad_id=None)   # HF pads with EOT
            tg = self.tokenizer(texts, pad_id=0)      # open_clip pads with 0
            return jnp.asarray(tl), jnp.asarray(tg)
        # fallback: deterministic hash buckets (smoke mode only) — crc32,
        # not hash(): Python's hash is PYTHONHASHSEED-salted, which would
        # make smoke runs non-reproducible across processes
        import zlib
        vocab = self.clip_l_cfg.vocab_size
        out = np.zeros((len(texts), 77), np.int32)
        for i, t in enumerate(texts):
            words = t.lower().split()[:75]
            out[i, 0] = 1
            for j, w in enumerate(words):
                out[i, j + 1] = (zlib.crc32(w.encode()) % (vocab - 3)) + 2
            out[i, len(words) + 1] = vocab - 1
        arr = jnp.asarray(out)
        return arr, arr

    def _make_sampler_cfg(self) -> RestoreEDMConfig:
        r = self.cfg.refine
        return RestoreEDMConfig(
            num_steps=r.edm_steps, cfg_scale=r.s_cfg,
            cfg_scale_start=r.spt_linear_cfg, use_linear_cfg=r.linear_cfg,
            restore_cfg=r.s_stage1, s_churn=r.s_churn, s_noise=r.s_noise,
            control_scale=r.s_stage2,
            use_linear_control_scale=r.linear_s_stage2,
            control_scale_start=r.spt_linear_s_stage2,
            img_threshold=r.img_threshold, dec_img=1.0)

    def _refine_core(self, x, texts_c):
        """The shared Stage-2b execution for BOTH the single-image and
        batched paths: x [N,H,W,3], texts_c one conditioning text per row.

        Split into FOUR jits (VAE prep / text conditioning / sampling scan /
        final decode) instead of one monolith — smaller XLA programs compile
        reliably through the remote-compile relay and the text-conditioning
        program is shared across image sizes. Returns (samples, x_stage1),
        both padded to x's extent (callers crop/color-fix)."""
        r = self.cfg.refine
        sampler_cfg = self._make_sampler_cfg()
        self.rng, k_enc, k_noise, k_loop = jax.random.split(self.rng, 4)
        tl_c, tg_c = self._tokenize(texts_c)
        tl_u, tg_u = self._tokenize([r.n_prompt] * len(texts_c))

        if "refine_prep" not in self._jit_cache:
            self._jit_cache["refine_prep"] = jax.jit(self._vae_prep_jit)
            self._jit_cache["refine_cond"] = jax.jit(self._cond_jit)
            self._jit_cache["refine_decode"] = jax.jit(self._decode_jit)
        # one jit per sampler config; jax.jit retraces per input shape
        skey = ("refine_sample", sampler_cfg)
        if skey not in self._jit_cache:
            self._jit_cache[skey] = jax.jit(
                lambda *a: self._sample_jit(sampler_cfg, *a))

        _z, x_stage1, z_stage1 = self._jit_cache["refine_prep"](
            self.vae_params, x, k_enc)
        cond, uc = self._jit_cache["refine_cond"](
            self.clip_l_params, self.big_g_params, tl_c, tg_c, tl_u, tg_u, _z)
        z, hits, steps, hit_trace = self._jit_cache[skey](
            self.unet_params, self.control_params, cond, uc, z_stage1,
            k_noise, k_loop)
        log.info("first-block cache (batch %d): %d/%d steps skipped "
                 "middle+decoder", x.shape[0], int(hits), int(steps))
        # observability for the dynamic acceleration: the MEASURED per-step
        # cache decisions of the last sampling run (bench e2e part reads
        # this to report a real dfb hit rate — round-4 review Weak #3)
        self.last_dfb = {"hits": int(hits), "steps": int(steps),
                         "trace": np.asarray(hit_trace)}
        samples = self._jit_cache["refine_decode"](self.vae_params, z)
        return samples, x_stage1

    def run_refinement(self, sr_image, caption: str,
                       use_bucket: bool = True) -> "Any":
        """just_sampling (models/SR_model.py:200-298) + color fix.
        sr_image: PIL image (the saved Stage-1 output). Returns PIL.

        use_bucket: edge-pad to the next size_bucket multiple so mixed /64
        sizes in a folder share one compiled 50-step sampling program (the
        padded margin is cropped off right after decode). Single-image runs
        pass False — there is no compile to reuse, so padding would only
        add compute."""
        from PIL import Image
        self._ensure_stage2()
        r = self.cfg.refine
        x, h0, w0 = pil_to_array(sr_image, upscale=1, min_size=r.min_size)
        if self.debug_tiny:
            from .ops.image import resize_bicubic
            x = np.asarray(resize_bicubic(jnp.asarray(x)[None], (64, 64))[0])
        h_real, w_real = x.shape[0], x.shape[1]
        if use_bucket and not self.debug_tiny:
            x = bucket_pad(np.asarray(x), r.size_bucket)
        x = jnp.asarray(x)[None]
        if r.num_samples > 1:  # just_sampling num_samples (SR_model.py:231-235)
            x = jnp.tile(x, (r.num_samples, 1, 1, 1))

        texts = [" ".join([caption, r.a_prompt])] * max(r.num_samples, 1)
        samples, x_stage1 = self._refine_core(x, texts)
        if samples.shape[1] != h_real or samples.shape[2] != w_real:
            samples = samples[:, :h_real, :w_real]
            x_stage1 = x_stage1[:, :h_real, :w_real]

        samples = self._colorfix(samples, x_stage1)
        pils = [array_to_pil(np.asarray(samples[i]), h0, w0)
                for i in range(samples.shape[0])]
        return pils[0] if len(pils) == 1 else pils

    def _colorfix(self, samples, x_stage1):
        """Jitted color fix (one fused program instead of dozens of eager
        conv dispatches at 1024^2 through the TPU relay); jax.jit retraces
        per input shape, so mixed folder shapes each get their own
        executable."""
        r = self.cfg.refine
        if r.color_fix_type == "Wavelet":
            key = "colorfix_wavelet"
            fn = colorfix.wavelet_reconstruction
        elif r.color_fix_type == "AdaIn":
            key = "colorfix_adain"
            fn = colorfix.adaptive_instance_normalization
        else:
            return samples
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key](samples, x_stage1)

    def run_refinement_batch(self, items) -> list:
        """Batched Stage-2b over several images sharing one bucketed shape.
        items: list of (sr_pil, caption). Measured on chip: the CFG-doubled
        denoise step costs the SAME at batch 1 and batch 2 (the step is
        weight-streaming-bound at these latent sizes), so folder refinement
        batches ~free — the reference refines strictly per image
        (infer_dir.py:154-174). Returns PIL images in order."""
        from PIL import Image
        self._ensure_stage2()
        r = self.cfg.refine
        if r.num_samples != 1 or len(items) == 1:
            return [self.run_refinement(p, c) for p, c in items]
        def _post_resize_hw(pil):
            # arithmetic mirror of pil_to_array's min_size scale + /64
            # rounding (no host resize just for this check)
            from .ops.image import round_to_multiple
            w, h = (float(v) for v in pil.size)
            if min(w, h) < r.min_size:
                s = r.min_size / min(w, h)
                w, h = w * s, h * s
            return round_to_multiple(h, 64), round_to_multiple(w, 64)

        if r.use_tile_vae and not self.debug_tiny:
            # _use_tiles sees the BUCKET-padded batch shape — test exactly
            # the extents the batch will be padded to, not per-image sizes
            bucket = r.size_bucket or 64
            hws = [_post_resize_hw(p) for p, _ in items]
            hb_c = max(-(-h // bucket) * bucket for h, _ in hws)
            wb_c = max(-(-w // bucket) * bucket for _, w in hws)
            if self._use_tiles((hb_c, wb_c)):
                # tiled VAE pools GroupNorm statistics over the tile axis —
                # batching images into that axis would mix cross-image
                # stats (and the tile splitter is per-image); keep the
                # reference's per-image semantics for tile-sized inputs
                return [self.run_refinement(p, c) for p, c in items]

        xs, metas = [], []
        for pil, _ in items:
            x, h0, w0 = pil_to_array(pil, upscale=1, min_size=r.min_size)
            if self.debug_tiny:
                from .ops.image import resize_bicubic
                x = np.asarray(resize_bicubic(jnp.asarray(x)[None],
                                              (64, 64))[0])
            xs.append(np.asarray(x))
            metas.append((x.shape[0], x.shape[1], h0, w0))
        # shared padded shape: the max bucketed extent of the group (the
        # caller groups by bucketed shape, so this is usually a no-op pad);
        # debug_tiny images are already a fixed 64x64 — do NOT stretch them
        # to the production 512 bucket
        bucket = 64 if self.debug_tiny else (r.size_bucket or 64)
        hb = max(-(-m[0] // bucket) * bucket for m in metas)
        wb = max(-(-m[1] // bucket) * bucket for m in metas)
        xs = [np.pad(x, ((0, hb - x.shape[0]), (0, wb - x.shape[1]), (0, 0)),
                     mode="edge") for x in xs]
        x = jnp.asarray(np.stack(xs))

        samples, x_stage1 = self._refine_core(
            x, [" ".join([cap, r.a_prompt]) for _, cap in items])

        outs = []
        for i, (h_real, w_real, h0, w0) in enumerate(metas):
            s_i = samples[i:i + 1, :h_real, :w_real]
            x1_i = x_stage1[i:i + 1, :h_real, :w_real]
            s_i = self._colorfix(s_i, x1_i)
            outs.append(array_to_pil(np.asarray(s_i[0]), h0, w0))
        return outs

    def _use_tiles(self, hw) -> bool:
        r = self.cfg.refine
        return r.use_tile_vae and min(hw) > r.encoder_tile_size

    def _vae_prep_jit(self, vae_params, x, k_enc):
        """encode_with_denoise -> decode -> (sampled) re-encode
        (just_sampling :254-256); tiled when configured (init_tile_vae
        parity, SR_model.py:95-125, tiles batched not looped)."""
        vae = self.vae
        r = self.cfg.refine
        if self._use_tiles(x.shape[1:3]):
            from .models.vae import tiled

            def enc_den(t):
                return vae.apply(vae_params, t, method=vae.encode_with_denoise)

            def dec(t):
                return vae.apply(vae_params, t, method=vae.decode)

            # tiles shard over the mesh's 'tile' axis with psum'd GroupNorm
            # stats (SURVEY P6) when a mesh is attached — the reference
            # walks tiles sequentially on one GPU (tilevae.py:893-956)
            _z = tiled.tiled_encode(enc_den, x, tile=r.encoder_tile_size,
                                    mesh=self.mesh)
            x_stage1 = tiled.tiled_decode(dec, _z, tile=r.decoder_tile_size,
                                          mesh=self.mesh)
            # sampled encode: tile the deterministic moments, sample ONCE on
            # the stitched latent — keeps the posterior draw independent of
            # the tile sharding layout (a per-tile rng inside shard_map
            # would draw different noise per shard shape)
            from .models.vae.model import DiagonalGaussian
            enc_m = lambda t: vae.apply(
                vae_params, t, method=lambda m, tt: m.quant_conv(m.encoder(tt)))
            moments = tiled.tiled_encode(enc_m, x_stage1,
                                         tile=r.encoder_tile_size,
                                         mesh=self.mesh)
            dg = DiagonalGaussian(moments)
            z_stage1 = self.vae_cfg.scale_factor * dg.sample(k_enc)
        else:
            _z = vae.apply(vae_params, x, method=vae.encode_with_denoise)
            x_stage1 = vae.apply(vae_params, _z, method=vae.decode)
            # reference z_stage1 encode SAMPLES the posterior
            # (AutoencoderKLInferenceWrapper, autoencoder.py:319-321)
            z_stage1 = vae.apply(vae_params, x_stage1, k_enc, method=vae.encode)
        return _z, x_stage1, z_stage1

    def _cond_jit(self, clip_l_params, big_g_params, tl_c, tg_c, tl_u, tg_u,
                  _z):
        cond = SDXLConditioner(self.clip_l, self.big_g, clip_l_params,
                               big_g_params)
        return cond.paired(tl_c, tg_c, tl_u, tg_u, _z)

    def _sample_jit(self, scfg, unet_params, control_params, cond, uc,
                    z_stage1, k_noise, k_loop):
        denoiser = ControlDenoiser(unet=self.unet, control_net=self.control,
                                   unet_params=unet_params,
                                   control_params=control_params)
        noise = jax.random.normal(k_noise, cond["control"].shape, jnp.float32)
        z, aux = restore_edm_sample(denoiser, cond, uc, noise, z_stage1, scfg,
                                    k_loop, return_aux=True)
        return z, aux["cache_hits"], aux["num_steps"], aux["hit_trace"]

    def _decode_jit(self, vae_params, z):
        vae = self.vae
        r = self.cfg.refine
        out_hw = (z.shape[1] * 8, z.shape[2] * 8)
        if self._use_tiles(out_hw):
            from .models.vae import tiled
            return tiled.tiled_decode(
                lambda t: vae.apply(vae_params, t, method=vae.decode), z,
                tile=r.decoder_tile_size, mesh=self.mesh)
        return vae.apply(vae_params, z, method=vae.decode)

    # ------------------------------------------------------------- driver
    def process(self, image_path: str | None = None):
        """Full three-stage run for one image (infer.py:206-215)."""
        from PIL import Image
        path = Path(image_path or self.cfg.input_img)
        out_dir = Path(self.cfg.output_dir)
        out_dir.mkdir(parents=True, exist_ok=True)

        t0 = time.perf_counter()
        sr_np = self.run_stage1(str(path))
        sr_pil = Image.fromarray(sr_np)
        sr_path = out_dir / f"sr3_{path.stem}.png"
        sr_pil.save(sr_path)
        log.info("stage1 done in %.2fs -> %s", time.perf_counter() - t0, sr_path)
        if self.cfg.stage1_only:
            return sr_pil

        t0 = time.perf_counter()
        caption = self.run_caption(sr_pil)
        log.info("stage2a caption (%.2fs): %s", time.perf_counter() - t0,
                 caption[:120])

        t0 = time.perf_counter()
        final = self.run_refinement(sr_pil, caption, use_bucket=False)
        finals = final if isinstance(final, list) else [final]
        for i, f in enumerate(finals):
            fp = out_dir / f"{path.stem}_final_{i}.png"
            f.save(fp)
            log.info("stage2b done in %.2fs -> %s", time.perf_counter() - t0, fp)
        return finals[0]


class ImageBatchProcessor:
    """Folder inference (infer_dir.py:76-206): per-image try/except, output
    trees output/ + sr3_output/."""

    def __init__(self, cfg: PipelineConfig, debug_tiny: bool = False,
                 mesh=None, caption_batch: int = 8, refine_batch: int = 4,
                 llava_load_kw: dict | None = None):
        self.cfg = cfg
        self.mesh = mesh  # shard batched stage-1 over the data axis
        self.caption_batch = max(int(caption_batch), 1)
        self.refine_batch = max(int(refine_batch), 1)
        self.debug_tiny = debug_tiny
        self.pipe = SuperResolutionPipeline(cfg, debug_tiny=debug_tiny,
                                            mesh=mesh,
                                            llava_load_kw=llava_load_kw)

    def run(self, batch_stage1: bool = True):
        from PIL import Image
        src = Path(self.cfg.image_dir)
        out_dir = Path(self.cfg.output_dir)
        final_dir = out_dir / "output"
        sr3_dir = out_dir / "sr3_output"
        final_dir.mkdir(parents=True, exist_ok=True)
        sr3_dir.mkdir(parents=True, exist_ok=True)

        exts = {".png", ".jpg", ".jpeg", ".tif", ".tiff", ".bmp"}
        images = sorted(p for p in src.iterdir() if p.suffix.lower() in exts)
        results = []

        stage1_out: dict = {}
        if batch_stage1 and len(images) > 1:
            try:
                outs = self.pipe.run_stage1_batch(images, mesh=self.mesh)
                stage1_out = dict(zip(images, outs))
            except Exception as e:
                log.exception("batched stage-1 failed (%s); falling back to "
                              "per-image", e)

        # batched Stage-2a: one LLM decode serves up to caption_batch
        # images — the per-step parameter stream dominates single-chip
        # decode, so folder captions cost ~1/B of the per-image loop
        # (the reference captions strictly per image, infer_dir.py:142-152)
        captions: dict = {}
        if (stage1_out and not self.cfg.stage1_only
                and not self.cfg.no_llava and len(images) > 1):
            try:
                self.pipe._ensure_stage2()
                if self.pipe.llava is not None:
                    todo = [p for p in images if stage1_out.get(p) is not None]
                    pils = [Image.fromarray(stage1_out[p]) for p in todo]
                    for i in range(0, len(todo), self.caption_batch):
                        caps = self.pipe.llava.caption_batch(
                            pils[i:i + self.caption_batch], self.cfg.llava)
                        captions.update(zip(todo[i:i + self.caption_batch],
                                            caps))
            except Exception as e:
                # keep the successfully captioned prefix — the per-image
                # loop below only recomputes the missing keys
                log.exception("batched captioning failed (%s); falling back "
                              "to per-image for the remainder", e)

        # stage 1 + captions per image; refinement-ready work accumulates
        ready: list = []   # (path, sr_pil, caption)
        statuses: dict = {}
        for p in images:
            try:
                sr_np = stage1_out.get(p)
                if sr_np is None:
                    sr_np = self.pipe.run_stage1(str(p))
                sr_pil = Image.fromarray(sr_np)
                sr_pil.save(sr3_dir / f"sr3_{p.stem}.png")
                if self.cfg.stage1_only:
                    statuses[p] = "stage1"
                    continue
                caption = captions.get(p)
                if caption is None:
                    caption = self.pipe.run_caption(sr_pil)
                ready.append((p, sr_pil, caption))
            except Exception as e:  # per-image resilience (infer_dir.py:198-202)
                log.exception("failed on %s: %s", p, e)
                statuses[p] = f"error: {e}"

        # batched Stage-2b: refinement is weight-streaming-bound, so images
        # whose bucketed shapes match share one CFG-doubled sampling program
        # at ~no extra cost per image (run_refinement_batch)
        groups: dict = {}
        for p, sr_pil, caption in ready:
            groups.setdefault(self._refine_group_key(sr_pil), []).append(
                (p, sr_pil, caption))
        def save_finals(p, final):
            # run_refinement returns a LIST when refine.num_samples > 1 —
            # one _final_{i}.png per sample (infer_dir.py naming), like
            # SuperResolutionPipeline.process
            finals = final if isinstance(final, list) else [final]
            for i, f in enumerate(finals):
                f.save(final_dir / f"{p.stem}_final_{i}.png")

        for key, members in groups.items():
            for i in range(0, len(members), self.refine_batch):
                chunk = members[i:i + self.refine_batch]
                try:
                    finals = self.pipe.run_refinement_batch(
                        [(s, c) for _, s, c in chunk])
                    for (p, _, _), final in zip(chunk, finals):
                        save_finals(p, final)
                        statuses[p] = "ok"
                except Exception as e:
                    log.exception("batched refinement failed (%s); falling "
                                  "back per-image", e)
                    for p, s, c in chunk:
                        try:
                            save_finals(p, self.pipe.run_refinement(s, c))
                            statuses[p] = "ok"
                        except Exception as e2:
                            log.exception("failed on %s: %s", p, e2)
                            statuses[p] = f"error: {e2}"
        results = [(p.name, statuses.get(p, "error: unprocessed"))
                   for p in images]
        return results

    def _refine_group_key(self, sr_pil):
        """Bucketed post-resize shape (images in one group stack into one
        batched sampling program). Computed arithmetically from the PIL size
        (mirroring pil_to_array's min_size scale + /64 rounding) — no host
        resize just to derive the bucket key."""
        if self.debug_tiny:
            return (64, 64)
        from .ops.image import round_to_multiple
        w, h = sr_pil.size
        w, h = float(w), float(h)
        if min(w, h) < self.cfg.refine.min_size:
            s = self.cfg.refine.min_size / min(w, h)
            w *= s
            h *= s
        hh, ww = round_to_multiple(h, 64), round_to_multiple(w, 64)
        b = self.cfg.refine.size_bucket or 64
        return (-(-hh // b) * b, -(-ww // b) * b)
