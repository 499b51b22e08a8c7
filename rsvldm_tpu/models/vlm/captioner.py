"""LLaVA captioner: asset loading, LoRA merge, caption orchestration.

Parity target: /root/reference models/util.py load_llava (:111-117 — HF
llama3-llava-next-8b + PEFT adapter ./CKPT_PTH/Llava-next) and
get_img_describe (:17-66). The PEFT adapter is merged into the base weights
at conversion time (convert_hf.merge_lora) so no runtime adapter math runs.

Expected assets under <ckpt_dir>/llava/ (a local HF checkout):
  *.safetensors (sharded LLaVA weights: language model + vision tower +
  mm_projector + image_newline), tokenizer files readable by transformers
  AutoTokenizer; optional <ckpt_dir>/Llava-next/ PEFT adapter.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import logging
import os
import re
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...utils import convert_hf
from ...utils.checkpoint import load_torch_state_dict
from .generate import GenerateConfig, caption_image, caption_images
from .llama import LLAMA3_8B_CONFIG, LlamaModel
from .projector import MLPProjector
from .vision import CLIP_VIT_L_336_CONFIG, CLIPVisionTower

log = logging.getLogger("rsvldm")


def _load_sharded(d: Path) -> dict:
    sd: dict = {}
    for shard in sorted(glob.glob(str(d / "*.safetensors"))):
        sd.update(load_torch_state_dict(shard))
    if not sd:
        for shard in sorted(glob.glob(str(d / "pytorch_model*.bin"))):
            sd.update(load_torch_state_dict(shard))
    return sd


def _apply_lora(sd: dict, adapter_dir: Path) -> dict:
    """Fold a PEFT adapter into the base state dict (key-by-key merge)."""
    cfg_path = adapter_dir / "adapter_config.json"
    scale = 1.0
    if cfg_path.exists():
        with open(cfg_path) as f:
            acfg = json.load(f)
        scale = acfg.get("lora_alpha", 16) / max(acfg.get("r", 16), 1)
    asd = _load_sharded(adapter_dir)
    if not asd:
        for p in glob.glob(str(adapter_dir / "adapter_model*")):
            asd.update(load_torch_state_dict(p))
    merged = dict(sd)
    n = 0
    for k in list(asd.keys()):
        m = re.match(r"base_model\.model\.(.+)\.lora_A(?:\.default)?\.weight", k)
        if not m:
            continue
        base_key = m.group(1) + ".weight"
        b_key = k.replace("lora_A", "lora_B")
        if base_key in merged and b_key in asd:
            merged[base_key] = convert_hf.merge_lora(
                np.asarray(merged[base_key], np.float32), asd[k], asd[b_key],
                scale)
            n += 1
    log.info("merged %d LoRA deltas (scale %.3f)", n, scale)
    return merged


def _llama_config_from_json(d: Path, base: "LlamaConfig") -> "LlamaConfig":
    """Resolve a LlamaConfig from an HF config.json (draft checkpoints ship
    their own geometry); missing keys inherit from `base`."""
    p = d / "config.json"
    if not p.exists():
        return base
    with open(p) as f:
        raw = json.load(f)
    return dataclasses.replace(
        base,
        vocab_size=raw.get("vocab_size", base.vocab_size),
        dim=raw.get("hidden_size", base.dim),
        layers=raw.get("num_hidden_layers", base.layers),
        heads=raw.get("num_attention_heads", base.heads),
        kv_heads=raw.get("num_key_value_heads", base.kv_heads),
        ffn_dim=raw.get("intermediate_size", base.ffn_dim),
        rope_theta=raw.get("rope_theta", base.rope_theta),
        rms_eps=raw.get("rms_norm_eps", base.rms_eps),
        tie_lm_head=raw.get("tie_word_embeddings", base.tie_lm_head),
    )


class LlavaCaptioner:
    def __init__(self, llama, llama_params, vision, vision_params,
                 projector, projector_params, image_newline, tokenizer,
                 mesh=None, draft=None, draft_params=None, spec_k: int = 4):
        self.llama = llama
        self.llama_params = llama_params
        self.vision = vision
        self.vision_params = vision_params
        self.projector = projector
        self.projector_params = projector_params
        self.image_newline = image_newline
        self.tokenizer = tokenizer
        self.mesh = mesh
        # speculative decoding (models/vlm/speculative.py): a small
        # Llama-family draft proposes spec_k tokens per jitted round, the
        # 8B target verifies them in ONE forward — output-identical to
        # vanilla `generate` (greedy exactly; sampled via the Leviathan
        # rule on generate's key schedule)
        self.draft = draft
        self.draft_params = draft_params
        self.spec_k = spec_k

    @classmethod
    def load(cls, ckpt_dir: str | Path, llama_cfg=LLAMA3_8B_CONFIG,
             vision_cfg=CLIP_VIT_L_336_CONFIG,
             tokenizer=None, mesh=None,
             quant: str | None = None,
             draft_dir: str | Path | None | bool = None,
             spec_k: int = 4,
             self_draft_layers: int = 0,
             lora_npz: str | Path | None = None,
             projector_npz: str | Path | None = None
             ) -> Optional["LlavaCaptioner"]:
        """mesh: optional jax.sharding.Mesh — the 8B decoder weights are
        tensor-sharded over its 'data' axis (Megatron col/row rules,
        parallel/llama_sharding.py) so the caption stage, the wall-clock
        dominant stage, scales over the slice instead of one chip (the
        reference pins LLaVA to its own single GPU, infer.py:31-32).

        quant='int8'|'int4': weight-only quantized decoder
        (llama.quantize_llama_params; the builder.py:33-37 bitsandbytes
        8/4-bit equivalents) — 8B fits ONE 16 GB chip (int8 ~8.5 GB,
        int4 ~4.3 GB) and the memory-bound decode streams half / quarter
        the bytes (59.5 tok/s int8 measured at the full geometry). Composes
        with mesh TP: kernel_q/kernel_q4 shard like the dense kernel,
        scales follow (parallel/llama_sharding.py).

        draft_dir: optional Llama-family draft checkpoint (safetensors +
        config.json) for speculative decoding — defaults to
        <ckpt_dir>/llava_draft/ when that directory exists; pass False to
        disable speculative decoding entirely (skip the auto-discovery —
        the engine's prefix-cache/chunked-prefill modes do not compose
        with a draft). The draft must
        share the target's hidden dim and tokenizer (depth-pruned /
        distilled drafts); it is quantized with the same `quant` mode.
        spec_k: draft tokens proposed per verify round.
        self_draft_layers: when no draft checkpoint is available, build a
        depth-pruned SELF-draft from the target's first N layers
        (speculative.py::self_draft — zero extra HBM, output always exact;
        only the acceptance rate, i.e. speed, depends on N).

        lora_npz: adapter archive from train_vlm.py (save_lora_npz). On an
        fp base the adapters fold into the kernels; on a quantized base
        they attach as the runtime "lora" collection (the exact QLoRA
        serving path — quantized kernels cannot absorb a fold-in), which
        every decode entry (generate / engine / speculative target) sees
        because `params` IS the variables dict."""
        d = Path(ckpt_dir) / "llava"
        if not d.is_dir():
            return None
        sd = _load_sharded(d)
        if not sd:
            return None
        adapter = Path(ckpt_dir) / "Llava-next"
        if adapter.is_dir():
            sd = _apply_lora(sd, adapter)

        llama = LlamaModel(dataclasses.replace(llama_cfg, quant=quant)
                           if quant else llama_cfg)
        llama_params = convert_hf.convert_llama(sd, llama_cfg)
        if quant in ("int8", "int4"):
            from .llama import quantize_llama_params
            llama_params = {"params": quantize_llama_params(
                llama_params["params"], embed_dtype=jnp.bfloat16,
                mode=quant)}
        if lora_npz:
            from ...training.vlm_trainer import (apply_lora, load_lora_npz,
                                                 quant_mode, runtime_lora)
            lora, lcfg = load_lora_npz(lora_npz)
            if quant_mode(llama_params):
                llama_params = {**llama_params,
                                "lora": runtime_lora(lora, lcfg.scale)}
            else:
                llama_params = apply_lora(llama_params, lora, lcfg.scale)
            log.info("LoRA adapters attached from %s (r=%d, %s)", lora_npz,
                     lcfg.r, "runtime branch" if quant else "folded")

        vision = CLIPVisionTower(vision_cfg)
        vsd = {k[len("model.vision_tower.vision_tower."):]: v
               for k, v in sd.items()
               if k.startswith("model.vision_tower.vision_tower.")}
        vision_params = convert_hf.convert_hf_clip_vision(vsd, vision_cfg)
        projector = MLPProjector(out_dim=llama_cfg.dim)
        projector_params = convert_hf.convert_mm_projector(sd)
        if projector_npz:
            # train_vlm.py artifact (pretrain stage / joint finetune):
            # replaces the checkpoint's mm_projector wholesale
            from ...training.vlm_trainer import load_projector_npz
            projector_params = load_projector_npz(projector_npz)
            log.info("projector weights replaced from %s", projector_npz)
        newline = jnp.asarray(np.asarray(sd["model.image_newline"], np.float32))

        if mesh is not None:
            from ...parallel.llama_sharding import shard_llama_params
            from ...parallel.mesh import replicate
            llama_params = shard_llama_params(llama_params, mesh)
            rep = replicate(mesh)
            vision_params = jax.device_put(vision_params, rep)
            projector_params = jax.device_put(projector_params, rep)
            newline = jax.device_put(newline, rep)

        if tokenizer is None:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(str(d),
                                                      local_files_only=True)

        draft = draft_params = None
        if draft_dir is False:
            dd = Path("/nonexistent-draft-disabled")  # skip auto-discovery
            draft_dir = None
        else:
            dd = (Path(draft_dir) if draft_dir
                  else Path(ckpt_dir) / "llava_draft")
        if dd.is_dir() and mesh is not None:
            # don't pay the draft load just to refuse it at decode time
            # (_generate_fn: the spec KV caches are not TP-sharded)
            log.warning("draft at %s ignored: speculative decoding and "
                        "mesh TP are not composed", dd)
        elif dd.is_dir():
            dsd = _load_sharded(dd)
            if not dsd and draft_dir:
                raise FileNotFoundError(
                    f"--draft_dir {dd} contains no safetensors weights")
            if dsd:
                dcfg = _llama_config_from_json(dd, llama_cfg)
                if dcfg.dim != llama_cfg.dim:
                    raise ValueError(
                        f"draft hidden dim {dcfg.dim} != target "
                        f"{llama_cfg.dim} — speculative decoding feeds the "
                        "spliced prompt embeds to both models")
                if dcfg.vocab_size != llama_cfg.vocab_size:
                    raise ValueError(
                        f"draft vocab {dcfg.vocab_size} != target "
                        f"{llama_cfg.vocab_size} — the acceptance rule "
                        "compares the two token distributions elementwise "
                        "(the models must share a tokenizer)")
                draft = LlamaModel(dataclasses.replace(dcfg, quant=quant)
                                   if quant else dcfg)
                draft_params = convert_hf.convert_llama(dsd, dcfg)
                if quant in ("int8", "int4"):
                    from .llama import quantize_llama_params
                    draft_params = {"params": quantize_llama_params(
                        draft_params["params"], embed_dtype=jnp.bfloat16,
                        mode=quant)}
                log.info("speculative draft loaded from %s (%d layers, "
                         "k=%d)", dd, dcfg.layers, spec_k)
        elif draft_dir:
            raise FileNotFoundError(f"--draft_dir {dd} does not exist")
        if draft is None and self_draft_layers and mesh is not None:
            log.warning("self_draft_layers ignored: speculative decoding "
                        "and mesh TP are not composed")
        if draft is None and self_draft_layers and mesh is None:
            # depth-pruned self-draft: zero extra weights, correctness
            # guaranteed for any draft (speculative.py::self_draft)
            from .speculative import self_draft
            draft, draft_params = self_draft(llama_params, llama.cfg,
                                             self_draft_layers)
            log.info("self-draft: first %d of %d target layers",
                     self_draft_layers, llama.cfg.layers)
        return cls(llama, llama_params, vision, vision_params, projector,
                   projector_params, newline, tokenizer, mesh=mesh,
                   draft=draft, draft_params=draft_params, spec_k=spec_k)

    def _gen_setup(self, llava_cfg):
        """Shared caption()/caption_batch() plumbing: GenerateConfig +
        tokenizer/tower/projector closures (one definition so the single
        and batched paths cannot drift)."""
        cfg = GenerateConfig(max_new_tokens=llava_cfg.max_new_tokens,
                             temperature=llava_cfg.temperature,
                             do_sample=llava_cfg.do_sample)
        encode = lambda s: self.tokenizer.encode(s, add_special_tokens=False)
        decode = lambda ids: self.tokenizer.decode(ids,
                                                   skip_special_tokens=True)
        vision_apply = lambda px: self.vision.apply(self.vision_params, px)
        proj_apply = lambda f: self.projector.apply(self.projector_params, f)
        return cfg, encode, decode, vision_apply, proj_apply

    def caption(self, image, llava_cfg, rng: jax.Array | None = None) -> str:
        """Full Stage-2a on one PIL image (get_img_describe parity)."""
        prompt = llava_cfg.img_prompt.format(DEFAULT_IMAGE_TOKEN="<image>")
        cfg, encode, decode, vision_apply, proj_apply = \
            self._gen_setup(llava_cfg)
        return caption_image(self.llama, self.llama_params, vision_apply,
                             proj_apply, image, prompt, encode, decode,
                             self.image_newline, cfg, rng,
                             patch_size=self.vision.cfg.image_size,
                             mesh=self.mesh, generate_fn=self._generate_fn())

    def _generate_fn(self):
        """Decode override for caption_image: the speculative round loop
        when a draft is loaded (single-chip only — the spec KV caches are
        not TP-sharded), vanilla scan decode otherwise."""
        if self.draft is None:
            return None
        if self.mesh is not None:
            log.warning("speculative decoding skipped: draft + mesh TP are "
                        "not composed — using vanilla decode")
            return None
        from .speculative import speculative_generate
        return lambda model, params, spliced, cfg, rng, mesh=None: \
            speculative_generate(model, params, self.draft,
                                 self.draft_params, spliced, cfg, rng,
                                 k=self.spec_k)

    def video_features(self, frames, stride: int = 2,
                       pool_mode: str = "bilinear",
                       newline_position: str = "grid") -> jnp.ndarray:
        """List of PIL frames -> the flat spliceable video token stream
        [T', D] (llava_arch.py:289-352 video branch; defaults are the
        reference train defaults, train.py:93-114). Frames go through the
        CLIP processor transform — shortest-edge resize + center crop
        (train.py:1197 processor.preprocess(video)), NOT anyres tiling and
        NOT an aspect-distorting square resize; every frame runs the
        tower+projector in ONE batched call, then
        video.py::video_feature_stream pools and places newline tokens."""
        from .video import clip_preprocess_frame, video_feature_stream
        from .vision import normalize_pixels
        s = self.vision.cfg.image_size
        px = np.stack([clip_preprocess_frame(f, s) for f in frames])
        feats = self.projector.apply(
            self.projector_params,
            self.vision.apply(self.vision_params,
                              normalize_pixels(jnp.asarray(px))))
        return video_feature_stream(feats, jnp.asarray(self.image_newline),
                                    stride=stride, pool_mode=pool_mode,
                                    newline_position=newline_position)

    def embed_mm(self, prompt: str, images):
        """Multimodal prompt embedder for the serving engine
        (LLMWorker(embed_mm=cap.embed_mm)): one anyres feature stream per
        <image> placeholder, spliced in order
        (generate.py::embed_multimodal_prompt)."""
        from .generate import embed_multimodal_prompt
        encode = lambda s: self.tokenizer.encode(s, add_special_tokens=False)
        return embed_multimodal_prompt(
            self.llama, self.llama_params,
            lambda px: self.vision.apply(self.vision_params, px),
            lambda f: self.projector.apply(self.projector_params, f),
            prompt, images, encode, self.image_newline,
            patch_size=self.vision.cfg.image_size)

    def caption_batch(self, images, llava_cfg,
                      rng: jax.Array | None = None) -> list:
        """Folder-batched Stage-2a: one decode serves every image (the
        per-step weight stream is the single-chip bottleneck)."""
        prompt = llava_cfg.img_prompt.format(DEFAULT_IMAGE_TOKEN="<image>")
        cfg, encode, decode, vision_apply, proj_apply = \
            self._gen_setup(llava_cfg)
        return caption_images(self.llama, self.llama_params, vision_apply,
                              proj_apply, images, prompt, encode, decode,
                              self.image_newline, cfg, rng,
                              patch_size=self.vision.cfg.image_size,
                              mesh=self.mesh)
