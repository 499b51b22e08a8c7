#!/usr/bin/env python
"""LLaVA supervised finetuning CLI.

Parity surface: /root/reference/llava/train/train.py (the `train()` entry
its shell scripts drive) — conversation-JSON data, per-template masking,
LoRA on the LM projections, optional 8/4-bit frozen base (QLoRA,
train.py:1471-1529), gradient checkpointing, length-grouped batching.

TPU design: one jitted loss+grad+adamw step over the LoRA tree only
(training/vlm_trainer.py — the frozen base never enters optimizer state);
quantized bases run the s8-MXU forward with an STE backward and a runtime
low-rank adapter branch; `--gradient_checkpointing` maps to
LlamaConfig.remat (per-block jax.checkpoint). Image records use the
LLaVA-1.5 "pad" recipe (expand2square -> one 336px tile -> projector);
text records skip the vision tower. Batches are padded to a few jit
buckets (--pad_to) so an epoch reuses a handful of executables.

Real checkpoints:
  python train_vlm.py --ckpt_dir ckpts --data_path train.json \
      --image_folder imgs --output_dir out --bits 8 --lora_r 16 --steps 200

Smoke (no checkpoints: tiny random model + deterministic hash tokenizer):
  python train_vlm.py --smoke --data_path train.json --output_dir out \
      --steps 20 --platform cpu
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
import zlib
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ckpt_dir", default="ckpts")
    p.add_argument("--data_path", required=True,
                   help="conversation JSON/JSONL (llava train format)")
    p.add_argument("--image_folder", default=None)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--template", default="llama_3",
                   choices=["llama_3", "chatml", "v1", "plain"])
    p.add_argument("--bits", type=int, default=8, choices=[16, 8, 4],
                   help="frozen-base precision (8/4 = QLoRA)")
    p.add_argument("--lora_r", type=int, default=16)
    p.add_argument("--lora_alpha", type=int, default=16)
    p.add_argument("--tune", default="lora",
                   help="comma list of {lora, projector}: 'projector' "
                        "alone = the reference pretrain stage "
                        "(tune_mm_mlp_adapter); 'lora,projector' = joint "
                        "finetune with --mm_projector_lr as the "
                        "projector's param-group lr")
    p.add_argument("--mm_projector_lr", type=float, default=None)
    p.add_argument("--image_aspect_ratio", default="pad",
                   choices=["pad", "anyres"],
                   help="pad = LLaVA-1.5 square recipe; anyres = the "
                        "llava-next multi-tile finetune recipe (LoRA "
                        "tuning only — the projector path needs a fixed "
                        "per-image token count)")
    p.add_argument("--video_folder", default=None,
                   help="root for records with a 'video' key: frame "
                        "folders (shareVideoGPTV paths) or container "
                        "files (mp4/avi via OpenCV)")
    p.add_argument("--video_fps", type=int, default=1)
    p.add_argument("--frames_upbound", type=int, default=0)
    p.add_argument("--force_sample", action="store_true")
    p.add_argument("--add_time_instruction", action="store_true")
    p.add_argument("--mm_spatial_pool_stride", type=int, default=2)
    p.add_argument("--mm_spatial_pool_mode", default="bilinear",
                   choices=["average", "max", "bilinear"])
    p.add_argument("--mm_newline_position", default="grid",
                   choices=["grid", "frame", "one_token", "no_token"])
    p.add_argument("--dpo", action="store_true",
                   help="preference optimization over {prompt, chosen, "
                        "rejected} records (train_dpo.py); LoRA-only, the "
                        "frozen base is the reference policy")
    p.add_argument("--dpo_beta", type=float, default=0.1)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=1)
    p.add_argument("--steps", type=int, default=0,
                   help="stop after N steps (0 = full epochs)")
    p.add_argument("--max_length", type=int, default=2048)
    p.add_argument("--pad_to", type=int, default=64)
    p.add_argument("--save_every", type=int, default=500)
    p.add_argument("--num_workers", type=int, default=4,
                   help="threaded record-decode workers (DataLoader "
                        "num_workers equivalent; 0 = inline). Order-"
                        "preserving, so the training stream is identical "
                        "for any worker count")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--gradient_checkpointing", action="store_true",
                   default=True)
    p.add_argument("--no_gradient_checkpointing", action="store_false",
                   dest="gradient_checkpointing")
    p.add_argument("--smoke", action="store_true",
                   help="tiny random model, no checkpoints needed")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu) before backend init")
    return p.parse_args(argv)


def to_unit_pixels(pixels):
    """uint8 [0,255] image array -> float [0,1] for normalize_pixels
    (which CLIP-normalizes UNIT-range input — feeding it raw uint8 values
    silently produced wildly out-of-distribution tower inputs)."""
    import jax.numpy as jnp
    return jnp.asarray(pixels, jnp.float32) / 255.0


def _hash_encode(text: str):
    """Deterministic whitespace tokenizer for --smoke (crc32, not hash():
    stable across processes)."""
    return [2 + zlib.crc32(w.encode()) % 498 for w in text.split()]


def _smoke_setup():
    import jax
    import jax.numpy as jnp

    from rsvldm_tpu.models.vlm.llama import (KVCache, LlamaConfig,
                                             LlamaModel,
                                             quantize_llama_params)
    from rsvldm_tpu.training.vlm_data import Llama3Special
    cfg = LlamaConfig(vocab_size=512, dim=32, layers=2, heads=4, kv_heads=2,
                      ffn_dim=64, dtype=jnp.float32)
    model = LlamaModel(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32),
                        KVCache.init(cfg, 1, 8), 0, method=model.from_tokens)
    sp = Llama3Special(bos=501, start_header=502, end_header=503, eot=504,
                       nl=505)
    return cfg, model, params, _hash_encode, {"sp": sp}


def reserve_image_span(ids, labels, embed_fn, t, ignore_index):
    """Expand IMAGE_TOKEN_INDEX into a ZERO-filled t-row span (labels
    IGNORE there) and return its position — the projector fills the span
    INSIDE the train step so its grads flow (MMTrainer.mm_loss)."""
    import jax.numpy as jnp

    from rsvldm_tpu.models.vlm.generate import IMAGE_TOKEN_INDEX
    ids = np.asarray(ids)
    labels = np.asarray(labels)
    where = np.where(ids == IMAGE_TOKEN_INDEX)[0]
    if not where.size:
        raise SystemExit(
            "record has an 'image' field but no '<image>' token in its "
            "conversation text — projector tuning needs the placeholder")
    pos = int(where[0])
    emb = embed_fn(np.where(ids == IMAGE_TOKEN_INDEX, 0, ids))
    emb = jnp.concatenate([emb[:pos],
                           jnp.zeros((t, emb.shape[1]), emb.dtype),
                           emb[pos + 1:]], axis=0)
    labels = np.concatenate([labels[:pos],
                             np.full((t,), ignore_index, labels.dtype),
                             labels[pos + 1:]])
    return emb, labels, pos


def splice_training_sample(ids, labels, embed_fn, feats, ignore_index):
    """ids may hold one IMAGE_TOKEN_INDEX; expand it to the image feature
    stream and pad the labels span with IGNORE (llava_arch.py:447-495 at
    training time). Returns (embeds [S', D], labels [S'])."""
    import jax.numpy as jnp

    from rsvldm_tpu.models.vlm.generate import IMAGE_TOKEN_INDEX
    ids = np.asarray(ids)
    labels = np.asarray(labels)
    emb = embed_fn(np.where(ids == IMAGE_TOKEN_INDEX, 0, ids))
    img_pos = np.where(ids == IMAGE_TOKEN_INDEX)[0]
    if img_pos.size and feats is not None:
        pos = int(img_pos[0])
        emb = jnp.concatenate([emb[:pos], feats, emb[pos + 1:]], axis=0)
        labels = np.concatenate([
            labels[:pos], np.full((feats.shape[0],), ignore_index,
                                  labels.dtype), labels[pos + 1:]])
    return emb, labels


def main(argv=None):
    args = parse_args(argv)
    from rsvldm_tpu.utils.compile_cache import cli_setup
    cli_setup(args.platform)
    import jax
    import jax.numpy as jnp

    from rsvldm_tpu.models.vlm.anyres import expand2square
    from rsvldm_tpu.models.vlm.llama import KVCache, LlamaModel
    from rsvldm_tpu.models.vlm.vision import CLIP_MEAN, normalize_pixels
    from rsvldm_tpu.training.vlm_data import (LazyConversationDataset,
                                              LazyPreferenceDataset,
                                              get_modality_length_grouped_indices)
    from rsvldm_tpu.training.vlm_trainer import (IGNORE_INDEX, LoraConfig,
                                                 VLMTrainer, save_lora_npz)

    if args.force_sample and args.frames_upbound <= 0:
        sys.exit("--force_sample samples exactly --frames_upbound frames; "
                 "pass --frames_upbound N (> 0)")
    quant = {16: None, 8: "int8", 4: "int4"}[args.bits]
    tune = tuple(t.strip() for t in args.tune.split(",") if t.strip())
    assert set(tune) <= {"lora", "projector"} and tune, args.tune
    if args.dpo and tune != ("lora",):
        sys.exit("--dpo optimizes LoRA adapters only (the frozen base is "
                 "the reference policy) — use --tune lora")
    feats_fn = None          # projected features  (lora-only path)
    feats_raw_fn = None      # pre-projector tower features (MMTrainer)
    video_feats_fn = None    # PIL frames -> flat video stream (lora path)
    projector = proj_params = None
    img_tokens = 0
    process_image = None
    if args.smoke:
        cfg, model, params, encode, pre_kw = _smoke_setup()
        if quant:
            from rsvldm_tpu.models.vlm.llama import quantize_llama_params
            params = {"params": quantize_llama_params(params["params"],
                                                      mode=quant)}
            model = LlamaModel(dataclasses.replace(cfg, quant=quant))
        cfg = model.cfg

        def video_feats_fn(frames, _dim=cfg.dim):
            # smoke: deterministic fake features so the video SPLICE path
            # runs (not just the dataset decode)
            return jax.random.normal(jax.random.PRNGKey(13),
                                     (len(frames) * 4, _dim))
        if "projector" in tune:
            from rsvldm_tpu.models.vlm.projector import MLPProjector
            img_tokens, dv = 4, 8
            projector = MLPProjector(out_dim=cfg.dim, dtype=jnp.float32)
            proj_params = projector.init(jax.random.PRNGKey(7),
                                         jnp.zeros((1, img_tokens, dv)))
            process_image = lambda path: path  # no pixels in smoke

            def feats_raw_fn(_):
                return jax.random.normal(jax.random.PRNGKey(11),
                                         (img_tokens, dv))
    else:
        from rsvldm_tpu.models.vlm.captioner import LlavaCaptioner
        cap = LlavaCaptioner.load(args.ckpt_dir, quant=quant)
        if cap is None:
            sys.exit(f"no checkpoint under {args.ckpt_dir}/llava — pass "
                     "--smoke for a random tiny model")
        cfg = dataclasses.replace(cap.llama.cfg,
                                  remat=args.gradient_checkpointing)
        model = LlamaModel(cfg)
        params = cap.llama_params
        encode = lambda s: cap.tokenizer.encode(s, add_special_tokens=False)
        pre_kw = {}
        if args.template == "plain":
            # reference preprocess_plain leads with the tokenizer's BOS
            # (None = no BOS for tokenizers that don't define one)
            pre_kw["bos"] = getattr(cap.tokenizer, "bos_token_id", None)
        size = cap.vision.cfg.image_size
        bg = tuple(int(255 * m) for m in CLIP_MEAN)

        if args.image_aspect_ratio == "anyres":
            if "projector" in tune:
                sys.exit("--image_aspect_ratio anyres supports LoRA "
                         "tuning only (variable per-image token count)")
            from rsvldm_tpu.models.vlm.generate import anyres_image_features

            def process_image(path):
                from PIL import Image
                return Image.open(path).convert("RGB")

            def feats_fn(image):  # PIL -> [T(image), D] anyres stream
                return anyres_image_features(
                    lambda px: cap.vision.apply(cap.vision_params, px),
                    lambda f: cap.projector.apply(cap.projector_params, f),
                    image, cap.image_newline, size)
        else:
            def process_image(path):
                from PIL import Image
                img = expand2square(Image.open(path).convert("RGB"), bg)
                return np.asarray(img.resize((size, size), Image.BICUBIC))

            def feats_fn(pixels):  # [336,336,3] uint8 -> [576, D]
                px = normalize_pixels(to_unit_pixels(pixels)[None])
                return cap.projector.apply(
                    cap.projector_params,
                    cap.vision.apply(cap.vision_params, px))[0]

        def feats_raw_fn(pixels):  # pre-projector tower features
            px = normalize_pixels(to_unit_pixels(pixels)[None])
            return cap.vision.apply(cap.vision_params, px)[0]

        def video_feats_fn(frames):  # PIL frames -> flat video stream
            return cap.video_features(
                frames, stride=args.mm_spatial_pool_stride,
                pool_mode=args.mm_spatial_pool_mode,
                newline_position=args.mm_newline_position)

        if "projector" in tune:
            projector = cap.projector
            proj_params = cap.projector_params
            img_tokens = (size // cap.vision.cfg.patch_size) ** 2

    ds_cls = LazyPreferenceDataset if args.dpo else LazyConversationDataset
    ds = ds_cls(args.data_path, encode, template=args.template,
                image_folder=args.image_folder,
                process_image=process_image, preprocess_kw=pre_kw,
                video_folder=args.video_folder or "",
                video_fps=args.video_fps,
                frames_upbound=args.frames_upbound,
                force_sample=args.force_sample,
                add_time_instruction=args.add_time_instruction)
    lcfg = LoraConfig(r=args.lora_r, alpha=args.lora_alpha)
    if args.dpo:
        from rsvldm_tpu.training.vlm_trainer import DPOTrainer
        trainer = DPOTrainer(model, params, lcfg, lr=args.lr,
                             beta=args.dpo_beta,
                             rng=jax.random.PRNGKey(args.seed))
    elif tune == ("lora",):
        trainer = VLMTrainer(model, params, lcfg, lr=args.lr,
                             rng=jax.random.PRNGKey(args.seed))
    else:
        from rsvldm_tpu.training.vlm_trainer import MMTrainer
        trainer = MMTrainer(model, params, projector, proj_params, lcfg,
                            tune=tune, lr=args.lr,
                            mm_projector_lr=args.mm_projector_lr,
                            rng=jax.random.PRNGKey(args.seed))
    embed_fn = lambda ids: model.apply(params, jnp.asarray(ids),
                                       method=model.embed)

    out = Path(args.output_dir)
    out.mkdir(parents=True, exist_ok=True)
    step = 0
    losses = []
    for epoch in range(args.epochs):
        order = get_modality_length_grouped_indices(
            ds.modality_lengths, args.batch_size, 1,
            seed=args.seed + epoch)
        # tokenization/PIL decode overlapped in worker threads (order-
        # preserving, so num_workers never changes the training stream)
        from rsvldm_tpu.data.prefetch import worker_map
        usable = len(order) - len(order) % args.batch_size
        item_iter = worker_map(ds.__getitem__, order[:usable],
                               num_workers=args.num_workers)
        for i in range(0, usable, args.batch_size):
            items = [next(item_iter) for _ in range(args.batch_size)]
            if args.dpo:
                item_feats = [feats_fn(it["image"])
                              if "image" in it and feats_fn else None
                              for it in items]
                sides = {}
                for side in ("chosen", "rejected"):
                    sides[side] = [splice_training_sample(
                        it[f"{side}_input_ids"], it[f"{side}_labels"],
                        embed_fn, feats, IGNORE_INDEX)
                        for it, feats in zip(items, item_feats)]
                    # truncate AFTER image expansion (the reference
                    # truncates post-multimodal-splice too)
                    sides[side] = [(e[:args.max_length],
                                    l[:args.max_length])
                                   for e, l in sides[side]]
                    for it, (_, lt) in zip(items, sides[side]):
                        # a fully-truncated side makes its logprob exactly
                        # 0 (probability 1), silently zeroing the pair's
                        # DPO margin — refuse like the SFT branch
                        if not (np.asarray(lt) != IGNORE_INDEX).any():
                            raise SystemExit(
                                f"record {it.get('id')}: truncation to "
                                f"--max_length {args.max_length} removed "
                                f"every supervised {side} token; raise "
                                "--max_length")
                width = max(e.shape[0] for ps in sides.values()
                            for e, _ in ps)
                width = -(-width // args.pad_to) * args.pad_to
                packed = {}
                for side, ps in sides.items():
                    emb = jnp.stack([
                        jnp.pad(e, ((0, width - e.shape[0]), (0, 0)))
                        for e, _ in ps])
                    lab = np.full((len(ps), width), IGNORE_INDEX, np.int32)
                    for j, (_, l) in enumerate(ps):
                        lab[j, :len(l)] = l
                    packed[side] = (emb, jnp.asarray(lab))
                cache = KVCache.init(cfg, len(items), width, cfg.dtype)
                loss = trainer.train_step(*packed["chosen"],
                                          *packed["rejected"], cache)
            else:
                if tune == ("lora",):
                    rows = []
                    for it in items:
                        if "video" in it and video_feats_fn:
                            feats = video_feats_fn(it["video"])
                        else:
                            feats = (feats_fn(it["image"])
                                     if "image" in it and feats_fn else None)
                        e, l = splice_training_sample(
                            it["input_ids"], it["labels"], embed_fn, feats,
                            IGNORE_INDEX)
                        # truncate AFTER image expansion (the reference
                        # caps post-multimodal-splice lengths too) — and
                        # refuse to train on nothing: an anyres image can
                        # be thousands of tokens, pushing every supervised
                        # label past the cap (loss would silently be 0)
                        lt = l[:args.max_length]
                        if not (np.asarray(lt) != IGNORE_INDEX).any():
                            raise SystemExit(
                                f"record {it.get('id')}: truncation to "
                                f"--max_length {args.max_length} removed "
                                f"every supervised token (spliced length "
                                f"{len(l)}); raise --max_length")
                        rows.append((e[:args.max_length], lt, None, None))
                else:
                    # projector inside the graph: reserve the span, ship
                    # RAW tower features; every record must carry an image
                    rows = []
                    for it in items:
                        if "image" not in it:
                            raise SystemExit(
                                "--tune projector requires image records "
                                "(the reference pretrain data is image-"
                                "caption pairs)")
                        e, l, p = reserve_image_span(
                            it["input_ids"], it["labels"], embed_fn,
                            img_tokens, IGNORE_INDEX)
                        if p + img_tokens > args.max_length:
                            raise SystemExit(
                                f"record {it.get('id')}: image span ends at "
                                f"{p + img_tokens} > --max_length "
                                f"{args.max_length}; raise the cap (the "
                                "span cannot be truncated mid-image)")
                        lt = l[:args.max_length]
                        if not (np.asarray(lt) != IGNORE_INDEX).any():
                            raise SystemExit(
                                f"record {it.get('id')}: truncation to "
                                f"--max_length {args.max_length} removed "
                                "every supervised caption token; raise "
                                "--max_length")
                        rows.append((e[:args.max_length], lt, p,
                                     feats_raw_fn(it["image"])))
                width = max(e.shape[0] for e, _, _, _ in rows)
                width = -(-width // args.pad_to) * args.pad_to
                emb = jnp.stack([jnp.pad(e,
                                         ((0, width - e.shape[0]), (0, 0)))
                                 for e, _, _, _ in rows])
                lab = np.full((len(rows), width), IGNORE_INDEX, np.int32)
                for j, (_, l, _, _) in enumerate(rows):
                    lab[j, :len(l)] = l
                cache = KVCache.init(cfg, len(rows), width, cfg.dtype)
                if tune == ("lora",):
                    loss = trainer.train_step(emb, jnp.asarray(lab), cache)
                else:
                    loss = trainer.train_step(
                        jnp.stack([f for _, _, _, f in rows]), emb,
                        np.asarray([p for _, _, p, _ in rows]),
                        jnp.asarray(lab), cache)
            losses.append(loss)
            step += 1
            if step % 10 == 0 or step == 1:
                print(f"step {step} epoch {epoch} loss {loss:.4f}",
                      flush=True)
            if args.save_every and step % args.save_every == 0:
                if trainer.lora is not None:
                    save_lora_npz(trainer.lora, trainer.lora_cfg,
                                  out / f"lora_step{step}.npz")
            if args.steps and step >= args.steps:
                break
        if args.steps and step >= args.steps:
            break
    if not losses:
        sys.exit(f"no training steps ran: {len(ds)} records with "
                 f"--batch_size {args.batch_size} yield zero full batches")
    res = {"steps": step, "first_loss": float(losses[0]),
           "final_loss": float(losses[-1])}
    if trainer.lora is not None:
        save_lora_npz(trainer.lora, trainer.lora_cfg,
                      out / "lora_final.npz")
        res["adapters"] = str(out / "lora_final.npz")
    if "projector" in tune:
        from rsvldm_tpu.training.vlm_trainer import save_projector_npz
        save_projector_npz(trainer.proj_params, out / "projector_final.npz")
        res["projector"] = str(out / "projector_final.npz")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
