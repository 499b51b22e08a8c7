#!/usr/bin/env python
"""Single-image two-stage SR inference CLI.

Flag-compatible with the reference infer.py (:218-237):
  --input_img --output_dir --upscale_factor --seed --img_threshold --edm_steps
plus framework extras (--ckpt_dir, --no_llava, --stage1_only, --debug_tiny).
"""

import argparse
import logging


def main():
    ap = argparse.ArgumentParser(description="TPU super-resolution pipeline")
    ap.add_argument("--input_img", type=str, required=True)
    ap.add_argument("--output_dir", type=str, default="./results")
    ap.add_argument("--upscale_factor", type=int, default=8)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--img_threshold", type=float, default=0.3)
    ap.add_argument("--edm_steps", type=int, default=50)
    ap.add_argument("--ckpt_dir", type=str, default="./CKPT_PTH")
    ap.add_argument("--no_llava", action="store_true")
    ap.add_argument("--stage1_only", action="store_true")
    ap.add_argument("--stage1_sampler", type=str, default="ddpm",
                    choices=["ddpm", "ddim"],
                    help="ddim runs a few-step sampler on the SR3 schedule")
    ap.add_argument("--stage1_steps", type=int, default=50,
                    help="DDIM step count (sampler=ddim)")
    ap.add_argument("--debug_tiny", action="store_true",
                    help="shrunken models (smoke testing)")
    ap.add_argument("--platform", type=str, default=None,
                    help="force jax platform (e.g. cpu) — overrides the "
                         "site-injected TPU relay selection")
    ap.add_argument("--draft_dir", type=str, default="",
                    help="Llama-family draft checkpoint for speculative "
                         "caption decoding (default: auto-detect "
                         "<ckpt_dir>/llava_draft)")
    ap.add_argument("--self_draft", type=int, default=0, metavar="N",
                    help="speculative caption decoding with a depth-pruned "
                         "self-draft (target's first N layers; no draft "
                         "checkpoint needed, output exact)")
    ap.add_argument("--lora_npz", type=str, default="",
                    help="adapter archive from train_vlm.py, folded into "
                         "the captioner (fp) or served as the runtime "
                         "QLoRA branch (int8/int4 decoder)")
    ap.add_argument("--projector_npz", type=str, default="",
                    help="projector archive from train_vlm.py --tune "
                         "projector (pretrain artifact)")
    args = ap.parse_args()

    from rsvldm_tpu.utils.compile_cache import cli_setup
    cli_setup(args.platform)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    from rsvldm_tpu.config import PipelineConfig
    from rsvldm_tpu.pipeline import SuperResolutionPipeline

    cfg = PipelineConfig(input_img=args.input_img, output_dir=args.output_dir,
                         upscale=args.upscale_factor, seed=args.seed,
                         ckpt_dir=args.ckpt_dir, no_llava=args.no_llava,
                         stage1_only=args.stage1_only)
    cfg.refine.img_threshold = args.img_threshold
    cfg.stage1.sampler = args.stage1_sampler
    cfg.stage1.ddim_steps = args.stage1_steps
    cfg.refine.edm_steps = args.edm_steps
    cfg.llava.draft_dir = args.draft_dir
    cfg.llava.self_draft_layers = args.self_draft
    cfg.llava.lora_npz = args.lora_npz
    cfg.llava.projector_npz = args.projector_npz

    pipeline = SuperResolutionPipeline(cfg, debug_tiny=args.debug_tiny)
    pipeline.process()


if __name__ == "__main__":
    main()
