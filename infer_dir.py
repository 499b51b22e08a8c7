#!/usr/bin/env python
"""Folder batch SR inference CLI (reference infer_dir.py:209-217 flags)."""

import argparse
import logging


def main():
    ap = argparse.ArgumentParser(description="Batch TPU super-resolution")
    ap.add_argument("--image_dir", type=str, required=True)
    ap.add_argument("--save_dir", type=str, default="./results")
    ap.add_argument("--upscale", type=int, default=8)
    ap.add_argument("--seed", type=int, default=1234)  # infer_dir.py:216
    ap.add_argument("--num_steps", type=int, default=50)
    ap.add_argument("--img_threshold", type=float, default=0.3)
    ap.add_argument("--ckpt_dir", type=str, default="./CKPT_PTH")
    ap.add_argument("--no_llava", action="store_true")
    ap.add_argument("--stage1_only", action="store_true")
    ap.add_argument("--debug_tiny", action="store_true")
    ap.add_argument("--platform", type=str, default=None,
                    help="force jax platform (e.g. cpu) — overrides the "
                         "site-injected TPU relay selection")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard folder batches + tensor-shard the captioner "
                         "over this many devices (0 = all when >1 device)")
    args = ap.parse_args()

    from rsvldm_tpu.utils.compile_cache import cli_setup
    cli_setup(args.platform)

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    from rsvldm_tpu.config import PipelineConfig
    from rsvldm_tpu.pipeline import ImageBatchProcessor

    cfg = PipelineConfig(image_dir=args.image_dir, output_dir=args.save_dir,
                         upscale=args.upscale, seed=args.seed,
                         ckpt_dir=args.ckpt_dir, no_llava=args.no_llava,
                         stage1_only=args.stage1_only)
    cfg.refine.img_threshold = args.img_threshold
    cfg.refine.edm_steps = args.num_steps

    mesh = None
    import jax
    n_dev = len(jax.devices())
    want = args.mesh or (n_dev if n_dev > 1 else 0)
    if want > 1:
        from rsvldm_tpu.parallel import make_mesh
        mesh = make_mesh(min(want, n_dev), tile=1)

    proc = ImageBatchProcessor(cfg, debug_tiny=args.debug_tiny, mesh=mesh)
    results = proc.run()
    ok = sum(1 for _, s in results if s in ("ok", "stage1"))
    print(f"processed {ok}/{len(results)} images")


if __name__ == "__main__":
    main()
