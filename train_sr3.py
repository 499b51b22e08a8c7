#!/usr/bin/env python
"""SR3 Stage-1 training CLI.

The reference ships the SR3 train pieces without a driver (SURVEY §2.7);
this is the missing entry point: LRHR triplet data, adam + EMA, dp-sharded
train step over the device mesh, orbax checkpoints, resume.

Data layout (data/prepare.py or the reference prepare_data.py):
  <data_root>/hr_{r}/ sr_{l}_{r}/ lr_{l}/
"""

import argparse
import logging


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", type=str, required=True)
    ap.add_argument("--l_res", type=int, default=28)
    ap.add_argument("--r_res", type=int, default=224)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1_000_000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--save_dir", type=str, default="./checkpoints/sr3")
    ap.add_argument("--resume_iter", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log_every", type=int, default=200)
    ap.add_argument("--num_workers", type=int, default=4,
                    help="threaded item-decode workers (DataLoader "
                         "num_workers equivalent; 0 = inline)")
    ap.add_argument("--prefetch", type=int, default=2,
                    help="batches staged on-device ahead of the train step")
    ap.add_argument("--platform", type=str, default=None,
                    help="force jax platform (e.g. cpu) — overrides the "
                         "site-injected TPU relay selection")
    args = ap.parse_args()

    from rsvldm_tpu.utils.compile_cache import cli_setup
    cli_setup(args.platform)

    logging.basicConfig(level=logging.INFO)

    import jax
    from rsvldm_tpu.data import LRHRDataset, make_loader
    from rsvldm_tpu.models.sr3 import SR3UNetConfig
    from rsvldm_tpu.parallel import make_mesh
    from rsvldm_tpu.training import SR3Trainer, SR3TrainConfig

    mesh = make_mesh(tile=1) if len(jax.devices()) > 1 else None
    model_cfg = SR3UNetConfig(image_size=args.r_res)
    train_cfg = SR3TrainConfig(lr=args.lr, n_iter=args.steps)
    trainer = SR3Trainer(model_cfg, train_cfg, mesh=mesh,
                         rng=jax.random.PRNGKey(args.seed))
    if args.resume_iter:
        trainer.load(args.save_dir, args.resume_iter)

    ds = LRHRDataset(args.data_root, args.l_res, args.r_res, split="train")
    # decode/stack in worker threads, batches staged on-device ahead of the
    # step (the DataLoader num_workers+pin_memory overlap)
    sharding = None
    if mesh is not None:
        from rsvldm_tpu.parallel import batch_sharding
        sharding = batch_sharding(mesh, 4)
    it = make_loader(ds, args.batch_size, num_workers=args.num_workers,
                     prefetch=args.prefetch, sharding=sharding,
                     seed=args.seed)
    trainer.fit(it, args.steps - trainer.step, jax.random.PRNGKey(args.seed + 1),
                log_every=args.log_every, save_dir=args.save_dir)
    trainer.save(args.save_dir)


if __name__ == "__main__":
    main()
