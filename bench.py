"""Benchmark: Stage-1 SR3 denoise loop throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes quality numbers only (BASELINE.md) — its implied
per-image cost is dominated by 500 SR3 UNet steps @224^2 plus 50 CFG-doubled
SDXL steps. This bench measures the Stage-1 hot loop (full shipped config:
inner 64, mults [1,2,4,8,8], attn@28, 224^2, configs/sr_sr3.json:41-57) as a
jitted lax.scan on the real chip, with random weights (weights don't change
FLOPs).

vs_baseline uses a documented ASSUMPTION for the torch/CUDA reference:
~10 UNet steps/s at 224^2 on the reference's GPU (PyTorch 2.5 + CUDA 12.4,
typical for a ~100M-param pixel-space UNet with a 784-token full attention).
vs_baseline = our_steps_per_sec / 10.0; >= 3.0 meets the BASELINE.json
north-star for this stage.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

from rsvldm_tpu.models.sr3 import (SR3Diffusion, SR3UNet, SR3UNetConfig,
                                   sr3_sample)

ASSUMED_REF_STEPS_PER_SEC = 10.0
N_STEPS = 100  # timed steps (steady-state; steps/sec is count-independent)


def main():
    cfg = SR3UNetConfig(inner_channel=64, channel_mults=(1, 2, 4, 8, 8),
                        attn_res=(28,), res_blocks=1, image_size=224,
                        dtype=jnp.bfloat16)
    model = SR3UNet(cfg)
    cond = jnp.zeros((1, 224, 224, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 6)), jnp.ones((1, 1)))
    diff = SR3Diffusion.from_schedule(n_timestep=N_STEPS)
    apply_fn = lambda p, x, nl: model.apply(p, x, nl)

    run = jax.jit(lambda p, c, r: sr3_sample(diff, apply_fn, p, c, r))

    import numpy as np

    def timed(r):
        # NOTE: a device->host fetch is the only reliable sync point under
        # the remote-TPU relay (block_until_ready returns early there)
        t0 = time.perf_counter()
        out = run(params, cond, r)
        _ = np.asarray(out[0, 0, 0, 0])
        return time.perf_counter() - t0

    timed(jax.random.PRNGKey(1))  # warmup/compile
    dt = min(timed(jax.random.PRNGKey(i)) for i in range(2, 5))

    steps_per_sec = N_STEPS / dt
    print(json.dumps({
        "metric": "sr3_unet_denoise_steps_per_sec_224px",
        "value": round(steps_per_sec, 2),
        "unit": "steps/s",
        "vs_baseline": round(steps_per_sec / ASSUMED_REF_STEPS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
