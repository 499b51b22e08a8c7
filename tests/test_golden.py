"""Golden regression: fixed-seed outputs must stay stable across refactors.

(SURVEY §7.8 golden-image regression. Values were recorded on CPU with this
repo's jax version; loose tolerances absorb cross-version numeric drift —
a hard failure means a semantic change in model/sampler/RNG discipline.)"""

import jax
import jax.numpy as jnp
import numpy as np

from rsvldm_tpu.models.sr3 import (SR3Diffusion, SR3UNet, SR3UNetConfig,
                                   sr3_sample)


def test_sr3_fixed_seed_golden():
    cfg = SR3UNetConfig(inner_channel=16, norm_groups=8, channel_mults=(1, 2),
                        attn_res=(8,), res_blocks=1, image_size=16)
    model = SR3UNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 6)),
                        jnp.ones((1, 1)))
    diff = SR3Diffusion.from_schedule(n_timestep=5)
    cond = jnp.linspace(-1, 1, 16 * 16 * 3).reshape(1, 16, 16, 3)
    out = np.asarray(sr3_sample(diff, lambda p, x, nl: model.apply(p, x, nl),
                                params, cond, jax.random.PRNGKey(42)))
    np.testing.assert_allclose(out.mean(), -0.026258, atol=2e-3)
    np.testing.assert_allclose(out.std(), 0.721829, atol=5e-3)
    np.testing.assert_allclose(out[0, 0, 0, 0], 0.493300, atol=1e-2)
    np.testing.assert_allclose(np.abs(out).sum(), 490.44, rtol=2e-2)
