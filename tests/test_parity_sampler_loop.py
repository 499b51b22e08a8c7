"""RestoreEDM LOOP parity vs the reference torch sampler.

Drives the reference `RestoreEDMSampler.init_loop` + `step` under
`just_sampling`'s mutation semantics (/root/reference/models/SR_model.py
:242-291 — x_center <- z each step, img_threshold *= dec_img) against our
`restore_edm_sample` with IDENTICAL injected noise and a shared fake
denoiser implemented in both frameworks. This is the test the per-module
parity suite cannot cover: sigma-schedule indexing, s_churn gating,
restore-CFG's next_sigma test, linear CFG/control schedules, the adaptive
DFBCache threshold decay, and the Euler step all live in the loop.
"""

import dataclasses
import sys

import numpy as np
import pytest

sys.path.insert(0, "tests")
import ref_oracle  # noqa: E402

pytestmark = pytest.mark.skipif(not ref_oracle.available(),
                                reason="reference repo not present")
if ref_oracle.available():
    ref_oracle.install()

N, C, H, W = 1, 4, 8, 8
SEED = 7


def _mix_weights():
    rng = np.random.default_rng(3)
    return (rng.normal(size=(C,)).astype(np.float32),
            rng.normal(size=(C,)).astype(np.float32))


W_A, W_B = _mix_weights()


# --- the shared fake denoiser -------------------------------------------------
# first(x, sigma) -> h = tanh(x * w_a) + 0.05 * sigma  (per-channel mix)
# rest(h, x, cond, control_scale) -> denoised =
#     0.7 * tanh(h * w_b) + 0.2 * x + 0.1 * control_scale * cond_bias
# cond_bias differs between cond/uncond halves so CFG is exercised.


class TorchFakeDenoiser:
    """Implements the reference denoiser protocol incl. fbcache_mode +
    partial_info (what DiscreteDenoiserWithControl/ControlWrapper present
    to RestoreEDMSampler.denoise, sampling.py:548-596)."""

    def __init__(self):
        import torch
        self.w_a = torch.tensor(W_A).view(1, C, 1, 1)
        self.w_b = torch.tensor(W_B).view(1, C, 1, 1)

    def _first(self, inp, sigma):
        import torch
        return torch.tanh(inp * self.w_a) + 0.05 * sigma.view(-1, 1, 1, 1)

    def _rest(self, h, inp, c, control_scale):
        import torch
        bias = c["crossattn"].mean(dim=(1, 2)).view(-1, 1, 1, 1)
        return (0.7 * torch.tanh(h * self.w_b) + 0.2 * inp
                + 0.1 * float(control_scale) * bias)

    def __call__(self, inp, sigma, c, control_scale=1.0,
                 fbcache_mode="none", partial_info=None):
        if fbcache_mode == "none":
            return self._rest(self._first(inp, sigma), inp, c, control_scale)
        if fbcache_mode.endswith("stage1"):
            return {"h": self._first(inp, sigma), "inp": inp,
                    "control_scale": control_scale}
        return self._rest(partial_info["h"], partial_info["inp"], c,
                          control_scale)


class JaxFakeDenoiser:
    """Same math on the ControlDenoiser first/rest protocol (NHWC)."""

    def first_block_shape(self, n, h, w):
        return (n, h, w, C)

    def first(self, x, sigma, cond):
        import jax.numpy as jnp
        from rsvldm_tpu.models.sdxl.denoiser import PartialState
        w_a = jnp.asarray(W_A).reshape(1, 1, 1, C)
        h = jnp.tanh(x * w_a) + 0.05 * sigma.reshape(-1, 1, 1, 1)
        return PartialState(h=h, hs=[], emb=jnp.zeros(()), control=[], x=x,
                            c_skip=jnp.ones(()), c_out=jnp.ones(()))

    def rest(self, p, cond, control_scale):
        import jax.numpy as jnp
        w_b = jnp.asarray(W_B).reshape(1, 1, 1, C)
        bias = jnp.mean(cond["crossattn"], axis=(1, 2)).reshape(-1, 1, 1, 1)
        return (0.7 * jnp.tanh(p.h * w_b) + 0.2 * p.x
                + 0.1 * control_scale * bias)


def _conds():
    rng = np.random.default_rng(11)
    cond_ca = rng.normal(size=(N, 3, 5)).astype(np.float32)
    uc_ca = rng.normal(size=(N, 3, 5)).astype(np.float32)
    return cond_ca, uc_ca


def _run_reference(num_steps, threshold, dec_img, churn_eps, noise,
                   x_center, s_churn, restore_cfg, cfg_scale,
                   cfg_scale_start, use_linear_cfg, control_scale,
                   use_linear_control_scale, control_scale_start):
    import torch
    from models.modules.DFBCache import MyCacheContext, cache_context
    from sgm.modules.diffusionmodules.sampling import RestoreEDMSampler

    guider = {
        "target": "sgm.modules.diffusionmodules.guiders.LinearCFG",
        "params": {"scale": cfg_scale_start if use_linear_cfg else cfg_scale,
                   "scale_min": cfg_scale},
    }
    disc = {"target":
            "sgm.modules.diffusionmodules.discretizer.LegacyDDPMDiscretization"}
    sampler = RestoreEDMSampler(
        s_churn=s_churn, s_noise=1.003, restore_cfg=restore_cfg,
        restore_cfg_s_tmin=0.05, discretization_config=disc,
        guider_config=guider, num_steps=num_steps, device="cpu")

    cond_ca, uc_ca = _conds()
    c = {"crossattn": torch.tensor(cond_ca)}
    uc = {"crossattn": torch.tensor(uc_ca)}
    den = TorchFakeDenoiser()

    eps_iter = iter([torch.tensor(e) for e in churn_eps])
    real_randn_like = torch.randn_like
    torch.randn_like = lambda t, **k: next(eps_iter)
    try:
        z0 = torch.tensor(noise)
        z, s_in, sigmas, num_sigmas, c, uc = sampler.init_loop(
            z0, c, uc=uc, num_steps=num_steps)
        xc = torch.tensor(x_center)
        th = threshold
        hits = 0
        with cache_context(MyCacheContext()):
            for i in range(num_sigmas - 1):
                z, th = sampler.step(
                    z, i, s_in, sigmas, den, c, uc, x_center=xc,
                    control_scale=control_scale,
                    use_linear_control_scale=use_linear_control_scale,
                    control_scale_start=control_scale_start, threshold=th)
                xc = z
                th = th * dec_img
        return z.numpy(), np.asarray(sigmas)
    finally:
        torch.randn_like = real_randn_like


def _run_ours(num_steps, threshold, dec_img, churn_eps, noise, x_center,
              s_churn, restore_cfg, cfg_scale, cfg_scale_start,
              use_linear_cfg, control_scale, use_linear_control_scale,
              control_scale_start):
    import jax
    import jax.numpy as jnp
    from rsvldm_tpu.diffusion.samplers import (RestoreEDMConfig,
                                               restore_edm_sample)

    cfg = RestoreEDMConfig(
        num_steps=num_steps, cfg_scale=cfg_scale,
        cfg_scale_start=cfg_scale_start, use_linear_cfg=use_linear_cfg,
        restore_cfg=restore_cfg, s_churn=s_churn, s_noise=1.003,
        control_scale=control_scale,
        use_linear_control_scale=use_linear_control_scale,
        control_scale_start=control_scale_start,
        img_threshold=threshold, dec_img=dec_img)
    cond_ca, uc_ca = _conds()
    # NCHW reference arrays -> NHWC
    t = lambda a: jnp.transpose(jnp.asarray(a), (0, 2, 3, 1))
    cond = {"crossattn": jnp.asarray(cond_ca)}
    uc = {"crossattn": jnp.asarray(uc_ca)}
    out = restore_edm_sample(
        JaxFakeDenoiser(), cond, uc, t(noise), t(x_center), cfg,
        jax.random.PRNGKey(0),
        churn_noise=jnp.stack([t(e) for e in churn_eps]) if churn_eps
        else None)
    return np.transpose(np.asarray(out), (0, 3, 1, 2))


def _drive(num_steps=8, threshold=0.0, dec_img=1.0, s_churn=5.0,
           restore_cfg=4.0, cfg_scale=7.5, cfg_scale_start=4.0,
           use_linear_cfg=True, control_scale=1.0,
           use_linear_control_scale=False, control_scale_start=0.0):
    rng = np.random.default_rng(SEED)
    noise = rng.normal(size=(N, C, H, W)).astype(np.float32)
    x_center = rng.normal(size=(N, C, H, W)).astype(np.float32) * 0.3
    churn_eps = [rng.normal(size=(N, C, H, W)).astype(np.float32)
                 for _ in range(num_steps + 2)]
    args = (num_steps, threshold, dec_img, churn_eps, noise, x_center,
            s_churn, restore_cfg, cfg_scale, cfg_scale_start,
            use_linear_cfg, control_scale, use_linear_control_scale,
            control_scale_start)
    ref, sigmas = _run_reference(*args)
    ours = _run_ours(*args)
    return ref, ours


def test_loop_parity_cache_off():
    """Full production knobs (churn, linear CFG, restore-CFG), cache off."""
    ref, ours = _drive(threshold=0.0)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=3e-5)


def test_loop_parity_cache_on():
    """Adaptive first-block cache at the shipped threshold (0.3): both
    loops must take the SAME hit/miss decisions and agree on the latent."""
    ref, ours = _drive(threshold=0.3)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=3e-5)


def test_loop_parity_cache_on_decay():
    """dec_img < 1 decays the threshold every step (infer_dir knob)."""
    ref, ours = _drive(threshold=0.5, dec_img=0.9)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=3e-5)


def test_loop_parity_no_churn_no_restore():
    ref, ours = _drive(s_churn=0.0, restore_cfg=-1.0, threshold=0.3)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=3e-5)


def test_loop_parity_linear_control_scale():
    """Linear control schedule uses the PRE-churn sigma (sampling.py:608)."""
    ref, ours = _drive(use_linear_control_scale=True, control_scale=1.0,
                       control_scale_start=0.2, threshold=0.0)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=3e-5)


def test_loop_parity_vanilla_cfg():
    ref, ours = _drive(use_linear_cfg=False, cfg_scale=4.0, threshold=0.3)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=3e-5)


# ---------------------------------------------------------------------------
# RestoreDPMPP2MSampler loop parity: the stochastic DPM++(2M) variant
# (sampling.py:421-514). The reference's BrownianTreeNoiseSampler /
# get_sigmas_karras come from the stubbed k_diffusion — both are
# monkeypatched with real equivalents (a shared injected-noise queue and
# the Karras ramp), so the two loops see IDENTICAL noise.


def _run_reference_dpmpp2m(num_steps, noise, eps_seq, eta):
    import torch
    import sgm.modules.diffusionmodules.sampling as SMP

    def karras_t(n, smin, smax, device=None):
        ramp = torch.linspace(0, 1, n, dtype=torch.float64)
        mn, mx = float(smin) ** (1 / 7.0), float(smax) ** (1 / 7.0)
        s = (mx + ramp * (mn - mx)) ** 7.0
        return torch.cat([s.to(torch.float32), torch.zeros(1)])

    class QueueNS:
        def __init__(self, x, smin, smax):
            self.it = iter([torch.tensor(e) for e in eps_seq])

        def __call__(self, s, s_next):
            return next(self.it)

    disc = {"target": "sgm.modules.diffusionmodules.discretizer."
                      "LegacyDDPMDiscretization"}
    guider = {"target": "sgm.modules.diffusionmodules.guiders.IdentityGuider"}
    old_k, old_ns = SMP.get_sigmas_karras, SMP.BrownianTreeNoiseSampler
    SMP.get_sigmas_karras = karras_t
    SMP.BrownianTreeNoiseSampler = QueueNS
    try:
        sampler = SMP.RestoreDPMPP2MSampler(
            eta=eta, s_noise=1.0, discretization_config=disc,
            guider_config=guider, num_steps=num_steps, device="cpu",
            verbose=False)
        den = TorchFakeDenoiser()
        cond_ca, _ = _conds()
        c = {"crossattn": torch.tensor(cond_ca)}
        x = sampler(den, torch.tensor(noise), c, uc=c, num_steps=num_steps)
        return x.numpy()
    finally:
        SMP.get_sigmas_karras = old_k
        SMP.BrownianTreeNoiseSampler = old_ns


# eta=1.0 only: the reference class NaNs at eta=0 (its final step computes
# eta*h = 0*inf = nan inside get_mult before the early-return branch reads
# x_standard), so the default eta is the only parity-checkable setting —
# our t_of clamp keeps eta=0 finite, deliberately better than bug-for-bug.
@pytest.mark.parametrize("eta", [1.0])
def test_restore_dpmpp2m_loop_parity(eta):
    import jax.numpy as jnp
    from rsvldm_tpu.diffusion.samplers_extra import restore_dpmpp2m_sample
    from rsvldm_tpu.diffusion.schedules import legacy_ddpm_sigmas

    num_steps = 6
    rng = np.random.default_rng(23)
    noise = rng.normal(size=(N, C, H, W)).astype(np.float32)
    # the torch loop consumes one eps per step with i>0 and next_sigma>0,
    # i.e. steps 1..num_steps-2; ours indexes eps_override[i] at the same
    # steps — align by placing eps for step i at queue position i-1
    eps_mid = [rng.normal(size=(N, C, H, W)).astype(np.float32)
               for _ in range(num_steps - 2)]
    ref = _run_reference_dpmpp2m(num_steps, noise, eps_mid, eta)

    eps_override = np.zeros((num_steps, N, C, H, W), np.float32)
    for j, e in enumerate(eps_mid):
        eps_override[j + 1] = e
    cond_ca, _ = _conds()
    bias = cond_ca.mean(axis=(1, 2)).reshape(-1, 1, 1, 1)

    def denoise_fn(x, sigma):
        # JaxFakeDenoiser math inline (NHWC), control_scale=1, no CFG
        w_a = jnp.asarray(W_A).reshape(1, 1, 1, C)
        w_b = jnp.asarray(W_B).reshape(1, 1, 1, C)
        h = jnp.tanh(x * w_a) + 0.05 * sigma
        return (0.7 * jnp.tanh(h * w_b) + 0.2 * x
                + 0.1 * jnp.asarray(bias).transpose(0, 2, 3, 1))

    sigmas = legacy_ddpm_sigmas(num_steps)
    ours = restore_dpmpp2m_sample(
        denoise_fn, jnp.asarray(noise).transpose(0, 2, 3, 1), sigmas,
        eta=eta, s_noise=1.0,
        eps_override=jnp.asarray(eps_override).transpose(0, 1, 3, 4, 2))
    np.testing.assert_allclose(np.asarray(ours).transpose(0, 3, 1, 2), ref,
                               atol=2e-4, rtol=2e-4)
