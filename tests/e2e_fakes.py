"""Shared fakes for the three-stage E2E orchestration parity test.

`FakeCondTorch` is instantiated BY the reference's own config-DI
(sgm.util.instantiate_from_config with target "e2e_fakes.FakeCondTorch")
inside a real SR_backbone; `fake_cond_arrays` provides the identical
deterministic conditioning tensors to the JAX side. Conditioner parity
itself is covered by the module-level CLIP tests — the E2E test isolates
ORCHESTRATION parity, so both frameworks must see byte-identical
conditioning.
"""

import numpy as np

CTX_DIM = 64      # matches pipeline._tiny_overrides sdxl context_dim
ADM_DIM = 1568    # 32 + 3*512


class AttrDict(dict):
    """dict with attribute access — stands in for OmegaConf nodes in
    sampler_config (just_sampling mutates cfg.params.* then re-instantiates,
    SR_model.py:242-252)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = v


def fake_cond_arrays(n: int):
    """(crossattn_c, crossattn_uc, vector_c, vector_uc) float32."""
    rng = np.random.default_rng(42)
    ca_c = rng.normal(size=(1, 7, CTX_DIM)).astype(np.float32)
    ca_u = rng.normal(size=(1, 7, CTX_DIM)).astype(np.float32)
    v_c = rng.normal(size=(1, ADM_DIM)).astype(np.float32)
    v_u = rng.normal(size=(1, ADM_DIM)).astype(np.float32)
    rep = lambda a: np.repeat(a, n, axis=0)
    return rep(ca_c), rep(ca_u), rep(v_c), rep(v_u)


try:
    import torch

    class FakeCondTorch(torch.nn.Module):
        """GeneralConditionerWithControl.get_unconditional_conditioning
        surface (sgm/modules/encoders/modules.py:167-233) with fixed
        deterministic outputs + control passthrough."""

        def get_unconditional_conditioning(self, batch, batch_uc=None):
            ctrl = batch["control"]
            n = ctrl.shape[0]
            ca_c, ca_u, v_c, v_u = fake_cond_arrays(n)
            dev = ctrl.device
            c = {"crossattn": torch.tensor(ca_c, device=dev),
                 "vector": torch.tensor(v_c, device=dev),
                 "control": ctrl}
            uc_ctrl = (batch_uc or batch)["control"]
            uc = {"crossattn": torch.tensor(ca_u, device=dev),
                  "vector": torch.tensor(v_u, device=dev),
                  "control": uc_ctrl}
            return c, uc
except ImportError:  # pragma: no cover
    pass
