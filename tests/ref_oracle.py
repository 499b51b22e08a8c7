"""Import helper: load reference torch modules as parity ORACLES.

The reference repo (/root/reference) is pure torch; heavy optional deps
(lightning, xformers, k_diffusion, open_clip, torchvision, omegaconf) are
stubbed because the math we compare against never touches them. Used by
tests only — reference code is never vendored into the package.
"""

import os
import sys
import types

REF = "/root/reference"


def available() -> bool:
    return os.path.isdir(REF)


def _stub(name, **attrs):
    m = sys.modules.get(name) or types.ModuleType(name)
    if m.__spec__ is None:
        import importlib.machinery
        m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


_installed = False


def install():
    global _installed
    if _installed:
        return
    import torch

    _stub("pytorch_lightning", LightningModule=torch.nn.Module)
    # NOTE: xformers is deliberately NOT stubbed — sgm guards its import and
    # falls back to torch SDPA, which is what we compare against.
    _stub("k_diffusion")
    _stub("k_diffusion.sampling", BrownianTreeNoiseSampler=object,
          get_sigmas_karras=lambda *a, **k: None)
    _stub("open_clip", create_model_and_transforms=None, tokenize=None)
    _stub("kornia")

    class _OC:
        @staticmethod
        def load(*a, **k):
            return None

    oc = _stub("omegaconf", OmegaConf=_OC, ListConfig=list, DictConfig=dict)
    oc.listconfig = _stub("omegaconf.listconfig", ListConfig=list)

    tv = _stub("torchvision")
    _stub("torchvision.transforms", ToTensor=object, ToPILImage=object,
          Compose=object, Normalize=object, Resize=object)
    _stub("torchvision.utils", make_grid=lambda *a, **k: None)
    _stub("torchvision.transforms.functional")
    _stub("torchvision.models", vgg16=None)
    tv.transforms = sys.modules["torchvision.transforms"]
    tv.utils = sys.modules["torchvision.utils"]
    tv.models = sys.modules["torchvision.models"]

    if REF not in sys.path:
        sys.path.insert(0, REF)
    _installed = True
