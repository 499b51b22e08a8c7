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

    class _LightningModule(torch.nn.Module):
        @property
        def device(self):
            try:
                return next(self.parameters()).device
            except StopIteration:
                return torch.device("cpu")

    _stub("pytorch_lightning", LightningModule=_LightningModule)
    # NOTE: xformers is deliberately NOT stubbed — sgm guards its import and
    # falls back to torch SDPA, which is what we compare against.
    _stub("k_diffusion")
    _stub("k_diffusion.sampling", BrownianTreeNoiseSampler=object,
          get_sigmas_karras=lambda *a, **k: None)
    _stub("open_clip", create_model_and_transforms=None, tokenize=None)
    _stub("kornia")

    # timm: the vendored EVA tree needs only three trivial layer helpers
    # (eva_vit.py:152-155); stubbed so the EVA oracle imports without timm
    def _to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def _drop_path(x, drop_prob=0.0, training=False, scale_by_keep=True):
        if drop_prob == 0.0 or not training:
            return x
        keep = 1 - drop_prob
        mask = x.new_empty((x.shape[0],) + (1,) * (x.ndim - 1)).bernoulli_(keep)
        return x * mask / keep

    def _trunc_normal_(t, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            t.normal_(mean, std).clamp_(mean + a * std, mean + b * std)
        return t

    tm = _stub("timm")
    tm.models = _stub("timm.models")
    tm.models.layers = _stub("timm.models.layers", drop_path=_drop_path,
                             to_2tuple=_to_2tuple, trunc_normal_=_trunc_normal_)
    tm.layers = _stub("timm.layers", drop_path=_drop_path,
                      to_2tuple=_to_2tuple, trunc_normal_=_trunc_normal_)

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


_sr_model_installed = False


def install_sr_model():
    """Extra stubs so /root/reference/models/SR_model.py (SR_backbone — the
    production Stage-2b engine) imports on CPU without lpips/torchmetrics/
    llava/peft/cv2: only PIL2Tensor/Tensor2PIL and the sgm stack are used by
    the E2E parity tests, none of the stubbed surfaces."""
    global _sr_model_installed
    install()
    if _sr_model_installed:
        return
    import torch

    class _FakeLPIPS:
        def __init__(self, net="vgg"):
            pass

        def eval(self):
            return self

        def to(self, d):
            return self

        def __call__(self, *a, **k):
            return torch.zeros(1)

    _stub("lpips", LPIPS=_FakeLPIPS)
    tm = _stub("torchmetrics")
    tm.functional = _stub(
        "torchmetrics.functional",
        peak_signal_noise_ratio=lambda *a, **k: torch.zeros(1),
        structural_similarity_index_measure=lambda *a, **k: torch.zeros(1))
    _stub("llava")
    _stub("llava.mm_utils", tokenizer_image_token=None)
    _stub("llava.model")
    _stub("llava.model.builder", load_pretrained_model=None)
    _stub("peft", PeftModel=None)
    try:
        import cv2  # noqa: F401
    except ImportError:
        _stub("cv2", INTER_LANCZOS4=4, INTER_AREA=3, resize=None)
    try:
        import diffusers  # noqa: F401
    except ImportError:
        _stub("diffusers")
        _stub("diffusers.utils")
        _stub("diffusers.utils.import_utils",
              is_xformers_available=lambda: False)
        _stub("diffusers.models")
        _stub("diffusers.models.attention_processor", Attention=object)
    _sr_model_installed = True
