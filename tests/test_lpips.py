"""LPIPS vs a hand-built torch VGG16 oracle (torchvision is not installed;
the trunk is reconstructed at tiny... actually full VGG16 structure with
random weights — structure parity is what's validated)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from rsvldm_tpu.utils.lpips import LPIPS, VGG16_STAGES, convert_lpips  # noqa: E402


def _torch_vgg16():
    import torch.nn as tn
    layers = []
    in_ch = 3
    for si, stage in enumerate(VGG16_STAGES):
        for ch in stage:
            layers += [tn.Conv2d(in_ch, ch, 3, padding=1), tn.ReLU()]
            in_ch = ch
        if si < len(VGG16_STAGES) - 1:
            layers += [tn.MaxPool2d(2, 2)]
    return tn.Sequential(*layers)


def _torch_lpips_forward(vgg, x, y, lin_weights):
    import torch.nn.functional as F
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)
    feats = {}

    def run(v):
        v = (v - shift) / scale
        outs = []
        i = 0
        for si, stage in enumerate(VGG16_STAGES):
            for _ in stage:
                v = vgg[i](v)      # conv
                v = vgg[i + 1](v)  # relu
                i += 2
            outs.append(v)
            if si < len(VGG16_STAGES) - 1:
                v = vgg[i](v)      # pool
                i += 1
        return outs

    fx, fy = run(x), run(y)
    total = 0.0
    for li, (a, b) in enumerate(zip(fx, fy)):
        a = a / (a.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
        b = b / (b.pow(2).sum(1, keepdim=True) + 1e-10).sqrt()
        d = (a - b) ** 2
        w = lin_weights[li].abs().view(1, -1, 1, 1)
        total = total + (d * w).sum(1).mean(dim=(1, 2))
    return total


def test_lpips_parity():
    torch.manual_seed(0)
    vgg = _torch_vgg16().eval()
    # scale weights down so activations stay sane
    with torch.no_grad():
        for m in vgg:
            if hasattr(m, "weight"):
                m.weight *= 0.1
    lin = [torch.rand(s[-1]) for s in VGG16_STAGES]

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = _torch_lpips_forward(
            vgg, torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(y.transpose(0, 3, 1, 2)), lin).numpy()

    vgg_sd = {}
    idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    convs = [m for m in vgg if hasattr(m, "weight")]
    for ti, m in zip(idx, convs):
        vgg_sd[f"features.{ti}.weight"] = m.weight
        vgg_sd[f"features.{ti}.bias"] = m.bias
    lin_sd = {f"lin{i}.model.1.weight": w.view(-1, 1, 1, 1)
              for i, w in enumerate(lin)}
    params = convert_lpips(vgg_sd, lin_sd)

    ours = LPIPS().apply(params, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-4, rtol=1e-3)


def test_lpips_zero_for_identical():
    import jax
    model = LPIPS()
    x = jnp.zeros((1, 16, 16, 3))
    params = model.init(jax.random.PRNGKey(0), x, x)
    d = model.apply(params, x, x)
    np.testing.assert_allclose(np.asarray(d), 0.0, atol=1e-6)
