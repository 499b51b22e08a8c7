"""Shared machinery for the activation-statistics fixtures (round-4 review
item 8): a reference-free, full-scale guard against converter drift.

The oracle tier proves converter parity by running the reference torch
modules live (test_convert_fullscale.py) — but that evidence evaporates in
any environment without /root/reference mounted. These fixtures freeze it:

  1. `update_convert_stats.py` (run manually, needs the reference)
     instantiates each REFERENCE torch module at production scale, fills
     every parameter DETERMINISTICALLY from its state_dict key name
     (crc32-seeded numpy normal — no dependence on torch RNG streams,
     which are not stable across torch versions), runs a fixed input, and
     commits the outputs' statistics + a strided 256-value sample to
     tests/fixtures/convert_stats.json.
  2. `test_convert_stats.py` (plain tier, NO reference needed) rebuilds
     the identical state_dict from the fixture's key/shape table via the
     same crc32 rule, feeds it through OUR converters, runs OUR Flax
     modules on the same inputs, and asserts the outputs reproduce the
     committed reference activations.

Covered families are the ones whose oracle lives only in the reference
tree (SR3 UNet, sgm VAE, GLVControl + LightGLVUNet); the HF-backed
families (CLIP/Llama/ViT) are live-testable against `transformers` in any
environment and need no fixture.

Reference anchors: models/sr3_model/sr3_modules/unet.py,
sgm/models/autoencoder.py, models/modules/SR_modules.py:544-548,
models/util.py:93-117 (the load order the converters mirror).
"""

from __future__ import annotations

import json
import os
import zlib

import numpy as np

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures",
                       "convert_stats.json")

SAMPLE_N = 256


def det_values(key: str, shape) -> np.ndarray:
    """Deterministic fp32 weights for a state_dict entry: seeded by the KEY
    NAME, so both sides (torch capture / flax test) build bit-identical
    parameters with no shared RNG machinery."""
    rng = np.random.default_rng(zlib.crc32(key.encode()))
    return (rng.standard_normal(shape, dtype=np.float32) * 0.02).astype(
        np.float32)


def det_input(name: str, shape, scale=1.0) -> np.ndarray:
    """Deterministic fp32 activations (inputs), seeded by a label."""
    rng = np.random.default_rng(zlib.crc32(("in:" + name).encode()))
    return (rng.standard_normal(shape, dtype=np.float32) * scale).astype(
        np.float32)


def summarize(name: str, arr: np.ndarray) -> dict:
    """Stats + a strided flat sample — enough to pin numerics without
    committing megabytes."""
    flat = np.asarray(arr, np.float64).ravel()
    stride = max(1, flat.size // SAMPLE_N)
    return {
        "shape": list(np.shape(arr)),
        "mean": float(flat.mean()),
        "std": float(flat.std()),
        "min": float(flat.min()),
        "max": float(flat.max()),
        "stride": stride,
        "sample": [float(v) for v in flat[::stride][:SAMPLE_N]],
    }


def check_against(fix: dict, arr: np.ndarray, atol: float, rtol: float,
                  label: str):
    """Assert `arr` reproduces a fixture entry (shape, sample, stats)."""
    got = np.asarray(arr, np.float64)
    assert list(got.shape) == fix["shape"], (
        f"{label}: shape {got.shape} != fixture {fix['shape']}")
    flat = got.ravel()
    sample = flat[::fix["stride"]][:SAMPLE_N]
    want = np.asarray(fix["sample"], np.float64)
    np.testing.assert_allclose(sample, want, atol=atol, rtol=rtol,
                               err_msg=f"{label}: sample mismatch")
    scale = max(abs(fix["mean"]), fix["std"], 1e-6)
    assert abs(flat.mean() - fix["mean"]) < max(atol, rtol * scale), label
    assert abs(flat.std() - fix["std"]) < max(atol, rtol * fix["std"]), label


def load_fixture() -> dict:
    with open(FIXTURE) as f:
        return json.load(f)


def save_fixture(obj: dict) -> None:
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    with open(FIXTURE, "w") as f:
        json.dump(obj, f, indent=1)
        f.write("\n")


# ---------------------------------------------------------------- inputs
# One place for both sides. Shapes follow test_convert_fullscale.py: the
# production module STRUCTURE with small spatial extents (the attention
# blocks still run, at shifted resolutions).

def family_inputs():
    return {
        "sr3": {
            "x": det_input("sr3_x", (1, 64, 64, 6)),
            "noise_level": np.asarray([[0.7]], np.float32),
        },
        "vae": {
            "img": det_input("vae_img", (1, 32, 32, 3)),
            "z": det_input("vae_z", (1, 8, 8, 4)),
        },
        "xl": {
            "x": det_input("xl_x", (1, 8, 8, 4)),
            "lq": det_input("xl_lq", (1, 8, 8, 4)),
            "t": np.asarray([500.0], np.float32),
            "ctx": det_input("xl_ctx", (1, 7, 2048), scale=0.1),
            "y": det_input("xl_y", (1, 2816), scale=0.1),
            "control_scale": 0.7,
        },
    }
