"""Device-side smoke init (round-5): `_init_params` at full-scale mode.

The no-checkpoint smoke path used to `.init` the whole Stage-2 stack in
fp32 on the host and tunnel it to the device (~515 s/run through the
relay); round 5 replaced it with ON-DEVICE bf16 generation from
`jax.eval_shape` + an init-faithful per-leaf rule. This test runs that
exact code path (debug_tiny=False, tiny `model_cfgs` geometries so CPU
stays fast) and pins the contract:

  - the generated tree has the REAL init's structure and shapes,
  - norm scales are ones, biases zeros, kernels fan-in-scaled normals
    (the flax-default magnitudes the rule mimics),
  - storage dtype is the pipeline's bf16,
  - the values are deterministic in the family name (process-stable).

Reference anchor: the smoke fallback mirrors models/util.py:93-117's
load order with missing files.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import jax.tree_util as tu

from rsvldm_tpu.config import PipelineConfig
from rsvldm_tpu.pipeline import SuperResolutionPipeline, _tiny_overrides

# default tier (not fast): the module-scoped stage-2 init takes ~2 min on
# CPU — correctness guard for the smoke-init rule, not a per-edit test


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    td = tmp_path_factory.mktemp("smoke_init")
    from PIL import Image
    inp = td / "x.png"
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(inp)
    cfg = PipelineConfig(input_img=str(inp), output_dir=str(td / "out"),
                         ckpt_dir=str(td / "no_ckpts"), no_llava=True)
    p = SuperResolutionPipeline(cfg, model_cfgs=_tiny_overrides())
    p._ensure_stage2()
    return p


def test_structure_and_shapes_match_real_init(pipe):
    real = jax.eval_shape(
        lambda k: pipe.sr3.init(
            k, jnp.zeros((1, pipe.sr3_cfg.image_size,
                          pipe.sr3_cfg.image_size, 6)),
            jnp.zeros((1,))), jax.random.PRNGKey(0))
    got = pipe.sr3_params
    assert tu.tree_structure(got) == tu.tree_structure(real)
    for a, b in zip(tu.tree_leaves(got), tu.tree_leaves(real)):
        assert tuple(a.shape) == tuple(b.shape)


def test_init_rule_magnitudes(pipe):
    flat, _ = tu.tree_flatten_with_path(pipe.unet_params)
    n_kernel = n_scale = n_bias = 0
    for path, leaf in flat:
        name = str(getattr(path[-1], "key", path[-1]))
        x = np.asarray(leaf, np.float32)
        if name == "bias":
            n_bias += 1
            assert not x.any()
        elif name == "scale":
            n_scale += 1
            assert (x == 1.0).all()
        elif name == "kernel" and x.ndim >= 2:
            n_kernel += 1
            fan_in = int(np.prod(x.shape[:-1]))
            want = (1.0 / fan_in) ** 0.5
            # bf16-quantized normal: std within 20% of lecun for any
            # reasonably sized kernel
            if x.size >= 512:
                assert abs(float(x.std()) / want - 1.0) < 0.2, (name, path)
    assert n_kernel > 10 and n_scale > 5 and n_bias > 5


def test_bf16_storage_and_determinism(pipe):
    for fam in ("sr3_params", "unet_params", "control_params",
                "vae_params", "clip_l_params", "big_g_params"):
        leaves = tu.tree_leaves(getattr(pipe, fam))
        assert leaves, fam
        assert all(l.dtype == jnp.bfloat16 for l in leaves), fam
    # determinism: a fresh init_params call reproduces the same values
    again = pipe._init_params("sr3", lambda k: pipe.sr3.init(
        k, jnp.zeros((1, pipe.sr3_cfg.image_size,
                      pipe.sr3_cfg.image_size, 6)), jnp.zeros((1,))))
    for a, b in zip(tu.tree_leaves(again), tu.tree_leaves(pipe.sr3_params)):
        np.testing.assert_array_equal(np.asarray(a, np.float32),
                                      np.asarray(b, np.float32))


def test_smoke_forward_finite(pipe):
    x = jnp.zeros((1, pipe.sr3_cfg.image_size, pipe.sr3_cfg.image_size, 6),
                  jnp.bfloat16)
    out = pipe.sr3.apply(pipe.sr3_params, x, jnp.full((1,), 0.5))
    assert bool(jnp.isfinite(out.astype(jnp.float32)).all())
