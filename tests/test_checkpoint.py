"""Checkpoint IO: orbax roundtrip, overlay semantics, load_or_convert cache,
and the JSONL run logger."""

import numpy as np
import pytest

import jax.numpy as jnp

from rsvldm_tpu.utils import checkpoint as ckpt
from rsvldm_tpu.utils.run_logger import RunLogger


def test_orbax_roundtrip(tmp_path):
    tree = {"a": {"kernel": jnp.arange(6.0).reshape(2, 3)},
            "b": jnp.ones((4,), jnp.bfloat16)}
    ckpt.save_orbax(tree, tmp_path / "ck")
    out = ckpt.load_orbax(tmp_path / "ck")
    np.testing.assert_allclose(np.asarray(out["a"]["kernel"]),
                               np.arange(6.0).reshape(2, 3))
    assert out["b"].dtype == jnp.bfloat16


def test_overlay_later_wins():
    base = {"x": 1, "y": 2}
    over = {"y": 20, "z": 30}
    merged = ckpt.overlay(base, over)
    assert merged == {"x": 1, "y": 20, "z": 30}


def test_load_or_convert_caches(tmp_path):
    torch = pytest.importorskip("torch")
    src = tmp_path / "weights.pth"
    torch.save({"state_dict": {"w": torch.ones(3)}}, src)

    calls = []

    def convert_fn(sd):
        calls.append(1)
        return {"params": {"w": jnp.asarray(np.asarray(sd["w"]))}}

    p1 = ckpt.load_or_convert(tmp_path, "m", [str(src)], convert_fn)
    assert p1 is not None and len(calls) == 1
    # second call restores the orbax cache — converter NOT invoked again
    p2 = ckpt.load_or_convert(tmp_path, "m", [str(src)], convert_fn)
    assert len(calls) == 1
    np.testing.assert_allclose(np.asarray(p2["params"]["w"]), 1.0)
    # missing source + no cache -> None
    assert ckpt.load_or_convert(tmp_path, "other", ["/nope.pth"],
                                convert_fn) is None


def test_load_torch_safetensors(tmp_path):
    torch = pytest.importorskip("torch")
    from safetensors.torch import save_file
    save_file({"k": torch.full((2, 2), 3.0)}, str(tmp_path / "w.safetensors"))
    sd = ckpt.load_torch_state_dict(str(tmp_path / "w.safetensors"))
    np.testing.assert_allclose(np.asarray(sd["k"]), 3.0)


def test_run_logger(tmp_path):
    rl = RunLogger(tmp_path / "log.jsonl", run_name="test")
    rl.log(step=1, loss=0.5)
    rl.log(step=2, loss=0.25, note="ok")
    recs = rl.read()
    assert len(recs) == 2
    assert recs[0]["loss"] == 0.5
    assert recs[1]["note"] == "ok"
    assert recs[1]["run"] == "test"


def test_strip_prefix_reexport():
    """pipeline._load_stage2_weights and convert_ckpt.py call
    ckpt.strip_prefix — it must exist on utils.checkpoint (regression:
    it lived only in utils.convert and every real conversion crashed)."""
    from rsvldm_tpu.utils import checkpoint as ckpt
    from rsvldm_tpu.utils.convert import strip_prefix as src
    sd = {"model.diffusion_model.w": 1, "model.diffusion_model.b": 2,
          "first_stage_model.k": 3}
    out = ckpt.strip_prefix(sd, "model.diffusion_model")
    assert out == src(sd, "model.diffusion_model") == {"w": 1, "b": 2}
