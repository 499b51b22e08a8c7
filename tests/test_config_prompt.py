"""Prompt parity (prompts/prompt_config.yaml verbatim) + refine bucketing."""

import os

import numpy as np
import pytest

from rsvldm_tpu.config import (LlavaConfig, REFERENCE_IMG_PROMPT,
                               load_prompt_yaml)
from rsvldm_tpu.pipeline import bucket_pad

REF_YAML = "/root/reference/prompts/prompt_config.yaml"


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference absent")
def test_prompt_verbatim():
    yaml = pytest.importorskip("yaml")
    with open(REF_YAML) as f:
        ref = yaml.safe_load(f)["img_prompt"]
    assert REFERENCE_IMG_PROMPT == ref


@pytest.mark.skipif(not os.path.exists(REF_YAML), reason="reference absent")
def test_load_prompt_yaml_matches_pyyaml():
    assert load_prompt_yaml(REF_YAML) == REFERENCE_IMG_PROMPT


def test_fallback_parser_folded_scalar(tmp_path, monkeypatch):
    p = tmp_path / "p.yaml"
    p.write_text("img_prompt: >\n  {DEFAULT_IMAGE_TOKEN}\n  two words.\n")
    # force the no-pyyaml code path
    import builtins
    real_import = builtins.__import__

    def no_yaml(name, *a, **k):
        if name == "yaml":
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_yaml)
    assert load_prompt_yaml(p) == "{DEFAULT_IMAGE_TOKEN} two words.\n"


def test_llava_config_prompt_yaml_override(tmp_path):
    p = tmp_path / "p.yaml"
    p.write_text("img_prompt: >\n  {DEFAULT_IMAGE_TOKEN}\n  custom.\n")
    cfg = LlavaConfig(prompt_yaml=str(p))
    assert cfg.img_prompt == "{DEFAULT_IMAGE_TOKEN} custom.\n"
    assert LlavaConfig().img_prompt == REFERENCE_IMG_PROMPT


def test_bucket_pad():
    x = np.arange(5 * 7 * 3, dtype=np.float32).reshape(5, 7, 3)
    out = bucket_pad(x, 4)
    assert out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out[:5, :7], x)
    # edge padding replicates the border
    np.testing.assert_array_equal(out[5], out[4])
    np.testing.assert_array_equal(out[:, 7], out[:, 6])
    # already-aligned and disabled cases are no-ops (same object)
    assert bucket_pad(out, 4) is out
    assert bucket_pad(x, 0) is x
