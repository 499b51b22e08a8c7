"""Text encoder + conditioner + tokenizer tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rsvldm_tpu.models.text import (CLIPTextConfig, CLIPTextTransformer,
                                    SDXLConditioner, concat_timestep_embedding)
from rsvldm_tpu.utils.tokenizer import CLIPTokenizer, bytes_to_unicode

TINY_L = CLIPTextConfig(vocab_size=100, width=32, layers=2, heads=2,
                        quick_gelu=True)
TINY_G = CLIPTextConfig(vocab_size=100, width=48, layers=3, heads=3,
                        quick_gelu=False, use_text_projection=True)


@pytest.fixture(scope="module")
def towers():
    l = CLIPTextTransformer(TINY_L)
    g = CLIPTextTransformer(TINY_G)
    toks = jnp.zeros((1, 77), jnp.int32)
    lp = l.init(jax.random.PRNGKey(0), toks)
    gp = g.init(jax.random.PRNGKey(1), toks)
    return l, g, lp, gp


def test_text_tower_outputs(towers):
    l, g, lp, gp = towers
    toks = jnp.array([[1] + [5] * 10 + [99] + [0] * 65], jnp.int32)
    out = g.apply(gp, toks)
    assert out["penultimate"].shape == (1, 77, 48)
    assert out["last"].shape == (1, 77, 48)
    assert out["pooled"].shape == (1, 48)
    # pooled comes from the argmax position (99 at idx 11)
    assert jnp.all(jnp.isfinite(out["pooled"]))


def test_penultimate_differs_from_last(towers):
    l, _, lp, _ = towers
    toks = jnp.array([[1, 5, 6, 99] + [0] * 73], jnp.int32)
    out = l.apply(lp, toks)
    assert not np.allclose(np.array(out["penultimate"]), np.array(out["last"]))


def test_concat_timestep_embedding():
    v = jnp.array([[1024.0, 1024.0]])
    e = concat_timestep_embedding(v, 256)
    assert e.shape == (1, 512)
    # first 256 = embedding of first scalar
    from rsvldm_tpu.models.sdxl.unet import timestep_embedding
    np.testing.assert_allclose(np.array(e[0, :256]),
                               np.array(timestep_embedding(jnp.array([1024.0]), 256)[0]),
                               atol=1e-6)


def test_conditioner_shapes(towers):
    l, g, lp, gp = towers
    cond = SDXLConditioner(l, g, lp, gp)
    tl = jnp.zeros((2, 77), jnp.int32)
    tg = jnp.zeros((2, 77), jnp.int32)
    ctrl = jnp.zeros((2, 8, 8, 4))
    c = cond(tl, tg, ctrl)
    assert c["crossattn"].shape == (2, 77, 32 + 48)
    assert c["vector"].shape == (2, 48 + 3 * 512)
    assert c["control"].shape == (2, 8, 8, 4)


# --- tokenizer ---

def _tiny_tokenizer():
    merges = [("h", "e</w>"), ("l", "l"), ("ll", "o</w>"), ("h", "i</w>")]
    return CLIPTokenizer(merges)


def test_bytes_to_unicode_reversible():
    m = bytes_to_unicode()
    assert len(m) == 256
    assert len(set(m.values())) == 256


def test_tokenizer_basic():
    tok = _tiny_tokenizer()
    ids = tok.encode("hello he hi")
    assert all(isinstance(i, int) for i in ids)
    # "he" merges into a single token ("h"+"e</w>")
    he_id = tok.encoder["he</w>"]
    assert he_id in ids
    hi_id = tok.encoder["hi</w>"]
    assert hi_id in ids


def test_tokenizer_framing_and_padding():
    tok = _tiny_tokenizer()
    arr = tok(["he"], context_length=10, pad_id=0)
    assert arr.shape == (1, 10)
    assert arr[0, 0] == tok.sot
    assert tok.eot in arr[0]
    assert arr[0, -1] == 0
    arr2 = tok(["he"], context_length=10, pad_id=None)
    assert arr2[0, -1] == tok.eot
    # argmax gives the FIRST eot with eot-padding (HF) and the real eot with
    # zero padding — both point at a valid pooling position
    assert arr2[0].argmax() <= arr[0].argmax()


def test_tokenizer_cleaning():
    tok = _tiny_tokenizer()
    a = tok.encode("  He   LLO ")
    b = tok.encode("he llo")
    assert a == b


def test_tokenizer_truncation():
    tok = _tiny_tokenizer()
    arr = tok(["he " * 100], context_length=7, pad_id=0)
    assert arr.shape == (1, 7)
    assert arr[0, -1] == tok.eot  # eot survives truncation


def test_prepared_conditioner(tmp_path, towers):
    import numpy as np
    import jax.numpy as jnp
    from rsvldm_tpu.models.text.conditioner import PreparedConditioner
    l, g, lp, gp = towers
    cond = SDXLConditioner(l, g, lp, gp)
    tl = jnp.zeros((1, 77), jnp.int32)
    ctrl1 = jnp.zeros((1, 8, 8, 4))
    c, uc = cond.paired(tl, tl, tl, tl, ctrl1)
    p = str(tmp_path / "prep.npz")
    PreparedConditioner.save(p, c, uc)
    prep = PreparedConditioner.load(p)
    ctrl3 = jnp.ones((3, 8, 8, 4))
    c2, uc2 = prep.paired(ctrl3)
    assert c2["crossattn"].shape == (3, 77, c["crossattn"].shape[-1])
    np.testing.assert_allclose(np.asarray(c2["crossattn"][0]),
                               np.asarray(c["crossattn"][0]), atol=1e-6)
    assert c2["control"].shape == (3, 8, 8, 4)
