"""Perceiver / QFormer resampler numerical parity vs the reference torch
code (llava/model/multimodal_resampler/{perceiver,qformer}.py as oracle)."""

import types

import numpy as np
import pytest

import ref_oracle

pytestmark = pytest.mark.skipif(not ref_oracle.available(),
                                reason="reference repo not mounted")
if ref_oracle.available():
    ref_oracle.install()

torch = pytest.importorskip("torch")

import importlib.util  # noqa: E402
import sys  # noqa: E402

import jax.numpy as jnp  # noqa: E402


def _load_ref(rel, name):
    """Load a reference module by file path, skipping llava/__init__ (which
    pulls the full model stack). Bridges API drift: einops_exts is absent
    (perceiver.py guards the import then uses the name) and the vendored
    BERT imports helpers that moved from transformers.modeling_utils to
    transformers.pytorch_utils after v4.15."""
    import einops
    import transformers
    from transformers import pytorch_utils
    mu = transformers.modeling_utils
    for fn in ("apply_chunking_to_forward", "find_pruneable_heads_and_indices",
               "prune_linear_layer"):
        if not hasattr(mu, fn):
            setattr(mu, fn, getattr(pytorch_utils, fn))
    if "transformers.file_utils" not in sys.modules:
        import types as _t
        fu = _t.ModuleType("transformers.file_utils")
        fu.ModelOutput = transformers.utils.ModelOutput
        sys.modules["transformers.file_utils"] = fu
    spec = importlib.util.spec_from_file_location(
        name, f"/root/reference/{rel}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    if not hasattr(mod, "rearrange_many"):
        mod.rearrange_many = lambda ts, pattern, **kw: tuple(
            einops.rearrange(t, pattern, **kw) for t in ts)
    return mod

from rsvldm_tpu.models.vlm.resampler import (  # noqa: E402
    PerceiverConfig, PerceiverResampler, QFormerConfig, QFormerResampler,
    build_resampler)
from rsvldm_tpu.utils import convert_hf  # noqa: E402


def _randomize(mod, seed=0):
    torch.manual_seed(seed)
    for p in mod.parameters():
        p.data.normal_(0, 0.05)
    return mod.eval()


def test_perceiver_parity():
    ref_mod = _load_ref("llava/model/multimodal_resampler/perceiver.py",
                        "ref_perceiver")
    RefPerceiver = ref_mod.PerceiverResampler
    args = types.SimpleNamespace(mm_perceiver_depth=2, mm_perceiver_latents=8,
                                 mm_perceiver_ff_mult=4,
                                 mm_perceiver_pretrained=None)
    tower = types.SimpleNamespace(hidden_size=24)
    ref = _randomize(RefPerceiver(args, vision_tower=tower))

    cfg = PerceiverConfig(dim=24, depth=2, dim_head=4, heads=8, num_latents=8,
                          ff_mult=4)
    # reference hardcodes dim_head=64/heads=8 -> inner 512; match via
    # dim_head*heads == 64*8 is huge for a test, so instead rebuild the ref
    # module at small inner dims through its module class directly
    PerceiverResamplerModule = ref_mod.PerceiverResamplerModule
    ref.perceiver = _randomize(PerceiverResamplerModule(
        dim=24, depth=2, dim_head=4, heads=8, num_latents=8, ff_mult=4), 1)

    x = np.random.default_rng(0).normal(size=(2, 13, 24)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    params = convert_hf.convert_perceiver(ref.state_dict(), cfg)
    ours = PerceiverResampler(cfg)
    got = ours.apply(params, jnp.asarray(x))
    assert got.shape == want.shape == (2, 8, 24)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-4)


def test_perceiver_no_ff():
    """ff_mult=0 swaps the FeedForward for Identity (perceiver.py:97)."""
    PerceiverResamplerModule = _load_ref(
        "llava/model/multimodal_resampler/perceiver.py",
        "ref_perceiver").PerceiverResamplerModule
    ref = types.SimpleNamespace(
        perceiver=_randomize(PerceiverResamplerModule(
            dim=16, depth=2, dim_head=4, heads=4, num_latents=4, ff_mult=0), 2))
    cfg = PerceiverConfig(dim=16, depth=2, dim_head=4, heads=4, num_latents=4,
                          ff_mult=0)
    x = np.random.default_rng(1).normal(size=(1, 9, 16)).astype(np.float32)
    with torch.no_grad():
        want = ref.perceiver(torch.from_numpy(x)[:, None, None]).squeeze(1).numpy()
    # ref module state dict lacks the "perceiver." prefix when taken directly
    params = convert_hf.convert_perceiver(
        {f"perceiver.{k}": v for k, v in ref.perceiver.state_dict().items()},
        cfg)
    got = PerceiverResampler(cfg).apply(params, jnp.asarray(x))
    assert got.shape == want.shape == (1, 4, 16)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=2e-4)


def _build_ref_qformer(vision_width=24, freq=2, latents=8, layers=4,
                       hidden=32, heads=4, inter=64):
    """build_Qformer (qformer.py:1107-1123) with a locally constructed tiny
    BertConfig (from_pretrained needs network access)."""
    from transformers.models.bert.configuration_bert import BertConfig
    BertLMHeadModel = _load_ref(
        "llava/model/multimodal_resampler/qformer.py",
        "ref_qformer").BertLMHeadModel

    enc = BertConfig(hidden_size=hidden, num_hidden_layers=layers,
                     num_attention_heads=heads, intermediate_size=inter)
    enc.encoder_width = vision_width
    enc.add_cross_attention = True
    enc.cross_attention_freq = freq
    enc.query_length = latents
    qf = BertLMHeadModel(config=enc)
    query_tokens = torch.nn.Parameter(torch.zeros(1, latents, hidden))
    query_tokens.data.normal_(0, 0.05)
    qf.cls = None
    qf.bert.embeddings.word_embeddings = None
    qf.bert.embeddings.position_embeddings = None
    for layer in qf.bert.encoder.layer:
        layer.output = None
        layer.intermediate = None
    wrapper = torch.nn.Module()
    wrapper.Qformer = qf
    wrapper.query_tokens = query_tokens
    wrapper.ln_vision = torch.nn.LayerNorm(vision_width)
    return _randomize(wrapper, 3)


def test_qformer_parity():
    ref = _build_ref_qformer()
    x = np.random.default_rng(2).normal(size=(2, 13, 24)).astype(np.float32)
    with torch.no_grad():
        xt = ref.ln_vision(torch.from_numpy(x))
        atts = torch.ones(xt.size()[:-1], dtype=torch.long)
        out = ref.Qformer.bert(
            query_embeds=ref.query_tokens.expand(xt.shape[0], -1, -1),
            encoder_hidden_states=xt, encoder_attention_mask=atts,
            return_dict=True)
        want = out.last_hidden_state.numpy()

    cfg = QFormerConfig(hidden_size=32, layers=4, heads=4, intermediate=64,
                        encoder_width=24, num_latents=8,
                        cross_attention_freq=2)
    params = convert_hf.convert_qformer(ref.state_dict(), cfg)
    got = QFormerResampler(cfg).apply(params, jnp.asarray(x))
    assert got.shape == want.shape == (2, 8, 32)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=3e-4)


def test_build_resampler_covers_all_reference_variants():
    assert callable(build_resampler(None))
    assert callable(build_resampler("spatial_pool", stride=2))
    assert callable(build_resampler("masked_drop", ratio=0.25))
    assert isinstance(build_resampler("perceiver", dim=16), PerceiverResampler)
    assert isinstance(build_resampler("qformer", hidden_size=32, layers=2,
                                      heads=4, intermediate=64,
                                      encoder_width=16), QFormerResampler)
    with pytest.raises(ValueError):
        build_resampler("nope")
