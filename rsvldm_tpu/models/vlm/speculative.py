"""Speculative decoding: draft-model propose, target verify in one forward.

No reference counterpart — this is a TPU-native serving acceleration for
the caption stage (the reference decodes strictly one token per 8B forward,
llava/model/language_model/llava_llama.py generate). Batch-1 decode is an
HBM weight stream, so verifying k draft tokens in ONE target forward costs
nearly the same HBM traffic as decoding one token; with expected accepted
length E[a] the target weight stream shrinks by ~(1 + E[a])x.

Correctness contracts (tests/test_speculative.py):
- temperature 0: the committed stream is EXACTLY the target's greedy
  stream (`generate`), for ANY draft — draft quality only changes speed.
- temperature > 0: proposals are keyed per GENERATED INDEX with
  `generate`'s key schedule (key(0)=rng, key(j)=fold_in(rng, j)) and
  accepted via the Leviathan et al. rejection rule (accept d with prob
  min(1, p_t(d)/p_d(d)); resample from norm(max(p_t - p_d, 0)) on
  rejection) — the committed stream is distributed exactly as target
  sampling, and when draft == target every proposal is accepted and the
  stream equals `generate`'s bit-for-bit.

TPU design: one fixed-shape jitted ROUND = a k-step draft lax.scan + one
(k+1)-token target forward + in-jit acceptance; the host loop only slices
committed tokens (one small fetch per round). Both KV caches follow the
contiguous-position convention (physical slot == logical position):
entries past the commit point are stale but are overwritten before any
causal frontier reaches them — the same invariant as generate/engine
decode pad handling.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .generate import GenerateConfig
from .llama import KVCache, LlamaModel


def self_draft(params: dict, cfg, layers: int = 4):
    """Depth-pruned SELF-draft (LayerSkip / Draft-&-Verify style): the
    target's first `layers` transformer blocks plus its own embed / final
    norm / lm_head become the proposal model — speculative decoding
    without a separately trained draft checkpoint. Output correctness is
    independent of draft quality (the acceptance rule keeps greedy
    streams exactly the target's and sampled streams on the target's key
    schedule); the draft only moves the ACCEPTANCE RATE, i.e. speed.
    Returns (draft_model, draft_params) sharing the target's leaves —
    zero extra HBM. Works on quantized trees and any extra collections
    (e.g. runtime "lora") since only layer_<i> keys are filtered."""
    import dataclasses
    if not 0 < layers < cfg.layers:
        raise ValueError(f"self-draft layers must be in 1..{cfg.layers - 1}")
    dcfg = dataclasses.replace(cfg, layers=layers)
    out = {}
    for col, tree in params.items():
        sub = {}
        for k, v in tree.items():
            if k.startswith("layer_"):
                if int(k.split("_", 1)[1]) < layers:
                    sub[k] = v
            else:
                sub[k] = v
        out[col] = sub
    return LlamaModel(dcfg), out


def _key_for(rng, j):
    """generate()'s key schedule: rng itself for token 0, fold_in(rng, j)
    after — kept identical so draft == target reproduces `generate`."""
    return jax.lax.cond(j == 0, lambda: rng,
                        lambda: jax.random.fold_in(rng, j))


def _token_dist(logits, temp):
    """Token distribution at `temp`; greedy (temp<=0) is the one-hot
    argmax, which makes the acceptance ratio an equality test and the
    residual resample the target argmax."""
    greedy = jax.nn.one_hot(jnp.argmax(logits), logits.shape[-1],
                            dtype=jnp.float32)
    soft = jax.nn.softmax(logits.astype(jnp.float32)
                          / jnp.maximum(temp, 1e-6))
    return jnp.where(temp > 0, soft, greedy)


def _sample_dist(probs, key):
    """categorical over log-probs: shift-invariant Gumbel argmax, so for a
    softmax dist this draws the SAME token as categorical(key, logits/T)
    — the vanilla `generate` sampler — for the same key."""
    logp = jnp.where(probs > 0, jnp.log(probs), -jnp.inf)
    return jax.random.categorical(key, logp)


def accept_and_correct(d_toks, d_dists, t_dists, key_for, k: int):
    """The Leviathan accept + correction/bonus core, shared by the
    single-stream round below and the engine's per-slot rounds
    (serving/engine.py::_spec_round) so the two paths can never
    desynchronize. d_toks [k]; d_dists [k, V]; t_dists [k+1, V];
    key_for(j_rel) -> the caller's PRNG key for generated index
    j0 + j_rel (accept keys fold 7 onto it, the rejection-resample key
    folds 13, the bonus key is key_for(k) itself).
    Returns (committed [k+1] int32, n_commit)."""
    ratio = jax.vmap(lambda i: t_dists[i, d_toks[i]]
                     / jnp.maximum(d_dists[i, d_toks[i]], 1e-30))(
        jnp.arange(k))
    u = jax.vmap(lambda i: jax.random.uniform(
        jax.random.fold_in(key_for(i), 7)))(jnp.arange(k))
    ok = jnp.cumprod((u < ratio).astype(jnp.int32))
    n_acc = ok.sum()
    t_na = t_dists[n_acc]
    d_na = d_dists[jnp.minimum(n_acc, k - 1)]   # unused when n_acc==k
    resid = jnp.maximum(t_na - d_na, 0.0)
    resid = resid / jnp.maximum(resid.sum(), 1e-30)
    corr_dist = jnp.where(n_acc == k, t_na, resid)
    corr_key = jax.lax.cond(
        n_acc == k,
        lambda: key_for(k),                      # bonus == vanilla's key
        lambda: jax.random.fold_in(key_for(n_acc), 13))
    corr = _sample_dist(corr_dist, corr_key).astype(jnp.int32)
    committed = jnp.concatenate(
        [d_toks.astype(jnp.int32),
         jnp.zeros((1,), jnp.int32)]).at[n_acc].set(corr)
    return committed, n_acc + 1


@functools.lru_cache(maxsize=8)
def make_round_fn(target: LlamaModel, draft: LlamaModel, k: int):
    """Builds the jitted speculative round:
    round(tp, dp, cache_t, cache_d, pending, p, j0, temp, rng)
      -> (committed [k+1], n_committed, cache_t, cache_d)
    pending: last committed token (sampled, not yet fed); p: the position
    it will be fed at; j0: its generated index + 1 == the index of the
    first NEW token this round.

    Memoized on (target, draft, k) — flax Modules are hashable frozen
    dataclasses — so per-caption callers (speculative_generate via
    LlavaCaptioner.caption) reuse ONE traced round instead of recompiling
    the 8B verify program for every image."""

    @functools.partial(jax.jit, donate_argnums=(2, 3))
    def spec_round(tp, dp, cache_t: KVCache, cache_d: KVCache,
                   pending, p, j0, temp, rng):
        # --- draft proposes k tokens autoregressively -------------------
        def d_step(carry, i):
            tok, cache = carry
            emb = draft.apply(dp, tok[None, None], method=draft.embed)
            lg, cache = draft.apply(dp, emb, cache, p + i)
            dist = _token_dist(lg[0, -1], temp)
            nxt = _sample_dist(dist, _key_for(rng, j0 + i))
            return (nxt, cache), (nxt, dist)

        (d_last, cache_d), (d_toks, d_dists) = jax.lax.scan(
            d_step, (pending, cache_d), jnp.arange(k))
        # catch-up: feed d_k so the draft cache covers the verified block
        emb = draft.apply(dp, d_last[None, None], method=draft.embed)
        _, cache_d = draft.apply(dp, emb, cache_d, p + k)

        # --- target verifies the whole block in ONE forward -------------
        block = jnp.concatenate([pending[None], d_toks])         # [k+1]
        t_emb = target.apply(tp, block[None], method=target.embed)
        t_logits, cache_t = target.apply(tp, t_emb, cache_t, p)
        t_dists = jax.vmap(lambda lg: _token_dist(lg, temp))(
            t_logits[0])                                          # [k+1, V]

        # --- Leviathan acceptance + correction/bonus (shared core) ------
        # j0 >= 1 always (token 0 comes from the prefill), so the plain
        # fold_in below equals _key_for at every reachable index
        committed, n_commit = accept_and_correct(
            d_toks, d_dists, t_dists,
            lambda j_rel: jax.random.fold_in(rng, j0 + j_rel), k)
        return committed, n_commit, cache_t, cache_d

    return spec_round


def speculative_generate(target: LlamaModel, tp: Any, draft: LlamaModel,
                         dp: Any, input_embeds, cfg: GenerateConfig,
                         rng: jax.Array, k: int = 4,
                         draft_embeds=None,
                         return_stats: bool = False
                         ) -> "np.ndarray | tuple[np.ndarray, dict]":
    """Drop-in for `generate` with a draft model: [S, D] spliced prompt ->
    np.int32 generated ids (trimmed at the first eot); with
    return_stats=True, an (ids, stats) tuple instead.

    draft_embeds: the prompt in the draft's embedding space; defaults to
    input_embeds (valid when the families share dim/tokenizer, e.g. a
    depth-pruned or quantized draft).

    return_stats: also return {"rounds", "proposed", "accepted",
    "accept_rate"} — accepted counts DRAFT tokens that survived
    verification (the per-round +1 correction/bonus token is excluded),
    so accept_rate = accepted / proposed is the Leviathan acceptance
    probability the speedup model needs (round-4 review: the shipped
    accelerators were never measured into the bench story)."""
    temp = cfg.temperature if cfg.do_sample else 0.0
    s = input_embeds.shape[0]
    s_pad = -(-s // cfg.pad_to) * cfg.pad_to
    total = s_pad + cfg.max_new_tokens + k + 1   # round block may overrun
    pad = s_pad - s
    t_emb = jnp.pad(jnp.asarray(input_embeds), ((0, pad), (0, 0)))[None]
    d_in = input_embeds if draft_embeds is None else draft_embeds
    d_emb = jnp.pad(jnp.asarray(d_in), ((0, pad), (0, 0)))[None]

    from .generate import prefill_fn
    cache_t = KVCache.init(target.cfg, 1, total, target.cfg.dtype)
    cache_d = KVCache.init(draft.cfg, 1, total, draft.cfg.dtype)
    # jitted prefills (see generate.prefill_fn: eager 8B applies cost
    # hundreds of relay dispatches and would dominate measured tok/s)
    t_logits, cache_t = prefill_fn(target)(tp, t_emb, cache_t)
    _, cache_d = prefill_fn(draft)(dp, d_emb, cache_d)

    dist0 = _token_dist(t_logits[0, s - 1], jnp.float32(temp))
    pending = _sample_dist(dist0, _key_for(rng, jnp.int32(0))
                           ).astype(jnp.int32)

    round_fn = make_round_fn(target, draft, k)
    eot = set(int(e) for e in cfg.eot_ids)
    stats = {"rounds": 0, "proposed": 0, "accepted": 0}
    out: list[int] = [int(pending)]
    if out[0] in eot:
        out = []
    p, j0 = s, 1
    while out and len(out) < cfg.max_new_tokens:
        committed, n_c, cache_t, cache_d = round_fn(
            tp, dp, cache_t, cache_d, jnp.int32(out[-1]), jnp.int32(p),
            jnp.int32(j0), jnp.float32(temp), rng)
        toks = np.asarray(committed)[: int(n_c)]
        stats["rounds"] += 1
        stats["proposed"] += k
        stats["accepted"] += int(n_c) - 1   # the last token is corr/bonus
        stop = False
        for t in toks:
            out.append(int(t))
            if int(t) in eot:
                out = out[:-1]
                stop = True
                break
            if len(out) >= cfg.max_new_tokens:
                stop = True
                break
        if stop:
            break
        p += int(n_c)
        j0 += int(n_c)
    ids = np.asarray(out, np.int32)
    if return_stats:
        stats["accept_rate"] = (stats["accepted"] / stats["proposed"]
                                if stats["proposed"] else 0.0)
        return ids, stats
    return ids
