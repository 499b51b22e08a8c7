"""LLaVA caption generation: prompt build, embed splice, scan decode.

Parity target: /root/reference models/util.py get_img_describe (:17-66),
llava/model/llava_arch.py prepare_inputs_labels_for_multimodal embedding
splice at IMAGE_TOKEN_INDEX=-200 (:447-533), llava/mm_utils.py
tokenizer_image_token (:343-362), llava/conversation.py llama_3 template
(:387-398) and HF generate (temperature sampling, eot stop).

TPU design: the autoregressive loop is ONE lax.scan over max_new_tokens with
the KV cache in the carry — no per-token host round trip. Prompt lengths are
bucketed (pad to /128) so recompilation is rare across images.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .llama import KVCache, LlamaModel


@functools.lru_cache(maxsize=16)
def prefill_fn(model: LlamaModel):
    """Jitted prompt prefill, memoized per model (flax Modules are
    hashable frozen dataclasses). An un-jitted `model.apply` dispatches
    every layer op individually — harmless on CPU, but through the TPU
    relay each dispatch costs ~33 ms, turning a 0.26 s jitted 8B prefill
    into tens of seconds. Shared by generate/generate_batch/speculative."""
    @jax.jit
    def f(params, embeds, cache):
        return model.apply(params, embeds, cache, 0)
    return f

IMAGE_TOKEN_INDEX = -200     # llava/constants.py:7-12
DEFAULT_IMAGE_TOKEN = "<image>"
LLAMA3_EOT = 128009          # <|eot_id|> (conversation.py stop_token_ids)

SYSTEM_PROMPT = ("You are a helpful language and vision assistant. "
                 "You are able to understand the visual content that the user "
                 "provides, and assist the user with a variety of tasks using "
                 "natural language.")


def render_llama3_chat(turns, system: str = SYSTEM_PROMPT) -> str:
    """Multi-turn llama-3 chat template with generation header (the
    llava_llama_3 conversation renders via tokenizer.apply_chat_template).
    turns: sequence of (role, message)."""
    out = ["<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\n"
           f"{system}<|eot_id|>"]
    for role, msg in turns:
        out.append(f"<|start_header_id|>{role}<|end_header_id|>\n\n"
                   f"{msg}<|eot_id|>")
    out.append("<|start_header_id|>assistant<|end_header_id|>\n\n")
    return "".join(out)


def llama3_chat_prompt(user_message: str, system: str = SYSTEM_PROMPT) -> str:
    """Single-turn convenience over render_llama3_chat."""
    return render_llama3_chat([("user", user_message)], system)


def tokenize_with_image(prompt: str, encode_fn: Callable[[str], list],
                        image_token_index: int = IMAGE_TOKEN_INDEX) -> np.ndarray:
    """Split the prompt at <image> and splice the sentinel id between chunks
    (mm_utils.tokenizer_image_token). encode_fn must NOT add special tokens."""
    chunks = [encode_fn(c) for c in prompt.split(DEFAULT_IMAGE_TOKEN)]
    ids: list[int] = list(chunks[0])
    for chunk in chunks[1:]:
        ids.append(image_token_index)
        ids.extend(chunk)
    return np.asarray(ids, dtype=np.int32)


def anyres_image_features(vision_apply, projector_apply, image,
                          image_newline, patch_size: int = 336
                          ) -> jnp.ndarray:
    """One PIL image -> its anyres spatial-unpad token stream [T, D]
    (tiles through the tower + projector, unpadded grid + newline column).
    THE per-image feature pipeline — caption, multi-image serving, and
    anyres training all route through here."""
    from . import anyres
    from .vision import normalize_pixels

    grid = anyres.grid_pinpoints_for(patch_size)
    patches = anyres.process_anyres_image(image, patch_size, grid)
    feats = projector_apply(vision_apply(
        normalize_pixels(jnp.asarray(patches))))
    return jnp.asarray(anyres.assemble_spatial_unpad(
        np.asarray(feats), image.size, np.asarray(image_newline),
        grid, patch_size))


def embed_multimodal_prompt(model, params, vision_apply, projector_apply,
                            prompt_text: str, images, encode_fn,
                            image_newline, patch_size: int = 336
                            ) -> jnp.ndarray:
    """Rendered prompt (any number of <image> placeholders) + PIL images
    -> spliced [S, D] input embeds: one anyres->spatial-unpad feature
    stream per placeholder, in order (model_worker.py:114-141 +
    llava_arch.py:447-495 multi-image semantics)."""
    ids = tokenize_with_image(prompt_text, encode_fn)
    safe = jnp.asarray(np.where(ids == IMAGE_TOKEN_INDEX, 0, ids))
    text_embeds = model.apply(params, safe, method=model.embed)
    positions = np.where(ids == IMAGE_TOKEN_INDEX)[0]
    if len(positions) != len(images):
        raise ValueError(f"{len(images)} images for {len(positions)} "
                         f"{DEFAULT_IMAGE_TOKEN} tokens in the prompt")
    segs, prev = [], 0
    for pos, image in zip(positions, images):
        toks = anyres_image_features(vision_apply, projector_apply, image,
                                     image_newline, patch_size)
        segs += [text_embeds[prev:int(pos)], toks]
        prev = int(pos) + 1
    segs.append(text_embeds[prev:])
    return jnp.concatenate(segs, axis=0)


def splice_image_embeds(token_ids: np.ndarray, text_embeds: jnp.ndarray,
                        image_features: jnp.ndarray) -> jnp.ndarray:
    """Replace the single -200 position with the image token stream
    (llava_arch.py:447-495; single image, batch 1).

    token_ids: [S] host ints; text_embeds: [S, D] (embedding of token_ids
    with the sentinel clamped); image_features: [T, D]."""
    pos = int(np.where(token_ids == IMAGE_TOKEN_INDEX)[0][0])
    return jnp.concatenate([text_embeds[:pos], image_features,
                            text_embeds[pos + 1:]], axis=0)


@dataclasses.dataclass(frozen=True)
class GenerateConfig:
    max_new_tokens: int = 256     # infer.py:162
    temperature: float = 0.2      # models/util.py:27
    do_sample: bool = True
    eot_ids: Sequence[int] = (LLAMA3_EOT,)
    pad_to: int = 128             # prompt-length bucket


def generate(model: LlamaModel, params: Any, input_embeds: jnp.ndarray,
             cfg: GenerateConfig, rng: jax.Array, mesh=None) -> np.ndarray:
    """input_embeds: [S, D] spliced prompt -> np.int32 generated ids
    (trimmed at the first eot).

    mesh: when the params are tensor-sharded (parallel/llama_sharding.py)
    the KV cache is sharded over kv heads on the same axis so every decode
    matmul stays local to its shard (XLA all-reduces only the row-parallel
    projections)."""
    s = input_embeds.shape[0]
    s_pad = -(-s // cfg.pad_to) * cfg.pad_to
    total = s_pad + cfg.max_new_tokens
    # Right-pad the prompt to the bucket size. The pad positions s..s_pad-1
    # hold garbage K/V after prefill, but they are never visible: the causal
    # mask hides them from position s-1 (where the first logits are read) and
    # each decode step overwrites position s+i before any later query sees it.
    pad = s_pad - s
    embeds = jnp.pad(input_embeds, ((0, pad), (0, 0)))[None]  # [1, s_pad, D]

    cache = KVCache.init(model.cfg, 1, total, dtype=model.cfg.dtype)
    if mesh is not None:
        from ...parallel.llama_sharding import shard_kv_cache
        from ...parallel.mesh import replicate
        cache = shard_kv_cache(cache, mesh)
        embeds = jax.device_put(embeds, replicate(mesh))
    logits, cache = prefill_fn(model)(params, embeds, cache)
    last_logits = logits[0, s - 1]  # last REAL prompt position

    def sample(lg, key):
        if cfg.do_sample and cfg.temperature > 0:
            return jax.random.categorical(key, lg / cfg.temperature)
        return jnp.argmax(lg)

    tok0 = sample(last_logits, rng)
    eot = jnp.asarray(list(cfg.eot_ids))

    def body(carry, i):
        tok, cache, done = carry
        emb = model.apply(params, tok[None, None], method=model.embed)
        # decode positions continue from the REAL prompt length; the padded
        # tail of the prefill (positions s..s_pad) is never attended because
        # we overwrite from position s onward
        lg, cache = model.apply(params, emb, cache, s + i)
        key = jax.random.fold_in(rng, i + 1)
        nxt = sample(lg[0, -1], key)
        nxt = jnp.where(done, eot[0], nxt)
        done = jnp.logical_or(done, jnp.any(nxt == eot))
        return (nxt, cache, done), tok

    (last_tok, _, _), toks = jax.lax.scan(
        body, (tok0, cache, jnp.any(tok0 == eot)),
        jnp.arange(cfg.max_new_tokens - 1))
    all_toks = jnp.concatenate([toks, last_tok[None]])
    out = np.asarray(all_toks)
    stops = np.isin(out, np.asarray(list(cfg.eot_ids)))
    if stops.any():
        out = out[: int(np.argmax(stops))]
    return out


def generate_batch(model: LlamaModel, params: Any,
                   input_embeds_list: Sequence[jnp.ndarray],
                   cfg: GenerateConfig, rng: jax.Array,
                   mesh=None) -> list:
    """Batched decode: B spliced prompts (varying lengths) share every
    weight read — on one chip the ~16GB/step parameter stream is the decode
    bottleneck, so batching folder captions multiplies caption throughput
    by ~B (the reference captions strictly per image, infer_dir.py:142-152).

    Layout: prompts are RIGHT-padded to a shared bucket, so each row stays
    contiguous in its cache (physical slot == logical position; masking is
    purely causal). The prefill is ONE batched call through the flash path
    — pad garbage is strictly in the causal future of every real token —
    and decode writes at per-row slots lens[b]+i, progressively overwriting
    the pad garbage before any causal frontier reaches it. Each row tracks
    its own eot `done` flag. Returns a list of np.int32 id arrays."""
    b = len(input_embeds_list)
    if b == 1:
        return [generate(model, params, input_embeds_list[0], cfg, rng,
                         mesh=mesh)]
    s_max = max(e.shape[0] for e in input_embeds_list)
    s_pad = -(-s_max // cfg.pad_to) * cfg.pad_to
    total = s_pad + cfg.max_new_tokens
    embeds = jnp.stack([jnp.pad(e, ((0, s_pad - e.shape[0]), (0, 0)))
                        for e in input_embeds_list])  # [B, s_pad, D]
    lens = jnp.asarray([e.shape[0] for e in input_embeds_list])

    cache = KVCache.init(model.cfg, b, total, dtype=model.cfg.dtype)
    if mesh is not None:
        from ...parallel.llama_sharding import shard_kv_cache
        from ...parallel.mesh import replicate
        cache = shard_kv_cache(cache, mesh)
        embeds = jax.device_put(embeds, replicate(mesh))

    logits, cache = prefill_fn(model)(params, embeds, cache)
    # last REAL prompt position per row
    last_logits = jnp.take_along_axis(
        logits, (lens - 1)[:, None, None], axis=1)[:, 0]  # [B, vocab]

    def sample(lg, key):
        if cfg.do_sample and cfg.temperature > 0:
            return jax.random.categorical(key, lg / cfg.temperature, axis=-1)
        return jnp.argmax(lg, axis=-1)

    tok0 = sample(last_logits, rng)  # [B]
    eot = jnp.asarray(list(cfg.eot_ids))

    def body(carry, i):
        tok, cache, done = carry
        emb = model.apply(params, tok[:, None], method=model.embed)
        lg, cache = model.apply(params, emb, cache, lens + i)
        key = jax.random.fold_in(rng, i + 1)
        nxt = sample(lg[:, -1], key)
        nxt = jnp.where(done, eot[0], nxt)
        done = jnp.logical_or(done, jnp.isin(nxt, eot))
        return (nxt, cache, done), tok

    done0 = jnp.isin(tok0, eot)
    (last_tok, _, _), toks = jax.lax.scan(
        body, (tok0, cache, done0), jnp.arange(cfg.max_new_tokens - 1))
    all_toks = np.asarray(jnp.concatenate([toks, last_tok[None]]))  # [T, B]
    outs = []
    for j in range(b):
        row = all_toks[:, j]
        stops = np.isin(row, np.asarray(list(cfg.eot_ids)))
        outs.append(row[: int(np.argmax(stops))] if stops.any() else row)
    return outs


def caption_image(model, params, vision_apply, projector_apply, image,
                  prompt_text: str, encode_fn, decode_fn, image_newline,
                  cfg: GenerateConfig = GenerateConfig(),
                  rng: jax.Array | None = None, patch_size: int = 336,
                  mesh=None, generate_fn=None) -> str:
    """Full Stage-2a: anyres -> vision tower -> projector -> spatial_unpad
    assembly -> splice -> generate -> decode (infer.py:145-166).

    generate_fn: optional decode override with `generate`'s signature
    (model, params, spliced, cfg, rng, mesh=) -> np ids — used to swap in
    the speculative decoder (speculative.py) without duplicating the
    anyres/splice orchestration."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    spliced = embed_multimodal_prompt(
        model, params, vision_apply, projector_apply,
        llama3_chat_prompt(prompt_text), [image], encode_fn, image_newline,
        patch_size)
    out_ids = (generate_fn or generate)(model, params, spliced, cfg, rng,
                                        mesh=mesh)
    return decode_fn(out_ids.tolist()).lstrip()


def caption_images(model, params, vision_apply, projector_apply, images,
                   prompt_text: str, encode_fn, decode_fn, image_newline,
                   cfg: GenerateConfig = GenerateConfig(),
                   rng: jax.Array | None = None, patch_size: int = 336,
                   mesh=None) -> list:
    """Batched Stage-2a over a folder: per-image vision/anyres assembly
    (cheap, variable patch counts), then ONE batched LLM decode — the
    parameter stream that dominates single-chip decode is shared across the
    whole batch (generate_batch)."""
    rng = jax.random.PRNGKey(0) if rng is None else rng
    prompt = llama3_chat_prompt(prompt_text)
    ids = tokenize_with_image(prompt, encode_fn)
    safe_ids = jnp.asarray(np.where(ids == IMAGE_TOKEN_INDEX, 0, ids))
    text_embeds = model.apply(params, safe_ids, method=model.embed)
    spliced = [
        splice_image_embeds(ids, text_embeds, anyres_image_features(
            vision_apply, projector_apply, image, image_newline, patch_size))
        for image in images]
    outs = generate_batch(model, params, spliced, cfg, rng, mesh=mesh)
    return [decode_fn(o.tolist()).lstrip() for o in outs]
