"""LLaVA supervised finetuning: LoRA adapters + masked next-token loss.

Parity target: /root/reference llava/train/train.py — per-template
preprocessing that masks everything except assistant responses with
IGNORE_INDEX=-100 (:409-957), LoRA wrap + tunable-parts selection
(:1502-1668: lora on every LM linear via find_all_linear_names,
mm_projector trainable),
LLaVATrainer custom param groups (llava_trainer.py:361-438) — rebuilt as a
functional JAX loop instead of HF Trainer + DeepSpeed: the dp-sharded train
step optimizes ONLY the LoRA/projector params (the frozen base never enters
the optimizer state, the ZeRO-3 equivalent being simply "frozen params are
not replicated into adam moments").

LoRA here is functional: adapters live in their own pytree and are folded
into the base kernels inside the forward (W_eff = W + scale * B @ A), so the
base model code is untouched and the merge-at-export path reuses
convert_hf.merge_lora.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

IGNORE_INDEX = -100  # llava/constants.py


# ------------------------------------------------------------------ LoRA

@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 16
    alpha: int = 16
    # the reference adapts EVERY LM linear except lm_head
    # (find_all_linear_names + lora_target_modules, train.py:1524) — the
    # attention projections alone would train far less capacity
    targets: Sequence[str] = ("q_proj", "k_proj", "v_proj", "o_proj",
                              "gate_proj", "up_proj", "down_proj")

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def init_lora(params: Dict, cfg: LoraConfig, rng: jax.Array) -> Dict:
    """A/B pairs for every target kernel. A ~ kaiming-uniform
    U(-1/sqrt(in), 1/sqrt(in)) — PEFT's lora_A init (kaiming_uniform with
    a=sqrt(5) on a Linear reduces to exactly that bound) — and B = 0."""
    lora: Dict = {}

    def walk(tree, path, out):
        for k, v in tree.items():
            if isinstance(v, dict) and any(t == k for t in cfg.targets) \
                    and ("kernel" in v or "kernel_q" in v
                         or "kernel_q4" in v):
                import zlib
                # fp kernel [in,out]; int8 kernel_q [in,out]; int4
                # kernel_q4 [in//2,out] (two nibble planes along `in`)
                if "kernel" in v:
                    in_f, out_f = v["kernel"].shape
                elif "kernel_q" in v:
                    in_f, out_f = v["kernel_q"].shape
                else:
                    in_f, out_f = (2 * v["kernel_q4"].shape[0],
                                   v["kernel_q4"].shape[1])
                # crc32: stable across processes (hash() is salted)
                rng_k = jax.random.fold_in(
                    rng, zlib.crc32("/".join(path + [k]).encode()) % (2**31))
                bound = 1.0 / float(in_f) ** 0.5
                out[k] = {
                    "a": jax.random.uniform(rng_k, (in_f, cfg.r),
                                            jnp.float32, -bound, bound),
                    "b": jnp.zeros((cfg.r, out_f), jnp.float32),
                }
            elif isinstance(v, dict):
                sub: Dict = {}
                walk(v, path + [k], sub)
                if sub:
                    out[k] = sub

    walk(params["params"], [], lora)
    return lora


def apply_lora(params: Dict, lora: Dict, scale: float) -> Dict:
    """Fold adapters into a copy of the param tree (W + scale * A @ B)."""

    def walk(tree, ltree):
        out = {}
        for k, v in tree.items():
            if k in ltree and isinstance(ltree[k], dict) \
                    and "a" in ltree[k]:
                la, lb = ltree[k]["a"], ltree[k]["b"]
                out[k] = dict(v)
                out[k]["kernel"] = v["kernel"] + scale * (la @ lb).astype(
                    v["kernel"].dtype)
            elif isinstance(v, dict):
                out[k] = walk(v, ltree.get(k, {}))
            else:
                out[k] = v
        return out

    return {"params": walk(params["params"], lora)}


def quant_mode(params: Dict) -> str | None:
    """"int8" / "int4" when the tree holds quantized kernels, else None."""
    found = []

    def walk(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                if "kernel_q" in v:
                    found.append("int8")
                elif "kernel_q4" in v:
                    found.append("int4")
                else:
                    walk(v)

    walk(params["params"])
    return found[0] if found else None


def runtime_lora(lora: Dict, scale: float) -> Dict:
    """The "lora" collection for `.apply`: the adapter scale (alpha/r) is
    folded into `b` so the model-side branch is just (x @ a) @ b."""

    def walk(tree):
        if set(tree) == {"a", "b"}:
            return {"a": tree["a"], "b": tree["b"] * scale}
        return {k: walk(v) for k, v in tree.items()}

    return walk(lora)


def apply_model(model, base_params: Dict, lora: Dict | None,
                lora_cfg: LoraConfig, *args, **kw):
    """One forward entry for fp AND quantized bases. fp: adapters fold
    into the kernels (W + s*AB). Quantized: kernels stay int8/int4 and the
    adapters ride the "lora" collection into the runtime branch
    (models/vlm/llama.py::_maybe_lora) — the QLoRA forward."""
    if lora is None:
        return model.apply(base_params, *args, **kw)
    if quant_mode(base_params):
        return model.apply(
            {**base_params, "lora": runtime_lora(lora, lora_cfg.scale)},
            *args, **kw)
    return model.apply(apply_lora(base_params, lora, lora_cfg.scale),
                       *args, **kw)


def export_merged(params: Dict, lora: Dict, cfg: LoraConfig) -> Dict:
    """Merged param tree for inference (the runtime-PEFT-free path).

    For an int8 base the merge dequantizes each adapted kernel, adds
    s*A@B and REquantizes (one extra RTN rounding on the delta — the
    adapters can also be served unmerged via the runtime branch, which is
    exact). int4 group-packed kernels are served unmerged only."""
    mode = quant_mode(params)
    if mode is None:
        return apply_lora(params, lora, cfg.scale)
    if mode == "int4":
        raise NotImplementedError(
            "int4 merge would re-round group-packed nibbles; serve adapters "
            "unmerged via the runtime 'lora' collection instead")
    from ..ops.quant import quantize_weight

    def walk(tree, ltree):
        out = {}
        for k, v in tree.items():
            if k in ltree and isinstance(ltree[k], dict) and "a" in ltree[k]:
                la, lb = ltree[k]["a"], ltree[k]["b"]
                w = (v["kernel_q"].astype(jnp.float32) * v["scale"]
                     + cfg.scale * (la @ lb))
                ql = quantize_weight(w)
                out[k] = {**v, "kernel_q": ql.q, "scale": ql.scale}
            elif isinstance(v, dict):
                out[k] = walk(v, ltree.get(k, {}))
            else:
                out[k] = v
        return out

    return {"params": walk(params["params"], lora)}


# ---------------------------------------------------------- preprocessing

def preprocess_conversation(prompt_ids: np.ndarray, answer_ids: np.ndarray,
                            eot_id: int) -> tuple[np.ndarray, np.ndarray]:
    """(input_ids, labels): the prompt span is masked with IGNORE_INDEX,
    only assistant tokens (+ closing eot) supervise (train.py preprocessors)."""
    inp = np.concatenate([prompt_ids, answer_ids, [eot_id]]).astype(np.int32)
    labels = np.full_like(inp, IGNORE_INDEX)
    labels[len(prompt_ids):] = inp[len(prompt_ids):]
    return inp, labels


# ----------------------------------------------------------------- loss

def vlm_loss(model, base_params, lora, lora_cfg: LoraConfig,
             input_embeds: jnp.ndarray, labels: jnp.ndarray,
             cache) -> jnp.ndarray:
    """Masked next-token cross entropy. input_embeds [B,S,D] already carry
    spliced image features; labels [B,S] with IGNORE_INDEX on unsupervised
    positions (image/prompt spans)."""
    logits, _ = apply_model(model, base_params, lora, lora_cfg,
                            input_embeds, cache, 0)
    return masked_ce(logits, labels)


def masked_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    mask = targets != IGNORE_INDEX
    safe = jnp.where(mask, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def mm_loss(model, base_params, lora, lora_cfg: LoraConfig,
            projector, proj_params, vis_feats: jnp.ndarray,
            text_embeds: jnp.ndarray, img_pos: jnp.ndarray,
            labels: jnp.ndarray, cache) -> jnp.ndarray:
    """Multimodal loss with the PROJECTOR inside the differentiated graph
    (train.py's tune_mm_mlp_adapter pretrain stage / mm_projector_lr joint
    finetune — the projector is the one multimodal module the reference
    always trains). vis_feats [B,T,Dv] are PRE-projector tower features;
    text_embeds [B,S,D] carry a zero-filled reserved span of T rows at
    img_pos[b] (labels IGNORE there); the projected features are scattered
    into the span per row, so projector grads flow through the LM."""
    feats = projector.apply(proj_params, vis_feats)
    emb = jax.vmap(
        lambda e, f, p: jax.lax.dynamic_update_slice(
            e, f.astype(e.dtype), (p, 0)))(text_embeds, feats, img_pos)
    logits, _ = apply_model(model, base_params, lora, lora_cfg, emb,
                            cache, 0)
    return masked_ce(logits, labels)


# ------------------------------------------------------------------ DPO

def _sequence_logprob(model, params, embeds, labels, cache, *,
                      lora=None, lora_cfg=None):
    logits, _ = apply_model(model, params, lora, lora_cfg, embeds, cache, 0)
    logits = logits[:, :-1]
    targets = labels[:, 1:]
    mask = targets != IGNORE_INDEX
    safe = jnp.where(mask, targets, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return jnp.sum(tok_lp * mask, axis=-1)


def dpo_loss(model, base_params, lora, lora_cfg: LoraConfig,
             chosen_embeds, chosen_labels, rejected_embeds, rejected_labels,
             cache, beta: float = 0.1) -> jnp.ndarray:
    """Direct preference optimization (llava/train/train_dpo.py parity):
    -log sigmoid(beta * ((pi_c - ref_c) - (pi_r - ref_r))), where the frozen
    base model IS the reference policy (LoRA-only policy delta)."""
    pi_c = _sequence_logprob(model, base_params, chosen_embeds, chosen_labels,
                             cache, lora=lora, lora_cfg=lora_cfg)
    pi_r = _sequence_logprob(model, base_params, rejected_embeds,
                             rejected_labels, cache, lora=lora,
                             lora_cfg=lora_cfg)
    ref_c = _sequence_logprob(model, base_params, chosen_embeds, chosen_labels,
                              cache)
    ref_r = _sequence_logprob(model, base_params, rejected_embeds,
                              rejected_labels, cache)
    margin = beta * ((pi_c - ref_c) - (pi_r - ref_r))
    return -jnp.mean(jax.nn.log_sigmoid(margin))


# --------------------------------------------------------------- trainer

class VLMTrainer:
    """LoRA finetuning of the language backbone (+ projector optionally).

    Only the adapter tree enters the optimizer — the frozen base params are
    closed over (never copied into adam state)."""

    def __init__(self, model, base_params, lora_cfg: LoraConfig = LoraConfig(),
                 lr: float = 2e-4, rng: jax.Array | None = None, mesh=None):
        self.model = model
        self.base_params = base_params
        self.lora_cfg = lora_cfg
        self.mesh = mesh
        rng = jax.random.PRNGKey(0) if rng is None else rng
        self.lora = init_lora(base_params, lora_cfg, rng)
        self.tx = optax.adamw(lr, weight_decay=0.0)  # HF default wd=0
        self.opt_state = self.tx.init(self.lora)
        self.step = 0

        def _step(lora, opt_state, embeds, labels, cache):
            loss, grads = jax.value_and_grad(
                lambda l: vlm_loss(model, base_params, l, lora_cfg, embeds,
                                   labels, cache))(lora)
            updates, opt_state = self.tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss

        self._train_step = jax.jit(_step)

    def train_step(self, input_embeds, labels, cache) -> float:
        if self.mesh is not None:
            from ..parallel import put_batch
            input_embeds = put_batch(self.mesh, input_embeds)
            labels = put_batch(self.mesh, labels)
        self.lora, self.opt_state, loss = self._train_step(
            self.lora, self.opt_state, input_embeds, labels, cache)
        self.step += 1
        return float(loss)

    def merged_params(self) -> Dict:
        return export_merged(self.base_params, self.lora, self.lora_cfg)


class DPOTrainer:
    """LoRA-only DPO (train_dpo.py): the adapter-free base IS the frozen
    reference policy, so one param set serves policy and reference
    (dpo_loss runs the base twice without adapters for ref logprobs).
    Works on fp and int8/int4-quantized bases (QLoRA-DPO)."""

    def __init__(self, model, base_params, lora_cfg: LoraConfig = LoraConfig(),
                 lr: float = 5e-5, beta: float = 0.1,
                 rng: jax.Array | None = None, mesh=None):
        self.model = model
        self.base_params = base_params
        self.lora_cfg = lora_cfg
        self.beta = beta
        self.mesh = mesh
        rng = jax.random.PRNGKey(0) if rng is None else rng
        self.lora = init_lora(base_params, lora_cfg, rng)
        self.tx = optax.adamw(lr, weight_decay=0.0)  # HF default wd=0
        self.opt_state = self.tx.init(self.lora)
        self.step = 0

        def _step(lora, opt_state, ce, cl, re_, rl, cache):
            loss, grads = jax.value_and_grad(
                lambda l: dpo_loss(model, base_params, l, lora_cfg,
                                   ce, cl, re_, rl, cache, beta))(lora)
            updates, opt_state = self.tx.update(grads, opt_state, lora)
            return optax.apply_updates(lora, updates), opt_state, loss

        self._train_step = jax.jit(_step)

    def train_step(self, chosen_embeds, chosen_labels, rejected_embeds,
                   rejected_labels, cache) -> float:
        if self.mesh is not None:
            from ..parallel import put_batch
            put = lambda x: put_batch(self.mesh, x)
            chosen_embeds, chosen_labels = put(chosen_embeds), put(
                jnp.asarray(chosen_labels))
            rejected_embeds, rejected_labels = put(rejected_embeds), put(
                jnp.asarray(rejected_labels))
        self.lora, self.opt_state, loss = self._train_step(
            self.lora, self.opt_state, chosen_embeds, chosen_labels,
            rejected_embeds, rejected_labels, cache)
        self.step += 1
        return float(loss)

    def merged_params(self) -> Dict:
        return export_merged(self.base_params, self.lora, self.lora_cfg)


class MMTrainer:
    """Multimodal trainer over any combination of {LoRA adapters,
    projector}, with the projector inside the differentiated graph.

    tune=("projector",) reproduces the reference PRETRAIN stage
    (tune_mm_mlp_adapter — projector-only, LM and tower frozen,
    train.py:1618-1630); tune=("lora", "projector") is the finetune
    recipe, with mm_projector_lr as the projector's own param-group lr
    (llava_trainer.py:361-438 builds exactly these optimizer groups).
    The frozen base (fp or int8/int4-quantized) never enters optimizer
    state."""

    def __init__(self, model, base_params, projector, proj_params,
                 lora_cfg: LoraConfig = LoraConfig(),
                 tune: Sequence[str] = ("lora", "projector"),
                 lr: float = 2e-4, mm_projector_lr: float | None = None,
                 rng: jax.Array | None = None, mesh=None):
        assert set(tune) <= {"lora", "projector"} and tune, tune
        self.model = model
        self.base_params = base_params
        self.projector = projector
        self.lora_cfg = lora_cfg
        self.tune = tuple(tune)
        self.mesh = mesh
        rng = jax.random.PRNGKey(0) if rng is None else rng
        trainable: Dict = {}
        if "lora" in tune:
            trainable["lora"] = init_lora(base_params, lora_cfg, rng)
        if "projector" in tune:
            trainable["proj"] = proj_params
        self._frozen_proj = None if "projector" in tune else proj_params
        self.trainable = trainable
        self.tx = optax.multi_transform(
            {"lora": optax.adamw(lr, weight_decay=0.0),
             "proj": optax.adamw(weight_decay=0.0, learning_rate=mm_projector_lr
                                 if mm_projector_lr is not None else lr)},
            {k: jax.tree_util.tree_map(lambda _, kk=k: kk, v)
             for k, v in trainable.items()})
        self.opt_state = self.tx.init(trainable)
        self.step = 0
        frozen_proj = self._frozen_proj

        def _step(trainable, opt_state, vis_feats, text_embeds, img_pos,
                  labels, cache):
            def loss_fn(tr):
                return mm_loss(model, base_params, tr.get("lora"), lora_cfg,
                               projector, tr.get("proj", frozen_proj),
                               vis_feats, text_embeds, img_pos, labels,
                               cache)
            loss, grads = jax.value_and_grad(loss_fn)(trainable)
            updates, opt_state = self.tx.update(grads, opt_state, trainable)
            return optax.apply_updates(trainable, updates), opt_state, loss

        self._train_step = jax.jit(_step)

    @property
    def lora(self):
        return self.trainable.get("lora")

    @property
    def proj_params(self):
        return self.trainable.get("proj", self._frozen_proj)

    def train_step(self, vis_feats, text_embeds, img_pos, labels,
                   cache) -> float:
        """vis_feats [B,T,Dv] pre-projector tower features; text_embeds
        [B,S,D] with a zero reserved span of T rows at img_pos[b];
        labels [B,S] (IGNORE over prompt + image spans)."""
        if self.mesh is not None:
            from ..parallel import put_batch
            put = lambda x: put_batch(self.mesh, jnp.asarray(x))
            # shard EVERY batch-major operand (an uncommitted labels array
            # next to committed embeds forces a reshard inside the jit)
            vis_feats, text_embeds = put(vis_feats), put(text_embeds)
            labels, img_pos = put(labels), put(img_pos)
        self.trainable, self.opt_state, loss = self._train_step(
            self.trainable, self.opt_state, vis_feats, text_embeds,
            jnp.asarray(img_pos), labels, cache)
        self.step += 1
        return float(loss)


# ------------------------------------------------------- adapter archives

def _flatten_tree(tree: Dict) -> Dict[str, np.ndarray]:
    flat = {}

    def walk(t, p):
        for k, v in t.items():
            if isinstance(v, dict):
                walk(v, p + [k])
            else:
                flat["/".join(p + [k])] = np.asarray(v)

    walk(tree, [])
    return flat


def _unflatten_tree(z, skip=()) -> Dict:
    tree: Dict = {}
    for k in z.files:
        if k in skip:
            continue
        parts = k.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(z[k])
    return tree


def save_lora_npz(lora: Dict, cfg: LoraConfig, path) -> None:
    """Adapter checkpoint: one npz of path-flattened A/B planes plus the
    LoraConfig as a json meta entry (the save-side of the reference's
    get_peft_state_maybe_zero_3 non_lora/lora split — here the base is
    frozen by construction so ONLY adapters ever need saving)."""
    import json as _json

    np.savez(path, __meta__=_json.dumps(
        {"r": cfg.r, "alpha": cfg.alpha, "targets": list(cfg.targets)}),
        **_flatten_tree(lora))


def load_lora_npz(path) -> tuple[Dict, LoraConfig]:
    """Inverse of save_lora_npz: (adapter tree, LoraConfig)."""
    import json as _json

    z = np.load(path, allow_pickle=False)
    meta = _json.loads(str(z["__meta__"]))
    return _unflatten_tree(z, skip=("__meta__",)), LoraConfig(
        r=meta["r"], alpha=meta["alpha"], targets=tuple(meta["targets"]))


def save_projector_npz(proj_params: Dict, path) -> None:
    """Projector checkpoint (the pretrain-stage artifact — the reference
    saves mm_projector.bin from get_mm_adapter_state, train.py:263-270)."""
    np.savez(path, **_flatten_tree(proj_params))


def load_projector_npz(path) -> Dict:
    return _unflatten_tree(np.load(path, allow_pickle=False))
