"""Tensor-parallel sharding rules for the Llama decoder.

The reference runs LLaVA-8B on its own GPU (SURVEY P1); on TPU the 8B model
is tensor-sharded across the mesh's `data` axis via GSPMD: Megatron-style
column-parallel q/k/v/gate/up projections (shard output features), row-
parallel o/down projections (shard input features; XLA inserts the
all-reduce), vocab-sharded embedding/lm_head. KV cache shards over heads.

Everything is annotation-only — apply `shard_llama_params` to the param
tree and jit as usual; XLA emits the collectives over ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def llama_param_spec(path: tuple, leaf, axis: str = "data") -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    joined = "/".join(str(n) for n in names)
    if leaf.ndim == 3 and "experts_" in joined:
        # expert parallelism: stacked expert kernels [E, in, out] shard over
        # the expert axis; every device computes its expert shard on all
        # tokens and XLA reduces the routed sum (MoEFFN dense-mix)
        return P(axis, None, None)
    if leaf.ndim == 2:
        # column-parallel: shard OUTPUT features. Applies equally to dense
        # `kernel` [in,out], int8 `kernel_q` [in,out], int4 `kernel_q4`
        # [in//2,out] (nibble pairs pack along `in`, so byte-granular splits
        # keep pairs together) and the int4 group `scale` [in//G,out].
        if any(k in joined for k in ("q_proj", "k_proj", "v_proj",
                                     "gate_proj", "up_proj")):
            return P(None, axis)
        # row-parallel: shard INPUT features (all-reduce after); the int4
        # group axis Gb aligns with the input shards, and the post-group
        # sum in int4_matmul becomes the all-reduce
        if any(k in joined for k in ("o_proj", "down_proj")):
            return P(axis, None)
        if "lm_head" in joined:
            return P(None, axis)
        if "embed_tokens" in joined:
            return P(axis, None)  # vocab-sharded
    if leaf.ndim == 1:
        # int8 tree (QDense): per-OUTPUT-channel scale/bias follow the
        # kernel's output sharding — sharded for column-parallel modules,
        # replicated for row-parallel (whose outputs are full-width)
        if any(k in joined for k in ("q_proj", "k_proj", "v_proj",
                                     "gate_proj", "up_proj", "lm_head")):
            return P(axis)
    return P()  # norms etc. replicated


def shard_llama_params(params, mesh: Mesh, axis: str = "data"):
    """Place a Llama param tree with TP shardings. Dims that don't divide
    the mesh axis (e.g. a tiny int4 scale [1, out]) fall back to
    replicated rather than erroring."""
    n = mesh.shape[axis]

    def place(path, leaf):
        spec = llama_param_spec(path, leaf, axis)
        for dim, name in enumerate(spec):
            if name is not None and leaf.shape[dim] % n:
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_kv_cache(cache, mesh: Mesh, axis: str = "data"):
    """KV cache [L, B, T, kvh, hd] sharded over kv heads (axis 3 — also
    the kvh axis of the 4-dim int8-KV scale arrays). Geometries whose kv
    heads don't divide the mesh axis (a GQA draft on a wide mesh) fall
    back to replicated, mirroring shard_llama_params."""
    n = mesh.shape[axis]

    def put(x):
        if x.shape[3] % n:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = (None, None, None, axis) + ((None,) if x.ndim == 5 else ())
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree_util.tree_map(put, cache)
