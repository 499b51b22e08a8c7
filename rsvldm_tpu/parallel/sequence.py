"""Sequence parallelism (SP) and pipeline parallelism (PP) executors.

The reference has neither (SURVEY §2.6 P7: no tensor/sequence/expert/
context parallel code anywhere) — these are TPU-native scale-out additions
for the caption stage's long anyres prefills (3-6k tokens) and for
pipelining the decoder stack over a mesh axis:

- :func:`sequence_parallel_attention` shards the QUERY sequence over a
  mesh axis; K/V are all-gathered over ICI (one tiled all-gather per
  layer) and each shard computes its causally-masked rows with a global
  row offset. RMSNorm/FFN/projections are per-token and need no
  communication, so this one collective is the entire SP cost.
- :func:`gpipe_apply` is the classic collective-permute pipeline (GPipe
  schedule): each device along the axis holds ONE stage's params, the
  microbatch stream flows through `jax.lax.ppermute` ring hops, and the
  last stage's outputs are recovered with a masked psum. M microbatches
  over S stages complete in M + S - 1 ticks inside one `lax.scan` — a
  static, jit-compatible schedule (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.4.35 top-level export; the experimental path is deprecated
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma=False: bodies here return unreduced per-device values
        # (psum'd explicitly or genuinely device-varying), the same cases
        # the old check_rep=False covered
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_exp

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_exp(f, mesh=mesh, in_specs=in_specs,
                              out_specs=out_specs, check_rep=False)


def sequence_parallel_attention(q, k, v, mesh: Mesh, axis: str,
                                causal: bool = True,
                                scale: float | None = None):
    """Attention with the sequence dim sharded over `axis`.

    q/k/v: [B, S, H, D] (kv heads may be fewer — GQA repeat is done here).
    Returns [B, S, H, D] with the same sequence sharding. S must divide by
    the axis size. Inside each shard: K/V all-gather (tiled) + einsum
    attention with the shard's global causal offset.
    """
    b, s, h, d = q.shape
    kvh = k.shape[2]
    rep = h // kvh
    scale = scale if scale is not None else d ** -0.5
    n = mesh.shape[axis]
    assert s % n == 0, (s, n)

    def f(qb, kb, vb):
        idx = jax.lax.axis_index(axis)
        s_loc = qb.shape[1]
        kg = jax.lax.all_gather(kb, axis, axis=1, tiled=True)  # [B,S,kvh,D]
        vg = jax.lax.all_gather(vb, axis, axis=1, tiled=True)
        # bf16 matmul inputs with fp32 accumulation (repo convention —
        # astype(f32) copies of the gathered K/V would be ~rep x S x D
        # transients per layer); GQA folds into the einsum via a grouped
        # q view instead of jnp.repeat-materializing K/V rep times
        qg = qb.reshape(qb.shape[0], s_loc, kvh, rep, d)
        logits = jnp.einsum("bqhrd,bkhd->bhrqk", qg, kg,
                            preferred_element_type=jnp.float32) * scale
        if causal:
            rows = idx * s_loc + jnp.arange(s_loc)[:, None]    # global rows
            cols = jnp.arange(s)[None, :]
            logits = jnp.where(cols <= rows, logits, -1e30)
        w = jax.nn.softmax(logits, axis=-1).astype(vg.dtype)
        o = jnp.einsum("bhrqk,bkhd->bqhrd", w, vg,
                       preferred_element_type=jnp.float32)
        return o.reshape(qb.shape[0], s_loc, h, d).astype(q.dtype)

    spec = P(None, axis, None, None)
    return shard_map(f, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)


def gpipe_apply(stage_fn, stage_params, x_mb, mesh: Mesh, axis: str):
    """Pipeline-parallel apply: y_mb[i] = stage_{S-1}(...stage_0(x_mb[i])).

    stage_fn:    (params_slice, x) -> y with y.shape == x.shape (uniform
                 inter-stage activation shape, the GPipe contract).
    stage_params: pytree whose leaves have a leading stage axis of size
                 S == mesh.shape[axis]; sharded (or shardable) over `axis`.
    x_mb:        [M, ...] microbatches (replicated).

    Returns [M, ...] outputs (replicated). Runs M + S - 1 ticks of
    compute + ppermute inside lax.scan; bubble fraction (S-1)/(M+S-1).
    """
    s_stages = mesh.shape[axis]
    m = x_mb.shape[0]
    ticks = m + s_stages - 1

    def per_device(params_loc, xs):
        # params_loc leaves: [1, ...] (this device's stage); xs: [M, ...]
        params_loc = jax.tree_util.tree_map(lambda a: a[0], params_loc)
        sidx = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % s_stages) for i in range(s_stages)]

        def tick(carry, t):
            acts = carry                                    # [...] mb shape
            feed = xs[jnp.clip(t, 0, m - 1)]
            x_in = jnp.where(sidx == 0, feed, acts)
            y = stage_fn(params_loc, x_in)
            acts_next = jax.lax.ppermute(y, axis, perm)
            out_t = jnp.where(sidx == s_stages - 1, y, jnp.zeros_like(y))
            return acts_next, out_t

        _, outs = jax.lax.scan(tick, jnp.zeros_like(xs[0]),
                               jnp.arange(ticks))
        # tick already zeroed non-last-stage rows; slice the S-1 warmup
        # ticks off BEFORE the psum so the all-reduce moves only the M
        # real microbatches, then sum to replicate the last stage's rows
        return jax.lax.psum(outs[s_stages - 1:], axis)       # [M, ...]

    pspec = jax.tree_util.tree_map(lambda _: P(axis), stage_params)
    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(pspec, P()), out_specs=P())
    return fn(stage_params, x_mb)


def stack_stage_params(param_trees):
    """Stack per-stage param pytrees (same treedef) along a new leading
    stage axis for :func:`gpipe_apply`."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *param_trees)
