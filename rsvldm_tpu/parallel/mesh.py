"""Device mesh + sharding helpers.

The reference's parallelism inventory (SURVEY.md §2.6) maps to two mesh axes:

  'data' — batch/folder parallelism (P2 nn.DataParallel, P4 chunked folder
           inference): each chip runs the whole pipeline on its shard of the
           image batch. XLA inserts no collectives on the forward path; the
           train step psums grads.
  'tile' — spatial tile parallelism (P6, the tiled VAE / tiled samplers):
           tiles of ONE image are sharded across chips and the tiled VAE's
           global GroupNorm statistics cross chips via pmean on this axis
           (ops/norm.py GroupNorm32) — the one true algorithmic collective
           of the pipeline.

All communication is emitted by XLA from sharding annotations — no
hand-written NCCL-style layer exists or is needed.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.norm import tile_collective_gn


def make_mesh(n_devices: int | None = None, tile: int = 1,
              devices=None) -> Mesh:
    """Mesh of shape (data, tile). tile divides n_devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % tile == 0, (n, tile)
    arr = np.asarray(devices).reshape(n // tile, tile)
    return Mesh(arr, ("data", "tile"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over BOTH mesh axes."""
    return NamedSharding(mesh, P(("data", "tile"), *([None] * (ndim - 1))))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_batch(mesh: Mesh, x) -> jax.Array:
    """Place a batch on the mesh's batch axes, multi-host aware.

    Single-process: plain device_put (x is the global batch). Multi-
    process (parallel/distributed.py): x is THIS host's shard of the
    global batch (local_batch_range rows) and the global array is
    assembled shard-by-shard — cross-process device_put is only valid
    for replicated values, not sharded batches."""
    sh = batch_sharding(mesh, jnp.ndim(x))
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.device_put(x, sh)


def replicate_state(mesh: Mesh, tree):
    """Replicate a train-state pytree over the global mesh when running
    multi-process (the jitted step's device sets must agree with its
    mesh-global batch inputs); identity single-process. device_put does
    NOT verify that per-process values agree — replication here ASSUMES
    cross-process equality, which the trainers guarantee by deterministic
    init from a process-uniform rng (divergent inputs would be silently
    undefined, not an error)."""
    if jax.process_count() > 1:
        return jax.device_put(tree, replicate(mesh))
    return tree


def shard_tiled_gn_apply(fn: Callable, mesh: Mesh, axis: str = "tile"):
    """Wrap a tile-batched VAE apply ([T, h, w, C] -> [T, h', w', C']) in a
    shard_map over the tile axis with tile-collective GroupNorm: each device
    processes T/n_tile tiles and the GN statistics are pmean-reduced across
    the axis — bitwise the same semantics as single-device tile-collective
    execution (models/vae/tiled.py)."""
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    def inner(tiles):
        with tile_collective_gn(axis_name=axis):
            return fn(tiles)

    return shard_map(inner, mesh=mesh, in_specs=P(axis), out_specs=P(axis))
