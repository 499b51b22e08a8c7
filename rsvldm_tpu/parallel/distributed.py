"""Multi-host (pod-scale) runtime: process init, global mesh, host-local data.

The reference's distribution story stops at single-host multi-GPU
(SURVEY.md §2.6 P1-P4: a 2-GPU stage split + nn.DataParallel). A TPU
production deployment spans HOSTS: a v5e-256 pod is 64 single-host workers
on one ICI fabric, and multi-slice deployments federate slices over DCN.
JAX's model (one process per host, every process runs the same program,
`jax.devices()` is global, `jax.local_devices()` are this host's chips)
means the framework's sharding-annotation design works unchanged across
hosts — the only pod-specific requirements, packaged here, are:

1. `init_distributed()` — `jax.distributed.initialize` before first device
   use (env-gated so single-host runs are zero-config; wired into every
   CLI via `utils.compile_cache.cli_setup`).
2. `make_global_mesh()` — a (data, tile) mesh over ALL processes' devices
   laid out so the collective-heavy inner axis ('tile', which pmeans
   GroupNorm statistics every tiled-VAE step) stays INSIDE one host/slice
   and rides ICI, while the outer 'data' axis (embarrassingly-parallel
   folder sharding; only train-step grad psums cross it) spans hosts and,
   in multi-slice deployments, DCN. This is the scaling-book mesh recipe:
   slow fabric on the outer axis, collectives on the inner.
3. `from_process_local()` — per-host data feeding: each host loads only
   its shard and `jax.make_array_from_process_local_data` assembles the
   global array without any host ever materializing the full batch.

Verified by tests/test_distributed.py with real multi-process meshes
(2 OS processes x 2 CPU devices over the Gloo collectives backend),
including 3 dp-sharded SR3 train steps whose loss matches a single-process
run on the same global batch.

Scope note: pod-scale DP is wired end-to-end for the SR3 trainer (the
reference's shipped training loop) and for inference/serving (sharding
annotations are process-count-agnostic). The VLM fine-tune trainers
(adapter-only; the int8 8B base fits ONE chip) remain single-host
multi-chip — their frozen base/cache operands are closed over per-process,
which matches the reference's own single-node LLaVA recipes.
"""

from __future__ import annotations

import os
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_INITIALIZED = False

# env knobs (cli_setup calls init_distributed() unconditionally; these
# decide whether it does anything):
#   RSVLDM_COORDINATOR=host:port  RSVLDM_NUM_PROCESSES=N  RSVLDM_PROCESS_ID=i
#     — explicit rendezvous (any launcher: mpirun, k8s indexed jobs, ...)
#   RSVLDM_DISTRIBUTED=1
#     — cloud autodetect: jax.distributed.initialize() with no args reads
#       the TPU pod / GKE metadata (process count, id, coordinator)


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None,
                     local_device_ids: Sequence[int] | None = None) -> bool:
    """Initialize the multi-process JAX runtime (idempotent, env-gated).

    Call once per process BEFORE any other device use. Explicit args win;
    otherwise the RSVLDM_* env vars above; otherwise a no-op returning
    False (plain single-host run). Returns True when the process is part
    of a multi-process runtime after the call."""
    global _INITIALIZED
    if _INITIALIZED:
        return True
    env = os.environ
    if coordinator is None and env.get("RSVLDM_COORDINATOR"):
        coordinator = env["RSVLDM_COORDINATOR"]
        num_processes = int(env["RSVLDM_NUM_PROCESSES"])
        process_id = int(env["RSVLDM_PROCESS_ID"])
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes=num_processes,
                                   process_id=process_id,
                                   local_device_ids=local_device_ids)
    elif env.get("RSVLDM_DISTRIBUTED"):
        jax.distributed.initialize()   # TPU pod / GKE metadata autodetect
    else:
        return False
    _INITIALIZED = True
    return True


def _order_data_axis_by_process(arr: np.ndarray) -> np.ndarray:
    """Sort 'data'-axis rows so process indices never decrease along the
    flattened (data, tile) traversal, then verify the invariant.

    Per-host batch feeding (local_batch_range + from_process_local) maps
    global rows [i*per, (i+1)*per) to process i — valid only when the
    'data' axis is process-ordered and each process's rows are contiguous.
    jax.devices() guarantees this for the single-slice reshape, but
    mesh_utils.create_hybrid_device_mesh may permute devices within a
    slice (advisor round-4 finding), so the multi-slice branch sorts rows
    (a whole-row permutation keeps every tile group inside its slice) and
    raises if sorting cannot restore contiguity."""
    procs = np.asarray([[d.process_index for d in row] for row in arr])
    arr = arr[np.argsort(procs.min(axis=1), kind="stable")]
    flat = np.asarray([d.process_index for d in arr.reshape(-1)])
    if np.any(np.diff(flat) < 0):
        raise RuntimeError(
            "global mesh 'data' axis is not process-contiguous even after "
            "row sort — per-host batch feeding (local_batch_range/"
            "from_process_local) would mis-place rows on this topology; "
            "build the mesh explicitly via parallel.mesh.make_mesh")
    return arr


def make_global_mesh(tile: int = 1) -> Mesh:
    """(data, tile) mesh over every process's devices, fabric-aware.

    The 'tile' axis must divide the per-host (single-slice) or per-slice
    (multi-slice) device count: its per-step pmean (tiled-VAE collective
    GroupNorm, ops/norm.py) then never crosses the slow fabric. The 'data'
    axis takes everything else — across hosts it carries only folder
    sharding (no forward collectives) and train-step grad psums.

    Single-process runs get the same (data, tile) mesh over local devices,
    so callers are topology-agnostic (parallel/mesh.py make_mesh has the
    explicit-device variant for tests)."""
    devices = jax.devices()
    n = len(devices)
    slices = {getattr(d, "slice_index", 0) or 0 for d in devices}
    if len(slices) > 1:
        # multi-slice (DCN-federated): per-slice mesh x DCN replication —
        # 'data' gets the DCN factor, 'tile' stays inside one slice's ICI
        from jax.experimental import mesh_utils
        per_slice = n // len(slices)
        if per_slice % tile:
            raise ValueError(f"tile={tile} must divide the per-slice "
                             f"device count {per_slice}")
        arr = mesh_utils.create_hybrid_device_mesh(
            (per_slice // tile, tile), (len(slices), 1), devices=devices)
        return Mesh(_order_data_axis_by_process(arr), ("data", "tile"))
    if tile > 1:
        per_host = max(len(jax.local_devices()), 1)
        if per_host % tile and tile % per_host:
            raise ValueError(f"tile={tile} does not pack into hosts of "
                             f"{per_host} devices — the tile-GN pmean "
                             "would cross hosts")
    if n % tile:
        raise ValueError(f"tile={tile} must divide the device count {n}")
    # jax.devices() orders by process, so the trailing (fast) axis of this
    # reshape keeps each tile group within one host when tile <= per_host
    arr = np.asarray(devices).reshape(n // tile, tile)
    return Mesh(arr, ("data", "tile"))


def from_process_local(mesh: Mesh, spec: P, local: np.ndarray) -> jax.Array:
    """Assemble a global array from this process's shard of it.

    `local` holds the rows THIS host loaded (for P('data') batch sharding:
    global_batch / num_processes rows, in process_index order). No host
    ever materializes the global batch."""
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), local)


def local_batch_range(global_batch: int) -> tuple[int, int]:
    """[start, stop) of the global batch this process should load
    (process-uniform split; global_batch must divide evenly)."""
    nproc = jax.process_count()
    if global_batch % nproc:
        raise ValueError(f"global batch {global_batch} must divide across "
                         f"{nproc} processes")
    per = global_batch // nproc
    i = jax.process_index()
    return i * per, (i + 1) * per
