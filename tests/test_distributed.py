"""Multi-host runtime (parallel/distributed.py) with REAL multi-process
meshes: 2 OS processes x 2 CPU devices each over JAX's Gloo collectives
backend — the same code path a v5e pod runs with one process per host.

Covers: env-rendezvous init (the cli_setup wiring), global (data, tile)
mesh construction with tile groups pinned inside one process (the
tiled-VAE GN pmean must never cross the slow fabric), per-host data
feeding via jax.make_array_from_process_local_data, and cross-process
collectives (jit sum + shard_map psum over both axes).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json
import jax
jax.config.update("jax_platforms", "cpu")
from rsvldm_tpu.utils.compile_cache import cli_setup
cli_setup()                                  # the CLIs' preamble joins the
import jax.numpy as jnp                      # runtime from RSVLDM_* env
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from rsvldm_tpu.parallel.distributed import (from_process_local,
                                             init_distributed,
                                             local_batch_range,
                                             make_global_mesh)

assert init_distributed() is True            # idempotent after cli_setup
pid = jax.process_index()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2

mesh = make_global_mesh(tile=2)
assert mesh.devices.shape == (2, 2)
for row in mesh.devices:                     # tile rows never cross hosts
    assert len({d.process_index for d in row}) == 1

start, stop = local_batch_range(8)           # per-host feeding
assert stop - start == 4 and start == pid * 4
local = (np.arange(start, stop, dtype=np.float32)[:, None]
         * np.ones((1, 3), np.float32))
g = from_process_local(mesh, P(("data", "tile")), local)
assert g.shape == (8, 3)

total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(g)
assert float(total) == float(np.arange(8).sum() * 3), float(total)

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map
ps = shard_map(lambda x: jax.lax.psum(jnp.sum(x), ("data", "tile")),
               mesh=mesh, in_specs=P(("data", "tile")), out_specs=P())(g)
assert float(ps) == float(np.arange(8).sum() * 3), float(ps)
print(json.dumps({"pid": int(pid), "ok": True}))
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _child_env(port: int, pid: int) -> dict:
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    flags.append("--xla_force_host_platform_device_count=2")
    env["XLA_FLAGS"] = " ".join(flags)
    env["JAX_PLATFORMS"] = "cpu"   # belt; the child's jax.config is braces
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["RSVLDM_COORDINATOR"] = f"localhost:{port}"
    env["RSVLDM_NUM_PROCESSES"] = "2"
    env["RSVLDM_PROCESS_ID"] = str(pid)
    env["RSVLDM_COMPILE_CACHE"] = "0"   # don't pollute the persistent cache
    return env


def test_two_process_mesh_end_to_end():
    port = _free_port()
    procs = [subprocess.Popen([sys.executable, "-c", CHILD],
                              env=_child_env(port, pid), cwd=REPO,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for pid in (0, 1)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
        last = out.strip().splitlines()[-1]
        assert json.loads(last)["ok"] is True


def test_single_host_noop_and_mesh():
    """Without the env rendezvous init_distributed is a no-op and
    make_global_mesh degrades to the plain local (data, tile) mesh."""
    child = r"""
import jax
jax.config.update("jax_platforms", "cpu")
from rsvldm_tpu.parallel.distributed import init_distributed, make_global_mesh
assert init_distributed() is False
mesh = make_global_mesh(tile=2)
assert mesh.devices.shape == (2, 2)
assert mesh.axis_names == ("data", "tile")
try:
    make_global_mesh(tile=3)
    raise SystemExit("expected ValueError")
except ValueError:
    pass
print("OK")
"""
    env = _child_env(0, 0)
    for k in ("RSVLDM_COORDINATOR", "RSVLDM_NUM_PROCESSES",
              "RSVLDM_PROCESS_ID"):
        env.pop(k)
    flags = [f for f in env["XLA_FLAGS"].split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])
    proc = subprocess.run([sys.executable, "-c", child], env=env, cwd=REPO,
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert proc.stdout.strip().splitlines()[-1] == "OK"


TRAIN_CHILD = r"""
import json
import jax
jax.config.update("jax_platforms", "cpu")
from rsvldm_tpu.parallel.distributed import (init_distributed,
                                             local_batch_range,
                                             make_global_mesh)
init_distributed()
import numpy as np
from rsvldm_tpu.models.sr3 import SR3UNetConfig
from rsvldm_tpu.training.sr3_trainer import SR3Trainer, SR3TrainConfig

mesh = make_global_mesh(tile=1)
mcfg = SR3UNetConfig(image_size=16, inner_channel=8, channel_mults=(1, 2),
                     res_blocks=1, attn_res=(8,), norm_groups=4)
tr = SR3Trainer(mcfg, SR3TrainConfig(n_timestep=10), mesh=mesh,
                rng=jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
hr_g = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
sr_g = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
lo, hi = local_batch_range(4)        # this host's rows of the global batch
for i in range(3):
    loss = tr.train_step(hr_g[lo:hi], sr_g[lo:hi], jax.random.PRNGKey(7 + i))
print(json.dumps({"pid": int(jax.process_index()), "loss": float(loss)}))
"""


def test_two_process_sr3_train_matches_single():
    """P2 (DP training) at pod scale: two hosts each feed THEIR shard of
    the global batch; the dp-sharded train step psums grads across
    processes. Both hosts must agree bit-for-bit with each other and with
    a single-process run on the full batch to fp32 collective tolerance
    (Gloo cross-process psum vs in-process all-reduce order)."""
    port = _free_port()
    procs = [subprocess.Popen([sys.executable, "-c", TRAIN_CHILD],
                              env=_child_env(port, pid), cwd=REPO,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, text=True)
             for pid in (0, 1)]
    outs = [p.communicate(timeout=300) for p in procs]
    losses = {}
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, err[-3000:]
        rec = json.loads(out.strip().splitlines()[-1])
        losses[rec["pid"]] = rec["loss"]
    assert losses[0] == losses[1]           # SPMD: identical on every host

    # single-process reference on the same global batch
    import jax
    import numpy as np
    from rsvldm_tpu.models.sr3 import SR3UNetConfig
    from rsvldm_tpu.parallel.mesh import make_mesh
    from rsvldm_tpu.training.sr3_trainer import SR3Trainer, SR3TrainConfig
    mesh = make_mesh(4, tile=1)
    mcfg = SR3UNetConfig(image_size=16, inner_channel=8,
                         channel_mults=(1, 2), res_blocks=1, attn_res=(8,),
                         norm_groups=4)
    tr = SR3Trainer(mcfg, SR3TrainConfig(n_timestep=10), mesh=mesh,
                    rng=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    hr = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    sr = rng.standard_normal((4, 16, 16, 3)).astype(np.float32)
    for i in range(3):
        ref = tr.train_step(hr, sr, jax.random.PRNGKey(7 + i))
    np.testing.assert_allclose(losses[0], ref, rtol=1e-5)
