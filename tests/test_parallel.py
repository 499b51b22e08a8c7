"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from rsvldm_tpu.parallel import (make_mesh, batch_sharding, replicate,
                                 shard_tiled_gn_apply)
from rsvldm_tpu.ops.norm import GroupNorm32, tile_collective_gn


def test_mesh_shapes():
    mesh = make_mesh(8, tile=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "tile")


def test_batch_sharded_forward():
    mesh = make_mesh(8, tile=1)
    x = jnp.arange(8 * 4, dtype=jnp.float32).reshape(8, 4)
    xs = jax.device_put(x, batch_sharding(mesh, 2))

    @jax.jit
    def f(v):
        return jnp.sin(v) * 2

    out = f(xs)
    np.testing.assert_allclose(np.array(out), np.sin(np.array(x)) * 2, rtol=1e-6)


def test_sharded_tile_collective_gn_matches_single_device():
    """GN stats psum'd across the tile mesh axis == single-device
    tile-collective GN — the P6 collective contract."""
    mesh = make_mesh(8, tile=2)
    gn = GroupNorm32(num_groups=4)
    tiles = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 8))
    params = gn.init(jax.random.PRNGKey(1), tiles)

    with tile_collective_gn():
        ref = gn.apply(params, tiles)  # single-device, all 8 tiles jointly

    # shard 8 tiles over the 2-device tile axis (4 tiles per device)
    fn = lambda t: gn.apply(params, t)
    sharded_fn = shard_tiled_gn_apply(fn, mesh, axis="tile")
    ts = jax.device_put(tiles, NamedSharding(mesh, P("tile")))
    out = jax.jit(sharded_fn)(ts)
    np.testing.assert_allclose(np.array(out), np.array(ref), atol=1e-5)


def test_dp_train_step_sr3():
    """Data-parallel SR3 train step over the mesh: batch sharded, grads
    psum'd by XLA from the sharding annotations (P2 mapping)."""
    from rsvldm_tpu.models.sr3 import SR3UNet, SR3UNetConfig, SR3Diffusion, sr3_loss

    cfg = SR3UNetConfig(inner_channel=8, norm_groups=4, channel_mults=(1, 2),
                        attn_res=(), res_blocks=1, image_size=8)
    model = SR3UNet(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 6)),
                        jnp.ones((1, 1)))
    diff = SR3Diffusion.from_schedule(n_timestep=10)
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    mesh = make_mesh(8, tile=1)
    apply_fn = lambda p, x, nl: model.apply(p, x, nl)

    @jax.jit
    def train_step(params, opt_state, hr, sr, rng):
        loss, grads = jax.value_and_grad(
            lambda p: sr3_loss(diff, apply_fn, p, hr, sr, rng))(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    hr = jax.device_put(jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 3)),
                        batch_sharding(mesh, 4))
    sr = jax.device_put(jnp.zeros((8, 8, 8, 3)), batch_sharding(mesh, 4))
    params = jax.device_put(params, replicate(mesh))
    new_params, _, loss = train_step(params, opt_state, hr, sr,
                                     jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    # params actually changed
    delta = jax.tree_util.tree_reduce(
        lambda a, l: a + float(jnp.abs(l).sum()),
        jax.tree_util.tree_map(jnp.subtract, new_params, params), 0.0)
    assert delta > 0


def test_pipeline_tiled_vae_mesh_equivalence():
    """The pipeline's tiled VAE prep with tiles sharded over the mesh 'tile'
    axis (shard_map + psum'd GroupNorm stats) equals the unsharded tile
    batch — SURVEY P6 reachable from the pipeline itself (round-2 review
    Missing #4)."""
    import rsvldm_tpu.pipeline as PL
    from rsvldm_tpu.config import PipelineConfig
    from rsvldm_tpu.models.vae import VAEConfig
    from rsvldm_tpu.parallel import make_mesh

    tiny = PL._tiny_overrides()
    tiny["vae"] = VAEConfig(ch=8, ch_mult=(1, 1, 1, 1), num_res_blocks=1)
    orig = PL._tiny_overrides
    PL._tiny_overrides = lambda: dict(tiny)
    try:
        def build(mesh):
            cfg = PipelineConfig(input_img="x", output_dir="/tmp/o")
            cfg.refine.use_tile_vae = True
            cfg.refine.encoder_tile_size = 32
            cfg.refine.decoder_tile_size = 4
            p = PL.SuperResolutionPipeline(cfg, debug_tiny=True, mesh=mesh)
            p._ensure_stage2()
            return p

        x = jax.random.normal(jax.random.PRNGKey(6), (1, 64, 64, 3))
        k = jax.random.PRNGKey(7)
        p0 = build(None)
        ref = jax.jit(p0._vae_prep_jit)(p0.vae_params, x, k)
        pm = build(make_mesh(8, tile=2))
        # identical tiny init seeds -> identical params across the two
        out = jax.jit(pm._vae_prep_jit)(pm.vae_params, x, k)
        for a, b in zip(ref, out):
            # psum vs local-mean reduction order: tiny fp drift expected
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=1e-3)
    finally:
        PL._tiny_overrides = orig


def test_order_data_axis_by_process():
    """Hybrid-mesh row sort restores the process-contiguity invariant that
    local_batch_range/from_process_local rely on (advisor round-4 #2)."""
    from types import SimpleNamespace

    from rsvldm_tpu.parallel.distributed import _order_data_axis_by_process

    def dev(p):
        return SimpleNamespace(process_index=p)

    # permuted-but-fixable: rows [p1, p0, p1, p0] -> sorted [p0, p0, p1, p1]
    arr = np.asarray([[dev(1), dev(1)], [dev(0), dev(0)],
                      [dev(1), dev(1)], [dev(0), dev(0)]])
    out = _order_data_axis_by_process(arr)
    flat = [d.process_index for d in out.reshape(-1)]
    assert flat == sorted(flat)
    # already-ordered input is preserved verbatim (stable sort)
    arr2 = np.asarray([[dev(0)], [dev(0)], [dev(1)], [dev(1)]])
    assert (_order_data_axis_by_process(arr2) == arr2).all()
    # interleaved within a row: no row permutation can fix it -> raise
    bad = np.asarray([[dev(0), dev(2)], [dev(1), dev(3)]])
    with pytest.raises(RuntimeError, match="process-contiguous"):
        _order_data_axis_by_process(bad)
