"""Tiled VAE encode/decode — TPU-native redesign of utils/tilevae.py.

The reference (utils/tilevae.py:677-971) decomposes the VAE into a Python
task queue, walks tiles sequentially on one GPU, and accumulates per-tile
GroupNorm var/mean into a global summary (GroupNormParam:599-674) so every
tile is normalized with whole-image statistics.

TPU redesign: tiles are a BATCH axis. The whole encoder/decoder runs ONCE
over [T, th, tw, C] (all tiles in parallel on the MXU), and every GroupNorm
reduces jointly over (tile, H, W) — numerically the same union-of-padded-
tiles statistics the reference accumulates, but as one static XLA graph.
When tiles are sharded over a mesh axis the reduction rides ICI as a psum
(see GroupNorm32 in model.py). Halo padding: 32 px at the encoder input /
11 latent px at the decoder input (VAEHook pads, tilevae.py:678-686), then
each tile's valid core is cropped and stitched.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ...ops.norm import tile_collective_gn

ENCODER_PAD = 32   # image-space halo (tilevae.py:682)
DECODER_PAD = 11   # latent-space halo (tilevae.py:684)


def plan_tiles(size: int, tile: int) -> list[tuple[int, int]]:
    """Static tile starts covering [0, size) with stride `tile`; the last
    tile is shifted left so every tile has the full width."""
    if size <= tile:
        return [(0, size)]
    starts = list(range(0, size - tile, tile)) + [size - tile]
    return [(s, tile) for s in starts]


def split_tiles(x: jnp.ndarray, tile: int, pad: int) -> tuple[jnp.ndarray, list]:
    """[1,H,W,C] -> ([T, tile+2p, tile+2p, C], tile grid metadata).

    The image is edge-padded by `pad` then each core tile is extracted with
    its halo. All shapes are static (trace-time Python)."""
    assert x.shape[0] == 1, (
        "tiled VAE is per-image: the tile axis doubles as the GroupNorm "
        "statistics pool, so a batch here would mix cross-image stats "
        f"(got batch {x.shape[0]}; run images separately)")
    _, h, w, _ = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")
    rows = plan_tiles(h, tile)
    cols = plan_tiles(w, tile)
    tiles = []
    grid = []
    for r0, rh in rows:
        for c0, cw in cols:
            tiles.append(xp[:, r0:r0 + rh + 2 * pad, c0:c0 + cw + 2 * pad, :])
            grid.append((r0, rh, c0, cw))
    return jnp.concatenate(tiles, axis=0), grid


def stitch_tiles(tiles: jnp.ndarray, grid: list, out_hw: tuple[int, int],
                 pad: int, scale_num: int = 1, scale_den: int = 1) -> jnp.ndarray:
    """Crop each tile's valid core and place it. `scale_*` maps image-space
    grid coords to the tile output space (e.g. 1/8 for encode, 8/1 decode)."""
    sc = lambda v: v * scale_num // scale_den
    h, w = out_hw
    c = tiles.shape[-1]
    out = jnp.zeros((1, h, w, c), tiles.dtype)
    p = sc(pad)
    for i, (r0, rh, c0, cw) in enumerate(grid):
        core = tiles[i:i + 1, p:p + sc(rh), p:p + sc(cw), :]
        out = jax.lax.dynamic_update_slice(out, core, (0, sc(r0), sc(c0), 0))
    return out


def tiled_apply(fn: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray,
                tile: int, pad: int, out_scale: tuple[int, int],
                axis_name: str | None = None, mesh=None,
                mesh_axis: str = "tile") -> jnp.ndarray:
    """Run `fn` over halo-padded tiles of x ([1,H,W,C]) with tile-collective
    GroupNorm, then stitch. out_scale=(num,den) is fn's spatial scaling
    (encode: (1,8); decode: (8,1)).

    mesh: optional jax.sharding.Mesh — shard the tile batch over its
    `mesh_axis` via shard_map; GroupNorm statistics psum across the axis
    (SURVEY P6: the ONE algorithmic collective of inference parity). Falls
    back to single-device tile batching when the tile count is not
    divisible by the axis size (trace-time static check)."""
    _, h, w, _ = x.shape
    tiles, grid = split_tiles(x, tile, pad)
    if mesh is not None and mesh_axis in mesh.axis_names \
            and tiles.shape[0] % mesh.shape[mesh_axis] == 0:
        from ...parallel.mesh import shard_tiled_gn_apply
        ytiles = shard_tiled_gn_apply(fn, mesh, mesh_axis)(tiles)
    else:
        with tile_collective_gn(axis_name):
            ytiles = fn(tiles)
    num, den = out_scale
    return stitch_tiles(ytiles, grid, (h * num // den, w * num // den), pad,
                        num, den)


def tiled_encode(apply_encode: Callable, x: jnp.ndarray,
                 tile: int = 512, pad: int = ENCODER_PAD,
                 axis_name: str | None = None, mesh=None) -> jnp.ndarray:
    """apply_encode: [T,h,w,3] -> [T,h/8,w/8,z] (already includes
    quant-conv + mode + scale_factor). Default 512-px tiles
    (infer.py encoder_tile_size=512)."""
    assert tile % 8 == 0 and pad % 8 == 0
    # stitch floor-divides tile starts by 8; a non-multiple extent would
    # phase-shift the last row/column of tiles off the stride-8 conv grid
    assert x.shape[1] % 8 == 0 and x.shape[2] % 8 == 0, x.shape
    return tiled_apply(apply_encode, x, tile, pad, (1, 8), axis_name,
                       mesh=mesh)


def tiled_decode(apply_decode: Callable, z: jnp.ndarray,
                 tile: int = 64, pad: int = DECODER_PAD,
                 axis_name: str | None = None, mesh=None) -> jnp.ndarray:
    """apply_decode: [T,hz,wz,z] -> [T,8hz,8wz,3]. Default 64-latent tiles
    (infer.py decoder_tile_size=64)."""
    return tiled_apply(apply_decode, z, tile, pad, (8, 1), axis_name,
                       mesh=mesh)
