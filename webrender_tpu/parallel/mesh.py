"""Multi-chip rendering: shard the tile grid across a device mesh.

The TPU-native analog of the reference's tile-parallel composition
(`compositor/sw_compositor.rs` splits tile bands across worker threads —
SURVEY.md §2.7.6): the frame's tile grid is the natural data-parallel axis.
Each device rasterizes its shard of tiles with the same instance/gpu-buffer
arrays (replicated — they are small relative to texel data), so no
collectives are needed in the raster pass itself; the assembled framebuffer
stays sharded row-wise for a subsequent sharded composite/encode stage, and
only readback gathers (an all-gather over ICI if the host needs the full
frame).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..frame.tiles import TILE_H, TILE_W
from ..ops.raster import render_tiles


def pad_tiles_for_mesh(tile_insts: np.ndarray, tile_origins: np.ndarray,
                       n_shards: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the tile axis to a multiple of the mesh size (padded tiles carry
    empty instance lists and render throwaway pixels)."""
    nt = tile_insts.shape[0]
    padded = -(-nt // n_shards) * n_shards
    if padded != nt:
        ti = np.full((padded, tile_insts.shape[1]), -1, np.int32)
        ti[:nt] = tile_insts
        to = np.zeros((padded, 2), np.float32)
        to[:nt] = tile_origins
        return ti, to
    return tile_insts, tile_origins


def render_tiles_sharded(mesh: Mesh, f32_buf, instances, transforms,
                         tile_insts, tile_origins, clear_color,
                         color_atlas, alpha_atlas, surface_atlas,
                         *, kinds, blends):
    """Run one raster pass with the tile axis sharded over `mesh`'s 'tiles'
    axis. Inputs arrive as host arrays; outputs are sharded device tiles."""
    tile_sharding = NamedSharding(mesh, P("tiles"))
    repl = NamedSharding(mesh, P())
    ti = jax.device_put(tile_insts, tile_sharding)
    to = jax.device_put(tile_origins, tile_sharding)
    args = [jax.device_put(x, repl) for x in
            (f32_buf, instances, transforms)]
    clear = jax.device_put(clear_color, repl)
    atlases = [jax.device_put(x, repl) for x in
               (color_atlas, alpha_atlas, surface_atlas)]
    return render_tiles(args[0], args[1], args[2], ti, to, clear,
                        atlases[0], atlases[1], atlases[2],
                        kinds=kinds, blends=blends)
