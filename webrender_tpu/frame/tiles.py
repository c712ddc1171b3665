"""Tile binning: assign instances to the tiles of a render-target grid.

This is the TPU-native replacement for WebRender's batching + per-tile
command buffers (`batch.rs` AlphaBatchBuilder + `command_buffer.rs`): instead
of instanced GL draw calls per batch, every render target is a grid of
TILE_H×TILE_W pixel tiles and each tile gets a fixed-shape (padded) list of
instance indices, executed back-to-front by the raster kernel. Painter's
order inside the list preserves the display-list z order.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np

# Tile size: last dim 128 to match the VPU lane width, 64 sublanes for f32.
TILE_W = 128
TILE_H = 64


def bin_instances(inst_indices: Sequence[int],
                  bboxes: Sequence[Tuple[float, float, float, float]],
                  origin: Tuple[float, float],
                  size: Tuple[int, int],
                  min_slots: int = 8,
                  step: float = 1.0,
                  opaque=None,
                  ) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Bin instances into the tile grid of one render target.

    inst_indices: global instance ids, painter order.
    bboxes: matching device-space AABBs (x0, y0, x1, y1), already AA-inflated.
    origin: device coords of the target's (0,0) pixel.
    size: (w, h) of the target in pixels.

    Returns (tile_insts [nt, slots] i32 padded with -1, tile_counts [nt] i32,
    nx, ny).
    """
    w, h = size
    ox, oy = origin
    nx = max(1, -(-w // TILE_W))
    ny = max(1, -(-h // TILE_H))
    nt = nx * ny
    lists: List[List[int]] = [[] for _ in range(nt)]
    tw = TILE_W * step
    th = TILE_H * step
    # occlusion culling (rectangle_occlusion.rs role): remember, per tile,
    # the position of the latest instance whose opaque rect covers the
    # whole tile — everything binned before it is invisible there
    occl = [0] * nt
    opq = opaque if opaque is not None else [None] * len(inst_indices)
    for (idx, (x0, y0, x1, y1)), op in zip(
            zip(inst_indices, bboxes), opq):
        # ±1 covers anti-aliasing spill beyond the tight bbox
        tx0 = int(np.floor((x0 - 1 - ox) / tw))
        ty0 = int(np.floor((y0 - 1 - oy) / th))
        tx1 = int(np.ceil((x1 + 1 - ox) / tw))
        ty1 = int(np.ceil((y1 + 1 - oy) / th))
        tx0 = max(tx0, 0)
        ty0 = max(ty0, 0)
        tx1 = min(tx1, nx)
        ty1 = min(ty1, ny)
        for ty in range(ty0, ty1):
            base = ty * nx
            for tx in range(tx0, tx1):
                lists[base + tx].append(idx)
        if op is not None:
            # tiles fully inside the opaque rect
            fx0 = int(np.ceil((op[0] - ox) / tw))
            fy0 = int(np.ceil((op[1] - oy) / th))
            fx1 = int(np.floor((op[2] - ox) / tw))
            fy1 = int(np.floor((op[3] - oy) / th))
            for ty in range(max(fy0, 0), min(fy1, ny)):
                base = ty * nx
                for tx in range(max(fx0, 0), min(fx1, nx)):
                    occl[base + tx] = len(lists[base + tx]) - 1
    for t in range(nt):
        if occl[t] > 0:
            lists[t] = lists[t][occl[t]:]

    max_count = max((len(l) for l in lists), default=0)
    slots = max(min_slots, 1 << max(0, (max_count - 1)).bit_length())
    tile_insts = np.full((nt, slots), -1, np.int32)
    tile_counts = np.zeros(nt, np.int32)
    for t, l in enumerate(lists):
        tile_insts[t, : len(l)] = l
        tile_counts[t] = len(l)
    return tile_insts, tile_counts, nx, ny
