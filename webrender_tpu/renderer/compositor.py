"""Compositor abstraction — `composite.rs` CompositorKind / Compositor
trait (:357/:1152) + the SWGL `compositor/sw_compositor.rs` role.

The reference hands picture-cache tiles either to its own draw pass
("Draw" compositing) or to an OS compositor through the `Compositor`
trait (DirectComposition / CoreAnimation / Wayland in example-compositor).
Here the same seam exists so an embedder can take over final composition:
the renderer's tile grid maps onto `CompositorSurface` tiles; the default
`DrawCompositor` assembles them exactly like the internal path, and
`SwCompositor` composites on the host with band parallelism (the
sw_compositor.rs thread-pool design collapsed onto a ThreadPoolExecutor).
"""
from __future__ import annotations

import concurrent.futures
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Protocol, Tuple

import numpy as np


@dataclass
class CompositorSurface:
    """composite.rs NativeSurface: an id + tile grid of premultiplied
    RGBA8 tiles."""
    surface_id: int
    tile_size: Tuple[int, int]
    is_opaque: bool = True
    tiles: Dict[Tuple[int, int], np.ndarray] = field(default_factory=dict)


class Compositor(Protocol):
    """composite.rs Compositor trait (:1152) — the subset that matters for
    a single-window software embedder."""

    def create_surface(self, surface_id: int, tile_size: Tuple[int, int],
                       is_opaque: bool) -> None: ...

    def set_tile(self, surface_id: int, x: int, y: int,
                 texels: np.ndarray) -> None: ...

    def add_surface(self, surface_id: int,
                    offset: Tuple[int, int]) -> None: ...

    def composite(self, output_size: Tuple[int, int]) -> np.ndarray: ...


class DrawCompositor:
    """CompositorKind::Draw — tiles assemble into one framebuffer, the
    renderer's own composition path."""

    def __init__(self):
        self.surfaces: Dict[int, CompositorSurface] = {}
        self.order: List[Tuple[int, Tuple[int, int]]] = []

    def create_surface(self, surface_id, tile_size, is_opaque=True):
        self.surfaces[surface_id] = CompositorSurface(surface_id, tile_size,
                                                      is_opaque)

    def set_tile(self, surface_id, x, y, texels):
        self.surfaces[surface_id].tiles[(x, y)] = texels

    def add_surface(self, surface_id, offset=(0, 0)):
        self.order.append((surface_id, offset))

    def composite(self, output_size):
        w, h = output_size
        out = np.zeros((h, w, 4), np.uint8)
        for sid, (ox, oy) in self.order:
            surf = self.surfaces[sid]
            tw, th = surf.tile_size
            for (tx, ty), texels in surf.tiles.items():
                x0 = ox + tx * tw
                y0 = oy + ty * th
                x1 = min(x0 + texels.shape[1], w)
                y1 = min(y0 + texels.shape[0], h)
                if x1 <= x0 or y1 <= y0:
                    continue
                src = texels[: y1 - y0, : x1 - x0]
                if surf.is_opaque:
                    out[y0:y1, x0:x1] = src
                else:
                    a = src[..., 3:4].astype(np.uint16)
                    dst = out[y0:y1, x0:x1].astype(np.uint16)
                    out[y0:y1, x0:x1] = (
                        src + (dst * (255 - a) + 127) // 255
                    ).astype(np.uint8)
        self.order.clear()
        return out


class SwCompositor(DrawCompositor):
    """sw_compositor.rs: composite independent horizontal bands on worker
    threads (the tile-band parallelism of slice §2.7.6)."""

    def __init__(self, workers: int = 4):
        super().__init__()
        self._pool = concurrent.futures.ThreadPoolExecutor(workers)
        self.workers = workers

    def composite(self, output_size):
        w, h = output_size
        out = np.zeros((h, w, 4), np.uint8)
        order = list(self.order)
        self.order.clear()
        band_h = max(1, -(-h // self.workers))

        def run_band(b):
            y_lo = b * band_h
            y_hi = min(y_lo + band_h, h)
            for sid, (ox, oy) in order:
                surf = self.surfaces[sid]
                tw, th = surf.tile_size
                for (tx, ty), texels in surf.tiles.items():
                    x0 = ox + tx * tw
                    y0 = oy + ty * th
                    ty0 = max(y0, y_lo)
                    ty1 = min(y0 + texels.shape[0], y_hi)
                    x1 = min(x0 + texels.shape[1], w)
                    if ty1 <= ty0 or x1 <= max(x0, 0):
                        continue
                    src = texels[ty0 - y0:ty1 - y0, : x1 - x0]
                    if surf.is_opaque:
                        out[ty0:ty1, x0:x1] = src
                    else:
                        a = src[..., 3:4].astype(np.uint16)
                        dst = out[ty0:ty1, x0:x1].astype(np.uint16)
                        out[ty0:ty1, x0:x1] = (
                            src + (dst * (255 - a) + 127) // 255
                        ).astype(np.uint8)

        list(self._pool.map(run_band, range(self.workers)))
        return out
