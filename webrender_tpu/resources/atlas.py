"""Texture atlas allocators.

Mirrors `webrender/src/texture_pack/` (etagere shelf allocation re-exported at
mod.rs:19-21): a shelf allocator for persistent caches (images, glyphs) and a
trivially resettable row packer for per-frame surface allocation.
Allocation is host-side only; the actual texels live in HBM-resident arrays
owned by the renderer.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple


@dataclass(frozen=True)
class AtlasRegion:
    x: int
    y: int
    w: int
    h: int


class ShelfAllocator:
    """Simple shelf (strip) packer in the spirit of etagere's
    ShelfAllocator: allocations grouped into horizontal shelves by height
    bucket; freed regions are coalesced only when a whole shelf empties."""

    def __init__(self, width: int, height: int, align: int = 8):
        self.width = width
        self.height = height
        self.align = align
        # shelf: [y, h, cursor_x, live_count]
        self.shelves: List[List[int]] = []
        self.next_y = 0

    def _round(self, v: int) -> int:
        a = self.align
        return (v + a - 1) // a * a

    def alloc(self, w: int, h: int) -> Optional[AtlasRegion]:
        w = self._round(max(1, w))
        h_r = self._round(max(1, h))
        best = None
        for shelf in self.shelves:
            sy, sh, cx, live = shelf
            if h_r <= sh <= h_r * 2 and cx + w <= self.width:
                if best is None or sh < best[1]:
                    best = shelf
        if best is None:
            if self.next_y + h_r > self.height:
                return None
            best = [self.next_y, h_r, 0, 0]
            self.shelves.append(best)
            self.next_y += h_r
        region = AtlasRegion(best[2], best[0], w, h)
        best[2] += w
        best[3] += 1
        return region

    def free_shelfless(self):
        """Drop empty trailing shelves (cheap partial compaction)."""
        while self.shelves and self.shelves[-1][3] == 0:
            shelf = self.shelves.pop()
            self.next_y = shelf[0]

    def clear(self):
        self.shelves = []
        self.next_y = 0


class FrameAtlas:
    """Per-frame transient allocator (surface atlas): reset every frame,
    rows packed greedily. The reference's render-task surface allocation
    with target aliasing (`render_task_graph.rs:800`) maps to this: surfaces
    live only within a frame."""

    def __init__(self, width: int, height: int, align: int = 8):
        self.width = width
        self.height = height
        self.align = align
        self.clear()

    def clear(self):
        self.cur_x = 0
        self.cur_y = 0
        self.row_h = 0

    def alloc(self, w: int, h: int) -> Optional[AtlasRegion]:
        a = self.align
        w = min((max(1, w) + a - 1) // a * a, self.width)
        h = (max(1, h) + a - 1) // a * a
        if self.cur_x + w > self.width:
            self.cur_y += self.row_h
            self.cur_x = 0
            self.row_h = 0
        if self.cur_y + h > self.height:
            return None
        region = AtlasRegion(self.cur_x, self.cur_y, w, h)
        self.cur_x += w
        self.row_h = max(self.row_h, h)
        return region
