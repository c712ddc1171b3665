"""Spatial tree — transform hierarchy of reference frames, scroll frames and
sticky frames. Mirrors the semantics of `webrender/src/spatial_tree.rs:210`
(SceneSpatialTree) and `spatial_node.rs:114` (SpatialNodeType), collapsed
into one structure: the scene side defines nodes, the frame side resolves
world transforms given current scroll offsets / animated properties.

TPU-first note: rather than the reference's CoordinateSystem partitioning,
every node gets an explicit 4x4 local→world matrix at frame-build time, with
a 2D-affine fast path recorded in the transform palette consumed by the
raster kernels (`gpu_types.rs` TransformPalette analog).
"""
from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..api.units import Point2D, Rect, Transform
from ..api.display_item import SpatialId, StickyFrameItem


class SpatialNodeKind(enum.Enum):
    REFERENCE_FRAME = 0
    SCROLL_FRAME = 1
    STICKY_FRAME = 2


@dataclass
class SpatialNode:
    index: int
    parent: Optional[int]
    kind: SpatialNodeKind
    # reference frame:
    origin: Point2D = field(default_factory=Point2D)
    transform: Transform = field(default_factory=Transform.identity)
    transform_binding: Optional[int] = None   # animated property key
    is_perspective: bool = False
    preserves_3d: bool = False
    # scroll frame:
    frame_rect: Rect = field(default_factory=Rect)
    content_rect: Rect = field(default_factory=Rect)
    external_id: int = 0
    external_scroll_offset: Point2D = field(default_factory=Point2D)
    # sticky frame:
    sticky: Optional[StickyFrameItem] = None


@dataclass
class ResolvedSpatialNode:
    """Frame-time resolution of one node (spatial_tree.rs SpatialNode)."""
    world: Transform                 # local → world (layout px)
    is_2d_axis_aligned: bool
    is_invertible: bool


class SceneSpatialTree:
    """Built during scene building; index 0 = root reference frame, 1 = root
    scroll node (matching SpatialId convention in display_item.py)."""

    def __init__(self):
        self.nodes: List[SpatialNode] = []
        root = SpatialNode(0, None, SpatialNodeKind.REFERENCE_FRAME)
        self.nodes.append(root)
        root_scroll = SpatialNode(1, 0, SpatialNodeKind.SCROLL_FRAME,
                                  frame_rect=Rect(-1e9, -1e9, 2e9, 2e9),
                                  content_rect=Rect(-1e9, -1e9, 2e9, 2e9))
        self.nodes.append(root_scroll)

    def add_reference_frame(self, index: int, parent: int, origin: Point2D,
                            transform: Transform,
                            transform_binding: Optional[int] = None,
                            is_perspective: bool = False,
                            preserves_3d: bool = False) -> None:
        self._insert(SpatialNode(index, parent, SpatialNodeKind.REFERENCE_FRAME,
                                 origin=origin, transform=transform,
                                 transform_binding=transform_binding,
                                 is_perspective=is_perspective,
                                 preserves_3d=preserves_3d))

    def add_scroll_frame(self, index: int, parent: int, frame_rect: Rect,
                         content_rect: Rect, external_id: int,
                         external_scroll_offset: Point2D) -> None:
        self._insert(SpatialNode(index, parent, SpatialNodeKind.SCROLL_FRAME,
                                 frame_rect=frame_rect,
                                 content_rect=content_rect,
                                 external_id=external_id,
                                 external_scroll_offset=external_scroll_offset))

    def add_sticky_frame(self, index: int, parent: int,
                         item: StickyFrameItem) -> None:
        self._insert(SpatialNode(index, parent, SpatialNodeKind.STICKY_FRAME,
                                 sticky=item))

    def _insert(self, node: SpatialNode) -> None:
        while len(self.nodes) <= node.index:
            self.nodes.append(None)  # type: ignore
        self.nodes[node.index] = node

    def __len__(self):
        return len(self.nodes)

    # -----------------------------------------------------------------------
    def resolve(self,
                scroll_offsets: Optional[Dict[int, Point2D]] = None,
                transform_properties: Optional[Dict[int, Transform]] = None,
                viewport: Optional[Rect] = None,
                ) -> List[ResolvedSpatialNode]:
        """Compute local→world transforms for every node
        (spatial_tree.rs update_tree analog).

        scroll_offsets: external_scroll_id → current offset.
        transform_properties: animated property key → transform value.
        """
        scroll_offsets = scroll_offsets or {}
        transform_properties = transform_properties or {}
        resolved: List[Optional[ResolvedSpatialNode]] = [None] * len(self.nodes)

        for node in self.nodes:
            if node is None:
                continue
            if node.parent is None:
                parent_world = Transform.identity()
            else:
                parent_res = resolved[node.parent]
                assert parent_res is not None, "parent resolved before child"
                parent_world = parent_res.world

            if node.kind == SpatialNodeKind.REFERENCE_FRAME:
                t = node.transform
                if node.transform_binding is not None:
                    t = transform_properties.get(node.transform_binding, t)
                # local content point → parent: apply transform, then origin
                # translation (scene_building.rs push_reference_frame: the
                # frame's content is positioned at `origin` in the parent).
                local = t.post_translate(node.origin.x, node.origin.y)
            elif node.kind == SpatialNodeKind.SCROLL_FRAME:
                cur = scroll_offsets.get(node.external_id,
                                         node.external_scroll_offset)
                dx = -(cur.x - node.external_scroll_offset.x)
                dy = -(cur.y - node.external_scroll_offset.y)
                local = Transform.translation(dx, dy)
            else:  # STICKY_FRAME
                off = self._sticky_offset(node, parent_world, viewport)
                local = Transform.translation(off.x, off.y)

            world = local.then(parent_world)
            resolved[node.index] = ResolvedSpatialNode(
                world=world,
                is_2d_axis_aligned=world.is_2d_axis_aligned,
                is_invertible=world.inverse() is not None,
            )
        # Fill gaps (defensive) with identity
        for i, r in enumerate(resolved):
            if r is None:
                resolved[i] = ResolvedSpatialNode(Transform.identity(), True, True)
        return resolved  # type: ignore

    def _sticky_offset(self, node: SpatialNode, parent_world: Transform,
                       viewport: Optional[Rect]) -> Point2D:
        """Sticky positioning (spatial_node.rs StickyFrameInfo semantics,
        simplified): keep `bounds` within `margins` of the nearest scrollport.
        """
        st = node.sticky
        if st is None or viewport is None:
            return Point2D(0, 0)
        # Find nearest ancestor scroll frame's viewport in world space.
        scroll = node.parent
        while scroll is not None and self.nodes[scroll] is not None and \
                self.nodes[scroll].kind != SpatialNodeKind.SCROLL_FRAME:
            scroll = self.nodes[scroll].parent
        if scroll is None or self.nodes[scroll] is None:
            return Point2D(0, 0)
        sf = self.nodes[scroll]
        # bounds in world space under current (pre-sticky) transform
        world_bounds = parent_world.transform_rect_bounds(st.bounds)
        vp = parent_world.transform_rect_bounds(sf.frame_rect)
        top, right, bottom, left = st.margins
        ox = oy = 0.0
        if top is not None and world_bounds.y0 < vp.y0 + top:
            oy = (vp.y0 + top) - world_bounds.y0
        elif bottom is not None and world_bounds.y1 > vp.y1 - bottom:
            oy = (vp.y1 - bottom) - world_bounds.y1
        if left is not None and world_bounds.x0 < vp.x0 + left:
            ox = (vp.x0 + left) - world_bounds.x0
        elif right is not None and world_bounds.x1 > vp.x1 - right:
            ox = (vp.x1 - right) - world_bounds.x1
        lo_y, hi_y = st.vertical_offset_bounds
        lo_x, hi_x = st.horizontal_offset_bounds
        oy = min(max(oy, lo_y), hi_y)
        ox = min(max(ox, lo_x), hi_x)
        return Point2D(ox, oy)
