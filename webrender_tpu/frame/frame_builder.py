"""Frame building: BuiltScene + resources + frame params → Frame.

Mirrors `webrender/src/frame_builder.rs` (FrameBuilder::build :507) with the
pass structure re-designed for TPU execution (SURVEY.md §7.5-7.6):

 * visibility/culling happens while preparing (device-bbox intersection with
   the viewport — `visibility.rs` role);
 * prepare writes per-primitive pattern payloads into the flat GPU buffer
   (`prepare.rs` role);
 * offscreen surfaces (filters, mix-blend, shadows — `picture.rs` /
   `render_task_graph.rs` role) become raster/blur passes targeting a
   per-frame surface atlas, ordered dependencies-first;
 * batching becomes per-tile fixed-shape instance lists (`tiles.py`).

The output Frame is a set of numpy arrays + pass descriptors that the
renderer executes as jitted XLA/Pallas computations.
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..api.color import ColorF
from ..api.display_item import (BoxShadowClipMode, ClipMode, ExtendMode,
                                FilterOpKind, ImageRendering, LineStyle,
                                MixBlendMode)
from ..api.units import Point2D, Rect, Transform
from ..resources.atlas import AtlasRegion, FrameAtlas
from ..resources.resource_cache import ResourceCache
from ..scene.clip import ClipKind, ClipNode
from ..scene.prims import (BackdropFilterPrim, BoxShadowPrim, ClearPrim,
                           CompositeOps, ConicGradientPrim, ImagePrim,
                           LineDecorationPrim, LinearGradientPrim,
                           NinePatchBorderPrim, NormalBorderPrim, PicturePrim,
                           PrimCommon, RadialGradientPrim, RectanglePrim,
                           TextRunPrim, YuvImagePrim)
from ..scene.scene import BuiltScene
from ..scene.spatial_tree import SpatialNodeKind
from .gpu import (BLEND_CLEAR, BLEND_MIX_BASE, BLEND_NORMAL, CLIP_STRIDE,
                  GRAD_LUT_SIZE, GpuBufferBuilder, KIND_BOX_SHADOW,
                  KIND_CLEAR, KIND_CONIC_GRAD, KIND_GLYPH, KIND_IMAGE,
                  KIND_LINEAR_GRAD, KIND_PICTURE, KIND_RADIAL_GRAD,
                  KIND_SOLID, gradient_stops_records, identity_color_matrix,
                  pad_pow2, pad_pow2_rows)
from .tiles import TILE_H, TILE_W, bin_instances
from .transforms import (build_transform_palette, device_bounds_of_rect,
                         node_homography)

PASS_RASTER = 0
PASS_BLUR_H = 1
PASS_BLUR_V = 2

TARGET_ROOT = -1
TARGET_SURFACE = 2  # matches resources.ATLAS_SURFACE


@dataclass
class RenderPass:
    kind: int
    target: int = TARGET_ROOT
    region: Tuple[int, int, int, int] = (0, 0, 0, 0)  # x, y, w, h in target
    origin: Tuple[float, float] = (0.0, 0.0)  # device coords of region (0,0)
    clear: Optional[Tuple[float, float, float, float]] = None
    tile_insts: Optional[np.ndarray] = None
    tile_counts: Optional[np.ndarray] = None
    nx: int = 0
    ny: int = 0
    # blur passes:
    src_region: Tuple[int, int, int, int] = (0, 0, 0, 0)
    sigma: float = 0.0


@dataclass
class Frame:
    """frame_builder.rs Frame (:1129) — device-ready arrays + passes."""
    f32_buf: np.ndarray
    instances: np.ndarray
    transforms: np.ndarray
    passes: List[RenderPass]
    fb_size: Tuple[int, int]              # (w, h)
    clear_color: Tuple[float, float, float, float]
    inst_bboxes: Optional[np.ndarray] = None  # [N, 4] device AABBs (oracle/debug)


@dataclass
class _InstanceMeta:
    bbox: Tuple[float, float, float, float]  # device AABB (AA-inflated)


class FrameBuilder:
    def __init__(self, surface_atlas_size=(2048, 4096)):
        # (h, w) — matches renderer's surface atlas array
        self.surface_atlas_size = surface_atlas_size

    def build(self, scene: BuiltScene, resources: ResourceCache,
              device_size: Tuple[int, int], dpr: float = 1.0,
              scroll_offsets: Optional[Dict[int, Point2D]] = None,
              properties: Optional[Dict[int, Transform]] = None,
              ) -> Frame:
        self.scene = scene
        self.resources = resources
        self.device_size = device_size
        self.dpr = dpr
        w, h = device_size
        self.viewport = Rect(0, 0, w, h)

        self.resolved = scene.spatial_tree.resolve(
            scroll_offsets=scroll_offsets,
            transform_properties=properties,
            viewport=Rect(0, 0, w / dpr, h / dpr))
        self.palette = build_transform_palette(self.resolved, dpr)
        self.H_dev = [node_homography(r.world, dpr) for r in self.resolved]
        # synthetic palette row: identity device-space mapping, used by
        # composite (picture) instances whose rects are already device px
        dev_row = np.zeros((1, self.palette.shape[1]), np.float32)
        dev_row[0, 0:9] = np.eye(3, dtype=np.float32).reshape(-1)
        dev_row[0, 9:11] = 1.0
        self.device_spatial = self.palette.shape[0]
        self.palette = np.concatenate([self.palette, dev_row], axis=0)

        self.gb = GpuBufferBuilder()
        self.metas: List[_InstanceMeta] = []
        self.passes: List[RenderPass] = []
        self.surface_atlas = FrameAtlas(self.surface_atlas_size[1],
                                        self.surface_atlas_size[0])
        self._clip_cache: Dict[Tuple, Tuple[int, int, Optional[Tuple]]] = {}
        self._viewport_clip_cache: Dict[int, Tuple[ClipNode, ...]] = {}
        self._lut_cache: Dict[Tuple, int] = {}

        root_insts: List[int] = []
        self._process_picture(scene.root, root_insts)

        tile_insts, tile_counts, nx, ny = bin_instances(
            root_insts, [self.metas[i].bbox for i in root_insts],
            (0.0, 0.0), (w, h))
        bg = scene.background_color or ColorF.WHITE
        root_pass = RenderPass(PASS_RASTER, TARGET_ROOT, (0, 0, w, h),
                               (0.0, 0.0), clear=bg.premultiplied(),
                               tile_insts=tile_insts, tile_counts=tile_counts,
                               nx=nx, ny=ny)
        self.passes.append(root_pass)

        f32_buf, instances = self.gb.finish()
        bboxes = np.zeros((instances.shape[0], 4), np.float32)
        for i, m in enumerate(self.metas):
            bboxes[i] = m.bbox
        return Frame(f32_buf, instances, self.palette, self.passes,
                     (w, h), bg.premultiplied(), bboxes)

    # ------------------------------------------------------------------
    # picture traversal / surfaces
    # ------------------------------------------------------------------
    def _process_picture(self, pic: PicturePrim, out: List[int]) -> None:
        for child in pic.children:
            if isinstance(child, PicturePrim):
                if child.composite.needs_surface or child.shadow is not None:
                    self._build_surface(child, out)
                else:
                    self._process_picture(child, out)
            else:
                self._prepare_prim(child, out)

    def _build_surface(self, pic: PicturePrim, out: List[int]) -> None:
        """Render `pic` into a surface-atlas region, then emit composite
        instance(s) into the parent (`picture.rs` PictureCompositeMode)."""
        child_insts: List[int] = []
        self._process_picture(pic, child_insts)
        if not child_insts:
            return

        # accumulate filter state
        blur_sx = blur_sy = 0.0
        color_matrix: Optional[np.ndarray] = None
        opacity = 1.0
        drop_shadows: List = []
        for f in pic.composite.filters:
            k = f.kind
            if k == FilterOpKind.OPACITY:
                opacity *= f.value
            elif k == FilterOpKind.BLUR:
                blur_sx += f.value
                blur_sy += f.value2
            elif k == FilterOpKind.DROP_SHADOW:
                drop_shadows.append(f.shadow)
            elif k == FilterOpKind.IDENTITY:
                pass
            else:
                m = _filter_color_matrix(k, f)
                if m is not None:
                    color_matrix = m if color_matrix is None \
                        else _compose_color_matrix(m, color_matrix)
        if pic.shadow is not None:
            # text/box shadow picture: std dev = blur_radius / 2
            # (scene_building.rs push_shadow semantics)
            blur_sx += pic.shadow.blur_radius * 0.5
            blur_sy += pic.shadow.blur_radius * 0.5

        inflate = int(math.ceil(3.0 * max(blur_sx, blur_sy)))
        for sh in drop_shadows:
            inflate += int(math.ceil(3.0 * sh.blur_radius * 0.5
                                     + max(abs(sh.offset.x), abs(sh.offset.y))))

        bbox = None
        for i in child_insts:
            b = self.metas[i].bbox
            bbox = b if bbox is None else (
                min(bbox[0], b[0]), min(bbox[1], b[1]),
                max(bbox[2], b[2]), max(bbox[3], b[3]))
        # the picture's own clips restrict what we must rasterize
        clip_addr, clip_count, clip_bbox = self._serialize_clips(
            pic.common.clip_chain, pic.common.spatial_node)
        if clip_bbox is not None:
            bbox = (max(bbox[0], clip_bbox[0]), max(bbox[1], clip_bbox[1]),
                    min(bbox[2], clip_bbox[2]), min(bbox[3], clip_bbox[3]))
        vp = self.viewport.inflate(inflate + 2, inflate + 2)
        bbox = (max(bbox[0], vp.x0), max(bbox[1], vp.y0),
                min(bbox[2], vp.x1), min(bbox[3], vp.y1))
        if bbox[2] <= bbox[0] or bbox[3] <= bbox[1]:
            return
        x0 = math.floor(bbox[0]) - inflate
        y0 = math.floor(bbox[1]) - inflate
        sw = int(math.ceil(bbox[2]) - x0) + inflate
        sh_ = int(math.ceil(bbox[3]) - y0) + inflate
        region = self.surface_atlas.alloc(sw, sh_)
        assert region is not None, "surface atlas full"

        tile_insts, tile_counts, nx, ny = bin_instances(
            child_insts, [self.metas[i].bbox for i in child_insts],
            (x0, y0), (region.w, region.h))
        self.passes.append(RenderPass(
            PASS_RASTER, TARGET_SURFACE,
            (region.x, region.y, region.w, region.h), (float(x0), float(y0)),
            clear=(0.0, 0.0, 0.0, 0.0), tile_insts=tile_insts,
            tile_counts=tile_counts, nx=nx, ny=ny))

        content_region = region
        if blur_sx > 0 or blur_sy > 0:
            content_region = self._push_blur(region, blur_sx, blur_sy)

        # drop shadows: blurred+tinted copies behind the content
        for sh in drop_shadows:
            sigma = sh.blur_radius * 0.5
            shadow_region = self._push_blur(region, sigma, sigma) \
                if sigma > 0 else region
            m = np.zeros((4, 5), np.float32)
            m[0, 4], m[1, 4], m[2, 4] = sh.color.r, sh.color.g, sh.color.b
            m[3, 3] = sh.color.a
            self._emit_composite(shadow_region, (x0 + sh.offset.x,
                                                 y0 + sh.offset.y),
                                 (region.w, region.h), pic, 1.0, m,
                                 clip_addr, clip_count, clip_bbox, out)

        cm = color_matrix
        tint = None
        if pic.shadow is not None:
            c = pic.shadow.color
            tint = np.zeros((4, 5), np.float32)
            tint[0, 4], tint[1, 4], tint[2, 4] = c.r, c.g, c.b
            tint[3, 3] = c.a
            cm = tint if cm is None else _compose_color_matrix(tint, cm)
        self._emit_composite(content_region, (x0, y0), (region.w, region.h),
                             pic, opacity, cm, clip_addr, clip_count,
                             clip_bbox, out)

    def _push_blur(self, src: AtlasRegion, sx: float, sy: float) -> AtlasRegion:
        """Separable blur: H pass into a temp region, V pass into a final
        region (`render_task.rs` VerticalBlur/HorizontalBlur)."""
        tmp = self.surface_atlas.alloc(src.w, src.h)
        dst = self.surface_atlas.alloc(src.w, src.h)
        assert tmp is not None and dst is not None, "surface atlas full (blur)"
        self.passes.append(RenderPass(
            PASS_BLUR_H, TARGET_SURFACE,
            (tmp.x, tmp.y, src.w, src.h),
            src_region=(src.x, src.y, src.w, src.h), sigma=sx))
        self.passes.append(RenderPass(
            PASS_BLUR_V, TARGET_SURFACE,
            (dst.x, dst.y, src.w, src.h),
            src_region=(tmp.x, tmp.y, src.w, src.h), sigma=sy))
        return AtlasRegion(dst.x, dst.y, src.w, src.h)

    def _emit_composite(self, region: AtlasRegion, origin: Tuple[float, float],
                        size: Tuple[int, int], pic: PicturePrim,
                        opacity: float, color_matrix: Optional[np.ndarray],
                        clip_addr: int, clip_count: int,
                        clip_bbox, out: List[int]) -> None:
        x0, y0 = origin
        w, h = size
        rect = [x0, y0, x0 + w, y0 + h]
        payload = list(rect) + list(rect)
        payload += [region.x, region.y, region.x + w, region.y + h]
        payload += [opacity, opacity, opacity, opacity]  # premult color mod
        if color_matrix is None:
            payload += list(identity_color_matrix().reshape(-1)) + [0.0]
        else:
            payload += list(np.asarray(color_matrix, np.float32).reshape(-1)) + [1.0]
        addr = self.gb.push_f32(payload)
        blend = BLEND_NORMAL
        if pic.composite.mix_blend_mode != MixBlendMode.NORMAL:
            blend = BLEND_MIX_BASE + pic.composite.mix_blend_mode.value
        idx = self.gb.push_instance(KIND_PICTURE, self.device_spatial, addr,
                                    clip_addr, clip_count, blend, edge_aa=0)
        bbox = (x0, y0, x0 + w, y0 + h)
        if clip_bbox is not None:
            bbox = (max(bbox[0], clip_bbox[0]), max(bbox[1], clip_bbox[1]),
                    min(bbox[2], clip_bbox[2]), min(bbox[3], clip_bbox[3]))
        self.metas.append(_InstanceMeta(bbox))
        out.append(idx)

    # ------------------------------------------------------------------
    # snapping (spatial_node.rs snapping_transform / util.rs snap:
    # axis-aligned rects snap to whole device pixels)
    # ------------------------------------------------------------------
    def _snap_rect(self, rect: Rect, spatial: int) -> Rect:
        if not self.resolved[spatial].is_2d_axis_aligned:
            return rect
        H = self.H_dev[spatial]
        sx, sy = H[0, 0], H[1, 1]
        tx, ty = H[2, 0], H[2, 1]
        if abs(sx) < 1e-9 or abs(sy) < 1e-9:
            return rect
        if not all(math.isfinite(v) for v in (rect.x0, rect.y0, rect.x1,
                                              rect.y1, sx, sy, tx, ty)):
            return rect
        dx0 = round(rect.x0 * sx + tx)
        dy0 = round(rect.y0 * sy + ty)
        dx1 = round(rect.x1 * sx + tx)
        dy1 = round(rect.y1 * sy + ty)
        return Rect.from_bounds((dx0 - tx) / sx, (dy0 - ty) / sy,
                                (dx1 - tx) / sx, (dy1 - ty) / sy)

    # ------------------------------------------------------------------
    # clips
    # ------------------------------------------------------------------
    def _serialize_clips(self, chain: Tuple[int, ...], prim_spatial: int
                         ) -> Tuple[int, int, Optional[Tuple]]:
        """Write clip records; returns (addr, count, device clip AABB).

        Note: scroll frames do NOT implicitly clip their content — the
        embedder defines explicit clips (wrench's `clip-to-frame` creates a
        rect clip; Gecko emits its own clip nodes)."""
        key = (chain, prim_spatial)
        cached = self._clip_cache.get(key)
        if cached is not None:
            return cached
        nodes = [self.scene.clip_store.nodes[i] for i in chain]
        records: List[float] = []
        bbox = None
        count = 0
        for node in nodes:
            rec = [0.0] * CLIP_STRIDE
            nrect = node.rect
            if node.kind in (ClipKind.RECT, ClipKind.ROUNDED_RECT):
                nrect = self._snap_rect(nrect, node.spatial_node)
            rec[0:4] = [nrect.x0, nrect.y0, nrect.x1, nrect.y1]
            r = node.radii
            rec[4:12] = [r.top_left.width, r.top_left.height,
                         r.top_right.width, r.top_right.height,
                         r.bottom_right.width, r.bottom_right.height,
                         r.bottom_left.width, r.bottom_left.height]
            rec[12] = 1.0 if node.mode == ClipMode.CLIP_OUT else 0.0
            rec[13] = float(node.spatial_node)
            if node.kind == ClipKind.RECT:
                rec[14] = 0.0
            elif node.kind == ClipKind.ROUNDED_RECT:
                rec[14] = 1.0
            elif node.kind == ClipKind.IMAGE_MASK:
                rec[14] = 2.0
                req = self.resources.request_image(node.image_key)
                if req is not None:
                    reg, desc = req
                    rec[16:20] = [reg.x, reg.y, reg.x + desc.width,
                                  reg.y + desc.height]
            elif node.kind == ClipKind.BOX_SHADOW:
                rec[14] = 1.0
            records.extend(rec)
            count += 1
            if node.mode == ClipMode.CLIP and node.kind != ClipKind.IMAGE_MASK:
                db = device_bounds_of_rect(self.H_dev[node.spatial_node],
                                           nrect.x0, nrect.y0,
                                           nrect.x1, nrect.y1)
                bbox = db if bbox is None else (
                    max(bbox[0], db[0]), max(bbox[1], db[1]),
                    min(bbox[2], db[2]), min(bbox[3], db[3]))
            elif node.kind == ClipKind.IMAGE_MASK:
                db = device_bounds_of_rect(self.H_dev[node.spatial_node],
                                           node.rect.x0, node.rect.y0,
                                           node.rect.x1, node.rect.y1)
                bbox = db if bbox is None else (
                    max(bbox[0], db[0]), max(bbox[1], db[1]),
                    min(bbox[2], db[2]), min(bbox[3], db[3]))
        addr = self.gb.push_f32(records) if records else 0
        result = (addr, count, bbox)
        self._clip_cache[key] = result
        return result

    # ------------------------------------------------------------------
    # prepare (per-prim payloads) — prepare.rs prepare_primitives analog
    # ------------------------------------------------------------------
    def _prepare_prim(self, prim, out: List[int]) -> None:
        c: PrimCommon = prim.common
        pal = self.palette[c.spatial_node]
        flags = pal[11]
        if int(flags) & 1:
            return  # non-invertible transform
        if (int(flags) & 2) and not c.is_backface_visible:
            return  # backface culled
        axis_aligned = self.resolved[c.spatial_node].is_2d_axis_aligned

        if isinstance(prim, RectanglePrim):
            self._emit_rect_like(prim, c, axis_aligned, out,
                                 KIND_SOLID, list(_premult(prim.color)),
                                 BLEND_NORMAL)
            return
        if isinstance(prim, ClearPrim):
            self._emit_rect_like(prim, c, axis_aligned, out,
                                 KIND_CLEAR, [0.0, 0.0, 0.0, 0.0], BLEND_CLEAR)
            return
        if isinstance(prim, (LinearGradientPrim, RadialGradientPrim,
                             ConicGradientPrim)):
            self._prepare_gradient(prim, c, axis_aligned, out)
            return
        if isinstance(prim, ImagePrim):
            self._prepare_image(prim, c, axis_aligned, out)
            return
        if isinstance(prim, YuvImagePrim):
            self._prepare_yuv(prim, c, axis_aligned, out)
            return
        if isinstance(prim, TextRunPrim):
            self._prepare_text(prim, c, out)
            return
        if isinstance(prim, BoxShadowPrim):
            self._prepare_box_shadow(prim, c, out)
            return
        if isinstance(prim, LineDecorationPrim):
            # v0: solid lines as rects (cs_line_decoration patterns TODO)
            self._emit_rect_like(prim, c, axis_aligned, out,
                                 KIND_SOLID, list(_premult(prim.color)),
                                 BLEND_NORMAL)
            return
        if isinstance(prim, NormalBorderPrim):
            self._prepare_border(prim, c, axis_aligned, out)
            return
        if isinstance(prim, NinePatchBorderPrim):
            return  # TODO: nine-patch borders
        if isinstance(prim, BackdropFilterPrim):
            return  # TODO: backdrop filters
        raise NotImplementedError(type(prim).__name__)

    # --- helpers -----------------------------------------------------------
    def _emit_common(self, c: PrimCommon, axis_aligned: bool,
                     pattern_rect: Rect, draw_rect: Rect, snap: bool = True,
                     ) -> Optional[Tuple[List[float], int, int, int, Tuple]]:
        """Shared geometry prep: coverage rect, edge AA mask, clips, culling.
        Returns (payload_prefix, edge_aa, clip_addr, clip_count, bbox)."""
        if snap and axis_aligned:
            snapped = self._snap_rect(draw_rect, c.spatial_node)
            if pattern_rect == draw_rect:
                pattern_rect = snapped
            else:
                pattern_rect = self._snap_rect(pattern_rect, c.spatial_node)
            draw_rect = snapped
        cov = draw_rect.intersection(c.clip_rect)
        if cov is None:
            return None
        edge_aa = 0
        if axis_aligned:
            if cov.x0 <= draw_rect.x0:
                edge_aa |= 1
            if cov.y0 <= draw_rect.y0:
                edge_aa |= 2
            if cov.x1 >= draw_rect.x1:
                edge_aa |= 4
            if cov.y1 >= draw_rect.y1:
                edge_aa |= 8
        else:
            edge_aa = 0xF
        clip_addr, clip_count, clip_bbox = self._serialize_clips(
            c.clip_chain, c.spatial_node)
        db = device_bounds_of_rect(self.H_dev[c.spatial_node],
                                   cov.x0, cov.y0, cov.x1, cov.y1)
        bbox = (db[0] - 1, db[1] - 1, db[2] + 1, db[3] + 1)
        if clip_bbox is not None:
            bbox = (max(bbox[0], clip_bbox[0] - 1),
                    max(bbox[1], clip_bbox[1] - 1),
                    min(bbox[2], clip_bbox[2] + 1),
                    min(bbox[3], clip_bbox[3] + 1))
        vp = self.viewport
        bbox = (max(bbox[0], vp.x0 - 4096), max(bbox[1], vp.y0 - 4096),
                min(bbox[2], vp.x1 + 4096), min(bbox[3], vp.y1 + 4096))
        if not all(math.isfinite(v) for v in bbox):
            return None  # NaN geometry: cull (crash-safety, gradient/linear-nan)
        if bbox[2] <= bbox[0] or bbox[3] <= bbox[1]:
            return None
        prefix = [pattern_rect.x0, pattern_rect.y0,
                  pattern_rect.x1, pattern_rect.y1,
                  cov.x0, cov.y0, cov.x1, cov.y1]
        return prefix, edge_aa, clip_addr, clip_count, bbox

    def _emit_rect_like(self, prim, c: PrimCommon, axis_aligned: bool,
                        out: List[int], kind: int, payload_tail: List[float],
                        blend: int) -> None:
        r = c.local_rect
        res = self._emit_common(c, axis_aligned, r, r)
        if res is None:
            return
        prefix, edge_aa, clip_addr, clip_count, bbox = res
        addr = self.gb.push_f32(prefix + payload_tail)
        idx = self.gb.push_instance(kind, c.spatial_node, addr, clip_addr,
                                    clip_count, blend, edge_aa)
        self.metas.append(_InstanceMeta(bbox))
        out.append(idx)

    def _gradient_stops_addr(self, stops) -> Tuple[int, int]:
        key = tuple((s.offset, s.color.r, s.color.g, s.color.b, s.color.a)
                    for s in stops)
        hit = self._lut_cache.get(key)
        if hit is None:
            recs = gradient_stops_records(stops)
            hit = (self.gb.push_f32(recs.reshape(-1)), recs.shape[0])
            self._lut_cache[key] = hit
        return hit

    def _prepare_gradient(self, prim, c: PrimCommon, axis_aligned: bool,
                          out: List[int]) -> None:
        """Payload layouts (see frame/gpu.py):
        LINEAR [8:12] p0,p1  RADIAL [8:10] c [10:12] r  CONIC [8:10] c [10] angle
        then [12] stops_addr [13] extend [14] nstops [15] pad
        [16/18] start/end offsets (radial/conic) and tile size + spacing."""
        addr, n = self._gradient_stops_addr(prim.stops)
        ts = prim.tile_size
        sp = prim.tile_spacing
        tile = [ts.width or c.local_rect.w, ts.height or c.local_rect.h,
                sp.width, sp.height]
        ext = float(prim.gradient.extend_mode.value)
        g = prim.gradient
        if isinstance(prim, LinearGradientPrim):
            tail = [g.start_point.x, g.start_point.y, g.end_point.x,
                    g.end_point.y, float(addr), ext, float(n), 0.0] + tile
            kind = KIND_LINEAR_GRAD
        elif isinstance(prim, RadialGradientPrim):
            tail = [g.center.x, g.center.y, g.radius.width, g.radius.height,
                    float(addr), ext, float(n), 0.0,
                    g.start_offset, g.end_offset] + tile
            kind = KIND_RADIAL_GRAD
        else:
            tail = [g.center.x, g.center.y, g.angle, 0.0,
                    float(addr), ext, float(n), 0.0,
                    g.start_offset, g.end_offset] + tile
            kind = KIND_CONIC_GRAD
        self._emit_rect_like(prim, c, axis_aligned, out, kind, tail,
                             BLEND_NORMAL)

    def _prepare_image(self, prim: ImagePrim, c: PrimCommon,
                       axis_aligned: bool, out: List[int]) -> None:
        req = self.resources.request_image(prim.image_key)
        if req is None:
            return
        region, desc = req
        self._emit_image_instance(prim, c, axis_aligned, out, region.x,
                                  region.y, desc.width, desc.height,
                                  prim.stretch_size.width or c.local_rect.w,
                                  prim.stretch_size.height or c.local_rect.h,
                                  prim.tile_spacing.width,
                                  prim.tile_spacing.height,
                                  prim.image_rendering, prim.color)

    def _prepare_yuv(self, prim: YuvImagePrim, c: PrimCommon,
                     axis_aligned: bool, out: List[int]) -> None:
        req = self.resources.request_yuv_image(
            prim.yuv_keys, prim.format, prim.color_space, prim.color_range,
            prim.color_depth)
        if req is None:
            return
        region, w, h = req
        self._emit_image_instance(prim, c, axis_aligned, out, region.x,
                                  region.y, w, h, c.local_rect.w,
                                  c.local_rect.h, 0.0, 0.0,
                                  prim.image_rendering, ColorF.WHITE)

    def _emit_image_instance(self, prim, c, axis_aligned, out, ux, uy, uw, uh,
                             stretch_w, stretch_h, spacing_w, spacing_h,
                             rendering, color) -> None:
        nearest = 1.0 if rendering in (ImageRendering.PIXELATED,
                                       ImageRendering.CROSP_EDGES) else 0.0
        tail = [ux, uy, ux + uw, uy + uh] + list(_premult(color)) + \
            [nearest, 0.0, stretch_w, stretch_h, spacing_w, spacing_h, 0.0, 0.0]
        self._emit_rect_like(prim, c, axis_aligned, out, KIND_IMAGE, tail,
                             BLEND_NORMAL)

    def _prepare_text(self, prim: TextRunPrim, c: PrimCommon,
                      out: List[int]) -> None:
        """One GLYPH instance per glyph (ps_text_run instances)."""
        glyphs = self.resources.request_glyphs(
            prim.font_instance_key, [g for g, _, _ in prim.glyphs])
        if not glyphs:
            return
        clip_addr, clip_count, clip_bbox = self._serialize_clips(
            c.clip_chain, c.spatial_node)
        col = list(_premult(prim.color))
        for (gi, gx, gy) in prim.glyphs:
            cg = glyphs.get(gi)
            if cg is None or cg.region is None:
                continue
            # snap pen to whole device pixels (glyph raster is grid-fitted)
            px = round(gx) + cg.left
            py = round(gy) - cg.top
            rect = Rect(px, py, cg.width, cg.height)
            cov = rect.intersection(c.clip_rect)
            if cov is None:
                continue
            payload = [rect.x0, rect.y0, rect.x1, rect.y1,
                       cov.x0, cov.y0, cov.x1, cov.y1,
                       cg.region.x, cg.region.y,
                       cg.region.x + cg.width, cg.region.y + cg.height] + col
            addr = self.gb.push_f32(payload)
            idx = self.gb.push_instance(KIND_GLYPH, c.spatial_node, addr,
                                        clip_addr, clip_count, BLEND_NORMAL, 0)
            db = device_bounds_of_rect(self.H_dev[c.spatial_node],
                                       cov.x0, cov.y0, cov.x1, cov.y1)
            bbox = (db[0] - 1, db[1] - 1, db[2] + 1, db[3] + 1)
            if clip_bbox is not None:
                bbox = (max(bbox[0], clip_bbox[0] - 1),
                        max(bbox[1], clip_bbox[1] - 1),
                        min(bbox[2], clip_bbox[2] + 1),
                        min(bbox[3], clip_bbox[3] + 1))
            if bbox[2] <= bbox[0] or bbox[3] <= bbox[1]:
                continue
            self.metas.append(_InstanceMeta(bbox))
            out.append(idx)

    def _prepare_box_shadow(self, prim: BoxShadowPrim, c: PrimCommon,
                            out: List[int]) -> None:
        """Analytic gaussian box shadow (box_shadow.rs semantics re-designed:
        instead of a blurred cached task, the kernel evaluates the closed-form
        blurred-rounded-rect; sigma = blur_radius/2)."""
        sigma = prim.blur_radius * 0.5
        spread = prim.spread_radius
        if prim.clip_mode == BoxShadowClipMode.OUTSET:
            shadow_rect = prim.box_bounds.inflate(spread, spread).translate(
                prim.offset.x, prim.offset.y)
            inflate = 3.0 * sigma
            draw_rect = shadow_rect.inflate(inflate, inflate)
        else:
            shadow_rect = prim.box_bounds.inflate(-spread, -spread).translate(
                prim.offset.x, prim.offset.y)
            draw_rect = prim.box_bounds
        r = prim.border_radius
        radii = [r.top_left.width, r.top_left.height,
                 r.top_right.width, r.top_right.height,
                 r.bottom_right.width, r.bottom_right.height,
                 r.bottom_left.width, r.bottom_left.height]
        scale = 1.0 + (spread / max(1.0, min(prim.box_bounds.w,
                                             prim.box_bounds.h) * 0.5)) * 0.0
        res = self._emit_common(c, True, draw_rect, draw_rect)
        if res is None:
            return
        prefix, edge_aa, clip_addr, clip_count, bbox = res
        bb = prim.box_bounds
        payload = prefix + \
            [shadow_rect.x0, shadow_rect.y0, shadow_rect.x1, shadow_rect.y1] + \
            radii + [sigma,
                     0.0 if prim.clip_mode == BoxShadowClipMode.OUTSET else 1.0] + \
            [bb.x0, bb.y0, bb.x1, bb.y1] + radii + list(_premult(prim.color))
        addr = self.gb.push_f32(payload)
        idx = self.gb.push_instance(KIND_BOX_SHADOW, c.spatial_node, addr,
                                    clip_addr, clip_count, BLEND_NORMAL, 0)
        self.metas.append(_InstanceMeta(bbox))
        out.append(idx)

    def _prepare_border(self, prim: NormalBorderPrim, c: PrimCommon,
                        axis_aligned: bool, out: List[int]) -> None:
        """v0 border: per-side solid rects (no radius mitering yet —
        full border_segment patterns TODO; `border.rs`)."""
        from ..api.display_item import BorderStyle
        b = prim.border
        r = c.local_rect
        w = prim.widths
        sides = [
            (Rect(r.x0, r.y0, r.w, w.top), b.top),
            (Rect(r.x0, r.y1 - w.bottom, r.w, w.bottom), b.bottom),
            (Rect(r.x0, r.y0 + w.top, w.left, r.h - w.top - w.bottom), b.left),
            (Rect(r.x1 - w.right, r.y0 + w.top, w.right,
                  r.h - w.top - w.bottom), b.right),
        ]
        for rect, side in sides:
            if rect.is_empty or side.style in (BorderStyle.NONE,
                                               BorderStyle.HIDDEN):
                continue
            sub = RectanglePrim(
                PrimCommon(rect, c.clip_rect, c.spatial_node, c.clip_chain,
                           c.is_backface_visible), side.color)
            self._emit_rect_like(sub, sub.common, axis_aligned, out,
                                 KIND_SOLID, list(_premult(side.color)),
                                 BLEND_NORMAL)


def _premult(color: ColorF) -> Tuple[float, float, float, float]:
    return color.premultiplied()


# --- color matrices for CSS filters (straight-alpha 4x5, row major) --------

def _filter_color_matrix(kind: FilterOpKind, f) -> Optional[np.ndarray]:
    v = f.value
    m = np.zeros((4, 5), np.float32)
    if kind == FilterOpKind.GRAYSCALE:
        a = 1.0 - min(v, 1.0)
        m[0, 0:3] = [0.2126 + 0.7874 * a, 0.7152 - 0.7152 * a, 0.0722 - 0.0722 * a]
        m[1, 0:3] = [0.2126 - 0.2126 * a, 0.7152 + 0.2848 * a, 0.0722 - 0.0722 * a]
        m[2, 0:3] = [0.2126 - 0.2126 * a, 0.7152 - 0.7152 * a, 0.0722 + 0.9278 * a]
        m[3, 3] = 1.0
    elif kind == FilterOpKind.SEPIA:
        a = 1.0 - min(v, 1.0)
        m[0, 0:3] = [0.393 + 0.607 * a, 0.769 - 0.769 * a, 0.189 - 0.189 * a]
        m[1, 0:3] = [0.349 - 0.349 * a, 0.686 + 0.314 * a, 0.168 - 0.168 * a]
        m[2, 0:3] = [0.272 - 0.272 * a, 0.534 - 0.534 * a, 0.131 + 0.869 * a]
        m[3, 3] = 1.0
    elif kind == FilterOpKind.SATURATE:
        s = v
        m[0, 0:3] = [0.213 + 0.787 * s, 0.715 - 0.715 * s, 0.072 - 0.072 * s]
        m[1, 0:3] = [0.213 - 0.213 * s, 0.715 + 0.285 * s, 0.072 - 0.072 * s]
        m[2, 0:3] = [0.213 - 0.213 * s, 0.715 - 0.715 * s, 0.072 + 0.928 * s]
        m[3, 3] = 1.0
    elif kind == FilterOpKind.HUE_ROTATE:
        rad = math.radians(v)
        cos, sin = math.cos(rad), math.sin(rad)
        m[0, 0:3] = [0.213 + cos * 0.787 - sin * 0.213,
                     0.715 - cos * 0.715 - sin * 0.715,
                     0.072 - cos * 0.072 + sin * 0.928]
        m[1, 0:3] = [0.213 - cos * 0.213 + sin * 0.143,
                     0.715 + cos * 0.285 + sin * 0.140,
                     0.072 - cos * 0.072 - sin * 0.283]
        m[2, 0:3] = [0.213 - cos * 0.213 - sin * 0.787,
                     0.715 - cos * 0.715 + sin * 0.715,
                     0.072 + cos * 0.928 + sin * 0.072]
        m[3, 3] = 1.0
    elif kind == FilterOpKind.INVERT:
        i = min(v, 1.0)
        m[0, 0] = m[1, 1] = m[2, 2] = 1.0 - 2.0 * i
        m[0, 4] = m[1, 4] = m[2, 4] = i
        m[3, 3] = 1.0
    elif kind == FilterOpKind.BRIGHTNESS:
        m[0, 0] = m[1, 1] = m[2, 2] = v
        m[3, 3] = 1.0
    elif kind == FilterOpKind.CONTRAST:
        m[0, 0] = m[1, 1] = m[2, 2] = v
        m[0, 4] = m[1, 4] = m[2, 4] = 0.5 - 0.5 * v
        m[3, 3] = 1.0
    elif kind == FilterOpKind.COLOR_MATRIX:
        m = np.asarray(f.matrix, np.float32).reshape(4, 5)
    else:
        return None
    return m


def _compose_color_matrix(m2: np.ndarray, m1: np.ndarray) -> np.ndarray:
    """Apply m1 first, then m2 (both 4x5 affine color transforms)."""
    a1 = np.eye(5, dtype=np.float32)
    a1[:4, :] = m1
    a2 = np.eye(5, dtype=np.float32)
    a2[:4, :] = m2
    return (a2 @ a1)[:4, :]
