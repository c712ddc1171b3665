"""Configuration — `renderer/init.rs:118` WebRenderOptions and
`webrender_api/lib.rs:664` DebugFlags equivalents: startup options + runtime
debug toggles threaded through the backend/renderer."""
from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional, Tuple


class DebugFlags(enum.IntFlag):
    """lib.rs DebugFlags (the subset meaningful for this backend)."""
    NONE = 0
    PROFILER_DBG = 1 << 0
    TEXTURE_CACHE_DBG = 1 << 1
    RENDER_TARGET_DBG = 1 << 2
    GPU_TIME_QUERIES = 1 << 4
    TILE_CACHE_DBG = 1 << 7
    DISABLE_PICTURE_CACHING = 1 << 11
    DISABLE_OPAQUE_PASS = 1 << 14
    DISABLE_ALPHA_PASS = 1 << 15
    OBSCURE_IMAGES = 1 << 18
    DISABLE_RASTER_ROOT_SCALING = 1 << 20
    INVALIDATION_DBG = 1 << 21
    HIGHLIGHT_BACKDROP_FILTERS = 1 << 24


@dataclass
class QualitySettings:
    """webrender_api QualitySettings."""
    force_subpixel_aa_where_possible: bool = False


@dataclass
class WebRenderOptions:
    """renderer/init.rs:118-199 WebRenderOptions, TPU edition."""
    device_pixel_ratio: float = 1.0
    clear_color: Optional[Tuple[float, float, float, float]] = (1, 1, 1, 1)
    # cache sizes (texture_cache.rs budgets)
    color_atlas_size: Tuple[int, int] = (4096, 4096)
    alpha_atlas_size: Tuple[int, int] = (2048, 2048)
    surface_atlas_size: Tuple[int, int] = (2048, 4096)
    # pipeline
    enable_picture_caching: bool = True
    use_pallas_kernels: Optional[bool] = None   # None = auto (TPU only)
    support_low_priority_transactions: bool = False
    enable_multithreading: bool = True
    # debugging
    debug_flags: DebugFlags = DebugFlags.NONE
    precache_kernels: bool = False   # compile common kernel variants upfront
    quality: QualitySettings = field(default_factory=QualitySettings)


def apply_options(backend, options: WebRenderOptions) -> None:
    """Thread options into an existing backend/renderer (the SetParameter /
    SetFlags runtime path, render_backend.rs:11)."""
    backend.dpr = options.device_pixel_ratio
    r = backend.renderer
    r.picture_caching = options.enable_picture_caching and not (
        options.debug_flags & DebugFlags.DISABLE_PICTURE_CACHING)
    r.debug_flags = int(options.debug_flags)
    r.profiler = backend.profiler
    if options.use_pallas_kernels is not None:
        r.use_pallas = options.use_pallas_kernels
