"""Resources layer — `resource_cache.rs` / `texture_cache.rs` equivalents."""
from .atlas import AtlasRegion, FrameAtlas, ShelfAllocator
from .resource_cache import (ATLAS_ALPHA, ATLAS_COLOR, ATLAS_SURFACE,
                             CachedGlyph, FontContext, ImageTemplate,
                             PendingUpload, ResourceCache)
