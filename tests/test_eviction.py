"""Texture-cache eviction + OOM recovery tests (texture_cache.rs LRU
eviction :562, renderer/mod.rs:1289 clear-and-retry; round-2 fixes for the
mid-frame-eviction corruption findings)."""
import numpy as np

from webrender_tpu.resources.atlas import (AtlasFullError, AtlasRegion,
                                           FrameAtlas, ShelfAllocator)
from webrender_tpu.resources.resource_cache import ResourceCache
from webrender_tpu.api.image import ImageData, ImageDescriptor, ImageFormat


def _overlaps(a: AtlasRegion, b: AtlasRegion) -> bool:
    return not (a.x + a.w <= b.x or b.x + b.w <= a.x or
                a.y + a.h <= b.y or b.y + b.h <= a.y)


def test_shelf_allocator_free_and_reuse():
    al = ShelfAllocator(256, 64, align=8)
    regions = [al.alloc(32, 16) for _ in range(8)]  # one full shelf
    assert all(r is not None for r in regions)
    # free two middle regions; the next same-size alloc reuses a freed span
    al.free(regions[2])
    al.free(regions[3])
    r = al.alloc(32, 16)
    assert r is not None
    assert r.y == regions[2].y and r.x in (regions[2].x, regions[3].x)
    # freeing everything on a shelf resets it completely
    for reg in [regions[i] for i in range(8) if i not in (2, 3)] + [r]:
        al.free(reg)
    assert al.next_y == 0 or all(s.live == 0 for s in al.shelves)


def test_shelf_allocator_exhaustion_returns_none():
    al = ShelfAllocator(64, 32, align=8)
    got = []
    while True:
        r = al.alloc(32, 16)
        if r is None:
            break
        got.append(r)
    assert len(got) == 4  # 2 shelves x 2 slots
    al.free(got[0])
    assert al.alloc(32, 16) is not None


def test_glyph_eviction_keeps_current_frame_regions_valid():
    """Atlas pressure mid-frame must evict only stale entries: regions
    handed out this frame stay valid (no aliasing)."""
    rc = ResourceCache(alpha_atlas_size=(128, 128))
    import matplotlib
    from webrender_tpu.api.font import (FontInstanceKey, FontInstanceOptions,
                                        FontKey)
    font_path = matplotlib.get_data_path() + "/fonts/ttf/DejaVuSans.ttf"
    fk = FontKey(0, 1)
    rc.add_font(fk, path=font_path)
    rc.add_font_instance(FontInstanceKey(0, 1), fk, 20.0,
                         FontInstanceOptions())
    face = rc.fonts.faces[(0, 1)]
    gids = [face.get_char_index(ord(c))
            for c in "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"]

    rc.begin_frame()
    rc.request_glyphs(1, gids[:20])
    rc.begin_frame()  # frame 2: the first frame's glyphs become stale
    out = rc.request_glyphs(1, gids[20:])  # forces eviction on the tiny atlas
    regions = [g.region for g in out.values() if g.region is not None]
    assert regions, "no glyphs rasterized"
    for i in range(len(regions)):
        for j in range(i + 1, len(regions)):
            assert not _overlaps(regions[i], regions[j]), (i, j)


def test_image_oom_clear_and_retry():
    """A scene whose images exceed the color atlas across frames recovers
    by evicting stale entries instead of crashing."""
    rc = ResourceCache(color_atlas_size=(128, 128))
    px = np.zeros((100, 100, 4), np.uint8)
    for key in range(4):
        rc.add_image_template(
            key, ImageDescriptor(ImageFormat.RGBA8, 100, 100),
            ImageData(pixels=px.tobytes() and px))
    rc.begin_frame()
    assert rc.request_image(0) is not None
    rc.begin_frame()
    # image 0 is stale now; allocating image 1 must evict it and succeed
    assert rc.request_image(1) is not None
    rc.begin_frame()
    rc.request_image(2)
    # two 100x100 images cannot coexist in 128x128 — same-frame second
    # request must raise AtlasFullError (consumed by the backend's rebuild)
    try:
        rc.request_image(3)
        raised = False
    except AtlasFullError:
        raised = True
    assert raised


def test_delete_image_frees_region_and_derived_caches():
    rc = ResourceCache(color_atlas_size=(256, 256))
    px = np.zeros((64, 64, 4), np.uint8)
    rc.add_image_template(7, ImageDescriptor(ImageFormat.RGBA8, 64, 64),
                          ImageData(pixels=px))
    rc.begin_frame()
    r1, _ = rc.request_image(7)
    rc.delete_image_template(7)
    # freed space is reusable immediately
    rc.add_image_template(8, ImageDescriptor(ImageFormat.RGBA8, 64, 64),
                          ImageData(pixels=px))
    r2, _ = rc.request_image(8)
    assert (r2.x, r2.y) == (r1.x, r1.y)


def test_readd_image_bumps_generation():
    """delete + re-add under the same key must not serve stale derived
    cache entries (global generation counter)."""
    rc = ResourceCache()
    px = np.zeros((16, 16, 4), np.uint8)
    rc.add_image_template(3, ImageDescriptor(ImageFormat.RGBA8, 16, 16),
                          ImageData(pixels=px))
    g1 = rc.images[3].generation
    rc.delete_image_template(3)
    rc.add_image_template(3, ImageDescriptor(ImageFormat.RGBA8, 16, 16),
                          ImageData(pixels=px))
    assert rc.images[3].generation > g1


def test_frame_atlas_grows_past_soft_height():
    fa = FrameAtlas(512, 256)
    regions = [fa.alloc(512, 128) for _ in range(4)]  # 512 rows > soft 256
    assert fa.used_height == 512
    assert all(r is not None for r in regions)
    try:
        while True:
            fa.alloc(512, 512)
    except AtlasFullError:
        pass  # hard cap reached


def test_crop_cache_bounded_per_key():
    """Scrolling over a huge image must not leak crop regions without bound
    (the round-1 'color atlas full (crop)' crash path)."""
    rc = ResourceCache(color_atlas_size=(2048, 2048))
    w = h = 4000  # over MAX_DIRECT_DIM → sub-rect residency path
    px = np.zeros((h, w, 4), np.uint8)
    rc.add_image_template(1, ImageDescriptor(ImageFormat.RGBA8, w, h),
                          ImageData(pixels=px))
    for frame in range(12):
        rc.begin_frame()
        y = frame * 300
        assert rc.request_image_sub(1, (0, y, 600, y + 400)) is not None
    mine = [k for k in rc._crop_cache if k[0] == 1]
    assert len(mine) <= 5


def test_frame_atlas_aliasing_reuses_released_regions():
    """render_task_graph.rs:800 assign_free_pass role: released regions are
    reused by later allocations instead of growing the atlas."""
    fa = FrameAtlas(2048, 2048)
    a = fa.alloc(512, 512)
    b = fa.alloc(512, 512)
    fa.free(a)
    c = fa.alloc(512, 512)
    assert (c.x, c.y) == (a.x, a.y)  # reused, not bumped
    fa.free(c)
    fa.free(c)  # idempotent double-free is a no-op
    d = fa.alloc(500, 500)  # smaller alloc fits the released slot
    assert (d.x, d.y) == (a.x, a.y)
    assert b is not None


def test_many_blurred_surfaces_stay_within_atlas():
    """A scene whose naive per-surface allocations would exceed the frame
    atlas cap renders fine with region aliasing (the round-1
    'surface atlas full' crash path)."""
    from webrender_tpu.api import (ColorF, CommonItemProperties,
                                   DisplayListBuilder, Epoch, PipelineId,
                                   Point2D, Rect, SpatialId, Transaction)
    from webrender_tpu.api.display_item import FilterOp
    from webrender_tpu.render_backend import RenderBackend

    backend = RenderBackend((640, 480))
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 640, 480), root)
    n = 80  # 80 blurred surfaces ~600x400: naive residency >> 16384 rows
    for i in range(n):
        b.push_stacking_context(Point2D(0, 0), root,
                                filters=[FilterOp.blur(3.0, 3.0)])
        b.push_rect(common, Rect(10 + (i % 8) * 70, 10 + (i // 8) * 40,
                                 600, 400),
                    ColorF(0.2, 0.5, 0.8, 0.5))
        b.pop_stacking_context()
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    frame = backend.build_frame()
    assert frame is not None
    img = backend.render_software()
    assert img.shape == (480, 640, 4)


def test_surface_atlas_oom_recovery_ladder():
    """SurfaceAtlasFullError is recoverable: the backend enables emergency
    aliasing + grows the cap and rebuilds (VERDICT r2 #9 — no assert-crash
    reachable from content; renderer/mod.rs:1289 retry role). The recovered
    frame renders identically to one built with an ample cap."""
    from webrender_tpu.api import (ColorF, CommonItemProperties,
                                   DisplayListBuilder, Epoch, PipelineId,
                                   Point2D, Rect, SpatialId, Transaction)
    from webrender_tpu.api.display_item import FilterOp
    from webrender_tpu.render_backend import RenderBackend

    def build(cap):
        backend = RenderBackend((320, 240))
        if cap is not None:
            backend.frame_builder.surface_max_height = cap
        pid = PipelineId(0, 1)
        b = DisplayListBuilder(pid)
        b.begin()
        root = SpatialId.root_scroll_node(pid)
        common = CommonItemProperties(Rect(0, 0, 320, 240), root)
        # nested filter chain: every level holds its source live while the
        # child renders, so a small cap genuinely overflows
        for i in range(6):
            b.push_stacking_context(Point2D(0, 0), root,
                                    filters=[FilterOp.blur(2.0, 2.0)])
        b.push_rect(common, Rect(20, 20, 280, 200),
                    ColorF(0.8, 0.3, 0.1, 1.0))
        for i in range(6):
            b.pop_stacking_context()
        _, dl = b.end()
        txn = Transaction()
        txn.set_root_pipeline(pid)
        txn.set_display_list(Epoch(0), dl)
        txn.generate_frame()
        backend.send_transaction(txn)
        frame = backend.build_frame()
        assert frame is not None
        return backend, backend.render_software()

    b_ref, img_ref = build(None)
    b_small, img_small = build(96)   # tiny cap → must take the ladder
    assert (b_small.profiler.get("surface_atlas_recoveries") or 0) > 0
    assert b_ref.profiler.get("surface_atlas_recoveries") is None
    assert np.array_equal(img_ref, img_small)
