"""Component tests: hit testing, capture/replay, profiler, perf stats
(the reference's rawtest.rs role for API-level integration)."""
import numpy as np
import pytest

from webrender_tpu.api import (ColorF, CommonItemProperties, DisplayListBuilder,
                               Epoch, PipelineId, Point2D, Rect, SpatialId,
                               Transaction, PrimitiveFlags, ROOT_CLIP_CHAIN)
from webrender_tpu.render_backend import RenderBackend


def build_simple(backend, with_hit_test=True):
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 1000, 1000), root)
    b.push_rect(common, Rect(10, 10, 100, 50), ColorF(0, 1, 0, 1))
    if with_hit_test:
        b.push_hit_test(Rect(10, 10, 100, 50), ROOT_CLIP_CHAIN, root,
                        PrimitiveFlags.IS_BACKFACE_VISIBLE, (7, 3))
        b.push_hit_test(Rect(50, 20, 100, 50), ROOT_CLIP_CHAIN, root,
                        PrimitiveFlags.IS_BACKFACE_VISIBLE, (9, 1))
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)


def test_hit_test():
    backend = RenderBackend((256, 128))
    build_simple(backend)
    hits = backend.hit_test(Point2D(60, 30))
    assert [h.tag for h in hits] == [(9, 1), (7, 3)]  # front-to-back
    assert backend.hit_test(Point2D(5, 5)) == []
    only_first = backend.hit_test(Point2D(20, 15))
    assert [h.tag for h in only_first] == [(7, 3)]
    assert only_first[0].point_relative_to_item.x == pytest.approx(10.0)


def test_capture_replay(tmp_path):
    backend = RenderBackend((256, 128))
    build_simple(backend, with_hit_test=False)
    img1 = backend.render_software()
    backend.save_capture(str(tmp_path / "cap"))
    from webrender_tpu.util.capture import load_capture
    restored = load_capture(str(tmp_path / "cap"))
    img2 = restored.render_software()
    assert np.array_equal(img1, img2)


def test_profiler_counters():
    backend = RenderBackend((256, 128))
    build_simple(backend, with_hit_test=False)
    backend.render_software()
    assert backend.profiler.stats("scene_build_time") is not None
    assert backend.profiler.stats("frame_build_time") is not None
    report = backend.profiler.report()
    assert "frame_build_time" in report


def test_profiler_breadth_presets_and_reasons():
    """profiler.rs:118-289 counter registry, :55-105 UI presets with
    nested expansion, :244-261 render-reason events."""
    from webrender_tpu.api.transaction import RenderReasons
    from webrender_tpu.util.profiler import (COUNTERS, PROFILER_PRESETS,
                                             Profiler)
    assert len(COUNTERS) >= 130          # ~141 in profiler.rs
    assert "Default" in PROFILER_PRESETS and "Render reasons" in \
        PROFILER_PRESETS
    backend = RenderBackend((256, 128))
    build_simple(backend, with_hit_test=False)
    backend.render_software()
    prof = backend.profiler
    # frame-stat counters are fed from the built frame
    for key in ("color_passes", "visible_primitives", "gpu_buffer_mem",
                "image_templates", "atlas_textures_mem"):
        assert prof.stats(key) is not None, key
    prof.note_render_reasons(int(RenderReasons.SCENE | RenderReasons.APZ))
    assert prof.get("render_reason_scene") == 1.0
    assert prof.get("render_reason_apz") == 1.0
    # nested preset expansion: Default contains Frame times' members
    items = Profiler.expand_preset(PROFILER_PRESETS["Default"])
    labels = [name for style, name in items]
    assert "Frame building" in labels and "GPU" in labels
    rep = prof.preset_report("Frame stats")
    assert "Color passes" in rep


def test_scroll_and_rerender():
    """Scroll offsets change the frame without rebuilding the scene
    (rawtest-style API flow)."""
    backend = RenderBackend((128, 128))
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    sf = b.define_scroll_frame(root, external_id=42,
                               content_rect=Rect(0, 0, 128, 1000),
                               frame_rect=Rect(0, 0, 128, 128))
    common = CommonItemProperties(Rect(0, 0, 1000, 1000), sf)
    b.push_rect(common, Rect(0, 100, 128, 28), ColorF(1, 0, 0, 1))
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    img = backend.render_software()
    assert tuple(img[110, 64]) == (255, 0, 0, 255)
    txn2 = Transaction()
    txn2.set_scroll_offsets(42, [Point2D(0, 100)])
    txn2.generate_frame()
    backend.send_transaction(txn2)
    img = backend.render_software()
    assert tuple(img[5, 64]) == (255, 0, 0, 255)
    assert tuple(img[110, 64]) == (255, 255, 255, 255)


def test_resolved_identity_frame_retention():
    """Scroll offsets that move no node (unknown external id, or re-set
    to the same value) reuse the retained frame; a scroll that moves a
    real subtree rebuilds (gpu_cache.rs epochs role)."""
    backend = RenderBackend((128, 128))
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    sf = b.define_scroll_frame(root, external_id=42,
                               content_rect=Rect(0, 0, 128, 1000),
                               frame_rect=Rect(0, 0, 128, 128))
    common = CommonItemProperties(Rect(0, 0, 1000, 1000), sf)
    b.push_rect(common, Rect(0, 100, 128, 28), ColorF(1, 0, 0, 1))
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    f0 = backend.build_frame()
    # an offset for an id that is not in the spatial tree: resolved
    # transforms are bit-identical → the SAME frame object comes back
    backend.scroll_offsets[999999] = Point2D(0.0, 123.0)
    f1 = backend.build_frame()
    assert f1 is f0
    assert backend.profiler.get("frame_builds_skipped") >= 1.0
    # a real scroll moves the subtree → a fresh build
    backend.scroll_offsets[42] = [(Point2D(0, 50.0), 0)]
    f2 = backend.build_frame()
    assert f2 is not f0
    img = backend.render_software()
    assert tuple(img[55, 64]) == (255, 0, 0, 255)


def test_blob_image():
    """Blob image rasterization via the embedder handler
    (rawtest.rs blob cases / wrench blob.rs)."""
    import struct
    from webrender_tpu.api import (AlphaType, ImageDescriptor, ImageFormat,
                                   ImageRendering)
    from webrender_tpu.resources.resource_cache import CheckerboardBlobHandler
    backend = RenderBackend((128, 128))
    backend.resources.set_blob_image_handler(CheckerboardBlobHandler())
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 1000, 1000), root)
    txn = Transaction()
    blob = struct.pack("<iBBB", 8, 20, 40, 60)
    txn.add_blob_image(55, ImageDescriptor(ImageFormat.RGBA8, 64, 64), blob)
    b.push_image(common, Rect(0, 0, 64, 64), ImageRendering.AUTO,
                 AlphaType.PREMULTIPLIED_ALPHA, 55)
    _, dl = b.end()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    img = backend.render_software()
    assert tuple(img[4, 4]) == (255, 255, 255, 255)     # off cell
    assert tuple(img[4, 12]) == (20, 40, 60, 255)       # on cell


def test_options_and_memory_report():
    from webrender_tpu.util.options import (DebugFlags, WebRenderOptions,
                                            apply_options)
    backend = RenderBackend((64, 64))
    opts = WebRenderOptions(
        debug_flags=DebugFlags.DISABLE_PICTURE_CACHING)
    apply_options(backend, opts)
    assert backend.renderer.picture_caching is False
    report = backend.resources.memory_report()
    assert report["color_atlas"] > 0


def test_occlusion_culling():
    """Instances fully under an opaque solid are dropped from the tile lists
    (rectangle_occlusion.rs role) without changing pixels."""
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 1000, 1000), root)
    # ten hidden rects, then one opaque cover
    for i in range(10):
        b.push_rect(common, Rect(0, 0, 400, 300), ColorF(1, 0, 0, 1))
    b.push_rect(common, Rect(0, 0, 400, 300), ColorF(0, 0, 1, 1))
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend = RenderBackend((400, 300))
    backend.send_transaction(txn)
    frame = backend.build_frame()
    p = frame.passes[-1]
    # interior tiles keep only the cover (edge tiles keep everything:
    # the opaque rect is shrunk by the 1px AA margin)
    counts = (p.tile_insts >= 0).sum(1)
    assert counts.min() == 1 and (counts == 1).sum() >= 4, counts
    img = backend.render_software()
    assert tuple(img[150, 200]) == (0, 0, 255, 255)


def test_debug_overlay():
    from webrender_tpu.util.options import (WebRenderOptions, DebugFlags,
                                            apply_options)
    backend = RenderBackend((256, 128))
    apply_options(backend, WebRenderOptions(
        debug_flags=DebugFlags.PROFILER_DBG, use_pallas_kernels=False))
    build_simple(backend, with_hit_test=False)
    img = backend.render()
    # overlay text rendered in the top-left corner
    assert (img[:40, :250, 1] > 200).any()


def test_display_list_serialization():
    """peek-poke role: built display lists round-trip through flat bytes
    bit-exactly (api/serialize.py)."""
    from webrender_tpu.api.serialize import (serialize_display_list,
                                             deserialize_display_list)
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 1000, 1000), root)
    b.push_rect(common, Rect(10, 10, 100, 50), ColorF(0, 1, 0, 0.5))
    b.push_hit_test(Rect(10, 10, 100, 50), ROOT_CLIP_CHAIN, root,
                    PrimitiveFlags.IS_BACKFACE_VISIBLE, (7, 3))
    _, dl = b.end()
    blob = serialize_display_list(dl)
    dl2 = deserialize_display_list(blob)
    assert len(dl2.items) == len(dl.items)
    assert dl2.items[0] == dl.items[0]


def test_multi_document_and_screenshot():
    from webrender_tpu.render_backend import MultiDocumentBackend
    from webrender_tpu.api.transaction import DocumentId
    host = MultiDocumentBackend()
    host.renderer.use_pallas = False
    did = DocumentId(0, 7)
    host.add_document(did, (64, 64))
    pid = PipelineId(0, 9)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    b.push_rect(CommonItemProperties(Rect(0, 0, 64, 64), root),
                Rect(0, 0, 64, 64), ColorF(1, 0, 0, 1))
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    host.send_transaction(did, txn)
    img = host.render(did)
    assert tuple(img[32, 32]) == (255, 0, 0, 255)
    shot = host.renderer.get_screenshot((0, 0, 64, 64), (16, 16))
    assert shot.shape == (16, 16, 4)
    assert tuple(shot[8, 8]) == (255, 0, 0, 255)


def test_compositor_trait():
    from webrender_tpu.renderer.compositor import DrawCompositor, SwCompositor
    for cls in (DrawCompositor, SwCompositor):
        c = cls()
        c.create_surface(1, (32, 32), is_opaque=True)
        tile = np.zeros((32, 32, 4), np.uint8)
        tile[..., 1] = 255
        tile[..., 3] = 255
        c.set_tile(1, 0, 0, tile)
        c.set_tile(1, 1, 0, tile)
        c.add_surface(1, (0, 0))
        out = c.composite((64, 32))
        assert tuple(out[16, 48]) == (0, 255, 0, 255)


def test_compositor_partial_present():
    """composite.rs:1195-1294 tile invalidation protocol +
    PartialPresentCompositor (:1366): after the first full composite,
    only invalidated tiles re-composite and the damage region is
    reported for buffer-age style presentation."""
    from webrender_tpu.renderer.compositor import DrawCompositor
    c = DrawCompositor()
    c.create_surface(1, (32, 32), is_opaque=True)
    green = np.zeros((32, 32, 4), np.uint8)
    green[..., 1] = 255
    green[..., 3] = 255
    red = np.zeros((32, 32, 4), np.uint8)
    red[..., 0] = 255
    red[..., 3] = 255
    c.set_tile(1, 0, 0, green)
    c.set_tile(1, 1, 0, green)
    c.begin_frame()
    c.add_surface(1, (0, 0))
    c.start_compositing(None)
    out1 = c.composite((64, 32))
    c.end_frame()
    assert c.buffer_damage_region == [(0, 0, 64, 32)]
    # frame 2: only tile (1,0) changes
    c.invalidate_tile(1, 1, 0)
    c.set_tile(1, 1, 0, red)
    c.begin_frame()
    c.add_surface(1, (0, 0))
    out2 = c.composite((64, 32))
    c.end_frame()
    assert tuple(out2[16, 16]) == (0, 255, 0, 255)
    assert tuple(out2[16, 48]) == (255, 0, 0, 255)
    # damage is confined to the right tile
    assert all(x0 >= 32 for (x0, _, _, _) in c.buffer_damage_region)
    # frame 3: explicit dirty rects via start_compositing
    c.set_tile(1, 0, 0, red)
    c.begin_frame()
    c.add_surface(1, (0, 0))
    c.start_compositing([(0, 0, 32, 32)])
    out3 = c.composite((64, 32))
    assert tuple(out3[16, 16]) == (255, 0, 0, 255)
    assert c.buffer_damage_region == [(0, 0, 32, 32)]
    # unchanged frame: empty damage, retained buffer comes back
    c.begin_frame()
    c.add_surface(1, (0, 0))
    out4 = c.composite((64, 32))
    assert c.buffer_damage_region == []
    assert np.array_equal(out3, out4)


def test_per_pass_gpu_timers():
    """query_gl.rs GpuProfiler analog: under GPU_TIME_QUERIES every pass
    records a (label, device ms) sample and the profiler gpu_time counter
    aggregates them."""
    from webrender_tpu.api import (ColorF, CommonItemProperties,
                                   DisplayListBuilder, Epoch, PipelineId,
                                   Point2D, Rect, SpatialId, Transaction)
    from webrender_tpu.api.display_item import FilterOp
    from webrender_tpu.render_backend import RenderBackend
    from webrender_tpu.util.options import DebugFlags
    from webrender_tpu.util.profiler import Profiler

    backend = RenderBackend((128, 96))
    backend.renderer.debug_flags |= DebugFlags.GPU_TIME_QUERIES
    backend.renderer.profiler = Profiler()
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 128, 96), root)
    b.push_stacking_context(Point2D(0, 0), root,
                            filters=[FilterOp.blur(2.0, 2.0)])
    b.push_rect(common, Rect(8, 8, 60, 40), ColorF(1, 0, 0, 1))
    b.pop_stacking_context()
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    backend.render()
    labels = [n for n, _ in backend.renderer.gpu_timers]
    assert "raster" in labels and "blur_h" in labels and "blur_v" in labels
    assert all(ms >= 0.0 for _, ms in backend.renderer.gpu_timers)
    assert (backend.renderer.profiler.get("gpu_time") or 0.0) > 0.0


def test_print_tree_and_crash_annotator():
    """print_tree.rs PrintTree + lib.rs CrashAnnotator plumbing."""
    from webrender_tpu.api import (ColorF, CommonItemProperties,
                                   DisplayListBuilder, Epoch, PipelineId,
                                   Point2D, Rect, SpatialId, Transaction)
    from webrender_tpu.api.crash_annotator import (CrashAnnotation,
                                                   CrashAnnotator)
    from webrender_tpu.api.display_item import FilterOp
    from webrender_tpu.render_backend import RenderBackend
    from webrender_tpu.util.print_tree import (PrintTree, print_scene,
                                               print_spatial_tree)

    pt = PrintTree("demo")
    pt.new_level("root")
    pt.add_item("leaf a")
    pt.add_item("leaf b")
    pt.end_level()
    txt = pt.text()
    assert "demo" in txt and "leaf a" in txt and "└─ leaf b" in txt

    backend = RenderBackend((64, 64))
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 64, 64), root)
    b.push_stacking_context(Point2D(0, 0), root,
                            filters=[FilterOp.opacity(0.5)])
    b.push_rect(common, Rect(0, 0, 32, 32), ColorF(1, 0, 0, 1))
    b.pop_stacking_context()
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)

    events = []

    class Annot(CrashAnnotator):
        def set(self, annotation, value):
            events.append(("set", annotation, value))

        def clear(self, annotation):
            events.append(("clear", annotation))

    backend.renderer.crash_annotator = Annot()
    backend.render_software()  # oracle path: no annotations expected
    backend.render()
    assert any(e[0] == "set" and e[1] == CrashAnnotation.DRAW_SHADER
               for e in events)
    assert any(e[0] == "clear" for e in events)

    st = print_spatial_tree(backend.built_scene.spatial_tree)
    assert "spatial tree" in st
    sc = print_scene(backend.built_scene)
    assert "picture" in sc and "RectanglePrim" in sc


def test_huge_image_resample_matches_direct():
    """The device-resolution host resample of a huge image produces the
    same pixels as full direct residency (image_tiling.rs role)."""
    import numpy as np
    from webrender_tpu.api import (CommonItemProperties, DisplayListBuilder,
                                   Epoch, PipelineId, Rect, SpatialId,
                                   Transaction)
    from webrender_tpu.api.display_item import AlphaType, ImageRendering
    from webrender_tpu.api.image import (ImageData, ImageDescriptor,
                                         ImageFormat)
    from webrender_tpu.render_backend import RenderBackend

    rng = np.random.RandomState(11)
    px = (rng.rand(600, 700, 4) * 255).astype(np.uint8)
    px[..., 3] = 255

    def render(limit):
        backend = RenderBackend((256, 200))
        backend.resources.MAX_DIRECT_DIM = limit
        pid = PipelineId(0, 1)
        b = DisplayListBuilder(pid)
        b.begin()
        root = SpatialId.root_scroll_node(pid)
        common = CommonItemProperties(Rect(0, 0, 256, 200), root)
        b.push_image(common, Rect(5, 3, 240, 190), ImageRendering.AUTO,
                     AlphaType.PREMULTIPLIED_ALPHA, 5)
        _, dl = b.end()
        txn = Transaction()
        txn.set_root_pipeline(pid)
        txn.add_image(5, ImageDescriptor(ImageFormat.RGBA8, 700, 600),
                      ImageData(pixels=px))
        txn.set_display_list(Epoch(0), dl)
        txn.generate_frame()
        backend.send_transaction(txn)
        return backend.render_software()

    direct = render(2048)     # fully resident
    resampled = render(256)   # forces the host pre-resample path
    assert np.abs(direct.astype(int) - resampled.astype(int)).max() <= 1


def test_near_plane_crossing_rect_bounds():
    """A rect crossing w=0 projects unbounded: device bounds return the
    huge box instead of sign-flipped garbage (split/near-plane)."""
    import numpy as np
    from webrender_tpu.frame.transforms import (device_bounds_of_rect,
                                                device_bounds_of_rects)
    # H maps y -> w: w = 1 - y/100 (row-vector form; crosses w=0 at y=100)
    H = np.array([[1.0, 0.0, 0.0],
                  [0.0, 1.0, -0.01],
                  [0.0, 0.0, 1.0]])
    bb = device_bounds_of_rect(H, 0, 0, 10, 200)
    assert bb[0] <= -1e6 and bb[3] >= 1e6
    bbs = device_bounds_of_rects(H, np.array([[0, 0, 10, 200],
                                              [0, 0, 10, 50.0]]))
    assert bbs[0, 2] >= 1e6          # crossing rect → unbounded
    assert abs(bbs[1, 2]) < 1e4      # fully in front → finite


def test_text_frame_offset_snapping_equivalence():
    """text_run.rs snapped_reference_frame_relative_offset: a fractional
    SC origin and an equal fractional translate land glyphs identically."""
    import numpy as np
    from webrender_tpu.api import (ColorF, CommonItemProperties,
                                   DisplayListBuilder, Epoch, PipelineId,
                                   Point2D, Rect, SpatialId, Transaction)
    from webrender_tpu.api.font import (FontInstanceKey, FontInstanceOptions,
                                        FontKey)
    from webrender_tpu.api.units import Transform
    from webrender_tpu.render_backend import RenderBackend

    font_path = "/root/reference/wrench/reftests/text/FreeSans.ttf"

    def render(sc_origin, translate):
        backend = RenderBackend((200, 60))
        pid = PipelineId(0, 1)
        b = DisplayListBuilder(pid)
        b.begin()
        root = SpatialId.root_scroll_node(pid)
        spatial = root
        if translate:
            spatial = b.push_reference_frame(
                Point2D(0, 0), root, None,
                Transform.translation(translate[0], translate[1]), None)
        common = CommonItemProperties(Rect(0, 0, 200, 60), spatial)
        b.push_stacking_context(Point2D(*sc_origin), spatial)
        glyphs = [(40 + i, 10.0 + i * 14.0, 30.0) for i in range(6)]
        b.push_text(common, Rect(0, 0, 200, 60), glyphs, 1,
                    ColorF(0, 0, 0, 1))
        b.pop_stacking_context()
        _, dl = b.end()
        txn = Transaction()
        txn.set_root_pipeline(pid)
        fk = FontKey(0, 1)
        txn.add_native_font(fk, font_path)
        txn.add_font_instance(FontInstanceKey(0, 1), fk, 20.0,
                              FontInstanceOptions())
        txn.set_display_list(Epoch(0), dl)
        txn.generate_frame()
        backend.send_transaction(txn)
        return backend.render_software()

    a = render((0.5, 0.5), None)
    b_ = render((0.0, 0.0), (0.5, 0.5))
    assert np.array_equal(a, b_)


def test_frame_retention_epochs():
    """gpu_cache.rs:5-25 epoch role: identical inputs reuse the built frame
    outright; any scene / resource / scroll / property mutation rebuilds."""
    from webrender_tpu.api.units import Transform
    backend = RenderBackend((256, 128))
    build_simple(backend, with_hit_test=False)
    f1 = backend.build_frame()
    f2 = backend.build_frame()
    assert f2 is f1, "unchanged inputs must reuse the retained frame"
    assert (backend.profiler.get("frame_builds_skipped") or 0) >= 1

    # scroll of an id that moves no node → resolved transforms are
    # identical → retained (see test_resolved_identity_frame_retention
    # for the real-subtree rebuild case)
    backend.scroll_offsets[12345] = Point2D(0, 10)
    f3 = backend.build_frame()
    assert f3 is f1
    # animated property change → rebuild
    backend.properties[7] = Transform.translation(1, 2)
    f4 = backend.build_frame()
    assert f4 is not f3
    assert backend.build_frame() is f4

    # resource mutation → rebuild
    from webrender_tpu.api.image import ImageData, ImageDescriptor, ImageFormat
    backend.resources.add_image_template(
        99, ImageDescriptor(ImageFormat.RGBA8, 2, 2),
        ImageData(pixels=np.zeros((2, 2, 4), np.uint8)))
    f5 = backend.build_frame()
    assert f5 is not f4

    # new display list (same content) → scene epoch bump → rebuild
    build_simple(backend, with_hit_test=False)
    f6 = backend.build_frame()
    assert f6 is not f5
