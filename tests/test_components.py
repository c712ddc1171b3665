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
