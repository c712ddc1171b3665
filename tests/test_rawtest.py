"""Rawtest-grade API integration tests — the wrench/src/rawtest.rs:128-1435
suite re-expressed against this framework's RenderApi-equivalent surface
(RenderBackend + Transaction).  Each test drives the real pipeline end to
end and asserts on rendered pixels or API behavior."""
import struct

import numpy as np
import pytest

from webrender_tpu.api import (AlphaType, ColorF, CommonItemProperties,
                               DisplayListBuilder, Epoch, ImageData,
                               ImageDescriptor, ImageFormat, ImageRendering,
                               PipelineId, Point2D, Rect, Size2D, SpatialId,
                               Transaction)
from webrender_tpu.render_backend import RenderBackend
from webrender_tpu.resources.resource_cache import CheckerboardBlobHandler

PID = PipelineId(0, 1)


def _render_dl(backend, fill, epoch=0, txn=None):
    b = DisplayListBuilder(PID)
    b.begin()
    root = SpatialId.root_scroll_node(PID)
    common = CommonItemProperties(Rect(0, 0, 4096, 4096), root)
    fill(b, common, root)
    _, dl = b.end()
    txn = txn or Transaction()
    txn.set_root_pipeline(PID)
    txn.set_display_list(Epoch(epoch), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    return backend.render_software()


def _solid_px(w, h, rgba):
    img = np.zeros((h, w, 4), np.uint8)
    img[:] = rgba
    return img


def test_resize_image():
    """rawtest.rs test_resize_image: updating a template with a new size
    re-uploads and renders the new texels."""
    backend = RenderBackend((128, 128))
    txn = Transaction()
    txn.add_image(1, ImageDescriptor(ImageFormat.RGBA8, 64, 64),
                  ImageData(pixels=_solid_px(64, 64, (255, 0, 0, 255))))
    img1 = _render_dl(backend, lambda b, c, r: b.push_image(
        c, Rect(0, 0, 64, 64), ImageRendering.AUTO,
        AlphaType.PREMULTIPLIED_ALPHA, 1), txn=txn)
    assert tuple(img1[10, 10][:3]) == (255, 0, 0)

    txn = Transaction()
    txn.update_image(1, ImageDescriptor(ImageFormat.RGBA8, 128, 128),
                     ImageData(pixels=_solid_px(128, 128, (0, 255, 0, 255))))
    img2 = _render_dl(backend, lambda b, c, r: b.push_image(
        c, Rect(0, 0, 128, 128), ImageRendering.AUTO,
        AlphaType.PREMULTIPLIED_ALPHA, 1), epoch=1, txn=txn)
    assert tuple(img2[10, 10][:3]) == (0, 255, 0)
    assert tuple(img2[120, 120][:3]) == (0, 255, 0)


def test_very_large_image_sub_rect():
    """rawtest.rs retained_blob / very_large_blob: an image bigger than the
    atlas renders via visible-sub-rect residency."""
    backend = RenderBackend((256, 128))
    w = h = 5000
    px = np.zeros((h, w, 4), np.uint8)
    px[..., 1] = 200
    px[..., 3] = 255
    px[:100, :100, 0] = 255  # distinct corner
    txn = Transaction()
    txn.add_image(2, ImageDescriptor(ImageFormat.RGBA8, w, h),
                  ImageData(pixels=px))
    img = _render_dl(backend, lambda b, c, r: b.push_image(
        c, Rect(0, 0, w, h), ImageRendering.AUTO,
        AlphaType.PREMULTIPLIED_ALPHA, 2), txn=txn)
    assert tuple(img[60, 60][:3]) == (255, 200, 0)
    assert tuple(img[120, 200][:3]) == (0, 200, 0)


def test_blob_rasterization_and_update():
    """rawtest.rs blob tests: a blob image rasterizes through the handler;
    updating the blob bytes re-rasterizes."""
    backend = RenderBackend((96, 96))
    backend.resources.set_blob_image_handler(CheckerboardBlobHandler())
    txn = Transaction()
    txn.add_blob_image(7, ImageDescriptor(ImageFormat.RGBA8, 64, 64),
                       struct.pack("<iBBB", 16, 255, 0, 0))
    img = _render_dl(backend, lambda b, c, r: b.push_image(
        c, Rect(0, 0, 64, 64), ImageRendering.AUTO,
        AlphaType.PREMULTIPLIED_ALPHA, 7), txn=txn)
    # checkerboard: (0,0) tile is white, next tile colored
    assert tuple(img[8, 8][:3]) == (255, 255, 255)
    assert tuple(img[8, 24][:3]) == (255, 0, 0)

    txn = Transaction()
    txn.update_image(7, ImageDescriptor(ImageFormat.RGBA8, 64, 64),
                     ImageData(blob=struct.pack("<iBBB", 16, 0, 0, 255)))
    img2 = _render_dl(backend, lambda b, c, r: b.push_image(
        c, Rect(0, 0, 64, 64), ImageRendering.AUTO,
        AlphaType.PREMULTIPLIED_ALPHA, 7), epoch=1, txn=txn)
    assert tuple(img2[8, 24][:3]) == (0, 0, 255)


def test_zero_height_window():
    """rawtest.rs test_zero_height_window: degenerate framebuffer must not
    crash the pipeline."""
    backend = RenderBackend((128, 0))
    b = DisplayListBuilder(PID)
    b.begin()
    root = SpatialId.root_scroll_node(PID)
    b.push_rect(CommonItemProperties(Rect(0, 0, 128, 0), root),
                Rect(0, 0, 100, 100), ColorF(1, 0, 0, 1))
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(PID)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    frame = backend.build_frame()
    assert frame is not None  # no crash is the test


def test_clear_caches_and_rerender():
    """rawtest.rs test_clear_cache: after a full cache clear the next frame
    re-uploads everything and renders identically."""
    backend = RenderBackend((96, 96))
    txn = Transaction()
    txn.add_image(3, ImageDescriptor(ImageFormat.RGBA8, 48, 48),
                  ImageData(pixels=_solid_px(48, 48, (10, 20, 200, 255))))
    fill = lambda b, c, r: b.push_image(  # noqa: E731
        c, Rect(8, 8, 48, 48), ImageRendering.AUTO,
        AlphaType.PREMULTIPLIED_ALPHA, 3)
    img1 = _render_dl(backend, fill, txn=txn)
    backend.resources.memory_pressure()
    img2 = _render_dl(backend, fill, epoch=1)
    assert np.array_equal(img1, img2)


def test_capture_roundtrip(tmp_path):
    """rawtest.rs test_capture (:1200): save a capture, load it, re-render
    and compare pixels."""
    from webrender_tpu.util.capture import load_capture, save_capture
    backend = RenderBackend((128, 96))
    img1 = _render_dl(backend, lambda b, c, r: (
        b.push_rect(c, Rect(4, 4, 64, 40), ColorF(0.2, 0.5, 0.8, 1.0)),
        b.push_rect(c, Rect(30, 30, 64, 40), ColorF(0.9, 0.4, 0.1, 0.7))))
    root = str(tmp_path / "capture")
    save_capture(backend, root)
    loaded = load_capture(root)
    img2 = loaded.render_software()
    assert np.array_equal(img1, img2)


def test_hit_test_through_stack():
    """rawtest.rs test_hit_test (:1312): top-most item wins; clips exclude
    outside points."""
    backend = RenderBackend((256, 256))
    b = DisplayListBuilder(PID)
    b.begin()
    root = SpatialId.root_scroll_node(PID)
    from webrender_tpu.api.display_item import PrimitiveFlags
    b.push_hit_test(Rect(10, 10, 100, 100), None, root,
                    PrimitiveFlags.IS_BACKFACE_VISIBLE, (1, 1))
    b.push_hit_test(Rect(50, 50, 100, 100), None, root,
                    PrimitiveFlags.IS_BACKFACE_VISIBLE, (2, 2))
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(PID)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    hits = backend.hit_test(Point2D(60, 60))
    assert hits and hits[0].tag == (2, 2)
    hits = backend.hit_test(Point2D(20, 20))
    assert hits and hits[0].tag == (1, 1)
    assert backend.hit_test(Point2D(200, 200)) == []


def test_blur_stability_across_frames():
    """rawtest.rs test_blur_cache: the same blurred content renders
    identically frame over frame."""
    from webrender_tpu.api.display_item import FilterOp
    backend = RenderBackend((128, 128))

    def fill(b, c, r):
        b.push_stacking_context(Point2D(0, 0), r,
                                filters=[FilterOp.blur(3.0, 3.0)])
        b.push_rect(c, Rect(30, 30, 60, 60), ColorF(0.8, 0.1, 0.2, 1.0))
        b.pop_stacking_context()
    img1 = _render_dl(backend, fill)
    img2 = _render_dl(backend, fill, epoch=1)
    assert np.array_equal(img1, img2)


def test_tile_decomposition_repeating_image():
    """rawtest.rs test_tile_decomposition: repeating images with spacing."""
    backend = RenderBackend((200, 120))
    txn = Transaction()
    txn.add_image(9, ImageDescriptor(ImageFormat.RGBA8, 16, 16),
                  ImageData(pixels=_solid_px(16, 16, (200, 30, 30, 255))))
    img = _render_dl(backend, lambda b, c, r: b.push_repeating_image(
        c, Rect(0, 0, 200, 120), Size2D(16, 16), Size2D(16, 16),
        ImageRendering.AUTO, AlphaType.PREMULTIPLIED_ALPHA, 9), txn=txn)
    # tiles at 32px period: texel inside first tile colored, gap white
    assert tuple(img[8, 8][:3]) == (200, 30, 30)
    assert tuple(img[8, 24][:3]) == (255, 255, 255)
    assert tuple(img[8, 40][:3]) == (200, 30, 30)


def test_save_restore_display_list():
    """rawtest.rs test_save_restore: builder save/restore drops pushed
    items after a restore."""
    backend = RenderBackend((96, 96))

    def fill(b, c, r):
        b.push_rect(c, Rect(0, 0, 96, 96), ColorF(1, 1, 1, 1))
        b.save()
        b.push_rect(c, Rect(0, 0, 50, 50), ColorF(1, 0, 0, 1))
        b.restore()  # red rect must vanish
        b.push_rect(c, Rect(60, 60, 20, 20), ColorF(0, 0, 1, 1))
    img = _render_dl(backend, fill)
    assert tuple(img[10, 10][:3]) == (255, 255, 255)
    assert tuple(img[65, 65][:3]) == (0, 0, 255)


def test_external_image_lock_unlock_and_refresh():
    """image.rs ImageData::External + renderer ExternalImageHandler: the
    handler is locked each frame, texels re-upload when its generation
    changes, and every lock is unlocked after frame build."""
    import numpy as np
    from webrender_tpu.api import (CommonItemProperties, DisplayListBuilder,
                                   Epoch, PipelineId, Rect, SpatialId,
                                   Transaction)
    from webrender_tpu.api.display_item import AlphaType, ImageRendering
    from webrender_tpu.api.image import (ExternalImage, ExternalImageData,
                                         ExternalImageHandler,
                                         ExternalImageId, ImageData,
                                         ImageDescriptor, ImageFormat)
    from webrender_tpu.render_backend import RenderBackend

    class Handler(ExternalImageHandler):
        def __init__(self):
            self.pixels = np.zeros((8, 8, 4), np.uint8)
            self.pixels[..., 0] = 255
            self.pixels[..., 3] = 255
            self.gen = 1
            self.locks = 0
            self.unlocks = 0

        def lock(self, id, channel_index):
            self.locks += 1
            return ExternalImage(pixels=self.pixels, generation=self.gen)

        def unlock(self, id, channel_index):
            self.unlocks += 1

    backend = RenderBackend((64, 64))
    handler = Handler()
    backend.resources.set_external_image_handler(handler)
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 64, 64), root)
    b.push_image(common, Rect(0, 0, 64, 64), ImageRendering.AUTO,
                 AlphaType.PREMULTIPLIED_ALPHA, 7)
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.add_image(7, ImageDescriptor(ImageFormat.RGBA8, 8, 8),
                  ImageData(external=ExternalImageData(ExternalImageId(42))))
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    img1 = backend.render_software()
    assert (img1[32, 32] == [255, 0, 0, 255]).all()
    assert handler.locks == 1 and handler.unlocks == 1

    # mutate the external texels + bump the generation: the next frame
    # re-uploads without any transaction
    handler.pixels = handler.pixels.copy()
    handler.pixels[..., 0] = 0
    handler.pixels[..., 1] = 255
    handler.gen = 2
    txn2 = Transaction()
    txn2.generate_frame()
    backend.send_transaction(txn2)
    img2 = backend.render_software()
    assert (img2[32, 32] == [0, 255, 0, 255]).all()
    assert handler.locks == 2 and handler.unlocks == 2


def test_reuse_items_across_epochs():
    """display_item_cache.rs end-to-end: epoch 0 retains an item group
    (start/finish_item_group); epoch 1 sends a display list WITHOUT the
    items, splicing them back with push_reuse_items — identical pixels,
    and the second list carries no retained payload."""
    backend = RenderBackend((96, 64))
    keys = {}

    def fill0(b, common, root):
        b.push_rect(common, Rect(0, 0, 96, 64), ColorF(1, 1, 1, 1))
        b.start_item_group()
        b.push_rect(common, Rect(8, 8, 40, 24), ColorF(1, 0, 0, 1))
        b.push_rect(common, Rect(20, 20, 40, 24), ColorF(0, 0, 1, 0.5))
        keys["k"] = b.finish_item_group()

    img0 = _render_dl(backend, fill0, epoch=0)
    assert keys["k"] is not None

    def fill1(b, common, root):
        b.push_rect(common, Rect(0, 0, 96, 64), ColorF(1, 1, 1, 1))
        b.push_reuse_items(keys["k"])

    img1 = _render_dl(backend, fill1, epoch=1)
    assert (img0 == img1).all()
    # and the reused epoch's list really is smaller (no retained payload)
    dl1 = backend.scene.pipelines[(PID.namespace, PID.id)]
    assert not dl1.cache_data


def test_reuse_items_missing_group_fails_loudly():
    """A ReuseItems key with no retained group is a scene-builder error,
    not silent corruption."""
    backend = RenderBackend((32, 32))
    with pytest.raises(Exception):
        _render_dl(backend, lambda b, c, r: b.push_reuse_items(12345),
                   epoch=0)


def test_async_screenshot_grabber():
    """screen_capture.rs AsyncScreenshotGrabber: request (non-blocking
    device-side crop/scale) then map later; matches the sync path."""
    backend = RenderBackend((64, 48))
    _render_dl(backend, lambda b, c, r: b.push_rect(
        c, Rect(0, 0, 64, 48), ColorF(0.2, 0.5, 0.8, 1.0)))
    backend.render()  # device render populates last_framebuffer
    r = backend.renderer
    h1 = r.request_screenshot(rect=(8, 8, 32, 16))
    h2 = r.request_screenshot(rect=(0, 0, 64, 48), size=(32, 24))
    a = r.map_screenshot(h1)
    assert a is not None and a.shape == (16, 32, 4)
    sync = r.get_screenshot(rect=(8, 8, 32, 16))
    assert (a == sync).all()
    b2 = r.map_screenshot(h2)
    assert b2 is not None and b2.shape == (24, 32, 4)
    assert r.map_screenshot(h1) is None  # handle recycled


def test_blob_visible_area():
    """rawtest.rs test_blob_visible_area: only the visible window of a
    blob rasterizes — content outside it is blank; the handler sees the
    window offset so the pattern stays in absolute blob coordinates."""
    backend = RenderBackend((96, 96))
    backend.resources.set_blob_image_handler(CheckerboardBlobHandler())
    txn = Transaction()
    txn.add_blob_image(9, ImageDescriptor(ImageFormat.RGBA8, 96, 96),
                       struct.pack("<iBBB", 16, 255, 0, 0))
    txn.set_blob_image_visible_area(9, (16, 16, 80, 80))
    img = _render_dl(backend, lambda b, c, r: b.push_image(
        c, Rect(0, 0, 96, 96), ImageRendering.AUTO,
        AlphaType.PREMULTIPLIED_ALPHA, 9), txn=txn)
    # inside the area: checkerboard in ABSOLUTE coords — tile (1,1) is
    # even parity (white), tile (2,1) odd (colored)
    assert tuple(img[24, 24][:3]) == (255, 255, 255)
    assert tuple(img[24, 40][:3]) == (255, 0, 0)
    # outside the area: the blob is transparent (the white document
    # backdrop shows through) — tile (1,0) would be colored if the
    # window weren't limiting rasterization
    assert tuple(img[8, 24][:3]) == (255, 255, 255)
    assert tuple(img[90, 90][:3]) == (255, 255, 255)


def test_blob_set_visible_area():
    """rawtest.rs test_blob_set_visible_area: moving the window
    re-rasterizes the new area (and only it)."""
    backend = RenderBackend((96, 96))
    backend.resources.set_blob_image_handler(CheckerboardBlobHandler())
    txn = Transaction()
    txn.add_blob_image(9, ImageDescriptor(ImageFormat.RGBA8, 96, 96),
                       struct.pack("<iBBB", 16, 0, 200, 0))
    txn.set_blob_image_visible_area(9, (0, 0, 48, 48))
    img = _render_dl(backend, lambda b, c, r: b.push_image(
        c, Rect(0, 0, 96, 96), ImageRendering.AUTO,
        AlphaType.PREMULTIPLIED_ALPHA, 9), txn=txn)
    assert tuple(img[8, 8][:3]) == (255, 255, 255)
    assert tuple(img[8, 24][:3]) == (0, 200, 0)    # inside window, odd tile
    assert tuple(img[80, 72][:3]) == (255, 255, 255)  # outside: backdrop
    txn = Transaction()
    txn.set_blob_image_visible_area(9, (48, 48, 96, 96))
    img2 = _render_dl(backend, lambda b, c, r: b.push_image(
        c, Rect(0, 0, 96, 96), ImageRendering.AUTO,
        AlphaType.PREMULTIPLIED_ALPHA, 9), epoch=1, txn=txn)
    # old window now blank (backdrop), incl. the previously-colored tile
    assert tuple(img2[8, 24][:3]) == (255, 255, 255)
    # absolute parity inside the new window: tile (4,5) odd -> colored
    assert tuple(img2[80, 72][:3]) == (0, 200, 0)


def test_retained_blob_update_without_new_display_list():
    """rawtest.rs test_blob_update_epoch_test essence: updating only the
    blob resource (no new display list) must invalidate the retained
    frame and show the new raster."""
    backend = RenderBackend((64, 64))
    backend.resources.set_blob_image_handler(CheckerboardBlobHandler())
    txn = Transaction()
    txn.add_blob_image(4, ImageDescriptor(ImageFormat.RGBA8, 64, 64),
                       struct.pack("<iBBB", 16, 255, 0, 0))
    img = _render_dl(backend, lambda b, c, r: b.push_image(
        c, Rect(0, 0, 64, 64), ImageRendering.AUTO,
        AlphaType.PREMULTIPLIED_ALPHA, 4), txn=txn)
    assert tuple(img[8, 24][:3]) == (255, 0, 0)
    # resource-only transaction
    txn = Transaction()
    txn.update_image(4, ImageDescriptor(ImageFormat.RGBA8, 64, 64),
                     ImageData(blob=struct.pack("<iBBB", 16, 0, 0, 255)))
    txn.generate_frame()
    backend.send_transaction(txn)
    img2 = backend.render_software()
    assert tuple(img2[8, 24][:3]) == (0, 0, 255)
