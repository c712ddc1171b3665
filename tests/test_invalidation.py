"""Picture-cache invalidation tests (wrench/src/test_invalidation.rs:47-130
role): verify which tiles re-render across frames via the renderer's
dirty-tile debug info."""
import numpy as np

from webrender_tpu.api import (ColorF, CommonItemProperties, DisplayListBuilder,
                               Epoch, PipelineId, Point2D, Rect, SpatialId,
                               Transaction)
from webrender_tpu.render_backend import RenderBackend


def setup_backend():
    backend = RenderBackend((512, 256))
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    sf = b.define_scroll_frame(root, external_id=7,
                               content_rect=Rect(0, 0, 512, 2000),
                               frame_rect=Rect(0, 0, 512, 256))
    common = CommonItemProperties(Rect(0, 0, 2000, 2000), sf)
    b.push_rect(common, Rect(10, 10, 50, 50), ColorF(1, 0, 0, 1))
    static_common = CommonItemProperties(Rect(0, 0, 2000, 2000), root)
    b.push_rect(static_common, Rect(400, 200, 50, 50), ColorF(0, 0, 1, 1))
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    return backend


def test_composite_nop_zero_dirty():
    """Re-rendering an unchanged frame invalidates nothing
    (test_invalidation.rs test_composite_nop)."""
    backend = setup_backend()
    img1 = backend.render()
    assert backend.renderer.last_dirty_tiles > 0  # first frame = full render
    img2 = backend.render()
    assert backend.renderer.last_dirty_tiles == 0
    assert np.array_equal(img1, img2)


def test_scroll_rerasters_zero_tiles():
    """A pure scroll of a picture-cache slice re-rasterizes ZERO tiles:
    the content-space tiles remap and recomposite at the new offset
    (tile_cache.rs slices; test_invalidation.rs test_composite_nop class)."""
    backend = setup_backend()
    backend.render()
    assert backend.renderer.slice_debug, "scroll content formed no slice"
    txn = Transaction()
    txn.set_scroll_offsets(7, [Point2D(0, 30)])
    txn.generate_frame()
    backend.send_transaction(txn)
    img = backend.render()
    slice_dirty = [d for d in backend.renderer.slice_debug
                   if d["key"][2] is not None]
    assert slice_dirty and all(d["dirty"] == 0 for d in slice_dirty), \
        backend.renderer.slice_debug
    # the scrolled rect (was y 10..60) moved up by 30 → now y -20..30
    assert tuple(img[15, 30]) == (255, 0, 0, 255)
    assert tuple(img[45, 30]) == (255, 255, 255, 255)  # vacated area cleared
    # static rect untouched
    assert tuple(img[220, 420]) == (0, 0, 255, 255)


def test_scroll_matches_oracle():
    """The sliced cached render equals the oracle's direct multi-pass
    render after scrolling (to the u8 grid)."""
    backend = setup_backend()
    backend.render()
    txn = Transaction()
    txn.set_scroll_offsets(7, [Point2D(0, 30)])
    txn.generate_frame()
    backend.send_transaction(txn)
    img = backend.render()
    ref = backend.render_software()
    diff = np.abs(img.astype(np.int32) - ref.astype(np.int32)).max()
    assert diff <= 1, diff


def test_color_change_invalidates():
    backend = setup_backend()
    backend.render()
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 2000, 2000), root)
    b.push_rect(common, Rect(10, 10, 50, 50), ColorF(0, 1, 0, 1))
    b.push_rect(common, Rect(400, 200, 50, 50), ColorF(0, 0, 1, 1))
    _, dl = b.end()
    txn = Transaction()
    txn.set_display_list(Epoch(1), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    img = backend.render()
    assert tuple(img[30, 30]) == (0, 255, 0, 255)
    assert backend.renderer.last_dirty_tiles > 0


def test_small_prim_move_rerasters_one_tile():
    """picture.rs dependency-diff north star (VERDICT r4 #9): moving a
    10px prim re-rasters <=2 tiles, the dirty rect hugs the move, and the
    profiler reports the rasterized area."""
    from webrender_tpu.util.profiler import Profiler
    PID = PipelineId(0, 1)
    backend = RenderBackend((512, 256))
    backend.renderer.profiler = prof = Profiler()

    def send(x):
        b = DisplayListBuilder(PID)
        b.begin()
        root = SpatialId.root_scroll_node(PID)
        common = CommonItemProperties(Rect(0, 0, 512, 256), root)
        b.push_rect(common, Rect(0, 0, 512, 256), ColorF(1, 1, 1, 1))
        b.push_rect(common, Rect(30, 100, 300, 40), ColorF(0, 0.5, 0, 1))
        b.push_rect(common, Rect(x, 30, 10, 10), ColorF(1, 0, 0, 1))
        _, dl = b.end()
        txn = Transaction()
        txn.set_root_pipeline(PID)
        txn.set_display_list(Epoch(0), dl)
        txn.generate_frame()
        backend.send_transaction(txn)

    send(40.0)
    backend.render()
    send(44.0)
    img = backend.render()
    assert 1 <= backend.renderer.last_dirty_tiles <= 2
    x0, y0, x1, y1 = backend.renderer.last_dirty_rect
    assert x0 <= 40 and x1 >= 54 and y0 <= 30 and y1 >= 40
    assert (x1 - x0) <= 2 * 128 and (y1 - y0) <= 2 * 64
    assert prof.get("rendered_picture_tiles") == \
        backend.renderer.last_dirty_tiles
    assert prof.get("rendered_picture_px") <= 2 * 128 * 64
    # pixels are right: the rect really moved
    assert (img[33, 46] == (255, 0, 0, 255)).all()
    assert (img[33, 41] == (255, 255, 255, 255)).all()
