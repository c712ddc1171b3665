"""Scroll-translation fast path (frame_builder._try_scroll_fast_path):
a pure integer-pixel scroll must produce a frame BIT-IDENTICAL to the
full rebuild — the fast path skips prim prepare entirely and patches
transforms/bboxes/clip rows, so equality is the whole correctness story
(spatial_tree.rs scroll update + picture.rs dirty tracking roles)."""
import numpy as np
import pytest

from webrender_tpu.api import (ColorF, CommonItemProperties,
                               DisplayListBuilder, Epoch, GradientStop,
                               PipelineId, Point2D, Rect, SpatialId,
                               Transaction)
from webrender_tpu.api.display_item import ExtendMode, Gradient
from webrender_tpu.render_backend import RenderBackend


def _build_scene(backend, w=640, h=480):
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, w, h), root)
    b.push_rect(common, Rect(0, 0, w, h), ColorF(1, 1, 1, 1))
    # fixed content
    for i in range(8):
        b.push_rect(common, Rect(10 + 40 * i, 10, 40 + 40 * i, 40),
                    ColorF(0.1 * i, 0.3, 0.8, 1.0))
    # a scrollable feed with rects + gradients + a rounded clip
    sf = b.define_scroll_frame(root, 777, Rect(0, 60, w, h),
                               Rect(0, 60, w, 2000))
    sc = CommonItemProperties(Rect(0, 60, w, 2000), sf)
    for i in range(30):
        y = 70 + i * 60
        b.push_rect(sc, Rect(20, y, w - 20, y + 40),
                    ColorF(0.9, 0.9 - 0.01 * i, 0.2, 1.0))
        b.push_gradient(
            sc, Rect(30, y + 5, 200, y + 35),
            Gradient(Point2D(30, y), Point2D(200, y), ExtendMode.CLAMP),
            [GradientStop(0.0, ColorF(1, 0, 0, 1)),
             GradientStop(1.0, ColorF(0, 0, 1, 0.5))])
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(1), dl)
    txn.generate_frame()
    backend.send_transaction(txn)


def _frames_equal(a, b):
    assert np.array_equal(a.f32_buf, b.f32_buf), "f32_buf differs"
    assert np.array_equal(a.instances, b.instances), "instances differ"
    assert np.array_equal(a.transforms, b.transforms), "transforms differ"
    assert np.array_equal(a.inst_bboxes, b.inst_bboxes), "bboxes differ"
    assert a.fb_size == b.fb_size and a.clear_color == b.clear_color
    assert len(a.passes) == len(b.passes), "pass count differs"
    for pa, pb in zip(a.passes, b.passes):
        assert pa.kind == pb.kind and pa.target == pb.target
        assert pa.region == pb.region and pa.origin == pb.origin
        assert pa.clear == pb.clear
        assert np.array_equal(pa.tile_insts, pb.tile_insts), \
            "tile_insts differ"
        assert np.array_equal(pa.inst_order, pb.inst_order)
        assert (pa.tile_hashes is None) == (pb.tile_hashes is None)
        if pa.tile_hashes is not None:
            assert np.array_equal(pa.tile_hashes, pb.tile_hashes)
        assert pa.slice_key == pb.slice_key
        assert pa.slice_delta == pb.slice_delta
        if pa.cache_insts is not None:
            assert np.array_equal(pa.cache_insts, pb.cache_insts)
            assert np.array_equal(pa.cache_hashes, pb.cache_hashes)
            assert pa.cache_anchor == pb.cache_anchor


def _full_rebuild(backend):
    """Ground truth: a fresh builder (no fast-path state) over the same
    inputs."""
    from webrender_tpu.frame.frame_builder import FrameBuilder
    fb = FrameBuilder(surface_atlas_size=backend.frame_builder
                      .surface_atlas_size)
    fb.gl_flavor = backend.frame_builder.gl_flavor
    return fb.build(backend.built_scene, backend.resources,
                    backend.device_size, backend.dpr,
                    scroll_offsets=backend.scroll_offsets,
                    properties=backend.properties)


def test_scroll_fast_path_bit_identical():
    backend = RenderBackend((640, 480))
    _build_scene(backend)
    f0 = backend.build_frame()
    assert f0 is not None
    assert backend.frame_builder._fast_state is not None, \
        "fast state should capture for a pure root-raster frame"
    hits = 0
    for step in (7.0, 14.0, 21.0, 120.0, 119.0):
        backend.scroll_offsets[777] = [(Point2D(0.0, step), 0)]
        fast = backend.build_frame()
        used_fast = backend.frame_builder._fast_state is not None and \
            backend.frame_builder._fast_state["builds"] == hits + 1
        full = _full_rebuild(backend)
        _frames_equal(fast, full)
        if used_fast:
            hits += 1
    assert hits >= 4, f"fast path should engage on integer scrolls ({hits})"


def test_scroll_fast_path_bails_on_fractional():
    backend = RenderBackend((640, 480))
    _build_scene(backend)
    backend.build_frame()
    st = backend.frame_builder._fast_state
    assert st is not None
    backend.scroll_offsets[777] = [(Point2D(0.0, 7.5), 0)]
    fast = backend.build_frame()
    # fractional scroll must fall back to the full build (state recaptured,
    # builds counter reset to 0)
    st2 = backend.frame_builder._fast_state
    assert st2 is None or st2["builds"] == 0
    full = _full_rebuild(backend)
    _frames_equal(fast, full)


def test_scroll_fast_path_device_render_matches():
    """The frames the fast path produces must render identically through
    the device path (delta uploads consume the patched arrays)."""
    jax = pytest.importorskip("jax")
    backend = RenderBackend((640, 480))
    _build_scene(backend)
    r = backend.renderer
    r.picture_caching = False
    f = backend.build_frame()
    r.apply_uploads(backend.resources.take_uploads())
    r.render_device(f)
    for step in (9.0, 18.0):
        backend.scroll_offsets[777] = [(Point2D(0.0, step), 0)]
        fast = backend.build_frame()
        out_fast = np.asarray(r.render_device(fast))
        full = _full_rebuild(backend)
        out_full = np.asarray(r.render_device(full))
        assert np.array_equal(out_fast, out_full)
