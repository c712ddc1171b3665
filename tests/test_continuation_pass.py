"""Continuation passes (a root target drawn in several passes around a
picture-cache slice composite) must stay on the production Pallas engine.

Round-3 regression (VERDICT r4 item 1): continuation passes carried
per-tile initial contents that the Pallas kernel couldn't consume, so
every text-heavy post-slice pass fell back to the XLA gather engine —
~100x slower, and a single 1020-tile 4K dispatch tripped the remote
worker watchdog ("TPU worker crashed").  The kernel now takes
`init_tiles`; these tests pin the routing and the bit-exactness.
"""
import numpy as np

from webrender_tpu.api import (ColorF, CommonItemProperties,
                               DisplayListBuilder, Epoch, ExtendMode,
                               GradientStop, PipelineId, Point2D, Rect,
                               SpatialId, Transaction)
from webrender_tpu.render_backend import RenderBackend


def _scene_with_scroll_slice(backend, w=512, h=256):
    """Content below AND above a scroll frame → the root target renders as
    pre-slice pass + slice pass + continuation pass (the bench shape)."""
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, w, h), root)
    txn = Transaction()
    b.push_rect(common, Rect(0, 0, w, h), ColorF(0.9, 0.92, 0.95, 1.0))
    feed = b.define_scroll_frame(root, external_id=42,
                                 content_rect=Rect(300, 16, 128, 1024),
                                 frame_rect=Rect(300, 16, 128, 200))
    feed_common = CommonItemProperties(Rect(0, 0, w, 1024), feed)
    for i in range(8):
        b.push_rect(feed_common, Rect(308, 24 + i * 60, 112, 48),
                    ColorF(0.2 + i * 0.08, 0.4, 0.7, 1.0))
    # content AFTER the scroll frame in painter order → continuation pass
    rng = np.random.RandomState(3)
    for i in range(24):
        x = float(rng.uniform(0, w - 60))
        y = float(rng.uniform(0, h - 40))
        b.push_rect(common, Rect(x, y, 50, 30),
                    ColorF(float(rng.rand()), float(rng.rand()),
                           float(rng.rand()), 0.85))
    g, stops = b.create_gradient(
        Point2D(0, 0), Point2D(128, 0),
        [GradientStop(0.0, ColorF(1, 0.1, 0.1, 1)),
         GradientStop(1.0, ColorF(0.1, 0.1, 1, 1))], ExtendMode.CLAMP)
    b.push_gradient(common, Rect(20, 180, 128, 48), g, stops)
    _, dl = b.end()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)


def test_continuation_pass_runs_on_pallas_bit_equal():
    backend = RenderBackend((512, 256))
    backend.renderer.use_pallas = True
    backend.renderer.pallas_interpret = True
    backend.renderer.picture_caching = False
    _scene_with_scroll_slice(backend)
    frame = backend.build_frame()
    # the bench-shaped frame: at least one continuation pass (clear=None)
    assert sum(1 for p in frame.passes if p.clear is None) >= 1, \
        [p.clear is None for p in frame.passes]
    # with picture caching off, the pre/slice/post split of the root target
    # merges into ONE pass (painter order preserved per tile) — one kernel
    # launch instead of three full-grid launches
    merged = backend.renderer._merged_root_passes(frame)
    assert len(merged) < len(frame.passes), \
        (len(merged), len(frame.passes))
    dev = backend.render()
    counts = backend.renderer.engine_counts
    assert counts.get("xla", 0) == 0, counts  # nothing fell off the kernel
    assert counts.get("pallas", 0) >= 1, counts
    sw = backend.render_software()
    assert np.array_equal(dev, sw)


def test_continuation_pass_unmerged_on_pallas_bit_equal():
    """The continuation (init_tiles) kernel path itself — exercised when a
    slice pass can't merge (picture caching ON but hashes missing) — must
    stay on Pallas and match the oracle bit-for-bit."""
    backend = RenderBackend((512, 256))
    backend.renderer.use_pallas = True
    backend.renderer.pallas_interpret = True
    backend.renderer.picture_caching = False
    _scene_with_scroll_slice(backend)
    frame = backend.build_frame()
    assert sum(1 for p in frame.passes if p.clear is None) >= 1
    frame._merged_passes = list(frame.passes)  # force the unmerged shape
    dev = backend.render()
    counts = backend.renderer.engine_counts
    assert counts.get("xla", 0) == 0, counts
    assert counts.get("pallas", 0) >= 2, counts
    sw = backend.render_software()
    assert np.array_equal(dev, sw)


def test_xla_chunked_dispatch_bit_equal():
    """>128-tile XLA passes split into bounded dispatches (remote-worker
    watchdog guard); chunking must not change a single pixel."""
    backend = RenderBackend((2176, 512))  # 17x8 = 136 tiles > chunk size
    backend.renderer.use_pallas = False
    backend.renderer.picture_caching = False
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 2176, 512), root)
    txn = Transaction()
    b.push_rect(common, Rect(0, 0, 2176, 512), ColorF(1, 1, 1, 1))
    rng = np.random.RandomState(7)
    for i in range(40):
        x = float(rng.uniform(0, 2100))
        y = float(rng.uniform(0, 470))
        b.push_rect(common, Rect(x, y, 70, 40),
                    ColorF(float(rng.rand()), float(rng.rand()),
                           float(rng.rand()), 0.9))
    _, dl = b.end()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    dev = backend.render()
    assert backend.renderer.engine_counts.get("xla", 0) >= 1, \
        backend.renderer.engine_counts
    sw = backend.render_software()
    assert np.array_equal(dev, sw)
