"""End-to-end smoke: display list → scene → frame → TPU raster → pixels,
plus oracle agreement."""
import numpy as np
import pytest

from webrender_tpu.api import (ColorF, CommonItemProperties, DisplayListBuilder,
                               Epoch, PipelineId, Rect, SpatialId, Transaction)
from webrender_tpu.render_backend import RenderBackend


def make_backend(w=256, h=128):
    return RenderBackend((w, h))


def simple_dl(color=ColorF(0, 1, 0, 1), bounds=Rect(10, 10, 100, 50)):
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    b.push_rect(CommonItemProperties(Rect(0, 0, 1000, 1000), root),
                bounds, color)
    return b.end()


def test_solid_rect_end_to_end():
    backend = make_backend()
    pid, dl = simple_dl()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    img = backend.render()
    assert img.shape == (128, 256, 4)
    # inside the rect: green; outside: white background
    assert tuple(img[35, 60]) == (0, 255, 0, 255)
    assert tuple(img[5, 5]) == (255, 255, 255, 255)
    # AA edge is exact at integer edges (full coverage)
    assert tuple(img[10, 10]) == (0, 255, 0, 255)
    assert tuple(img[9, 10]) == (255, 255, 255, 255)


def test_alpha_blend():
    backend = make_backend()
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 1000, 1000), root)
    b.push_rect(common, Rect(0, 0, 100, 100), ColorF(1, 0, 0, 1))
    b.push_rect(common, Rect(0, 0, 100, 100), ColorF(0, 0, 1, 0.5))
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    img = backend.render()
    # 0.5 blue over red: source colors quantize to the u8 grid like the
    # reference's RGBA8 vertex colors (alpha 0.5 → 128/255), so
    # blue = 128 and the red remainder = 255-128 = 127
    assert tuple(img[50, 50]) == (127, 0, 128, 255)


def test_oracle_matches_device():
    backend = make_backend()
    pid, dl = simple_dl(ColorF(0.2, 0.4, 0.8, 0.9), Rect(7.5, 3.25, 90.5, 40))
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    dev = backend.render()
    sw = backend.render_software()
    diff = np.abs(dev.astype(int) - sw.astype(int))
    assert diff.max() <= 1, f"max diff {diff.max()}"
