"""Tile-level Pallas/XLA engine split (VERDICT r2 #8): a rotated image
demotes only the tiles it touches to the XLA engine; every other tile
stays on the Pallas kernel, and the combined output matches the oracle."""
import numpy as np

from webrender_tpu.api import (AlphaType, ColorF, CommonItemProperties,
                               DisplayListBuilder, Epoch, PipelineId,
                               Point2D, Rect, SpatialId, Transaction)
from webrender_tpu.api.display_item import ImageRendering
from webrender_tpu.api.image import ImageData, ImageDescriptor, ImageFormat
from webrender_tpu.api.units import Transform
from webrender_tpu.render_backend import RenderBackend


def _build_scene(backend):
    """A wide strip: solid rects everywhere (Pallas-eligible) plus one
    rotated image confined to the left tiles (XLA-only sampling)."""
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 2000, 2000), root)
    txn = Transaction()
    rng = np.random.RandomState(5)
    tex = rng.randint(0, 256, (32, 32, 4)).astype(np.uint8)
    tex[..., 3] = 255
    txn.add_image(9, ImageDescriptor(ImageFormat.RGBA8, 32, 32),
                  ImageData(pixels=tex))
    for i in range(12):
        b.push_rect(common, Rect(10 + i * 40, 8, 30, 40),
                    ColorF(i / 12.0, 0.3, 0.8, 1))
    rot = b.push_reference_frame(Point2D(30, 30), root, None,
                                 Transform.rotation_z(30.0), None)
    rot_common = CommonItemProperties(Rect(-64, -64, 128, 128), rot)
    b.push_image(rot_common, Rect(-16, -16, 32, 32), ImageRendering.AUTO,
                 AlphaType.PREMULTIPLIED_ALPHA, 9)
    _, dl = b.end()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)


def test_tile_level_engine_split_bit_equal():
    backend = RenderBackend((512, 64))
    backend.renderer.use_pallas = True
    backend.renderer.pallas_interpret = True
    _build_scene(backend)
    dev = backend.render()
    counts = backend.renderer.engine_counts
    assert counts.get("pallas+xla-split", 0) > 0, counts
    sw = backend.render_software()
    assert np.array_equal(dev, sw)
