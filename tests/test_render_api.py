"""Threaded RenderApi pipeline test (renderer/init.rs thread model)."""
import threading

import numpy as np

from webrender_tpu.api import (ColorF, CommonItemProperties, DisplayListBuilder,
                               Epoch, PipelineId, Rect, SpatialId, Transaction)
from webrender_tpu.render_api import RenderNotifier, create_webrender_instance


def test_threaded_pipeline():
    ready = threading.Event()
    notifier = RenderNotifier(new_frame_ready=ready.set)
    instance, api = create_webrender_instance((128, 64), notifier=notifier)
    try:
        pid = PipelineId(0, 1)
        b = DisplayListBuilder(pid)
        b.begin()
        root = SpatialId.root_scroll_node(pid)
        b.push_rect(CommonItemProperties(Rect(0, 0, 1000, 1000), root),
                    Rect(0, 0, 64, 64), ColorF(1, 0, 0, 1))
        _, dl = b.end()
        txn = Transaction()
        txn.set_root_pipeline(pid)
        txn.set_display_list(Epoch(0), dl)
        txn.generate_frame()
        api.send_transaction(txn)
        img = instance.render()
        assert ready.is_set()
        assert tuple(img[10, 10]) == (255, 0, 0, 255)
        assert tuple(img[10, 100]) == (255, 255, 255, 255)
    finally:
        api.shut_down()


def test_async_blob_rasterization_on_scene_thread():
    """doc/blob.md async path: blob commands sent through the threaded
    RenderApi rasterize on the SceneBuilder thread (the
    AsyncBlobImageRasterizer role), not at prepare time."""
    from webrender_tpu.api.display_item import AlphaType, ImageRendering
    from webrender_tpu.api.image import ImageDescriptor, ImageFormat
    from webrender_tpu.resources.resource_cache import BlobImageHandler

    raster_threads = []

    class Handler(BlobImageHandler):
        def rasterize(self, descriptor, blob, tile_offset=None):
            raster_threads.append(threading.current_thread().name)
            px = np.zeros((descriptor.height, descriptor.width, 4), np.uint8)
            px[..., 2] = blob[0]
            px[..., 3] = 255
            return px

    ready = threading.Event()
    notifier = RenderNotifier(new_frame_ready=ready.set)
    instance, api = create_webrender_instance((64, 64), notifier=notifier)
    try:
        instance.backend.resources.set_blob_image_handler(Handler())
        pid = PipelineId(0, 1)
        b = DisplayListBuilder(pid)
        b.begin()
        root = SpatialId.root_scroll_node(pid)
        common = CommonItemProperties(Rect(0, 0, 64, 64), root)
        b.push_image(common, Rect(0, 0, 64, 64), ImageRendering.AUTO,
                     AlphaType.PREMULTIPLIED_ALPHA, 9)
        _, dl = b.end()
        txn = Transaction()
        txn.set_root_pipeline(pid)
        txn.add_blob_image(9, ImageDescriptor(ImageFormat.RGBA8, 16, 16),
                           bytes([200]))
        txn.set_display_list(Epoch(0), dl)
        txn.generate_frame()
        api.send_transaction(txn)
        img = instance.render()
        assert tuple(img[32, 32]) == (0, 0, 200, 255)
        assert raster_threads and all(
            "SceneBuilder" in t for t in raster_threads), raster_threads
    finally:
        api.shut_down()
