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
