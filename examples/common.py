"""Example boilerplate — the `examples/common/boilerplate.rs` role: set up a
backend, run the example's display-list builder, render to PNG."""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from webrender_tpu.api import (ColorF, DisplayListBuilder, Epoch, PipelineId,
                               Transaction)
from webrender_tpu.render_backend import RenderBackend


def main_wrapper(example, size=(512, 384), frames=1, out=None):
    """Runs `example(builder, txn, api-ish)` once per frame; saves PNG."""
    backend = RenderBackend(size)
    pid = PipelineId(0, 1)
    img = None
    for frame_idx in range(frames):
        b = DisplayListBuilder(pid)
        b.begin()
        txn = Transaction()
        example(b, txn, backend, frame_idx, size)
        _, dl = b.end()
        txn.set_root_pipeline(pid)
        txn.set_display_list(Epoch(frame_idx), dl)
        txn.generate_frame()
        backend.send_transaction(txn)
        # oracle by default: examples are correctness demos; pass --device
        # to run the TPU path (first-compile latency applies)
        import sys as _sys
        if "--device" in _sys.argv:
            img = backend.render()
        else:
            img = backend.render_software()
    out = out or f"/tmp/{example.__name__}.png"
    try:
        from PIL import Image
        Image.fromarray(img).save(out)
        print(f"wrote {out}")
    except Exception:
        pass
    return img
