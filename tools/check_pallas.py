#!/usr/bin/env python
"""Device validation of the Pallas tile kernel: renders scenes that
exercise every kernel branch (solids, gradients, images at several scales,
repeat/nearest, glyphs, scaled text, image-mask clips, blurred surfaces,
mix-blend) with use_pallas on and off, and reports the max u8 diff per
scene plus which engine actually ran.  Run on the real chip:

    python tools/check_pallas.py [--json out.json]

Exit 0 when every scene matches within tolerance AND the pallas engine ran
for the scenes that are supposed to stay on the fast path.
"""
import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def _mk_backend(size, use_pallas):
    from webrender_tpu.render_backend import RenderBackend
    from webrender_tpu.renderer.renderer import Renderer
    return RenderBackend(size, renderer=Renderer(use_pallas=use_pallas))


def _image_px(w, h, seed=5):
    rng = np.random.RandomState(seed)
    px = (rng.rand(h, w, 4) * 255).astype(np.uint8)
    px[..., 3] = 255
    return px


def scene_images(b, txn, size):
    from webrender_tpu.api import (AlphaType, CommonItemProperties, ImageData,
                                   ImageDescriptor, ImageFormat,
                                   ImageRendering, Rect, Size2D, SpatialId)
    pid = b.pipeline_id
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, *size), root)
    txn.add_image(1, ImageDescriptor(ImageFormat.RGBA8, 64, 64),
                  ImageData(pixels=_image_px(64, 64)))
    txn.add_image(2, ImageDescriptor(ImageFormat.RGBA8, 32, 32),
                  ImageData(pixels=_image_px(32, 32, seed=9)))
    # 1:1
    b.push_image(common, Rect(8, 8, 64, 64), ImageRendering.AUTO,
                 AlphaType.PREMULTIPLIED_ALPHA, 1)
    # 2x upscale
    b.push_image(common, Rect(96, 8, 128, 128), ImageRendering.AUTO,
                 AlphaType.PREMULTIPLIED_ALPHA, 1)
    # ~1.6x downscale
    b.push_image(common, Rect(240, 8, 40, 40), ImageRendering.AUTO,
                 AlphaType.PREMULTIPLIED_ALPHA, 1)
    # nearest (pixelated)
    b.push_image(common, Rect(300, 8, 96, 96), ImageRendering.PIXELATED,
                 AlphaType.PREMULTIPLIED_ALPHA, 2)
    # repeating with spacing
    b.push_repeating_image(common, Rect(8, 150, 300, 90), Size2D(32, 32),
                           Size2D(8, 8), ImageRendering.AUTO,
                           AlphaType.PREMULTIPLIED_ALPHA, 2)


def scene_mask_clip(b, txn, size):
    from webrender_tpu.api import (ColorF, CommonItemProperties, ImageData,
                                   ImageDescriptor, ImageFormat, Rect,
                                   SpatialId)
    import dataclasses
    pid = b.pipeline_id
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, *size), root)
    # radial-ish alpha mask as an R8 image
    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
    d = np.hypot(xs - 32, ys - 32)
    mask = np.clip(255 * (1.0 - d / 32.0), 0, 255).astype(np.uint8)
    txn.add_image(3, ImageDescriptor(ImageFormat.R8, 64, 64),
                  ImageData(pixels=mask))
    clip = b.define_clip_image_mask(root, Rect(40, 30, 160, 120), 3)
    chain = b.define_clip_chain(None, [clip])
    b.push_rect(dataclasses.replace(common, clip_chain_id=chain),
                Rect(0, 0, 240, 180), ColorF(0.9, 0.2, 0.1, 1.0))
    b.push_rect(common, Rect(260, 30, 80, 60), ColorF(0.1, 0.4, 0.9, 0.8))


def scene_text_scaled(b, txn, size, backend=None):
    from webrender_tpu.api import (ColorF, CommonItemProperties, Rect,
                                   SpatialId, Point2D, Transform,
                                   TransformStyle)
    from webrender_tpu.api.font import (FontInstanceKey, FontInstanceOptions,
                                        FontKey)
    from webrender_tpu.api import Transaction
    import matplotlib
    pid = b.pipeline_id
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, *size), root)
    fk = FontKey(0, 1)
    fik = FontInstanceKey(0, 7)
    pre = Transaction()
    pre.add_native_font(fk, matplotlib.get_data_path()
                        + "/fonts/ttf/DejaVuSans.ttf")
    pre.add_font_instance(fik, fk, 20.0, FontInstanceOptions())
    backend.send_transaction(pre)

    def layout(text, x, y):
        out = []
        for ch in text:
            gi = backend.resources.fonts.glyph_index(fk, ch)
            out.append((gi, x, y))
            x += backend.resources.fonts.linear_advance(fk, 20.0, gi)
        return out

    b.push_text(common, Rect(10, 10, 300, 40),
                layout("Pallas glyphs 1:1", 12, 36), fik.key,
                ColorF(0, 0, 0, 1))
    # scaled text under a 1.5x reference frame → separable glyph path
    sid = b.push_reference_frame(Point2D(0, 60), root, TransformStyle.FLAT,
                                 Transform.scale(1.5, 1.5))
    c2 = CommonItemProperties(Rect(0, 0, 400, 200), sid)
    b.push_text(c2, Rect(4, 4, 260, 40), layout("scaled text 1.5x", 8, 30),
                fik.key, ColorF(0.1, 0.1, 0.5, 1))
    b.pop_reference_frame()


def scene_surface(b, txn, size):
    from webrender_tpu.api import (ColorF, CommonItemProperties, Point2D,
                                   Rect, SpatialId)
    from webrender_tpu.api.display_item import FilterOp, MixBlendMode
    pid = b.pipeline_id
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, *size), root)
    b.push_rect(common, Rect(0, 0, *size), ColorF(0.9, 0.9, 0.95, 1))
    b.push_stacking_context(Point2D(0, 0), root,
                            filters=[FilterOp.blur(3.0, 3.0),
                                     FilterOp.opacity(0.8)])
    b.push_rect(common, Rect(30, 20, 150, 100), ColorF(0.8, 0.3, 0.1, 1))
    b.pop_stacking_context()
    b.push_stacking_context(Point2D(0, 0), root,
                            mix_blend_mode=MixBlendMode.MULTIPLY)
    b.push_rect(common, Rect(100, 60, 150, 100), ColorF(0.2, 0.6, 0.9, 1))
    b.pop_stacking_context()


SCENES = [
    ("images", scene_images, True),
    ("mask_clip", scene_mask_clip, True),
    ("text_scaled", scene_text_scaled, True),
    ("surface_blur_mixblend", scene_surface, True),
]


def run_scene(name, fn, use_pallas, size=(512, 256)):
    from webrender_tpu.api import (DisplayListBuilder, Epoch, PipelineId,
                                   Transaction)
    backend = _mk_backend(size, use_pallas)
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    txn = Transaction()
    import inspect
    if "backend" in inspect.signature(fn).parameters:
        fn(b, txn, size, backend=backend)
    else:
        fn(b, txn, size)
    _, dl = b.end()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    img = backend.render()
    return img, dict(backend.renderer.engine_counts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    ap.add_argument("--tol", type=int, default=1)
    args = ap.parse_args()

    results = []
    ok = True
    for name, fn, want_pallas in SCENES:
        ref, _ = run_scene(name, fn, use_pallas=False)
        out, engines = run_scene(name, fn, use_pallas=True)
        diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
        md = int(diff.max())
        nbad = int((diff > args.tol).sum())
        pallas_ran = engines.get("pallas", 0) > 0
        scene_ok = (md <= args.tol) and (pallas_ran or not want_pallas)
        ok &= scene_ok
        results.append({"scene": name, "max_diff": md,
                        "px_over_tol": nbad, "engines": engines,
                        "ok": scene_ok})
        print(f"{name:24s} max_diff={md:3d} over_tol={nbad:6d} "
              f"engines={engines} {'OK' if scene_ok else 'FAIL'}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump({"ok": ok, "scenes": results}, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
