"""In-kernel YUV conversion (yuv.glsl sample_yuv role): plane residency,
color-space matrices, and oracle == device bit-exactness."""
import numpy as np

from webrender_tpu.api import (CommonItemProperties, DisplayListBuilder,
                               Epoch, PipelineId, Rect, SpatialId,
                               Transaction)
from webrender_tpu.api.display_item import (ColorDepth, ColorRange,
                                            ImageRendering, YuvColorSpace)
from webrender_tpu.api.image import ImageData, ImageDescriptor, ImageFormat
from webrender_tpu.render_backend import RenderBackend


def _build_yuv_scene(backend, fmt, keys_data, color_space, color_range,
                     size=32):
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 1000, 1000), root)
    txn = Transaction()
    for key, (desc, data) in keys_data.items():
        txn.add_image(key, desc, ImageData(pixels=data))
    b.push_yuv_image(common, Rect(0, 0, size, size),
                     tuple(keys_data.keys()), fmt, ColorDepth.COLOR8,
                     color_space, color_range, ImageRendering.AUTO)
    _, dl = b.end()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)


def _planar_templates(y_val, u_val, v_val, size=32):
    half = size // 2
    y = np.full((size, size), y_val, np.uint8)
    u = np.full((half, half), u_val, np.uint8)
    v = np.full((half, half), v_val, np.uint8)
    return {
        1: (ImageDescriptor(ImageFormat.R8, size, size), y),
        2: (ImageDescriptor(ImageFormat.R8, half, half), u),
        3: (ImageDescriptor(ImageFormat.R8, half, half), v),
    }


def test_yuv_planar_rec601_conversion():
    """Flat gray (Y=128, U=V=128 limited range) converts to mid gray;
    a red-ish chroma converts with the Rec601 matrix."""
    backend = RenderBackend((64, 64))
    _build_yuv_scene(backend, "planar",
                     _planar_templates(128, 128, 128),
                     YuvColorSpace.REC601, ColorRange.LIMITED)
    img = backend.render_software()
    px = img[8, 8].astype(int)
    # (128-16)*255/219 = 130.4 -> all channels equal (neutral chroma)
    assert abs(px[0] - px[1]) <= 1 and abs(px[1] - px[2]) <= 1
    assert 128 <= px[0] <= 133
    assert px[3] == 255

    backend2 = RenderBackend((64, 64))
    _build_yuv_scene(backend2, "planar",
                     _planar_templates(81, 90, 240),
                     YuvColorSpace.REC601, ColorRange.LIMITED)
    img2 = backend2.render_software()
    px2 = img2[8, 8].astype(int)
    # classic limited-range red (81,90,240) -> ~(255,0,0)
    assert px2[0] >= 245 and px2[1] <= 15 and px2[2] <= 15


def test_yuv_identity_gbr():
    backend = RenderBackend((64, 64))
    _build_yuv_scene(backend, "planar",
                     _planar_templates(200, 50, 100),
                     YuvColorSpace.IDENTITY, ColorRange.FULL)
    img = backend.render_software()
    px = img[8, 8].astype(int)
    # identity maps gbr: r=V(100), g=Y(200), b=U(50)
    assert abs(px[0] - 100) <= 1
    assert abs(px[1] - 200) <= 1
    assert abs(px[2] - 50) <= 1


def test_yuv_nv12_matches_planar():
    size = 32
    half = size // 2
    rng = np.random.RandomState(7)
    y = rng.randint(0, 256, (size, size)).astype(np.uint8)
    u = rng.randint(0, 256, (half, half)).astype(np.uint8)
    v = rng.randint(0, 256, (half, half)).astype(np.uint8)
    b1 = RenderBackend((64, 64))
    _build_yuv_scene(b1, "planar", {
        1: (ImageDescriptor(ImageFormat.R8, size, size), y),
        2: (ImageDescriptor(ImageFormat.R8, half, half), u),
        3: (ImageDescriptor(ImageFormat.R8, half, half), v),
    }, YuvColorSpace.REC709, ColorRange.LIMITED)
    img1 = b1.render_software()
    uv = np.stack([u, v], -1)
    b2 = RenderBackend((64, 64))
    _build_yuv_scene(b2, "nv12", {
        1: (ImageDescriptor(ImageFormat.R8, size, size), y),
        2: (ImageDescriptor(ImageFormat.RG8, half, half), uv),
    }, YuvColorSpace.REC709, ColorRange.LIMITED)
    img2 = b2.render_software()
    assert np.array_equal(img1, img2)


def test_yuv_oracle_device_bit_equal():
    """The XLA device path and the numpy oracle sample the same plane
    texels and apply the same matrix — outputs must match exactly."""
    size = 32
    half = size // 2
    rng = np.random.RandomState(3)
    keys = {
        1: (ImageDescriptor(ImageFormat.R8, size, size),
            rng.randint(0, 256, (size, size)).astype(np.uint8)),
        2: (ImageDescriptor(ImageFormat.R8, half, half),
            rng.randint(0, 256, (half, half)).astype(np.uint8)),
        3: (ImageDescriptor(ImageFormat.R8, half, half),
            rng.randint(0, 256, (half, half)).astype(np.uint8)),
    }
    backend = RenderBackend((64, 64))
    _build_yuv_scene(backend, "planar", keys,
                     YuvColorSpace.REC601, ColorRange.LIMITED)
    dev = backend.render()
    sw = backend.render_software()
    diff = np.abs(dev.astype(int) - sw.astype(int))
    assert diff.max() == 0, f"max diff {diff.max()}"
    # video update path: a new frame of planes re-uploads, no host convert
    assert backend.resources._yuvp_cache, "plane cache not populated"


def test_yuv_pallas_bit_equal():
    """The dense-record Pallas kernel's K_SEP_YUV path (interpret mode on
    CPU) matches the oracle bit-for-bit."""
    size = 32
    half = size // 2
    rng = np.random.RandomState(11)
    keys = {
        1: (ImageDescriptor(ImageFormat.R8, size, size),
            rng.randint(0, 256, (size, size)).astype(np.uint8)),
        2: (ImageDescriptor(ImageFormat.R8, half, half),
            rng.randint(0, 256, (half, half)).astype(np.uint8)),
        3: (ImageDescriptor(ImageFormat.R8, half, half),
            rng.randint(0, 256, (half, half)).astype(np.uint8)),
    }
    backend = RenderBackend((64, 64))
    backend.renderer.use_pallas = True
    backend.renderer.pallas_interpret = True
    _build_yuv_scene(backend, "planar", keys,
                     YuvColorSpace.REC709, ColorRange.FULL)
    dev = backend.render()
    counts = backend.renderer.engine_counts
    assert counts.get("pallas", 0) + counts.get("pallas-sharded", 0) > 0, \
        counts
    sw = backend.render_software()
    assert np.array_equal(dev, sw)
