"""Multi-chip sharding tests: sharded rendering must be bit-equal to the
single-device render (SURVEY.md §2.7.6; the tile-band parallel model of
reference/webrender/src/compositor/sw_compositor.rs:743 mapped onto a
jax.sharding.Mesh).  Runs on the 8-device virtual CPU mesh from conftest."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from webrender_tpu.api import (BorderRadius, ColorF, CommonItemProperties,
                               DisplayListBuilder, Epoch, ExtendMode,
                               GradientStop, PipelineId, Point2D, Rect,
                               SpatialId, Transaction)
from webrender_tpu.api.display_item import FilterOp
from webrender_tpu.parallel.mesh import (blur_image_sharded, make_mesh,
                                         render_tiles_sharded)
from webrender_tpu.render_backend import RenderBackend
from webrender_tpu.renderer.renderer import Renderer


def _scene_backend(size=(1024, 256), mesh=None, with_blur=True):
    if mesh is not None:
        backend = RenderBackend(size, renderer=Renderer(mesh=mesh,
                                                        use_pallas=False))
    else:
        backend = RenderBackend(size)
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 4096, 4096), root)
    rng = np.random.RandomState(11)
    for i in range(40):
        x = float(rng.uniform(0, size[0] - 80))
        y = float(rng.uniform(0, size[1] - 60))
        if i % 4 == 0:
            g, stops = b.create_gradient(
                Point2D(0, 0), Point2D(80, 40),
                [GradientStop(0.0, ColorF(1, 0, 0, 1)),
                 GradientStop(1.0, ColorF(0, 0, 1, 0.7))],
                ExtendMode.CLAMP)
            b.push_gradient(common, Rect(x, y, 80, 50), g, stops)
        else:
            b.push_rect(common, Rect(x, y, 80, 50),
                        ColorF(float(rng.rand()), float(rng.rand()),
                               float(rng.rand()), 0.9))
    clip = b.define_clip_rounded_rect(root, Rect(16, 16, 300, 180),
                                      BorderRadius.uniform(30.0))
    chain = b.define_clip_chain(None, [clip])
    import dataclasses
    b.push_rect(dataclasses.replace(common, clip_chain_id=chain),
                Rect(0, 0, 400, 220), ColorF(0, 1, 0, 0.5))
    if with_blur:
        b.push_stacking_context(Point2D(0, 0), root,
                                filters=[FilterOp.blur(5.0, 5.0)])
        b.push_rect(common, Rect(60, 40, 200, 120), ColorF(0.9, 0.4, 0.1, 1))
        b.pop_stacking_context()
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    return backend


def test_sharded_frame_bit_equal():
    """Full multi-pass frame (surface raster + blur + composite + root
    raster) sharded over 8 devices == unsharded, bit-exact."""
    ref_backend = _scene_backend()
    ref = ref_backend.render()

    mesh = make_mesh(n=8)
    sh_backend = _scene_backend(mesh=mesh)
    out = sh_backend.render()

    assert sh_backend.renderer.engine_counts.get("sharded", 0) > 0
    assert np.array_equal(ref, out)


def test_sharded_raster_pass_bit_equal():
    """render_tiles_sharded output == render_tiles for one raster pass,
    including the pad-and-strip of a non-multiple tile count."""
    from webrender_tpu.frame.gpu import INST_BLEND, INST_KIND
    from webrender_tpu.ops.raster import render_tiles

    backend = _scene_backend(with_blur=False)
    frame = backend.build_frame()
    backend.renderer.apply_uploads(backend.resources.take_uploads())
    p = [q for q in frame.passes if q.tile_insts is not None][-1]
    ids = p.tile_insts[p.tile_insts >= 0]
    used = frame.instances[np.unique(ids)]
    kinds = tuple(sorted(set(int(k) for k in used[:, INST_KIND])))
    blends = tuple(sorted(set(int(b) for b in used[:, INST_BLEND])))
    origins = backend.renderer._tile_origins(p)
    clear = np.asarray(p.clear, np.float32)
    r = backend.renderer
    ref = np.asarray(render_tiles(
        jnp.asarray(frame.f32_buf), jnp.asarray(frame.instances),
        jnp.asarray(frame.transforms), jnp.asarray(p.tile_insts),
        jnp.asarray(origins), jnp.asarray(clear), r.color_atlas,
        r.alpha_atlas, r.surface_atlas, kinds=kinds, blends=blends))

    mesh = make_mesh(n=8)
    # also exercise padding: drop one tile so nt % 8 != 0
    ti = p.tile_insts[:-1]
    to = origins[:-1]
    out = np.asarray(render_tiles_sharded(
        mesh, frame.f32_buf, frame.instances, frame.transforms, ti, to,
        clear, r.color_atlas, r.alpha_atlas, r.surface_atlas,
        kinds=kinds, blends=blends))
    assert out.shape[0] == ti.shape[0]
    assert np.array_equal(ref[:-1], out)


def test_sharded_blur_halo_exchange():
    """Row-sharded vertical blur (ppermute halo exchange over the mesh
    axis) matches the single-device separable blur bit-for-bit, for radii
    both smaller and larger than a shard."""
    from webrender_tpu.ops.raster import blur_region, gaussian_weights

    mesh = make_mesh(n=8)
    rng = np.random.RandomState(3)
    img = rng.rand(4, 96, 256).astype(np.float32)
    for radius in (2, 8, 16):  # 16 > 96/8 rows per shard → gather fallback
        w = jnp.asarray(gaussian_weights(radius / 3.0, radius))
        for axis in (0, 1):
            ref = np.asarray(blur_region(jnp.asarray(img), w,
                                         radius=radius, axis=axis))
            out = np.asarray(blur_image_sharded(mesh, jnp.asarray(img), w,
                                                radius=radius, axis=axis))
            assert np.array_equal(ref, out), (radius, axis)


def test_mesh_device_count_enforced():
    """A mesh larger than the backend must fail loudly, never silently
    shrink to fewer devices (the round-1 1-device-mesh bug)."""
    with pytest.raises(RuntimeError):
        make_mesh(n=len(jax.devices()) + 1)


def test_sharded_pallas_bit_equal():
    """The PRODUCTION dense-record Pallas kernel sharded over the mesh
    (interpret mode on the CPU backend) matches the unsharded kernel and
    the XLA path bit-for-bit on a full multi-pass frame (VERDICT r2 #4:
    the path an 8-chip pod would actually run)."""
    import __graft_entry__ as g
    from webrender_tpu.render_backend import RenderBackend
    from webrender_tpu.renderer.renderer import Renderer

    backend_ref, frame_ref = g._build_test_frame(
        size=(512, 128), n_rects=16, with_blur=True)
    ref = backend_ref.renderer.render(frame_ref, backend_ref.resources)

    mesh = make_mesh(n=8)
    backend_sh, frame_sh = g._build_test_frame(
        size=(512, 128), n_rects=16, with_blur=True, mesh=mesh)
    out = backend_sh.renderer.render(frame_sh, backend_sh.resources)
    counts = backend_sh.renderer.engine_counts
    assert counts.get("pallas-sharded", 0) > 0, counts
    assert np.array_equal(np.asarray(ref), np.asarray(out))
