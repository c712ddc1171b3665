"""Kernel variant matrix — the reference's shaders.rs precache /
test_init role: every (kinds, blends, mask_clips, gl) combination the
frame builder can dispatch must compile and agree with the XLA reference
engine.  Runs the production Pallas kernel in interpret mode on the CPU
mesh (tiny grids), so the matrix is cheap enough for CI."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def scene():
    import dataclasses
    from webrender_tpu.api import (ColorF, CommonItemProperties,
                                   DisplayListBuilder, Epoch, GradientStop,
                                   ExtendMode, PipelineId, Point2D, Rect,
                                   SpatialId, Transaction, BorderRadius)
    from webrender_tpu.render_backend import RenderBackend
    pid = PipelineId(0, 1)
    backend = RenderBackend((256, 128))
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, 256, 128), root)
    b.push_rect(common, Rect(0, 0, 256, 128), ColorF(1, 1, 1, 1))
    g, stops = b.create_gradient(
        Point2D(0, 0), Point2D(128, 0),
        [GradientStop(0.0, ColorF(1, 0, 0, 1)),
         GradientStop(1.0, ColorF(0, 0, 1, 1))], ExtendMode.CLAMP)
    b.push_gradient(common, Rect(10, 10, 120, 40), g, stops)
    clip = b.define_clip_rounded_rect(root, Rect(40, 20, 160, 90),
                                      BorderRadius.uniform(20.0))
    chain = b.define_clip_chain(None, [clip])
    b.push_rect(dataclasses.replace(common, clip_chain_id=chain),
                Rect(30, 30, 180, 80), ColorF(0.2, 0.6, 0.3, 0.8))
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    return backend


@pytest.mark.parametrize("gl", [False, True])
@pytest.mark.parametrize("mask_clips", [False, True])
def test_pallas_variant_matrix(scene, gl, mask_clips):
    """Each Pallas variant (gl flavor × mask-clip support) compiles in
    interpret mode and matches the XLA engine bit-for-bit on the same
    frame."""
    import jax.numpy as jnp
    from webrender_tpu.ops.pallas.tile_raster import (
        build_dense_records_device, classify_dense_kinds,
        dense_dispatch_info, render_tiles_pallas_dense)
    from webrender_tpu.ops.raster import render_tiles
    backend = scene
    frame = backend.build_frame()
    backend.renderer.apply_uploads(backend.resources.take_uploads())
    p = next(q for q in frame.passes if q.tile_insts is not None)
    dk = classify_dense_kinds(frame.f32_buf, frame.instances,
                              frame.transforms)
    kinds, blends, auto_mask = dense_dispatch_info(
        frame.f32_buf, frame.instances, p.tile_insts, dk)
    if mask_clips and not auto_mask:
        # force the mask-clip variant to compile even when the scene's
        # clips are expressible geometrically
        pass
    f32 = jnp.asarray(frame.f32_buf)
    dense = build_dense_records_device(
        f32, jnp.asarray(frame.instances), jnp.asarray(frame.transforms),
        jnp.asarray(p.tile_insts), jnp.asarray(dk))
    counts = jnp.asarray((p.tile_insts >= 0).sum(1).astype(np.int32))
    ys, xs = np.mgrid[0:p.ny, 0:p.nx]
    from webrender_tpu.frame.tiles import TILE_H, TILE_W
    origins = jnp.asarray(np.stack([xs.reshape(-1) * TILE_W,
                                    ys.reshape(-1) * TILE_H],
                                   1).astype(np.float32))
    clear = jnp.asarray(np.asarray(p.clear if p.clear is not None
                                   else (0, 0, 0, 0), np.float32))
    r = backend.renderer
    out_pl = render_tiles_pallas_dense(
        dense, counts, origins, clear, f32.reshape(-1, 128),
        r.alpha_atlas, r.surface_atlas, r.color_atlas,
        kinds=kinds, blends=blends, mask_clips=mask_clips,
        interpret=True, gl=gl)
    from webrender_tpu.frame.gpu import INST_BLEND, INST_KIND
    ids = np.unique(p.tile_insts[p.tile_insts >= 0])
    used = frame.instances[ids]
    xkinds = tuple(np.unique(used[:, INST_KIND]).astype(int).tolist())
    xblends = tuple(np.unique(used[:, INST_BLEND]).astype(int).tolist())
    out_xla = render_tiles(
        f32, jnp.asarray(frame.instances), jnp.asarray(frame.transforms),
        jnp.asarray(p.tile_insts), origins, clear, r.color_atlas,
        r.alpha_atlas, r.surface_atlas, kinds=xkinds, blends=xblends,
        gl=gl)
    a = np.asarray(out_pl)
    b = np.asarray(out_xla)
    assert a.shape == b.shape
    d = np.abs(a - b).max()
    assert d == 0.0, f"pallas({gl=},{mask_clips=}) vs xla max diff {d}"
