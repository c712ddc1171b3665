import numpy as np, jax, jax.numpy as jnp
from webrender_tpu.render_backend import RenderBackend
from webrender_tpu.api import *
from webrender_tpu.frame.gpu import INST_BLEND, INST_KIND
from webrender_tpu.frame.tiles import TILE_H, TILE_W
from webrender_tpu.ops.raster import render_tiles
from webrender_tpu.ops.pallas.tile_raster import render_tiles_pallas, pallas_pass_supported
import dataclasses

backend = RenderBackend((256, 128))
pid = PipelineId(0, 1)
b = DisplayListBuilder(pid)
b.begin()
root = SpatialId.root_scroll_node(pid)
common = CommonItemProperties(Rect(0, 0, 1000, 1000), root)
b.push_rect(common, Rect(10.5, 10.25, 100, 50), ColorF(0, 1, 0, 0.8))
b.push_rect(common, Rect(50, 20, 80, 80), ColorF(1, 0, 0, 0.5))
g, stops = b.create_gradient(Point2D(0,0), Point2D(64, 0),
    [GradientStop(0.0, ColorF(1,0,0,1)), GradientStop(1.0, ColorF(0,0,1,1))], ExtendMode.CLAMP)
b.push_gradient(common, Rect(120, 30, 64, 64), g, stops)
clip = b.define_clip_rounded_rect(root, Rect(0,0,200,100), BorderRadius.uniform(16.0))
chain = b.define_clip_chain(None, [clip])
b.push_rect(dataclasses.replace(common, clip_chain_id=chain), Rect(0,0,200,100), ColorF(0,0,1,0.3))
_, dl = b.end()
txn = Transaction(); txn.set_root_pipeline(pid); txn.set_display_list(Epoch(0), dl); txn.generate_frame()
backend.send_transaction(txn)
frame = backend.build_frame()
p = frame.passes[-1]
ids = p.tile_insts[p.tile_insts >= 0]
used = frame.instances[np.unique(ids)]
kinds = tuple(sorted(set(int(k) for k in used[:, INST_KIND])))
blends = tuple(sorted(set(int(x) for x in used[:, INST_BLEND])))
print("kinds", kinds, "supported:",
      pallas_pass_supported(frame.instances, p.tile_insts, frame.transforms, frame.f32_buf))
ys, xs = np.mgrid[0:p.ny, 0:p.nx]
origins = np.stack([xs.reshape(-1)*TILE_W, ys.reshape(-1)*TILE_H], 1).astype(np.float32)
clear = np.asarray(p.clear, np.float32)
args = (jnp.asarray(frame.f32_buf), jnp.asarray(frame.instances),
        jnp.asarray(frame.transforms), jnp.asarray(p.tile_insts),
        jnp.asarray(origins), jnp.asarray(clear))
ref = render_tiles(*args, backend.renderer.color_atlas,
                   backend.renderer.alpha_atlas, backend.renderer.surface_atlas,
                   kinds=kinds, blends=blends)
out = render_tiles_pallas(*args, backend.renderer.alpha_atlas,
                          backend.renderer.surface_atlas,
                          kinds=kinds, blends=blends)
d = np.abs(np.asarray(ref) - np.asarray(out))
print("max diff", float(d.max()))
