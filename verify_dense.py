import numpy as np, jax, jax.numpy as jnp, time
exec(open('test_pallas_tmp.py').read().split("ref = render_tiles")[0])
from webrender_tpu.ops.pallas.tile_raster import build_dense_records, render_tiles_pallas_dense
from webrender_tpu.ops.raster import render_tiles
ref = render_tiles(*args, backend.renderer.color_atlas,
                   backend.renderer.alpha_atlas, backend.renderer.surface_atlas,
                   kinds=kinds, blends=blends)
dense = build_dense_records(frame.f32_buf, frame.instances, frame.transforms, p.tile_insts)
counts = (p.tile_insts >= 0).sum(1).astype(np.int32)
out = render_tiles_pallas_dense(jnp.asarray(dense), jnp.asarray(counts),
                                jnp.asarray(origins), jnp.asarray(clear),
                                jnp.asarray(frame.f32_buf).reshape(-1,128),
                                backend.renderer.alpha_atlas,
                                backend.renderer.surface_atlas,
                                kinds=kinds, blends=blends)
d = np.abs(np.asarray(ref)-np.asarray(out))
print("dense max diff", float(d.max()), flush=True)

# 4K timing
import bench as B
backend = B.build_4k_scene()
frame = backend.build_frame()
backend.renderer.apply_uploads(backend.resources.take_uploads())
v = B.device_render_once(backend, frame)
t0=time.time()
for _ in range(20): v = B.device_render_once(backend, frame)
print("4k ms/frame (dense pallas):", (time.time()-t0)/20*1000, flush=True)
