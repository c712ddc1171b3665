"""Renderer — executes Frames on the device.

Mirrors `webrender/src/renderer/mod.rs` (render :1241 / draw_frame :4525)
with the GL device replaced by jitted XLA computations over HBM-resident
arrays: texture uploads become dynamic_update_slice into the atlas arrays,
each render pass is one `render_tiles` launch over the pass's tile grid, and
the final framebuffer is read back to host for PNG/compare (readback is only
for tests — production compositing stays on device).
"""
from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..frame.frame_builder import (Frame, RenderPass, PASS_BLUR_H,
                                   PASS_BLUR_V, PASS_CHANNEL_LUT,
                                   PASS_COLOR_MATRIX, PASS_COPY,
                                   PASS_ARITH, PASS_DOWNSCALE, PASS_RASTER,
                                   PASS_SRGB, TARGET_ROOT)
from ..ops import blend as blend_mod

# pass-kind labels for per-pass GPU timers (query_gl.rs GpuProfileTag)
PASS_NAMES = {PASS_RASTER: "raster", PASS_BLUR_H: "blur_h",
              PASS_BLUR_V: "blur_v", PASS_COPY: "copy",
              PASS_CHANNEL_LUT: "channel_lut", PASS_SRGB: "srgb",
              PASS_ARITH: "arith", PASS_DOWNSCALE: "downscale",
              PASS_COLOR_MATRIX: "color_matrix"}
from ..frame.gpu import (INST_BLEND, INST_CLIP_ADDR, INST_CLIP_COUNT,
                         INST_KIND, INST_PRIM_ADDR, INST_SPATIAL)
from ..frame.tiles import TILE_H, TILE_W
from ..ops.raster import (assemble_tiles, blur_region, disassemble_tiles,
                          gaussian_weights, render_tiles)
from ..resources.resource_cache import (ATLAS_ALPHA, ATLAS_COLOR,
                                        PendingUpload, ResourceCache)


class _CacheHolder:
    """Bare attribute holder for per-subset dense-record caches when a
    pass splits tile-level between the Pallas and XLA engines."""


@functools.partial(jax.jit, donate_argnums=())
def _scatter_packed(buf, packed):
    """Row-scatter from ONE packed upload: column 0 carries the row index
    (exact in f32 below 2^24 / verbatim in i32), the rest the row values.
    One device_put per delta instead of two — transfers to a busy device
    pay a fixed tunnel round-trip each on this platform."""
    rows = packed[:, 0].astype(jnp.int32)
    return buf.at[rows].set(packed[:, 1:].astype(buf.dtype))


def _mirror_view(dev, spec):
    if spec[0] == "rows":
        return dev[:spec[1]]
    if spec[0] == "col0":
        return dev[:spec[1], 0]
    if spec[0] == "flat":
        return dev.reshape(-1)
    if spec[0] == "rows128":
        return dev if dev.shape[1] == 128 else dev.reshape(-1, 128)
    raise KeyError(spec)  # pragma: no cover - programming error


@functools.partial(jax.jit, static_argnames=("layout",))
def _apply_packed_deltas(mirrors, carrier, layout):
    """Apply EVERY pending mirror delta in one device execution: `carrier`
    is the frame's packed uploads concatenated into a single f32 vector
    (one transfer), `layout` the static (offset, bucket, width, view
    specs) of each mirror's segment.  Remote platforms charge a fixed
    per-execution cost (tunnel RPC), so N scatters as one program is the
    difference between ~1 ms and ~N ms of device overhead per dynamic
    frame.  The registered views (row slices the consumers want) compute
    in the SAME program — steady-state frames then issue zero eager
    slice ops."""
    outs = []
    views = []
    for buf, (off, b, r, specs) in zip(mirrors, layout):
        seg = carrier[off:off + b * r].reshape(b, r)
        rows = seg[:, 0].astype(jnp.int32)
        new = buf.at[rows].set(seg[:, 1:].astype(buf.dtype))
        outs.append(new)
        views.append(tuple(_mirror_view(new, s) for s in specs))
    return tuple(outs), tuple(views)


class _DeltaStore:
    """Persistent device mirrors of the per-frame flat arrays with
    row-delta uploads — the renderer/upload.rs PBO-pool role re-imagined
    for XLA: instead of re-uploading ~2.5 MB of GPU buffer + instance
    records every dynamic frame, keep capacity-padded device copies and
    `at[rows].set` only the rows whose bytes changed (typical scroll
    frame: a few transform rows + the moved prims' payloads).  Capacity
    padding also makes the consumer kernels' input shapes frame-stable,
    eliminating per-frame recompiles for growing scenes."""

    # pow2 bucket for the changed-row count: bounds distinct jit variants
    _BUCKETS = [1 << i for i in range(20)]

    def __init__(self):
        self._entries: Dict = {}
        self._consts: Dict = {}
        # deferred row-deltas: put() packs them host-side, the first view
        # of any mirror flushes ALL of them in one device execution
        self._pending: List = []

    def put(self, key, host: np.ndarray):
        """host: [n, R] (2-D) array → device array [cap, R] (cap = pow2
        ≥ n, sticky across frames).  Returns the device mirror."""
        n, R = host.shape
        cap = 1 << max(3, int(np.ceil(np.log2(max(n, 1)))))
        if any(k == key for k, _ in self._pending):
            self.flush()  # two puts to one mirror in one frame: serialize
        ent = self._entries.get(key)
        if ent is not None and (ent["cap"] < n or ent["R"] != R or
                                ent["dtype"] != host.dtype):
            ent = None
        if ent is None:
            cap = max(cap, 8)
            padded = np.zeros((cap, R), host.dtype)
            padded[:n] = host
            dev = jnp.asarray(padded)
            self._entries[key] = {"cap": cap, "R": R, "host": padded,
                                  "scratch": np.zeros((cap, R), host.dtype),
                                  "n": n, "dev": dev, "dtype": host.dtype,
                                  "last_changed": None, "rev": 0,
                                  "views": {}}
            return dev
        prev = ent["host"]
        cap = ent["cap"]
        # double-buffered host mirror: copy into the scratch buffer and
        # zero only the tail the previous frame used — a fresh np.zeros
        # of a multi-MB mirror every frame was measurable on 1-core hosts
        cur = ent["scratch"]
        cur[:n] = host
        if ent["n"] > n:
            cur[n:ent["n"]] = 0
        ent["n"] = n
        changed = np.nonzero((prev != cur).any(axis=1))[0]
        ent["last_changed"] = changed
        if changed.size == 0:
            ent["scratch"] = prev
            ent["host"] = cur
            return ent["dev"]
        k = changed.size
        small = k <= cap // 2
        if small:
            # bucket floor 64: typical deltas (a scroll's few rows) always
            # land in ONE jit variant per mirror — unbounded bucket sizes
            # were recompiling the scatter mid-animation
            bucket = max(64, 1 << int(np.ceil(np.log2(max(k, 1)))))
            bucket = min(bucket, cap)
            # the fused carrier rides f32: row values must survive the
            # round-trip exactly (int32 magnitudes < 2^24 do)
            if host.dtype != np.float32 and np.abs(cur[changed]).max() >= \
                    (1 << 24):
                small = False
        if not small:
            dev = jnp.asarray(cur)
            ent["dev"] = dev
            ent["rev"] += 1
        else:
            rows = np.resize(changed, bucket)
            # one packed upload: [k, 1 + R] with the row index in col 0
            # (f32 keeps indices exact below 2^24; caps stay far under)
            packed = np.empty((bucket, R + 1), np.float32)
            packed[:, 0] = rows.astype(np.float32)
            packed[:, 1:] = cur[rows]
            self._pending.append((key, packed))
            dev = None  # resolved at flush
        ent["scratch"] = prev
        ent["host"] = cur
        return dev

    def flush(self):
        """Apply every pending row-delta in ONE transfer + ONE execution."""
        if not self._pending:
            return
        pend, self._pending = self._pending, []
        parts = []
        layout = []
        keys = []
        off = 0
        for key, packed in pend:
            flat = packed.reshape(-1)
            parts.append(flat)
            specs = tuple(self._entries[key].get("specs", ()))
            layout.append((off, packed.shape[0], packed.shape[1], specs))
            keys.append(key)
            off += flat.size
        carrier = jnp.asarray(np.concatenate(parts)
                              if len(parts) > 1 else parts[0])
        mirrors = tuple(self._entries[k]["dev"] for k in keys)
        outs, views = _apply_packed_deltas(mirrors, carrier, tuple(layout))
        for k, dev, (_, _, _, specs), vs in zip(keys, outs, layout, views):
            ent = self._entries[k]
            ent["dev"] = dev
            ent["rev"] += 1
            for s, v in zip(specs, vs):
                ent["views"][s] = (ent["rev"], v)

    def dev(self, key):
        """The (flushed) device mirror for `key`."""
        self.flush()
        return self._entries[key]["dev"]

    def view(self, key, spec):
        """Derived device view of a mirror, cached per revision so an
        unchanged mirror costs ZERO device ops on re-use (each eager slice
        or reshape is a dispatch round-trip on tunneled devices).
        spec: ("rows", n) → dev[:n]; ("col0", n) → dev[:n, 0];
        ("flat",) → dev.reshape(-1); ("rows128",) → [*, 128] view."""
        ent = self._entries[key]
        ent.setdefault("specs", {})[spec] = True  # sticky: flush precomputes
        self.flush()
        hit = ent["views"].get(spec)
        if hit is not None and hit[0] == ent["rev"]:
            return hit[1]
        arr = _mirror_view(ent["dev"], spec)
        ent["views"][spec] = (ent["rev"], arr)
        return arr

    def last_changed(self, key):
        """Changed-row indices of the most recent put() for `key`: None =
        full upload / unknown (treat as all-changed), else the np index
        array (possibly empty)."""
        ent = self._entries.get(key)
        if ent is None:
            return None
        return ent.get("last_changed")

    def put_const(self, value: np.ndarray):
        """Device constant cache for small per-pass arrays that repeat
        across frames (clear colors, tile origins): keyed by content,
        uploaded once; bounded (dropped wholesale when it outgrows its
        cap — repopulating costs one upload each)."""
        key = (value.shape, value.dtype.str, value.tobytes())
        dev = self._consts.get(key)
        if dev is None:
            if len(self._consts) > 512:
                self._consts.clear()
            dev = jnp.asarray(value)
            self._consts[key] = dev
        return dev


@functools.partial(jax.jit, donate_argnums=(0,))
def _upload_color(atlas, texels, x: int, y: int):
    # texels arrive (h, w, 4); atlas is planar [4, H, W]
    planar = jnp.transpose(texels, (2, 0, 1))
    return jax.lax.dynamic_update_slice(atlas, planar, (0, y, x))


@functools.partial(jax.jit, donate_argnums=(0,))
def _upload_alpha(atlas, texels, x: int, y: int):
    return jax.lax.dynamic_update_slice(atlas, texels, (y, x))


def _quantize_unorm8(img):
    """The reference's offscreen surfaces are RGBA8 render targets.
    Quantization uses the tie-nudged round (ops/blend.py quantize_cov
    rationale): surface contents flow from div/sqrt/exp math whose TPU
    results differ from the host by ULPs, so exact-half ties must round
    identically on every backend (swgl's round-half-even differs from
    this only AT exact odd ties — sub-visible vs the PNG corpus, decisive
    for the device==oracle gate)."""
    return jnp.clip(jnp.rint(img * 255.0), 0.0, 255.0) * (1.0 / 255.0)


@functools.partial(jax.jit, donate_argnums=(0,),
                   static_argnames=("nx", "ny", "w", "h", "quantize"))
def _write_region(target, tiles, *, nx: int, ny: int, w: int, h: int,
                  x: int = 0, y: int = 0, quantize: bool = False):
    img = assemble_tiles(tiles, nx, ny, w, h)
    if quantize:
        img = _quantize_unorm8(img)
    return jax.lax.dynamic_update_slice(target, img, (0, y, x))


@functools.partial(jax.jit, static_argnames=("to_linear",))
def _apply_srgb(src, to_linear: bool):
    """Float srgb<->linear on straight rgb (blend.glsl:110-120); used for
    SVGFE linearRGB intermediates where a u8 LUT would lose precision."""
    if to_linear:
        return blend_mod.premult_srgb_to_linear(jnp, src)
    return blend_mod.premult_linear_to_srgb(jnp, src)


@functools.partial(jax.jit, static_argnames=("linear",))
def _apply_arith(a, b, k, linear: bool):
    """feComposite arithmetic (cs_svg_filter.glsl composite():503): the
    reference computes k1·Cs·Cb + k2·Cs + k3·Cb + k4 on UNPREMULTIPLIED
    inputs and stores the clamped result as premultiplied."""
    def unpremult(c):
        safe = jnp.where(c[3] > 1e-6, c[3], 1.0)
        return jnp.stack([c[0] / safe, c[1] / safe, c[2] / safe, c[3]], 0)
    if linear:
        a = blend_mod.premult_srgb_to_linear(jnp, a)
        b = blend_mod.premult_srgb_to_linear(jnp, b)
    a, b = unpremult(a), unpremult(b)
    out = jnp.clip(k[0] * a * b + k[1] * a + k[2] * b + k[3], 0.0, 1.0)
    if linear:
        out = blend_mod.premult_linear_to_srgb(jnp, out)
    return out


@functools.partial(jax.jit)
def _apply_color_matrix_pass(src, m20):
    """blend.glsl CalculateFilter default case (color-matrix filters) on a
    premultiplied source region; the caller's _copy_region quantizes the
    result at the RGBA8 target write like brush_blend's output."""
    from ..ops import patterns as pk
    return pk.apply_color_matrix(jnp, src, m20, jnp.float32(1.0))


@functools.partial(jax.jit)
def _apply_channel_lut(src, lut):
    """Per-channel 256-entry LUT on straight-alpha values (component
    transfer / srgb conversion filters)."""
    a = src[3]
    safe = jnp.where(a > 1e-6, a, 1.0)
    straight = jnp.stack([src[0] / safe, src[1] / safe, src[2] / safe, a], 0)
    # the unpremultiplied intermediate is quantized to u8 in the reference
    # (SVG filter targets are RGBA8), so the LUT index is exact
    idx = jnp.clip(jnp.rint(straight * 255.0).astype(jnp.int32), 0, 255)
    out = jnp.stack([lut[c][idx[c]] for c in range(4)], 0)
    na = out[3]
    return jnp.stack([out[0] * na, out[1] * na, out[2] * na, na], 0)


@functools.partial(jax.jit, static_argnames=("dw", "dh", "gl"))
def _downscale2x(src, dw: int, dh: int, gl: bool = False):
    """cs_scale.glsl via swgl's fixed-point bilinear (ops.raster
    .resample_bilinear): a truncating 2x2 average at exact halving,
    fractional for truncated target sizes (RenderTask::new_scaling).
    `gl` = llvmpipe's bilinear (gl_flavor chains; probe-verified)."""
    from ..ops.raster import resample_bilinear, resample_bilinear_gpu
    if gl:
        return resample_bilinear_gpu(jnp, src, dw, dh)
    return resample_bilinear(jnp, src, dw, dh)


@functools.partial(jax.jit, static_argnames=("sigma", "axis", "bw", "bh"))
def _blur_region_gpu_dev(src, *, sigma: float, axis: int, bw: int, bh: int):
    """gl_flavor blur pass: cs_blur under llvmpipe (integer-lerp taps,
    tools/glblur_check-verified) — jitted; sigma is static (few distinct
    values per scene)."""
    from ..ops.raster import blur_region_gpu
    return blur_region_gpu(jnp, src, sigma, axis, bw, bh)


@functools.partial(jax.jit, static_argnames=("nx", "ny"))
def _disassemble(img, *, nx: int, ny: int):
    return disassemble_tiles(img, nx, ny)


@functools.partial(jax.jit, static_argnames=("nx", "ny", "w", "h"))
def _assemble(tiles, *, nx: int, ny: int, w: int, h: int):
    return assemble_tiles(tiles, nx, ny, w, h)


@functools.partial(jax.jit, donate_argnums=(0,))
def _copy_region(dst, src_img, x: int, y: int):
    return jax.lax.dynamic_update_slice(dst, _quantize_unorm8(src_img),
                                        (0, y, x))


@functools.partial(jax.jit, donate_argnums=(0,), static_argnames=("w", "h"))
def _slice_composite(fb, img, dst_x, dst_y, src_x, src_y, *, w: int, h: int):
    """src-over a picture-cache slice region onto the framebuffer
    (composite.rs draw-compositor tile draw)."""
    src = jax.lax.dynamic_slice(img, (0, src_y, src_x), (4, h, w))
    dst = jax.lax.dynamic_slice(fb, (0, dst_y, dst_x), (4, h, w))
    # swgl integer src-over (blend.h:473): u8-domain exact in f32
    s8 = jnp.floor(src * 255.0 + 0.5)
    d8 = jnp.floor(dst * 255.0 + 0.5)
    a8 = jnp.broadcast_to(s8[3:4], s8.shape)
    out8 = s8 + d8 - jnp.floor((d8 * a8 + d8) * (1.0 / 256.0))
    out = jnp.clip(out8, 0.0, 255.0) * (1.0 / 255.0)
    return jax.lax.dynamic_update_slice(fb, out, (0, dst_y, dst_x))


class Renderer:
    """Owns the HBM atlas arrays + framebuffer (`device/gl.rs` Device role).

    `use_pallas`: run supported raster passes through the Pallas tile kernel
    (ops/pallas/tile_raster.py); unsupported passes fall back to the XLA
    path. Defaults on for TPU backends."""

    def __init__(self,
                 color_atlas_size=(4096, 4096),
                 alpha_atlas_size=(2048, 2048),
                 surface_atlas_size=(2048, 4096),
                 use_pallas: Optional[bool] = None,
                 mesh=None,
                 pallas_interpret: bool = False):
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas
        # run the Pallas kernel in interpret mode (CPU mesh dryruns — the
        # driver validates the production kernel's sharding without chips)
        self.pallas_interpret = pallas_interpret
        # multi-chip: a 1-D jax.sharding.Mesh shards raster passes by tiles
        # and large blurs by rows (parallel/mesh.py — the sw_compositor.rs
        # tile-band worker model mapped onto devices)
        self.mesh = mesh
        self.picture_caching = True  # dirty-tile skipping (picture.rs role)
        self.color_atlas = jnp.zeros((4,) + color_atlas_size, jnp.float32)
        self.alpha_atlas = jnp.zeros(alpha_atlas_size, jnp.float32)
        self.surface_atlas_size = surface_atlas_size
        self.surface_atlas = jnp.zeros((4,) + surface_atlas_size, jnp.float32)
        # host mirrors for the CPU fidelity oracle
        self.color_atlas_host = np.zeros((4,) + color_atlas_size, np.float32)
        self.alpha_atlas_host = np.zeros(alpha_atlas_size, np.float32)
        # picture cache state: persistent root tile grid + content hashes
        self._root_tiles = None
        self._root_fb = None
        # DebugFlags bitmask (util/options.py); bit 0 = PROFILER_DBG
        self.debug_flags = 0
        self.profiler = None
        # lib.rs set_crash_annotator role
        self.crash_annotator = None
        # (pass label, device ms) samples of the last timed frame
        # (GpuProfiler.frames analog)
        self.gpu_timers: List[Tuple[str, float]] = []
        self.last_framebuffer = None
        self._root_hashes = None
        self._root_shape = None
        self.last_dirty_tiles = -1  # PictureCacheDebugInfo analog
        self.last_dirty_rect = None  # partial-present damage (device px)
        # per-pass engine evidence: which raster engine ran each pass
        # (pallas / xla / sharded) — exported by bench + reftest artifacts
        self.last_engine = None
        self.engine_counts: Dict[str, int] = {}
        # picture-cache slices (tile_cache.rs): persistent per-slice
        # content-space tile grids + hashes, keyed by slice identity
        self._slices: Dict[Tuple, Dict] = {}
        self.slice_debug: List[Dict] = []  # PictureCacheDebugInfo analog
        # partial-present retention (composite.rs PartialPresentCompositor
        # :1366 role): an unchanged frame — same content signature, no new
        # uploads — returns the retained framebuffer with ZERO device work,
        # the analog of presenting the old buffer with an empty dirty rect
        self._fb_sig = None
        self._fb_retained = None
        self._upload_epoch = 0
        # persistent device mirrors + row-delta uploads of per-frame
        # arrays (upload.rs staging-PBO pool role)
        self._delta = _DeltaStore()
        self._pass_seq = 0
        # persistent per-pass dense-record mirrors (incremental gather)
        self._dense_mirrors: Dict = {}
        # incremental per-instance Pallas-eligibility / dense-kind caches:
        # both are row-independent classifications, so a dynamic frame
        # recomputes only the rows its delta touched (4K scroll: a few
        # dozen of ~4096 instances instead of the full _supported_vec
        # sweep every frame — measurable on 1-core hosts)
        self._elig_cache = None
        # mirror-coherence bookkeeping: which frame the delta mirrors hold,
        # and a render counter for dense-mirror freshness (_dense_records)
        self._last_put_frame = None
        self._render_seq = 0
        # async screenshot grabber state (screen_capture.rs:55)
        self._screenshot_seq = 0
        self._pending_screenshots: Dict[int, object] = {}

    # ------------------------------------------------------------------
    def apply_uploads(self, uploads: List[PendingUpload]) -> None:
        """renderer/upload.rs role: push pending texel updates into HBM."""
        if uploads:
            self._upload_epoch += 1
        for up in uploads:
            r = up.region
            if up.atlas == ATLAS_COLOR:
                tex = np.ascontiguousarray(up.texels, np.float32)
                self.color_atlas = _upload_color(
                    self.color_atlas, jnp.asarray(tex), r.x, r.y)
                self.color_atlas_host[:, r.y:r.y + tex.shape[0],
                                      r.x:r.x + tex.shape[1]] = \
                    np.transpose(tex, (2, 0, 1))
            elif up.atlas == ATLAS_ALPHA:
                tex = np.ascontiguousarray(up.texels, np.float32)
                self.alpha_atlas = _upload_alpha(
                    self.alpha_atlas, jnp.asarray(tex), r.x, r.y)
                self.alpha_atlas_host[r.y:r.y + tex.shape[0],
                                      r.x:r.x + tex.shape[1]] = tex

    # ------------------------------------------------------------------
    def render_device(self, frame: Frame,
                      resources: Optional[ResourceCache] = None):
        """Execute all passes; returns the HBM-resident framebuffer
        [4, h, w] f32 premultiplied (no host readback — production
        compositing stays on device)."""
        if resources is not None:
            self.apply_uploads(resources.take_uploads())
        sig = None
        if self.picture_caching:
            sig = self._frame_signature(frame)
            if sig == self._fb_sig and self._fb_retained is not None:
                # unchanged frame: empty dirty rect — present the retained
                # buffer (no dispatches, no transfers)
                self.last_dirty_tiles = 0
                self.slice_debug = [{"key": p.slice_key, "dirty": 0,
                                     "total": p.cache_nx * p.cache_ny}
                                    for p in frame.passes
                                    if p.slice_key is not None]
                return self._fb_retained
        # grow the surface atlas if the frame's FrameAtlas overflowed the
        # current array (pow2-bucketed; per-frame content, so fresh zeros)
        if frame.surface_rows > self.surface_atlas.shape[1]:
            self.surface_atlas = jnp.zeros(
                (4, frame.surface_rows, self.surface_atlas.shape[2]),
                jnp.float32)
        # device copies of the frame's flat arrays are cached on the frame:
        # re-rendering the same frame must not re-upload ~2.5 MB per call.
        # Fresh frames go through the delta store: persistent capacity-
        # padded device mirrors, row-delta uploads (upload.rs PBO role)
        dev = getattr(frame, "_dev_arrays", None)
        self._render_seq += 1
        if dev is None or self._last_put_frame is not frame:
            nf = frame.f32_buf.shape[0]
            f32_2d = frame.f32_buf.reshape(-1, 128) if nf % 128 == 0 \
                else frame.f32_buf.reshape(-1, 1)
            # puts only PACK the row deltas; the first consumer flushes
            # them together with the per-pass tile-list deltas in one
            # fused device execution (see _DeltaStore.flush).  Re-puts on
            # every frame switch keep the mirrors coherent with THIS
            # frame (rendering an older frame rolls the rows back).
            self._delta.put("f32", f32_2d)
            self._delta.put("inst", frame.instances)
            self._delta.put("xf", frame.transforms)
            frame._f32_row_unit = f32_2d.shape[1]
            frame._addr_aligned = bool(nf % 128 == 0) and bool(
                frame.instances.shape[0] == 0
                or (frame.instances[:, INST_PRIM_ADDR] % 128 == 0).all())
            frame._changed_inst_mask = self._changed_instance_mask(frame)
            if dev is None:
                self._refresh_instance_caches(frame)
                frame._dev_arrays = "delta"
            self._last_put_frame = frame
        # device views resolve lazily in _dispatch_raster (after that
        # pass's own delta puts, so one flush covers everything)
        f32_buf = instances = transforms = None
        framebuffer = None
        self.slice_debug = []
        # per-pass device timing (device/query_gl.rs GpuProfiler role):
        # under GPU_TIME_QUERIES each pass blocks on its output and the
        # wall time is attributed to the pass kind — adds sync overhead,
        # debug-flag gated like the reference's timer queries
        from ..util.options import DebugFlags
        timing = bool(self.debug_flags & DebugFlags.GPU_TIME_QUERIES)
        if timing:
            import time as _time
            self.gpu_timers = []
            jax.block_until_ready(transforms)
            _t_last = _time.perf_counter()

        def _tick(label, out_array):
            nonlocal _t_last
            jax.block_until_ready(out_array)
            now = _time.perf_counter()
            self.gpu_timers.append((label, (now - _t_last) * 1000.0))
            _t_last = now
        if any(q.slice_key is not None for q in frame.passes):
            self.last_dirty_tiles = -1
        self._pass_seq = 0
        passes = frame.passes if self.picture_caching \
            else self._merged_root_passes(frame)
        for p in passes:
            if p.kind == PASS_RASTER:
                framebuffer = self._run_raster(
                    p, frame, f32_buf, instances, transforms, framebuffer)
            elif p.kind in (PASS_BLUR_H, PASS_BLUR_V):
                # swgl chain even under gl_flavor (see oracle/sw.py note)
                self._run_blur(p)
            elif p.kind == PASS_COPY:
                sx, sy, sw, sh = p.src_region
                dx, dy, dw, dh = p.region
                src_arr = framebuffer if p.src_target == TARGET_ROOT \
                    else self.surface_atlas
                src = jax.lax.dynamic_slice(src_arr, (0, sy, sx), (4, sh, sw))
                if dw > sw or dh > sh:
                    # transparent-padded copy (render_task.rs:2290 SVGFE
                    # blur input padding)
                    src = jnp.pad(src, ((0, 0), (0, max(0, dh - sh)),
                                        (0, max(0, dw - sw))))
                self.surface_atlas = _copy_region(self.surface_atlas, src,
                                                  dx, dy)
            elif p.kind == PASS_CHANNEL_LUT:
                sx, sy, sw, sh = p.src_region
                dx, dy, _, _ = p.region
                src = jax.lax.dynamic_slice(self.surface_atlas, (0, sy, sx),
                                            (4, sh, sw))
                out = _apply_channel_lut(src, jnp.asarray(p.lut))
                self.surface_atlas = _copy_region(self.surface_atlas, out,
                                                  dx, dy)
            elif p.kind == PASS_COLOR_MATRIX:
                sx, sy, sw, sh = p.src_region
                dx, dy, _, _ = p.region
                src = jax.lax.dynamic_slice(self.surface_atlas, (0, sy, sx),
                                            (4, sh, sw))
                out = _apply_color_matrix_pass(
                    src, jnp.asarray(p.color_matrix, jnp.float32))
                self.surface_atlas = _copy_region(self.surface_atlas, out,
                                                  dx, dy)
            elif p.kind == PASS_SRGB:
                sx, sy, sw, sh = p.src_region
                dx, dy, _, _ = p.region
                src = jax.lax.dynamic_slice(self.surface_atlas, (0, sy, sx),
                                            (4, sh, sw))
                out = _apply_srgb(src, to_linear=p.srgb_to_linear)
                self.surface_atlas = _copy_region(self.surface_atlas, out,
                                                  dx, dy)
            elif p.kind == PASS_ARITH:
                ax, ay, sw, sh = p.src_region
                bx, by, _, _ = p.src_region2
                dx, dy, _, _ = p.region
                a = jax.lax.dynamic_slice(self.surface_atlas, (0, ay, ax),
                                          (4, sh, sw))
                b = jax.lax.dynamic_slice(self.surface_atlas, (0, by, bx),
                                          (4, sh, sw))
                out = _apply_arith(a, b, jnp.asarray(p.kvals, jnp.float32),
                                   linear=p.arith_linear)
                self.surface_atlas = _copy_region(self.surface_atlas, out,
                                                  dx, dy)
            elif p.kind == PASS_DOWNSCALE:
                sx, sy, sw, sh = p.src_region
                dx, dy, dw, dh = p.region
                src = jax.lax.dynamic_slice(self.surface_atlas, (0, sy, sx),
                                            (4, sh, sw))
                out = _downscale2x(src, dw, dh)
                self.surface_atlas = _copy_region(self.surface_atlas, out,
                                                  dx, dy)
            else:
                raise ValueError(p.kind)
            if timing:
                _tick(PASS_NAMES.get(p.kind, str(p.kind)),
                      framebuffer if framebuffer is not None
                      else self.surface_atlas)
        if timing and self.profiler is not None:
            total = sum(ms for _, ms in self.gpu_timers)
            self.profiler.set("gpu_time", total)
        if sig is not None and framebuffer is not None:
            self._fb_sig = sig
            self._fb_retained = framebuffer
        return framebuffer

    def _merged_root_passes(self, frame: Frame) -> List[RenderPass]:
        """With picture caching off, the slice pre/slice/post split of the
        root target is pure overhead: merge consecutive root raster passes
        (same region/origin/step, later ones continuations) into ONE pass
        whose per-tile instance lists concatenate in painter order — one
        kernel launch instead of three full-grid launches."""
        cached = getattr(frame, "_merged_passes", None)
        if cached is not None:
            return cached
        import dataclasses as _dc
        out: List[RenderPass] = []
        for p in frame.passes:
            prev = out[-1] if out else None
            if (prev is not None and p.kind == PASS_RASTER
                    and prev.kind == PASS_RASTER
                    and p.target == TARGET_ROOT
                    and prev.target == TARGET_ROOT
                    and p.region == prev.region and p.origin == prev.origin
                    and p.raster_step == prev.raster_step
                    and p.clear is None and p.tile_insts is not None
                    and prev.tile_insts is not None):
                cat = np.concatenate([prev.tile_insts, p.tile_insts], axis=1)
                # left-compact (the kernel loops the first `cnt` slots)
                order = np.argsort(cat < 0, axis=1, kind="stable")
                packed = np.take_along_axis(cat, order, axis=1)
                maxc = int((packed >= 0).sum(1).max()) if packed.size else 1
                slots = 1 << max(3, int(np.ceil(np.log2(max(maxc, 1)))))
                if packed.shape[1] > slots:
                    packed = packed[:, :slots]
                out[-1] = _dc.replace(prev, tile_insts=packed,
                                      tile_hashes=None, slice_key=None,
                                      cache_insts=None, cache_hashes=None)
                continue
            out.append(p)
        frame._merged_passes = out
        return out

    def _frame_signature(self, frame: Frame):
        """Content signature of a frame's device-visible inputs.  Two frames
        with equal signatures (and no intervening uploads) render identical
        framebuffers — render_device is a pure function of (frame, atlases).
        Costs ~1 ms of siphash over the flat arrays; saves the whole
        dispatch+execute pipeline when content is static."""
        parts = [frame.f32_buf.tobytes(), frame.instances.tobytes(),
                 frame.transforms.tobytes(),
                 np.asarray(frame.fb_size).tobytes()]
        for p in frame.passes:
            parts.append(repr((p.kind, p.target, p.region, p.origin, p.clear,
                               p.src_region, p.src_target, p.sigma,
                               p.blur_region, p.srgb_to_linear, p.src_region2,
                               p.kvals, p.arith_linear, p.raster_step,
                               p.slice_key, p.cache_anchor, p.slice_delta,
                               p.cache_crop)).encode())
            if p.tile_insts is not None:
                parts.append(p.tile_insts.tobytes())
            if p.lut is not None:
                parts.append(p.lut.tobytes())
            if p.color_matrix is not None:
                parts.append(p.color_matrix.tobytes())
        return (self._upload_epoch, hash(b"\x00".join(parts)))

    def render(self, frame: Frame,
               resources: Optional[ResourceCache] = None) -> np.ndarray:
        """Execute all passes; returns premultiplied RGBA8 (h, w, 4)."""
        if resources is not None:
            self.apply_uploads(resources.take_uploads())

        framebuffer = self.render_device(frame)
        self.last_framebuffer = framebuffer  # screenshots (screen_capture)
        img = np.asarray(framebuffer)  # [4, H, W]
        rgba = np.transpose(img, (1, 2, 0))
        # unorm8 conversion in f64: GL's float->u8 rounds the exact product,
        # not an f32 intermediate (f32*255 can round 229.49999 up to 229.5);
        # ties round half-up like GL unorm conversion
        v = rgba.astype(np.float64) * 255.0
        out = np.clip(np.floor(np.nan_to_num(v) + 0.5), 0,
                      255).astype(np.uint8)
        from ..util.options import DebugFlags as _DF
        if self.debug_flags & _DF.PROFILER_DBG:
            from ..util.debug_overlay import draw_profiler_overlay
            prof = getattr(self, "profiler", None)
            counters = []
            if prof is not None:
                for name, budget in (("frame_build_time", 6.0),
                                     ("renderer_time", 8.0),
                                     ("scene_build_time", 4.0)):
                    val = prof.get(name)
                    if val is not None:
                        counters.append((name, float(val), budget))
            counters.append(("passes", float(len(frame.passes)), 0.0))
            counters.append(("instances", float(frame.instances.shape[0]),
                             0.0))
            counters.append(("dirty tiles",
                             float(getattr(self, "last_dirty_tiles", 0) or 0),
                             0.0))
            out = np.ascontiguousarray(out)
            draw_profiler_overlay(out, counters)
        return out

    # ------------------------------------------------------------------
    def get_screenshot(self, rect=None, size=None) -> Optional[np.ndarray]:
        """screen_capture.rs AsyncScreenshotGrabber (:55): crop + scale the
        last rendered framebuffer on-device, read back RGBA8. The device
        resize happens asynchronously in the XLA stream; readback blocks
        like map_and_recycle_screenshot."""
        fb = self.last_framebuffer
        if fb is None:
            return None
        H, W = fb.shape[1], fb.shape[2]
        x, y, w, h = rect or (0, 0, W, H)
        crop = jax.lax.dynamic_slice(fb, (0, y, x), (4, h, w))
        if size is not None and (size[0] != w or size[1] != h):
            crop = jax.image.resize(crop, (4, size[1], size[0]), "linear")
        arr = np.asarray(crop)
        v = np.transpose(arr, (1, 2, 0)).astype(np.float64) * 255.0
        return np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint8)

    # ------------------------------------------------------------------
    def request_screenshot(self, rect=None, size=None) -> int:
        """screen_capture.rs AsyncScreenshotGrabber::get_screenshot (:130):
        enqueue the crop+scale on the device WITHOUT blocking — XLA's async
        dispatch is the natural PBO here — and hand back a handle.  The
        expensive readback happens only when the caller maps the handle
        (map_and_recycle_screenshot), so profiler-driven capture never
        stalls the frame loop."""
        fb = self.last_framebuffer
        if fb is None:
            return -1
        H, W = fb.shape[1], fb.shape[2]
        x, y, w, h = rect or (0, 0, W, H)
        crop = jax.lax.dynamic_slice(fb, (0, y, x), (4, h, w))
        if size is not None and (size[0] != w or size[1] != h):
            crop = jax.image.resize(crop, (4, size[1], size[0]), "linear")
        handle = self._screenshot_seq
        self._screenshot_seq += 1
        self._pending_screenshots[handle] = crop  # device-resident, async
        return handle

    def map_screenshot(self, handle: int) -> Optional[np.ndarray]:
        """Blocking readback of a previously requested screenshot; the
        handle is recycled (screen_capture.rs map_and_recycle_screenshot)."""
        crop = self._pending_screenshots.pop(handle, None)
        if crop is None:
            return None
        arr = np.asarray(crop)
        v = np.transpose(arr, (1, 2, 0)).astype(np.float64) * 255.0
        return np.clip(np.floor(v + 0.5), 0, 255).astype(np.uint8)

    # ------------------------------------------------------------------
    def _pass_dispatch_sets(self, p: RenderPass, frame: Frame):
        cached = getattr(p, "_dispatch_sets", None)
        if cached is not None:
            return cached
        ids = p.tile_insts[p.tile_insts >= 0]
        if ids.size == 0:
            sets = ((0,), (0,))
        else:
            used = frame.instances[np.unique(ids)]
            kinds = tuple(np.unique(used[:, INST_KIND]).astype(int).tolist())
            blends = tuple(np.unique(used[:, INST_BLEND]).astype(int)
                           .tolist())
            sets = (kinds, blends)
        p._dispatch_sets = sets
        return sets

    def _tile_origins(self, p: RenderPass) -> np.ndarray:
        ox, oy = p.origin
        ys, xs = np.mgrid[0:p.ny, 0:p.nx]
        step = p.raster_step
        origins = np.stack([ox + xs.reshape(-1) * TILE_W * step,
                            oy + ys.reshape(-1) * TILE_H * step], axis=1)
        return origins.astype(np.float32)

    def _dispatch_raster(self, frame: Frame, f32_buf, instances, transforms,
                         tile_insts: np.ndarray, origins: np.ndarray, clear,
                         kinds, blends, step: float = 1.0,
                         dense_cache_holder=None, allow_pallas: bool = True):
        """Run one raster pass over `tile_insts`, routed to the best engine:
        multi-chip sharded (mesh set), Pallas (supported + TPU), or the XLA
        fallback.  Returns [nt, 4, TH, TW] tiles; records the engine used in
        `self.last_engine` (device-correctness evidence for artifacts).

        frame.gl_flavor threads through to every engine as a static `gl`
        flag (GL-pipeline reftest lines): the llvmpipe blend/mask math
        compiles as distinct kernel variants on all backends, matching the
        numpy oracle's flavor decision (oracle/sw.py:204)."""
        gl = bool(getattr(frame, "gl_flavor", False))
        use_pallas = False
        tile_mask = None
        if self.use_pallas and allow_pallas and step == 1.0:
            from ..ops.pallas.tile_raster import (
                build_dense_records_device, classify_dense_kinds,
                dense_dispatch_info, pallas_supported_mask,
                render_tiles_pallas_dense)
            cached_split = getattr(dense_cache_holder, "_split_cache",
                                   None) if dense_cache_holder is not None \
                else None
            if cached_split is not None:
                tile_mask = cached_split[0]
            else:
                inst_ok = getattr(frame, "_pallas_inst_ok", None)
                if inst_ok is None:
                    from ..ops.pallas.tile_raster import _supported_vec
                    inst_ok = _supported_vec(frame.instances,
                                             frame.transforms,
                                             frame.f32_buf)
                    frame._pallas_inst_ok = inst_ok
                tile_mask = pallas_supported_mask(
                    frame.instances, tile_insts, frame.transforms,
                    frame.f32_buf, inst_ok=inst_ok)
            use_pallas = bool(tile_mask.all())
        if not use_pallas and tile_mask is not None and tile_mask.any() \
                and self.mesh is None:
            # tile-level engine split (VERDICT r2 #8): only the tiles a
            # non-expressible instance (e.g. a rotated image) touches fall
            # back to XLA; every other tile stays on the Pallas kernel.
            # Tiles are independent so painter order is unaffected.
            sub_p = np.nonzero(tile_mask)[0]
            sub_x = np.nonzero(~tile_mask)[0]
            if dense_cache_holder is not None:
                if cached_split is None:
                    cached_split = (tile_mask, _CacheHolder(), _CacheHolder())
                    dense_cache_holder._split_cache = cached_split
                hold_p, hold_x = cached_split[1], cached_split[2]
            else:
                hold_p = hold_x = None
            clr_p = clear if clear.ndim == 1 else clear[sub_p]
            clr_x = clear if clear.ndim == 1 else clear[sub_x]
            out_p = self._dispatch_raster(
                frame, f32_buf, instances, transforms, tile_insts[sub_p],
                origins[sub_p], clr_p, kinds, blends, step,
                dense_cache_holder=hold_p, allow_pallas=True)
            out_x = self._dispatch_raster(
                frame, f32_buf, instances, transforms, tile_insts[sub_x],
                origins[sub_x], clr_x, kinds, blends, step,
                dense_cache_holder=hold_x, allow_pallas=False)
            self.last_engine = "pallas+xla-split"
            self.engine_counts["pallas+xla-split"] = \
                self.engine_counts.get("pallas+xla-split", 0) + 1
            out = jnp.zeros((tile_insts.shape[0],) + tuple(out_p.shape[1:]),
                            jnp.float32)
            return out.at[jnp.asarray(sub_p)].set(out_p) \
                      .at[jnp.asarray(sub_x)].set(out_x)
        # continuation passes carry per-tile initial contents ([nt,4,TH,TW])
        # instead of a scalar clear — the Pallas kernel takes them as
        # init_tiles so these passes stay on the production engine (the
        # XLA fallback for text-heavy continuation passes was both ~100x
        # slower and crashed the remote worker on 4K scenes)
        init = None
        if hasattr(clear, "ndim") and clear.ndim != 1:
            init = jnp.asarray(clear)
        clr1 = jnp.zeros(4, jnp.float32) if init is not None else clear
        if use_pallas:
            cached = getattr(dense_cache_holder, "_dense_cache", None) \
                if dense_cache_holder is not None else None
            if cached is None:
                dk = getattr(frame, "_dense_kinds", None)
                if dk is None:
                    dk = classify_dense_kinds(
                        frame.f32_buf, frame.instances, frame.transforms)
                    frame._dense_kinds = dk
                # dense records are gathered ON DEVICE from the compact
                # frame arrays (host builds were the dynamic-content
                # bottleneck: ~nt·slots·512B per frame over PCIe); the
                # tile lists and dense kinds ride the delta store, so a
                # scroll frame transfers only its re-binned tile rows
                seq = self._pass_seq
                self._pass_seq += 1
                nt_, slots_ = tile_insts.shape
                ti_key = ("ti", seq, slots_)
                counts = (tile_insts >= 0).sum(1).astype(np.int32)
                # all puts BEFORE any view/resolve: the frame mirrors and
                # this pass's tile lists flush in ONE device execution
                self._delta.put(ti_key, np.ascontiguousarray(tile_insts))
                self._delta.put(("dk",), dk.reshape(-1, 1))
                self._delta.put(("cnt", seq), counts.reshape(-1, 1))
                if f32_buf is None:
                    f32_buf, instances, transforms = self._resolve_mirrors()
                ti_dev = self._delta.view(ti_key, ("rows", nt_))
                dk_dev = self._delta.view(("dk",), ("col0", dk.shape[0]))
                cnt_dev = self._delta.view(("cnt", seq),
                                           ("col0", counts.shape[0]))
                dense = self._dense_records(
                    frame, f32_buf, instances, transforms, tile_insts,
                    ti_dev, dk, dk_dev, ti_key, seq)
                pk, pb, mask_clips = dense_dispatch_info(
                    frame.f32_buf, frame.instances, tile_insts, dk)
                cached = (dense, cnt_dev, pk, pb, mask_clips)
                if dense_cache_holder is not None:
                    dense_cache_holder._dense_cache = cached
            if f32_buf is None:
                f32_buf, instances, transforms = self._resolve_mirrors()
            if self.mesh is not None and \
                    tile_insts.shape[0] >= self.mesh.devices.size:
                from ..parallel.mesh import render_tiles_pallas_sharded
                self.last_engine = "pallas-sharded"
                self.engine_counts["pallas-sharded"] = \
                    self.engine_counts.get("pallas-sharded", 0) + 1
                return render_tiles_pallas_sharded(
                    self.mesh, cached[0], cached[1],
                    self._delta.put_const(origins),
                    clr1, self._f32_rows128(f32_buf), self.alpha_atlas,
                    self.surface_atlas, self.color_atlas, init,
                    kinds=cached[2], blends=cached[3],
                    mask_clips=cached[4],
                    interpret=self.pallas_interpret, gl=gl)
            self.last_engine = "pallas"
            self.engine_counts["pallas"] = \
                self.engine_counts.get("pallas", 0) + 1
            return render_tiles_pallas_dense(
                cached[0], cached[1], self._delta.put_const(origins), clr1,
                self._f32_rows128(f32_buf), self.alpha_atlas,
                self.surface_atlas, self.color_atlas, init,
                kinds=cached[2], blends=cached[3], mask_clips=cached[4],
                interpret=self.pallas_interpret, gl=gl)
        if f32_buf is None:
            f32_buf, instances, transforms = self._resolve_mirrors()
        if self.mesh is not None and \
                tile_insts.shape[0] >= self.mesh.devices.size:
            from ..parallel.mesh import render_tiles_sharded
            self.last_engine = "sharded"
            self.engine_counts["sharded"] = \
                self.engine_counts.get("sharded", 0) + 1
            return render_tiles_sharded(
                self.mesh, f32_buf, instances, transforms, tile_insts,
                origins, clear, self.color_atlas, self.alpha_atlas,
                self.surface_atlas, kinds=kinds, blends=blends, step=step,
                gl=gl)
        self.last_engine = "xla"
        self.engine_counts["xla"] = self.engine_counts.get("xla", 0) + 1
        # bound a single XLA dispatch: the fallback engine's gather-based
        # sampling can run seconds per 128 tiles on text/image-heavy
        # passes, and one multi-minute device program trips the remote
        # worker's watchdog (observed as "TPU worker crashed" on 1020-tile
        # 4K dispatches).  Chunks reuse one compiled program via padding.
        MAX_XLA_TILES = 128
        nt_ = tile_insts.shape[0]
        if nt_ <= MAX_XLA_TILES:
            return render_tiles(
                f32_buf, instances, transforms, jnp.asarray(tile_insts),
                self._delta.put_const(np.asarray(origins, np.float32)),
                clear, self.color_atlas,
                self.alpha_atlas, self.surface_atlas, kinds=kinds,
                blends=blends, step=step, gl=gl)
        outs = []
        for s in range(0, nt_, MAX_XLA_TILES):
            e = min(s + MAX_XLA_TILES, nt_)
            ti = tile_insts[s:e]
            og = origins[s:e]
            cl = clear if clear.ndim == 1 else clear[s:e]
            pad = MAX_XLA_TILES - (e - s)
            if pad:
                ti = np.concatenate(
                    [ti, np.full((pad, ti.shape[1]), -1, ti.dtype)], 0)
                og = np.concatenate([og, np.zeros((pad, 2), np.float32)], 0)
                if cl.ndim != 1:
                    cl = jnp.concatenate(
                        [cl, jnp.zeros((pad,) + tuple(cl.shape[1:]),
                                       jnp.float32)], 0)
            out = render_tiles(
                f32_buf, instances, transforms, jnp.asarray(ti),
                jnp.asarray(og), cl, self.color_atlas, self.alpha_atlas,
                self.surface_atlas, kinds=kinds, blends=blends, step=step,
                gl=gl)
            outs.append(out[:e - s] if pad else out)
        return jnp.concatenate(outs, 0)

    def _resolve_mirrors(self):
        """Device views of the frame's delta mirrors (flushes any pending
        row-deltas — callers order their put()s first so one flush covers
        the frame arrays AND the per-pass tile lists)."""
        return (self._delta.view("f32", ("flat",)),
                self._delta.dev("inst"), self._delta.dev("xf"))

    def _f32_rows128(self, f32_buf):
        """[*, 128] view of the frame's GPU buffer for the Pallas kernels,
        via the delta store's revision cache when `f32_buf` is the store's
        own flat view (zero device ops on unchanged frames)."""
        ent = self._delta._entries.get("f32")
        if ent is not None:
            hit = ent["views"].get(("flat",))
            if hit is not None and hit[1] is f32_buf:
                return self._delta.view("f32", ("rows128",))
        return f32_buf.reshape(-1, 128)

    def _changed_instance_mask(self, frame):
        """Bool [N] marking instances whose device-visible inputs (record,
        payload/clip rows, transform row) changed since the previous frame's
        delta puts — or None when unknown (first frame, capacity growth, or
        a delta too large to be worth masking).  Computed once per
        render_device call, right after the frame's delta puts; consumers
        read `frame._changed_inst_mask`."""
        inst_ch = self._delta.last_changed("inst")
        f32_ch = self._delta.last_changed("f32")
        xf_ch = self._delta.last_changed("xf")
        m = None
        if (inst_ch is not None and f32_ch is not None and xf_ch is not None
                and f32_ch.size <= 256):
            N = frame.instances.shape[0]
            unit = getattr(frame, "_f32_row_unit", 128)
            m = np.zeros(N, bool)
            m[inst_ch[inst_ch < N]] = True
            if xf_ch.size:
                m |= np.isin(frame.instances[:, INST_SPATIAL], xf_ch)
            if f32_ch.size:
                pa = frame.instances[:, INST_PRIM_ADDR]
                m |= np.isin(pa // unit, f32_ch) | \
                    np.isin((pa + 63) // unit, f32_ch)
                c0 = frame.instances[:, INST_CLIP_ADDR] // unit
                cnt = frame.instances[:, INST_CLIP_COUNT] \
                    if unit == 128 else \
                    frame.instances[:, INST_CLIP_COUNT] * 128
                for r in f32_ch:
                    m |= (c0 <= r) & (r < c0 + cnt)
        return m

    def _refresh_instance_caches(self, frame):
        """Per-frame _pallas_inst_ok / _dense_kinds, incrementally: only the
        delta-changed rows re-classify (both checks are row-independent —
        ops/pallas/tile_raster._supported_vec / classify_dense_kinds)."""
        from ..ops.pallas.tile_raster import (_supported_vec,
                                              classify_dense_kinds)
        N = frame.instances.shape[0]
        m = getattr(frame, "_changed_inst_mask", None)
        cache = self._elig_cache
        if cache is not None and m is not None and cache["n"] == N:
            sub = np.nonzero(m)[0]
            if sub.size:
                cache["ok"][sub] = _supported_vec(
                    frame.instances[sub], frame.transforms, frame.f32_buf)
                cache["dk"][sub] = classify_dense_kinds(
                    frame.f32_buf, frame.instances[sub], frame.transforms)
        else:
            cache = {"n": N,
                     "ok": _supported_vec(frame.instances, frame.transforms,
                                          frame.f32_buf),
                     "dk": classify_dense_kinds(frame.f32_buf,
                                                frame.instances,
                                                frame.transforms)}
            self._elig_cache = cache
        # copies: the cache rows mutate as later frames update them, but a
        # frame's classification must stay frozen (frames are immutable
        # render inputs — re-rendering an old frame must not see a newer
        # frame's eligibility rows)
        frame._pallas_inst_ok = cache["ok"].copy()
        frame._dense_kinds = cache["dk"].copy()

    def _dense_records(self, frame, f32_buf, instances, transforms,
                       tile_insts, ti_dev, dk, dk_dev, ti_key, seq):
        """Dense per-tile records for one pass, incrementally: a persistent
        device mirror is re-gathered only for the tiles whose inputs
        changed since the previous frame (tile lists, instance records,
        payload/clip rows, transform rows, dense kinds).  A 4K scroll
        frame re-gathers a few dozen of ~1000 tiles instead of rebuilding
        the ~67 MB dense tensor — the dominant device cost of dynamic
        frames after the raster itself."""
        from ..ops.pallas.tile_raster import (build_dense_records_device,
                                              update_dense_records_device)
        nt_, slots_ = tile_insts.shape
        dkey = ("dense", seq, slots_)
        mirror = self._dense_mirrors.get(dkey)
        ti_ch = self._delta.last_changed(ti_key)
        dk_ch = self._delta.last_changed(("dk",))
        base_m = getattr(frame, "_changed_inst_mask", None)
        usable = (mirror is not None and mirror["shape"] == (nt_, slots_)
                  and ti_ch is not None and dk_ch is not None
                  and base_m is not None
                  # freshness: the mirror must have been (re)gathered on the
                  # immediately preceding render — a skipped render (pass-
                  # level dense cache) leaves it at an older frame's content
                  and mirror.get("rseq") == self._render_seq - 1)
        if usable:
            N = frame.instances.shape[0]
            m = base_m.copy()
            m[dk_ch[dk_ch < N]] = True
            dirty = np.zeros(nt_, bool)
            dirty[ti_ch[ti_ch < nt_]] = True
            ids = np.nonzero(m)[0]
            if ids.size:
                dirty |= np.isin(tile_insts, ids).any(axis=1)
            nd = int(dirty.sum())
            if nd == 0:
                mirror["rseq"] = self._render_seq
                return mirror["dev"]
            if nd <= nt_ // 2:
                bucket = min(max(64, 1 << (nd - 1).bit_length()), nt_)
                tiles = np.resize(np.nonzero(dirty)[0], bucket) \
                    .astype(np.int32)
                dense = update_dense_records_device(
                    mirror["dev"], f32_buf, instances, transforms, ti_dev,
                    dk_dev, jnp.asarray(tiles),
                    aligned=getattr(frame, "_addr_aligned", False))
                mirror["dev"] = dense
                mirror["rseq"] = self._render_seq
                return dense
        dense = build_dense_records_device(
            f32_buf, instances, transforms, ti_dev, dk_dev,
            aligned=getattr(frame, "_addr_aligned", False))
        self._dense_mirrors[dkey] = {"dev": dense, "shape": (nt_, slots_),
                                     "rseq": self._render_seq}
        return dense

    def _run_raster(self, p: RenderPass, frame: Frame, f32_buf, instances,
                    transforms, framebuffer):
        if self.crash_annotator is not None:
            # bracket the dispatch so a crash report names the kernel
            # variant in flight (lib.rs CrashAnnotatorGuard)
            from ..api.crash_annotator import (CrashAnnotation,
                                               CrashAnnotatorGuard)
            kinds, blends = self._pass_dispatch_sets(p, frame)
            with CrashAnnotatorGuard(
                    self.crash_annotator, CrashAnnotation.DRAW_SHADER,
                    f"raster kinds={kinds} blends={blends}"):
                return self._run_raster_inner(p, frame, f32_buf, instances,
                                              transforms, framebuffer)
        return self._run_raster_inner(p, frame, f32_buf, instances,
                                      transforms, framebuffer)

    def _run_raster_inner(self, p: RenderPass, frame: Frame, f32_buf,
                          instances, transforms, framebuffer):
        # picture-cache slice: persistent content-space tiles, composited
        # at the slice's current scroll offset (tile_cache.rs slices)
        if (self.picture_caching and p.target == TARGET_ROOT
                and p.slice_key is not None and p.cache_hashes is not None):
            return self._run_slice_cached(p, frame, f32_buf, instances,
                                          transforms, framebuffer)
        # picture caching: root pass with per-tile hashes renders only the
        # tiles whose content changed (picture.rs pre_update/post_update
        # dirty tracking re-designed as content hashing)
        if (self.picture_caching and p.target == TARGET_ROOT
                and p.tile_hashes is not None and p.clear is not None):
            return self._run_root_cached(p, frame, f32_buf, instances,
                                         transforms)
        kinds, blends = self._pass_dispatch_sets(p, frame)
        x_, y_, rw_, rh_ = p.region
        if p.clear is not None:
            clear = self._delta.put_const(np.asarray(p.clear, np.float32))
        else:
            # continuation pass: start from the target's current content
            src = framebuffer if p.target == TARGET_ROOT else \
                jax.lax.dynamic_slice(self.surface_atlas, (0, y_, x_),
                                      (4, rh_, rw_))
            clear = _disassemble(src, nx=p.nx, ny=p.ny)
        tiles = self._dispatch_raster(
            frame, f32_buf, instances, transforms, p.tile_insts,
            self._tile_origins(p), clear, kinds, blends, step=p.raster_step,
            dense_cache_holder=p)
        x, y, rw, rh = p.region
        if p.target == TARGET_ROOT:
            if framebuffer is None:
                # the tile grid covers the whole root region: assembling IS
                # the framebuffer (no zeros+update round-trip — one less
                # device execution per frame on tunneled platforms)
                return _assemble(tiles, nx=p.nx, ny=p.ny, w=rw, h=rh)
            return _write_region(framebuffer, tiles, nx=p.nx, ny=p.ny,
                                 w=rw, h=rh, x=0, y=0)
        self.surface_atlas = _write_region(
            self.surface_atlas, tiles, nx=p.nx, ny=p.ny, w=rw, h=rh, x=x, y=y,
            quantize=True)
        return framebuffer

    def _run_root_cached(self, p: RenderPass, frame: Frame, f32_buf,
                         instances, transforms):
        nt = p.tile_insts.shape[0]
        shape_key = (nt, p.nx, p.ny, p.region)
        full = (self._root_tiles is None or self._root_shape != shape_key
                or self._root_hashes is None)
        if full:
            dirty = np.arange(nt)
        else:
            dirty = np.nonzero(self._root_hashes != p.tile_hashes)[0]
        self.last_dirty_tiles = int(dirty.size)
        # device-space dirty rect (union of dirty tiles) — the partial-
        # present damage a compositor consumes (composite.rs dirty rects)
        # plus rasterized-area accounting (picture.rs pre/post_update
        # dependency-diff role: re-raster cost tracks the dirty area, not
        # the frame size)
        if dirty.size:
            txs = dirty % p.nx
            tys = dirty // p.nx
            self.last_dirty_rect = (
                int(txs.min()) * TILE_W, int(tys.min()) * TILE_H,
                int(txs.max() + 1) * TILE_W, int(tys.max() + 1) * TILE_H)
        else:
            self.last_dirty_rect = None
        if self.profiler is not None:
            self.profiler.set("rendered_picture_tiles", float(dirty.size))
            self.profiler.set("rendered_picture_px",
                              float(dirty.size * TILE_W * TILE_H))
            self.profiler.set("picture_tiles", float(nt))
        if dirty.size:
            # pad the dirty set to a pow2 bucket with repeats of the first
            # dirty tile (stable shapes bound recompiles; duplicates write
            # the same content twice — harmless)
            bucket = 1 << max(3, int(np.ceil(np.log2(dirty.size))))
            bucket = min(bucket, nt)
            padded = np.resize(dirty, bucket) if bucket >= dirty.size else dirty
            sub_insts = p.tile_insts[padded]
            origins = self._tile_origins(p)[padded]
            kinds, blends = self._pass_dispatch_sets(p, frame)
            clear = self._delta.put_const(np.asarray(p.clear, np.float32))
            tiles = self._dispatch_raster(
                frame, f32_buf, instances, transforms, sub_insts, origins,
                clear, kinds, blends)
            if full and dirty.size == nt:
                self._root_tiles = tiles
            else:
                self._root_tiles = self._root_tiles.at[
                    jnp.asarray(padded)].set(tiles)
        self._root_hashes = p.tile_hashes
        self._root_shape = shape_key
        x, y, rw, rh = p.region
        if dirty.size == 0 and self._root_fb is not None:
            # unchanged frame: recomposite is a no-op — reuse the assembled
            # framebuffer (picture caching fast path)
            return self._root_fb
        fb = _assemble(self._root_tiles, nx=p.nx, ny=p.ny, w=rw, h=rh)
        self._root_fb = fb
        return fb

    def _run_slice_cached(self, p: RenderPass, frame: Frame, f32_buf,
                          instances, transforms, framebuffer):
        """Execute one picture-cache slice: remap the persistent content
        tiles by the anchor shift, re-raster only hash-dirty tiles (onto a
        transparent base), and src-over the slice at its current offset —
        a pure scroll re-rasters ZERO tiles (tile_cache.rs /
        picture.rs pre/post_update re-designed)."""
        x, y, rw, rh = p.region
        if framebuffer is None:
            clear = np.asarray(p.clear if p.clear is not None
                               else (0.0, 0.0, 0.0, 0.0), np.float32)
            framebuffer = jnp.zeros((4, rh, rw), jnp.float32) + \
                jnp.asarray(clear).reshape(4, 1, 1)
        nxc, nyc = p.cache_nx, p.cache_ny
        nt = nxc * nyc
        anchor = p.cache_anchor
        dx, dy = p.slice_delta
        state = self._slices.get(p.slice_key)
        tiles = None
        if state is not None and state["grid"] == (nxc, nyc):
            sx = anchor[0] - state["anchor"][0]
            sy = anchor[1] - state["anchor"][1]
            tys, txs = np.mgrid[0:nyc, 0:nxc]
            oty = tys + sy
            otx = txs + sx
            valid = ((oty >= 0) & (oty < nyc) & (otx >= 0) &
                     (otx < nxc)).reshape(-1)
            oidx = np.where(valid, (oty * nxc + otx).reshape(-1), 0)
            prev_h = np.where(valid, state["hashes"][oidx],
                              np.uint64(0xDEAD60D5DEAD60D5))
            if sx == 0 and sy == 0:
                tiles = state["tiles"]
            else:
                tiles = jnp.take(state["tiles"], jnp.asarray(oidx), axis=0)
            dirty = np.nonzero(prev_h != p.cache_hashes)[0]
        else:
            dirty = np.arange(nt)
        self.last_dirty_tiles = (0 if self.last_dirty_tiles < 0
                                 else self.last_dirty_tiles) + dirty.size
        self.slice_debug.append({"key": p.slice_key, "dirty": int(dirty.size),
                                 "total": nt})
        if dirty.size:
            bucket = 1 << max(3, int(np.ceil(np.log2(dirty.size))))
            bucket = min(bucket, nt)
            padded = np.resize(dirty, bucket) if bucket >= dirty.size \
                else dirty
            sub_insts = p.cache_insts[padded]
            oxs = (anchor[0] + (padded % nxc)) * TILE_W + dx
            oys = (anchor[1] + (padded // nxc)) * TILE_H + dy
            origins = np.stack([oxs, oys], 1).astype(np.float32)
            ids = sub_insts[sub_insts >= 0]
            if ids.size:
                used = frame.instances[np.unique(ids)]
                kinds = tuple(sorted(set(int(k) for k in used[:, INST_KIND])))
                blends = tuple(sorted(set(int(b)
                                          for b in used[:, INST_BLEND])))
            else:
                kinds, blends = (0,), (0,)
            rendered = self._dispatch_raster(
                frame, f32_buf, instances, transforms, sub_insts, origins,
                jnp.zeros(4, jnp.float32), kinds, blends,
                dense_cache_holder=None)
            if tiles is None:
                tiles = jnp.zeros((nt, 4, TILE_H, TILE_W), jnp.float32)
            tiles = tiles.at[jnp.asarray(padded)].set(rendered)
        self._slices[p.slice_key] = {"anchor": anchor, "grid": (nxc, nyc),
                                     "hashes": p.cache_hashes,
                                     "tiles": tiles}
        # composite the slice at its device offset, clipped to the region
        img_w, img_h = nxc * TILE_W, nyc * TILE_H
        gx0 = anchor[0] * TILE_W + dx
        gy0 = anchor[1] * TILE_H + dy
        crop = p.cache_crop or (0, 0, rw, rh)
        cx0 = max(0, gx0, crop[0])
        cy0 = max(0, gy0, crop[1])
        cx1 = min(rw, gx0 + img_w, crop[2])
        cy1 = min(rh, gy0 + img_h, crop[3])
        if cx1 <= cx0 or cy1 <= cy0:
            return framebuffer
        img = _assemble(tiles, nx=nxc, ny=nyc, w=img_w, h=img_h)
        return _slice_composite(framebuffer, img, cx0, cy0,
                                cx0 - gx0, cy0 - gy0,
                                w=cx1 - cx0, h=cy1 - cy0)

    def _run_blur(self, p: RenderPass, gl: bool = False) -> None:
        sx, sy, sw, sh = p.src_region
        dx, dy, _, _ = p.region
        axis = 1 if p.kind == PASS_BLUR_H else 0
        sigma = p.sigma
        if sigma <= 0:
            src = jax.lax.dynamic_slice(self.surface_atlas, (0, sy, sx),
                                        (4, sh, sw))
            self.surface_atlas = _copy_region(self.surface_atlas, src, dx, dy)
            return
        if gl:
            src = jax.lax.dynamic_slice(self.surface_atlas, (0, sy, sx),
                                        (4, sh, sw))
            bw, bh = p.blur_region if p.blur_region is not None \
                else (sw, sh)
            blurred = _blur_region_gpu_dev(src, sigma=float(sigma),
                                           axis=axis, bw=bw, bh=bh)
            self.surface_atlas = _copy_region(self.surface_atlas, blurred,
                                              dx, dy)
            return
        # cs_blur.glsl support: 2*ceil(1.5*sigma) taps each side; after
        # the downscale chain sigma <= 4 so radius <= 12 (bounded compile
        # variants without pow2 bucketing)
        radius = max(1, int(np.ceil(1.5 * sigma)) * 2)
        weights = jnp.asarray(gaussian_weights(sigma, radius))
        src = jax.lax.dynamic_slice(self.surface_atlas, (0, sy, sx),
                                    (4, sh, sw))
        bw, bh = p.blur_region if p.blur_region is not None else (sw, sh)
        if self.mesh is not None and bh >= 2 * self.mesh.devices.size:
            from ..parallel.mesh import blur_image_sharded
            blurred = blur_image_sharded(self.mesh, src, weights,
                                         radius=radius, axis=axis,
                                         bw=bw, bh=bh)
        else:
            blurred = blur_region(src, weights, radius=radius, axis=axis,
                                  bw=bw, bh=bh)
        self.surface_atlas = _copy_region(self.surface_atlas, blurred, dx, dy)
