"""Tile raster engine — jitted XLA implementation.

The TPU-native replacement for WebRender's instanced GL draws
(`renderer/mod.rs` draw_instanced_batch :2022): each render target is a grid
of TILE_H×TILE_W tiles; every tile walks its fixed-shape instance list
back-to-front, evaluates the pattern + coverage + clip kernels from
`patterns.py`, and blends into the tile accumulator held in registers/VMEM.

The pattern/blend dispatch is specialized per frame on the *set* of kinds and
blend ops present (host passes static tuples) so a solid-color frame compiles
to a solid-only kernel — the analog of WR's shader feature variants
(`shader_features.rs`). XLA lowers the vmapped `lax.switch` to a select over
the present branches only.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..frame.gpu import (KIND_SUBPX_GLYPH, CLIP_STRIDE, INST_BLEND, INST_CLIP_ADDR,
                         INST_CLIP_COUNT, INST_EDGE_AA, INST_KIND,
                         INST_PRIM_ADDR, INST_SPATIAL, KIND_BORDER,
                         KIND_BOX_SHADOW, KIND_CLEAR, KIND_CONIC_GRAD,
                         KIND_GLYPH, KIND_IMAGE, KIND_LINEAR_GRAD,
                         KIND_LINE_DEC, KIND_PICTURE, KIND_RADIAL_GRAD,
                         KIND_SOLID, KIND_YUV, N_KINDS)
from ..frame.tiles import TILE_H, TILE_W
from . import blend as blend_mod
from . import patterns as pk


def _pattern_branch(kind: int):
    """Returns fn(p, lx, ly, px, py, sx, sy, ctx) -> [4, TH, TW] premult."""
    if kind == KIND_SOLID:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            pk.pattern_solid(jnp, p, lx, ly)
    if kind == KIND_IMAGE:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            pk.pattern_image(jnp, p, lx, ly, ctx["color_atlas"])
    if kind == KIND_LINEAR_GRAD:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            pk.pattern_linear_gradient(jnp, jax.lax.fori_loop, p, lx, ly,
                                       ctx["f32_buf"])
    if kind == KIND_RADIAL_GRAD:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            pk.pattern_radial_gradient(jnp, jax.lax.fori_loop, p, lx, ly,
                                       ctx["f32_buf"])
    if kind == KIND_CONIC_GRAD:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            pk.pattern_conic_gradient(jnp, jax.lax.fori_loop, p, lx, ly,
                                      ctx["f32_buf"])
    if kind == KIND_GLYPH:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            pk.pattern_glyph(jnp, p, lx, ly, ctx["alpha_atlas"])
    if kind == KIND_PICTURE:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            pk.pattern_picture(jnp, p, lx, ly, px, py, ctx["surface_atlas"])
    if kind == KIND_CLEAR:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            jnp.ones((4,) + lx.shape, jnp.float32)
    if kind == KIND_BOX_SHADOW:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            pk.pattern_box_shadow(jnp, p, lx, ly, sx, sy)
    if kind == KIND_BORDER:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            pk.pattern_border(jnp, p, lx, ly, sx, sy)
    if kind == KIND_SUBPX_GLYPH:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            pk.pattern_subpx_glyph(jnp, p, lx, ly, ctx["color_atlas"])
    if kind == KIND_LINE_DEC:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            pk.pattern_line_dec(jnp, p, lx, ly, sx, sy)
    if kind == KIND_YUV:
        return lambda p, lx, ly, px, py, sx, sy, ctx: \
            pk.pattern_yuv(jnp, p, lx, ly, ctx["alpha_atlas"])
    raise ValueError(kind)


@functools.partial(jax.jit, static_argnames=("kinds", "blends", "gl"),
                   donate_argnums=())
def render_tiles(f32_buf, instances, transforms, tile_insts, tile_origins,
                 clear_color, color_atlas, alpha_atlas, surface_atlas,
                 *, kinds: Tuple[int, ...], blends: Tuple[int, ...],
                 step: float = 1.0, gl: bool = False):
    """Render all tiles of one pass → [nt, 4, TILE_H, TILE_W] premult f32.

    `clear_color` is either a [4] clear color or [nt, 4, TH, TW] initial tile
    contents (continuation passes after a backdrop-filter break).

    `gl` selects the llvmpipe pixel pipeline (frame.gl_flavor — reftest
    lines gated to platform(linux/mac) PNGs): GL blend compose, llvmpipe
    mask-chain accumulation and mask sampling.  Static — the renderer ORs
    blend_mod.GL_FLAVOR_FLAG into the dispatched ops at trace time, so the
    swgl and GL variants compile as distinct kernels."""
    nt, slots = tile_insts.shape
    kinds = tuple(kinds) or (KIND_SOLID,)
    blends = tuple(blends) or (blend_mod.BLEND_NORMAL,)

    # device lookup tables: actual id -> branch position
    kind_lut = np.zeros(N_KINDS, np.int32)
    for pos, k in enumerate(kinds):
        kind_lut[k] = pos
    kind_lut = jnp.asarray(kind_lut)
    blend_lut = np.zeros(blend_mod.N_BLEND_OPS, np.int32)
    for pos, b in enumerate(blends):
        blend_lut[b] = pos
    blend_lut = jnp.asarray(blend_lut)

    col_iota = jax.lax.broadcasted_iota(jnp.float32, (TILE_H, TILE_W), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.float32, (TILE_H, TILE_W), 0)
    # image masks are drawn with ps_quad_textured into an R8 mask target:
    # the mask value is the premultiplied RED channel (renderer/mod.rs:2336)
    mask_plane = color_atlas[0]
    ctx = {"f32_buf": f32_buf, "color_atlas": color_atlas,
           "alpha_atlas": alpha_atlas, "surface_atlas": surface_atlas}
    nt_chunk = 8  # tiles per vmap batch: bounds gather scratch on TPU
    pattern_fns = [_pattern_branch(k) for k in kinds]
    gl_flag = blend_mod.GL_FLAVOR_FLAG if gl else 0
    blend_fns = [
        (lambda op: lambda color, cov, mcov, dst: blend_mod.compose_swgl(
            jnp, op | gl_flag, color, cov, mcov, dst))(b) for b in blends]

    if clear_color.ndim == 1:
        init_tiles = jnp.broadcast_to(
            clear_color.reshape(1, 4, 1, 1),
            (nt, 4, TILE_H, TILE_W)).astype(jnp.float32)
    else:
        init_tiles = clear_color

    def tile_fn(origin, slots_row, init):
        px = origin[0] + (col_iota + 0.5) * step
        py = origin[1] + (row_iota + 0.5) * step

        def body(i, fb):
            iid = slots_row[i]
            safe_iid = jnp.maximum(iid, 0)
            rec = instances[safe_iid]
            p = jax.lax.dynamic_slice(
                f32_buf, (jnp.maximum(rec[INST_PRIM_ADDR], 0),),
                (pk.PAYLOAD_LEN,))
            trow = transforms[rec[INST_SPATIAL]]
            lx, ly = pk.inverse_map(jnp, trow, px, py)
            sx, sy = trow[9], trow[10]
            cov = pk.rect_coverage_auto(jnp, trow, p[4], p[5], p[6], p[7],
                                        lx, ly, px, py, rec[INST_EDGE_AA])

            def clip_body(j, carry):
                cov, m8 = carry
                crec = jax.lax.dynamic_slice(
                    f32_buf, (rec[INST_CLIP_ADDR] + j * CLIP_STRIDE,),
                    (CLIP_STRIDE,))
                ccov = pk.clip_coverage(jnp, crec, transforms, px, py,
                                        mask_plane, lambda t, idx: t[idx],
                                        gl=gl)
                # plain rect clips shrink the span geometry (AA path);
                # everything else renders into the u8 clip-mask chain
                # (cs_clip_* passes multiply the R8 target — each step
                # quantizes, render_task.rs new_mask)
                is_geom = jnp.logical_and(crec[14] < 0.5, crec[12] < 0.5)
                c8 = blend_mod.quantize_cov(jnp, ccov, 255.0)
                if gl:
                    m8n = blend_mod.gl_mask_combine(jnp, c8, m8)
                else:
                    m8n = jnp.floor((c8 * m8 + c8) * (1.0 / 256.0))
                return (jnp.where(is_geom, cov * ccov, cov),
                        jnp.where(is_geom, m8, m8n))
            m8_init = jnp.full(cov.shape, 255.0, jnp.float32)
            cov, m8 = jax.lax.fori_loop(0, rec[INST_CLIP_COUNT], clip_body,
                                        (cov, m8_init))
            mcov = m8 * (1.0 / 255.0)

            if len(pattern_fns) == 1:
                color = pattern_fns[0](p, lx, ly, px, py, sx, sy, ctx)
            else:
                color = jax.lax.switch(
                    kind_lut[rec[INST_KIND]],
                    [functools.partial(f, p, lx, ly, px, py, sx, sy, ctx)
                     for f in pattern_fns])
            if len(blend_fns) == 1:
                blended = blend_fns[0](color, cov, mcov, fb)
            else:
                blended = jax.lax.switch(
                    blend_lut[rec[INST_BLEND]],
                    [functools.partial(f, color, cov, mcov, fb)
                     for f in blend_fns])
            return jnp.where(iid >= 0, blended, fb)

        return jax.lax.fori_loop(0, slots, body, init)

    # chunked vmap: XLA's TPU gather lowering can materialize per-batch
    # operand copies for atlas sampling; bounding the batch bounds the
    # scratch (96-tile passes with image sampling OOM'd at 24GB otherwise)
    if nt <= nt_chunk:
        return jax.vmap(tile_fn)(tile_origins, tile_insts, init_tiles)
    pad = (-nt) % nt_chunk
    if pad:
        tile_origins = jnp.concatenate(
            [tile_origins, jnp.repeat(tile_origins[:1], pad, 0)], 0)
        tile_insts = jnp.concatenate(
            [tile_insts, jnp.full((pad, slots), -1, tile_insts.dtype)], 0)
        init_tiles = jnp.concatenate(
            [init_tiles, jnp.repeat(init_tiles[:1], pad, 0)], 0)
    n_chunks = (nt + pad) // nt_chunk
    o_c = tile_origins.reshape(n_chunks, nt_chunk, 2)
    i_c = tile_insts.reshape(n_chunks, nt_chunk, slots)
    t_c = init_tiles.reshape(n_chunks, nt_chunk, 4, TILE_H, TILE_W)
    out = jax.lax.map(
        lambda args: jax.vmap(tile_fn)(args[0], args[1], args[2]),
        (o_c, i_c, t_c))
    out = out.reshape(n_chunks * nt_chunk, 4, TILE_H, TILE_W)
    return out[:nt]


def assemble_tiles(tiles, nx: int, ny: int, w: int, h: int):
    """[nt, 4, TH, TW] → [4, h, w] planar image (crop of the tile grid)."""
    img = tiles.reshape(ny, nx, 4, TILE_H, TILE_W)
    img = jnp.transpose(img, (2, 0, 3, 1, 4)).reshape(
        4, ny * TILE_H, nx * TILE_W)
    return img[:, :h, :w]


def disassemble_tiles(img, nx: int, ny: int):
    """[4, h, w] planar image → [nt, 4, TH, TW] (pad to the tile grid)."""
    c, h, w = img.shape
    img = jnp.pad(img, ((0, 0), (0, ny * TILE_H - h), (0, nx * TILE_W - w)))
    img = img.reshape(4, ny, TILE_H, nx, TILE_W)
    return jnp.transpose(img, (1, 3, 0, 2, 4)).reshape(
        ny * nx, 4, TILE_H, TILE_W)


@functools.partial(jax.jit, static_argnames=("radius", "axis", "bw", "bh"),
                   donate_argnums=(0,))
def blur_region(src, weights, *, radius: int, axis: int,
                bw: int = 0, bh: int = 0):
    """Separable gaussian blur of a planar [4, h, w] region.  Sampling is
    clamped into the blur region [0, bw) × [0, bh) (`cs_blur.glsl` vUvRect:
    taps read the clamped edge texel beyond it, and fragments outside the
    region reduce to copies of the edge output)."""
    h, w = src.shape[1], src.shape[2]
    if bw <= 0:
        bw = w
    if bh <= 0:
        bh = h
    # u8 texels × 16-bit fixed-point weights (gaussian_weights): every
    # product and the full tap sum stay exact integers below 2^24, so the
    # XLA and numpy backends agree bit-for-bit, while the result matches
    # the GPU float blur (cs_blur.glsl) to within 1/10 of a u8 step —
    # the reference PNG corpus is GPU-rendered (round-to-nearest output)
    content = jnp.floor(src[:, :bh, :bw] * 255.0 + 0.5)
    pad = [(0, 0), (0, 0), (0, 0)]
    pad[1 + axis] = (radius, radius)
    x = jnp.pad(content, pad, mode="edge")
    out = jnp.zeros_like(content)
    for k in range(2 * radius + 1):
        if axis == 0:
            sl = x[:, k:k + bh, :]
        else:
            sl = x[:, :, k:k + bw]
        out = out + weights[k] * sl
    out = jnp.floor(out * (1.0 / 65536.0) + 0.5) * (1.0 / 255.0)
    # fragments beyond the blur region sample fully-clamped taps — i.e.
    # replicate the edge output across the task margin
    return jnp.pad(out, ((0, 0), (0, h - bh), (0, w - bw)), mode="edge")


def gauss_pair_taps(sigma: float, support: int):
    """cs_blur.glsl fragment-shader tap schedule (:141-170): the f32
    incremental-gaussian recurrence evaluated exactly as the shader does,
    two adjacent texels per iteration folded into ONE bilinear fetch at
    offset i + ratio with combined weight `subtotal`.  Returns
    (w0, [(offset, subtotal), ...]) — all f32 scalars."""
    f = np.float32
    s = f(sigma)
    x = f(f(1.0) / f(np.sqrt(f(2.0) * f(3.14159265)) * s))
    y = f(np.exp(f(-0.5) / (s * s)))
    z = f(y * y)
    gx, gy = x, y
    total = gx
    i = 1
    while i <= support:
        gx = f(gx * gy)
        gy = f(gy * z)
        sub = gx
        gx = f(gx * gy)
        gy = f(gy * z)
        sub = f(sub + gx)
        total = f(total + f(f(2.0) * sub))
        i += 2
    w0 = f(x / total)
    gx, gy = w0, y
    taps = []
    i = 1
    while i <= support:
        gx = f(gx * gy)
        gy = f(gy * z)
        sub = gx
        gx = f(gx * gy)
        gy = f(gy * z)
        sub = f(sub + gx)
        ratio = f(gx / sub)
        taps.append((f(f(i) + ratio), sub))
        i += 2
    return w0, taps


def blur_gpu_1d(xp, src, sigma: float, axis: int, blur_len: int):
    """One direction of the llvmpipe-flavored GPU blur (cs_blur.glsl
    fragment path as the linux CI's Mesa software GL executes it): paired
    taps at fractional offsets, each tap fetched with llvmpipe's 8-bit
    INTEGER bilinear lerp (`(a·(256−w)+b·w+128)>>8`, glprobe-calibrated —
    NOT the float lerp a hardware GPU would return), accumulated in f32
    in shader order; sampling clamps into [0.5, blur_len - 0.5] (vUvRect).
    `src` is [4, h, w] of u8-quantized values; the caller packs the result
    to u8 (render-target write).  Bit-deterministic across numpy and XLA
    (sequential f32 ops only).  blur_region_gpu inherits this flavor."""
    support = int(np.ceil(1.5 * sigma)) * 2
    if support <= 0:
        return src
    w0, taps = gauss_pair_taps(sigma, support)
    n = src.shape[1 + axis]
    L = min(blur_len, n)
    uv = xp.arange(n).astype("float32") + np.float32(0.5)
    lo = np.float32(0.5)
    hi = np.float32(max(L - 0.5, 0.5))
    avg = src * w0
    for off, sub in taps:
        for sign in (np.float32(-1.0), np.float32(1.0)):
            p = xp.clip(uv + sign * off, lo, hi)
            t = p - np.float32(0.5)
            i0 = xp.floor(t)
            # llvmpipe bilinear (glprobe-calibrated): 8-bit ROUNDED
            # weight, integer lerp (a·(256−w)+b·w+128)>>8 — the tap the
            # blur shader's texture() call actually returns on the CI
            # rasterizer (u8-grid value)
            fr = xp.floor((t - i0) * np.float32(256.0) + np.float32(0.5))
            i0 = i0.astype("int32")
            a = xp.take(src, xp.clip(i0, 0, n - 1), axis=1 + axis)
            b = xp.take(src, xp.clip(i0 + 1, 0, n - 1), axis=1 + axis)
            shape = [1, 1, 1]
            shape[1 + axis] = n
            frb = fr.reshape(shape)
            texel = xp.floor((a * (np.float32(256.0) - frb) + b * frb
                              + np.float32(128.0)) * np.float32(1.0 / 256.0))
            avg = avg + texel * sub
    return avg


def blur_region_gpu(xp, src, sigma: float, axis: int, bw: int, bh: int):
    """llvmpipe-flavored GPU blur (via blur_gpu_1d — integer-lerp taps) of
    a planar [4, h, w] region with render-target quantization: taps clamp
    into the blur region; fragments beyond it replicate the clamped
    edge."""
    h, w = src.shape[1], src.shape[2]
    if bw <= 0:
        bw = w
    if bh <= 0:
        bh = h
    content = xp.floor(src[:, :bh, :bw] * np.float32(255.0) + np.float32(0.5))
    L = bh if axis == 0 else bw
    out = blur_gpu_1d(xp, content, sigma, axis, L)
    # pack_pixels round-half-even at the RGBA8 target write
    out = xp.clip(xp.rint(out), 0.0, 255.0) * np.float32(1.0 / 255.0)
    if hasattr(xp, "pad"):
        return xp.pad(out, ((0, 0), (0, h - bh), (0, w - bw)), mode="edge")
    return out


def swgl_blur_weights(sigma: float, radius: int) -> np.ndarray:
    """swgl gaussianBlurHorizontal/Vertical weights (swgl/src/texture.h):
    the f32 incremental-gaussian recurrence of cs_blur.glsl, pre-scaled by
    8 bits of fractional precision and truncated per offset with
    `uint16_t(coeff + 0.5f)`.  Returns [radius+1] integer-valued f32
    (center first)."""
    f = np.float32
    s = f(sigma)
    x = f(f(1.0) / f(np.sqrt(f(2.0) * f(3.14159265)) * s))
    y = f(np.exp(f(-0.5) / (s * s)))
    z = f(y * y)
    # vertex-shader normalization (calculate_gauss_coefficients)
    gx, gy = x, y
    total = gx
    i = 1
    while i <= radius:
        gx = f(gx * gy)
        gy = f(gy * z)
        sub = gx
        gx = f(gx * gy)
        gy = f(gy * z)
        sub = f(sub + gx)
        total = f(total + f(f(2.0) * sub))
        i += 2
    coeff = f(f(x / total) * f(256.0))
    step = y
    step2 = z
    w = np.zeros(radius + 1, np.float32)
    w[0] = np.trunc(f(coeff + f(0.5)))
    for k in range(1, radius + 1):
        coeff = f(coeff * step)
        step = f(step * step2)
        w[k] = np.trunc(f(coeff + f(0.5)))
    return w


def blur_region_swgl(xp, src, sigma: float, axis: int, bw: int, bh: int):
    """swgl's exact integer separable blur (texture.h gaussianBlur*):
    u8 texels × u16 8-bit-fraction weights, u16 MODULAR per-tap product,
    u16 SATURATING accumulate, truncating >>8.  Tap indices clamp into
    the blur region [0, bw/bh); every task pixel is evaluated (pixels
    beyond the region blur the clamped-edge content).  `src` is a planar
    [4, h, w] array of u8-quantized values in [0, 1]; returns the same.
    Exact in f32: every intermediate is an integer below 2^24."""
    h, w = src.shape[1], src.shape[2]
    if bw <= 0:
        bw = w
    if bh <= 0:
        bh = h
    radius = max(1, int(np.ceil(1.5 * sigma)) * 2)
    wts = swgl_blur_weights(sigma, radius)
    texels = xp.floor(src * np.float32(255.0) + np.float32(0.5))
    n = texels.shape[1 + axis]
    L = min(bh if axis == 0 else bw, n)
    idx = xp.arange(n)
    acc = texels * wts[0]
    for k in range(1, radius + 1):
        il = xp.clip(idx - k, 0, L - 1)
        ir = xp.clip(idx + k, 0, L - 1)
        lr = xp.take(texels, il, axis=1 + axis) + \
            xp.take(texels, ir, axis=1 + axis)
        # u16 modular product, then u16 saturating add (swgl addsat)
        prod = lr * wts[k]
        prod = prod - xp.floor(prod * np.float32(1.0 / 65536.0)) \
            * np.float32(65536.0)
        acc = xp.minimum(acc + prod, np.float32(65535.0))
    return xp.floor(acc * np.float32(1.0 / 256.0)) * np.float32(1.0 / 255.0)


def gaussian_weights(sigma: float, radius: int) -> np.ndarray:
    """Blur tap weights matching the GPU float path of cs_blur.glsl
    (calculate_gauss_coefficients :47-70: f32 incremental-gaussian
    recurrence, normalized by the paired-tap total), quantized to 16-bit
    fixed point (x65536).  The quantization keeps every blur product and
    tap sum an exact integer < 2^24, so all backends agree bit-for-bit
    while staying within ~0.1 u8 step of the exact GPU result.  Returns
    the symmetric [2*radius+1] tap array (f32 integer values)."""
    f = np.float32
    s = f(sigma)
    x = f(1.0) / f(np.sqrt(f(2.0) * f(3.14159265)) * s)
    y = f(np.exp(f(-0.5) / (s * s)))
    z = f(y * y)
    gx, gy = x, y
    total = gx
    i = 1
    while i <= radius:
        gx = f(gx * gy)
        gy = f(gy * z)
        sub = gx
        gx = f(gx * gy)
        gy = f(gy * z)
        sub = f(sub + gx)
        total = f(total + f(f(2.0) * sub))
        i += 2
    coeff = f(f(x / total) * f(65536.0))
    step = y
    step2 = f(y * y)
    w = np.zeros(2 * radius + 1, np.float32)
    w[radius] = np.trunc(f(coeff + f(0.5)))
    for k in range(1, radius + 1):
        coeff = f(coeff * step)
        step = f(step * step2)
        wk = np.trunc(f(coeff + f(0.5)))
        w[radius + k] = wk
        w[radius - k] = wk
    return w

def blur_plane_gpu(xp, plane, sigma: float):
    """GPU float blur of one [h, w] plane, V then H, with R8 render-target
    quantization between the two directions (the alpha-target blur chain
    of box-shadow masks: render_task.rs new_blur + cs_blur.glsl float
    fragment math).  `plane` holds u8-quantized values in [0, 1]."""
    src = plane[None]
    for axis in (0, 1):
        content = xp.floor(src * np.float32(255.0) + np.float32(0.5))
        L = content.shape[1 + axis]
        out = blur_gpu_1d(xp, content, sigma, axis, L)
        src = xp.clip(_rint(xp, out), 0.0, 255.0) * np.float32(1.0 / 255.0)
    return src[0]


def _rint(xp, v):
    """Round half to even (GL unorm8 render-target conversion)."""
    return xp.round(v) if not hasattr(xp, "rint") else xp.rint(v)


def resample_bilinear_gpu(xp, src, dw: int, dh: int):
    """cs_scale.glsl resample with llvmpipe's exact bilinear filtering
    (glprobe-calibrated: 8-bit rounded weights, per-axis integer lerp
    `(a·(256−w)+b·w+128)>>8`, X then Y), u8 quantization at the
    render-target write.  `src` is planar [c, h, w] u8-quantized."""
    c, h, w = src.shape
    u = (xp.arange(dw).astype("float32") + np.float32(0.5)) * \
        np.float32(w / dw)
    v = (xp.arange(dh).astype("float32") + np.float32(0.5)) * \
        np.float32(h / dh)
    u = xp.clip(u, 0.5, max(w - 0.5, 0.5))
    v = xp.clip(v, 0.5, max(h - 0.5, 0.5))
    tu = u - np.float32(0.5)
    tv = v - np.float32(0.5)
    x0 = xp.clip(xp.floor(tu), 0, max(w - 2, 0))
    y0 = xp.clip(xp.floor(tv), 0, max(h - 2, 0))
    fx = xp.floor((tu - x0) * np.float32(256.0)
                  + np.float32(0.5))[None, None, :]
    fy = xp.floor((tv - y0) * np.float32(256.0)
                  + np.float32(0.5))[None, :, None]
    x0 = x0.astype("int32")
    y0 = y0.astype("int32")
    texels = xp.floor(src * np.float32(255.0) + np.float32(0.5))
    x1 = xp.clip(x0 + 1, 0, w - 1)
    y1 = xp.clip(y0 + 1, 0, h - 1)
    r0 = xp.take(texels, y0, axis=1)
    r1 = xp.take(texels, y1, axis=1)
    t00 = xp.take(r0, x0, axis=2)
    t10 = xp.take(r0, x1, axis=2)
    t01 = xp.take(r1, x0, axis=2)
    t11 = xp.take(r1, x1, axis=2)
    a = xp.floor((t00 * (np.float32(256.0) - fx) + t10 * fx
                  + np.float32(128.0)) * np.float32(1.0 / 256.0))
    b = xp.floor((t01 * (np.float32(256.0) - fx) + t11 * fx
                  + np.float32(128.0)) * np.float32(1.0 / 256.0))
    out = xp.floor((a * (np.float32(256.0) - fy) + b * fy
                    + np.float32(128.0)) * np.float32(1.0 / 256.0))
    return xp.clip(out, 0.0, 255.0) * np.float32(1.0 / 255.0)


def resample_bilinear(xp, src, dw: int, dh: int):
    """cs_scale.glsl resample with swgl's fixed-point bilinear filtering
    (texture.h textureLinearPlanarRGBA8): each target texel samples the
    source at `src_size * (i + 0.5) / dst_size`, clamped half a texel
    inside, with 7-bit fractions and truncating int16 lerps.  `src` is a
    planar [4, h, w] array of u8-quantized values; returns the same."""
    c, h, w = src.shape
    u = (xp.arange(dw).astype("float32") + 0.5) * (w / dw)
    v = (xp.arange(dh).astype("float32") + 0.5) * (h / dh)
    u = xp.clip(u, 0.5, max(w - 0.5, 0.5))
    v = xp.clip(v, 0.5, max(h - 0.5, 0.5))
    from . import patterns as _pk
    ug, vg = xp.meshgrid(u, v)
    x0, y0, row1, fx, fy = _pk.swgl_bilinear_coords(xp, ug, vg, w, h)
    y1 = y0 + row1
    x1 = xp.clip(x0 + 1, 0, w - 1)
    flat = src.reshape(c, -1)
    t00 = xp.floor(flat[:, y0 * w + x0] * 255.0 + 0.5)
    t10 = xp.floor(flat[:, y0 * w + x1] * 255.0 + 0.5)
    t01 = xp.floor(flat[:, y1 * w + x0] * 255.0 + 0.5)
    t11 = xp.floor(flat[:, y1 * w + x1] * 255.0 + 0.5)
    a = _pk._fixed_lerp(xp, t00, t01, fy[None])
    b = _pk._fixed_lerp(xp, t10, t11, fy[None])
    return _pk._fixed_lerp(xp, a, b, fx[None]) * (1.0 / 255.0)
