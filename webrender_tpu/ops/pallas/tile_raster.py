"""Pallas TPU tile-raster kernel — the production raster path.

Design (vs the jnp/vmap reference path in ops/raster.py):
 * grid = one program per framebuffer tile; the tile accumulator lives in
   VMEM scratch for the whole instance loop — no HBM round-trips per
   instance (the XLA path materializes the full tile-grid carry each loop
   step);
 * per-instance pattern/blend dispatch is `lax.switch` on scalars read from
   the staged instance table: Mosaic emits real branches, so a tile only
   pays for the kinds it draws (the vmapped XLA path lowers switch to
   execute-all-and-select);
 * texture sampling (glyphs / picture composites) uses per-instance DMA of
   a tile-aligned atlas window into VMEM — translation-only mappings turn
   bilinear sampling into 4 shifted VMEM loads with per-instance constant
   weights; all other pattern math (gradients, borders, box shadows,
   rounded clips) is pure VPU arithmetic over the f32 GPU buffer in VMEM.

`pallas_pass_supported` gates which passes run here; the jnp path remains
the fallback (scaled/rotated texture sampling, image-mask clips, plain
images for now).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...frame.gpu import (KIND_SUBPX_GLYPH,
                          CLIP_STRIDE, INST_BLEND, INST_CLIP_ADDR,
                          INST_CLIP_COUNT, INST_EDGE_AA, INST_KIND,
                          INST_PRIM_ADDR, INST_SPATIAL, KIND_BORDER,
                          KIND_BOX_SHADOW, KIND_CLEAR, KIND_CONIC_GRAD,
                          KIND_GLYPH, KIND_IMAGE, KIND_LINEAR_GRAD,
                          KIND_PICTURE, KIND_RADIAL_GRAD, KIND_SOLID)
from ...frame.tiles import TILE_H, TILE_W
from .. import blend as blend_mod
from .. import patterns as pk

# kinds whose pattern is pure arithmetic (no texture fetch)
MATH_KINDS = (KIND_SOLID, KIND_LINEAR_GRAD, KIND_RADIAL_GRAD,
              KIND_CONIC_GRAD, KIND_CLEAR, KIND_BOX_SHADOW, KIND_BORDER)
# kinds sampled via translation-only atlas windows
SAMPLED_KINDS = (KIND_GLYPH, KIND_PICTURE, KIND_SUBPX_GLYPH)

SAMP_H = TILE_H + 8      # sublane-aligned margin for the +1 bilinear tap
SAMP_W = TILE_W + 128    # lane-aligned margin


def pallas_pass_supported(instances: np.ndarray, tile_insts: np.ndarray,
                          transforms: np.ndarray, f32_buf: np.ndarray) -> bool:
    """Host check: every instance in the pass must be expressible in the
    Pallas kernel."""
    ids = np.unique(tile_insts[tile_insts >= 0])
    if ids.size == 0:
        return True
    used = instances[ids]
    for rec in used:
        kind = int(rec[INST_KIND])
        if kind in MATH_KINDS:
            if kind in (KIND_LINEAR_GRAD, KIND_RADIAL_GRAD, KIND_CONIC_GRAD):
                addr = int(rec[INST_PRIM_ADDR])
                if f32_buf[addr + 14] > 16:  # nstops beyond one row
                    return False
        elif kind in SAMPLED_KINDS:
            t = transforms[int(rec[INST_SPATIAL])]
            if not (abs(t[0] - 1) < 1e-6 and abs(t[4] - 1) < 1e-6 and
                    abs(t[1]) < 1e-9 and abs(t[3]) < 1e-9 and
                    abs(t[2]) < 1e-9 and abs(t[5]) < 1e-9 and
                    abs(t[8] - 1) < 1e-6):
                return False
            # the DMA window path assumes a 1:1 rect<->uv mapping: scaled
            # sampling (downscaled blur chains, raster-root local mode)
            # falls back to the XLA path
            pp = f32_buf[int(rec[INST_PRIM_ADDR]):
                         int(rec[INST_PRIM_ADDR]) + 41]
            if pp.shape[0] >= 41:
                if abs((pp[10] - pp[8]) - (pp[2] - pp[0])) > 1e-3 or \
                        abs((pp[11] - pp[9]) - (pp[3] - pp[1])) > 1e-3 or \
                        pp[37] > 0.5:
                    return False
        else:
            return False
        n = int(rec[INST_CLIP_COUNT])
        addr = int(rec[INST_CLIP_ADDR])
        for j in range(n):
            ck = f32_buf[addr + j * CLIP_STRIDE + 14]
            if 1.5 <= ck < 2.5:  # image mask needs the fallback path
                return False
    return True


MAX_PALLAS_STOPS = 16  # one 128-float row = 16 stop records


def _eval_stops_row(row, n, t, repeat):
    """Gradient stop evaluation from a single lane-aligned [128] row holding
    up to 16 stop records (statically unrolled over constant lane extracts —
    Mosaic-friendly; mirrors patterns.eval_gradient_stops)."""
    t = jnp.where(repeat > 0.5, t - jnp.floor(t), t)
    shape = t.shape
    out = jnp.stack([jnp.broadcast_to(row[1 + c], shape) for c in range(4)],
                    0).astype(jnp.float32)
    for i in range(1, MAX_PALLAS_STOPS):
        o0 = row[(i - 1) * 8]
        o1 = row[i * 8]
        denom = o1 - o0
        w = jnp.where(denom > 1e-9,
                      jnp.clip((t - o0) / jnp.where(denom > 1e-9, denom, 1.0),
                               0.0, 1.0),
                      jnp.where(t >= o1, 1.0, 0.0))
        w = jnp.where(i < n, w, 0.0)
        c1 = jnp.stack([jnp.broadcast_to(row[i * 8 + 1 + c], shape)
                        for c in range(4)], 0)
        out = out + (c1 - out) * w[None]
    a = out[3]
    return jnp.stack([out[0] * a, out[1] * a, out[2] * a, a], 0)


def _grad_pallas(p, t, in_tile, f32_rows_ref):
    addr = p[12].astype(jnp.int32)
    n = p[14].astype(jnp.int32)
    row = f32_rows_ref[addr // 128]
    return _eval_stops_row(row, n, t, p[13]) * in_tile[None]


def _pattern_math(kind_branch, p, lx, ly, sx, sy, f32_rows_ref, trow=None):
    if kind_branch == KIND_SOLID:
        return pk.pattern_solid(jnp, p, lx, ly)
    if kind_branch == KIND_LINEAR_GRAD:
        t, in_tile = pk.gradient_t_linear(jnp, p, lx, ly)
        return _grad_pallas(p, t, in_tile, f32_rows_ref)
    if kind_branch == KIND_RADIAL_GRAD:
        t, in_tile = pk.gradient_t_radial(jnp, p, lx, ly)
        return _grad_pallas(p, t, in_tile, f32_rows_ref)
    if kind_branch == KIND_CONIC_GRAD:
        t, in_tile = pk.gradient_t_conic(jnp, p, lx, ly)
        return _grad_pallas(p, t, in_tile, f32_rows_ref)
    if kind_branch == KIND_CLEAR:
        return jnp.ones((4, TILE_H, TILE_W), jnp.float32)
    if kind_branch == KIND_BOX_SHADOW:
        return pk.pattern_box_shadow(jnp, p, lx, ly, sx, sy)
    if kind_branch == KIND_BORDER:
        return pk.pattern_border(jnp, p, lx, ly, sx, sy)
    raise ValueError(kind_branch)


# --- dense-record variant ---------------------------------------------------
# Per-(tile, slot) records of 128 f32: [0:64] payload, [64] kind, [65] blend,
# [66] edge_aa, [67] clip_count, [68] clip_row, [69:81] transform row.
REC_KIND = 64
REC_BLEND = 65
REC_EDGE = 66
REC_CLIP_COUNT = 67
REC_CLIP_ROW = 68
REC_TROW = 69


def build_dense_records(f32_buf, instances, transforms, tile_insts):
    """Host-side gather into the dense per-tile record array (numpy)."""
    nt, slots = tile_insts.shape
    dense = np.zeros((nt, slots, 128), np.float32)
    ids = tile_insts.reshape(-1)
    valid = ids >= 0
    safe = np.where(valid, ids, 0)
    recs = instances[safe]                      # [nt*slots, 8]
    addr = recs[:, INST_PRIM_ADDR]
    # payload gather: [nt*slots, 64]
    offs = addr[:, None] + np.arange(64)[None, :]
    offs = np.clip(offs, 0, f32_buf.shape[0] - 1)
    dense_flat = dense.reshape(-1, 128)
    dense_flat[:, :64] = f32_buf[offs]
    dense_flat[:, REC_KIND] = recs[:, INST_KIND]
    dense_flat[:, REC_BLEND] = recs[:, INST_BLEND]
    dense_flat[:, REC_EDGE] = recs[:, INST_EDGE_AA]
    dense_flat[:, REC_CLIP_COUNT] = recs[:, INST_CLIP_COUNT]
    dense_flat[:, REC_CLIP_ROW] = recs[:, INST_CLIP_ADDR] // 128
    dense_flat[:, REC_TROW:REC_TROW + 12] = transforms[recs[:, INST_SPATIAL]]
    dense_flat[~valid] = 0.0
    dense_flat[~valid, REC_KIND] = -1.0
    return dense


@functools.partial(jax.jit, static_argnames=("kinds", "blends"))
def render_tiles_pallas_dense(dense, tile_counts, tile_origins, clear_color,
                              f32_rows, alpha_atlas, surface_atlas,
                              color_atlas,
                              *, kinds: Tuple[int, ...],
                              blends: Tuple[int, ...]):
    """Dense-record pallas raster → [nt, 4, TILE_H, TILE_W].

    All per-instance state arrives in the tile's own VMEM block — no
    scalar-indexed loads from shared tables in the hot loop."""
    nt, slots, _ = dense.shape
    kinds = tuple(kinds)
    blends = tuple(blends)
    math_kinds = [k for k in kinds if k in MATH_KINDS]
    sampled_kinds = [k for k in kinds if k in SAMPLED_KINDS]
    branch_kinds = math_kinds + sampled_kinds
    lut = np.zeros(16 + blend_mod.N_BLEND_OPS, np.int32)
    for pos, k in enumerate(branch_kinds):
        lut[k] = pos
    for pos, b in enumerate(blends):
        lut[16 + b] = pos

    def kernel(cnt_ref, or_ref, clear_ref, lut_ref, dense_ref, f32_rows_ref,
               aa_hbm, sa_hbm, ca_hbm, out_ref, acc, samp, samp_sem):
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W),
                                       1).astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W),
                                       0).astype(jnp.float32)
        ox = or_ref[0, 0, 0]
        oy = or_ref[0, 0, 1]
        px = ox + col + 0.5
        py = oy + row + 0.5
        for c in range(4):
            acc[c] = jnp.full((TILE_H, TILE_W), clear_ref[c], jnp.float32)

        def body(i, carry):
            r = dense_ref[0, i]
            p = r[:64]
            trow = r[REC_TROW:REC_TROW + 12]
            lx, ly = pk.inverse_map(jnp, trow, px, py)
            sx = trow[9]
            sy = trow[10]
            edge_aa = r[REC_EDGE].astype(jnp.int32)
            cov = pk.rect_coverage(jnp, p[4], p[5], p[6], p[7], lx, ly,
                                   sx, sy, edge_aa)

            clip_row = r[REC_CLIP_ROW].astype(jnp.int32)

            def clip_body(j, cov):
                crec = f32_rows_ref[clip_row + j]
                # clip transforms are inlined in the record? no — clips may
                # live in other spatial nodes; their palette row is stored
                # in the record tail at serialization time (frame builder
                # appends it at [96:108] of the clip row)
                ct = crec[96:108]
                clx, cly = pk.inverse_map(jnp, ct, px, py)
                csx = ct[9]
                csy = ct[10]
                rect_cov = pk.rect_coverage(jnp, crec[0], crec[1], crec[2],
                                            crec[3], clx, cly, csx, csy, 0xF)
                rounded = pk.rounded_rect_coverage(
                    jnp, crec[0:4], crec[4:12], clx, cly, csx, csy)
                poly = pk.polygon_coverage(jnp, crec, px, py)
                ccov = jnp.where(crec[14] < 0.5, rect_cov,
                                 jnp.where(crec[14] < 1.5, rounded, poly))
                ccov = jnp.where(crec[12] > 0.5, 1.0 - ccov, ccov)
                return cov * ccov
            cov = jax.lax.fori_loop(0, r[REC_CLIP_COUNT].astype(jnp.int32),
                                    clip_body, cov)

            def sampled_branch(kind_s, p, lx, ly, sx, sy, f32_rows,
                               trow):
                fx = ox + trow[6] + (p[8] - p[0])
                fy = oy + trow[7] + (p[9] - p[1])
                x0f = jnp.floor(fx)
                y0f = jnp.floor(fy)
                frx = fx - x0f
                fry = fy - y0f
                x0i = x0f.astype(jnp.int32)
                y0i = y0f.astype(jnp.int32)
                if kind_s == KIND_GLYPH:
                    H, W = aa_hbm.shape
                    x0c = jnp.clip(x0i, 0, W - SAMP_W)
                    y0c = jnp.clip(y0i, 0, H - SAMP_H)
                    # HBM slices must start tile-aligned (Mosaic (8,128)
                    # tiling); the SAMP_* windows carry exactly the needed
                    # slack, and a roll re-registers the window
                    x0c = (x0c // 128) * 128
                    y0c = (y0c // 8) * 8
                    # dst offset absorbs arbitrarily-negative y0i (glyph uv far
                    # above its device rect): rows the DMA leaves stale map to
                    # cov=0 pixels
                    dsty = ((jnp.maximum(y0c - y0i, 0) // 8) * 8)
                    dxs = x0i - x0c
                    dys = y0i - y0c + dsty
                    cp = pltpu.make_async_copy(
                        aa_hbm.at[pl.ds(y0c, SAMP_H), pl.ds(x0c, SAMP_W)],
                        samp.at[0, pl.ds(dsty, SAMP_H), :], samp_sem)
                    cp.start()
                    cp.wait()
                    plane = samp[0, :, :]
                    # lane rolls are exact; dynamic sublane rolls mis-shift on
                    # multi-tile axes, so Y re-registers via an 8-way switch of
                    # static slices (dys ∈ [0,8) by construction)
                    plane = pltpu.roll(plane, -dxs, 1)
                    # dys ∈ [−8, 7]: negative when the uv rect starts above
                    # the tile (window clipped at the atlas edge); top-pad
                    # with transparent rows so those taps read zero
                    plane = jnp.concatenate(
                        [jnp.zeros((8, SAMP_W), jnp.float32), plane], 0)
                    plane = jax.lax.switch(
                        jnp.clip(dys, -8, 7) + 8,
                        [(lambda k: lambda: plane[k:k + TILE_H + 1, :])(k)
                         for k in range(16)])
                    t00 = plane[:TILE_H, :TILE_W]
                    t10 = plane[:TILE_H, 1:TILE_W + 1]
                    t01 = plane[1:TILE_H + 1, :TILE_W]
                    t11 = plane[1:TILE_H + 1, 1:TILE_W + 1]
                    a = (t00 * (1 - frx) + t10 * frx) * (1 - fry) +                         (t01 * (1 - frx) + t11 * frx) * fry
                    return jnp.stack([p[12] * a, p[13] * a,
                                      p[14] * a, p[15] * a], 0)
                src_hbm = ca_hbm if kind_s == KIND_SUBPX_GLYPH else sa_hbm
                H = src_hbm.shape[1]
                W = src_hbm.shape[2]
                x0c = jnp.clip(x0i, 0, W - SAMP_W)
                y0c = jnp.clip(y0i, 0, H - SAMP_H)
                # HBM slices must start tile-aligned (Mosaic (8,128)
                # tiling); the SAMP_* windows carry exactly the needed
                # slack, and a roll re-registers the window
                x0c = (x0c // 128) * 128
                y0c = (y0c // 8) * 8
                # dst offset absorbs arbitrarily-negative y0i (glyph uv far
                # above its device rect): rows the DMA leaves stale map to
                # cov=0 pixels
                dsty = ((jnp.maximum(y0c - y0i, 0) // 8) * 8)
                dxs = x0i - x0c
                dys = y0i - y0c + dsty
                for c in range(4):
                    cp = pltpu.make_async_copy(
                        src_hbm.at[c, pl.ds(y0c, SAMP_H),
                                   pl.ds(x0c, SAMP_W)],
                        samp.at[c, pl.ds(dsty, SAMP_H), :], samp_sem)
                    cp.start()
                    cp.wait()
                planes = samp[:, :, :]
                planes = pltpu.roll(planes, -dxs, 2)
                planes = jnp.concatenate(
                    [jnp.zeros((4, 8, SAMP_W), jnp.float32), planes], 1)
                planes = jax.lax.switch(
                    jnp.clip(dys, -8, 7) + 8,
                    [(lambda k: lambda: planes[:, k:k + TILE_H + 1, :])(k)
                     for k in range(16)])
                t00 = planes[:, :TILE_H, :TILE_W]
                t10 = planes[:, :TILE_H, 1:TILE_W + 1]
                t01 = planes[:, 1:TILE_H + 1, :TILE_W]
                t11 = planes[:, 1:TILE_H + 1, 1:TILE_W + 1]
                texel = (t00 * (1 - frx) + t10 * frx) * (1 - fry) +                     (t01 * (1 - frx) + t11 * frx) * fry
                if kind_s == KIND_SUBPX_GLYPH:
                    # rgb = LCD channel masks (pattern_subpx_glyph)
                    m_avg = (texel[0] + texel[1] + texel[2]) * (1.0 / 3.0)
                    return jnp.stack([texel[0] * p[12], texel[1] * p[13],
                                      texel[2] * p[14], m_avg * p[15]], 0)
                texel = jnp.stack([texel[0] * p[12], texel[1] * p[13],
                                   texel[2] * p[14], texel[3] * p[15]], 0)
                return pk.apply_color_matrix(jnp, texel, p[16:36], p[36])

            def grad_branch(kind_g, p, lx, ly, sx, sy, f32_rows, trow):
                if kind_g == KIND_LINEAR_GRAD:
                    t, in_tile = pk.gradient_t_linear(jnp, p, lx, ly)
                elif kind_g == KIND_RADIAL_GRAD:
                    t, in_tile = pk.gradient_t_radial(jnp, p, lx, ly)
                else:
                    t, in_tile = pk.gradient_t_conic(jnp, p, lx, ly)
                addr = p[12].astype(jnp.int32)
                n = p[14].astype(jnp.int32)
                srow = f32_rows[addr // 128]
                return _eval_stops_row(srow, n, t, p[13]) * in_tile[None]

            branches = []
            for k in math_kinds:
                if k in (KIND_LINEAR_GRAD, KIND_RADIAL_GRAD, KIND_CONIC_GRAD):
                    branches.append(functools.partial(grad_branch, k))
                else:
                    branches.append(functools.partial(_pattern_math, k))
            branches += [functools.partial(sampled_branch, k)
                         for k in sampled_kinds]
            kind_i = r[REC_KIND].astype(jnp.int32)
            pos = lut_ref[jnp.clip(kind_i, 0, 15)]
            if len(branches) == 1:
                color = branches[0](p, lx, ly, sx, sy, f32_rows_ref, trow)
            else:
                color = jax.lax.switch(
                    pos, [functools.partial(b, p, lx, ly, sx, sy,
                                            f32_rows_ref, trow)
                          for b in branches])

            src = color * cov[None]
            dst = jnp.stack([acc[0], acc[1], acc[2], acc[3]], 0)
            if len(blends) == 1:
                blended = blend_mod.blend_src_over_dst(jnp, blends[0], src,
                                                       dst)
            else:
                bpos = lut_ref[16 + r[REC_BLEND].astype(jnp.int32)]
                blended = jax.lax.switch(
                    bpos,
                    [functools.partial(
                        (lambda op: lambda s, d:
                         blend_mod.blend_src_over_dst(jnp, op, s, d))(b),
                        src, dst)
                     for b in blends])
            for c in range(4):
                acc[c] = blended[c]
            return carry

        jax.lax.fori_loop(0, cnt_ref[0, 0, 0], body, 0)
        for c in range(4):
            out_ref[0, c] = acc[c]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, 2), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, slots, 128), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 4, TILE_H, TILE_W),
                               lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((4, SAMP_H + 72, SAMP_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, 4, TILE_H, TILE_W), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tile_counts.reshape(nt, 1, 1), tile_origins.reshape(nt, 1, 2),
      clear_color, jnp.asarray(lut), dense, f32_rows, alpha_atlas,
      surface_atlas, color_atlas)


@functools.partial(jax.jit, static_argnames=("kinds", "blends"))
def render_tiles_pallas(f32_buf, instances, transforms, tile_insts,
                        tile_origins, clear_color, alpha_atlas,
                        surface_atlas, *, kinds: Tuple[int, ...],
                        blends: Tuple[int, ...]):
    """Pallas raster for one pass → [nt, 4, TILE_H, TILE_W]."""
    nt, slots = tile_insts.shape
    # per-tile instance counts: the loop runs exactly count iterations
    # (the XLA path must run the padded slot count on every tile)
    tile_counts = jnp.sum((tile_insts >= 0).astype(jnp.int32), axis=1)
    kinds = tuple(kinds)
    blends = tuple(blends)
    math_kinds = [k for k in kinds if k in MATH_KINDS]
    # subpixel glyphs need the color atlas — only the dense variant (the
    # production path) threads it through
    sampled_kinds = [k for k in kinds
                     if k in SAMPLED_KINDS and k != KIND_SUBPX_GLYPH]
    branch_kinds = math_kinds + sampled_kinds
    kind_lut_host = np.zeros(16, np.int32)
    for pos, k in enumerate(branch_kinds):
        kind_lut_host[k] = pos
    blend_lut_host = np.zeros(blend_mod.N_BLEND_OPS, np.int32)
    for pos, b in enumerate(blends):
        blend_lut_host[b] = pos

    def kernel(ti_ref, or_ref, cnt_ref, clear_ref, inst_vmem, f32_rows_ref,
               tr_ref, lut_ref, aa_hbm, sa_hbm, out_ref,
               acc, samp, samp_sem):
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W),
                                       1).astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W),
                                       0).astype(jnp.float32)
        ox = or_ref[0, 0, 0]
        oy = or_ref[0, 0, 1]
        px = ox + col + 0.5
        py = oy + row + 0.5
        for c in range(4):
            acc[c] = jnp.full((TILE_H, TILE_W), clear_ref[c], jnp.float32)

        def body(i, carry):
            iid = ti_ref[0, 0, i]

            if True:
                sid = jnp.maximum(iid, 0)
                rec_kind = inst_vmem[sid, INST_KIND]
                spatial = inst_vmem[sid, INST_SPATIAL]
                prim_addr = inst_vmem[sid, INST_PRIM_ADDR]
                clip_addr = inst_vmem[sid, INST_CLIP_ADDR]
                clip_count = inst_vmem[sid, INST_CLIP_COUNT]
                blend_op = inst_vmem[sid, INST_BLEND]
                edge_aa = inst_vmem[sid, INST_EDGE_AA]

                p = f32_rows_ref[prim_addr // 128]
                trow = tr_ref[spatial]
                lx, ly = pk.inverse_map(jnp, trow, px, py)
                sx = trow[9]
                sy = trow[10]
                cov = pk.rect_coverage(jnp, p[4], p[5], p[6], p[7], lx, ly,
                                       sx, sy, edge_aa)

                def clip_body(j, cov):
                    crec = f32_rows_ref[clip_addr // 128 + j]
                    ct = tr_ref[crec[13].astype(jnp.int32)]
                    clx, cly = pk.inverse_map(jnp, ct, px, py)
                    csx = ct[9]
                    csy = ct[10]
                    rect_cov = pk.rect_coverage(jnp, crec[0], crec[1],
                                                crec[2], crec[3], clx, cly,
                                                csx, csy, 0xF)
                    rounded = pk.rounded_rect_coverage(
                        jnp, crec[0:4], crec[4:12], clx, cly, csx, csy)
                    poly = pk.polygon_coverage(jnp, crec, px, py)
                    ccov = jnp.where(crec[14] < 0.5, rect_cov,
                                     jnp.where(crec[14] < 1.5, rounded,
                                               poly))
                    ccov = jnp.where(crec[12] > 0.5, 1.0 - ccov, ccov)
                    return cov * ccov
                cov = jax.lax.fori_loop(0, clip_count, clip_body, cov)

                def sampled_branch(kind_s, p, lx, ly, sx, sy, f32_rows,
                               trow):
                    # translation mapping: atlas = device + (uv0 - rect0)
                    fx = ox + trow[6] + (p[8] - p[0])
                    fy = oy + trow[7] + (p[9] - p[1])
                    x0f = jnp.floor(fx)
                    y0f = jnp.floor(fy)
                    frx = fx - x0f
                    fry = fy - y0f
                    x0i = x0f.astype(jnp.int32)
                    y0i = y0f.astype(jnp.int32)
                    if kind_s == KIND_GLYPH:
                        H, W = aa_hbm.shape
                        x0c = jnp.clip(x0i, 0, W - SAMP_W)
                        y0c = jnp.clip(y0i, 0, H - SAMP_H)
                        # HBM slices must start tile-aligned (Mosaic (8,128)
                        # tiling); the SAMP_* windows carry exactly the needed
                        # slack, and a roll re-registers the window
                        x0c = (x0c // 128) * 128
                        y0c = (y0c // 8) * 8
                        dxs = x0i - x0c
                        dsty = ((jnp.maximum(y0c - y0i, 0) // 8) * 8)
                        dys = y0i - y0c + dsty
                        cp = pltpu.make_async_copy(
                            aa_hbm.at[pl.ds(y0c, SAMP_H), pl.ds(x0c, SAMP_W)],
                            samp.at[0, pl.ds(dsty, SAMP_H), :], samp_sem)
                        cp.start()
                        cp.wait()
                        plane = samp[0, :, :]
                        # lane rolls are exact; dynamic sublane rolls mis-shift on
                        # multi-tile axes, so Y re-registers via an 8-way switch of
                        # static slices (dys ∈ [0,8) by construction)
                        plane = pltpu.roll(plane, -dxs, 1)
                        # dys ∈ [−8, 7]: negative when the uv rect starts above
                        # the tile (window clipped at the atlas edge); top-pad
                        # with transparent rows so those taps read zero
                        plane = jnp.concatenate(
                            [jnp.zeros((8, SAMP_W), jnp.float32), plane], 0)
                        plane = jax.lax.switch(
                            jnp.clip(dys, -8, 7) + 8,
                            [(lambda k: lambda: plane[k:k + TILE_H + 1, :])(k)
                             for k in range(16)])
                        t00 = plane[:TILE_H, :TILE_W]
                        t10 = plane[:TILE_H, 1:TILE_W + 1]
                        t01 = plane[1:TILE_H + 1, :TILE_W]
                        t11 = plane[1:TILE_H + 1, 1:TILE_W + 1]
                        a = (t00 * (1 - frx) + t10 * frx) * (1 - fry) + \
                            (t01 * (1 - frx) + t11 * frx) * fry
                        return jnp.stack([p[12] * a, p[13] * a,
                                          p[14] * a, p[15] * a], 0)
                    H = sa_hbm.shape[1]
                    W = sa_hbm.shape[2]
                    x0c = jnp.clip(x0i, 0, W - SAMP_W)
                    y0c = jnp.clip(y0i, 0, H - SAMP_H)
                    # HBM slices must start tile-aligned (Mosaic (8,128)
                    # tiling); the SAMP_* windows carry exactly the needed
                    # slack, and a roll re-registers the window
                    x0c = (x0c // 128) * 128
                    y0c = (y0c // 8) * 8
                    # dst offset absorbs arbitrarily-negative y0i (glyph uv far
                    # above its device rect): rows the DMA leaves stale map to
                    # cov=0 pixels
                    dsty = ((jnp.maximum(y0c - y0i, 0) // 8) * 8)
                    dxs = x0i - x0c
                    dys = y0i - y0c + dsty
                    for c in range(4):
                        cp = pltpu.make_async_copy(
                            sa_hbm.at[c, pl.ds(y0c, SAMP_H),
                                      pl.ds(x0c, SAMP_W)],
                            samp.at[c, pl.ds(dsty, SAMP_H), :], samp_sem)
                        cp.start()
                        cp.wait()
                    planes = samp[:, :, :]
                    planes = pltpu.roll(planes, -dxs, 2)
                    planes = jnp.concatenate(
                        [jnp.zeros((4, 8, SAMP_W), jnp.float32), planes], 1)
                    planes = jax.lax.switch(
                        jnp.clip(dys, -8, 7) + 8,
                        [(lambda k: lambda: planes[:, k:k + TILE_H + 1, :])(k)
                         for k in range(16)])
                    t00 = planes[:, :TILE_H, :TILE_W]
                    t10 = planes[:, :TILE_H, 1:TILE_W + 1]
                    t01 = planes[:, 1:TILE_H + 1, :TILE_W]
                    t11 = planes[:, 1:TILE_H + 1, 1:TILE_W + 1]
                    texel = (t00 * (1 - frx) + t10 * frx) * (1 - fry) + \
                        (t01 * (1 - frx) + t11 * frx) * fry
                    texel = jnp.stack([texel[0] * p[12], texel[1] * p[13],
                                       texel[2] * p[14], texel[3] * p[15]], 0)
                    return pk.apply_color_matrix(jnp, texel, p[16:36], p[36])

                branches = [functools.partial(_pattern_math, k)
                            for k in math_kinds]
                branches += [functools.partial(sampled_branch, k)
                             for k in sampled_kinds]
                pos = lut_ref[rec_kind]
                if len(branches) == 1:
                    color = branches[0](p, lx, ly, sx, sy, f32_rows_ref, trow)
                else:
                    color = jax.lax.switch(
                        pos, [functools.partial(b, p, lx, ly, sx, sy,
                                                f32_rows_ref, trow)
                              for b in branches])

                src = color * cov[None]
                dst = jnp.stack([acc[0], acc[1], acc[2], acc[3]], 0)
                if len(blends) == 1:
                    blended = blend_mod.blend_src_over_dst(jnp, blends[0],
                                                           src, dst)
                else:
                    bpos = lut_ref[16 + blend_op]
                    blended = jax.lax.switch(
                        bpos,
                        [functools.partial(
                            (lambda op: lambda s, d:
                             blend_mod.blend_src_over_dst(jnp, op, s, d))(b),
                            src, dst)
                         for b in blends])
                for c in range(4):
                    acc[c] = blended[c]
            return carry

        jax.lax.fori_loop(0, cnt_ref[0, 0, 0], body, 0)
        for c in range(4):
            out_ref[0, c] = acc[c]

    # combined scalar LUT: [0:16] kind→branch, [16:16+N_BLEND] blend→branch
    lut = np.zeros(16 + blend_mod.N_BLEND_OPS, np.int32)
    lut[:16] = kind_lut_host
    lut[16:] = blend_lut_host

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, 1, slots), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),      # tile instance list
            pl.BlockSpec((1, 1, 2), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),      # tile origin
            pl.BlockSpec((1, 1, 1), lambda t: (t, 0, 0),
                         memory_space=pltpu.SMEM),      # tile count
            pl.BlockSpec(memory_space=pltpu.SMEM),      # clear color [4]
            pl.BlockSpec(memory_space=pltpu.VMEM),      # instances (resident)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # f32_buf rows (2D)
            pl.BlockSpec(memory_space=pltpu.VMEM),      # transforms
            pl.BlockSpec(memory_space=pltpu.SMEM),      # dispatch LUT
            pl.BlockSpec(memory_space=pltpu.ANY),       # alpha atlas (HBM)
            pl.BlockSpec(memory_space=pltpu.ANY),       # surface atlas (HBM)
        ],
        out_specs=pl.BlockSpec((1, 4, TILE_H, TILE_W),
                               lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((4, SAMP_H + 72, SAMP_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, 4, TILE_H, TILE_W), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tile_insts.reshape(nt, 1, slots), tile_origins.reshape(nt, 1, 2),
      tile_counts.reshape(nt, 1, 1), clear_color, instances,
      f32_buf.reshape(-1, 128), transforms, jnp.asarray(lut), alpha_atlas,
      surface_atlas)
