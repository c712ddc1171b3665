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
                          KIND_LINE_DEC, KIND_PICTURE, KIND_RADIAL_GRAD,
                          KIND_SOLID, KIND_YUV)
from ...frame.tiles import TILE_H, TILE_W
from .. import blend as blend_mod
from .. import patterns as pk

# kinds whose pattern is pure arithmetic (no texture fetch)
MATH_KINDS = (KIND_SOLID, KIND_LINEAR_GRAD, KIND_RADIAL_GRAD,
              KIND_CONIC_GRAD, KIND_CLEAR, KIND_BOX_SHADOW, KIND_BORDER,
              KIND_LINE_DEC)
# kinds sampled via translation-only atlas windows (DMA + register roll)
SAMPLED_KINDS = (KIND_GLYPH, KIND_PICTURE, KIND_SUBPX_GLYPH)

# dense-record pseudo-kinds (pallas path only): axis-aligned scaled
# sampling via the separable MXU path (two small matmuls — see
# _sep_sample in the kernel).  KIND_IMAGE always routes here; glyph /
# picture / subpx instances route here when the translation-1:1 fast
# path doesn't apply.
K_SEP_IMAGE = 13
K_SEP_GLYPH = 14
K_SEP_PICTURE = 15
K_SEP_SUBPX = 16
K_SEP_YUV = 17
SEP_KINDS = (K_SEP_IMAGE, K_SEP_GLYPH, K_SEP_PICTURE, K_SEP_SUBPX,
             K_SEP_YUV)

SAMP_H = TILE_H + 8      # sublane-aligned margin for the +1 bilinear tap
SAMP_W = TILE_W + 128    # lane-aligned margin

# separable-sampling atlas window: covers up to 2x minification of a tile
# plus alignment slack (8 rows / 128 lanes) plus the +1 bilinear tap
SEP_H = 136
SEP_W = 384
MAX_SEP_SPAN_Y = SEP_H - 8    # texel rows an instance may touch per tile
MAX_SEP_SPAN_X = SEP_W - 128  # texel cols


def _axis_aligned(t) -> bool:
    return (abs(t[1]) < 1e-9 and abs(t[3]) < 1e-9 and
            abs(t[2]) < 1e-9 and abs(t[5]) < 1e-9 and
            abs(t[8] - 1) < 1e-6)


def _is_translation(t) -> bool:
    return _axis_aligned(t) and abs(t[0] - 1) < 1e-6 and abs(t[4] - 1) < 1e-6


def _sep_spans(kind: int, t, pp):
    """Texel span (x, y) the separable path needs windowed for one tile,
    or None if the mapping isn't axis-aligned-expressible.
    `t` is the inverse (screen→local) palette row; pp the payload."""
    if not _axis_aligned(t):
        return None
    uv_w = abs(pp[10] - pp[8])
    uv_h = abs(pp[11] - pp[9])
    if kind == KIND_IMAGE:
        du = t[0] * pp[22]
        dv = t[4] * pp[23]
    elif kind == KIND_YUV:
        du = t[0] * pp[22]
        dv = t[4] * pp[23]
    elif kind == KIND_PICTURE and pp.shape[0] >= 41 and pp[37] > 0.5:
        du = t[0] * pp[40]
        dv = t[4] * pp[40]
    elif kind == KIND_PICTURE:
        # device-space mapping: u advances with px directly
        du = uv_w / max(abs(pp[2] - pp[0]), 1e-6)
        dv = uv_h / max(abs(pp[3] - pp[1]), 1e-6)
    else:  # glyph / subpx: uv over local rect, local over device via t
        du = t[0] * uv_w / max(abs(pp[2] - pp[0]), 1e-6)
        dv = t[4] * uv_h / max(abs(pp[3] - pp[1]), 1e-6)
    # clamped sampling never leaves the uv rect, so the window need only
    # cover min(tile span, uv rect) + the bilinear tap
    span_x = min(TILE_W * abs(du), uv_w) + 2.0
    span_y = min(TILE_H * abs(dv), uv_h) + 2.0
    if kind in (KIND_IMAGE, KIND_YUV):
        # a REPEAT WRAP inside one tile jumps the sampled uv from the
        # rect's end back to its start — the window must then cover the
        # whole uv rect (tile-with-spacing rendered blank tiles past the
        # first period otherwise)
        period_x = pp[18] + pp[20]
        period_y = pp[19] + pp[21]
        if pp[2] - pp[0] > period_x - 1e-4:
            span_x = uv_w + 2.0
        if pp[3] - pp[1] > period_y - 1e-4:
            span_y = uv_h + 2.0
    return span_x, span_y


def _sampled_dense_kind(kind: int, t, pp):
    """Dense-record kind for a sampled instance: the translation fast path
    when exact, else the separable pseudo-kind, else None (XLA fallback)."""
    if kind not in (KIND_IMAGE, KIND_YUV) and _is_translation(t) and \
            pp.shape[0] >= 41:
        if abs((pp[10] - pp[8]) - (pp[2] - pp[0])) <= 1e-3 and \
                abs((pp[11] - pp[9]) - (pp[3] - pp[1])) <= 1e-3 and \
                pp[37] <= 0.5:
            return kind
    spans = _sep_spans(kind, t, pp)
    if spans is None or spans[0] > MAX_SEP_SPAN_X or \
            spans[1] > MAX_SEP_SPAN_Y:
        return None
    return {KIND_IMAGE: K_SEP_IMAGE, KIND_GLYPH: K_SEP_GLYPH,
            KIND_PICTURE: K_SEP_PICTURE, KIND_SUBPX_GLYPH: K_SEP_SUBPX,
            KIND_YUV: K_SEP_YUV}[kind]


def _instance_supported(rec, transforms, f32_buf) -> bool:
    """One instance expressible in the Pallas kernel? (math kinds,
    translation sampling, or the separable axis-aligned sampling path —
    including image-mask / box-shadow clips)."""
    if True:
        kind = int(rec[INST_KIND])
        addr = int(rec[INST_PRIM_ADDR])
        if kind in MATH_KINDS:
            if kind in (KIND_LINEAR_GRAD, KIND_RADIAL_GRAD, KIND_CONIC_GRAD):
                if f32_buf[addr + 14] > MAX_PALLAS_STOPS:
                    return False
        elif kind in SAMPLED_KINDS or kind in (KIND_IMAGE, KIND_YUV):
            t = transforms[int(rec[INST_SPATIAL])]
            pp = f32_buf[addr:addr + 41]
            if _sampled_dense_kind(kind, t, pp) is None:
                return False
        else:
            return False
        n = int(rec[INST_CLIP_COUNT])
        caddr = int(rec[INST_CLIP_ADDR])
        for j in range(n):
            crec = f32_buf[caddr + j * CLIP_STRIDE:
                           caddr + (j + 1) * CLIP_STRIDE]
            if 1.5 <= crec[14] < 2.5:
                # image-mask clip: needs axis-aligned mapping + window fit
                ct = crec[96:108]
                if not _axis_aligned(ct):
                    return False
                rw = max(abs(crec[2] - crec[0]), 1e-6)
                rh = max(abs(crec[3] - crec[1]), 1e-6)
                du = ct[0] * (crec[18] - crec[16]) / rw
                dv = ct[4] * (crec[19] - crec[17]) / rh
                span_x = min(TILE_W * abs(du),
                             abs(crec[18] - crec[16])) + 2.0
                span_y = min(TILE_H * abs(dv),
                             abs(crec[19] - crec[17])) + 2.0
                if span_x > MAX_SEP_SPAN_X or span_y > MAX_SEP_SPAN_Y:
                    return False
            elif crec[14] >= 3.5:
                # box-shadow nine-patch: axis-aligned + the whole mask
                # must fit the SEP window (the stretch mapping can jump
                # across the mask within one tile)
                ct = crec[96:108]
                if not _axis_aligned(ct):
                    return False
                if abs(crec[18] - crec[16]) + 2.0 > MAX_SEP_SPAN_X or \
                        abs(crec[19] - crec[17]) + 2.0 > MAX_SEP_SPAN_Y:
                    return False
    return True


def _supported_vec(instances: np.ndarray, transforms: np.ndarray,
                   f32_buf: np.ndarray) -> np.ndarray:
    """Vectorized per-INSTANCE Pallas eligibility [N] — the numpy mirror
    of `_instance_supported` (kept as the scalar spec; property-tested
    equal).  This runs on every pass of every frame, so it must be array
    ops, not a Python loop (the loop was ~400 ms/frame on 4K scenes)."""
    n = instances.shape[0]
    if n == 0:
        return np.ones(0, bool)
    kinds = instances[:, INST_KIND].astype(np.int32)
    addr = instances[:, INST_PRIM_ADDR].astype(np.int64)
    t = transforms[instances[:, INST_SPATIAL]]
    nbuf = f32_buf.shape[0]

    def at(off):
        return f32_buf[np.clip(addr + off, 0, nbuf - 1)]

    ok = np.zeros(n, bool)
    # math kinds: always expressible; gradients capped at MAX_PALLAS_STOPS
    is_math = np.isin(kinds, MATH_KINDS)
    is_grad = np.isin(kinds, (KIND_LINEAR_GRAD, KIND_RADIAL_GRAD,
                              KIND_CONIC_GRAD))
    ok |= is_math & (~is_grad | (at(14) <= MAX_PALLAS_STOPS))
    # sampled kinds: translation fast path or the separable window
    sampled = np.isin(kinds, SAMPLED_KINDS) | (kinds == KIND_IMAGE) | \
        (kinds == KIND_YUV)
    axis_aligned = (np.abs(t[:, 1]) < 1e-9) & (np.abs(t[:, 3]) < 1e-9) & \
        (np.abs(t[:, 2]) < 1e-9) & (np.abs(t[:, 5]) < 1e-9) & \
        (np.abs(t[:, 8] - 1) < 1e-6)
    translation = axis_aligned & (np.abs(t[:, 0] - 1) < 1e-6) & \
        (np.abs(t[:, 4] - 1) < 1e-6)
    rect_w = np.maximum(np.abs(at(2) - at(0)), 1e-6)
    rect_h = np.maximum(np.abs(at(3) - at(1)), 1e-6)
    uv_w = np.abs(at(10) - at(8))
    uv_h = np.abs(at(11) - at(9))
    has41 = (addr + 41) <= nbuf
    one2one = (np.abs((at(10) - at(8)) - (at(2) - at(0))) <= 1e-3) & \
              (np.abs((at(11) - at(9)) - (at(3) - at(1))) <= 1e-3) & \
              (at(37) <= 0.5)
    fast = translation & has41 & one2one & (kinds != KIND_IMAGE) & \
        (kinds != KIND_YUV)
    # _sep_spans, all kinds at once
    du = np.where((kinds == KIND_IMAGE) | (kinds == KIND_YUV),
                  t[:, 0] * at(22),
                  np.where(kinds == KIND_PICTURE,
                           np.where(has41 & (at(37) > 0.5),
                                    t[:, 0] * at(40), uv_w / rect_w),
                           t[:, 0] * uv_w / rect_w))
    dv = np.where((kinds == KIND_IMAGE) | (kinds == KIND_YUV),
                  t[:, 4] * at(23),
                  np.where(kinds == KIND_PICTURE,
                           np.where(has41 & (at(37) > 0.5),
                                    t[:, 4] * at(40), uv_h / rect_h),
                           t[:, 4] * uv_h / rect_h))
    span_x = np.minimum(TILE_W * np.abs(du), uv_w) + 2.0
    span_y = np.minimum(TILE_H * np.abs(dv), uv_h) + 2.0
    # repeat wraps inside a tile need the whole uv rect windowed (see
    # _sep_spans) — only images/YUV carry stretch+spacing at [18:22]
    is_img = (kinds == KIND_IMAGE) | (kinds == KIND_YUV)
    wrap_x = is_img & ((at(2) - at(0)) > (at(18) + at(20)) - 1e-4)
    wrap_y = is_img & ((at(3) - at(1)) > (at(19) + at(21)) - 1e-4)
    span_x = np.where(wrap_x, uv_w + 2.0, span_x)
    span_y = np.where(wrap_y, uv_h + 2.0, span_y)
    sep_ok = axis_aligned & (span_x <= MAX_SEP_SPAN_X) & \
        (span_y <= MAX_SEP_SPAN_Y)
    ok |= sampled & (fast | sep_ok)
    # clip records: image-mask / box-shadow clips need axis-aligned
    # mappings + window fit (mirrors the j-loop in _instance_supported)
    counts = instances[:, INST_CLIP_COUNT].astype(np.int64)
    caddr = instances[:, INST_CLIP_ADDR].astype(np.int64)
    max_c = int(counts.max()) if n else 0
    for j in range(max_c):
        active = counts > j
        if not active.any():
            break
        base = np.clip(caddr + j * CLIP_STRIDE, 0, nbuf - CLIP_STRIDE)

        def cat(off):
            return f32_buf[base + off]

        ckind = cat(14)
        ct_ok = (np.abs(cat(97)) < 1e-9) & (np.abs(cat(99)) < 1e-9) & \
            (np.abs(cat(98)) < 1e-9) & (np.abs(cat(101)) < 1e-9) & \
            (np.abs(cat(104) - 1) < 1e-6)
        is_mask = (ckind >= 1.5) & (ckind < 2.5)
        is_bs = ckind >= 3.5
        rw = np.maximum(np.abs(cat(2) - cat(0)), 1e-6)
        rh = np.maximum(np.abs(cat(3) - cat(1)), 1e-6)
        cdu = cat(96) * (cat(18) - cat(16)) / rw
        cdv = cat(100) * (cat(19) - cat(17)) / rh
        m_span_x = np.minimum(TILE_W * np.abs(cdu),
                              np.abs(cat(18) - cat(16))) + 2.0
        m_span_y = np.minimum(TILE_H * np.abs(cdv),
                              np.abs(cat(19) - cat(17))) + 2.0
        mask_ok = ct_ok & (m_span_x <= MAX_SEP_SPAN_X) & \
            (m_span_y <= MAX_SEP_SPAN_Y)
        bs_ok = ct_ok & \
            (np.abs(cat(18) - cat(16)) + 2.0 <= MAX_SEP_SPAN_X) & \
            (np.abs(cat(19) - cat(17)) + 2.0 <= MAX_SEP_SPAN_Y)
        bad = active & ((is_mask & ~mask_ok) | (is_bs & ~bs_ok))
        ok &= ~bad
    return ok


def pallas_supported_mask(instances: np.ndarray, tile_insts: np.ndarray,
                          transforms: np.ndarray,
                          f32_buf: np.ndarray,
                          inst_ok: np.ndarray = None) -> np.ndarray:
    """Per-TILE Pallas eligibility [nt] — the fallback unit is a tile,
    not the whole pass (VERDICT r2 #8): one rotated image demotes only
    the tiles it touches to the XLA engine, everything else stays on the
    fast path.  Painter order is preserved because tiles are independent.
    `inst_ok` lets the renderer cache the per-instance check per frame
    (it is pass-invariant)."""
    ok = _supported_vec(instances, transforms, f32_buf) \
        if inst_ok is None else inst_ok
    safe = np.maximum(tile_insts, 0)
    ok_per_slot = ok[safe] | (tile_insts < 0)
    return ok_per_slot.all(axis=1)


def pallas_pass_supported(instances: np.ndarray, tile_insts: np.ndarray,
                          transforms: np.ndarray, f32_buf: np.ndarray) -> bool:
    """Host check: every instance in the pass must be expressible in the
    Pallas kernel."""
    return bool(pallas_supported_mask(instances, tile_insts, transforms,
                                      f32_buf).all())


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
    # records are premultiplied (gradient_stops_records): no conversion
    return out


def _grad_pallas(p, t, in_tile, f32_rows_ref):
    addr = p[12].astype(jnp.int32)
    n = p[14].astype(jnp.int32)
    row = f32_rows_ref[addr // 128]
    c = _eval_stops_row(row, n, t, p[13])
    # GL-flavor cached-gradient-task u8 quantization (p[15] — see
    # patterns._grad_task_quant)
    q = jnp.clip(jnp.rint(c * 255.0), 0.0, 255.0) * (1.0 / 255.0)
    c = jnp.where(p[15] > 0.5, q, c)
    return c * in_tile[None]


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
    if kind_branch == KIND_LINE_DEC:
        return pk.pattern_line_dec(jnp, p, lx, ly, sx, sy)
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
    """Host-side gather into the dense per-tile record array (numpy).
    Sampled instances are re-kinded to the separable pseudo-kinds when the
    translation fast path doesn't apply (see _sampled_dense_kind)."""
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
    trows = transforms[recs[:, INST_SPATIAL]]
    kinds = recs[:, INST_KIND].astype(np.int32)
    sampled = np.isin(kinds, SAMPLED_KINDS) | (kinds == KIND_IMAGE) | \
        (kinds == KIND_YUV)
    if sampled.any():
        pay = dense_flat[:, :41]
        t = trows
        translation = (np.abs(t[:, 0] - 1) < 1e-6) & \
            (np.abs(t[:, 4] - 1) < 1e-6) & (np.abs(t[:, 1]) < 1e-9) & \
            (np.abs(t[:, 3]) < 1e-9) & (np.abs(t[:, 2]) < 1e-9) & \
            (np.abs(t[:, 5]) < 1e-9) & (np.abs(t[:, 8] - 1) < 1e-6)
        one2one = (np.abs((pay[:, 10] - pay[:, 8]) -
                          (pay[:, 2] - pay[:, 0])) <= 1e-3) & \
                  (np.abs((pay[:, 11] - pay[:, 9]) -
                          (pay[:, 3] - pay[:, 1])) <= 1e-3) & \
                  (pay[:, 37] <= 0.5)
        fast = translation & one2one & (kinds != KIND_IMAGE) & \
            (kinds != KIND_YUV)
        sep_map = np.zeros(16, np.int32)
        sep_map[KIND_IMAGE] = K_SEP_IMAGE
        sep_map[KIND_GLYPH] = K_SEP_GLYPH
        sep_map[KIND_PICTURE] = K_SEP_PICTURE
        sep_map[KIND_SUBPX_GLYPH] = K_SEP_SUBPX
        sep_map[KIND_YUV] = K_SEP_YUV
        kinds = np.where(sampled & ~fast, sep_map[np.clip(kinds, 0, 15)],
                         kinds)
    dense_flat[:, REC_KIND] = kinds
    dense_flat[:, REC_BLEND] = recs[:, INST_BLEND]
    dense_flat[:, REC_EDGE] = recs[:, INST_EDGE_AA]
    dense_flat[:, REC_CLIP_COUNT] = recs[:, INST_CLIP_COUNT]
    dense_flat[:, REC_CLIP_ROW] = recs[:, INST_CLIP_ADDR] // 128
    dense_flat[:, REC_TROW:REC_TROW + 12] = trows
    dense_flat[~valid] = 0.0
    dense_flat[~valid, REC_KIND] = -1.0
    return dense


def classify_dense_kinds(f32_buf, instances, transforms) -> np.ndarray:
    """Per-instance dense-record kind [N] (sampled instances re-kinded to
    the separable pseudo-kinds when the translation fast path doesn't
    apply) — host-side, vectorized; one pass per frame."""
    kinds = instances[:, INST_KIND].astype(np.int32)
    sampled = np.isin(kinds, SAMPLED_KINDS) | (kinds == KIND_IMAGE) | \
        (kinds == KIND_YUV)
    if not sampled.any():
        return kinds
    t = transforms[instances[:, INST_SPATIAL]]
    addr = instances[:, INST_PRIM_ADDR].astype(np.int64)
    offs = np.clip(addr[:, None] + np.array([0, 1, 2, 3, 8, 9, 10, 11, 37]),
                   0, f32_buf.shape[0] - 1)
    pay = f32_buf[offs]  # rect(4), uv(4), rr-flag
    translation = (np.abs(t[:, 0] - 1) < 1e-6) & \
        (np.abs(t[:, 4] - 1) < 1e-6) & (np.abs(t[:, 1]) < 1e-9) & \
        (np.abs(t[:, 3]) < 1e-9) & (np.abs(t[:, 2]) < 1e-9) & \
        (np.abs(t[:, 5]) < 1e-9) & (np.abs(t[:, 8] - 1) < 1e-6)
    one2one = (np.abs((pay[:, 6] - pay[:, 4]) -
                      (pay[:, 2] - pay[:, 0])) <= 1e-3) & \
              (np.abs((pay[:, 7] - pay[:, 5]) -
                      (pay[:, 3] - pay[:, 1])) <= 1e-3) & \
              (pay[:, 8] <= 0.5)
    fast = translation & one2one & (kinds != KIND_IMAGE) & \
        (kinds != KIND_YUV)
    sep_map = np.zeros(16, np.int32)
    sep_map[KIND_IMAGE] = K_SEP_IMAGE
    sep_map[KIND_GLYPH] = K_SEP_GLYPH
    sep_map[KIND_PICTURE] = K_SEP_PICTURE
    sep_map[KIND_SUBPX_GLYPH] = K_SEP_SUBPX
    sep_map[KIND_YUV] = K_SEP_YUV
    return np.where(sampled & ~fast, sep_map[np.clip(kinds, 0, 15)], kinds)


@functools.partial(jax.jit, static_argnames=("aligned",))
def build_dense_records_device(f32_buf, instances, transforms, tile_insts,
                               dense_kinds, aligned: bool = False):
    """Device-side dense-record gather: same layout as build_dense_records
    but computed by XLA from the compact frame arrays — avoids building and
    uploading the ~nt·slots·128·4B dense tensor from the host every frame
    (dynamic scenes: the dense build was the end-to-end bottleneck).

    `aligned` (host-verified: every prim_addr is 128-aligned, which
    GpuBufferBuilder.ALIGN guarantees) switches the payload fetch from a
    per-ELEMENT flat-offset gather to a per-ROW gather of the [_, 128]
    buffer — on TPU the element gather is ~100x slower (measured 61 ms vs
    0.6 ms for a 131k-row fetch), and this gather runs every dynamic
    frame."""
    nt, slots = tile_insts.shape
    ids = tile_insts.reshape(-1)
    valid = ids >= 0
    safe = jnp.maximum(ids, 0)
    recs = instances[safe]
    addr = recs[:, INST_PRIM_ADDR]
    if aligned and f32_buf.size % 128 == 0:
        rows = jnp.clip(addr // 128, 0, f32_buf.size // 128 - 1)
        pay = f32_buf.reshape(-1, 128)[rows][:, :64]
    else:
        offs = jnp.clip(addr[:, None] + jnp.arange(64)[None, :], 0,
                        f32_buf.shape[0] - 1)
        pay = f32_buf[offs]
    kind = jnp.where(valid, dense_kinds[safe], -1)
    cols = jnp.stack([
        kind.astype(jnp.float32),
        recs[:, INST_BLEND].astype(jnp.float32),
        recs[:, INST_EDGE_AA].astype(jnp.float32),
        recs[:, INST_CLIP_COUNT].astype(jnp.float32),
        (recs[:, INST_CLIP_ADDR] // 128).astype(jnp.float32),
    ], axis=1)
    trows = transforms[recs[:, INST_SPATIAL]]
    pad = jnp.zeros((ids.shape[0], 128 - 64 - 5 - trows.shape[1]),
                    jnp.float32)
    dense = jnp.concatenate([
        jnp.where(valid[:, None], pay, 0.0), cols,
        jnp.where(valid[:, None], trows, 0.0), pad], axis=1)
    return dense.reshape(nt, slots, 128)


@functools.partial(jax.jit, static_argnames=("aligned",))
def update_dense_records_device(dense, f32_buf, instances, transforms,
                                tile_insts_dev, dense_kinds, tiles,
                                aligned: bool = False):
    """Incrementally re-gather the dense records of `tiles` (device index
    array) into the persistent per-pass dense mirror: one fused dispatch
    — sub-gather + row scatter — instead of rebuilding the whole
    ~nt·slots·512B tensor every dynamic frame (the 4K scroll case: a few
    dozen dirty tiles out of ~1000)."""
    sub_ti = tile_insts_dev[tiles]
    sub = build_dense_records_device(f32_buf, instances, transforms,
                                     sub_ti, dense_kinds, aligned=aligned)
    return dense.at[tiles].set(sub)


def dense_dispatch_info(f32_buf, instances, tile_insts, dense_kinds):
    """(kinds, blends, mask_clips) static dispatch sets for one dense pass:
    kinds come from the per-instance dense kinds (pseudo-kinds included)."""
    ids = np.unique(tile_insts[tile_insts >= 0])
    kset = np.unique(dense_kinds[ids]) if ids.size else np.zeros(0, np.int32)
    kinds = tuple(int(k) for k in kset if k >= 0)
    blends = tuple(np.unique(instances[ids][:, INST_BLEND]).astype(int)
                   .tolist()) if ids.size else (0,)
    mask_clips = False
    if ids.size:
        recs = instances[ids]
        counts = recs[:, INST_CLIP_COUNT].astype(np.int64)
        caddr = recs[:, INST_CLIP_ADDR].astype(np.int64)
        nbuf = f32_buf.shape[0]
        for j in range(int(counts.max()) if counts.size else 0):
            active = counts > j
            ck = f32_buf[np.clip(caddr + j * CLIP_STRIDE + 14, 0, nbuf - 1)]
            if (active & (((ck >= 1.5) & (ck < 2.5)) | (ck >= 3.5))).any():
                mask_clips = True
                break
    return kinds or (KIND_SOLID,), blends or (0,), mask_clips


@functools.partial(jax.jit,
                   static_argnames=("kinds", "blends", "mask_clips",
                                    "interpret", "gl"))
def render_tiles_pallas_dense(dense, tile_counts, tile_origins, clear_color,
                              f32_rows, alpha_atlas, surface_atlas,
                              color_atlas, init_tiles=None,
                              *, kinds: Tuple[int, ...],
                              blends: Tuple[int, ...],
                              mask_clips: bool = False,
                              interpret: bool = False,
                              gl: bool = False):
    """Dense-record pallas raster → [nt, 4, TILE_H, TILE_W].

    All per-instance state arrives in the tile's own VMEM block — no
    scalar-indexed loads from shared tables in the hot loop.  Sampling
    runs on one of two paths: translation-exact DMA windows re-registered
    with lane rolls, or the separable path for axis-aligned scaled
    mappings — per-axis texel coordinates turned into bilinear weight
    matrices (built from iota, no gathers) and contracted against the
    DMA'd atlas window on the MXU: out = R[y,j] · win[j,k] · C[k,x].

    `init_tiles` ([nt, 4, TILE_H, TILE_W], optional): per-tile starting
    contents for continuation passes (a render target drawn in several
    passes, e.g. after a picture-cache slice composite) — the accumulator
    starts from the tile's current pixels instead of `clear_color`.

    `gl` (static): the llvmpipe pixel pipeline (frame.gl_flavor) — GL
    blend compose (blend_mod.GL_FLAVOR_FLAG ORed into the dispatched ops
    at trace time), llvmpipe clip-mask accumulation and llvmpipe bilinear
    mask sampling; compiles as a distinct kernel variant."""
    nt, slots, _ = dense.shape
    has_init = init_tiles is not None
    kinds = tuple(kinds)
    blends = tuple(blends)
    math_kinds = [k for k in kinds if k in MATH_KINDS]
    sampled_kinds = [k for k in kinds if k in SAMPLED_KINDS]
    sep_kinds = [k for k in kinds if k in SEP_KINDS]
    branch_kinds = math_kinds + sampled_kinds + sep_kinds
    lut = np.zeros(18 + blend_mod.N_BLEND_OPS, np.int32)
    for pos, k in enumerate(branch_kinds):
        lut[k] = pos
    for pos, b in enumerate(blends):
        lut[18 + b] = pos

    def _mm(a, b):
        # f32-exact contraction (HIGHEST = 6-pass decomposition on the MXU)
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def kernel(cnt_ref, or_ref, clear_ref, lut_ref, dense_ref, f32_rows_ref,
               aa_hbm, sa_hbm, ca_hbm, *rest):
        if has_init:
            init_ref = rest[0]
            rest = rest[1:]
        out_ref, acc, samp, samp_sem, sep, sep_sem = rest
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W),
                                       1).astype(jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (TILE_H, TILE_W),
                                       0).astype(jnp.float32)
        ox = or_ref[0, 0, 0]
        oy = or_ref[0, 0, 1]
        px = ox + col + 0.5
        py = oy + row + 0.5
        for c in range(4):
            if has_init:
                acc[c] = init_ref[0, c]
            else:
                acc[c] = jnp.full((TILE_H, TILE_W), clear_ref[c],
                                  jnp.float32)

        def _sep_sample(u1d, v1d, u0, v0, u1, v1, nearest, src_hbm,
                        nplanes, chan0=0, round8=False, llvm=False):
            """Axis-aligned bilinear sampling on the MXU with swgl's
            fixed-point filtering (texture.h textureLinearPlanarRGBA8):
            coordinates quantize to 7-bit fractions and the four taps are
            gathered with one-hot weight-matrix contractions against a
            DMA'd atlas window, then combined with truncating int16 lerps
            (y first, then x) — exactly the math of patterns.sample_rgba.
            `round8` = GPU-style 8-bit fractions with one combined round
            (patterns.sample_alpha8); `llvm` = llvmpipe's per-axis rounded
            integer lerp (patterns.sample_alpha_llvm — the gl_flavor mask
            path).  u1d: [1, TILE_W]; v1d: [TILE_H, 1].
            Returns [nplanes, TILE_H, TILE_W] (or [TILE_H, TILE_W])."""
            round8 = round8 or llvm
            lo_u = u0 + 0.5
            hi_u = jnp.maximum(u1 - 0.5, lo_u)
            lo_v = v0 + 0.5
            hi_v = jnp.maximum(v1 - 0.5, lo_v)
            u = jnp.clip(u1d, lo_u, hi_u)
            v = jnp.clip(v1d, lo_v, hi_v)
            u = jnp.where(nearest > 0.5, jnp.floor(u) + 0.5, u)
            v = jnp.where(nearest > 0.5, jnp.floor(v) + 0.5, v)
            H = src_hbm.shape[-2]
            W = src_hbm.shape[-1]
            if round8:
                # GPU-style bilinear: 8-bit fractions, rounded result
                # (patterns.sample_alpha8 — cached box-shadow masks)
                ixf = jnp.clip(jnp.floor(u - 0.5), 0.0, max(W - 2, 0))
                iyf = jnp.clip(jnp.floor(v - 0.5), 0.0, max(H - 2, 0))
                fx = jnp.floor((u - 0.5 - ixf) * 256.0 + 0.5)
                fy = jnp.floor((v - 0.5 - iyf) * 256.0 + 0.5)
                x0f = ixf
                y0f = iyf
                row1 = jnp.where(iyf < H - 1, 1.0, 0.0)
            else:
                qu = jnp.floor(u * 128.0 - 63.5)
                qv = jnp.floor(v * 128.0 - 63.5)
                ixf = jnp.floor(qu * (1.0 / 128.0))
                iyf = jnp.floor(qv * (1.0 / 128.0))
                fx = qu - ixf * 128.0                  # [1, TILE_W]
                fy = qv - iyf * 128.0                  # [TILE_H, 1]
                over = ixf > (W - 2)
                fx = jnp.where(ixf < 0.0, 0.0, fx)
                fx = jnp.where(over, 128.0, fx)
                x0f = jnp.clip(ixf, 0.0, W - 2)
                y0f = jnp.clip(iyf, 0.0, H - 1)
                row1 = jnp.where((iyf >= 0.0) & (iyf < H - 1), 1.0, 0.0)
            x0w = jnp.floor(jnp.min(x0f)).astype(jnp.int32)
            y0w = jnp.floor(jnp.min(y0f)).astype(jnp.int32)
            x0c = (jnp.clip(x0w, 0, W - SEP_W) // 128) * 128
            y0c = (jnp.clip(y0w, 0, H - SEP_H) // 8) * 8
            if len(src_hbm.shape) == 2:
                cp = pltpu.make_async_copy(
                    src_hbm.at[pl.ds(y0c, SEP_H), pl.ds(x0c, SEP_W)],
                    sep.at[0], sep_sem)
                cp.start()
                cp.wait()
            else:
                # ONE 3-D DMA for all planes (the per-plane start();wait()
                # chain serialized 4 round-trip latencies per instance —
                # VERDICT r4 #5)
                cp = pltpu.make_async_copy(
                    src_hbm.at[pl.ds(chan0, nplanes), pl.ds(y0c, SEP_H),
                               pl.ds(x0c, SEP_W)],
                    sep.at[pl.ds(0, nplanes)], sep_sem)
                cp.start()
                cp.wait()
            xr0 = x0f - x0c.astype(jnp.float32)        # [1, TILE_W]
            yr0 = y0f - y0c.astype(jnp.float32)        # [TILE_H, 1]
            yr1 = yr0 + row1
            kx = jax.lax.broadcasted_iota(
                jnp.int32, (SEP_W, TILE_W), 0).astype(jnp.float32)
            # one-hot column selectors for the x0 / x0+1 taps
            C0 = (jnp.abs(kx - xr0) < 0.5).astype(jnp.float32)
            C1 = (jnp.abs(kx - jnp.minimum(xr0 + 1.0, W - 1 - x0c)) <
                  0.5).astype(jnp.float32)
            ky = jax.lax.broadcasted_iota(
                jnp.int32, (TILE_H, SEP_H), 1).astype(jnp.float32)
            R0 = (jnp.abs(ky - yr0) < 0.5).astype(jnp.float32)
            R1 = (jnp.abs(ky - yr1) < 0.5).astype(jnp.float32)
            outs = []
            for c in range(nplanes):
                s0 = _mm(sep[c], C0)                    # [SEP_H, TILE_W]
                s1 = _mm(sep[c], C1)
                t00 = jnp.floor(_mm(R0, s0) * 255.0 + 0.5)
                t01 = jnp.floor(_mm(R1, s0) * 255.0 + 0.5)
                t10 = jnp.floor(_mm(R0, s1) * 255.0 + 0.5)
                t11 = jnp.floor(_mm(R1, s1) * 255.0 + 0.5)
                if llvm:
                    a = jnp.floor((t00 * (256.0 - fx) + t10 * fx + 128.0)
                                  * (1.0 / 256.0))
                    b = jnp.floor((t01 * (256.0 - fx) + t11 * fx + 128.0)
                                  * (1.0 / 256.0))
                    o = jnp.floor((a * (256.0 - fy) + b * fy + 128.0)
                                  * (1.0 / 256.0))
                    outs.append(o * (1.0 / 255.0))
                elif round8:
                    a = t00 * (256.0 - fx) + t10 * fx
                    b = t01 * (256.0 - fx) + t11 * fx
                    o = a * (256.0 - fy) + b * fy
                    outs.append(jnp.floor(o * (1.0 / 65536.0) + 0.5)
                                * (1.0 / 255.0))
                else:
                    a = t00 + jnp.floor((t01 - t00) * fy * (1.0 / 128.0))
                    b = t10 + jnp.floor((t11 - t10) * fy * (1.0 / 128.0))
                    outs.append((a + jnp.floor((b - a) * fx
                                               * (1.0 / 128.0)))
                                * (1.0 / 255.0))
            return jnp.stack(outs, 0) if nplanes > 1 else outs[0]

        def body(i, carry):
            r = dense_ref[0, i]
            p = r[:64]
            trow = r[REC_TROW:REC_TROW + 12]
            lx, ly = pk.inverse_map(jnp, trow, px, py)
            sx = trow[9]
            sy = trow[10]
            edge_aa = r[REC_EDGE].astype(jnp.int32)
            cov = pk.rect_coverage_auto(jnp, trow, p[4], p[5], p[6], p[7],
                                        lx, ly, px, py, edge_aa)

            clip_row = r[REC_CLIP_ROW].astype(jnp.int32)

            def clip_body(j, carry):
                cov = carry[0]
                crec = f32_rows_ref[clip_row + j]
                # clips may live in other spatial nodes; their palette row
                # is inlined in the record tail at serialization time
                # (frame builder appends it at [96:108] of the clip row)
                ct = crec[96:108]
                clx, cly = pk.inverse_map(jnp, ct, px, py)
                csx = ct[9]
                csy = ct[10]
                rect_cov = pk.rect_coverage_auto(jnp, ct, crec[0], crec[1],
                                                 crec[2], crec[3], clx, cly,
                                                 px, py, 0xF)
                # crec[15] = uniform-radius fast-path flag (kind 1 only;
                # `rounded` is only selected for that kind)
                rounded = pk.rounded_rect_coverage_auto(
                    jnp, ct, crec[0:4], crec[4:12], clx, cly, px, py,
                    fast_flag=crec[15])
                poly = pk.polygon_coverage(jnp, crec, px, py)
                if mask_clips:
                    # image-mask clip (kind 2): the mask value is the color
                    # atlas's premultiplied RED plane (renderer/mod.rs:2336),
                    # sampled through the separable path (axis-aligned only
                    # — gated in pallas_pass_supported)
                    def _mask_cov():
                        rw = jnp.maximum(crec[2] - crec[0], 1e-6)
                        rh = jnp.maximum(crec[3] - crec[1], 1e-6)
                        mu = crec[16] + (clx[0:1, :] - crec[0]) / rw * \
                            (crec[18] - crec[16])
                        mv = crec[17] + (cly[:, 0:1] - crec[1]) / rh * \
                            (crec[19] - crec[17])
                        m = _sep_sample(mu, mv, crec[16], crec[17],
                                        crec[18], crec[19], 0.0, ca_hbm,
                                        1, chan0=0, llvm=gl)
                        return m * rect_cov
                    def _bs_cov():
                        # kind 4: box-shadow nine-patch
                        # (cs_clip_box_shadow.glsl; patterns
                        # .box_shadow_ninepatch_coverage)
                        dw = jnp.maximum(crec[2] - crec[0], 1e-6)
                        dh = jnp.maximum(crec[3] - crec[1], 1e-6)
                        aw = jnp.maximum(crec[4], 1e-6)
                        ah = jnp.maximum(crec[5], 1e-6)
                        lxr = clx[0:1, :]
                        lyc = cly[:, 0:1]
                        u_lin = jnp.where(crec[6] > 0.5,
                                          (lxr - crec[0]) / aw,
                                          (lxr - crec[0]) / dw)
                        v_lin = jnp.where(crec[7] > 0.5,
                                          (lyc - crec[1]) / ah,
                                          (lyc - crec[1]) / dh)
                        e0x = jnp.where(crec[6] > 0.5, 0.5, 1.0)
                        e1x = jnp.where(crec[6] > 0.5, dw / aw - 0.5, 1.0)
                        e0y = jnp.where(crec[7] > 0.5, 0.5, 1.0)
                        e1y = jnp.where(crec[7] > 0.5, dh / ah - 0.5, 1.0)
                        uu = jnp.clip(u_lin, 0.0, e0x) + \
                            jnp.maximum(0.0, u_lin - e1x)
                        vv = jnp.clip(v_lin, 0.0, e0y) + \
                            jnp.maximum(0.0, v_lin - e1y)
                        mu = crec[16] + uu * (crec[18] - crec[16])
                        mv = crec[17] + vv * (crec[19] - crec[17])
                        texel = _sep_sample(mu, mv, crec[16], crec[17],
                                            crec[18], crec[19], 0.0,
                                            ca_hbm, 1, chan0=0, llvm=gl)
                        mode = crec[15]
                        alpha = texel * (1.0 - mode) + (1.0 - texel) * mode
                        return mode * (1.0 - rect_cov) + alpha * rect_cov
                    is_mask = jnp.logical_and(crec[14] >= 1.5,
                                              crec[14] < 2.5)
                    masked = jax.lax.cond(
                        is_mask, _mask_cov,
                        lambda: jnp.zeros((TILE_H, TILE_W), jnp.float32))
                    bshadow = jax.lax.cond(
                        crec[14] >= 3.5, _bs_cov,
                        lambda: jnp.zeros((TILE_H, TILE_W), jnp.float32))
                    ccov = jnp.where(
                        crec[14] < 0.5, rect_cov,
                        jnp.where(crec[14] < 1.5, rounded,
                                  jnp.where(crec[14] < 2.5, masked,
                                            jnp.where(crec[14] < 3.5, poly,
                                                      bshadow))))
                else:
                    ccov = jnp.where(crec[14] < 0.5, rect_cov,
                                     jnp.where(crec[14] < 1.5, rounded,
                                               poly))
                ccov = jnp.where(crec[12] > 0.5, 1.0 - ccov, ccov)
                cov, m8 = carry
                # rect clips join the span geometry; the rest go through
                # the u8 clip-mask chain (render_task.rs new_mask)
                is_geom = jnp.logical_and(crec[14] < 0.5, crec[12] < 0.5)
                c8 = blend_mod.quantize_cov(jnp, ccov, 255.0)
                if gl:
                    m8n = blend_mod.gl_mask_combine(jnp, c8, m8)
                else:
                    m8n = jnp.floor((c8 * m8 + c8) * (1.0 / 256.0))
                return (jnp.where(is_geom, cov * ccov, cov),
                        jnp.where(is_geom, m8, m8n))
            cov, m8 = jax.lax.fori_loop(
                0, r[REC_CLIP_COUNT].astype(jnp.int32), clip_body,
                (cov, jnp.full(cov.shape, 255.0, jnp.float32)))
            mcov = m8 * (1.0 / 255.0)

            def sampled_branch(kind_s, p, lx, ly, sx, sy, f32_rows,
                               trow):
                fx = ox + trow[6] + (p[8] - p[0])
                fy = oy + trow[7] + (p[9] - p[1])
                # swgl fixed-point addressing for a translation-only
                # mapping: the 7-bit fraction is constant across the tile
                # (texture.h linearQuantize with u = fx + col + 0.5)
                qx = jnp.floor(fx * 128.0 + 0.5)
                qy = jnp.floor(fy * 128.0 + 0.5)
                x0f = jnp.floor(qx * (1.0 / 128.0))
                y0f = jnp.floor(qy * (1.0 / 128.0))
                frx = qx - x0f * 128.0
                fry = qy - y0f * 128.0
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
                    # clamp to the scratch slack (scratch has SAMP_H+72
                    # rows): beyond it the uv rows are negative — outside
                    # the glyph rect, so every affected pixel has cov=0
                    dsty = (jnp.clip(y0c - y0i, 0, 72) // 8) * 8
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
                    t00 = jnp.floor(plane[:TILE_H, :TILE_W] * 255.0 + 0.5)
                    t10 = jnp.floor(plane[:TILE_H, 1:TILE_W + 1] * 255.0
                                    + 0.5)
                    t01 = jnp.floor(plane[1:TILE_H + 1, :TILE_W] * 255.0
                                    + 0.5)
                    t11 = jnp.floor(plane[1:TILE_H + 1, 1:TILE_W + 1]
                                    * 255.0 + 0.5)
                    aa_ = t00 + jnp.floor((t01 - t00) * fry * (1.0 / 128.0))
                    bb_ = t10 + jnp.floor((t11 - t10) * fry * (1.0 / 128.0))
                    a = (aa_ + jnp.floor((bb_ - aa_) * frx
                                         * (1.0 / 128.0))) * (1.0 / 255.0)
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
                # clamp to the scratch slack (see the glyph path above)
                dsty = (jnp.clip(y0c - y0i, 0, 72) // 8) * 8
                dxs = x0i - x0c
                dys = y0i - y0c + dsty
                cp = pltpu.make_async_copy(
                    src_hbm.at[pl.ds(0, 4), pl.ds(y0c, SAMP_H),
                               pl.ds(x0c, SAMP_W)],
                    samp.at[pl.ds(0, 4), pl.ds(dsty, SAMP_H), :], samp_sem)
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
                t00 = jnp.floor(planes[:, :TILE_H, :TILE_W] * 255.0 + 0.5)
                t10 = jnp.floor(planes[:, :TILE_H, 1:TILE_W + 1] * 255.0
                                + 0.5)
                t01 = jnp.floor(planes[:, 1:TILE_H + 1, :TILE_W] * 255.0
                                + 0.5)
                t11 = jnp.floor(planes[:, 1:TILE_H + 1, 1:TILE_W + 1]
                                * 255.0 + 0.5)
                aa_ = t00 + jnp.floor((t01 - t00) * fry * (1.0 / 128.0))
                bb_ = t10 + jnp.floor((t11 - t10) * fry * (1.0 / 128.0))
                texel = (aa_ + jnp.floor((bb_ - aa_) * frx
                                         * (1.0 / 128.0))) * (1.0 / 255.0)
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
                c = _eval_stops_row(srow, n, t, p[13])
                # gl_flavor cached-gradient-task u8 quantization (p[15] —
                # patterns._grad_task_quant; the frame builder only sets it
                # under gl_flavor, so applying it unconditionally is the
                # single-source behavior)
                q = jnp.clip(jnp.rint(c * 255.0), 0.0, 255.0) * (1.0 / 255.0)
                c = jnp.where(p[15] > 0.5, q, c)
                return c * in_tile[None]

            def sep_branch(kind_s, p, lx, ly, sx, sy, f32_rows, trow):
                """Separable (axis-aligned) sampled kinds: per-axis uv
                coordinates → MXU bilinear (see _sep_sample)."""
                lx_row = lx[0:1, :]
                ly_col = ly[:, 0:1]
                if kind_s == K_SEP_IMAGE:
                    stretch_w = jnp.maximum(p[18], 1e-6)
                    stretch_h = jnp.maximum(p[19], 1e-6)
                    # clamp to the pattern rect (minus an epsilon so the
                    # clamped edge never wraps to 0 through the modulo):
                    # pixels beyond the rect are coverage-0 except the AA
                    # ramp, but unclamped they wrap through the repeat
                    # modulo and blow up the window span (min(uf) drops to
                    # the rect start → zero weights for the visible
                    # samples at a partial boundary tile)
                    oxl = jnp.clip(lx_row - p[0], 0.0,
                                   jnp.maximum(p[2] - p[0] - 1e-3, 0.0))
                    oyl = jnp.clip(ly_col - p[1], 0.0,
                                   jnp.maximum(p[3] - p[1] - 1e-3, 0.0))
                    period_x = stretch_w + p[20]
                    period_y = stretch_h + p[21]
                    period_x = jnp.where(period_x > 1e-6, period_x, 1e6)
                    period_y = jnp.where(period_y > 1e-6, period_y, 1e6)
                    tx = oxl - jnp.floor(oxl / period_x) * period_x
                    ty = oyl - jnp.floor(oyl / period_y) * period_y
                    in_x = (tx < stretch_w + 1e-4).astype(jnp.float32)
                    in_y = (ty < stretch_h + 1e-4).astype(jnp.float32)
                    u = p[8] + tx * p[22] - p[24]
                    v = p[9] + ty * p[23] - p[25]
                    texel = _sep_sample(u, v, p[8], p[9], p[10], p[11],
                                        p[16], ca_hbm, 4)
                    in_tile = in_x * in_y
                    return jnp.stack(
                        [texel[0] * p[12], texel[1] * p[13],
                         texel[2] * p[14], texel[3] * p[15]], 0) * \
                        in_tile[None]
                if kind_s in (K_SEP_GLYPH, K_SEP_SUBPX):
                    su = (p[10] - p[8]) / jnp.maximum(p[2] - p[0], 1e-6)
                    sv = (p[11] - p[9]) / jnp.maximum(p[3] - p[1], 1e-6)
                    u = p[8] + (lx_row - p[0]) * su
                    v = p[9] + (ly_col - p[1]) * sv
                    if kind_s == K_SEP_GLYPH:
                        a = _sep_sample(u, v, p[8], p[9], p[10], p[11],
                                        0.0, aa_hbm, 1)
                        return jnp.stack([p[12] * a, p[13] * a,
                                          p[14] * a, p[15] * a], 0)
                    m = _sep_sample(u, v, p[8], p[9], p[10], p[11], 0.0,
                                    ca_hbm, 4)
                    m_avg = (m[0] + m[1] + m[2]) * (1.0 / 3.0)
                    return jnp.stack([m[0] * p[12], m[1] * p[13],
                                      m[2] * p[14], m_avg * p[15]], 0)
                if kind_s == K_SEP_YUV:
                    # in-kernel YUV (yuv.glsl sample_yuv): three alpha-
                    # atlas planes sampled separably, then the color-space
                    # matrix on the VPU (payload layout: patterns.pattern_yuv)
                    oxl = lx_row - p[0]
                    oyl = ly_col - p[1]
                    yy = _sep_sample(p[8] + oxl * p[22], p[9] + oyl * p[23],
                                     p[8], p[9], p[10], p[11], 0.0,
                                     aa_hbm, 1)
                    uu = _sep_sample(p[12] + oxl * p[24],
                                     p[13] + oyl * p[25],
                                     p[12], p[13], p[14], p[15], 0.0,
                                     aa_hbm, 1)
                    vv = _sep_sample(p[16] + oxl * p[24],
                                     p[17] + oyl * p[25],
                                     p[16], p[17], p[18], p[19], 0.0,
                                     aa_hbm, 1)
                    sy_ = yy - p[36]
                    su_ = uu - p[37]
                    sv_ = vv - p[38]
                    r_ = p[27] * sy_ + p[28] * su_ + p[29] * sv_
                    g_ = p[30] * sy_ + p[31] * su_ + p[32] * sv_
                    b_ = p[33] * sy_ + p[34] * su_ + p[35] * sv_
                    one = jnp.ones_like(yy)
                    return jnp.clip(jnp.stack([r_, g_, b_, one], 0),
                                    0.0, 1.0)
                # K_SEP_PICTURE: device-space mapping, or raster-root
                # local mode (p[37] — picture.rs raster roots)
                w_ = jnp.maximum(p[2] - p[0], 1e-6)
                h_ = jnp.maximum(p[3] - p[1], 1e-6)
                su = (p[10] - p[8]) / w_
                sv = (p[11] - p[9]) / h_
                u = p[8] + (px[0:1, :] - p[0]) * su
                v = p[9] + (py[:, 0:1] - p[1]) * sv
                u = jnp.where(p[37] > 0.5,
                              p[8] + lx_row * p[40] - p[38], u)
                v = jnp.where(p[37] > 0.5,
                              p[9] + ly_col * p[40] - p[39], v)
                texel = _sep_sample(u, v, p[8], p[9], p[10], p[11], 0.0,
                                    sa_hbm, 4)
                texel = jnp.stack([texel[0] * p[12], texel[1] * p[13],
                                   texel[2] * p[14], texel[3] * p[15]], 0)
                return pk.apply_color_matrix(jnp, texel, p[16:36], p[36])

            branches = []
            for k in math_kinds:
                if k in (KIND_LINEAR_GRAD, KIND_RADIAL_GRAD, KIND_CONIC_GRAD):
                    branches.append(functools.partial(grad_branch, k))
                else:
                    branches.append(functools.partial(_pattern_math, k))
            branches += [functools.partial(sampled_branch, k)
                         for k in sampled_kinds]
            branches += [functools.partial(sep_branch, k)
                         for k in sep_kinds]
            kind_i = r[REC_KIND].astype(jnp.int32)
            pos = lut_ref[jnp.clip(kind_i, 0, 17)]
            if len(branches) == 1:
                color = branches[0](p, lx, ly, sx, sy, f32_rows_ref, trow)
            else:
                color = jax.lax.switch(
                    pos, [functools.partial(b, p, lx, ly, sx, sy,
                                            f32_rows_ref, trow)
                          for b in branches])

            dst = jnp.stack([acc[0], acc[1], acc[2], acc[3]], 0)
            gl_flag = blend_mod.GL_FLAVOR_FLAG if gl else 0
            if len(blends) == 1:
                blended = blend_mod.compose_swgl(jnp, blends[0] | gl_flag,
                                                 color, cov, mcov, dst)
            else:
                bpos = lut_ref[18 + r[REC_BLEND].astype(jnp.int32)]
                blended = jax.lax.switch(
                    bpos,
                    [functools.partial(
                        (lambda op: lambda c_, cv_, mc_, d_:
                         blend_mod.compose_swgl(jnp, op | gl_flag, c_, cv_,
                                                mc_, d_))(b),
                        color, cov, mcov, dst)
                     for b in blends])
            for c in range(4):
                acc[c] = blended[c]
            return carry

        jax.lax.fori_loop(0, cnt_ref[0, 0, 0], body, 0)
        for c in range(4):
            out_ref[0, c] = acc[c]

    in_specs = [
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
    ]
    args = [tile_counts.reshape(nt, 1, 1), tile_origins.reshape(nt, 1, 2),
            clear_color, jnp.asarray(lut), dense, f32_rows, alpha_atlas,
            surface_atlas, color_atlas]
    if has_init:
        in_specs.append(pl.BlockSpec((1, 4, TILE_H, TILE_W),
                                     lambda t: (t, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(init_tiles)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 4, TILE_H, TILE_W),
                               lambda t: (t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, TILE_H, TILE_W), jnp.float32),
            pltpu.VMEM((4, SAMP_H + 72, SAMP_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((4, SEP_H, SEP_W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nt, 4, TILE_H, TILE_W), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(*args)
