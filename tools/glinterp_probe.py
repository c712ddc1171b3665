#!/usr/bin/env python
"""Calibrate llvmpipe's triangle attribute interpolation bit-exactly.

The linux CI PNGs (`platform(linux…)` reftest gates) encode llvmpipe's
per-fragment varyings: vertex-shader outputs interpolated by plane
equations that llvmpipe's setup computes in f32 (lp_state_setup.c).  Our
kernels compute local coordinates analytically (inverse homography), which
lands within ~1 ULP of the interpolated value — enough to flip u8 rounding
on AA ramps and bilinear taps.  This probe renders WR-ordered quads
(QUAD_VERTICES [[0,0],[1,0],[0,1],[1,1]], QUAD_INDICES [0,1,2, 2,1,3],
renderer/vertex.rs:1079) with a vec4 varying into an RGBA32F target and
searches for the exact f32 formula that reproduces every fragment.

Usage: python tools/glinterp_probe.py  (prints which candidate matches)

FINDINGS (r5 calibration session):
 * quad triangles interpolate as planes anchored at rotated vertex orders
   (0,1,2) and (3,2,1) — bitwise-verified per fragment;
 * plane coefficients follow lp_state_setup.c's grouping (dy20·ooa
   premultiplied) to within ~1 ULP, anchored at the v0 PIXEL CENTER
   (x0-0.5) and evaluated at integer pixel coords;
 * per-fragment evaluation is NOT a single expression: residuals show
   llvmpipe stepping attribute values across 4-wide stamps (error grows
   by exactly 1 ULP per column within a stamp, resets at stamp
   boundaries) — bit-exact emulation would require reproducing the
   accumulation schedule, the vertex-shader FMA contraction, and each
   fragment shader's op order.  Verdict: per-ULP llvmpipe parity is a
   poor trade; the engine stays on analytic inverse mapping.
"""
from __future__ import annotations

import ctypes
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
from glprobe import (GL_ARRAY_BUFFER, GL_COLOR_ATTACHMENT0,  # noqa: E402
                     GL_COLOR_BUFFER_BIT, GL_FLOAT, GL_FRAMEBUFFER,
                     GL_RGBA, GL_STATIC_DRAW, GL_TEXTURE_2D, GlContext)

GL_RGBA32F = 0x8814
GL_TRIANGLES = 0x0004
GL_ELEMENT_ARRAY_BUFFER = 0x8893
GL_UNSIGNED_SHORT = 0x1403


class InterpProbe:
    def __init__(self, w=64, h=64):
        self.ctx = GlContext(w, h)
        self.w, self.h = w, h
        g = self.ctx.gl
        # replace the FBO with RGBA32F
        tex = ctypes.c_uint()
        g.glGenTextures(1, ctypes.byref(tex))
        g.glBindTexture(GL_TEXTURE_2D, tex)
        g.glTexImage2D(GL_TEXTURE_2D, 0, GL_RGBA32F, w, h, 0, GL_RGBA,
                       GL_FLOAT, None)
        fbo = ctypes.c_uint()
        g.glGenFramebuffers(1, ctypes.byref(fbo))
        g.glBindFramebuffer(GL_FRAMEBUFFER, fbo)
        g.glFramebufferTexture2D(GL_FRAMEBUFFER, GL_COLOR_ATTACHMENT0,
                                 GL_TEXTURE_2D, tex, 0)
        g.glViewport(0, 0, w, h)
        self.prog = self.ctx.compile(
            """#version 330
            layout(location=0) in vec2 aDevicePos;  // device px
            layout(location=1) in vec4 aVarying;
            uniform mat4 uTransform;
            out vec4 vAttr;
            void main() {
                vAttr = aVarying;
                gl_Position = uTransform * vec4(aDevicePos, 0.0, 1.0);
            }""",
            """#version 330
            in vec4 vAttr;
            out vec4 oFrag;
            void main() { oFrag = vAttr; }""")
        vao = ctypes.c_uint()
        g.glGenVertexArrays(1, ctypes.byref(vao))
        g.glBindVertexArray(vao)
        self.vbo = ctypes.c_uint()
        g.glGenBuffers(1, ctypes.byref(self.vbo))
        self.ibo = ctypes.c_uint()
        g.glGenBuffers(1, ctypes.byref(self.ibo))

    def draw_quad(self, device_pos: np.ndarray, varying: np.ndarray):
        """device_pos [4,2] f32 (WR vertex order), varying [4,4] f32 →
        RGBA32F readback [h, w, 4] (row 0 = top, y-down device space)."""
        g = self.ctx.gl
        data = np.concatenate([device_pos.astype(np.float32),
                               varying.astype(np.float32)],
                              axis=1).astype(np.float32)
        g.glBindBuffer(GL_ARRAY_BUFFER, self.vbo)
        g.glBufferData(GL_ARRAY_BUFFER, data.nbytes,
                       data.ctypes.data_as(ctypes.c_void_p), GL_STATIC_DRAW)
        stride = 24
        g.glEnableVertexAttribArray(0)
        g.glVertexAttribPointer(0, 2, GL_FLOAT, 0, stride, None)
        g.glEnableVertexAttribArray(1)
        g.glVertexAttribPointer(1, 4, GL_FLOAT, 0, stride,
                                ctypes.c_void_p(8))
        idx = np.array([0, 1, 2, 2, 1, 3], np.uint16)
        g.glBindBuffer(GL_ELEMENT_ARRAY_BUFFER, self.ibo)
        g.glBufferData(GL_ELEMENT_ARRAY_BUFFER, idx.nbytes,
                       idx.ctypes.data_as(ctypes.c_void_p), GL_STATIC_DRAW)
        g.glUseProgram(self.prog)
        # WR's ortho projection (device.rs ortho: y-down framebuffer for
        # off-screen targets): x' = 2x/w - 1, y' = 2y/h - 1
        t = np.array([[2.0 / self.w, 0, 0, 0],
                      [0, 2.0 / self.h, 0, 0],
                      [0, 0, -1, 0],
                      [-1, -1, 0, 1]], np.float32)  # column-major
        loc = g.glGetUniformLocation(self.prog,
                                     ctypes.c_char_p(b"uTransform"))
        g.glUniformMatrix4fv(loc, 1, 0, t.ctypes.data_as(ctypes.c_void_p))
        g.glClearColor(ctypes.c_float(-1e30), ctypes.c_float(-1e30),
                       ctypes.c_float(-1e30), ctypes.c_float(-1e30))
        g.glClear(GL_COLOR_BUFFER_BIT)
        g.glDrawElements(GL_TRIANGLES, 6, GL_UNSIGNED_SHORT, None)
        g.glFinish()
        out = np.zeros((self.h, self.w, 4), np.float32)
        g.glReadPixels(0, 0, self.w, self.h, GL_RGBA, GL_FLOAT,
                       out.ctypes.data_as(ctypes.c_void_p))
        return out  # NOTE: row 0 is the y=0 device row under this ortho


F = np.float32


def tri_plane(p0, p1, p2, a0, a1, a2, fma=False):
    """Candidate: llvmpipe lp_setup plane equation in f32.
    lp_state_setup.c emit_coef4: dadx/dady via the 2x2 solve with
    oneoverarea; a0' = a0 - (dadx*x0 + dady*y0) (attribute at (0,0))."""
    x0, y0 = F(p0[0]), F(p0[1])
    x1, y1 = F(p1[0]), F(p1[1])
    x2, y2 = F(p2[0]), F(p2[1])
    dx01 = F(x0 - x1)
    dy01 = F(y0 - y1)
    dx20 = F(x2 - x0)
    dy20 = F(y2 - y0)
    area = F(F(dx01 * dy20) - F(dx20 * dy01))
    ooa = F(F(1.0) / area)
    da01 = F(a0 - a1)
    da20 = F(a2 - a0)
    dadx = F(F(F(da01 * dy20) + F(dy01 * da20)) * ooa)
    dady = F(F(F(da20 * dx01) + F(dx20 * da01)) * ooa)
    c = F(a0 - F(F(dadx * x0) + F(dady * y0)))
    return dadx, dady, c


def eval_plane(dadx, dady, c, px, py):
    return F(F(F(dadx * px) + F(dady * py)) + c)


def main():
    pr = InterpProbe(64, 64)
    rng = np.random.RandomState(42)
    n_match = {}
    worst = {}
    for trial in range(40):
        pos = np.zeros((4, 2), np.float32)
        # a WR-ish quad: axis-aligned bbox corners (the common case) and
        # general quads
        if trial % 2 == 0:
            x0, y0 = rng.uniform(1, 20, 2)
            w, h = rng.uniform(10, 40, 2)
            pos[0] = (x0, y0)
            pos[1] = (x0 + w, y0)
            pos[2] = (x0, y0 + h)
            pos[3] = (x0 + w, y0 + h)
        else:
            pos = rng.uniform(2, 60, (4, 2)).astype(np.float32)
            # order corners: (tl, tr, bl, br)-ish to keep triangles CCW
            pos = pos[np.argsort(pos[:, 1])]
            pos[:2] = pos[:2][np.argsort(pos[:2, 0])]
            pos[2:] = pos[2:][np.argsort(pos[2:, 0])]
        varying = rng.uniform(-100, 100, (4, 4)).astype(np.float32)
        img = pr.draw_quad(pos, varying)
        covered = img[..., 0] > -1e29
        ys, xs = np.nonzero(covered)
        if len(ys) == 0:
            continue
        pxc = xs.astype(np.float32) + F(0.5)
        pyc = ys.astype(np.float32) + F(0.5)
        # which triangle: (v0,v1,v2) vs (v2,v1,v3) — classify by the
        # diagonal v1-v2
        d = (pos[2][0] - pos[1][0]) * (pyc - pos[1][1]) - \
            (pos[2][1] - pos[1][1]) * (pxc - pos[1][0])
        for chan in range(4):
            a = varying[:, chan]
            got = img[ys, xs, chan]
            for name, fma in (("setup_f32", False),):
                p1 = tri_plane(pos[0], pos[1], pos[2], a[0], a[1], a[2],
                               fma)
                p2 = tri_plane(pos[2], pos[1], pos[3], a[2], a[1], a[3],
                               fma)
                e1 = eval_plane(*p1, pxc, pyc)
                e2 = eval_plane(*p2, pxc, pyc)
                pred = np.where(d <= 0, e1, e2)
                pred2 = np.where(d <= 0, e2, e1)
                m1 = (pred == got)
                m2 = (pred2 == got)
                m = np.maximum(m1, m2)
                key = name
                n_match.setdefault(key, [0, 0])
                n_match[key][0] += int(m1.sum())
                n_match[key][1] += len(got)
                rel = np.abs(pred - got) / np.maximum(np.abs(got), 1e-6)
                w0 = worst.get(key, 0.0)
                worst[key] = max(w0, float(rel.max()))
    for k, (hit, tot) in n_match.items():
        print(f"{k}: {hit}/{tot} exact fragments, worst rel err "
              f"{worst[k]:.3e}")


if __name__ == "__main__":
    main()
