#!/usr/bin/env python
"""Headless llvmpipe (Mesa swrast) probe via EGL surfaceless.

The reference's linux CI renders reftests on OSMesa/llvmpipe
(`/root/reference/wrench/script/headless.py`), so the checked-in PNGs with
`platform(linux…)` gates are exact llvmpipe outputs.  This harness creates
a GL context on the SAME software rasterizer and runs micro-programs to
calibrate the numerical semantics our kernels must reproduce to pass those
(0,0)-budget comparisons: unorm8 render-target rounding, fixed-function
blending precision, and texture bilinear filtering precision.

Usage: python tools/glprobe.py  (prints a calibration report)
Library: GlContext offers compile/draw/readback helpers for experiments.
"""
from __future__ import annotations

import ctypes
import ctypes.util
import os

import numpy as np

# --- EGL -------------------------------------------------------------
EGL_PLATFORM_SURFACELESS_MESA = 0x31DD
EGL_NO_CONTEXT = None
EGL_OPENGL_API = 0x30A2
EGL_NONE = 0x3038
EGL_CONTEXT_MAJOR_VERSION = 0x3098
EGL_CONTEXT_MINOR_VERSION = 0x30FB
EGL_SURFACE_TYPE = 0x3033
EGL_PBUFFER_BIT = 0x0001
EGL_RENDERABLE_TYPE = 0x3040
EGL_OPENGL_BIT = 0x0008

# --- GL constants ----------------------------------------------------
GL_COLOR_BUFFER_BIT = 0x4000
GL_TEXTURE_2D = 0x0DE1
GL_RGBA = 0x1908
GL_RGBA8 = 0x8058
GL_UNSIGNED_BYTE = 0x1401
GL_FLOAT = 0x1406
GL_NEAREST = 0x2600
GL_LINEAR = 0x2601
GL_TEXTURE_MIN_FILTER = 0x2801
GL_TEXTURE_MAG_FILTER = 0x2800
GL_TEXTURE_WRAP_S = 0x2802
GL_TEXTURE_WRAP_T = 0x2803
GL_CLAMP_TO_EDGE = 0x812F
GL_FRAMEBUFFER = 0x8D40
GL_COLOR_ATTACHMENT0 = 0x8CE0
GL_VERTEX_SHADER = 0x8B31
GL_FRAGMENT_SHADER = 0x8B30
GL_COMPILE_STATUS = 0x8B81
GL_LINK_STATUS = 0x8B82
GL_ARRAY_BUFFER = 0x8892
GL_STATIC_DRAW = 0x88E4
GL_TRIANGLE_STRIP = 0x0005
GL_BLEND = 0x0BE2
GL_ONE = 1
GL_ONE_MINUS_SRC_ALPHA = 0x0303
GL_TEXTURE0 = 0x84C0


class GlContext:
    def __init__(self, w: int = 256, h: int = 4):
        self.egl = ctypes.CDLL("libEGL.so.1")
        self.gl = ctypes.CDLL("libGL.so.1")
        e = self.egl
        e.eglGetPlatformDisplay.restype = ctypes.c_void_p
        e.eglGetPlatformDisplay.argtypes = [ctypes.c_uint, ctypes.c_void_p,
                                            ctypes.c_void_p]
        self.dpy = e.eglGetPlatformDisplay(EGL_PLATFORM_SURFACELESS_MESA,
                                           None, None)
        assert self.dpy, "no EGL display"
        major, minor = ctypes.c_int(), ctypes.c_int()
        assert e.eglInitialize(ctypes.c_void_p(self.dpy),
                               ctypes.byref(major), ctypes.byref(minor))
        assert e.eglBindAPI(EGL_OPENGL_API)
        cfg_attribs = (ctypes.c_int * 7)(
            EGL_SURFACE_TYPE, EGL_PBUFFER_BIT,
            EGL_RENDERABLE_TYPE, EGL_OPENGL_BIT, EGL_NONE, 0, 0)
        cfg = ctypes.c_void_p()
        n = ctypes.c_int()
        e.eglChooseConfig.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_void_p, ctypes.c_int,
                                      ctypes.c_void_p]
        assert e.eglChooseConfig(ctypes.c_void_p(self.dpy), cfg_attribs,
                                 ctypes.byref(cfg), 1, ctypes.byref(n))
        ctx_attribs = (ctypes.c_int * 5)(
            EGL_CONTEXT_MAJOR_VERSION, 3, EGL_CONTEXT_MINOR_VERSION, 3,
            EGL_NONE)
        e.eglCreateContext.restype = ctypes.c_void_p
        e.eglCreateContext.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_void_p, ctypes.c_void_p]
        self.ctx = e.eglCreateContext(ctypes.c_void_p(self.dpy), cfg,
                                      None, ctx_attribs)
        assert self.ctx, "context creation failed"
        e.eglMakeCurrent.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 3
        assert e.eglMakeCurrent(ctypes.c_void_p(self.dpy), None, None,
                                ctypes.c_void_p(self.ctx))
        g = self.gl
        g.glGetString.restype = ctypes.c_char_p
        self.renderer = g.glGetString(0x1F01).decode()  # GL_RENDERER
        self.w, self.h = w, h
        self._setup_fbo(w, h)
        self._quad()

    # -- plumbing -----------------------------------------------------
    def _setup_fbo(self, w, h):
        g = self.gl
        tex = ctypes.c_uint()
        g.glGenTextures(1, ctypes.byref(tex))
        g.glBindTexture(GL_TEXTURE_2D, tex)
        g.glTexImage2D(GL_TEXTURE_2D, 0, GL_RGBA8, w, h, 0, GL_RGBA,
                       GL_UNSIGNED_BYTE, None)
        fbo = ctypes.c_uint()
        g.glGenFramebuffers(1, ctypes.byref(fbo))
        g.glBindFramebuffer(GL_FRAMEBUFFER, fbo)
        g.glFramebufferTexture2D(GL_FRAMEBUFFER, GL_COLOR_ATTACHMENT0,
                                 GL_TEXTURE_2D, tex, 0)
        g.glViewport(0, 0, w, h)
        self.fbo_tex = tex

    def _quad(self):
        g = self.gl
        vao = ctypes.c_uint()
        g.glGenVertexArrays(1, ctypes.byref(vao))
        g.glBindVertexArray(vao)
        verts = np.array([-1, -1, 1, -1, -1, 1, 1, 1], np.float32)
        vbo = ctypes.c_uint()
        g.glGenBuffers(1, ctypes.byref(vbo))
        g.glBindBuffer(GL_ARRAY_BUFFER, vbo)
        g.glBufferData(GL_ARRAY_BUFFER, verts.nbytes,
                       verts.ctypes.data_as(ctypes.c_void_p), GL_STATIC_DRAW)
        g.glEnableVertexAttribArray(0)
        g.glVertexAttribPointer(0, 2, GL_FLOAT, 0, 0, None)

    def compile(self, vs_src: str, fs_src: str) -> int:
        g = self.gl
        def sh(kind, src):
            s = g.glCreateShader(kind)
            buf = ctypes.c_char_p(src.encode())
            length = ctypes.c_int(len(src))
            g.glShaderSource(s, 1, ctypes.byref(buf), ctypes.byref(length))
            g.glCompileShader(s)
            ok = ctypes.c_int()
            g.glGetShaderiv(s, GL_COMPILE_STATUS, ctypes.byref(ok))
            if not ok.value:
                log = ctypes.create_string_buffer(4096)
                g.glGetShaderInfoLog(s, 4096, None, log)
                raise RuntimeError("shader: " + log.value.decode())
            return s
        p = g.glCreateProgram()
        g.glAttachShader(p, sh(GL_VERTEX_SHADER, vs_src))
        g.glAttachShader(p, sh(GL_FRAGMENT_SHADER, fs_src))
        g.glLinkProgram(p)
        ok = ctypes.c_int()
        g.glGetProgramiv(p, GL_LINK_STATUS, ctypes.byref(ok))
        if not ok.value:
            log = ctypes.create_string_buffer(4096)
            g.glGetProgramInfoLog(p, 4096, None, log)
            raise RuntimeError("link: " + log.value.decode())
        return p

    def draw(self, prog: int, blend=None, clear=(0, 0, 0, 0)):
        g = self.gl
        g.glClearColor(ctypes.c_float(clear[0]), ctypes.c_float(clear[1]),
                       ctypes.c_float(clear[2]), ctypes.c_float(clear[3]))
        g.glClear(GL_COLOR_BUFFER_BIT)
        if blend is not None:
            g.glEnable(GL_BLEND)
            g.glBlendFunc(blend[0], blend[1])
        else:
            g.glDisable(GL_BLEND)
        g.glUseProgram(prog)
        g.glDrawArrays(GL_TRIANGLE_STRIP, 0, 4)

    def draw_noclear(self, prog: int, blend=None):
        g = self.gl
        if blend is not None:
            g.glEnable(GL_BLEND)
            g.glBlendFunc(blend[0], blend[1])
        else:
            g.glDisable(GL_BLEND)
        g.glUseProgram(prog)
        g.glDrawArrays(GL_TRIANGLE_STRIP, 0, 4)

    def read(self) -> np.ndarray:
        g = self.gl
        out = np.zeros((self.h, self.w, 4), np.uint8)
        g.glFinish()
        g.glReadPixels(0, 0, self.w, self.h, GL_RGBA, GL_UNSIGNED_BYTE,
                       out.ctypes.data_as(ctypes.c_void_p))
        return out

    def texture_rgba8(self, texels: np.ndarray, linear=True, unit=0) -> int:
        """Upload (h, w, 4) u8 → bound texture on `unit`."""
        g = self.gl
        tex = ctypes.c_uint()
        g.glGenTextures(1, ctypes.byref(tex))
        g.glActiveTexture(GL_TEXTURE0 + unit)
        g.glBindTexture(GL_TEXTURE_2D, tex)
        h, w = texels.shape[:2]
        t = np.ascontiguousarray(texels, np.uint8)
        g.glTexImage2D(GL_TEXTURE_2D, 0, GL_RGBA8, w, h, 0, GL_RGBA,
                       GL_UNSIGNED_BYTE, t.ctypes.data_as(ctypes.c_void_p))
        filt = GL_LINEAR if linear else GL_NEAREST
        g.glTexParameteri(GL_TEXTURE_2D, GL_TEXTURE_MIN_FILTER, filt)
        g.glTexParameteri(GL_TEXTURE_2D, GL_TEXTURE_MAG_FILTER, filt)
        g.glTexParameteri(GL_TEXTURE_2D, GL_TEXTURE_WRAP_S, GL_CLAMP_TO_EDGE)
        g.glTexParameteri(GL_TEXTURE_2D, GL_TEXTURE_WRAP_T, GL_CLAMP_TO_EDGE)
        return tex.value

    def uniform1i(self, prog, name, v):
        g = self.gl
        loc = g.glGetUniformLocation(prog, name.encode())
        g.glUseProgram(prog)
        g.glUniform1i(loc, v)

    def uniform1f(self, prog, name, v):
        g = self.gl
        loc = g.glGetUniformLocation(prog, name.encode())
        g.glUseProgram(prog)
        g.glUniform1f(loc, ctypes.c_float(v))

    def uniform2f(self, prog, name, a, b):
        g = self.gl
        loc = g.glGetUniformLocation(prog, name.encode())
        g.glUseProgram(prog)
        g.glUniform2f(loc, ctypes.c_float(a), ctypes.c_float(b))

    def uniform4f(self, prog, name, a, b, c, d):
        g = self.gl
        loc = g.glGetUniformLocation(prog, name.encode())
        g.glUseProgram(prog)
        g.glUniform4f(loc, ctypes.c_float(a), ctypes.c_float(b),
                      ctypes.c_float(c), ctypes.c_float(d))


VS_FULL = """#version 330 core
layout(location=0) in vec2 aPos;
out vec2 vUv;
void main() { vUv = aPos * 0.5 + 0.5; gl_Position = vec4(aPos, 0, 1); }
"""


def probe_unorm_rounding(ctx: GlContext):
    """Fragment writes v = x/(2*255) ramp: which float→u8 rounding?"""
    fs = """#version 330 core
    in vec2 vUv; out vec4 oColor;
    void main() {
      float t = floor(vUv.x * 256.0);   // 0..255 per column
      float v = (t + 0.5) / 255.0 * 0.5;  // exact k+0.5 half-steps /255
      oColor = vec4(v, fract(t / 255.0), 0.0, 1.0);
    }
    """
    prog = ctx.compile(VS_FULL, fs)
    ctx.draw(prog)
    out = ctx.read()[0]
    ties_up = ties_down = 0
    for col in range(256):
        want = (col + 0.5) * 0.5  # exact x.25/x.75/x.5 pattern in u8 units
        got = out[col, 0]
        lo, hi = int(np.floor(want)), int(np.ceil(want))
        if got == hi:
            ties_up += 1
        elif got == lo:
            ties_down += 1
    # distinguish half-even: columns where want = odd+0.5 should go even
    half_even = all(
        out[col, 0] == int(np.rint((col + 0.5) * 0.5))
        for col in range(0, 256, 2))
    return {"ties_up": ties_up, "ties_down": ties_down,
            "half_even_consistent": half_even}


def probe_blend(ctx: GlContext):
    """src over dst=white with ONE/ONE_MINUS_SRC_ALPHA: is blending float
    or 8-bit fixed? For src=(0.4875, 0.0125, 0, 0.5) float blend over white
    gives (251.8125, 130.6875, 127.5)/255."""
    fs = """#version 330 core
    in vec2 vUv; out vec4 oColor;
    void main() { oColor = vec4(0.4875, 0.0125, 0.0, 0.5); }
    """
    prog = ctx.compile(VS_FULL, fs)
    ctx.draw(prog, blend=(GL_ONE, GL_ONE_MINUS_SRC_ALPHA), clear=(1, 1, 1, 1))
    out = ctx.read()[0, 0]
    return {"blend_out": out.tolist(),
            "float_pred": [251.8125, 130.6875, 127.5, 255.0]}


def probe_bilinear(ctx: GlContext):
    """Sample a 2-texel texture across fractional offsets: lerp precision."""
    tex = np.zeros((1, 2, 4), np.uint8)
    tex[0, 0] = (10, 100, 200, 255)
    tex[0, 1] = (11, 101, 201, 255)
    ctx.texture_rgba8(tex, linear=True, unit=0)
    fs = """#version 330 core
    in vec2 vUv; out vec4 oColor;
    uniform sampler2D sTex;
    void main() {
      // u from 0.5 to 1.5 texels across the 256 columns
      float f = floor(vUv.x * 256.0) / 256.0;  // 0..255/256
      vec2 uv = vec2((0.5 + f) / 2.0, 0.5);
      oColor = texture(sTex, uv);
    }
    """
    prog = ctx.compile(VS_FULL, fs)
    ctx.uniform1i(prog, "sTex", 0)
    ctx.draw(prog)
    out = ctx.read()[0]
    # green channel: 100 + f*1 → where does it flip to 101?
    flips = [col for col in range(255)
             if out[col + 1, 1] != out[col, 1]]
    return {"green_flip_cols": flips[:4],
            "sample_row": out[::64, :3].tolist()}


if __name__ == "__main__":
    os.environ.setdefault("LIBGL_ALWAYS_SOFTWARE", "1")
    ctx = GlContext()
    print("renderer:", ctx.renderer)
    print("unorm rounding:", probe_unorm_rounding(ctx))
    print("blend:", probe_blend(ctx))
    print("bilinear:", probe_bilinear(ctx))
