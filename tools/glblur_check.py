#!/usr/bin/env python
"""Validate ops/raster.py blur_gpu_1d against the REAL cs_blur.glsl
fragment math executed on llvmpipe (the linux CI rasterizer).

Runs a horizontal blur of a random u8 texture on the GL context and
compares bit-for-bit with our host model.
"""
from __future__ import annotations

import os
import sys

import numpy as np

os.environ.setdefault("LIBGL_ALWAYS_SOFTWARE", "1")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from glprobe import GlContext, VS_FULL  # noqa: E402

BLUR_FS = """#version 330 core
in vec2 vUv; out vec4 oColor;
uniform sampler2D sColor0;
uniform float uSigma;
uniform int uSupport;
uniform vec2 uGauss;      // vGaussCoefficients (pre-normalized x)
uniform vec4 uUvRect;     // vUvRect in uv units
uniform vec2 uOffsetScale;
void main() {
  vec2 uv = vec2(vUv.x, 0.5);
  vec4 original_color = texture(sColor0, uv);
  vec3 gauss_coefficient = vec3(uGauss, uGauss.y * uGauss.y);
  vec4 avg_color = original_color * gauss_coefficient.x;
  int support = min(uSupport, 300);
  for (int i = 1; i <= support; i += 2) {
    gauss_coefficient.xy *= gauss_coefficient.yz;
    float gauss_coefficient_subtotal = gauss_coefficient.x;
    gauss_coefficient.xy *= gauss_coefficient.yz;
    gauss_coefficient_subtotal += gauss_coefficient.x;
    float gauss_ratio = gauss_coefficient.x / gauss_coefficient_subtotal;
    vec2 offset = uOffsetScale * (float(i) + gauss_ratio);
    vec2 st0 = max(uv - offset, uUvRect.xy);
    vec2 st1 = min(uv + offset, uUvRect.zw);
    avg_color += (texture(sColor0, st0) + texture(sColor0, st1)) *
                 gauss_coefficient_subtotal;
  }
  oFragColor_out(avg_color);
}
"""


def main():
    from webrender_tpu.ops.raster import blur_gpu_1d

    W = 256
    rng = np.random.RandomState(7)
    row = rng.randint(0, 256, size=(1, W, 4)).astype(np.uint8)
    row[..., 3] = 255

    ctx = GlContext(w=W, h=4)
    ctx.texture_rgba8(row, linear=True, unit=0)

    for sigma in (1.0, 2.0, 3.5, 4.0):
        support = int(np.ceil(1.5 * sigma)) * 2
        f = np.float32
        s = f(sigma)
        gx = f(f(1.0) / f(np.sqrt(f(2.0) * f(3.14159265)) * s))
        gy = f(np.exp(f(-0.5) / (s * s)))
        # vertex-shader normalization
        z = f(gy * gy)
        a, b = gx, gy
        total = a
        i = 1
        while i <= support:
            a = f(a * b)
            b = f(b * z)
            sub = a
            a = f(a * b)
            b = f(b * z)
            sub = f(sub + a)
            total = f(total + f(f(2.0) * sub))
            i += 2
        g0 = f(gx / total)

        fs = BLUR_FS.replace("oFragColor_out(avg_color);",
                             "oColor = vec4(avg_color);")
        prog = ctx.compile(VS_FULL, fs)
        ctx.uniform1i(prog, "sColor0", 0)
        ctx.uniform1f(prog, "uSigma", float(sigma))
        ctx.uniform1i(prog, "uSupport", int(support))
        ctx.uniform2f(prog, "uGauss", float(g0), float(gy))
        ctx.uniform4f(prog, "uUvRect", 0.5 / W, 0.0, (W - 0.5) / W, 1.0)
        ctx.uniform2f(prog, "uOffsetScale", 1.0 / W, 0.0)
        ctx.draw(prog)
        got = ctx.read()[0].astype(int)  # [W, 4]

        src = np.floor(row[0].T.astype(np.float32))  # [4, W] u8 values
        ours_f = blur_gpu_1d(np, src[:, None, :], float(sigma), 1, W)
        ours = np.clip(np.rint(ours_f[:, 0, :]), 0, 255).astype(int).T
        mism = int((ours != got).sum())
        where = np.nonzero((ours != got).any(axis=1))[0][:5]
        print(f"sigma={sigma} support={support} mismatches={mism} "
              f"first={where.tolist()}")
        if mism:
            i = where[0]
            print("  got", got[i].tolist(), "ours", ours[i].tolist())


if __name__ == "__main__":
    main()
