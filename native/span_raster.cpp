// Native span rasterizer — the SWGL role (swgl/src/rasterize.h semantics,
// re-implemented against this framework's instance-record format instead of
// a GL state machine). One function interprets a render pass: for each
// instance in painter order, rasterize its device bbox span-by-span with
// the same pattern / coverage / blend math as ops/patterns.py and
// ops/blend.py (single-source kernel specification, third backend).
//
// Built as a plain C shared library (no pybind11 in this image); the Python
// side binds with ctypes (webrender_tpu/oracle/native.py).
//
// Layouts (must match webrender_tpu/frame/gpu.py):
//   instances[i*8 + k]: kind, spatial, prim_addr, clip_addr, clip_count,
//                       blend, edge_aa, flags
//   payload prefix: [0:4] pattern rect, [4:8] coverage rect
//   transforms[t*12]: inverse homography (9), sx, sy, flags
//   clip records: CLIP_STRIDE floats (rect, radii, mode, spatial, kind,
//                 mask uv at [16:20])

#include <cmath>
#include <cstdint>
#include <cstring>
#include <algorithm>

namespace {

constexpr int INST_FIELDS = 8;
constexpr int CLIP_STRIDE = 128;
constexpr int PAYLOAD = 64;

struct Ctx {
  const float* f32;
  int64_t f32_len;
  const float* transforms;
  const float* color_atlas;  // planar [4, ca_h, ca_w]
  int64_t ca_h, ca_w;
  const float* alpha_atlas;  // [aa_h, aa_w]
  int64_t aa_h, aa_w;
  const float* surface_atlas;  // planar [4, sa_h, sa_w]
  int64_t sa_h, sa_w;
};

inline float clampf(float v, float lo, float hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// A&S 7.1.26 polynomial erf — identical constants to patterns.erf
inline float erf_approx(float x) {
  float s = x < 0.f ? -1.f : 1.f;
  x = std::fabs(x);
  float t = 1.f / (1.f + 0.3275911f * x);
  float y = 1.f - (((((1.061405429f * t - 1.453152027f) * t) + 1.421413741f)
                    * t - 0.284496736f) * t + 0.254829592f) * t
                    * std::exp(-x * x);
  return s * y;
}

inline void inverse_map(const float* tr, float px, float py, float* lx,
                        float* ly) {
  float u = px * tr[0] + py * tr[3] + tr[6];
  float v = px * tr[1] + py * tr[4] + tr[7];
  float w = px * tr[2] + py * tr[5] + tr[8];
  // w <= 0 = behind the projection plane (near-plane clip): map far
  // outside any local rect (mirrors patterns.inverse_map)
  if (w <= 1e-9f) {
    *lx = 1e8f;
    *ly = 1e8f;
    return;
  }
  *lx = u / w;
  *ly = v / w;
}

inline float edge_term(float d, bool aa) {
  if (aa) return std::min(d, 0.5f);
  return d >= 0.f ? 0.5f : -1e3f;
}

inline float rect_coverage(float x0, float y0, float x1, float y1, float lx,
                           float ly, float sx, float sy, int edge_aa) {
  float tl = edge_term((lx - x0) * sx, edge_aa & 1);
  float tr = edge_term((x1 - lx) * sx, edge_aa & 4);
  float tt = edge_term((ly - y0) * sy, edge_aa & 2);
  float tb = edge_term((y1 - ly) * sy, edge_aa & 8);
  float cx = clampf(tl + tr, 0.f, 1.f);
  float cy = clampf(tt + tb, 0.f, 1.f);
  return cx * cy;
}

inline float corner_coverage(float lx, float ly, float cx, float cy, float rx,
                             float ry, float sign_x, float sign_y,
                             float scale) {
  bool active = rx > 0.f && ry > 0.f;
  float rx_s = active ? rx : 1.f;
  float ry_s = active ? ry : 1.f;
  float dx = (cx - lx) * sign_x;
  float dy = (cy - ly) * sign_y;
  bool in_region = dx > 0.f && dy > 0.f && active;
  if (!in_region) return 1.f;
  float ex = dx / rx_s, ey = dy / ry_s;
  float g = std::sqrt(ex * ex + ey * ey);
  float grad = std::sqrt((dx / (rx_s * rx_s)) * (dx / (rx_s * rx_s)) +
                         (dy / (ry_s * ry_s)) * (dy / (ry_s * ry_s)));
  grad = std::max(grad, 1e-6f);
  float dist = (g - 1.f) * g / grad;
  return clampf(0.5f - dist * scale, 0.f, 1.f);
}

inline float rounded_rect_coverage(const float* r, const float* radii,
                                   float lx, float ly, float sx, float sy) {
  float cov = rect_coverage(r[0], r[1], r[2], r[3], lx, ly, sx, sy, 0xF);
  float scale = std::sqrt(sx * sy);
  cov *= corner_coverage(lx, ly, r[0] + radii[0], r[1] + radii[1], radii[0],
                         radii[1], 1.f, 1.f, scale);
  cov *= corner_coverage(lx, ly, r[2] - radii[2], r[1] + radii[3], radii[2],
                         radii[3], -1.f, 1.f, scale);
  cov *= corner_coverage(lx, ly, r[2] - radii[4], r[3] - radii[5], radii[4],
                         radii[5], -1.f, -1.f, scale);
  cov *= corner_coverage(lx, ly, r[0] + radii[6], r[3] - radii[7], radii[6],
                         radii[7], 1.f, -1.f, scale);
  return cov;
}

// swgl fwidth(local_pos) (glsl.h:765): |dFdx(lx)| + |dFdx(ly)| from the
// projective inverse map's screen-X derivatives.
inline float local_fwidth(const float* tr, float lx, float ly, float px,
                          float py) {
  float w = px * tr[2] + py * tr[5] + tr[8];
  if (std::fabs(w) < 1e-9f) w = 1e-9f;
  float dlx = (tr[0] - lx * tr[2]) / w;
  float dly = (tr[1] - ly * tr[2]) / w;
  return std::fabs(dlx) + std::fabs(dly);
}

// transform.glsl rectangle_aa_fragment + SWGL distance_aa_xy
inline float rect_coverage_tx(float x0, float y0, float x1, float y1,
                              float lx, float ly, float fw) {
  float dx = std::max(x0 - lx, lx - x1);
  float dy = std::max(y0 - ly, ly - y1);
  if (fw < 1e-9f) fw = 1e-9f;
  return clampf(0.5f - std::max(dx, dy) / fw, 0.f, 1.f);
}

inline bool is_transformed(const float* tr) {
  return (((int)tr[11]) & 4) != 0;
}

inline float rect_coverage_auto(const float* tr, float x0, float y0,
                                float x1, float y1, float lx, float ly,
                                float px, float py, int edge_aa) {
  if (is_transformed(tr)) {
    // edge_aa == 0 on a transformed prim draws HARD edges (pixel-center
    // inside test) — the ps_split_composite role (3D plane seams are
    // aliased in the reference); mirrors patterns.rect_coverage_auto.
    if ((edge_aa & 0xF) == 0) {
      float dx = std::max(x0 - lx, lx - x1);
      float dy = std::max(y0 - ly, ly - y1);
      // inclusion bias for exact-on-edge pixel centers (patterns.py
      // rect_coverage_auto hard path)
      return std::max(dx, dy) < (1.0f / 1024.0f) ? 1.f : 0.f;
    }
    return rect_coverage_tx(x0, y0, x1, y1, lx, ly,
                            local_fwidth(tr, lx, ly, px, py));
  }
  return rect_coverage(x0, y0, x1, y1, lx, ly, tr[9], tr[10], edge_aa);
}

// cs_clip_rectangle's general fragment math (ellipse.glsl
// distance_to_rounded_rect): diagonal half-space corner selection, Taubin
// first-order ellipse distance, max() with the rect SDF, one AA clamp —
// mirrors patterns.rounded_rect_sdf_coverage exactly.
inline float rounded_rect_sdf_coverage(const float* r, const float* radii,
                                       float lx, float ly, float aa_mul) {
  float x0 = r[0], y0 = r[1], x1 = r[2], y1 = r[3];
  float cpx = 1e-6f, cpy = 1e-6f, civx = 1.f, civy = 1.f;
  struct Corner { float rx, ry, nx, ny, ppx, ppy; int which; };
  const Corner corners[4] = {
      {radii[0], radii[1], -radii[1], -radii[0], x0, y0 + radii[1], 0},
      {radii[2], radii[3], radii[3], -radii[2], x1 - radii[2], y0, 1},
      {radii[4], radii[5], radii[5], radii[4], x1, y1 - radii[5], 2},
      {radii[6], radii[7], -radii[7], radii[6], x0 + radii[6], y1, 3},
  };
  for (const Corner& c : corners) {
    float off = c.nx * c.ppx + c.ny * c.ppy;
    if (c.nx * lx + c.ny * ly > off) {
      switch (c.which) {
        case 0: cpx = (x0 + c.rx) - lx; cpy = (y0 + c.ry) - ly; break;
        case 1: cpx = -((x1 - c.rx) - lx); cpy = (y0 + c.ry) - ly; break;
        case 2: cpx = lx - (x1 - c.rx); cpy = ly - (y1 - c.ry); break;
        case 3: cpx = (x0 + c.rx) - lx; cpy = -((y1 - c.ry) - ly); break;
      }
      civx = 1.f / std::max(c.rx * c.rx, 1e-6f);
      civy = 1.f / std::max(c.ry * c.ry, 1e-6f);
    }
  }
  float prx = cpx * civx, pry = cpy * civy;
  float g = cpx * prx + cpy * pry - 1.f;
  float dgx = 2.f * prx, dgy = 2.f * pry;
  float norm = std::sqrt(dgx * dgx + dgy * dgy);
  float ell = g / std::max(norm, 1e-12f);
  float rect = std::max(std::max(x0 - lx, lx - x1),
                        std::max(y0 - ly, ly - y1));
  float dist = std::max(ell, rect);
  return clampf(0.5f - dist * aa_mul, 0.f, 1.f);
}

// WR_FEATURE_FAST_PATH: exact Euclidean rounded-box SDF (uniform radii;
// render_target.rs:1215) — mirrors patterns.rounded_rect_fast_coverage.
inline float rounded_rect_fast_coverage(const float* r, float radius,
                                        float lx, float ly, float aa_mul) {
  float cx = (r[0] + r[2]) * 0.5f, cy = (r[1] + r[3]) * 0.5f;
  float hx = (r[2] - r[0]) * 0.5f - radius;
  float hy = (r[3] - r[1]) * 0.5f - radius;
  float dx = std::fabs(lx - cx) - hx;
  float dy = std::fabs(ly - cy) - hy;
  float ox = std::max(dx, 0.f), oy = std::max(dy, 0.f);
  float outside = std::sqrt(ox * ox + oy * oy);
  float inside = std::min(std::max(dx, dy), 0.f);
  float dist = outside + inside - radius;
  return clampf(0.5f - dist * aa_mul, 0.f, 1.f);
}

inline float rounded_rect_coverage_auto(const float* tr, const float* r,
                                        const float* radii, float fast_flag,
                                        float lx, float ly, float px,
                                        float py) {
  float fw = local_fwidth(tr, lx, ly, px, py);
  if (fw < 1e-9f) fw = 1e-9f;
  float aa_mul = 1.0f / fw;
  if (fast_flag > 0.5f)
    return rounded_rect_fast_coverage(r, radii[0], lx, ly, aa_mul);
  return rounded_rect_sdf_coverage(r, radii, lx, ly, aa_mul);
}

// swgl fixed-point bilinear (swgl/src/texture.h textureLinearPlanarRGBA8 /
// linearQuantize): 7-bit fractions, truncating int lerps, y then x.
inline void sample_plane(const float* plane, int64_t H, int64_t W, float u,
                         float v, float u0, float v0, float u1, float v1,
                         bool nearest, float* out) {
  float lo_u = u0 + 0.5f, hi_u = std::max(u1 - 0.5f, lo_u);
  float lo_v = v0 + 0.5f, hi_v = std::max(v1 - 0.5f, lo_v);
  u = clampf(u, lo_u, hi_u);
  v = clampf(v, lo_v, hi_v);
  if (nearest) {
    u = std::floor(u) + 0.5f;
    v = std::floor(v) + 0.5f;
  }
  int64_t qu = (int64_t)std::floor(u * 128.0f - 63.5f);
  int64_t qv = (int64_t)std::floor(v * 128.0f - 63.5f);
  int64_t ix = qu >> 7, iy = qv >> 7;
  int fx = (int)(qu & 127), fy = (int)(qv & 127);
  if (ix < 0) fx = 0;
  if (ix > W - 2) fx = 128;
  int64_t x0 = std::min(std::max(ix, (int64_t)0), W - 2);
  int64_t y0 = std::min(std::max(iy, (int64_t)0), H - 1);
  int64_t y1 = y0 + ((iy >= 0 && iy < H - 1) ? 1 : 0);
  int64_t x1 = std::min(x0 + 1, W - 1);
  int t00 = (int)std::floor(plane[y0 * W + x0] * 255.0f + 0.5f);
  int t10 = (int)std::floor(plane[y0 * W + x1] * 255.0f + 0.5f);
  int t01 = (int)std::floor(plane[y1 * W + x0] * 255.0f + 0.5f);
  int t11 = (int)std::floor(plane[y1 * W + x1] * 255.0f + 0.5f);
  int a = t00 + (((t01 - t00) * fy) >> 7);
  int b = t10 + (((t11 - t10) * fy) >> 7);
  *out = (float)(a + (((b - a) * fx) >> 7)) * (1.0f / 255.0f);
}

inline void sample_plane8(const float* plane, int64_t H, int64_t W, float u,
                          float v, float u0, float v0, float u1, float v1,
                          float* out) {
  // GPU-style bilinear: 8-bit fractions, rounded result (the cached
  // box-shadow masks — patterns.sample_alpha8)
  float lo_u = u0 + 0.5f, hi_u = std::max(u1 - 0.5f, lo_u);
  float lo_v = v0 + 0.5f, hi_v = std::max(v1 - 0.5f, lo_v);
  u = clampf(u, lo_u, hi_u);
  v = clampf(v, lo_v, hi_v);
  int64_t x0 = (int64_t)std::floor(u - 0.5f);
  int64_t y0 = (int64_t)std::floor(v - 0.5f);
  x0 = std::min(std::max(x0, (int64_t)0), std::max(W - 2, (int64_t)0));
  y0 = std::min(std::max(y0, (int64_t)0), std::max(H - 2, (int64_t)0));
  int fx = (int)std::floor((u - 0.5f - (float)x0) * 256.0f + 0.5f);
  int fy = (int)std::floor((v - 0.5f - (float)y0) * 256.0f + 0.5f);
  int64_t x1 = std::min(x0 + 1, W - 1);
  int64_t y1 = std::min(y0 + 1, H - 1);
  int t00 = (int)std::floor(plane[y0 * W + x0] * 255.0f + 0.5f);
  int t10 = (int)std::floor(plane[y0 * W + x1] * 255.0f + 0.5f);
  int t01 = (int)std::floor(plane[y1 * W + x0] * 255.0f + 0.5f);
  int t11 = (int)std::floor(plane[y1 * W + x1] * 255.0f + 0.5f);
  int64_t a = (int64_t)t00 * (256 - fx) + (int64_t)t10 * fx;
  int64_t b = (int64_t)t01 * (256 - fx) + (int64_t)t11 * fx;
  int64_t o = a * (256 - fy) + b * fy;
  *out = (float)((o + 32768) >> 16) * (1.0f / 255.0f);
}

inline void sample_rgba(const Ctx& c, const float* atlas, int64_t H,
                        int64_t W, float u, float v, float u0, float v0,
                        float u1, float v1, bool nearest, float out[4]) {
  // coords computed ONCE for all four planes (sample_plane re-derived
  // them per channel — 4x redundant fixed-point addressing per texel)
  float lo_u = u0 + 0.5f, hi_u = std::max(u1 - 0.5f, lo_u);
  float lo_v = v0 + 0.5f, hi_v = std::max(v1 - 0.5f, lo_v);
  u = clampf(u, lo_u, hi_u);
  v = clampf(v, lo_v, hi_v);
  if (nearest) {
    u = std::floor(u) + 0.5f;
    v = std::floor(v) + 0.5f;
  }
  int64_t qu = (int64_t)std::floor(u * 128.0f - 63.5f);
  int64_t qv = (int64_t)std::floor(v * 128.0f - 63.5f);
  int64_t ix = qu >> 7, iy = qv >> 7;
  int fx = (int)(qu & 127), fy = (int)(qv & 127);
  if (ix < 0) fx = 0;
  if (ix > W - 2) fx = 128;
  int64_t x0 = std::min(std::max(ix, (int64_t)0), W - 2);
  int64_t y0 = std::min(std::max(iy, (int64_t)0), H - 1);
  int64_t y1 = y0 + ((iy >= 0 && iy < H - 1) ? 1 : 0);
  int64_t x1 = std::min(x0 + 1, W - 1);
  const int64_t plane = H * W;
  const float* r0 = atlas + y0 * W;
  const float* r1 = atlas + y1 * W;
  for (int ch = 0; ch < 4; ch++, r0 += plane, r1 += plane) {
    int t00 = (int)std::floor(r0[x0] * 255.0f + 0.5f);
    int t10 = (int)std::floor(r0[x1] * 255.0f + 0.5f);
    int t01 = (int)std::floor(r1[x0] * 255.0f + 0.5f);
    int t11 = (int)std::floor(r1[x1] * 255.0f + 0.5f);
    int a = t00 + (((t01 - t00) * fy) >> 7);
    int b = t10 + (((t11 - t10) * fy) >> 7);
    out[ch] = (float)(a + (((b - a) * fx) >> 7)) * (1.0f / 255.0f);
  }
}

// tile repeat coords (patterns._tile_coords)
inline bool tile_coords(const float* p, float lx, float ly, float stretch_w,
                        float stretch_h, float spacing_w, float spacing_h,
                        float* tx, float* ty) {
  float ox = lx - p[0], oy = ly - p[1];
  float period_x = stretch_w + spacing_w;
  float period_y = stretch_h + spacing_h;
  if (period_x <= 1e-6f) period_x = 1e6f;
  if (period_y <= 1e-6f) period_y = 1e6f;
  *tx = ox - std::floor(ox / period_x) * period_x;
  *ty = oy - std::floor(oy / period_y) * period_y;
  return (*tx < stretch_w + 1e-4f) && (*ty < stretch_h + 1e-4f);
}

inline void eval_stops(const Ctx& c, int addr, int n, float t, float repeat,
                       float out[4]) {
  if (repeat > 0.5f) t = t - std::floor(t);
  float col[4] = {c.f32[addr + 1], c.f32[addr + 2], c.f32[addr + 3],
                  c.f32[addr + 4]};
  for (int i = 1; i < n; i++) {
    float o0 = c.f32[addr + (i - 1) * 8];
    float o1 = c.f32[addr + i * 8];
    float w;
    float denom = o1 - o0;
    if (denom > 1e-9f)
      w = clampf((t - o0) / denom, 0.f, 1.f);
    else
      w = t >= o1 ? 1.f : 0.f;
    for (int ch = 0; ch < 4; ch++)
      col[ch] += (c.f32[addr + i * 8 + 1 + ch] - col[ch]) * w;
  }
  // stop records are premultiplied (gradient_stops_records)
  for (int ch = 0; ch < 4; ch++) out[ch] = col[ch];
}

// Gaussian blur of a rounded rect: analytic erf x-blur per horizontal
// slice integrated by gaussian-weighted y-quadrature (mirrors
// patterns._blurred_rounded_rect_coverage)
inline float blurred_rect_cov(float x0, float y0, float x1, float y1,
                              float sigma, float lx, float ly);

inline float blurred_rounded_rect_cov(const float* rect, const float* radii,
                                      float sigma, float lx, float ly) {
  float x0 = rect[0], y0 = rect[1], x1 = rect[2], y1 = rect[3];
  float sig = std::max(sigma, 1e-3f);
  float s = sig * 1.4142135623730951f;
  // exact separable blur of the full rect minus the blurred corner cut
  // regions, each integrated over its exact y-extent
  float base = blurred_rect_cov(x0, y0, x1, y1, sigma, lx, ly);
  float invnorm = 1.f / (sig * 2.5066282746310002f);
  const int N = 8;
  const float crn[4][5] = {{radii[0], radii[1], y0, 1.f, 1.f},   // TL
                           {radii[2], radii[3], y0, 1.f, 0.f},   // TR
                           {radii[4], radii[5], y1, -1.f, 0.f},  // BR
                           {radii[6], radii[7], y1, -1.f, 1.f}}; // BL
  for (int ci = 0; ci < 4; ci++) {
    float rx = crn[ci][0], ry = crn[ci][1];
    if (rx <= 1e-6f || ry <= 1e-6f) continue;
    float ye = crn[ci][2], sgn = crn[ci][3];
    bool left = crn[ci][4] > 0.5f;
    // integrate only over corner y-range ∩ [ly ± 4σ] so the step scales
    // with σ (radii >> σ stay resolved)
    float c_lo = std::min(ye, ye + sgn * ry);
    float c_hi = std::max(ye, ye + sgn * ry);
    float lo = clampf(ly - 4.f * sig, c_lo, c_hi);
    float hi = clampf(ly + 4.f * sig, c_lo, c_hi);
    float step = std::max(hi - lo, 0.f) / N;
    if (step <= 0.f) continue;
    float corr = 0.f;
    for (int i = 0; i < N; i++) {
      float yp = lo + (i + 0.5f) * step;
      float dy = std::fabs(yp - ye);
      float dc = 1.f - dy / ry;
      float q = 1.f - dc * dc;
      q = q < 0.f ? 0.f : (q > 1.f ? 1.f : q);
      float inset = rx * (1.f - std::sqrt(q));
      float covx;
      if (left)
        covx = 0.5f * (erf_approx((lx - x0) / s) -
                       erf_approx((lx - (x0 + inset)) / s));
      else
        covx = 0.5f * (erf_approx((lx - (x1 - inset)) / s) -
                       erf_approx((lx - x1) / s));
      float d = (yp - ly) / sig;
      corr += std::exp(-0.5f * d * d) * invnorm * step * covx;
    }
    base -= corr;
  }
  return clampf(base, 0.f, 1.f);
}

inline float blurred_rect_cov(float x0, float y0, float x1, float y1,
                              float sigma, float lx, float ly) {
  float s = std::max(sigma, 1e-3f) * 1.4142135623730951f;
  float bx = 0.5f * (erf_approx((lx - x0) / s) - erf_approx((lx - x1) / s));
  float by = 0.5f * (erf_approx((ly - y0) / s) - erf_approx((ly - y1) / s));
  return bx * by;
}

// mix-blend B(Cb, Cs) per channel (blend.py mix_blend_rgb)
inline float mix_one(int mode, float cb, float cs, float lum_b, float lum_s);

inline float lum3(const float c[3]) {
  return 0.3f * c[0] + 0.59f * c[1] + 0.11f * c[2];
}

inline void clip_color3(float c[3]) {
  float l = lum3(c);
  float n = std::min(std::min(c[0], c[1]), c[2]);
  float x = std::max(std::max(c[0], c[1]), c[2]);
  if (n < 0.f) {
    float denom = std::fabs(l - n) > 1e-6f ? (l - n) : 1e-6f;
    for (int i = 0; i < 3; i++) c[i] = l + (c[i] - l) * (l / denom);
    x = std::max(std::max(c[0], c[1]), c[2]);
  }
  if (x > 1.f) {
    float denom = std::fabs(x - l) > 1e-6f ? (x - l) : 1e-6f;
    for (int i = 0; i < 3; i++) c[i] = l + (c[i] - l) * ((1.f - l) / denom);
  }
}

inline void set_lum3(float c[3], float l) {
  float d = l - lum3(c);
  for (int i = 0; i < 3; i++) c[i] += d;
  clip_color3(c);
}

inline float sat3(const float c[3]) {
  return std::max(std::max(c[0], c[1]), c[2]) -
         std::min(std::min(c[0], c[1]), c[2]);
}

inline void set_sat3(float c[3], float s) {
  float cmin = std::min(std::min(c[0], c[1]), c[2]);
  float cmax = std::max(std::max(c[0], c[1]), c[2]);
  float d = cmax - cmin;
  if (d > 1e-6f) {
    for (int i = 0; i < 3; i++) c[i] = (c[i] - cmin) * (s / d);
  } else {
    for (int i = 0; i < 3; i++) c[i] = 0.f;
  }
}

inline void mix_blend3(int mode, const float cb[3], const float cs[3],
                       float out[3]) {
  switch (mode) {
    case 1:  // multiply
      for (int i = 0; i < 3; i++) out[i] = cb[i] * cs[i];
      return;
    case 2:  // screen
      for (int i = 0; i < 3; i++) out[i] = cb[i] + cs[i] - cb[i] * cs[i];
      return;
    case 3: {  // overlay = hard-light swapped
      float tmp[3];
      mix_blend3(8, cs, cb, tmp);
      memcpy(out, tmp, sizeof tmp);
      return;
    }
    case 4:
      for (int i = 0; i < 3; i++) out[i] = std::min(cb[i], cs[i]);
      return;
    case 5:
      for (int i = 0; i < 3; i++) out[i] = std::max(cb[i], cs[i]);
      return;
    case 6:  // color-dodge
      for (int i = 0; i < 3; i++) {
        if (cb[i] <= 0.f) out[i] = 0.f;
        else if (cs[i] >= 1.f) out[i] = 1.f;
        else out[i] = std::min(1.f, cb[i] / (1.f - cs[i]));
      }
      return;
    case 7:  // color-burn
      for (int i = 0; i < 3; i++) {
        if (cb[i] >= 1.f) out[i] = 1.f;
        else if (cs[i] <= 0.f) out[i] = 0.f;
        else out[i] = 1.f - std::min(1.f, (1.f - cb[i]) / cs[i]);
      }
      return;
    case 8:  // hard-light
      for (int i = 0; i < 3; i++) {
        out[i] = cs[i] <= 0.5f
                     ? cb[i] * 2.f * cs[i]
                     : cb[i] + (2.f * cs[i] - 1.f) - cb[i] * (2.f * cs[i] - 1.f);
      }
      return;
    case 9:  // soft-light
      for (int i = 0; i < 3; i++) {
        float d = cb[i] <= 0.25f
                      ? ((16.f * cb[i] - 12.f) * cb[i] + 4.f) * cb[i]
                      : std::sqrt(std::max(cb[i], 0.f));
        out[i] = cs[i] <= 0.5f
                     ? cb[i] - (1.f - 2.f * cs[i]) * cb[i] * (1.f - cb[i])
                     : cb[i] + (2.f * cs[i] - 1.f) * (d - cb[i]);
      }
      return;
    case 10:
      for (int i = 0; i < 3; i++) out[i] = std::fabs(cb[i] - cs[i]);
      return;
    case 11:
      for (int i = 0; i < 3; i++)
        out[i] = cb[i] + cs[i] - 2.f * cb[i] * cs[i];
      return;
    case 12: {  // hue
      float tmp[3] = {cs[0], cs[1], cs[2]};
      set_sat3(tmp, sat3(cb));
      set_lum3(tmp, lum3(cb));
      memcpy(out, tmp, sizeof tmp);
      return;
    }
    case 13: {  // saturation
      float tmp[3] = {cb[0], cb[1], cb[2]};
      set_sat3(tmp, sat3(cs));
      set_lum3(tmp, lum3(cb));
      memcpy(out, tmp, sizeof tmp);
      return;
    }
    case 14: {  // color
      float tmp[3] = {cs[0], cs[1], cs[2]};
      set_lum3(tmp, lum3(cb));
      memcpy(out, tmp, sizeof tmp);
      return;
    }
    case 15: {  // luminosity
      float tmp[3] = {cb[0], cb[1], cb[2]};
      set_lum3(tmp, lum3(cs));
      memcpy(out, tmp, sizeof tmp);
      return;
    }
    default:
      memcpy(out, cs, 3 * sizeof(float));
      return;
  }
}

// exact sRGB EOTF pair on straight-alpha channels (blend.py)
inline float srgb_to_linear1(float c) {
  return c <= 0.04045f ? c / 12.92f
                       : std::pow(std::max(c / 1.055f + 0.055f / 1.055f, 0.f),
                                  2.4f);
}
inline float linear_to_srgb1(float c) {
  return c <= 0.0031308f ? c * 12.92f
                         : 1.055f * std::pow(std::max(c, 0.f), 1.f / 2.4f)
                               - 0.055f;
}
// deterministic atan2 matching ops/patterns.py atan2_shared exactly
inline float atan2_shared(float y, float x) {
  float ax = std::fabs(x), ay = std::fabs(y);
  float hi = std::max(ax, ay), lo = std::min(ax, ay);
  float z = lo / (hi > 0.f ? hi : 1.f);
  float z2 = z * z;
  float p = ((((-0.0117212f * z2 + 0.05265332f) * z2 - 0.11643287f) * z2 +
              0.19354346f) * z2 - 0.33262348f) * z2;
  float a = z + z * p;
  if (ay > ax) a = 1.5707963267948966f - a;
  if (x < 0.f) a = 3.141592653589793f - a;
  return y < 0.f ? -a : a;
}

inline void premult_convert(float col[4], bool to_linear) {
  float a = col[3];
  float safe = a > 1e-6f ? a : 1.f;
  for (int i = 0; i < 3; i++) {
    float v = col[i] / safe;
    col[i] = (to_linear ? srgb_to_linear1(v) : linear_to_srgb1(v)) * a;
  }
}

// swgl integer blend pipeline (swgl/src/blend.h): muldiv255 = (x*y+x)>>8,
// blend cases on u8-domain premultiplied values.
inline void blend_px(int op, const float src[4], float cov, float dst[4]);

inline int mul255i(int x, int y) { return (x * y + x) >> 8; }

inline void blend_case_int(int op, const int s[4], const int d[4], int o[4]) {
  if (op == 1) {  // clear: GL_ZERO, ONE_MINUS_SRC_ALPHA
    for (int i = 0; i < 4; i++) o[i] = d[i] - mul255i(d[i], s[3]);
    return;
  }
  if (op == 7) {  // per-channel punch: GL_ZERO, ONE_MINUS_SRC_COLOR
    for (int i = 0; i < 4; i++) o[i] = d[i] - mul255i(d[i], s[i]);
    return;
  }
  if (op == 8) {  // additive
    for (int i = 0; i < 4; i++) o[i] = s[i] + d[i];
    return;
  }
  if (op < 16 || op - 16 == 0) {  // normal over
    for (int i = 0; i < 4; i++) o[i] = s[i] + d[i] - mul255i(d[i], s[3]);
    return;
  }
  int mode = op - 16;
  if (mode == 16) {  // plus-lighter
    for (int i = 0; i < 4; i++) o[i] = s[i] + d[i];
    return;
  }
  int sA = s[3], dA = d[3];
  switch (mode) {
    case 1: {  // multiply
      int diff[4];
      for (int i = 0; i < 3; i++) diff[i] = mul255i(sA - s[i], dA - d[i]);
      diff[3] = mul255i(sA, dA);
      for (int i = 0; i < 3; i++) o[i] = s[i] + d[i] + diff[i] - diff[3];
      o[3] = s[3] + d[3] - diff[3];
      return;
    }
    case 2:  // screen
      for (int i = 0; i < 4; i++) o[i] = s[i] + d[i] - mul255i(s[i], d[i]);
      return;
    case 3: case 8: {  // overlay / hard-light
      for (int i = 0; i < 4; i++) {
        int diff = mul255i(s[i], d[i]) + mul255i(sA - s[i], dA - d[i]);
        int diffA = mul255i(s[3], d[3]) + mul255i(sA - s[3], dA - d[3]);
        bool sel = (mode == 3) ? (d[i] * 2 <= dA) : (s[i] * 2 <= sA);
        if (i == 3) o[i] = s[i] + d[i] - diffA;
        else o[i] = s[i] + d[i] + (sel ? diff - diffA : -diff);
      }
      return;
    }
    case 4:  // darken
      for (int i = 0; i < 4; i++)
        o[i] = s[i] + d[i] -
               std::max(mul255i(s[i], dA), mul255i(d[i], sA));
      return;
    case 5:  // lighten
      for (int i = 0; i < 4; i++)
        o[i] = s[i] + d[i] -
               std::min(mul255i(s[i], dA), mul255i(d[i], sA));
      return;
    case 6: {  // color-dodge (FP, blend.h:587)
      for (int i = 0; i < 4; i++) {
        float recip = (sA - s[i]) != 0 ? 1.0f / (float)(sA - s[i]) : 255.0f;
        float t = std::min((float)dA, (float)d[i] * (float)sA * recip);
        if (i == 3) t = (float)d[3];
        float v = ((float)sA * t + (float)s[i] * (255.0f - (float)dA) +
                   (float)d[i] * (255.0f - (float)sA)) * (1.0f / 255.0f);
        o[i] = (int)std::floor(v + 0.5f);
      }
      return;
    }
    case 7: {  // color-burn (FP, blend.h:601)
      for (int i = 0; i < 4; i++) {
        float recip = s[i] != 0 ? 1.0f / (float)s[i] : 255.0f;
        float t = (float)dA -
                  std::min((float)dA, (float)(dA - d[i]) * (float)sA * recip);
        if (i == 3) t = (float)d[3];
        float v = ((float)sA * t + (float)s[i] * (255.0f - (float)dA) +
                   (float)d[i] * (255.0f - (float)sA)) * (1.0f / 255.0f);
        o[i] = (int)std::floor(v + 0.5f);
      }
      return;
    }
    case 9: {  // soft-light (FP, blend.h:622)
      for (int i = 0; i < 4; i++) {
        float dU = dA > 0 ? (float)d[i] / (float)dA : 0.0f;
        float scale = (float)(s[i] + s[i] - sA);
        float inv_sqrt = dU > 0.0f ? 1.0f / std::sqrt(dU) : 1e6f;
        float inner = scale < 0.0f
                          ? 1.0f - dU
                          : std::min((16.0f * dU - 12.0f) * dU + 3.0f,
                                     inv_sqrt - 1.0f);
        float add = (i == 3) ? 0.0f : scale * inner;
        float v = ((float)d[i] * (255.0f + add) +
                   (float)s[i] * (255.0f - (float)dA)) * (1.0f / 255.0f);
        o[i] = (int)std::floor(v + 0.5f);
      }
      return;
    }
    case 10: {  // difference
      for (int i = 0; i < 4; i++) {
        int diff = std::min(mul255i(d[i], sA), mul255i(s[i], dA));
        o[i] = s[i] + d[i] - diff - (i == 3 ? 0 : diff);
      }
      return;
    }
    case 11: {  // exclusion
      for (int i = 0; i < 4; i++) {
        int diff = mul255i(s[i], d[i]);
        o[i] = s[i] + d[i] - diff - (i == 3 ? 0 : diff);
      }
      return;
    }
    default: {  // HSL modes 12-15 (FP at 0..255 scale, blend.h DO_HSL)
      float srcA = (float)s[3] * (1.0f / 255.0f);
      float dstA = (float)d[3] * (1.0f / 255.0f);
      float srcDstA = (float)s[3] * dstA;
      float srcC[3], dstC[3];
      for (int i = 0; i < 3; i++) {
        srcC[i] = (float)s[i] * dstA;
        dstC[i] = (float)d[i] * srcA;
      }
      auto lum = [](const float c[3]) {
        return 0.3f * c[0] + 0.59f * c[1] + 0.11f * c[2];
      };
      auto set_lum = [&](const float base[3], const float ref[3],
                         float alpha, float out3[3]) {
        float l0 = lum(base);
        float diffl = lum(ref) - l0;
        float c[3] = {base[0] + diffl, base[1] + diffl, base[2] + diffl};
        float l = l0 + diffl;
        float cmin = std::min(std::min(c[0], c[1]), c[2]);
        float cmax = std::max(std::max(c[0], c[1]), c[2]);
        if (cmin < 0.0f) {
          float safe = std::fabs(l - cmin) > 1e-6f ? l - cmin : 1e-6f;
          for (int i = 0; i < 3; i++) c[i] = l + (c[i] - l) * (l / safe);
        }
        cmax = std::max(std::max(c[0], c[1]), c[2]);
        if (cmax > alpha) {
          float safe = std::fabs(cmax - l) > 1e-6f ? cmax - l : 1e-6f;
          for (int i = 0; i < 3; i++)
            c[i] = l + (c[i] - l) * ((alpha - l) / safe);
        }
        for (int i = 0; i < 3; i++) out3[i] = c[i];
      };
      auto set_lum_sat = [&](const float base[3], const float sref[3],
                             const float lref[3], float alpha,
                             float out3[3]) {
        float cmin = std::min(std::min(base[0], base[1]), base[2]);
        float cmax = std::max(std::max(base[0], base[1]), base[2]);
        float dd = cmax - cmin;
        float smax = std::max(std::max(sref[0], sref[1]), sref[2]) -
                     std::min(std::min(sref[0], sref[1]), sref[2]);
        float scaled[3];
        for (int i = 0; i < 3; i++)
          scaled[i] = dd > 1e-6f ? (base[i] - cmin) * (smax / dd) : 0.0f;
        set_lum(scaled, lref, alpha, out3);
      };
      float rgb[3];
      if (mode == 12) set_lum_sat(srcC, dstC, dstC, srcDstA, rgb);
      else if (mode == 13) set_lum_sat(dstC, srcC, dstC, srcDstA, rgb);
      else if (mode == 14) set_lum(srcC, dstC, srcDstA, rgb);
      else set_lum(dstC, srcC, srcDstA, rgb);
      for (int i = 0; i < 3; i++) {
        float v = rgb[i] + (float)s[i] - srcC[i] + (float)d[i] - dstC[i];
        o[i] = (int)std::floor(v + 0.5f);
      }
      o[3] = (int)std::floor((float)s[3] + (float)d[3] - srcDstA + 0.5f);
      return;
    }
  }
}

// the full swgl per-fragment compose (rasterize.h + blend.h): pack the
// shader color (round-half-even like SSE2 cvtps), span-AA weight 0..256,
// u8 clip-mask via muldiv255, integer blend case, saturate
inline void compose_px(int op, const float color[4], float cov, int m8,
                       float dst[4]) {
  if (op >= 40 || (op >= 2 && op <= 6)) {  // 40.. = SVGFE float domain
    // SVGFE composite ops / linearRGB blends stay in the float domain
    float src[4];
    float mc = cov * ((float)m8 * (1.0f / 255.0f));
    for (int i = 0; i < 4; i++) src[i] = color[i] * mc;
    blend_px(op, src, cov, dst);
    for (int i = 0; i < 4; i++)
      dst[i] = clampf(std::nearbyintf(dst[i] * 255.0f), 0.f, 255.f) *
               (1.0f / 255.0f);
    return;
  }
  int s8[4], d8[4], o8[4];
  // quantize_cov tie nudge (see the clip chain above)
  int aa = (int)std::floor(clampf(cov, 0.f, 1.f) * 256.0f + 0.5f +
                           (1.0f / 1024.0f));
  for (int i = 0; i < 4; i++) {
    int sv = (int)clampf(std::nearbyintf(color[i] * 255.0f), 0.f, 255.f);
    sv = (sv * aa) >> 8;
    sv = (sv * m8 + sv) >> 8;
    s8[i] = sv;
    d8[i] = (int)std::floor(dst[i] * 255.0f + 0.5f);
  }
  blend_case_int(op, s8, d8, o8);
  for (int i = 0; i < 4; i++)
    dst[i] = clampf((float)o8[i], 0.f, 255.f) * (1.0f / 255.0f);
}

// full blend of premultiplied src over dst (blend.py blend_src_over_dst)
inline void blend_px(int op, const float src[4], float cov, float dst[4]) {
  if (op >= 64) {  // +64 = blend in linearRGB (SVGFE _CONVERTSRGB)
    float s2[4] = {src[0], src[1], src[2], src[3]};
    premult_convert(s2, true);
    premult_convert(dst, true);
    blend_px(op - 64, s2, cov, dst);
    premult_convert(dst, false);
    return;
  }
  if (op == 1) {  // clear
    for (int i = 0; i < 4; i++) dst[i] *= (1.f - src[3]);
    return;
  }
  if (op == 2) {  // Porter-Duff in
    for (int i = 0; i < 4; i++) dst[i] = src[i] * dst[3];
    return;
  }
  if (op == 3) {  // out
    float inv = 1.f - dst[3];
    for (int i = 0; i < 4; i++) dst[i] = src[i] * inv;
    return;
  }
  if (op == 4) {  // atop
    float ab = dst[3], invs = 1.f - src[3];
    for (int i = 0; i < 4; i++) dst[i] = src[i] * ab + dst[i] * invs;
    return;
  }
  if (op == 5) {  // xor
    float invb = 1.f - dst[3], invs = 1.f - src[3];
    for (int i = 0; i < 4; i++) dst[i] = src[i] * invb + dst[i] * invs;
    return;
  }
  if (op == 6) {  // lighter
    for (int i = 0; i < 4; i++) dst[i] = std::min(src[i] + dst[i], 1.f);
    return;
  }
  if (op == 7) {  // per-channel punch (subpixel text)
    for (int i = 0; i < 4; i++) dst[i] *= (1.f - src[i]);
    return;
  }
  if (op == 8) {  // additive (subpixel text)
    for (int i = 0; i < 4; i++) dst[i] = std::min(dst[i] + src[i], 1.f);
    return;
  }
  if (op < 16 || op - 16 == 0) {  // normal over
    float inv = 1.f - src[3];
    for (int i = 0; i < 4; i++) dst[i] = src[i] + dst[i] * inv;
    return;
  }
  if (op >= 40 && op < 64) op = 16 + (op - 40);  // SVGFE float mix
  int mode = op - 16;
  if (mode == 16) {  // plus-lighter
    for (int i = 0; i < 4; i++) dst[i] = std::min(src[i] + dst[i], 1.f);
    return;
  }
  float a_s = src[3], a_b = dst[3];
  float safe_s = a_s > 1e-6f ? a_s : 1.f;
  float safe_b = a_b > 1e-6f ? a_b : 1.f;
  float cs[3] = {src[0] / safe_s, src[1] / safe_s, src[2] / safe_s};
  float cb[3] = {dst[0] / safe_b, dst[1] / safe_b, dst[2] / safe_b};
  float b3[3];
  mix_blend3(mode, cb, cs, b3);
  float a_out = a_s + a_b * (1.f - a_s);
  for (int i = 0; i < 3; i++)
    dst[i] = (1.f - a_b) * src[i] + a_b * a_s * b3[i] +
             (1.f - a_s) * dst[i];
  dst[3] = a_out;
}

}  // namespace

extern "C" {

// Rasterize one pass. target: planar [4, th, tw] premultiplied f32, already
// initialized (clear color or previous content). Returns 0 on success.
int wr_raster_pass(
    const float* f32_buf, int64_t f32_len,
    const int32_t* instances, int64_t n_inst,
    const float* transforms, int64_t n_tr,
    const int32_t* order, int64_t n_order,
    const float* bboxes,  // [n_inst, 4] device AABBs
    const float* color_atlas, int64_t ca_h, int64_t ca_w,
    const float* alpha_atlas, int64_t aa_h, int64_t aa_w,
    const float* surface_atlas, int64_t sa_h, int64_t sa_w,
    float* target, int64_t th, int64_t tw,
    float ox, float oy) {
  Ctx c{f32_buf, f32_len, transforms, color_atlas, ca_h, ca_w,
        alpha_atlas, aa_h, aa_w, surface_atlas, sa_h, sa_w};
  const int64_t plane = th * tw;

  for (int64_t oi = 0; oi < n_order; oi++) {
    int32_t iid = order[oi];
    if (iid < 0 || iid >= n_inst) continue;
    const int32_t* rec = instances + iid * INST_FIELDS;
    int kind = rec[0];
    const float* tr = transforms + rec[1] * 12;
    const float* p = f32_buf + rec[2];
    int clip_addr = rec[3];
    int clip_count = rec[4];
    int blend_op = rec[5];
    int edge_aa = rec[6];
    float sx = tr[9], sy = tr[10];

    const float* bb = bboxes + iid * 4;
    int64_t x0, y0, x1, y1;
    bool projective = std::fabs(tr[2]) > 1e-12f ||
                      std::fabs(tr[5]) > 1e-12f ||
                      std::fabs(tr[8] - 1.f) > 1e-6f;
    if (projective) {
      // whole-tile windows like the device kernel (oracle/sw.py _raster:
      // projective bboxes can under-estimate the inverse map's reach)
      const int64_t TW = 128, TH = 64;
      int64_t tx0 = std::max((int64_t)std::floor((bb[0] - 1 - ox) / TW),
                             (int64_t)0);
      int64_t ty0 = std::max((int64_t)std::floor((bb[1] - 1 - oy) / TH),
                             (int64_t)0);
      x0 = std::min(tx0 * TW, tw);
      y0 = std::min(ty0 * TH, th);
      x1 = std::min((int64_t)std::ceil((bb[2] + 1 - ox) / TW) * TW, tw);
      y1 = std::min((int64_t)std::ceil((bb[3] + 1 - oy) / TH) * TH, th);
    } else {
      x0 = std::max((int64_t)std::floor(bb[0] - 1 - ox), (int64_t)0);
      y0 = std::max((int64_t)std::floor(bb[1] - 1 - oy), (int64_t)0);
      x1 = std::min((int64_t)std::ceil(bb[2] + 1 - ox), tw);
      y1 = std::min((int64_t)std::ceil(bb[3] + 1 - oy), th);
    }

    // interior fast path (the swgl opaque-run span specialization,
    // swgl/src/rasterize.h draw_quad_spans): for axis-aligned instances
    // whose clips are all plain axis-aligned rect clips, every pixel of
    // the interior device rect has cov == 1 and an empty mask chain —
    // the span skips coverage + clip math entirely, and full-coverage
    // solid spans become vectorizable integer over-blends (opaque fills
    // are plain stores).
    bool axis = std::fabs(tr[1]) < 1e-9f && std::fabs(tr[3]) < 1e-9f &&
                std::fabs(tr[2]) < 1e-9f && std::fabs(tr[5]) < 1e-9f &&
                std::fabs(tr[8] - 1.f) < 1e-6f &&
                std::fabs(tr[0]) > 1e-9f && std::fabs(tr[4]) > 1e-9f;
    bool fast_ok = axis;
    double fix0 = -1e30, fiy0 = -1e30, fix1 = 1e30, fiy1 = 1e30;
    auto fold_rect = [&](const float* t2, float rx0, float ry0, float rx1,
                         float ry1) {
      double ax = ((double)rx0 - t2[6]) / t2[0];
      double bx = ((double)rx1 - t2[6]) / t2[0];
      if (ax > bx) std::swap(ax, bx);
      double ay = ((double)ry0 - t2[7]) / t2[4];
      double by = ((double)ry1 - t2[7]) / t2[4];
      if (ay > by) std::swap(ay, by);
      fix0 = std::max(fix0, ax);
      fix1 = std::min(fix1, bx);
      fiy0 = std::max(fiy0, ay);
      fiy1 = std::min(fiy1, by);
    };
    if (fast_ok) fold_rect(tr, p[4], p[5], p[6], p[7]);
    for (int j = 0; fast_ok && j < clip_count; j++) {
      const float* cr = f32_buf + clip_addr + j * CLIP_STRIDE;
      const float* ct = transforms + (int)cr[13] * 12;
      bool caxis = std::fabs(ct[1]) < 1e-9f && std::fabs(ct[3]) < 1e-9f &&
                   std::fabs(ct[2]) < 1e-9f && std::fabs(ct[5]) < 1e-9f &&
                   std::fabs(ct[8] - 1.f) < 1e-6f &&
                   std::fabs(ct[0]) > 1e-9f && std::fabs(ct[4]) > 1e-9f;
      if (cr[14] >= 1.5f || cr[12] >= 0.5f || !caxis) {
        fast_ok = false;
        break;
      }
      if (cr[14] >= 0.5f) {
        // rounded rect: the rect inset by the max corner radius is fully
        // inside the rounded outline -> still a valid interior bound
        float mr = 0.f;
        for (int k = 4; k < 12; k++) mr = std::max(mr, cr[k]);
        fold_rect(ct, cr[0] + mr, cr[1] + mr, cr[2] - mr, cr[3] - mr);
      } else {
        fold_rect(ct, cr[0], cr[1], cr[2], cr[3]);
      }
    }
    int64_t fxa = 1, fxb = 0, fya = 1, fyb = 0;
    if (fast_ok) {
      fxa = std::max((int64_t)std::ceil(fix0 - ox + 2.0), x0);
      fxb = std::min((int64_t)std::floor(fix1 - ox - 2.0), x1);
      fya = std::max((int64_t)std::ceil(fiy0 - oy + 2.0), y0);
      fyb = std::min((int64_t)std::floor(fiy1 - oy - 2.0), y1);
    }
    bool solid_span = fast_ok && kind == 0 &&
                      (blend_op == 0 || blend_op == 16);
    float s8c[4] = {0, 0, 0, 0};
    if (solid_span)
      for (int ch = 0; ch < 4; ch++)
        s8c[ch] = clampf(std::nearbyintf(p[8 + ch] * 255.0f), 0.f, 255.f);

    auto shade = [&](int64_t x, int64_t y, float py, bool interior) {
        float px = ox + (float)x + 0.5f;
        float lx, ly;
        inverse_map(tr, px, py, &lx, &ly);
        float cov;
        int m8 = 255;
        if (interior) {
          cov = 1.f;
        } else {
        cov = rect_coverage_auto(tr, p[4], p[5], p[6], p[7], lx, ly,
                                 px, py, edge_aa);
        // clips: rect clips join the span geometry, everything else
        // chains through the u8 clip mask (render_task.rs new_mask)
        for (int j = 0; j < clip_count; j++) {
          const float* cr = f32_buf + clip_addr + j * CLIP_STRIDE;
          const float* ct = transforms + (int)cr[13] * 12;
          float clx, cly;
          inverse_map(ct, px, py, &clx, &cly);
          float csx = ct[9], csy = ct[10];
          float ccov;
          if (cr[14] < 0.5f) {
            ccov = rect_coverage_auto(ct, cr[0], cr[1], cr[2], cr[3], clx,
                                      cly, px, py, 0xF);
          } else if (cr[14] < 1.5f) {
            ccov = rounded_rect_coverage_auto(ct, cr, cr + 4, cr[15], clx, cly,
                                              px, py);
          } else if (cr[14] < 2.5f) {  // image mask: premult red plane
            float rc = rect_coverage_auto(ct, cr[0], cr[1], cr[2], cr[3],
                                          clx, cly, px, py, 0xF);
            float rw = std::max(cr[2] - cr[0], 1e-6f);
            float rh = std::max(cr[3] - cr[1], 1e-6f);
            float mu = cr[16] + (clx - cr[0]) / rw * (cr[18] - cr[16]);
            float mv = cr[17] + (cly - cr[1]) / rh * (cr[19] - cr[17]);
            float a;
            sample_plane(c.color_atlas, c.ca_h, c.ca_w, mu, mv, cr[16],
                         cr[17], cr[18], cr[19], false, &a);
            ccov = a * rc;
          } else if (cr[14] < 3.5f) {  // device-space convex polygon
            ccov = 1.f;
            for (int e = 0; e < 8; e++) {
              float d = cr[24 + 3 * e] * px + cr[25 + 3 * e] * py +
                        cr[26 + 3 * e];
              ccov = std::min(ccov, clampf(d + 0.5f, 0.f, 1.f));
            }
          } else {  // kind 4: box-shadow nine-patch (cs_clip_box_shadow)
            float dw = std::max(cr[2] - cr[0], 1e-6f);
            float dh = std::max(cr[3] - cr[1], 1e-6f);
            float aw = std::max(cr[4], 1e-6f);
            float ah = std::max(cr[5], 1e-6f);
            float u_lin = cr[6] > 0.5f ? (clx - cr[0]) / aw
                                       : (clx - cr[0]) / dw;
            float v_lin = cr[7] > 0.5f ? (cly - cr[1]) / ah
                                       : (cly - cr[1]) / dh;
            float e0x = cr[6] > 0.5f ? 0.5f : 1.f;
            float e1x = cr[6] > 0.5f ? dw / aw - 0.5f : 1.f;
            float e0y = cr[7] > 0.5f ? 0.5f : 1.f;
            float e1y = cr[7] > 0.5f ? dh / ah - 0.5f : 1.f;
            float uu = clampf(u_lin, 0.f, e0x) + std::max(0.f, u_lin - e1x);
            float vv = clampf(v_lin, 0.f, e0y) + std::max(0.f, v_lin - e1y);
            float mu = cr[16] + uu * (cr[18] - cr[16]);
            float mv = cr[17] + vv * (cr[19] - cr[17]);
            float texel;
            sample_plane(c.color_atlas, c.ca_h, c.ca_w, mu, mv, cr[16],
                         cr[17], cr[18], cr[19], false, &texel);
            float in_rect = rect_coverage(cr[0], cr[1], cr[2], cr[3], clx,
                                          cly, csx, csy, 0xF);
            float mode = cr[15];
            float alpha = texel * (1.f - mode) + (1.f - texel) * mode;
            ccov = mode * (1.f - in_rect) + alpha * in_rect;
          }
          if (cr[12] > 0.5f) ccov = 1.f - ccov;
          if (cr[14] < 0.5f && cr[12] < 0.5f) {
            cov *= ccov;
          } else {
            // tie-nudged coverage quantization (ops/blend.py quantize_cov:
            // TPU div/sqrt/exp are not correctly rounded, so exact-half
            // coverage ties must round identically on every backend)
            int c8 = (int)std::floor(ccov * 255.0f + 0.5f + (1.0f / 1024.0f));
            m8 = (c8 * m8 + c8) >> 8;
          }
        }
        }
        if (cov <= 0.f) return;

        float color[4] = {0, 0, 0, 0};
        switch (kind) {
          case 0:  // solid
            for (int ch = 0; ch < 4; ch++) color[ch] = p[8 + ch];
            break;
          case 1: {  // image
            float stretch_w = std::max(p[18], 1e-6f);
            float stretch_h = std::max(p[19], 1e-6f);
            float tx, ty;
            bool in_tile = tile_coords(p, lx, ly, stretch_w, stretch_h,
                                       p[20], p[21], &tx, &ty);
            float u = p[8] + tx * p[22] - p[24];
            float v = p[9] + ty * p[23] - p[25];
            sample_rgba(c, c.color_atlas, c.ca_h, c.ca_w, u, v, p[8], p[9],
                        p[10], p[11], p[16] > 0.5f, color);
            for (int ch = 0; ch < 4; ch++)
              color[ch] *= p[12 + ch] * (in_tile ? 1.f : 0.f);
            break;
          }
          case 2: case 3: case 4: {  // gradients
            float stretch_w, stretch_h, spacing_w, spacing_h;
            if (kind == 2) {
              stretch_w = std::max(p[16], 1e-6f);
              stretch_h = std::max(p[17], 1e-6f);
              spacing_w = p[18];
              spacing_h = p[19];
            } else {
              stretch_w = std::max(p[18], 1e-6f);
              stretch_h = std::max(p[19], 1e-6f);
              spacing_w = p[20];
              spacing_h = p[21];
            }
            float tx, ty;
            bool in_tile = tile_coords(p, lx, ly, stretch_w, stretch_h,
                                       spacing_w, spacing_h, &tx, &ty);
            float t;
            if (kind == 2) {
              float dx = p[10] - p[8], dy = p[11] - p[9];
              float denom = dx * dx + dy * dy;
              if (denom <= 1e-9f) denom = 1e-9f;
              t = ((tx - p[8]) * dx + (ty - p[9]) * dy) / denom;
            } else if (kind == 3) {
              float rx = p[10] > 1e-6f ? p[10] : 1e-6f;
              float ry = p[11] > 1e-6f ? p[11] : rx;
              float dx = tx - p[8];
              float dy = (ty - p[9]) * (rx / ry);
              float d = std::sqrt(dx * dx + dy * dy) / rx;
              float denom = p[17] - p[16];
              float scale =
                  std::fabs(denom) > 1e-9f ? 1.f / denom : 0.f;
              t = (d - p[16]) * scale;
            } else {
              float dx = tx - p[8], dy = ty - p[9];
              float theta = atan2_shared(dy, dx) + (1.5707963267948966f - p[10]);
              float tr_ = theta / 6.283185307179586f;
              tr_ = tr_ - std::floor(tr_);
              float denom = p[17] - p[16];
              float scale =
                  std::fabs(denom) > 1e-9f ? 1.f / denom : 0.f;
              t = (tr_ - p[16]) * scale;
            }
            eval_stops(c, (int)p[12], (int)p[14], t, p[13], color);
            if (p[15] > 0.5f) {
              // GL-flavor cached-gradient-task u8 quantization (mirrors
              // patterns._grad_task_quant; round-half-even target write)
              for (int ch = 0; ch < 4; ch++) {
                float v = color[ch] * 255.f;
                color[ch] = clampf(nearbyintf(v), 0.f, 255.f) / 255.f;
              }
            }
            if (!in_tile)
              for (int ch = 0; ch < 4; ch++) color[ch] = 0.f;
            break;
          }
          case 5: {  // glyph (uv rect may be device-scale rasterized)
            float gsu = (p[10] - p[8]) / std::max(p[2] - p[0], 1e-6f);
            float gsv = (p[11] - p[9]) / std::max(p[3] - p[1], 1e-6f);
            float u = p[8] + (lx - p[0]) * gsu;
            float v = p[9] + (ly - p[1]) * gsv;
            float a;
            sample_plane(c.alpha_atlas, c.aa_h, c.aa_w, u, v, p[8], p[9],
                         p[10], p[11], false, &a);
            for (int ch = 0; ch < 4; ch++) color[ch] = p[12 + ch] * a;
            break;
          }
          case 6: {  // picture composite
            float w = std::max(p[2] - p[0], 1e-6f);
            float h = std::max(p[3] - p[1], 1e-6f);
            float su = (p[10] - p[8]) / w;
            float sv = (p[11] - p[9]) / h;
            float u = p[8] + (px - p[0]) * su;
            float v = p[9] + (py - p[1]) * sv;
            if (p[37] > 0.5f) {  // raster-root local-space sampling
              u = p[8] + lx * p[40] - p[38];
              v = p[9] + ly * p[40] - p[39];
            }
            sample_rgba(c, c.surface_atlas, c.sa_h, c.sa_w, u, v, p[8], p[9],
                        p[10], p[11], false, color);
            for (int ch = 0; ch < 4; ch++) color[ch] *= p[12 + ch];
            if (p[36] > 0.5f) {  // color matrix (straight-alpha)
              bool lin = p[36] > 1.5f;  // flag 2 = apply in linearRGB
              float a = color[3];
              float safe = a > 1e-6f ? a : 1.f;
              float r = color[0] / safe, g = color[1] / safe,
                    bl = color[2] / safe;
              if (lin) {
                r = srgb_to_linear1(r);
                g = srgb_to_linear1(g);
                bl = srgb_to_linear1(bl);
              }
              const float* m = p + 16;
              float nr = clampf(m[0] * r + m[1] * g + m[2] * bl + m[3] * a + m[4], 0.f, 1.f);
              float ng = clampf(m[5] * r + m[6] * g + m[7] * bl + m[8] * a + m[9], 0.f, 1.f);
              float nb = clampf(m[10] * r + m[11] * g + m[12] * bl + m[13] * a + m[14], 0.f, 1.f);
              float na = clampf(m[15] * r + m[16] * g + m[17] * bl + m[18] * a + m[19], 0.f, 1.f);
              if (lin) {
                nr = linear_to_srgb1(nr);
                ng = linear_to_srgb1(ng);
                nb = linear_to_srgb1(nb);
              }
              color[0] = nr * na; color[1] = ng * na; color[2] = nb * na;
              color[3] = na;
            }
            break;
          }
          case 7:  // clear
            color[0] = color[1] = color[2] = color[3] = 1.f;
            break;
          case 8: {  // box shadow
            float sigma = p[20];
            float any_r = 0.f;
            for (int k = 12; k < 20; k++) any_r += p[k];
            float blurred;
            if (sigma <= 1e-3f) {
              blurred = rounded_rect_coverage(p + 8, p + 12, lx, ly, sx, sy);
            } else if (any_r > 1e-6f) {
              blurred = blurred_rounded_rect_cov(p + 8, p + 12, sigma,
                                                 lx, ly);
            } else {
              blurred = blurred_rect_cov(p[8], p[9], p[10], p[11], sigma,
                                         lx, ly);
            }
            float box_cov = rounded_rect_coverage(p + 22, p + 26, lx, ly,
                                                  sx, sy);
            float shcov = p[21] > 0.5f ? (1.f - blurred) * box_cov
                                       : blurred * (1.f - box_cov);
            // u8-grid mask quantization + tie nudge (patterns.py)
            shcov = std::floor(shcov * 255.0f + 0.5f + (1.0f / 1024.0f)) *
                    (1.0f / 255.0f);
            for (int ch = 0; ch < 4; ch++) color[ch] = p[34 + ch] * shcov;
            break;
          }
          case 9: {  // border (pattern_border)
            float w_t = p[8], w_r = p[9], w_b = p[10], w_l = p[11];
            const float* radii = p + 12;
            float outer = rounded_rect_coverage(p, radii, lx, ly, sx, sy);
            float ir[4] = {p[0] + w_l, p[1] + w_t, p[2] - w_r, p[3] - w_b};
            float irad[8] = {
                std::max(radii[0] - w_l, 0.f), std::max(radii[1] - w_t, 0.f),
                std::max(radii[2] - w_r, 0.f), std::max(radii[3] - w_t, 0.f),
                std::max(radii[4] - w_r, 0.f), std::max(radii[5] - w_b, 0.f),
                std::max(radii[6] - w_l, 0.f), std::max(radii[7] - w_b, 0.f)};
            float inner = (ir[2] > ir[0] && ir[3] > ir[1])
                              ? rounded_rect_coverage(ir, irad, lx, ly, sx, sy)
                              : 0.f;
            float ring = outer * (1.f - inner);
            float ws[4] = {w_t, w_r, w_b, w_l};
            float ds[4];
            for (int s_ = 0; s_ < 4; s_++) {
              float styv = p[52 + s_];
              bool active = ws[s_] > 1e-6f && styv != 0.f && styv != 5.f;
              float dd;
              switch (s_) {
                case 0: dd = (ly - p[1]) / std::max(w_t, 1e-6f); break;
                case 1: dd = (p[2] - lx) / std::max(w_r, 1e-6f); break;
                case 2: dd = (p[3] - ly) / std::max(w_b, 1e-6f); break;
                default: dd = (lx - p[0]) / std::max(w_l, 1e-6f); break;
              }
              ds[s_] = active ? dd : 1e9f;
            }
            // corner zones: depth is measured radially from the outer
            // ellipse (see patterns.pattern_border corner_zone); the zone
            // belongs only to its two ADJACENT sides
            bool in_corner = false;
            int corner_idx = -1;
            float corner_depth_u = 0.f;
            bool in_zone[4] = {false, false, false, false};
            {
              const float cz[4][6] = {
                  {p[0] + radii[0], p[1] + radii[1], radii[0], radii[1], 1.f, 1.f},
                  {p[2] - radii[2], p[1] + radii[3], radii[2], radii[3], -1.f, 1.f},
                  {p[2] - radii[4], p[3] - radii[5], radii[4], radii[5], -1.f, -1.f},
                  {p[0] + radii[6], p[3] - radii[7], radii[6], radii[7], 1.f, -1.f}};
              for (int ci = 0; ci < 4; ci++) {
                float rx = cz[ci][2], ry = cz[ci][3];
                if (rx <= 0.f || ry <= 0.f) continue;
                float dx = (cz[ci][0] - lx) * cz[ci][4];
                float dy = (cz[ci][1] - ly) * cz[ci][5];
                if (dx <= 0.f || dy <= 0.f) continue;
                float ex = dx / rx, ey = dy / ry;
                float g = std::sqrt(ex * ex + ey * ey);
                float grad = std::sqrt((dx / (rx * rx)) * (dx / (rx * rx)) +
                                       (dy / (ry * ry)) * (dy / (ry * ry)));
                grad = std::max(grad, 1e-6f);
                float du = -((g - 1.f) * g / grad);
                if (!in_corner || du < corner_depth_u) {
                  corner_depth_u = du;
                  corner_idx = ci;
                }
                in_corner = true;
                in_zone[ci] = true;
              }
            }
            if (in_corner) {
              // a side stays eligible if ANY zone containing the pixel is
              // adjacent to it: tl(0):{t,l} tr(1):{t,r} br(2):{b,r}
              // bl(3):{b,l} (border-invisible / border-overlapping-corner)
              static const bool adj[4][4] = {{true, false, false, true},
                                             {true, true, false, false},
                                             {false, true, true, false},
                                             {false, false, true, true}};
              for (int s_ = 0; s_ < 4; s_++) {
                bool ok = false;
                for (int ci = 0; ci < 4; ci++)
                  if (in_zone[ci] && adj[ci][s_]) ok = true;
                if (!ok) ds[s_] = 1e9f;
              }
            }
            float depth_raw = std::min(std::min(ds[0], ds[1]),
                                       std::min(ds[2], ds[3]));
            bool any_owner = depth_raw < 5e8f;
            int owner = ds[0] <= depth_raw ? 0
                        : (ds[1] <= depth_raw ? 1 : (ds[2] <= depth_raw ? 2 : 3));
            float depth = clampf(depth_raw, 0.f, 1.f);
            float style = p[52 + owner];
            const float* c_out = p + 20 + owner * 4;
            const float* c_in = p + 36 + owner * 4;
            float w_side = ws[owner];
            float depth_s = in_corner
                ? clampf(corner_depth_u / std::max(w_side, 1e-6f), 0.f, 1.f)
                : depth;
            const float* sc = depth_s < 0.5f ? c_out : c_in;
            float scale = (owner == 0 || owner == 2 ? sy : sx) * w_side;
            float factor = 1.f;
            if (style == 2.f && scale / 3.f >= 1.f) {
              float third = clampf((1.f / 3.f - depth_s) * scale + 0.5f, 0.f, 1.f) +
                            clampf((depth_s - 2.f / 3.f) * scale + 0.5f, 0.f, 1.f);
              factor *= clampf(third, 0.f, 1.f);
            }
            // dotted/dashed edge layout derived from radii/widths/styles
            // (border.rs get_edge_info :615 / create_border_segments :674).
            // Corner regions follow the CORNER's style (its first side's,
            // add_segment :949).  Mirrors patterns.pattern_border.
            {
              float exw[4] = {std::max(radii[0], w_l),   // tl_w
                              std::max(radii[2], w_r),   // tr_w
                              std::max(radii[4], w_r),   // br_w
                              std::max(radii[6], w_l)};  // bl_w
              float exh[4] = {std::max(radii[1], w_t),   // tl_h
                              std::max(radii[3], w_t),   // tr_h
                              std::max(radii[5], w_b),   // br_h
                              std::max(radii[7], w_b)};  // bl_h
              // per-pixel corner classification (TL,TR,BR,BL)
              const int s0i[4] = {3, 0, 1, 2};
              const float cwz[4] = {w_l, w_r, w_r, w_l};
              const float chz[4] = {w_t, w_t, w_b, w_b};
              const float ccxs[4] = {p[0] + 0.5f * w_l, p[2] - 0.5f * w_r,
                                     p[2] - 0.5f * w_r, p[0] + 0.5f * w_l};
              const float ccys[4] = {p[1] + 0.5f * w_t, p[1] + 0.5f * w_t,
                                     p[3] - 0.5f * w_b, p[3] - 0.5f * w_b};
              const bool boxes[4] = {
                  lx < p[0] + exw[0] && ly < p[1] + exh[0],
                  lx >= p[2] - exw[1] && ly < p[1] + exh[1],
                  lx >= p[2] - exw[2] && ly >= p[3] - exh[2],
                  lx < p[0] + exw[3] && ly >= p[3] - exh[3]};
              float cstyle = -1.f;
              bool czero = false;     // dotted collapse (< w/2)
              bool czero_da = false;  // dashed: radius == 0
              float corner_dot = 0.f;
              for (int ci = 0; ci < 4; ci++) {
                bool zr = radii[ci * 2] < cwz[ci] * 0.5f &&
                          radii[ci * 2 + 1] < chz[ci] * 0.5f;
                if (boxes[ci] && cstyle < -0.5f) {
                  cstyle = p[52 + s0i[ci]];
                  czero = zr;
                  czero_da = radii[ci * 2] < 1e-6f &&
                             radii[ci * 2 + 1] < 1e-6f;
                }
                if (p[52 + s0i[ci]] == 3.f && zr &&
                    cwz[ci] + chz[ci] > 1e-6f) {
                  float ccr = 0.25f * (cwz[ci] + chz[ci]);
                  float dcx = lx - ccxs[ci];
                  float dcy = ly - ccys[ci];
                  float dcd = std::sqrt(dcx * dcx + dcy * dcy) - ccr;
                  corner_dot = std::max(
                      corner_dot,
                      clampf(0.5f - dcd * (sx + sy) * 0.5f, 0.f, 1.f));
                }
              }
              float base, avail;
              switch (owner) {
                case 0: base = p[0] + exw[0];
                        avail = (p[2] - p[0]) - exw[0] - exw[1]; break;
                case 1: base = p[1] + exh[1];
                        avail = (p[3] - p[1]) - exh[1] - exh[2]; break;
                case 2: base = p[0] + exw[3];
                        avail = (p[2] - p[0]) - exw[3] - exw[2]; break;
                default: base = p[1] + exh[0];
                         avail = (p[3] - p[1]) - exh[0] - exh[3]; break;
              }
              avail = std::max(avail, 0.f);
              float along = (owner == 0 || owner == 2) ? lx : ly;
              float aa_dev = (owner == 0 || owner == 2) ? sx : sy;
              float wse = std::max(w_side, 1e-6f);
              // dashed pattern over [base, base+avail)
              float n0 = std::max(
                  std::min(std::ceil(avail / (1.5f * wse) - 1e-4f), 16384.f), 1.f);
              float rem = n0 - std::floor(n0 / 4.f) * 4.f;
              float n4 = rem > 0.f ? n0 + 4.f - rem : n0;
              float period_dash = std::max(4.f * avail / n4, 1e-6f);
              float t_dash = along - base;
              float tm_dash = t_dash -
                  std::floor(t_dash / period_dash) * period_dash;
              float hd = 0.25f * period_dash;
              float dcov = clampf(0.5f + (hd - tm_dash) * aa_dev, 0.f, 1.f) +
                           clampf(0.5f + (tm_dash - 3.f * hd) * aa_dev,
                                  0.f, 1.f);
              dcov = clampf(dcov, 0.f, 1.f);
              bool dash_span = along >= base && along < base + avail;
              // dotted pattern: dots of diameter w on a 2w period
              float das = 2.f * wse;
              float cnt = std::max(std::floor(avail / das), 1.f);
              float used = cnt * das;
              float doff = std::floor((avail - used) * 0.5f + 0.5f);
              float dot_a0 = base + doff;
              float dot_a1 = avail < das * 0.75f ? dot_a0 : dot_a0 + used;
              float t_dot = along - dot_a0;
              float tm_dot = t_dot - std::floor(t_dot / das) * das;
              float across = (depth_s - 0.5f) * w_side;
              float dt = tm_dot - 0.5f * das;
              float dot_d = std::sqrt(dt * dt + across * across) -
                            0.5f * w_side;
              float dot_cov = clampf(0.5f - dot_d * (sx + sy) * 0.5f,
                                     0.f, 1.f);
              bool dot_span = along >= dot_a0 && along < dot_a1;
              float own_mod =
                  style == 3.f ? (dot_span ? dot_cov : 0.f)
                  : (style == 4.f ? (dash_span ? dcov : 0.f) : 1.f);
              // zero-radius dashed corners draw NORMALLY
              // (write_dashed_corner returns Err on zero arc length)
              float corner_mod =
                  cstyle == 3.f ? (czero ? corner_dot : dot_cov)
                  : (cstyle == 4.f ? (czero_da ? 1.f : dcov) : 1.f);
              factor *= cstyle > -0.5f ? corner_mod : own_mod;
            }
            if (style == 0.f || style == 5.f) factor = 0.f;
            // depth_s is radial inside corner zones: zero-width neighbour
            // corners cull, real rounded corners survive
            float band = depth_s >= 1.f ? 0.f
                         : (depth_s <= 0.999f
                                ? 1.f
                                : clampf((1.f - depth_s) * scale + 0.5f,
                                         0.f, 1.f));
            factor *= band;
            if (!any_owner) factor = 0.f;
            for (int ch = 0; ch < 4; ch++)
              color[ch] = sc[ch] * factor * ring;
            // ring folded into color; clear cov ring term
            // (cov already includes coverage rect + clips)
            break;
          }
          case 11: {  // line decoration (pattern_line_dec)
            bool axis_v = p[13] > 0.5f;
            float par = axis_v ? (ly - p[1]) : (lx - p[0]);
            float perp = axis_v ? (lx - p[0]) : (ly - p[1]);
            float hh = axis_v ? (p[2] - p[0]) : (p[3] - p[1]);
            float aa = std::sqrt(sx * sy);
            float style = p[12];
            float alpha = 1.f;
            if (style >= 0.5f && style < 1.5f) {  // dotted
              float diameter = clampf(hh, 1.f, 64.f);
              float period = 2.f * diameter;
              float pxd = par - std::floor(par / period) * period;
              float pyd = perp - std::floor(perp / diameter) * diameter;
              float r = diameter * 0.5f;
              float dd = std::sqrt((pxd - r) * (pxd - r) +
                                   (pyd - r) * (pyd - r)) - r;
              alpha = clampf(0.5f - dd * aa, 0.f, 1.f);
            } else if (style < 2.5f && style >= 1.5f) {  // dashed
              float dash = clampf(3.f * hh, 1.f, 64.f);
              float period = 2.f * dash;
              float pxs = par - std::floor(par / period) * period;
              alpha = std::floor(pxs + 0.5f) <= dash ? 1.f : 0.f;
            } else if (style >= 2.5f) {  // wavy
              float lt = std::max(p[14], 1.f);
              float half_lt = lt * 0.5f;
              float slope = hh - lt;
              float flat = std::max((lt - 1.f) * 2.f, 1.f);
              float half_period = slope + flat;
              float mid = hh * 0.5f;
              float m2 = par - std::floor(par / (2.f * half_period)) *
                                   (2.f * half_period);
              float flip = m2 <= half_period ? -1.f : 1.f;
              float peak_h = mid + (mid - half_lt) * flip;
              float pxm = par - std::floor(par / half_period) * half_period;
              const float inv_s2 = 0.70710678118654752f;
              float d1 = (1.f * (0.f - pxm) + (-flip) * (peak_h - perp)) *
                         inv_s2;
              float d2 = (0.f * (0.f - pxm) + (-flip) * (peak_h - perp));
              float d3 = (-1.f * (flat - pxm) + (-flip) * (peak_h - perp)) *
                         inv_s2;
              float dist = std::fabs(std::max(std::max(d1, d2), d3));
              alpha = clampf(0.5f - (dist - half_lt) * aa, 0.f, 1.f);
              if (half_lt <= 1.f) alpha = alpha > 0.5f ? 1.f : 0.f;
            }
            for (int ch = 0; ch < 4; ch++) color[ch] = p[8 + ch] * alpha;
            break;
          }
          case 10: {  // subpixel glyph: rgb LCD masks in the color atlas
            float gsu = (p[10] - p[8]) / std::max(p[2] - p[0], 1e-6f);
            float gsv = (p[11] - p[9]) / std::max(p[3] - p[1], 1e-6f);
            float u = p[8] + (lx - p[0]) * gsu;
            float v = p[9] + (ly - p[1]) * gsv;
            float m[4];
            sample_rgba(c, c.color_atlas, c.ca_h, c.ca_w, u, v, p[8], p[9],
                        p[10], p[11], false, m);
            float m_avg = (m[0] + m[1] + m[2]) * (1.f / 3.f);
            color[0] = m[0] * p[12];
            color[1] = m[1] * p[13];
            color[2] = m[2] * p[14];
            color[3] = m_avg * p[15];
            break;
          }
          case 12: {  // in-kernel YUV (patterns.pattern_yuv payload)
            float ox = lx - p[0], oy = ly - p[1];
            float yy, uu, vv;
            sample_plane(c.alpha_atlas, c.aa_h, c.aa_w,
                         p[8] + ox * p[22], p[9] + oy * p[23],
                         p[8], p[9], p[10], p[11], false, &yy);
            sample_plane(c.alpha_atlas, c.aa_h, c.aa_w,
                         p[12] + ox * p[24], p[13] + oy * p[25],
                         p[12], p[13], p[14], p[15], false, &uu);
            sample_plane(c.alpha_atlas, c.aa_h, c.aa_w,
                         p[16] + ox * p[24], p[17] + oy * p[25],
                         p[16], p[17], p[18], p[19], false, &vv);
            float sy = yy - p[36], su = uu - p[37], sv = vv - p[38];
            color[0] = clampf(p[27] * sy + p[28] * su + p[29] * sv, 0.f, 1.f);
            color[1] = clampf(p[30] * sy + p[31] * su + p[32] * sv, 0.f, 1.f);
            color[2] = clampf(p[33] * sy + p[34] * su + p[35] * sv, 0.f, 1.f);
            color[3] = 1.f;
            break;
          }
          default:
            return;
        }
        float dst[4] = {target[0 * plane + y * tw + x],
                        target[1 * plane + y * tw + x],
                        target[2 * plane + y * tw + x],
                        target[3 * plane + y * tw + x]};
        compose_px(blend_op, color, cov, m8, dst);
        for (int ch = 0; ch < 4; ch++)
          target[ch * plane + y * tw + x] = dst[ch];
    };

    // band-parallel spans (the SwCompositor thread-pool role,
    // compositor/sw_compositor.rs:7-40)
#pragma omp parallel for schedule(static)
    for (int64_t y = y0; y < y1; y++) {
      float py = oy + (float)y + 0.5f;
      int64_t sxa = x1, sxb = x1;
      if (fast_ok && y >= fya && y < fyb && fxa < fxb) {
        sxa = fxa;
        sxb = fxb;
      }
      for (int64_t x = x0; x < std::min(sxa, x1); x++)
        shade(x, y, py, false);
      if (sxa < sxb) {
        if (solid_span && s8c[3] == 255.f) {
          // opaque solid span: the over-blend reduces to the source
          for (int ch = 0; ch < 4; ch++)
            std::fill(target + ch * plane + y * tw + sxa,
                      target + ch * plane + y * tw + sxb,
                      s8c[ch] * (1.0f / 255.0f));
        } else if (solid_span) {
          // translucent solid span: integer over-blend, vectorizable
          // (compose_px with cov=1, m8=255 collapses to this exactly)
          float sA = s8c[3];
          for (int ch = 0; ch < 4; ch++) {
            float sv = s8c[ch];
            float* row = target + ch * plane + y * tw;
            for (int64_t x = sxa; x < sxb; x++) {
              float d8 = std::floor(row[x] * 255.0f + 0.5f);
              float o = sv + d8 -
                        std::floor((d8 * sA + d8) * (1.0f / 256.0f));
              row[x] = (o > 255.f ? 255.f : o) * (1.0f / 255.0f);
            }
          }
        } else {
          for (int64_t x = sxa; x < sxb; x++) shade(x, y, py, true);
        }
      }
      for (int64_t x = std::max(sxb, x0); x < x1; x++)
        shade(x, y, py, false);
    }
  }
  return 0;
}


// Pack the planar premultiplied f32 framebuffer to interleaved RGBA8 with
// the oracle's exact conversion (oracle/sw.py render epilogue): f64
// product, NaN->0, floor(v + 0.5), clamp — GL unorm rounding.  The numpy
// epilogue was ~10x the cost of rasterizing a 4K frame; this is the same
// math OpenMP-parallel.
int wr_pack_rgba8(const float* fb, int64_t h, int64_t w, uint8_t* out) {
  const int64_t plane = h * w;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < plane; i++) {
    for (int c = 0; c < 4; c++) {
      double v = (double)fb[c * plane + i] * 255.0;
      if (std::isnan(v)) v = 0.0;
      v = std::floor(v + 0.5);
      v = v < 0.0 ? 0.0 : (v > 255.0 ? 255.0 : v);
      out[i * 4 + c] = (uint8_t)v;
    }
  }
  return 0;
}

}  // extern "C"
