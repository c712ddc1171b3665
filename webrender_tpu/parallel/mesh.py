"""Multi-chip rendering: shard the frame's tile grid across a device mesh.

The TPU-native analog of the reference's tile-parallel composition
(`compositor/sw_compositor.rs:743` splits tile bands across worker threads
with an overlap-dependency graph — SURVEY.md §2.7.6): the frame's tile grid
is the natural data-parallel axis.  Each device rasterizes its shard of
tiles via `shard_map` with the shared instance/GPU-buffer arrays replicated
(they are small relative to texel data), so the raster pass itself needs no
collectives; painter-order blending happens inside each tile, never across
tiles, so there is no overlap-dependency graph to honor.  Vertical blur of
a row-sharded image exchanges halo rows with neighbor devices over ICI via
`ppermute` — the only cross-device communication in the pipeline.  Readback
(or a final composite to one host) is an implicit all-gather.

Determinism: every sharded path below is bit-identical to its unsharded
equivalent (asserted by tests/test_multichip.py) because per-tile /
per-pixel FP evaluation order does not change — only placement does.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..frame.tiles import TILE_H, TILE_W
from ..ops.raster import render_tiles

MESH_AXIS = "tiles"


def make_mesh(devices=None, n: Optional[int] = None) -> Mesh:
    """1-D mesh over `devices` (default: all) along the tile axis."""
    if devices is None:
        devices = jax.devices()
    if n is not None:
        if len(devices) < n:
            raise RuntimeError(
                f"mesh requires {n} devices, backend has {len(devices)} "
                f"(set XLA_FLAGS=--xla_force_host_platform_device_count={n} "
                f"with JAX_PLATFORMS=cpu before jax initializes)")
        devices = devices[:n]
    return Mesh(np.array(devices), (MESH_AXIS,))


def pad_tiles_for_mesh(tile_insts: np.ndarray, tile_origins: np.ndarray,
                       n_shards: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad the tile axis to a multiple of the mesh size (padded tiles carry
    empty instance lists and render throwaway pixels)."""
    nt = tile_insts.shape[0]
    padded = -(-nt // n_shards) * n_shards
    if padded != nt:
        ti = np.full((padded, tile_insts.shape[1]), -1, np.int32)
        ti[:nt] = tile_insts
        to = np.zeros((padded, 2), np.float32)
        to[:nt] = tile_origins
        return ti, to
    return tile_insts, tile_origins


def render_tiles_sharded(mesh: Mesh, f32_buf, instances, transforms,
                         tile_insts, tile_origins, clear_color,
                         color_atlas, alpha_atlas, surface_atlas,
                         *, kinds, blends, step: float = 1.0,
                         gl: bool = False):
    """One raster pass with the tile axis sharded over `mesh`.

    Same contract as ops.raster.render_tiles: returns [nt, 4, TH, TW]
    premultiplied tiles (tile axis device-sharded).  Inputs may be host or
    device arrays; the tile axis is padded to a mesh multiple and the pad
    is stripped from the result.  Each device executes the identical
    per-tile program on its shard — bit-equal to the unsharded path.
    """
    n = mesh.devices.size
    nt = int(tile_insts.shape[0])
    ti = np.asarray(tile_insts)
    to = np.asarray(tile_origins)
    ti, to = pad_tiles_for_mesh(ti, to, n)
    clear = np.asarray(clear_color, np.float32)
    per_tile_clear = clear.ndim > 1
    if per_tile_clear and clear.shape[0] != ti.shape[0]:
        pad = np.zeros((ti.shape[0] - clear.shape[0],) + clear.shape[1:],
                       np.float32)
        clear = np.concatenate([clear, pad], 0)

    kinds = tuple(kinds)
    blends = tuple(blends)

    def shard_fn(fb, ins, tr, t_i, t_o, cl, ca, aa, sa):
        return render_tiles(fb, ins, tr, t_i, t_o, cl, ca, aa, sa,
                            kinds=kinds, blends=blends, step=step, gl=gl)

    in_specs = (P(), P(), P(), P(MESH_AXIS), P(MESH_AXIS),
                P(MESH_AXIS) if per_tile_clear else P(), P(), P(), P())
    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=P(MESH_AXIS), check_vma=False)
    tile_sh = NamedSharding(mesh, P(MESH_AXIS))
    repl = NamedSharding(mesh, P())
    args = (jax.device_put(jnp.asarray(f32_buf), repl),
            jax.device_put(jnp.asarray(instances), repl),
            jax.device_put(jnp.asarray(transforms), repl),
            jax.device_put(jnp.asarray(ti), tile_sh),
            jax.device_put(jnp.asarray(to), tile_sh),
            jax.device_put(jnp.asarray(clear),
                           tile_sh if per_tile_clear else repl),
            jax.device_put(color_atlas, repl),
            jax.device_put(alpha_atlas, repl),
            jax.device_put(surface_atlas, repl))
    out = fn(*args)
    return out[:nt]


def render_tiles_pallas_sharded(mesh: Mesh, dense, tile_counts,
                                tile_origins, clear_color, f32_rows,
                                alpha_atlas, surface_atlas, color_atlas,
                                init_tiles=None,
                                *, kinds, blends, mask_clips: bool = False,
                                interpret: bool = False, gl: bool = False):
    """The PRODUCTION raster path sharded: the dense-record Pallas kernel
    (ops/pallas/tile_raster.render_tiles_pallas_dense) runs per-device on
    its shard of the tile axis — dense records are already per-tile, so
    the tile grid is the natural shard unit (the sw_compositor.rs:743
    band-parallel role on real chips).  GPU-buffer rows and atlases are
    replicated; no collectives in the pass.  Bit-equal to the unsharded
    kernel (placement only).  `interpret` runs the kernel in Pallas
    interpret mode for CPU-mesh dryruns."""
    from ..ops.pallas.tile_raster import render_tiles_pallas_dense
    n = mesh.devices.size
    nt = int(dense.shape[0])
    padded = -(-nt // n) * n
    dn = jnp.asarray(dense)
    cnt = jnp.asarray(tile_counts)
    org = jnp.asarray(tile_origins)
    clear = jnp.asarray(clear_color, jnp.float32)
    per_tile_clear = clear.ndim > 1
    has_init = init_tiles is not None
    ini = jnp.asarray(init_tiles) if has_init else None
    if padded != nt:
        dn = jnp.pad(dn, ((0, padded - nt), (0, 0), (0, 0)))
        cnt = jnp.pad(cnt, (0, padded - nt))
        org = jnp.pad(org, ((0, padded - nt), (0, 0)))
        if per_tile_clear:
            clear = jnp.pad(clear, ((0, padded - nt),) +
                            ((0, 0),) * (clear.ndim - 1))
        if has_init:
            ini = jnp.pad(ini, ((0, padded - nt), (0, 0), (0, 0), (0, 0)))
    kinds = tuple(kinds)
    blends = tuple(blends)

    def shard_fn(d, c, o, cl, fr, aa, sa, ca, *rest):
        return render_tiles_pallas_dense(
            d, c, o, cl, fr, aa, sa, ca, *rest, kinds=kinds, blends=blends,
            mask_clips=mask_clips, interpret=interpret, gl=gl)

    in_specs = (P(MESH_AXIS), P(MESH_AXIS), P(MESH_AXIS),
                P(MESH_AXIS) if per_tile_clear else P(),
                P(), P(), P(), P()) + ((P(MESH_AXIS),) if has_init else ())
    fn = jax.shard_map(shard_fn, mesh=mesh, in_specs=in_specs,
                       out_specs=P(MESH_AXIS), check_vma=False)
    tile_sh = NamedSharding(mesh, P(MESH_AXIS))
    repl = NamedSharding(mesh, P())
    args = [jax.device_put(dn, tile_sh), jax.device_put(cnt, tile_sh),
            jax.device_put(org, tile_sh),
            jax.device_put(clear, tile_sh if per_tile_clear else repl),
            jax.device_put(jnp.asarray(f32_rows), repl),
            jax.device_put(alpha_atlas, repl),
            jax.device_put(surface_atlas, repl),
            jax.device_put(color_atlas, repl)]
    if has_init:
        args.append(jax.device_put(ini, tile_sh))
    out = fn(*args)
    return out[:nt]


@functools.partial(jax.jit, static_argnames=("radius", "axis", "mesh"))
def _blur_rows_sharded(src, weights, *, radius: int, axis: int, mesh: Mesh):
    """shard_map body wrapper (jit so the shard_map traces once)."""

    def shard_fn(x, w):
        # x: [4, h/n, w] local rows.  Vertical blur (axis 0 of the image =
        # dim 1 here) needs `radius` halo rows from each neighbor, fetched
        # over ICI with ppermute; horizontal blur needs no halo because the
        # width axis is unsharded.
        n = mesh.devices.size
        if axis == 0:
            if radius >= x.shape[1]:
                # halo wider than a shard: fall back to gather-all
                full = jax.lax.all_gather(x, MESH_AXIS, axis=1, tiled=True)
                pad = [(0, 0), (radius, radius), (0, 0)]
                fp = jnp.pad(full, pad, mode="edge")
                out = jnp.zeros_like(full)
                for k in range(2 * radius + 1):
                    out = out + w[k] * fp[:, k:k + full.shape[1], :]
                out = jnp.floor(out * (1.0 / 65536.0) + 0.5) \
                    * (1.0 / 255.0)
                i = jax.lax.axis_index(MESH_AXIS)
                h = x.shape[1]
                return jax.lax.dynamic_slice(
                    out, (0, i * h, 0), (4, h, full.shape[2]))
            # rows above come from the previous shard's bottom rows,
            # rows below from the next shard's top rows; boundary shards
            # replicate their own edge rows (cs_blur.glsl vUvRect clamp —
            # taps beyond the blur region read the clamped edge texel)
            top_halo = jax.lax.ppermute(
                x[:, -radius:, :], MESH_AXIS,
                perm=[(i, i + 1) for i in range(n - 1)])
            bot_halo = jax.lax.ppermute(
                x[:, :radius, :], MESH_AXIS,
                perm=[(i + 1, i) for i in range(n - 1)])
            idx = jax.lax.axis_index(MESH_AXIS)
            top_edge = jnp.repeat(x[:, :1, :], radius, axis=1)
            bot_edge = jnp.repeat(x[:, -1:, :], radius, axis=1)
            top_halo = jnp.where(idx == 0, top_edge, top_halo)
            bot_halo = jnp.where(idx == n - 1, bot_edge, bot_halo)
            ext = jnp.concatenate([top_halo, x, bot_halo], axis=1)
            out = jnp.zeros_like(x)
            for k in range(2 * radius + 1):
                out = out + w[k] * ext[:, k:k + x.shape[1], :]
            return jnp.floor(out * (1.0 / 65536.0) + 0.5) \
                * (1.0 / 255.0)
        # horizontal: pure local work
        pad = [(0, 0), (0, 0), (radius, radius)]
        ext = jnp.pad(x, pad, mode="edge")
        out = jnp.zeros_like(x)
        for k in range(2 * radius + 1):
            out = out + w[k] * ext[:, :, k:k + x.shape[2]]
        return jnp.floor(out * (1.0 / 65536.0) + 0.5) \
            * (1.0 / 255.0)

    fn = jax.shard_map(shard_fn, mesh=mesh,
                       in_specs=(P(None, MESH_AXIS, None), P()),
                       out_specs=P(None, MESH_AXIS, None), check_vma=False)
    return fn(src, weights)


def blur_image_sharded(mesh: Mesh, src, weights, *, radius: int, axis: int,
                       bw: int = 0, bh: int = 0):
    """Separable gaussian blur of a planar [4, h, w] image with the row axis
    sharded over `mesh`; vertical blurs halo-exchange boundary rows via
    `ppermute` (the ICI path).  Sampling clamps into the blur region
    [0, bw) × [0, bh) like cs_blur.glsl's vUvRect — implemented by
    edge-replicating the content across the task margin first (taps beyond
    the region then read the same clamped-edge texel) — bit-equal to
    ops.raster.blur_region."""
    n = mesh.devices.size
    c, h, w = src.shape
    if bw <= 0:
        bw = w
    if bh <= 0:
        bh = h
    src = jnp.pad(jnp.floor(src[:, :bh, :bw] * 255.0 + 0.5),
                  ((0, 0), (0, h - bh), (0, w - bw)), mode="edge")
    ph = (-h) % n
    x = jnp.asarray(src)
    if ph:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, 0)), mode="edge")
    rows_sh = NamedSharding(mesh, P(None, MESH_AXIS, None))
    x = jax.device_put(x, rows_sh)
    out = _blur_rows_sharded(x, jnp.asarray(weights), radius=radius,
                             axis=axis, mesh=mesh)
    return out[:, :h, :]
