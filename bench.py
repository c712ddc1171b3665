#!/usr/bin/env python
"""Headline benchmark: 4K frame throughput vs the CPU fidelity oracle
(the SWGL stand-in — BASELINE.md north star: >=10x swgl 4K throughput).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np


def build_4k_scene(w=3840, h=2160, n_rects=400, n_grads=100):
    """A browsing-like 4K workload: background, hundreds of solid rects,
    gradients, rounded clips, alpha blending."""
    from webrender_tpu.api import (BorderRadius, ColorF, CommonItemProperties,
                                   DisplayListBuilder, Epoch, ExtendMode,
                                   GradientStop, PipelineId, Point2D, Rect,
                                   SpatialId, Transaction)
    from webrender_tpu.render_backend import RenderBackend

    backend = RenderBackend((w, h))
    pid = PipelineId(0, 1)
    b = DisplayListBuilder(pid)
    b.begin()
    root = SpatialId.root_scroll_node(pid)
    common = CommonItemProperties(Rect(0, 0, w, h), root)
    rng = np.random.RandomState(42)
    b.push_rect(common, Rect(0, 0, w, h), ColorF(0.95, 0.95, 0.97, 1.0))
    for i in range(n_rects):
        x = float(rng.uniform(0, w - 200))
        y = float(rng.uniform(0, h - 120))
        rw = float(rng.uniform(40, 200))
        rh = float(rng.uniform(30, 120))
        alpha = 1.0 if i % 2 else 0.85
        b.push_rect(common, Rect(x, y, rw, rh),
                    ColorF(float(rng.rand()), float(rng.rand()),
                           float(rng.rand()), alpha))
    for i in range(n_grads):
        x = float(rng.uniform(0, w - 256))
        y = float(rng.uniform(0, h - 128))
        g, stops = b.create_gradient(
            Point2D(0, 0), Point2D(256, 0),
            [GradientStop(0.0, ColorF(1, 0.2, 0.1, 1)),
             GradientStop(0.5, ColorF(0.2, 0.6, 1, 1)),
             GradientStop(1.0, ColorF(0.1, 1, 0.4, 1))],
            ExtendMode.CLAMP)
        b.push_gradient(common, Rect(x, y, 256, 96), g, stops)
    clip = b.define_clip_rounded_rect(root, Rect(100, 100, 600, 400),
                                      BorderRadius.uniform(40.0))
    chain = b.define_clip_chain(None, [clip])
    b.push_rect(dataclasses.replace(common, clip_chain_id=chain),
                Rect(0, 0, 800, 600), ColorF(0.1, 0.1, 0.4, 0.6))
    _, dl = b.end()
    txn = Transaction()
    txn.set_root_pipeline(pid)
    txn.set_display_list(Epoch(0), dl)
    txn.generate_frame()
    backend.send_transaction(txn)
    return backend


def device_render_once(backend, frame):
    """One full device render; a scalar checksum readback forces execution
    (remote-tunnel backends can report readiness before compute finishes)."""
    fb = backend.renderer.render_device(frame)
    return float(fb[0, 0, 0])


def device_render_loop(backend, frame, iters):
    """Amortized frame loop: dispatch all renders, sync once at the end —
    the device executes queued computations in order, so total/iters is the
    true per-frame time without per-iteration host round-trips."""
    fb = None
    for _ in range(iters):
        fb = backend.renderer.render_device(frame)
    return float(fb[0, 0, 0])


def main():
    import os
    import jax
    cache = os.environ.get("WRTPU_JAX_CACHE", "/tmp/wrtpu_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    backend = build_4k_scene()
    t0 = time.perf_counter()
    frame = backend.build_frame()
    frame_build_ms = (time.perf_counter() - t0) * 1000.0

    # headline: FULL re-render throughput (no dirty-tile skipping — the
    # comparable number to swgl rendering every frame)
    backend.renderer.picture_caching = False
    device_render_once(backend, frame)
    device_render_once(backend, frame)
    iters = 20
    t0 = time.perf_counter()
    device_render_loop(backend, frame, iters)
    device_s = (time.perf_counter() - t0) / iters
    tpu_fps = 1.0 / device_s

    # incremental: unchanged-frame recomposite with picture caching on
    backend.renderer.picture_caching = True
    device_render_once(backend, frame)
    device_render_once(backend, frame)
    t0 = time.perf_counter()
    device_render_loop(backend, frame, iters)
    cached_s = (time.perf_counter() - t0) / iters

    # CPU oracle baseline (the swgl role), single frame
    from webrender_tpu.oracle.sw import SoftwareRenderer
    backend.renderer.apply_uploads(backend.resources.take_uploads())
    sw = SoftwareRenderer(backend.renderer.color_atlas_host,
                          backend.renderer.alpha_atlas_host)
    t0 = time.perf_counter()
    sw.render(frame)
    oracle_s = time.perf_counter() - t0
    oracle_fps = 1.0 / oracle_s

    result = {
        "metric": "4k_frames_per_second",
        "value": round(tpu_fps, 2),
        "unit": "fps",
        "vs_baseline": round(tpu_fps / oracle_fps, 2),
        "detail": {
            "device_ms_per_frame": round(device_s * 1000.0, 3),
            "cached_frame_ms": round(cached_s * 1000.0, 3),
            "oracle_ms_per_frame": round(oracle_s * 1000.0, 1),
            "frame_build_ms": round(frame_build_ms, 1),
            "backend": jax.devices()[0].platform,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
