#!/usr/bin/env python
"""Bisect tool for the text-at-scale device crash (VERDICT r3 weak #1).

Renders the bench 4K scene at a given text-run count on a given engine and
prints per-pass progress so the crashing pass is identifiable.

    python tools/crash_repro.py --n-text 60 --engine pallas
"""
from __future__ import annotations

import argparse
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-text", type=int, default=60)
    ap.add_argument("--n-rects", type=int, default=2)
    ap.add_argument("--n-grads", type=int, default=0)
    ap.add_argument("--n-images", type=int, default=0)
    ap.add_argument("--engine", choices=("pallas", "xla"), default="pallas")
    ap.add_argument("--w", type=int, default=3840)
    ap.add_argument("--h", type=int, default=2160)
    args = ap.parse_args()

    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from bench import build_4k_scene
    print(f"[repro] building scene n_text={args.n_text} "
          f"engine={args.engine}", file=sys.stderr, flush=True)
    backend = build_4k_scene(w=args.w, h=args.h, n_rects=args.n_rects,
                             n_grads=args.n_grads, n_images=args.n_images,
                             n_text=args.n_text)
    backend.renderer.use_pallas = args.engine == "pallas"
    backend.renderer.picture_caching = False
    frame = backend.build_frame()
    print(f"[repro] frame built: {frame.instances.shape[0]} instances, "
          f"{len(frame.passes)} passes", file=sys.stderr, flush=True)
    for p in frame.passes:
        ti = getattr(p, "tile_insts", None)
        n_inst = int((ti >= 0).sum()) if ti is not None else 0
        print(f"[repro]   pass kind={getattr(p, 'kind', '?')} "
              f"instances={n_inst}",
              file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    fb = backend.renderer.render_device(frame)
    import jax
    jax.block_until_ready(fb)
    dt = (time.perf_counter() - t0) * 1000.0
    print(f"[repro] OK render {dt:.1f} ms  checksum={float(fb[0, 0, 0])}",
          file=sys.stderr, flush=True)
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
