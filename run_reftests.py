#!/usr/bin/env python
"""Run the reference's reftest corpus. Usage:
  python run_reftests.py [--engine oracle|device] [--suite NAME ...] [-v]
                         [--json OUT.json]

The JSON artifact records per-suite pass/fail/skip, every failure with its
diff stats, every skip with its reason, and (device engine) the raster
engine mix — evidence of which passes ran Pallas vs XLA vs sharded.
"""
import argparse
import json
import os
import sys
import time
from pathlib import Path

if os.environ.get("WRTPU_PLATFORM"):
    # e.g. WRTPU_PLATFORM=cpu — run without the TPU tunnel (oracle runs
    # are pure CPU; only the atlas arrays lived on the device)
    import jax
    jax.config.update("jax_platforms", os.environ["WRTPU_PLATFORM"])

from webrender_tpu.wrench.reftest import (PLATFORM_SETS, ReftestHarness,
                                          parse_reftest_manifest, summarize)

SUITES = ["aa", "backface", "blend", "border", "boxshadow", "clip",
          "compositor-surface", "crash", "filters", "gradient", "image",
          "mask", "performance", "scrolling", "snap", "split", "text",
          "tiles", "transforms"]
BASE = Path("/root/reference/wrench/reftests")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="oracle",
                    help="oracle | device | cross (cross = render every "
                         "case on BOTH engines and bitwise-compare device "
                         "output to the oracle — the device==oracle gate; "
                         "text PNG-skips are asserted too)")
    ap.add_argument("--platform", default="union",
                    choices=sorted(PLATFORM_SETS),
                    help="which reference CI configuration to replicate: "
                         "'swgl' = the software-run semantics (GL-only "
                         "platform(linux,mac) lines skip, swgl budgets "
                         "apply) - the north-star metric; 'linux' = the "
                         "GL-run semantics; 'union' (default) = every "
                         "line either configuration runs")
    ap.add_argument("--suite", nargs="*", default=SUITES)
    ap.add_argument("-v", "--verbose", action="store_true")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()
    harness = ReftestHarness(engine=args.engine)
    grand = [0, 0, 0]
    suites_out = []
    for suite in args.suite:
        manifest = BASE / suite / "reftest.list"
        if not manifest.exists():
            continue
        t0 = time.time()
        run1 = harness.run_case_cross if args.engine == "cross" \
            else harness.run_case
        results = [run1(c)
                   for c in parse_reftest_manifest(
                       manifest, PLATFORM_SETS[args.platform])]
        p, f, s = summarize(results)
        grand[0] += p
        grand[1] += f
        grand[2] += s
        dt = time.time() - t0
        print(f"{suite:22s} pass={p:3d} fail={f:3d} skip={s:3d}"
              f"  ({dt:.1f}s)", flush=True)
        fails = [{"line": r.case.line[:120], "detail": r.detail[:160]}
                 for r in results if not r.passed]
        skips = {}
        for r in results:
            if r.skipped:
                skips[r.detail] = skips.get(r.detail, 0) + 1
        suites_out.append({"suite": suite, "pass": p, "fail": f, "skip": s,
                           "seconds": round(dt, 1), "failures": fails,
                           "skip_reasons": skips})
        if args.verbose:
            for r in results:
                if not r.passed:
                    print(f"   FAIL {r.case.line[:90]} | {r.detail[:110]}")
    print(f"{'TOTAL':22s} pass={grand[0]} fail={grand[1]} skip={grand[2]}")
    if args.engine in ("device", "cross"):
        print(f"engine mix: {harness.engine_counts}")
    if args.json:
        with open(args.json, "w") as fjs:
            json.dump({"engine": args.engine,
                       "platform": args.platform,
                       "total": {"pass": grand[0], "fail": grand[1],
                                 "skip": grand[2]},
                       "engine_mix": harness.engine_counts,
                       "suites": suites_out}, fjs, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
