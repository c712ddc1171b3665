#!/usr/bin/env python
"""Run the reference's reftest corpus. Usage:
  python run_reftests.py [--engine oracle|device] [--suite NAME ...] [-v]
"""
import argparse
import sys
import time
from pathlib import Path

from webrender_tpu.wrench.reftest import (ReftestHarness,
                                          parse_reftest_manifest, summarize)

SUITES = ["aa", "backface", "blend", "border", "boxshadow", "clip",
          "compositor-surface", "crash", "filters", "gradient", "image",
          "mask", "performance", "scrolling", "snap", "split", "text",
          "tiles", "transforms"]
BASE = Path("/root/reference/wrench/reftests")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="oracle")
    ap.add_argument("--suite", nargs="*", default=SUITES)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()
    harness = ReftestHarness(engine=args.engine)
    grand = [0, 0, 0]
    for suite in args.suite:
        manifest = BASE / suite / "reftest.list"
        if not manifest.exists():
            continue
        t0 = time.time()
        results = [harness.run_case(c)
                   for c in parse_reftest_manifest(manifest)]
        p, f, s = summarize(results)
        grand[0] += p
        grand[1] += f
        grand[2] += s
        print(f"{suite:22s} pass={p:3d} fail={f:3d} skip={s:3d}"
              f"  ({time.time()-t0:.1f}s)", flush=True)
        if args.verbose:
            for r in results:
                if not r.passed:
                    print(f"   FAIL {r.case.line[:90]} | {r.detail[:110]}")
    print(f"{'TOTAL':22s} pass={grand[0]} fail={grand[1]} skip={grand[2]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
