#!/usr/bin/env python
"""Run individual reftest cases by substring match. Usage:
  python tools/run_case.py SUITE SUBSTR [SUBSTR ...] [--engine oracle]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from webrender_tpu.wrench.reftest import (ReftestHarness,  # noqa: E402
                                          parse_reftest_manifest)

BASE = Path("/root/reference/wrench/reftests")


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    engine = "oracle"
    for a in sys.argv[1:]:
        if a.startswith("--engine="):
            engine = a.split("=", 1)[1]
    suite, subs = args[0], args[1:]
    harness = ReftestHarness(engine=engine)
    cases = parse_reftest_manifest(BASE / suite / "reftest.list")
    n_fail = 0
    for c in cases:
        if subs and not any(s in c.line for s in subs):
            continue
        r = harness.run_case(c)
        status = "PASS" if r.passed else ("SKIP" if r.skipped else "FAIL")
        if not r.passed and not r.skipped:
            n_fail += 1
        print(f"{status} {c.line[:100]} | {r.detail[:140]}", flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
