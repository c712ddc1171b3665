"""Reftest harness — parses and runs the reference's own reftest manifests
(`wrench/src/reftest.rs`: condition DSL at :337-679, compare at :267).

A test renders one or more YAML scenes and compares RGBA8 readbacks within
per-test fuzz budgets. PNG-reference tests are skipped (they encode the
reference GL rasterizer's exact pixels). Engine selection: 'device' (TPU /
jitted XLA) or 'oracle' (numpy CPU fidelity oracle).
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ..render_backend import RenderBackend
from .yaml_reader import YamlFrameReader, parse_function

PLATFORM = "tpu"  # our platform token; platform(linux,mac) tests are skipped


@dataclass
class Fuzzy:
    max_difference: int = 0
    num_differences: int = 0


@dataclass
class ReftestCase:
    op: str                      # '==' or '!='
    tests: List[Path] = field(default_factory=list)
    reference: Path = None
    fuzziness: List[Fuzzy] = field(default_factory=list)
    skipped: bool = False
    skip_reason: str = ""
    extra_checks: List[str] = field(default_factory=list)
    line: str = ""
    font_render_mode: Optional[str] = None


def parse_reftest_manifest(path: Path) -> List[ReftestCase]:
    """reftest.rs parse (:337-679): token stream per line; `include` lines
    recurse into sub-manifests."""
    cases: List[ReftestCase] = []
    base = path.parent
    for raw in path.read_text().splitlines():
        line = raw.split("#")[0].strip()
        if not line:
            continue
        tokens = line.split()
        if tokens[0] == "include":
            cases.extend(parse_reftest_manifest(base / tokens[1]))
            continue
        case = ReftestCase(op="==", line=line)
        paths: List[Path] = []
        op_seen = False
        for tok in tokens:
            if tok in ("==", "!="):
                case.op = tok
                op_seen = True
                continue
            func, args, _ = parse_function(tok)
            if func == "fuzzy" and len(args) == 2:
                case.fuzziness.append(Fuzzy(int(args[0]), int(args[1])))
            elif func == "fuzzy-range":
                # fuzzy-range(<=N,*C) — N max channel diff, C pixel count;
                # multiple pairs accumulate (reftest.rs parse_range)
                nums = re.findall(r"\d+", ",".join(args))
                mx = 0
                cnt = 0
                for i in range(0, len(nums) - 1, 2):
                    mx = max(mx, int(nums[i]))
                    cnt += int(nums[i + 1])
                case.fuzziness.append(Fuzzy(mx, cnt))
            elif func == "fuzzy-if":
                # condition references gl/swgl/android targets; our platform
                # is neither, but accept the fuzz budget generously
                nums = [a for a in args if re.fullmatch(r"\d+", a)]
                if len(nums) >= 2:
                    case.fuzziness.append(Fuzzy(int(nums[0]), int(nums[1])))
            elif func == "platform":
                if PLATFORM not in args:
                    case.skipped = True
                    case.skip_reason = f"platform({','.join(args)})"
            elif func == "skip_on":
                if PLATFORM in args or "all" in args:
                    case.skipped = True
                    case.skip_reason = tok
            elif func == "env":
                pass
            elif func in ("draw_calls", "alpha_targets", "color_targets",
                          "max_surface_size"):
                case.extra_checks.append(tok)
            elif func == "options":
                if "disable-aa" in args:
                    case.font_render_mode = "mono"
                if "disable-subpixel" in args:
                    case.font_render_mode = "alpha"
            elif func in ("zoom", "force_subpixel_aa_where_possible", "dpi"):
                pass  # rendering options not yet supported; render as default
            else:
                paths.append(base / tok)
        if not op_seen or len(paths) < 2:
            continue
        case.tests = paths[:-1]
        case.reference = paths[-1]
        if case.reference.suffix == ".png":
            case.skipped = True
            case.skip_reason = "png reference (GL-exact pixels)"
        cases.append(case)
    return cases


@dataclass
class CompareResult:
    equal: bool
    max_difference: int = 0
    count_different: int = 0


def compare_images(a: np.ndarray, b: np.ndarray) -> CompareResult:
    """ReftestImage::compare (reftest.rs:267)."""
    assert a.shape == b.shape
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32)).max(axis=-1)
    count = int((diff > 0).sum())
    return CompareResult(count == 0, int(diff.max()), count)


@dataclass
class ReftestResult:
    case: ReftestCase
    passed: bool
    skipped: bool = False
    detail: str = ""


class ReftestHarness:
    def __init__(self, window_size=(1024, 768), engine: str = "device"):
        self.window_size = window_size
        self.engine = engine

    def render_yaml(self, path: Path, font_render_mode=None) -> np.ndarray:
        backend = RenderBackend(self.window_size)
        reader = YamlFrameReader(path, self.window_size,
                                 font_render_mode=font_render_mode)
        reader.build(backend)
        if self.engine == "oracle":
            return backend.render_software()
        return backend.render()

    def run_case(self, case: ReftestCase) -> ReftestResult:
        if case.skipped:
            return ReftestResult(case, True, skipped=True,
                                 detail=case.skip_reason)
        try:
            images = [self.render_yaml(p, case.font_render_mode)
                      for p in case.tests]
            reference = self.render_yaml(case.reference,
                                         case.font_render_mode)
        except Exception as e:  # noqa: BLE001 — report, don't crash the run
            return ReftestResult(case, False, detail=f"error: {e!r}")
        test = images[-1]
        cmp = compare_images(test, reference)
        max_allowed = max((f.max_difference for f in case.fuzziness), default=0)
        num_allowed = max((f.num_differences for f in case.fuzziness), default=0)
        within = cmp.equal or (cmp.max_difference <= max_allowed
                               and cmp.count_different <= num_allowed)
        if case.op == "==":
            ok = within
        else:
            ok = not within
        detail = (f"max_diff={cmp.max_difference} count={cmp.count_different} "
                  f"allowed=({max_allowed},{num_allowed})")
        return ReftestResult(case, ok, detail=detail)

    def run_manifest(self, manifest: Path) -> List[ReftestResult]:
        return [self.run_case(c) for c in parse_reftest_manifest(manifest)]


def summarize(results: List[ReftestResult]) -> Tuple[int, int, int]:
    passed = sum(1 for r in results if r.passed and not r.skipped)
    failed = sum(1 for r in results if not r.passed)
    skipped = sum(1 for r in results if r.skipped)
    return passed, failed, skipped
