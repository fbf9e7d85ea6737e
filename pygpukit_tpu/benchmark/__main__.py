"""Unified benchmark CLI: ``python -m pygpukit_tpu.benchmark [suite ...]``
(reference: src/pygpukit/benchmark/cli.py:11)."""

from __future__ import annotations

import argparse

from .suites import SUITES


def main() -> None:
    ap = argparse.ArgumentParser(prog="pygpukit_tpu.benchmark")
    ap.add_argument("suites", nargs="*", default=[],
                    help=f"suites to run: {', '.join(SUITES)} (default: all)")
    ap.add_argument("--sizes", type=int, nargs="*", default=None,
                    help="gemm sizes override")
    args = ap.parse_args()

    names = args.suites or list(SUITES)
    for name in names:
        if name not in SUITES:
            raise SystemExit(f"unknown suite {name!r}; choose from {list(SUITES)}")
        cls = SUITES[name]
        suite = (cls(sizes=tuple(args.sizes)) if name == "gemm" and args.sizes
                 else cls())
        suite.run()
        print(suite.report_markdown())
        print()


if __name__ == "__main__":
    main()
