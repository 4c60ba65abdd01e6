#!/usr/bin/env python
"""Batch/tile sweep of the headline bench (bench.py) on the real chip.

Usage: python scripts/bench_sweep.py [b:t ...]   (default: a spread around
the round-1 optimum b256/t24). Prints one line per config; results recorded
in PERF.md.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

DEFAULT = ["256:24", "384:24", "512:24", "192:28", "256:28", "128:32", "256:32", "512:16", "1024:16"]


def main() -> None:
    configs = sys.argv[1:] or DEFAULT
    for cfg in configs:
        b, t = (int(v) for v in cfg.split(":"))
        try:
            r = bench.bench(batch=b, tile=t)
            print(f"b{b} t{t}: {r['value']} MPix/s", flush=True)
        except Exception as e:  # OOM etc. — keep sweeping
            print(f"b{b} t{t}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
