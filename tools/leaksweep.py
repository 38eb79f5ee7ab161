#!/usr/bin/env python3
"""Repo-side leak sweep: fail if any non-public string appears under src/.

Patterns here are things that must never ship in the library source — dev
harness paths, local-machine paths, etc. Run directly or via CI; the same
patterns are enforced by CoverageSpec ("source tree is free of dev-harness
leaks") so `sbt test` catches them too.

Exit 0 = clean, 1 = hits (printed as file:line: match).
"""
import os
import re
import sys

PATTERNS = [
    re.compile(r"\.claude"),          # dev-harness skill/config paths
    re.compile(r"/root/repo/target"), # local build-dir absolute paths
]

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "src")


def main() -> int:
    hits = []
    for dirpath, _dirnames, filenames in os.walk(ROOT):
        for fn in filenames:
            path = os.path.join(dirpath, fn)
            try:
                with open(path, "r", encoding="utf-8", errors="ignore") as f:
                    for i, line in enumerate(f, 1):
                        for pat in PATTERNS:
                            if pat.search(line):
                                hits.append(f"{path}:{i}: {line.strip()}")
            except OSError:
                continue
    for h in hits:
        print(h)
    return 1 if hits else 0


if __name__ == "__main__":
    sys.exit(main())
