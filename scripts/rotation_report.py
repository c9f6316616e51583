#!/usr/bin/env python
"""Driver-window rotation report.

The grading driver's CORRECTNESS gate checks only ``registry()[:50]``.
This script unions every recorded ``CORRECTNESS_r*.json``, reports
which registry queries have never earned a driver-green row, and
prints the recommended front-50 for the NEXT round: never-verified
queries first (oracle-carrying before rows-only), then the bench
headliners so each benchmarked query keeps a same-round row, then —
once the backlog is empty (r5 closed it) — the STALEST green rows
first, so re-verification debt retires oldest-first and every query's
latest green row keeps cycling forward.

Run at the start of each round; mirror its recommendation in
``databeats_spark/registry/__init__.py``'s ``_WINDOW``. Queries whose
builder or oracle changed mid-round should be PREPENDED to ``_WINDOW``
as they land (they carry fresh regression risk no history covers).
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
    last_green: dict[str, int] = {}  # name -> latest round with a clean row
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(path).split("_r")[1].split(".")[0])
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
            last_green[name] = max(rnd, last_green.get(name, 0))
        print(f"{os.path.basename(path)}: {len(rows)} rows")

    specs = list(registry())
    never = [s for s in specs if s.name not in last_green]
    bench = [s for s in specs if s.bench]
    print(f"\nregistry: {len(specs)} queries; never driver-verified: {len(never)}")
    for s in never:
        kind = "oracle" if s.oracle else "rows-only"
        print(f"  {s.name} ({kind})")

    front = [s for s in never if s.oracle] + [s for s in never if not s.oracle]
    for s in bench:
        if s not in front:
            front.append(s)
    # fill remaining slots with the STALEST green rows first (ties
    # break by registry order for stability)
    by_age = sorted(
        (s for s in specs if s not in front),
        key=lambda s: (last_green.get(s.name, 0), specs.index(s)),
    )
    for s in by_age:
        if len(front) >= 50:
            break
        front.append(s)
    print("\nrecommended front-50 for next round:")
    for i, s in enumerate(front[:50]):
        print(f"  {i:2d} {s.name}")
    in_window = {s.name for s in specs[:50]}
    missing = [s.name for s in front[:50] if s.name not in in_window]
    print(f"\ncurrent window misses {len(missing)} of the recommendation: {missing}")


if __name__ == "__main__":
    main()
