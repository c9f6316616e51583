#!/usr/bin/env python
"""Print the formatted physical plan of any registry query.

    python scripts/explain.py weighted_sample [sf_dir]

Plan shapes are scale-independent; use this to audit pushdown,
broadcast choices and exchange counts for any of the registry's
queries (PLANS.md snapshots only the flagships).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    if len(sys.argv) < 2:
        from databeats_spark.registry import registry

        for s in registry():
            print(s.name)
        return 0
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from databeats_spark.registry import queries
    from databeats_spark.session import get_spark

    spark = get_spark("explain", shuffle_partitions=8)
    queries()[name](spark, sf_dir).explain("formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
