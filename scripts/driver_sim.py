#!/usr/bin/env python
"""Full driver-contract simulation in a VANILLA SparkSession.

Mirrors the grading driver exactly: builds a session with NO
engine confs (the driver never sets ours — see
`CLAUDE.md` on the TIMESTAMP_NTZ regression this caught), runs
``entry()``, then every ``queries()`` entry at sf0.01 against its
``oracle_sql()`` twin via DuckDB with the driver's canonical value
hash. Exits nonzero on any mismatch.

    python scripts/driver_sim.py            # full registry
    python scripts/driver_sim.py name1 ...  # subset
    DRIVER_SIM_WINDOW=50 python scripts/driver_sim.py  # driver's front-50 only
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CORRECT_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def vhash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.md5(pdf.to_csv(index=False, float_format="%.6f").encode()).hexdigest()


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as entrymod

    n_entry = entrymod.entry(spark).count()
    print(f"entry rows: {n_entry}")
    assert n_entry >= 1, "entry() returned no rows"

    q, o = entrymod.queries(), entrymod.oracle_sql()
    names = sys.argv[1:] or list(q)
    window = os.environ.get("DRIVER_SIM_WINDOW")
    if window:
        names = list(q)[: int(window)]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    failed: list[str] = []
    for name in names:
        try:
            spdf = q[name](spark, SF_DIR).toPandas()
            if name in o:
                ddf = con.execute(o[name]).fetchdf()
                ok = (
                    sorted(spdf.columns) == sorted(ddf.columns)
                    and len(spdf) == len(ddf)
                    and vhash(spdf) == vhash(ddf)
                )
                status = "MATCH" if ok else "MISMATCH"
            else:
                ok = len(spdf) > 0
                status = "rows-only" if ok else "EMPTY"
            print(f"{'ok ' if ok else 'FAIL'} {name}: {len(spdf)} rows [{status}]")
            if not ok:
                failed.append(name)
        except Exception as e:  # noqa: BLE001 — report and continue, like the driver
            print(f"FAIL {name}: {type(e).__name__}: {str(e).splitlines()[0][:160]}")
            failed.append(name)
    print(f"\n{len(names) - len(failed)}/{len(names)} green; failures: {failed}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
