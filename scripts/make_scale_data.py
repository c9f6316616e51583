#!/usr/bin/env python
"""Materialize the AUGMENTED third scale point for the byte-scale curve
(VERDICT r9 item 5).

The driver-generated testdata stops at sf0.1 and its generator is not
available, so the 2x point is built deterministically FROM sf0.1: every
fact table is unioned with a key-remapped copy (ids offset by 10^9 so
the two halves never collide), with content perturbed just enough that
the copy does not plant artificial duplicates or collapse distinct-value
sets — the two failure modes that would bend a dedup or order-statistic
byte curve for data reasons rather than plan reasons:

- documents: every 4th word of the copy is REPLACED by a unique marker
  token ("zzq{doc_id}q{pos}" — unique per doc AND position).
  Replacement (not insertion) keeps the token count EXACTLY 2x — the
  property the byte-curve divides by — while destroying cross-copy
  shingle overlap (a word-3-shingle survives only when no marker lands
  inside it: 1 of every 4 window alignments, i.e. ~25% Jaccard, far
  below every near-dup threshold) and keeping the source catalog
  (still 20 sources) realistic.
- orders/customer/events/lineitem: copied keys offset into each other
  (copied orders reference copied customers), money/value columns
  shifted by a sub-cent-scale constant so distinct-value tables double
  like real data instead of doubling counts per value.
- part (catalog) is copied verbatim: baskets double over a stable
  brand catalog, which is what 2x more orders against one catalog does.
- every output is written ORDER BY its natural key: DuckDB's parallel
  COPY otherwise interleaves the union arbitrarily, which destroys the
  basket/entity locality the driver files have — measured effect:
  basket_lift_rules' map-side collect_set combine collapsed (147k ->
  824k partial rows, a 3.8x byte "super-linearity" that was file
  layout, not plan).

Output: /root/repo/.scale/sf0.2/{documents,orders,customer,events,
lineitem,part}.parquet (gitignored — ~100 MB; regenerate on demand).
Only the tables the five audited movers load are materialized.

    python scripts/make_scale_data.py
"""

from __future__ import annotations

import os

SRC = "/root/testdata/sf0.1"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, ".scale", "sf0.2")
OFFSET = 1_000_000_000


# Every 4th word replaced by a (doc, position)-unique marker: token
# count preserved exactly, cross-copy shingle overlap destroyed
# (tests/test_scale_data.py pins both properties).
SALTED_TEXT = """
  array_to_string(list_transform(
    range(1, len(string_split_regex(text, '\\s+')) + 1),
    i -> CASE WHEN (i - 1) % 4 = 0
         THEN 'zzq' || CAST(doc_id AS VARCHAR) || 'q' || CAST(i AS VARCHAR)
         ELSE string_split_regex(text, '\\s+')[i] END), ' ')
"""


OUT4 = os.path.join(REPO, ".scale", "sf0.4")


def make_x4_facts() -> None:
    """Materialize the FOURTH scale point (4x sf0.1) for just the two
    transition-prone movers' tables (VERDICT r10 item 6):
    hits_copurchase and adamic_adar_links load orders + lineitem (+ a
    fixed part catalog). Three key-remapped copies (offsets 1-3x
    OFFSET, money shifted by a distinct sub-cent constant per copy so
    distinct-value sets scale like real data), natural-key ORDER BY
    for the entity locality lesson, part verbatim — the same fixed-
    catalog caveat as sf0.2, read honestly in SCALE.md."""
    import duckdb

    os.makedirs(OUT4, exist_ok=True)
    con = duckdb.connect()
    copies = {
        "orders": lambda i: f"""
            SELECT o_orderkey + {i * OFFSET} AS o_orderkey,
                   o_custkey + {i * OFFSET} AS o_custkey,
                   o_orderstatus, o_totalprice + {0.013 * i:.3f} AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM src
        """,
        "lineitem": lambda i: f"""
            SELECT l_orderkey + {i * OFFSET} AS l_orderkey, l_partkey, l_suppkey,
                   l_linenumber, l_quantity,
                   l_extendedprice + {0.01 * i:.2f} AS l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM src
        """,
        "part": None,
    }
    order_by = {
        "orders": "o_orderkey",
        "lineitem": "l_orderkey, l_linenumber",
        "part": "p_partkey",
    }
    for table, copy_sql in copies.items():
        con.execute(
            f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{table}.parquet'"
        )
        body = "SELECT * FROM src"
        if copy_sql is not None:
            body += "".join(f" UNION ALL {copy_sql(i)}" for i in range(1, 4))
        out = os.path.join(OUT4, f"{table}.parquet")
        con.execute(
            f"COPY (SELECT * FROM ({body}) ORDER BY {order_by[table]}) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        n_src = con.execute("SELECT count(*) FROM src").fetchone()[0]
        n_out = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"x4 {table}: {n_src} -> {n_out} rows ({out})")


def main() -> None:
    import duckdb

    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()

    salted_text = SALTED_TEXT
    copies = {
        "documents": f"""
            SELECT doc_id + {OFFSET} AS doc_id, {salted_text} AS text,
                   lang, source,
                   CAST(length({salted_text}) AS BIGINT) AS n_chars
            FROM src
        """,
        "orders": f"""
            SELECT o_orderkey + {OFFSET} AS o_orderkey,
                   o_custkey + {OFFSET} AS o_custkey,
                   o_orderstatus, o_totalprice + 0.013 AS o_totalprice,
                   o_orderdate, o_orderpriority
            FROM src
        """,
        "customer": f"""
            SELECT c_custkey + {OFFSET} AS c_custkey, c_name, c_nationkey,
                   c_acctbal + 0.017 AS c_acctbal, c_mktsegment
            FROM src
        """,
        "events": f"""
            SELECT event_id + {OFFSET} AS event_id, ts,
                   user_id + {OFFSET} AS user_id, event_type,
                   value + 0.011 AS value, props
            FROM src
        """,
        "lineitem": f"""
            SELECT l_orderkey + {OFFSET} AS l_orderkey, l_partkey, l_suppkey,
                   l_linenumber, l_quantity,
                   l_extendedprice + 0.01 AS l_extendedprice,
                   l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
            FROM src
        """,
        "part": None,  # catalog: verbatim copy, no doubling
    }
    order_by = {
        "documents": "doc_id",
        "orders": "o_orderkey",
        "customer": "c_custkey",
        "events": "ts, event_id",
        "lineitem": "l_orderkey, l_linenumber",
        "part": "p_partkey",
    }
    for table, copy_sql in copies.items():
        con.execute(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{table}.parquet'")
        body = "SELECT * FROM src" if copy_sql is None else (
            f"SELECT * FROM src UNION ALL {copy_sql}"
        )
        out = os.path.join(OUT, f"{table}.parquet")
        con.execute(
            f"COPY (SELECT * FROM ({body}) ORDER BY {order_by[table]}) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        n_src = con.execute("SELECT count(*) FROM src").fetchone()[0]
        n_out = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n_src} -> {n_out} rows ({out})")


if __name__ == "__main__":
    import sys

    if "--x4-facts" in sys.argv[1:]:
        make_x4_facts()
    else:
        main()
        make_x4_facts()
