"""The semantic no-op LIMIT bounds must never actually bind (ADVICE r9).

Several queries carry an explicit ``.limit(<CAP>)`` on a
bounded-by-construction relation purely so the plan lint can PROVE the
bound (CLAUDE.md plan-lint invariant). Those caps are chosen far above
the real catalog cardinalities; if data growth ever made one bind,
Spark would silently drop nondeterministic rows that the DuckDB oracle
keeps — a confusing differential mismatch instead of a loud failure.
These pins make growth loud: each cap must stay >= 1.5x the actual
cardinality at every committed scale factor (the tightest pair today is
KMV_SRC_CAP=32 over 20 sources, 1.6x; days 30/4096 and segments 5/32
are far looser).
"""

from __future__ import annotations

import pytest

from databeats_spark.registry.audits import SEG_CAP
from databeats_spark.registry.corpus import KMV_SRC_CAP, VOCAB_SRC_CAP
from databeats_spark.registry.events import SEQ_DAY_CAP
from databeats_spark.registry.inference import BH_MAX_TESTS

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


def _has_headroom(n: int, cap: int) -> bool:
    return 2 * n * 3 <= 2 * cap * 2  # n * 1.5 <= cap, integer-exact


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_caps_have_headroom(sf_dir, duck):
    n_days = duck.execute(
        f"SELECT count(DISTINCT CAST(ts AS DATE)) FROM '{sf_dir}/events.parquet'"
    ).fetchone()[0]
    n_sources = duck.execute(
        f"SELECT count(DISTINCT source) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    n_segments = duck.execute(
        f"SELECT count(DISTINCT c_mktsegment) FROM '{sf_dir}/customer.parquet'"
    ).fetchone()[0]
    assert _has_headroom(n_days, SEQ_DAY_CAP), (
        f"{sf_dir}: {n_days} event days approaches SEQ_DAY_CAP={SEQ_DAY_CAP}"
    )
    assert _has_headroom(n_sources, VOCAB_SRC_CAP), (
        f"{sf_dir}: {n_sources} sources approaches VOCAB_SRC_CAP={VOCAB_SRC_CAP}"
    )
    assert _has_headroom(n_sources, KMV_SRC_CAP), (
        f"{sf_dir}: {n_sources} sources approaches KMV_SRC_CAP={KMV_SRC_CAP}"
    )
    assert _has_headroom(n_segments, SEG_CAP), (
        f"{sf_dir}: {n_segments} segments approaches SEG_CAP={SEG_CAP}"
    )
    # bh_fdr_discoveries' .limit(BH_MAX_TESTS) has NO matching cap in
    # its DuckDB oracle — if the brand catalog ever grew past the cap
    # the engines would desync by arbitrary truncation (ADVICE r11).
    n_brands = duck.execute(
        f"SELECT count(DISTINCT p_brand) FROM '{sf_dir}/part.parquet'"
    ).fetchone()[0]
    assert _has_headroom(n_brands, BH_MAX_TESTS), (
        f"{sf_dir}: {n_brands} brands approaches BH_MAX_TESTS={BH_MAX_TESTS}"
    )
