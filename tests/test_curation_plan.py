"""End-to-end curation plan: monotone stage funnel + determinism +
stage semantics on the smoke corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from databeats_spark.plans.curation import curate_corpus, curation_report
from tests.conftest import SF_SMOKE


def test_funnel_is_monotone_and_nonempty(spark):
    report = curation_report(spark, SF_SMOKE, token_budget=20_000).collect()
    counts = [r["n_docs"] for r in sorted(report, key=lambda r: r["stage_idx"])]
    assert counts[0] > 0 and counts[-1] > 0
    assert counts == sorted(counts, reverse=True) or all(
        a >= b for a, b in zip(counts, counts[1:])
    ), f"stage counts must never grow: {counts}"


def test_curation_is_deterministic(spark):
    a = curate_corpus(spark, SF_SMOKE, token_budget=20_000)["budget"]
    b = curate_corpus(spark, SF_SMOKE, token_budget=20_000)["budget"]
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b and len(ids_a) > 0


def test_stage_semantics(spark):
    stages = curate_corpus(spark, SF_SMOKE, token_budget=20_000)
    # quality gate: every survivor is inside the token band
    q = stages["quality"].select("n_tok").toPandas()
    assert q["n_tok"].between(40, 5000).all()
    # decontam: no eval docs (doc_id % 20 == 0) survive
    d = stages["decontam"].select("doc_id").toPandas()
    assert (d["doc_id"] % 20 != 0).all()
    # budget: total tokens within the budget
    total = stages["budget"].agg(F.sum("n_tok").alias("t")).collect()[0]["t"]
    assert total <= 20_000
    # schema carries the original columns plus the token count
    assert {"doc_id", "text", "lang", "source", "n_tok"} <= set(stages["budget"].columns)
