"""Streaming DSIR gate: fit-once/score-stream must reproduce the batch
registry query on the fitted corpus, and score genuinely UNSEEN
documents sensibly (target-like text scores above off-target text)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_stream_scores_match_batch_query_on_fitted_corpus(spark, tmp_path):
    from databeats_spark.registry import queries
    from databeats_spark.sources.tables import load_tables
    from databeats_spark.streaming.dsir_gate import fit_dsir, run_dsir_gate

    docs = load_tables(spark, SF_SMOKE, ["documents"]).documents
    model = fit_dsir(docs)
    src = str(tmp_path / "docs")
    docs.coalesce(1).write.parquet(src)
    got = (
        run_dsir_gate(spark, src, model, query_name="dsir_gate_a")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    expect = queries()["dsir_importance_weights"](spark, SF_SMOKE).toPandas()
    assert list(got["doc_id"]) == list(expect["doc_id"])
    assert list(got["n_feat"]) == list(expect["n_feat"])
    assert list(got["log_ir"]) == list(expect["log_ir"])  # bit-equal rounds


def test_gate_ranks_unseen_docs_by_target_likeness(spark):
    """Fully controlled fit corpus: target docs speak 'good*', the
    rest speak 'bad*'. Unseen docs at score time must rank
    target-like > gibberish > off-target, with the gibberish score
    NEAR zero (its features are mostly both-absent = zero evidence;
    the residual is deterministic md5 bucket collisions with occupied
    buckets, ~12% of features at B=1024). Without the both-absent
    guard every OOV feature scores ln((n_r+B)/(n_t+B)) > 0 and pure
    gibberish outranks target text — the pathology this pins away."""
    from databeats_spark.registry.signals import DSIR_TARGET_LANG
    from databeats_spark.streaming.dsir_gate import dsir_score, fit_dsir

    fit_rows = []
    did = 0
    for lang, stem in ((DSIR_TARGET_LANG, "good"), ("zz", "bad")):
        for d in range(20):
            text = " ".join(f"{stem}{i}" for i in range(15))
            fit_rows.append((did, text, lang, "ref", len(text)))
            did += 1
    ref = spark.createDataFrame(
        fit_rows,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    model = fit_dsir(ref)
    unseen = spark.createDataFrame(
        [
            (900001, " ".join(f"good{i}" for i in range(15)), "xx", "new", 80),
            (900002, " ".join(f"zq{i}x" for i in range(15)), "xx", "new", 80),
            (900003, " ".join(f"bad{i}" for i in range(15)), "xx", "new", 80),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got = dsir_score(unseen, model).toPandas().set_index("doc_id")
    good, gib, bad = (got.loc[i, "log_ir"] for i in (900001, 900002, 900003))
    assert good > 0.0 > bad
    assert good > gib > bad
    # no-evidence stays NEAR zero: collision residue only, far inside
    # the full-evidence magnitudes on either side
    assert abs(gib) < abs(bad) / 3.0
    assert abs(gib) < good
