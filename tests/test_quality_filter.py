"""Gates for the learned quality filter (ml/quality_filter.py):
the weak-supervision loop must (a) label sanely, (b) train a scorer
whose held-out ranking generalizes to the TRUE planted labels — not
just echo the rule gate, and (c) score JVM-only."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from databeats_spark.ml.quality_filter import (
    QualityFilter,
    train_quality_filter,
    weak_quality_labels,
)

GOOD_WORDS = (
    "the a of and to in data table value stream merge window batch sort "
    "query part order customer line scan join group filter column vector"
).split()
BAD_TOKENS = ["!!!", "$$$", "xxxxxxxxxxxxxxxxxxxx", "@@", "1!1!1!", "#spam#"]


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(11)
    rows = []
    for i in range(400):
        if i % 2 == 0:  # clean: plausible token lengths, stopwords present
            words = [rng.choice(GOOD_WORDS) for _ in range(rng.randint(30, 60))]
            rows.append((i, " ".join(words), 1))
        else:  # junk: punctuation spam, implausible token shapes
            words = [rng.choice(BAD_TOKENS) for _ in range(rng.randint(10, 30))]
            rows.append((i, " ".join(words), 0))
    return spark.createDataFrame(rows, "doc_id long, text string, gold int").cache()


def test_weak_labels_track_planted_truth(planted):
    lab = weak_quality_labels(planted).select("gold", "label").toPandas()
    agree = (lab["gold"] == lab["label"].astype(int)).mean()
    assert agree >= 0.9, f"rule gate no longer separates the planted corpus: {agree}"


@pytest.fixture(scope="module")
def fitted(planted) -> QualityFilter:
    return train_quality_filter(planted, seed=7)


def test_learned_scorer_generalizes_to_gold(planted, fitted):
    assert fitted.heldout_auc >= 0.9
    scored = fitted.score(planted).join(planted.select("doc_id", "gold"), "doc_id")
    pdf = scored.toPandas()
    good = pdf[pdf.gold == 1]["p_good"]
    bad = pdf[pdf.gold == 0]["p_good"]
    # Mann-Whitney-style check: almost every good doc outranks almost
    # every bad doc under the LEARNED score
    auc = (good.values[:, None] > bad.values[None, :]).mean()
    assert auc >= 0.95, f"learned score does not rank gold labels: {auc}"
    assert pdf["p_good"].between(0, 1).all()


def test_scoring_is_jvm_only_and_deciles_bounded(planted, fitted):
    plan = fitted.score(planted)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    rep = fitted.decile_report(planted).toPandas()
    assert rep["decile"].between(0, 9).all()
    assert rep["n_docs"].sum() == 400
