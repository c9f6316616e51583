"""Cross-query invariants for the r5 corpus-audit batch — the
oracle differential (test_differential) proves engine parity; these
prove the queries are consistent with EACH OTHER and with the
operators they reuse."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from databeats_spark.operators.graph import connected_components, dedup_keep_best
from tests.conftest import SF_SMOKE

SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda p: p[0] != p[1]),
        min_size=0,
        max_size=12,
    ),
    quality=st.lists(st.integers(0, 100), min_size=10, max_size=10),
)
@settings(**SETTINGS)
def test_dedup_keep_best_picks_max_quality_per_component(spark, edges, quality):
    rows = spark.createDataFrame(
        [(i, q) for i, q in enumerate(quality)], "id: long, q: long"
    )
    comps = connected_components(
        spark.createDataFrame(edges, "src: long, dst: long")
        if edges
        else spark.createDataFrame([], "src: long, dst: long")
    )
    kept = dedup_keep_best(rows, comps, "id", [F.col("q").desc(), F.col("id").asc()])
    got = {r["id"] for r in kept.collect()}

    comp_of = {r["node"]: r["component"] for r in comps.collect()}
    clusters: dict[int, list[int]] = {}
    for i in range(10):
        clusters.setdefault(comp_of.get(i, i), []).append(i)
    want = {
        min(members, key=lambda i: (-quality[i], i)) for members in clusters.values()
    }
    assert got == want


def test_threshold_sweep_is_consistent_with_near_dup_pairs(spark):
    """The bands at or above 0.5 must sum to exactly near_dup_pairs's
    row count: floor(j*20) >= 10 iff j >= 0.5, same slice, same
    shingle definition."""
    from databeats_spark.registry import queries

    sweep = queries()["near_dup_threshold_sweep"](spark, SF_SMOKE).toPandas()
    pairs = queries()["near_dup_pairs"](spark, SF_SMOKE).toPandas()
    assert sweep[sweep.band >= 10].n_pairs.sum() == len(pairs)
    # band bounds actually bound the band's observed jaccard range
    assert (sweep.min_jaccard >= sweep.band_lo - 1e-9).all()
    assert (sweep.max_jaccard < sweep.band_lo + 0.05 + 1e-9).all()


def test_split_leakage_is_the_cross_split_subset_of_near_dup_pairs(spark):
    from databeats_spark.registry import queries

    leak = queries()["split_leakage_pairs"](spark, SF_SMOKE).toPandas()
    pairs = queries()["near_dup_pairs"](spark, SF_SMOKE).toPandas()

    def split(doc_id: int) -> str:
        return "train" if hashlib.md5(str(doc_id).encode()).hexdigest()[:4] < "8000" else "val"

    want = {
        (a, b)
        for a, b in zip(pairs.id_a, pairs.id_b)
        if split(a) != split(b)
    }
    assert set(zip(leak.id_a, leak.id_b)) == want
    for r in leak.itertuples():
        assert r.split_a == split(r.id_a) and r.split_b == split(r.id_b)
        assert r.split_a != r.split_b


def test_dup_cluster_sizes_histogram_is_internally_consistent(spark):
    from databeats_spark.registry import queries

    hist = queries()["dup_cluster_sizes"](spark, SF_SMOKE).toPandas()
    # every cluster in the histogram is a real cluster (>= 2 members)
    assert (hist.cluster_size >= 2).all()
    # n_docs is exactly cluster_size x n_clusters per band
    assert (hist.n_docs == hist.cluster_size * hist.n_clusters).all()


@given(
    caps_a=st.lists(st.integers(0, 10_000), min_size=1, max_size=8),
    caps_b=st.lists(st.integers(0, 10_000), min_size=1, max_size=8),
)
@settings(**SETTINGS)
def test_water_fill_keyed_matches_reference(spark, caps_a, caps_b):
    """_water_fill_keyed is now the ONE definition behind both
    sensitivity queries (r13 refactor) — pin its closed form directly
    against an independent Python water-filling over arbitrary cap
    vectors, per threshold partition: the capped set is exactly the
    ascending-cap prefix where cap*(remaining) < budget-prefix, capped
    sources take their cap, the rest share one level, and the total
    equals the BIGINT budget (never all-capped while budget < total)."""
    from pyspark.sql import functions as F

    from databeats_spark.registry.audits import (
        BUDGET_FRACTION_DEN,
        BUDGET_FRACTION_NUM,
        _water_fill_keyed,
    )

    rows = [
        (t, f"s{i}", int(c))
        for t, caps in ((0.0, caps_a), (1.0, caps_b))
        for i, c in enumerate(caps)
    ]
    per = spark.createDataFrame(rows, "threshold double, source string, cap_tokens long")
    scal, allocated = _water_fill_keyed(per)
    got = (
        scal.select("threshold", "source", "cap_tokens", "is_capped",
                    allocated.alias("alloc"), "__budget")
        .toPandas()
        .sort_values(["threshold", "source"])
    )

    def reference(caps):
        total = sum(caps.values())
        budget = total * BUDGET_FRACTION_NUM // BUDGET_FRACTION_DEN
        order = sorted(caps, key=lambda s: (caps[s], s))
        n = len(order)
        capped, prefix = set(), 0
        for i, s in enumerate(order):
            # the builder's per-row test verbatim (__p is the prefix
            # over ALL preceding rows, capped or not)
            if caps[s] * (n - i) < budget - prefix:
                capped.add(s)
            prefix += caps[s]
        # the capped set must come out a contiguous ascending-cap
        # prefix (the monotonicity the builder's closed form relies on)
        assert capped == set(order[: len(capped)])
        level = (budget - sum(caps[s] for s in capped)) / (n - len(capped))
        return budget, capped, level

    for t, caps in ((0.0, caps_a), (1.0, caps_b)):
        want_budget, want_capped, want_level = reference(
            {f"s{i}": int(c) for i, c in enumerate(caps)}
        )
        g = got[got.threshold == t]
        assert (g.__budget == want_budget).all()
        assert set(g[g.is_capped].source) == want_capped
        for r in g.itertuples():
            want = float(r.cap_tokens) if r.source in want_capped else want_level
            assert abs(r.alloc - want) < 1e-9
        assert abs(g.alloc.sum() - want_budget) < 1e-6


def test_token_budget_allocation_is_exact_water_filling(spark):
    """sum(alloc) equals the budget (to rounding), no source exceeds
    its cap, capped sources are exactly the prefix in cap-ascending
    order, and every uncapped source gets the same level."""
    from databeats_spark.registry import queries
    from databeats_spark.registry.audits import (
        BUDGET_FRACTION_DEN,
        BUDGET_FRACTION_NUM,
    )

    out = queries()["token_budget_allocation"](spark, SF_SMOKE).toPandas()
    caps = dict(zip(out.source, out.cap_tokens))
    budget = int(sum(caps.values()) * BUDGET_FRACTION_NUM // BUDGET_FRACTION_DEN)
    assert abs(out.allocated_tokens.sum() - budget) < 1e-3
    assert (out.allocated_tokens <= out.cap_tokens + 1e-9).all()
    levels = out[~out.is_capped].allocated_tokens.unique()
    assert len(levels) == 1
    # capped iff cap below the shared level
    assert ((out.cap_tokens < levels[0] - 1e-9) == out.is_capped).all()
    assert abs(out.budget_share.sum() - 1.0) < 1e-4


def test_dedup_sensitivity_curve_invariants(spark):
    """The capstone's semantics beyond hash parity: (1) raising the
    threshold can only KEEP more docs (fewer pairs qualify, fewer
    losers), so kept docs are non-decreasing and dup rate
    non-increasing in t; (2) at every threshold the water-filling
    invariants of token_budget_allocation hold per partition: shares
    sum to 1, no source exceeds its cap, uncapped sources share one
    level; (3) the t=0.5 kept-count is consistent with the dominance
    rule recomputed independently from the pair list."""
    from databeats_spark.registry import queries
    from databeats_spark.registry.audits import (
        BUDGET_FRACTION_DEN,
        BUDGET_FRACTION_NUM,
    )

    out = queries()["dedup_sensitivity_curve"](spark, SF_SMOKE).toPandas()
    by_t = out.groupby("threshold")
    kept_tot = by_t.kept_docs.sum()
    assert (kept_tot.sort_index().diff().dropna() >= 0).all()
    dup_tot = by_t.apply(
        lambda g: (g.dup_rate * g.kept_docs / (1 - g.dup_rate)).sum(), include_groups=False
    )  # recovered dropped-doc count; non-increasing in t
    assert (dup_tot.sort_index().diff().dropna() <= 1e-6).all()
    for _, g in by_t:
        assert abs(g.budget_share.sum() - 1.0) < 1e-4
        assert (g.allocated_tokens <= g.cap_tokens + 1e-9).all()
        levels = g[~g.is_capped].allocated_tokens.unique()
        assert len(levels) == 1
        budget = int(g.cap_tokens.sum() * BUDGET_FRACTION_NUM // BUDGET_FRACTION_DEN)
        assert abs(g.allocated_tokens.sum() - budget) < 1e-3

    # independent recomputation of the dominance dedup at t=0.5
    from databeats_spark.operators.dedup import ngram_jaccard_pairs
    from databeats_spark.registry.documents import PAIR_DOC_LIMIT
    from databeats_spark.sources.tables import load_tables
    from pyspark.sql import functions as F

    docs = (
        load_tables(spark, SF_SMOKE, ["documents"])
        .documents.filter(F.col("doc_id") < PAIR_DOC_LIMIT)
        .select("doc_id", "n_chars")
        .toPandas()
    )
    pairs = ngram_jaccard_pairs(
        load_tables(spark, SF_SMOKE, ["documents"]).documents.filter(
            F.col("doc_id") < PAIR_DOC_LIMIT
        ),
        "doc_id",
        "text",
        n=3,
        threshold=0.5,
    ).toPandas()
    chars = dict(zip(docs.doc_id, docs.n_chars))
    losers = {
        (int(r.id_b) if (chars[r.id_a], -r.id_a) > (chars[r.id_b], -r.id_b) else int(r.id_a))
        for r in pairs.itertuples()
    }
    expected_kept = len(docs) - len(losers)
    assert kept_tot.loc[0.5] == expected_kept


def test_lsh_parameter_audit_invariants(spark):
    """The banding planner's semantics beyond hash parity: (1) its
    (band, n_pairs) histogram is exactly near_dup_threshold_sweep's
    (same slice, same shingles); (2) detect_prob matches the S-curve
    1-(1-j^r)^b recomputed independently in numpy at the band
    midpoint, and expected_caught = n_pairs * p; (3) the knob
    tradeoff: along constant b*r=16, increasing rows-per-band can
    only LOWER detection at every band (false-candidate load above
    the tier threshold 0.5 and recall both shrink monotonically)."""
    import numpy as np

    from databeats_spark.registry import queries
    from databeats_spark.registry.audits import LSH_CONFIGS

    out = queries()["lsh_parameter_audit"](spark, SF_SMOKE).toPandas()
    sweep = queries()["near_dup_threshold_sweep"](spark, SF_SMOKE).toPandas()

    hist = out[["band", "n_pairs"]].drop_duplicates().set_index("band").n_pairs
    want = sweep.set_index("band").n_pairs
    assert hist.sort_index().equals(want.sort_index())

    jm = np.minimum((out.band.values + 0.5) / 20.0, 1.0)
    p = 1.0 - (1.0 - jm ** out.rows_per_band.values) ** out.bands.values
    assert np.allclose(out.detect_prob.values, p, atol=1e-6)
    assert np.allclose(
        out.expected_caught.values, out.n_pairs.values * p, atol=1e-5
    )

    # monotone knob: for fixed b*r, more rows per band => lower p
    assert all(b * r == 16 for b, r in LSH_CONFIGS)
    piv = out.pivot(index="band", columns="rows_per_band", values="detect_prob")
    cols = sorted(piv.columns)
    for lo, hi in zip(cols, cols[1:]):
        assert (piv[hi] <= piv[lo] + 1e-9).all()


def test_dedup_sensitivity_delta_invariants(spark):
    """The r13 CDC capstone's semantics beyond hash parity: (1) raising
    the threshold shrinks the loser set, so total new docs kept is
    non-decreasing and old docs displaced non-increasing in t; (2) the
    pre-ingest baseline share recovered as budget_share - share_delta
    is one constant per source across thresholds and sums to 1 (it is
    a water-filling share itself); (3) per threshold the water-filling
    invariants hold; (4) the t=0.5 totals match an independent
    recomputation from the FULL pair list with old x old pairs dropped
    in plain Python — pinning that the builder's join-side restriction
    implements exactly the CDC contract."""
    from databeats_spark.registry import queries
    from databeats_spark.registry.audits import (
        BUDGET_FRACTION_DEN,
        BUDGET_FRACTION_NUM,
        SENS_DELTA_SPLIT,
    )

    out = queries()["dedup_sensitivity_delta"](spark, SF_SMOKE).toPandas()
    by_t = out.groupby("threshold")
    kept = by_t.new_kept_docs.sum().sort_index()
    displ = by_t.old_displaced_docs.sum().sort_index()
    assert (kept.diff().dropna() >= 0).all()
    assert (displ.diff().dropna() <= 0).all()
    assert (out.delta_docs == out.new_kept_docs - out.old_displaced_docs).all()

    base_share = out.budget_share - out.share_delta
    per_source = out.assign(b=base_share).groupby("source").b.nunique()
    assert (per_source == 1).all(), "baseline share must not vary with t"
    for _, g in by_t:
        assert abs(g.budget_share.sum() - 1.0) < 1e-4
        assert abs((g.budget_share - g.share_delta).sum() - 1.0) < 1e-4
        assert (g.allocated_tokens <= g.cap_tokens + 1e-9).all()
        levels = g[~g.is_capped].allocated_tokens.unique()
        assert len(levels) == 1
        budget = int(g.cap_tokens.sum() * BUDGET_FRACTION_NUM // BUDGET_FRACTION_DEN)
        assert abs(g.allocated_tokens.sum() - budget) < 1e-3

    # independent CDC recomputation at t=0.5: full pair list, then drop
    # old x old in Python — must agree with the builder's structural
    # join-side exclusion
    from databeats_spark.operators.dedup import ngram_jaccard_pairs
    from databeats_spark.registry.documents import PAIR_DOC_LIMIT
    from databeats_spark.sources.tables import load_tables
    from pyspark.sql import functions as F

    docs = (
        load_tables(spark, SF_SMOKE, ["documents"])
        .documents.filter(F.col("doc_id") < PAIR_DOC_LIMIT)
        .select("doc_id", "n_chars")
        .toPandas()
    )
    pairs = ngram_jaccard_pairs(
        load_tables(spark, SF_SMOKE, ["documents"]).documents.filter(
            F.col("doc_id") < PAIR_DOC_LIMIT
        ),
        "doc_id",
        "text",
        n=3,
        threshold=0.5,
    ).toPandas()
    chars = dict(zip(docs.doc_id, docs.n_chars))
    losers = {
        (int(r.id_b) if (chars[r.id_a], -r.id_a) > (chars[r.id_b], -r.id_b) else int(r.id_a))
        for r in pairs.itertuples()
        if r.id_a >= SENS_DELTA_SPLIT or r.id_b >= SENS_DELTA_SPLIT
    }
    new_ids = {int(d) for d in docs.doc_id if d >= SENS_DELTA_SPLIT}
    old_ids = {int(d) for d in docs.doc_id if d < SENS_DELTA_SPLIT}
    assert kept.loc[0.5] == len(new_ids - losers)
    assert displ.loc[0.5] == len(old_ids & losers)


def test_canonical_best_keeps_no_fewer_and_no_shorter_than_min_id_policy(spark):
    """Both survivor policies keep exactly one doc per cluster plus all
    singletons — same cardinality — and the best-policy survivor set's
    total n_chars is >= the min-id policy's (it keeps the longest)."""
    from databeats_spark.registry import queries

    best = queries()["canonical_best_docs"](spark, SF_SMOKE).toPandas()
    minid = queries()["canonical_docs"](spark, SF_SMOKE).toPandas()
    assert len(best) == len(minid)
    assert best.n_chars.sum() >= minid.n_chars.sum()


def test_temperature_mix_invariants(spark):
    """Shares sum to 1 on both axes; alpha<1 smoothing must boost
    every below-average source and damp the largest one."""
    from databeats_spark.registry import queries

    pdf = queries()["temperature_mix_allocation"](spark, SF_SMOKE).toPandas()
    assert abs(pdf["raw_share"].sum() - 1.0) < 1e-4
    assert abs(pdf["temp_share"].sum() - 1.0) < 1e-4
    biggest = pdf.loc[pdf["n_tok"].idxmax()]
    smallest = pdf.loc[pdf["n_tok"].idxmin()]
    assert biggest["boost"] <= 1.0 <= smallest["boost"]
    # smoothing preserves order: more tokens never means smaller share
    by_tok = pdf.sort_values("n_tok")
    assert by_tok["temp_share"].is_monotonic_increasing


def test_novelty_and_scrub_are_consistent(spark):
    """ngram_novelty and substring_scrub_stats bound each other's
    domains: rates live in (0, 1]; every gram/token total is positive;
    the scrubbed tokens can never exceed the source's total."""
    from databeats_spark.registry import queries

    q = queries()
    nov = q["ngram_novelty"](spark, SF_SMOKE).toPandas()
    assert (nov["n_novel"] <= nov["n_grams"]).all()
    assert ((nov["novelty_rate"] > 0) & (nov["novelty_rate"] <= 1)).all()
    # corpus-wide, novel grams = distinct grams: every distinct gram is
    # novel in exactly the doc that introduces it
    scrub = q["substring_scrub_stats"](spark, SF_SMOKE).toPandas()
    assert (scrub["removed_tokens"] <= scrub["total_tokens"]).all()
    assert ((scrub["kept_frac"] > 0) & (scrub["kept_frac"] <= 1)).all()
    # the scrub keeps strictly less than spans-only accounting removes:
    # sanity that SOME duplication exists in the planted corpus
    assert scrub["removed_tokens"].sum() > 0


def test_t_closeness_emd_matches_numpy_rederivation(spark):
    """The BIGINT-numerator EMD must equal an independent float
    re-derivation (pandas/numpy over the raw parquet): per QI group,
    EMD = sum_j |cumsum_j(p - q)| / (m-1); the registry reports the
    per-segment max. Also pins the closed-form bounds: EMD in [0, 1]
    and weak_groups <= n_groups."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries

    out = queries()["t_closeness_audit"](spark, SF_SMOKE).toPandas()
    assert ((out["max_t"] >= 0) & (out["max_t"] <= 1)).all()
    assert (out["weak_groups"] <= out["n_groups"]).all()

    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    j = cust.merge(orders, left_on="c_custkey", right_on="o_custkey")
    j["bal_band"] = (np.floor(j["c_acctbal"]).astype("int64") + 1000) // 1000
    doms = sorted(orders["o_orderpriority"].unique())
    cells = (
        j.groupby(["c_nationkey", "c_mktsegment", "bal_band"])["o_orderpriority"]
        .value_counts()
        .unstack(fill_value=0)
        .reindex(columns=doms, fill_value=0)
    )
    q = cells.sum(axis=0) / cells.values.sum()
    p = cells.div(cells.sum(axis=1), axis=0)
    emd = np.abs(np.cumsum(p.values - q.values[None, :], axis=1)[:, :-1]).sum(
        axis=1
    ) / (len(doms) - 1)
    ref = (
        pd.DataFrame(
            {"mktsegment": cells.index.get_level_values("c_mktsegment"), "t": emd}
        )
        .groupby("mktsegment")["t"]
        .max()
    )
    got = dict(zip(out["mktsegment"], out["max_t"]))
    for seg, t_ref in ref.items():
        assert abs(got[seg] - t_ref) < 1e-6, (seg, got[seg], t_ref)


def test_dp_noisy_histogram_mechanism_consistency(spark):
    """noisy_count - noise must recover the exact true cell count
    (pandas re-count of the raw parquet); the seeded noise is
    deterministic across runs, non-constant across cells, and its
    mean |noise| sits in a broad band around the Laplace scale b=1."""
    import pandas as pd

    from databeats_spark.registry import queries

    out = queries()["dp_noisy_histogram"](spark, SF_SMOKE).toPandas()
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    true = (
        cust.groupby(["c_nationkey", "c_mktsegment"])
        .size()
        .rename("n")
        .reset_index()
    )
    merged = out.merge(
        true,
        left_on=["nationkey", "mktsegment"],
        right_on=["c_nationkey", "c_mktsegment"],
    )
    assert len(merged) == len(out) == len(true)
    # round-6 reporting: the recovered count is within 2e-6 of integer
    recovered = merged["noisy_count"] - merged["noise"]
    assert (abs(recovered - merged["n"]) < 2e-6).all()
    assert out["noise"].nunique() > len(out) // 2  # seeded per cell, not constant
    mean_abs = out["noise"].abs().mean()
    assert 0.3 < mean_abs < 3.0, mean_abs  # Laplace b=1: E|noise| = 1
    again = queries()["dp_noisy_histogram"](spark, SF_SMOKE).toPandas()
    pd.testing.assert_frame_equal(out, again)


def test_semantic_decontam_matches_numpy_brute_force(spark):
    """The flagged set must equal an independent numpy brute force:
    for every corpus vector, count eval vectors (vec_id < SEM_EVAL_N)
    with cosine >= threshold and take the max — same rows, same
    counts, same max_cos to 1e-6."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.vectors import SEM_DECON_THRESHOLD, SEM_EVAL_N

    out = queries()["semantic_decontam"](spark, SF_SMOKE).toPandas()
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    ev, cp = vecs[ids < SEM_EVAL_N], vecs[ids >= SEM_EVAL_N]
    cp_ids = ids[ids >= SEM_EVAL_N]
    sims = (cp / np.linalg.norm(cp, axis=1, keepdims=True)) @ (
        ev / np.linalg.norm(ev, axis=1, keepdims=True)
    ).T
    hit = sims >= SEM_DECON_THRESHOLD
    flagged = {
        int(cp_ids[i]): (int(hit[i].sum()), float(sims[i][hit[i]].max()))
        for i in range(len(cp_ids))
        if hit[i].any()
    }
    assert set(out["vec_id"]) == set(flagged)
    for _, row in out.iterrows():
        n_ref, max_ref = flagged[int(row["vec_id"])]
        assert int(row["n_eval_hits"]) == n_ref
        assert abs(row["max_cos"] - max_ref) < 1e-6


def test_takedown_blast_radius_partitions_the_canonical_set(spark):
    """Every cluster canonical belongs to exactly one source, so
    sum(n_canonical_lost) across sources must equal the number of
    canonical survivors canonical_docs keeps; per source,
    lost = reelected + dissolved, and nothing exceeds n_docs."""
    from databeats_spark.registry import queries

    q = queries()
    out = q["takedown_blast_radius"](spark, SF_SMOKE).toPandas()
    keep = q["canonical_docs"](spark, SF_SMOKE).toPandas()
    assert out["n_canonical_lost"].sum() == len(keep)
    assert (out["n_canonical_lost"] == out["n_reelected"] + out["n_dissolved"]).all()
    assert (out["n_canonical_lost"] <= out["n_docs"]).all()
    assert out["n_docs"].sum() >= len(keep)


def test_lang_label_noise_is_the_lang_id_rollup(spark):
    """The per-language noise rates must be exactly the groupby of the
    per-doc lang_id disagreement column — the two queries share the
    certified guess expression, so any drift is a refactor bug."""
    from databeats_spark.registry import queries

    q = queries()
    per_doc = q["lang_id"](spark, SF_SMOKE).toPandas()
    roll = q["lang_label_noise"](spark, SF_SMOKE).toPandas()
    per_doc["dis"] = per_doc["lang_guess"] != per_doc["labeled_lang"]
    ref = per_doc.groupby("labeled_lang")["dis"].agg(["count", "sum"])
    got = roll.set_index("labeled_lang")
    assert got["n_docs"].to_dict() == ref["count"].to_dict()
    assert got["n_disagree"].to_dict() == ref["sum"].to_dict()


def test_session_transcripts_agree_with_sessionization(spark):
    """Transcript turn counts must be internally consistent (token
    count == n_turns) and the per-user count of >=MIN_TURNS sessions
    can never exceed sessionization's total session count."""
    from databeats_spark.registry import queries
    from databeats_spark.registry.events import MIN_TURNS

    q = queries()
    tr = q["session_transcripts"](spark, SF_SMOKE).toPandas()
    assert (tr["n_turns"] >= MIN_TURNS).all()
    assert (tr["transcript"].str.split(" ").str.len() == tr["n_turns"]).all()
    assert (tr["duration_us"] >= 0).all()
    sess = q["sessionization"](spark, SF_SMOKE).toPandas().set_index("user_id")
    per_user = tr.groupby("user_id").size()
    for uid, n in per_user.items():
        assert n <= sess.loc[uid, "n_sessions"]


def test_ann_recall_audit_is_the_topk_set_intersection(spark):
    """hits/k must equal the literal intersection of the exact and
    IVF-probe top-k neighbor sets per query — the audit is pure set
    arithmetic over the two pipelines it reuses, so any drift means
    the recall harness no longer measures the index it claims to."""
    from databeats_spark.registry import queries
    from databeats_spark.registry.vectors import TOP_K

    q = queries()
    exact = q["cosine_topk"](spark, SF_SMOKE).toPandas()
    approx = q["ivf_cosine_topk_exact"](spark, SF_SMOKE).toPandas()
    audit = q["ann_recall_audit"](spark, SF_SMOKE).toPandas().set_index("query_id")
    assert len(audit) == exact["query_id"].nunique()
    for qid, grp in exact.groupby("query_id"):
        e = set(grp["neighbor_id"])
        a = set(approx.loc[approx["query_id"] == qid, "neighbor_id"])
        row = audit.loc[qid]
        assert row["k"] == len(e) == TOP_K
        assert row["hits"] == len(e & a)
        assert abs(row["recall"] - len(e & a) / len(e)) <= 1e-6
    assert ((audit["recall"] >= 0) & (audit["recall"] <= 1)).all()


def test_embedding_isotropy_matches_numpy(spark):
    """Per-label norm dispersion and cosine-to-global-centroid must
    match an independent numpy brute force (centroid rounded to 6 as
    the dual-engine recipe does) — the collapse detector's arithmetic
    is certified end to end, not just engine-agreed."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries

    out = (
        queries()["embedding_isotropy_audit"](spark, SF_SMOKE)
        .toPandas()
        .set_index("label")
    )
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    vecs = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    labels = emb["label"].to_numpy()
    c = np.round(vecs.mean(axis=0), 6)
    norms = np.linalg.norm(vecs, axis=1)
    cos = (vecs @ c) / (norms * np.linalg.norm(c))
    assert len(out) == len(np.unique(labels))
    for lab in np.unique(labels):
        m = labels == lab
        row = out.loc[int(lab)]
        assert row["n_vecs"] == m.sum()
        assert abs(row["mean_norm"] - norms[m].mean()) < 1e-5
        assert abs(row["sd_norm"] - norms[m].std()) < 1e-5
        assert abs(row["mean_cos_centroid"] - cos[m].mean()) < 1e-5
        assert abs(row["min_cos_centroid"] - cos[m].min()) < 1e-5


def test_normalized_dedup_delta_matches_pandas_brute_force(spark):
    """Per-source raw/normalized dup counts must match an independent
    pandas replica using the SAME explicit whitespace class the two
    engines share — certifying the normalization arithmetic, not just
    engine agreement."""
    import re

    import pandas as pd

    from databeats_spark.registry import queries

    out = (
        queries()["normalized_dedup_delta"](spark, SF_SMOKE)
        .toPandas()
        .set_index("source")
    )
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    strip = re.compile(r"[^a-z0-9 \t\n\r\f]")
    ws = re.compile(r"[ \t\n\r\f]+")
    norm = docs["text"].str.lower().map(lambda s: ws.sub(" ", strip.sub("", s)).strip())
    raw_dup = docs["text"].map(docs["text"].value_counts()) > 1
    norm_dup = norm.map(norm.value_counts()) > 1
    ref = pd.DataFrame(
        {"source": docs["source"], "raw": raw_dup, "norm": norm_dup}
    ).groupby("source")
    assert out["n_docs"].to_dict() == ref.size().to_dict()
    assert out["raw_dup_docs"].to_dict() == ref["raw"].sum().to_dict()
    assert out["norm_dup_docs"].to_dict() == ref["norm"].sum().to_dict()
    assert (out["masked_dup_docs"] >= 0).all()
    assert (out["norm_dup_docs"] >= out["raw_dup_docs"]).all()


def test_dedup_upsample_weights_conserve_distinct_mass(spark):
    """1/cluster-size weighting makes every distinct text count exactly
    once corpus-wide: sum(eff_docs) == |distinct texts| == the row
    count dedup_exact_docs keeps, and inflation is never below 1."""
    import pandas as pd

    from databeats_spark.registry import queries

    q = queries()
    out = q["dedup_upsample_weights"](spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    n_distinct = docs["text"].nunique()
    assert abs(out["eff_docs"].sum() - n_distinct) < 1e-3
    assert len(q["dedup_exact_docs"](spark, SF_SMOKE).toPandas()) == n_distinct
    assert (out["n_docs"] >= out["eff_docs"] - 1e-9).all()
    assert (out["dup_inflation"] >= 1 - 1e-9).all()
    assert (out["n_chars"] >= out["eff_chars"] - 1e-9).all()


def test_bpe_fertility_conserves_segmentation_mass(spark):
    """The per-language fertility rollup and the corpus-global
    segmentation histogram are two views of the SAME vocabulary apply:
    total word occurrences and total pieces must agree exactly, and
    fertility can never drop below 1 (every word is >=1 piece)."""
    from databeats_spark.registry import queries

    q = queries()
    fert = q["bpe_fertility_by_lang"](spark, SF_SMOKE).toPandas()
    hist = q["bpe_segmentation"](spark, SF_SMOKE).toPandas()
    assert fert["n_words"].sum() == hist["total_tokens"].sum()
    assert fert["n_tokens"].sum() == (hist["n_pieces"] * hist["total_tokens"]).sum()
    assert (fert["fertility"] >= 1).all()


def test_zorder_chunks_bound_both_dimensions(spark):
    """Structural guarantees of the layouts: a Z-chunk is a 2^7 x 2^7
    block so BOTH average spans stay <= 127; the custkey-major linear
    layout pins custkey per chunk (span 0, since the day offset never
    reaches the 2^14 chunk width) but lets the date span the
    customer's whole history — the measured pruning asymmetry."""
    from databeats_spark.registry import queries

    out = (
        queries()["zorder_locality_audit"](spark, SF_SMOKE)
        .toPandas()
        .set_index("layout")
    )
    z, lin = out.loc["zorder"], out.loc["linear"]
    assert z["n_rows"] == lin["n_rows"]
    assert z["avg_span_custkey"] <= 127 and z["avg_span_days"] <= 127
    assert lin["avg_span_custkey"] == 0
    assert lin["avg_span_days"] > z["avg_span_days"]


def test_lang_id_kappa_matches_numpy_replica(spark):
    """Kappa per source must equal the chance-corrected agreement
    computed independently in pandas from the certified per-doc
    lang_id output joined back to provenance — the integer-polynomial
    shortcut in the query is exactly Cohen's formula."""
    import pandas as pd

    from databeats_spark.registry import queries

    q = queries()
    out = q["lang_id_kappa"](spark, SF_SMOKE).toPandas().set_index("source")
    per_doc = q["lang_id"](spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[["doc_id", "source"]]
    j = per_doc.merge(docs, on="doc_id")
    for src, grp in j.groupby("source"):
        n = len(grp)
        agree = int((grp["lang_guess"] == grp["labeled_lang"]).sum())
        sp = sum(
            (grp["labeled_lang"] == l).sum() * (grp["lang_guess"] == l).sum()
            for l in set(grp["labeled_lang"]) | set(grp["lang_guess"])
        )
        row = out.loc[src]
        assert row["n_docs"] == n and row["agree"] == agree
        if n * n == sp:
            expect = 1.0 if agree == n else 0.0
        else:
            expect = (n * agree - sp) / (n * n - sp)
        assert abs(row["kappa"] - expect) <= 1e-6
        assert -1 <= row["kappa"] <= 1


def test_k_eidetic_histogram_matches_python_brute_force(spark):
    """The replication curve must match a literal Python 8-gram count
    over the same whitespace tokenization (control bytes scrubbed the
    same way) — anchors, positions and the 10+ tail band all exact."""
    import re
    from collections import Counter

    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.corpus import K_EIDETIC_CAP, MIN_MATCH_TOKENS

    out = queries()["k_eidetic_histogram"](spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    doc_sets: dict[str, set] = {}
    positions: Counter = Counter()
    for _, r in docs.iterrows():
        toks = re.split(r"\s+", re.sub(r"[\x00\x01]", " ", r["text"]).strip())
        toks = [t for t in toks if t != ""]
        if len(toks) < MIN_MATCH_TOKENS:
            continue
        for i in range(len(toks) - MIN_MATCH_TOKENS + 1):
            a = " ".join(toks[i : i + MIN_MATCH_TOKENS])
            doc_sets.setdefault(a, set()).add(r["doc_id"])
            positions[a] += 1
    hist: Counter = Counter()
    pos_hist: Counter = Counter()
    for a, ds in doc_sets.items():
        if len(ds) >= 2:
            band = min(len(ds), K_EIDETIC_CAP)
            hist[band] += 1
            pos_hist[band] += positions[a]
    got = {int(r["replication"]): (int(r["n_anchors"]), int(r["n_positions"])) for _, r in out.iterrows()}
    assert got == {b: (hist[b], pos_hist[b]) for b in hist}


def test_cuped_matches_numpy_replica(spark):
    """theta, both effects and the variance-reduction ratio must match
    an independent numpy CUPED computation over the same per-user
    pre/post split — and CUPED must actually reduce variance here
    (pre/post spend are correlated through per-user activity)."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.events import CUPED_SPLIT_TS

    out = queries()["cuped_experiment_effect"](spark, SF_SMOKE).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["v"] = ev["value"].round(2)
    split = pd.Timestamp(CUPED_SPLIT_TS)
    pre = ev[ev["ts"] < split].groupby("user_id")["v"].sum()
    post = ev[ev["ts"] >= split].groupby("user_id")["v"].sum()
    users = ev["user_id"].unique()
    x = np.array([pre.get(u, 0.0) for u in users])
    y = np.array([post.get(u, 0.0) for u in users])
    t = users % 2
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    y_adj = y - theta * (x - x.mean())
    assert out["n_users"] == len(users)
    assert abs(out["theta"] - theta) < 1e-5
    assert abs(out["raw_effect"] - (y[t == 1].mean() - y[t == 0].mean())) < 1e-4
    assert abs(out["cuped_effect"] - (y_adj[t == 1].mean() - y_adj[t == 0].mean())) < 1e-4
    assert abs(out["var_reduction"] - (1 - y_adj.var() / y.var())) < 1e-5
    assert 0 < out["var_reduction"] < 1


def test_z_interleave_round_trips(spark):
    """The DIV/% interleave polynomial must be the bijective Morton
    code: for a grid + random sample of (d1, d2) pairs evaluated
    through the SAME Spark expression the query uses, de-interleaving
    the Z value bit-by-bit in Python recovers the inputs exactly."""
    import random

    from databeats_spark.registry.modern import Z_BITS, _z_interleave_terms

    rnd = random.Random(8)
    pts = [(a, b) for a in (0, 1, 2, 4095, 2**Z_BITS - 1) for b in (0, 1, 3, 2**Z_BITS - 1)]
    pts += [(rnd.randrange(2**Z_BITS), rnd.randrange(2**Z_BITS)) for _ in range(200)]
    df = spark.createDataFrame(pts, "d1: long, d2: long")
    rows = df.selectExpr("d1", "d2", f"({_z_interleave_terms('DIV')}) AS z").collect()
    for r in rows:
        d1 = sum(((r["z"] >> (2 * b + 1)) & 1) << b for b in range(Z_BITS))
        d2 = sum(((r["z"] >> (2 * b)) & 1) << b for b in range(Z_BITS))
        assert (d1, d2) == (r["d1"], r["d2"]), r


def test_holt_forecast_matches_python_exactly(spark):
    """Dyadic alpha/beta make every Holt intermediate exactly
    representable, so the Spark fold must equal a pure-Python
    recurrence BIT-FOR-BIT (before the output round) — stronger than
    the round-6 recipe, same discipline as the LSH fold twin."""
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.signals import HOLT_ALPHA, HOLT_BETA

    out = (
        queries()["holt_linear_forecast"](spark, SF_SMOKE)
        .toPandas()
        .set_index("o_orderpriority")
    )
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    wk = pd.to_datetime(orders["o_orderdate"]).dt.to_period("W-SUN").dt.start_time
    weekly = (
        orders.assign(wk=wk)
        .groupby(["o_orderpriority", "wk"])
        .size()
        .reset_index(name="x")
    )
    for pri, grp in weekly.groupby("o_orderpriority"):
        xs = [float(v) for _, v in grp.sort_values("wk")["x"].items()]
        l, t = xs[0], 0.0
        for x in xs[1:]:
            l2 = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (l + t)
            t = HOLT_BETA * (l2 - l) + (1 - HOLT_BETA) * t
            l = l2
        row = out.loc[pri]
        assert row["n_weeks"] == len(xs)
        assert row["level"] == round(l, 6)
        assert row["trend"] == round(t, 6)
        assert row["f3"] == round(l + 3 * t, 6)


def test_did_readout_matches_numpy_and_agrees_with_cuped_shape(spark):
    """DiD must equal the four-mean identity computed independently in
    numpy over the same per-user split; the pre_gap falsification
    column stays small relative to the outcome scale for the
    deterministic user_id%2 assignment."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.events import CUPED_SPLIT_TS

    out = queries()["did_experiment_effect"](spark, SF_SMOKE).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["v"] = ev["value"].round(2)
    split = pd.Timestamp(CUPED_SPLIT_TS)
    pre = ev[ev["ts"] < split].groupby("user_id")["v"].sum()
    post = ev[ev["ts"] >= split].groupby("user_id")["v"].sum()
    users = ev["user_id"].unique()
    x = np.array([pre.get(u, 0.0) for u in users])
    y = np.array([post.get(u, 0.0) for u in users])
    t = users % 2
    assert out["n_treated"] == (t == 1).sum() and out["n_control"] == (t == 0).sum()
    assert abs(out["pre_gap"] - (x[t == 1].mean() - x[t == 0].mean())) < 1e-4
    assert abs(out["raw_post_effect"] - (y[t == 1].mean() - y[t == 0].mean())) < 1e-4
    did = (y[t == 1].mean() - x[t == 1].mean()) - (y[t == 0].mean() - x[t == 0].mean())
    assert abs(out["did_effect"] - did) < 1e-4
    assert abs(out["did_effect"] - (out["raw_post_effect"] - out["pre_gap"])) < 1e-5


def test_mann_whitney_matches_pandas_rank_replica(spark):
    """The prefix-sum rank recovery must equal the classic formulation:
    pandas average ranks over per-user spend, R1 -> U1, AUC,
    rank-biserial and the tie-corrected z — computed independently."""
    import math

    import pandas as pd

    from databeats_spark.registry import queries

    out = queries()["mann_whitney_effect"](spark, SF_SMOKE).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["v"] = ev["value"].round(2)
    per_user = ev.groupby("user_id")["v"].sum().round(2)
    t = per_user.index.values % 2
    ranks = per_user.rank(method="average")
    n1, n0 = int((t == 1).sum()), int((t == 0).sum())
    r1 = float(ranks[t == 1].sum())
    u1 = r1 - n1 * (n1 + 1) / 2
    assert out["n_treated"] == n1 and out["n_control"] == n0
    assert out["two_u"] == round(2 * u1)
    assert abs(out["auc"] - u1 / (n1 * n0)) < 1e-6
    assert abs(out["rank_biserial"] - (2 * u1 / (n1 * n0) - 1)) < 1e-6
    n = n1 + n0
    tie = sum(c**3 - c for c in per_user.value_counts())
    var_u = n1 * n0 / 12 * ((n + 1) - tie / (n * (n - 1)))
    assert abs(out["z_stat"] - (u1 - n1 * n0 / 2) / math.sqrt(var_u)) < 1e-6


def test_srm_daily_check_matches_pandas_and_stays_calm(spark):
    """Per-day chi-square must equal the two-cell identity computed in
    pandas, and the deterministic user_id%2 split must NOT trip the
    0.05 gate on a majority of days (a designed 50/50 assignment)."""
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.events import SRM_CRIT_05

    out = queries()["srm_daily_check"](spark, SF_SMOKE).toPandas().set_index("day")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["day"] = ev["ts"].dt.strftime("%Y-%m-%d")
    for day, grp in ev.groupby("day"):
        users = grp["user_id"].unique()
        n1 = int((users % 2 == 1).sum())
        n0 = int((users % 2 == 0).sum())
        row = out.loc[day]
        assert (row["n_treated"], row["n_control"]) == (n1, n0)
        chi2 = (n1 - n0) ** 2 / (n1 + n0)
        assert abs(row["chi2"] - chi2) < 1e-6
        assert row["srm_flag"] == (chi2 > SRM_CRIT_05)
    assert (~out["srm_flag"]).mean() > 0.5


def test_cusum_changepoint_matches_numpy_brute_force(spark):
    """The interior argmax of S_k = cum_k - k*mean must equal a numpy
    scan over the same weekly series, and the before/after means must
    straddle it consistently with the decomposition identity
    n_before*mean_before + n_after*mean_after == total."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries

    out = queries()["cusum_changepoint"](spark, SF_SMOKE).toPandas().set_index("o_orderpriority")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    wk = orders["o_orderdate"].astype("datetime64[ns]")
    monday = (wk - pd.to_timedelta(wk.dt.weekday, unit="D")).dt.strftime("%Y-%m-%d")
    weekly = (
        orders.assign(wk=monday).groupby(["o_orderpriority", "wk"]).size().rename("x").reset_index()
    )
    for pri, grp in weekly.groupby("o_orderpriority"):
        g = grp.sort_values("wk")
        x = g["x"].to_numpy(dtype=np.int64)
        n, total = len(x), int(x.sum())
        cum = np.cumsum(x)
        k = np.arange(1, n + 1)
        s = cum - (k * total) / n
        interior = np.abs(s[:-1])
        best = int(np.argmax(interior))  # numpy argmax = first max = earliest-week tie-break
        row = out.loc[pri]
        assert row["n_weeks"] == n
        assert row["cp_index"] == best + 1
        assert row["cp_week"] == g["wk"].iloc[best]
        assert abs(row["cusum_peak"] - s[best]) < 1e-6
        nb, na = best + 1, n - best - 1
        assert abs(nb * row["mean_before"] + na * row["mean_after"] - total) < 1e-3


def test_dow_seasonal_decompose_identity_and_replica(spark):
    """Every defined row must satisfy x == trend + seasonal + remainder
    (to rounding), and trend must equal the pandas centered 7-day
    moving average while the seasonal component is the per-(type, dow)
    mean of the detrended series."""
    import pandas as pd

    from databeats_spark.registry import queries

    out = queries()["dow_seasonal_decompose"](spark, SF_SMOKE).toPandas()
    defined = out[out["trend"].notna()]
    assert len(defined) > 0
    resid = (defined["x"] - (defined["trend"] + defined["seasonal"] + defined["remainder"])).abs()
    assert resid.max() < 1e-5
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    daily = (
        ev.assign(day=ev["ts"].dt.strftime("%Y-%m-%d"))
        .groupby(["event_type", "day"])
        .size()
        .rename("x")
        .reset_index()
        .sort_values(["event_type", "day"])
    )
    for et, grp in daily.groupby("event_type"):
        g = grp.reset_index(drop=True)
        trend = g["x"].rolling(7, center=True).mean()
        det = g["x"] - trend
        dow = pd.to_datetime(g["day"]).dt.weekday
        seasonal = det.groupby(dow).transform("mean")
        sub = out[out["event_type"] == et].reset_index(drop=True)
        assert (sub["day"] == g["day"]).all()
        assert (sub["dow"] == dow).all()
        mask = trend.notna()
        assert (sub["trend"][mask] - trend[mask]).abs().max() < 1e-5
        assert (sub["seasonal"][mask] - seasonal[mask]).abs().max() < 1e-5


def test_holt_winters_matches_python_exactly(spark):
    """Identical operation order on both engines makes the seasonal
    fold deterministic; the Spark fold must equal a pure-Python
    Holt-Winters recurrence bit-for-bit (before the output round),
    same discipline as the Holt linear twin."""
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.signals import HW_ALPHA, HW_BETA, HW_GAMMA, HW_PERIOD

    out = queries()["holt_winters_forecast"](spark, SF_SMOKE).toPandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    daily = (
        ev.assign(day=ev["ts"].dt.strftime("%Y-%m-%d"))
        .groupby(["event_type", "day"])
        .size()
        .reset_index(name="x")
    )
    for et, grp in daily.groupby("event_type"):
        xs = [float(v) for _, v in grp.sort_values("day")["x"].items()]
        if len(xs) < HW_PERIOD + 1:
            assert et not in out.index
            continue
        acc = 0.0
        for v in xs[:HW_PERIOD]:
            acc = acc + v
        l = acc / float(HW_PERIOD)
        b = 0.0
        s = [v - l for v in xs[:HW_PERIOD]]
        i = HW_PERIOD
        for x in xs[HW_PERIOD:]:
            slot = i % HW_PERIOD
            si = s[slot]
            l2 = HW_ALPHA * (x - si) + (1 - HW_ALPHA) * (l + b)
            b = HW_BETA * (l2 - l) + (1 - HW_BETA) * b
            s[slot] = HW_GAMMA * (x - l2) + (1 - HW_GAMMA) * si
            l = l2
            i += 1
        row = out.loc[et]
        assert row["n_days"] == len(xs)
        assert row["level"] == round(l, 6)
        assert row["trend"] == round(b, 6)
        assert row["f1"] == round(l + b + s[i % HW_PERIOD], 6)
        assert row["f2"] == round(l + 2 * b + s[(i + 1) % HW_PERIOD], 6)
        assert row["f7"] == round(l + HW_PERIOD * b + s[(i + HW_PERIOD - 1) % HW_PERIOD], 6)


def test_scd2_band_history_tiles_and_matches_pandas(spark):
    """SCD2 invariants: per user the intervals tile exactly (each
    valid_to equals the next valid_from), adjacent intervals never
    carry the same band (compression is maximal), exactly one open
    interval per user — and the whole table equals a pandas replay."""
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.lifecycle import SCD2_BANDS

    out = queries()["scd2_band_history"](spark, SF_SMOKE).toPandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    p = ev[ev["event_type"] == "purchase"].copy()
    p["us"] = p["ts"].astype("datetime64[us]").astype("int64")
    p["band"] = p["value"].map(
        lambda v: "low" if v < SCD2_BANDS[0] else ("mid" if v < SCD2_BANDS[1] else "high")
    )
    rows = []
    for uid, grp in p.sort_values(["us", "event_id"]).groupby("user_id"):
        prev = None
        for _, r in grp.iterrows():
            if prev is None or r["band"] != prev:
                rows.append((uid, r["band"], r["us"]))
            prev = r["band"]
    rep = pd.DataFrame(rows, columns=["user_id", "band", "valid_from_us"])
    rep["valid_to_us"] = rep.groupby("user_id")["valid_from_us"].shift(-1)
    assert len(out) == len(rep)
    got = out.sort_values(["user_id", "valid_from_us"]).reset_index(drop=True)
    exp = rep.sort_values(["user_id", "valid_from_us"]).reset_index(drop=True)
    assert (got["user_id"].values == exp["user_id"].values).all()
    assert (got["band"].values == exp["band"].values).all()
    assert (got["valid_from_us"].values == exp["valid_from_us"].values).all()
    for _, grp in got.groupby("user_id"):
        assert grp["is_current"].sum() == 1 and bool(grp["is_current"].iloc[-1])
        assert (grp["valid_to_us"].iloc[:-1].values == grp["valid_from_us"].iloc[1:].values).all()
        assert (grp["band"].iloc[:-1].values != grp["band"].iloc[1:].values).all()


def test_cdc_snapshot_merge_equals_direct_state(spark):
    """The oracle already proves merge == direct cross-engine; this
    pins the SEMANTICS in Python: per user the surviving row is the
    latest pre-T2 event, absent iff that event is a tombstone, and
    src says whether the delta window touched the user."""
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.lifecycle import SNAP_T1, SNAP_T2

    out = queries()["cdc_snapshot_merge"](spark, SF_SMOKE).toPandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").copy()
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    t1 = pd.Timestamp(SNAP_T1).value // 1000
    t2 = pd.Timestamp(SNAP_T2).value // 1000
    hist = ev[ev["us"] < t2].sort_values(["us", "event_id"])
    seen = 0
    for uid, grp in hist.groupby("user_id"):
        last = grp.iloc[-1]
        if last["event_type"] == "error":
            assert uid not in out.index
            continue
        row = out.loc[uid]
        assert row["last_us"] == last["us"]
        assert abs(row["value"] - round(last["value"], 6)) < 1e-9
        assert row["src"] == ("delta" if last["us"] >= t1 else "base")
        seen += 1
    assert seen == len(out)


def test_hits_copurchase_matches_numpy_integer_replica(spark):
    """Three exact-integer HITS rounds over the same co-purchase edges
    replayed in numpy (object dtype — arbitrary-precision, so the
    replica can't silently overflow): the top-k normalized scores and
    their ordering must match exactly."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.mining import HITS_ROUNDS, HITS_TOP_K

    out = queries()["hits_copurchase"](spark, SF_SMOKE).toPandas()
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])
    edges = (
        orders.merge(li, left_on="o_orderkey", right_on="l_orderkey")[["o_custkey", "l_partkey"]]
        .drop_duplicates()
    )
    users = {u: i for i, u in enumerate(sorted(edges["o_custkey"].unique()))}
    parts = {p: i for i, p in enumerate(sorted(edges["l_partkey"].unique()))}
    m = np.zeros((len(users), len(parts)), dtype=object)
    for _, r in edges.iterrows():
        m[users[r["o_custkey"]], parts[r["l_partkey"]]] = 1
    a = m.sum(axis=0)  # round 1: h0 = 1
    for _ in range(HITS_ROUNDS - 1):
        h = m @ a
        a = h @ m
    h = m @ a
    inv_p = {i: p for p, i in parts.items()}
    inv_u = {i: u for u, i in users.items()}
    a_norm, h_norm = int(a.sum()), int(h.sum())
    exp_auth = sorted(
        ((round(int(v) / a_norm, 6), inv_p[i]) for i, v in enumerate(a)),
        key=lambda t: (-t[0], t[1]),
    )[:HITS_TOP_K]
    exp_hub = sorted(
        ((round(int(v) / h_norm, 6), inv_u[i]) for i, v in enumerate(h)),
        key=lambda t: (-t[0], t[1]),
    )[:HITS_TOP_K]
    got_auth = out[out["role"] == "authority"][["score", "id"]].to_records(index=False)
    got_hub = out[out["role"] == "hub"][["score", "id"]].to_records(index=False)
    assert [(s, i) for s, i in got_auth] == exp_auth
    assert [(s, i) for s, i in got_hub] == exp_hub


def test_benford_first_digit_matches_pandas(spark):
    """Digit counts must equal a pandas string-head replay and the
    shares must sum to 1; the Benford column must match math.log10."""
    import math

    import pandas as pd

    from databeats_spark.registry import queries

    out = queries()["benford_first_digit"](spark, SF_SMOKE).toPandas().set_index("digit")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet", columns=["o_totalprice"])
    first = orders["o_totalprice"].round(2).map(lambda v: f"{v:.2f}"[0])
    counts = first.value_counts()
    n = len(orders)
    assert out["n_obs"].sum() == n
    for d in out.index:
        assert out.loc[d, "n_obs"] == counts[d]
        assert abs(out.loc[d, "obs_share"] - counts[d] / n) < 1e-6
        assert abs(out.loc[d, "benford_share"] - math.log10(1 + 1 / int(d))) < 1e-6


def test_gini_by_source_matches_numpy(spark):
    """Per-source Gini must equal the numpy rank formula, sit in
    [0, 1), and be 0 for a constant series by construction."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries

    out = queries()["gini_by_source"](spark, SF_SMOKE).toPandas().set_index("source")
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["source", "n_chars"])
    for src, grp in docs.groupby("source"):
        x = np.sort(grp["n_chars"].to_numpy(dtype=np.int64))
        n = len(x)
        i = np.arange(1, n + 1)
        g = 2 * (i * x).sum() / (n * x.sum()) - (n + 1) / n
        row = out.loc[src]
        assert row["n"] == n and row["total_chars"] == x.sum()
        assert abs(row["gini"] - g) < 1e-6
        assert 0 <= row["gini"] < 1


def test_numeric_corr_matrix_matches_numpy(spark):
    """Each pair's correlation must match numpy corrcoef over the same
    2-decimal-rounded columns."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.audits import _CORR_COLS

    out = queries()["numeric_corr_matrix"](spark, SF_SMOKE).toPandas()
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet", columns=list(_CORR_COLS)).round(2)
    for _, r in out.iterrows():
        expect = np.corrcoef(li[r["col_a"]], li[r["col_b"]])[0, 1]
        assert abs(r["corr"] - expect) < 1e-5
        assert r["n"] == len(li)


def test_theil_sen_matches_numpy_brute_force(spark):
    """ts_slope must equal the numpy median of all pairwise slopes and
    ols_slope the lstsq slope over the same weekly series."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries

    out = queries()["theil_sen_trend"](spark, SF_SMOKE).toPandas().set_index("o_orderpriority")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    d = pd.to_datetime(orders["o_orderdate"])
    monday = d - pd.to_timedelta(d.dt.weekday, unit="D")
    wk = (monday.astype("int64") // 10**9) // 604800
    weekly = (
        orders.assign(wk=wk, rev=orders["o_totalprice"].round(2))
        .groupby(["o_orderpriority", "wk"])["rev"]
        .sum()
        .reset_index()
    )
    for pri, grp in weekly.groupby("o_orderpriority"):
        x = grp["wk"].to_numpy(dtype=np.float64)
        y = grp["rev"].round(2).to_numpy(dtype=np.float64)
        slopes = [
            (y[j] - y[i]) / (x[j] - x[i])
            for i in range(len(x))
            for j in range(i + 1, len(x))
        ]
        row = out.loc[pri]
        assert row["n_weeks"] == len(x)
        assert row["n_pairs"] == len(slopes)
        assert abs(row["ts_slope"] - np.median(slopes)) < 1e-4
        ols = np.polyfit(x, y, 1)[0]
        assert abs(row["ols_slope"] - ols) < 1e-4


def test_time_weighted_value_matches_pandas(spark):
    """TWAP must equal a pandas interval replay, and the total held
    time per user must span first-event -> window end exactly."""
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.events import TWAP_END_TS

    out = queries()["time_weighted_value"](spark, SF_SMOKE).toPandas().set_index("user_id")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").copy()
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    end = pd.Timestamp(TWAP_END_TS).value // 1000
    for uid, grp in ev.sort_values(["us", "event_id"]).groupby("user_id"):
        us = grp["us"].to_numpy()
        v = grp["value"].round(2).to_numpy()
        deltas = list(us[1:] - us[:-1]) + [end - us[-1]]
        twap = sum(a * b for a, b in zip(v, deltas)) / sum(deltas)
        row = out.loc[uid]
        assert row["n_events"] == len(grp)
        assert abs(row["twap"] - twap) < 1e-5


def test_stratified_effect_matches_numpy_replica(spark):
    """Each stratum's contrast and the population-weighted combination
    must match a numpy replay over the same per-user split; the ALL
    row must equal the weighted sum of the stratum rows."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.events import CUPED_SPLIT_TS, STRAT_BANDS

    out = queries()["stratified_effect"](spark, SF_SMOKE).toPandas().set_index("stratum")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["v"] = ev["value"].round(2)
    split = pd.Timestamp(CUPED_SPLIT_TS)
    pre = ev[ev["ts"] < split].groupby("user_id")["v"].sum()
    post = ev[ev["ts"] >= split].groupby("user_id")["v"].sum()
    users = np.array(sorted(ev["user_id"].unique()))
    x = np.array([round(pre.get(u, 0.0), 2) for u in users])
    y = np.array([round(post.get(u, 0.0), 2) for u in users])
    t = users % 2
    strata = np.where(x < STRAT_BANDS[0], "1_low", np.where(x < STRAT_BANDS[1], "2_mid", "3_high"))
    total, n_all = 0.0, len(users)
    for s in ("1_low", "2_mid", "3_high"):
        m = strata == s
        row = out.loc[s]
        assert row["n1"] == (m & (t == 1)).sum() and row["n0"] == (m & (t == 0)).sum()
        assert abs(row["weight"] - m.sum() / n_all) < 1e-6
        if row["n1"] and row["n0"]:
            eff = y[m & (t == 1)].mean() - y[m & (t == 0)].mean()
            assert abs(row["effect"] - eff) < 1e-4
            total += (m.sum() / n_all) * eff
    assert abs(out.loc["4_all_stratified", "effect"] - total) < 1e-4


def test_quantile_normalized_lengths_aligns_distributions(spark):
    """After normalization every source's value multiset must be a
    rank-indexed slice of the POOLED sorted lengths (numpy replay of
    the integer index formula), and a source's normalized min/max must
    span the pooled extremes."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries

    out = queries()["quantile_normalized_lengths"](spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet", columns=["doc_id", "source", "n_chars"])
    pooled = docs.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
    pooled_vals = pooled["n_chars"].to_numpy()
    n_total = len(pooled)
    for src, grp in docs.groupby("source"):
        g = grp.sort_values(["n_chars", "doc_id"]).reset_index(drop=True)
        ns = len(g)
        sub = out[out["source"] == src].sort_values("src_rank").reset_index(drop=True)
        assert (sub["doc_id"].values == g["doc_id"].values).all()
        for r in range(1, ns + 1):
            k = (n_total + 1) // 2 if ns == 1 else 1 + ((r - 1) * (n_total - 1)) // (ns - 1)
            assert sub.loc[r - 1, "norm_chars"] == pooled_vals[k - 1]
        assert sub["norm_chars"].iloc[0] == pooled_vals[0]
        assert sub["norm_chars"].iloc[-1] == pooled_vals[-1]


def test_psi_length_drift_matches_python_replica(spark):
    """psi_length_drift vs a pure-Python replica: same literal bins,
    same +1 smoothing, same bucket-ordered left fold."""
    import math

    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.corpus import PSI_BIN_CHARS, PSI_N_BINS

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs["bucket"] = docs["n_chars"].apply(
        lambda n: min(n // PSI_BIN_CHARS, PSI_N_BINS - 1)
    )
    n_all = len(docs)
    ref = {b: int((docs["bucket"] == b).sum()) for b in range(PSI_N_BINS)}
    want = {}
    for source, grp in docs.groupby("source"):
        n_docs = len(grp)
        acc = 0.0
        for b in range(PSI_N_BINS):
            cnt = int((grp["bucket"] == b).sum())
            p_s = float(cnt + 1) / float(n_docs + PSI_N_BINS)
            p_r = float(ref[b] + 1) / float(n_all + PSI_N_BINS)
            acc += (p_s - p_r) * math.log(p_s / p_r)
        want[source] = (n_docs, acc)

    got = queries()["psi_length_drift"](spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        n_docs, psi = want[r["source"]]
        assert r["n_docs"] == n_docs
        assert abs(r["psi"] - psi) < 1e-6
        assert r["psi"] >= 0.0  # PSI is a sum of (p-q)ln(p/q) >= 0 terms


def test_acf_matches_numpy_replica(spark):
    """acf_daily_revenue vs numpy Pearson over the lagged daily series."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.signals import ACF_MAX_LAG

    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    daily = (
        orders.assign(day=orders["o_orderdate"].dt.normalize())
        .groupby("day")["o_totalprice"]
        .apply(lambda s: float(s.round(2).sum()))
        .sort_index()
    )
    days = (daily.index - daily.index.min()).days.to_numpy()
    vals = daily.to_numpy()
    by_day = dict(zip(days, vals))

    got = {r["lag"]: r for r in queries()["acf_daily_revenue"](spark, SF_SMOKE).collect()}
    assert set(got) == set(range(1, ACF_MAX_LAG + 1))
    for k in range(1, ACF_MAX_LAG + 1):
        x, y = [], []
        for d, v in by_day.items():
            if d + k in by_day:
                x.append(v)
                y.append(by_day[d + k])
        want = float(np.corrcoef(x, y)[0, 1])
        assert got[k]["n_pairs"] == len(x)
        assert abs(got[k]["autocorr"] - want) < 1e-6


def test_markov_transitions_match_pandas_replica(spark):
    """markov_event_transitions vs a pandas groupby-shift replica."""
    from collections import Counter

    import pandas as pd

    from databeats_spark.registry import queries

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ev["next_type"] = ev.groupby("user_id")["event_type"].shift(-1)
    steps = ev.dropna(subset=["next_type"])
    want = Counter(zip(steps["event_type"], steps["next_type"]))
    row_tot = Counter()
    for (src, _), n in want.items():
        row_tot[src] += n

    got = queries()["markov_event_transitions"](spark, SF_SMOKE).collect()
    assert len(got) == len(want)
    for r in got:
        n = want[(r["from_type"], r["to_type"])]
        assert r["n"] == n
        assert abs(r["p"] - n / row_tot[r["from_type"]]) < 1e-6
    # each row of the transition matrix sums to ~1
    sums = Counter()
    for r in got:
        sums[r["from_type"]] += r["p"]
    assert all(abs(s - 1.0) < 1e-4 for s in sums.values())


def test_cohort_retention_matches_pandas_replica(spark):
    """cohort_retention_triangle vs a pandas first-week/offset replica."""
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.events import COHORT_MAX_OFFSET

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    wk = (
        ev["ts"].dt.tz_localize(None).dt.to_period("W-SUN").dt.start_time.astype("int64")
        // (604800 * 10**9)
    )
    act = pd.DataFrame({"user_id": ev["user_id"], "wk": wk}).drop_duplicates()
    first = act.groupby("user_id")["wk"].min().rename("cohort_wk")
    joined = act.join(first, on="user_id")
    joined["week_offset"] = joined["wk"] - joined["cohort_wk"]
    tri = (
        joined[joined["week_offset"] <= COHORT_MAX_OFFSET]
        .groupby(["cohort_wk", "week_offset"])
        .size()
    )
    sizes = first.value_counts()

    got = queries()["cohort_retention_triangle"](spark, SF_SMOKE).collect()
    assert len(got) == len(tri)
    for r in got:
        n = int(tri[(r["cohort_wk"], r["week_offset"])])
        size = int(sizes[r["cohort_wk"]])
        assert r["n_active"] == n and r["cohort_size"] == size
        assert abs(r["retention"] - n / size) < 1e-6
    # offset-0 retention is 1.0 by construction
    assert all(
        abs(r["retention"] - 1.0) < 1e-9 for r in got if r["week_offset"] == 0
    )


def test_robust_spend_stats_match_numpy_replica(spark):
    """robust_spend_stats vs a numpy sort-based trim/winsorize replica
    (identical rank-based bounds: lo = n*5 DIV 100, hi = n*95 DIV 100,
    keep ranks lo+1..hi)."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries

    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    got = {r["seg"]: r for r in queries()["robust_spend_stats"](spark, SF_SMOKE).collect()}
    assert set(got) == set(j["c_mktsegment"].unique())
    for seg, grp in j.groupby("c_mktsegment"):
        y = np.sort(np.round(grp["o_totalprice"].to_numpy(), 2))
        n = len(y)
        lo, hi = n * 5 // 100, n * 95 // 100
        kept = y[lo:hi]
        p05, p95 = y[lo], y[hi - 1]
        wins = (p05 * lo + kept.sum() + p95 * (n - hi)) / n
        r = got[seg]
        assert r["n"] == n
        assert abs(r["trimmed_mean"] - kept.mean()) < 1e-4
        assert abs(r["winsorized_mean"] - wins) < 1e-4
        assert abs(r["p05"] - p05) < 1e-9 and abs(r["p95"] - p95) < 1e-9


def test_lang_id_calibration_matches_python_replica(spark):
    """lang_id_calibration vs a pure-Python marker-count replica with
    the same smoothed confidence and first-wins argmax."""
    import re
    from collections import Counter

    import pandas as pd

    from databeats_spark.functions.text import LANG_MARKERS
    from databeats_spark.registry import queries
    from databeats_spark.registry.documents import CALIB_BINS

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    n_by_bucket: Counter = Counter()
    correct_by_bucket: Counter = Counter()
    for r in docs.itertuples():
        toks = re.split(r"\s+", str(r.text).strip())
        scores = {
            lang: sum(1 for t in toks if t in marks)
            for lang, marks in LANG_MARKERS.items()
        }
        total = sum(scores.values())
        if total == 0:
            continue
        best_lang, best = "und", 0
        for lang in LANG_MARKERS:  # first-wins strictly-greater argmax
            if scores[lang] > best:
                best_lang, best = lang, scores[lang]
        bucket = min(CALIB_BINS * (best + 1) // (total + 2), CALIB_BINS - 1)
        n_by_bucket[bucket] += 1
        correct_by_bucket[bucket] += int(best_lang == r.lang)

    got = queries()["lang_id_calibration"](spark, SF_SMOKE).collect()
    assert {r["bucket"] for r in got} == set(n_by_bucket)
    for r in got:
        assert r["n"] == n_by_bucket[r["bucket"]]
        assert r["n_correct"] == correct_by_bucket[r["bucket"]]
        acc = correct_by_bucket[r["bucket"]] / n_by_bucket[r["bucket"]]
        mid = (r["bucket"] + 0.5) / CALIB_BINS
        assert abs(r["accuracy"] - acc) < 1e-6
        assert abs(r["calibration_gap"] - abs(acc - mid)) < 1e-6


def test_markov_attribution_matches_numpy_solve(spark):
    """markov_removal_attribution vs an independent numpy replica:
    sessions/prefixes rebuilt in pandas, absorption probability from
    np.linalg.solve (LU) instead of the plan's Cramer expansion — the
    same linear system solved by a different algorithm."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.attribution import CHANNELS, CONV_EVENT, START
    from databeats_spark.registry.events import SESSION_GAP_US

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    edges = []
    for _, g in ev.groupby("user_id"):
        sess, prev = [], None
        for us in g["us"]:
            sess.append((sess[-1] if sess else 0) + (1 if prev is None or us - prev > SESSION_GAP_US else 0))
            prev = us
        g = g.assign(sess=sess)
        for _, s in g.groupby("sess"):
            types = list(s["event_type"])
            if CONV_EVENT in types:
                types = types[: types.index(CONV_EVENT) + 1]
                closed = True
            else:
                closed = False
            prev_t = START
            for t in types:
                edges.append((prev_t, "CONV" if t == CONV_EVENT else t))
                prev_t = t
            if not closed:
                edges.append((types[-1], "END"))
    edf = pd.DataFrame(edges, columns=["f", "t"])
    counts = edf.groupby(["f", "t"]).size()
    totals = edf.groupby("f").size()

    def p(f, t):
        try:
            return counts[(f, t)] / totals[f]
        except KeyError:
            return 0.0

    def conv_start(channels):
        n = len(channels)
        M = np.eye(n) - np.array([[p(a, b) for b in channels] for a in channels])
        x = np.linalg.solve(M, np.array([p(c, "CONV") for c in channels]))
        return p(START, "CONV") + sum(
            p(START, c) * x[i] for i, c in enumerate(channels)
        )

    base = conv_start(list(CHANNELS))
    got = {r["channel"]: r for r in queries()["markov_removal_attribution"](spark, SF_SMOKE).collect()}
    assert set(got) == set(CHANNELS)
    effs = {}
    for c in CHANNELS:
        wo = conv_start([x for x in CHANNELS if x != c])
        effs[c] = 1.0 - wo / base
        assert abs(got[c]["base_conv"] - base) < 1e-6
        assert abs(got[c]["conv_without"] - wo) < 1e-6
        assert abs(got[c]["removal_effect"] - effs[c]) < 1e-6
    tot = sum(effs.values())
    for c in CHANNELS:
        assert abs(got[c]["attribution_share"] - effs[c] / tot) < 1e-6
    assert 0.0 < base <= 1.0
    assert abs(sum(r["attribution_share"] for r in got.values()) - 1.0) < 1e-4


def test_forecast_backtest_mase_matches_pandas_replica(spark):
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.signals import ACF_EPOCH, BACKTEST_HOLDOUT_DAYS

    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    daily = (
        orders.assign(
            day=(orders["o_orderdate"].dt.normalize() - pd.Timestamp(ACF_EPOCH)).dt.days
        )
        .groupby("day")["o_totalprice"]
        .apply(lambda s: round(float(s.round(2).sum()), 2))
    )
    cut = daily.index.max() - BACKTEST_HOLDOUT_DAYS
    got = {r["model"]: r for r in queries()["forecast_backtest_mase"](spark, SF_SMOKE).collect()}
    for name, k in (("naive", 1), ("seasonal_naive", 7)):
        hold_err, train_err = [], []
        for d, v in daily.items():
            if d - k in daily.index:
                (hold_err if d > cut else train_err).append(abs(v - daily[d - k]))
        mae = sum(hold_err) / len(hold_err)
        insample = sum(train_err) / len(train_err)
        r = got[name]
        assert r["n_eval"] == len(hold_err)
        assert abs(r["mae"] - mae) < 1e-4
        assert abs(r["insample_mae"] - insample) < 1e-4
        assert abs(r["mase"] - mae / insample) < 1e-4
    # the weekly cycle should make seasonal-naive no worse than 3x naive
    assert got["seasonal_naive"]["mase"] < 3.0


def test_experiment_power_mde_matches_numpy_replica(spark):
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.signals import Z_ALPHA_2, Z_BETA

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    y = ev.assign(v=ev["value"].round(2)).groupby("user_id")["v"].sum().round(2)
    arms = (y.index % 2).astype(int)
    n1, n0 = int((arms == 1).sum()), int((arms == 0).sum())
    var = float(np.var(y.to_numpy(), ddof=1))
    mde = (Z_ALPHA_2 + Z_BETA) * np.sqrt(var * (1.0 / n1 + 1.0 / n0))
    r = queries()["experiment_power_mde"](spark, SF_SMOKE).collect()[0]
    assert r["n_treated"] == n1 and r["n_control"] == n0
    assert abs(r["pooled_sd"] - np.sqrt(var)) < 1e-4
    assert abs(r["mde_abs"] - mde) < 1e-4
    assert abs(r["mde_rel"] - mde / y.mean()) < 1e-4


def test_ks_two_sample_matches_scipy_style_replica(spark):
    """ks_two_sample vs a pure-numpy ECDF-max replica (the scipy
    ks_2samp statistic, computed independently from sorted arrays)."""
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    y = ev.assign(v=ev["value"].round(2)).groupby("user_id")["v"].sum().round(2)
    y1 = np.sort(y[y.index % 2 == 1].to_numpy())
    y0 = np.sort(y[y.index % 2 == 0].to_numpy())
    grid = np.unique(np.concatenate([y1, y0]))
    f1 = np.searchsorted(y1, grid, side="right") / len(y1)
    f0 = np.searchsorted(y0, grid, side="right") / len(y0)
    want_d = float(np.max(np.abs(f1 - f0)))

    r = queries()["ks_two_sample"](spark, SF_SMOKE).collect()[0]
    assert r["n_treated"] == len(y1) and r["n_control"] == len(y0)
    assert abs(r["ks_d"] - want_d) < 1e-6
    # the exact rational and the rounded double must agree
    assert abs(r["d_num"] / (len(y1) * len(y0)) - r["ks_d"]) < 1e-6
    assert 0.0 <= r["ks_d"] <= 1.0


def test_vocab_contribution_matches_python_replica(spark):
    import re

    import pandas as pd

    from databeats_spark.registry import queries

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    per_src: dict[str, set] = {}
    first: dict[str, str] = {}
    for r in docs.sort_values("doc_id").itertuples():
        toks = re.split(r"\s+", str(r.text).strip())
        per_src.setdefault(r.source, set()).update(toks)
        for t in toks:
            if t not in first or r.source < first[t]:
                first[t] = r.source

    got = queries()["vocab_contribution_by_source"](spark, SF_SMOKE).collect()
    assert [r["source"] for r in got] == sorted(per_src)
    cum = 0
    for r in got:
        n_new = sum(1 for t, s in first.items() if s == r["source"])
        cum += n_new
        assert r["n_distinct_terms"] == len(per_src[r["source"]])
        assert r["n_new_terms"] == n_new
        assert r["cum_vocab"] == cum
    assert got[-1]["cum_vocab"] == len(first)  # total vocabulary


def test_qte_matches_numpy_replica(spark):
    """quantile_treatment_effect vs numpy sorted-array order statistics
    (value at rank ceil(q*n/100) — the same no-interpolation rule)."""
    import math

    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.events import QTE_QUANTILES

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    y = ev.assign(v=ev["value"].round(2)).groupby("user_id")["v"].sum().round(2)
    y1 = np.sort(y[y.index % 2 == 1].to_numpy())
    y0 = np.sort(y[y.index % 2 == 0].to_numpy())
    got = {r["q_pct"]: r for r in queries()["quantile_treatment_effect"](spark, SF_SMOKE).collect()}
    assert set(got) == set(QTE_QUANTILES)
    for q in QTE_QUANTILES:
        qt = y1[math.ceil(q * len(y1) / 100) - 1]
        qc = y0[math.ceil(q * len(y0) / 100) - 1]
        r = got[q]
        assert r["n_treated"] == len(y1) and r["n_control"] == len(y0)
        assert abs(r["q_treated"] - qt) < 1e-9
        assert abs(r["q_control"] - qc) < 1e-9
        assert abs(r["qte"] - (qt - qc)) < 1e-9
    # quantiles are monotone in q on both arms
    qs = sorted(QTE_QUANTILES)
    assert got[qs[0]]["q_treated"] <= got[qs[1]]["q_treated"] <= got[qs[2]]["q_treated"]


def test_sequential_test_matches_numpy_replica(spark):
    import numpy as np
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.events import SEQ_Z_FINAL

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev = ev.assign(
        day=ev["ts"].dt.strftime("%Y-%m-%d"),
        v=ev["value"].round(2),
        arm=(ev["user_id"] % 2).astype(int),
    ).sort_values("day")
    got = queries()["sequential_test_daily"](spark, SF_SMOKE).collect()
    days = sorted(ev["day"].unique())
    assert [r["day"] for r in got] == days
    n_final = len(ev)
    for r in got:
        upto = ev[ev["day"] <= r["day"]]
        a1, a0 = upto[upto["arm"] == 1]["v"], upto[upto["arm"] == 0]["v"]
        z = (a1.mean() - a0.mean()) / np.sqrt(
            a1.var(ddof=1) / len(a1) + a0.var(ddof=1) / len(a0)
        )
        tau = len(upto) / n_final
        assert r["n_seen"] == len(upto)
        assert abs(r["z"] - z) < 1e-4
        assert abs(r["z_boundary"] - SEQ_Z_FINAL / np.sqrt(tau)) < 1e-6
        assert r["crossed"] == (abs(z) > SEQ_Z_FINAL / np.sqrt(tau))
    # the boundary relaxes to z_final at full information
    assert abs(got[-1]["z_boundary"] - SEQ_Z_FINAL) < 1e-6


def test_boilerplate_prefix_audit_matches_python_replica(spark):
    import re
    from collections import Counter

    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.corpus import (
        BOILERPLATE_PREFIX_TOKENS, BOILERPLATE_TOP,
    )

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    by_src: dict[str, Counter] = {}
    for r in docs.itertuples():
        toks = re.split(r"\s+", str(r.text).strip())
        pre = " ".join(toks[:BOILERPLATE_PREFIX_TOKENS])
        by_src.setdefault(r.source, Counter())[pre] += 1

    got = queries()["boilerplate_prefix_audit"](spark, SF_SMOKE).collect()
    for r in got:
        ranked = sorted(by_src[r["source"]].items(), key=lambda kv: (-kv[1], kv[0]))
        pre, n = ranked[r["rank"] - 1]
        assert (r["prefix"], r["n_docs"]) == (pre, n)
        assert abs(r["doc_share"] - n / sum(by_src[r["source"]].values())) < 1e-6
    assert len(got) == sum(
        min(BOILERPLATE_TOP, len(c)) for c in by_src.values()
    )


def test_contamination_scorecard_matches_its_constituent_queries(spark):
    """The r11 rollup must agree EXACTLY with the three per-doc queries
    it folds: benchmark_decontam's contaminated flags, split_leakage_
    pairs' cross-split docs, and shared_shingle_stats' >=50%-shared
    docs — each re-attributed to its source and counted."""
    import pandas as pd

    from databeats_spark.registry import queries
    from databeats_spark.registry.documents import (
        DECONTAM_EVAL_MOD,
        PAIR_DOC_LIMIT,
    )

    card = (
        queries()["contamination_scorecard"](spark, SF_SMOKE)
        .toPandas()
        .set_index("source")
    )
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")[["doc_id", "source"]]
    src_of = dict(zip(docs.doc_id, docs.source))

    # base denominators
    n_docs = docs.groupby("source").size()
    n_train = docs[docs.doc_id % DECONTAM_EVAL_MOD != 0].groupby("source").size()
    n_slice = docs[docs.doc_id < PAIR_DOC_LIMIT].groupby("source").size()

    decon = queries()["benchmark_decontam"](spark, SF_SMOKE).toPandas()
    contam_ids = set(decon[decon.contaminated].doc_id)

    leak = queries()["split_leakage_pairs"](spark, SF_SMOKE).toPandas()
    leak_ids = set(leak.id_a) | set(leak.id_b)

    shared = queries()["shared_shingle_stats"](spark, SF_SMOKE).toPandas()
    boiler_ids = set(shared[shared.n_shared * 2 >= shared.n_shingles].doc_id)

    for src in card.index:
        row = card.loc[src]
        assert row.n_docs == n_docs.get(src, 0)
        assert row.n_train == n_train.get(src, 0)
        assert row.n_slice == n_slice.get(src, 0)
        want_contam = sum(1 for i in contam_ids if src_of[i] == src)
        want_leak = sum(1 for i in leak_ids if src_of[i] == src)
        want_boiler = sum(1 for i in boiler_ids if src_of[i] == src)
        assert row.ngram_contam_docs == want_contam
        assert row.split_leak_docs == want_leak
        assert row.boilerplate_docs == want_boiler
        assert abs(row.ngram_contam_rate - round(want_contam / max(row.n_train, 1), 6)) < 1e-9
        assert abs(row.split_leak_rate - round(want_leak / max(row.n_slice, 1), 6)) < 1e-9
        assert abs(row.boilerplate_rate - round(want_boiler / max(row.n_docs, 1), 6)) < 1e-9
    assert set(card.index) == set(n_docs.index)


def test_jackknife_single_day_priority_is_guarded_not_null(spark, tmp_path):
    """ADVICE r10: a priority whose orders all land on ONE day used to
    divide by (sn-n)=0 and (d-1)=0 — Spark NULL vs DuckDB inf. The d>1
    guard must drop that priority on BOTH engines, keeping the rest."""
    import duckdb
    import pandas as pd

    from databeats_spark.registry import queries, registry

    orders = pd.DataFrame(
        {
            "o_orderkey": range(8),
            "o_orderpriority": ["1-SINGLE"] * 3 + ["2-MULTI"] * 5,
            "o_orderdate": ["1995-01-01"] * 3
            + ["1995-01-01", "1995-01-01", "1995-01-02", "1995-01-03", "1995-01-03"],
            "o_totalprice": [10.0, 20.0, 30.0, 5.0, 15.0, 25.0, 35.0, 45.0],
        }
    )
    # match testdata's timestamp[us] physical type — a ns-precision
    # column reads back through Spark 4.1 as nanos (the events lesson)
    orders["o_orderdate"] = pd.to_datetime(orders.o_orderdate).astype("datetime64[us]")
    (tmp_path / "x").mkdir()
    orders.to_parquet(str(tmp_path / "x" / "orders.parquet"))

    got = queries()["jackknife_ratio_ci"](spark, str(tmp_path / "x")).toPandas()
    assert list(got.o_orderpriority) == ["2-MULTI"]
    assert got.notna().all().all()

    spec = {s.name: s for s in registry()}["jackknife_ratio_ci"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM read_parquet('{tmp_path}/x/orders.parquet')"
    )
    oracle = con.execute(spec.oracle).df()
    assert list(oracle.o_orderpriority) == ["2-MULTI"]
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), oracle.reset_index(drop=True), check_dtype=False
    )


def test_isotonic_calibration_equals_independent_pava_sweep(spark):
    """The minimax identity the query evaluates must agree EXACTLY with
    an independent pool-adjacent-violators sweep over the same bins
    (Robertson-Wright-Dykstra) — plus the monotonicity contract."""
    import re
    from collections import Counter

    import pandas as pd

    from databeats_spark.functions.text import LANG_MARKERS
    from databeats_spark.registry import queries
    from databeats_spark.registry.documents import CALIB_BINS

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    n_by: Counter = Counter()
    c_by: Counter = Counter()
    for r in docs.itertuples():
        toks = re.split(r"\s+", str(r.text).strip())
        scores = {
            lang: sum(1 for t in toks if t in marks)
            for lang, marks in LANG_MARKERS.items()
        }
        total = sum(scores.values())
        if total == 0:
            continue
        best_lang, best = "und", 0
        for lang in LANG_MARKERS:
            if scores[lang] > best:
                best_lang, best = lang, scores[lang]
        bucket = min(CALIB_BINS * (best + 1) // (total + 2), CALIB_BINS - 1)
        n_by[bucket] += 1
        c_by[bucket] += int(best_lang == r.lang)

    # independent PAVA: iterate pooling adjacent violators to a fixpoint
    buckets = sorted(n_by)
    blocks = [[c_by[b], n_by[b], [b]] for b in buckets]  # [sum_c, sum_n, members]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][0] * blocks[i + 1][1] > blocks[i + 1][0] * blocks[i][1]:
            blocks[i] = [
                blocks[i][0] + blocks[i + 1][0],
                blocks[i][1] + blocks[i + 1][1],
                blocks[i][2] + blocks[i + 1][2],
            ]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    pava = {}
    for c, n, members in blocks:
        for b in members:
            pava[b] = c / n

    got = queries()["isotonic_calibration"](spark, SF_SMOKE).toPandas()
    assert list(got.bucket) == buckets
    for r in got.itertuples():
        assert r.n == n_by[r.bucket] and r.n_correct == c_by[r.bucket]
        assert abs(r.isotonic_acc - pava[r.bucket]) < 2e-6
    # the fit is monotone nondecreasing in confidence
    iso = list(got.isotonic_acc)
    assert all(a <= b + 1e-12 for a, b in zip(iso, iso[1:]))
