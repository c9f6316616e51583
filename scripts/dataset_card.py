#!/usr/bin/env python
"""Generate the dataset card: artifacts/DATASET_CARD.md.

The corpus-QA battery stitched into one release document — every
number comes from a registry query whose Spark/DuckDB hash parity is
driver-checked, so the card is REPRODUCIBLE EVIDENCE, not prose:
composition, language mix + label noise, duplication, eval-set
contamination (lexical AND semantic), privacy release gates
(k-anonymity / l-diversity / t-closeness + the DP noise calibration),
quality pass rates, the training mix, and packing efficiency.

    python scripts/dataset_card.py [--sf-dir /root/testdata/sf0.01]

Collect discipline: every section is a catalog-bounded registry
result (sources x langs x bands), so the presentation-tier pull is a
few hundred rows regardless of corpus scale — same posture as
render.py's dashboard tier.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def md_table(pdf, max_rows: int | None = None) -> str:
    """Dependency-free markdown table (tabulate isn't in the image)."""
    rows = pdf if max_rows is None else pdf.head(max_rows)
    cols = list(rows.columns)

    def fmt(v):
        if isinstance(v, float):
            return f"{v:.6g}"
        return str(v)

    out = ["| " + " | ".join(cols) + " |", "|" + "---|" * len(cols)]
    for _, r in rows.iterrows():
        out.append("| " + " | ".join(fmt(r[c]) for c in cols) + " |")
    if max_rows is not None and len(pdf) > max_rows:
        out.append(f"\n*… {len(pdf) - max_rows} more rows (run the query for the full table).*")
    return "\n".join(out)


# (section title, registry query, one-line read, row cap or None)
SECTIONS = [
    ("Composition (source × language lattice)", "corpus_summary_cube",
     "One Expand + hash aggregate produces every (source, lang) margin; "
     "g_source/g_lang are the GROUPING flags (1 = rolled up).", 12),
    ("Source concentration", "source_pareto",
     "Per-source token share in descending-volume order — the Pareto "
     "check that no provenance dominates the mix.", 10),
    ("Language mix vs labels", "lang_label_noise",
     "Disagreement between the stored lang label and the marker "
     "heuristic — the label noise a lang-keyed mix inherits.", None),
    ("Tokenizer fertility by language", "bpe_fertility_by_lang",
     "Tokens-per-word of the corpus-trained BPE vocab per language — "
     "the fairness gap a mixed-corpus tokenizer imposes on minority "
     "languages.", None),
    ("Duplication by provenance", "dup_rate_by_source",
     "Share of each source's docs that belong to a near-dup pair "
     "(bounded verifier slice).", 10),
    ("Duplication economics", "dedup_upsample_weights",
     "1/cluster-size weighting: each source's effective (distinct) doc "
     "and char mass vs raw counts — dup_inflation is how much a raw "
     "count overstates the source.", 10),
    ("Normalization-masked duplication", "normalized_dedup_delta",
     "Duplicates that only appear after case/punct/whitespace "
     "normalization — the mass raw-byte exact dedup misses.", 10),
    ("Eval-set contamination — lexical", "benchmark_decontam",
     "4-gram overlap vs the held-out eval shingles (broadcast, "
     "benchmark-sized at any corpus scale); rows are flagged docs.", 8),
    ("Eval-set contamination — semantic", "semantic_decontam",
     "Embedding-cosine hits vs the eval vectors — catches the "
     "paraphrased leakage n-grams miss.", 8),
    ("Embedding health (isotropy)", "embedding_isotropy_audit",
     "Per-label norm dispersion and mean cosine to the global "
     "centroid — collapse shows up as mean_cos_centroid near 1 before "
     "ANN recall quietly degrades.", None),
    ("ANN index quality", "ann_recall_audit",
     "Recall@k of the IVF probe path vs exact brute force, computed "
     "in-engine per query vector.", None),
    ("Privacy gate: k-anonymity", "k_anonymity_audit",
     "Rows in quasi-identifier groups smaller than k=5, per segment.", None),
    ("Privacy gate: l-diversity", "l_diversity_audit",
     "QI groups spanning fewer than 3 distinct sensitive values.", None),
    ("Privacy gate: t-closeness", "t_closeness_audit",
     "QI groups whose sensitive-value EMD vs the global mix exceeds "
     "t=0.2 (the skew attack l-diversity misses).", None),
    ("DP release calibration", "dp_noisy_histogram",
     "The Laplace mechanism replayed with the seeded noise source — "
     "noise column = what a real release would add at ε=1.", 6),
    ("Quality rule gate", "gopher_quality_flags",
     "Gopher/C4-style token-band + word-length + diversity rules, "
     "pass rate per source.", 10),
    ("Training mix (temperature-smoothed)", "temperature_mix_allocation",
     "n^0.7 smoothing: below-average sources boosted, the largest "
     "damped.", 10),
    ("Packing efficiency", "padding_waste_by_bucket",
     "Pad tokens burned per length bucket if batches were padded "
     "instead of packed — the cost sequence packing avoids.", None),
    ("Statistical uncertainty (Poisson bootstrap)", "poisson_bootstrap_ci",
     "Rank-based bootstrap CI on each source's mean doc length — the "
     "one-pass (Poisson-weight) bootstrap, so the uncertainty column "
     "costs one extra scan at any corpus scale.", 10),
    ("Vocabulary saturation", "chao1_vocab_richness",
     "Chao1 richness bound + Good-Turing coverage per source — "
     "unseen_share estimates how much new vocabulary more crawl from "
     "this source would still buy.", 10),
    ("Cross-source n-gram overlap", "source_kmv_overlap",
     "KMV-sketch Jaccard between sources with its exact verifier in "
     "the same plan — at scale only the k-row mergeable sketches are "
     "kept.", 10),
]


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--out", default=os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "artifacts", "DATASET_CARD.md"))
    args = ap.parse_args()

    # vanilla session — the card must reproduce under the driver's confs
    from pyspark.sql import SparkSession

    from databeats_spark.registry import registry

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]")
        .appName("dataset-card")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    specs = {s.name: s for s in registry()}

    parts = [
        "# DATASET CARD — synthetic corpus at "
        f"`{args.sf_dir}`",
        "",
        "Generated by `scripts/dataset_card.py`. Every table below is a",
        "registry query with a DuckDB oracle (hash parity driver-checked),",
        "so each number is dual-engine-certified — regenerate with the",
        "command in the module docstring after any corpus change.",
        "",
    ]
    for title, qname, blurb, cap in SECTIONS:
        pdf = specs[qname].build(spark, args.sf_dir).toPandas()
        parts += [f"## {title}", "", f"*Registry query: `{qname}`.* {blurb}", "",
                  md_table(pdf, cap), ""]

    with open(args.out, "w") as fh:
        fh.write("\n".join(parts) + "\n")
    print(f"wrote {args.out} ({len(SECTIONS)} sections)")


if __name__ == "__main__":
    main()
