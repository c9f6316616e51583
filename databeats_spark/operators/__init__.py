from databeats_spark.operators.windows import (  # noqa: F401
    latest_per_key,
    per_parent_limit,
    running_total,
    streak_ending_at_latest,
    top_k_per_group,
)
from databeats_spark.operators.dedup import (  # noqa: F401
    dedup_exact,
    dedup_first,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from databeats_spark.operators.joins import asof_join, range_join  # noqa: F401
from databeats_spark.operators.maintenance import (  # noqa: F401
    compact,
    profile_numeric,
    scd2_apply,
    upsert,
)
from databeats_spark.operators.scale import (  # noqa: F401
    attach_global_scalar,
    bucketed_join,
    partitioned_running_total,
    salted_join,
    write_bucketed,
)
