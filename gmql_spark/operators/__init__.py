"""Operator surface of the engine (SURVEY.md §2 recast).

Every operator is a plain function ``DataFrame -> DataFrame`` built from
declarative pyspark.sql expressions so Catalyst plans the physical
execution (the reference hand-schedules every operator on raw RDDs —
``GMQL-Spark/.../GMQLSparkExecutor.scala:251-285``).
"""

from gmql_spark.operators.cover import accumulation, cover, flat_cover, summits  # noqa: F401
from gmql_spark.operators.dedup import (  # noqa: F401
    canonical_docs,
    dedup_components,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_pairs,
)
from gmql_spark.operators.difference import temporal_difference  # noqa: F401
from gmql_spark.operators.gapfill import gapfill  # noqa: F401
from gmql_spark.operators.join import (  # noqa: F401
    asof_join,
    interval_join,
    join_conditions,
    nearest_k,
    range_join,
)
from gmql_spark.operators.map_agg import map_intervals  # noqa: F401
from gmql_spark.operators.order import (  # noqa: F401
    rank_per_key,
    top_percent_per_key,
    topg_per_key,
    topk_per_key,
)
from gmql_spark.operators.rollup import (  # noqa: F401
    cascade_rollup,
    exact_percentiles,
    rollup,
    rollup_all_tiers,
    with_gap_seconds,
)
from gmql_spark.operators.session import sessionize  # noqa: F401
from gmql_spark.operators.similarity import (  # noqa: F401
    cosine_near_pairs,
    cosine_topk,
    ivf_topk,
    lsh_bucket_topk,
)
