from gmql_spark.functions.aggregates import counts_map, exact_percentiles, merge_counts_maps  # noqa: F401
