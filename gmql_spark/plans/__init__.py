from gmql_spark.plans.inspect import assert_no_object_agg, plan_report  # noqa: F401
