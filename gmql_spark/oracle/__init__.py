"""Pure-pandas reference implementations ("oracles").

The reference repo has no automated unit tests (its only test file is
commented out — ``GMQL-Spark/src/test/scala/it/polimi/AppTest.scala:1-42``);
its correctness notion is "compare engine output against a trusted
implementation across randomized configs" (``conf/test_map.xml:1-60``).
These oracles are that trusted implementation for the new engine: small,
obviously-correct pandas code the pytest suite diffs Spark results against.
"""

from gmql_spark.oracle.rollup import oracle_gapfill_1m, oracle_rollup  # noqa: F401
