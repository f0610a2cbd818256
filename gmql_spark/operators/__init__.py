"""Operator surface of the engine (SURVEY.md §2 recast).

Every operator is a plain function ``DataFrame -> DataFrame`` built from
declarative pyspark.sql expressions so Catalyst plans the physical
execution (the reference hand-schedules every operator on raw RDDs —
``GMQL-Spark/.../GMQLSparkExecutor.scala:251-285``).
"""
