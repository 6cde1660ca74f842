"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the same settings are what we would ship
to a 1000-executor cluster job conf: AQE on (runtime coalesce + skew-join
splitting), Arrow for every pandas-UDF boundary, shuffle partitions sized
to the parallelism at hand rather than the 200 default.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(app_name: str = "metrics_advisor_spark", *,
              shuffle_partitions: int | None = None,
              master: str | None = None) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder
        .master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        # columnar parquet scans: keep pushdown + pruning on (defaults, but
        # pinned so a cluster-side override can't silently regress them)
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # InferFiltersFromGenerate clones each explode's input expression
        # into a `size(...) > 0 AND isnotnull(...)` predicate.  Every
        # shingle/gram pipeline in this engine explodes a higher-order
        # `transform(sequence(...), hash(...))` array, so the rule (a)
        # re-evaluates the whole HOF per row a second time and (b) the
        # cloned predicate pushes below the corpus fanout repartition
        # into the parquet scan stage, serializing O(corpus) hash work
        # onto the scan's few input splits (measured r15: 3 tasks,
        # 4.3 s CPU at sf0.1 on canonical_select's scan).  The inferred
        # filter is semantically redundant — Generate already drops
        # empty/null arrays — so excluding the rule changes no results
        # at any scale.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer."
            "InferFiltersFromGenerate",
        )
        # the driver's testdata stores TIMESTAMP(NANOS) which Spark rejects
        # by default; read as long and convert at the source adapter
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # managed (bucketed) tables go to scratch unless overridden —
        # never into the caller's cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.join(tempfile.gettempdir(), "ma_spark_warehouse"),
            ),
        )
    )
    # scale/deployment overrides without code edits (e.g. cluster jobs
    # raising shuffle partitions, or local A/B of a planner flag):
    # SPARK_GRAFT_EXTRA_CONF="spark.x=1;spark.y=2"
    for kv in os.environ.get("SPARK_GRAFT_EXTRA_CONF", "").split(";"):
        if kv.strip():
            k, _, v = kv.partition("=")
            builder = builder.config(k.strip(), v.strip())
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
