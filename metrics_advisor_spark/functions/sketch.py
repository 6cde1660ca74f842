"""Deterministic sketches built from DataFrame primitives.

Spark exposes no public Count-Min aggregate (and `bloom_filter_agg` is
internal-only — see functions/curation.py build_bloom), so the sketches
here are built from groupBy/aggregate primitives with md5-derived hash
functions.  That makes every cell value ENGINE-NEUTRAL: the DuckDB
oracle reproduces the exact sketch, so even the approximation error is
checkable, not just bounded.

Scale: a CMS build is one hash aggregate over (depth × distinct keys)
rows — the explode is per DISTINCT key (post-count), not per raw token,
and the sketch itself is depth×width rows regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metrics_advisor_spark.functions.dedup import _hash56


def cms_build(
    counts: DataFrame,
    key_col: str = "term",
    count_col: str = "n",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch of a (key, count) frame → (d, col, cell) rows.

    Input is the ALREADY-AGGREGATED per-key count (one row per distinct
    key), so the depth-explode fans out depth rows per distinct key —
    never per raw occurrence.  Cells absent from the output are zero.
    """
    rows = counts.select(
        F.col(key_col).alias("k"),
        F.col(count_col).alias("n"),
        F.explode(
            F.sequence(F.lit(0), F.lit(depth - 1))
        ).alias("d"),
    )
    col = (
        _hash56(
            F.concat(F.col("d").cast("string"), F.lit("_"), F.col("k"))
        )
        % width
    )
    return (
        rows.groupBy("d", col.alias("col"))
        .agg(F.sum("n").alias("cell"))
        .select("d", "col", "cell")
    )


def cms_estimate(
    counts: DataFrame,
    probes: DataFrame,
    key_col: str = "term",
    count_col: str = "n",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """CMS point-query audit: for each probe key, the sketch estimate
    (min over rows of the hashed cell) next to the exact count.

    est ≥ exact always (CMS never underestimates); the overestimate is
    the sum of colliding keys' counts in the tightest row.

    Scale: the probe side joins the depth×width-row sketch — broadcast
    by construction; exact counts come from the same aggregated frame
    the sketch was built from (no second corpus pass).
    """
    sketch = cms_build(counts, key_col, count_col, depth, width)
    probe_cells = probes.select(F.col(key_col).alias("k")).withColumn(
        "d", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    ).withColumn(
        "col",
        _hash56(
            F.concat(F.col("d").cast("string"), F.lit("_"), F.col("k"))
        )
        % width,
    )
    est = (
        probe_cells.join(F.broadcast(sketch), ["d", "col"], "left")
        .withColumn("cell", F.coalesce("cell", F.lit(0)))
        .groupBy("k")
        .agg(F.min("cell").alias("cms_estimate"))
    )
    exact = counts.select(
        F.col(key_col).alias("k"), F.col(count_col).alias("exact")
    )
    return (
        est.join(exact, "k", "left")
        .select(
            F.col("k").alias(key_col),
            "cms_estimate",
            F.coalesce("exact", F.lit(0)).alias("exact"),
        )
    )


def cms_join_size(
    counts_a: DataFrame,
    counts_b: DataFrame,
    key_col: str = "k",
    count_col: str = "n",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Join-cardinality estimation by Count-Min inner product:
    |A ⋈_k B| = Σ_k f_A(k)·f_B(k), estimated as min_d Σ_col
    CMS_A[d,col]·CMS_B[d,col] — the classic sketch trick a query
    planner uses to size a join without touching either table again.
    Like the point query, the inner product NEVER underestimates.

    Output is one row: exact size (from the per-key count frames),
    sketch estimate, and the overestimate ratio.  Both sketches are
    depth×width rows — the estimate join is constant-size regardless
    of table size.
    """
    sa = cms_build(counts_a, key_col, count_col, depth, width)
    sb = cms_build(counts_b, key_col, count_col, depth, width)
    est = (
        sa.alias("a")
        .join(
            sb.alias("b"),
            (F.col("a.d") == F.col("b.d"))
            & (F.col("a.col") == F.col("b.col")),
        )
        .groupBy(F.col("a.d"))
        .agg(F.sum(F.col("a.cell") * F.col("b.cell")).alias("ip"))
        .agg(F.min("ip").cast("long").alias("cms_join_size"))
    )
    exact = (
        counts_a.select(F.col(key_col).alias("k"), F.col(count_col).alias("na"))
        .join(
            counts_b.select(
                F.col(key_col).alias("k"), F.col(count_col).alias("nb")
            ),
            "k",
        )
        .agg(F.sum(F.col("na") * F.col("nb")).cast("long").alias("exact_join_size"))
    )
    return exact.crossJoin(est).select(
        "exact_join_size",
        "cms_join_size",
        F.round(
            F.try_divide(F.col("cms_join_size"), F.col("exact_join_size")), 6
        ).alias("over_ratio"),
    )
