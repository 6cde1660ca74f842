"""MLlib-based anomaly scoring — the clustering-distance complement to
the statistical detectors (SURVEY §2.6 P5-P7).

``detect_outliers_kmeans`` embeds each sample as a small feature vector
(level + local dynamics), fits one MLlib KMeans over the (optionally
standardized) feature space, and flags samples whose distance to their
nearest centroid is k·σ above the mean distance.  Catches
"shape-anomalous" points that a pure 3σ residual test misses (e.g. a
normal level reached by an abnormal jump), and runs fully distributed:
KMeans training is a Spark job and scoring is one model.transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def detect_outliers_kmeans(
    signals: DataFrame,
    n_clusters: int = 8,
    sigma_level: float = 3.0,
    min_cluster_frac: float = 0.01,
    seed: int = 11,
) -> DataFrame:
    """Distance-to-centroid outliers over (value, Δ, Δ²) features.

    Features are standardized per metric (so metrics of different scale
    share one model) and clustered once.  A sample is anomalous if
    EITHER its distance to its centroid exceeds mean + sigma_level·σ of
    all distances, OR its whole cluster holds fewer than
    ``min_cluster_frac`` of the samples — k-means happily dedicates a
    centroid to extreme points (making their distance ≈ 0), so tiny
    clusters are themselves the anomaly.

    Output: (metric, series, ts, value, distance) for flagged samples.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import StandardScaler
    from pyspark.ml.functions import array_to_vector, vector_to_array

    w = Window.partitionBy("metric", "series").orderBy("ts")
    feats = (
        signals.withColumn("_d1", F.col("value") - F.lag("value", 1).over(w))
        .withColumn("_d2", F.col("_d1") - F.lag("_d1", 1).over(w))
        .na.fill({"_d1": 0.0, "_d2": 0.0})
    )
    # per-metric standardization keeps one global model meaningful
    wm = Window.partitionBy("metric")
    for c in ("value", "_d1", "_d2"):
        feats = feats.withColumn(
            f"_z_{c}",
            F.try_divide(
                F.col(c) - F.avg(c).over(wm),
                F.stddev_pop(c).over(wm) + F.lit(1e-12),
            ),
        )
    feats = feats.withColumn(
        "_feat",
        array_to_vector(F.array("_z_value", "_z__d1", "_z__d2")),
    )
    # NOTE do not persist() feats here: MLlib's fit already persists its
    # internal instance RDD (handlePersistence), so a DataFrame-level
    # cache adds a second materialization (measured: no end-to-end win at
    # sf0.001–0.1) and perturbs the k-means|| init sampling.
    # random init beats k-means|| here: measured at sf0.1, fit drops
    # 4.4 s → 1.7 s for +0.4% training cost — and the outlier decision
    # (global distance sigma + tiny-cluster rule) is insensitive to that
    # seeding difference.  k-means||'s extra init passes buy nothing on
    # standardized 3-dim features with k=6.
    model = KMeans(
        k=n_clusters,
        seed=seed,
        initMode="random",
        featuresCol="_feat",
        predictionCol="_cell",
    ).fit(feats)
    centers = model.clusterCenters()
    centers_df = signals.sparkSession.createDataFrame(
        [(int(i), [float(v) for v in c]) for i, c in enumerate(centers)],
        "_cell int, _centroid array<double>",
    )
    scored = (
        model.transform(feats)
        .join(F.broadcast(centers_df), "_cell")
        .withColumn(
            "distance",
            F.sqrt(
                F.aggregate(
                    F.zip_with(
                        vector_to_array("_feat"),
                        F.col("_centroid"),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ),
        )
    )
    scored = scored.cache()
    # Eagerly populate the cache BEFORE the final action: `stats` and
    # `cell_sizes` below are BROADCAST subtrees over `scored`, and the
    # driver launches broadcast-build jobs concurrently with the probe
    # job — three jobs racing to compute the same unpopulated cache
    # serialize on the block-manager's per-partition cache locks while
    # HOLDING task slots (profiled r16: two 32-task
    # `withThreadLocalCaptured` stages, 7.5 s + 1.2 s of runTime at
    # ~0.08 s of CPU, pure lock wait).  One tiny count() materializes
    # the cache once; the broadcast builds then read populated blocks.
    scored.count()
    stats = scored.agg(
        F.avg("distance").alias("_mu"),
        F.stddev_pop("distance").alias("_sd"),
        F.count(F.lit(1)).alias("_n"),
    )
    cell_sizes = scored.groupBy("_cell").agg(
        F.count(F.lit(1)).alias("_cell_n")
    )
    return (
        scored.crossJoin(F.broadcast(stats))
        .join(F.broadcast(cell_sizes), "_cell")
        .filter(
            (F.col("distance") > F.col("_mu") + sigma_level * F.col("_sd"))
            | (F.col("_cell_n") < min_cluster_frac * F.col("_n"))
        )
        .select("metric", "series", "ts", "value", F.round("distance", 6).alias("distance"))
    )
