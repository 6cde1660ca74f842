"""Data-selection operators for LLM training pipelines.

DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling", arXiv:2302.03169): score
every raw document by the log-likelihood ratio of a TARGET hashed
n-gram model over the RAW corpus model, so a cheap resampling pass can
tilt a web-scale corpus toward a high-quality target domain without a
learned classifier.

Everything is Spark-SQL-native (no Python in the hot path) and
hash-stable against the DuckDB oracle: the per-document log-ratio sum
is folded in bucket order over map-side-combined (doc, bucket, count)
rows, and the final rounding is floor-form — the same determinism
pattern as ``dim_covariance`` / ``lag_features``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metrics_advisor_spark.functions.dedup import _hash56
from metrics_advisor_spark.functions.text import TOKEN_RE


def dsir_weights(
    df: DataFrame,
    target: Column,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document DSIR importance weight: log p_target(d) − p_raw(d)
    under two add-one-smoothed hashed n-gram (unigram + bigram) bag
    models, target fit on ``target``-predicate docs, raw on the whole
    input.

    Output: (doc_id, n_grams, log_weight) for every doc with ≥1 token;
    positive log_weight = "more target-like than the raw average".
    Resample with ``weighted_sample`` downstream (the paper's Gumbel
    trick) — this operator is the scoring half.

    100 TB design: the gram stream reduces MAP-SIDE to one row per
    (doc, bucket) with a count — the only wide shuffle is that
    combinable aggregate keyed by doc.  Both models are ``n_buckets``
    rows (hashing is the paper's point: model size is fixed at 4096
    buckets regardless of corpus vocabulary), so the scoring join is a
    broadcast; corpus totals ride a 1-row broadcast.  Determinism: the
    per-doc sum folds ≤n_buckets terms in bucket order (sorted array
    fold = fixed IEEE tree at any parallelism) and the output snap is
    floor-form 6dp, mirrored exactly by the oracle.
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        target.cast("int").alias("is_target"),
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0).alias(
            "_t"
        ),
    )
    t = F.col("_t")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
    )
    grams = toks.where(F.size(t) >= 1).select(
        "doc_id",
        "is_target",
        F.explode(
            # slice(t,1,0) = typed empty array; sequence(1, size-1)
            # would run DESCENDING for 1-token docs
            F.concat(
                t,
                F.when(F.size(t) >= 2, bigrams).otherwise(F.slice(t, 1, 0)),
            )
        ).alias("gram"),
    ).select(
        "doc_id",
        "is_target",
        F.pmod(_hash56(F.col("gram")), F.lit(n_buckets)).alias("bucket"),
    )
    # map-side combine: one row per (doc, bucket).  Persisted because
    # THREE consumers re-derive it (model, totals, scoring) — without
    # the cache the tokenize+md5 explode over the full corpus runs 3×
    # (visible as three parquet scans in the physical plan).
    db = grams.groupBy("doc_id", "bucket").agg(
        F.count(F.lit(1)).alias("c"),
        F.max("is_target").alias("is_target"),
    ).persist()
    model = db.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target") == 1, F.col("c")).otherwise(0))
        .cast("double")
        .alias("ct"),
        F.sum("c").cast("double").alias("cr"),
    )
    totals = model.agg(
        F.sum("ct").alias("nt"), F.sum("cr").alias("nr")
    )
    m = F.lit(float(n_buckets))
    term = (
        F.log(F.col("ct") + F.lit(1.0))
        - F.log(F.col("nt") + m)
        - F.log(F.col("cr") + F.lit(1.0))
        + F.log(F.col("nr") + m)
    )
    scored = (
        db.join(F.broadcast(model), "bucket")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "bucket",
            F.col("c").cast("double").alias("c"),
            term.alias("term"),
        )
    )
    folded = (
        scored.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("bucket", "c", "term"))
            ).alias("bs")
        )
        .select(
            "doc_id",
            F.aggregate(
                "bs", F.lit(0.0), lambda acc, v: acc + v.c
            )
            .cast("long")
            .alias("n_grams"),
            F.aggregate(
                "bs", F.lit(0.0), lambda acc, v: acc + v.c * v.term
            ).alias("w"),
        )
    )
    return folded.select(
        "doc_id",
        "n_grams",
        (
            F.floor(F.col("w") * F.lit(1000000.0) + F.lit(0.5))
            / F.lit(1000000.0)
        ).alias("log_weight"),
    )
