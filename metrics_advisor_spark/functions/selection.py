"""Data-selection operators for LLM training pipelines.

DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
Language Models via Importance Resampling", arXiv:2302.03169): score
every raw document by the log-likelihood ratio of a TARGET hashed
n-gram model over the RAW corpus model, so a cheap resampling pass can
tilt a web-scale corpus toward a high-quality target domain without a
learned classifier.  The pipeline factors into:

- ``dsir_model``     fit the per-bucket log-ratio table (offline);
- ``dsir_score``     score any corpus against a pre-fit model
                     (batch or per-micro-batch in the streaming gate);
- ``dsir_weights``   fit-and-score one corpus in a single plan;
- ``dsir_resample``  weights → Efraimidis–Spirakis without-replacement
                     sample (the paper's resampling half).

Everything is Spark-SQL-native (no Python in the hot path) and
hash-stable against the DuckDB oracle: the per-document log-ratio sum
is folded in bucket order over map-side-combined (doc, bucket, count)
rows, and the final rounding is floor-form — the same determinism
pattern as ``dim_covariance`` / ``lag_features``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from metrics_advisor_spark.functions.cacheutil import attach_cached
from metrics_advisor_spark.functions.dedup import _hash56
from metrics_advisor_spark.functions.text import TOKEN_RE


def _doc_buckets(
    df: DataFrame,
    n_buckets: int,
    text_col: str,
    id_col: str,
    target: Column | None = None,
) -> DataFrame:
    """Hashed unigram+bigram bucket counts per doc: one row per
    (doc_id, bucket) with the occurrence count — reduced MAP-SIDE
    before any shuffle.  ``target`` (when given) rides along as a
    per-doc 0/1 flag for model fitting."""
    cols = [
        F.col(id_col).alias("doc_id"),
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0).alias(
            "_t"
        ),
    ]
    if target is not None:
        cols.insert(1, target.cast("int").alias("is_target"))
    toks = df.select(*cols)
    t = F.col("_t")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(t) - 1),
        lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
    )
    keep = ["doc_id"] + (["is_target"] if target is not None else [])
    grams = toks.where(F.size(t) >= 1).select(
        *keep,
        F.explode(
            # slice(t,1,0) = typed empty array; sequence(1, size-1)
            # would run DESCENDING for 1-token docs
            F.concat(
                t,
                F.when(F.size(t) >= 2, bigrams).otherwise(F.slice(t, 1, 0)),
            )
        ).alias("gram"),
    ).select(
        *keep,
        F.pmod(_hash56(F.col("gram")), F.lit(n_buckets)).alias("bucket"),
    )
    aggs = [F.count(F.lit(1)).alias("c")]
    if target is not None:
        aggs.append(F.max("is_target").alias("is_target"))
    return grams.groupBy("doc_id", "bucket").agg(*aggs)


def _term(ct: Column, cr: Column, nt: Column, nr: Column, m: Column):
    """Per-bucket add-one-smoothed log ratio — ONE expression shape so
    model terms and the unseen-bucket default evaluate the identical
    IEEE tree in both engines."""
    return (
        F.log(ct + F.lit(1.0))
        - F.log(nt + m)
        - F.log(cr + F.lit(1.0))
        + F.log(nr + m)
    )


def _model_terms(db: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, term) from a bucket-count frame carrying is_target."""
    counts = db.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target") == 1, F.col("c")).otherwise(0))
        .cast("double")
        .alias("ct"),
        F.sum("c").cast("double").alias("cr"),
    )
    totals = counts.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    m = F.lit(float(n_buckets))
    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        _term(F.col("ct"), F.col("cr"), F.col("nt"), F.col("nr"), m).alias(
            "term"
        ),
    )


def _fold_score(scored: DataFrame) -> DataFrame:
    """Deterministic per-doc fold of (bucket, c, term) rows → (doc_id,
    n_grams, log_weight): ≤n_buckets terms summed in bucket order
    (sorted-array fold = fixed IEEE tree at any parallelism), floor-form
    6dp snap."""
    folded = (
        scored.groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("bucket", "c", "term"))
            ).alias("bs")
        )
        .select(
            "doc_id",
            F.aggregate("bs", F.lit(0.0), lambda acc, v: acc + v.c)
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


def dsir_model(
    df: DataFrame,
    target: Column,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fit the DSIR log-ratio model offline: (bucket, term) for every
    bucket seen in ``df``, plus ONE sentinel row (bucket = −1) carrying
    the unseen-bucket default ln((nr+m)/(nt+m)) — `dsir_score` applies
    it to buckets a later corpus hits that the fit corpus never did.
    The whole table is ≤ n_buckets + 1 rows → always broadcastable."""
    db = _doc_buckets(df, n_buckets, text_col, id_col, target).persist()
    counts = _model_terms(db, n_buckets)
    totals = (
        db.groupBy("bucket")
        .agg(
            F.sum(
                F.when(F.col("is_target") == 1, F.col("c")).otherwise(0)
            )
            .cast("double")
            .alias("ct"),
            F.sum("c").cast("double").alias("cr"),
        )
        .agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    )
    m = F.lit(float(n_buckets))
    default = totals.select(
        F.lit(-1).cast("long").alias("bucket"),
        _term(F.lit(0.0), F.lit(0.0), F.col("nt"), F.col("nr"), m).alias(
            "term"
        ),
    )
    # db feeds both the per-bucket counts and the totals; freed via
    # `release_cached` once the (tiny) model table is materialized
    return attach_cached(counts.unionByName(default), db)


def dsir_score(
    df: DataFrame,
    model: DataFrame,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score any corpus against a pre-fit `dsir_model` table: broadcast
    the model, left-join per (doc, bucket), fall back to the sentinel
    default term for buckets the fit corpus never saw, deterministic
    bucket-ordered fold.  This is the per-micro-batch plan of the
    streaming DSIR gate."""
    db = _doc_buckets(df, n_buckets, text_col, id_col)
    # Aggregate the sentinel slice down to EXACTLY one row (count +
    # first) so the crossJoin never silently empties the result: a
    # model table missing the bucket = -1 sentinel (e.g. a raw
    # dsir_weights-style terms table) raises loudly on the first
    # evaluated row instead of scoring zero documents.
    dflt = (
        model.where(F.col("bucket") == -1)
        .agg(
            F.count("*").alias("_dn"),
            # min, not first: if a caller unions two dsir_model outputs
            # the sentinel slice has 2 rows and first() would pick an
            # arbitrary default term per run (r07 ADVICE)
            F.min("term").alias("_dterm"),
        )
    )
    scored = (
        db.join(
            F.broadcast(model.where(F.col("bucket") >= 0)), "bucket", "left"
        )
        .crossJoin(F.broadcast(dflt))
        .select(
            "doc_id",
            "bucket",
            F.col("c").cast("double").alias("c"),
            F.when(
                F.col("_dn") < 1,
                F.raise_error(
                    "dsir_score: model table lacks the bucket=-1 "
                    "sentinel row (pass a dsir_model output)"
                ),
            )
            .otherwise(F.coalesce("term", "_dterm"))
            .alias("term"),
        )
    )
    return _fold_score(scored)


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
    input — fit and score in one plan.

    Output: (doc_id, n_grams, log_weight) for every doc with ≥1 token;
    higher = "more target-like than the raw average" (absolute sign is
    arbitrary: the raw model contains the target slice too).

    100 TB design: the gram stream reduces MAP-SIDE to one row per
    (doc, bucket) with a count — the only wide shuffle is that
    combinable aggregate keyed by doc.  That reduced aggregate is
    persisted because two consumers re-derive it (model fit and
    scoring) — without the cache the tokenize+md5 explode over the
    full corpus runs per consumer (multiple parquet scans in the
    physical plan).  Both models are ``n_buckets`` rows (hashing is
    the paper's point: model size is fixed regardless of corpus
    vocabulary), so the scoring join is a broadcast.  Determinism: the
    per-doc sum folds ≤n_buckets terms in bucket order and the output
    snap is floor-form 6dp, mirrored exactly by the oracle.
    """
    db = _doc_buckets(df, n_buckets, text_col, id_col, target).persist()
    model = _model_terms(db, n_buckets)
    scored = db.join(F.broadcast(model), "bucket").select(
        "doc_id",
        "bucket",
        F.col("c").cast("double").alias("c"),
        "term",
    )
    return attach_cached(_fold_score(scored), db)


def dsir_resample(
    df: DataFrame,
    target: Column,
    k: int = 100,
    n_buckets: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The resampling half of DSIR: importance weights → deterministic
    without-replacement sample of ``k`` docs via the Efraimidis–
    Spirakis A-ES key in its LOG form, ln(u)·exp(−log_weight) with u a
    content-free uniform from md5(doc_id) — the same reproducible-
    membership scheme as `weighted_sample` (inclusion probability
    rises with weight; membership is a pure function of (doc_id,
    weight), stable across reruns and cluster layouts).  The log form
    matters here: DSIR log-weights span tens of nats, so the textbook
    u^(1/w) key underflows to 0.0 for every below-average doc and the
    sample degenerates to doc_id order; ln(u)/w keeps the full double
    range.  The key itself spans ~e^|log_weight| and would amplify a
    1-ulp cross-engine exp() difference past any rounding, so the
    CONTRACT emits the rank, not the key (ordering flips only if two
    keys tie within ~1e-16 relative — measure-zero).

    Output: (doc_id, log_weight, rank), the k largest keys first.
    Plan: the scoring pipeline + one narrow projection + a distributed
    TakeOrdered top-k — no global sort, no RNG state."""
    w = dsir_weights(df, target, n_buckets, text_col, id_col)
    u = (_hash56(F.col("doc_id").cast("string")) + 1) / F.lit(
        float(1 << 56)
    )
    key = F.log(u) * F.exp(-F.col("log_weight"))
    top = (
        w.select("doc_id", "log_weight", key.alias("_k"))
        .orderBy(F.col("_k").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    from pyspark.sql import Window

    rw = Window.orderBy(F.col("_k").desc(), F.col("doc_id").asc())
    # propagate the scoring pipeline's cached intermediates so
    # `release_cached` on the sample frees them too
    return attach_cached(
        top.select(
            "doc_id",
            "log_weight",
            F.row_number().over(rw).cast("long").alias("rank"),
        ),
        *getattr(w, "_ma_cached_frames", ()),
    )
