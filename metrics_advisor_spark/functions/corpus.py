"""End-to-end corpus preparation for LLM training-data pipelines.

Composes the text-analysis expression builders (functions/text.py) with
exact dedup and deterministic token-budget sampling — the standard
"clean a crawl" pass: dedup → quality gate → language gate → budgeted
sample.  Everything is pure ``pyspark.sql.functions`` (JVM-side,
codegen'd) and ANSI-SQL-expressible, so the DuckDB oracle checks the
whole pipeline end to end.

Scale design (100 TB corpus):

- ``corpus_prep``: ONE narrow projection computes every per-doc feature
  (content hash, language vote, quality score, token count) in a single
  pass over the scan, then ONE shuffle (hash-partitioned by content
  hash) deduplicates.  No per-feature joins.
- ``token_budget_sample``: the exact semantics is a per-language running
  token sum over a deterministic hash order — a single ordered window,
  which at 100 TB means one giant sort per language.  The default
  ``two_phase=True`` path avoids that: a 256-bucket hash-prefix
  histogram (tiny aggregate) locates the budget boundary, whole buckets
  below it pass with no sort, and only the ONE boundary bucket (~1/256
  of the language) is sorted exactly.  Output is identical to the
  single-window form (asserted in tests/test_corpus.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metrics_advisor_spark.functions.text import (
    lang_pred_col,
    quality_score_col,
    token_count_col,
)


def doc_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One narrow projection with every per-doc prep feature."""
    text = F.col(text_col)
    return docs.select(
        "doc_id",
        F.md5(text).alias("content_hash"),
        lang_pred_col(text).alias("lang_pred"),
        quality_score_col(text).alias("quality_score"),
        token_count_col(text).alias("n_tokens"),
    )


def corpus_prep(
    docs: DataFrame,
    *,
    min_quality: float = 0.3,
    langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
) -> DataFrame:
    """Exact-dedup → quality gate → language gate → token count.

    Keeps the smallest doc_id per identical text (same keeper rule as
    functions/dedup.py exact_dup_groups), then filters to documents with
    ``quality_score >= min_quality`` and a predicted language in
    ``langs``.  Output: (doc_id, lang_pred, quality_score, n_tokens).

    Plan: one projection + one row_number window shuffled on the
    content hash (uniform key — md5 — so no skew), then a narrow filter.
    """
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    return (
        doc_features(docs, text_col)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(
            (F.col("quality_score") >= min_quality)
            & F.col("lang_pred").isin(*langs)
        )
        .select("doc_id", "lang_pred", "quality_score", "n_tokens")
    )


def _sample_key(order_col: str = "doc_id") -> F.Column:
    """Deterministic shuffle order: md5 of the doc id (uniform, stable)."""
    return F.md5(F.col(order_col).cast("string"))


def token_budget_sample(
    docs: DataFrame,
    budget_tokens: int,
    *,
    text_col: str = "text",
    two_phase: bool = True,
    n_prefix_buckets: int = 256,
) -> DataFrame:
    """Deterministic per-language token-budget sample.

    Orders each language's documents by md5(doc_id) — a fixed, uniform
    pseudo-random order — and keeps the prefix whose running token sum
    stays within ``budget_tokens``.  Output: (doc_id, lang_pred,
    n_tokens, cum_tokens) where cum_tokens includes the current doc.

    ``two_phase=False`` is the literal single-window semantics (the
    oracle form).  ``two_phase=True`` computes the same rows with a
    bucketed two-phase plan: per (lang, md5-prefix) token totals (tiny
    aggregate with map-side combine), a cumulative scan over that
    histogram to classify each bucket as fully-in / boundary / out.
    Buckets past the budget are dropped before any sort; surviving
    buckets compute their running sums independently (256 parallel
    bounded sorts, offset by the histogram prefix) instead of one
    single-task sort per language.
    """
    feat = docs.select(
        "doc_id",
        lang_pred_col(F.col(text_col)).alias("lang_pred"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
        _sample_key().alias("skey"),
    )
    if not two_phase:
        w = Window.partitionBy("lang_pred").orderBy("skey", "doc_id")
        return (
            feat.withColumn("cum_tokens", F.sum("n_tokens").over(w))
            .filter(F.col("cum_tokens") <= budget_tokens)
            .select("doc_id", "lang_pred", "n_tokens", "cum_tokens")
        )

    # phase 1: histogram of token totals per (lang, hash-prefix bucket)
    n_hex = max(1, min(4, (n_prefix_buckets.bit_length() - 1 + 3) // 4))
    feat = feat.withColumn("pfx", F.substring("skey", 1, n_hex))
    hist = (
        feat.groupBy("lang_pred", "pfx")
        .agg(F.sum("n_tokens").alias("bucket_tokens"))
    )
    wb = (
        Window.partitionBy("lang_pred")
        .orderBy("pfx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bounds = hist.select(
        "lang_pred",
        "pfx",
        F.coalesce(F.sum("bucket_tokens").over(wb), F.lit(0)).alias(
            "tokens_before"
        ),
        "bucket_tokens",
    )
    # phase 2: whole buckets below the boundary pass sort-free; the
    # boundary bucket (tokens_before < budget < tokens_before + bucket)
    # gets the exact ordered window with its global offset added.
    joined = feat.join(F.broadcast(bounds), ["lang_pred", "pfx"])
    full_in = joined.filter(
        F.col("tokens_before") + F.col("bucket_tokens") <= budget_tokens
    )
    # <= (not <) so zero-token docs sitting exactly at the budget line
    # match the single-window semantics
    boundary = joined.filter(
        (F.col("tokens_before") <= budget_tokens)
        & (F.col("tokens_before") + F.col("bucket_tokens") > budget_tokens)
    )
    win = Window.partitionBy("lang_pred", "pfx").orderBy("skey", "doc_id")
    full_rows = full_in.withColumn(
        "cum_tokens",
        F.col("tokens_before") + F.sum("n_tokens").over(win),
    )
    boundary_rows = (
        boundary.withColumn(
            "cum_tokens",
            F.col("tokens_before") + F.sum("n_tokens").over(win),
        )
        .filter(F.col("cum_tokens") <= budget_tokens)
    )
    return full_rows.unionByName(boundary_rows).select(
        "doc_id", "lang_pred", "n_tokens", "cum_tokens"
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_chars: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """Split each document into fixed-size character windows with
    overlap — the pre-tokenization chunker every training pipeline runs
    before embedding/packing.  Pure narrow explode (sequence →
    substring): no shuffle at any scale, output rows ≈ chars/stride.

    Emits (doc_id, chunk_id, chunk_start, chunk_text, n_chunks)."""
    stride = chunk_chars - overlap
    n_chunks = F.greatest(
        F.ceil(
            (F.length(F.col(text_col)) - F.lit(overlap))
            / F.lit(float(stride))
        ),
        F.lit(1),
    ).cast("int")
    return df.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.col(text_col).substr(
                    i * stride + 1, F.lit(chunk_chars)
                ),
            )
        ).alias("chunk_id", "chunk_text"),
        n_chunks.alias("n_chunks"),
    ).select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * stride).alias("chunk_start"),
        "chunk_text",
        "n_chunks",
    )


def global_shuffle(
    df: DataFrame,
    n_shards: int = 8,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global shuffle for training-order randomization:
    every document gets a content-free pseudo-random sort key
    (md5(seed, doc_id)), a writer shard, and its 0-based position within
    the shard.  The global order is (shard, shard_pos) — rerunning on a
    rebalanced cluster, or with a different input partitioning, yields
    the IDENTICAL permutation, and a new ``seed`` yields an independent
    one (epoch reshuffling).

    Scale shape: a single global ``row_number`` would serialize through
    one partition — instead the hash key both assigns the shard AND
    orders within it, so the one exchange is shard-keyed and each
    shard's window sorts independently (exactly how parallel dataset
    writers emit shuffled shards)."""
    from metrics_advisor_spark.functions.dedup import _hash56

    key = _hash56(
        F.concat_ws("_", F.lit(str(seed)), F.col(id_col).cast("string"))
    )
    w = Window.partitionBy("shard").orderBy("sort_key", id_col)
    return (
        df.select(
            id_col,
            F.pmod(key, F.lit(n_shards)).cast("long").alias("shard"),
            key.alias("sort_key"),
        )
        .withColumn(
            "shard_pos", (F.row_number().over(w) - 1).cast("long")
        )
    )


def sequence_packing(
    df: DataFrame,
    text_col: str = "text",
    budget_tokens: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic sequence-packing assignment: documents (in doc_id
    order) fill training sequences of ``budget_tokens`` by cumulative
    token count — bin = floor((cumsum − n_tokens) / budget).

    This is the streaming-order approximation of bin packing (what
    packed-dataset builders actually do); it is fully deterministic,
    one window cumsum + one aggregate.  At 100 TB the cumsum window is
    the scale risk (single global ordering) — shard first by
    hash(doc_id) % ``n_shards`` (mirroring parallel dataset writers),
    then cumsum within shard: the shard key keeps every partition's
    window independent.  The md5-derived hash works for any doc_id type
    (string ids included) and is engine-portable (same expression in the
    DuckDB oracle).  Emits per-bin stats: (shard, bin_id, n_docs,
    bin_tokens)."""
    from metrics_advisor_spark.functions.dedup import _hash56
    from metrics_advisor_spark.functions.text import token_count_col

    toks = df.select(
        "doc_id",
        (_hash56(F.col("doc_id").cast("string")) % n_shards).alias("shard"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = toks.withColumn(
        "bin_id",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens"))
            / F.lit(budget_tokens)
        ).cast("long"),
    )
    return binned.groupBy("shard", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("bin_tokens"),
    )


def packed_sequences(
    df: DataFrame,
    text_col: str = "text",
    budget_tokens: int = 1024,
    n_shards: int = 8,
) -> DataFrame:
    """GPT-style sequence packing WITH document-boundary attention-mask
    metadata — the corpus-prep step real pretraining pipelines need
    beyond `sequence_packing`'s per-bin stats (r06 verdict item 8).

    Semantics: per shard, documents concatenate in doc_id order into a
    token stream chunked into fixed ``budget_tokens`` sequences;
    documents may straddle sequences (the standard concat-and-chunk
    layout), and attention resets at document boundaries.  For EVERY
    sequence — including ones fully interior to a long document, which
    contain no doc start — emit:

      (shard, bin_id, n_docs, fill, doc_ids, doc_starts, doc_lens,
       carry_doc_id, cu_seqlens)

    ``doc_ids``/``doc_starts``/``doc_lens`` describe the docs STARTING
    in the sequence (offsets within it); ``carry_doc_id`` is the doc
    whose tokens carry in at offset 0 (null at a clean boundary);
    ``cu_seqlens`` is the flash-attention-style cumulative-boundary
    vector ([0, b1, …, fill]) from which the block-diagonal mask is
    reconstructed; ``fill`` < budget only on a shard's last sequence.

    Scale: one cumsum window per shard (sharding keeps windows
    independent — the parallel-dataset-writer layout), one groupBy
    whose per-bin arrays are bounded by ``budget_tokens`` (every doc
    listed has ≥1 token in-bin), a tiny per-shard sequence explode
    (total rows = corpus_tokens/budget), and one per-bin carry window.
    All folds/array orders deterministic; mirrored exactly by the
    DuckDB oracle."""
    from metrics_advisor_spark.functions.dedup import _hash56
    from metrics_advisor_spark.functions.text import token_count_col

    budget = F.lit(budget_tokens)
    toks = df.select(
        "doc_id",
        (_hash56(F.col("doc_id").cast("string")) % n_shards).alias("shard"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
    ).where(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = toks.withColumn(
        "g", F.sum("n_tokens").over(w) - F.col("n_tokens")
    ).select(
        "shard",
        "doc_id",
        "n_tokens",
        F.floor(F.col("g") / budget).cast("long").alias("bin_id"),
        F.pmod(F.col("g"), budget).cast("long").alias("off"),
    )
    started = pos.groupBy("shard", "bin_id").agg(
        F.sort_array(
            F.collect_list(F.struct("off", "doc_id", "n_tokens"))
        ).alias("ds")
    )
    # materialize EVERY sequence, including doc-interior ones with no
    # doc start (a doc longer than the budget spans several)
    bins = (
        toks.groupBy("shard")
        .agg(F.sum("n_tokens").alias("shard_tokens"))
        .select(
            "shard",
            "shard_tokens",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.ceil(F.col("shard_tokens") / budget).cast("long")
                    - 1,
                )
            ).alias("bin_id"),
        )
    )
    full = bins.join(started, ["shard", "bin_id"], "left").select(
        "shard",
        "bin_id",
        F.least(
            budget.cast("long"),
            F.col("shard_tokens") - F.col("bin_id") * budget,
        ).alias("fill"),
        F.coalesce(
            "ds",
            F.array().cast(
                "array<struct<off:bigint,doc_id:bigint,n_tokens:int>>"
            ),
        ).alias("ds"),
    )
    carry_w = (
        Window.partitionBy("shard")
        .orderBy("bin_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_carry = full.withColumn(
        "_last_started",
        F.when(F.size("ds") > 0, F.element_at("ds", -1)["doc_id"]),
    ).withColumn(
        "_carry_in",
        F.size("ds").eqNullSafe(0)
        | (F.element_at("ds", 1)["off"] > 0),
    ).withColumn(
        "carry_doc_id",
        F.when(
            F.col("_carry_in"),
            F.last("_last_started", ignorenulls=True).over(carry_w),
        ),
    )
    offs = F.transform("ds", lambda v: v.off)
    return with_carry.select(
        "shard",
        "bin_id",
        F.size("ds").cast("long").alias("n_docs"),
        "fill",
        F.transform("ds", lambda v: v.doc_id).alias("doc_ids"),
        offs.alias("doc_starts"),
        F.transform("ds", lambda v: v.n_tokens.cast("long")).alias(
            "doc_lens"
        ),
        "carry_doc_id",
        F.concat(
            F.when(F.col("_carry_in"), F.array(F.lit(0).cast("long")))
            .otherwise(F.array().cast("array<bigint>")),
            offs,
            F.array(F.col("fill")),
        ).alias("cu_seqlens"),
    )


def curriculum_plan(
    docs: DataFrame, n_stages: int = 5, text_col: str = "text"
) -> DataFrame:
    """Curriculum staging: bucket the corpus into quality bands and
    report each stage's document and token budget — the plan a
    quality-ordered training run (easy/clean first, noisy last) is
    scheduled from.

    Stage boundaries are exact corpus quantiles of the 6dp-rounded
    quality score (cut array broadcast; stage = 1 + #{cuts below}),
    NOT a global ntile sort — same scale-safe assignment as
    `operators.sessions.rfm_segments`.  Stage 1 = lowest-quality band,
    stage n = highest; ties at a cut share a stage.
    """
    from metrics_advisor_spark.functions.text import (
        quality_score_col,
        token_count_col,
    )

    qs = [i / n_stages for i in range(1, n_stages)]
    scored = docs.select(
        "doc_id",
        F.round(quality_score_col(F.col(text_col)), 6).alias("q"),
        token_count_col(F.col(text_col)).alias("n_tokens"),
    )
    cuts = scored.agg(
        F.transform(
            F.percentile("q", F.array(*[F.lit(x) for x in qs])),
            lambda c: F.round(c, 6),
        ).alias("cuts")
    )
    staged = scored.crossJoin(F.broadcast(cuts)).select(
        (
            F.size(F.filter(F.col("cuts"), lambda c: F.col("q") > c)) + 1
        ).alias("stage"),
        "q",
        "n_tokens",
    )
    return staged.groupBy("stage").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("stage_tokens"),
        F.round(F.min("q"), 6).alias("min_q"),
        F.round(F.max("q"), 6).alias("max_q"),
    )
