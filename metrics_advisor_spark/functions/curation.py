"""Corpus-curation operators for LLM training-data pipelines.

The standard curation ladder between raw crawl and tokenizer: PII
redaction, Gopher-style quality gating, within-document repetition
measurement, benchmark decontamination, stratified downsampling, and
corpus-level line deduplication (the CCNet trick of dropping boilerplate
lines that repeat across many documents).

Everything is built from JVM-side ``pyspark.sql.functions`` expressions
(regexes, array HOFs, hash aggregates) — no Python in the hot path — so
every operator is also ANSI-SQL-expressible for the DuckDB oracle.

Scale design (100 TB corpus):
- ``pii_scrub`` / ``quality_flags`` / ``ngram_repetition``: narrow
  per-document projections or one doc-keyed aggregate; embarrassingly
  parallel, no skew risk (keys are doc ids).
- ``contamination_check``: inverted-index join on shingle hashes where
  one side is a benchmark suite (MMLU-sized, i.e. tiny) — the benchmark
  shingle set broadcasts, so the scan side never shuffles.
- ``stratified_sample``: two passes — a stratum-count aggregate (rows =
  #strata, broadcasts back) and a stateless hash-threshold filter.
  Deterministic: membership depends only on doc_id, never on partition
  layout or RNG state.
- ``line_dedup``: the one genuinely shuffle-heavy op (explode lines →
  count line doc-frequency → rejoin).  Line df counts are computed from
  per-document *distinct* lines so a single spammy document cannot
  promote its own repeated line past the threshold, and hot boilerplate
  lines (the skew risk) are exactly the rows AQE skew-join splits.

Reference analogue: the reference pipeline (/root/reference/
metrics_advisor.py) has no corpus operators; these extend SURVEY §2's
beyond-reference training-data family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from metrics_advisor_spark.functions.dedup import _hash56, shingle
from metrics_advisor_spark.functions.text import LANG_STOPWORDS

# Regexes shared with the DuckDB oracle: kept inside the common
# Java-regex / RE2 subset (no backrefs, no lookaround, ASCII classes)
# so both engines match identically.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
PHONE_RE = "\\+[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"


def _count_re(col: F.Column, pattern: str) -> F.Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), 0))


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and redact emails / IPv4 addresses / phone numbers.

    Counts are taken on the raw text; redaction applies email → ip →
    phone in that fixed order (phone runs last so an IP inside an
    already-redacted token can't be double-counted).  Pure
    ``regexp_replace`` projection — linear scan, no shuffle.
    """
    t = F.col(text_col)
    redacted = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    redacted = F.regexp_replace(redacted, IPV4_RE, "<IP>")
    redacted = F.regexp_replace(redacted, PHONE_RE, "<PHONE>")
    return df.select(
        "doc_id",
        _count_re(t, EMAIL_RE).alias("n_emails"),
        _count_re(t, IPV4_RE).alias("n_ipv4"),
        _count_re(t, PHONE_RE).alias("n_phones"),
        redacted.alias("redacted_text"),
    )


def ngram_repetition(
    df: DataFrame, text_col: str = "text", n: int = 3
) -> DataFrame:
    """Within-document repetition: fraction of duplicate word n-grams.

    The Gopher repetition signal: dup_frac = 1 − distinct/total over the
    document's n-gram multiset.  One doc-keyed aggregate over the
    (non-distinct) shingle stream; count-distinct on 56-bit hashes is
    exact at any document length that fits a task.
    """
    sh = shingle(df, text_col=text_col, n=n, distinct=False)
    return sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_ngrams"),
        F.count_distinct("shingle_hash").alias("n_distinct"),
        F.round(
            F.lit(1.0) - F.count_distinct("shingle_hash") / F.count(F.lit(1)),
            6,
        ).alias("dup_frac"),
    )


def quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style document quality gates as boolean flags.

    Four cheap rules (word-count bounds, mean word length band, fraction
    of words containing a letter, minimum stopword hits) and their
    conjunction ``pass_quality``.  Thresholds are the Gopher defaults
    scaled to short synthetic documents.  Narrow projection, no shuffle.
    """
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    mean_wl = F.length(F.regexp_replace(F.col(text_col), " ", "")) / F.greatest(
        n_words, F.lit(1)
    )
    alpha_frac = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ) / F.greatest(n_words, F.lit(1))
    n_stop = F.size(
        F.filter(words, lambda w: w.isin(*LANG_STOPWORDS["en"]))
    )
    f_words = (n_words >= min_words) & (n_words <= max_words)
    f_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    f_alpha = alpha_frac >= min_alpha_frac
    f_stop = n_stop >= min_stopwords
    return df.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.alias("n_stopwords"),
        f_words.alias("flag_words"),
        f_wl.alias("flag_word_len"),
        f_alpha.alias("flag_alpha"),
        f_stop.alias("flag_stopwords"),
        (f_words & f_wl & f_alpha & f_stop).alias("pass_quality"),
    )


def contamination_check(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: word-n-gram overlap per document.

    The GPT-3-style check — a document is contaminated when it shares
    word n-grams with an evaluation benchmark.  Returns one row per
    contaminated document: distinct overlapping shingles, the document's
    own distinct-shingle count, and the overlap fraction.

    The benchmark shingle set is aggregated first (benchmark suites are
    tiny relative to the corpus) and broadcast, so the corpus-side scan
    joins without a shuffle; per-doc counting shuffles once on doc_id.
    """
    doc_sh = shingle(df, text_col=text_col, n=n, distinct=True)
    bench_sh = (
        shingle(benchmark, text_col=text_col, n=n, distinct=False)
        .select("shingle_hash")
        .distinct()
    )
    totals = doc_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        doc_sh.join(F.broadcast(bench_sh), "shingle_hash")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        hits.join(totals, "doc_id")
        .select(
            "doc_id",
            "n_overlap",
            "n_shingles",
            F.round(F.col("n_overlap") / F.col("n_shingles"), 6).alias(
                "contam_frac"
            ),
        )
    )


def build_bloom(
    hashes: DataFrame,
    m_bits: int,
    k: int = 7,
    hash_col: str = "shingle_hash",
) -> DataFrame:
    """Build a Bloom filter over a column of integer hashes as a 1-row
    DataFrame holding a bit-packed ``array<long>`` of ``m_bits`` bits.

    Spark exposes no public bloom aggregate (``bloom_filter_agg`` is
    internal to runtime join filters), so this composes one from
    built-ins: double hashing pos_j = (h1 + j·h2) mod m (Kirsch &
    Mitzenmacher 2006 — k probe positions from two derived hashes),
    explode over j, OR the bit masks per 64-bit word, densify against a
    ``range(m/64)`` and fold into one sorted array.  Everything stays in
    codegen; the result is a few hundred KB to broadcast regardless of
    the input's size.
    """
    n_words = (m_bits + 63) // 64
    h1 = F.pmod(F.col(hash_col), F.lit(m_bits))
    h2 = F.lit(1) + F.pmod(
        F.floor(F.col(hash_col) / m_bits), F.lit(m_bits - 1)
    )
    probes = hashes.select(
        h1.alias("_h1"), h2.alias("_h2"),
        F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_j"),
    )
    pos = F.pmod(F.col("_h1") + F.col("_j") * F.col("_h2"), F.lit(m_bits))
    sparse = (
        probes.select(pos.alias("_pos"))
        .select(
            F.floor(F.col("_pos") / 64).cast("long").alias("_word"),
            # shiftleft's python API takes only a literal shift — the
            # column-shift form exists in SQL only
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(_pos % 64 AS INT))"
            ).alias("_mask"),
        )
        .groupBy("_word")
        .agg(F.expr("bit_or(_mask)").alias("_bits"))
    )
    spark = hashes.sparkSession
    dense = (
        spark.range(n_words)
        .withColumnRenamed("id", "_word")
        .join(sparse, "_word", "left")
        .select("_word", F.coalesce("_bits", F.lit(0)).alias("_bits"))
    )
    return dense.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("_word", "_bits"))),
            lambda s: s["_bits"],
        ).alias("bits")
    )


def bloom_probe_col(
    hash_expr: str, m_bits: int, k: int = 7, bits_col: str = "bits"
) -> F.Column:
    """Membership probe against a broadcast :func:`build_bloom` row: true
    iff ALL k double-hashed bit positions are set (may false-positive at
    the design rate, never false-negative).  ``hash_expr`` is a SQL
    expression string naming the hash column (the column-shift form of
    shiftrightunsigned exists only in SQL)."""
    h1 = f"pmod({hash_expr}, {m_bits})"
    h2 = (
        f"(1 + pmod(CAST(floor({hash_expr} / {m_bits}) AS BIGINT), "
        f"{m_bits - 1}))"
    )
    conds = []
    for j in range(k):
        pos = f"pmod({h1} + {j} * {h2}, {m_bits})"
        word = f"element_at({bits_col}, CAST(floor({pos} / 64) AS INT) + 1)"
        conds.append(
            f"((shiftrightunsigned({word}, CAST({pos} % 64 AS INT)) & 1)"
            f" = 1)"
        )
    return F.expr(" AND ".join(conds))


def bloom_contamination_check(
    df: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 5,
    m_bits: int = 1 << 20,
    k: int = 7,
) -> DataFrame:
    """:func:`contamination_check` with a Bloom-filter prefilter — the
    100 TB-benchmark variant.

    When the benchmark suite is too large to broadcast raw (hundreds of
    eval sets × long prompts), broadcast a bit-packed Bloom filter of
    its shingle hashes instead (~m_bits/8 bytes, vs 8 bytes/shingle for
    the raw set): the corpus-side scan drops every shingle the filter
    rejects BEFORE the shuffle join, so the exact join sees only true
    hits plus the ~fpp false-positive trickle.  The exact join still
    runs — false positives are removed, so the output is IDENTICAL to
    the exact check (shared oracle); the bloom only cuts shuffled rows.
    """
    doc_sh = shingle(df, text_col=text_col, n=n, distinct=True)
    bench_sh = (
        shingle(benchmark, text_col=text_col, n=n, distinct=False)
        .select("shingle_hash")
        .distinct()
    )
    bloom = build_bloom(bench_sh, m_bits=m_bits, k=k)
    prefiltered = (
        doc_sh.crossJoin(F.broadcast(bloom))
        .filter(bloom_probe_col("shingle_hash", m_bits, k))
        .drop("bits")
    )
    totals = doc_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        prefiltered.join(bench_sh, "shingle_hash")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return hits.join(totals, "doc_id").select(
        "doc_id",
        "n_overlap",
        "n_shingles",
        F.round(F.col("n_overlap") / F.col("n_shingles"), 6).alias(
            "contam_frac"
        ),
    )


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Training-mixture planning: given target mixture ``weights`` per
    source and a total ``token_budget``, compute each source's token
    allocation, sampling rate and epoch count (rate > 1 means the
    source repeats — the Llama/DoReMi-style data recipe table).

    One token-count aggregate keyed by source (narrow projection, no
    shuffle beyond the aggregate) joined to the broadcast weight list;
    everything downstream of this plan (stratified/weighted sampling,
    packing) already exists as operators.
    """
    from metrics_advisor_spark.functions.text import token_count_col

    spark = df.sparkSession
    total_w = sum(weights.values())
    wdf = spark.createDataFrame(
        [(s, float(w) / total_w) for s, w in sorted(weights.items())],
        f"{source_col} string, weight double",
    )
    avail = df.select(
        source_col, token_count_col(F.col(text_col)).alias("_tok")
    ).groupBy(source_col).agg(
        F.sum("_tok").cast("long").alias("available_tokens")
    )
    target = F.round(F.col("weight") * token_budget).cast("long")
    rate = F.try_divide(target, F.col("available_tokens"))
    return avail.join(F.broadcast(wdf), source_col).select(
        source_col,
        "available_tokens",
        target.alias("target_tokens"),
        F.round(rate, 6).alias("sampling_rate"),
        F.ceil(rate).cast("long").alias("n_epochs"),
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str = "lang",
    cap: int = 30,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum downsampling to ~``cap`` docs each.

    Every stratum gets rate = min(1, cap/count); a document is kept when
    its content-free hash coordinate u = md5(doc_id)/2^56 falls below
    the stratum's rate.  Membership is a pure function of doc_id — rerun
    a month later on a rebalanced cluster, the sample is identical —
    and expected stratum sizes are cap·(1 ± O(1/√cap)).

    Two-pass plan: stratum counts (rows = #strata → broadcast back) then
    a stateless filter; no global sort, no RNG.
    """
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("n_stratum"))
    rate = F.least(F.lit(1.0), F.lit(float(cap)) / F.col("n_stratum"))
    u = _hash56(F.col(id_col).cast("string")) / F.lit(float(1 << 56))
    return (
        df.join(F.broadcast(counts), stratum_col)
        .filter(u < rate)
        .select(
            id_col,
            stratum_col,
            "n_stratum",
            F.round(u, 6).alias("sample_key"),
        )
    )


def line_dedup(
    df: DataFrame, text_col: str = "text", min_df: int = 2
) -> DataFrame:
    """Corpus-level line deduplication (CCNet boilerplate removal).

    Drops every line that appears in ≥ ``min_df`` distinct documents
    (headers, footers, cookie banners) and reassembles the survivors in
    original order.  Returns (doc_id, clean_text, n_kept, n_dropped);
    documents whose lines are all boilerplate survive with empty text.

    Plan: posexplode lines → line-keyed doc-frequency aggregate (distinct
    lines per doc first, so a document repeating its own line can't
    self-promote it past the threshold) → hash-join back → doc-keyed
    reassembly.  Hot boilerplate lines are the skew case AQE skew-join
    splits; the df table is usually small enough to broadcast outright.
    """
    lines = df.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    )
    ldf = (
        lines.select("doc_id", "line")
        .distinct()
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("line_df"))
    )
    kept = (
        lines.join(ldf, "line")
        .filter(F.col("line_df") < min_df)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "line"))),
                    lambda s: s.line,
                ),
                "\n",
            ).alias("clean_text"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    )
    totals = lines.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_lines"))
    return (
        totals.join(kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str = "n_chars",
    k: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (Efraimidis–Spirakis A-ES): key = u^(1/w) with u a content-free
    uniform from md5(doc_id); keep the k largest keys.

    Inclusion probability rises with weight, membership is a pure
    function of (doc_id, weight) — reproducible across reruns and
    cluster layouts.  Plan: one narrow projection + a distributed
    TakeOrdered top-k; no global sort, no RNG state.

    A-ES is defined for POSITIVE weights only: zero/negative/null weights
    would yield inf/NaN/null sort keys that silently distort membership,
    so such rows are filtered out up front (mirrored in the oracle SQL).
    """
    u = (_hash56(F.col(id_col).cast("string")) + 1) / F.lit(float(1 << 56))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col).cast("double"))
    return (
        df.filter(F.col(weight_col) > 0)
        .select(
            id_col,
            F.col(weight_col).alias("weight"),
            F.round(key, 6).alias("sample_key"),
            key.alias("_k"),
        )
        .orderBy(F.col("_k").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_k")
    )


def source_stats(df: DataFrame) -> DataFrame:
    """Per-source curation dashboard: volume, size, quality and exact-dup
    profile per provenance bucket — the first table any corpus triage
    produces.  One md5 projection + one hash aggregate keyed by source
    (provenance cardinality is small → no skew concern; the dup-rate
    needs no self-join because count(*) − count(DISTINCT hash) IS the
    duplicate count)."""
    from metrics_advisor_spark.functions.text import quality_score_col

    return (
        df.select(
            "source",
            "lang",
            F.length("text").alias("n_chars"),
            quality_score_col(F.col("text")).alias("q"),
            F.md5("text").alias("h"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.round(F.avg("q"), 6).alias("avg_quality"),
            F.countDistinct("lang").alias("n_langs"),
            (F.count(F.lit(1)) - F.countDistinct("h")).alias("n_exact_dups"),
        )
    )


def train_val_test_split(
    df: DataFrame,
    id_col: str = "doc_id",
    fractions: tuple[float, float] = (0.8, 0.1),
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment from a content-free id
    hash — the standard "salted hash mod" split every training pipeline
    needs so re-runs (and late-arriving shards) land each document in
    the SAME split.

    ``fractions`` = (train, val); test gets the remainder.  The
    assignment is a pure narrow projection on the md5 of the id — no
    shuffle, no RNG, reproducible across engines (same trick as
    `stratified_sample`, functions/curation.py:377).
    """
    u = _hash56(F.col(id_col).cast("string")) / F.lit(float(1 << 56))
    train_f, val_f = fractions
    split = (
        F.when(u < train_f, F.lit("train"))
        .when(u < train_f + val_f, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn(out_col, split)


def canonical_representatives(
    df: DataFrame, pairs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Quality-aware canonical selection: within each near-dup cluster
    keep the HIGHEST-QUALITY member (not the arbitrary min-id member) —
    the curation policy real pipelines want, since the truncated /
    mangled variant often has the smaller id.

    ``pairs`` is any verified near-dup pair set (jaccard_pairs,
    minhash_lsh_pairs + verify, …); clusters come from transitive
    closure (`propagate_labels`).  Ordering inside a cluster is the
    6dp-rounded quality score, doc_id ascending on ties — deterministic
    and engine-neutral.

    Scale: closure over the (tiny, pair-shaped) edge set; the corpus
    itself is touched once for the score projection and once for the
    label join — never paired.
    """
    from metrics_advisor_spark.functions.dedup import propagate_labels
    from metrics_advisor_spark.functions.text import quality_score_col

    labels = propagate_labels(pairs)
    scored = df.select(
        "doc_id",
        F.round(quality_score_col(F.col(text_col)), 6).alias("q"),
    )
    member = scored.join(labels, "doc_id", "left").select(
        "doc_id", "q", F.coalesce("label", "doc_id").alias("cluster")
    )
    return member.groupBy("cluster").agg(
        F.max_by(
            "doc_id", F.struct(F.col("q"), (-F.col("doc_id")).alias("nid"))
        ).alias("canonical_id"),
        F.max("q").alias("best_quality"),
        F.count("*").cast("long").alias("n_members"),
    )


def weighted_quantile(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    group_col: str = "source",
    q: float = 0.5,
) -> DataFrame:
    """Weighted quantile per group: the smallest value whose cumulative
    weight reaches q·total — e.g. the TOKEN-weighted median quality
    score, which answers "what quality is the typical TOKEN exposed
    to", not "the typical document" (long docs dominate training; the
    unweighted median hides that).

    One cumulative-weight window per group over the (value, tiebreak)
    sort — each group's axis sorts independently — then a min_by pick
    of the crossing row; deterministic for any weight distribution.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(group_col)
        .orderBy("v", "wt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = Window.partitionBy(group_col)
    base = df.select(
        group_col,
        F.col(value_col).alias("v"),
        F.col(weight_col).cast("double").alias("wt"),
    )
    cum = base.select(
        group_col,
        "v",
        F.sum("wt").over(w).alias("cw"),
        F.sum("wt").over(t).alias("tw"),
    )
    return (
        cum.where(F.col("cw") >= q * F.col("tw"))
        .groupBy(group_col)
        .agg(
            F.round(F.min("v"), 6).alias(f"wq{int(q * 100)}"),
            F.round(F.max("tw"), 6).alias("total_weight"),
        )
    )


def holdout_leakage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fractions: tuple[float, float] = (0.8, 0.1),
) -> DataFrame:
    """Train→eval leakage check: exact-content duplicate groups that
    SPAN the hash split — the hygiene audit that catches "the test set
    is in the training set" before anyone reports a score.  (The id
    hash is content-free, so duplicates land in independent splits;
    dedup-then-split is the fix this table motivates.)

    One md5 aggregate over the split-assigned corpus: per content hash,
    docs per split; groups with train AND (val|test) members leak.
    Output: one row per split-pair leak type + the clean-group row.
    """
    assigned = train_val_test_split(df, id_col, fractions)
    per = assigned.groupBy(F.md5(F.col(text_col)).alias("h")).agg(
        F.sum((F.col("split") == "train").cast("long")).alias("n_train"),
        F.sum((F.col("split") == "val").cast("long")).alias("n_val"),
        F.sum((F.col("split") == "test").cast("long")).alias("n_test"),
    )
    kind = (
        F.when((F.col("n_train") > 0) & (F.col("n_test") > 0),
               F.lit("train_test_leak"))
        .when((F.col("n_train") > 0) & (F.col("n_val") > 0),
              F.lit("train_val_leak"))
        .when((F.col("n_val") > 0) & (F.col("n_test") > 0),
              F.lit("val_test_leak"))
        .otherwise(F.lit("clean"))
    )
    return (
        per.select(kind.alias("kind"))
        .groupBy("kind")
        .agg(F.count("*").cast("long").alias("n_groups"))
    )


def pii_density_by_source(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source PII exposure: share of documents containing any
    email/IPv4/phone match and the mean matches per document — the
    slice-level risk table that decides which sources need scrubbing
    before release.

    Same regex projections as `pii_scrub`, aggregated per source —
    linear scan, one bounded-key aggregate.
    """
    t = F.col(text_col)
    n_pii = (
        _count_re(t, EMAIL_RE) + _count_re(t, IPV4_RE)
        + _count_re(t, PHONE_RE)
    )
    return (
        df.select(F.col(source_col).alias("source"), n_pii.alias("n_pii"))
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("n_pii") > 0).cast("long")).alias("n_docs_with_pii"),
            F.round(
                F.sum((F.col("n_pii") > 0).cast("double")) / F.count("*"), 6
            ).alias("pii_doc_share"),
            F.round(F.sum("n_pii") / F.count("*"), 6).alias("pii_per_doc"),
        )
    )


def dedup_savings(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row exact-dedup savings report: documents and tokens before
    vs after keeping one representative per content hash — the headline
    number a dedup stage reports to justify itself.

    One md5 aggregate (per-group doc count + token sum + one kept
    token count via min_by), then a 1-row rollup.
    """
    from metrics_advisor_spark.functions.text import token_count_col

    per = df.select(
        F.md5(F.col(text_col)).alias("h"),
        F.col("doc_id"),
        token_count_col(F.col(text_col)).alias("n_tok"),
    ).groupBy("h").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("tok_all"),
        F.min_by("n_tok", "doc_id").alias("tok_kept"),
    )
    return per.agg(
        F.sum("n_docs").cast("long").alias("docs_before"),
        F.count("*").cast("long").alias("docs_after"),
        F.sum("tok_all").cast("long").alias("tokens_before"),
        F.sum("tok_kept").cast("long").alias("tokens_after"),
        F.round(
            1 - F.sum("tok_kept") / F.sum("tok_all"), 6
        ).alias("token_savings"),
    )
