"""Distributed BPE tokenizer induction — the vocabulary-training step
of an LLM data pipeline, expressed as declarative DataFrame plans.

Byte-pair encoding (Sennrich et al. 2016, ACL — public algorithm):
start from a character segmentation of every distinct word, then
repeatedly (1) count adjacent symbol pairs corpus-wide weighted by word
frequency, (2) take the most frequent pair, (3) merge every
non-overlapping left-to-right occurrence.  The reference
implementation's regex substitution merges occurrences left-to-right
without overlap, which is exactly the semantics of `replace` on a
delimiter-wrapped symbol string (each symbol stored as ``\\x01sym\\x01``
concatenated, so no two pair occurrences ever share characters) — that
representation is what makes BOTH the Spark plan and the ANSI-SQL
oracle express the merge step as a plain string replace, with no UDF.

Scale: the corpus-sized work is ONE word-frequency aggregation (a
groupBy over tokenized text — the only stage that sees all 100 TB).
Every merge iteration then runs over the DISTINCT-WORD table (bounded
by vocabulary size, millions of rows at worst, partition-parallel),
with the winning pair attached as a 1-row broadcast — the same
scalar-attach pattern as the engine's other fixpoint loops.  The
iteration count is a fixed hyperparameter (n_merges), so the lineage
is a bounded unrolled chain; `localCheckpoint` every few rounds cuts
it for large merge counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Symbol delimiter: each segmentation symbol is stored wrapped as
# SEP+sym+SEP and concatenated, e.g. the word "low" starts as
# "\x01l\x01\x01o\x01\x01w\x01".  \x01 never occurs in text.
SEP = "\x01"


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    """(word, wn): corpus word frequencies — the single corpus-sized
    aggregation; everything after runs on the distinct-word table."""
    return (
        df.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wn"))
    )


def _char_wrap(col: F.Column) -> F.Column:
    """Initial segmentation: every character wrapped in SEP."""
    chars = F.filter(F.split(col, ""), lambda c: c != "")
    return F.concat_ws(
        "", F.transform(chars, lambda c: F.concat(F.lit(SEP), c, F.lit(SEP)))
    )


def _pair_counts(seg: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the current segmentation,
    weighted by word frequency: (left, right, pair_count)."""
    syms = F.split(
        F.expr(f"substring(seg, 2, length(seg) - 2)"), SEP + SEP
    )
    pairs = F.filter(
        F.zip_with(
            syms,
            F.slice(F.concat(syms, F.array(F.lit(None))), 2, 1000000),
            lambda a, b: F.struct(a.alias("l"), b.alias("r")),
        ),
        lambda p: p["r"].isNotNull(),
    )
    return (
        seg.select("wn", F.explode(pairs).alias("p"))
        .groupBy(
            F.col("p.l").alias("left"), F.col("p.r").alias("right")
        )
        .agg(F.sum("wn").alias("pair_count"))
    )


def bpe_train(
    df: DataFrame,
    n_merges: int = 6,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns (merges, seg): ``merges`` is (it, left, right, pair_count)
    — iteration-ordered, ties broken (count desc, left asc, right asc)
    so the result is fully deterministic — and ``seg`` is the final
    (word, wn, seg) distinct-word segmentation table.

    Each iteration aggregates pair counts over the PERSISTED
    distinct-word table and brings back exactly ONE row (the winning
    pair) — the same one-scalar-per-round driver pattern as the
    engine's fixpoint loops (`dedup.scrub_to_fixpoint`), so training
    cost is n_merges bounded aggregations, never a recompute of the
    growing lineage; the merge itself is a literal string replace on
    the wrapped representation (replace-left-to-right == the reference
    regex semantics because wrapped occurrences never share
    characters).  The word table is persisted for the duration —
    release it via `cacheutil.release_cached` on the returned ``seg``.
    ``checkpoint_every`` bounds the replace-chain expression depth for
    large merge counts.
    """
    from metrics_advisor_spark.functions.cacheutil import attach_cached

    words = _word_counts(df, text_col).select(
        "word", "wn", _char_wrap(F.col("word")).alias("seg")
    ).persist()
    seg = words
    rows = []
    for it in range(n_merges):
        top = (
            _pair_counts(seg)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, cnt = (
            top[0]["left"], top[0]["right"], top[0]["pair_count"]
        )
        rows.append((it, left, right, cnt))
        seg = seg.select(
            "word",
            "wn",
            F.replace(
                F.col("seg"),
                F.lit(SEP + left + SEP + SEP + right + SEP),
                F.lit(SEP + left + right + SEP),
            ).alias("seg"),
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < n_merges:
            seg = seg.localCheckpoint(eager=False)
    merges = df.sparkSession.createDataFrame(
        rows, "it int, left string, right string, pair_count long"
    )
    return merges, attach_cached(seg, words)


def bpe_vocab(seg: DataFrame, min_count: int | None = None) -> DataFrame:
    """Subword vocabulary induced by a segmentation table:
    (token, token_count) — every symbol of every word, weighted by word
    frequency.  This is the vocab file a tokenizer ships."""
    syms = F.split(
        F.expr("substring(seg, 2, length(seg) - 2)"), SEP + SEP
    )
    out = (
        seg.select("wn", F.explode(syms).alias("token"))
        .groupBy("token")
        .agg(F.sum("wn").alias("token_count"))
    )
    if min_count is not None:
        out = out.where(F.col("token_count") >= min_count)
    return out


def bpe_segment_words(
    words: DataFrame, merges: DataFrame, word_col: str = "word"
) -> DataFrame:
    """Apply a learned merge list to new words: (word, tokens array).

    The merge table is tiny (n_merges rows) — collected to drive plan
    construction (each merge is one replace expression; the data-side
    plan stays a single narrow projection, applied iteration-ordered
    exactly as trained)."""
    rules = [
        (r["left"], r["right"])
        for r in merges.orderBy("it").select(
            "it", "left", "right"
        ).collect()
    ]
    seg = _char_wrap(F.col(word_col))
    for left, right in rules:
        seg = F.replace(
            seg,
            F.lit(SEP + left + SEP + SEP + right + SEP),
            F.lit(SEP + left + right + SEP),
        )
    toks = F.split(
        F.expr("substring(_seg, 2, length(_seg) - 2)"), SEP + SEP
    )
    return (
        words.withColumn("_seg", seg)
        .withColumn("tokens", toks)
        .drop("_seg")
    )

def _admit_batch(top, budget: int) -> list[tuple[str, str, int]]:
    """Select up to ``budget`` NON-INTERACTING pairs from a ranked
    candidate list (rows with left/right/pair_count).  Two pairs
    interact when they share a symbol, OR when one pair's apply-time
    replacement can create/destroy occurrences the other matches:
    an admitted (a, b) mints new "ab" symbols, so a candidate with
    "ab" as a symbol is deferred; symmetrically a candidate whose own
    concatenation is an admitted SYMBOL is deferred, since its replace
    would mint occurrences for the earlier-admitted pair after that
    pair's count was recorded (ADVICE r10).  Deferred pairs simply
    rank again next round — admission never skips them permanently."""
    used: set[str] = set()
    made: set[str] = set()
    batch: list[tuple[str, str, int]] = []
    for r in top:
        if len(batch) >= budget:
            break
        left, right = r["left"], r["right"]
        syms = {left, right}
        concat = left + right
        if used & syms or made & syms or concat in used:
            continue
        used |= syms
        made.add(concat)
        batch.append((left, right, r["pair_count"]))
    return batch


def bpe_train_batched(
    df: DataFrame,
    n_merges: int = 6,
    k_batch: int = 16,
    text_col: str = "text",
    checkpoint_every: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """`bpe_train` with BATCHED non-interacting merges — the knob that
    makes realistic merge counts (30k) tractable: sequential BPE is one
    corpus-wide-bounded aggregation PER merge (measured ~1.1 s/round at
    sf0.1 — SCALE.md §18.4: 30k merges ≈ 9 hours of round-trips),
    while each batched round ranks the top pairs once and applies up
    to ``k_batch`` of them, cutting the round count ~k_batch-fold.

    Batch admission rule (`_admit_batch`): walk the ranked pair list
    (count desc, left asc, right asc — the sequential tiebreak) and
    admit a pair only if (a) its symbols are DISJOINT from every
    symbol already admitted this round, AND (b) neither of its symbols
    equals the CONCATENATION of an already-admitted pair, nor its own
    concatenation equals an already-admitted symbol (ADVICE r10: an
    admitted (a, b) creates new "ab" symbols at apply time, so a
    same-round (x, "ab") — or an (x, y) whose "xy" an admitted pair
    consumes — would see occurrences its recorded count never saw).
    Under (a)+(b) no replace in the round can create or destroy
    occurrences any other admitted pair matches, so every admitted
    pair's count is still exact at apply time.  The approximation
    relative to sequential BPE: a merge CREATED by an earlier admitted
    pair could in principle out-rank a later admitted pair; sequential
    training would pick it first.  This is the standard parallel-BPE
    trade — ``k_batch=1`` restores exact sequential semantics
    (`test_bpe_batched_k1_matches_sequential` pins it) and the merge
    lists converge to the same vocabulary in practice.

    Returns (merges, seg) with the same schemas as `bpe_train`;
    ``it`` numbers merges in admission order, so downstream
    `bpe_segment_words` applies them exactly as trained."""
    from metrics_advisor_spark.functions.cacheutil import attach_cached

    words = _word_counts(df, text_col).select(
        "word", "wn", _char_wrap(F.col("word")).alias("seg")
    ).persist()
    seg = words
    rows: list[tuple[int, str, str, int]] = []
    rounds = 0
    while len(rows) < n_merges:
        # rank enough candidates to fill a batch even after
        # disjointness rejections (k_batch² is a generous bound: each
        # admitted pair can block at most ~2 symbols' worth of later
        # candidates)
        top = (
            _pair_counts(seg)
            .orderBy(
                F.col("pair_count").desc(),
                F.col("left").asc(),
                F.col("right").asc(),
            )
            .limit(max(k_batch * k_batch, 16))
            .collect()
        )
        if not top:
            break
        batch = _admit_batch(
            top, min(k_batch, n_merges - len(rows))
        )
        if not batch:
            break
        col = F.col("seg")
        for left, right, cnt in batch:
            rows.append((len(rows), left, right, cnt))
            col = F.replace(
                col,
                F.lit(SEP + left + SEP + SEP + right + SEP),
                F.lit(SEP + left + right + SEP),
            )
        seg = seg.select("word", "wn", col.alias("seg"))
        rounds += 1
        if rounds % checkpoint_every == 0 and len(rows) < n_merges:
            seg = seg.localCheckpoint(eager=False)
    merges = df.sparkSession.createDataFrame(
        rows, "it int, left string, right string, pair_count long"
    )
    return merges, attach_cached(seg, words)
