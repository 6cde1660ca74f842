"""Text-analysis operators for large-scale training-data pipelines.

All pure ``pyspark.sql.functions`` expressions — JVM-side, codegen'd, no
Python in the hot path — so every one of them is also expressible in
ANSI SQL for the DuckDB oracle.  Designed for a ``documents(doc_id,
text, ...)`` table at 100 TB: every operator is a narrow projection or a
single hash aggregate keyed by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish tokenizer: letter runs, digit runs, single non-space symbols.
# Kept regex-dialect-neutral (works identically in Java regex and RE2).
TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# Tiny per-language stopword anchors for the n-gram/stopword language
# heuristic.  Real deployments swap in full lists; the operator shape
# (explode → semi-join → argmax) is what scales.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is"),
    "es": ("el", "la", "de", "y", "que", "en"),
    "fr": ("le", "la", "et", "les", "des", "un"),
}

PUNCT_RE = "[^A-Za-z0-9 ]"


def token_count(df: DataFrame, text_col: str = "text",
                out_col: str = "n_tokens") -> DataFrame:
    """Whitespace + BPE-ish token count."""
    return df.withColumn(
        out_col, F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0))
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring features: lengths, ratios, heuristic score.

    quality_score is a simple monotone blend of length and punctuation /
    stopword ratios — the standard cheap pre-filter before expensive
    dedup/embedding stages.
    """
    words = F.split(F.col(text_col), " ")
    n_chars = F.length(text_col)
    n_words = F.size(words)
    n_punct = n_chars - F.length(F.regexp_replace(text_col, PUNCT_RE, ""))
    stop = F.filter(
        words, lambda w: w.isin(*LANG_STOPWORDS["en"])
    )
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(F.size(stop) / F.greatest(n_words, F.lit(1)), 6)
    avg_word_len = F.round(n_chars / F.greatest(n_words, F.lit(1)), 6)
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        avg_word_len.alias("avg_word_len"),
        F.round(
            F.least(n_words / F.lit(100.0), F.lit(1.0))
            * (F.lit(1.0) - punct_ratio),
            6,
        ).alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: argmax over per-language anchor hits.

    Ties broken toward 'und' when no anchors hit, else lexicographically
    smallest language code (deterministic).
    """
    words = F.split(F.col(text_col), " ")

    def _hits(sw: tuple[str, ...]) -> F.Column:
        # NB: closure, not a default arg — a 2-parameter lambda would be
        # treated as the (element, index) HOF form by PySpark
        return F.size(F.filter(words, lambda w: w.isin(*sw)))

    scores = [
        _hits(sw).alias(f"score_{lang}")
        for lang, sw in sorted(LANG_STOPWORDS.items())
    ]
    scored = df.select("doc_id", *scores)
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pick = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # ascending → first max wins ties
        pick = pick.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id",
        pick.alias("lang_pred"),
        best.alias("lang_score"),
    )


def doc_fingerprint(df: DataFrame, text_col: str = "text",
                    ngram: int = 3) -> DataFrame:
    """Winnowing-style content fingerprint: min rolling-shingle hash.

    Word n-gram shingles hashed via md5-prefix → 56-bit int; the document
    fingerprint is the minimum shingle hash (the k=1 minhash), a stable
    content-defined id robust to reordering of surrounding docs.
    """
    from metrics_advisor_spark.functions.dedup import shingle

    # min is duplicate-insensitive → skip the shingle dedup shuffle
    sh = shingle(df, text_col=text_col, n=ngram, distinct=False)
    return sh.groupBy("doc_id").agg(F.min("shingle_hash").alias("fingerprint"))
