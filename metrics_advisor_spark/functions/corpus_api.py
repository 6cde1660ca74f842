"""Fluent corpus-pipeline API over the training-data operators.

One object, lazily composed, so a reference user can write the standard
prep pipeline the way they'd describe it::

    kept = (
        Corpus(docs)
        .quality_filter(min_score=0.2)
        .lang_filter("en")
        .exact_dedup()
        .near_dedup(method="minhash", threshold=0.7)
        .sample_tokens(budget=5_000_000)
        .df
    )

Every stage delegates to the scale-designed operators
(`functions/dedup.py`, `functions/text.py`, `functions/corpus.py`);
nothing executes until an action on ``.df`` — the whole chain stays one
Catalyst plan wherever the underlying operators allow (quality + lang
gates fuse into a single projection+filter; dedups add their documented
shuffles).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from metrics_advisor_spark.functions.corpus import token_budget_sample
from metrics_advisor_spark.functions.dedup import (
    apply_pair_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    simhash,
)
from metrics_advisor_spark.functions.text import (
    lang_pred_col,
    quality_score_col,
)


@dataclass(frozen=True)
class Corpus:
    """Immutable fluent wrapper: each stage returns a new Corpus."""

    df: DataFrame
    text_col: str = "text"

    def _with(self, df: DataFrame) -> "Corpus":
        return Corpus(df, self.text_col)

    def quality_filter(self, min_score: float = 0.2) -> "Corpus":
        """Keep docs whose heuristic quality score clears ``min_score``."""
        return self._with(
            self.df.filter(
                quality_score_col(F.col(self.text_col)) >= min_score
            )
        )

    def lang_filter(self, *langs: str) -> "Corpus":
        """Keep docs whose stopword-vote language is in ``langs``."""
        return self._with(
            self.df.filter(lang_pred_col(F.col(self.text_col)).isin(*langs))
        )

    def exact_dedup(self) -> "Corpus":
        """Keep the min-doc_id representative of each byte-identical
        group — window-free: one (content-hash) aggregate semi-joined
        back, so only the keeper rows survive the join."""
        keepers = (
            self.df.groupBy(F.md5(self.text_col).alias("_h"))
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        return self._with(self.df.join(keepers, "doc_id", "left_semi"))

    def near_dedup(
        self,
        method: str = "minhash",
        threshold: float = 0.7,
        transitive: bool = True,
        **kwargs,
    ) -> "Corpus":
        """Drop near-duplicates: pair generation by ``method``
        ('minhash' LSH banding — recall tuned by the k/bands kwargs,
        ``threshold`` unused; 'jaccard' inverted-index join at
        ``threshold``; 'simhash' pigeonhole blocking), then transitive
        keeper materialization."""
        if method == "minhash":
            pairs = minhash_lsh_pairs(
                self.df, text_col=self.text_col, **kwargs
            ).select("doc_a", "doc_b")
        elif method == "jaccard":
            pairs = jaccard_pairs(
                self.df, text_col=self.text_col, threshold=threshold, **kwargs
            ).select("doc_a", "doc_b")
        elif method == "simhash":
            from metrics_advisor_spark.functions.dedup import (
                hamming_pairs_blocked,
            )

            pairs = hamming_pairs_blocked(
                simhash(self.df, text_col=self.text_col), **kwargs
            ).select("doc_a", "doc_b")
        else:
            raise ValueError(f"unknown near-dedup method: {method}")
        return self._with(
            apply_pair_dedup(self.df, pairs, transitive=transitive)
        )

    def sample_tokens(self, budget: int, two_phase: bool = True) -> "Corpus":
        """Shrink to ~``budget`` tokens (deterministic hash order)."""
        sampled = token_budget_sample(
            self.df, budget, text_col=self.text_col, two_phase=two_phase
        ).select("doc_id")
        return self._with(self.df.join(sampled, "doc_id", "left_semi"))
