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

    def dedup_audio(
        self, wav_col: str = "wav", *, max_distance: int = 4,
        window: int = 256, n_bands: int = 16,
    ) -> "Corpus":
        """Drop rows whose AUDIO payload is a near-dup of an earlier
        row's (r15): gain-invariant delta-sign fingerprints →
        blocked-Hamming connected components
        (`multimodal.audio_dup_components`); each cluster keeps its
        min-doc_id representative.  Rows whose clip is too short to
        fingerprint (n_codes = 0) pass through — no signal, no dedup
        decision.  One anti-join against the non-representative
        member set, so the full corpus row (text + other modalities)
        survives for keepers."""
        from metrics_advisor_spark.functions.multimodal import (
            audio_dup_components,
        )

        comp = audio_dup_components(
            self.df, wav_col=wav_col, max_distance=max_distance,
            window=window, n_bands=n_bands,
        )
        drops = comp.where(
            F.col("doc_id") != F.col("component")
        ).select("doc_id")
        return self._with(self.df.join(drops, "doc_id", "left_anti"))

    def dedup_images(
        self, img_col: str = "img", *, max_distance: int = 4,
    ) -> "Corpus":
        """Drop rows whose IMAGE payload is a perceptual near-dup of
        an earlier row's (r15, the image arm of `dedup_audio`):
        56-bit dHash (`multimodal.image_dhash` — same grid/packing as
        video `frame_dhash`, one shared hash space) → blocked-Hamming
        connected components → each cluster keeps its min-doc_id
        representative via one anti-join, so the full corpus row
        survives for keepers.  No stub arm: every parseable BMP
        hashes; a malformed payload raises rather than being guessed
        around (the module's parser contract)."""
        from metrics_advisor_spark.functions.multimodal import (
            image_dup_components,
        )

        comp = image_dup_components(
            self.df, img_col=img_col, max_distance=max_distance,
        )
        drops = comp.where(
            F.col("doc_id") != F.col("component")
        ).select("doc_id")
        return self._with(self.df.join(drops, "doc_id", "left_anti"))

    def scrub_exact_substrings(
        self, min_len: int = 64, stride: int = 16,
        keep_first: bool = False,
    ) -> "Corpus":
        """Remove every char run duplicated verbatim ≥2 times anywhere
        in the corpus (Lee-et-al substring dedup; see
        `dedup.duplicate_spans` for the granularity contract) —
        finer-grained than doc-level dedup: boilerplate shared across
        otherwise-distinct docs is excised, the unique remainder
        survives.  ``keep_first=True`` keeps one canonical copy of
        each duplicated run (dedup, not destruction) — with the
        window-level caveat from `dedup.duplicate_spans` (r14
        ADVICE): when a doc interleaves SEVERAL duplicated runs, a
        span from a different duplicated key can overlap the
        canonical copy and the island merge cuts into it, so
        "exactly one copy survives" holds only when duplicated runs
        don't overlap other duplicated material in the surviving
        doc."""
        from metrics_advisor_spark.functions.dedup import (
            scrub_duplicate_spans,
        )

        return self._with(scrub_duplicate_spans(
            self.df, self.text_col, min_len=min_len, stride=stride,
            keep_first=keep_first,
        ))

    def perplexity_gate(
        self, max_nll_per_tri: float = 8.0, ref_lang: str = "en",
    ) -> "Corpus":
        """CCNet-style LM-quality gate (r14 — VERDICT r13 item 6):
        keep docs whose char-trigram NLL per trigram under the
        reference-language model clears the ceiling — perplexity
        filtering as a PIPELINE STAGE, not just a scorer.  Fluent
        text scores low, gibberish/wrong-language text high; CCNet
        buckets crawl corpora by exactly this number.  Schema-
        preserving: scores are computed on a side frame
        (`text.char_lm_perplexity` — broadcast model join, one
        aggregate) and applied as a doc_id semi-join, so the corpus
        columns pass through untouched.  Docs too short to score
        (no trigram) are dropped — no evidence, no admission."""
        from metrics_advisor_spark.functions.text import (
            char_lm_perplexity,
        )

        keep = (
            char_lm_perplexity(
                self.df, self.text_col, ref_lang=ref_lang
            )
            .filter(F.col("nll_per_tri") <= max_nll_per_tri)
            .select("doc_id")
        )
        return self._with(self.df.join(keep, "doc_id", "left_semi"))

    def sample_tokens(self, budget: int, two_phase: bool = True) -> "Corpus":
        """Shrink to ~``budget`` tokens (deterministic hash order)."""
        sampled = token_budget_sample(
            self.df, budget, text_col=self.text_col, two_phase=two_phase
        ).select("doc_id")
        return self._with(self.df.join(sampled, "doc_id", "left_semi"))

    def decontaminate(
        self,
        benchmark: DataFrame,
        n: int = 5,
        max_frac: float = 0.0,
        bloom: bool = False,
        **kwargs,
    ) -> "Corpus":
        """Drop documents whose benchmark n-gram overlap exceeds
        ``max_frac`` (0.0 = any overlap).  ``bloom=True`` routes through
        the Bloom-prefiltered variant (same output, broadcast-friendly
        for benchmark suites too large to broadcast raw)."""
        from metrics_advisor_spark.functions.curation import (
            bloom_contamination_check,
            contamination_check,
        )

        check = bloom_contamination_check if bloom else contamination_check
        hits = (
            check(self.df, benchmark, text_col=self.text_col, n=n, **kwargs)
            .filter(F.col("contam_frac") > max_frac)
            .select("doc_id")
        )
        return self._with(self.df.join(hits, "doc_id", "left_anti"))

    def semantic_dedup(
        self,
        embeddings: DataFrame,
        threshold: float = 0.9,
        n_lists: int = 16,
        id_col: str = "doc_id",
        vec_col: str = "embedding",
    ) -> "Corpus":
        """SemDeDup: drop docs whose embeddings are within-cluster
        cosine near-dups of a kept representative.  ``embeddings`` maps
        ``id_col`` → ``vec_col``; docs without an embedding are kept."""
        from metrics_advisor_spark.functions.similarity import semdedup

        kept = semdedup(
            embeddings, threshold=threshold, n_lists=n_lists,
            id_col=id_col, vec_col=vec_col,
        ).select(id_col)
        dropped = embeddings.select(id_col).join(kept, id_col, "left_anti")
        return self._with(
            self.df.join(
                dropped.withColumnRenamed(id_col, "doc_id"),
                "doc_id",
                "left_anti",
            )
        )

    def shuffle(self, n_shards: int = 8, seed: int = 0) -> "Corpus":
        """Attach the deterministic training order (shard, shard_pos)."""
        from metrics_advisor_spark.functions.corpus import global_shuffle

        order = global_shuffle(
            self.df, n_shards=n_shards, seed=seed
        ).select("doc_id", "shard", "shard_pos")
        return self._with(self.df.join(order, "doc_id"))

    def mixture(
        self, weights: dict[str, float], token_budget: int
    ) -> DataFrame:
        """The per-source sampling-rate/epoch recipe table (terminal —
        returns the plan DataFrame, not a Corpus)."""
        from metrics_advisor_spark.functions.curation import mixture_plan

        return mixture_plan(
            self.df, weights, token_budget, text_col=self.text_col
        )

    def split(
        self, fractions: tuple[float, float] = (0.8, 0.1)
    ) -> "Corpus":
        """Attach the deterministic train/val/test assignment (id-hash
        threshold — re-runs and late shards route identically)."""
        from metrics_advisor_spark.functions.curation import (
            train_val_test_split,
        )

        return self._with(
            train_val_test_split(self.df, fractions=fractions)
        )

    def only_split(self, name: str) -> "Corpus":
        """Keep one split (after ``.split()``): 'train' | 'val' | 'test'."""
        return self._with(self.df.where(F.col("split") == name))
