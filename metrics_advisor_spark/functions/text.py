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

# Seed text for the char-trigram Naive Bayes language model (VERDICT
# r12 item 3: the stopword vote fails on short / no-stopword docs).
# Generic everyday sentences composed for this package — lowercase,
# unaccented, apostrophe-free so they embed safely in SQL VALUES and
# dodge collation differences; real deployments swap in larger public
# corpora, the operator shape is what matters.
LANG_SEED: dict[str, tuple[str, ...]] = {
    "en": (
        "the quick brown fox jumps over the lazy dog",
        "this is a sentence about the weather and the sea",
        "we are going to the market in the morning",
        "she said that the children would be home soon",
        "there is nothing better than a good book and tea",
        "what time does the train leave for the city",
    ),
    "es": (
        "el rapido zorro marron salta sobre el perro perezoso",
        "esta es una frase sobre el tiempo y el mar",
        "vamos al mercado por la manana con la familia",
        "ella dijo que los ninos estarian en casa pronto",
        "no hay nada mejor que un buen libro y un cafe",
        "a que hora sale el tren para la ciudad",
    ),
    "fr": (
        "le rapide renard brun saute par dessus le chien paresseux",
        "ceci est une phrase sur le temps et la mer",
        "nous allons au marche le matin avec la famille",
        "elle a dit que les enfants seraient bientot a la maison",
        "il n y a rien de mieux qu un bon livre et un the",
        "a quelle heure part le train pour la ville",
    ),
    "de": (
        "der schnelle braune fuchs springt ueber den faulen hund",
        "dies ist ein satz ueber das wetter und das meer",
        "wir gehen am morgen mit der familie auf den markt",
        "sie sagte dass die kinder bald zu hause sein wuerden",
        "es gibt nichts besseres als ein gutes buch und tee",
        "um wie viel uhr faehrt der zug in die stadt",
    ),
    "zh": (
        "这是一个关于天气和大海的句子",
        "我们早上和家人一起去市场",
        "她说孩子们很快就会回家",
        "没有什么比一本好书和一杯茶更好的了",
        "火车什么时候开往城市",
        "敏捷的棕色狐狸跳过懒狗",
    ),
}

# log-prob quantization: BIGINT micro-nats.  Integer scores make the
# per-doc sum ORDER-INDEPENDENT (float addition across a shuffle is
# not), and pin the Spark side and the DuckDB oracle to identical
# arithmetic — the same trick as the unigram trainer's quantized EM
# counts (functions/unigram.py).
NB_QUANT = 1_000_000


def train_char_ngram_nb(
    n: int = 3, quant: int = NB_QUANT,
) -> tuple[list[str], dict[tuple[str, str], int], dict[str, int]]:
    """Train the char-n-gram Naive Bayes on LANG_SEED: returns
    (vocab, model, oov) where ``model[(lang, gram)]`` is the
    add-one-smoothed log P(gram | lang) in quantized micro-nats,
    DENSE over the cross-language vocabulary, and ``oov[lang]`` is
    the out-of-vocabulary gram score.  Pure driver-side Python over a
    few hundred grams — the trained table is broadcast; nothing here
    runs per-row."""
    import math

    counts: dict[str, dict[str, int]] = {lang: {} for lang in LANG_SEED}
    vocab: set[str] = set()
    for lang, sents in LANG_SEED.items():
        for s in sents:
            s = s.lower()
            for i in range(len(s) - n + 1):
                g = s[i:i + n]
                counts[lang][g] = counts[lang].get(g, 0) + 1
                vocab.add(g)
    model: dict[tuple[str, str], int] = {}
    oov: dict[str, int] = {}
    v = len(vocab)
    # SHARED smoothing denominator (max seed total across languages):
    # per-language denominators make zero-count grams score HIGHER for
    # the language with the smallest seed corpus, so an English doc
    # whose grams are mostly absent from the en counts drifts toward
    # whichever language has the least data (measured: 'zh' won plain
    # English sentences).  With one denominator, count-0 grams tie
    # across languages and only actual evidence discriminates; the
    # per-language distributions are sub-normalized, which is fine for
    # an argmax score.
    denom = max(
        sum(c.values()) for c in counts.values()
    ) + v + 1  # +1: the shared OOV bucket
    for lang in LANG_SEED:
        for g in vocab:
            c = counts[lang].get(g, 0)
            model[(lang, g)] = round(math.log((c + 1) / denom) * quant)
        oov[lang] = round(math.log(1.0 / denom) * quant)
    return sorted(vocab), model, oov


def _char_trigrams(text_col: str) -> F.Column:
    """All char trigrams of ``text_col`` (pre-lowercased!) as an array
    — pure Catalyst (sequence + transform + substring), no Python.
    The caller materializes lower(text) ONCE per row first: lower()
    inside the lambda is re-evaluated per element (O(len²) chars per
    doc at the ×10 probe).  A constant-map-literal scoring variant was
    tried and rejected: Catalyst map lookups on literal maps are
    LINEAR scans, so aggregate()-HOF scoring against a 700-key map ran
    minutes where the broadcast hash join runs seconds."""
    return F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - 2,"
        f" 0)), i -> substring({text_col}, i, 3))"
    )


def lang_id_ngram(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Char-trigram Naive Bayes language ID: (doc_id, lang_pred,
    lang_score BIGINT micro-nats).

    Plan shape (100 TB): trigram explode is a narrow projection; the
    trained model joins BROADCAST (dense |vocab|x|langs| rows, a few
    thousand); ONE hash aggregate keyed (doc_id, lang) with map-side
    combine; the per-doc argmax is a second tiny aggregate.  No
    Python anywhere.  Ties break toward the smallest language code;
    docs shorter than one trigram predict 'und'."""
    spark = df.sparkSession
    vocab, model, oov = train_char_ngram_nb()
    langs = sorted(LANG_SEED)
    mdf = spark.createDataFrame(
        [(lang, g, model[(lang, g)]) for lang in langs for g in vocab],
        "lang string, tri string, logp_q long",
    )
    low = df.select(
        "doc_id", F.lower(F.col(text_col)).alias("_lt")
    )
    occ = low.select(
        "doc_id", F.explode(_char_trigrams("_lt")).alias("tri")
    )
    # dense model: every in-vocab occurrence matches EVERY language,
    # so n_hit is lang-independent and OOV mass is (n_tri - n_hit)
    hits = (
        occ.join(F.broadcast(mdf), "tri")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("logp_q").alias("hit_q"),
            F.count(F.lit(1)).alias("n_hit"),
        )
    )
    # n_tri must be measured on the MATERIALIZED lower(text) — Unicode
    # lowercasing can change string length (U+0130 'İ' lowers to two
    # codepoints), and trigrams are exploded from _lt, so measuring
    # the original text makes the OOV mass (n_tri − n_hit) wrong or
    # negative on such docs (ADVICE r13)
    nd = low.select(
        "doc_id",
        F.greatest(
            F.length(F.col("_lt")) - 2, F.lit(0)
        ).cast("long").alias("n_tri"),
    )
    # the (doc, lang) grid as a PURE PROJECTION: explode over a
    # literal language array + a literal when-chain for the per-lang
    # OOV score — a 5-row crossJoin(broadcast(...)) compiles to a
    # BroadcastNestedLoopJoin the plan audit cannot prove scalar, and
    # the projection form keeps the whole grid inside codegen anyway
    oov_case = F.lit(None).cast("long")
    for lang in langs:
        oov_case = F.when(
            F.col("lang") == lang, F.lit(oov[lang])
        ).otherwise(oov_case)
    grid = nd.withColumn(
        "lang", F.explode(F.array(*[F.lit(lg) for lg in langs]))
    ).withColumn("oov_q", oov_case)
    scored = (
        grid.join(hits, ["doc_id", "lang"], "left")
        .select(
            "doc_id", "lang", "n_tri",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            (
                F.coalesce(F.col("hit_q"), F.lit(0))
                + (F.col("n_tri") - F.coalesce(F.col("n_hit"), F.lit(0)))
                * F.col("oov_q")
            ).alias("score_q"),
        )
    )
    best = scored.groupBy("doc_id").agg(
        F.min(
            F.struct(
                (-F.col("score_q")).alias("neg"),
                F.col("lang").alias("lang"),
                F.col("score_q").alias("score_q"),
            )
        ).alias("b"),
        F.max("n_tri").alias("n_tri"),
        F.max("n_hit").alias("n_hit"),  # lang-independent (dense model)
    )
    # no trigram at all OR no in-vocabulary evidence → 'und' (an
    # all-OOV doc would otherwise pick whichever language has the
    # smallest seed corpus — noise, not signal)
    return best.select(
        "doc_id",
        F.when(
            (F.col("n_tri") <= 0) | (F.col("n_hit") <= 0), F.lit("und")
        ).otherwise(F.col("b.lang")).alias("lang_pred"),
        F.col("b.score_q").alias("lang_score"),
    )


def char_lm_perplexity(
    df: DataFrame, text_col: str = "text", ref_lang: str = "en",
) -> DataFrame:
    """CCNet-style language-model quality signal: per-doc mean
    negative log-probability per char trigram under ONE reference
    language's add-one-smoothed trigram distribution (the same
    quantized model as `lang_id_ngram`, filtered to ``ref_lang``).
    Fluent reference-language text scores LOW; gibberish, wrong-
    language and character-salad text scores HIGH — the classic
    crawl-curation threshold filter (CCNet buckets corpora by exactly
    this number).

    Returns (doc_id, n_tri, nll_q, nll_per_tri): ``nll_q`` is the
    exact integer total in micro-nats (order-independent — the same
    determinism contract as lang_id), ``nll_per_tri`` the per-trigram
    mean in nats for thresholding; docs shorter than one trigram come
    back null.

    Plan shape (100 TB): identical to lang_id_ngram minus the
    language axis — narrow trigram explode, broadcast model join
    (|vocab| rows), ONE map-side-combining aggregate per doc.  No
    Python anywhere."""
    spark = df.sparkSession
    vocab, model, oov = train_char_ngram_nb()
    if ref_lang not in LANG_SEED:
        raise ValueError(f"unknown reference language {ref_lang!r}")
    mdf = spark.createDataFrame(
        [(g, model[(ref_lang, g)]) for g in vocab],
        "tri string, logp_q long",
    )
    oov_q = oov[ref_lang]
    low = df.select("doc_id", F.lower(F.col(text_col)).alias("_lt"))
    occ = low.select(
        "doc_id", F.explode(_char_trigrams("_lt")).alias("tri")
    )
    hits = (
        occ.join(F.broadcast(mdf), "tri")
        .groupBy("doc_id")
        .agg(F.sum("logp_q").alias("hit_q"),
             F.count(F.lit(1)).alias("n_hit"))
    )
    # measured on _lt, not the original text — same Unicode-lowercase
    # length caveat as lang_id_ngram (ADVICE r13)
    nd = low.select(
        "doc_id",
        F.greatest(F.length(F.col("_lt")) - 2, F.lit(0))
        .cast("long").alias("n_tri"),
    )
    scored = nd.join(hits, "doc_id", "left").select(
        "doc_id", "n_tri",
        (
            -(F.coalesce(F.col("hit_q"), F.lit(0))
              + (F.col("n_tri") - F.coalesce(F.col("n_hit"), F.lit(0)))
              * F.lit(oov_q))
        ).alias("nll_q"),
    )
    return scored.select(
        "doc_id", "n_tri",
        F.when(F.col("n_tri") > 0, F.col("nll_q")).alias("nll_q"),
        F.when(
            F.col("n_tri") > 0,
            # floor-form 6dp snap (r05 lesson): round() builtins
            # disagree across engines at exact decimal halves; the
            # arithmetic form is the same IEEE tree everywhere
            F.floor(
                F.col("nll_q") / F.col("n_tri") / NB_QUANT * 1e6 + 0.5
            ) / 1e6,
        ).alias("nll_per_tri"),
    )


# --- expression builders (shared with functions/corpus.py) -----------------
# Each returns a plain Column so composite pipelines (corpus_prep) can fuse
# every feature into ONE narrow projection instead of joining per-op outputs.


def token_count_col(text_col: F.Column) -> F.Column:
    """Whitespace + BPE-ish token count of a text column."""
    return F.size(F.regexp_extract_all(text_col, F.lit(TOKEN_RE), 0))


def quality_score_col(text_col: F.Column) -> F.Column:
    """Monotone blend of length and punctuation ratio (6dp-rounded)."""
    n_chars = F.length(text_col)
    n_words = F.size(F.split(text_col, " "))
    n_punct = n_chars - F.length(F.regexp_replace(text_col, PUNCT_RE, ""))
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    return F.round(
        F.least(n_words / F.lit(100.0), F.lit(1.0))
        * (F.lit(1.0) - punct_ratio),
        6,
    )


def _lang_hits(text_col: F.Column, sw: tuple[str, ...]) -> F.Column:
    # NB: closure, not a default arg — a 2-parameter lambda would be
    # treated as the (element, index) HOF form by PySpark
    return F.size(F.filter(F.split(text_col, " "), lambda w: w.isin(*sw)))


def lang_pred_col(text_col: F.Column) -> F.Column:
    """Stopword-vote language prediction (ties: 'und', else smallest code)."""
    langs = sorted(LANG_STOPWORDS)
    scores = {lang: _lang_hits(text_col, LANG_STOPWORDS[lang]) for lang in langs}
    best = F.greatest(*scores.values())
    pick = F.when(best <= 0, F.lit("und"))
    for lang in langs:  # ascending → first max wins ties
        pick = pick.when(scores[lang] == best, F.lit(lang))
    return pick


def token_count(df: DataFrame, text_col: str = "text",
                out_col: str = "n_tokens") -> DataFrame:
    """Whitespace + BPE-ish token count."""
    return df.withColumn(out_col, token_count_col(F.col(text_col)))


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
        quality_score_col(F.col(text_col)).alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language ID — the char-trigram Naive Bayes (r13 upgrade; the
    stopword vote fails on short / no-stopword docs and is kept as
    `lang_id_stopword` for the fused-projection path and as the
    accuracy baseline)."""
    return lang_id_ngram(df, text_col)


def lang_id_stopword(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: argmax over per-language anchor hits.

    Ties broken toward 'und' when no anchors hit, else lexicographically
    smallest language code (deterministic).
    """
    langs = sorted(LANG_STOPWORDS)
    scores = {
        lang: _lang_hits(F.col(text_col), LANG_STOPWORDS[lang])
        for lang in langs
    }
    best = F.greatest(*scores.values())
    return df.select(
        "doc_id",
        lang_pred_col(F.col(text_col)).alias("lang_pred"),
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


# --- ranked retrieval ------------------------------------------------------

def _terms(df: DataFrame, text_col: str) -> DataFrame:
    """(doc_id, term) tokens: lowercase, punctuation-stripped, space-split."""
    clean = F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", "")
    return df.select(
        "doc_id", F.explode(F.split(clean, " ")).alias("term")
    ).filter(F.length("term") > 0)


def tfidf_top_terms(
    df: DataFrame, text_col: str = "text", k: int = 3
) -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    tf is the in-document term count; idf = ln((N+1)/(df+1)).  The
    document-frequency table is vocabulary-sized, so it broadcasts here;
    at 100 TB the same plan holds with a shuffle join keyed on the term
    (term df is computed from the already-aggregated (doc, term) pairs,
    never the raw token stream, so skewed stopwords cost one count each).
    Ties rank by term ascending — fully deterministic.
    """
    from pyspark.sql import Window

    tf = _terms(df, text_col).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.col("tf") * F.log((F.col("n_docs") + 1) / (F.col("df") + 1)),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "doc_id", "rank", "term", F.round("score", 6).alias("tfidf")
        )
    )


def bm25_search(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under BM25.

    Only query-term postings are aggregated (the filter lands before the
    (doc, term) shuffle), document length and the single-row avgdl/N
    aggregate broadcast — the classic scatter-gather ranked retrieval
    plan, linear in corpus size.
    """
    terms = _terms(df, text_col)
    dl = terms.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs")
    )
    tf = (
        terms.filter(F.col("term").isin(*query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib", idf * F.col("tf") * (k1 + 1) / denom)
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def heavy_hitters(df: DataFrame, text_col: str = "text", k: int = 20) -> DataFrame:
    """Top-k corpus terms by document frequency (the exact form).

    Counts each term once per document (the (doc, term) distinct rides
    the tf aggregate), then one vocabulary-sized count + a single top-k.
    At 100 TB the first aggregate keys on (doc_id, term) — uniform — and
    the second on term; stopword skew costs one combiner row per
    partition, not a hot reducer, because the per-doc distinct already
    collapsed multiplicity map-side.  The approximate path at extreme
    vocabularies is a count-min/SpaceSaving sketch per partition +
    merge; exact stays cheaper until the vocabulary itself won't fit.
    """
    from pyspark.sql import Window

    dfreq = (
        _terms(df, text_col)
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf"))
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition
    # partial top-k, no single-partition sort of the vocabulary); the
    # rank window then runs over k rows only.
    top = dfreq.orderBy(F.col("df").desc(), F.col("term").asc()).limit(k)
    w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("rank", "term", "df", "total_tf")
    )


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text cleaning: lowercase, strip non-alphanumerics,
    collapse whitespace runs, trim.  The standard pre-tokenization
    normalizer — a pure narrow projection (no shuffle at any scale);
    emits before/after lengths so the cleaning loss is measurable.
    """
    lowered = F.lower(F.col(text_col))
    stripped = F.regexp_replace(lowered, "[^a-z0-9 ]", " ")
    collapsed = F.trim(F.regexp_replace(stripped, " +", " "))
    return df.select(
        "doc_id",
        F.length(text_col).alias("n_chars_raw"),
        F.length(collapsed).alias("n_chars_clean"),
        F.substring(collapsed, 1, 60).alias("clean_prefix"),
    )


def zipf_slope(df: DataFrame, text_col: str = "text", top_n: int = 200) -> DataFrame:
    """Zipf's-law fit: OLS slope of ln(freq) against ln(rank) over the
    top-n corpus terms (natural text ≈ −1; strong deviation flags
    synthetic/boilerplate corpora).  The term count is one vocabulary
    aggregate, the top-n a distributed TakeOrdered, the fit a single
    covar/var aggregate over n rows — nothing driver-side."""
    from pyspark.sql import Window

    tf = _terms(df, text_col).groupBy("term").agg(
        F.count(F.lit(1)).alias("freq")
    )
    top = tf.orderBy(F.col("freq").desc(), F.col("term").asc()).limit(top_n)
    w = Window.orderBy(F.col("freq").desc(), F.col("term").asc())
    ranked = top.withColumn("rank", F.row_number().over(w))
    x = F.log(F.col("rank").cast("double"))
    y = F.log(F.col("freq").cast("double"))
    return ranked.agg(
        F.round(F.try_divide(F.covar_pop(x, y), F.var_pop(x)), 6).alias(
            "zipf_slope"
        ),
        F.count(F.lit(1)).alias("n_terms"),
    )


def char_entropy(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document Shannon entropy (natural log) of the lowercase
    letter distribution — a cheap gibberish / low-diversity signal for
    corpus quality gating (near-zero entropy = repeated characters).

    Uses the algebraic form H = ln(n) − (Σ c·ln c)/n so the total and
    the per-char sum come out of ONE aggregate (no window pass; agrees
    with −Σ p·ln p to ~1e-13, far inside the 6dp rounding).

    Scale: the explode fans out one row per LETTER, but the per-(doc,
    char) count collapses map-side (partial hash aggregate) to ≤26 rows
    per doc before any exchange, and the second aggregate is keyed by
    doc_id — uniform, no skew.  Entirely JVM-side expressions.
    """
    chars = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]"), 0)
    )
    per_char = (
        df.select(F.col(id_col), chars.alias("ch"))
        .groupBy(id_col, "ch")
        .agg(F.count("*").alias("c"))
    )
    n = F.sum("c")
    return per_char.groupBy(id_col).agg(
        n.alias("n_letters"),
        F.round(
            F.log(n) - F.sum(F.col("c") * F.log("c")) / n, 6
        ).alias("entropy"),
    )


def kl_by_group(df: DataFrame, group_col: str = "source",
                text_col: str = "text") -> DataFrame:
    """KL divergence of each group's unigram word distribution from the
    whole-corpus distribution — "how unusual is this source's language"
    (domain novelty scoring for mixture design).

    KL(P_group ‖ Q_corpus) = Σ_w p(w) · ln(p(w)/q(w)).  Every group word
    is by construction in the corpus vocabulary, so q(w) > 0 always.

    Scale: one explode → ONE (group, word) hash aggregate (map-side
    partial collapses repeats), the corpus distribution is a second
    aggregate OVER that result (no second scan of the text), and the
    vocab join is keyed by word — high cardinality, uniform.  No Python.
    """
    words = F.explode(
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit("[a-z]+"), 0)
    )
    gw = (
        df.select(F.col(group_col).alias("grp"), words.alias("w"))
        .groupBy("grp", "w")
        .agg(F.count("*").alias("c"))
    )
    gw = gw.persist()
    corpus = gw.groupBy("w").agg(F.sum("c").alias("cq"))
    totals = gw.groupBy("grp").agg(F.sum("c").alias("n_g"))
    grand = corpus.agg(F.sum("cq").alias("n_q"))
    p = F.col("c") / F.col("n_g")
    q = F.col("cq") / F.col("n_q")
    return (
        gw.join(corpus, "w")
        .join(totals, "grp")
        .crossJoin(F.broadcast(grand))
        .groupBy(F.col("grp").alias(group_col), "n_g")
        .agg(F.round(F.sum(p * F.log(p / q)), 6).alias("kl_divergence"))
        .withColumnRenamed("n_g", "n_tokens")
    )


def token_pair_counts(df: DataFrame, text_col: str = "text",
                      top_k: int = 30) -> DataFrame:
    """Most frequent ADJACENT token pairs across the corpus — one
    counting step of a BPE-style merge loop (and a collocation miner).

    Pairs are formed inside the array with `arrays_zip` over two slices
    (no per-token explode until the count), then counted in one hash
    aggregate.  Ranking is deterministic: (count desc, pair asc) via
    row_number, so a tie at the k-boundary cannot flake.

    Scale: pair cardinality ~ vocab², but the map-side partial aggregate
    collapses repeats per partition before the exchange; top-k is a
    TakeOrdered over the aggregate, never a global sort.
    """
    toked = df.select(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit("[a-z]+"), 0
        ).alias("t")
    ).where(F.size("t") >= 2)  # slice() rejects negative lengths
    n = F.size(F.col("t"))
    pairs = F.arrays_zip(
        F.slice(F.col("t"), 1, n - 1).alias("l"),
        F.slice(F.col("t"), 2, n - 1).alias("r"),
    )
    pair_str = toked.select(
        F.explode(pairs).alias("p")
    ).select(F.concat_ws(" ", "p.l", "p.r").alias("pair"))
    counts = pair_str.groupBy("pair").agg(F.count("*").alias("n_pairs"))
    from pyspark.sql import Window

    rn = F.row_number().over(
        Window.orderBy(F.col("n_pairs").desc(), F.col("pair"))
    )
    return (
        counts.withColumn("rank", rn)
        .where(F.col("rank") <= top_k)
        .select("rank", "pair", "n_pairs")
    )


def typo_pairs(vocab: DataFrame, word_col: str = "w") -> DataFrame:
    """Edit-distance-1 word pairs over a vocabulary via the SymSpell
    deletion-neighborhood join — EXACT, never all-pairs.

    Two words within edit distance 1 (insert/delete/substitute) always
    share a member of each other's {self} ∪ {1-deletion variants} set,
    so the variant equi-join yields a complete candidate set; a final
    `levenshtein ≤ 1` filter removes the false candidates the shared-
    variant trick admits (e.g. transposes at distance 2).  Candidates
    are deduped before the verify so a pair sharing several variants is
    scored once.

    Scale: per-word fan-out is len(word)+1 variants; the join key is a
    variant string whose bucket size is bounded by the number of words
    within distance 1 of it — vocabulary-shaped, not corpus-shaped.
    Callers should pre-filter very short words (a 1-char word's empty-
    string variant would bucket with every other 1-char word).
    """
    w = F.col(word_col)
    n = F.length(w)
    dels = F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat(w.substr(F.lit(1), i - 1), w.substr(i + 1, n)),
    )
    variants = vocab.select(
        w.alias("word"),
        F.explode(F.array_union(F.array(w), dels)).alias("variant"),
    )
    cand = (
        variants.alias("a")
        .join(
            variants.alias("b"),
            (F.col("a.variant") == F.col("b.variant"))
            & (F.col("a.word") < F.col("b.word")),
        )
        .select(
            F.col("a.word").alias("word_a"), F.col("b.word").alias("word_b")
        )
        .distinct()
    )
    return cand.where(
        F.levenshtein("word_a", "word_b") <= 1
    ).select("word_a", "word_b")


def unigram_surprisal(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document unigram cross-entropy (nats/token) against a unigram
    LM fit on the corpus itself — the CCNet-style "perplexity" quality
    signal, here with the cheapest possible LM so the whole pipeline
    stays inside Spark SQL (no external model, oracle-checkable).

    surprisal(d) = (1/|d|) · Σ_{tok∈d} c_d(tok) · −ln(cf(tok)/N)

    where cf is the corpus token frequency and N the corpus token count.
    Low values ≈ docs made of common tokens (boilerplate-ish); high
    values ≈ rare-token-heavy docs (noise, code, other languages).

    Scale plan: tokens reduce map-side to distinct (doc_id, token,
    c_d) rows before any shuffle, so the vocabulary join moves one row
    per distinct in-doc token, not one per token occurrence.  The
    vocabulary aggregate and the scoring join both key on the token —
    hot tokens are the skew risk (AQE skew-join; or a stopword cap
    upstream).  N rides in via a 1-row broadcast crossJoin.
    """
    toks = df.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
        ).alias("tok"),
    )
    doc_tok = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    vocab = doc_tok.groupBy("tok").agg(F.sum("c").alias("cf"))
    total = vocab.agg(F.sum("cf").alias("n_corpus"))
    return (
        doc_tok.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("c") * -F.log(F.col("cf") / F.col("n_corpus")))
                / F.sum("c"),
                6,
            ).alias("surprisal"),
        )
    )


def lang_agreement(df: DataFrame, text_col: str = "text",
                   lang_col: str = "lang") -> DataFrame:
    """Label-audit confusion matrix: declared language vs the char-
    trigram NB prediction (r13 — upgraded together with `lang_id`),
    with each cell's share of its declared-lang row count.  The
    standard agreement check before trusting either label in
    downstream routing.

    The NB scorer's one (doc_id, lang) aggregate dominates; the cell
    table is tiny and the per-lang share a window over it.
    """
    from pyspark.sql import Window

    pred = lang_id_ngram(df, text_col).select("doc_id", "lang_pred")
    cells = (
        df.select("doc_id", F.col(lang_col).alias("lang"))
        .join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("n"))
    )
    tot = F.sum("n").over(Window.partitionBy("lang"))
    return cells.select(
        "lang", "lang_pred", "n",
        F.round(F.col("n") / tot, 6).alias("share_of_lang"),
    )


def vocab_overlap(df: DataFrame, text_col: str = "text",
                  source_col: str = "source") -> DataFrame:
    """Vocabulary Jaccard between source pairs: |V_a ∩ V_b| / |V_a ∪ V_b|
    over each source's distinct token set — the cheap corpus-composition
    comparison run before mixing sources into one training blend.

    Inverted-index shape: the only pairing is the self-join on the
    token, so two sources meet once per SHARED token (never a source
    cross-product over docs).  Pairs with an empty intersection drop
    out (inner join) — by definition their Jaccard is 0.
    """
    st = df.select(
        F.col(source_col).alias("source"),
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
        ).alias("tok"),
    ).distinct()
    sizes = st.groupBy("source").agg(F.count("*").alias("vsize"))
    inter = (
        st.alias("a")
        .join(st.alias("b"),
              (F.col("a.tok") == F.col("b.tok"))
              & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(
            sizes.select(F.col("source").alias("source_a"),
                         F.col("vsize").alias("size_a")),
            "source_a",
        )
        .join(
            sizes.select(F.col("source").alias("source_b"),
                         F.col("vsize").alias("size_b")),
            "source_b",
        )
        .select(
            "source_a", "source_b", "n_inter",
            F.round(
                F.col("n_inter")
                / (F.col("size_a") + F.col("size_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


def token_gini(df: DataFrame, text_col: str = "text",
               source_col: str = "source") -> DataFrame:
    """Gini coefficient of each source's token-frequency distribution —
    one number for "how head-heavy is this source's vocabulary"
    (0 = uniform, →1 = a few tokens dominate).  Rising Gini across
    snapshots is the classic boilerplate-creep smell.

    G = (2·Σ_i i·x_(i)) / (n·Σ x_i) − (n+1)/n with x ascending;
    the rank window partitions BY SOURCE (ordered by (freq, token) —
    total and deterministic), so each source's vocabulary sorts
    independently; nothing global except the per-source 1-row result.
    """
    from pyspark.sql import Window

    tf = (
        df.select(
            F.col(source_col).alias("source"),
            F.explode(
                F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0)
            ).alias("tok"),
        )
        .groupBy("source", "tok")
        .agg(F.count("*").alias("freq"))
    )
    w = Window.partitionBy("source").orderBy("freq", "tok")
    ranked = tf.withColumn("i", F.row_number().over(w))
    return ranked.groupBy("source").agg(
        F.count("*").cast("long").alias("n_terms"),
        F.round(
            (2.0 * F.sum(F.col("i") * F.col("freq")))
            / (F.count("*") * F.sum("freq"))
            - (F.count("*") + 1) / F.count("*"),
            6,
        ).alias("gini"),
    )


def bigram_surprisal(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document bigram cross-entropy (nats/bigram) under the
    corpus's own MLE bigram LM: p(tok|prev) = c(prev,tok)/c(prev,·).
    The order-aware upgrade of `unigram_surprisal` — word-salad docs
    score high here even when their unigram profile looks normal.

    Same scale shape as the unigram form: (doc, prev, tok) counts
    reduce map-side, the corpus bigram and context tables join on the
    bigram/context key (hot boilerplate bigrams are the skew risk —
    AQE skew-join).  Docs with < 2 tokens produce no bigrams and drop
    out, mirroring the MLE's domain.
    """
    # Materialize the token array into a column BEFORE the pair lambda:
    # element_at over the raw regexp_extract_all EXPRESSION re-runs the
    # regex per element reference (O(L²) regex work per doc — measured
    # 6.2 → 1.5 s at sf0.1); over a bound column it's one extraction
    # per row and O(1) indexing.
    toked = df.select(
        "doc_id",
        F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 0).alias(
            "_toks"
        ),
    ).where(F.size("_toks") >= 2)
    toks = F.col("_toks")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(
            F.element_at(toks, i).alias("prev"),
            F.element_at(toks, i + 1).alias("tok"),
        ),
    )
    # doc_bi feeds the corpus bigram aggregate AND the scoring join —
    # persist it or the explode+reduce pipeline executes twice (measured
    # ~2× on the sf0.1 bench)
    doc_bi = (
        toked.select("doc_id", F.explode(pairs).alias("p"))
        .groupBy("doc_id", F.col("p.prev").alias("prev"),
                 F.col("p.tok").alias("tok"))
        .agg(F.count("*").alias("c"))
        .persist()
    )
    bi = doc_bi.groupBy("prev", "tok").agg(F.sum("c").alias("cb"))
    ctx = bi.groupBy("prev").agg(F.sum("cb").alias("cp"))
    return (
        doc_bi.join(bi, ["prev", "tok"])
        .join(ctx, "prev")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(F.col("c") * -F.log(F.col("cb") / F.col("cp")))
                / F.sum("c"),
                6,
            ).alias("bigram_surprisal"),
        )
    )


def tfidf_search(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """Top-k documents for a bag-of-words query under plain TF-IDF
    (same smoothed idf as `tfidf_top_terms`): the second lexical
    scorer a rank-fusion stage wants next to BM25.

    Query-term postings only (filter before the (doc, term) shuffle);
    document frequency comes from the full-corpus (doc, term) pairs of
    the QUERY terms — one tiny aggregate, broadcast.
    """
    terms = _terms(df, text_col)
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    tf = (
        terms.filter(F.col("term").isin(*query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log((F.col("n_docs") + 1) / (F.col("df") + 1))
    return (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(F.round(F.sum(F.col("tf") * idf), 6).alias("tfidf"))
        .orderBy(F.col("tfidf").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    k_const: int = 60,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of two ranked lists: score(d) =
    Σ_lists 1/(k + rank_d) — the standard way to combine retrievers
    with incomparable score scales (BM25 + TF-IDF, lexical + vector).

    Inputs are (doc_id, rank) frames (rank 1 = best); a doc missing
    from one list simply contributes nothing for it.  Both lists are
    top-k-sized, so the fusion is driver-free arithmetic over tiny
    frames; ranks re-assign deterministically (score desc, doc_id asc).
    """
    from pyspark.sql import Window

    ar = a.select("doc_id", F.col("rank").alias("ra"))
    br = b.select("doc_id", F.col("rank").alias("rb"))
    fused = ar.join(br, "doc_id", "full").select(
        "doc_id",
        F.round(
            F.coalesce(1.0 / (F.lit(k_const) + F.col("ra")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k_const) + F.col("rb")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col("doc_id").asc())
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
    )


def tokenizer_fertility(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Tokenizer fertility per (source, lang): tokens per whitespace
    word and characters per token — the table that decides whether a
    tokenizer is wasting sequence length on some slice of the corpus.

    One narrow projection (all three counts fuse into one pass over the
    text) + one bounded-key aggregate.
    """
    toks = token_count_col(F.col(text_col))
    words = F.size(F.split(F.col(text_col), " "))
    chars = F.length(text_col)
    return (
        df.select(
            "source", "lang",
            toks.alias("t"), words.alias("w"), chars.alias("c"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("t").cast("long").alias("n_tokens"),
            F.round(F.sum("t") / F.sum("w"), 6).alias("tokens_per_word"),
            F.round(F.sum("c") / F.sum("t"), 6).alias("chars_per_token"),
        )
    )


def term_burstiness(df: DataFrame, text_col: str = "text",
                    top_k: int = 20) -> DataFrame:
    """Church–Gale burstiness for the top-df terms: P(term appears
    again | it appeared at all) = df₂/df — content words burst
    (repeat within the docs that use them), function words don't;
    the signal topic-model feature selection and stopword induction
    both use.

    One (doc, term, tf) aggregate feeds both document frequencies;
    top-k by df via TakeOrdered (the vocabulary never sorts in one
    task).
    """
    from pyspark.sql import Window

    tf = _terms(df, text_col).groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    stats = tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum((F.col("tf") >= 2).cast("long")).alias("df2"),
        F.sum("tf").alias("cf"),
    )
    rn = F.row_number().over(
        Window.orderBy(F.col("df").desc(), F.col("term").asc())
    )
    return (
        stats.withColumn("rank", rn)
        .where(F.col("rank") <= top_k)
        .select(
            "rank", "term",
            F.col("df").cast("long").alias("df"),
            F.col("df2").cast("long").alias("df2"),
            F.col("cf").cast("long").alias("cf"),
            F.round(F.col("df2") / F.col("df"), 6).alias("burstiness"),
        )
    )
