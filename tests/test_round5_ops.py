"""Round-5 new surfaces: streaming near-dup gate (14th streaming
surface) and the flagship positional contract query."""

import tempfile

from pyspark.sql import functions as F

from metrics_advisor_spark.functions.dedup import (
    minhash_bands,
    minhash_lsh_pairs,
)
from metrics_advisor_spark.streaming.pipeline import streaming_neardup_gate


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(path)


def _gate(spark, src, store, out):
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    streaming_neardup_gate(stream, store_dir=store, out_dir=out)


def test_neardup_gate_within_batch(spark):
    base = tempfile.mkdtemp(prefix="ma_t_neardup_")
    text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, text), (2, text), (3, "a completely different document "
                                      "about spark structured streaming")]
    _write_docs(spark, f"{base}/src", rows)
    _gate(spark, f"{base}/src", f"{base}/store", f"{base}/out")
    admitted = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{base}/out").collect()
    )
    # doc 2 is an exact dup of doc 1 → suppressed; min-id winner stays
    assert admitted == [1, 3]


def test_neardup_gate_cross_batch_store(spark):
    base = tempfile.mkdtemp(prefix="ma_t_neardup2_")
    text = "one shared boilerplate paragraph that repeats across batches ok"
    _write_docs(spark, f"{base}/b1", [(10, text), (11, "unique first doc "
                                                       "entirely different words")])
    _write_docs(spark, f"{base}/b2", [(20, text), (21, "another novel doc "
                                                       "with fresh content words")])
    # two separate drains sharing the admitted-band store = two batches
    _gate(spark, f"{base}/b1", f"{base}/store", f"{base}/out")
    _gate(spark, f"{base}/b2", f"{base}/store", f"{base}/out")
    admitted = sorted(
        r["doc_id"] for r in spark.read.parquet(f"{base}/out").collect()
    )
    # doc 20 collides with admitted doc 10 via the store → suppressed
    assert admitted == [10, 11, 21]


def test_minhash_bands_matches_lsh_pairs(spark):
    # pairs derived from the factored band helper == the r01-green
    # minhash_lsh_pairs output (refactor safety net)
    docs = spark.createDataFrame(
        [(i, f"shared prefix words here tail {i % 3}") for i in range(12)],
        "doc_id long, text string",
    )
    band = minhash_bands(docs)
    a, b = band.alias("a"), band.alias("b")
    via_bands = sorted(
        (r["doc_a"], r["doc_b"])
        for r in a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .collect()
    )
    direct = sorted(
        (r["doc_a"], r["doc_b"]) for r in minhash_lsh_pairs(docs).collect()
    )
    assert via_bands == direct and len(direct) > 0


def test_flagship_positional_contract(spark):
    import __spark_entry__ as em

    df = em.q_flagship_positional(spark, "/root/testdata/sf0.001")
    # schema-stable rows-only contract; sf0.001 may legitimately be empty
    assert df.columns == [
        "bucket_id", "obj_metric", "cand_metric", "lag", "corr", "rank"
    ]
    df.collect()


def test_shared_passage_pairs_planted(spark):
    # doc 2 quotes a 15-word passage of doc 1 inside unrelated text;
    # doc 3 shares nothing
    passage = " ".join(f"p{i}" for i in range(15))
    rows = [
        (1, "intro words here " + passage + " closing remarks now"),
        (2, "other document starts " + passage + " and then diverges"),
        (3, " ".join(f"z{i}" for i in range(25))),
    ]
    from metrics_advisor_spark.functions.dedup import shared_passage_pairs

    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["doc_a"], r["doc_b"]): r["max_shared_words"]
        for r in shared_passage_pairs(df, n=8, min_words=12).collect()
    }
    assert set(out) == {(1, 2)}
    assert out[(1, 2)] == 15  # exactly the quoted passage length


def test_shared_passage_runs_split_by_gap(spark):
    # two separate 10-word shared passages with a divergent middle →
    # n_runs == 2 and max == 10 (runs must NOT merge across the gap)
    p1 = " ".join(f"a{i}" for i in range(10))
    p2 = " ".join(f"b{i}" for i in range(10))
    rows = [
        (1, p1 + " unique middle one " + p2),
        (2, p1 + " different bridge words " + p2),
    ]
    from metrics_advisor_spark.functions.dedup import shared_passage_pairs

    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = shared_passage_pairs(df, n=8, min_words=10).collect()
    assert len(r) == 1
    assert r[0]["max_shared_words"] == 10
    assert r[0]["n_runs"] == 2


def test_cross_source_neardup_finds_truncated_mirror(spark):
    from metrics_advisor_spark.functions.dedup import cross_source_neardup

    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lamda mu nu xi omicron pi rho sigma tau upsilon")
    rows = [
        (1, base, "crawl"),
        (2, " ".join(f"w{i}" for i in range(20)), "crawl"),
        # mirror re-crawl of doc 1 with the last word dropped
        (3, base.rsplit(" ", 1)[0], "mirror"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["src_a"], r["src_b"]): r["n_neardup_pairs"]
        for r in cross_source_neardup(df).collect()
    }
    assert out.get(("crawl", "mirror")) == 1


def test_shared_passages_match_bruteforce(spark):
    """Property: shared_passage_pairs == a direct python reference over
    random corpora drawn from a tiny vocabulary (high collision rate →
    exercises multi-diagonal and repeated-gram paths)."""
    import itertools
    import random

    from metrics_advisor_spark.functions.dedup import shared_passage_pairs

    n, min_words = 3, 4
    for seed in (0, 1, 2):
        rng = random.Random(seed)
        docs = [
            (i, " ".join(rng.choice("abc") for _ in range(rng.randint(3, 14))))
            for i in range(8)
        ]

        def grams(t):
            w = t.split(" ")
            if len(w) < n:
                return [" ".join(w[:n])]  # slice(…, n) pads like Spark? no: short doc → one gram of all words
            return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

        expect = {}
        for (ida, ta), (idb, tb) in itertools.combinations(docs, 2):
            ga, gb = grams(ta), grams(tb)
            runs = {}
            for pa, a_ in enumerate(ga):
                for pb, b_ in enumerate(gb):
                    if a_ == b_:
                        runs.setdefault(pa - pb, []).append(pa)
            best, n_runs = 0, 0
            for poss in runs.values():
                poss.sort()
                lens = []
                cur_len = 1
                for x, y in zip(poss, poss[1:]):
                    if y == x + 1:
                        cur_len += 1
                    else:
                        lens.append(cur_len)
                        cur_len = 1
                lens.append(cur_len)
                best = max(best, max(lens))
                n_runs += len(lens)
            if best and best + n - 1 >= min_words:
                expect[(min(ida, idb), max(ida, idb))] = (
                    best + n - 1, n_runs
                )

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r["doc_a"], r["doc_b"]): (r["max_shared_words"], r["n_runs"])
            for r in shared_passage_pairs(
                df, n=n, min_words=min_words
            ).collect()
        }
        assert got == expect, f"seed={seed}: {got} != {expect}"


def test_scrub_shared_passages_keep_first(spark):
    from metrics_advisor_spark.functions.dedup import scrub_shared_passages

    passage = " ".join(f"p{i}" for i in range(14))
    rows = [
        (1, "intro words here " + passage + " closing remarks now"),
        (2, "other document starts " + passage + " and then diverges"),
        (3, " ".join(f"z{i}" for i in range(20))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in scrub_shared_passages(
        df, n=8, min_words=12
    ).collect()}
    # keep-first: doc 1 untouched, doc 2 loses exactly the passage,
    # doc 3 untouched
    assert out[1]["n_words_removed"] == 0
    assert out[1]["clean_text"] == rows[0][1]
    assert out[2]["n_words_removed"] == 14
    assert out[2]["clean_text"] == "other document starts and then diverges"
    assert out[3]["n_words_removed"] == 0
    # every input doc present exactly once
    assert sorted(out) == [1, 2, 3]


def test_scrub_to_fixpoint_second_round_adjacency(spark):
    """Removing a span creates a NEW shared passage: doc 2 = P+FOO+S
    loses FOO (shared with doc 1) in round 1, and the resulting 'P S'
    adjacency duplicates doc 0 — only the fixpoint pass removes it."""
    from metrics_advisor_spark.functions.dedup import (
        scrub_shared_passages,
        scrub_to_fixpoint,
    )

    rows = [
        (0, "p1 p2 s1 s2"),
        (1, "x1 x2 f1 f2 f3 f4 y1 y2"),
        (2, "p1 p2 f1 f2 f3 f4 s1 s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    single = {
        r["doc_id"]: r
        for r in scrub_shared_passages(df, n=3, min_words=4).collect()
    }
    # single pass: only FOO comes out of doc 2
    assert single[2]["clean_text"] == "p1 p2 s1 s2"
    assert single[2]["n_words_removed"] == 4
    fp = {
        r["doc_id"]: r
        for r in scrub_to_fixpoint(df, n=3, min_words=4).collect()
    }
    assert fp[0]["n_words_removed"] == 0
    assert fp[1]["n_words_removed"] == 0
    assert fp[2]["clean_text"] == ""
    assert fp[2]["n_words_removed"] == 8
    assert fp[2]["n_rounds"] >= 2
