"""Round-6 regression tests for the round-5 ADVICE items: short-doc
passage semantics, empty-text scrub accounting, semdedup id-type
generality + tile chunking, and the streaming near-dup gate's
idempotent per-batch writes."""

import tempfile

from metrics_advisor_spark.functions.dedup import (
    scrub_shared_passages,
    scrub_to_fixpoint,
    shared_passage_pairs,
)
from metrics_advisor_spark.functions.similarity import semdedup


def test_short_docs_produce_no_passage_pairs(spark):
    # two identical 2-word docs used to report max_shared_words = n
    # (one truncated gram) whenever min_words <= n; now docs shorter
    # than n words never enter the positional index
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"),
         (3, "a b c d e f g h i j"), (4, "a b c d e f g h i j")],
        "doc_id long, text string",
    )
    rows = shared_passage_pairs(df, n=3, min_words=3).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r["max_shared_words"] for r in rows}
    assert (1, 2) not in pairs  # 2-word docs carry no full 3-gram
    assert pairs[(3, 4)] == 10


def test_scrub_leaves_short_docs_untouched(spark):
    df = spark.createDataFrame(
        [(1, "tiny doc"), (2, "tiny doc")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in
            scrub_shared_passages(df, n=3, min_words=3).collect()}
    assert rows[1]["clean_text"] == "tiny doc"
    assert rows[2]["clean_text"] == "tiny doc"
    assert rows[2]["n_words_removed"] == 0


def test_scrub_to_fixpoint_empty_text_consistent(spark):
    # an empty input doc must report n_words_removed = 0 (it used to
    # report 1: size(split('', ' ')) = 1 in, 0 left)
    df = spark.createDataFrame(
        [(1, ""), (2, "some real document text here that stays")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in scrub_to_fixpoint(df).collect()}
    assert rows[1]["n_words_removed"] == 0
    assert rows[1]["n_words_in"] == 0
    assert rows[2]["n_words_removed"] == 0


def test_semdedup_string_ids(spark):
    # the pair schema is derived from the id type now; string ids keep
    # the lexicographically smallest member of each dup cluster
    v = [0.6, 0.8, 0.0, 0.0]
    w = [0.0, 0.0, 1.0, 0.0]
    df = spark.createDataFrame(
        [("doc-b", v), ("doc-a", v), ("doc-c", w)],
        "vec_id string, embedding array<float>",
    )
    kept = sorted(
        r["vec_id"]
        for r in semdedup(df, threshold=0.95, n_lists=2, id_col="vec_id")
        .collect()
    )
    assert kept == ["doc-a", "doc-c"]


def test_semdedup_chunked_tile_matches_unchunked(spark):
    # max_tile_cells small enough to force many row chunks must yield
    # the identical survivor set
    rows = [
        (i, [float(i % 4 == 0), float(i % 4 == 1),
             float(i % 4 == 2), float(i % 4 == 3)])
        for i in range(24)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = sorted(
        r["vec_id"] for r in semdedup(df, threshold=0.99, n_lists=2).collect()
    )
    chunked = sorted(
        r["vec_id"]
        for r in semdedup(
            df, threshold=0.99, n_lists=2, max_tile_cells=5
        ).collect()
    )
    assert chunked == full
    assert len(full) == 4  # one survivor per basis direction


def test_neardup_gate_batch_retry_idempotent(spark):
    # re-draining the SAME source against a fresh store but the same
    # out_dir (simulating a foreachBatch retry of batch 0 within one
    # run would overwrite; across runs each run has its own leaf) must
    # not duplicate survivors within one run's leaves
    from metrics_advisor_spark.streaming.pipeline import (
        streaming_neardup_gate,
    )

    base = tempfile.mkdtemp(prefix="ma_t_neardup6_")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta"),
         (2, "totally different words in this second document here")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{base}/src")
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"{base}/src"
    )
    streaming_neardup_gate(
        stream, store_dir=f"{base}/store", out_dir=f"{base}/out"
    )
    out = spark.read.parquet(f"{base}/out")
    # partition-discovery adds run/batch dirs, not columns the data
    # rows duplicate; doc ids stay unique
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == [1, 2]


def test_dsir_weights_favor_target_like_docs(spark):
    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.selection import dsir_weights

    target_text = "alpha beta gamma alpha beta gamma alpha beta"
    rows = (
        [(i, target_text, "tgt") for i in range(5)]
        + [(10 + i, "omega psi chi omega psi chi omega psi", "raw")
           for i in range(5)]
        + [(20, target_text, "raw"),  # target-like doc in the raw pool
           (21, "omega psi chi omega psi chi omega psi", "tgt2")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    w = {
        r["doc_id"]: r["log_weight"]
        for r in dsir_weights(df, target=F.col("source") == "tgt").collect()
    }
    # the target-like raw doc must outscore the non-target-like one
    # (absolute sign is arbitrary — the raw model contains the target
    # docs too; DSIR resampling consumes the ORDERING)
    assert w[20] > w[21]
    assert w[0] > w[10]
    assert w[20] == w[0]  # identical text → identical weight


def test_dsir_single_token_doc_no_bigrams(spark):
    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.selection import dsir_weights

    df = spark.createDataFrame(
        [(1, "word", "a"), (2, "two tokens", "b")],
        "doc_id long, text string, source string",
    )
    rows = {
        r["doc_id"]: r["n_grams"]
        for r in dsir_weights(df, target=F.col("source") == "a").collect()
    }
    assert rows[1] == 1  # one unigram, no (descending-sequence) bigram
    assert rows[2] == 3  # two unigrams + one bigram


def test_intradoc_repetition_detects_self_concat(spark):
    from metrics_advisor_spark.functions.dedup import intradoc_repetition

    uniq = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, uniq + " " + uniq),  # whole text repeats
         (2, uniq)],              # no repeats
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in intradoc_repetition(df).collect()}
    assert 2 not in rows
    # 40 words, repeated 20-word block: longest repeated span = 20
    assert rows[1]["max_rep_words"] == 20


def test_dup_cluster_purity_entropy(spark):
    import math

    from metrics_advisor_spark.functions.dedup import dup_cluster_purity

    df = spark.createDataFrame(
        [(1, "same text", "s1"), (2, "same text", "s1"),
         (3, "other text", "s1"), (4, "other text", "s2"),
         (5, "unique text", "s1")],
        "doc_id long, text string, source string",
    )
    rows = {r["cluster_id"]: r for r in dup_cluster_purity(df).collect()}
    assert rows[1]["n_sources"] == 1 and rows[1]["src_entropy"] == 0.0
    assert rows[3]["n_sources"] == 2
    assert abs(rows[3]["src_entropy"] - math.log(2)) < 1e-6
    assert 5 not in rows


def test_dsir_score_unseen_bucket_uses_default(spark):
    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.selection import (
        dsir_model,
        dsir_score,
    )

    fit = spark.createDataFrame(
        [(1, "alpha beta gamma", "tgt"), (2, "delta epsilon zeta", "raw")],
        "doc_id long, text string, source string",
    )
    model = dsir_model(fit, target=F.col("source") == "tgt")
    # sentinel default row present
    assert model.where(F.col("bucket") == -1).count() == 1
    # score a corpus with grams the fit corpus never saw — must not
    # drop rows or produce nulls
    new = spark.createDataFrame(
        [(10, "totally novel words never fitted")],
        "doc_id long, text string",
    )
    rows = dsir_score(new, model).collect()
    assert len(rows) == 1
    assert rows[0]["log_weight"] is not None
    assert rows[0]["n_grams"] == 9  # 5 unigrams + 4 bigrams


def test_dsir_resample_prefers_heavy_weights(spark):
    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.selection import dsir_resample

    tgt = "alpha beta gamma delta alpha beta gamma delta"
    rows = (
        [(i, tgt, "tgt") for i in range(3)]
        + [(100 + i, "noise words here totally unrelated stuff ok fine",
            "raw") for i in range(40)]
        + [(500, tgt, "raw")]  # target-like raw doc
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = dsir_resample(df, target=F.col("source") == "tgt", k=5).collect()
    assert len(got) == 5
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    # the target-like raw doc should make the small sample with high
    # probability; at minimum the sample is deterministic
    again = dsir_resample(df, target=F.col("source") == "tgt", k=5).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]


def test_streaming_dsir_gate_matches_batch_score(spark):
    import tempfile

    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.selection import (
        dsir_model,
        dsir_score,
    )
    from metrics_advisor_spark.streaming.pipeline import streaming_dsir_gate

    docs = spark.createDataFrame(
        [(i, f"alpha beta doc {i} with shared words", "tgt" if i < 3 else "raw")
         for i in range(10)],
        "doc_id long, text string, source string",
    )
    model = dsir_model(docs, target=F.col("source") == "tgt")
    batch_admit = {
        r["doc_id"]
        for r in dsir_score(docs.select("doc_id", "text"), model)
        .where(F.col("log_weight") >= -20.0)
        .collect()
    }
    base = tempfile.mkdtemp(prefix="ma_t_dsirgate_")
    docs.select("doc_id", "text").write.mode("overwrite").parquet(
        f"{base}/src"
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        f"{base}/src"
    )
    streaming_dsir_gate(
        stream, model, out_dir=f"{base}/out", threshold=-20.0
    )
    got = {
        r["doc_id"] for r in spark.read.parquet(f"{base}/out").collect()
    }
    assert got == batch_admit and got  # nonempty and identical


def test_register_corpus_views_sql_roundtrip(spark):
    from pyspark.sql import functions as F

    from metrics_advisor_spark.sql import register_corpus_views

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma doc number {i} here", "src0" if i < 3 else "src1")
         for i in range(6)],
        "doc_id long, text string, source string",
    )
    register_corpus_views(spark, docs, target=F.col("source") == "src0")
    got = spark.sql(
        """
        SELECT d.doc_id FROM documents d
        JOIN doc_dsir w USING (doc_id)
        WHERE w.log_weight IS NOT NULL
        ORDER BY d.doc_id
        """
    ).count()
    assert got == 6
    assert spark.sql("SELECT * FROM doc_quality").count() == 6


def test_butterworth_coefficients_match_published_values():
    import numpy as np

    from metrics_advisor_spark.operators.detect import butter_lowpass_np

    # scipy.signal.butter(3, 0.1) — published reference values
    b, a = butter_lowpass_np(3, 0.1)
    assert np.allclose(
        b, [0.00289819, 0.00869458, 0.00869458, 0.00289819], atol=1e-6
    )
    assert np.allclose(
        a, [1.0, -2.37409474, 1.92935567, -0.53207537], atol=1e-6
    )


def test_filtfilt_zero_phase_and_band_behavior():
    import numpy as np

    from metrics_advisor_spark.operators.detect import (
        butter_lowpass_np,
        filtfilt_np,
    )

    b, a = butter_lowpass_np(3, 0.1)
    # DC gain exactly 1 (constant preserved)
    assert np.allclose(filtfilt_np(b, a, np.full(200, 5.0)), 5.0, atol=1e-9)
    t = np.arange(2000)
    slow = np.sin(2 * np.pi * t / 500)
    fast = np.sin(2 * np.pi * t / 4)
    ys, yf = filtfilt_np(b, a, slow), filtfilt_np(b, a, fast)
    core = slice(100, -100)
    assert np.std(ys[core]) / np.std(slow[core]) > 0.999  # passband flat
    assert np.std(yf[core]) / np.std(fast[core]) < 1e-4   # stopband killed
    # zero phase: peak cross-correlation at lag 0
    c = np.correlate(
        ys[core] - ys[core].mean(), slow[core] - slow[core].mean(), "full"
    )
    assert int(np.argmax(c)) == len(ys[core]) - 1


def test_stl_outliers_butterworth_mode_finds_planted_spike():
    import numpy as np

    from metrics_advisor_spark.operators.detect import stl_outliers_np

    rng = np.random.default_rng(7)
    t = np.arange(1200)
    x = (
        np.sin(2 * np.pi * t / 400)  # seasonality the low-pass removes
        + 0.01 * rng.standard_normal(t.size)
    )
    x[600] += 5.0  # planted spike
    for mode in ("fft", "butterworth"):
        idx = stl_outliers_np(
            x, window=5, step_seconds=15.0, f_min=0.01 / 15, level=3.0,
            lowpass_mode=mode,
        )
        assert 600 in idx, f"spike missed in {mode} mode"


def test_filtfilt_short_series_does_not_crash():
    import numpy as np

    from metrics_advisor_spark.operators.detect import (
        butter_lowpass_np,
        filtfilt_np,
    )

    b, a = butter_lowpass_np(3, 0.1)
    for n in (1, 2, 5, 11):
        y = filtfilt_np(b, a, np.arange(n, dtype=float))
        assert y.size == n and np.isfinite(y).all()


def test_pq_exact_dup_vectors_share_codes_and_adc_zero(spark):
    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.pq import (
        pq_codebook,
        pq_encode,
        pq_search,
    )

    import random

    rng = random.Random(3)
    base = [
        (i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(60)
    ]
    dup = [(1000 + i, v) for i, v in base[:5]]  # exact copies
    emb = spark.createDataFrame(
        base + dup, "vec_id long, embedding array<float>"
    )
    cb = pq_codebook(emb, m=4, k=8)
    codes = pq_encode(emb, cb, m=4)
    by_vec = {}
    for r in codes.collect():
        by_vec.setdefault(r["vec_id"], {})[r["s"]] = r["code"]
    for i in range(5):
        assert by_vec[i] == by_vec[1000 + i]  # identical vectors, codes
    # ADC: the exact dup shares the query's codes, so it attains the
    # minimum possible ADC distance (= the query's own quantization
    # error — NOT 0: ADC measures query↔codeword, not query↔vector)
    # and must rank first (vec_id tiebreak among same-code vectors)
    res = pq_search(
        emb.filter(F.col("vec_id") < 3), codes, cb, k=3, m=4
    ).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in range(3):
        rows = sorted(by_q[q], key=lambda r: r["rank"])
        assert rows[0]["vec_id"] == 1000 + q
        assert rows[0]["adc_dist"] <= rows[-1]["adc_dist"]


def test_pq_codebook_cells_cover_and_balance(spark):
    from metrics_advisor_spark.functions.pq import pq_codebook, pq_encode

    import random

    rng = random.Random(9)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    cb = pq_codebook(emb, m=4, k=8)
    rows = cb.collect()
    assert {r["s"] for r in rows} == {0, 1, 2, 3}
    assert sum(r["n_assigned"] for r in rows) == 4 * 200  # total coverage
    codes = pq_encode(emb, cb, m=4)
    assert codes.count() == 4 * 200


def test_pq_seed_sample_mod_still_yields_codebook(spark):
    from metrics_advisor_spark.functions.pq import pq_codebook

    import random

    rng = random.Random(11)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(400)],
        "vec_id long, embedding array<float>",
    )
    cb = pq_codebook(emb, m=4, k=4, seed_sample_mod=8).collect()
    # ~50 candidates per subspace survive the 1/8 hash filter; k=4
    # seeds must still exist and cover all subspaces
    assert {r["s"] for r in cb} == {0, 1, 2, 3}
    assert sum(r["n_assigned"] for r in cb) == 4 * 400


def test_ivfpq_exact_dup_ranks_first(spark):
    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.pq import ivfpq_search

    import random

    rng = random.Random(5)
    base = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(80)]
    dup = [(2000 + i, v) for i, v in base[:3]]
    emb = spark.createDataFrame(
        base + dup, "vec_id long, embedding array<float>"
    )
    res = ivfpq_search(
        emb.filter(F.col("vec_id") < 3), emb,
        k_coarse=4, m=4, k_codes=8, nprobe=2, k=5,
    ).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    for q in range(3):
        rows = sorted(by_q[q], key=lambda r: r["rank"])
        # the exact dup lands in the query's own cell (residual 0 →
        # same codes) and must rank first
        assert rows[0]["vec_id"] == 2000 + q
        assert len(rows) == 5


def test_ivfpq_probe_limits_candidates(spark):
    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.pq import ivfpq_search

    import random

    rng = random.Random(6)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )
    q = emb.filter(F.col("vec_id") < 2)
    narrow = ivfpq_search(q, emb, k_coarse=6, nprobe=1, k=100, m=4,
                          k_codes=8)
    wide = ivfpq_search(q, emb, k_coarse=6, nprobe=6, k=100, m=4,
                        k_codes=8)
    # probing fewer cells can only shrink the candidate set
    assert narrow.count() < wide.count()


def test_wav_payload_is_genuine_riff(spark):
    import struct

    from metrics_advisor_spark.functions.multimodal import (
        attach_wav_payload,
    )

    df = spark.createDataFrame([(7,), (13,)], "doc_id long")
    rows = {r["doc_id"]: bytes(r["wav"])
            for r in attach_wav_payload(df).collect()}
    for doc_id, wav in rows.items():
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        (fmt_len, pcm, ch, sr) = struct.unpack("<IHHI", wav[16:28])
        assert (fmt_len, pcm, ch, sr) == (16, 1, 1, 8000)
        (data_len,) = struct.unpack("<I", wav[40:44])
        assert len(wav) == 44 + data_len
        assert data_len == (400 + (doc_id % 10) * 80) * 2


def test_audio_meta_parses_back_synthesis_rule(spark):
    from metrics_advisor_spark.functions.multimodal import (
        attach_wav_payload,
        audio_meta,
    )

    df = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    rows = {r["doc_id"]: r
            for r in audio_meta(attach_wav_payload(df)).collect()}
    for i in range(12):
        assert rows[i]["n_samples"] == 400 + (i % 10) * 80
        assert rows[i]["sample_rate"] == 8000
        assert rows[i]["duration_ms"] == rows[i]["n_samples"] * 1000 // 8000


def test_audio_windows_integer_features(spark):
    from metrics_advisor_spark.functions.multimodal import (
        attach_wav_payload,
        audio_windows,
    )

    df = spark.createDataFrame([(3,)], "doc_id long")
    rows = audio_windows(attach_wav_payload(df), window=160).collect()
    n = 400 + (3 % 10) * 80  # 640 samples → 4 full windows
    assert len(rows) == n // 160
    assert sum(r["n_in_win"] for r in rows) == n
    # recompute window 0 features straight from the synthesis rule
    s = [((3 * 31 + i * 17) % 65536) - 32768 for i in range(160)]
    w0 = next(r for r in rows if r["win_id"] == 0)
    assert w0["sum_sq"] == sum(v * v for v in s)
    assert w0["zcr"] == sum(
        1 for a, b in zip(s, s[1:]) if a * b < 0
    )


def test_dsir_weights_partition_invariant(spark):
    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.selection import dsir_weights

    rows = [
        (i, f"some words w{i % 7} and w{i % 3} shared tail tokens here",
         "src0" if i % 5 == 0 else "srcX")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    base = sorted(
        tuple(r)
        for r in dsir_weights(df, target=F.col("source") == "src0").collect()
    )
    for parts in (1, 7, 32):
        got = sorted(
            tuple(r)
            for r in dsir_weights(
                df.repartition(parts), target=F.col("source") == "src0"
            ).collect()
        )
        assert got == base, f"dsir weights changed at repartition({parts})"


def test_pq_pipeline_partition_invariant(spark):
    import random

    from metrics_advisor_spark.functions.pq import pq_codebook, pq_encode

    rng = random.Random(21)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(120)],
        "vec_id long, embedding array<float>",
    )

    def run(df, n_buckets):
        cb = pq_codebook(df, m=4, k=8, n_buckets=n_buckets)
        codes = pq_encode(df, cb, m=4)
        return (
            sorted((r["s"], r["code"], tuple(r["centroid"]), r["n_assigned"])
                   for r in cb.collect()),
            sorted(tuple(r) for r in codes.collect()),
        )

    # the bounded two-level centroid fold must be bit-identical at any
    # partition count, and must stay so at BOTH a contract-default and
    # a tiny bucket count (tiny → multi-element level-1 arrays, so the
    # level-2 bucket-order fold is actually exercised)
    for n_buckets in (256, 7):
        base = run(emb, n_buckets)
        for parts in (1, 5, 32):
            assert run(emb.repartition(parts), n_buckets) == base, (
                f"pq pipeline changed at repartition({parts}), "
                f"n_buckets={n_buckets}"
            )


def test_pq_reconstruction_partition_invariant(spark):
    import random

    from metrics_advisor_spark.functions.pq import (
        pq_codebook,
        pq_encode,
        pq_reconstruction_error,
    )

    rng = random.Random(22)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(150)],
        "vec_id long, embedding array<float>",
    )
    cb = pq_codebook(emb, m=4, k=8).localCheckpoint(eager=True)
    codes = pq_encode(emb, cb, m=4).localCheckpoint(eager=True)

    def run(df, n_buckets):
        return sorted(
            tuple(r)
            for r in pq_reconstruction_error(
                df, cb, codes, m=4, n_buckets=n_buckets
            ).collect()
        )

    for n_buckets in (256, 7):
        base = run(emb, n_buckets)
        for parts in (1, 8, 32):
            assert run(emb.repartition(parts), n_buckets) == base, (
                f"pq mse changed at repartition({parts}), "
                f"n_buckets={n_buckets}"
            )


def test_pagerank_partition_invariant(spark):
    from metrics_advisor_spark.functions.graph import pagerank

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4), (5, 6)],
        "doc_a long, doc_b long",
    )
    base = sorted(tuple(r) for r in pagerank(pairs, iterations=3).collect())
    for parts in (1, 8):
        got = sorted(
            tuple(r)
            for r in pagerank(
                pairs.repartition(parts), iterations=3
            ).collect()
        )
        assert got == base


def test_pq_more_lloyd_iterations_reduce_quantization_error(spark):
    import random

    import numpy as np

    from metrics_advisor_spark.functions.pq import pq_codebook, pq_encode

    rng = random.Random(31)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(150)],
        "vec_id long, embedding array<float>",
    )

    def quant_err(iters: int) -> float:
        cb = pq_codebook(emb, m=4, k=8, iterations=iters)
        cents = {
            (r["s"], r["code"]): np.array(r["centroid"])
            for r in cb.collect()
        }
        codes = pq_encode(emb, cb, m=4).collect()
        vecs = {
            r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()
        }
        err = 0.0
        for r in codes:
            sub = vecs[r["vec_id"]][r["s"] * 4 : (r["s"] + 1) * 4]
            err += float(((sub - cents[(r["s"], r["code"])]) ** 2).sum())
        return err

    e1, e3 = quant_err(1), quant_err(3)
    assert e3 < e1  # each Lloyd step is a descent step


def test_pq_reconstruction_error_drops_with_iterations(spark):
    import random

    from metrics_advisor_spark.functions.pq import (
        pq_codebook,
        pq_encode,
        pq_reconstruction_error,
    )

    rng = random.Random(41)
    emb = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(150)],
        "vec_id long, embedding array<float>",
    )

    def total_mse(iters):
        cb = pq_codebook(emb, m=4, k=8, iterations=iters)
        codes = pq_encode(emb, cb, m=4)
        rows = pq_reconstruction_error(emb, cb, codes, m=4).collect()
        assert {r["s"] for r in rows} == {0, 1, 2, 3}
        assert all(r["n_vecs"] == 150 for r in rows)
        return sum(r["mse"] for r in rows)

    assert total_mse(3) < total_mse(1)
