"""Round-7 regression tests: cache hygiene for the training-style
pipelines that persist corpus-derived intermediates (r06 ADVICE /
VERDICT item 5 — `ivfpq_search` kept amap/resid and
`dsir_model`/`dsir_weights` kept the doc-bucket aggregate cached
forever in long-lived sessions)."""

import random

from pyspark.sql import functions as F

from metrics_advisor_spark.functions.cacheutil import release_cached


def _persisted_ids(spark) -> set:
    # The SET of persisted RDD ids, not the global count: unrelated
    # cached RDDs from earlier tests may be GC'd/async-unpersisted
    # between two observations, so exact count equality against a
    # captured baseline is order-dependent (the r07 suite flake).
    # Delta-set assertions are immune to that.
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def _emb(spark, n=60, d=16, seed=7):
    rng = random.Random(seed)
    return spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(d)]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )


def _docs(spark):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rng = random.Random(11)
    return spark.createDataFrame(
        [
            (i, "src0" if i % 3 == 0 else "src1",
             " ".join(rng.choice(words) for _ in range(12)))
            for i in range(40)
        ],
        "doc_id long, source string, text string",
    )


def test_ivfpq_search_release_frees_cache(spark):
    from metrics_advisor_spark.functions.pq import ivfpq_search

    before = _persisted_ids(spark)
    emb = _emb(spark)
    res = ivfpq_search(
        emb.filter(F.col("vec_id") < 3), emb,
        k_coarse=4, m=4, k_codes=8, nprobe=2, k=5,
    )
    rows = res.collect()
    assert rows  # pipeline actually ran while the cache was live
    added = _persisted_ids(spark) - before
    assert added  # intermediates were cached
    release_cached(res)
    # exactly the ids THIS pipeline added are gone (blocking unpersist)
    assert added.isdisjoint(_persisted_ids(spark))
    # idempotent + plan still recomputable after release
    release_cached(res)
    assert sorted(map(tuple, res.collect())) == sorted(map(tuple, rows))


def test_packed_sequences_layout(spark):
    # concat-and-chunk semantics: straddling docs, interior bins with
    # no doc start, carry attribution, boundary vectors
    from metrics_advisor_spark.functions.corpus import packed_sequences

    docs = spark.createDataFrame(
        [(1, "a b c d e"),          # 5 tokens
         (2, "f g h"),              # 3 tokens
         (3, " ".join(["w"] * 25)),  # spans 4 bins of 8
         (4, "x y"),
         (5, "")],                  # tokenless → dropped
        "doc_id long, text string",
    )
    rows = {
        (r["shard"], r["bin_id"]): r
        for r in packed_sequences(
            docs, budget_tokens=8, n_shards=2
        ).collect()
    }
    by_shard = {}
    for (shard, _), r in rows.items():
        by_shard.setdefault(shard, []).append(r)
    # every shard's fills sum to its total tokens; only the last
    # sequence may be partial
    tok = {1: 5, 2: 3, 3: 25, 4: 2}
    shard_docs = {}
    for r in rows.values():
        for d in r["doc_ids"]:
            shard_docs.setdefault(r["shard"], set()).add(d)
    for shard, rs in by_shard.items():
        rs = sorted(rs, key=lambda r: r["bin_id"])
        assert [r["bin_id"] for r in rs] == list(range(len(rs)))
        assert sum(r["fill"] for r in rs) == sum(
            tok[d] for d in shard_docs[shard]
        )
        assert all(r["fill"] == 8 for r in rs[:-1])
    # doc 3 (25 tokens): interior + tail bins exist with zero starts
    # and carry attribution back to doc 3
    s3 = next(r["shard"] for r in rows.values() if 3 in r["doc_ids"])
    start_bin = next(
        r["bin_id"] for r in rows.values()
        if r["shard"] == s3 and 3 in r["doc_ids"]
    )
    carried = [
        r for r in by_shard[s3]
        if r["bin_id"] > start_bin and r["carry_doc_id"] == 3
    ]
    assert len(carried) >= 2  # 25 tokens at budget 8 → ≥2 carried bins
    assert all(r["n_docs"] == 0 for r in carried[:-1] or carried)
    # cu_seqlens always starts at 0 and ends at fill, strictly increasing
    for r in rows.values():
        cs = r["cu_seqlens"]
        assert cs[0] == 0 and cs[-1] == r["fill"]
        assert all(a < b for a, b in zip(cs, cs[1:]))
        # clean-boundary bins have no carry; carried bins name a doc
        assert (r["carry_doc_id"] is None) == (
            r["n_docs"] > 0 and r["doc_starts"][0] == 0
        )


def test_packed_sequences_partition_invariant(spark):
    from metrics_advisor_spark.functions.corpus import packed_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range((i * 13) % 29 + 1)))
         for i in range(60)],
        "doc_id long, text string",
    )

    def run(df):
        return sorted(
            (r["shard"], r["bin_id"], r["n_docs"], r["fill"],
             tuple(r["doc_ids"]), tuple(r["doc_starts"]),
             tuple(r["doc_lens"]), r["carry_doc_id"],
             tuple(r["cu_seqlens"]))
            for r in packed_sequences(df, budget_tokens=16).collect()
        )

    base = run(docs)
    for parts in (1, 7, 32):
        assert run(docs.repartition(parts)) == base


def test_streaming_ann_gate_matches_batch_over_batchings(spark):
    # stateless gate: a multi-micro-batch drain (maxFilesPerTrigger=1
    # over 3 source files) must admit exactly the batch plan's set
    import tempfile

    from metrics_advisor_spark.functions.pq import (
        pq_codebook,
        pq_encode,
        pq_search,
    )
    from metrics_advisor_spark.streaming.pipeline import streaming_ann_gate

    emb = _emb(spark, n=80, seed=13)
    cb = pq_codebook(emb, m=4, k=8).localCheckpoint(eager=True)
    refs = emb.filter(F.col("vec_id") < 4)
    # batch twin: min ADC distance per vector over all refs
    codes = pq_encode(emb, cb, m=4)
    scored = pq_search(refs, codes, cb, k=10**9, m=4)
    # pq_search excludes self-matches; the gate does not — add them back
    batch = {}
    for r in scored.collect():
        d = batch.get(r["vec_id"])
        if d is None or (r["adc_dist"], r["query_id"]) < d:
            batch[r["vec_id"]] = (r["adc_dist"], r["query_id"])
    threshold = sorted(d for d, _ in batch.values())[len(batch) // 2]
    base = tempfile.mkdtemp(prefix="ma_t_anngate_")
    emb.repartition(3).write.mode("overwrite").parquet(f"{base}/src")
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{base}/src")
    )
    streaming_ann_gate(
        stream, cb, refs, out_dir=f"{base}/out",
        threshold=threshold, m=4,
    )
    got = {
        r["vec_id"]: (r["min_adc_dist"], r["nearest_ref"])
        for r in spark.read.parquet(f"{base}/out").collect()
    }
    # the gate scores refs against themselves too (self-dist =
    # reconstruction error, usually tiny → refused); non-ref vectors
    # must match the batch argmin exactly
    expect = {
        v: dq for v, dq in batch.items()
        if dq[0] > threshold and v >= 4
    }
    non_ref_got = {v: dq for v, dq in got.items() if v >= 4}
    assert non_ref_got == expect and non_ref_got


def test_dsir_pipelines_release_frees_cache(spark):
    from metrics_advisor_spark.functions.selection import (
        dsir_model,
        dsir_resample,
        dsir_weights,
    )

    docs = _docs(spark)
    before = _persisted_ids(spark)

    model = dsir_model(docs, target=F.col("source") == "src0", n_buckets=64)
    assert model.count() > 0
    weights = dsir_weights(
        docs, target=F.col("source") == "src0", n_buckets=64
    )
    assert weights.count() > 0
    sample = dsir_resample(
        docs, target=F.col("source") == "src0", k=5, n_buckets=64
    )
    assert sample.count() == 5
    added = _persisted_ids(spark) - before
    assert added
    for df in (model, weights, sample):
        release_cached(df)
    assert added.isdisjoint(_persisted_ids(spark))


def test_dsir_score_missing_sentinel_raises(spark):
    # A model table lacking the bucket = -1 sentinel (e.g. a raw terms
    # table) must fail loudly, not silently score zero documents
    # (ADVICE r06: the old crossJoin with an empty frame emptied the
    # result instead).
    import pytest
    from pyspark.sql import functions as F

    from metrics_advisor_spark.functions.selection import (
        dsir_model,
        dsir_score,
    )

    fit = spark.createDataFrame(
        [(1, "alpha beta gamma", "tgt"), (2, "delta epsilon", "raw")],
        "doc_id long, text string, source string",
    )
    model = dsir_model(fit, target=F.col("source") == "tgt")
    broken = model.where(F.col("bucket") >= 0)  # sentinel stripped
    corpus = spark.createDataFrame(
        [(10, "alpha beta")], "doc_id long, text string"
    )
    with pytest.raises(Exception) as ei:
        dsir_score(corpus, broken).collect()
    assert "sentinel" in str(ei.value)
    # and the guarded path still scores normally with the sentinel
    assert dsir_score(corpus, model).count() == 1


def test_release_cached_warns_on_derived_frame(spark):
    # r07 ADVICE: a frame derived from a library result carries no
    # attachment record — releasing it must warn, not silently no-op.
    import warnings as _w

    from metrics_advisor_spark.functions.cacheutil import attach_cached

    base = _emb(spark, n=5)
    held = _emb(spark, n=5).persist()
    res = attach_cached(base, held)
    derived = res.filter(F.col("vec_id") >= 0)
    with _w.catch_warnings(record=True) as got:
        _w.simplefilter("always")
        release_cached(derived)
    assert any("derived" in str(w.message) for w in got)
    # the original still releases silently and idempotently
    with _w.catch_warnings(record=True) as got:
        _w.simplefilter("always")
        release_cached(res)
        release_cached(res)
    assert not got
