"""Round-10 additions: batched non-interacting BPE merges (VERDICT r09
item 6) and supporting invariants."""

from __future__ import annotations


def _mk_docs(spark):
    corpus = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
              + ["widest"] * 3 + ["lowest"] * 4)
    return spark.createDataFrame(
        [(i, " ".join(corpus[i::3])) for i in range(3)],
        "doc_id long, text string",
    )


def test_bpe_batched_k1_matches_sequential(spark):
    """k_batch=1 restores exact sequential semantics: identical merge
    list (order, pairs, counts) and identical final segmentation."""
    from metrics_advisor_spark.functions.bpe import (
        bpe_train,
        bpe_train_batched,
    )

    docs = _mk_docs(spark)
    m_seq, s_seq = bpe_train(docs, n_merges=7)
    m_b1, s_b1 = bpe_train_batched(docs, n_merges=7, k_batch=1)
    seq = [tuple(r) for r in m_seq.orderBy("it").collect()]
    b1 = [tuple(r) for r in m_b1.orderBy("it").collect()]
    assert seq == b1
    assert sorted(map(tuple, s_seq.collect())) == sorted(
        map(tuple, s_b1.collect())
    )


def test_bpe_admit_batch_rejects_concat_interactions():
    """ADVICE r10: symbol-set disjointness alone is not enough — an
    admitted (a, b) mints new 'ab' symbols at apply time, so a
    same-round (x, 'ab') would merge occurrences its recorded count
    never saw; symmetrically a candidate whose own concatenation is an
    already-admitted symbol mints occurrences for the earlier pair.
    Both must be deferred to the next round."""
    from metrics_advisor_spark.functions.bpe import _admit_batch

    rows = [
        {"left": "a", "right": "b", "pair_count": 100},
        {"left": "x", "right": "ab", "pair_count": 90},  # symbol == a+b
        {"left": "c", "right": "d", "pair_count": 80},
        {"left": "q", "right": "x", "pair_count": 70},  # shares x? no —
        # x was NOT admitted (its pair was rejected), so (q, x) is fine
    ]
    got = _admit_batch(rows, budget=8)
    assert got == [("a", "b", 100), ("c", "d", 80), ("q", "x", 70)]

    # vice versa: candidate whose concatenation equals an admitted
    # SYMBOL is deferred ((e, f) -> 'ef' collides with admitted
    # right-symbol 'ef')
    rows2 = [
        {"left": "g", "right": "ef", "pair_count": 50},
        {"left": "e", "right": "f", "pair_count": 40},
        {"left": "u", "right": "v", "pair_count": 30},
    ]
    got2 = _admit_batch(rows2, budget=8)
    assert got2 == [("g", "ef", 50), ("u", "v", 30)]

    # budget cap still honored
    assert _admit_batch(rows2, budget=1) == [("g", "ef", 50)]


def test_bpe_batched_admits_only_disjoint_pairs(spark):
    """Within any admission round, no two merges may share a symbol —
    that is the invariant that keeps batched pair counts exact.
    Reconstruct round boundaries by replaying the admission rule over
    the emitted merge list."""
    from metrics_advisor_spark.functions.bpe import bpe_train_batched

    k = 4
    merges, seg = bpe_train_batched(_mk_docs(spark), n_merges=8, k_batch=k)
    rows = merges.orderBy("it").collect()
    assert len(rows) == 8
    # counts within the list are valid BPE counts (positive, and the
    # first merge is the global argmax: no batched round may begin
    # with a smaller count than a later round's first pick)
    assert all(r["pair_count"] > 0 for r in rows)
    # replay: consecutive merges sharing a symbol MUST be in different
    # rounds, so between them the pair counts were re-aggregated;
    # verify the batch size bound holds under the greedy replay
    used: set[str] = set()
    batch_len = 0
    for r in rows:
        syms = {r["left"], r["right"]}
        if used & syms or batch_len >= k:
            used, batch_len = set(), 0  # round boundary
        used |= syms
        batch_len += 1
        assert batch_len <= k


def test_bpe_batched_segmentation_consistent_with_merges(spark):
    """The returned seg table must equal re-applying the returned merge
    list from scratch via bpe_segment_words — the merge list IS the
    tokenizer artifact; the table is just its materialization."""
    from metrics_advisor_spark.functions.bpe import (
        bpe_segment_words,
        bpe_train_batched,
    )

    docs = _mk_docs(spark)
    merges, seg = bpe_train_batched(docs, n_merges=8, k_batch=4)
    words = seg.select("word")
    reapplied = {
        r["word"]: tuple(r["tokens"])
        for r in bpe_segment_words(words, merges).collect()
    }
    got = {
        r["word"]: tuple(r["seg"].strip("\x01").split("\x01\x01"))
        for r in seg.collect()
    }
    assert got == reapplied
