"""Unigram-LM tokenizer (`functions/unigram.py`): lattice math
cross-checked against an INDEPENDENT probability-space implementation
(no shared code), the distributed trainer checked bit-identical
against a single-process reference EM, and segmentation invariants."""

from __future__ import annotations

import math

import pytest

from metrics_advisor_spark.functions.unigram import (
    _Q,
    _seed_counts,
    unigram_segment_words,
    unigram_train,
    viterbi_segment,
    word_expected_counts,
)


# ---------------------------------------------------------------------------
# independent reference: probability-space forward/backward (explicit
# enumeration for short words) — different math path entirely
# ---------------------------------------------------------------------------


def _enumerate_segmentations(word, vocab, max_len):
    if not word:
        yield []
        return
    for ln in range(1, min(len(word), max_len) + 1):
        head = word[:ln]
        if head in vocab:
            for rest in _enumerate_segmentations(
                word[ln:], vocab, max_len
            ):
                yield [head] + rest


def _expected_by_enumeration(word, logp, max_len):
    segs = list(_enumerate_segmentations(word, set(logp), max_len))
    if not segs:
        return {}
    probs = [math.exp(sum(logp[p] for p in s)) for s in segs]
    z = sum(probs)
    out = {}
    for s, pr in zip(segs, probs):
        for piece in s:
            out[piece] = out.get(piece, 0.0) + pr / z
    return out


def test_expected_counts_match_enumeration():
    corpus_words = ["abab", "aab", "bb", "abba"]
    vocab = ["a", "b", "ab", "ba", "bb", "aba"]
    total = len(vocab)
    logp = {p: math.log(1.0 / total) for p in vocab}
    for w in corpus_words:
        got = word_expected_counts(w, logp, max_len=3)
        want = _expected_by_enumeration(w, logp, max_len=3)
        assert set(got) == set(want)
        for p in want:
            assert got[p] == pytest.approx(want[p], abs=1e-12), (w, p)


def test_viterbi_picks_max_prob_segmentation():
    logp = {"a": math.log(0.3), "b": math.log(0.2),
            "ab": math.log(0.4), "ba": math.log(0.1)}
    # 'abab': ab+ab = 0.16 beats a+ba+b=0.006 etc.
    assert viterbi_segment("abab", logp, 2) == ["ab", "ab"]
    # unreachable word falls back to characters
    assert viterbi_segment("xyz", logp, 2) == ["x", "y", "z"]
    # concatenation invariant
    assert "".join(viterbi_segment("aabba", logp, 2)) == "aabba"


def test_seed_counts():
    assert _seed_counts("aba", 2, 2) == {
        "a": 4, "b": 2, "ab": 2, "ba": 2
    }


# ---------------------------------------------------------------------------
# single-process reference trainer (same algorithm, no Spark) — the
# distributed plan must reproduce it BIT-IDENTICALLY thanks to the
# integer quantization of expected counts
# ---------------------------------------------------------------------------


def _reference_train(word_counts, *, vocab_size, seed_size,
                     max_piece_len, n_iters):
    agg = {}
    for w, wn in word_counts.items():
        for s, c in _seed_counts(w, wn, max_piece_len).items():
            agg[s] = agg.get(s, 0) + c
    ranked = sorted(agg.items(), key=lambda pc: (-pc[1], pc[0]))
    counts = dict(ranked[:seed_size])
    chars = {p: c for p, c in agg.items() if len(p) == 1}
    for ch, c in chars.items():
        counts.setdefault(ch, c)

    def to_logp(cnt):
        total = sum(cnt.values())
        return {p: math.log(c / total) for p, c in cnt.items() if c > 0}

    logp = to_logp(counts)
    for _ in range(n_iters):
        new = {}
        for w, wn in word_counts.items():
            for piece, e in word_expected_counts(
                w, logp, max_piece_len
            ).items():
                q = int(round(e * _Q)) * wn
                if q:
                    new[piece] = new.get(piece, 0) + q
        singles = {p: c for p, c in new.items() if len(p) == 1}
        multi = sorted(
            ((p, c) for p, c in new.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )
        keep = dict(multi[: max(0, vocab_size - len(singles))])
        keep.update(singles)
        for ch in chars:
            keep.setdefault(ch, 1)
        counts = keep
        logp = to_logp(counts)
    return sorted(
        ((p, c, logp[p]) for p, c in counts.items()),
        key=lambda t: (-t[1], t[0]),
    )


def test_distributed_matches_reference(spark):
    texts = [
        "low lower lowest slow slowly low low",
        "new newer newest news new new",
        "low slow lower newest news",
        "the lowest of the low",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    params = dict(vocab_size=40, seed_size=300, max_piece_len=4,
                  n_iters=2)
    got = unigram_train(df, **params)

    wc = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want = _reference_train(wc, **params)

    assert list(map(tuple, got.itertuples(index=False))) == want


def test_training_learns_frequent_subwords(spark):
    texts = ["lowlow lowlow lowest lowest lower"] * 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    vocab = unigram_train(df, vocab_size=20, seed_size=100,
                          max_piece_len=4, n_iters=3)
    pieces = set(vocab["piece"])
    assert "low" in pieces  # the shared stem becomes a piece
    # every single character survives pruning
    assert {"l", "o", "w", "e", "s", "t", "r"} <= pieces

    seg = unigram_segment_words(df, vocab, max_piece_len=4)
    rows = {r["word"]: r for r in seg.collect()}
    # segmentations concatenate back to the word
    for w, r in rows.items():
        assert "".join(r["pieces"]) == w
    # the stem is used as a unit inside derived words
    assert "low" in rows["lowest"]["pieces"]
