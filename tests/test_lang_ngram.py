"""Char-trigram Naive Bayes language ID (`functions/text.py`, r13):
held-out accuracy golden vs the stopword baseline, the 'und' evidence
rules, model determinism, and the integer quantization contract."""

from __future__ import annotations

from metrics_advisor_spark.functions.text import (
    LANG_SEED,
    NB_QUANT,
    lang_id_ngram,
    lang_id_stopword,
    train_char_ngram_nb,
)

# held-out: none of these sentences appear in LANG_SEED
HELD_OUT = [
    (0, "the dog and the cat are in the garden", "en"),
    (1, "el perro y el gato estan en el jardin", "es"),
    (2, "le chien et le chat sont dans le jardin", "fr"),
    (3, "der hund und die katze sind im garten", "de"),
    # zh held-out must share trigrams with the 6-sentence seed (hanzi
    # trigrams are sparse; production swaps in a larger seed corpus)
    (4, "我们早上一起去市场", "zh"),
    (5, "we buy bread and milk for the house", "en"),
    (6, "compramos pan y leche para la casa", "es"),
    (7, "nous achetons du pain et du lait", "fr"),
    (8, "wir kaufen brot und milch", "de"),
    (9, "她说孩子们很快回家", "zh"),
]


def test_model_shape_and_determinism():
    v1, m1, o1 = train_char_ngram_nb()
    v2, m2, o2 = train_char_ngram_nb()
    assert (v1, m1, o1) == (v2, m2, o2)
    langs = sorted(LANG_SEED)
    # dense: every (lang, gram) combination is present
    assert len(m1) == len(v1) * len(langs)
    assert set(o1) == set(langs)
    # shared smoothing denominator: count-0 grams and the OOV bucket
    # score identically across languages (the anti-'smallest corpus
    # wins' guard) — OOV is log(1/denom), a count-0 gram log(2/denom)
    assert len(set(o1.values())) == 1
    zero_scores = {
        m1[(lang, v1[0])]
        for lang in langs
        if all(v1[0] not in s for s in LANG_SEED[lang])
    }
    assert len(zero_scores) <= 1
    # quantized: integers, plausibly scaled micro-nats
    assert all(isinstance(q, int) and q < 0 for q in m1.values())
    assert min(m1.values()) > -20 * NB_QUANT


def test_held_out_accuracy_beats_stopword_baseline(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in HELD_OUT], "doc_id long, text string"
    )
    nb = {r["doc_id"]: r["lang_pred"] for r in lang_id_ngram(df).collect()}
    sw = {
        r["doc_id"]: r["lang_pred"] for r in lang_id_stopword(df).collect()
    }
    nb_ok = sum(nb[i] == want for i, _, want in HELD_OUT)
    sw_ok = sum(sw[i] == want for i, _, want in HELD_OUT)
    assert nb_ok == len(HELD_OUT), f"NB missed: {nb}"
    # the stopword vote has no de/zh anchors at all — the NB upgrade
    # must strictly beat it on the same fixtures (VERDICT r12 item 3)
    assert nb_ok > sw_ok


def test_und_evidence_rules(spark):
    df = spark.createDataFrame(
        [
            (0, "xy"),                 # shorter than one trigram
            (1, "9182 7364 0011"),     # trigrams, none in vocab
            (2, "the cat sat"),        # genuine evidence
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id_ngram(df).collect()}
    assert got == {0: "und", 1: "und", 2: "en"}


def test_scores_are_integers(spark):
    df = spark.createDataFrame(
        [(0, "the weather is good today")], "doc_id long, text string"
    )
    row = lang_id_ngram(df).collect()[0]
    assert isinstance(row["lang_score"], int)
    assert row["lang_score"] < 0


def test_char_lm_perplexity(spark):
    import pytest
    # exact arithmetic vs a pure-python replay, and the quality
    # ordering the filter exists for: fluent English < French < junk
    import math

    from metrics_advisor_spark.functions.text import (
        NB_QUANT,
        char_lm_perplexity,
        train_char_ngram_nb,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs"),
        (2, "le renard brun rapide saute par dessus le chien"),
        (3, "zzxqj vvkpw qqqgh xxzzy jjqqk wwvvx"),
        (4, "ab"),   # shorter than one trigram -> nulls
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_lm_perplexity(df).collect()}

    vocab, model, oov = train_char_ngram_nb()
    vset = set(vocab)
    for doc_id, text in rows:
        t = text.lower()
        tris = [t[i:i + 3] for i in range(len(t) - 2)]
        nll = -sum(model[("en", g)] if g in vset else oov["en"]
                   for g in tris)
        r = got[doc_id]
        if not tris:
            assert r["nll_q"] is None and r["nll_per_tri"] is None
            continue
        assert r["nll_q"] == nll, doc_id
        assert r["n_tri"] == len(tris)
        assert r["nll_per_tri"] == pytest.approx(
            round(nll / len(tris) / NB_QUANT, 6)
        )
    # the ordering the threshold filter relies on
    assert (got[1]["nll_per_tri"] < got[2]["nll_per_tri"]
            < got[3]["nll_per_tri"])
    # unknown reference language rejected
    with pytest.raises(ValueError, match="unknown reference"):
        char_lm_perplexity(df, ref_lang="tlh")


def test_lang_id_oov_mass_on_length_changing_lowercase(spark):
    # ADVICE r13: U+0130 'İ' lowers to 2 codepoints ('i' + U+0307), so
    # n_tri must be measured on lower(text) or the OOV mass goes
    # negative on such docs.  n_tri for this doc must equal
    # len(lower(text)) - 2, and every language's score must stay
    # well-defined (n_hit <= n_tri).
    from metrics_advisor_spark.functions.text import lang_id_ngram

    t = "İ" * 40  # lowers to 80 codepoints
    assert len(t.lower()) == 80
    df = spark.createDataFrame(
        [(1, t), (2, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in lang_id_ngram(df).collect()}
    assert rows[2]["lang_pred"] == "en"
    # doc 1: all-OOV trigram soup -> 'und', and the score must use the
    # lowercased trigram count (78), never a negative OOV mass
    assert rows[1]["lang_pred"] == "und"
