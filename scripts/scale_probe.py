#!/usr/bin/env python
"""Scale-proof probe beyond the driver's sf0.1 (r07 verdict item 8:
"the 100 TB story rests on plan structure + SCALE.md reasoning, never a
bigger run").  Generates documents/embeddings parquet at N× the sf0.1
row counts UNDER THE REPO (never touching /root/testdata), with the
same schemas the contract queries read — so the probe just executes the
existing `queries()` entries against the generated sf_dir and reports
wall times.  Results land in SCALE.md §18.

Synthetic shape mirrors the driver tables: zipf-ish token text over the
same flavor of vocabulary (plus planted exact-dup and near-dup pairs so
dedup has real work), 64-dim float embeddings in 10 label clusters
(plus planted near-identical vectors so ANN/near-dup has real work).

Usage:
    python scripts/scale_probe.py 10            # 10x sf0.1  (= sf1)
    python scripts/scale_probe.py 100           # 100x sf0.1 (= sf10)
    python scripts/scale_probe.py 10 --families dedup,vector
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VOCAB = (
    "spark batch part line column order small sort fast value scan "
    "query agg table hash key group stream filter customer slow vector "
    "join shuffle broadcast codegen parquet page footer stat executor "
    "driver task stage skew salt bucket window lag rank median fold"
).split()

LANGS = ["en", "en", "en", "zh", "de", "fr"]

# The standard per-family query sets.  Every name is an existing
# contract query — the probe measures THE SAME plans the driver
# correctness-checks, just on bigger tables.
FAMILIES = {
    "dedup": [
        "exact_dedup", "line_dedup", "doc_fingerprint", "simhash",
        "minhash_signatures", "minhash_lsh_pairs", "jaccard_pairs",
        "hamming_pairs_blocked", "shared_passages", "dedup_materialize",
    ],
    "vector": [
        "srp_buckets", "embedding_near_dup", "ann_topk", "ivf_topk",
        "pq_codes", "pq_search", "ivfpq_search", "ann_recall",
        "knn_graph_blocked", "semdedup", "pq_codebook_audit",
    ],
    "selection": [
        "dsir_weights", "token_count", "text_stats",
        "packed_sequences", "stratified_sample",
    ],
    # r11: the tokenizer-training family — each merge round is one
    # corpus-bounded aggregation, so wall should scale ~linearly in
    # corpus at a fixed merge count
    "bpe": [
        "bpe_pairs", "bpe_merges", "bpe_batched_merges", "bpe_vocab",
    ],
    # r12: the binary-payload families — synthesize + parse real
    # GIF/MP3/MP4/WARC bytes per doc; work is per-payload CPU with no
    # cross-doc shuffle, so wall should scale ~linearly in docs
    "media": [
        "gif_meta", "gif_pixel_stats", "mp3_meta", "mp4_meta",
        "warc_extract", "media_meta",
    ],
    # r13: crawl-admission + document-ingest additions — per-payload
    # parse (pdf/sitemap) and one-aggregate scorers (lang NB,
    # segmentation), all expected ~linear in docs
    "crawl": [
        "pdf_text_extract", "sitemap_frontier", "lang_id",
        "lang_confusion", "bpe_segment", "unigram_segment",
    ],
    # r13 continuation: link explosion (fixture pages ~constant size
    # → output ~6 rows/doc, linear) and container parse (two entries
    # per doc, per-payload CPU, no shuffle)
    "crawl2": [
        "html_links", "zip_extract", "pdf_text_extract",
    ],
    # r14: the winnowed span family (content-defined selection ≈2×
    # the old aligned-grid density) + the composed crawl loop and the
    # char-LM scorers — all expected ~linear in docs
    "spans": [
        "duplicate_spans", "scrub_duplicate_spans",
    ],
    "crawl3": [
        "char_lm_perplexity", "perplexity_gate", "frontier_schedule",
        "html_meta", "wet_extract", "warc_cdx", "crawl_waves",
    ],
    # r15: keep-first span dedup (same winnowing pipeline + one rank
    # window), span provenance (one groupBy on window keys), audio
    # fingerprint (per-payload CPU, no shuffle), and the discovery
    # chain (scales with HOSTS, not docs — the fixture caps the
    # entry universe, so the probe pins constancy, not linearity)
    "r15": [
        "scrub_spans_keep_first", "duplicate_span_sources",
        "audio_fingerprint", "sitemap_discovery",
        # full audio-dedup chain: per-payload fingerprint CPU (zero
        # shuffle) + the §18 Hamming banding over ~1.1 sketches/doc
        "audio_dup_components",
        # image mirror: per-payload dHash CPU + the same banding
        "image_dup_components",
    ],
}


def gen(sf_dir: str, mult: int, seed: int = 42) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(sf_dir, exist_ok=True)
    n_docs, n_vecs = 5000 * mult, 2000 * mult
    rng = np.random.default_rng(seed)

    # --- documents: zipf-ish token draws, 8..80 tokens ---
    zipf_p = 1.0 / np.arange(1, len(VOCAB) + 1)
    zipf_p /= zipf_p.sum()
    lens = rng.integers(8, 80, n_docs)
    texts = []
    for i in range(n_docs):
        toks = rng.choice(VOCAB, size=lens[i], p=zipf_p)
        texts.append(" ".join(toks))
    # plant exact dups (2%) and near dups (2%: one token mutated)
    for i in range(0, n_docs // 50):
        texts[n_docs - 1 - i] = texts[i]
    for i in range(n_docs // 50, n_docs // 25):
        toks = texts[i].split()
        toks[len(toks) // 2] = "mutant"
        texts[n_docs - 1 - i] = " ".join(toks)
    docs = pa.table(
        {
            "doc_id": pa.array(range(n_docs), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(
                [LANGS[i % len(LANGS)] for i in range(n_docs)]
            ),
            "source": pa.array([f"src{i % 20}" for i in range(n_docs)]),
            "n_chars": pa.array(
                [len(t) for t in texts], pa.int64()
            ),
        }
    )
    pq.write_table(docs, f"{sf_dir}/documents.parquet")

    # --- embeddings: 10 gaussian clusters + planted near-identicals ---
    labels = rng.integers(0, 10, n_vecs)
    centers = rng.normal(0, 1, (10, 64))
    emb = centers[labels] + rng.normal(0, 0.3, (n_vecs, 64))
    for i in range(0, n_vecs // 50):  # 2% near-identical pairs
        emb[n_vecs - 1 - i] = emb[i] + rng.normal(0, 0.005, 64)
    emb = emb.astype(np.float32)
    vecs = pa.table(
        {
            "vec_id": pa.array(range(n_vecs), pa.int64()),
            "embedding": pa.array(
                [row.tolist() for row in emb],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype("int32"), pa.int32()),
        }
    )
    pq.write_table(vecs, f"{sf_dir}/embeddings.parquet")
    return {"n_docs": n_docs, "n_vecs": n_vecs}


def _variant_queries():
    """Scale-path VARIANTS of contract queries whose exact-parity form
    is superlinear by design on low-entropy corpora (measured at ×10:
    jaccard_pairs 577 s, hamming_pairs_blocked killed at the probe
    timeout).  Same inputs, the documented scale knob engaged."""
    import __spark_entry__ as em
    from metrics_advisor_spark.functions.dedup import (
        hamming_group_pairs,
        jaccard_pairs,
        simhash,
    )

    def jaccard_capped(spark, sf_dir):
        return jaccard_pairs(
            em._docs_with_dups(spark, sf_dir),
            threshold=0.5,
            max_shingle_df=50,
        )

    def hamming_grouped(spark, sf_dir):
        return hamming_group_pairs(
            simhash(em._docs_with_dups(spark, sf_dir)), max_distance=8
        )

    def materialize_capped(spark, sf_dir):
        from metrics_advisor_spark.functions.dedup import (
            apply_pair_dedup,
        )

        docs = em._docs_with_dups(spark, sf_dir)
        pairs = jaccard_pairs(
            docs, threshold=0.5, max_shingle_df=50
        )
        return apply_pair_dedup(docs, pairs, transitive=True).select(
            "doc_id"
        )

    return {
        "jaccard_pairs_capped50": jaccard_capped,
        "hamming_group_pairs": hamming_grouped,
        "dedup_materialize_capped50": materialize_capped,
    }


def main() -> int:
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    fams = ["dedup", "vector", "selection"]
    skip: set[str] = set()
    for a in sys.argv[2:]:
        if a.startswith("--families"):
            fams = a.split("=", 1)[1].split(",")
        elif a.startswith("--skip"):
            skip = set(a.split("=", 1)[1].split(","))

    import __spark_entry__ as em
    from metrics_advisor_spark import get_spark

    sf_dir = os.path.join(REPO, "_scale", f"x{mult}")
    if not os.path.exists(f"{sf_dir}/embeddings.parquet"):
        t0 = time.perf_counter()
        info = gen(sf_dir, mult)
        print(f"generated {info} in {time.perf_counter()-t0:.1f}s")

    spark = get_spark("scale_probe")
    spark.range(1).count()
    qs = dict(em.queries())
    if "variants" in fams:
        fams = [f for f in fams if f != "variants"]
        FAMILIES["variants"] = []
        for vname, vfn in _variant_queries().items():
            qs[vname] = vfn
            FAMILIES["variants"].append(vname)
        fams.append("variants")
    out: dict[str, float] = {}
    for fam in fams:
        for name in FAMILIES[fam]:
            if name in skip:
                print(f"  {name}: SKIPPED (known superlinear; "
                      f"see variants)")
                continue
            t0 = time.perf_counter()
            try:
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                out[name] = round(time.perf_counter() - t0, 2)
                print(f"  {name}: {out[name]}s")
            except Exception as e:  # pragma: no cover - diagnostics
                out[name] = -1.0
                print(f"  {name}: ERROR {type(e).__name__}: {str(e)[:160]}")
            spark.catalog.clearCache()
    print(json.dumps({"mult_vs_sf01": mult, "timings": out}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
