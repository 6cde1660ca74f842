"""Train BOTH shipping subword tokenizers on the same corpus and
compare them.

Usage:  python examples/tokenizer_training.py [sf_dir]

BPE (`functions/bpe.py`) merges the most frequent adjacent pair per
round; unigram-LM (`functions/unigram.py`) starts from a large
substring vocabulary and EM-prunes it.  Both share the same scale
shape — one corpus-sized word-frequency aggregation, then bounded
rounds over the distinct-word table — so this side-by-side runs in
seconds at any sf.  Prints each trainer's vocabulary highlights and
the corpus compression (pieces per word) each achieves.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from metrics_advisor_spark import get_spark
from metrics_advisor_spark.functions.bpe import SEP, bpe_train
from metrics_advisor_spark.functions.unigram import (
    unigram_segment_words,
    unigram_train,
)


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    spark = get_spark("example_tokenizers")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    # --- BPE ---
    merges, seg = bpe_train(docs, n_merges=24)
    first = [
        f"{r['left']}+{r['right']}"
        for r in merges.orderBy("it").limit(6).collect()
    ]
    # each wrapped symbol contributes two SEP chars
    n_sym = (
        F.length("seg")
        - F.length(F.replace(F.col("seg"), F.lit(SEP), F.lit("")))
    ) / 2
    bpe_ppw = seg.agg(
        (F.sum(n_sym * F.col("wn")) / F.sum("wn")).alias("ppw")
    ).collect()[0]["ppw"]
    print("BPE:")
    print(f"  merges learned : {merges.count()}")
    print(f"  first merges   : {first}")
    print(f"  pieces/word    : {bpe_ppw:.2f}")

    # --- unigram LM ---
    vocab = unigram_train(
        docs, vocab_size=120, seed_size=1500, max_piece_len=6,
        n_iters=3,
    )
    uni_ppw = unigram_segment_words(docs, vocab).agg(
        (F.sum(F.col("n_pieces") * F.col("wn")) / F.sum("wn"))
        .alias("ppw")
    ).collect()[0]["ppw"]
    multi = vocab[vocab["piece"].str.len() > 1]
    print("unigram-LM:")
    print(f"  vocab size     : {len(vocab)}")
    print(f"  top multi-char : {list(multi['piece'].head(6))}")
    print(f"  pieces/word    : {uni_ppw:.2f}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
