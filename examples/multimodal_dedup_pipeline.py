"""Multimodal corpus dedup end-to-end: image + audio arms of the
perceptual family, batch AND streaming.

Usage:  python examples/multimodal_dedup_pipeline.py [sf_dir]

Builds a media corpus (text + BMP payload + WAV payload per doc) with
PLANTED duplicates — re-used image sources and re-levelled /
re-encoded audio clips — then:

  1. `Corpus.dedup_images`  — 56-bit dHash → blocked-Hamming
     components → min-doc representative per cluster;
  2. `Corpus.dedup_audio`   — gain-invariant fingerprint sketches →
     the same Hamming machinery (one shared 56-bit hash space);
  3. `streaming_audio_gate` — the same audio dedup as an ADMISSION
     GATE over a 2-batch stream: batch 2's re-encodes of batch-1
     clips are suppressed by the persistent banded sketch store.

Prints the surviving doc count at each stage and returns the counts
dict (the e2e test pins every number).
"""

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from metrics_advisor_spark import get_spark
from metrics_advisor_spark.functions import Corpus
from metrics_advisor_spark.functions.multimodal import (
    attach_bmp_variants,
    attach_wav_variants,
)
from metrics_advisor_spark.streaming.pipeline import (
    streaming_audio_gate,
)


def _media(spark, sf_dir: str, n: int = 40):
    """(doc_id, text, img, wav): docs 0..n-1 are originals; every
    doc ≡0 (mod 5) gets an IMAGE re-use + audio re-encode at
    +100000 and every doc ≡0 (mod 7) an audio half-gain re-level
    (distinct image) at +200000."""
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < n)
    )
    base = docs.select(
        "doc_id",
        "text",
        F.col("doc_id").alias("img_src"),
        F.col("doc_id").alias("wav_src"),
        F.lit(0).alias("shift"),
    )
    copies = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        "text",
        F.col("doc_id").alias("img_src"),      # same image source
        F.col("doc_id").alias("wav_src"),      # audio re-encode
        F.lit(0).alias("shift"),
    )
    relevel = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        "text",
        (F.col("doc_id") + 200000).alias("img_src"),  # distinct image
        F.col("doc_id").alias("wav_src"),             # −6 dB re-level
        F.lit(1).alias("shift"),
    )
    variants = base.unionByName(copies).unionByName(relevel)
    # hash-derived payloads (the smooth gradient fixtures are
    # perceptually degenerate — distinct ids land dHash-identical):
    # rows sharing img_src get byte-identical images (a re-used
    # object-store key), rows sharing wav_src the same clip up to gain
    img_pay = attach_bmp_variants(
        variants.withColumn("noise", F.lit(0)),
        "doc_id",
        "img_src",
        "noise",
    )
    wav_pay = attach_wav_variants(
        variants.select("doc_id", "wav_src", "shift"),
        "doc_id",
        "wav_src",
        "shift",
    )
    return (
        variants.join(img_pay, "doc_id")
        .join(wav_pay, "doc_id")
        .select("doc_id", "text", "img", "wav")
    )


def main(sf_dir: str = "/root/testdata/sf0.001") -> dict:
    spark = get_spark("example_multimodal")
    counts = {}
    media = _media(spark, sf_dir).cache()
    counts["media"] = media.count()
    print(f"{'media':14s} {counts['media']:6d} rows")

    c = Corpus(media)
    img = c.dedup_images()
    counts["image_dedup"] = img.df.count()
    print(f"{'image-dedup':14s} {counts['image_dedup']:6d} rows")

    both = img.dedup_audio()
    counts["audio_dedup"] = both.df.count()
    print(f"{'audio-dedup':14s} {counts['audio_dedup']:6d} rows")

    # streaming form: originals arrive first, the dup wave second —
    # the persistent sketch store suppresses batch-2 re-encodes and
    # re-levels of batch-1 clips
    base_dir = tempfile.mkdtemp(prefix="mm_gate_")
    src = f"{base_dir}/media"
    media.filter(F.col("doc_id") < 100000).select(
        "doc_id", "wav"
    ).coalesce(1).write.parquet(f"{src}/b1")
    streaming_audio_gate(
        spark.readStream.schema("doc_id long, wav binary").parquet(
            f"{src}/*"
        ),
        store_dir=f"{base_dir}/store",
        out_dir=f"{base_dir}/out",
        checkpoint=f"{base_dir}/ck",
    )
    media.filter(F.col("doc_id") >= 100000).select(
        "doc_id", "wav"
    ).coalesce(1).write.parquet(f"{src}/b2")
    streaming_audio_gate(
        spark.readStream.schema("doc_id long, wav binary").parquet(
            f"{src}/*"
        ),
        store_dir=f"{base_dir}/store",
        out_dir=f"{base_dir}/out",
        checkpoint=f"{base_dir}/ck",
    )
    admitted = spark.read.parquet(f"{base_dir}/out")
    counts["stream_admitted"] = admitted.count()
    counts["stream_admitted_wave2"] = admitted.filter(
        F.col("doc_id") >= 100000
    ).count()
    print(f"{'stream-admit':14s} {counts['stream_admitted']:6d} rows")
    media.unpersist()
    return counts


if __name__ == "__main__":
    main(*sys.argv[1:2])
