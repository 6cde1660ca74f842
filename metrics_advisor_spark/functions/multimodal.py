"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct — the Spark-side contract (schema, partitioning,
Arrow batch shape through mapInPandas) is real and tested; the actual
codec step is STUBBED (no image/audio libraries in this container) with
a clearly-marked deterministic fake so pipelines are exercisable
end-to-end.

Scale notes: payloads never pass through Python row-at-a-time — the
metadata extraction is one ``mapInPandas`` over Arrow record batches,
and the (cheap) typed columns travel separately from the (huge) binary
column so Parquet column pruning keeps payload IO out of
metadata-only queries.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256_prefix", T.StringType()),
        T.StructField("width", T.IntegerType()),     # STUB-derived
        T.StructField("height", T.IntegerType()),    # STUB-derived
        T.StructField("duration_ms", T.LongType()),  # STUB-derived
    ]
)


def attach_fake_payload(df: DataFrame, text_col: str = "text",
                        media_type: str = "image/png") -> DataFrame:
    """Test harness: treat each document's utf-8 bytes as an opaque
    payload so the binary plumbing is exercisable without media files."""
    return df.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
    )


def _fake_decode_dims(payload: bytes) -> tuple[int, int, int]:
    """STUB for the codec step (no PIL/ffmpeg in this container).

    Deterministic fake: dimensions derived from the payload digest, so
    tests are stable.  A real deployment replaces ONLY this function
    with e.g. PIL.Image.open(io.BytesIO(payload)).size — the Spark
    plumbing around it is unchanged.
    """
    d = hashlib.sha256(payload).digest()
    width = 16 + d[0] % 240
    height = 16 + d[1] % 240
    duration_ms = int.from_bytes(d[2:4], "big")
    return width, height, duration_ms


def extract_media_meta(media: DataFrame) -> DataFrame:
    """Decode/feature-extract metadata from binary payloads.

    One mapInPandas over Arrow batches: the per-batch pandas frame keeps
    payloads as bytes objects; output is narrow typed columns only.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            dims = [_fake_decode_dims(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in payloads],
                    "sha256_prefix": [
                        hashlib.sha256(p).hexdigest()[:16] for p in payloads
                    ],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "duration_ms": [d[2] for d in dims],
                }
            )

    return media.mapInPandas(fn, META_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode — unavailable here by design."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not installed in this "
        "container; use extract_media_meta (stubbed codec) for plumbing "
        "tests and swap _fake_decode_dims in deployment"
    )


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling — unavailable here by design."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg bindings, not installed in this "
        "container; the mapInPandas batch contract matches "
        "extract_media_meta"
    )
