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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _fake_extract_frame(payload: bytes, ts_ms: int) -> bytes:
    """STUB frame grab (no ffmpeg here): a deterministic digest of
    (payload, timestamp) stands in for the decoded frame bytes.  Replace
    with an ffmpeg seek+decode in deployment; the Spark contract
    (one output row per sampled timestamp, binary frame column) holds."""
    return hashlib.sha256(payload + ts_ms.to_bytes(8, "big")).digest()


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling: one row per ``every_ms`` tick of each
    payload's (stub-derived) duration.

    One ``mapInPandas`` over Arrow batches; output rows carry only the
    (small) frame bytes, never the source payload, so downstream stages
    shuffle frames, not videos.  The fan-out ratio is duration/every_ms —
    repartition after this op when sampling densely.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [],
                   "frame": []}
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(p)
                _, _, duration_ms = _fake_decode_dims(payload)
                for i, ts in enumerate(range(0, duration_ms + 1, every_ms)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_ts_ms"].append(ts)
                    out["frame"].append(_fake_extract_frame(payload, ts))
            yield pd.DataFrame(out)

    return media.mapInPandas(fn, FRAME_SCHEMA)


def resize_media(media: DataFrame, max_side: int = 64) -> DataFrame:
    """Image resize: scale (stub-derived) dimensions so the longer side
    is ≤ ``max_side``, preserving aspect ratio.

    The stub 'resized payload' is a deterministic digest; a real
    deployment swaps in PIL's thumbnail — schema, batching and the
    aspect-ratio arithmetic are the production code path.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "media_type": [], "width": [],
                    "height": [], "payload": []}
            for doc_id, mt, p in zip(
                pdf["doc_id"], pdf["media_type"], pdf["payload"]
            ):
                payload = bytes(p)
                w, h, _ = _fake_decode_dims(payload)
                scale = min(1.0, max_side / max(w, h))
                nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
                rows["doc_id"].append(doc_id)
                rows["media_type"].append(mt)
                rows["width"].append(nw)
                rows["height"].append(nh)
                rows["payload"].append(
                    hashlib.sha256(payload + f"{nw}x{nh}".encode()).digest()
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(fn, RESIZE_SCHEMA)


def decode_image(media: DataFrame) -> DataFrame:
    """Real image decode — unavailable here by design."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not installed in this "
        "container; use extract_media_meta (stubbed codec) for plumbing "
        "tests and swap _fake_decode_dims in deployment"
    )


# ---------------------------------------------------------------------------
# Audio: REAL codec work, no external library.  RIFF/WAVE PCM16 is a
# 44-byte header + little-endian samples — writable and parseable with
# struct + numpy alone, so unlike the image path (PIL absent → stubbed)
# the audio path is fully real end-to-end: genuine WAV bytes in the
# binary column, genuine header parsing, genuine PCM windowing.
# The synthesized waveform is integer-deterministic
# (s_i = ((doc_id·31 + i·17) mod 65536) − 32768), which makes every
# downstream feature (sum of squares, zero crossings) integer-exact and
# therefore hash-oracle-checkable — no FP anywhere in the pipeline.
# ---------------------------------------------------------------------------


def _wav_bytes(doc_id: int, sample_rate: int = 8000) -> bytes:
    """A genuine RIFF/WAVE mono PCM16 payload for ``doc_id``:
    n_samples = 400 + (doc_id mod 10)·80 of the deterministic integer
    waveform above."""
    import struct

    import numpy as np

    n = 400 + (doc_id % 10) * 80
    i = np.arange(n, dtype=np.int64)
    samples = ((doc_id * 31 + i * 17) % 65536 - 32768).astype("<i2")
    data = samples.tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def attach_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, wav binary): real WAV bytes per doc via mapInPandas —
    the Arrow batch shape a production loader (S3 bytes → binary
    column) would have."""
    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "wav": [
                        _wav_bytes(int(d)) for d in pdf[id_col]
                    ],
                }
            )

    return df.select(id_col).mapInPandas(fn, "doc_id long, wav binary")


def audio_meta(media: DataFrame, wav_col: str = "wav") -> DataFrame:
    """Parse the RIFF/fmt header of each payload: (doc_id, sample_rate,
    n_channels, bits, n_samples, duration_ms).  Real parsing — a
    malformed payload raises, it is not guessed around."""
    import struct

    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "sample_rate": [], "n_channels": [],
                "bits": [], "n_samples": [], "duration_ms": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf[wav_col]):
                if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
                    raise ValueError(f"doc {doc_id}: not a RIFF/WAVE payload")
                (_, ch, sr, _, _, bits) = struct.unpack(
                    "<HHIIHH", payload[20:36]
                )
                (data_len,) = struct.unpack("<I", payload[40:44])
                n = data_len // (ch * bits // 8)
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(sr)
                out["n_channels"].append(ch)
                out["bits"].append(bits)
                out["n_samples"].append(n)
                out["duration_ms"].append(n * 1000 // sr)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn,
        "doc_id long, sample_rate int, n_channels int, bits int, "
        "n_samples long, duration_ms long",
    )


def audio_windows(
    media: DataFrame, window: int = 160, wav_col: str = "wav"
) -> DataFrame:
    """Frame each payload's PCM into fixed ``window``-sample frames and
    emit integer-exact per-frame features: (doc_id, win_id, n_in_win,
    sum_sq — the energy numerator — and zcr, the strict sign-change
    count).  numpy.frombuffer → reshape does the framing; the tail
    partial frame is kept (n_in_win < window)."""
    import numpy as np
    import pandas as pd

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": [], "win_id": [], "n_in_win": [],
                "sum_sq": [], "zcr": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf[wav_col]):
                s = np.frombuffer(payload[44:], dtype="<i2").astype(
                    np.int64
                )
                for w0 in range(0, s.size, window):
                    seg = s[w0 : w0 + window]
                    out["doc_id"].append(doc_id)
                    out["win_id"].append(w0 // window)
                    out["n_in_win"].append(int(seg.size))
                    out["sum_sq"].append(int((seg * seg).sum()))
                    out["zcr"].append(
                        int((seg[1:] * seg[:-1] < 0).sum())
                    )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        fn,
        "doc_id long, win_id int, n_in_win int, sum_sq long, zcr long",
    )
