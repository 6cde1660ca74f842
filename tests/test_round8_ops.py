"""Round-8 operators: real video analysis (motion energy), cross-modal
as-of alignment, and the streaming video gate (18th surface)."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from metrics_advisor_spark.functions.multimodal import (
    _avi_n_frames,
    _bmp_dims,
    attach_avi_payload,
    attach_wav_payload,
    audio_windows,
    av_alignment,
    video_frames,
    video_motion,
)


def test_video_motion_matches_synthesis_rule(spark):
    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    rows = video_motion(attach_avi_payload(docs)).collect()
    got = {(r["doc_id"], r["frame_id"]): r["sum_abs_diff"] for r in rows}
    for did in range(12):
        w, h = _bmp_dims(did)
        nf = _avi_n_frames(did)
        y, x, c = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(3), indexing="ij"
        )
        base = did * 31 + y * 17 + x * 7 + c * 13
        for f in range(1, nf):
            exp = int(
                np.abs((base + f * 41) % 256 - (base + (f - 1) * 41) % 256)
                .sum()
            )
            assert got[(did, f)] == exp, (did, f)
    # exactly nf-1 transitions per doc, no frame 0 row
    assert len(got) == sum(_avi_n_frames(i) - 1 for i in range(12))
    assert all(f >= 1 for _, f in got)


def test_av_alignment_backward_asof(spark):
    # hand-built fixture: frames at 0/100/200 ms, windows straddling
    # the boundaries — each window takes the latest frame at-or-before
    # its start; a window BEFORE the first frame gets NULLs
    frames = spark.createDataFrame(
        [(1, 0, 0), (1, 1, 100), (1, 2, 200), (2, 0, 50)],
        "doc_id long, frame_id int, ts_ms long",
    )
    wins = spark.createDataFrame(
        [(1, 0, 0), (1, 1, 99), (1, 2, 100), (1, 3, 250),
         (2, 0, 0), (2, 1, 60)],
        "doc_id long, win_id int, win_start_ms long",
    )
    got = {
        (r["doc_id"], r["win_id"]): (r["frame_id"], r["frame_ts_ms"])
        for r in av_alignment(wins, frames).collect()
    }
    assert got[(1, 0)] == (0, 0)      # co-timed: frame sorts first
    assert got[(1, 1)] == (0, 0)
    assert got[(1, 2)] == (1, 100)
    assert got[(1, 3)] == (2, 200)
    assert got[(2, 0)] == (None, None)  # precedes the first frame
    assert got[(2, 1)] == (0, 50)


def test_av_alignment_real_codecs_compose(spark):
    # through the REAL codecs: audio windows (20 ms) onto AVI frames
    # (100 ms) — alignment must equal min(nf-1, start // 100)
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    wins = audio_windows(attach_wav_payload(docs), window=160).select(
        "doc_id", "win_id",
        (F.col("win_id").cast("long") * 20).alias("win_start_ms"),
    )
    frames = video_frames(attach_avi_payload(docs)).select(
        "doc_id", "frame_id", "ts_ms"
    )
    for r in av_alignment(wins, frames).collect():
        nf = _avi_n_frames(r["doc_id"])
        exp = min(nf - 1, r["win_start_ms"] // 100)
        assert r["frame_id"] == exp, dict(r.asDict())
        assert r["frame_ts_ms"] == exp * 100


def test_streaming_video_gate_matches_batch(spark):
    import tempfile

    from metrics_advisor_spark.streaming.pipeline import (
        streaming_video_gate,
    )

    docs = spark.createDataFrame([(i,) for i in range(40)], "doc_id long")
    base = tempfile.mkdtemp(prefix="ma_t_videogate_")
    attach_avi_payload(docs).repartition(3).write.mode(
        "overwrite"
    ).parquet(f"{base}/src")
    stream = (
        spark.readStream.schema("doc_id long, video binary")
        .option("maxFilesPerTrigger", 1)  # multi-micro-batch drain
        .parquet(f"{base}/src")
    )
    streaming_video_gate(
        stream, out_dir=f"{base}/out", min_duration_ms=300, min_motion=1
    )
    got = {r["doc_id"] for r in spark.read.parquet(f"{base}/out").collect()}
    # duration = nf*100 >= 300 <=> nf >= 3 <=> doc_id % 4 in {1,2,3};
    # motion is always >= 1 under the synthesis rule
    assert got == {i for i in range(40) if _avi_n_frames(i) >= 3}
