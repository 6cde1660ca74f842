"""Round-12 additions: ISO-BMFF (MP4) container metadata (VERDICT r11
item 5) — parse round-trip, dispatch, and the rejection matrix — plus
the positional_xcorr contract query's operator-level invariants."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from metrics_advisor_spark.functions.multimodal import (
    _mp4_bytes,
    _mp4_dims,
    _mp4_n_frames,
    _mp4_sample_size,
    _parse_mp4_meta,
)


def test_mp4_roundtrip_analytic():
    for did in range(0, 40):
        p = _mp4_bytes(did)
        w, h, nf, dur, codec, prof, lev = _parse_mp4_meta(did, p)
        ew, eh = _mp4_dims(did)
        enf = _mp4_n_frames(did)
        assert (w, h, nf, dur, codec) == (ew, eh, enf, enf * 40, "avc1")
        # r12: profile/level are parsed out of the REAL SPS bitstream
        # inside avcC, and the SPS's own coded dims must agree with
        # the container (the fixture writes both from one rule)
        assert (prof, lev) == (66, 10 + (did % 4) * 10)
        # the oracle's analytic byte size: 663 + nf·(sample_size + 4)
        # (r12: real avcC + 'free' pad raised the constant from 614)
        assert len(p) == 663 + enf * (_mp4_sample_size(did) + 4)


def test_mp4_sps_dims_agree_with_container():
    from metrics_advisor_spark.functions.h264 import parse_avcc

    p = _mp4_bytes(13)
    a = p.find(b"avcC")
    (sz,) = struct.unpack(">I", p[a - 4 : a])
    rec = parse_avcc(p[a + 4 : a - 4 + sz])
    assert (rec["width"], rec["height"]) == _mp4_dims(13)


def test_mp4_corrupt_avcc_raises():
    p = _mp4_bytes(9)
    bad = bytearray(p)
    a = p.find(b"avcC")
    bad[a + 4] = 2  # configurationVersion 2
    with pytest.raises(ValueError, match="configurationVersion"):
        _parse_mp4_meta(9, bytes(bad))


def test_mp4_moov_after_mdat_is_default_layout():
    """The fixture writes moov LAST (progressive-upload layout); the
    parser must scan top-level boxes, not assume moov-first."""
    p = _mp4_bytes(7)
    assert p[4:8] == b"ftyp"
    mdat_at = p.find(b"mdat")
    moov_at = p.find(b"moov")
    assert 0 < mdat_at < moov_at


def test_mp4_moov_first_also_parses():
    """Reordering the top-level boxes (fast-start layout) must parse
    identically — stco offsets are not validated against mdat, only
    the metadata tree is walked."""
    p = _mp4_bytes(11)
    (ftyp_sz,) = struct.unpack(">I", p[0:4])
    ftyp, rest = p[:ftyp_sz], p[ftyp_sz:]
    (mdat_sz,) = struct.unpack(">I", rest[0:4])
    mdat, moov = rest[:mdat_sz], rest[mdat_sz:]
    assert _parse_mp4_meta(11, ftyp + moov + mdat) == _parse_mp4_meta(11, p)


def test_mp4_rejection_matrix():
    p = _mp4_bytes(5)
    # (1) not ISO-BMFF at all
    with pytest.raises(ValueError, match="no leading ftyp"):
        _parse_mp4_meta(5, b"\x00" * 32)
    # (2) ftyp-only stream (metadata-stripped)
    (ftyp_sz,) = struct.unpack(">I", p[0:4])
    with pytest.raises(ValueError, match="no moov"):
        _parse_mp4_meta(5, p[:ftyp_sz])
    # (3) truncated mid-box: the final moov loses its tail
    with pytest.raises(ValueError, match="escaping its enclosing"):
        _parse_mp4_meta(5, p[:-20])
    # (4) a box whose declared size escapes its parent
    bad = bytearray(p)
    moov_at = p.find(b"moov") - 4
    struct.pack_into(">I", bad, moov_at, len(p) + 64)
    with pytest.raises(ValueError, match="escaping its enclosing"):
        _parse_mp4_meta(5, bytes(bad))
    # (5) no video track: flip the hdlr handler to 'soun'
    bad = bytearray(p)
    h_at = p.find(b"hdlr")
    assert p[h_at + 12 : h_at + 16] == b"vide"
    bad[h_at + 12 : h_at + 16] = b"soun"
    with pytest.raises(ValueError, match="no video"):
        _parse_mp4_meta(5, bytes(bad))
    # (6) zero mvhd timescale
    bad = bytearray(p)
    m_at = p.find(b"mvhd")
    struct.pack_into(">I", bad, m_at + 16, 0)  # body+12 (v0 timescale)
    with pytest.raises(ValueError, match="timescale"):
        _parse_mp4_meta(5, bytes(bad))


def test_mp4_dispatch_and_frame_decode_rejection(spark):
    """extract_media_meta types MP4 payloads off the ftyp magic;
    frame EXTRACTION on a compressed container stays a loud error
    (the documented deployment codec swap)."""
    from metrics_advisor_spark.functions.multimodal import (
        extract_media_meta,
        sample_frames,
    )

    p = _mp4_bytes(9)
    media = spark.createDataFrame(
        [(9, "video", bytearray(p))],
        "doc_id long, media_type string, payload binary",
    )
    row = extract_media_meta(media).collect()[0]
    assert row["media_type"] == "video/mp4"
    w, h = _mp4_dims(9)
    assert (row["width"], row["height"]) == (w, h)
    assert row["n_frames"] == _mp4_n_frames(9)
    assert row["duration_ms"] == _mp4_n_frames(9) * 40
    assert row["n_bytes"] == len(p)

    with pytest.raises(Exception, match="RIFF/AVI"):
        sample_frames(media, every_ms=100).collect()


def test_positional_xcorr_bucket_arithmetic(spark):
    """The positional bucket rule (pos // 40, reference
    metrics_advisor.py:186-187 parity): a candidate aligned at lag 0
    correlates 1.0 within every full bucket, and a pair straddling a
    bucket boundary never joins across it."""
    from metrics_advisor_spark.operators.xcorr import (
        positional_correlation,
    )

    n = 100
    rows = [(float(i), "m", "all", float(i % 7)) for i in range(n)]
    obj = spark.createDataFrame(
        rows, "ts double, metric string, series string, value double"
    )
    cand = spark.createDataFrame(
        [(float(i), "c", "all", 2.0 * (i % 7) + 1) for i in range(n)],
        "ts double, metric string, series string, value double",
    )
    out = positional_correlation(
        obj, cand, count_bucket=40, lag_max=0, min_pairs=2
    ).collect()
    got = {r["bucket_id"]: (r["corr"], r["n_pairs"]) for r in out}
    assert set(got) == {0, 1, 2}
    assert got[0][1] == 40 and got[1][1] == 40 and got[2][1] == 20
    for corr, _ in got.values():
        assert corr == pytest.approx(1.0)


def test_index_save_load_roundtrip(spark, tmp_path):
    """VERDICT r11 item 8 — the FAISS operating model: fit an IVF-PQ
    index once, persist it, load it in a NEW session, and search
    results are bit-identical to serving from the in-session fit."""
    import __spark_entry__ as em
    from metrics_advisor_spark.functions.pq import (
        ivfpq_search,
        load_index,
        pq_encode,
        save_index,
    )
    from pyspark.sql import functions as F

    sf_dir = "/root/testdata/sf0.001"
    emb = em._emb(spark, sf_dir)
    coarse = em._fit_codebook(spark, emb, m=1, k=8).select(
        "s", "code", "centroid"
    )
    amap = pq_encode(emb, coarse, m=1).select(
        "vec_id", F.col("code").alias("cell")
    )
    fine = em._fit_ivfpq_fine(spark, emb, coarse, amap, m=4, k_codes=16)

    def search(sess, c, a, f_):
        e = em._emb(sess, sf_dir)
        return sorted(
            tuple(r)
            for r in ivfpq_search(
                e.filter(F.col("vec_id") < 5), e,
                k_coarse=8, m=4, k_codes=16, nprobe=2, k=10,
                coarse=c, amap=a.persist(), fine=f_,
            ).collect()
        )

    expect = search(spark, coarse, amap, fine)

    path = str(tmp_path / "ivfpq_index")
    save_index(
        path, coarse=coarse, fine=fine, amap=amap,
        params={"k_coarse": 8, "m": 4, "k_codes": 16},
    )

    sess2 = spark.newSession()
    idx = load_index(sess2, path)
    assert idx["params"] == {"k_coarse": 8, "m": 4, "k_codes": 16}
    got = search(sess2, idx["coarse"], idx["amap"], idx["fine"])
    assert got == expect  # exact, doubles included

    # loaded codebooks are LocalRelations (the serving form)
    assert "LocalRelation" in idx["coarse"]._jdf.queryExecution().analyzed().toString()


def test_index_load_rejects_corruption(spark, tmp_path):
    from metrics_advisor_spark.functions.pq import load_index, save_index
    import __spark_entry__ as em

    sf_dir = "/root/testdata/sf0.001"
    emb = em._emb(spark, sf_dir)
    coarse = em._fit_codebook(spark, emb, m=1, k=8).select(
        "s", "code", "centroid"
    )
    path = str(tmp_path / "idx")
    # drop a code -> non-contiguous codes must fail loudly
    save_index(path, coarse=coarse.filter("code <> 3"))
    with pytest.raises(ValueError, match="non-contiguous"):
        load_index(spark, path)
    with pytest.raises(ValueError, match="no index artifacts"):
        load_index(spark, str(tmp_path / "empty"))


def test_ivf_topk_rejects_mismatched_injection(spark):
    """ADVICE r11: an injected coarse codebook whose cell set
    disagrees with n_lists must fail loudly, not silently change
    pruning semantics."""
    from metrics_advisor_spark.functions.pq import pq_codebook
    from metrics_advisor_spark.functions.similarity import ivf_topk
    import __spark_entry__ as em

    emb = em._emb(spark, "/root/testdata/sf0.001")
    cb8 = pq_codebook(emb, m=1, k=8).select("s", "code", "centroid")
    q = emb.filter("vec_id < 2")
    with pytest.raises(ValueError, match="n_lists=16 demands"):
        ivf_topk(q, emb, n_lists=16, coarse=cb8).collect()
    # the matching injection still serves
    assert ivf_topk(q, emb, n_lists=8, coarse=cb8, k=3).count() > 0


def test_run_to_memory_refuses_concurrent_streams(spark, tmp_path):
    """ADVICE r11: the drain helper's narrowed shuffle-partition conf
    is session-global, so it must refuse while other streams are
    active rather than silently re-planning them."""
    import time

    from metrics_advisor_spark.streaming.pipeline import run_to_memory

    src = str(tmp_path / "src")
    spark.range(10).selectExpr("id", "id * 2 AS v").write.parquet(src)
    stream = spark.readStream.schema("id long, v long").parquet(src)
    # a long-lived concurrent stream (processingTime keeps it active)
    other = (
        spark.readStream.schema("id long, v long").parquet(src)
        .writeStream.format("memory").queryName("r12_other")
        .outputMode("append").start()
    )
    try:
        agg = stream.groupBy().count()
        with pytest.raises(RuntimeError, match="session-global"):
            run_to_memory(agg, "r12_drain", output_mode="complete")
    finally:
        other.stop()
        for _ in range(50):
            if not spark.streams.active:
                break
            time.sleep(0.1)
    # with the session quiet again the drain proceeds
    q = run_to_memory(
        stream.groupBy().count(), "r12_drain2", output_mode="complete"
    )
    assert spark.table("r12_drain2").collect()[0][0] == 10
