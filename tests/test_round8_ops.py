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


def test_frame_dhash_matches_analytic(spark):
    from metrics_advisor_spark.functions.multimodal import frame_dhash

    docs = spark.createDataFrame([(i,) for i in range(15)], "doc_id long")
    got = {
        (r["doc_id"], r["frame_id"]): r["dhash"]
        for r in frame_dhash(attach_avi_payload(docs)).collect()
    }
    for did in range(15):
        w, h = _bmp_dims(did)
        for f in range(_avi_n_frames(did)):
            exp = 0
            for gy in range(8):
                sy = gy * h // 8
                for gx in range(7):
                    sx0, sx1 = gx * w // 8, (gx + 1) * w // 8
                    g0 = sum(
                        (did * 31 + f * 41 + sy * 17 + sx0 * 7 + c * 13)
                        % 256
                        for c in range(3)
                    )
                    g1 = sum(
                        (did * 31 + f * 41 + sy * 17 + sx1 * 7 + c * 13)
                        % 256
                        for c in range(3)
                    )
                    if g0 > g1:
                        exp |= 1 << (gy * 7 + gx)
            assert got[(did, f)] == exp, (did, f)


def test_image_dhash_equals_frame0_dhash(spark):
    # frame 0 of a doc's AVI is pixel-identical to its BMP, so the two
    # perceptual arms must land in the same hash space bit-for-bit
    from metrics_advisor_spark.functions.multimodal import (
        attach_bmp_payload,
        frame_dhash,
        image_dhash,
    )

    docs = spark.createDataFrame([(i,) for i in range(20)], "doc_id long")
    img = {
        r["doc_id"]: r["dhash"]
        for r in image_dhash(attach_bmp_payload(docs)).collect()
    }
    fr0 = {
        r["doc_id"]: r["dhash"]
        for r in frame_dhash(attach_avi_payload(docs))
        .where(F.col("frame_id") == 0)
        .collect()
    }
    assert img == fr0 and len(img) == 20


def test_phash_dup_groups_and_near_dup_pairs(spark):
    from metrics_advisor_spark.functions.multimodal import (
        phash_dup_groups,
        phash_near_dup_pairs,
    )

    hashes = spark.createDataFrame(
        [(1, 0b1010), (2, 0b1010), (3, 0b1010), (4, 0b1011), (5, 1 << 50)],
        "doc_id long, dhash long",
    )
    groups = {r["dhash"]: r for r in phash_dup_groups(hashes).collect()}
    assert set(groups) == {0b1010}
    assert groups[0b1010]["n_frames"] == 3
    assert groups[0b1010]["n_docs"] == 3
    assert groups[0b1010]["min_doc"] == 1
    # near-dup on one representative per group + singletons
    reps = spark.createDataFrame(
        [(1, 0b1010), (4, 0b1011), (5, 1 << 50)], "doc_id long, dhash long"
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in phash_near_dup_pairs(reps, max_distance=2).collect()
    }
    assert pairs == {(1, 4): 1}


# ---- distributed BPE tokenizer induction ----

def _ref_bpe(word_counts, n_merges):
    """Pure-python reference: greedy left-to-right non-overlapping
    merge (the subword-nmt regex semantics), ties (count desc, left
    asc, right asc)."""
    segs = {w: tuple(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + word_counts[w]
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((a, b, c))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = tuple(out)
    return merges, segs


def test_bpe_train_matches_reference(spark):
    from metrics_advisor_spark.functions.bpe import bpe_train, bpe_vocab

    corpus = (["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
              + ["widest"] * 3)
    wc = {w: corpus.count(w) for w in set(corpus)}
    docs = spark.createDataFrame(
        [(i, " ".join(corpus[i::3]),) for i in range(3)],
        "doc_id long, text string",
    )
    merges, seg = bpe_train(docs, n_merges=5)
    got = [
        (r["left"], r["right"], r["pair_count"])
        for r in merges.orderBy("it").collect()
    ]
    exp_merges, exp_segs = _ref_bpe(wc, 5)
    assert got == exp_merges
    got_segs = {
        r["word"]: tuple(r["seg"].strip("\x01").split("\x01\x01"))
        for r in seg.collect()
    }
    assert got_segs == exp_segs
    # invariant: total symbols = initial chars - sum of merge counts
    vocab = bpe_vocab(seg).collect()
    total = sum(r["token_count"] for r in vocab)
    init = sum(len(w) * n for w, n in wc.items())
    assert total == init - sum(c for _, _, c in exp_merges)


def test_bpe_segment_words_applies_trained_merges(spark):
    from metrics_advisor_spark.functions.bpe import (
        bpe_segment_words,
        bpe_train,
    )

    docs = spark.createDataFrame(
        [(0, "low low low low low lower lower newest newest newest "
             "newest newest newest widest widest widest")],
        "doc_id long, text string",
    )
    merges, _ = bpe_train(docs, n_merges=4)
    new = spark.createDataFrame(
        [("lowest",), ("wider",), ("newlow",), ("a",)], "word string"
    )
    got = {
        r["word"]: tuple(r["tokens"])
        for r in bpe_segment_words(new, merges).collect()
    }
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    rules, _ = _ref_bpe(wc, 4)

    def apply(word):
        syms = tuple(word)
        for a, b, _ in rules:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = tuple(out)
        return syms

    assert got == {w: apply(w) for w in ["lowest", "wider", "newlow", "a"]}


# ---- group-granularity Hamming (r08 scale-probe finding) ----

def test_simhash_dup_groups_and_group_pairs(spark):
    from metrics_advisor_spark.functions.dedup import (
        hamming_group_pairs,
        hamming_pairs,
        simhash_dup_groups,
    )

    # 3 docs on one sketch, 2 on another within distance 2, 1 far away
    sk = spark.createDataFrame(
        [(1, 0b111000), (2, 0b111000), (3, 0b111000),
         (4, 0b111011), (5, 0b111011), (9, (1 << 50) | (1 << 45) | (1 << 40) | (1 << 35) | (1 << 30))],
        "doc_id long, simhash long",
    )
    groups = {r["simhash"]: r for r in simhash_dup_groups(sk).collect()}
    assert {g: (r["n_docs"], r["min_doc"]) for g, r in groups.items()} == {
        0b111000: (3, 1), 0b111011: (2, 4)
    }
    got = {
        (r["doc_a"], r["doc_b"]): (r["hamming"], r["n_a"], r["n_b"])
        for r in hamming_group_pairs(sk, max_distance=4).collect()
    }
    assert got == {(1, 4): (2, 3, 2)}
    # consistency vs the all-pairs form: every group-pair edge implies
    # n_a*n_b raw edges; raw count = implied cross-group + within-group
    raw = hamming_pairs(sk, max_distance=4).count()
    implied = sum(na * nb for (_, na, nb) in got.values()) + sum(
        r["n_docs"] * (r["n_docs"] - 1) // 2 for r in groups.values()
    )
    assert raw == implied
