"""Shared INDEPENDENT Python reference of `streaming_span_gate`'s
arrival-order semantics (seen-key store + keep-first-in-batch +
island splice), used by the r14 single-case model test and the r15
batch-boundary fuzz.  Deliberately naive: dict/set state, sorted
lists, no Spark."""

from __future__ import annotations

import numpy as np


def _windows(text: str, min_len: int = 64, stride: int = 16):
    from metrics_advisor_spark.functions.dedup import (
        _SPAN_ANCHOR_CHARS,
        _SPAN_HASH_BASE,
        _SPAN_HASH_MOD,
        _winnow_offsets,
    )

    a = min(_SPAN_ANCHOR_CHARS, min_len)
    pows = [
        pow(_SPAN_HASH_BASE, a - 1 - j, _SPAN_HASH_MOD)
        for j in range(a)
    ]
    cp = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    return [
        (int(o), text[int(o):int(o) + min_len])
        for o in _winnow_offsets(cp, min_len, stride, pows)
    ]


def reference_gate(batches, min_len: int = 64):
    """Replay the gate over ``batches`` (list of list of (doc_id,
    text)): returns {doc_id: scrubbed_text} across all batches."""
    seen: set[str] = set()
    out = {}
    for batch in batches:
        wins = []  # (doc, off, w)
        for doc_id, text in batch:
            for off, w in _windows(text, min_len=min_len):
                wins.append((doc_id, off, w))
        hits: dict[int, list[int]] = {}
        fresh = [x for x in wins if x[2] not in seen]
        for doc_id, off, w in wins:
            if w in seen:
                hits.setdefault(doc_id, []).append(off)
        byw: dict[str, list] = {}
        for doc_id, off, w in sorted(fresh):
            byw.setdefault(w, []).append((doc_id, off))
        for w, occ in byw.items():
            for doc_id, off in occ[1:]:  # keep (doc,off)-first
                hits.setdefault(doc_id, []).append(off)
            seen.add(w)
        for doc_id, text in batch:
            offs = sorted(hits.get(doc_id, []))
            spans = []
            for o in offs:
                e = o + min_len
                if spans and o <= spans[-1][1]:
                    spans[-1][1] = max(spans[-1][1], e)
                else:
                    spans.append([o, e])
            parts, pos = [], 0
            for s, e in spans:
                parts.append(text[pos:s])
                pos = e
            parts.append(text[pos:])
            out[doc_id] = "".join(parts)
    return out
