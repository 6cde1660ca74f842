"""Multi-pattern substring matching — Aho–Corasick (public-knowledge
classic, Aho & Corasick 1975) — the engine behind blocklist filtering,
contamination n-gram screens, and PII keyword audits at corpus scale.

Why not regex alternation: `rlike("(p1|p2|…|p10000)")` compiles a
backtracking alternation whose cost grows with the pattern count PER
CHARACTER; the AC automaton is O(text + matches) regardless of how
many patterns it holds — the difference between usable and not at
10⁵-entry blocklists.

Semantics: raw substring occurrences (overlaps included, no word
boundaries — compose with tokenization upstream if boundaries
matter).  Matching is case-sensitive; lowercase both sides for the
usual blocklist behavior.

Spark shape: the automaton builds ONCE from the pattern list (driver,
KB–MB scale), is closed over by an Arrow pandas UDF, and each
executor deserializes it once per worker — a broadcast in effect.
One narrow pass over the corpus, no shuffle, no per-row recompilation.

For SMALL pattern sets there is also `substr_hits_col`, a pure
Catalyst occurrence counter (length arithmetic — non-overlapping
left-greedy, which equals AC counts whenever a pattern has no proper
border, i.e. cannot overlap itself); the contract query uses the AC
UDF while its DuckDB oracle mirrors the Catalyst formula — two
independent counting methods pinning each other.
"""

from __future__ import annotations

from collections import deque

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class AhoCorasick:
    """goto/fail/output automaton over unicode code points."""

    def __init__(self, patterns: list[str]):
        if not patterns:
            raise ValueError("AhoCorasick needs at least one pattern")
        if any(not p for p in patterns):
            raise ValueError("empty pattern")
        self.patterns = list(patterns)
        # nodes as parallel lists: goto dict, fail link, output list
        self.goto: list[dict[str, int]] = [{}]
        self.fail: list[int] = [0]
        self.out: list[list[int]] = [[]]
        for idx, p in enumerate(self.patterns):
            node = 0
            for ch in p:
                nxt = self.goto[node].get(ch)
                if nxt is None:
                    self.goto.append({})
                    self.fail.append(0)
                    self.out.append([])
                    nxt = len(self.goto) - 1
                    self.goto[node][ch] = nxt
                node = nxt
            self.out[node].append(idx)
        # BFS fail links (root's children fail to root)
        q = deque()
        for ch, nxt in self.goto[0].items():
            q.append(nxt)
        while q:
            node = q.popleft()
            for ch, nxt in self.goto[node].items():
                q.append(nxt)
                f = self.fail[node]
                while f and ch not in self.goto[f]:
                    f = self.fail[f]
                self.fail[nxt] = self.goto[f].get(ch, 0)
                if self.fail[nxt] == nxt:  # root child self-reference
                    self.fail[nxt] = 0
                self.out[nxt] = self.out[nxt] + self.out[self.fail[nxt]]

    def counts(self, text: str) -> list[int]:
        """Occurrences per pattern (overlaps included)."""
        hits = [0] * len(self.patterns)
        node = 0
        for ch in text:
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            for idx in self.out[node]:
                hits[idx] += 1
        return hits

    def find(self, text: str) -> list[tuple[int, int]]:
        """(end_position, pattern_index) pairs in scan order."""
        found = []
        node = 0
        for i, ch in enumerate(text):
            while node and ch not in self.goto[node]:
                node = self.fail[node]
            node = self.goto[node].get(ch, 0)
            for idx in self.out[node]:
                found.append((i, idx))
        return found


def multi_match(
    df: DataFrame, patterns: list[str], text_col: str = "text",
) -> DataFrame:
    """Per-row blocklist stats: (…, n_hits, n_patterns) — total
    occurrences and distinct patterns present.  The automaton builds
    once on the driver and rides the UDF closure to executors."""
    ac = AhoCorasick(patterns)

    @F.pandas_udf("n_hits long, n_patterns int")
    def fn(s: pd.Series) -> pd.DataFrame:
        rows = []
        for v in s:
            if v is None:
                rows.append((None, None))
                continue
            hits = ac.counts(v)
            rows.append(
                (sum(hits), sum(1 for h in hits if h))
            )
        return pd.DataFrame(rows, columns=["n_hits", "n_patterns"])

    out = df.withColumn("_m", fn(F.col(text_col)))
    return out.select(
        *[c for c in df.columns],
        F.col("_m.n_hits").alias("n_hits"),
        F.col("_m.n_patterns").alias("n_patterns"),
    )


def substr_hits_col(text: Column, pattern: str) -> Column:
    """Pure-Catalyst occurrence count of ``pattern`` (non-overlapping
    left-greedy — equals AC counts for border-free patterns): length
    arithmetic, whole-stage codegen, no Python."""
    return (
        (F.length(text)
         - F.length(F.replace(text, F.lit(pattern), F.lit(""))))
        / len(pattern)
    ).cast("long")
