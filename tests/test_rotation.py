"""Rotation state machine (VERDICT r04 item 5): the driver's
correctness gate only checks the first DRIVER_GATE entries of
queries(), so query ORDER is load-bearing.  These tests rebuild the
last-driver-round mapping from the committed CORRECTNESS_r0N.json
artifacts and fail if the declared ROTATION drifts from reality or the
ordering stops being stalest-first.

No Spark session needed — pure structural checks, so they run on every
pytest invocation at zero cost.
"""

import glob
import json
import os
import re

import __spark_entry__ as em

REPO = os.path.dirname(os.path.abspath(em.__file__))


def _driver_rows():
    # ROTATION encodes the state the CURRENT round's window was chosen
    # from, i.e. artifacts of rounds < CURRENT_ROUND.  The current
    # round's own CORRECTNESS file lands at round END (before the next
    # builder session updates ROTATION), so it must not fail this test.
    last = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        if rnd >= em.CURRENT_ROUND:
            continue
        for name in json.load(open(path)):
            last[name] = max(last.get(name, 0), rnd)
    return last


def test_rotation_matches_correctness_artifacts():
    last = _driver_rows()
    order = list(em.queries())
    assert set(em.ROTATION) == set(order), (
        "ROTATION keys != queries() keys: "
        f"only-rotation={sorted(set(em.ROTATION) - set(order))[:5]} "
        f"only-queries={sorted(set(order) - set(em.ROTATION))[:5]}"
    )
    for name in order:
        expect = last.get(name)
        assert em.ROTATION[name] == expect, (
            f"ROTATION[{name!r}] = {em.ROTATION[name]} but the committed "
            f"CORRECTNESS artifacts say {expect}; update ROTATION (and "
            f"CURRENT_ROUND) when a new CORRECTNESS file lands"
        )


def test_window_is_stalest_first():
    order = list(em.queries())
    window = set(order[: em.DRIVER_GATE])
    # every deliberately re-queued checked query must be declared
    assert em.ROTATION_EXCEPTIONS <= window
    # no checked query (outside the declared exceptions) may sit in the
    # window while a never-checked query waits outside it
    never = [q for q in order if em.ROTATION[q] is None]
    sneaked = [
        q
        for q in order[: em.DRIVER_GATE]
        if em.ROTATION[q] is not None and q not in em.ROTATION_EXCEPTIONS
    ]
    waiting = [q for q in never if q not in window]
    assert not (sneaked and waiting), (
        f"checked queries {sneaked[:5]} occupy window slots while "
        f"never-checked {waiting[:5]} wait outside — rotation stalled "
        f"(the r04 failure mode: new blocks prepended all round)"
    )
    # beyond the window, never-checked queries must come first, then
    # checked blocks in non-decreasing last-round order
    tail = order[em.DRIVER_GATE:]
    seen_round = 0
    for q in tail:
        r = em.ROTATION[q]
        if r is None:
            assert seen_round == 0, (
                f"never-checked {q!r} queued AFTER checked queries — it "
                f"would rotate in later than fresher rows"
            )
        else:
            assert r >= seen_round, (
                f"{q!r} (last round {r}) queued after a fresher query "
                f"(round {seen_round}) — stale rows must rotate first"
            )
            seen_round = max(seen_round, r)


def test_no_query_exceeds_max_staleness():
    order = list(em.queries())
    reachable = set(order[: em.DRIVER_GATE * 2])
    for q in order:
        r = em.ROTATION[q]
        if r is None:
            continue
        age = em.CURRENT_ROUND - r
        assert age <= em.MAX_STALE_ROUNDS or q in reachable, (
            f"{q!r} last driver-checked round {r} (age {age} rounds) and "
            f"not within the next two windows — rotation is stalled"
        )


def test_every_query_is_oracled_or_documented():
    # every queries() entry either has an oracle or is rows-only BY
    # DESIGN (docstring says so) — no silent oracle gaps
    q = em.queries()
    oracles = em.oracle_sql()
    for name, fn in q.items():
        if name in oracles:
            continue
        doc = (fn.__doc__ or "").lower()
        assert "rows-only" in doc or "no oracle" in doc, (
            f"{name!r} has no oracle_sql() entry and its docstring does "
            f"not declare rows-only-by-design"
        )
