"""Sessionization — gap-based event grouping, a standard events-table
operator beyond the reference's surface (the signals model is a superset
of an event stream, SURVEY.md §1.5).

Spark-first: a ``lag`` window flags gaps larger than the timeout, a
running sum of flags numbers the sessions — two window passes over ONE
shuffle on the series key, no self-join, no UDF.  Identical SQL runs on
any engine (the DuckDB oracle uses the same two windows).

Streaming note: the native streaming equivalent is
``session_window(ts, gap)`` in a watermarked groupBy; this module is the
batch form with explicit session ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    signals: DataFrame,
    gap_seconds: int = 1800,
    key_cols: tuple[str, ...] = ("series",),
) -> DataFrame:
    """Assign a 0-based per-key ``session_id``: a new session starts when
    the gap since the previous event exceeds ``gap_seconds``."""
    order = Window.partitionBy(*key_cols).orderBy("ts")
    prev = F.lag(F.unix_timestamp("ts")).over(order)
    is_new = F.when(
        prev.isNull()
        | ((F.unix_timestamp("ts") - prev) > gap_seconds),
        1,
    ).otherwise(0)
    run = Window.partitionBy(*key_cols).orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return signals.withColumn(
        "session_id", (F.sum(is_new).over(run) - 1).cast("long")
    )


def funnel(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel conversion: for each step k, how many users
    performed steps 1..k IN ORDER (each step strictly after the
    previous one's first occurrence — the standard product-analytics
    funnel, the batch analogue of SQL MATCH_RECOGNIZE).

    Single-pass plan: ONE shuffle on the (uniform) user key.  Step k's
    first-completion time is a RUNNING conditional min over the user's
    time-sorted events — a row qualifies for step k when its type
    matches and its ts is strictly after the running step-(k−1) time at
    that row — so all k funnel stages ride one window sort; the
    per-user finals reuse the same partitioning (running mins are
    non-increasing, so min-over-partition = final value), and the
    global step counts collapse to a 1-row aggregate unpivoted with
    ``stack``.  A per-step join chain instead would rescan the events
    table O(k²) times (measured: 28 exchanges for k=3 vs 3 here).
    Returns (step_idx, step, n_users, pct_of_first).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = events.select(user_col, "ts", type_col)
    prev_col: str | None = None
    for idx, step in enumerate(steps):
        cond = F.col(type_col) == step
        if prev_col is not None:
            cond = cond & (F.col("ts") > F.col(prev_col))
        cur = f"_t{idx}"
        staged = staged.withColumn(
            cur, F.min(F.when(cond, F.col("ts"))).over(w)
        )
        prev_col = cur
    per_user = staged.groupBy(user_col).agg(
        *[F.min(f"_t{i}").alias(f"_f{i}") for i in range(len(steps))]
    )
    totals = per_user.agg(
        *[
            F.count(f"_f{i}").alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    stack_args = ", ".join(
        f"{i + 1}, '{step}', _n{i}" for i, step in enumerate(steps)
    )
    return totals.select(
        F.expr(
            f"stack({len(steps)}, {stack_args}) "
            "AS (step_idx, step, n_users)"
        ),
        F.col("_n0").alias("_n1st"),
    ).select(
        "step_idx",
        "step",
        "n_users",
        F.round(F.try_divide(F.col("n_users"), F.col("_n1st")), 6).alias(
            "pct_of_first"
        ),
    )


def session_stats(
    signals: DataFrame,
    gap_seconds: int = 1800,
    key_cols: tuple[str, ...] = ("series",),
) -> DataFrame:
    """Per-session aggregates: event count, start/end, duration, value sum."""
    s = sessionize(signals, gap_seconds, key_cols)
    return s.groupBy(*key_cols, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(F.unix_timestamp("ts")).alias("session_start"),
        F.max(F.unix_timestamp("ts")).alias("session_end"),
        (
            F.max(F.unix_timestamp("ts")) - F.min(F.unix_timestamp("ts"))
        ).alias("duration_s"),
        F.sum("value").alias("total_value"),
    )


def interval_merge(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
) -> DataFrame:
    """Gaps-and-islands: merge each key's event stream into maximal
    activity intervals where consecutive events are ≤ ``gap_seconds``
    apart.

    Classic two-window form: flag island starts with a lag comparison,
    number islands with a running sum of the flags, then one aggregate
    per (key, island).  All three steps share the per-key partitioning,
    so the whole operator is a single exchange + one partition sort.

    Scale: per-key history is the unit of parallelism (same contract as
    `sessionize`, operators/sessions.py:21); a hot key serializes only
    its own timeline.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    numbered = events.withColumn(
        "island_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return numbered.groupBy(key_col, "island_id").agg(
        F.min(F.unix_timestamp("ts")).alias("island_start"),
        F.max(F.unix_timestamp("ts")).alias("island_end"),
        F.count("*").alias("n_events"),
    )


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    lookback_seconds: int = 7 * 86400,
) -> DataFrame:
    """Last-touch attribution: credit each conversion to the user's most
    recent PRECEDING non-conversion event within the lookback window;
    conversions with no eligible touch report as ``none``.

    One window per user key carries the latest touch (ts, event_id,
    event_type) struct forward with `last(ignorenulls)` over an
    unbounded-to-previous-row frame — no self-join, no per-conversion
    re-scan of the history.  The struct ordering makes equal-timestamp
    ties deterministic via event_id.

    Scale: single exchange on the user key plus a tiny final aggregate;
    a power user serializes only their own timeline.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.when(
        F.col("event_type") != conversion_type,
        F.struct("ts", "event_id", "event_type"),
    )
    carried = events.withColumn(
        "last_touch", F.last(touch, ignorenulls=True).over(w)
    )
    conv = carried.where(F.col("event_type") == conversion_type)
    in_window = (
        F.col("last_touch").isNotNull()
        & (
            F.unix_timestamp("ts")
            - F.unix_timestamp("last_touch.ts")
            <= lookback_seconds
        )
    )
    attributed = conv.select(
        F.when(in_window, F.col("last_touch.event_type"))
        .otherwise(F.lit("none"))
        .alias("touch_type"),
        "value",
    )
    return attributed.groupBy("touch_type").agg(
        F.count("*").alias("n_conversions"),
        F.round(F.sum("value"), 6).alias("total_value"),
    )


def sliding_distinct_users(events: DataFrame, window_days: int = 7) -> DataFrame:
    """Sliding-window distinct actives (e.g. weekly-active-users per
    day): for each day d, the count of users with ≥1 event in
    [d−(window_days−1), d].

    Contribution explode: each distinct (user, active_day) fans out to
    the ``window_days`` report days it supports, then one distinct
    aggregate per report day.  This is the scalable reformulation of a
    sliding COUNT DISTINCT — no per-day self-join against the event
    table, and the fan-out is bounded by window_days × distinct
    (user, day), not by raw event volume (the first distinct collapses
    events map-side).

    Report days past the data's last day are clipped (no window is
    reported whose anchor day has no data yet).  Report days near the
    START of the range have the standard partial lookback — a WAU for
    day 2 of a feed counts whoever was active in the 2 observed days.
    """
    day = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
    ud = events.select(
        F.col("user_id"), day.alias("day_epoch")
    ).distinct()
    max_day = ud.agg(F.max("day_epoch").alias("max_day"))
    fanout = ud.select(
        "user_id",
        F.explode(
            F.sequence(
                F.col("day_epoch"),
                F.col("day_epoch") + (window_days - 1) * 86400,
                F.lit(86400).cast("long"),
            )
        ).alias("report_day"),
    )
    return (
        fanout.crossJoin(F.broadcast(max_day))
        .where(F.col("report_day") <= F.col("max_day"))
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


def transition_counts(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """First-order Markov transition counts between event types WITHIN
    sessions (lag bigrams per user session) — the "what do users do
    next" table behind funnel design.

    Sessionizes inline with the same lag-flag + prefix-sum islands as
    `interval_merge`, then counts (prev_type → event_type) pairs.  All
    three windows share the user-key partitioning: one exchange, one
    partition sort, then a small (type × type) aggregate.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > gap_seconds), 1).otherwise(0)
    sess = events.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    pairs = sess.select(
        F.lag("event_type").over(ws).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    return pairs.groupBy("from_type", "to_type").agg(
        F.count("*").alias("n_transitions")
    )


def pmi_cooccurrence(events: DataFrame) -> DataFrame:
    """Pointwise mutual information between event-type pairs over user
    "baskets": PMI(a,b) = ln( p(a,b) / (p(a)·p(b)) ) where p counts the
    fraction of users whose history contains the type (pair).

    The basket-affinity primitive (market-basket lift, co-engagement).
    Distinct (user, type) first — raw event volume collapses before any
    pairing — then a user-keyed self-join bounded by types-per-user
    (≤ #event types, tiny), and 1-row/per-type totals broadcast in.
    """
    ut = events.select("user_id", "event_type").distinct()
    n_users_df = ut.agg(
        F.count_distinct("user_id").alias("n_users")
    )  # 1-row, broadcast below — the plan stays fully lazy
    totals = ut.groupBy("event_type").agg(
        F.count("*").alias("n_with")
    )
    pair_counts = (
        ut.alias("a")
        .join(
            ut.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_both"))
    )
    ta = totals.select(
        F.col("event_type").alias("type_a"), F.col("n_with").alias("n_a")
    )
    tb = totals.select(
        F.col("event_type").alias("type_b"), F.col("n_with").alias("n_b")
    )
    n_users = F.col("n_users")
    pmi = F.log(
        (F.col("n_both") / n_users)
        / ((F.col("n_a") / n_users) * (F.col("n_b") / n_users))
    )
    return (
        pair_counts.join(F.broadcast(ta), "type_a")
        .join(F.broadcast(tb), "type_b")
        .crossJoin(F.broadcast(n_users_df))
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(pmi, 6).alias("pmi"),
        )
    )


def conversion_latency(
    events: DataFrame,
    start: str = "view",
    end: str = "purchase",
) -> DataFrame:
    """Time-to-convert distribution: for each user, latency from their
    FIRST ``start`` event to the first ``end`` event at-or-after it;
    output is one row of corpus-level latency quantiles.

    Two keyed aggregates and one user-key join — no windows over the
    raw event stream, so the plan is the same three exchanges at any
    scale and the quantile aggregate runs over one row per converted
    user (tiny relative to events).
    """
    ue = events.select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("epoch")
    )
    starts = (
        ue.where(F.col("event_type") == start)
        .groupBy("user_id")
        .agg(F.min("epoch").alias("t0"))
    )
    conv = (
        ue.where(F.col("event_type") == end)
        .join(starts, "user_id")
        .where(F.col("epoch") >= F.col("t0"))
        .groupBy("user_id", "t0")
        .agg(F.min("epoch").alias("t1"))
        .select((F.col("t1") - F.col("t0")).alias("lat_s"))
    )
    return conv.agg(
        F.count("*").cast("long").alias("n_converted"),
        F.round(F.percentile("lat_s", F.lit(0.5)), 6).alias("p50_s"),
        F.round(F.percentile("lat_s", F.lit(0.9)), 6).alias("p90_s"),
        F.round(F.percentile("lat_s", F.lit(0.99)), 6).alias("p99_s"),
        F.round(F.avg("lat_s"), 6).alias("avg_s"),
    )


def rfm_segments(events: DataFrame, n_tiles: int = 5) -> DataFrame:
    """RFM segmentation: per-user Recency / Frequency / Monetary
    quantile tiles, aggregated to segment counts — the classic
    customer-value grid.

    Tile boundaries are exact corpus quantile cut points (6dp-rounded,
    engine-neutral), and a user lands in tile 1 + #{cuts below it} —
    NOT a global ntile window, which would funnel every user through
    one sorting task; here the only global object is the (n_tiles−1)-
    element cut array, broadcast to the per-user frame.  Ties at a cut
    share a tile (quantile semantics), so tiles are equal-sized only up
    to ties — the price of a scale-safe assignment.  Tile 1 = most
    recent / least frequent / lowest spend.
    """
    qs = [i / n_tiles for i in range(1, n_tiles)]
    per_user = (
        events.select(
            "user_id", F.unix_timestamp("ts").alias("epoch"), "value"
        )
        .groupBy("user_id")
        .agg(
            F.max("epoch").alias("last_epoch"),
            F.count("*").alias("freq"),
            F.sum("value").alias("monetary"),
        )
    )
    corpus_max = per_user.agg(F.max("last_epoch").alias("max_epoch"))
    scored = per_user.crossJoin(F.broadcast(corpus_max)).select(
        "user_id",
        (F.col("max_epoch") - F.col("last_epoch"))
        .cast("double")
        .alias("recency_s"),
        F.col("freq").cast("double").alias("freq"),
        "monetary",
    )
    qarr = F.array(*[F.lit(q) for q in qs])
    cuts = scored.agg(
        *[
            F.transform(
                F.percentile(c, qarr), lambda x: F.round(x, 6)
            ).alias(f"{c}_cuts")
            for c in ("recency_s", "freq", "monetary")
        ]
    )

    def tile(col: str):
        return (
            F.size(
                F.filter(
                    F.col(f"{col}_cuts"), lambda c: F.col(col) > c
                )
            )
            + 1
        )

    return (
        scored.crossJoin(F.broadcast(cuts))
        .select(
            tile("recency_s").alias("r_tile"),
            tile("freq").alias("f_tile"),
            tile("monetary").alias("m_tile"),
        )
        .groupBy("r_tile", "f_tile", "m_tile")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def stickiness(events: DataFrame, mau_days: int = 30) -> DataFrame:
    """DAU / MAU stickiness per day: daily actives over trailing
    ``mau_days``-day actives — the engagement ratio every consumer
    dashboard tracks.

    Sliding distinct-count via the CONTRIBUTION EXPLODE: each distinct
    (user, active day) row fans out to the ``mau_days`` target days it
    keeps the user "monthly active" for, then one distinct-count per
    target day — no per-day rescans, no quadratic self-join; fan-out is
    a fixed ×mau_days on the (small) distinct-activity frame.  Days
    beyond the observed extent are clipped by the DAU inner join.
    """
    ua = events.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    ).distinct()
    dau = ua.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    mau = (
        ua.select(
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.col("day") + (mau_days - 1))
            ).alias("day"),
        )
        .distinct()
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("mau"))
    )
    return (
        dau.join(mau, "day")
        .select(
            "day", "dau", "mau",
            F.round(F.col("dau") / F.col("mau"), 6).alias("stickiness"),
        )
    )


def interevent_gaps(events: DataFrame) -> DataFrame:
    """Distribution of per-user inter-event times: one lag window per
    user stream ((ts, event_id) ordering — total and deterministic),
    then corpus-level gap quantiles over one row per consecutive pair.

    The window partitions by user — each user's (short) timeline sorts
    independently; nothing global but the final 1-row quantile
    aggregate.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("epoch", "event_id")
    gaps = (
        events.select(
            "user_id", "event_id",
            F.unix_timestamp("ts").alias("epoch"),
        )
        .withColumn("gap_s", F.col("epoch") - F.lag("epoch").over(w))
        .where(F.col("gap_s").isNotNull())
    )
    return gaps.agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.round(F.percentile("gap_s", F.lit(0.5)), 6).alias("p50_s"),
        F.round(F.percentile("gap_s", F.lit(0.9)), 6).alias("p90_s"),
        F.round(F.percentile("gap_s", F.lit(0.99)), 6).alias("p99_s"),
        F.round(F.avg("gap_s"), 6).alias("avg_s"),
        F.max("gap_s").cast("long").alias("max_s"),
    )


def path_trigrams(
    events: DataFrame,
    gap_seconds: int = 1800,
    top_k: int = 20,
) -> DataFrame:
    """Top-k three-step behavior paths: within each user session
    (gap-based), count consecutive event-type trigrams — the sequence-
    mining summary product analytics builds sankeys from.

    Two lead windows over the per-user sort ALREADY REQUIRED for
    sessionization (no extra exchange), session boundary respected by
    comparing the lead rows' session ids; counts collapse on the (tiny,
    type³-bounded) trigram key and a TakeOrdered top-k — the vocabulary
    never sorts in one task.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_epoch = F.lag(F.unix_timestamp("ts")).over(w)
    is_new = F.when(
        prev_epoch.isNull()
        | ((F.unix_timestamp("ts") - prev_epoch) > gap_seconds),
        1,
    ).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    s = events.withColumn("sid", F.sum(is_new).over(run))
    tri = s.select(
        "user_id", "sid",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
        F.lead("sid", 2).over(w).alias("sid3"),
    ).where(F.col("sid3") == F.col("sid"))
    counts = tri.groupBy("e1", "e2", "e3").agg(
        F.count("*").cast("long").alias("n")
    )
    from pyspark.sql import Window as W2

    rn = F.row_number().over(
        W2.orderBy(F.col("n").desc(), "e1", "e2", "e3")
    )
    return (
        counts.withColumn("rank", rn)
        .where(F.col("rank") <= top_k)
        .select("rank", "e1", "e2", "e3", "n")
    )


def user_entropy(events: DataFrame) -> DataFrame:
    """Behavioral entropy per user: Shannon entropy (nats) of the
    user's event-type distribution — low = habitual single-action
    users, high = diverse explorers.  The per-user feature standard
    churn/segmentation models start from.

    Algebraic one-pass form H = ln n − (Σ c·ln c)/n over the per-
    (user, type) counts — two keyed aggregates, no window, no explode.
    """
    ct = events.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    return ct.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n_events"),
        F.count("*").cast("long").alias("n_types"),
        F.round(
            F.log(F.sum("c"))
            - F.sum(F.col("c") * F.log("c")) / F.sum("c"),
            6,
        ).alias("entropy"),
    )


def event_throttle(
    events: DataFrame,
    tolerance_s: int = 60,
    key_cols: tuple[str, ...] = ("user_id", "event_type"),
) -> DataFrame:
    """Telemetry throttling audit: collapse each key's events into
    ≤``tolerance_s``-gap islands and keep only the island's first event
    — the dedup a client SDK should have done; the kept/dropped ratio
    per type sizes how much a real throttle would save.

    Island semantics (first-of-burst survives, a long slow burst still
    collapses to one) — deterministic, single exchange on the key, the
    same lag + running-sum shape as `interval_merge`.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*key_cols).orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > tolerance_s), 1).otherwise(0)
    flagged = events.withColumn(
        "_first",
        is_new,
    )
    return flagged.groupBy("event_type").agg(
        F.sum("_first").cast("long").alias("n_kept"),
        (F.count("*") - F.sum("_first")).cast("long").alias("n_dropped"),
        F.round(F.sum("_first") / F.count("*"), 6).alias("kept_ratio"),
    )


def retention_curve(events: DataFrame, max_days: int = 14) -> DataFrame:
    """Day-N retention: share of all users active again exactly N days
    after their FIRST active day, N = 0..max_days−1 — the aggregate
    curve (cohort-collapsed) that headlines every growth dashboard.

    Distinct (user, day) first (one aggregate), first day per user
    rides the same keyed shuffle, offsets are a projection; the final
    frame is max_days rows.
    """
    ua = events.select(
        "user_id",
        F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
    ).distinct()
    first = ua.groupBy("user_id").agg(F.min("day").alias("f"))
    offs = (
        ua.join(first, "user_id")
        .select("user_id", (F.col("day") - F.col("f")).alias("off"))
        .where(F.col("off") < max_days)
        .distinct()
    )
    n_users = first.agg(F.count("*").alias("n_users"))
    return (
        offs.groupBy("off")
        .agg(F.count("*").cast("long").alias("n_active"))
        .crossJoin(F.broadcast(n_users))
        .select(
            F.col("off").cast("int").alias("day_n"),
            "n_active",
            F.col("n_users").cast("long").alias("n_users"),
            F.round(F.col("n_active") / F.col("n_users"), 6).alias(
                "retention"
            ),
        )
    )


def ltv_curve(events: DataFrame, max_days: int = 14) -> DataFrame:
    """Cumulative lifetime-value curve: average per-user cumulative
    value at day N since the user's first activity — the growth-team
    companion to `retention_curve` (value accrued, not just presence).

    Per-user daily value collapses first (one aggregate), the first
    day rides the same keyed shuffle; the cumulative step runs over
    day offsets 0..max_days−1 via a small explode (each user-day's
    value contributes to every LATER offset's cumulative bucket), so
    no per-user ordered window is needed at all.
    """
    ud = (
        events.select(
            "user_id",
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
            "value",
        )
        .groupBy("user_id", "day")
        .agg(F.sum("value").alias("v"))
    )
    first = ud.groupBy("user_id").agg(F.min("day").alias("f"))
    offs = ud.join(first, "user_id").select(
        "user_id", (F.col("day") - F.col("f")).alias("off"), "v"
    ).where(F.col("off") < max_days)
    contrib = offs.select(
        "user_id",
        "v",
        F.explode(
            F.sequence(F.col("off"), F.lit(max_days - 1))
        ).alias("day_n"),
    )
    n_users = first.agg(F.count("*").alias("n_users"))
    return (
        contrib.groupBy("day_n")
        .agg(F.sum("v").alias("cum_value"))
        .crossJoin(F.broadcast(n_users))
        .select(
            F.col("day_n").cast("int").alias("day_n"),
            F.round("cum_value", 6).alias("cum_value"),
            F.round(F.col("cum_value") / F.col("n_users"), 6).alias(
                "ltv_per_user"
            ),
        )
    )


def session_summary(
    signals: DataFrame,
    gap_seconds: int = 1800,
    key_cols: tuple[str, ...] = ("series",),
) -> DataFrame:
    """One-row session-quality digest: session count, bounce rate
    (single-event sessions), depth and duration quantiles — the
    sanity panel read before trusting any downstream journey metric.

    Rides the existing sessionize window (one exchange); the digest
    aggregates one row per session, tiny vs the stream.
    """
    per = session_stats(signals, gap_seconds, key_cols)
    return per.agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.round(
            F.sum((F.col("n_events") == 1).cast("long")) / F.count("*"), 6
        ).alias("bounce_rate"),
        F.round(F.percentile("n_events", F.lit(0.5)), 6).alias("p50_depth"),
        F.round(F.percentile("n_events", F.lit(0.9)), 6).alias("p90_depth"),
        F.round(F.percentile("duration_s", F.lit(0.5)), 6).alias(
            "p50_duration_s"
        ),
        F.round(F.avg("duration_s"), 6).alias("avg_duration_s"),
    )


def cohort_conversion(
    events: DataFrame,
    start: str = "view",
    end: str = "purchase",
    cohort_days: int = 7,
) -> DataFrame:
    """Conversion rate by signup cohort: users grouped by their FIRST-
    activity week, each counted converted when a ``start`` event is
    followed (at-or-after) by an ``end`` event — the "are newer
    cohorts converting better?" readout.

    All user-keyed aggregates + one keyed join; the cohort readout is
    a bounded-key aggregate.
    """
    ue = events.select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("epoch")
    )
    first = ue.groupBy("user_id").agg(
        F.floor(F.min("epoch") / (86400 * cohort_days))
        .cast("long")
        .alias("cohort")
    )
    starts = (
        ue.where(F.col("event_type") == start)
        .groupBy("user_id")
        .agg(F.min("epoch").alias("t0"))
    )
    conv = (
        ue.where(F.col("event_type") == end)
        .join(starts, "user_id")
        .where(F.col("epoch") >= F.col("t0"))
        .select("user_id")
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    return (
        first.join(conv, "user_id", "left")
        .groupBy("cohort")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum(F.coalesce("converted", F.lit(0)))
            .cast("long")
            .alias("n_converted"),
            F.round(
                F.sum(F.coalesce("converted", F.lit(0))) / F.count("*"), 6
            ).alias("conversion_rate"),
        )
    )
