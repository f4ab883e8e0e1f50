"""Event-stream analytics over the ``events`` table
(event_id, ts, user_id, event_type, value, props-json).

The batch forms of the windowed operators a crawl-monitoring pipeline
runs continuously (streaming.host_throughput_stream is the streaming
twin): tumbling-window aggregation, gap-based sessionization, and
JSON property extraction — all pure DataFrame programs with exact
DuckDB mirrors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def windowed_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """Tumbling event-time window per event_type: count + value sum.
    The streaming twin adds withWatermark; the plan is otherwise the
    same windowed partial-aggregate.

    The SUM runs in DECIMAL(18,6) internally (exact, order-independent
    regardless of partitioning — a double partial-agg's value depends
    on reduction order), but the OUTPUT is hash-stable primitives:
    the window start as its canonical string (ts is TIMESTAMP_NTZ, so
    an epoch conversion would be session-timezone-dependent; the
    string cast is not) and the sum rounded to a DOUBLE. Gate
    harnesses collect via pandas, which renders DECIMAL/TIMESTAMP
    differently than fetchall() — CORRECTNESS_r03 failed exactly the
    DECIMAL-typed outputs on identical values.
    """
    return (
        events.groupBy(
            F.window("ts", window).alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_vs"),
        )
        .select(
            F.col("w.start").cast("string").alias("win_start"),
            "event_type",
            "n_events",
            F.round(F.col("_vs").cast("double"), 6).alias("value_sum"),
        )
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization per user: a session breaks when the
    time since the previous event exceeds the gap. One url-free shuffle
    on user_id; both window functions share the same (user_id, ts)
    sort. Returns (user_id, n_sessions, n_events, max_session_events).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts arrives as TIMESTAMP_NTZ from parquet; route through TIMESTAMP
    # (session tz = UTC) to get epoch seconds
    secs = F.col("ts").cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), 1
    ).otherwise(0)
    sessions = events.withColumn(
        "session_id",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n")
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n").alias("n_events"),
        F.max("n").alias("max_session_events"),
    )


def props_stats(events: DataFrame) -> DataFrame:
    """JSON property extraction (props is a JSON string column):
    avg/max of $.k per event_type. get_json_object is JVM-side —
    no Python in the path."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.round(F.avg("k"), 6).alias("k_avg"),
            F.max("k").alias("k_max"),
            F.count("k").alias("n_with_k"),
        )
    )


def rollup_two_level(events: DataFrame,
                     fine: str = "1 minute") -> DataFrame:
    """Hypertable-style continuous-aggregate hierarchy: the HOUR
    rollup is computed FROM the fine (minute) rollup, never
    re-scanning the base table — the re-aggregability contract a
    multi-resolution dashboard store relies on, valid here because
    the partial sums are exact DECIMAL(18,6) (a double partial-agg
    would make the two levels drift by reduction order).

    Output (hash-stable primitives, the windowed_counts rules):
    ``(hour_start, event_type, n_events, value_sum, n_fine_buckets)``
    where ``n_fine_buckets`` counts the non-empty fine windows inside
    the hour — a statistic ONLY the two-level formulation can see,
    and the gate oracle derives it independently with a
    distinct-truncation count."""
    fine_agg = (
        events.groupBy(F.window("ts", fine).alias("w"), "event_type")
        .agg(
            F.count("*").alias("_n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_vs"),
        )
    )
    return (
        fine_agg.groupBy(
            F.date_trunc("hour", F.col("w.start")).alias("_h"),
            "event_type",
        )
        .agg(
            F.sum("_n").cast("long").alias("n_events"),
            F.sum("_vs").alias("_hvs"),
            F.count("*").cast("long").alias("n_fine_buckets"),
        )
        .select(
            F.col("_h").cast("string").alias("hour_start"),
            "event_type",
            "n_events",
            F.round(F.col("_hvs").cast("double"), 6).alias("value_sum"),
            "n_fine_buckets",
        )
    )


def retention_cohorts(events: DataFrame, user_col: str = "user_id",
                      ts_col: str = "ts",
                      epoch: str = "2024-01-01") -> DataFrame:
    """Weekly retention-cohort table — the product-analytics staple:
    ``(cohort_week, week_offset, n_users, cohort_size,
    retained_milli)``.

    Pinned exact-integer dialect: a user's week is
    ``datediff(CAST(ts AS DATE), epoch) div 7`` — the DATE cast is
    timezone-independent on TIMESTAMP_NTZ (the events_windowed
    lesson: unix_timestamp on NTZ is tz-dependent, calendar fields
    are not). Events BEFORE the epoch are dropped — a negative week
    index would hit the Spark-truncate vs DuckDB-floor divergence on
    integer division (pinned lesson), so the week domain is kept
    non-negative by construction; pick an epoch at or before the
    data's start. Cohort = the user's first active week; a user
    counts in (cohort, offset) iff active in cohort+offset; offset 0
    always holds the full cohort, so ``retained_milli`` =
    ``1000 * n_users div cohort_size`` is exact.

    Scale shape: one (user, week) distinct, one per-user min
    aggregation, one equi-join back, one (cohort, offset) groupBy —
    all map-side combinable, no windows. NULL users/timestamps drop
    (no cohort identity)."""
    wk = F.expr(
        f"datediff(cast({ts_col} as date), date'{epoch}') div 7"
    ).cast("long")
    ew = (
        events.where(F.col(user_col).isNotNull()
                     & F.col(ts_col).isNotNull()
                     & (F.col(ts_col).cast("date")
                        >= F.lit(epoch).cast("date")))
        .select(F.col(user_col).alias("_u"), wk.alias("_wk"))
        .distinct()
    )
    coh = ew.groupBy("_u").agg(F.min("_wk").alias("_cwk"))
    r = (
        ew.join(coh, "_u")
        .groupBy(F.col("_cwk").alias("cohort_week"),
                 (F.col("_wk") - F.col("_cwk")).alias("week_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    sz = (r.where(F.col("week_offset") == 0)
          .select(F.col("cohort_week").alias("_szc"),
                  F.col("n_users").alias("cohort_size")))
    return (
        r.join(sz, r["cohort_week"] == sz["_szc"])
        .select(
            "cohort_week", "week_offset", "n_users", "cohort_size",
            F.expr("(1000 * n_users) div cohort_size").cast("long")
            .alias("retained_milli"),
        )
    )


def duckdb_retention_sql(events_rel: str, user: str = "user_id",
                         ts: str = "ts",
                         epoch: str = "2024-01-01") -> str:
    """DuckDB mirror of :func:`retention_cohorts`."""
    return f"""
        WITH rt_ew AS (
          SELECT DISTINCT {user} AS u,
                 CAST((CAST({ts} AS DATE) - DATE '{epoch}') // 7
                      AS BIGINT) AS wk
          FROM {events_rel}
          WHERE {user} IS NOT NULL AND {ts} IS NOT NULL
            AND CAST({ts} AS DATE) >= DATE '{epoch}'
        ), rt_coh AS (
          SELECT u, MIN(wk) AS cwk FROM rt_ew GROUP BY u
        ), rt_r AS (
          SELECT c.cwk AS cohort_week, e.wk - c.cwk AS week_offset,
                 CAST(COUNT(*) AS BIGINT) AS n_users
          FROM rt_ew e JOIN rt_coh c ON e.u = c.u
          GROUP BY 1, 2
        ), rt_sz AS (
          SELECT cohort_week, n_users AS cohort_size FROM rt_r
          WHERE week_offset = 0)
        SELECT r.cohort_week, r.week_offset, r.n_users,
               s.cohort_size,
               CAST((1000 * r.n_users) // s.cohort_size AS BIGINT)
                 AS retained_milli
        FROM rt_r r JOIN rt_sz s ON r.cohort_week = s.cohort_week"""


def _ntz_epoch_seconds(ts_col: str) -> "F.Column":
    """Whole seconds since epoch of the NTZ wall-clock — truncated
    PER TIMESTAMP (floor(epoch(ts)), matching the DuckDB mirrors) and
    session-timezone-INDEPENDENT: the LTZ route
    (``cast(ts as timestamp).cast('long')``) re-buckets under a
    non-UTC driver timezone (the r4 events_windowed lesson)."""
    return F.expr(
        f"timestampdiff(SECOND, timestamp_ntz'1970-01-01 00:00:00', "
        f"date_trunc('SECOND', cast({ts_col} as timestamp_ntz)))"
    ).cast("long")


def event_transitions(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Markov transition matrix over event types: (src, dst, n_trans,
    p_milli) for consecutive events WITHIN a session (the sessionize
    gap rule — a transition never spans a session break, which is what
    distinguishes this from a naive per-user lead()).

    ``p_milli`` is the row-normalized transition probability in exact
    integer permille: ``(1000 * n) div row_total`` — numerator
    non-negative by construction (the signed-div engine rule).

    Scale shape: ONE shuffle on user_id serves all three window
    passes (lag for the gap, running-sum for the session id, lead for
    the successor — same (ts, event_id) sort), then one
    (src, dst) aggregation with map-side combine and a src-margin
    equi-join (AQE broadcasts the tiny margin at runtime).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = _ntz_epoch_seconds("ts")
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), 1
    ).otherwise(0)
    sess = events.withColumn(
        "_sid",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    stepped = sess.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
        (F.lead("_sid").over(w) == F.col("_sid")).alias("_same"),
    ).where(F.col("dst").isNotNull() & F.col("_same"))
    counts = stepped.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    totals = counts.groupBy(F.col("src").alias("_t_src")).agg(
        F.sum("n_trans").alias("_row_total")
    )
    return (
        counts.join(
            totals, F.col("src").eqNullSafe(F.col("_t_src"))
        )
        .select(
            "src",
            "dst",
            F.col("n_trans").cast("long").alias("n_trans"),
            F.expr("(1000 * n_trans) div _row_total").cast("long")
            .alias("p_milli"),
        )
    )


def volume_anomaly(
    events: DataFrame,
    spike_milli: int = 1500,
    dip_milli: int = 500,
) -> DataFrame:
    """Daily-volume anomaly readout — the ops-monitoring primitive a
    crawl scheduler watches (a stalled fetcher dips, a crawler trap
    or bot storm spikes): ``(day_num, n_events, p_milli, anomaly)``
    per UTC day.

    Pinned exact semantics: ``day_num = floor(epoch_seconds / 86400)``
    (NTZ wall-clock, tz-independent on both engines); the baseline is
    the LOWER MEDIAN of the daily counts — the (n+1) div 2-th
    smallest, a pinned deterministic pick (mean would let one spike
    poison the baseline); ``p_milli = (1000 * n) div median``;
    ``anomaly`` iff p_milli >= spike or <= dip.

    Scale shape: one day-grain aggregation (map-side combined); the
    daily frame is tiny (one row per day), so the median rides a
    collect_list over it and broadcasts back via a one-row
    cross join — the EVENT table is touched exactly once.
    """
    daily = (
        events.select(_ntz_epoch_seconds("ts").alias("_secs"))
        # FLOOR division, exactly as documented and as the DuckDB
        # mirror's `//` computes: `div` truncates toward zero, so a
        # pre-epoch event (negative _secs) landed in a different day
        # bucket per engine (r5 advice). (a - pmod(a, b)) is the
        # largest multiple of b <= a in exact integer arithmetic, so
        # the subsequent truncating div IS floor div for any input.
        .selectExpr("(_secs - pmod(_secs, 86400)) div 86400 AS day_num")
        .groupBy(F.col("day_num").cast("long").alias("day_num"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    # the empty feed must not evaluate element_at at index 0 (Spark
    # throws there); CASE WHEN evaluates its branch lazily, and the
    # NULL median never matters — daily has no rows to cross-join
    med = daily.agg(
        F.when(
            F.count(F.lit(1)) > 0,
            F.element_at(
                F.array_sort(F.collect_list("n_events")),
                F.expr("cast((count(*) + 1) div 2 as int)"),
            ),
        ).alias("_median")
    )
    return (
        daily.crossJoin(F.broadcast(med))
        .select(
            "day_num",
            "n_events",
            F.expr("(1000 * n_events) div _median").cast("long")
            .alias("p_milli"),
        )
        .withColumn(
            "anomaly",
            (F.col("p_milli") >= spike_milli)
            | (F.col("p_milli") <= dip_milli),
        )
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    gap_minutes: int = 30,
) -> DataFrame:
    """First-/last-touch conversion attribution — the marketing-
    analytics rollup (which touch gets credit for a purchase):
    ``(touch_type, n_first, n_last)`` counting conversions whose
    session's earliest / latest preceding touch was that type;
    touchless conversions credit ``(direct)``.

    Pinned semantics: touches and conversions order by (ts,
    event_id); a conversion sees only touches STRICTLY before it in
    the SAME gap-session (the sessionize rule — credit never crosses
    a 30-min inactivity break). First/last picks ride fixed-width
    ``%019d:%019d:`` (secs, event_id) string keys — 19 digits covers
    every non-negative BIGINT, so lexicographic min/max IS the
    numeric order on both engines (the struct-window forms are not
    portable to every oracle dialect). Rows with pre-epoch
    timestamps or negative event ids are DROPPED (zero-padding
    cannot order signed values — the retention pre-epoch rule).

    Scale shape: ONE user_id shuffle serves the session window and
    both min/max touch windows (same sort); then a tiny per-type
    rollup from the conversions frame, full-outer-joined null-safely.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    secs = _ntz_epoch_seconds("ts")
    events = events.where(
        (secs >= 0) & (F.col("event_id") >= 0)
    )
    gap = secs - F.lag(secs).over(w)
    new_session = F.when(
        gap.isNull() | (gap > gap_minutes * 60), 1
    ).otherwise(0)
    sess = events.withColumn("_secs", secs).withColumn(
        "_sid",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    touch_key = F.when(
        F.col("event_type").isin(*touch_types),
        F.concat(
            F.format_string("%019d:%019d:", F.col("_secs"),
                            F.col("event_id")),
            F.col("event_type"),
        ),
    )
    ws = Window.partitionBy("user_id", "_sid").orderBy(
        "ts", "event_id"
    ).rowsBetween(Window.unboundedPreceding, -1)
    conv = (
        sess.withColumn("_first_key", F.min(touch_key).over(ws))
        .withColumn("_last_key", F.max(touch_key).over(ws))
        .where(F.col("event_type") == conversion_type)
        .select(
            # 2-arg substring: unbounded tail (a length cap would
            # truncate long event types and desync the mirror)
            F.coalesce(F.expr("substring(_first_key, 41)"),
                       F.lit("(direct)")).alias("first_type"),
            F.coalesce(F.expr("substring(_last_key, 41)"),
                       F.lit("(direct)")).alias("last_type"),
        )
    )
    n_first = conv.groupBy(F.col("first_type").alias("touch_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_first")
    )
    n_last = conv.groupBy(
        F.col("last_type").alias("_lt")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_last"))
    return (
        n_first.join(
            n_last, F.col("touch_type").eqNullSafe(F.col("_lt")),
            "full_outer",
        )
        .select(
            F.coalesce("touch_type", "_lt").alias("touch_type"),
            F.coalesce("n_first", F.lit(0)).cast("long").alias("n_first"),
            F.coalesce("n_last", F.lit(0)).cast("long").alias("n_last"),
        )
    )
