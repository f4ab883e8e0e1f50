"""Deterministic sampling + sequence packing for training-data mixes.

Every operator is reproducible from the data alone (no RNG state, no
row order dependence) so a re-run — or the DuckDB oracle — lands on
the identical sample:

- ``hash_sample``: keep a row iff a salted md5 of its key falls under
  the rate threshold. Uniform, stable under repartitioning, and
  different salts give independent samples (the standard trick for
  held-out splits).
- ``stratified_sample``: per-stratum quota, two-phase — partition-
  local first-N prunes each input partition to at most N candidate
  rows per stratum, then the global first-N runs over that bounded
  candidate set. A plain per-stratum window would funnel a dominant
  stratum (80% English is normal) through ONE task; here no task ever
  sees more than max(partition size, N x num_partitions) rows.
- ``pack_sequences``: assign docs to ~token-budget training chunks by
  running token count. Two-phase prefix sum: range-partition on
  (stratum, doc_id) so a giant stratum spans MANY partitions, local
  cumulative sums run per partition-stratum slice, and the tiny
  per-slice totals frame (one row per slice) supplies broadcast
  prefix offsets. Same deterministic output as a global per-stratum
  cumsum, no single-task-per-stratum straggler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_permille(key: Column, salt: str) -> Column:
    """Deterministic 0..999 bucket: 24 bits of md5(salt:key) mod 1000.
    Mirrored by the oracle as ('0x' || substr(md5(..),1,6))::BIGINT."""
    h6 = F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key.cast("string"))), 1, 6)
    return F.conv(h6, 16, 10).cast("long") % 1000


def hash_sample(
    docs: DataFrame, permille: int, key: str = "doc_id", salt: str = "s0"
) -> DataFrame:
    """Keep ~permille/1000 of rows, deterministically by key hash."""
    return docs.where(_hash_permille(F.col(key), salt) < permille)


def stratified_sample(
    docs: DataFrame,
    per_stratum: int,
    stratum: str = "source",
    order: str = "doc_id",
) -> DataFrame:
    """At most ``per_stratum`` rows per stratum: the deterministic
    first-N by ``order`` (``order`` must be unique within a stratum
    for the selection to be well-defined).

    Two-phase so a skewed stratum never serializes through one task:

    1. local prune — window over (input partition, stratum): each
       input partition contributes at most N candidates per stratum.
       The shuffle key includes the partition id, so a stratum's work
       spreads over as many tasks as it has input partitions.
    2. global pick — the same first-N window over only the candidate
       set, whose size per stratum is bounded by N x num_partitions
       regardless of corpus size.

    The union of partition-local first-Ns is a superset of the global
    first-N, so the output is exactly the single-window result.
    """
    w1 = Window.partitionBy("_pid", stratum).orderBy(order)
    cand = (
        docs.withColumn("_pid", F.spark_partition_id())
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= per_stratum)
        .drop("_rn")
    )
    w2 = Window.partitionBy(stratum).orderBy(order)
    return (
        cand.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= per_stratum)
        .drop("_rn", "_pid")
    )


def pack_sequences(
    docs: DataFrame,
    token_budget: int,
    stratum: str = "source",
    num_partitions: int | None = None,
) -> DataFrame:
    """(doc_id, source, n_tokens, chunk_id): docs packed in doc_id
    order into chunks of ~token_budget tokens per stratum —
    chunk_id = tokens-before-this-doc // budget, so a chunk holds
    consecutive docs until the budget spills.

    Two-phase distributed prefix sum (a single per-stratum running-sum
    window would be one task per stratum — the dominant stratum of a
    realistic mix becomes the stage straggler):

    1. ``repartitionByRange(stratum, doc_id)`` gives each partition a
       contiguous key slice, so a giant stratum spans many partitions
       and within a stratum lower partition ids hold lower doc_ids.
    2. local running sums per (partition, stratum) slice.
    3. slice totals — ONE row per (partition, stratum) — get their
       stratum-prefix offsets via a window over that tiny frame, then
       broadcast-join back; chunk_id = (offset + local_before) // budget.

    Output is byte-identical to the global per-stratum cumsum (range
    boundaries only affect intermediate slicing, never the prefix
    values), so the same oracle checks both shapes.

    The ranged frame is localCheckpoint-ed (eager) before it forks
    into the running-sum and totals branches: range boundaries are
    SAMPLED with an rdd-id-dependent seed at each materialization, so
    without the pin the two branches of the offsets join can execute
    under DIFFERENT boundaries (one partition's ids then mean
    different slices on the two sides — the vocab_growth sf0.1
    lesson; here the frame is 4 narrow columns, so pinning is cheap).
    """
    n_tokens = F.size(F.split(F.col("text"), " ")).cast("long")
    base = docs.select("doc_id", stratum, n_tokens.alias("n_tokens"))
    n_parts = num_partitions or base.sparkSession.sparkContext.defaultParallelism
    part = base.repartitionByRange(
        n_parts, F.col(stratum), F.col("doc_id")
    ).withColumn("_pid", F.spark_partition_id()).localCheckpoint(eager=True)
    w_loc = (
        Window.partitionBy("_pid", stratum)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = part.withColumn(
        "_before_loc", F.coalesce(F.sum("n_tokens").over(w_loc), F.lit(0))
    )
    totals = loc.groupBy("_pid", stratum).agg(F.sum("n_tokens").alias("_tot"))
    w_off = (
        Window.partitionBy(stratum)
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select("_pid", stratum, "_off")
    return (
        loc.join(F.broadcast(offsets), ["_pid", stratum])
        .withColumn(
            "chunk_id",
            F.floor((F.col("_off") + F.col("_before_loc")) / token_budget).cast(
                "long"
            ),
        )
        .select("doc_id", stratum, "n_tokens", "chunk_id")
    )


def temperature_sample(
    docs: DataFrame,
    alpha: float = 0.5,
    stratum: str = "lang",
    key: str = "doc_id",
    salt: str = "t0",
) -> DataFrame:
    """Temperature-flattened stratum rebalancing (the multilingual
    corpus-mixing rule of Conneau & Lample 2019 / mT5: target share of
    stratum s ∝ count_s^alpha), realized DOWNSAMPLE-ONLY: keep rate

        r_s = (c_min / c_s)^(1 - alpha)

    so the smallest stratum keeps everything and every larger stratum
    sheds mass toward the flattened mix (alpha=1 keeps all rows,
    alpha=0 equalizes strata to ~c_min each). Per-row keeps are the
    deterministic salted-md5 permille bucket (`_hash_permille`), so the
    sample is reproducible and oracle-checkable.

    Cross-engine exactness: thresholds are floor(1000 * r_s) computed
    in IEEE doubles. For alpha = 0.5 the rate is sqrt(c_min/c_s) —
    division, sqrt, and multiplication are all CORRECTLY-ROUNDED IEEE
    ops, so Spark and any IEEE-conformant oracle agree bit-for-bit.
    Other alphas go through pow(), which is NOT correctly rounded in
    general — fine for production, but oracle parity is only pinned
    for 0.5 (the gate uses it).

    Scale: one groupBy over the stratum column (tiny result — one row
    per language/source), a driver-free min via a window over that
    tiny frame, and a broadcast join back; the corpus itself is
    touched by exactly one filter pass.
    """
    counts = docs.groupBy(stratum).agg(
        F.count(F.lit(1)).cast("double").alias("_cnt")
    )
    w_all = Window.partitionBy()
    ratio = F.min("_cnt").over(w_all) / F.col("_cnt")
    rate = (
        F.sqrt(ratio) if alpha == 0.5 else F.pow(ratio, F.lit(1.0 - alpha))
    )
    thr = counts.select(
        F.col(stratum).alias("_ts_stratum"),
        F.floor(F.lit(1000.0) * rate).cast("long").alias("_thr"),
    )
    # null-safe join: a NULL stratum (un-identified language) is a
    # real stratum — it was counted above and must be SAMPLED at its
    # rate, not silently deleted by equi-join NULL semantics
    return (
        docs.join(
            F.broadcast(thr),
            F.col(stratum).eqNullSafe(F.col("_ts_stratum")),
        )
        .where(_hash_permille(F.col(key), salt) < F.col("_thr"))
        .drop("_ts_stratum", "_thr")
    )


def percentile_buckets(df: DataFrame, score_col: str,
                       n_buckets: int = 10) -> DataFrame:
    """``df`` plus an exact percentile ``bucket`` (0..n_buckets-1) of
    ``score_col`` — the curation binning step (quality-score deciles,
    perplexity buckets for mixture weighting).

    Pinned semantics (oracle-reproducible): all rows sharing a score
    value get the SAME bucket = ``(n_buckets * rows_below) div N``
    where ``rows_below`` counts rows with a strictly smaller score and
    ``N`` the non-NULL-score row count — all-integer arithmetic, so
    the assignment is bit-identical across engines and partitionings.
    NULL scores keep their row with bucket NULL and do not count.

    Scale shape: the cumulative ranks live on the DISTINCT-VALUE
    histogram, not the rows — the single-task window runs over one row
    per distinct score (this repo's quality signals are exact integers
    — ppm/milli-points — so that relation is tiny; a genuinely
    continuous score should be quantized upstream first, documented).
    The verdict table broadcasts back onto the rows: one histogram
    shuffle + a map-side join, the full-width rows never reshuffle.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    s = F.col(score_col)
    hist = df.where(s.isNotNull()).groupBy(score_col).agg(
        F.count("*").cast("long").alias("_c"))
    # _before and _total come out of ONE window pass over the
    # histogram (same sort, two frames) — a separate agg for the
    # total would re-scan the full input a second time
    w_before = (
        Window.orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    verdict = hist.select(
        score_col,
        F.coalesce(F.sum("_c").over(w_before), F.lit(0)).cast("long")
        .alias("_before"),
        F.sum("_c").over(w_all).cast("long").alias("_total"),
    ).select(
        score_col,
        F.expr(f"({int(n_buckets)} * _before) div _total").cast("long")
        .alias("bucket"),
    )
    return df.join(F.broadcast(verdict), score_col, "left")


def grouped_percentile_buckets(
    df: DataFrame, score_col: str, group_cols: list[str],
    n_buckets: int = 10,
) -> DataFrame:
    """Per-group exact percentile buckets — the CCNet move: bucket
    each document's LM perplexity WITHIN its language so 'head /
    middle / tail' means the same thing for every language regardless
    of corpus share.

    Same pinned integer rule as :func:`percentile_buckets` but scoped:
    ``bucket = (n_buckets * rows_below_in_group) div N_group`` with
    strictly-smaller counting over the group's non-NULL scores; NULL
    scores keep their row with bucket NULL (and a NULL in a group
    column is a group value like any other).

    Scale shape: ranks live on the per-group DISTINCT-VALUE histogram
    (windows partition by group — no single-task sort); the verdict
    equi-joins back on (group, score). Unhinted — AQE broadcasts the
    verdict when the histogram is small (the integer-score case).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    s = F.col(score_col)
    hist = df.where(s.isNotNull()).groupBy(*group_cols, score_col).agg(
        F.count("*").cast("long").alias("_c"))
    w_before = (
        Window.partitionBy(*group_cols).orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = (
        Window.partitionBy(*group_cols).orderBy(score_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    verdict = hist.select(
        *group_cols, score_col,
        F.coalesce(F.sum("_c").over(w_before), F.lit(0)).cast("long")
        .alias("_before"),
        F.sum("_c").over(w_all).cast("long").alias("_total"),
    ).select(
        *group_cols, score_col,
        F.expr(f"({int(n_buckets)} * _before) div _total").cast("long")
        .alias("bucket"),
    )
    # null-safe on the group keys (a NULL group is still a group);
    # plain equality on the score (NULL scores take the left-join
    # miss). Aliased sides — verdict derives from df, so bare column
    # references would be ambiguous in the self-join.
    left, right = df.alias("_pb_l"), verdict.alias("_pb_r")
    cond = F.col(f"_pb_l.{score_col}") == F.col(f"_pb_r.{score_col}")
    for c in group_cols:
        cond = cond & F.col(f"_pb_l.{c}").eqNullSafe(F.col(f"_pb_r.{c}"))
    return left.join(right, cond, "left").select(
        "_pb_l.*", F.col("_pb_r.bucket"))


def pps_systematic(
    docs: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    key: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling (the
    classic PPS design of Madow 1949, offset pinned to 0 so the draw
    is deterministic and oracle-checkable): lay the corpus out on a
    weight line in ``key`` order, walk it with a stride of
    ``total_weight div k``, and pick every row whose weight interval
    contains a stride multiple. A row heavier than the stride is
    picked with MULTIPLICITY (``n_picks`` > 1) — the textbook
    certainty-selection behavior, not an error.

    Output: ``(key, wt, n_picks)`` for selected rows only
    (``n_picks >= 1``); ``wt`` is the clamped ``greatest(weight, 1)``
    actually used. ``sum(n_picks) == total_weight div stride``
    exactly. All arithmetic is non-negative BIGINT (``div`` truncates
    identically in Spark and DuckDB on non-negatives — the signed-div
    divergence rule).

    Scale shape: the exclusive prefix sum is the pack_sequences
    two-phase program (range-partition by key, per-partition local
    running sums, one tiny per-partition totals frame broadcast back
    with its offsets) — a bare ``Window.orderBy(key)`` would collapse
    the whole corpus into ONE task. The ranged frame is
    localCheckpoint-ed before forking (range boundaries re-sample per
    materialization — the vocab_growth lesson). The total weight and
    stride ride a one-row aggregate off the tiny totals frame,
    cross-joined back (broadcast).
    """
    wt = F.greatest(F.col(weight_col).cast("long"), F.lit(1)).alias("wt")
    base = docs.select(F.col(key), wt)
    n_parts = num_partitions or base.sparkSession.sparkContext.defaultParallelism
    part = (
        base.repartitionByRange(n_parts, F.col(key))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    w_loc = (
        Window.partitionBy("_pid")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    loc = part.withColumn(
        "_before_loc", F.coalesce(F.sum("wt").over(w_loc), F.lit(0))
    )
    totals = loc.groupBy("_pid").agg(F.sum("wt").alias("_tot"))
    w_off = (
        Window.partitionBy()
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    stride = totals.agg(
        F.expr(f"greatest(sum(_tot) div {int(k)}, 1)").cast("long")
        .alias("_stride")
    )
    return (
        loc.join(F.broadcast(offsets), "_pid")
        .crossJoin(F.broadcast(stride))
        .withColumn("_before", F.col("_off") + F.col("_before_loc"))
        .withColumn(
            "n_picks",
            F.expr("(_before + wt) div _stride - _before div _stride")
            .cast("long"),
        )
        .where(F.col("n_picks") >= 1)
        .select(key, "wt", "n_picks")
    )
