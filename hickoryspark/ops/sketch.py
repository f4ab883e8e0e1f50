"""Probabilistic sketches with EXACT cross-engine arithmetic — the
three sketches a crawl/corpus pipeline leans on:

- **Bloom filter** (Bloom 1970): "have we crawled this URL / kept
  this doc hash before?" membership against a prior crawl, without
  shipping the prior key set. Built as (word, bits) rows — a
  RELATIONAL bitmap: ``bit_or`` of single-bit words, mergeable across
  shards by the same ``bit_or``, probed with one equi-join + one
  groupBy. Bit positions are md5-derived (k salted hashes), so the
  filter — including its false positives — is deterministic and an
  independent engine computes the identical bitmap.
- **HyperLogLog registers** (Flajolet et al. 2007): distinct-count
  sketch as (bucket, register) rows, register = max rank (leading-
  zero run + 1) per bucket. Registers are the MERGEABLE state (max
  per bucket across shards/streams) — the part that must be exact;
  the final cardinality estimate is one tiny float formula over m
  rows (`hll_estimate`, driver-side or SQL, not hash-gated).
- **Count-Min sketch** (Cormode & Muthukrishnan 2005): "roughly how
  often does this token / URL / host appear?" frequency estimates
  without materializing the full frequency table. State = (row, col,
  cnt) rows, d independent md5-salted hash rows of width w; counts
  are BIGINT sums, so shards merge by summing matching cells. Point
  query = min over the d probed cells (never underestimates; the
  overestimate bound is the standard n/w per row).

Both sketches keep every step in BIGINT / bit arithmetic (md5-hex
prefix -> integer, shift, mask, bit_or, max): no floats anywhere in
the distributed state, so results are bit-identical across
partitionings and engines. Bits live 32-per-word in a BIGINT so no
shift ever touches the sign bit (portable to engines whose ``<<``
errors on 63-bit shifts).

Scale: build = one explode(k)/explode(1) + one groupBy (map-side
combine collapses to at most m distinct words/buckets per partition);
probe = one equi-join against the tiny word table (AQE broadcasts it)
+ one groupBy on the probe key.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits packed per bitmap word (32 of a BIGINT's 64 — keeps every
#: shift far from the sign bit on both engines)
WORD_BITS = 32


def _md5_pos(key: Column, salt: str, mod: int) -> Column:
    """Deterministic position in [0, mod): 48 bits of md5(salt:key).
    Mirrored in SQL as ('0x' || substr(md5(...), 1, 12))::BIGINT %."""
    h12 = F.substring(F.md5(F.concat(F.lit(f"{salt}:"), key)), 1, 12)
    return F.conv(h12, 16, 10).cast("long") % mod


def bloom_build(
    keys: DataFrame, key_col: str = "key", m_bits: int = 4096, k: int = 3
) -> DataFrame:
    """(word, bits) bitmap rows for a Bloom filter of ``m_bits`` bits
    and ``k`` hash functions over the DISTINCT values of key_col.
    Merge two filters (same m_bits/k) by unioning and re-bit_or-ing."""
    key = F.col(key_col).cast("string")
    pos = keys.select(
        F.explode(
            F.array(*[_md5_pos(key, f"b{i}", m_bits) for i in range(k)])
        ).alias("pos")
    )
    return (
        pos.select(
            F.expr(f"pos div {WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pos % {WORD_BITS} AS INT))"
            ).alias("m"),
        )
        .groupBy("word")
        .agg(F.bit_or("m").alias("bits"))
    )


def bloom_probe(
    probes: DataFrame,
    bloom: DataFrame,
    key_col: str = "key",
    m_bits: int = 4096,
    k: int = 3,
) -> DataFrame:
    """probes + ``maybe_present`` (1/0 BIGINT): 1 iff every one of the
    k probe bits is set (no false negatives; false-positive rate the
    standard (1-e^{-kn/m})^k). EVERY probe row survives — a NULL key
    (e.g. a failed URL normalization) probes to 0, it is never
    dropped. Shape: the k positions are k COLUMNS (no explode), each
    left-joined once against the tiny word table (AQE broadcasts it),
    so the probes lineage is scanned exactly once and no join-back or
    groupBy on the probe key is needed (duplicates and NULLs are
    naturally preserved)."""
    key = F.col(key_col).cast("string")
    out = probes
    hits = []
    for i in range(k):
        out = out.withColumn(f"_p{i}", _md5_pos(key, f"b{i}", m_bits))
        b = bloom.select(
            F.col("word").alias(f"_w{i}"), F.col("bits").alias(f"_b{i}")
        )
        out = out.join(
            b, F.expr(f"_p{i} div {WORD_BITS}") == F.col(f"_w{i}"), "left"
        ).withColumn(
            f"_h{i}",
            F.when(
                F.col(f"_b{i}").isNotNull()
                & (
                    F.col(f"_b{i}").bitwiseAND(
                        F.expr(
                            f"shiftleft(CAST(1 AS BIGINT), "
                            f"CAST(_p{i} % {WORD_BITS} AS INT))"
                        )
                    )
                    != 0
                ),
                1,
            ).otherwise(0),
        )
        hits.append(F.col(f"_h{i}"))
    maybe = hits[0] if k == 1 else F.least(*hits)
    drop = [c for i in range(k) for c in (f"_p{i}", f"_w{i}", f"_b{i}",
                                          f"_h{i}")]
    return out.withColumn("maybe_present", maybe.cast("long")).drop(*drop)


def hll_registers(
    keys: DataFrame, key_col: str = "key", p: int = 6
) -> DataFrame:
    """(bucket, register) HLL state over key_col, m = 2**p buckets:
    bucket = top p bits of a 32-bit md5 prefix, register = max over
    keys of (leading-zero run of the remaining 32-p bits) + 1,
    computed EXACTLY via the binary-string length of the remainder
    (no log2 floats). Empty buckets are absent (their register is 0);
    merge shards with max per bucket. NULL keys are dropped — a NULL
    contributes no distinct value, and md5(NULL)=NULL would otherwise
    corrupt the state with a (NULL, NULL) row."""
    if not 1 <= p <= 16:
        raise ValueError(f"p must be 1..16, got {p}")
    key = F.col(key_col).cast("string")
    h32 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    rem_bits = 32 - p
    base = keys.where(key.isNotNull()).select(h32.alias("h32"))
    w = F.col("h32") % (2**rem_bits)
    # rank = leading-zero run of the rem_bits-wide remainder + 1 =
    # rem_bits - (highest set bit index) = rem_bits - len(bin(w)) + 1;
    # w == 0 -> all zeros -> rem_bits + 1. bin() length replaces
    # floor(log2) so no float ever enters the state.
    rho = F.when(w == 0, rem_bits + 1).otherwise(
        rem_bits - F.length(F.bin(w)) + 1
    )
    return (
        base.select(
            F.expr(f"h32 div {2 ** rem_bits}").alias("bucket"),
            rho.cast("long").alias("register"),
        )
        .groupBy("bucket")
        .agg(F.max("register").alias("register"))
    )


def cms_build(
    items: DataFrame,
    key_col: str = "key",
    weight_col: str | None = None,
    w: int = 1024,
    d: int = 4,
) -> DataFrame:
    """(row, col, cnt) Count-Min sketch state over key_col: d hash
    rows of width w, cnt = BIGINT sum of weights (1 per occurrence
    when weight_col is None). Merge two sketches (same w/d) by
    unioning and re-summing per (row, col). NULL keys are dropped —
    they carry no countable identity and md5(NULL)=NULL would
    otherwise seed (row, NULL) cells.

    Scale: one explode(d) + one groupBy; map-side combine collapses
    each partition to at most w*d cells, so the shuffle is bounded by
    the sketch size, not the input."""
    key = F.col(key_col).cast("string")
    weight = (
        F.col(weight_col).cast("long") if weight_col
        else F.lit(1).cast("long")
    )
    cells = items.where(key.isNotNull()).select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).cast("long").alias("row"),
                    _md5_pos(key, f"c{i}", w).alias("col"),
                )
                for i in range(d)
            ])
        ).alias("rc"),
        weight.alias("_w"),
    )
    return (
        cells.select(F.col("rc.row").alias("row"),
                     F.col("rc.col").alias("col"), "_w")
        .groupBy("row", "col")
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_query(
    probes: DataFrame,
    cms: DataFrame,
    key_col: str = "key",
    w: int = 1024,
    d: int = 4,
) -> DataFrame:
    """probes + ``cms_count`` (BIGINT): min over the d probed cells,
    absent cells counting 0. EVERY probe row survives — a NULL key
    probes to 0, never dropped. Shape mirrors bloom_probe: the d
    positions are d COLUMNS, each left-joined once against the cell
    table, so the probes lineage is scanned exactly once and no
    groupBy on the probe key is needed (duplicates and NULLs are
    naturally preserved). The cell table is explicitly broadcast —
    a CMS is bounded at w*d cells BY CONSTRUCTION, so the hint is
    always safe and saves AQE from leaving any of the d joins
    sort-merge (observed: one of d=3 stayed SMJ under AQE alone)."""
    key = F.col(key_col).cast("string")
    out = probes
    ests = []
    for i in range(d):
        out = out.withColumn(f"_c{i}", _md5_pos(key, f"c{i}", w))
        s = cms.where(F.col("row") == i).select(
            F.col("col").alias(f"_k{i}"), F.col("cnt").alias(f"_n{i}")
        )
        out = out.join(F.broadcast(s),
                       F.col(f"_c{i}") == F.col(f"_k{i}"), "left")
        ests.append(F.coalesce(F.col(f"_n{i}"), F.lit(0).cast("long")))
    est = ests[0] if d == 1 else F.least(*ests)
    drop = [c for i in range(d) for c in (f"_c{i}", f"_k{i}", f"_n{i}")]
    return out.withColumn("cms_count", est.cast("long")).drop(*drop)


def hll_estimate(registers: list[tuple[int, int]], p: int = 6) -> float:
    """Standard HLL estimate from (bucket, register) rows (absent
    buckets = 0). Driver-side float math — deliberately OUTSIDE the
    exact-state contract; includes the small-range linear count
    correction."""
    m = 2**p
    regs = [0] * m
    for b, r in registers:
        regs[int(b)] = int(r)
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    raw = alpha * m * m / sum(2.0**-r for r in regs)
    zeros = regs.count(0)
    if raw <= 2.5 * m and zeros:
        return m * math.log(m / zeros)
    return raw


# ---------------------------------------------------------------------------
# KMV — K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002;
# the "bottom-k" / theta-sketch family): keep the k smallest distinct
# hash values per group. Unlike HLL it supports set operations
# (intersection via the union sketch's theta) and its state is
# directly mergeable by "union then re-take bottom-k". All state is
# BIGINT (60-bit md5 prefix), so shards and engines agree bit-exactly;
# only the final estimate is one float division.
# ---------------------------------------------------------------------------

#: hash space size: 15 hex digits = 60 bits (exactly representable as
#: a double, far from the BIGINT sign bit)
KMV_SPACE = 1 << 60

#: pre-prune salt fan-out for the two-level bottom-k (level-1 window
#: partitions are (group, salt) — a mega-group's distinct hashes split
#: across KMV_SALTS partitions before the final per-group rank)
KMV_SALTS = 256


def _kmv_hash(key: Column) -> Column:
    """60-bit hash: conv(substr(md5(key),1,15),16,10). Mirrored as
    ('0x' || substr(md5(...),1,15))::BIGINT."""
    return F.conv(
        F.substring(F.md5(key.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_state(df: DataFrame, key_col: str = "key",
              group_col: str = "grp", k: int = 64) -> DataFrame:
    """keys → per-group KMV state ``(grp, rank, h)``: the k smallest
    DISTINCT 60-bit key hashes, rank 1-based ascending. NULL keys
    drop (no countable identity). Groups with fewer than k distinct
    keys keep them all (the exact regime).

    Scale shape: one distinct on (group, hash), then TWO-LEVEL
    bottom-k — a (group, h mod KMV_SALTS) window prunes each salt
    slice to k rows before the per-group rank window, so no window
    partition ever holds a mega-group's full distinct-hash set
    (level-2 sees at most k * KMV_SALTS rows per group)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    from pyspark.sql import Window

    hashes = (
        df.where(F.col(key_col).isNotNull())
        .select(F.col(group_col).alias("grp"),
                _kmv_hash(F.col(key_col)).alias("h"))
        .distinct()
    )
    w1 = Window.partitionBy("grp", F.pmod(F.col("h"), F.lit(KMV_SALTS))
                            ).orderBy("h")
    pruned = (
        hashes.withColumn("_r1", F.row_number().over(w1))
        .where(F.col("_r1") <= k).drop("_r1")
    )
    w2 = Window.partitionBy("grp").orderBy("h")
    return (
        pruned.withColumn("rank",
                          F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
        .select("grp", "rank", "h")
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 64) -> DataFrame:
    """Union two KMV states and re-take the bottom-k per group —
    the shard/stream merge. Output shape = :func:`kmv_state`."""
    from pyspark.sql import Window

    u = a.select("grp", "h").unionAll(b.select("grp", "h")).distinct()
    w = Window.partitionBy("grp").orderBy("h")
    return (
        u.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("grp", "rank", "h")
    )


def kmv_estimate(state: DataFrame, k: int = 64) -> DataFrame:
    """KMV state → ``(grp, n_state, est_distinct)``. Exact count when
    the group never filled (n_state < k); otherwise the unbiased KMV
    estimator (k-1) * SPACE / h_k. One float division per group —
    (k-1)*SPACE is a power-of-two multiple of a small int, exactly
    representable, so both engines produce the identical double."""
    agg = state.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_state"),
        F.max("h").alias("_hk"),
    )
    est = (
        F.when(F.col("n_state") < k, F.col("n_state").cast("double"))
        .otherwise(F.lit(float(k - 1) * float(KMV_SPACE))
                   / F.col("_hk").cast("double"))
    )
    return agg.select("grp", "n_state", est.alias("est_distinct"))


def duckdb_kmv_sql(rel: str, key: str = "key", group: str = "grp",
                   k: int = 64) -> str:
    """DuckDB mirror of :func:`kmv_state` over ``rel``."""
    return f"""
        WITH kmv_h AS (
          SELECT DISTINCT {group} AS grp,
                 CAST(('0x' || substr(md5(CAST({key} AS VARCHAR)),
                                      1, 15)) AS BIGINT) AS h
          FROM {rel} WHERE {key} IS NOT NULL
        ), kmv_r AS (
          SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp
                                            ORDER BY h) AS rank
          FROM kmv_h)
        SELECT grp, CAST(rank AS BIGINT) AS rank, h
        FROM kmv_r WHERE rank <= {int(k)}"""


def duckdb_kmv_estimate_sql(rel: str, key: str = "key",
                            group: str = "grp", k: int = 64) -> str:
    """DuckDB mirror of ``kmv_estimate(kmv_state(...))``."""
    state = duckdb_kmv_sql(rel, key, group, k)
    big = float(k - 1) * float(KMV_SPACE)
    return f"""
        WITH kmv_s AS ({state})
        SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_state,
               CASE WHEN COUNT(*) < {int(k)}
                    THEN CAST(COUNT(*) AS DOUBLE)
                    ELSE {big!r} / CAST(MAX(h) AS DOUBLE)
               END AS est_distinct
        FROM kmv_s GROUP BY grp"""


def hll_registers_grouped(
    keys: DataFrame,
    group_col: str,
    key_col: str = "key",
    p: int = 6,
) -> DataFrame:
    """Per-group HLL state ``(group, bucket, register)`` — the
    mergeable distinct-count rollup that replaces
    ``count_distinct(url) GROUP BY host`` at scale: each group's
    state is at most ``2**p`` rows regardless of cardinality, states
    union with max-per-(group, bucket), and the estimator
    (:func:`hll_estimate`) reads any group's slice driver-side.
    Identical register arithmetic to :func:`hll_registers`
    (bin()-length rank, float-free); NULL keys AND NULL groups drop
    (no identity to count / no group to credit).
    """
    if not 1 <= p <= 16:
        raise ValueError(f"p must be 1..16, got {p}")
    key = F.col(key_col).cast("string")
    h32 = F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long")
    rem_bits = 32 - p
    base = keys.where(
        key.isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("grp"), h32.alias("h32"))
    w = F.col("h32") % (2**rem_bits)
    rho = F.when(w == 0, rem_bits + 1).otherwise(
        rem_bits - F.length(F.bin(w)) + 1
    )
    return (
        base.select(
            "grp",
            F.expr(f"h32 div {2 ** rem_bits}").alias("bucket"),
            rho.cast("long").alias("register"),
        )
        .groupBy("grp", "bucket")
        .agg(F.max("register").cast("long").alias("register"))
        .withColumnRenamed("grp", group_col)
    )
