"""Crawl snapshot diffing — what changed between two crawls.

Recrawl scheduling, incremental corpus refresh, and CDX-style change
tracking all reduce to the same primitive: join two (url, payload)
snapshots and classify every url as added / removed / changed /
unchanged by content hash. This is the batch complement to the
streaming first-seen dedup (spark/streaming.py).

Spark-first shape: one full-outer equi-join on url — a single shuffle
each side (co-partitioned and shuffle-free when both snapshots are
bucketed by url), hashes computed JVM-side with ``md5`` before the
join so the shuffle carries 32-byte digests instead of page bodies.
At 100 TB that hash-early projection is the difference between
shuffling checksums and shuffling the crawl.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELTA_COLS = ["url", "status", "old_hash", "new_hash"]


def _hashed(df: DataFrame, payload_col: str, out: str, flag: str) -> DataFrame:
    # presence is a column of its own: a NULL payload (failed fetch)
    # must still count as "url was in this snapshot", so status can
    # never be inferred from hash nullness alone
    return df.select(
        "url",
        F.md5(F.col(payload_col).cast("binary")).alias(out),
        F.lit(True).alias(flag),
    )


def crawl_delta(
    old: DataFrame, new: DataFrame, payload_col: str = "payload"
) -> DataFrame:
    """(url, payload) x2 → (url, status, old_hash, new_hash).

    ``status`` ∈ {'added', 'removed', 'changed', 'unchanged'};
    old_hash/new_hash are the lowercase md5 hex digests of the payload
    bytes (NULL on the absent side — and also for a present-but-NULL
    payload, e.g. a failed fetch; presence is tracked separately, and
    two NULL payloads for the same url compare 'unchanged'). Each
    snapshot must be unique by url — enforce upstream (the extract
    pipeline's sink is); duplicate urls would cross-join ambiguously
    here.
    """
    o = _hashed(old, payload_col, "old_hash", "in_old")
    n = _hashed(new, payload_col, "new_hash", "in_new")
    joined = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("in_old").isNull(), "added")
        .when(F.col("in_new").isNull(), "removed")
        .when(
            F.col("old_hash").eqNullSafe(F.col("new_hash")), "unchanged"
        )
        .otherwise("changed")
    )
    return joined.select(
        "url", status.alias("status"), "old_hash", "new_hash"
    )


def change_stability(obs: DataFrame, url_col: str = "url",
                     changed_col: str = "changed") -> DataFrame:
    """Revisit-scheduling signal from repeated crawl observations:
    ``obs`` is one row per (url, visit) with a boolean ``changed``
    (e.g. ``crawl_delta.status == 'changed'`` across consecutive
    snapshot pairs) → ``(url, n_obs, n_changed, stability_milli)``.

    ``stability_milli`` is the Cho & Garcia-Molina (VLDB 2000)
    frequency estimator's stay-unchanged probability
    ``(n - X + 0.5) / (n + 0.5)`` in EXACT milli-units:
    ``(1000 * (2*(n - X) + 1)) div (2*n + 1)`` — all-integer (the
    readability/pagerank rule: cross-engine gates need
    order-independent arithmetic), monotone in the real estimator, so
    ranking by it orders urls exactly as the float form would.
    Low stability = change often = revisit first; the +0.5 smoothing
    keeps never-changed urls below certainty and single-visit urls
    informative. NULL ``changed`` rows count as observations that did
    not change (a fetch that could not be compared is evidence of
    nothing).

    Scale shape: ONE map-side-combinable groupBy on url — no windows,
    no Python."""
    ch = F.coalesce(F.col(changed_col), F.lit(False))
    agg = obs.groupBy(F.col(url_col).alias("url")).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum(ch.cast("long")).cast("long").alias("n_changed"),
    )
    return agg.withColumn(
        "stability_milli",
        F.expr("(1000 * (2 * (n_obs - n_changed) + 1)) "
               "div (2 * n_obs + 1)"),
    )


def delta_line_similarity(
    old: DataFrame, new: DataFrame, text_col: str = "text"
) -> DataFrame:
    """How MUCH did each page change between two snapshots — the
    graded companion to ``crawl_delta``'s categorical status (news
    sites "change" every fetch via a timestamp line; a revisit policy
    wants the magnitude, not the bit).

    For every url present in BOTH snapshots:
    ``(url, n_lines_old, n_lines_new, n_common, jaccard_permille)``
    over the DISTINCT non-empty ASCII-trimmed lines of ``text_col``
    (NULL text = zero lines). ``jaccard_permille`` is the exact
    integer ``1000 * |old ∩ new| div |old ∪ new|``; two line-less
    sides are identical by definition (1000).

    Scale shape: lines explode row-locally, every join/agg is keyed by
    url — one co-partitioned shuffle family, no full-corpus state.
    Exact DuckDB mirror: ``duckdb_line_similarity_sql``.
    """
    trim_chars = " \t\r"

    def lines(df: DataFrame, flag: str) -> DataFrame:
        ln = F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")
        ).alias("line")
        return (
            df.select("url", ln)
            .select("url", F.expr(f"btrim(line, '{trim_chars}')")
                    .alias("line"))
            .where(F.col("line") != "")
            .distinct()
            .select("url", "line", F.lit(1).alias(flag))
        )

    both = (
        old.select("url").join(new.select("url"), "url", "left_semi")
        .distinct()
    )
    lo = lines(old.join(both, "url", "left_semi"), "in_o")
    ln_ = lines(new.join(both, "url", "left_semi"), "in_n")
    counts = (
        lo.join(ln_, ["url", "line"], "full_outer")
        .groupBy("url")
        .agg(
            F.sum(F.coalesce("in_o", F.lit(0))).cast("long")
            .alias("n_lines_old"),
            F.sum(F.coalesce("in_n", F.lit(0))).cast("long")
            .alias("n_lines_new"),
            F.sum(F.when(F.col("in_o").isNotNull()
                         & F.col("in_n").isNotNull(), 1).otherwise(0))
            .cast("long").alias("n_common"),
            F.count("*").cast("long").alias("n_union"),
        )
    )
    out = (
        both.join(counts, "url", "left")
        .select(
            "url",
            F.coalesce("n_lines_old", F.lit(0)).cast("long")
            .alias("n_lines_old"),
            F.coalesce("n_lines_new", F.lit(0)).cast("long")
            .alias("n_lines_new"),
            F.coalesce("n_common", F.lit(0)).cast("long")
            .alias("n_common"),
            F.when(
                F.coalesce("n_union", F.lit(0)) == 0, F.lit(1000)
            ).otherwise(
                # all-integer: BIGINT product, BIGINT div (the
                # readability rule — no float in a hash-gated output)
                F.expr("(1000 * coalesce(n_common, 0)) div n_union")
            ).cast("long").alias("jaccard_permille"),
        )
    )
    return out


def duckdb_line_similarity_sql(old_rel: str, new_rel: str,
                               text_expr: str = "text") -> str:
    """Exact relational mirror of ``delta_line_similarity`` (same trim
    set, same distinct-line counting, same integer division)."""
    def lines(rel: str, side: str) -> str:
        return f"""
          SELECT DISTINCT url,
                 trim(l.line, ' ' || chr(9) || chr(13)) AS line,
                 '{side}' AS side
          FROM {rel},
               unnest(string_split(COALESCE({text_expr}, ''), chr(10)))
                 AS l(line)
          WHERE trim(l.line, ' ' || chr(9) || chr(13)) <> ''"""

    return f"""
        WITH both_urls AS (
          SELECT DISTINCT o.url FROM {old_rel} o
          JOIN {new_rel} n USING (url)
        ), lo AS ({lines(old_rel, 'o')}),
        ln_ AS ({lines(new_rel, 'n')}),
        uni AS (
          SELECT url, line, COUNT(*) AS k FROM (
            SELECT url, line FROM lo WHERE url IN (SELECT url FROM both_urls)
            UNION ALL
            SELECT url, line FROM ln_ WHERE url IN (SELECT url FROM both_urls)
          ) GROUP BY url, line
        ), agg AS (
          SELECT url,
                 CAST(SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_common,
                 CAST(COUNT(*) AS BIGINT) AS n_union
          FROM uni GROUP BY url
        ), sides AS (
          SELECT COALESCE(a.url, b.url) AS url,
                 COALESCE(a.c, 0) AS n_lines_old,
                 COALESCE(b.c, 0) AS n_lines_new
          FROM (SELECT url, CAST(COUNT(*) AS BIGINT) AS c FROM lo
                WHERE url IN (SELECT url FROM both_urls) GROUP BY url) a
          FULL OUTER JOIN
               (SELECT url, CAST(COUNT(*) AS BIGINT) AS c FROM ln_
                WHERE url IN (SELECT url FROM both_urls) GROUP BY url) b
            ON a.url = b.url
        )
        SELECT u.url,
               CAST(COALESCE(s.n_lines_old, 0) AS BIGINT) AS n_lines_old,
               CAST(COALESCE(s.n_lines_new, 0) AS BIGINT) AS n_lines_new,
               CAST(COALESCE(g.n_common, 0) AS BIGINT) AS n_common,
               CAST(CASE WHEN COALESCE(g.n_union, 0) = 0 THEN 1000
                    ELSE 1000 * COALESCE(g.n_common, 0) // g.n_union
                    END AS BIGINT) AS jaccard_permille
        FROM both_urls u
        LEFT JOIN sides s ON u.url = s.url
        LEFT JOIN agg g ON u.url = g.url"""
