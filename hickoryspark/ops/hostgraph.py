"""Host-level link graph — the site-graph rollup of the page edge
list (ops/links.extract_links output).

The page-grain web graph is too fine for most crawl policy: spam/farm
detection, crawl budgeting, and site-level ranking (Host-graph
PageRank, TrustRank seeding) all run on the HOST graph.  This module
folds page edges to host grain with ops/hosts.url_host (the fuzzed
WHATWG fold — same host notion as the blocklist and robots layers).

Pinned semantics:

- an edge contributes iff BOTH endpoints fold to a host (relative
  un-resolved targets and scheme-less strings drop — they carry no
  host signal);
- ``host_edges`` aggregates parallel page edges into one weighted
  host pair (self-loops = intra-host navigation kept — dropping them
  is the caller's one-line filter);
- ``host_link_stats`` per source host: total out-edges, intra/inter
  split, distinct target hosts, and the top external target
  (most-linked other host, host-ascending tie rule; NULL when the
  host only links to itself).

Scale shape: host_edges is ONE (src, dst) groupBy (map-side
combinable — host pairs collapse massively before the shuffle);
host_link_stats rolls the pair table up by src host — same key
prefix, so the second aggregation reuses the first exchange's
partitioning. The top-external pick is a min-struct aggregation over
the pair table, never a window. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hickoryspark.ops.hosts import duckdb_url_host_sql, url_host

__all__ = ["host_edges", "host_link_stats", "duckdb_host_edges_sql",
           "category_mix", "host_link_quality", "host_reciprocity",
           "duckdb_reciprocity_sql", "related_hosts",
           "duckdb_related_sql", "DEFAULT_TARGET_CAP"]


def host_edges(links: DataFrame, src_col: str = "url",
               dst_col: str = "resolved") -> DataFrame:
    """page edges → ``(src_host, dst_host, n_links)`` weighted host
    pairs (self-loops kept)."""
    return (
        links.select(
            url_host(F.col(src_col)).alias("src_host"),
            url_host(F.col(dst_col)).alias("dst_host"),
        )
        .where(F.col("src_host").isNotNull()
               & F.col("dst_host").isNotNull())
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )


def host_link_stats(links: DataFrame, src_col: str = "url",
                    dst_col: str = "resolved") -> DataFrame:
    """page edges → per-source-host rollup ``(src_host, n_edges,
    n_intra, n_inter, n_hosts, top_external)``."""
    pairs = host_edges(links, src_col, dst_col)
    intra = F.col("src_host") == F.col("dst_host")
    ext_pick = F.when(
        ~intra, F.struct((-F.col("n_links")).alias("neg"), "dst_host"))
    return pairs.groupBy("src_host").agg(
        F.sum("n_links").cast("long").alias("n_edges"),
        F.sum(F.when(intra, F.col("n_links")).otherwise(F.lit(0)))
        .cast("long").alias("n_intra"),
        F.sum(F.when(~intra, F.col("n_links")).otherwise(F.lit(0)))
        .cast("long").alias("n_inter"),
        F.count(F.lit(1)).cast("long").alias("n_hosts"),
        F.min(ext_pick)["dst_host"].alias("top_external"),
    )


def duckdb_host_edges_sql(links_rel: str, src: str = "url",
                          dst: str = "resolved") -> str:
    """DuckDB mirror of :func:`host_edges` over relation
    ``links_rel`` (must expose ``src``/``dst`` columns)."""
    return f"""
        SELECT src_host, dst_host,
               CAST(COUNT(*) AS BIGINT) AS n_links
        FROM (
          SELECT {duckdb_url_host_sql(src)} AS src_host,
                 {duckdb_url_host_sql(dst)} AS dst_host
          FROM {links_rel})
        WHERE src_host IS NOT NULL AND dst_host IS NOT NULL
        GROUP BY src_host, dst_host"""


def category_mix(rows: DataFrame, key_col: str = "host",
                 cat_col: str = "lang_pred") -> DataFrame:
    """Per-key categorical composition: ``(key, cat, n_docs,
    share_milli)`` with exact-integer shares ``1000 * n div total``.
    The generic site-profile rollup — language mix per host, mime mix
    per host, license mix per domain — used to pick crawl targets
    ("hosts >=80% English") and audit corpus balance.

    Scale shape: two aggregations + one join, but only the FIRST
    touches corpus rows — the per-key totals groupBy and the join
    back both run on the counts relation, bounded by (key, category)
    cardinality, not corpus size (HashPartitioning(key, cat) does
    not satisfy a key-only distribution, so the totals agg does
    re-exchange — those are count rows, not documents). No windows,
    no Python. NULL keys AND NULL categories are real buckets
    (un-identified docs / hostless urls) — the join back is
    null-safe."""
    counts = rows.groupBy(
        F.col(key_col).alias("key"), F.col(cat_col).alias("cat")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    totals = counts.groupBy(F.col("key").alias("_tk")).agg(
        F.sum("n_docs").cast("long").alias("_total"))
    return (
        counts.join(totals, F.col("key").eqNullSafe(F.col("_tk")))
        .select(
            F.col("key").alias(key_col),
            F.col("cat").alias(cat_col),
            "n_docs",
            F.expr("(1000 * n_docs) div _total").cast("long")
            .alias("share_milli"),
        )
    )


def host_link_quality(links: DataFrame, src_col: str = "url",
                      dst_col: str = "resolved",
                      nofollow_col: str = "rel_nofollow") -> DataFrame:
    """Per-source-host link-spam signals: ``(src_host, n_edges,
    nofollow_milli, external_milli)`` — the WEBSPAM-style host
    features (a host whose pages are mostly nofollow'd external links
    is a link farm or comment-spam sink; a host with zero external
    edges is a closed template shell).

    Pinned: edges lacking EITHER endpoint host drop (the host_edges
    rule — no host signal, no row); shares are exact milli-integers
    ``1000 * n div n_edges``.

    Scale shape: ONE map-side-combinable src-host groupBy — no joins,
    no windows, no Python."""
    src = url_host(F.col(src_col))
    dst = url_host(F.col(dst_col))
    nf = F.coalesce(F.col(nofollow_col), F.lit(False))
    rows = links.select(
        src.alias("src_host"), dst.alias("dst_host"), nf.alias("nf"),
    ).where(F.col("src_host").isNotNull()
            & F.col("dst_host").isNotNull())
    agg = rows.groupBy("src_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_edges"),
        F.sum(F.col("nf").cast("long")).cast("long").alias("_nf"),
        F.sum((F.col("dst_host") != F.col("src_host")).cast("long"))
        .cast("long").alias("_ext"),
    )
    return agg.select(
        "src_host", "n_edges",
        F.expr("(1000 * _nf) div n_edges").cast("long")
        .alias("nofollow_milli"),
        F.expr("(1000 * _ext) div n_edges").cast("long")
        .alias("external_milli"),
    )


def host_reciprocity(edges: DataFrame) -> DataFrame:
    """Host-pair table (:func:`host_edges` output) → per-host
    reciprocal-linking profile ``(host, n_out_pairs, n_reciprocal,
    recip_milli, top_mutual)`` — the classic nepotistic-link /
    link-exchange signal (organic sites have low reciprocity; link
    farms and "link partners" pages have very high).

    Pinned semantics:

    - only EXTERNAL pairs count (self-loops are navigation, not
      exchange); a host whose every edge is a self-loop is absent;
    - a pair (a, b) is reciprocal iff the reverse pair (b, a) exists
      in the same table;
    - ``recip_milli`` = 1000 * n_reciprocal div n_out_pairs (exact
      integer — n_out_pairs > 0 by construction);
    - ``top_mutual`` = the reciprocal partner with the largest mutual
      weight ``least(fwd, rev)``, host-ascending tie rule; NULL when
      nothing is reciprocated.

    Scale shape: the pair table is already host-grain (collapsed by
    host_edges' groupBy — orders of magnitude below the page edge
    list), so the reversal self-join is an equi-join on (src, dst)
    host pairs; the rollup is one groupBy with a min-struct pick,
    never a window."""
    ext = edges.where(F.col("src_host") != F.col("dst_host"))
    rev = ext.select(
        F.col("dst_host").alias("r_src"),
        F.col("src_host").alias("r_dst"),
        F.col("n_links").alias("r_n"),
    )
    j = ext.join(
        rev,
        (ext["src_host"] == rev["r_src"])
        & (ext["dst_host"] == rev["r_dst"]),
        "left",
    )
    mutual = F.least(F.col("n_links"), F.col("r_n"))
    pick = F.when(
        F.col("r_n").isNotNull(),
        F.struct((-mutual).alias("neg"),
                 F.col("dst_host").alias("h")),
    )
    agg = j.groupBy(F.col("src_host").alias("host")).agg(
        F.count(F.lit(1)).cast("long").alias("n_out_pairs"),
        F.sum(F.col("r_n").isNotNull().cast("long")).cast("long")
        .alias("n_reciprocal"),
        F.min(pick)["h"].alias("top_mutual"),
    )
    return agg.select(
        "host", "n_out_pairs", "n_reciprocal",
        F.expr("(1000 * n_reciprocal) div n_out_pairs").cast("long")
        .alias("recip_milli"),
        "top_mutual",
    )


def duckdb_reciprocity_sql(links_rel: str, src: str = "url",
                           dst: str = "resolved") -> str:
    """DuckDB mirror of ``host_reciprocity(host_edges(...))`` over
    URL-grain ``links_rel`` — pair fold through the IMPORTED
    url_host mirror; the min-struct tie rule mirrors as a window."""
    pairs = duckdb_host_edges_sql(links_rel, src, dst)
    return f"""
        WITH rc_pairs AS ({pairs}
        ), rc_ext AS (
          SELECT * FROM rc_pairs WHERE src_host <> dst_host
        ), rc_j AS (
          SELECT e.src_host, e.dst_host, e.n_links, r.n_links AS r_n
          FROM rc_ext e LEFT JOIN rc_ext r
            ON e.src_host = r.dst_host AND e.dst_host = r.src_host
        ), rc_top AS (
          SELECT src_host, dst_host,
                 ROW_NUMBER() OVER (PARTITION BY src_host
                   ORDER BY LEAST(n_links, r_n) DESC, dst_host ASC)
                   AS rn
          FROM rc_j WHERE r_n IS NOT NULL
        ), rc_stats AS (
          SELECT src_host AS host,
                 CAST(COUNT(*) AS BIGINT) AS n_out_pairs,
                 CAST(SUM(CASE WHEN r_n IS NOT NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_reciprocal
          FROM rc_j GROUP BY src_host)
        SELECT s.host, s.n_out_pairs, s.n_reciprocal,
               CAST((1000 * s.n_reciprocal) // s.n_out_pairs
                    AS BIGINT) AS recip_milli,
               t.dst_host AS top_mutual
        FROM rc_stats s
        LEFT JOIN (SELECT src_host, dst_host FROM rc_top
                   WHERE rn = 1) t ON s.host = t.src_host"""


#: targets linked by more than this many distinct hosts are excluded
#: from pair generation — ubiquitous targets (CDNs, social widgets)
#: carry no similarity signal and would blow the pair stage up
#: quadratically (a target with in-degree d yields d*(d-1)/2 pairs)
DEFAULT_TARGET_CAP = 256


def related_hosts(links: DataFrame, src_col: str = "url",
                  dst_col: str = "resolved", min_shared: int = 2,
                  target_cap: int = DEFAULT_TARGET_CAP) -> DataFrame:
    """Bibliographic coupling over the host graph: hosts that link
    to the same targets are related (Kessler 1963 applied to sites —
    the "related sites" / competitor-discovery signal).

    ``(host_a, host_b, shared, dice_milli)`` for unordered external
    host pairs with at least ``min_shared`` common distinct target
    hosts; ``dice_milli = (2000 * shared) div (|out_a| + |out_b|)``
    over DISTINCT external out-sets.

    Scale shape: pair generation blocks on the shared target (one
    self-join keyed by target host), with targets above
    ``target_cap`` distinct linkers EXCLUDED first (the idf cut —
    pinned, both engines): a ubiquitous target would contribute
    in-degree² pairs. One groupBy per aggregation, no windows."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    out = (
        links.select(
            url_host(F.col(src_col)).alias("src_host"),
            url_host(F.col(dst_col)).alias("dst_host"),
        )
        .where(F.col("src_host").isNotNull()
               & F.col("dst_host").isNotNull()
               & (F.col("src_host") != F.col("dst_host")))
        .distinct()
    )
    sizes = out.groupBy("src_host").agg(
        F.count(F.lit(1)).cast("long").alias("n_out"))
    kept = (
        out.groupBy("dst_host")
        .agg(F.count(F.lit(1)).alias("_in"))
        .where(F.col("_in") <= target_cap)
        .select("dst_host")
    )
    blocked = out.join(kept, "dst_host")
    l = blocked.select(F.col("dst_host").alias("t"),
                       F.col("src_host").alias("host_a"))
    r = blocked.select(F.col("dst_host").alias("t2"),
                       F.col("src_host").alias("host_b"))
    shared = (
        l.join(r, (l["t"] == r["t2"]) & (l["host_a"] < r["host_b"]))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    sa = sizes.select(F.col("src_host").alias("host_a"),
                      F.col("n_out").alias("_na"))
    sb = sizes.select(F.col("src_host").alias("host_b"),
                      F.col("n_out").alias("_nb"))
    return (
        shared.join(sa, "host_a").join(sb, "host_b")
        .select(
            "host_a", "host_b", "shared",
            F.expr("(2000 * shared) div (_na + _nb)").cast("long")
            .alias("dice_milli"),
        )
    )


def duckdb_related_sql(links_rel: str, src: str = "url",
                       dst: str = "resolved", min_shared: int = 2,
                       target_cap: int = DEFAULT_TARGET_CAP) -> str:
    """DuckDB mirror of :func:`related_hosts` over url-grain
    ``links_rel``."""
    hs = duckdb_url_host_sql(src)
    hd = duckdb_url_host_sql(dst)
    return f"""
        WITH rh_out AS (
          SELECT DISTINCT src_host, dst_host FROM (
            SELECT {hs} AS src_host, {hd} AS dst_host
            FROM {links_rel})
          WHERE src_host IS NOT NULL AND dst_host IS NOT NULL
            AND src_host <> dst_host
        ), rh_sizes AS (
          SELECT src_host, CAST(COUNT(*) AS BIGINT) AS n_out
          FROM rh_out GROUP BY src_host
        ), rh_kept AS (
          SELECT dst_host FROM rh_out GROUP BY dst_host
          HAVING COUNT(*) <= {int(target_cap)}
        ), rh_blocked AS (
          SELECT o.* FROM rh_out o JOIN rh_kept USING (dst_host)
        ), rh_shared AS (
          SELECT a.src_host AS host_a, b.src_host AS host_b,
                 CAST(COUNT(*) AS BIGINT) AS shared
          FROM rh_blocked a JOIN rh_blocked b
            ON a.dst_host = b.dst_host
               AND a.src_host < b.src_host
          GROUP BY 1, 2 HAVING COUNT(*) >= {int(min_shared)}
        )
        SELECT s.host_a, s.host_b, s.shared,
               CAST((2000 * s.shared) // (x.n_out + y.n_out)
                    AS BIGINT) AS dice_milli
        FROM rh_shared s
        JOIN rh_sizes x ON x.src_host = s.host_a
        JOIN rh_sizes y ON y.src_host = s.host_b"""


def degree_histogram(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Log2-bucketed degree distribution of a directed edge list —
    the power-law readout every web-graph paper leads with (Broder et
    al. WWW 2000): ``(direction, bucket, n_nodes)`` where direction
    is ``'out'``/``'in'``, and bucket is the degree's BIT LENGTH
    (degree 1 -> 1, 2-3 -> 2, 4-7 -> 3, ...) — an exact integer
    binning both engines compute as ``length(bin(degree))`` (the hll
    bin()-length rank precedent), no floats, no log().

    Distinct neighbors per node (a weighted multi-edge list counts
    once — degree is connectivity, not traffic). Scale shape: two
    distinct-pair aggregations (map-side combined) + two tiny
    histogram rollups, unioned.
    """
    def one_side(node_col: str, other_col: str, tag: str) -> DataFrame:
        deg = (
            edges.select(F.col(node_col).alias("node"),
                         F.col(other_col).alias("nbr"))
            .distinct()
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("_deg"))
        )
        return deg.groupBy(
            F.lit(tag).alias("direction"),
            F.length(F.expr("bin(_deg)")).cast("long").alias("bucket"),
        ).agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))

    return one_side(src_col, dst_col, "out").unionByName(
        one_side(dst_col, src_col, "in")
    )
