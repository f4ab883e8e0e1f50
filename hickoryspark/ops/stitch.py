"""Multi-page article stitching — reassemble paginated articles
("page 2 of 7" listicles, split longreads) into single training
documents: the step after ops/crawlgraph.pagination_chains keys every
page by its chain terminal.

Pinned semantics (oracle-reproducible):

- input chains: ``pagination_chains`` output (url, seq_last,
  hops_to_last, resolved); only ``resolved = 1`` rows participate
  (cycles / over-budget chains are not articles);
- ``article_id`` = the chain terminal url (``seq_last`` — the unique
  stable key every member agrees on);
- member order = ``hops_to_last`` DESC (the first page is farthest
  from the terminal); page texts join with ``sep`` (default
  ``'\\n'``);
- pages with no text row drop out of the concat but the article row
  remains as long as ANY member has text; ``n_pages`` counts
  participating members.

Scale shape: one equi-join (chains x texts on url) + one
groupBy(article_id) whose collected frame is bounded by the chain
walk's ``rounds`` budget (2^rounds max hops — pagination_chains
caps it), so collect_list cannot blow up on hostile chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["stitch_articles"]


def stitch_articles(
    chains: DataFrame,
    texts: DataFrame,
    sep: str = "\n",
) -> DataFrame:
    """chains (url, seq_last, hops_to_last, resolved) x texts
    (url, text) -> (article_id, n_pages, text)."""
    members = (
        chains.where(F.col("resolved") == 1)
        .select("url", "seq_last", "hops_to_last")
        .join(texts.where(F.col("text").isNotNull()), "url")
    )
    return (
        members.groupBy(F.col("seq_last").alias("article_id"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pages"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.struct(
                                (-F.col("hops_to_last")).alias("_o"),
                                F.col("text").alias("_t"),
                            )
                        )
                    ),
                    lambda s: s["_t"],
                ),
                sep,
            ).alias("text"),
        )
    )
