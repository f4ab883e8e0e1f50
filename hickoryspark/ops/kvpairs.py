"""Definition-list key-value extraction — ``<dl>/<dt>/<dd>`` infobox
mining (spec sheets, glossaries, metadata blocks render as definition
lists; MediaWiki infobox exports and API docs are full of them).

The third structured-fact carrier next to microdata
(ops/microdata.py) and JSON-LD (ops/structured.py); table-shaped
infoboxes are already covered by ops/tables.py ``extract_tables``
(compose: filter its grid to 2-column th/td rows).

Pinned semantics (the closed-form gate oracle reproduces them):

- a LIST is a ``<dl>`` element; ``dl_pos`` is its 1-based document-
  order position among the page's dls;
- keys/values are DIRECT ``<dt>``/``<dd>`` element children of the dl
  (the HTML5 ``<div>``-wrapper form is out of scope — documented);
- each ``<dd>`` pairs with the NEAREST PRECEDING sibling ``<dt>``
  (several dds share one dt — one row each); a ``<dd>`` before any
  ``<dt>`` is dropped; a ``<dt>`` followed by no ``<dd>`` (before the
  next dt or list end) emits one row with ``value`` NULL (keys are
  never lost);
- ``key`` / ``value`` are SUBTREE text (all descendant text nodes in
  document order, ``''`` when none; comment data strings count as
  text — the links.py rule);
- ``pair_pos``: 1-based document order within the dl (by the dd's
  position; a value-less dt sits at its own position).

Spark shape: one url-equi interval join supplies subtree texts for
every dt/dd at once; the dt-ownership window and the pair window both
run over the same url-keyed shuffle (the heading_outline
last-ignore-nulls pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT, TYPE_TEXT

__all__ = ["definition_pairs"]


def definition_pairs(nodes: DataFrame) -> DataFrame:
    """Node table -> ``(url, dl_pos, pair_pos, key, value)`` — one row
    per dd (plus one value-NULL row per dd-less dt)."""
    is_elem = F.col("type") == TYPE_ELEMENT
    w_dl = Window.partitionBy("url").orderBy("l_ord")
    dls = (
        nodes.where(is_elem & (F.col("tag") == "dl"))
        .select("url", F.col("node_id").alias("dl_id"),
                F.col("pre_ord").alias("l_ord"))
        .withColumn("dl_pos", F.row_number().over(w_dl).cast("long"))
    )

    kids = nodes.where(
        is_elem & F.col("tag").isin("dt", "dd")
        & (F.col("parent_tag") == "dl")
    ).select(
        "url",
        F.col("parent_id").alias("dl_id"),
        F.col("pre_ord").alias("k_ord"),
        F.col("subtree_end").alias("k_end"),
        "sib_pos", "tag",
    )

    # subtree text for every dt/dd in ONE url-equi interval join
    texts = nodes.where(F.col("type") == TYPE_TEXT).select(
        F.col("url").alias("t_url"),
        F.col("pre_ord").alias("t_ord"),
        F.col("text").alias("t_text"),
    )
    kid_text = (
        kids.join(
            texts,
            (kids["url"] == texts["t_url"])
            & (texts["t_ord"] > kids["k_ord"])
            & (texts["t_ord"] <= kids["k_end"]),
            "left",
        )
        .repartition("url")
        .groupBy("url", "dl_id", "k_ord", "sib_pos", "tag")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("t_ord", "t_text"))),
                    lambda s: s["t_text"],
                ),
                "",
            ).alias("txt")
        )
    )

    # nearest preceding dt per child (last-ignore-nulls over sib order)
    w_sib = Window.partitionBy("url", "dl_id").orderBy("sib_pos")
    tagged = kid_text.withColumn(
        "dt_ord",
        F.last(F.when(F.col("tag") == "dt", F.col("k_ord")),
               ignorenulls=True).over(w_sib),
    ).withColumn(
        "dt_key",
        F.last(F.when(F.col("tag") == "dt", F.col("txt")),
               ignorenulls=True).over(w_sib),
    )
    dds = tagged.where(
        (F.col("tag") == "dd") & F.col("dt_ord").isNotNull()
    ).select(
        "url", "dl_id", "dt_ord",
        F.col("k_ord").alias("anchor"),
        F.col("dt_key").alias("key"),
        F.col("txt").alias("value"),
    )
    lone_dts = tagged.where(F.col("tag") == "dt").join(
        dds.select(F.col("url").alias("d_url"),
                   F.col("dt_ord").alias("d_ord")).distinct(),
        (F.col("url") == F.col("d_url")) & (F.col("k_ord") == F.col("d_ord")),
        "left_anti",
    ).select(
        "url", "dl_id", F.col("k_ord").alias("dt_ord"),
        F.col("k_ord").alias("anchor"),
        F.col("txt").alias("key"),
        F.lit(None).cast("string").alias("value"),
    )

    pairs = dds.unionByName(lone_dts).join(dls, ["url", "dl_id"])
    w_pair = Window.partitionBy("url", "dl_id").orderBy("anchor")
    return pairs.select(
        "url", "dl_pos",
        F.row_number().over(w_pair).cast("long").alias("pair_pos"),
        "key", "value",
    )
