"""HTML form extraction — forms with their submission targets and
controls.

The crawl-side structure miner for interactive surfaces: search boxes,
logins, subscription forms. Output feeds crawl planning (which hosts
take POSTs where) and page-type classification (login-walled pages).
The reference engine has no equivalent; this extends the §2 surface
the same way ops/links.py does for anchors.

Pinned semantics (so the closed-form gate oracle can reproduce them):

- a FORM row is a ``<form>`` element; ``form_pos`` is its 1-based
  document-order position among the page's forms;
- ``method``: the attribute ASCII-ws-trimmed + lowercased when that
  yields ``get``/``post``/``dialog``, else ``get`` (the HTML invalid-
  value default); ``action`` is emitted as written (NULL when absent);
  ``resolved_action`` = ops/links.resolve_href(url, action) (the
  CPython-urljoin-pinned resolver — empty action keeps the base, the
  HTML rule);
- a CONTROL is an element with tag in {input, select, textarea,
  button} lying INSIDE a form's ``pre_ord``/``subtree_end`` interval;
  nested forms: the NEAREST enclosing form owns (the microdata rule);
  controls outside every form are NOT emitted (the HTML ``form=``
  owner attribute is out of scope — documented);
- ``ctl_pos``: 1-based document order within the owning form;
- ``ctl_type``: input → trimmed-lowercased ``type`` attr, default
  ``text`` when absent/empty; button → same with default ``submit``;
  select/textarea → the tag name itself;
- ``name`` / ``value`` are the attributes as written (textarea's
  child-text "value" is out of scope — documented);
- a form with NO controls still emits ONE row: ``ctl_pos`` 0, control
  fields NULL (form-level facts are never lost).

Spark shape: the forms window and both interval joins are url-local
(the descendant_rel pattern — equi-join on url with the interval as a
residual, never a nested loop); everything after the first url shuffle
reuses that partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hickoryspark.nodes import TYPE_ELEMENT
from hickoryspark.ops.links import resolve_href

__all__ = ["extract_forms", "CONTROL_TAGS"]

CONTROL_TAGS = ("input", "select", "textarea", "button")

_WS_TRIM = " \t\n\x0b\f\r"


def _norm_method(col) -> "F.Column":
    m = F.lower(F.btrim(col, F.lit(_WS_TRIM)))
    return F.when(m.isin("get", "post", "dialog"), m).otherwise(F.lit("get"))


def extract_forms(nodes: DataFrame) -> DataFrame:
    """Node table -> one row per form control (plus one ctl-NULL row
    per empty form): ``(url, form_pos, method, action, resolved_action,
    ctl_pos, ctl_tag, ctl_type, name, value)``."""
    a = F.col("attrs")
    is_elem = F.col("type") == TYPE_ELEMENT
    w_form = Window.partitionBy("url").orderBy("f_ord")
    forms = nodes.where(is_elem & (F.col("tag") == "form")).select(
        "url",
        F.col("pre_ord").alias("f_ord"),
        F.col("subtree_end").alias("f_end"),
        _norm_method(a["method"]).alias("method"),
        a["action"].alias("action"),
    ).withColumn(
        "form_pos", F.row_number().over(w_form).cast("long")
    ).withColumn(
        "resolved_action",
        F.when(F.col("action").isNotNull(),
               resolve_href(F.col("url"), F.col("action"))),
    )

    tag = F.col("tag")
    ctl_type = (
        F.when(
            tag.isin("input", "button"),
            F.coalesce(
                F.nullif(F.lower(F.btrim(a["type"], F.lit(_WS_TRIM))),
                         F.lit("")),
                F.when(tag == "input", F.lit("text"))
                .otherwise(F.lit("submit")),
            ),
        )
        .otherwise(tag)
    )
    controls = nodes.where(
        is_elem & tag.isin(*CONTROL_TAGS)
    ).select(
        F.col("url").alias("c_url"),
        F.col("pre_ord").alias("c_ord"),
        tag.alias("ctl_tag"),
        ctl_type.alias("ctl_type"),
        a["name"].alias("name"),
        a["value"].alias("value"),
    )

    # nearest enclosing form per control (url-equi + interval residual)
    owned = controls.join(
        forms,
        (controls["c_url"] == forms["url"])
        & (controls["c_ord"] > forms["f_ord"])
        & (controls["c_ord"] <= forms["f_end"]),
        "inner",
    ).groupBy("c_url", "c_ord", "ctl_tag", "ctl_type", "name", "value").agg(
        F.max(
            F.struct("f_ord", "form_pos", "method", "action",
                     "resolved_action")
        ).alias("_f"),
    )
    w_ctl = Window.partitionBy("c_url", F.col("_f")["f_ord"]).orderBy("c_ord")
    ctl_rows = owned.select(
        F.col("c_url").alias("url"),
        F.col("_f")["form_pos"].alias("form_pos"),
        F.col("_f")["method"].alias("method"),
        F.col("_f")["action"].alias("action"),
        F.col("_f")["resolved_action"].alias("resolved_action"),
        F.row_number().over(w_ctl).cast("long").alias("ctl_pos"),
        "ctl_tag", "ctl_type", "name", "value",
        F.col("_f")["f_ord"].alias("_f_ord"),
    )

    # forms that own no control emit one ctl-NULL row (ctl_pos 0)
    empty_forms = forms.join(
        ctl_rows.select(F.col("url").alias("e_url"),
                        F.col("_f_ord").alias("e_ord")).distinct(),
        (forms["url"] == F.col("e_url")) & (forms["f_ord"] == F.col("e_ord")),
        "left_anti",
    ).select(
        "url", "form_pos", "method", "action", "resolved_action",
        F.lit(0).cast("long").alias("ctl_pos"),
        F.lit(None).cast("string").alias("ctl_tag"),
        F.lit(None).cast("string").alias("ctl_type"),
        F.lit(None).cast("string").alias("name"),
        F.lit(None).cast("string").alias("value"),
    )
    return ctl_rows.drop("_f_ord").unionByName(empty_forms)
