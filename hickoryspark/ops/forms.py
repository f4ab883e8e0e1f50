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

__all__ = ["extract_forms", "CONTROL_TAGS", "classify_forms",
           "page_form_profile", "duckdb_form_classify_sql",
           "TEXTISH_TYPES", "SEARCH_NAMES"]

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


#: text-entry control types for the search/subscribe heuristics
TEXTISH_TYPES = ("text", "search", "email", "tel", "url", "number")

#: control names that mark a lone text box as a search form
SEARCH_NAMES = ("q", "s", "query", "search")


def classify_forms(form_rows: DataFrame) -> DataFrame:
    """Per-form page-type classification over :func:`extract_forms`
    output — the login-wall / search-box / newsletter detector crawl
    schedulers read.

    Pinned rules (priority order, full DuckDB mirror):

    - ``login``: any control with ``ctl_type = 'password'``;
    - ``upload``: else any ``ctl_type = 'file'``;
    - ``search``: else EXACTLY one text-entry control (``ctl_type``
      in TEXTISH_TYPES or ``ctl_tag = 'textarea'``) and that form has
      a control whose type is ``search`` or whose lowercased name is
      in SEARCH_NAMES;
    - ``subscribe``: else any ``ctl_type = 'email'``;
    - ``other`` otherwise (including control-less forms).

    Output: ``(url, form_pos, method, resolved_action, n_controls,
    form_type)``. One (url, form_pos) groupBy — map-side combinable.
    """
    is_ctl = F.col("ctl_pos") > 0
    textish = is_ctl & (
        F.col("ctl_type").isin(*TEXTISH_TYPES)
        | (F.col("ctl_tag") == "textarea")
    )
    search_hint = is_ctl & (
        (F.col("ctl_type") == "search")
        | F.lower(F.coalesce(F.col("name"), F.lit("")))
        .isin(*SEARCH_NAMES)
    )
    agg = form_rows.groupBy("url", "form_pos").agg(
        F.min("method").alias("method"),
        F.min("resolved_action").alias("resolved_action"),
        F.sum(is_ctl.cast("long")).cast("long").alias("n_controls"),
        F.max((F.col("ctl_type") == "password").cast("long"))
        .alias("_pw"),
        F.max((F.col("ctl_type") == "file").cast("long")).alias("_file"),
        F.sum(textish.cast("long")).alias("_ntext"),
        F.max(search_hint.cast("long")).alias("_shint"),
        F.max((F.col("ctl_type") == "email").cast("long")).alias("_em"),
    )
    form_type = (
        F.when(F.col("_pw") == 1, "login")
        .when(F.col("_file") == 1, "upload")
        .when((F.col("_ntext") == 1) & (F.col("_shint") == 1), "search")
        .when(F.col("_em") == 1, "subscribe")
        .otherwise("other")
    )
    return agg.select(
        "url", "form_pos", "method", "resolved_action", "n_controls",
        form_type.alias("form_type"),
    )


def page_form_profile(form_rows: DataFrame) -> DataFrame:
    """Page rollup of :func:`classify_forms`: ``(url, n_forms,
    has_login, has_search, has_upload, has_subscribe)`` — the
    login-wall routing signal. Flags are BIGINT 0/1."""
    cf = classify_forms(form_rows)

    def has(t: str):
        return F.max((F.col("form_type") == t).cast("long")).alias(
            f"has_{t}")

    return cf.groupBy("url").agg(
        F.count(F.lit(1)).cast("long").alias("n_forms"),
        has("login"), has("search"), has("upload"), has("subscribe"),
    )


def duckdb_form_classify_sql(rows_rel: str) -> str:
    """Full DuckDB mirror of :func:`classify_forms`; ``rows_rel``
    must expose extract_forms' columns."""
    textish_in = ", ".join(f"'{t}'" for t in TEXTISH_TYPES)
    names_in = ", ".join(f"'{n}'" for n in SEARCH_NAMES)
    return f"""
        WITH agg AS (
          SELECT url, form_pos, MIN(method) AS method,
                 MIN(resolved_action) AS resolved_action,
                 CAST(SUM(CASE WHEN ctl_pos > 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_controls,
                 MAX(CASE WHEN ctl_type = 'password' THEN 1 ELSE 0
                     END) AS pw,
                 MAX(CASE WHEN ctl_type = 'file' THEN 1 ELSE 0
                     END) AS fi,
                 SUM(CASE WHEN ctl_pos > 0 AND (ctl_type IN
                     ({textish_in}) OR ctl_tag = 'textarea')
                     THEN 1 ELSE 0 END) AS ntext,
                 MAX(CASE WHEN ctl_pos > 0 AND (ctl_type = 'search'
                     OR lower(COALESCE(name, '')) IN ({names_in}))
                     THEN 1 ELSE 0 END) AS shint,
                 MAX(CASE WHEN ctl_type = 'email' THEN 1 ELSE 0
                     END) AS em
          FROM {rows_rel} GROUP BY url, form_pos)
        SELECT url, form_pos, method, resolved_action, n_controls,
               CASE WHEN pw = 1 THEN 'login'
                    WHEN fi = 1 THEN 'upload'
                    WHEN ntext = 1 AND shint = 1 THEN 'search'
                    WHEN em = 1 THEN 'subscribe'
                    ELSE 'other' END AS form_type
        FROM agg"""
