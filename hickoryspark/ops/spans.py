"""Exact duplicated-substring detection across documents — the
"ExactSubstr" dedup of Lee et al. 2021 ("Deduplicating Training Data
Makes Language Models Better"), built on winnowing fingerprints
(Schleimer, Wilkerson, Aiken, SIGMOD'03 — both public papers).

Finds every maximal character run of length >= ``min_len`` shared
verbatim between two documents, WITHOUT the suffix array the paper
uses (a global suffix array is the one data structure that does not
distribute; winnowed k-gram anchors + verification gives the same
guarantee for runs >= the winnowing threshold w + k - 1):

1. **anchors** — per doc, a rolling k-gram hash at every char
   position, winnowed: each w-window keeps its (rightmost) minimum.
   Schleimer's guarantee: any shared run of length >= w + k - 1
   contains at least one window fully inside the run in BOTH docs;
   identical hash sequences select the identical anchor, so every
   qualifying run is anchored on both sides. ~2n/w anchors per doc.
2. **bucket join** — anchors grouped by hash; each bucket expands to
   doc pairs (triu, vectorized). Buckets are rank-capped BEFORE the
   collect (`bucket_cap`) so a stopword-block shared by millions of
   docs cannot OOM a task. The cap is a DETERMINISTIC truncation (the
   lowest (doc_id, pos) anchors survive): pairs wholly outside the
   cap are not formed — pass ``bucket_cap=None`` when completeness
   matters more than the skew bound (the gate and tests do).
3. **diagonal merge** — candidate pairs collapse by
   (doc_a, doc_b, pos_a - pos_b): every anchor of one shared run sits
   on one diagonal, so a 10k-char duplicate costs ONE verification,
   not 2·10k/w. Only the min/max anchor positions are aggregated —
   the cluster state is two longs however long the run is, and
   arbitrarily long duplicates are reported at FULL length (no
   anchor-list or slice cap).
4. **verify + extend** — each side contributes a substring slice
   covering [min anchor - ext, max anchor + k + ext] (JVM
   ``substring`` — the per-pair fan-out shuffles slices, never whole
   documents; a slice is never longer than the doc, and is tiny
   unless the shared material itself is large); a vectorized
   comparison finds every maximal equal run in the aligned window and
   emits (doc_a, doc_b, pos_a, pos_b, length) with 0-based char
   offsets. Hash collisions die here (no equal run => no row).
   Multiple repeats far apart on ONE diagonal of one pair share a
   window spanning both — correctness is unaffected (the window scan
   emits every run, deduped inside the single cluster row that owns
   that diagonal; output rows are unique by construction, no distinct
   pass exists or is needed); the window is the documented worst-case
   cost for that adversarial shape.

Positions are CHARACTER offsets (the hash runs over code points, so
offsets agree with Spark's 1-based ``substring`` minus one).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: polynomial rolling-hash base (odd, large; arithmetic wraps mod 2^64)
_BASE = np.uint64(1000003)


def _char_array(text: str) -> np.ndarray:
    """Code points of ``text`` as uint64 (O(n), no Python loop)."""
    return np.frombuffer(
        text.encode("utf-32-le"), dtype=np.uint32
    ).astype(np.uint64)


def _rolling_hashes(c: np.ndarray, k: int) -> np.ndarray:
    """h[i] = polynomial hash of c[i:i+k] (mod 2^64), all positions."""
    n = len(c)
    m = n - k + 1
    h = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        h = h * _BASE + c[j : j + m]
    return h


def winnow_positions(h: np.ndarray, w: int) -> np.ndarray:
    """Winnowed anchor positions over a hash sequence: per w-window
    the RIGHTMOST minimum (Schleimer §2's robust winnowing tie rule),
    deduplicated. w=1 keeps every position."""
    if len(h) == 0:
        return np.zeros(0, dtype=np.int64)
    if w <= 1 or len(h) <= w:
        return np.arange(len(h), dtype=np.int64) if w <= 1 else np.array(
            [len(h) - 1 - int(np.argmin(h[::-1]))], dtype=np.int64
        )
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    idx = (w - 1) - np.argmin(win[:, ::-1], axis=1)
    pos = np.arange(len(idx), dtype=np.int64) + idx
    return np.unique(pos)


def winnow_anchors(
    docs: DataFrame,
    k: int = 20,
    w: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, pos, h) winnowed k-gram anchors; ``h`` is the rolling
    hash as a signed BIGINT (two's complement of the uint64)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, poss, hss = [], [], []
            for doc_id, text in zip(b[id_col], b[text_col]):
                if text is None or len(text) < k:
                    continue
                h = _rolling_hashes(_char_array(text), k)
                p = winnow_positions(h, w)
                ids.append(np.full(len(p), doc_id, dtype=np.int64))
                poss.append(p)
                hss.append(h[p].view(np.int64))
            if ids:
                yield pd.DataFrame(
                    {id_col: np.concatenate(ids),
                     "pos": np.concatenate(poss),
                     "h": np.concatenate(hss)}
                )

    return docs.select(id_col, text_col).mapInPandas(
        gen, f"{id_col} long, pos long, h long"
    )


def duplicated_spans(
    docs: DataFrame,
    k: int = 20,
    w: int = 8,
    min_len: int = 30,
    bucket_cap: int | None = 4096,
    ext: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All maximal shared runs >= min_len chars between doc pairs —
    (doc_a, doc_b, pos_a, pos_b, length), doc_a < doc_b, 0-based
    offsets. Complete for runs >= w + k - 1 (the winnowing guarantee);
    ``min_len`` must be >= that threshold so "complete above min_len"
    holds. ``ext`` is the slice margin beyond the outermost anchors;
    it must cover the anchor-to-run-edge distance (< w + k - 1) plus
    any coincidental equal tail shorter than the anchor guarantee, so
    it is floored at 2 * (w + k). See module docstring for the four
    stages and the bucket_cap truncation contract."""
    if min_len < w + k - 1:
        raise ValueError(
            f"min_len must be >= w+k-1 = {w + k - 1} (the winnowing "
            f"detection guarantee), got {min_len}"
        )
    ext = max(ext, 2 * (w + k))
    anchors = winnow_anchors(docs, k, w, id_col, text_col)
    if bucket_cap is not None:
        # rank-cap INSIDE the aggregation input (bounded frames before
        # collect_list — the dedup group-frame rule)
        rk = Window.partitionBy("h").orderBy(id_col, "pos")
        anchors = (
            anchors.withColumn("_rk", F.row_number().over(rk))
            .where(F.col("_rk") <= bucket_cap)
            .drop("_rk")
        )
    buckets = anchors.groupBy("h").agg(
        F.sort_array(
            F.collect_list(F.struct(id_col, "pos"))
        ).alias("members"),
    ).where(F.size("members") >= 2)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for members in b["members"]:
                ids = np.array([m[id_col] for m in members], dtype=np.int64)
                pos = np.array([m["pos"] for m in members], dtype=np.int64)
                ai, bi = np.triu_indices(len(ids), k=1)
                keep = ids[ai] != ids[bi]  # same-doc repeats: not pairs
                yield pd.DataFrame(
                    {"doc_a": ids[ai][keep], "doc_b": ids[bi][keep],
                     "pos_a": pos[ai][keep], "pos_b": pos[bi][keep]}
                )

    cand = buckets.select("members").mapInPandas(
        expand, "doc_a long, doc_b long, pos_a long, pos_b long"
    )
    # one verification per shared run: anchors of a run share the
    # diagonal pos_a - pos_b; keep a bounded, DISTINCT anchor list
    diag = cand.groupBy(
        "doc_a", "doc_b", (F.col("pos_a") - F.col("pos_b")).alias("diag")
    ).agg(F.min("pos_a").alias("lo"), F.max("pos_a").alias("hi"))
    texts_a = docs.select(
        F.col(id_col).alias("doc_a"), F.col(text_col).alias("_ta")
    )
    texts_b = docs.select(
        F.col(id_col).alias("doc_b"), F.col(text_col).alias("_tb")
    )
    # the shuffle carries SLICES around the cluster, not documents:
    # [lo - ext, hi + k + ext) on the a side, same minus diag on b
    start_a = F.greatest(F.lit(0), F.col("lo") - ext)
    start_b = F.greatest(F.lit(0), F.col("lo") - F.col("diag") - ext)
    sliced = (
        diag.join(texts_a, "doc_a")
        .join(texts_b, "doc_b")
        .select(
            "doc_a", "doc_b", "diag",
            start_a.alias("off_a"), start_b.alias("off_b"),
            F.substring(
                "_ta", start_a + 1,
                F.col("hi") + k + ext - start_a
            ).alias("sl_a"),
            F.substring(
                "_tb", start_b + 1,
                F.col("hi") - F.col("diag") + k + ext - start_b
            ).alias("sl_b"),
        )
    )

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = {"doc_a": [], "doc_b": [], "pos_a": [], "pos_b": [],
                    "length": []}
            for da, db, diag_, off_a, off_b, sa, sb in zip(
                b["doc_a"], b["doc_b"], b["diag"],
                b["off_a"], b["off_b"], b["sl_a"], b["sl_b"],
            ):
                ca, cb = np.frombuffer(
                    sa.encode("utf-32-le"), dtype=np.uint32
                ), np.frombuffer(sb.encode("utf-32-le"), dtype=np.uint32)
                # align the two slices on the shared diagonal
                # a-offset off_a maps to b-offset off_a - diag
                off_a = int(off_a)
                shift = int(off_a - diag_ - off_b)  # index into cb of ca[0]
                if shift < 0:
                    # ca[0] precedes the b text on this diagonal: clip
                    ca = ca[-shift:]
                    off_a += -shift
                    shift = 0
                n = min(len(ca), len(cb) - shift)
                if n <= 0:
                    continue
                eq = ca[:n] == cb[shift : shift + n]
                # maximal runs via change points
                ch = np.flatnonzero(np.diff(eq.astype(np.int8)))
                starts = np.concatenate(([0], ch + 1))
                ends = np.concatenate((ch + 1, [n]))
                seen = set()
                for s, e in zip(starts, ends):
                    if not eq[s] or e - s < min_len:
                        continue
                    key = (int(s), int(e))
                    if key in seen:
                        continue
                    seen.add(key)
                    rows["doc_a"].append(int(da))
                    rows["doc_b"].append(int(db))
                    rows["pos_a"].append(int(off_a + s))
                    rows["pos_b"].append(int(off_a + s - diag_))
                    rows["length"].append(int(e - s))
            if rows["doc_a"]:
                yield pd.DataFrame(rows)

    # rows are unique by construction: one cluster per (pair, diag),
    # runs deduped inside the cluster, and a run's (pos_a - pos_b)
    # pins it to exactly one diagonal — no output distinct needed
    return sliced.mapInPandas(
        verify,
        "doc_a long, doc_b long, pos_a long, pos_b long, length long",
    )


def remove_duplicate_spans(
    docs: DataFrame,
    spans: DataFrame,
    min_len: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The ACTION half of ExactSubstr dedup (Lee et al. 2021 cut the
    duplicated bytes, they don't drop documents): every span's
    LATER-side occurrence (doc_b — duplicated_spans emits doc_a <
    doc_b) is cut from that document; the earliest document keeps its
    text. Overlapping/adjacent cut intervals from different pairs are
    merged per document, so a passage duplicated against many earlier
    docs is removed once.

    Returns (id, text, n_cut_spans, n_cut_chars) with ``text``
    rewritten. Docs with no cuts pass through verbatim (n_cut_* = 0).

    Scale: overlapping/adjacent intervals are merged RELATIONALLY
    first (running-max window → segment ids → per-segment min/max),
    so the per-doc collect_list holds merged intervals only — a doc
    whose one passage is duplicated against a million earlier docs
    collects ONE struct, not a million. The rewrite is one mapInPandas
    pass over a LEFT join of docs to merged cut lists, so clean
    documents never enter Python."""
    raw = (
        spans.where(F.col("length") >= min_len)
        .select(
            F.col("doc_b").alias(id_col),
            F.col("pos_b").alias("_s"),
            (F.col("pos_b") + F.col("length")).alias("_e"),
        )
        # pre-collapse IDENTICAL intervals before the per-doc window:
        # a passage duplicated against a million earlier docs is a
        # million identical (s, e) rows, and WindowExec partitions
        # cannot be skew-split by AQE — distinct()'s map-side partial
        # agg shrinks the window's input to the distinct intervals
        .distinct()
    )
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("_s", "_e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prev_end = F.max("_e").over(w_prev)
    new_seg = F.when(
        prev_end.isNull() | (F.col("_s") > prev_end), 1
    ).otherwise(0)
    segs = raw.withColumn("_seg", F.sum(new_seg).over(w_run))
    merged = segs.groupBy(id_col, "_seg").agg(
        F.min("_s").alias("_s"), F.max("_e").alias("_e")
    )
    cuts = merged.groupBy(id_col).agg(
        F.sort_array(F.collect_list(F.struct("_s", "_e"))).alias("_cuts")
    )
    joined = docs.join(cuts, id_col, "left")

    def gen(batches):
        import pandas as pd

        for b in batches:
            out_text, out_n, out_chars = [], [], []
            for text, cut in zip(b[text_col], b["_cuts"]):
                if cut is None or text is None or not len(cut):
                    out_text.append(text)
                    out_n.append(0)
                    out_chars.append(0)
                    continue
                pieces, prev, cut_chars = [], 0, 0
                for c in cut:
                    s, e = int(c["_s"]), int(c["_e"])
                    pieces.append(text[prev:s])
                    cut_chars += max(0, min(e, len(text)) - s)
                    prev = e
                pieces.append(text[prev:])
                out_text.append("".join(pieces))
                out_n.append(len(cut))
                out_chars.append(cut_chars)
            yield pd.DataFrame(
                {id_col: b[id_col], text_col: out_text,
                 "n_cut_spans": out_n, "n_cut_chars": out_chars}
            )

    return joined.select(id_col, text_col, "_cuts").mapInPandas(
        gen,
        f"{id_col} long, {text_col} string, "
        "n_cut_spans long, n_cut_chars long",
    )
