"""WordPiece encoding — greedy longest-match-first subword
tokenization (the BERT tokenizer family).

ops/bpe.py covers merge-list induction + encoding (Sennrich 2016);
WordPiece is the OTHER dominant subword scheme (Wu et al. 2016;
Devlin et al. 2018): given a vocabulary, each word is segmented by
repeatedly taking the LONGEST vocabulary prefix, with continuation
pieces carrying the ``##`` marker. Token-count parity with BERT-style
models is what a training-data pipeline actually needs day-to-day
(sequence packing, cost estimates) — induction stays BPE's job.

Pinned semantics (the published WordPiece inference algorithm):

- per word: scan for the longest vocab entry matching at the cursor
  (continuation positions prepend ``##`` before lookup); on any
  position with NO match the WHOLE word encodes as the single
  ``[UNK]`` piece (BERT behavior — no partial salvage);
- words longer than ``max_word_chars`` (default 100, BERT's bound)
  encode as ``[UNK]`` without scanning;
- matching is case-sensitive, vocabulary used as given — case
  folding is the caller's tokenizer policy.

Scale shape: the vocabulary broadcasts once per task inside a
shuffle-free mapInPandas pass (per-word longest-prefix scanning is
inherently iterative — not expressible as a bounded relational
program; the per-piece cost is O(longest-vocab-entry))."""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame

__all__ = ["wordpiece_encode", "wordpiece_encode_df", "UNK"]

UNK = "[UNK]"


def wordpiece_encode(word: str, vocab: set[str],
                     max_word_chars: int = 100) -> list[str]:
    """One word → its WordPiece pieces (or ``[UNK]``)."""
    if not word or len(word) > max_word_chars:
        return [UNK]
    pieces: list[str] = []
    start = 0
    n = len(word)
    while start < n:
        end = n
        cur = None
        while end > start:
            sub = word[start:end]
            if start > 0:
                sub = "##" + sub
            if sub in vocab:
                cur = sub
                break
            end -= 1
        if cur is None:
            return [UNK]
        pieces.append(cur)
        start = end
    return pieces


def wordpiece_encode_df(df: DataFrame, vocab: list[str],
                        word_col: str = "word",
                        max_word_chars: int = 100) -> DataFrame:
    """(…, word) → one row per piece ``(…, piece_pos, piece)``;
    NULL words are skipped."""
    import pandas as pd

    vset = set(vocab)
    in_cols = df.columns
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", piece_pos int, piece string"

    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            out: list[dict] = []
            for rec in b.to_dict("records"):
                w = rec[word_col]
                if w is None:
                    continue
                for pos, piece in enumerate(
                        wordpiece_encode(w, vset, max_word_chars)):
                    out.append({**rec, "piece_pos": pos, "piece": piece})
            yield pd.DataFrame(
                out, columns=in_cols + ["piece_pos", "piece"])

    return df.mapInPandas(gen, schema)
